from __future__ import annotations

from pyspark.sql import functions as F

from pygeoapi_ingestor_spark.operators import spatial
from pygeoapi_ingestor_spark.sources import external


def test_bbox_filter(spark, tmp_path):
    grid = external.ingest(spark, "cds", str(tmp_path / "cds"))
    # full grid spans lon 44..47.5, lat 40..42.5
    inside = spatial.bbox_filter(grid, 45.0, 41.0, 46.0, 42.0)
    rows = inside.select("lon", "lat").distinct().collect()
    assert rows
    assert all(45.0 <= r["lon"] <= 46.0 and 41.0 <= r["lat"] <= 42.0 for r in rows)
    # empty envelope -> empty result, no error
    assert spatial.bbox_filter(grid, -10, -10, -5, -5).count() == 0


def test_morton_cell_locality(spark):
    pts = spark.createDataFrame(
        [
            (0, 10.0, 50.0),
            (1, 10.0001, 50.0001),   # ~10 m from point 0
            (2, -120.0, -30.0),      # far away
        ],
        "pid int, lon double, lat double",
    )
    cells = {r["pid"]: r["c"] for r in pts.select("pid", spatial.morton_cell().alias("c")).collect()}
    assert cells[0] == cells[1]
    assert cells[0] != cells[2]
    assert all(v >= 0 for v in cells.values())


def test_cell_aggregate(spark, tmp_path):
    grid = external.ingest(spark, "cds", str(tmp_path / "cds2"))
    agg = spatial.cell_aggregate(grid, "tp", bits_per_axis=6)
    rows = agg.collect()
    assert sum(r["n"] for r in rows) == grid.count()
    for r in rows:
        assert r["cell_min"] <= r["cell_mean"] <= r["cell_max"]
        assert 44.0 <= r["centroid_lon"] <= 47.5
