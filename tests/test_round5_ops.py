"""Round-5 operator tests: polygon point-in-polygon zonal membership,
B-spline transfer evaluation, SPI forecast composition, codebook-table
argmin at production sizes, SimHash bucket cap."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from pygeoapi_ingestor_spark.operators import spatial


# ---------------------------------------------------------------------------
# point-in-polygon vs brute-force winding number
# ---------------------------------------------------------------------------


def winding_number(px: float, py: float, ring: list[tuple[float, float]]) -> int:
    """Textbook winding-number point-in-polygon (Sunday's crossing form):
    counts signed upward/downward edge crossings using the left-of test.
    For simple (non-self-intersecting) rings, wn != 0 <=> even-odd inside
    — an independent algorithm to check the ray-casting parity against."""
    wn = 0
    n = len(ring)
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        is_left = (x2 - x1) * (py - y1) - (px - x1) * (y2 - y1)
        if y1 <= py:
            if y2 > py and is_left > 0:
                wn += 1
        else:
            if y2 <= py and is_left < 0:
                wn -= 1
    return wn


def _random_polygon(rng: random.Random, concave: bool) -> list[tuple[float, float]]:
    """Simple polygon by angle-sorted vertices around a center; alternating
    radii make it star-shaped (concave) while staying non-self-intersecting."""
    cx, cy = rng.uniform(-5, 5), rng.uniform(-5, 5)
    n = rng.randint(5, 9)
    angles = sorted(rng.uniform(0, 2 * math.pi) for _ in range(n))
    ring = []
    for i, a in enumerate(angles):
        r = rng.uniform(2.0, 5.0)
        if concave and i % 2 == 1:
            r *= 0.35
        ring.append((cx + r * math.cos(a), cy + r * math.sin(a)))
    return ring


@pytest.mark.parametrize("concave", [False, True])
def test_polygon_membership_matches_winding(spark, concave):
    rng = random.Random(97 if concave else 31)
    polys = {f"z{i}": _random_polygon(rng, concave) for i in range(3)}
    pts = [
        (i, rng.uniform(-12, 12), rng.uniform(-12, 12)) for i in range(300)
    ]
    points = spark.createDataFrame(pts, "pid int, lon double, lat double")
    edges = spark.createDataFrame(
        spatial.polygon_edges_rows(polys),
        "zone string, x1 double, y1 double, x2 double, y2 double",
    )
    got = {
        (r["pid"], r["zone"])
        for r in spatial.polygon_membership(points, edges, key_cols=["pid"]).collect()
    }
    want = {
        (pid, z)
        for pid, px, py in pts
        for z, ring in polys.items()
        if winding_number(px, py, ring) != 0
    }
    assert got == want


def test_polygon_membership_concave_notch(spark):
    """The L-shape notch: a point inside the bbox but in the notch must be
    OUTSIDE (even-odd parity on a concave ring)."""
    ring = {"L": [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (6.0, 10.0), (6.0, 4.0), (0.0, 4.0)]}
    pts = [(1, 3.0, 2.0), (2, 8.0, 8.0), (3, 2.0, 8.0), (4, 3.0, 3.9), (5, 5.9, 9.9)]
    # pids 3 and 5 sit in the notch (lon<6, lat>4): inside bbox, outside the L
    points = spark.createDataFrame(pts, "pid int, lon double, lat double")
    edges = spark.createDataFrame(
        spatial.polygon_edges_rows(ring),
        "zone string, x1 double, y1 double, x2 double, y2 double",
    )
    got = {
        r["pid"]
        for r in spatial.polygon_membership(points, edges, key_cols=["pid"]).collect()
    }
    assert got == {1, 2, 4}
