"""Versioned parquet collections: immutable snapshot dirs + an atomic
manifest pointer — time travel and safe concurrent reads without a table
format dependency.

Reference parity: the reference's idempotent re-ingest keeps "the latest
snapshot per collection" and skips work when it exists
(utils_spi.py:205-358 skip-if-exists / latest-snapshot checks). This
module systematizes that: every ingest lands as a NEW immutable
``v{n:05d}`` directory, readers resolve through a tiny JSON manifest, and
publishing is one atomic manifest replace — a failed ingest can never be
observed, and yesterday's data stays queryable (audits, A/B re-runs,
rollback after a bad upstream drop).

Scale: the manifest is O(versions) bytes; data files are written once and
never rewritten (rollback and prune are pointer/metadata operations, no
data movement). All filesystem access goes through the Hadoop FS API, so
any supported scheme works (file://, hdfs://, s3a://...).
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame

MANIFEST = "_manifest.json"


def _fs(spark, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return jvm, fs, hpath


def _read_manifest(spark, root: str) -> dict:
    jvm, fs, _ = _fs(spark, root)
    mpath = jvm.org.apache.hadoop.fs.Path(f"{root.rstrip('/')}/{MANIFEST}")
    if not fs.exists(mpath):
        return {"current": 0, "versions": {}}
    stream = fs.open(mpath)
    try:
        # py4j passes array arguments by copy, so the usual read(buf)
        # loop cannot fill a Python-side buffer — drain JVM-side instead
        data = bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
        return json.loads(data.decode("utf-8"))
    finally:
        stream.close()


def _write_manifest(spark, root: str, manifest: dict) -> None:
    """Publish the manifest atomically: write a tmp file, then rename it
    OVER the live name (FileContext rename with Options.Rename.OVERWRITE
    — atomic where the filesystem supports it; the tmp file is complete
    before the swap, so a reader either sees the old manifest or the new
    one, never a partial — and, unlike delete-then-rename, never a
    MISSING manifest, which a concurrent reader would mistake for an
    empty collection)."""
    jvm, fs, _ = _fs(spark, root)
    base = root.rstrip("/")
    mpath = jvm.org.apache.hadoop.fs.Path(f"{base}/{MANIFEST}")
    tmp = jvm.org.apache.hadoop.fs.Path(f"{base}/{MANIFEST}.tmp")
    out = fs.create(tmp, True)
    try:
        out.write(json.dumps(manifest, sort_keys=True).encode("utf-8"))
    finally:
        out.close()
    try:
        gw = spark.sparkContext._gateway
        rename_cls = getattr(jvm, "org.apache.hadoop.fs.Options$Rename")
        opts = gw.new_array(rename_cls, 1)
        opts[0] = rename_cls.OVERWRITE
        fc = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
            fs.getUri(), spark._jsc.hadoopConfiguration()
        )
        fc.rename(tmp, mpath, opts)
    except Exception:
        # filesystems without FileContext support: fall back to
        # delete-then-rename (non-atomic, but never leaves a partial)
        if fs.exists(mpath):
            fs.delete(mpath, False)
        if not fs.rename(tmp, mpath):
            raise IOError(f"versioned: could not publish manifest at {base}")


def _vdir(root: str, version: int) -> str:
    return f"{root.rstrip('/')}/v{version:05d}"


def write_version(
    df: DataFrame,
    root: str,
    partition_by: list[str] | None = None,
    meta: dict[str, Any] | None = None,
) -> int:
    """Write ``df`` as the collection's next immutable version and
    atomically point ``current`` at it. Returns the new version number.

    The data write happens entirely in the new ``v{n}`` directory; the
    manifest flips only after the write succeeds, so concurrent readers
    of ``read_version`` never observe a half-written snapshot."""
    spark = df.sparkSession
    m = _read_manifest(spark, root)
    # allocate from the top of the version history, not the current
    # pointer — after a rollback, new ingests must not collide with the
    # rolled-back (still readable) snapshots
    top = max([int(v) for v in m["versions"]] + [int(m["current"])])
    version = top + 1
    target = _vdir(root, version)
    writer = df.write.mode("errorifexists")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(target)
    rows = df.sparkSession.read.parquet(target).count()
    m["versions"][str(version)] = {
        "rows": int(rows),
        "partition_by": list(partition_by or []),
        **(meta or {}),
    }
    m["current"] = version
    _write_manifest(spark, root, m)
    return version


def read_version(spark, root: str, version: int | None = None) -> DataFrame:
    """Read a snapshot (default: the current one). Time travel = pass an
    older version number; the files are still there until pruned."""
    m = _read_manifest(spark, root)
    v = int(version) if version is not None else int(m["current"])
    if str(v) not in m["versions"]:
        raise FileNotFoundError(f"versioned: {root} has no version {v}")
    return spark.read.parquet(_vdir(root, v))


def rollback(spark, root: str, version: int) -> None:
    """Point ``current`` back at an older version — a pure manifest
    operation (no data movement), same atomicity as publishing."""
    m = _read_manifest(spark, root)
    if str(int(version)) not in m["versions"]:
        raise FileNotFoundError(f"versioned: {root} has no version {version}")
    m["current"] = int(version)
    _write_manifest(spark, root, m)


def prune_versions(spark, root: str, keep: int = 2) -> list[int]:
    """Delete all but the newest ``keep`` versions (never the current
    pointer's target). Returns the pruned version numbers. The manifest
    updates AFTER the deletes, so a crash mid-prune leaves only
    already-deleted versions unlisted — readers of live versions are
    unaffected."""
    jvm, fs, _ = _fs(spark, root)
    m = _read_manifest(spark, root)
    versions = sorted(int(v) for v in m["versions"])
    current = int(m["current"])
    # keep = the newest ``keep`` versions PLUS the current target: after
    # a rollback (current older than the top), pruning must not delete
    # the newest snapshots just to hold a total count
    newest = set(versions[-max(keep, 1):])
    to_prune = [v for v in versions if v != current and v not in newest]
    for v in to_prune:
        fs.delete(jvm.org.apache.hadoop.fs.Path(_vdir(root, v)), True)
        del m["versions"][str(v)]
    if to_prune:
        _write_manifest(spark, root, m)
    return to_prune
