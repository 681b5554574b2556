"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata
struct; decode / feature-extraction run as Arrow-batched ``mapInPandas``
stages. The actual codec step is STUBBED (no imaging/audio libs in this
runtime) behind ``decode_stub`` — a deterministic fake that preserves the
real schema, batch shape, and partitioning so the Spark-side plumbing is
fully exercised and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, media_type string, payload binary, "
    "width int, height int, n_frames int, sha256 string"
)


def attach_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Manufacture a deterministic binary payload + metadata from a source
    column (test harness for the multimodal path; in production the
    payload arrives from the storage layer)."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).cast("bigint").alias("media_id"),
        F.when(F.col(id_col) % 3 == 0, "image")
        .when(F.col(id_col) % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        payload.alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("n_frames"),
        F.sha2(payload, 256).alias("sha256"),
    )


def real_decode(payload: bytes, media_type: str):
    """The true codec hook. Intentionally unimplemented in this runtime —
    wire PIL/libav here on a cluster with the codec libraries installed."""
    raise NotImplementedError("codec libraries not available in this runtime")


def decode_stub(payload: bytes, media_type: str) -> dict:
    """Deterministic fake decode: derives plausible dimensions/frame
    counts from the payload hash. Same signature and output schema as the
    real decoder."""
    digest = hashlib.sha256(payload).digest()
    w = 64 + digest[0] % 192
    h = 64 + digest[1] % 192
    frames = 1 if media_type == "image" else 1 + digest[2] % 120
    return {"width": int(w), "height": int(h), "n_frames": int(frames)}


def extract_metadata(df: DataFrame, use_stub: bool = True) -> DataFrame:
    """Arrow-batched decode pass: fills width/height/n_frames from the
    payload. ``mapInPandas`` keeps the binary column inside Arrow batches
    — no per-row Python round-trips."""
    from pygeoapi_ingestor_spark.session import ensure_package_on_executors

    ensure_package_on_executors(df.sparkSession)
    decoder = decode_stub if use_stub else real_decode

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [decoder(p, t) for p, t in zip(pdf["payload"], pdf["media_type"])]
            pdf = pdf.copy()
            pdf["width"] = [m["width"] for m in meta]
            pdf["height"] = [m["height"] for m in meta]
            pdf["n_frames"] = [m["n_frames"] for m in meta]
            yield pdf

    return df.mapInPandas(decode_batches, schema=MEDIA_SCHEMA)


RESIZED_SCHEMA = MEDIA_SCHEMA + ", resized_width int, resized_height int"
FRAMES_SCHEMA = "media_id bigint, frame_idx int, frame_sha256 string"


def resize_stub(payload: bytes, width: int, height: int, target: int) -> tuple[int, int]:
    """Aspect-preserving resize plan (the real codec call is the stub's
    only missing piece; the geometry math is the production logic)."""
    if width <= 0 or height <= 0:
        return target, target
    scale = target / max(width, height)
    return max(1, round(width * scale)), max(1, round(height * scale))


def resize_media(df: DataFrame, target: int = 128) -> DataFrame:
    """Arrow-batched resize pass over decoded media (expects
    ``extract_metadata`` output). Geometry is real; pixel work is where
    the codec library plugs in."""
    from pygeoapi_ingestor_spark.session import ensure_package_on_executors

    ensure_package_on_executors(df.sparkSession)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            dims = [
                resize_stub(p, w, h, target)
                for p, w, h in zip(pdf["payload"], pdf["width"], pdf["height"])
            ]
            pdf = pdf.copy()
            pdf["resized_width"] = [d[0] for d in dims]
            pdf["resized_height"] = [d[1] for d in dims]
            yield pdf

    return df.mapInPandas(batches, schema=RESIZED_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame sampling for video rows: one output row per sampled frame
    index with a deterministic per-frame fingerprint (real extraction
    swaps the fingerprint for decoded frame bytes). Non-video rows pass
    through with frame 0.

    The fingerprint is sha256 over the TEXT ``"<payload-sha-hex>:<idx>"``
    rather than raw payload bytes, so an external SQL oracle can replay
    the whole mapInPandas stage symbolically — the multimodal pipeline
    stays value-hash-gated end to end."""
    from pygeoapi_ingestor_spark.session import ensure_package_on_executors

    ensure_package_on_executors(df.sparkSession)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, mtype, sha_hex, n_frames in zip(
                pdf["media_id"], pdf["media_type"], pdf["sha256"], pdf["n_frames"]
            ):
                # pd.isna, not `or`: a null int column arrives as float
                # NaN in pandas, and NaN is truthy — `int(NaN or 1)`
                # would raise instead of defaulting
                nf = 1 if pd.isna(n_frames) else (int(n_frames) or 1)
                idxs = range(0, nf, every_n) if mtype == "video" else [0]
                for i in idxs:
                    digest = hashlib.sha256(f"{sha_hex}:{i}".encode()).hexdigest()
                    rows.append(
                        {"media_id": mid, "frame_idx": int(i), "frame_sha256": digest}
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_sha256"])

    return df.mapInPandas(batches, schema=FRAMES_SCHEMA)
