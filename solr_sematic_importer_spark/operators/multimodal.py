"""Multimodal (image/audio/video) column plumbing for training-data
pipelines.

Media are opaque ``binary`` columns with a typed metadata struct — the
pattern a 100 TB corpus needs: payload bytes stay columnar (parquet/
Iceberg binary, page-compressed), metadata is prunable without touching
payloads, and all per-item compute rides Arrow-batched ``mapInPandas``
(one Python call per record batch, never per row).

The actual codecs (PIL/ffmpeg/librosa) are NOT in this container, so the
decode kernels are deliberately swappable: the default implementations
are deterministic fakes (clearly marked) that exercise the REAL Spark
plumbing — schema, partitioning, UDF signature, Arrow batch shape — and
raise ``NotImplementedError`` when asked for a real codec. Swapping in a
real decoder is a one-function change; nothing in the dataflow moves.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<mime:string, width:int, height:int, duration_ms:int, nbytes:int>"
)

FEATURE_DIM = 64


def synthetic_media(spark, n: int = 200, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes) used by
    tests/bench; at production scale this is the Iceberg media table."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        for b in batches:
            rows = []
            for mid in b["id"]:
                mid = int(mid)
                rng = np.random.default_rng([seed, mid])
                kind = kinds[mid % 3]
                nbytes = int(rng.integers(256, 4096))
                payload = rng.integers(0, 256, size=nbytes, dtype=np.uint8).tobytes()
                rows.append(
                    (
                        mid,
                        kind,
                        payload,
                        {
                            "mime": {"image": "image/png", "audio": "audio/wav",
                                     "video": "video/mp4"}[kind],
                            "width": int(rng.integers(16, 512)) if kind != "audio" else None,
                            "height": int(rng.integers(16, 512)) if kind != "audio" else None,
                            "duration_ms": int(rng.integers(100, 60_000))
                            if kind != "image" else None,
                            "nbytes": nbytes,
                        },
                    )
                )
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])

    return spark.range(n).mapInPandas(gen, MEDIA_SCHEMA)


def materialize_media(spark, path: str, n: int = 120, seed: int = 42) -> str:
    """Write the synthetic media table to parquet WITH a ``payload_bytes``
    array<smallint> side-column carrying the payload's byte values — the
    oracle hook: DuckDB cannot crack a BLOB apart, but it can unnest the
    int array and recompute the byte histogram independently, so the
    driver's SQL oracle verifies the binary-column mapInPandas kernel
    value-for-value against the SAME parquet bytes. The engine side only
    ever reads the ``payload`` binary column (check ReadSchema)."""

    def widen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if not len(b):
                continue
            b = b.copy()
            b["payload_bytes"] = [
                np.frombuffer(p, dtype=np.uint8).astype(np.int16)
                for p in b["payload"]
            ]
            yield b

    media = synthetic_media(spark, n, seed)
    wide = media.mapInPandas(
        widen, MEDIA_SCHEMA + ", payload_bytes array<smallint>"
    )
    wide.write.mode("overwrite").parquet(path)
    return path


# ---------------------------------------------------------------------------
# Decode kernels — STUBS. Real codecs are not installed in this container.
# ---------------------------------------------------------------------------


def fake_decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """DETERMINISTIC FAKE decoder: hash-seeded pixels of the declared
    shape. Stands in for PIL/turbojpeg; same output type/shape contract
    (H x W x 3 uint8)."""
    seed = int.from_bytes(hashlib.blake2b(payload, digest_size=8).digest(), "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)


def real_decode_image(payload: bytes) -> np.ndarray:
    """Swap-in point for an actual image codec."""
    raise NotImplementedError(
        "image codecs (PIL/opencv) are not available in this environment; "
        "replace this function when they are"
    )


def _feature_vec(arr: np.ndarray) -> list[float]:
    """Toy feature extractor: per-plane byte histograms folded to
    FEATURE_DIM floats — vectorized, deterministic."""
    h = np.histogram(arr, bins=FEATURE_DIM, range=(0, 256))[0].astype(np.float64)
    n = np.linalg.norm(h)
    return list(h / n if n else h)


def extract_features(
    media: DataFrame,
    decode: Callable[[bytes, int, int], np.ndarray] = fake_decode_image,
    batch_limit_bytes: int = 64 << 20,
) -> DataFrame:
    """Image -> FEATURE_DIM float feature vector over ``mapInPandas``.

    Real plumbing, stub kernel: filters to image rows JVM-side (metadata
    pruning — payload pages of other kinds are never read), then one
    Python call per Arrow batch. ``batch_limit_bytes`` documents the
    executor-memory contract: payload bytes per batch are bounded by
    Arrow's maxRecordsPerBatch times the max payload size; size those
    together at deployment."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            feats = [
                _feature_vec(
                    decode(p, int(m["width"]), int(m["height"]))
                )
                for p, m in zip(b["payload"], b["meta"])
            ]
            yield pd.DataFrame(
                {"media_id": b["media_id"], "feature": feats}
            )

    imgs = media.filter(F.col("kind") == "image").select("media_id", "payload", "meta")
    return imgs.mapInPandas(kernel, "media_id long, feature array<double>")


def payload_features(media: DataFrame, bins: int = FEATURE_DIM) -> DataFrame:
    """Count-normalized byte histogram of the raw payload — the
    deterministic, SQL-verifiable feature kernel (the oracle recomputes it
    from ``payload_bytes``): feature[i] = #{bytes in [4i, 4i+4)} / nbytes.
    Unlike the decode-stub path this runs on ALL kinds (a byte histogram
    is codec-agnostic); the Spark plumbing — binary column through an
    Arrow batch into NumPy, vector out — is exactly the real feature
    extractor's. Division by the int count (not an L2 norm) keeps both
    sides' doubles bit-identical."""
    shift = 8 - (bins - 1).bit_length()  # 64 bins -> byte >> 2

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            feats = [
                np.bincount(
                    np.frombuffer(p, dtype=np.uint8) >> shift, minlength=bins
                ).astype(np.float64)
                / max(len(p), 1)
                for p in b["payload"]
            ]
            yield pd.DataFrame({"media_id": b["media_id"], "feature": feats})

    return media.select("media_id", "payload").mapInPandas(
        kernel, "media_id long, feature array<double>"
    )


def resize_images(
    media: DataFrame,
    out_w: int = 32,
    out_h: int = 32,
    decode: Callable[[bytes, int, int], np.ndarray] = fake_decode_image,
) -> DataFrame:
    """Decode -> nearest-neighbor resize -> re-encode as raw bytes.
    Same mapInPandas shape as a real thumbnail job."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for p, m in zip(b["payload"], b["meta"]):
                arr = decode(p, int(m["width"]), int(m["height"]))
                ys = (np.arange(out_h) * arr.shape[0] // out_h)
                xs = (np.arange(out_w) * arr.shape[1] // out_w)
                out.append(arr[np.ix_(ys, xs)].tobytes())
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "thumb": out,
                    "width": out_w,
                    "height": out_h,
                }
            )

    imgs = media.filter(F.col("kind") == "image").select("media_id", "payload", "meta")
    return imgs.mapInPandas(
        kernel, "media_id long, thumb binary, width int, height int"
    )


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling PLAN: expand (media_id, duration) into frame
    timestamps JVM-side (posexplode of a sequence — no Python, no payload
    read); the per-frame decode would plug into extract_features."""
    vids = media.filter(F.col("kind") == "video")
    # every timestamp 0, every_ms, ... STRICTLY inside [0, duration):
    # floor((duration-1)/every)+1 — a plain floor(duration/every) loses
    # the last in-range frame whenever duration is not an exact multiple
    # (1999 ms @ 1000 has frames 0 AND 1000) and emits an out-of-range
    # one at exact multiples
    n = F.greatest(
        F.lit(1),
        (
            F.floor((F.col("meta.duration_ms") - 1) / F.lit(every_ms)) + 1
        ).cast("int"),
    )
    return vids.select(
        "media_id",
        F.posexplode(F.sequence(F.lit(0), n - 1)).alias("frame_idx", "_i"),
    ).select(
        "media_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        (F.col("frame_idx") * every_ms).cast("long").alias("ts_ms"),
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Metadata-only aggregation: never touches payload pages (column
    pruning — check ReadSchema in the explain output)."""
    return media.groupBy("kind").agg(
        F.count("*").alias("cnt"),
        F.sum("meta.nbytes").alias("total_bytes"),
        F.avg("meta.duration_ms").alias("avg_duration_ms"),
    )
