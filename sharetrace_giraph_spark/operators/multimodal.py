"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, with Arrow-batched processing plumbing.

Pattern: media rows are ``(doc_id, kind, payload: binary, meta:
struct<...>)``; heavy per-item work (decode, resize, frame-sample,
feature-extract) runs as ``mapInPandas`` over Arrow batches so payload
bytes never round-trip through per-row Python. The decode step itself is
STUBBED in this container (no image/audio libs): ``decode_media`` raises
NotImplementedError unless a deterministic fake is requested — the Spark
plumbing (schema, batching, partitioning) is real and tested either way.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("n_bytes", T.LongType(), False),
                    T.StructField("declared_format", T.StringType(), True),
                ]
            ),
            False,
        ),
    ]
)

KINDS = ["image", "audio", "video"]


def synthesize_media(documents: DataFrame) -> DataFrame:
    """Deterministic fake media table from the documents table: payload =
    UTF-8 bytes of the text (stand-in for real image/audio bytes), kind
    assigned by doc_id hash. Real pipelines replace only this function."""
    kind = F.element_at(
        F.array(*[F.lit(k) for k in KINDS]),
        (F.pmod("doc_id", F.lit(len(KINDS))) + 1).cast("int"),
    )
    return documents.select(
        "doc_id",
        kind.alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.length(F.encode("text", "UTF-8")).cast("long").alias("n_bytes"),
            F.lit("synthetic/v1").alias("declared_format"),
        ).alias("meta"),
    )


FEATURE_SCHEMA = (
    "doc_id long, kind string, n_bytes long, payload_md5 string, "
    "feature array<double>"
)


def extract_features(media: DataFrame, feature_dim: int = 8, fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``fake=True`` computes a deterministic byte-histogram feature (real
    Spark plumbing, fake 'model'); ``fake=False`` is where a real
    image/audio decoder would run — stubbed with NotImplementedError in
    this container (no PIL/librosa baked in; gate via import-try when
    available)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import numpy as np

        for pdf in it:
            if not fake:
                try:
                    import PIL  # noqa: F401
                except ImportError as exc:  # pragma: no cover
                    raise NotImplementedError(
                        "real media decode needs image/audio libs not present "
                        "in this container; use fake=True for the plumbing path"
                    ) from exc
            n = len(pdf)
            feats = np.zeros((n, feature_dim), dtype=np.float64)
            md5s = []
            for i, payload in enumerate(pdf["payload"]):
                buf = np.frombuffer(payload, dtype=np.uint8)
                md5s.append(hashlib.md5(payload).hexdigest())
                if len(buf):
                    # byte histogram folded to feature_dim — deterministic
                    hist = np.bincount(buf % feature_dim, minlength=feature_dim)
                    feats[i] = hist / len(buf)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["meta"].map(lambda m: m["n_bytes"]),
                    "payload_md5": md5s,
                    "feature": list(feats),
                }
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)


FRAME_SCHEMA = (
    "doc_id long, kind string, frame_idx int, frame_offset long, "
    "frame_bytes long, frame_md5 string"
)


def sample_frames(
    media: DataFrame,
    frame_size: int = 64,
    stride: int = 256,
    max_frames: int = 8,
) -> DataFrame:
    """Frame/segment sampling over binary payloads — one output row per
    sampled frame (video frame-sample / audio window-slice analog).

    The Spark plumbing is the real thing: Arrow-batched ``mapInPandas``,
    byte-slice extraction without per-row Python loops over bytes, 1→N row
    fan-out inside the batch. The "frame decode" is the deterministic
    byte-slice stand-in this container permits (a real pipeline swaps the
    slicing for an av/PIL call; the schema, batching, and fan-out stay).

    Frame k covers payload[k*stride : k*stride + frame_size]; frames start
    strictly inside the payload; at most ``max_frames`` per item.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            out = {
                "doc_id": [], "kind": [], "frame_idx": [],
                "frame_offset": [], "frame_bytes": [], "frame_md5": [],
            }
            for doc_id, kind, payload in zip(pdf["doc_id"], pdf["kind"], pdf["payload"]):
                n = len(payload)
                n_frames = min(max_frames, (n + stride - 1) // stride)
                for k in range(n_frames):
                    off = k * stride
                    chunk = payload[off : off + frame_size]
                    out["doc_id"].append(doc_id)
                    out["kind"].append(kind)
                    out["frame_idx"].append(k)
                    out["frame_offset"].append(off)
                    out["frame_bytes"].append(len(chunk))
                    out["frame_md5"].append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, FRAME_SCHEMA)


RESIZE_SCHEMA = "doc_id long, kind string, out_bytes long, out_md5 string"


def resize_media(media: DataFrame, target_bytes: int = 96) -> DataFrame:
    """Resize/downsample plumbing: payload → fixed-budget representation.

    The real pipeline decodes and resizes pixels/samples; this container's
    deterministic stand-in subsamples the payload bytes at an even stride
    to ``target_bytes`` (shorter payloads pass through). The Spark side —
    Arrow batches via ``mapInPandas``, binary in/out, stable output
    schema — is the real contract a decoder drops into.

    Stride rule (replayed by the DuckDB oracle): if n <= target, keep all
    bytes; else keep bytes at offsets i*ceil(n/target) for i = 0.. while
    the offset < n (yields <= target bytes, evenly spread).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            out_bytes, out_md5 = [], []
            for payload in pdf["payload"]:
                n = len(payload)
                if n <= target_bytes:
                    sub = payload
                else:
                    step = -(-n // target_bytes)  # ceil
                    sub = payload[::step]
                out_bytes.append(len(sub))
                out_md5.append(hashlib.md5(sub).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": pdf["kind"],
                    "out_bytes": out_bytes,
                    "out_md5": out_md5,
                }
            )

    return media.mapInPandas(batches, RESIZE_SCHEMA)


def media_stats(media: DataFrame) -> DataFrame:
    """Pure-relational metadata aggregation (no Python): per kind, count,
    total/mean payload bytes."""
    return (
        media.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("meta.n_bytes").alias("total_bytes"),
            F.round(F.avg("meta.n_bytes"), 6).alias("mean_bytes"),
        )
        .orderBy("kind")
    )
