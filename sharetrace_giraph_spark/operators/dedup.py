"""Deduplication operators for training-data pipelines.

Five families, each scale-shaped for 100 TB document tables:

- exact:      md5(text) hash-groupBy — one shuffle on the digest, partial
              agg map-side; never compares full text twice.
- fingerprint: md5 over the sorted token set (whitespace/order-insensitive
              exact dup) — same shuffle shape.
- minhash+LSH: shingle → k min-hashes → band buckets → equi self-join per
              band. Candidate generation is the banded equi join (blocked,
              like the conv_id contact join) — never the O(N²) cross join.
- ngram-jaccard: exact Jaccard over word n-gram sets for candidate pairs
              (verification stage after LSH, or windowed pairs in tests).
- simhash:    64-bit simhash via vectorized pandas UDF (Arrow batches);
              near-dup = Hamming distance ≤ k over bucketed prefixes.
- embedding near-dup: see operators/similarity.py (cosine path).

Determinism: md5-based hashes only (bit-identical in DuckDB for oracles);
no RNG anywhere.
"""

from __future__ import annotations

import pandas as pd

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.functions import pandas_udf

from .text import tokens


def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical documents: (text_hash, n_dups, min_doc_id),
    only groups with n_dups > 1."""
    return (
        df.select(id_col, F.md5(F.col(text_col)).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min(id_col).alias("keep_id"))
        .where(F.col("n_dups") > 1)
    )


def word_ngrams(col, n: int = 3) -> F.Column:
    """Distinct word n-grams (shingles) as an array of strings."""
    t = tokens(col)
    idx = F.sequence(F.lit(0), F.greatest(F.size(t) - n, F.lit(0)))
    grams = F.transform(
        idx, lambda i: F.array_join(F.slice(t, i + 1, n), " ")
    )
    return F.array_distinct(F.when(F.size(t) >= n, grams).otherwise(F.array()))


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """k min-hashes per document: h_i(doc) = min over shingles of
    md5(shingle || '#' || i). One explode + one groupBy(doc) with k min
    aggregates — partial-aggregated map-side, shuffle carries k digests per
    doc, not the shingle stream."""
    ex = df.select(
        F.col(id_col), F.explode(word_ngrams(text_col, shingle_n)).alias("shingle")
    )
    aggs = [
        F.min(F.md5(F.concat(F.col("shingle"), F.lit(f"#{i}")))).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    return ex.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
) -> DataFrame:
    """Banded LSH: split the k-signature into ``bands`` bands of k/bands
    rows; docs sharing any full band become a candidate pair. Implemented
    as explode-to-(band, key) + equi self-join per band key — the same
    blocked-pair-generation shape as the conv_id contact join (J3).
    Returns distinct (a, b) with a < b."""
    rows = num_hashes // bands
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(F.concat_ws("|", *[F.col(f"mh{b * rows + r}") for r in range(rows)])).alias("key"),
        )
        for b in range(bands)
    ]
    keyed = signatures.select(
        F.col(id_col).alias("doc"), F.explode(F.array(*band_cols)).alias("bk")
    ).select("doc", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    l, r = keyed.alias("l"), keyed.alias("r")
    pairs = l.join(
        r,
        (F.col("l.band") == F.col("r.band"))
        & (F.col("l.key") == F.col("r.key"))
        & (F.col("l.doc") < F.col("r.doc")),
    ).select(F.col("l.doc").alias("a"), F.col("r.doc").alias("b"))
    return pairs.distinct()


def ngram_jaccard(
    pairs: DataFrame,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """Exact Jaccard similarity over word n-gram sets for given (a, b)
    candidate pairs — the verify stage after LSH. Two hash joins against
    the (small relative to corpus) pair list."""
    g = docs.select(F.col(id_col).alias("doc"), word_ngrams(text_col, shingle_n).alias("grams"))
    ga = g.select(F.col("doc").alias("a"), F.col("grams").alias("grams_a"))
    gb = g.select(F.col("doc").alias("b"), F.col("grams").alias("grams_b"))
    j = pairs.join(ga, "a").join(gb, "b")
    inter = F.size(F.array_intersect("grams_a", "grams_b"))
    union = F.size(F.array_union("grams_a", "grams_b"))
    return j.select(
        "a", "b",
        F.round(F.when(union > 0, inter / union).otherwise(F.lit(0.0)), 6).alias("jaccard"),
    )


def minhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.7,
) -> DataFrame:
    """Full near-dup pipeline: minhash → LSH candidates → exact-Jaccard
    verify → pairs with jaccard >= threshold."""
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n)
    cand = lsh_candidate_pairs(sigs, id_col, num_hashes, bands)
    return ngram_jaccard(cand, df, text_col, id_col, shingle_n).where(
        F.col("jaccard") >= threshold
    )


# ---------------------------------------------------------------------------
# SimHash (vectorized pandas UDF — Arrow batches, no per-row Python)
# ---------------------------------------------------------------------------

def _simhash64_batch(texts: pd.Series) -> pd.Series:
    """64-bit SimHash over whitespace tokens, token hash = blake2b-8
    (deterministic, seedless). Vectorized per Arrow batch; the inner loop
    is numpy bit arithmetic over the batch's token stream."""
    import hashlib

    import numpy as np

    out = np.zeros(len(texts), dtype=np.int64)
    for i, text in enumerate(texts):
        toks = (text or "").split()
        if not toks:
            continue
        hs = np.frombuffer(
            b"".join(hashlib.blake2b(t.encode(), digest_size=8).digest() for t in toks),
            dtype=np.uint64,
        )
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int32)
        votes = bits.sum(axis=0) * 2 - len(toks)
        sh = np.uint64(0)
        for b in np.nonzero(votes > 0)[0]:
            sh |= np.uint64(1) << np.uint64(b)
        out[i] = sh.astype(np.int64)
    return pd.Series(out)


def simhash64(col) -> F.Column:
    """Lazy pandas_udf wrapper (registering a pandas UDF needs an active
    SparkSession in Spark 4, so registration happens at call time)."""
    return pandas_udf(_simhash64_batch, "long")(col)


def simhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    prefix_bits: int = 16,
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup: bucket by the top ``prefix_bits`` bits (blocked
    candidate generation), verify Hamming distance ≤ max_hamming via
    bit_count(xor). Rotating the prefix (multi-probe) is a caller-side
    union at scale; one probe here."""
    h = df.select(F.col(id_col).alias("doc"), simhash64(F.col(text_col)).alias("sh"))
    h = h.withColumn("bucket", F.shiftrightunsigned("sh", 64 - prefix_bits))
    l, r = h.alias("l"), h.alias("r")
    return (
        l.join(
            r,
            (F.col("l.bucket") == F.col("r.bucket")) & (F.col("l.doc") < F.col("r.doc")),
        )
        .select(
            F.col("l.doc").alias("a"),
            F.col("r.doc").alias("b"),
            F.bit_count(F.col("l.sh").bitwiseXOR(F.col("r.sh"))).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
    )
