"""Training-data operators without SQL oracles, verified against brute
force / first principles on the sf0.001 documents+embeddings tables."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from sharetrace_giraph_spark.operators import dedup, multimodal, similarity

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").persist()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").persist()


def _brute_jaccard(docs_pd, n=3):
    """doc_id -> 3-gram set; all-pairs jaccard dict."""
    grams = {}
    for _, r in docs_pd.iterrows():
        toks = r["text"].split()
        grams[r["doc_id"]] = {
            " ".join(toks[i : i + n]) for i in range(max(len(toks) - n + 1, 0))
        }
    return grams


def test_minhash_lsh_recall_against_bruteforce(spark, docs):
    """Every pair with true Jaccard >= 0.5 must be caught by 8-hash/4-band
    LSH (band collision probability at s=0.5: 1-(1-s^2)^4 ≈ 0.68 per band
    set... so we assert on >= 0.8 where collision is near-certain, and that
    all reported pairs' jaccard values are exact)."""
    got = {
        (r.a, r.b): r.jaccard
        for r in dedup.minhash_near_duplicates(docs, threshold=0.0).collect()
    }
    grams = _brute_jaccard(docs.toPandas())
    ids = sorted(grams)
    strong_missed = []
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            u = grams[a] | grams[b]
            j = len(grams[a] & grams[b]) / len(u) if u else 0.0
            if j >= 0.8 and (a, b) not in got:
                strong_missed.append((a, b, j))
    assert strong_missed == []
    # reported jaccard values are exact (same definition)
    for (a, b), j in got.items():
        u = grams[a] | grams[b]
        exact = len(grams[a] & grams[b]) / len(u) if u else 0.0
        assert abs(j - exact) < 1e-6


def test_exact_duplicates_detects_planted_dups(spark, docs):
    planted = docs.limit(5).union(docs.limit(5))  # 5 doubled docs
    groups = dedup.exact_duplicates(planted)
    rows = groups.collect()
    assert len(rows) == 5
    assert all(r.n_dups == 2 for r in rows)


def test_simhash_deterministic_and_near_dup_sane(spark, docs):
    a = {r.doc: r.sh for r in dedup.simhash_signatures(docs).collect()}
    b = {r.doc: r.sh for r in dedup.simhash_signatures(docs).collect()}
    assert a == b  # deterministic across runs
    assert all(0 <= v < (1 << dedup.SIMHASH_BITS) for v in a.values())
    # identical docs → identical simhash → hamming 0 pairs found
    planted = docs.limit(3).union(
        docs.limit(3).withColumn("doc_id", F.col("doc_id") + 100000)
    )
    pairs = dedup.simhash_near_duplicates(planted, max_hamming=0).collect()
    assert {(r.a, r.b) for r in pairs} >= {
        (r.doc_id, r.doc_id + 100000) for r in docs.limit(3).collect()
    }


def test_simhash_matches_reference_python(spark, docs):
    """The JVM expression pipeline computes the textbook simhash: per-bit
    majority vote over md5-derived 60-bit token hashes."""
    import hashlib

    def ref_simhash(text):
        toks = [t for t in text.split() if t]
        if not toks:
            return None
        votes = [0] * dedup.SIMHASH_BITS
        for t in toks:
            h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
            for bit in range(dedup.SIMHASH_BITS):
                votes[bit] += (h >> bit) & 1
        return sum(
            1 << bit
            for bit in range(dedup.SIMHASH_BITS)
            if votes[bit] * 2 > len(toks)
        )

    sample = docs.limit(25).toPandas()
    got = {r.doc: r.sh for r in dedup.simhash_signatures(docs.limit(25)).collect()}
    for _, row in sample.iterrows():
        assert got[row["doc_id"]] == ref_simhash(row["text"]), row["doc_id"]


def test_skewed_bucket_cap_bounds_pair_generation(spark, docs):
    """A giant duplicate cluster shares every band key / simhash prefix;
    max_bucket_size must exclude those buckets from pair generation (and
    the stats helpers must expose what was cut)."""
    # plant a 30-member duplicate cluster
    one = docs.limit(1).select("text")
    cluster = (
        spark.range(30)
        .withColumn("doc_id", (F.col("id") + 500000).cast("long"))
        .crossJoin(F.broadcast(one))
        .select("doc_id", "text")
    )
    corpus = docs.select("doc_id", "text").union(cluster)

    # uncapped: the cluster alone contributes 30*29/2 = 435 pairs
    sigs = dedup.minhash_signatures(corpus)
    uncapped = dedup.lsh_candidate_pairs(sigs).count()
    capped = dedup.lsh_candidate_pairs(sigs, max_bucket_size=10).count()
    assert uncapped >= 435
    assert capped <= uncapped - 435  # every cluster bucket got dropped

    stats = dedup.lsh_band_stats(sigs)
    assert stats.where(F.col("bucket_n") >= 30).count() >= 4  # all 4 bands

    sh_capped = dedup.simhash_near_duplicates(corpus, max_bucket_size=10)
    sh_uncapped = dedup.simhash_near_duplicates(corpus)
    assert sh_capped.count() <= sh_uncapped.count() - 435
    sh_stats = dedup.simhash_bucket_stats(corpus)
    assert sh_stats.where(F.col("bucket_n") >= 30).count() >= 1


def test_ivf_topk_recall_vs_bruteforce(spark, emb):
    queries = emb.where(F.col("vec_id") < 10)
    brute = similarity.brute_force_topk(emb, queries, k=5)
    ivf = similarity.ivf_topk(emb, queries, k=5, n_centroids=8, n_probe=4)
    b = {(r.query_id, r.neighbor_id) for r in brute.collect()}
    g = {(r.query_id, r.neighbor_id) for r in ivf.collect()}
    recall = len(b & g) / len(b)
    assert recall >= 0.5, recall  # probing half the space; sanity bound
    # and IVF sims are exact cosines for the pairs it does return
    bs = {(r.query_id, r.neighbor_id): r.cos_sim for r in brute.collect()}
    for r in ivf.collect():
        if (r.query_id, r.neighbor_id) in bs:
            assert abs(r.cos_sim - bs[(r.query_id, r.neighbor_id)]) < 1e-9


def test_brute_topk_matches_numpy(spark, emb):
    import numpy as np

    pdf = emb.toPandas().sort_values("vec_id")
    mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    ids = pdf["vec_id"].to_numpy()
    qidx = ids < 5
    sims = (mat[qidx] @ mat.T) / (
        np.linalg.norm(mat[qidx], axis=1)[:, None] * np.linalg.norm(mat, axis=1)[None, :]
    )
    got = similarity.brute_force_topk(emb, emb.where(F.col("vec_id") < 5), k=3).collect()
    for r in got:
        qpos = int(np.where(ids == r.query_id)[0][0])
        npos = int(np.where(ids == r.neighbor_id)[0][0])
        assert abs(r.cos_sim - round(float(sims[qpos, npos]), 6)) <= 1e-6


def test_embedding_near_dup_planted(spark, emb):
    """A duplicated vector (cosine 1.0) must be caught by the bucketed
    near-dup scan (same vector → same bucket by construction)."""
    dup = emb.limit(3).withColumn("vec_id", F.col("vec_id") + 100000)
    planted = emb.union(dup)
    pairs = similarity.embedding_near_duplicates(planted, threshold=0.999)
    got = {(r.a, r.b) for r in pairs.collect()}
    want = {(r.vec_id, r.vec_id + 100000) for r in emb.limit(3).collect()}
    assert got >= want


def test_multimodal_plumbing(spark, docs):
    media = multimodal.synthesize_media(docs)
    assert [f.name for f in media.schema.fields] == ["doc_id", "kind", "payload", "meta"]
    feats = multimodal.extract_features(media, feature_dim=8, decode=False)
    rows = feats.collect()
    assert len(rows) == docs.count()
    for r in rows[:10]:
        assert len(r.feature) == 8
        assert abs(sum(r.feature) - 1.0) < 1e-9  # histogram normalized
        assert r.n_bytes > 0 and len(r.payload_md5) == 32
        assert r.error is None
    stats = multimodal.media_stats(media).collect()
    assert {r.kind for r in stats} == {"image", "audio", "video"}
    assert sum(r.n_items for r in stats) == docs.count()


def test_multimodal_real_decode_end_to_end(spark, docs):
    """decode=True REALLY decodes: synthesize genuine PNG/WAV payloads,
    decode them inside the Arrow batches, and check the features match a
    local decode of the same deterministic payloads."""
    import numpy as np

    from sharetrace_giraph_spark.operators.mediacodec import decode_media

    media = multimodal.synthesize_decodable_media(docs.limit(20))
    rows = {
        r.doc_id: r
        for r in multimodal.extract_features(media, feature_dim=8, decode=True).collect()
    }
    local = {r.doc_id: bytes(r.payload) for r in media.collect()}
    assert len(rows) == 20
    for doc_id, payload in local.items():
        r = rows[doc_id]
        assert r.error is None, r.error
        kind, arr = decode_media(payload)
        assert kind == ("image" if doc_id % 2 == 0 else "audio")
        if kind == "image":
            vals = arr.astype(np.int64).ravel() * 8 // 256
        else:
            vals = np.abs(arr.astype(np.int64)).ravel() * 8 // 32769
        hist = np.bincount(np.clip(vals, 0, 7), minlength=8)
        want = hist / hist.sum()
        assert np.allclose(np.array(r.feature), want)


def test_multimodal_undecodable_payload_quarantined(spark, docs):
    """A payload outside the codec floor lands in the error column —
    one bad item must not fail the batch (and no stub-style
    NotImplementedError exists on any path)."""
    media = multimodal.synthesize_media(docs.limit(4))  # UTF-8 text payloads
    rows = multimodal.extract_features(media, decode=True).collect()
    assert len(rows) == 4
    for r in rows:
        assert r.feature is None
        assert "not a decodable format" in r.error


def test_sample_frames_plumbing(spark, docs):
    """Frame sampling: ≤8 frames per item, stride-256 offsets, byte-exact
    slices (verified against Python slicing on a sample)."""
    import hashlib

    media = multimodal.synthesize_media(docs.limit(20))
    frames = multimodal.sample_frames(media).collect()
    texts = {r.doc_id: r.text for r in docs.limit(20).collect()}
    assert frames
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, rows in by_doc.items():
        payload = texts[doc_id].encode()
        n_expected = min(8, (len(payload) + 255) // 256)
        assert len(rows) == n_expected, doc_id
        for r in sorted(rows, key=lambda x: x.frame_idx):
            chunk = payload[r.frame_offset : r.frame_offset + 64]
            assert r.frame_bytes == len(chunk)
            assert r.frame_md5 == hashlib.md5(chunk).hexdigest()


def test_resize_media_stride_rule(spark, docs):
    """Even-stride subsample: <= 96 bytes out, byte-exact vs Python."""
    import hashlib

    media = multimodal.synthesize_media(docs.limit(20))
    out = {r.doc_id: r for r in multimodal.resize_media(media, target_bytes=96).collect()}
    for r in docs.limit(20).collect():
        payload = r.text.encode()
        n = len(payload)
        sub = payload if n <= 96 else payload[:: -(-n // 96)]
        got = out[r.doc_id]
        assert got.out_bytes == len(sub) <= 96
        assert got.out_md5 == hashlib.md5(sub).hexdigest()


def test_capped_composition_bounds_pairs_and_keeps_recall(spark, docs):
    """The DRIVER-path composition (minhash_near_duplicates with
    max_bucket_size, as q_dedup_minhash_lsh / _near_clusters / _keep_best
    call it): a planted giant duplicate cluster must not blow up candidate
    generation — total LSH candidates stay <= n_buckets * cap*(cap-1)/2 —
    while every non-pathological near-dup pair is still recalled exactly
    as without the cap."""
    cap = 10
    # giant-cluster text is DISJOINT from the corpus vocabulary: the cap
    # must only evict the pathological buckets, not any original doc
    giant_text = " ".join(f"zqx{i} wvb{i} jkp{i}" for i in range(8))
    giant = (
        spark.range(60)
        .select(
            (F.col("id") + 700000).cast("long").alias("doc_id"),
            F.lit(giant_text).alias("text"),
        )
    )
    corpus = docs.select("doc_id", "text").union(giant)

    sigs = dedup.minhash_signatures(corpus)
    n_buckets = (
        dedup.lsh_band_stats(sigs)
        .where(F.col("bucket_n").between(2, cap))
        .count()
    )
    capped_cand = dedup.lsh_candidate_pairs(sigs, max_bucket_size=cap)
    assert capped_cand.count() <= n_buckets * cap * (cap - 1) // 2

    # recall: the verified pairs among ORIGINAL docs are identical with and
    # without the cap (the giant cluster lives in its own oversized buckets)
    base = {
        (r.a, r.b)
        for r in dedup.minhash_near_duplicates(docs, threshold=0.2).collect()
    }
    capped = {
        (r.a, r.b)
        for r in dedup.minhash_near_duplicates(
            corpus, threshold=0.2, max_bucket_size=cap, log_dropped=True
        ).collect()
        if r.a < 700000 and r.b < 700000
    }
    assert capped == base
    # and the giant cluster's quadratic pair set is gone entirely
    giant_pairs = dedup.minhash_near_duplicates(
        corpus, threshold=0.2, max_bucket_size=cap
    ).where((F.col("a") >= 700000) & (F.col("b") >= 700000))
    assert giant_pairs.count() == 0


def test_generate_docs_planted_structure(spark):
    """datagen.generate_docs (the --docs-bench corpus): deterministic
    across partitioning, every within-group pair of non-giant docs is a
    verified near-dup (Jaccard ~0.8 > 0.7), cross-group pairs never
    appear (disjoint hashed vocabularies), and the giant duplicate
    cluster is byte-identical text that the bucket cap evicts whole."""
    from sharetrace_giraph_spark.datagen import generate_docs

    d = generate_docs(spark, 100, n_giant_dups=10, num_partitions=8)
    d2 = generate_docs(spark, 100, n_giant_dups=10, num_partitions=3)
    assert d.exceptAll(d2).count() == 0 and d2.exceptAll(d).count() == 0

    rows = {r.doc_id: r.text for r in d.collect()}
    assert len(rows) == 100
    assert len({rows[i] for i in range(10)}) == 1  # giants identical
    assert all(len(rows[i].split()) == 48 for i in (37, 99))
    assert len(rows[0].split()) == 43  # giants carry no unique suffix

    pairs = dedup.minhash_near_duplicates(
        d, threshold=0.7, max_bucket_size=8, log_dropped=True
    )
    got = {(r.a, r.b) for r in pairs.collect()}
    # groups of 5 over ids 10..99 -> 18 groups x C(5,2)=10 pairs
    want = {
        (a, b)
        for g in range(2, 20)
        for a in range(g * 5, g * 5 + 5)
        for b in range(a + 1, g * 5 + 5)
    }
    assert got == want


def test_lsh_rejects_inexact_band_division(spark):
    """num_hashes % bands != 0 would silently drop the trailing
    min-hashes (shifting the LSH s-curve); the module's no-silent-caps
    rule demands a loud error instead."""
    sigs = spark.createDataFrame(
        [("d1",) + tuple(f"h{i}" for i in range(10))],
        ["doc_id"] + [f"mh{i}" for i in range(10)],
    )
    with pytest.raises(ValueError, match="must divide num_hashes"):
        dedup.lsh_candidate_pairs(sigs, num_hashes=10, bands=4).collect()
