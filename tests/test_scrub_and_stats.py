"""Unit tests for the scrub (PII / contamination) operators, the
repetition-stats quality signal, and degree assortativity — edge cases
the sf0.01 oracle comparison can't reach (empty docs, boundary regex
collisions, degenerate-variance graphs)."""

from __future__ import annotations

import pyspark.sql.functions as F

from sharetrace_giraph_spark.operators.scrub import contamination, pii_redact
from sharetrace_giraph_spark.operators.skew import degree_assortativity
from sharetrace_giraph_spark.operators.text import repetition_stats


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


# ---------------------------------------------------------------------------
# pii_redact
# ---------------------------------------------------------------------------


def test_pii_redact_all_categories(spark):
    d = _docs(spark, ["mail bob@site.io call 555-123-4567 from 10.0.0.7 ok"])
    r = pii_redact(d).collect()[0]
    assert r.redacted == "mail <EMAIL> call <PHONE> from <IP> ok"
    assert (r.n_email, r.n_phone, r.n_ip) == (1, 1, 1)


def test_pii_redact_clean_and_empty_text(spark):
    d = _docs(spark, ["no pii here at all", ""])
    got = {r.doc_id: r for r in pii_redact(d).collect()}
    assert got[0].redacted == "no pii here at all"
    assert (got[0].n_email, got[0].n_phone, got[0].n_ip) == (0, 0, 0)
    assert got[1].redacted == ""
    assert (got[1].n_email, got[1].n_phone, got[1].n_ip) == (0, 0, 0)


def test_pii_redact_ip_like_email_host_counts_once(spark):
    """'bob@10.0.0.1' has no alpha TLD, so the email pass skips it and the
    IP pass redacts the host — exactly one category fires per span."""
    d = _docs(spark, ["ping bob@10.0.0.1 now"])
    r = pii_redact(d).collect()[0]
    assert r.redacted == "ping bob@<IP> now"
    assert (r.n_email, r.n_phone, r.n_ip) == (0, 0, 1)


def test_pii_redact_phone_needs_word_boundary(spark):
    d = _docs(spark, ["id 9555-123-45678 is not a phone"])
    r = pii_redact(d).collect()[0]
    assert r.n_phone == 0
    assert "555-123-4567" in r.redacted  # untouched: no \b match


# ---------------------------------------------------------------------------
# contamination
# ---------------------------------------------------------------------------


def test_contamination_counts_distinct_matched_grams(spark):
    docs = _docs(spark, [
        "a b c d e",        # shares 'a b c' and 'b c d' with the benchmark
        "x y z w",          # clean
        "a b c a b c a",    # duplicated gram counts once
        "a b",              # shorter than n: no grams, absent
    ])
    bench = _docs(spark, ["a b c d"])
    got = {r.doc_id: r.n_matched for r in contamination(docs, bench, n=3).collect()}
    assert got == {0: 2, 2: 1}


def test_contamination_empty_benchmark(spark):
    docs = _docs(spark, ["a b c d"])
    bench = _docs(spark, [""])
    assert contamination(docs, bench, n=3).count() == 0


# ---------------------------------------------------------------------------
# repetition_stats
# ---------------------------------------------------------------------------


def test_repetition_stats_values(spark):
    d = _docs(spark, ["a a a a", "a b c d", "", "a a b"])
    got = {r.doc_id: r for r in repetition_stats(d).collect()}
    assert (got[0].n_tokens, got[0].n_distinct) == (4, 1)
    assert got[0].dup_ratio == 0.75 and got[0].top_token_share == 1.0
    assert got[1].dup_ratio == 0.0 and got[1].top_token_share == 0.25
    assert (got[2].n_tokens, got[2].dup_ratio, got[2].top_token_share) == (0, 0.0, 0.0)
    assert got[3].dup_ratio == round(1 / 3, 6) and got[3].top_token_share == round(2 / 3, 6)


# ---------------------------------------------------------------------------
# degree_assortativity
# ---------------------------------------------------------------------------


def _edges_und(spark, pairs):
    e = spark.createDataFrame(pairs, "src long, dst long")
    return e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def test_assortativity_star_is_minus_one(spark):
    """K1,3: every edge joins degree 3 to degree 1 — perfect disassortative
    mixing, r = -1."""
    r = degree_assortativity(_edges_und(spark, [(0, 1), (0, 2), (0, 3)])).collect()[0]
    assert (r.n_edges, r.n_vertices) == (6, 4)
    assert r.avg_deg == 1.5
    assert r.assortativity == -1.0


def test_assortativity_constant_degree_is_null(spark):
    """A 4-cycle has constant degree 2 → zero variance → undefined (null),
    not a division blow-up."""
    r = degree_assortativity(
        _edges_und(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
    ).collect()[0]
    assert r.assortativity is None
    assert r.avg_deg == 2.0
