"""Risk propagation (the reference BP semantics) vs the dict oracle on
the transplanted /root/reference/java/input.txt fixture."""

from __future__ import annotations

import pytest

from sharetrace_giraph_spark import datagen
from sharetrace_giraph_spark.algorithms import final_scores, risk_propagation
from sharetrace_giraph_spark.operators import edges as E

from .reference_impl import risk_prop_py


@pytest.fixture(scope="module")
def fixture_inputs(spark):
    t = datagen.tiny_fixture_transcripts(spark)
    contacts = E.derive_contacts(t).persist()
    scores = datagen.tiny_fixture_scores(spark)
    contacts_py = {
        (r.src, r.dst): [(int(o.time.timestamp()), o.duration_ms) for o in r.occurrences]
        for r in contacts.collect()
    }
    scores_py = {
        a: [(day * 86400, v) for day, v in hist]
        for a, hist in datagen.FIXTURE_SCORES.items()
    }
    return contacts, scores, contacts_py, scores_py


@pytest.mark.parametrize("rate", [1.0, 0.8])
def test_risk_propagation_matches_oracle(spark, ckpt, fixture_inputs, rate):
    contacts, scores, contacts_py, scores_py = fixture_inputs
    res = risk_propagation(
        spark, contacts, scores, ckpt, run_id=f"rp-{rate}", transmission_rate=rate
    )
    exp_state, exp_out = risk_prop_py(contacts_py, scores_py, transmission_rate=rate)

    got_state = {
        r.vertex_id: {
            (int(s.update_time.timestamp()), round(s.value, 12), s.origin_id)
            for s in r.scores
        }
        for r in res.state.collect()
    }
    exp_state_rounded = {
        a: {(ut, round(val, 12), o) for ut, val, o in ss} for a, ss in exp_state.items()
    }
    assert got_state == exp_state_rounded

    out = {
        r.vertex_id: (round(r.value, 12), int(r.update_time.timestamp()))
        for r in final_scores(res.state).collect()
    }
    exp_out_rounded = {a: (round(v, 12), ut) for a, (v, ut) in exp_out.items()}
    assert out == exp_out_rounded


def test_risk_propagation_semantics_sanity(spark, ckpt, fixture_inputs):
    """Hand-checked semantics: A1 relays the max under NATURAL order
    (update_time first, AbstractRiskScore.java:57-67), i.e. the most
    *recent* admissible score, not the highest value. Actor 2's admissible
    scores toward 4 (contact cutoff day 18414) are (18412, 1.0) and
    (18413, 0.7) → the relay is 0.7; actor 4's final output value is
    max(own 0.6, incoming 0.7) = 0.7 under the OUTPUT (value-first)
    comparator. Actor 2 keeps its own 1.0."""
    contacts, scores, *_ = fixture_inputs
    res = risk_propagation(spark, contacts, scores, ckpt, run_id="rp-sanity")
    out = {r.vertex_id: r.value for r in final_scores(res.state).collect()}
    assert out["2"] == 1.0
    assert out["4"] == 0.7
