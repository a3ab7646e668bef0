"""Unit tests for bench.py's ambient-drift gate trigger logic.

The gate decision is pure (drift_probe_names) so it can be pinned
without running Spark. The scenarios mirror the two real incidents the
gate exists for:

- r8: every query drifted ~20-30% uniformly — under the 2× per-query
  anomaly threshold, but the total moved +26% (total trigger).
- r12: q1 drifted +46% while q9 genuinely improved −16%, holding the
  total at +14.8% — under the old total-only trigger, which therefore
  stayed silent (per-query trigger, VERDICT r12 #1).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import drift_probe_names  # noqa: E402


PREV = {
    "q1": 0.10,
    "q2": 0.10,
    "q3": 0.20,
    "q4": 0.25,
    "q5": 0.35,
    "q9": 0.60,
}
PREV_TOTAL = sum(PREV.values())


def test_in_band_no_probe():
    timings = {n: v * 1.05 for n, v in PREV.items()}
    total = sum(timings.values())
    assert drift_probe_names(timings, PREV, PREV_TOTAL, total, {}) == []


def test_no_previous_round_no_probe():
    timings = dict(PREV)
    assert drift_probe_names(timings, {}, None, sum(timings.values()), {}) == []


def test_uniform_drift_fires_total_trigger():
    # the r8 pattern: everything +22%, no single query past the
    # per-query 25% bar, total way out of band
    timings = {n: v * 1.22 for n, v in PREV.items()}
    total = sum(timings.values())
    names = drift_probe_names(timings, PREV, PREV_TOTAL, total, {})
    assert len(names) == 3


def test_masked_per_query_drift_fires_new_trigger():
    # the r12 masking pattern: q1 +46%, q2 +34% while q9 improves −16%
    # and drags the total back under +15% — the OLD total-only gate
    # stayed silent here; the new per-query trigger must fire and the
    # probe set must lead with the drifted queries themselves.
    timings = dict(PREV)
    timings["q1"] = PREV["q1"] * 1.46
    timings["q2"] = PREV["q2"] * 1.34
    timings["q9"] = PREV["q9"] * 0.84
    total = sum(timings.values())
    assert 0.85 <= total / PREV_TOTAL <= 1.15  # the mask is real
    names = drift_probe_names(timings, PREV, PREV_TOTAL, total, {})
    assert set(names[:2]) == {"q1", "q2"}  # drifted queries probed first
    assert len(names) == 3  # padded with the cheapest remaining query


def test_anomaly_reruns_suppress_total_trigger_but_not_listing():
    # a query already re-measured by the 2× anomaly gate carries its
    # own first/rerun evidence: it must not appear in the probe set,
    # and the total trigger (which requires anomalies == {}) stays off.
    timings = {n: v * 1.20 for n, v in PREV.items()}
    total = sum(timings.values())
    anomalies = {"q1": {"prev": PREV["q1"], "first": 0.3, "rerun": 0.1}}
    names = drift_probe_names(timings, PREV, PREV_TOTAL, total, anomalies)
    assert names == []  # no >25% drifted rows outside the anomaly


def test_single_large_drift_probes_that_query():
    # one expensive query moves +30% with the rest flat: the total
    # stays in band, the per-query trigger fires, and the probe set
    # contains the drifted query (the old gate probed only the 3
    # cheapest, which would have missed it).
    timings = dict(PREV)
    timings["q9"] = PREV["q9"] * 1.30
    total = sum(timings.values())
    assert 0.85 <= total / PREV_TOTAL <= 1.15
    names = drift_probe_names(timings, PREV, PREV_TOTAL, total, {})
    assert "q9" in names
    assert len(names) == 3


def test_improvement_drift_also_probes():
    # a query 30% FASTER with no code change is the same ambient
    # signature in the other direction — the gate is symmetric.
    timings = dict(PREV)
    timings["q5"] = PREV["q5"] * 0.70
    total = sum(timings.values())
    names = drift_probe_names(timings, PREV, PREV_TOTAL, total, {})
    assert "q5" in names


def test_query_missing_from_prev_is_ignored():
    # a brand-new query has no previous-round figure to drift from
    timings = dict(PREV)
    timings["q_new"] = 5.0
    total = sum(timings.values())
    names = drift_probe_names(timings, PREV, PREV_TOTAL, total, {})
    assert names == []


# --- ambient_verdict: who gets to vote --------------------------------

from bench import ambient_verdict, drifted_queries  # noqa: E402


def test_padding_probes_do_not_vote():
    # the review finding: q9 regresses reproducibly +30%, q1/q2 are
    # padding that never left the band — their probes trivially
    # 'return' and must NOT produce an ambient label
    firsts = {"q9": PREV["q9"] * 1.30, "q1": PREV["q1"], "q2": PREV["q2"]}
    probes = {"q9": PREV["q9"] * 1.28, "q1": PREV["q1"], "q2": PREV["q2"]}
    drifted = drifted_queries(firsts, PREV, {})
    assert drifted == ["q9"]
    assert ambient_verdict(probes, firsts, PREV, drifted) is False


def test_drifted_probe_back_in_band_is_ambient():
    firsts = {"q9": PREV["q9"] * 1.30, "q1": PREV["q1"], "q2": PREV["q2"]}
    probes = {"q9": PREV["q9"] * 1.05, "q1": PREV["q1"], "q2": PREV["q2"]}
    assert ambient_verdict(probes, firsts, PREV,
                           drifted_queries(firsts, PREV, {})) is True


def test_aged_jvm_stall_signature_counts_as_returned():
    # an operator query's end-of-process probe cannot re-reach the
    # young-JVM band, but improving >=20% on its own first pass is the
    # immediate-stall signature and still reads ambient
    firsts = {"q9": PREV["q9"] * 1.60}
    probes = {"q9": PREV["q9"] * 1.20}  # out of band, but 25% < first
    assert ambient_verdict(probes, firsts, PREV, ["q9"]) is True


def test_stall_signature_capped_at_125pct_of_prev():
    # ADVICE r13: a genuine regression with >=20% run-to-run variance
    # must not auto-label itself ambient purely by bouncing off its own
    # stalled first pass — the stall signature only counts when the
    # probe is ALSO within an absolute 1.25x of the previous round.
    firsts = {"q9": PREV["q9"] * 2.00}
    probes = {"q9": PREV["q9"] * 1.40}  # 30% better than first: 'stall'
    assert ambient_verdict(probes, firsts, PREV, ["q9"]) is False


def test_stall_only_returns_recorded_separately():
    # the artifact must distinguish a stall-signature return from a
    # band re-entry: q9 returned via the capped stall signature only,
    # q1 re-entered the band outright, q2 did not return at all.
    from bench import stall_only_returns

    firsts = {"q9": PREV["q9"] * 1.60, "q1": PREV["q1"] * 1.40,
              "q2": PREV["q2"] * 1.40}
    probes = {"q9": PREV["q9"] * 1.20, "q1": PREV["q1"] * 1.05,
              "q2": PREV["q2"] * 1.38}
    assert stall_only_returns(probes, firsts, PREV) == ["q9"]


def test_stall_only_returns_excludes_padding_probes():
    # r14 review: with drifted non-empty only the VOTING probes are
    # scanned — a padding probe that happens to match the stall shape
    # (first 1.2x prev, probe 0.8x prev: >=20% better than first, under
    # the 1.25x cap, below the 0.85 band floor) must not be annotated
    # as a stall-only return it never cast.
    from bench import stall_only_returns

    firsts = {"q9": PREV["q9"] * 1.60, "q1": PREV["q1"] * 1.20}
    probes = {"q9": PREV["q9"] * 1.20, "q1": PREV["q1"] * 0.80}
    assert stall_only_returns(probes, firsts, PREV) == ["q1", "q9"]
    assert stall_only_returns(probes, firsts, PREV, ["q9"]) == ["q9"]


def test_all_drifted_queries_probed_not_just_three():
    # r14 review: the former [:3] cap let a >=4-query drift earn the
    # ambient label with its most expensive drifted queries never
    # re-measured. Every drifted query must appear in the probe set.
    timings = {n: v * 1.40 for n, v in PREV.items()}  # all 6 drift
    total = sum(timings.values())
    names = drift_probe_names(timings, PREV, PREV_TOTAL, total, {})
    assert set(names) == set(PREV)  # all drifted queries probed
    # and the small-drift case still pads up to 3 probes
    t2 = dict(PREV)
    t2["q9"] = PREV["q9"] * 1.30
    names2 = drift_probe_names(t2, PREV, PREV_TOTAL, sum(t2.values()), {})
    assert "q9" in names2 and len(names2) == 3


def test_probe_slower_both_ways_reads_reproducible():
    firsts = {"q9": PREV["q9"] * 1.30}
    probes = {"q9": PREV["q9"] * 1.35}
    assert ambient_verdict(probes, firsts, PREV, ["q9"]) is False


def test_two_drifted_one_returns_one_does_not():
    # ALL drifted probes must return for the ambient label
    firsts = {"q1": PREV["q1"] * 1.40, "q2": PREV["q2"] * 1.40}
    probes = {"q1": PREV["q1"] * 1.02, "q2": PREV["q2"] * 1.38,
              "q3": PREV["q3"]}
    assert ambient_verdict(probes, firsts, PREV, ["q1", "q2"]) is False


def test_uniform_total_trigger_keeps_majority_rule():
    # no per-query drift (the r8 pattern): every probe is signal and
    # the original >=2-of-3 in-band rule applies
    firsts = {n: v * 1.2 for n, v in PREV.items()}
    probes = {"q1": PREV["q1"], "q2": PREV["q2"], "q3": PREV["q3"] * 1.4}
    assert ambient_verdict(probes, firsts, PREV, []) is True
    probes_bad = {n: v * 1.4 for n, v in
                  list(PREV.items())[:3]}
    assert ambient_verdict(probes_bad, firsts, PREV, []) is False
