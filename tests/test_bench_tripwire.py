"""The bench drift tripwire (round-6 VERDICT task 7) must fire when a
median exceeds the previous round's recorded max spread, stay silent
inside the spread, and never crash on malformed/missing history."""

from __future__ import annotations

import json

from bench import _drift_vs_previous_round


def _latest_bench():
    import glob

    files = sorted(glob.glob("BENCH_r*.json"))
    assert files, "committed bench artifacts should exist"
    with open(files[-1]) as f:
        data = json.load(f)
    return files[-1], data.get("parsed", data)


def test_tripwire_silent_within_prior_spread():
    _, prev = _latest_bench()
    name, med = next(iter(prev["queries"].items()))
    hi = max(prev["spread"][name])
    assert _drift_vs_previous_round({name: hi}) == []


def test_tripwire_fires_past_prior_spread():
    tag, prev = _latest_bench()
    name = next(iter(prev["queries"]))
    hi = max(prev["spread"][name])
    warnings = _drift_vs_previous_round({name: hi * 2})
    assert len(warnings) == 1
    assert name in warnings[0] and tag in warnings[0]


def test_tripwire_ignores_unknown_queries():
    # a brand-new headline query has no history — no warning, no crash
    assert _drift_vs_previous_round({"brand_new_query": 1.0}) == []
