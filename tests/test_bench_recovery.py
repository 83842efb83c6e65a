"""bench.py helper coverage: the truncated-record salvage path the
r9 ADVICE item hardened — pure-python, no Spark session."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from bench import _recover_times_from_tail  # noqa: E402


def test_recovers_old_format_with_spaces():
    tail = '..."queries": {"q1": 1.25, "wordcount": 0.5}, "sf": "sf0.1"}'
    assert _recover_times_from_tail(tail) == {"q1": 1.25, "wordcount": 0.5}


def test_recovers_compact_format_sf_before_queries():
    # current output: compact separators AND "sf" emitted BEFORE
    # "queries" — the old cut-at-"sf" heuristic returned {} here
    tail = '{"metric":"headline","value":12.5,"unit":"sec","sf":"sf0.1","queries":{"q1":1.25,"dedup_simhash":2.75}}'
    assert _recover_times_from_tail(tail) == {
        "q1": 1.25,
        "dedup_simhash": 2.75,
    }


def test_delta_and_retime_ratios_never_mistaken_for_seconds():
    tail = (
        '"queries":{"q1":1.25},"deltas":{"q1":9.9},'
        '"retimes":{"q1":[7.0,3.0]},"regressions":[]}'
    )
    assert _recover_times_from_tail(tail) == {"q1": 1.25}


def test_truncated_queries_key_falls_back_without_ratio_pollution():
    # the "queries" key itself was cut away; only a later section
    # survives — must not read delta ratios as seconds
    tail = ':1.25},"deltas":{"q1":9.9},"regressions":[]}'
    out = _recover_times_from_tail(tail)
    assert out == {}
