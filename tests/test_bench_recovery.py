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


def _load_diskbound():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "diskbound", "/root/repo/tools/diskbound.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_phase_report_attributes_aborted_phase_to_child_exit(tmp_path):
    """A phase the abort valve cuts short leaves an entry stamp
    (t1 null) with no exit stamp; the report must charge its partial
    window to the phase — marked aborted — rather than folding it
    into the synthetic readout remainder (the first sf1000d day-0
    abort reported 1490 s of day-0 work as 'readout')."""
    import json

    db = _load_diskbound()
    log = tmp_path / "phases.jsonl"
    log.write_text(
        json.dumps({"phase": "day0", "t0": 100.0, "t1": None})
        + "\n"
        + json.dumps({"phase": "day0", "t0": 100.0, "t1": 200.0})
        + "\n"
        + json.dumps({"phase": "day1", "t0": 200.0, "t1": None})
        + "\n"
    )
    samples = [(float(t), (t - 90) * 2**30) for t in range(95, 260, 5)]
    report = db._phase_report(str(log), samples, 250.0)
    assert set(report) == {"day0", "day1 (aborted)"}
    assert report["day0"]["wall_sec"] == 100.0
    assert report["day1 (aborted)"]["wall_sec"] == 50.0
    # no spurious synthetic readout after an aborted tail phase
    assert "readout" not in report


def test_phase_report_closed_windows_still_get_readout(tmp_path):
    import json

    db = _load_diskbound()
    log = tmp_path / "phases.jsonl"
    log.write_text(
        json.dumps({"phase": "day0", "t0": 100.0, "t1": None})
        + "\n"
        + json.dumps({"phase": "day0", "t0": 100.0, "t1": 200.0})
        + "\n"
    )
    samples = [(float(t), (t - 90) * 2**30) for t in range(95, 260, 5)]
    report = db._phase_report(str(log), samples, 250.0)
    assert set(report) == {"day0", "readout"}
    assert report["readout"]["wall_sec"] == 50.0


def test_time_query_leaves_no_persistent_rdds(spark):
    """_time_query must drop every persisted RDD block after the wall
    is captured (r13 measurement hygiene): the shared-subtree
    localCheckpoints several queries build are never unpersisted by
    the query itself, and leftovers accumulating across a 60-query
    bench JVM compete with execution memory, polluting later
    queries' timings.  (This one test does use the session fixture,
    unlike the pure-python salvage tests above.)"""
    from bench import _time_query
    from distributed_system_spark.queries import load_all

    registry = load_all()
    # dedup_minhash_ctrl builds several localCheckpoints (band table,
    # token-set table) — representative of the leftover class.
    t = _time_query(
        spark, registry, "dedup_minhash_ctrl", "/root/testdata/sf0.001"
    )
    assert t > 0
    leftover = spark.sparkContext._jsc.getPersistentRDDs().size()
    assert leftover == 0, f"{leftover} persisted RDDs survived"
