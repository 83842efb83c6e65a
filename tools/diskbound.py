"""Measure one registry query's wall-clock AND peak scratch disk.

The scale decades beyond sf10 are disk-bound before they are
CPU-bound on one node (SCALE.md rounds 10-11: the one-shot
dedup_substring_chains ran OUT OF DISK at sf1000d; its sliced twin
completed at 50.3 GB peak).  bench.py and tools/decade.py measure
wall only; this harness is the committed form of the round-11
watermark methodology:

- the query runs in a SEPARATE process (fresh JVM — no shuffle files
  or broadcast state inherited from a warm session) with
  ``SPARK_GRAFT_DRIVER_MEM`` (default 16g) and an ISOLATED
  ``SPARK_LOCAL_DIRS`` scratch root, so every blockmgr/spill byte it
  writes is attributable to it;
- the parent samples ``du`` over that scratch root PLUS the query's
  own /tmp staging roots (the *_sliced forms stage per-slice parquet
  under ``/tmp/dss-*-p<pid>``) every ``--sample`` seconds — the peak
  of that sum is the single-node disk requirement the SCALE.md
  tables report;
- the parent watches filesystem free space and kills the child
  before the disk fills (``--min-free-gb``, default 6), reporting
  ABORTED instead of wedging the machine — the round-11 sf1000d
  capped attempt was killed by hand at 19 GB free; this automates
  that valve.

Usage:
  python tools/diskbound.py dedup_substring_chains_sliced \
      /tmp/dss-scale/sf1000d --mem 16g --sample 5
  SPARK_GRAFT_LSH_SLICES=8 python tools/diskbound.py \
      dedup_incremental_capped_sliced /tmp/dss-scale/sf1000d

Prints a timeline line per sample and ONE final JSON line:
  {"query": ..., "sf_dir": ..., "wall_sec": ..., "peak_scratch_gb":
   ..., "rows": ..., "status": "completed"|"aborted"|"failed"}
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _du_bytes(paths: list[str]) -> int:
    total = 0
    for p in paths:
        for root, _dirs, files in os.walk(p, onerror=lambda e: None):
            for f in files:
                try:
                    total += os.path.getsize(os.path.join(root, f))
                except OSError:
                    pass
    return total


def _child(name: str, sf_dir: str) -> int:
    sys.path.insert(0, REPO)
    from distributed_system_spark.queries import load_all
    from distributed_system_spark.session import get_spark

    q = load_all()[name]
    spark = get_spark(f"diskbound-{name}")
    t0 = time.time()
    df = q.fn(spark, sf_dir)
    # Force the WHOLE plan, not just a row count: under count()
    # Catalyst eliminates a final LEFT OUTER JOIN whose right side
    # has a unique join key (e.g. the substring span report's
    # per-doc aggregate), silently skipping the entire dup-detection
    # subtree — measured 2026-08-17: the one-shot substring form
    # "ran" sf100d in 8.1 s under count() vs 188 s for its sliced
    # twin computing the same answer.  Hashing every column in the
    # same aggregate pins all joins and all columns into the
    # executed plan (the count rides along in one pass), matching
    # bench.py/decade.py's noop-write semantics while still
    # reporting the row count.
    from pyspark.sql import functions as F

    try:
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64(*df.columns)).alias("fp"),
        ).collect()[0]
        n = row["n"]
    except Exception:
        # xxhash64 rejects MapType columns — fall back to the plain
        # count for those shapes (none of the currently-measured
        # queries return maps; the fallback keeps the harness total).
        n = df.count()
    wall = time.time() - t0
    print(json.dumps({"child_wall_sec": round(wall, 1), "rows": n}))
    return 0


def _kill_tree(child: "subprocess.Popen") -> None:
    """SIGKILL the child's whole process group (it was started with
    start_new_session=True, so the group is exactly its tree: the
    Python driver AND the Spark JVM it launched)."""
    import signal

    try:
        os.killpg(child.pid, signal.SIGKILL)
    except (ProcessLookupError, PermissionError):
        child.kill()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("sf_dir")
    ap.add_argument("--mem", default="16g")
    ap.add_argument("--sample", type=float, default=5.0)
    ap.add_argument("--min-free-gb", type=float, default=6.0)
    ap.add_argument("--child", action="store_true", help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.child:
        return _child(args.query, args.sf_dir)

    scratch = f"/tmp/dss-diskbound-{os.getpid()}"
    os.makedirs(scratch, exist_ok=True)
    env = dict(os.environ)
    env["SPARK_GRAFT_DRIVER_MEM"] = args.mem
    env["SPARK_LOCAL_DIRS"] = scratch
    # Phase-aware reporting for the incremental/standing-index forms:
    # queries wrapping their eager steps in dedup_q._phase append
    # [t0, t1] windows here; the parent correlates them with its
    # scratch timeline so day-0 build vs per-arriving-batch cost is
    # MEASURED separately (the marginal-cost claim, r12 verdict #1).
    phase_log = os.path.join(scratch, "phases.jsonl")
    env["SPARK_GRAFT_PHASE_LOG"] = phase_log
    # Explicit sequential+gc discipline flag (r13 ADVICE): the phase
    # log implies it for attribution, but the disk discipline is its
    # own requirement under the valve — state it directly.
    env["SPARK_GRAFT_SEQUENTIAL_BATCHES"] = "1"
    # Own process GROUP so the abort valve can kill the whole tree:
    # child.kill() alone leaves the Spark JVM grandchild alive and
    # writing scratch into the nearly-full disk the valve exists to
    # protect, and — because the JVM inherits the stdout pipe —
    # communicate() would block until that orphan exits (r12 ADVICE).
    child = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), args.query,
         args.sf_dir, "--child"],
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        cwd=REPO,
        start_new_session=True,
    )
    peak = 0
    status = "completed"
    t0 = time.time()
    samples: list[tuple[float, int]] = []
    # The *_sliced forms stage under /tmp/dss-*-p<child pid>; their
    # staging is scratch the same as Spark's spill and counts toward
    # the single-node disk requirement.
    staging_glob = f"/tmp/dss-*-p{child.pid}"
    while child.poll() is None:
        paths = [scratch] + glob.glob(staging_glob)
        used = _du_bytes(paths)
        peak = max(peak, used)
        samples.append((time.time(), used))
        free = shutil.disk_usage("/tmp").free
        print(
            f"t={time.time() - t0:7.0f}s scratch={used / 2**30:7.2f}GB "
            f"peak={peak / 2**30:7.2f}GB free={free / 2**30:6.1f}GB",
            flush=True,
        )
        if free < args.min_free_gb * 2**30:
            status = "aborted"
            _kill_tree(child)
            break
        time.sleep(args.sample)
    out = child.communicate()[0] or ""
    wall = time.time() - t0
    rows = None
    for line in out.splitlines():
        if line.startswith('{"child_wall_sec"'):
            d = json.loads(line)
            wall, rows = d["child_wall_sec"], d["rows"]
    if child.returncode not in (0, None) and status != "aborted":
        status = "failed"
        print(out[-4000:])
    phases = _phase_report(phase_log, samples, time.time())
    shutil.rmtree(scratch, ignore_errors=True)
    for p in glob.glob(staging_glob):
        shutil.rmtree(p, ignore_errors=True)
    print(
        json.dumps(
            {
                "query": args.query,
                "sf_dir": args.sf_dir,
                "wall_sec": round(wall, 1),
                "peak_scratch_gb": round(peak / 2**30, 2),
                "rows": rows,
                "status": status,
                **({"phases": phases} if phases else {}),
            }
        )
    )
    return 0 if status == "completed" else 1


def _phase_report(
    phase_log: str,
    samples: list[tuple[float, int]],
    end_ts: float,
) -> dict[str, dict[str, float]]:
    """Per-phase wall and peak scratch from the child's phase windows
    (dedup_q._phase JSON lines) joined against the parent's sampled
    timeline.  Peak attribution widens each window by one sampling
    interval on each side so a spike landing between samples at the
    boundary is charged to the adjacent phase rather than dropped.
    Adds a synthetic ``readout`` phase from the last logged window's
    end to child exit — the lazy merge-on-read the incremental forms
    execute at the caller's action."""
    if not os.path.exists(phase_log):
        return {}
    closed: list[tuple[str, float, float]] = []
    open_starts: list[tuple[str, float]] = []
    with open(phase_log) as fh:
        for line in fh:
            try:
                d = json.loads(line)
                if d["t1"] is None:
                    open_starts.append((d["phase"], d["t0"]))
                else:
                    closed.append((d["phase"], d["t0"], d["t1"]))
            except (json.JSONDecodeError, KeyError):
                continue
    # An entry stamp without a matching exit stamp is a phase the
    # abort valve (or a crash) cut short — charge it to child exit so
    # the partial work lands on the right phase, marked aborted.
    closed_keys = {(n, t0) for n, t0, _ in closed}
    windows = closed + [
        (f"{n} (aborted)", t0, end_ts)
        for n, t0 in open_starts
        if (n, t0) not in closed_keys
    ]
    if not windows:
        return {}
    last_t1 = max(t1 for _, _, t1 in windows)
    if end_ts > last_t1:
        windows.append(("readout", last_t1, end_ts))
    slack = 6.0
    if len(samples) >= 2:
        slack = max(slack, samples[1][0] - samples[0][0])
    report: dict[str, dict[str, float]] = {}
    for name, t0, t1 in windows:
        inside = [
            used
            for ts, used in samples
            if t0 - slack <= ts <= t1 + slack
        ]
        report[name] = {
            "wall_sec": round(t1 - t0, 1),
            "peak_scratch_gb": round(max(inside, default=0) / 2**30, 2),
        }
    return report


if __name__ == "__main__":
    raise SystemExit(main())
