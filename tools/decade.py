"""Measure wall-clock scale ratios across a data decade.

Runs each named registry query against two sf directories (default:
the shipped sf0.1 and the manufactured /tmp/dss-scale/sf1 from
tools/scaleup.py) with bench.py's methodology — noop sink so every
output column is computed but no sink cost, one warmup action, warm
best-of-N at BOTH SFs — and prints one table row per query plus a
JSON line.  Large-side best-of-N is not optional at the fourth
decade: identical-plan, identical-shuffle-volume runs of the same
query in one warm JVM measured 21.8-65 s (3x band) at 2 M vectors —
single-JVM local mode stacks driver, 32 executor threads, sort
spill, and Python workers on one heap, and JIT/GC interplay swings
stage CPU 5x with byte-identical I/O (event-log task metrics,
SCALE.md fourth decade).  The min is the schedulable cost; the band
is harness noise, not query cost.

Usage:
  python tools/scaleup.py                       # build /tmp/dss-scale/sf1
  python tools/decade.py q1_pricing wordcount   # measure named queries
  python tools/decade.py --all-headline         # bench.py's HEADLINE set

SPARK_GRAFT_DRIVER_MEM=16g is the documented sizing for the sf1 run
(one JVM holds driver + 32 executor threads at 60M lineitem rows);
set it BEFORE launching — session.py warns if the live JVM is smaller.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distributed_system_spark.queries import load_all  # noqa: E402
from distributed_system_spark.session import get_spark  # noqa: E402

SMALL = os.environ.get("DECADE_SMALL", "/root/testdata/sf0.1")
LARGE = os.environ.get("DECADE_LARGE", "/tmp/dss-scale/sf1")
BEST_OF = int(os.environ.get("DECADE_BEST_OF", "3"))
# Large-side repeat count, separately tunable: the text family's
# fourth-decade runs are 5-20 MINUTES each, where best-of-3 would
# cost more wall than it buys precision — best-of-2 bounds the JIT/GC
# band while keeping a decade sweep under an hour.
BEST_OF_LARGE = int(os.environ.get("DECADE_BEST_OF_LARGE", str(BEST_OF)))


def _run(q, spark, sf_dir: str) -> float:
    t0 = time.time()
    q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> int:
    names = sys.argv[1:]
    if names and names[0] == "--all-headline":
        from bench import HEADLINE

        names = HEADLINE + names[1:]
    if not names:
        print(__doc__)
        return 2
    registry = load_all()
    unknown = [n for n in names if n not in registry]
    if unknown:
        print(f"unknown queries: {unknown}")
        return 2
    spark = get_spark("decade")
    spark.read.parquet(f"{SMALL}/lineitem.parquet").count()  # warmup

    rows = {}
    for name in names:
        q = registry[name]
        small = min(_run(q, spark, SMALL) for _ in range(BEST_OF))
        large = min(_run(q, spark, LARGE) for _ in range(BEST_OF_LARGE))
        # Guard the table print with the same small>0 check as the rows
        # entry — a zero best-of-N timing must not abort the run (and
        # lose every prior measurement) before the JSON line prints.
        ratio = round(large / small, 1) if small > 0 else None
        rows[name] = {
            "small_s": round(small, 2),
            "large_s": round(large, 2),
            "ratio": ratio,
        }
        ratio_str = f"{ratio:.1f}x" if ratio is not None else "n/a"
        print(
            f"| {name} | {small:.2f} s | {large:.2f} s | {ratio_str} |",
            flush=True,
        )
    print(json.dumps({"small": SMALL, "large": LARGE, "queries": rows}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
