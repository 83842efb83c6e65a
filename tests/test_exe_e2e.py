"""Exe-fidelity E2E golden test — the full analog of the reference's
flagship flow (tests/maplejuice.cpp:208-255):

    exe put into the DFS (maple_client.cpp:26)
      -> fetched + chmod before exec (mj_worker.cpp:310-316)
      -> maple: input lines piped through the REAL external tokenizer
         (run_command line pipe, mj_worker.cpp:452-491)
      -> intermediate keyed buckets (per-key files, mj_worker.cpp:354-365)
      -> juice: the REAL external summer invoked per key with the
         key's values (processor.cpp:43-64)
      -> golden sort-then-diff against the known-good word count
         (maplejuice_test::diff_files, tests/maplejuice.cpp:249-255)

The external programs are single-line POSIX awk scripts reproducing
wc_maple.cpp:9-49 / wc_juice.cpp:9-44 semantics exactly (single-char
separators, empty tokens counted, last-empty dropped, alnum sanitize,
error-tolerant integer sum).  The golden reference is the declarative
DataFrame ``wordcount`` — asserting the exe pipeline and the Catalyst
pipeline agree bit for bit, which is the strongest form of the
reference's golden-file diff.
"""

from __future__ import annotations

import os
import subprocess
from collections.abc import Iterator

import pyspark.sql.functions as F

from distributed_system_spark.functions.kv import kv_decode
from distributed_system_spark.operators.maplejuice import (
    pipe_lines,
    write_keyed_buckets,
)
from distributed_system_spark.queries.maplejuice_q import doc_lines
from distributed_system_spark.queries.wordcount_q import wordcount
from distributed_system_spark.sources.store import DatasetStore

# wc_maple.cpp:24-49: per-invocation (= per input chunk) combine of
# sanitized token counts; consecutive separators emit empty tokens
# which COUNT, the trailing empty token does not.
WC_MAPLE_SH = (
    "awk '{ n = split($0, a, /[ \\t\\r\\v\\f]/);"
    ' if (n > 0 && a[n] == "") n--;'
    " for (i = 1; i <= n; i++) {"
    " w = a[i]; gsub(/[^0-9a-zA-Z]/, \"\", w); c[w]++ } }"
    ' END { for (w in c) print w " " c[w] }\''
)

# wc_juice.cpp:9-44: sum integer partials for ONE key (argv key, values
# on stdin), emitting "<key> <total>".
WC_JUICE_SH = 'awk -v k="$1" \'{ s += $1 + 0 } END { printf "%s %d\\n", k, s }\''


def _ship_exe(store: DatasetStore, spark, name: str, body: str, tmp) -> str:
    """exe put -> get -> chmod, the reference's distribution protocol
    (maple_client.cpp:26 put; mj_worker.cpp:310-316 fetch+chmod+exec).
    Single-line scripts: DFS text datasets are order-free."""
    store.put(spark.createDataFrame([(body,)], "value string"), f"mje/{name}")
    fetched = store.get(f"mje/{name}").collect()
    assert [r["value"] for r in fetched] == [body]
    local = os.path.join(str(tmp), name)
    with open(local, "w") as fh:
        fh.write(fetched[0]["value"] + "\n")
    os.chmod(local, 0o755)
    return local


def test_exe_wordcount_golden_flow(spark, sf_dir, tmp_path):
    store = DatasetStore(spark, str(tmp_path / "sdfs"), fmt="text")

    # -- stage inputs into the DFS (tests/maplejuice.cpp:230-234) -----
    lines = doc_lines(spark, sf_dir)
    store.put(lines.withColumnRenamed("line", "value"), "wc_data/corpus")
    maple_exe = _ship_exe(store, spark, "wc_maple.sh", WC_MAPLE_SH, tmp_path)
    juice_exe = _ship_exe(store, spark, "wc_juice.sh", WC_JUICE_SH, tmp_path)

    # -- maple: pipe corpus lines through the real tokenizer ----------
    kv_lines = pipe_lines(store.get("wc_data/corpus"), f"sh {maple_exe}")
    kv = kv_lines.select(kv_decode("line").alias("kv")).select(
        F.col("kv.key").alias("key"), F.col("kv.value").alias("value")
    )

    # -- intermediate: keyed bucket files (mj_worker.cpp:354-365) -----
    inter_path = str(tmp_path / "intermediate")
    write_keyed_buckets(kv, inter_path, num_buckets=8)
    inter = spark.read.parquet(inter_path).select("key", "value")

    # -- juice: real external summer, once per key --------------------
    def juice_with_exe(key: str, values: list[str]) -> Iterator[tuple[str, str]]:
        out = subprocess.run(
            ["sh", juice_exe, key],
            input="".join(v + "\n" for v in values),
            capture_output=True,
            text=True,
            check=True,  # nonzero exit -> task failure (A13)
        )
        for line in out.stdout.splitlines():
            k, _, v = line.partition(" ")
            yield k, v

    from distributed_system_spark.operators.maplejuice import juice

    final = juice(inter, juice_with_exe, num_partitions=8)

    # -- golden sort-then-diff (tests/maplejuice.cpp:249-255) ---------
    got = sorted(
        (r["key"], int(r["value"])) for r in final.collect()
    )
    golden = sorted(
        (r["word"], r["cnt"]) for r in wordcount(spark, sf_dir).collect()
    )
    assert got == golden
    assert len(golden) > 0


def test_exe_flow_with_hostile_keys_per_key_files(spark, tmp_path):
    """Reference-parity intermediate layout: ONE DFS file per distinct
    key, the key escaped into the filename (mj_worker.cpp:354-365
    naming + sdfs.cpp:34-48 convert_path).  Keys here are URL-ish
    paths full of '/' and '%' — exactly what a real map exe emits and
    exactly what breaks a naive key-as-filename store.  (Keys with
    spaces can't ride the line protocol — same limitation as the
    reference's '<key> <value>' format; the store-level escaping test
    covers them.)  The scalable path stays write_keyed_buckets; this
    pins the small-cardinality literal layout.
    """
    from distributed_system_spark.sources.store import (
        escape_key,
        unescape_key,
    )

    store = DatasetStore(spark, str(tmp_path / "sdfs"), fmt="text")
    hits = [
        "/index.html", "/a/b%20c.html", "/a/b%20c.html", "/pct%%/x",
        "/index.html", "/a/b%20c.html", "/deep/a/b/c/d.png",
    ]
    store.put(
        spark.createDataFrame([(h,) for h in hits], "value string"),
        "hits/log",
    )
    maple_exe = _ship_exe(
        store, spark, "path_maple.sh", "awk '{ print $1 \" \" 1 }'", tmp_path
    )
    kv_lines = pipe_lines(store.get("hits/log"), f"sh {maple_exe}")
    kv = kv_lines.select(kv_decode("line").alias("kv")).select(
        F.col("kv.key").alias("key"), F.col("kv.value").alias("value")
    )

    # per-key files, reference layout: key -> escaped filename
    keys = [r["key"] for r in kv.select("key").distinct().collect()]
    for k in keys:
        store.put(
            kv.filter(F.col("key") == k).select(
                F.col("value").alias("value")
            ),
            f"wc_inter/{escape_key(k)}",
        )
    listed = store.ls_files("wc_inter")
    assert sorted(unescape_key(n) for n in listed) == sorted(keys)
    assert all("/" not in n for n in listed)

    juice_exe = _ship_exe(store, spark, "wc_juice.sh", WC_JUICE_SH, tmp_path)
    got = {}
    for name in listed:
        key = unescape_key(name)
        values = [
            r["value"] for r in store.get(f"wc_inter/{name}").collect()
        ]
        out = subprocess.run(
            ["sh", juice_exe, key],
            input="".join(v + "\n" for v in values),
            capture_output=True,
            text=True,
            check=True,
        )
        k, _, v = out.stdout.strip().partition(" ")
        got[k] = int(v)
    from collections import Counter

    assert got == dict(Counter(hits))
