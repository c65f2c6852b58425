"""Quiet-host min-of-k re-measure of named headline queries under r08
bench conditions (r09 VERDICT task 3).

Replays bench.py's exact session setup (tuned get_spark, table-footer
warmup, staged shingle cache) and runs the FULL 48-query headline block
in bench order — so per-query session state matches what the driver's
bench run sees — but takes min-of-K warm passes (default 3) instead of
2, and prints a comparison table against a reference BENCH_r*.json's
driver-parsed times.

Usage:
  python tools/headline_remeasure.py [--ref BENCH_r08.json] [--k 3] \
      [name ...]          # names default to ALL 48 headline queries
Exit 0 always (diagnostic, not a gate); the table is the deliverable.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    ref_path, k = "BENCH_r08.json", 3
    names: list[str] = []
    it = iter(args)
    for a in it:
        if a == "--ref":
            ref_path = next(it)
        elif a == "--k":
            k = int(next(it))
        else:
            names.append(a)

    import bench
    from datalake_imagenes_georreferenciadas_spark.operators.dedup import (
        _exploded_shingles,
    )
    from datalake_imagenes_georreferenciadas_spark.plans.queries import all_queries
    from datalake_imagenes_georreferenciadas_spark.session import get_spark
    from datalake_imagenes_georreferenciadas_spark.tables import TABLE_NAMES
    from datalake_imagenes_georreferenciadas_spark.tables import table as load

    with open(os.path.join("/root/repo", ref_path)) as fh:
        ref = json.load(fh)["parsed"]["queries"]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("remeasure")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    for t in TABLE_NAMES:
        load(spark, sf_dir, t).count()
    shingle_base = _exploded_shingles(load(spark, sf_dir, "documents"), "doc_id", "text", 3)
    shingle_base.cache()
    shingle_base.count()

    focus = set(names) if names else set(bench.BENCH_QUERIES)
    rows = []
    for name in bench.BENCH_QUERIES:
        bench.materialize(queries[name](spark, sf_dir))  # cold pass
        passes = []
        for _ in range(k):
            t0 = time.time()
            bench.materialize(queries[name](spark, sf_dir))
            passes.append(time.time() - t0)
        warm = round(min(passes), 3)
        if name in focus and name in ref:
            ratio = warm / ref[name] if ref[name] else float("inf")
            verdict = "ok" if ratio <= 1.25 else "SLOW"
            rows.append((name, ref[name], warm, ratio, verdict))
            print(
                f"{name:28s} ref={ref[name]:6.3f} now={warm:6.3f} "
                f"ratio={ratio:4.2f} {verdict}",
                flush=True,
            )
    slow = [r for r in rows if r[4] == "SLOW"]
    print(f"\n{len(rows)} measured, {len(slow)} over 1.25x vs {ref_path}")
    if slow:
        print("over-threshold:", [r[0] for r in slow])
    return 0


if __name__ == "__main__":
    sys.exit(main())
