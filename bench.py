"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: ``{"metric": ..., "value": N, "unit": "sec", "queries":
{name: sec, ...}, "sf": ...}``.

Each query is collected (full materialization) and timed wall-clock;
``value`` is the total. A small warmup query first amortizes JVM/codegen
startup so per-query numbers reflect steady-state plan execution.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from datalake_imagenes_georreferenciadas_spark.plans.queries import all_queries
from datalake_imagenes_georreferenciadas_spark.session import get_spark

# Headline set: one per operator family, the shapes that dominate a real
# workload (scan-heavy agg, 3-way join, window, dedup, ANN, geo, text).
BENCH_QUERIES = [
    "catalog_filtered_join",
    "a4_group_agg",
    "a4_count_distinct",
    "w1_topk_per_group",
    "w2_running_sum",
    "p5_filter_in_conj",
    "j1_semi_join",
    "j_asof_join",
    "j_range_join",
    "f17_cosine_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "dedup_exact",
    "dedup_minhash_bands",
    "dedup_near_pairs",
    "dedup_ngram_jaccard",
    "simhash_fingerprints",
    "text_stats",
    "text_lang_agg",
    "geo_classify",
    "geo_classify_bulk",
    "session_stats",
    "tumbling_window_agg",
    "skew_salted_join",
    "tpch_q3_shape",
    "tpch_q5_shape",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    queries = all_queries()
    # warmup: touch every table's footer + one count so per-query timings
    # reflect steady-state plan execution, not scan initialization
    from datalake_imagenes_georreferenciadas_spark.tables import TABLE_NAMES, table as load

    for t in TABLE_NAMES:
        load(spark, sf_dir, t).count()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.time()
        n = queries[name](spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    sf = os.path.basename(sf_dir.rstrip("/")).removeprefix("sf")
    print(
        json.dumps(
            {
                "metric": "total_bench_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
