"""Three-scale growth measurement (VERDICT r7 item 2): run the most
expensive declared queries at two fixture directories produced by
``tools/gen_scaled_fixtures.py`` (same generation law at both scales,
so the ratio is apples-to-apples) and report per-query growth for a
10x data step.

The suite is overhead-bound at sf0.1 (~0.5-1 s of fixed cost per
query), which is why the sf0.01->sf0.1 table in SCALING.md shows
median growth 1.21x for 10x data — the data term is buried. At sf1
(6M lineitem rows) data dominates, so growth ratios become probative:
a scan-bound query should grow ~<=10x, anything super-linear is a
scale smell that needs a declared reason (x38 is contractually
quadratic in name-block size).

Usage::

    python tools/gen_scaled_fixtures.py --sf 0.1 --out /tmp/scaledata/sf0.1
    python tools/gen_scaled_fixtures.py --sf 1   --out /tmp/scaledata/sf1
    python tools/scale_growth.py --small /tmp/scaledata/sf0.1 \
        --big /tmp/scaledata/sf1 [--queries x90,x04,...]

Timing protocol mirrors bench.py: noop sink (no collect), one untimed
warm-up execution per query per dir, then min of two timed runs.
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

# Top of the committed steady-state bench record (BENCH_LOCAL.json) —
# the queries where scale behavior matters most, by observed cost.
DEFAULT_QUERIES = [
    "x90_curation_pipeline",
    "x04_simhash_near_dups",
    "x72_robust_zscore",
    "x77_cluster_representatives",
    "x02_ngram_jaccard_top_pairs",
    "x70_winsorize",
    "x110_duplicate_spans",
    "x108_bpe_merge_table",
    "x38_fuzzy_name_pairs",
    "x20_dedup_clusters",
    "x89_cluster_aware_split",
    "x03_minhash_lsh_candidates",
    "x102_source_overlap",
    "x112_column_profile",
    "x101_boilerplate_share",
]


def time_query(spark, builder, sf_dir: str) -> float:
    builder(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm-up
    best = float("inf")
    for _ in range(2):
        start = time.perf_counter()
        builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - start)
    return best


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", required=True)
    ap.add_argument("--big", required=True)
    ap.add_argument("--queries", default=None, help="comma-separated registry names")
    args = ap.parse_args()

    from skoltexter_by_ai_spark.plans.registry import all_queries
    from skoltexter_by_ai_spark.session import default_parallelism, get_spark

    sys.path.insert(0, ".")
    from bench import _shuffle_partitions_for  # reuse the bench sizing law

    names = args.queries.split(",") if args.queries else DEFAULT_QUERIES
    registry = all_queries()
    unknown = [n for n in names if n not in registry]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark = get_spark(
        app_name="scale-growth",
        shuffle_partitions=_shuffle_partitions_for(args.big, default_parallelism()),
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    out: dict[str, dict] = {}
    for name in names:
        builder = registry[name].builder
        row: dict = {}
        try:
            row["small_sec"] = round(time_query(spark, builder, args.small), 3)
            row["big_sec"] = round(time_query(spark, builder, args.big), 3)
            row["growth"] = round(row["big_sec"] / max(row["small_sec"], 1e-9), 2)
        except Exception as exc:  # record and continue — partial data beats none
            row["err"] = f"{type(exc).__name__}: {exc}"[:300]
        out[name] = row
        print(f"{name}: {row}", file=sys.stderr)
        # bench.py-style inter-query hygiene: every frame is consumed.
        import gc

        gc.collect()
        for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            rdd.unpersist()
    growths = sorted(r["growth"] for r in out.values() if "growth" in r)
    summary = {
        "small_dir": args.small,
        "big_dir": args.big,
        "n": len(growths),
        "median_growth": growths[len(growths) // 2] if growths else None,
        "queries": out,
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
