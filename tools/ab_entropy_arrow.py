"""A/B: entropy_signals expression form vs Arrow-batched form (VERDICT
r8 item 4). Measures BOTH implementations under FULL result consumption
(noop sink — the measurement-hygiene lesson from the reverted x116
rewrite: `.count()` prunes the projection and measures nothing), plus a
value-parity check.

Usage::

    python tools/ab_entropy_arrow.py [--sf-dir /root/testdata/sf0.1] [--reps 3]
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from skoltexter_by_ai_spark.operators.text_analysis import entropy_signals
    from skoltexter_by_ai_spark.session import get_spark
    from skoltexter_by_ai_spark.sources import load_table

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, args.sf_dir, "documents")

    # value parity first: the two forms must agree exactly
    a = entropy_signals(docs, "doc_id", "text", impl="arrow")
    e = entropy_signals(docs, "doc_id", "text", impl="expr")
    # eqNullSafe, not `!=`: a plain inequality is NULL when either side
    # is NULL, so a NULL-vs-value divergence would never count as a
    # difference (ADVICE r9). Also catch rows one impl drops entirely
    # with a full outer join on the key.
    diff = a.join(e, "doc_id", "full_outer").where(
        ~a.n_chars.eqNullSafe(e.n_chars)
        | ~a.char_entropy.eqNullSafe(e.char_entropy)
        | ~a.token_entropy.eqNullSafe(e.token_entropy)
    )
    n_diff = diff.count()

    timings: dict[str, list[float]] = {"expr": [], "arrow": []}
    for rep in range(args.reps):
        for impl in ("expr", "arrow"):
            gc.collect()
            t0 = time.monotonic()
            entropy_signals(docs, "doc_id", "text", impl=impl).write.format(
                "noop"
            ).mode("overwrite").save()
            timings[impl].append(time.monotonic() - t0)

    out = {
        "sf_dir": args.sf_dir,
        "reps": args.reps,
        "parity_mismatches": n_diff,
        "expr_median_s": round(statistics.median(timings["expr"]), 3),
        "arrow_median_s": round(statistics.median(timings["arrow"]), 3),
        "expr_all": [round(t, 3) for t in timings["expr"]],
        "arrow_all": [round(t, 3) for t in timings["arrow"]],
        "speedup": round(
            statistics.median(timings["expr"]) / statistics.median(timings["arrow"]), 2
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
