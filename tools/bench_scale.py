"""sf1 scale spot-check (BASELINE.md "Scale spot-check" table).

Runs the most expensive bench queries at the driver's sf0.1 and at
the 10x bench-only dataset built by tools/make_scale.py, and prints
per-query times plus the time ratio.  A query whose cost grows
super-linearly (ratio well above 10x on 10x data, modulo fixed
per-job overhead) is a scale bug; roughly-linear or sublinear growth
is the expected "survives 100x" shape for the plans we audited.

Usage: python tools/bench_scale.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from crypto_price_tracker_with_etl_dashboard_spark.session import get_spark

SMALL = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# SPARK_GRAFT_BIG_DIR overrides the big side (e.g. .scale/sf10 for
# the documents-only 100x spot-check; pair it with
# SPARK_GRAFT_SF_DIR=.scale/sf1 to measure the sf1 -> sf10 decade).
BIG = os.environ.get(
    "SPARK_GRAFT_BIG_DIR", os.path.join(REPO, ".scale", "sf1")
)

# The 10 most expensive r2 bench queries + the dedup/decontamination
# pair whose scale behavior (pair-join output, broadcast build side)
# is the most interesting at 10x.
DEFAULT = [
    "doc_dup_clusters",
    "emb_ivf_topk",
    "emb_ann_lsh",
    "q21_last_shipper",
    "doc_minhash_lsh",
    "doc_simhash",
    "market_share",
    "q18_large_volume",
    "q9_product_profit",
    "q17_small_quantity",
    "doc_ngram_jaccard",
    "doc_decontaminate",
    "emb_cosine_topk",
    "q1_pricing_summary",
]


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    if not os.path.isdir(BIG):
        raise SystemExit(f"{BIG} missing -- run tools/make_scale.py first")
    spark = get_spark("bench-scale")
    spark.sparkContext.setLogLevel("ERROR")

    from __spark_entry__ import queries

    qs = queries()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(32).repartition(32).mapInPandas(lambda it: it, "id long").count()

    out: dict[str, dict] = {}
    for name in names:
        row: dict[str, float] = {}
        for label, d in (("sf0.1", SMALL), ("sf1", BIG)):
            best = float("inf")
            rows = -1
            for _ in range(2):
                t0 = time.time()
                rows = qs[name](spark, d).count()
                best = min(best, time.time() - t0)
            row[label] = round(best, 2)
            row[f"rows_{label}"] = rows
        row["ratio"] = round(row["sf1"] / max(row["sf0.1"], 1e-9), 1)
        out[name] = row
        print(
            f"{name:26s} sf0.1 {row['sf0.1']:7.2f}s ({row['rows_sf0.1']} rows)"
            f"   sf1 {row['sf1']:7.2f}s ({row['rows_sf1']} rows)   x{row['ratio']}"
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
