"""Ad-hoc single-query bench: time one or more registered queries in
the given order, N runs each, printing per-run wall clocks.  Usage:

    python tools/bench_one.py emb_ivf_topk
    python tools/bench_one.py emb_cosine_topk emb_ann_lsh emb_ivf_topk
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crypto_price_tracker_with_etl_dashboard_spark.session import get_spark


def main() -> None:
    names = sys.argv[1:]
    runs = int(os.environ.get("BENCH_RUNS", "3"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench-one")
    spark.sparkContext.setLogLevel("ERROR")

    from __spark_entry__ import queries

    qs = queries()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(32).repartition(32).mapInPandas(lambda it: it, "id long").count()
    from crypto_price_tracker_with_etl_dashboard_spark.sources import load_table

    for t in ["lineitem", "events", "documents", "embeddings"]:
        load_table(spark, sf_dir, t).count()
    for name in names:
        times = []
        for _ in range(runs):
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            times.append(round(time.time() - t0, 3))
        print(f"{name}: {times} min={min(times)}")


if __name__ == "__main__":
    main()
