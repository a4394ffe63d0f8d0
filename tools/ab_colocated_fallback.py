"""A/B the above-threshold guard fallback: OLD bare hint-drop (r10 —
Catalyst plans SMJ and re-shuffles the edge list every round) vs NEW
co-located layout + shuffle_hash (r11, r10 verdict ask #4).

MAX_BROADCAST_NODES is forced to 1 so the guard binds at test-scale
node counts, and the auto-broadcast thresholds are disabled so AQE's
runtime size check cannot quietly broadcast the tiny O(nodes) side in
BOTH variants (at real above-threshold sizes that side does not fit —
this exposes the physical shape the variants actually differ on).

Usage: python tools/ab_colocated_fallback.py {old|new} <sf_dir> <query> [runs]
Prints one JSON line: {"variant", "query", "sf_dir", "runs": [...], "min": s}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    variant, sf_dir, qname = sys.argv[1], sys.argv[2], sys.argv[3]
    runs = int(sys.argv[4]) if len(sys.argv) > 4 else 2

    from pyspark.sql import functions as F

    from crypto_price_tracker_with_etl_dashboard_spark.operators import (
        _broadcast_guard as bg,
    )
    from crypto_price_tracker_with_etl_dashboard_spark.operators import hits as hm
    from crypto_price_tracker_with_etl_dashboard_spark.operators import (
        kcore as km,
    )
    from crypto_price_tracker_with_etl_dashboard_spark.operators import lpa as lm
    from crypto_price_tracker_with_etl_dashboard_spark.operators import (
        pagerank as pm,
    )
    from crypto_price_tracker_with_etl_dashboard_spark.queries import SPARK_QUERIES
    from crypto_price_tracker_with_etl_dashboard_spark.session import get_spark

    bg.MAX_BROADCAST_NODES = 1
    if variant == "old":
        # r10 behavior: the guard just drops the hint — no layout, no
        # build-side hint; Catalyst plans SMJ and the edge side gets
        # an ENSURE_REQUIREMENTS exchange every round.
        def bare(df, n_nodes, *, op, limit=None):
            lim = bg.MAX_BROADCAST_NODES if limit is None else limit
            return F.broadcast(df) if n_nodes <= lim else df

        for mod in (pm, lm, hm, km):
            mod.guarded_broadcast = bare
            mod.colocate_for_guarded_joins = lambda df, *k: df

    spark = get_spark(f"ab-colocate-{variant}")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    fn = SPARK_QUERIES[qname]
    times = []
    for _ in range(runs):
        t0 = time.time()
        n = fn(spark, sf_dir).count()
        times.append(round(time.time() - t0, 2))
    print(json.dumps({
        "variant": variant, "query": qname, "sf_dir": sf_dir,
        "rows": n, "runs": times, "min": min(times),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
