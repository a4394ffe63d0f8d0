"""Dump ``explain("formatted")`` for registered queries into files —
the before/after plan artifacts the optimization rounds commit under
``plans/rNN/``.

Usage:
    python tools/dump_plans.py plans/r12 before events_ktruss trade_hits
    python tools/dump_plans.py plans/r12 after  events_ktruss

Writes ``<outdir>/<query>_<tag>.txt``.  Plans are captured lazily
(no action is run), so iterative operators that materialize
intermediates during query CONSTRUCTION (counts, localCheckpoints)
do execute their construction-time jobs — the captured plan is the
final returned DataFrame's, exactly what the bench's count() runs.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crypto_price_tracker_with_etl_dashboard_spark.session import get_spark


def main() -> None:
    outdir, tag = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")

    from __spark_entry__ import queries

    qs = queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange lines)")


if __name__ == "__main__":
    main()
