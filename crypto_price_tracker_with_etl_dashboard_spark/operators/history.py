"""Per-symbol history slice (entry point 3 in the reference,
api/server.js:90-143): equality predicate on symbol, optional
inclusive start bound, optional EXCLUSIVE start-of-next-day upper
bound (api/server.js:113-124), chronological order.

Scale notes: with the prices table partitioned by ``days(timestamp)``
both bounds become partition-pruning predicates and the symbol
equality is pushed to parquet row-group stats — a 30-day slice of one
symbol touches 30 partitions regardless of total table size.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def history_slice(
    prices: DataFrame,
    symbol: str,
    start_date: str | dt.date | None = None,
    end_date: str | dt.date | None = None,
) -> DataFrame:
    """``WHERE symbol = $1 [AND timestamp >= start] [AND timestamp <
    end+1day] ORDER BY timestamp`` with the reference's exact bound
    semantics: start is inclusive midnight, end is exclusive midnight
    of the FOLLOWING day (so rows at end_date 23:59:59.999 are kept).
    Symbol lookup is lowercased like api/server.js:102."""
    out = prices.filter(F.col("symbol") == F.lower(F.lit(symbol)))
    if start_date is not None:
        out = out.filter(F.col("timestamp") >= F.lit(str(start_date)).cast("timestamp"))
    if end_date is not None:
        next_day = F.date_add(F.lit(str(end_date)).cast("date"), 1).cast("timestamp")
        out = out.filter(F.col("timestamp") < next_day)
    return out.select(
        "symbol", "name", "current_price", "market_cap", "total_volume", "timestamp"
    ).orderBy(F.col("timestamp").asc())
