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


def _parse_bound(d: str | dt.date | dt.datetime, name: str) -> dt.date | dt.datetime:
    """ISO date or datetime, parsed eagerly so a bad bound raises
    instead of silently matching nothing."""
    if isinstance(d, (dt.date, dt.datetime)):
        return d
    s = str(d)
    for parse in (dt.date.fromisoformat, dt.datetime.fromisoformat):
        try:
            return parse(s)
        except ValueError:
            continue
    raise ValueError(
        f"{name} must be an ISO date (YYYY-MM-DD) or datetime, got {d!r}"
    )


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
    Symbol lookup is lowercased like api/server.js:102.

    Bounds are validated DRIVER-SIDE: under non-ANSI mode a malformed
    date string would cast to NULL, the bound predicate would
    evaluate NULL on every row, and the API would return a
    plausible-looking EMPTY history with no error (the reference's
    PG query raises on an invalid date)."""
    out = prices.filter(F.col("symbol") == F.lower(F.lit(symbol)))
    if start_date is not None:
        start = _parse_bound(start_date, "start_date")
        if not isinstance(start, dt.datetime):
            start = dt.datetime.combine(start, dt.time.min)
        out = out.filter(F.col("timestamp") >= F.lit(start))
    if end_date is not None:
        end = _parse_bound(end_date, "end_date")
        next_day = dt.datetime.combine(
            (end.date() if isinstance(end, dt.datetime) else end)
            + dt.timedelta(days=1),
            dt.time.min,
        )
        out = out.filter(F.col("timestamp") < F.lit(next_day))
    return out.select(
        "symbol", "name", "current_price", "market_cap", "total_volume", "timestamp"
    ).orderBy(F.col("timestamp").asc())
