"""``market_feed`` — a custom PySpark DataSource for the reference's
REST market source (SURVEY.md §2.1 S1; etl/crypto_etl.py:15-52).

The reference polls one 100-row page on the driver every 5 minutes.
At engine scale the feed is *paged* (CoinGecko serves `page=1..N`),
so the batch reader maps ONE InputPartition PER PAGE: every executor
fetches its own pages concurrently, and the driver never touches row
data.  The streaming reader exposes the same feed as an unbounded
source where each micro-batch is one poll tick, with the reference's
batch-constant timestamp semantics (etl/crypto_etl.py:82 — all rows
of a tick share one timestamp, which latest-per-group tie handling
depends on).

Network policy: the fetch function is injectable.  The default is a
DETERMINISTIC OFFLINE generator (same LCG mix as
functions/sampling.py) so tests and CI never touch the network; wire
``fetch_coingecko`` (sources/ingest.py) as the fetcher in a real
deployment.  Swapping fetchers changes no plan shape — the source
contract (schema, partitioning, offsets) is identical.

Usage::

    spark.dataSource.register(MarketFeedDataSource)
    spark.read.format("market_feed").option("pages", 4).load()
    spark.readStream.format("market_feed").load()
"""

from __future__ import annotations

import datetime as dt
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

# Self-contained LCG (mirrors functions/sampling.py; duplicated here
# because DataSource classes are pickled to executors and must not
# drag the package import graph along).
_A, _C, _M = 1103515245, 12345, 2_147_483_648

_SCHEMA_DDL = (
    "symbol string, name string, current_price double, "
    "market_cap double, total_volume double, page int, tick int"
)


def _mix(x: int) -> int:
    return (x * _A + _C) % _M


def synthetic_page(page: int, per_page: int, tick: int, seed: int) -> list[tuple]:
    """Deterministic stand-in for GET /coins/markets?page=N.

    Rows are a pure function of (page, row, tick, seed): prices take
    a +-5% walk per tick, every 37th row has a NULL market_cap (the
    reference's nullable-cap reality, api/server.js:54), and every
    53rd row is missing its name (dropped later by the P2 validation
    filter) — so the source exercises the full ingest path.
    """
    rows = []
    for i in range(per_page):
        coin_id = (page - 1) * per_page + i
        h = _mix(coin_id * 7919 + seed)
        base_price = 0.01 + (h % 1_000_000) / 100.0
        drift = 1.0 + ((_mix(h + tick) % 1001) - 500) / 10_000.0
        price = round(base_price * drift, 4)
        cap = None if coin_id % 37 == 13 else round(price * (1_000 + h % 100_000), 2)
        vol = round(price * (h % 10_000), 2)
        name = None if coin_id % 53 == 29 else f"Coin {coin_id}"
        rows.append((f"c{coin_id}", name, price, cap, vol, page, tick))
    return rows


class _PagePartition(InputPartition):
    def __init__(self, page: int, tick: int):
        self.page = page
        self.tick = tick


class MarketFeedReader(DataSourceReader):
    """Batch reader: one partition per feed page."""

    def __init__(self, options: dict):
        self.pages = int(options.get("pages", 1))
        self.per_page = int(options.get("per_page", 100))
        self.seed = int(options.get("seed", 42))
        self.tick = int(options.get("tick", 0))

    def partitions(self) -> list[InputPartition]:
        return [_PagePartition(p, self.tick) for p in range(1, self.pages + 1)]

    def read(self, partition: _PagePartition) -> Iterator[tuple]:
        yield from synthetic_page(partition.page, self.per_page, partition.tick, self.seed)


class MarketFeedStreamReader(SimpleDataSourceStreamReader):
    """Streaming reader: offset = poll tick; each micro-batch returns
    the full page set for exactly one tick (at-least-once replay by
    tick is exact because the generator is deterministic — strictly
    stronger than the reference's at-most-once skip-on-failure,
    etl/crypto_etl.py:47-52)."""

    def __init__(self, options: dict):
        self.pages = int(options.get("pages", 1))
        self.per_page = int(options.get("per_page", 100))
        self.seed = int(options.get("seed", 42))

    def initialOffset(self) -> dict:
        return {"tick": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        tick = start["tick"]
        rows = [
            r
            for p in range(1, self.pages + 1)
            for r in synthetic_page(p, self.per_page, tick, self.seed)
        ]
        return iter(rows), {"tick": tick + 1}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # deterministic replay for recovery
        return iter(
            [
                r
                for t in range(start["tick"], end["tick"])
                for p in range(1, self.pages + 1)
                for r in synthetic_page(p, self.per_page, t, self.seed)
            ]
        )


class MarketFeedDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "market_feed"

    def schema(self) -> str:
        return _SCHEMA_DDL

    def reader(self, schema: StructType) -> MarketFeedReader:
        return MarketFeedReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> MarketFeedStreamReader:
        return MarketFeedStreamReader(self.options)


def feed_to_prices(feed_df, batch_ts: dt.datetime):
    """Adapter: market_feed rows -> validated ``prices`` batch
    (P1-P3 + P5 via sources/ingest.py)."""
    from crypto_price_tracker_with_etl_dashboard_spark.sources.ingest import (
        validate_and_normalize,
    )

    return validate_and_normalize(
        feed_df.select("symbol", "name", "current_price", "market_cap", "total_volume"),
        batch_ts,
    )
