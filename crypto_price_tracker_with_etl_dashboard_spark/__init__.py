"""PySpark-native analytics engine with the query and data-processing
capabilities of ScarySuffer/Crypto-Price-Tracker-with-ETL-Dashboard.

The reference is a three-tier pipeline (Python ETL -> PostgreSQL ->
Node/React dashboard); its relational surface is re-expressed here as
idiomatic Spark DataFrame / SQL / Structured Streaming, designed for
100 TB scale (partition pruning, broadcast joins, no row-at-a-time
Python in the hot path).

Layout:
    session     - SparkSession factory with scale-appropriate defaults
    schema      - canonical schemas (prices fact table, coingecko raw)
    api         - PriceTracker facade: the reference's app surface 1:1
    sources/    - ingest (validate/project/normalize), prices view, writers
    operators/  - relational operators from SURVEY.md section 2, plus
                  asof join, skew salting, bucketing, compaction, exact sums
    functions/  - text analysis, dedup, similarity (north-star ops)
    queries/    - the oracle-checked query registry (driver contract)
    streaming/  - Structured Streaming pipeline, sessionize, OHLC,
                  stream dedup, stream-stream joins
"""

__version__ = "0.1.0"
