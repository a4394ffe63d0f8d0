"""Table loaders over the driver's parquet testdata, plus the
deterministic ``events -> prices`` mapping used to exercise the
reference's query semantics on driver-generated data.

The mapping (FIXTURES.md section 3: user_id -> symbol, value ->
current_price, ts -> timestamp) is defined twice — once as Spark
column expressions and once as an ANSI-SQL CTE for the DuckDB oracle
— and MUST stay in sync.  Null/zero market caps are injected
deterministically from ``event_type`` so that the reference's
null-handling paths (api/server.js:54-55, frontend/src/App.js:94,
NULLS-FIRST ordering api/server.js:76) are exercised.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet loader.  The driver's events.parquet stores ``ts`` as
    TIMESTAMP(NANOS), which Spark's vectorized reader rejects; we
    read nanos as long (legacy conf) and truncate to microseconds —
    the same truncation DuckDB applies when it maps parquet ns to its
    microsecond TIMESTAMP, so both engines see identical values."""
    if name == "events":
        # Scope the legacy conf to THIS read: the schema is captured
        # when spark.read resolves, so restoring immediately after
        # does not affect the returned DataFrame's execution
        # (verified) — but leaving it set session-wide would silently
        # retype TIMESTAMP(NANOS) columns to bigint in every later
        # unrelated parquet read.
        key = "spark.sql.legacy.parquet.nanosAsLong"
        prev = spark.conf.get(key, None)
        spark.conf.set(key, "true")
        try:
            df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        finally:
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def fan_out(df: DataFrame) -> DataFrame:
    """Ensure at least default-parallelism partitions before an
    expression-heavy map stage.  Small local parquet files arrive as
    ONE partition (a single row group), which serializes per-row
    compute onto one core; at cluster scale the input is already
    partitioned and this is a no-op.

    The partition estimate is plan-based (``inputFiles()`` walks the
    analyzed plan to its scans), NOT ``df.rdd.getNumPartitions()`` —
    the RDD conversion forces a full physical re-plan outside AQE on
    every call.  Every caller applies this directly to a scan or a
    narrow projection of one, where file count is the right proxy: a
    multi-file input is already parallel (Spark splits further by
    ``spark.sql.files.maxPartitionBytes``), while the pathological
    case — one small single-row-group file — is exactly
    ``len(inputFiles) == 1``."""
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:  # plan without file scans resolvable
        n_files = 0
    if n_files == 0:
        # non-file source (in-memory frames, streaming): parallelize()
        # already spreads over defaultParallelism — leave untouched
        return df
    if n_files < target:
        return df.repartition(target)
    return df


def prices_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference fact table (SURVEY.md section 1.1) derived from the
    ``events`` table.  Keeps ``event_id`` as a deterministic
    tiebreaker (the reference's ties-on-batch-timestamp semantics,
    etl/crypto_etl.py:82, need a total order for reproducible
    latest-per-group results)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.concat(F.lit("c"), F.col("user_id").cast("string")).alias("symbol"),
        F.concat(F.lit("Coin "), F.col("user_id").cast("string")).alias("name"),
        F.col("value").alias("current_price"),
        F.when(F.col("event_type") == "error", F.lit(None).cast("double"))
        .when(F.col("event_type") == "signup", F.lit(0.0))
        .otherwise(F.col("value") * 1000000.0)
        .alias("market_cap"),
        F.when(F.col("event_type") == "click", F.lit(None).cast("double"))
        .otherwise(F.col("value") * 50000.0)
        .alias("total_volume"),
        F.col("ts").alias("timestamp"),
        F.col("event_id"),
    )


# Must mirror prices_from_events() exactly — the oracle runs this CTE.
PRICES_CTE_SQL = """
prices AS (
  SELECT
    concat('c', CAST(user_id AS VARCHAR))       AS symbol,
    concat('Coin ', CAST(user_id AS VARCHAR))   AS name,
    value                                       AS current_price,
    CASE WHEN event_type = 'error'  THEN NULL
         WHEN event_type = 'signup' THEN 0.0
         ELSE value * 1000000.0 END             AS market_cap,
    CASE WHEN event_type = 'click'  THEN NULL
         ELSE value * 50000.0 END               AS total_volume,
    ts                                          AS timestamp,
    event_id
  FROM events
)
"""
