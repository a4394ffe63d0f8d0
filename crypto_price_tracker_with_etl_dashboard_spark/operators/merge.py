"""MERGE INTO (upsert + delete) as a pure DataFrame operator — the
CDC-apply primitive warehouse ETL runs every batch (the reference's
PostgreSQL tier gets it from `INSERT ... ON CONFLICT`; an engine
replacing it needs the same semantics over immutable parquet).

Semantics (one pass, deterministic):

- matched + op='D'          -> row deleted
- matched + op='U' (or 'I') -> row replaced by the update's payload
- unmatched update, op!='D' -> row inserted
- unmatched target          -> row kept as-is
- multiple updates per key  -> REJECTED by default (the ANSI MERGE
  cardinality rule: a target row matching two updates is
  non-deterministic); pass a ``seq_col`` to resolve keep-LAST by
  that ordering instead (the CDC convention: highest sequence wins,
  ties -> delete loses to the later upsert via the op tiebreak).

Plan shape: ONE full-outer shuffle join on the key (both sides hash
partitioned), no window over the target; the dedup-updates stage is
a max(struct(...)) aggregate (map-side partials, no sort).  At
100 TB the target side is the big one — it shuffles ONCE; with both
tables bucketed on the key (operators/bucketing.py) the join is
zero-exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    key: str,
    op_col: str = "op",
    seq_col: str | None = None,
) -> DataFrame:
    """Apply a change set to ``target``.  ``updates`` carries the
    full payload (same columns as target), plus ``op_col`` in
    {'I', 'U', 'D'} and optionally ``seq_col``."""
    payload = [c for c in target.columns if c != key]
    missing = [c for c in payload if c not in updates.columns]
    if missing:
        raise ValueError(f"updates missing payload columns: {missing}")

    if seq_col is not None:
        # CDC keep-last: highest (seq, op) wins; 'U' > 'I' > 'D' in
        # ASCII is wrong ('D' < 'I' < 'U' — conveniently, a delete at
        # the same sequence LOSES to the co-sequenced upsert, the
        # usual CDC compaction rule), so the struct tiebreak is
        # (seq, op) with plain string order.
        picked = (
            updates.groupBy(key)
            .agg(
                F.max(
                    F.struct(
                        F.col(seq_col).alias("__s"),
                        F.col(op_col).alias("__op"),
                        *[F.col(c).alias(c) for c in payload],
                    )
                ).alias("__m")
            )
            .select(key, "__m.__op", *[F.col(f"__m.{c}").alias(c) for c in payload])
            .withColumnRenamed("__op", "__theop")
        )
    else:
        dup = updates.groupBy(key).agg(F.count("*").alias("__n")).filter(
            F.col("__n") > 1
        )
        n_dup = dup.count()
        if n_dup:
            raise ValueError(
                f"{n_dup} keys have multiple updates; MERGE cardinality is "
                "non-deterministic — pass seq_col to resolve keep-last"
            )
        picked = updates.select(
            key, F.col(op_col).alias("__theop"), *payload
        )

    t = target.select(key, *[F.col(c).alias(f"__t_{c}") for c in payload])
    joined = t.join(picked, key, "full_outer")
    kept = joined.filter(
        # unmatched target (no update op) OR a non-delete update
        F.col("__theop").isNull() | (F.col("__theop") != "D")
    )
    return kept.select(
        key,
        *[
            F.when(F.col("__theop").isNotNull(), F.col(c))
            .otherwise(F.col(f"__t_{c}"))
            .alias(c)
            for c in payload
        ],
    )


def sql_merge_upsert(
    target_cte: str,
    updates_cte: str,
    key: str,
    payload: list[str],
    op_col: str = "op",
    seq_col: str | None = None,
) -> str:
    """DuckDB twin: ``target_cte``/``updates_cte`` define CTEs named
    ``target`` and ``updates``; same keep-last and delete rules."""
    pay_structs = ", ".join(f"{c} := {c}" for c in payload)
    if seq_col is not None:
        picked = f"""picked AS (
      SELECT {key},
             m['__op'] AS __theop,
             {', '.join(f"m['{c}'] AS {c}" for c in payload)}
      FROM (
        SELECT {key},
               MAX(struct_pack(__s := {seq_col}, __op := {op_col},
                               {pay_structs})) AS m
        FROM updates GROUP BY {key}
      )
    )"""
    else:
        picked = f"""picked AS (
      SELECT {key}, {op_col} AS __theop, {', '.join(payload)} FROM updates
    )"""
    sel = ", ".join(
        f"CASE WHEN p.__theop IS NOT NULL THEN p.{c} ELSE t.{c} END AS {c}"
        for c in payload
    )
    return f"""
    WITH {target_cte},
    {updates_cte},
    {picked}
    SELECT COALESCE(t.{key}, p.{key}) AS {key}, {sel}
    FROM target t FULL OUTER JOIN picked p ON t.{key} = p.{key}
    WHERE p.__theop IS NULL OR p.__theop <> 'D'
    """
