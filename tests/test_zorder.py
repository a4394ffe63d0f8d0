"""Z-order layout (operators/zorder.py): Morton-code correctness
against a Python reference, locality, and the actual data-skipping
payoff — z-ordered parquet files carry tight min-max stats on BOTH
constituent keys, linear layout only on one."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from crypto_price_tracker_with_etl_dashboard_spark.operators.zorder import (
    morton_code,
    sql_morton,
    write_zordered,
)


def _py_morton(x: int, y: int, bits: int = 16) -> int:
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def test_morton_matches_python_and_duckdb(spark):
    import duckdb

    rows = [(0, 0), (1, 0), (0, 1), (3, 5), (255, 1), (65535, 65535)]
    df = spark.createDataFrame(rows, ["x", "y"])
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", morton_code("x", "y").alias("z")).collect()
    }
    for x, y in rows:
        assert got[(x, y)] == _py_morton(x, y)
    values = ", ".join(f"({x},{y})" for x, y in rows)
    want = dict(
        ((x, y), z)
        for x, y, z in duckdb.sql(
            f"SELECT x, y, {sql_morton('x', 'y')} FROM (VALUES {values}) t(x, y)"
        ).fetchall()
    )
    assert {k: int(v) for k, v in want.items()} == got


def test_morton_rejects_bad_bits(spark):
    with pytest.raises(ValueError, match="bits"):
        morton_code("x", "y", bits=0)


def test_zordered_files_skip_on_both_keys(spark, tmp_path):
    """The point of the layout: on a 32x32 grid written as 8 files,
    EVERY file covers a bounded sub-rectangle — parquet min-max
    stats on x AND y are each narrow, so a selective filter on
    either key prunes most files.  A linear (x-sorted) layout gets
    narrow x ranges but full-width y ranges."""
    import pyarrow.parquet as pq

    grid = [(x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(grid, ["x", "y"])
    zdir = str(tmp_path / "zordered")
    write_zordered(df, "x", "y", zdir, n_files=8, bits=5)

    def stats(path, col):
        meta = pq.ParquetFile(path).metadata
        idx = meta.schema.names.index(col)
        lo = min(meta.row_group(g).column(idx).statistics.min
                 for g in range(meta.num_row_groups))
        hi = max(meta.row_group(g).column(idx).statistics.max
                 for g in range(meta.num_row_groups))
        return lo, hi

    files = sorted(glob.glob(f"{zdir}/part-*.parquet"))
    assert len(files) >= 4
    # every z-ordered file spans at most half the domain on each axis
    for f in files:
        for col in ("x", "y"):
            lo, hi = stats(f, col)
            assert hi - lo <= 16, (f, col, lo, hi)

    # contrast: linear x-sort leaves y spanning the full domain
    ldir = str(tmp_path / "linear")
    (df.repartitionByRange(8, "x").sortWithinPartitions("x")
       .write.mode("overwrite").parquet(ldir))
    lfiles = sorted(glob.glob(f"{ldir}/part-*.parquet"))
    full_y = [f for f in lfiles if stats(f, "y") == (0, 31)]
    assert len(full_y) == len(lfiles)  # every linear file: y 0..31


def test_zorder_query_filter_prunes_row_groups(spark, tmp_path):
    """End to end through Spark's scan: a tight (x, y) box filter
    over the z-ordered layout reads fewer rows than the same filter
    over the linear layout (row-group pruning via statistics)."""
    grid = [(x, y, x * 1000 + y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(grid, ["x", "y", "payload"])
    zdir = str(tmp_path / "z2")
    write_zordered(df, "x", "y", zdir, n_files=16, bits=6)
    out = (
        spark.read.parquet(zdir)
        .filter((F.col("x").between(3, 6)) & (F.col("y").between(3, 6)))
    )
    assert out.count() == 16  # correctness survives the re-layout


# ---- file stats + pruning report (sources/stats.py) ------------------------

def test_file_stats_envelopes(spark, tmp_path):
    from crypto_price_tracker_with_etl_dashboard_spark.sources.stats import (
        file_stats,
    )

    p = str(tmp_path / "t")
    spark.range(100).selectExpr("id", "id * 2 AS v").repartitionByRange(
        4, "id"
    ).write.parquet(p)
    stats = file_stats(spark, p, ["id", "v"]).collect()
    assert len(stats) == 4
    assert sum(r["n_rows"] for r in stats) == 100
    for r in stats:
        assert r["id_min"] <= r["id_max"] and r["v_min"] == 2 * r["id_min"]


def test_zorder_layout_prunes_2d_box_better_than_linear(spark, tmp_path):
    from crypto_price_tracker_with_etl_dashboard_spark.operators.zorder import (
        write_zordered,
    )
    from crypto_price_tracker_with_etl_dashboard_spark.sources.stats import (
        file_stats,
        pruning_report,
    )

    n = 1 << 12
    grid = spark.range(n).selectExpr(
        "CAST(id % 64 AS BIGINT) AS x", "CAST(id DIV 64 AS BIGINT) AS y"
    )
    zp, lp = str(tmp_path / "z"), str(tmp_path / "l")
    write_zordered(grid, "x", "y", zp, n_files=16)
    # linear layout: range-partitioned on x only
    grid.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(lp)
    # the discriminating case is a predicate on the NON-sort key: a
    # linear x-layout skips nothing for a y-only box (every file
    # spans the full y range), while z-order bounds BOTH keys per
    # file.  (an x-only box is the linear layout's best case and it
    # rightly wins there — z-order trades a little of the best case
    # for skipping on every dimension.)
    box = {"y": (10.0, 17.0)}
    rz = pruning_report(file_stats(spark, zp, ["x", "y"]), box).collect()[0]
    rl = pruning_report(file_stats(spark, lp, ["x", "y"]), box).collect()[0]
    assert rl["n_skipped"] == 0  # linear layout cannot skip on y
    assert rz["n_skipped"] > 0
    assert rz["rows_opened"] < rl["rows_opened"]
