"""Build a ~sf1 BENCH-ONLY dataset by replicating the driver's sf0.1
tables 10x with key offsets, at /root/repo/.scale/sf1/.

The driver ships sf{0.001,0.01,0.1} only (TESTDATA.md); the round-2
verdict asks for an sf1 spot-check of the most expensive queries so
"survives 100x" claims rest on measurement, not plan-reading.  This
tool derives a 10x-volume dataset from the driver's own sf0.1 parquet
(never hand-synthesized distributions):

- join keys are offset per replica so distinct-key cardinality scales
  10x exactly like a real sf bump (c_custkey, o_orderkey, l_orderkey,
  p_partkey, s_suppkey, user_id, doc_id, vec_id);
- region/nation stay fixed (TPC-H dimensions do not scale);
- document text gets a replica salt token injected every 5 words so
  cross-replica docs are NOT near-duplicates -- otherwise every doc
  would acquire 9 artificial twins and pair-producing dedup queries
  (minhash/ngram-jaccard/neardup) would measure an adversarial
  quadratic blowup instead of sf1;
- embeddings are cyclically rolled by replica index (norm-preserving,
  deterministic) so cross-replica vectors are not cosine-duplicates.

Correctness is still gated exclusively on the driver's sf0.01 data;
this dataset exists only for the scale table in BASELINE.md.

Usage: python tools/make_scale.py [replicas=10]
       python tools/make_scale.py --documents-sf100x
       python tools/make_scale.py --graph-emb-sf100x

The second form builds .scale/sf10/documents.parquet: 10 further
replicas OF the sf1 documents (so 100x the driver's sf0.1 corpus),
for the pair-bound dedup family's 100x spot-check (r8 verdict ask
#7 — the output-bound claims rested on a single 10x point).  Each
second-level replica gets its own salt token layer (every 5th word),
so cross-replica docs are again NOT near-duplicates; doc_ids offset
by i * 100M (first-level ids stay < 100M).  Only documents is built:
the four target queries (doc_minhash_lsh, doc_ngram_jaccard,
doc_dup_clusters, doc_keep_best_dedup) read nothing else.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale", "sf1"
)

# key offsets: > max key in sf0.1 by a wide margin, per replica i the
# key becomes key + i * OFFSET so replicas never collide.
OFF = 10_000_000

# Driver embeddings are 64-dim (TESTDATA.md); the replica cap below
# keeps the cyclic roll a bijection across replicas.
EMB_DIM = 64


def make_documents_sf10() -> None:
    """10 further document replicas on top of .scale/sf1 (= 100x the
    driver's sf0.1 corpus), salted per replica like the sf1 build."""
    src = os.path.join(os.path.dirname(DST), "sf1", "documents.parquet")
    if not os.path.exists(src):
        raise SystemExit("build .scale/sf1 first (python tools/make_scale.py)")
    dst_dir = os.path.join(os.path.dirname(DST), "sf10")
    os.makedirs(dst_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")
    off2 = 100_000_000  # sf1 doc_ids are < 10 * OFF = 100M
    parts = [
        "SELECT doc_id, text, lang, source,"
        " CAST(length(text) AS BIGINT) AS n_chars FROM ("
        f" SELECT doc_id + {i} * {off2} AS doc_id,"
        f" CASE WHEN {i} = 0 THEN text ELSE"
        "   array_to_string(list_transform(string_split(text, ' '),"
        f"     (w, j) -> CASE WHEN j % 5 = 0 THEN w || ' zten{i}q' ELSE w END), ' ')"
        " END AS text,"
        f" lang, source FROM '{src}')"
        for i in range(10)
    ]
    union = " UNION ALL ".join(parts)
    con.execute(
        f"COPY ({union}) TO '{dst_dir}/documents.parquet' (FORMAT PARQUET)"
    )
    n = con.execute(
        f"SELECT count(*) FROM '{dst_dir}/documents.parquet'"
    ).fetchone()[0]
    print(f"documents (sf10): {n} rows -> {dst_dir}")


def make_documents_sf100() -> None:
    """10 further document replicas on top of .scale/sf10 (= 1000x
    the driver's sf0.1 corpus, 5M docs): the THIRD decade for the
    pair-bound dedup family.  Same salt discipline as the first two
    levels — replica i2 of the second level injects ' zctN q'-style
    tokens every 5th word at a THIRD layer, so cross-replica docs are
    again not near-duplicates; doc_ids offset by i * 1e9 (sf10 ids
    are < 1e9)."""
    src = os.path.join(os.path.dirname(DST), "sf10", "documents.parquet")
    if not os.path.exists(src):
        raise SystemExit(
            "build .scale/sf10 first (python tools/make_scale.py --documents-sf100x)"
        )
    dst_dir = os.path.join(os.path.dirname(DST), "sf100")
    os.makedirs(dst_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")
    # CAST: DuckDB folds {i} * off3 in INT32 otherwise and overflows
    off3 = "CAST(1000000000 AS BIGINT)"
    parts = [
        "SELECT doc_id, text, lang, source,"
        " CAST(length(text) AS BIGINT) AS n_chars FROM ("
        f" SELECT doc_id + CAST({i} AS BIGINT) * {off3} AS doc_id,"
        f" CASE WHEN {i} = 0 THEN text ELSE"
        "   array_to_string(list_transform(string_split(text, ' '),"
        f"     (w, j) -> CASE WHEN j % 5 = 0 THEN w || ' zct{i}q' ELSE w END), ' ')"
        " END AS text,"
        f" lang, source FROM '{src}')"
        for i in range(10)
    ]
    union = " UNION ALL ".join(parts)
    con.execute(
        f"COPY ({union}) TO '{dst_dir}/documents.parquet' (FORMAT PARQUET)"
    )
    n = con.execute(
        f"SELECT count(*) FROM '{dst_dir}/documents.parquet'"
    ).fetchone()[0]
    print(f"documents (sf100): {n} rows -> {dst_dir}")


def make_graph_emb_sf10() -> None:
    """10 further replicas of the sf1 graph/embedding tables (= 100x
    the driver's sf0.1) at .scale/sf10: lineitem + orders (the trade
    graph), events (the co-occurrence graph), and embeddings — the r9
    verdict's asks #3 (graph family second decade) and #7 (embedding
    family second decade).

    Keys offset by i * 100M (sf1 keys are < 10 * OFF = 100M), so the
    ten replicas are DISJOINT subgraphs — node and edge counts scale
    10x, the realistic more-users/more-suppliers shape (communities,
    ranks, and cores are per-component quantities, so disjointness
    changes no per-node semantics, only scale).

    Embeddings decorrelate across second-level replicas with a
    WALSH-HADAMARD SIGN MASK: replica i flips coordinate j's sign iff
    popcount((j-1) & i) is odd.  Norm-preserving; for any two masks
    m != m' the sign product (-1)^popcount(j & (m XOR m')) is +1 on
    exactly half of 0..63 (a nonzero parity function is balanced), so
    same-source cross-replica cosines are near-balanced sums of
    +-x_j^2 ~ 0 — far below even semdedup's 0.3 threshold, avoiding
    the artificial near-dup blowup a plain copy (or a second level of
    rolls, which would alias with the sf1 rolls at i1 + i2 >= 64 or
    collide at equal total lag) would inject.  Replica 0 is the sf1
    row verbatim."""
    src_dir = os.path.join(os.path.dirname(DST), "sf1")
    if not os.path.exists(os.path.join(src_dir, "lineitem.parquet")):
        raise SystemExit("build .scale/sf1 first (python tools/make_scale.py)")
    dst_dir = os.path.join(os.path.dirname(DST), "sf10")
    os.makedirs(dst_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")
    off2 = 100_000_000

    def build10(table: str, select_tpl: str) -> None:
        src = f"'{src_dir}/{table}.parquet'"
        union = " UNION ALL ".join(
            select_tpl.format(i=i, src=src) for i in range(10)
        )
        con.execute(
            f"COPY ({union}) TO '{dst_dir}/{table}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM '{dst_dir}/{table}.parquet'"
        ).fetchone()[0]
        print(f"{table} (sf10): {n} rows")

    build10(
        "orders",
        "SELECT o_orderkey + {i} * " + str(off2) + " AS o_orderkey,"
        " o_custkey + {i} * " + str(off2) + " AS o_custkey,"
        " o_orderstatus, o_totalprice, o_orderdate, o_orderpriority FROM {src}",
    )
    build10(
        "lineitem",
        "SELECT l_orderkey + {i} * " + str(off2) + " AS l_orderkey,"
        " l_partkey + {i} * " + str(off2) + " AS l_partkey,"
        " l_suppkey + {i} * " + str(off2) + " AS l_suppkey,"
        " l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,"
        " l_returnflag, l_linestatus, l_shipdate FROM {src}",
    )
    # ts shifts by i * 366 days: the co-occurrence graph cells are
    # (props.k, hour), and neither is key-offset — without the shift
    # all ten replicas land in the SAME cells, densifying each cell
    # 10x and blowing the per-cell pair expansion up 100x (an
    # adversarial quadratic, not a scale-up; it OOMed the first sf10
    # run).  Shifted, the replicas occupy disjoint hour cells — 10x
    # users AND 10x cells, the realistic growth shape, exactly like
    # the key-offset trade graph.
    build10(
        "events",
        "SELECT event_id + {i} * " + str(off2) + " AS event_id,"
        " ts + INTERVAL ({i} * 366) DAY AS ts,"
        " user_id + {i} * " + str(off2) + " AS user_id,"
        " event_type, value, props FROM {src}",
    )
    build10(
        "embeddings",
        "SELECT vec_id + {i} * " + str(off2) + " AS vec_id,"
        " CASE WHEN {i} = 0 THEN embedding ELSE"
        "   list_transform(embedding, (x, j) ->"
        "     CASE WHEN bit_count((j - 1) & {i}) % 2 = 1 THEN -x ELSE x END)"
        " END AS embedding,"
        " label FROM {src}",
    )
    print("done ->", dst_dir)


def make_graph_sf100() -> None:
    """10 further replicas of the sf10 graph tables (= 1000x the
    driver's sf0.1) at .scale/sf100: events (the co-occurrence graph)
    plus lineitem + orders (the trade graph) — the r10 verdict's ask
    #5 (graph family third decade; dedup already has three measured
    decades, graph owned the five most expensive bench rows with two).

    Same discipline as the second level: keys offset by i * 1B (sf10
    keys are < 10 * 100M = 1B) so the hundred resulting subgraphs are
    DISJOINT — nodes and edges scale 10x again; events ts shifts by
    i * 3700 days, clearing the whole sf10 span (sf0.1 base year +
    second-level shifts up to 9 * 366 days ~ 3294 + 366 < 3700), so
    co-occurrence (props.k, hour) cells stay disjoint across replicas
    (the documented sf10 lesson: unshifted replicas densify cells and
    the pair stage goes quadratic).  Embeddings/documents are not
    built here — this level exists for the graph family only."""
    src_dir = os.path.join(os.path.dirname(DST), "sf10")
    for t in ("events", "lineitem", "orders"):
        if not os.path.exists(os.path.join(src_dir, f"{t}.parquet")):
            raise SystemExit(
                "build .scale/sf10 first (python tools/make_scale.py "
                "--graph-emb-sf100x)"
            )
    dst_dir = os.path.join(os.path.dirname(DST), "sf100")
    os.makedirs(dst_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")
    # CAST: DuckDB folds {i} * off3 in INT32 otherwise and overflows
    off3 = "CAST(1000000000 AS BIGINT)"

    def build100(table: str, select_tpl: str) -> None:
        src = f"'{src_dir}/{table}.parquet'"
        union = " UNION ALL ".join(
            select_tpl.format(i=i, src=src) for i in range(10)
        )
        con.execute(
            f"COPY ({union}) TO '{dst_dir}/{table}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM '{dst_dir}/{table}.parquet'"
        ).fetchone()[0]
        print(f"{table} (sf100): {n} rows")

    build100(
        "events",
        "SELECT event_id + {i} * " + str(off3) + " AS event_id,"
        " ts + INTERVAL ({i} * 3700) DAY AS ts,"
        " user_id + {i} * " + str(off3) + " AS user_id,"
        " event_type, value, props FROM {src}",
    )
    build100(
        "orders",
        "SELECT o_orderkey + {i} * " + str(off3) + " AS o_orderkey,"
        " o_custkey + {i} * " + str(off3) + " AS o_custkey,"
        " o_orderstatus, o_totalprice, o_orderdate, o_orderpriority FROM {src}",
    )
    build100(
        "lineitem",
        "SELECT l_orderkey + {i} * " + str(off3) + " AS l_orderkey,"
        " l_partkey + {i} * " + str(off3) + " AS l_partkey,"
        " l_suppkey + {i} * " + str(off3) + " AS l_suppkey,"
        " l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,"
        " l_returnflag, l_linestatus, l_shipdate FROM {src}",
    )
    print("done ->", dst_dir)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--documents-sf100x":
        make_documents_sf10()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--graph-emb-sf100x":
        make_graph_emb_sf10()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--documents-sf1000x":
        make_documents_sf100()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--graph-sf1000x":
        make_graph_sf100()
        return
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    # The embedding decorrelation rolls by (i % dim); replicas > dim
    # would alias replica i back onto replica 0's exact vectors and
    # silently reintroduce the cosine-duplicate blowup the roll avoids.
    if replicas > EMB_DIM:
        raise SystemExit(
            f"replicas={replicas} exceeds embedding dim {EMB_DIM}; "
            "roll-based decorrelation would alias back to replica 0"
        )
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")

    def build(table: str, select_tpl: str) -> None:
        parts = [
            select_tpl.format(i=i, src=f"'{SRC}/{table}.parquet'")
            for i in range(replicas)
        ]
        union = " UNION ALL ".join(parts)
        con.execute(
            f"COPY ({union}) TO '{DST}/{table}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT count(*) FROM '{DST}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")

    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{DST}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied (dimension, unscaled)")

    build(
        "customer",
        "SELECT c_custkey + {i} * " + str(OFF) + " AS c_custkey, c_name, c_nationkey,"
        " c_acctbal, c_mktsegment FROM {src}",
    )
    build(
        "supplier",
        "SELECT s_suppkey + {i} * " + str(OFF) + " AS s_suppkey, s_name, s_nationkey,"
        " s_acctbal FROM {src}",
    )
    build(
        "part",
        "SELECT p_partkey + {i} * " + str(OFF) + " AS p_partkey, p_name, p_brand,"
        " p_type, p_size, p_retailprice FROM {src}",
    )
    build(
        "orders",
        "SELECT o_orderkey + {i} * " + str(OFF) + " AS o_orderkey,"
        " o_custkey + {i} * " + str(OFF) + " AS o_custkey,"
        " o_orderstatus, o_totalprice, o_orderdate, o_orderpriority FROM {src}",
    )
    build(
        "lineitem",
        "SELECT l_orderkey + {i} * " + str(OFF) + " AS l_orderkey,"
        " l_partkey + {i} * " + str(OFF) + " AS l_partkey,"
        " l_suppkey + {i} * " + str(OFF) + " AS l_suppkey,"
        " l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,"
        " l_returnflag, l_linestatus, l_shipdate FROM {src}",
    )
    build(
        "events",
        "SELECT event_id + {i} * " + str(OFF) + " AS event_id, ts,"
        " user_id + {i} * " + str(OFF) + " AS user_id,"
        " event_type, value, props FROM {src}",
    )
    # documents: inject a per-replica salt token every 5 words so
    # replicas are not near-duplicates of each other (replica 0 is the
    # original text verbatim).  n_chars is recomputed from the salted
    # text (the driver data satisfies n_chars == length(text) exactly,
    # so this is lossless for replica 0 and correct for the others --
    # passing n_chars through verbatim would skew every query that
    # aggregates document volume).
    build(
        "documents",
        "SELECT doc_id, text, lang, source,"
        " CAST(length(text) AS BIGINT) AS n_chars FROM ("
        " SELECT doc_id + {i} * " + str(OFF) + " AS doc_id,"
        " CASE WHEN {i} = 0 THEN text ELSE"
        "   array_to_string(list_transform(string_split(text, ' '),"
        "     (w, j) -> CASE WHEN j % 5 = 0 THEN w || ' zsalt{i}q' ELSE w END), ' ')"
        " END AS text,"
        " lang, source FROM {src})",
    )
    # embeddings: roll the vector left by i positions (norm-preserving
    # deterministic decorrelation across replicas).
    build(
        "embeddings",
        "SELECT vec_id + {i} * " + str(OFF) + " AS vec_id,"
        " CASE WHEN {i} = 0 THEN embedding ELSE"
        "   list_concat(embedding[1 + ({i} % len(embedding)):],"
        "               embedding[:{i} % len(embedding)])"
        " END AS embedding,"
        " label FROM {src}",
    )
    print("done ->", DST)


if __name__ == "__main__":
    main()
