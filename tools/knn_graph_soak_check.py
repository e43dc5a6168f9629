#!/usr/bin/env python3
"""Soak-SF checker for v_knn_join_geo and v_knn_join_incremental
(builder-side; the driver gate keeps the registered single-window
oracles, which pass at the driver SFs).

At sf1-class data the registered oracles' final ROW_NUMBER window sorts
~100M candidate pairs in one go and exceeds DuckDB's temp budget (the
v_knn_join_mp failure mode, tools/knn_mp_soak_check.py). This script
runs EQUIVALENT decompositions instead:

  v_knn_join_incremental — oracle is the monolithic label-blocked graph
    (knnGraphSql). Blocks are disjoint (each vec_a lives in exactly one
    label), so the per-label top-k IS the global top-k: one bounded
    INSERT per label, no cross-label window at all.

  v_knn_join_geo — oracle is kmeans-train -> assign -> multi-probe ->
    graph (knnJoinGeoSql). The kmeans prefix (unrolled Lloyd CTE chain,
    bounded by cells x iters) is lifted VERBATIM from the registered SQL
    in <verifyOutDir>/oracle_sql.json and materialized once as the
    relabeled relation; the probe/pair/top-k tail then runs the same
    per-probe-label top-k -> union -> final-top-k decomposition as the
    mp checker. Equivalence: every global top-k winner is a within-block
    winner for its own block (same floored cosine, same DESC cosine /
    ASC vec_b tie order), so the top-k of per-block top-ks equals the
    global top-k.

Lifting the Lloyd prefix from oracle_sql.json (rather than re-typing
it) keeps the checker pinned to the REGISTERED training replay — if the
oracle's kmeans constants change, the checker follows automatically.

Usage: tools/knn_graph_soak_check.py <sfDir> <verifyOutDir> [query ...]
  <verifyOutDir>/<query> must hold the engine's parquet dump and
  <verifyOutDir>/oracle_sql.json the registered oracle strings.
  Default queries: v_knn_join_incremental v_knn_join_geo
"""
import duckdb, json, pandas as pd, sys, time

K, NPROBE, DIM = 5, 2, 64


def dot(a, b):
    return (f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
            f"list_transform(range(1, {DIM+1}), i -> CAST({a}.embedding[i] AS DOUBLE) * CAST({b}.embedding[i] AS DOUBLE))), (acc, x) -> acc + x)")


def fl6(e):  # EventSemantics.flSql(expr, 6)
    return f"(floor(({e}) * 1000000) / 1000000)"


def compare(con, df_oracle, out, query):
    sdf = con.sql(f"SELECT * FROM '{out}/{query}/*.parquet'").df()
    cols = sorted(sdf.columns)
    assert sorted(df_oracle.columns) == cols, (sorted(df_oracle.columns), cols)
    s = sdf[cols].sort_values(cols).reset_index(drop=True)
    o = df_oracle[cols].sort_values(cols).reset_index(drop=True)
    assert [str(s[c].dtype) for c in cols] == [str(o[c].dtype) for c in cols], "dtype"
    pd.testing.assert_frame_equal(s, o, check_dtype=True, check_exact=True)
    return len(s)


def check_incremental(con, out):
    """Per-label decomposition of knnGraphSql: blocks are disjoint, so the
    within-label window is final."""
    labels = [r[0] for r in con.sql(
        "SELECT DISTINCT label FROM embeddings WHERE label IS NOT NULL ORDER BY 1").fetchall()]
    con.sql("CREATE TEMP TABLE g_inc (label INTEGER, vec_a BIGINT, vec_b BIGINT, cosine DOUBLE, nn_rank BIGINT)")
    for L in labels:
        t0 = time.time()
        con.sql(f"""
        INSERT INTO g_inc
        WITH pairs AS (
          SELECT a.label AS label, a.vec_id AS vec_a, b.vec_id AS vec_b,
            {fl6(f"{dot('a','b')} / (sqrt({dot('a','a')}) * sqrt({dot('b','b')}))")} AS cosine
          FROM (SELECT * FROM embeddings WHERE label = {L}) a
          JOIN (SELECT * FROM embeddings WHERE label = {L}) b ON b.vec_id <> a.vec_id)
        SELECT label, vec_a, vec_b, cosine, nn_rank FROM (
          SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY vec_a
            ORDER BY cosine DESC, vec_b ASC) AS BIGINT) AS nn_rank
          FROM pairs) WHERE nn_rank <= {K}
        """)
        print(f"  label {L} done ({time.time()-t0:.1f}s)", flush=True)
    n = compare(con, con.sql("SELECT * FROM g_inc").df(), out, "v_knn_join_incremental")
    print(f"PASS v_knn_join_incremental ({n} rows, per-label decomposed oracle)", flush=True)


def check_geo(con, out, oracle_sql):
    """Materialize the registered oracle's kmeans prefix, then decompose
    the multi-probe tail per probe label."""
    sql = oracle_sql["v_knn_join_geo"]
    cut = sql.index("cent AS (")
    prefix = sql[len("WITH "):cut].rstrip()
    assert prefix.endswith(","), prefix[-40:]
    t0 = time.time()
    con.sql(f"CREATE TEMP TABLE geo_t AS WITH {prefix[:-1]} SELECT vec_id, label, embedding FROM geo")
    print(f"  kmeans prefix materialized ({time.time()-t0:.1f}s)", flush=True)
    # probe assignment over the RELABELED relation — same cell-mean
    # centroid / floored-cosine ranking as the registered tail, scalar
    # scores materialized before the window (the mp checker's spill fix)
    con.sql(f"""
    CREATE TEMP TABLE geo_scores AS
    WITH cent AS (
      SELECT label, i AS pos, AVG(CAST(embedding[i] AS DOUBLE)) AS cv
      FROM geo_t, (SELECT unnest(range(1, {DIM+1})) AS i)
      WHERE label IS NOT NULL GROUP BY 1, 2),
     cvecs AS (SELECT label, list(cv ORDER BY pos) AS cvec FROM cent GROUP BY 1)
     SELECT e.vec_id, c.label,
      {fl6(f"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, {DIM+1}), i -> CAST(c.cvec[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))), (acc,x) -> acc + x) / (sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, {DIM+1}), i -> CAST(c.cvec[i] AS DOUBLE) * CAST(c.cvec[i] AS DOUBLE))), (acc,x) -> acc + x)) * sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, {DIM+1}), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))), (acc,x) -> acc + x)))")} AS s
     FROM geo_t e CROSS JOIN cvecs c
    """)
    con.sql(f"""
    CREATE TEMP TABLE geo_probes AS
    WITH ranked AS (
      SELECT vec_id, label AS probe_label,
       ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY s DESC, label ASC) AS pr
      FROM geo_scores)
     SELECT vec_id, probe_label FROM ranked WHERE pr <= {NPROBE}
     UNION SELECT vec_id, label AS probe_label FROM geo_t
    """)
    labels = [r[0] for r in con.sql(
        "SELECT DISTINCT probe_label FROM geo_probes WHERE probe_label IS NOT NULL ORDER BY 1").fetchall()]
    print("  probe labels:", labels, flush=True)
    con.sql("CREATE TEMP TABLE geo_cand (vec_a BIGINT, vec_b BIGINT, cosine DOUBLE)")
    for L in labels:
        t0 = time.time()
        con.sql(f"""
        INSERT INTO geo_cand
        WITH pairs AS (
          SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
            {fl6(f"{dot('a','b')} / (sqrt({dot('a','a')}) * sqrt({dot('b','b')}))")} AS cosine
          FROM (SELECT e.* FROM geo_probes p JOIN geo_t e ON e.vec_id = p.vec_id
                WHERE p.probe_label = {L}) a
          JOIN geo_t b ON b.label = {L} AND b.vec_id <> a.vec_id)
        SELECT vec_a, vec_b, cosine FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_a ORDER BY cosine DESC, vec_b ASC) AS r
          FROM pairs) WHERE r <= {K}
        """)
        print(f"  probe label {L} done ({time.time()-t0:.1f}s)", flush=True)
    odf = con.sql(f"""
    SELECT vec_a, vec_b, cosine, nn_rank FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY vec_a ORDER BY cosine DESC, vec_b ASC) AS BIGINT) AS nn_rank
      FROM (SELECT DISTINCT vec_a, vec_b, cosine FROM geo_cand))
    WHERE nn_rank <= {K}
    """).df()
    n = compare(con, odf, out, "v_knn_join_geo")
    print(f"PASS v_knn_join_geo ({n} rows, lifted-Lloyd + per-probe-label decomposed oracle)", flush=True)


if __name__ == "__main__":
    sf, out = sys.argv[1], sys.argv[2]
    queries = sys.argv[3:] or ["v_knn_join_incremental", "v_knn_join_geo"]
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{sf}/embeddings.parquet'")
    oracle_sql = json.load(open(f"{out}/oracle_sql.json"))
    for q in queries:
        if q == "v_knn_join_incremental":
            check_incremental(con, out)
        elif q == "v_knn_join_geo":
            check_geo(con, out, oracle_sql)
        else:
            raise SystemExit(f"unknown query {q}")
