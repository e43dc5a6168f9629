#!/usr/bin/env python3
"""Soak-SF checker for v_knn_join_geo and v_knn_join_incremental
(builder-side). SINCE ROUND 10 the registered oracles themselves run a
bounded iterated-argmax top-k (materialized pairs with an exact BIGINT
order key, k unrolled max() passes to the per-vector threshold —
Vectors.twoStageTopKSql), and ALL FIVE graph entries pass check.py at
the factor-10 corpus directly (an intermediate ordered-list-aggregate
formulation did not: DuckDB's list() state holds every block's full
candidate list, and geo/mp/mph exhausted the spill budget — see
SCALING.md). This script is therefore an independent CROSS-CHECK: its
per-label INSERT decomposition exercises a different execution path
than the registered SQL and validated the graph outputs bit-exact at
sf1 before the rewrite shipped. Pre-r10
history: the registered single-window
oracles' final ROW_NUMBER sorted ~100M candidate pairs in one go and
exceeded DuckDB's temp budget (the v_knn_join_mp failure mode,
tools/knn_mp_soak_check.py); these decompositions were then the only
sf1 validation path (shared machinery in tools/knn_soak_common.py):

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
import duckdb, json, sys, time
from knn_soak_common import (K, cos_expr, compare, build_probe_tables,
                             probe_labels, insert_label_topk, final_topk_df,
                             create_vsrc)


def check_incremental(con, out):
    """Per-label decomposition of knnGraphSql: blocks are disjoint, so the
    within-label window is final."""
    labels = [r[0] for r in con.sql(
        "SELECT DISTINCT label FROM vsrc WHERE label IS NOT NULL ORDER BY 1").fetchall()]
    con.sql("CREATE TEMP TABLE g_inc (label INTEGER, vec_a BIGINT, vec_b BIGINT, cosine DOUBLE, nn_rank BIGINT)")
    for L in labels:
        t0 = time.time()
        con.sql(f"""
        INSERT INTO g_inc
        WITH pairs AS (
          SELECT a.label AS label, a.vec_id AS vec_a, b.vec_id AS vec_b,
            {cos_expr('a', 'b')} AS cosine
          FROM (SELECT * FROM vsrc WHERE label = {L}) a
          JOIN (SELECT * FROM vsrc WHERE label = {L}) b ON b.vec_id <> a.vec_id)
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
    build_probe_tables(con, "geo_t", "geo_scores", "geo_probes")
    labels = probe_labels(con, "geo_probes")
    print("  probe labels:", labels, flush=True)
    con.sql("CREATE TEMP TABLE geo_cand (vec_a BIGINT, vec_b BIGINT, cosine DOUBLE)")
    for L in labels:
        insert_label_topk(con, "geo_cand", "geo_t", "geo_probes", L)
    n = compare(con, final_topk_df(con, "geo_cand"), out, "v_knn_join_geo")
    print(f"PASS v_knn_join_geo ({n} rows, lifted-Lloyd + per-probe-label decomposed oracle)", flush=True)


def check_mph(con, out, oracle_sql):
    """Decompose the hierarchical multi-probe oracle. The registered SQL
    is a STASHED replay (sup/cells VALUES literals from the engine's
    training pass); everything up to and including the `probes` CTE is
    lifted VERBATIM from oracle_sql.json — the checker stays pinned to
    the registered super/cell assignment by construction — and only the
    pairs + final-window tail (the part whose single-window sort spills
    past the disk budget at sf1-class data) is replaced by the same
    per-probe-label top-k -> union -> final-top-k decomposition the mp
    checker uses. Equivalence argument is identical: every global top-k
    winner is a within-block winner for its own block, same floored
    cosine, same DESC cosine / ASC vec_b tie order."""
    sql = oracle_sql["v_knn_join_mph"]
    cut = sql.index(" pairs AS (")
    prefix = sql[:cut].rstrip()
    assert prefix.endswith(","), prefix[-40:]
    prefix = prefix[len("WITH "):-1]
    t0 = time.time()
    # unreferenced CTEs are not evaluated, so mph_src costs only the vsrc scan
    con.sql(f"CREATE TEMP TABLE mph_src AS WITH {prefix} SELECT vec_id, label, embedding FROM vsrc")
    con.sql(f"CREATE TEMP TABLE mph_probes AS WITH {prefix} SELECT vec_id, probe_label FROM probes")
    print(f"  stashed hierarchy prefix materialized ({time.time()-t0:.1f}s)", flush=True)
    labels = probe_labels(con, "mph_probes")
    print("  probe labels:", labels, flush=True)
    con.sql("CREATE TEMP TABLE mph_cand (vec_a BIGINT, vec_b BIGINT, cosine DOUBLE)")
    for L in labels:
        insert_label_topk(con, "mph_cand", "mph_src", "mph_probes", L)
    n = compare(con, final_topk_df(con, "mph_cand"), out, "v_knn_join_mph")
    print(f"PASS v_knn_join_mph ({n} rows, lifted-hierarchy + per-probe-label decomposed oracle)", flush=True)


if __name__ == "__main__":
    sf, out = sys.argv[1], sys.argv[2]
    queries = sys.argv[3:] or ["v_knn_join_incremental", "v_knn_join_geo"]
    con = duckdb.connect()
    # vsrc = the registered oracle's validity view (see knn_soak_common);
    # the lifted-prefix checkers shadow it with the oracle's own vsrc CTE
    create_vsrc(con, sf)
    oracle_sql = json.load(open(f"{out}/oracle_sql.json"))
    for q in queries:
        if q == "v_knn_join_incremental":
            check_incremental(con, out)
        elif q == "v_knn_join_geo":
            check_geo(con, out, oracle_sql)
        elif q == "v_knn_join_mph":
            check_mph(con, out, oracle_sql)
        else:
            raise SystemExit(f"unknown query {q}")
