#!/usr/bin/env python3
"""Soak-SF checker for v_knn_join_mp (builder-side; the driver gate keeps
the registered single-window oracle, which passes at the driver SFs).

At sf1-class data the registered oracle's final ROW_NUMBER window sorts
~100M candidate pairs in one go and exceeds DuckDB's temp budget (observed
>80 GB spill). This script runs an EQUIVALENT decomposition instead:

  per probe-label top-k window  (partitionable, bounded spill)
  -> union of candidates        (<= |labels| * k rows per vector)
  -> final top-k of candidates

Equivalence: the global top-k per vec_a equals the top-k of the per-block
top-ks, because every global winner is a within-block winner for its own
block (same cosine expression, same DESC cosine / ASC vec_b tie order).
Validated bit-exact against the engine output at sf0.1 before the soak
run; `PASS` means pandas assert_frame_equal(check_exact=True) held.

Usage: tools/knn_mp_soak_check.py <sfDir> <verifyOutDir>
  <verifyOutDir>/v_knn_join_mp must hold the engine's parquet dump.
"""
import duckdb, pandas as pd, sys

sf, out = sys.argv[1], sys.argv[2]
K, NPROBE, DIM = 5, 2, 64
con = duckdb.connect()
con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{sf}/embeddings.parquet'")


def dot(a, b):
    return (f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
            f"list_transform(range(1, {DIM+1}), i -> CAST({a}.embedding[i] AS DOUBLE) * CAST({b}.embedding[i] AS DOUBLE))), (acc, x) -> acc + x)")


def fl6(e):  # EventSemantics.flSql(expr, 6): floor(expr * 1e6) / 1e6
    return f"(floor(({e}) * 1000000) / 1000000)"


# probe assignment: same cosine-to-centroid ranking as the registered
# oracle, but the scalar scores are MATERIALIZED before the window —
# DuckDB otherwise carries the 64-float lists through the rank sort and
# spills (observed at 100 cells x 20k vectors even though the scored
# relation is only |vectors| x |cells| x 3 scalars).
con.sql(f"""
CREATE TEMP TABLE probe_scores AS
WITH cent AS (
  SELECT label, i AS pos, AVG(CAST(embedding[i] AS DOUBLE)) AS cv
  FROM embeddings, (SELECT unnest(range(1, {DIM+1})) AS i)
  WHERE label IS NOT NULL GROUP BY 1, 2),
 cvecs AS (SELECT label, list(cv ORDER BY pos) AS cvec FROM cent GROUP BY 1)
 SELECT e.vec_id, c.label,
  (floor((list_reduce(list_prepend(CAST(0 AS DOUBLE),
     list_transform(range(1, {DIM+1}), i -> CAST(c.cvec[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))), (acc,x) -> acc + x)
    / (sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, {DIM+1}), i -> CAST(c.cvec[i] AS DOUBLE) * CAST(c.cvec[i] AS DOUBLE))), (acc,x) -> acc + x))
     * sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, {DIM+1}), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))), (acc,x) -> acc + x)))) * 1000000) / 1000000) AS s
 FROM embeddings e CROSS JOIN cvecs c
""")
con.sql(f"""
CREATE TEMP TABLE probes AS
WITH ranked AS (
  SELECT vec_id, label AS probe_label,
   ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY s DESC, label ASC) AS pr
  FROM probe_scores)
 SELECT vec_id, probe_label FROM ranked WHERE pr <= {NPROBE}
 UNION SELECT vec_id, label AS probe_label FROM embeddings
""")
# a NULL-label vector contributes a NULL probe (its own label) which can
# never match a b-side label — and would interpolate as the SQL keyword
# None below, a syntax error — so it is dropped here, matching the engine
labels = [r[0] for r in con.sql(
    "SELECT DISTINCT probe_label FROM probes WHERE probe_label IS NOT NULL ORDER BY 1").fetchall()]
print("labels:", labels, flush=True)
con.sql("CREATE TEMP TABLE cand (vec_a BIGINT, vec_b BIGINT, cosine DOUBLE)")
for L in labels:
    con.sql(f"""
    INSERT INTO cand
    WITH pairs AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        {fl6(f"{dot('a','b')} / (sqrt({dot('a','a')}) * sqrt({dot('b','b')}))")} AS cosine
      FROM (SELECT e.* FROM probes p JOIN embeddings e ON e.vec_id = p.vec_id
            WHERE p.probe_label = {L}) a
      JOIN embeddings b ON b.label = {L} AND b.vec_id <> a.vec_id)
    SELECT vec_a, vec_b, cosine FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_a ORDER BY cosine DESC, vec_b ASC) AS r
      FROM pairs) WHERE r <= {K}
    """)
    print("label", L, "done", flush=True)
# DISTINCT: a (vec_a, vec_b) pair found via two probe labels is one edge
odf = con.sql(f"""
SELECT vec_a, vec_b, cosine, nn_rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY vec_a ORDER BY cosine DESC, vec_b ASC) AS BIGINT) AS nn_rank
  FROM (SELECT DISTINCT vec_a, vec_b, cosine FROM cand))
WHERE nn_rank <= {K}
""").df()
sdf = con.sql(f"SELECT * FROM '{out}/v_knn_join_mp/*.parquet'").df()
cols = sorted(sdf.columns)
assert sorted(odf.columns) == cols, (sorted(odf.columns), cols)
s = sdf[cols].sort_values(cols).reset_index(drop=True)
o = odf[cols].sort_values(cols).reset_index(drop=True)
assert [str(s[c].dtype) for c in cols] == [str(o[c].dtype) for c in cols], "dtype"
pd.testing.assert_frame_equal(s, o, check_dtype=True, check_exact=True)
print(f"PASS v_knn_join_mp ({len(s)} rows, decomposed two-phase top-k oracle)")
