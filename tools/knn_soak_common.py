"""Shared pieces of the soak-SF kNN-graph checkers
(knn_mp_soak_check.py, knn_graph_soak_check.py): the cosine/floor SQL
generators, the multi-probe assignment tables, the per-probe-label
top-k candidate INSERT, and the engine-dump comparison. One definition
so a fix to the cosine expression or the spill-avoidance shape cannot
silently diverge between the mp and graph checkers.

All SQL mirrors the REGISTERED oracles (Vectors.knnJoinMultiProbeSql):
6-floored cosines, DESC cosine / ASC vec_b tie order, own-label probe
always kept.
"""
import pandas as pd
import time

K, NPROBE, DIM = 5, 2, 64


def create_vsrc(con, sf):
    """Register `embeddings` (raw parquet) and `vsrc` — the same validity
    view the REGISTERED oracles read through (Vectors.vecValidSql: non-NULL
    vec_id/embedding, exact dim, no NULL elements). Checkers must build
    centroids/probes/pairs from vsrc, not raw embeddings: on a corpus with
    any invalid row, reading raw would diverge from the engine and report
    a false FAIL."""
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{sf}/embeddings.parquet'")
    con.sql(f"""CREATE VIEW vsrc AS
      SELECT vec_id, label, embedding FROM embeddings
      WHERE vec_id IS NOT NULL AND embedding IS NOT NULL
        AND len(embedding) = {DIM}
        AND len(list_filter(embedding, x -> x IS NULL)) = 0""")


def dot(a, b):
    return (f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
            f"list_transform(range(1, {DIM+1}), i -> CAST({a}.embedding[i] AS DOUBLE) * CAST({b}.embedding[i] AS DOUBLE))), (acc, x) -> acc + x)")


def fl6(e):  # EventSemantics.flSql(expr, 6): floor(expr * 1e6) / 1e6
    return f"(floor(({e}) * 1000000) / 1000000)"


def cos_expr(a, b):
    return fl6(f"{dot(a, b)} / (sqrt({dot(a, a)}) * sqrt({dot(b, b)}))")


def build_probe_tables(con, src, scores, probes):
    """Multi-probe assignment over relation `src` (vec_id, label,
    embedding): cell-mean centroids, floored-cosine ranking with the
    scalar scores MATERIALIZED before the window (DuckDB otherwise
    carries the 64-float lists through the rank sort and spills), own
    label unioned in. Creates temp tables `scores` and `probes`."""
    con.sql(f"""
    CREATE TEMP TABLE {scores} AS
    WITH cent AS (
      SELECT label, i AS pos, AVG(CAST(embedding[i] AS DOUBLE)) AS cv
      FROM {src}, (SELECT unnest(range(1, {DIM+1})) AS i)
      WHERE label IS NOT NULL GROUP BY 1, 2),
     cvecs AS (SELECT label, list(cv ORDER BY pos) AS cvec FROM cent GROUP BY 1)
     SELECT e.vec_id, c.label,
      {fl6(f"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, {DIM+1}), i -> CAST(c.cvec[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))), (acc,x) -> acc + x) / (sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, {DIM+1}), i -> CAST(c.cvec[i] AS DOUBLE) * CAST(c.cvec[i] AS DOUBLE))), (acc,x) -> acc + x)) * sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, {DIM+1}), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))), (acc,x) -> acc + x)))")} AS s
     FROM {src} e CROSS JOIN cvecs c
    """)
    con.sql(f"""
    CREATE TEMP TABLE {probes} AS
    WITH ranked AS (
      SELECT vec_id, label AS probe_label,
       ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY s DESC, label ASC) AS pr
      FROM {scores})
     SELECT vec_id, probe_label FROM ranked WHERE pr <= {NPROBE}
     UNION SELECT vec_id, label AS probe_label FROM {src}
    """)


def probe_labels(con, probes):
    """Distinct non-NULL probe labels. A NULL-label vector contributes a
    NULL probe (its own label) which can never match a b-side label — and
    would interpolate as the SQL keyword None below, a syntax error — so
    it is dropped, matching the engine."""
    return [r[0] for r in con.sql(
        f"SELECT DISTINCT probe_label FROM {probes} WHERE probe_label IS NOT NULL ORDER BY 1").fetchall()]


def insert_label_topk(con, cand, src, probes, label):
    """Per-probe-label candidate generation: probers of `label` against
    the label's block, within-block top-k per vec_a. One bounded INSERT —
    the spill-free decomposition of the registered single-window oracle."""
    t0 = time.time()
    con.sql(f"""
    INSERT INTO {cand}
    WITH pairs AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        {cos_expr('a', 'b')} AS cosine
      FROM (SELECT e.* FROM {probes} p JOIN {src} e ON e.vec_id = p.vec_id
            WHERE p.probe_label = {label}) a
      JOIN {src} b ON b.label = {label} AND b.vec_id <> a.vec_id)
    SELECT vec_a, vec_b, cosine FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_a ORDER BY cosine DESC, vec_b ASC) AS r
      FROM pairs) WHERE r <= {K}
    """)
    print(f"  probe label {label} done ({time.time()-t0:.1f}s)", flush=True)


def final_topk_df(con, cand):
    """Global top-k from the per-block top-ks (every global winner is a
    within-block winner for its own block, so this equals the registered
    single-window result). DISTINCT first: a pair found via two probe
    labels is one edge."""
    return con.sql(f"""
    SELECT vec_a, vec_b, cosine, nn_rank FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY vec_a ORDER BY cosine DESC, vec_b ASC) AS BIGINT) AS nn_rank
      FROM (SELECT DISTINCT vec_a, vec_b, cosine FROM {cand}))
    WHERE nn_rank <= {K}
    """).df()


def compare(con, df_oracle, out, query):
    """Exact frame equality (schema, dtypes, values) between the
    decomposed oracle and the engine's parquet dump."""
    sdf = con.sql(f"SELECT * FROM '{out}/{query}/*.parquet'").df()
    cols = sorted(sdf.columns)
    assert sorted(df_oracle.columns) == cols, (sorted(df_oracle.columns), cols)
    s = sdf[cols].sort_values(cols).reset_index(drop=True)
    o = df_oracle[cols].sort_values(cols).reset_index(drop=True)
    assert [str(s[c].dtype) for c in cols] == [str(o[c].dtype) for c in cols], "dtype"
    pd.testing.assert_frame_equal(s, o, check_dtype=True, check_exact=True)
    return len(s)
