#!/usr/bin/env python3
"""Soak-SF checker for v_knn_join_mp (builder-side). SINCE ROUND 10 the
registered oracle runs a bounded iterated-argmax top-k and passes
check.py at sf1-class corpora directly (Vectors.twoStageTopKSql;
SCALING.md) — this script is now an independent CROSS-CHECK on a
different execution path. Historical context: the original registered
oracle's final ROW_NUMBER window sorted ~100M candidate pairs in one go
and exceeded DuckDB's temp budget (observed >80 GB spill), and this
decomposition was then the only sf1 validation path
(shared machinery in tools/knn_soak_common.py):

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
import duckdb, sys
from knn_soak_common import (compare, build_probe_tables, probe_labels,
                             insert_label_topk, final_topk_df, create_vsrc)

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
# vsrc = the registered oracle's validity view (see knn_soak_common)
create_vsrc(con, sf)

build_probe_tables(con, "vsrc", "probe_scores", "probes")
labels = probe_labels(con, "probes")
print("labels:", labels, flush=True)
con.sql("CREATE TEMP TABLE cand (vec_a BIGINT, vec_b BIGINT, cosine DOUBLE)")
for L in labels:
    insert_label_topk(con, "cand", "vsrc", "probes", L)
n = compare(con, final_topk_df(con, "cand"), out, "v_knn_join_mp")
print(f"PASS v_knn_join_mp ({n} rows, decomposed two-phase top-k oracle)")
