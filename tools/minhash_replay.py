#!/usr/bin/env python3
"""Chunked replay of the q_dedup_minhash-family oracles at scales where the
single-statement DuckDB replay exceeds time/memory budgets (VERDICT r15 #4).

The verbatim oracle (SparkEntry.oracleSql q_dedup_minhash) is one DuckDB
statement whose cost explodes superlinearly with doc count: the sigv stage
expands every (doc, gram) hash 64x through a 5-stage HUGEINT fmix64 chain
(v0..vh: at sf10 that is 27M grams x 64 = 1.7B HUGEINT rows through the
pipeline before the GROUP BY min), which blows DuckDB's operator memory and
spills. This tool splits the SAME computation into stages:

  1. gramt, gh  -- VERBATIM slices of the oracle SQL text, materialized as
     temp tables (gram extraction + per-(doc,gram) poly-257/fmix64 hash).
  2. sigv       -- the 64 permutation minima, computed vectorized in numpy
     (fmix64(h ^ key_p) with wrapping uint64 arithmetic, minimum.reduceat
     per doc) and registered as a DuckDB table. The permutation keys are
     ALSO recomputed by the verbatim keys CTE in DuckDB and asserted equal
     to the numpy keys on every run.
  3. bands/capped -- the VERBATIM bands + 1000-cap slice, materialized
     once (shared text across the three replayed queries, asserted).
  4. cand         -- the VERBATIM candidate self-join slice, run once PER
     band_idx against the materialized capped rows and unioned
     (VERDICT r16 #4: the monolithic DISTINCT over 396M join rows was
     ~17 of the 21.8 replay minutes at sf10). Exact by construction:
     band_idx is part of the join's USING key, so the join decomposes by
     band, and DISTINCT over the union of per-band DISTINCTs equals the
     global DISTINCT.
  5. pairs..end   -- the VERBATIM gram-Jaccard verify + final projection,
     fed by the deduplicated candidate table.

Both verbatim slices are extracted from oracle_sql.json by marker indices
(hard require() on the markers, like SparkEntry's own oracle derivation
guards), so the replay can never silently drift from the oracle text.
--validate additionally runs the untouched single-statement oracle and
asserts frame equality with the replay (feasible at sf0.01/sf0.1/sf1) --
that is the instrument's calibration.

Final compare against the Spark Verify dump reuses tools/check.py's
check_one (schema + dtype + exact values), so the gate semantics are
identical to the driver's.

Usage:
  python3 tools/minhash_replay.py SF_DIR VERIFY_OUT_DIR \
      [--queries q_dedup_minhash,q_dedup_incremental,q_dedup_incr_store] \
      [--validate] [--threads N] [--mem 24GB] [--tmp /tmp/minhash_spill]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import check  # noqa: E402  (tools/check.py -- the gate's compare)
from replay_common import connect_views, fmix64, load_oracle, make_logger  # noqa: E402

SENTINEL = np.uint64(18446744073709551615)
log = make_logger("replay")


def slice_oracle(sql):
    """Split the verbatim minhash oracle text into (gramt_ddl, gh_ddl,
    back_half) at fixed CTE markers. require()-style guards: a shape change
    in SparkEntry's oracle makes this a hard error, not a silent drift."""
    m_dg, m_k0, m_bands = ", dg AS (", ", k0 AS (", ", bands AS ("
    for m in (m_dg, m_k0, m_bands):
        if m not in sql:
            raise AssertionError(f"oracle shape changed: marker {m!r} missing")
    i_dg, i_k0, i_bands = sql.index(m_dg), sql.index(m_k0), sql.index(m_bands)
    # the slice boundaries land right AFTER each CTE's closing paren (the
    # markers start with the comma that follows it), so every slice below
    # is already paren-balanced
    gramt_ddl = ("CREATE OR REPLACE TEMP TABLE gramt AS "
                 + sql[:i_dg] + " SELECT doc_id, grams FROM gramt")
    # ", dg AS (...), g0..g4, gh AS (...)" -- needs a leading dummy CTE
    gh_ddl = ("CREATE OR REPLACE TEMP TABLE gh AS WITH _d AS (SELECT 1)"
              + sql[i_dg:i_k0] + " SELECT doc_id, h FROM gh")
    # keys CTE (k0..keys) standalone, for the numpy-key cross-check
    keys_sql = ("WITH _d AS (SELECT 1)" + sql[i_k0:sql.index(", v0 AS (")]
                + " SELECT p, key FROM keys ORDER BY p")
    # bands.. end, fed by the materialized sigv
    back_half = ("WITH sigv AS (SELECT doc_id, p, v FROM sigv_mat)"
                 + sql[i_bands:])
    return gramt_ddl, gh_ddl, keys_sql, back_half


def slice_back(sql):
    """Split the verbatim back half at its CTE markers:
    (bands+capped, cand, pairs..end). Same hard-marker policy as
    slice_oracle — a shape change is an error, never silent drift."""
    m_bands, m_cand, m_pairs = ", bands AS (", ", cand AS (", ", pairs AS ("
    for m in (m_bands, m_cand, m_pairs):
        if m not in sql:
            raise AssertionError(f"oracle shape changed: marker {m!r} missing")
    i_b, i_c, i_p = sql.index(m_bands), sql.index(m_cand), sql.index(m_pairs)
    return sql[i_b:i_c], sql[i_c:i_p], sql[i_p:]


def run_back_half_banded(con, name, sql, built_capped, t0):
    """Stages 3-5: materialize capped once (text-shared across queries),
    run the verbatim cand slice per band_idx, dedupe, then the verbatim
    tail. Returns (replay_sql over the materialized stages, capped text
    that is now built)."""
    bands_capped, cand, tail = slice_back(sql)
    if built_capped != bands_capped:
        con.execute("CREATE OR REPLACE TEMP TABLE capped_mat AS "
                    "WITH sigv AS (SELECT doc_id, p, v FROM sigv_mat)"
                    + bands_capped + " SELECT * FROM capped")
        n = con.execute("SELECT count(*) FROM capped_mat").fetchone()[0]
        log(f"{name}: capped_mat materialized ({n} band rows)", t0)
    band_ids = [r[0] for r in con.execute(
        "SELECT DISTINCT band_idx FROM capped_mat ORDER BY 1").fetchall()]
    # schema from the query's own cand slice (zero rows), then one verbatim
    # cand run per band — band_idx is in the USING key, so this partitions
    # the join exactly
    con.execute("CREATE OR REPLACE TEMP TABLE cand_mat AS "
                "WITH capped AS (SELECT * FROM capped_mat WHERE 1=0)"
                + cand + " SELECT id_a, id_b FROM cand")
    for b in band_ids:
        con.execute(f"INSERT INTO cand_mat "
                    f"WITH capped AS (SELECT * FROM capped_mat WHERE band_idx = {b})"
                    + cand + " SELECT id_a, id_b FROM cand")
    con.execute("CREATE OR REPLACE TEMP TABLE cand_dist AS "
                "SELECT DISTINCT id_a, id_b FROM cand_mat")
    n_cand = con.execute("SELECT count(*) FROM cand_dist").fetchone()[0]
    log(f"{name}: cand_dist from {len(band_ids)} per-band joins ({n_cand} pairs)", t0)
    return ("WITH cand AS (SELECT id_a, id_b FROM cand_dist)" + tail,
            bands_capped)


def build_sigv(con, t0):
    """Materialize gramt/gh via the verbatim SQL slices, then compute the
    64-permutation signature minima in numpy. Returns nothing; leaves
    sigv_mat registered in con."""
    oracle = load_oracle(ARGS.out_dir)
    sql = oracle["q_dedup_minhash"]
    gramt_ddl, gh_ddl, keys_sql, back_half = slice_oracle(sql)

    con.execute(gramt_ddl)
    n_gramt = con.execute("SELECT count(*) FROM gramt").fetchone()[0]
    log(f"gramt materialized: {n_gramt} docs", t0)

    con.execute(gh_ddl)
    n_gh = con.execute("SELECT count(*) FROM gh").fetchone()[0]
    log(f"gh materialized: {n_gh} (doc,gram) hashes", t0)

    # permutation keys: numpy, cross-checked against the verbatim keys CTE
    p_arr = np.arange(64, dtype=np.uint64)
    keys_np = fmix64(np.uint64(42 << 32) + p_arr)
    keys_sqlv = con.execute(keys_sql).fetchnumpy()["key"].astype(np.uint64)
    assert np.array_equal(keys_np, keys_sqlv), "numpy keys != verbatim keys CTE"
    log("permutation keys cross-checked (numpy == verbatim CTE)", t0)

    gh = con.execute("SELECT doc_id, h FROM gh ORDER BY doc_id").fetchnumpy()
    doc = gh["doc_id"].astype(np.int64)
    h = gh["h"].astype(np.uint64)
    # per-doc segment starts on the doc-sorted hash array
    starts = np.flatnonzero(np.r_[True, doc[1:] != doc[:-1]])
    seg_docs = doc[starts]
    sig = np.empty((len(seg_docs), 64), dtype=np.uint64)
    for p in range(64):
        v = fmix64(h ^ keys_np[p])
        sig[:, p] = np.minimum.reduceat(v, starts)
    log(f"sigv minima computed for {len(seg_docs)} docs x 64 perms", t0)

    # full doc domain: docs with no grams get the sentinel row (sigv's
    # LEFT JOIN + coalesce semantics)
    all_docs = con.execute(
        "SELECT doc_id FROM documents ORDER BY doc_id").fetchnumpy()["doc_id"].astype(np.int64)
    full = np.full((len(all_docs), 64), SENTINEL, dtype=np.uint64)
    pos = np.searchsorted(all_docs, seg_docs)
    assert np.array_equal(all_docs[pos], seg_docs), "gh docs not a subset of documents"
    full[pos] = sig

    import pyarrow as pa
    n = len(all_docs)
    tbl = pa.table({
        "doc_id": pa.array(np.repeat(all_docs, 64), type=pa.int64()),
        "p": pa.array(np.tile(np.arange(64, dtype=np.int64), n), type=pa.int64()),
        "v": pa.array(full.reshape(-1), type=pa.uint64()),
    })
    con.register("sigv_arrow", tbl)
    con.execute("CREATE OR REPLACE TEMP TABLE sigv_mat AS SELECT * FROM sigv_arrow")
    con.unregister("sigv_arrow")
    log(f"sigv_mat registered: {n} docs x 64 rows", t0)
    return back_half


def main():
    t0 = time.time()
    con = connect_views(ARGS.sf_dir, ARGS.threads, ARGS.mem, ARGS.tmp)

    build_sigv(con, t0)

    oracle = load_oracle(ARGS.out_dir)
    rc = 0
    minhash_front = slice_oracle(oracle["q_dedup_minhash"])[:3]
    built_capped = None
    for name in ARGS.queries:
        qt = time.time()
        sql = oracle[name]
        # the back half (bands..end) comes from THIS query's own oracle
        # text, so the full/incremental cand + tail swap is inherited —
        # but sigv_mat was built from q_dedup_minhash's front half, so
        # every replayed query must share it verbatim (today guaranteed
        # by SparkEntry's derivation; asserted so a future re-derivation
        # with a different front half can't silently reuse stale sigs)
        front = slice_oracle(sql)
        assert front[:3] == minhash_front, \
            f"{name}: front half differs from q_dedup_minhash's — " \
            "sigv_mat does not apply; rebuild per-query"
        replay_sql, built_capped = run_back_half_banded(
            con, name, front[3], built_capped, t0)
        ok, lines = check.check_one(con, ARGS.out_dir, name, replay_sql)
        print("\n".join(lines), flush=True)
        log(f"{name}: {'OK' if ok else 'FAIL'} in {time.time() - qt:.1f}s "
            f"(total {time.time() - t0:.1f}s)")
        rc |= (not ok)
        if ARGS.validate:
            vt = time.time()
            got = con.execute(replay_sql).fetchdf()
            want = con.execute(sql).fetchdf()
            same = got.equals(want)
            log(f"{name}: verbatim-oracle validation "
                f"{'EQUAL' if same else 'MISMATCH'} in {time.time() - vt:.1f}s")
            rc |= (not same)
    return rc


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--queries", default="q_dedup_minhash")
    ap.add_argument("--validate", action="store_true")
    ap.add_argument("--threads", type=int, default=8)
    ap.add_argument("--mem", default="24GB")
    ap.add_argument("--tmp", default="/tmp/minhash_spill")
    ARGS = ap.parse_args()
    ARGS.queries = [q for q in ARGS.queries.split(",") if q]
    sys.exit(main())
