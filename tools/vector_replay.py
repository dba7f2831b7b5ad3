#!/usr/bin/env python3
"""Chunked replay of the q_neardup_cosine / q_semantic_dedup oracles at
scales where the single-statement DuckDB replay exceeds time/disk budgets
(VERDICT r15 #4 — q_neardup_cosine [TIME]@900s at sf10, q_semantic_dedup
[ERR disk-full]).

Why the verbatim SQL explodes: the embeddings fixture is dictionary-built
(~2000 distinct vectors at any scale), so LSH buckets are DENSE — at 200k
vectors the within-bucket candidate self-join emits O(10^8) pairs, each
verified by three 64-element list_reduce folds in DuckDB (interpreted,
per-row), and the semantic variant then runs WITH RECURSIVE reachability
over that pair graph. This tool computes the SAME result in stages:

  1. signs      -- the 16x64 hyperplane sign matrix: numpy fmix64, ASSERTED
                   equal to the verbatim `signs` CTE output on every run.
  2. dots/sigs  -- numpy, replicating list_reduce's SEQUENTIAL left fold
                   bit-for-bit (accumulate one index at a time in order;
                   products and adds are IEEE double ops both engines
                   perform identically).
  3. bands/capped/cand -- numpy grouping with the oracle's 10000 cap.
                   The DISTINCT in `cand` is dropped: only the verified
                   id_b SET (cosine) / the edge CC (semantic) feed the
                   final output, and duplicate candidate pairs cannot
                   change either.
  4. verify     -- numpy chunked cosine (same sequential fold + IEEE
                   sqrt/div), >= threshold.
  5. tail       -- back in DuckDB against the registered verified set
                   (NOT-IN survivor select resp. component-min join), so
                   output dtypes match the verbatim oracle's.

--validate runs the untouched single-statement oracle and asserts frame
equality (feasible at sf0.01/sf0.1/sf1) — the instrument's calibration.
Final compare against the Spark Verify dump reuses tools/check.py's
check_one, so gate semantics are identical to the driver's.

Usage:
  python3 tools/vector_replay.py SF_DIR VERIFY_OUT_DIR \
      [--queries q_neardup_cosine,q_semantic_dedup] [--validate]
      [--threads N] [--chunk 4000000]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import check  # noqa: E402
from replay_common import connect_views, fmix64, load_oracle, make_logger  # noqa: E402

log = make_logger("vreplay")


def seq_dot(A, B):
    """Sequential-fold dot product along axis 1 — replicates DuckDB's
    list_reduce((a,x) -> a+x) left fold: one IEEE add per index, in index
    order. A, B: (n, d) float64."""
    acc = np.zeros(A.shape[0], dtype=np.float64)
    for i in range(A.shape[1]):
        acc += A[:, i] * B[:, i]
    return acc


def main():
    t0 = time.time()
    con = connect_views(ARGS.sf_dir, ARGS.threads)

    oracle = load_oracle(ARGS.out_dir)

    # Parameter guards: the replay hardcodes the oracle's semantics
    # (16 hyperplanes over 64 dims, 2x8-bit bands, 10000 cap, 0.9
    # threshold); require the oracle text still carries exactly those
    # literals so a future parameter change breaks the tool instead of
    # silently measuring stale semantics (mirrors the other replays'
    # marker require()s).
    sql_guard = oracle["q_neardup_cosine"]
    for lit_ in ("range(0, 16)", "range(0, 64)", "range(0, 2)",
                 "(sig >> (bi.band_idx*8)) & 255",
                 "<= 10000", ">= 0.9", "least(len(p.v), 64)"):
        assert lit_ in sql_guard, f"oracle shape changed: {lit_!r} missing " \
            "— update vector_replay's hardcoded parameters to match"

    # ---- 1. hyperplane signs: numpy + verbatim cross-check every run ----
    b = np.repeat(np.arange(16, dtype=np.uint64), 64)
    i = np.tile(np.arange(64, dtype=np.uint64), 16)
    h = fmix64(np.uint64(180388626432) + b * np.uint64(64) + i)
    signs = np.where(h < np.uint64(1) << np.uint64(63), 1.0, -1.0).reshape(16, 64)
    # verbatim signs CTE: slice it out of the cosine oracle text
    sql_cos = oracle["q_neardup_cosine"]
    m_srows = ", srows AS ("
    assert m_srows in sql_cos, "oracle shape changed: srows marker missing"
    signs_sql = (sql_cos[:sql_cos.index(m_srows)]
                 + " SELECT b, i, s FROM signs ORDER BY b, i")
    sv = con.execute(signs_sql).fetchnumpy()["s"].reshape(16, 64)
    assert np.array_equal(signs, sv), "numpy signs != verbatim signs CTE"
    log("hyperplane signs cross-checked (numpy == verbatim CTE)", t0)

    # ---- 2. vectors + sigs (sequential fold, bit-exact) ----
    tbl = con.execute(
        "SELECT vec_id, [x::DOUBLE FOR x IN embedding] AS v, label "
        "FROM embeddings ORDER BY vec_id").arrow()
    ids = tbl.column("vec_id").to_numpy()
    vlist = tbl.column("v").to_pylist()
    # Known instrument limitation (ADVICE r16): the vectorized path needs
    # one uniform embedding length — ragged input would build an object
    # array (or crash) where the verbatim oracle, which goes through
    # len(a.v) per row, still completes. Fail loudly instead.
    lens = {len(v) for v in vlist}
    assert len(lens) == 1, (
        f"ragged embeddings (lengths {sorted(lens)[:5]}...): the numpy "
        "replay assumes one uniform vector length; run the verbatim "
        "oracle for ragged data")
    V = np.array(vlist, dtype=np.float64)
    n, d = V.shape
    log(f"embeddings loaded: {n} x {d}", t0)
    dim = min(d, 64)
    sig = np.zeros(n, dtype=np.uint64)
    for bb in range(16):
        acc = np.zeros(n, dtype=np.float64)
        for ii in range(dim):
            acc += signs[bb, ii] * V[:, ii]
        sig |= (acc > 0).astype(np.uint64) << np.uint64(bb)
    norms = np.sqrt(seq_dot(V, V))
    log("sigs + norms computed", t0)

    # ---- 3+4. banded buckets (cap 10000), chunked cosine verify ----
    thr = 0.9
    cap = 10000
    verified_b = []            # id_b side of verified pairs (for cosine tail)
    edges_a, edges_b = [], []  # verified pairs (for semantic CC)
    pair_total = 0
    for band_idx in range(2):
        bv = (sig >> np.uint64(band_idx * 8)) & np.uint64(255)
        order = np.argsort(bv, kind="stable")
        sbv = bv[order]
        starts = np.flatnonzero(np.r_[True, sbv[1:] != sbv[:-1]])
        ends = np.r_[starts[1:], len(sbv)]
        for s0, e0 in zip(starts, ends):
            sz = e0 - s0
            if sz < 2 or sz > cap:   # QUALIFY count(*) <= 10000
                continue
            members = np.sort(ids[order[s0:e0]])
            pos = np.searchsorted(ids, members)
            # all (a < b) pairs within the bucket, verified in chunks
            ia, ib = np.triu_indices(sz, k=1)
            pair_total += len(ia)
            for c0 in range(0, len(ia), ARGS.chunk):
                sl = slice(c0, c0 + ARGS.chunk)
                pa, pb = pos[ia[sl]], pos[ib[sl]]
                cos = seq_dot(V[pa], V[pb]) / (norms[pa] * norms[pb])
                keep = cos >= thr
                verified_b.append(ids[pb[keep]])
                edges_a.append(ids[pa[keep]])
                edges_b.append(ids[pb[keep]])
    idb = np.unique(np.concatenate(verified_b)) if verified_b else np.array([], dtype=ids.dtype)
    log(f"verified {pair_total} candidate pair slots; distinct id_b = {len(idb)}", t0)

    import pyarrow as pa
    rc = 0
    for name in ARGS.queries:
        qt = time.time()
        if name == "q_neardup_cosine":
            con.register("idb_set", pa.table({"id_b": idb}))
            final_sql = ("SELECT vec_id FROM embeddings "
                         "WHERE vec_id NOT IN (SELECT id_b FROM idb_set) "
                         "ORDER BY vec_id")
        elif name == "q_semantic_dedup":
            # min-label propagation over the verified edge list (both
            # directions), converging in diameter iterations — replicates
            # the oracle's recursive reachability component-min.
            ea = np.concatenate(edges_a) if edges_a else np.array([], dtype=ids.dtype)
            eb = np.concatenate(edges_b) if edges_b else np.array([], dtype=ids.dtype)
            src = np.concatenate([ea, eb])
            dst = np.concatenate([eb, ea])
            si = np.searchsorted(ids, src)
            di = np.searchsorted(ids, dst)
            lbl = ids.copy()
            it = 0
            while True:
                it += 1
                new = lbl.copy()
                np.minimum.at(new, di, lbl[si])
                if np.array_equal(new, lbl):
                    break
                lbl = new
            log(f"CC converged in {it} iterations", t0)
            con.register("comp_mat", pa.table({"node": ids, "lbl": lbl}))
            final_sql = ("SELECT e.vec_id, e.label FROM embeddings e "
                         "JOIN comp_mat c ON c.node = e.vec_id "
                         "WHERE c.node = c.lbl ORDER BY e.vec_id")
        else:
            raise SystemExit(f"unknown query {name}")
        ok, lines = check.check_one(con, ARGS.out_dir, name, final_sql)
        print("\n".join(lines), flush=True)
        log(f"{name}: {'OK' if ok else 'FAIL'} in {time.time() - qt:.1f}s "
            f"(total {time.time() - t0:.1f}s)")
        rc |= (not ok)
        if ARGS.validate:
            vt = time.time()
            got = con.execute(final_sql).fetchdf()
            want = con.execute(oracle[name]).fetchdf()
            same = got.equals(want)
            log(f"{name}: verbatim-oracle validation "
                f"{'EQUAL' if same else 'MISMATCH'} in {time.time() - vt:.1f}s")
            rc |= (not same)
    return rc


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--queries", default="q_neardup_cosine,q_semantic_dedup")
    ap.add_argument("--validate", action="store_true")
    ap.add_argument("--threads", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=4_000_000)
    ARGS = ap.parse_args()
    ARGS.queries = [q for q in ARGS.queries.split(",") if q]
    sys.exit(main())
