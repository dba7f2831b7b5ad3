#!/usr/bin/env python3
"""Local pre-check of SparkEntry oracle parity (mimics the driver's t2):
runs each oracle_sql.json query in DuckDB against the sf parquet tables and
compares with the Verify parquet dumps (columns sorted by name, exact
value compare; floats compared exactly AND with isclose for diagnosis).

Usage: python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out

Sweep knobs (gate behavior unchanged when unset):
  GRAFT_CHECK_ONLY=a,b     check only these queries (rows-only listing
                           suppressed) -- targeted re-check of a new or
                           changed oracle without the full sweep
  GRAFT_CHECK_SKIP=a,b     skip these queries (reason printed) -- for
                           oracles whose DuckDB recompute cost is
                           prohibitive at big sweep scales
  GRAFT_CHECK_TIMEOUT=300  per-query budget in seconds; each compare runs
                           in a forked child killed on expiry and reported
                           [TIME], so one slow oracle can't stall the sweep
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

# Pin fillna semantics the gate compare depends on: the "\0N" null-sentinel
# compare in check_one fills an object-dtype Series, and pandas 2.x silently
# downcasts the result (FutureWarning on every run; behavior flips under a
# pandas upgrade). Opting into the future behavior now keeps the compare's
# dtype semantics fixed across upgrades; once pandas removes the option
# (when it becomes the only behavior) the set_option is a harmless no-op.
try:
    pd.set_option("future.no_silent_downcasting", True)
except (pd.errors.OptionError, KeyError):
    pass  # option retired: the pinned behavior is already the default

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

# Approximate-by-design columns: the oracle computes the EXACT value and the
# contract is a published error bound, not equality (VERDICT r12 #4). The
# HLL column is exact only in coupon mode (< ~1k distincts, i.e. gate
# scale); above it the DataSketches HLL4 lgK=12 bound applies: RSE =
# 1.04/sqrt(2^12) ~ 1.63%, checked at 3 sigma ~ 4.9%. Exact matches pass
# trivially, so the gate behavior is unchanged — the bound only widens what
# counts as OK at sweep scales where the estimator is out of coupon mode.
APPROX_BOUNDS = {"q_hll_sketch": {"n_users": 3 * 1.04 / (2 ** 12) ** 0.5}}


def connect(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata stores each table as a single file; Sf1Gen dirs
        # are Spark-written parquet DIRECTORIES -- glob those
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path += "/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def check_one(con, out_dir, name, sql):
    """Compare one query's Spark dump with its DuckDB oracle.
    Returns (ok, [report lines])."""
    pdir = os.path.join(out_dir, name)
    files = glob.glob(os.path.join(pdir, "*.parquet"))
    if not files:
        return False, [f"[MISS] {name}: no spark output"]
    try:
        got = pd.read_parquet(pdir)
        want = con.execute(sql).fetchdf()
    except Exception as e:
        return False, [f"[ERR ] {name}: {e}"]
    got = got.reindex(sorted(got.columns), axis=1)
    want = want.reindex(sorted(want.columns), axis=1)
    if list(got.columns) != list(want.columns):
        return False, [f"[SCHM] {name}: spark={list(got.columns)} duck={list(want.columns)}"]
    if len(got) != len(want):
        return False, [f"[ROWS] {name}: spark={len(got)} duck={len(want)}"]
    # Driver hashes raw column bytes: a dtype mismatch (int64 vs float64,
    # float64 vs int8) fails its hash even when every value compares ==.
    # (datetime resolution ns-vs-us is normalized by the driver — r1's
    # q_fn_datetime passed with datetime64[ns] vs [us] — so skip those.)
    dt_bad = [(c, str(got[c].dtype), str(want[c].dtype)) for c in got.columns
              if got[c].dtype != want[c].dtype
              and not (got[c].dtype.kind == 'M' and want[c].dtype.kind == 'M')]
    if dt_bad:
        return False, [f"[DTYP] {name}: {dt_bad}"]
    bad_cols = []
    approx = APPROX_BOUNDS.get(name, {})
    approx_note = ""
    for c in got.columns:
        a, b = got[c].to_numpy(), want[c].to_numpy()
        if c in approx:
            # |est - exact| / exact <= bound, elementwise (exact == 0
            # requires est == 0)
            bound = approx[c]
            af, bf = a.astype(float), b.astype(float)
            rel = np.abs(af - bf) / np.maximum(np.abs(bf), 1e-300)
            worst = float(np.max(rel)) if len(rel) else 0.0
            if not np.all(rel <= bound):
                bad_cols.append((c, f"rel err {worst:.4f} > bound {bound:.4f}"))
            elif worst > 0:
                approx_note = f" [{c}: rel err {worst:.4f} within {bound:.4f} bound]"
            continue
        try:
            if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                exact = np.array_equal(a, b, equal_nan=True)
                close = np.allclose(a.astype(float), b.astype(float), rtol=1e-12, equal_nan=True)
                if not exact:
                    bad_cols.append((c, "close" if close else "far"))
            else:
                if not (pd.Series(a).astype(object).fillna("\0N") ==
                        pd.Series(b).astype(object).fillna("\0N")).all():
                    bad_cols.append((c, "neq"))
        except Exception as e:
            bad_cols.append((c, f"cmp-err {e}"))
    if bad_cols:
        lines = [f"[DIFF] {name}: {bad_cols}"]
        for c, _ in bad_cols[:2]:
            mask = ~(pd.Series(got[c]).astype(object).fillna("\0N") ==
                     pd.Series(want[c]).astype(object).fillna("\0N")).to_numpy()
            idx = np.nonzero(mask)[0][:3]
            for i in idx:
                lines.append(f"    row {i} col {c}: spark={got[c].iloc[i]!r} duck={want[c].iloc[i]!r}")
        return False, lines
    return True, [f"[ OK ] {name} ({len(got)} rows){approx_note}"]


def _check_one_child(q, sf_dir, out_dir, name, sql):
    try:
        ok, lines = check_one(connect(sf_dir), out_dir, name, sql)
    except Exception as e:
        ok, lines = False, [f"[ERR ] {name}: {e}"]
    q.put((ok, "\n".join(lines)))


def main(sf_dir, out_dir):
    skip = set(filter(None, os.environ.get("GRAFT_CHECK_SKIP", "").split(",")))
    only = set(filter(None, os.environ.get("GRAFT_CHECK_ONLY", "").split(",")))
    timeout = float(os.environ.get("GRAFT_CHECK_TIMEOUT", "0") or 0)
    oracle_all = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    oracle = ({k: v for k, v in oracle_all.items() if k in only}
              if only else oracle_all)
    n_ok = n_bad = n_skip = 0
    # ADVICE r18: a misspelled (or rows-only) name in GRAFT_CHECK_ONLY used
    # to filter the oracle dict to nothing and exit 0 — a targeted re-check
    # that silently checked nothing. Unknown ONLY names are BAD, loudly.
    for name in sorted(only - set(oracle_all)):
        print(f"[MISS] {name}: named in GRAFT_CHECK_ONLY but has no oracle "
              "entry (misspelled, or a rows-only query this tool can't "
              "oracle-check)", flush=True)
        n_bad += 1
    con = None if timeout > 0 else connect(sf_dir)
    if timeout > 0:
        import multiprocessing as mp
        ctx = mp.get_context("fork")
    for name, sql in sorted(oracle.items()):
        if name in skip:
            print(f"[SKIP] {name}: excluded by GRAFT_CHECK_SKIP", flush=True)
            n_skip += 1
            continue
        if timeout > 0:
            q = ctx.Queue()
            p = ctx.Process(target=_check_one_child, args=(q, sf_dir, out_dir, name, sql))
            p.start(); p.join(timeout)
            if p.is_alive():
                p.terminate(); p.join()
                ok, report = False, f"[TIME] {name}: oracle exceeded {timeout:.0f}s budget"
            else:
                ok, report = q.get() if not q.empty() else (False, f"[ERR ] {name}: child died")
        else:
            ok, lines = check_one(con, out_dir, name, sql)
            report = "\n".join(lines)
        print(report, flush=True)
        n_ok += bool(ok); n_bad += (not ok)
    # rows-only entries (queries without oracle); suppressed under ONLY --
    # a targeted run's dump tree is intentionally partial
    for pdir in sorted(glob.glob(os.path.join(out_dir, "*"))) if not only else []:
        nm = os.path.basename(pdir)
        if os.path.isdir(pdir) and nm not in oracle:
            n = len(pd.read_parquet(pdir)) if glob.glob(pdir + "/*.parquet") else 0
            print(f"[ROWS-ONLY] {nm}: {n} rows {'OK' if n > 0 else 'EMPTY!'}")
    tail = f", {n_skip} skipped" if n_skip else ""
    print(f"\n{n_ok} ok, {n_bad} bad{tail}")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
