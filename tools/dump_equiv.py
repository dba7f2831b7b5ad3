#!/usr/bin/env python3
"""Verify-dump equivalence compare (VERDICT r16 #6).

Compares two Verify output trees (e.g. a prior round's sf10 dumps whose
DuckDB oracle agreement is already on record, and a fresh run at current
HEAD) query-directory by query-directory, value-exact. If every dump is
identical, the prior tree's oracle table transfers to the new HEAD
without re-running the multi-hour DuckDB sweep — the r16 trick
(logs/sf10_dump_equiv_r16.log) as a tool instead of a one-off.

Usage: python3 tools/dump_equiv.py BASELINE_DIR CANDIDATE_DIR

Exit 0 iff every query dir present in CANDIDATE_DIR exists in
BASELINE_DIR and is value-identical (column order normalized the same
way as check.py: sorted by name; row order NOT normalized — Verify
queries carry a total ORDER BY, so an order diff is a real diff).
Prints `identical / differ / missing` totals plus the differing lists.
"""
import glob
import os
import sys

import numpy as np
import pandas as pd


def _read(pdir):
    """Deterministic multi-file read: part files sorted by name."""
    files = sorted(glob.glob(os.path.join(pdir, "*.parquet")))
    if not files:
        return None
    df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    return df.reindex(sorted(df.columns), axis=1)


def _elem_eq(x, y):
    """One cell: None/NaN-aware, nested-array-aware."""
    if isinstance(x, np.ndarray) or isinstance(y, np.ndarray):
        if not (isinstance(x, np.ndarray) and isinstance(y, np.ndarray)):
            return False
        if x.shape != y.shape:
            return False
        if x.dtype.kind == "f" or y.dtype.kind == "f":
            return bool(np.array_equal(x, y, equal_nan=True))
        if x.dtype == object or y.dtype == object:
            return all(_elem_eq(a, b) for a, b in zip(x, y))
        return bool(np.array_equal(x, y))
    xn = x is None or (isinstance(x, float) and np.isnan(x))
    yn = y is None or (isinstance(y, float) and np.isnan(y))
    if xn or yn:
        return xn and yn
    return x == y


def frames_equal(a, b):
    """(equal, reason). Column set/order already normalized by _read."""
    if list(a.columns) != list(b.columns):
        return False, f"schema {list(a.columns)} vs {list(b.columns)}"
    if len(a) != len(b):
        return False, f"rows {len(a)} vs {len(b)}"
    for c in a.columns:
        x, y = a[c].to_numpy(), b[c].to_numpy()
        if x.dtype.kind == "f" and y.dtype.kind == "f":
            if not np.array_equal(x, y, equal_nan=True):
                return False, f"col {c}"
            continue
        if x.dtype == object or y.dtype == object:
            # fast path first; the elementwise walk only runs on suspicion
            try:
                if pd.Series(x).equals(pd.Series(y)):
                    continue
            except Exception:
                pass
            bad = next((i for i in range(len(x)) if not _elem_eq(x[i], y[i])), None)
            if bad is not None:
                return False, f"col {c} row {bad}"
            continue
        if x.dtype != y.dtype:
            return False, f"col {c} dtype {x.dtype} vs {y.dtype}"
        if not np.array_equal(x, y):
            return False, f"col {c}"
    return True, None


def main(base_dir, cand_dir):
    names = sorted(
        os.path.basename(p)
        for p in glob.glob(os.path.join(cand_dir, "*"))
        if os.path.isdir(p)
    )
    identical, differ, missing = [], [], []
    for name in names:
        cand = _read(os.path.join(cand_dir, name))
        if cand is None:
            differ.append((name, "candidate dir has no parquet"))
            continue
        bdir = os.path.join(base_dir, name)
        base = _read(bdir) if os.path.isdir(bdir) else None
        if base is None:
            missing.append(name)
            continue
        eq, why = frames_equal(base, cand)
        (identical if eq else differ).append(name if eq else (name, why))
        if not eq:
            print(f"[DIFF] {name}: {why}", flush=True)
    print(f"identical: {len(identical)}  differ: {len(differ)}  "
          f"missing-in-baseline: {len(missing)}")
    print(f"differ: {differ}")
    print(f"missing: {missing}")
    return 1 if (differ or missing) else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
