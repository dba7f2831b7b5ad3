#!/usr/bin/env python3
"""Verify-dump equivalence compare (VERDICT r16 #6).

Compares two Verify output trees (e.g. a prior round's sf10 dumps whose
DuckDB oracle agreement is already on record, and a fresh run at current
HEAD) query-directory by query-directory, value-exact. If every dump is
identical, the prior tree's oracle table transfers to the new HEAD
without re-running the multi-hour DuckDB sweep — the r16 trick
(logs/sf10_dump_equiv_r16.log) as a tool instead of a one-off.

Usage: python3 tools/dump_equiv.py BASELINE_DIR CANDIDATE_DIR
       python3 tools/dump_equiv.py --manifest-out FILE DUMP_DIR
       python3 tools/dump_equiv.py --manifest-check [--no-strict] FILE DUMP_DIR

Exit 0 iff every query dir present in CANDIDATE_DIR exists in
BASELINE_DIR and is value-identical (column order normalized the same
way as check.py: sorted by name; row order NOT normalized — Verify
queries carry a total ORDER BY, so an order diff is a real diff).
Prints `identical / differ / missing` totals plus the differing lists.

Manifest mode (round 17): the pair compare needs the baseline dump TREE
on disk, but sf10 dumps (~GBs) are wiped between rounds — r17 started
with the r16 trees gone. `--manifest-out` writes a compact per-query
fingerprint (row count, sorted schema+dtypes, sha256 over a canonical
byte serialization of every value, float bits exact, nested-array and
null aware) small enough to COMMIT; `--manifest-check` re-anchors a
fresh dump tree against it without the baseline bytes. A manifest match
is AT LEAST as strong as the pair compare: same read normalization, and
the canonical encoding is injective per (dtype, value) — length-prefixed
so no value concatenation can collide with another row boundary. It is
not weaker in any case, and strictly stronger in one: float columns hash
raw IEEE bits (NaN payload bits included), where frames_equal treats any
NaN as equal to any NaN — a NaN bit-pattern drift flags `differ` here
that the pair compare would wave through. The bits are deliberately NOT
canonicalized: committed manifests (SF*_MANIFEST_r17.json) pin the
current hashing, and rewriting NaNs would silently invalidate them
(ADVICE r17 adjudication — the drift direction is false-positive only,
the safe side for a re-anchor tool).

A dump-tree query ABSENT from the manifest ("missing-in-manifest") is
FATAL on the bare CLI (strict — the same-round-audit default; ADVICE
r18) and informational for programmatic callers (strict=False — the
sf10 gate re-anchors a fresh tree against the PRIOR round's manifest,
where newly added queries are legitimate; r18 adds one over the r17
manifests, r19 one over r18's). Pass --no-strict on the CLI for that
cross-round case. in-manifest-not-dumped and value diffs are always
fatal.
"""
import glob
import hashlib
import json
import os
import struct
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


def _enc_cell(h, x):
    """Feed one cell into the hash: tag byte + length-prefixed payload so
    the per-value encoding is injective (no cross-boundary collisions)."""
    if x is None or (isinstance(x, float) and np.isnan(x)):
        h.update(b"N")
        return
    if isinstance(x, (np.ndarray, list, tuple)):
        xs = list(x)
        h.update(b"A" + struct.pack("<q", len(xs)))
        for e in xs:
            _enc_cell(h, e)
        return
    if isinstance(x, (bytes, bytearray)):
        h.update(b"B" + struct.pack("<q", len(x)) + bytes(x))
        return
    if isinstance(x, (bool, np.bool_)):
        h.update(b"b" + (b"1" if x else b"0"))
        return
    if isinstance(x, (float, np.floating)):
        h.update(b"F" + struct.pack("<d", float(x)))  # exact bits
        return
    if isinstance(x, (int, np.integer)):
        s = str(int(x)).encode()
        h.update(b"I" + struct.pack("<q", len(s)) + s)
        return
    if isinstance(x, pd.Timestamp):
        h.update(b"T" + struct.pack("<q", x.value))  # epoch ns
        return
    s = str(x).encode("utf-8")  # str, Decimal, date — stable reprs
    h.update(b"S" + struct.pack("<q", len(s)) + s)


def _fingerprint(df):
    """Canonical sha256 over a _read-normalized frame. Columns in sorted
    order (already, via _read); rows in dump order (total ORDER BY
    contract). Numeric/datetime columns hash their raw widened bytes
    (float64/int64 exact); everything else goes through _enc_cell."""
    h = hashlib.sha256()
    for c in df.columns:
        cs = str(c).encode()
        h.update(b"C" + struct.pack("<q", len(cs)) + cs)
        x = df[c].to_numpy()
        if x.dtype.kind == "M":  # normalize ns-vs-us like the driver
            h.update(b"tM" + x.astype("datetime64[ns]").view("int64").tobytes())
        elif x.dtype.kind == "m":
            h.update(b"tm" + x.astype("timedelta64[ns]").view("int64").tobytes())
        elif x.dtype.kind == "f":
            h.update(b"tf" + x.astype(np.float64).tobytes())  # NaN bits kept
        elif x.dtype.kind in "iu":
            h.update(b"ti" + x.astype(np.int64).tobytes())
        elif x.dtype.kind == "b":
            h.update(b"tb" + x.astype(np.uint8).tobytes())
        else:
            h.update(b"to")
            for v in x:
                _enc_cell(h, v)
    return h.hexdigest()


def _manifest_entry(pdir):
    df = _read(pdir)
    if df is None:
        return None
    return {
        "rows": len(df),
        "cols": {str(c): str(df[c].dtype) for c in df.columns},
        "sha256": _fingerprint(df),
    }


def manifest_out(path, dump_dir):
    man = {}
    for p in sorted(glob.glob(os.path.join(dump_dir, "*"))):
        if not os.path.isdir(p):
            continue
        e = _manifest_entry(p)
        if e is None:
            print(f"[WARN] {os.path.basename(p)}: no parquet, skipped")
            continue
        man[os.path.basename(p)] = e
    with open(path, "w") as f:
        json.dump(man, f, indent=1, sort_keys=True)
    print(f"manifest: {len(man)} queries -> {path}")
    return 0


def manifest_check(path, dump_dir, strict=False):
    man = json.load(open(path))
    identical, differ, missing = [], [], []
    names = sorted(
        os.path.basename(p)
        for p in glob.glob(os.path.join(dump_dir, "*"))
        if os.path.isdir(p)
    )
    for name in names:
        want = man.get(name)
        if want is None:
            missing.append(name)
            continue
        got = _manifest_entry(os.path.join(dump_dir, name))
        if got is None:
            differ.append((name, "no parquet in dump dir"))
        elif got != want:
            why = ("rows" if got["rows"] != want["rows"]
                   else "schema" if got["cols"] != want["cols"] else "values")
            differ.append((name, why))
            print(f"[DIFF] {name}: {why}", flush=True)
        else:
            identical.append(name)
    not_dumped = sorted(set(man) - set(names))
    miss_tag = "FATAL" if strict else "informational; new queries expected"
    print(f"identical: {len(identical)}  differ: {len(differ)}  "
          f"missing-in-manifest: {len(missing)} ({miss_tag})  "
          f"in-manifest-not-dumped: {len(not_dumped)}")
    print(f"differ: {differ}")
    print(f"missing: {missing}")
    if not_dumped:
        print(f"not dumped: {not_dumped}")
    return 1 if (differ or not_dumped or (strict and missing)) else 0


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


def _usage():
    block = next(p for p in __doc__.split("\n\n") if p.startswith("Usage:"))
    print(block)
    sys.exit(2)


if __name__ == "__main__":
    argv = sys.argv[1:]
    # Bare-CLI manifest_check defaults to STRICT (ADVICE r18: the r18
    # default-semantics change silently weakened any existing same-round
    # audit invocation). Cross-round re-anchors against an OLDER manifest
    # pass --no-strict explicitly — new queries are then informational.
    # The programmatic API keeps strict=False (the sf10 gate's re-anchor
    # against the prior round's manifest is the cross-round case).
    nostrict = "--no-strict" in argv
    argv = [a for a in argv if a not in ("--strict", "--no-strict")]
    if not argv:
        _usage()
    if argv[0] == "--manifest-out":
        if len(argv) != 3:
            _usage()
        sys.exit(manifest_out(argv[1], argv[2]))
    if argv[0] == "--manifest-check":
        if len(argv) != 3:
            _usage()
        sys.exit(manifest_check(argv[1], argv[2], strict=not nostrict))
    if len(argv) != 2 or argv[0].startswith("--"):
        _usage()
    sys.exit(main(argv[0], argv[1]))
