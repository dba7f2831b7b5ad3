#!/usr/bin/env python3
"""One-command sf10 oracle gate (VERDICT r16 #4: make the full-sf10 sweep
"a regression gate, not a one-off").

Given a full sf10 Verify dump tree (sbt "runMain graft.Verify SF_DIR OUT"),
re-establishes the complete sf10 oracle contract in one run:

  stage 1  tools/check.py sweep over every oracle EXCEPT the six
           measured-superlinear ones (SCALE_r16.json
           oracle_superlinear_clauses), each in check.py's own forked
           child under a per-query timeout.
  stage 2  the three chunked replay instruments for the six skipped
           queries (minhash x3, vector x2, ngram x1) — each keeps the
           oracle SQL verbatim except its measured superlinear clause
           and compares through check.py's check_one.
  stage 3  one summary JSON: per-query status, stage walls, totals.

The SKIP set is pinned here, next to the gate that depends on it; a new
superlinear oracle means extending a replay instrument, not silently
widening the skip list (the gate fails loudly on any [TIME]/[DIFF] in
stage 1 instead).

Usage: python3 tools/sf10_gate.py SF_DIR VERIFY_OUT
         [--summary FILE] [--timeout 900] [--threads 8] [--mem 24GB]
         [--logdir /tmp/sf10_gate_logs] [--validate]
         [--expect N] [--manifest FILE]

--expect pins the contract size (oracle entries ∪ dump dirs must count
N); --manifest writes the dump-fingerprint re-anchor file, green runs
only. Completeness is wired independently of the status parse: any
oracle entry or dump directory without a parsed status is NO-STATUS
(bad), so a query cannot silently leave the contract.

--validate is passed through to the replays (verbatim single-statement
oracle cross-check — feasible at sf0.01/sf0.1/sf1, NOT at sf10 where the
verbatim statement is the thing being replayed around).
"""
import argparse
import glob
import json
import os
import re
import subprocess
import sys
import time

TOOLS = os.path.dirname(os.path.abspath(__file__))

# The six oracles whose single-statement DuckDB cost is measured
# superlinear at sf10 (SCALE_r16.json: minhash sigv 1.70e9 HUGEINT rows;
# ngram uncapped self-join 1.39e10 rows; vector dense-bucket verify
# 209.7M pairs) — each covered by a calibrated chunked replay below.
SKIP6 = [
    "q_dedup_minhash", "q_dedup_incremental", "q_dedup_incr_store",
    "q_neardup_cosine", "q_semantic_dedup", "q_dedup_ngram",
]

STATUS_RE = re.compile(r"^\[(....)\] (\S+?):? ")


def run_stage(name, cmd, env, log_path):
    t0 = time.time()
    with open(log_path, "w") as lf:
        p = subprocess.run(cmd, env=env, stdout=lf, stderr=subprocess.STDOUT)
    wall = time.time() - t0
    statuses = {}
    with open(log_path) as lf:
        for line in lf:
            m = STATUS_RE.match(line.strip())
            if m:
                tag, q = m.group(1).strip(), m.group(2).rstrip(":")
                # last status per query wins (replays print per-stage lines)
                if tag in ("OK", " OK", "DIFF", "ROWS", "SCHM", "DTYP",
                           "TIME", "ERR", "MISS", "SKIP"):
                    statuses[q] = tag.strip()
    print(f"[gate] {name}: exit={p.returncode} wall={wall:.1f}s "
          f"({log_path})", flush=True)
    return {"exit": p.returncode, "wall_sec": round(wall, 1),
            "log": log_path, "statuses": statuses}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--summary", default="/tmp/sf10_gate_summary.json")
    ap.add_argument("--timeout", default="900")
    ap.add_argument("--threads", type=int, default=8)
    ap.add_argument("--mem", default="24GB")
    ap.add_argument("--logdir", default="/tmp/sf10_gate_logs")
    ap.add_argument("--validate", action="store_true")
    ap.add_argument("--expect", type=int, default=None, metavar="N",
                    help="pin the contract size: fail if oracle entries + "
                         "dump dirs resolve to a different query count")
    ap.add_argument("--manifest", default=None, metavar="FILE",
                    help="on a fully green gate, also write the dump-"
                         "fingerprint manifest (dump_equiv --manifest-out) "
                         "so the round's re-anchor artifact is produced by "
                         "the same run that proved the dumps oracle-exact")
    a = ap.parse_args()
    os.makedirs(a.logdir, exist_ok=True)
    py = sys.executable
    val = ["--validate"] if a.validate else []

    env = dict(os.environ,
               GRAFT_CHECK_SKIP=",".join(SKIP6),
               GRAFT_CHECK_TIMEOUT=a.timeout)
    stages = {}
    stages["sweep"] = run_stage(
        "check.py sweep", [py, os.path.join(TOOLS, "check.py"),
                           a.sf_dir, a.out_dir],
        env, os.path.join(a.logdir, "sweep.log"))
    stages["minhash"] = run_stage(
        "minhash replay", [py, os.path.join(TOOLS, "minhash_replay.py"),
                           a.sf_dir, a.out_dir,
                           "--queries", "q_dedup_minhash,q_dedup_incremental,"
                           "q_dedup_incr_store",
                           "--threads", str(a.threads),
                           "--mem", a.mem,
                           "--tmp", os.path.join(a.logdir, "minhash_spill")]
        + val, dict(os.environ), os.path.join(a.logdir, "minhash.log"))
    stages["vector"] = run_stage(
        "vector replay", [py, os.path.join(TOOLS, "vector_replay.py"),
                          a.sf_dir, a.out_dir, "--threads", str(a.threads)]
        + val, dict(os.environ), os.path.join(a.logdir, "vector.log"))
    stages["ngram"] = run_stage(
        "ngram replay", [py, os.path.join(TOOLS, "ngram_replay.py"),
                         a.sf_dir, a.out_dir, "--threads", str(a.threads),
                         "--mem", a.mem,
                         "--tmp", os.path.join(a.logdir, "ngram_spill")]
        + val, dict(os.environ), os.path.join(a.logdir, "ngram.log"))

    # fold: sweep statuses + replay statuses for the SKIP6
    per_query = dict(stages["sweep"]["statuses"])
    for st in ("minhash", "vector", "ngram"):
        for q, tag in stages[st]["statuses"].items():
            if q in SKIP6:
                per_query[q] = tag
    ok = sorted(q for q, t in per_query.items() if t == "OK")
    bad = sorted((q, t) for q, t in per_query.items()
                 if t not in ("OK", "SKIP"))
    # Completeness wire: every query in the contract must have a parsed
    # status. Without this, a query that silently loses its oracle entry
    # prints a [ROWS-ONLY] line the status parser ignores — n_ok would
    # shrink by one while bad stayed empty and all_ok stayed true. The
    # oracle file alone can't catch that (the lost entry vanishes from it
    # too), so the wire unions it with the DUMP DIRECTORIES (the query
    # still dumps) and, when given, the --expect contract size (catches a
    # query that lost both).
    oracle = json.load(open(os.path.join(a.out_dir, "oracle_sql.json")))
    dumped = set(os.path.basename(p) for p in
                 glob.glob(os.path.join(a.out_dir, "*")) if os.path.isdir(p))
    unaccounted = sorted((set(oracle) | dumped) - set(per_query))
    for q in unaccounted:
        bad.append((q, "NO-STATUS"))
    if a.expect and len(set(oracle) | dumped) != a.expect:
        bad.append(("<contract>",
                    f"EXPECT {a.expect} queries, found {len(set(oracle) | dumped)}"))
    still_skipped = sorted(q for q in SKIP6 if per_query.get(q) != "OK")
    all_ok = (not bad and not still_skipped
              and all(s["exit"] == 0 for s in stages.values()))
    summary = {
        "sf_dir": a.sf_dir, "out_dir": a.out_dir,
        "n_oracles": len(oracle),
        "n_ok": len(ok), "bad": bad, "replay_uncovered": still_skipped,
        "all_ok": all_ok,
        "stage_walls_sec": {k: v["wall_sec"] for k, v in stages.items()},
        "stage_exits": {k: v["exit"] for k, v in stages.items()},
        "logs": {k: v["log"] for k, v in stages.items()},
    }
    if a.manifest:
        if all_ok:
            import dump_equiv
            dump_equiv.manifest_out(a.manifest, a.out_dir)
            summary["manifest"] = a.manifest
        else:
            print(f"[gate] manifest NOT written ({a.manifest}): gate not "
                  "green — a fingerprint of unproven dumps would anchor "
                  "future rounds to a possibly-wrong baseline", flush=True)
    with open(a.summary, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"[gate] {summary['n_ok']} ok, {len(bad)} bad, "
          f"replay-uncovered {still_skipped}; all_ok={all_ok} "
          f"-> {a.summary}", flush=True)
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main())
