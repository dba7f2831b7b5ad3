#!/usr/bin/env python3
"""One-command scale oracle gate (VERDICT r16 #4: make the full-sf10 sweep
"a regression gate, not a one-off"; VERDICT r19 #2: the same command IS
the sf1 leg — nothing in the gate is sf10-specific, every stage is
parameterized by SF_DIR/manifest, and the heap probe sizes itself from
the sf-dir's own row count, so both scale legs are single commands).

Given a full scale-dir Verify dump tree (sbt "runMain graft.Verify SF_DIR
OUT"), re-establishes the complete oracle contract in one run:

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
         [--run-verify] [--manifest-check FILE] [--drift-sweep]
         [--state-store rocksdb|default|CLASS]

--expect pins the contract size (oracle entries ∪ dump dirs must count
N); --manifest writes the dump-fingerprint re-anchor file, green runs
only. Completeness is wired independently of the status parse: any
oracle entry or dump directory without a parsed status is NO-STATUS
(bad), so a query cannot silently leave the contract.

--run-verify (r18, VERDICT r17 #5) makes the gate one command from HEAD
to proven contract: it first runs `sbt "runMain graft.Verify SF_DIR
VERIFY_OUT"` itself instead of starting from an existing dump tree (a
non-zero sbt exit or any [verify] per-query failure line fails the gate
before DuckDB spends anything). When --verify-mem is not given, the
gate probes the sf-dir's lineitem row count from parquet footers and
defaults the verify heap to 64g at sf>=10 scale (r19, VERDICT r18 #2 —
the r18 abort proved the remembered-flag protocol costs an hour when
forgotten). --manifest-check FILE then re-anchors
the fresh dumps against a committed manifest (dump_equiv) BEFORE the
oracle sweep — cross-round drift is caught in minutes, not after the
~61-minute oracle wall. Value diffs and in-manifest-not-dumped abort the
gate; dump-tree queries absent from an OLDER manifest are informational
(new queries sweep normally).

--drift-sweep (r19, VERDICT r18 #5) sizes the oracle sweep to the drift
set: after a GREEN manifest-check, queries bit-anchored by the manifest
inherit OK from the bit-identity proof (their oracle agreement is on
record from the round that wrote the manifest), and only queries NEW
since the manifest are oracle-swept. The three calibrated replays still
run in full. The summary records the provenance split (n_anchored /
fresh_swept) so a reader can always tell a bit-anchor OK from a fresh
DuckDB OK.

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


def _lineitem_rows(sf_dir):
    """Row count of the sf-dir's lineitem table from parquet footers only
    (no scan): the gate's scale probe. Returns None when UNREADABLE
    (pyarrow missing, no footers) — distinct from a small-but-real count,
    so the --run-verify caller can bail loudly instead of silently
    reproducing the 8g-heap hour-long OOM the probe exists to prevent
    (ADVICE r19: 'the protection evaporates with no signal')."""
    try:
        import pyarrow.parquet as pq
        files = [f for f in
                 glob.glob(os.path.join(sf_dir, "lineitem.parquet")) +
                 glob.glob(os.path.join(sf_dir, "lineitem.parquet", "*.parquet"))
                 if os.path.isfile(f)]
        if not files:
            return None
        return sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    except Exception:
        return None


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
    ap.add_argument("--run-verify", action="store_true",
                    help="run `sbt runMain graft.Verify SF_DIR OUT` first "
                         "instead of starting from an existing dump tree")
    ap.add_argument("--verify-mem", default=None, metavar="MEM",
                    help="SPARK_DRIVER_MEM for the verify stage. When not "
                         "given, the gate PROBES the sf_dir row count and "
                         "defaults to 64g at sf>=10 scale (the 8g default "
                         "OOMs q_stream_dedup's 6M-row memory sink + dedup "
                         "state and takes the whole SparkContext down — "
                         "measured r18; VERDICT r18 #2: the flag must not "
                         "be forgettable)")
    ap.add_argument("--verify-cpus", default=None, metavar="N",
                    help="SPARK_GRAFT_CPUS for the verify stage (prior sf10 "
                         "campaigns used 8)")
    ap.add_argument("--state-store", default="rocksdb",
                    metavar="rocksdb|default|CLASS",
                    help="streaming state-store provider for the verify "
                         "stage (VERDICT r19 #1: the scale legs default to "
                         "the PRODUCTION larger-than-heap provider, RocksDB "
                         "— bit-identity to the in-heap default is proven "
                         "at sf1 and sf10 in SCALE_r19.json, so committed "
                         "manifests stay valid). 'default' leaves Spark's "
                         "in-heap HDFSBackedStateStore; any other value is "
                         "passed through as a provider class name")
    ap.add_argument("--load-gate", type=float, default=0.0, metavar="L",
                    help="wait (bounded 10 min) until 1-min loadavg < L "
                         "before the verify/sweep starts, and record the "
                         "observed start load in the summary — the sf10 "
                         "wall protocol (VERDICT r17 #3): walls are only "
                         "comparable when stamped born-idle; 0 disables")
    ap.add_argument("--manifest-check", default=None, metavar="FILE",
                    help="re-anchor the dump tree against a committed "
                         "manifest before the oracle sweep; diffs abort "
                         "the gate in minutes instead of after the sweep")
    ap.add_argument("--drift-sweep", action="store_true",
                    help="after a GREEN --manifest-check, size the check.py "
                         "sweep to the drift set: only queries NOT "
                         "bit-anchored by the manifest (i.e. new since it) "
                         "are oracle-swept; anchored queries inherit OK "
                         "from the bit-identity proof (VERDICT r18 #5). "
                         "The three calibrated replays still run in full. "
                         "Without a green manifest-check this flag is "
                         "ignored and the full sweep runs")
    a = ap.parse_args()
    os.makedirs(a.logdir, exist_ok=True)
    py = sys.executable
    val = ["--validate"] if a.validate else []
    stages = {}

    # One row probe drives BOTH the heap default and the replay routing.
    # Scale-aware ngram routing (r20, measured live on the first sf1 gate
    # run): q_dedup_ngram's cost regime INVERTS with scale — at sf10 the
    # verbatim self-join oracle is infeasible (1.39e10 rows) and the
    # cand-restricted chunked replay is the instrument, while at sf1 the
    # REPLAY's cand-restricted join fills the disk (>49 GB of DuckDB
    # spill, [ERR] No space left) and the verbatim oracle is the feasible
    # form. So below sf10 scale the ngram replay is skipped and
    # q_dedup_ngram is force-included in the fresh oracle sweep (never
    # pre-seeded from the manifest anchor), keeping the ADVICE r19
    # invariant: superlinear-family queries always EARN their status from
    # a fresh instrument, whichever instrument is feasible at this scale.
    probe_rows = _lineitem_rows(a.sf_dir)
    if probe_rows is None:
        # An unreadable probe must bail for BOTH consumers (ADVICE r20): it
        # already bailed for the verify-heap default, but big_scale=False
        # would also route q_dedup_ngram into the verbatim oracle sweep —
        # on a pre-dumped sf10 tree that is the documented-infeasible
        # 1.39e10-row self-join that can fill the shared /tmp DuckDB spill
        # (the r16 lost-run failure mode) before the sweep timeout fires.
        print("[gate] ABORT: sf-dir row probe unreadable (pyarrow missing "
              f"or no parquet footers under {a.sf_dir}/lineitem.parquet) — "
              "the probe drives ngram routing, so the gate cannot proceed "
              "safely at any scale", flush=True)
        return 1
    big_scale = probe_rows >= 30_000_000
    ngram_via_sweep = not big_scale
    if ngram_via_sweep:
        print("[gate] scale probe: sub-sf10 scale -> q_dedup_ngram via the "
              "verbatim oracle sweep (replay's cand-restricted join is the "
              "infeasible form at this scale)", flush=True)

    load_gate = {}
    if a.load_gate > 0:
        def load1():
            return float(open("/proc/loadavg").read().split()[0])
        t0, waited = time.time(), 0.0
        while load1() >= a.load_gate and time.time() - t0 < 600:
            print(f"[gate] load gate: load1={load1():.2f} >= "
                  f"{a.load_gate:.2f}, waiting...", flush=True)
            time.sleep(5)
        waited = round(time.time() - t0, 1)
        load_gate = {"threshold": a.load_gate, "wait_sec": waited,
                     "load1_start": load1()}
        print(f"[gate] load gate: start load1={load_gate['load1_start']:.2f} "
              f"after {waited}s wait", flush=True)

    def bail(reason):
        summary = {"sf_dir": a.sf_dir, "out_dir": a.out_dir, "all_ok": False,
                   "aborted": reason,
                   "stage_walls_sec": {k: v["wall_sec"] for k, v in stages.items()},
                   "stage_exits": {k: v["exit"] for k, v in stages.items()},
                   "logs": {k: v["log"] for k, v in stages.items()}}
        with open(a.summary, "w") as f:
            json.dump(summary, f, indent=1)
        print(f"[gate] ABORT: {reason} -> {a.summary}", flush=True)
        return 1

    if a.run_verify:
        repo = os.path.dirname(TOOLS)
        t0 = time.time()
        vlog = os.path.join(a.logdir, "verify.log")
        venv = dict(os.environ)
        if not a.verify_mem:
            # Heap default from the sf-dir row probe (VERDICT r18 #2): the
            # r18 abort proved the 8g default heap kills sf10 Verify an
            # hour in; the gate must not depend on a remembered flag.
            # lineitem is ~6M rows/sf-unit; >=30M rows means sf>=~5 scale.
            if probe_rows is None:
                # an unreadable probe must not quietly proceed with the 8g
                # heap and reproduce the exact hour-long OOM the probe was
                # added to prevent (ADVICE r19)
                return bail("sf-dir row probe unreadable (pyarrow missing "
                            f"or no parquet footers under {a.sf_dir}/"
                            "lineitem.parquet) — pass --verify-mem "
                            "explicitly to run anyway")
            a.verify_mem = "64g" if big_scale else None
            if a.verify_mem:
                print(f"[gate] verify-mem defaulted to {a.verify_mem} "
                      "(sf-dir row probe says sf>=10 scale)", flush=True)
        if a.verify_mem:
            venv["SPARK_DRIVER_MEM"] = a.verify_mem
        if a.verify_cpus:
            venv["SPARK_GRAFT_CPUS"] = a.verify_cpus
        # Scale legs run the PRODUCTION state-store provider by default
        # (VERDICT r19 #1); Verify logs the pin back from the live session
        # conf, so the gate log is self-describing provenance.
        provider = {"rocksdb": "org.apache.spark.sql.execution.streaming."
                               "state.RocksDBStateStoreProvider",
                    "default": None}.get(a.state_store, a.state_store)
        if provider:
            venv["SPARK_GRAFT_STATE_STORE"] = provider
            print(f"[gate] verify state store: {provider}", flush=True)
        with open(vlog, "w") as lf:
            p = subprocess.run(
                ["sbt", "-batch", f"runMain graft.Verify {a.sf_dir} {a.out_dir}"],
                cwd=repo, env=venv, stdout=lf, stderr=subprocess.STDOUT)
        wall = time.time() - t0
        # Verify catches per-query exceptions and logs them as [verify]
        # lines (the dump is then absent); treat any such line as fatal
        # here so the gate never sweeps a silently partial tree.
        vfails = [l.strip() for l in open(vlog, errors="replace")
                  if "[verify]" in l and "failed:" in l]
        stages["verify"] = {"exit": p.returncode, "wall_sec": round(wall, 1),
                            "log": vlog, "statuses": {},
                            "query_failures": len(vfails)}
        print(f"[gate] verify: exit={p.returncode} wall={wall:.1f}s "
              f"query_failures={len(vfails)} ({vlog})", flush=True)
        if p.returncode != 0 or vfails:
            return bail(f"graft.Verify failed (exit={p.returncode}, "
                        f"{len(vfails)} per-query failures)")

    manifest_green = False
    if a.manifest_check:
        sys.path.insert(0, TOOLS)
        import dump_equiv
        t0 = time.time()
        mlog = os.path.join(a.logdir, "manifest_check.log")
        real_stdout = sys.stdout
        # a raised exception (missing/corrupt manifest, unreadable dump
        # dir) must route through bail() like every other failure path so
        # the abort summary artifact is always produced (ADVICE r18)
        try:
            with open(mlog, "w") as lf:
                sys.stdout = lf
                try:
                    rc = dump_equiv.manifest_check(a.manifest_check, a.out_dir)
                finally:
                    sys.stdout = real_stdout
        except Exception as e:
            stages["manifest_check"] = {
                "exit": -1, "wall_sec": round(time.time() - t0, 1),
                "log": mlog, "statuses": {}}
            return bail(f"manifest-check vs {a.manifest_check} raised "
                        f"{type(e).__name__}: {e}")
        wall = time.time() - t0
        stages["manifest_check"] = {"exit": rc, "wall_sec": round(wall, 1),
                                    "log": mlog, "statuses": {}}
        print(f"[gate] manifest-check vs {a.manifest_check}: exit={rc} "
              f"wall={wall:.1f}s ({mlog})", flush=True)
        if rc != 0:
            return bail(f"manifest-check vs {a.manifest_check} found diffs "
                        "or undumped queries — see its log")
        manifest_green = True

    # Drift-triggered sweep (VERDICT r18 #5): a green manifest-check just
    # proved every dump PRESENT IN THE MANIFEST bit-identical to a tree
    # whose oracle agreement is on record — re-oracling those re-proves a
    # proof. Size the sweep to the drift set: queries in the dump tree but
    # not in the manifest (new this round). The replays still run in full
    # (they re-prove the superlinear-oracle instruments themselves).
    anchored = set()
    drift_only = None
    if a.drift_sweep:
        if not manifest_green:
            print("[gate] drift-sweep requested without a green "
                  "manifest-check — running the FULL sweep instead",
                  flush=True)
        else:
            man_names = set(json.load(open(a.manifest_check)))
            dumped_now = set(os.path.basename(p) for p in
                             glob.glob(os.path.join(a.out_dir, "*"))
                             if os.path.isdir(p))
            anchored = dumped_now & man_names
            drift_only = sorted(dumped_now - man_names)
            if ngram_via_sweep and "q_dedup_ngram" in dumped_now and \
                    "q_dedup_ngram" not in drift_only:
                # the superlinear family always earns a FRESH status; with
                # the replay infeasible at this scale, the verbatim sweep
                # is its instrument — never the manifest anchor
                drift_only.append("q_dedup_ngram")
                anchored.discard("q_dedup_ngram")
            print(f"[gate] drift-sweep: {len(anchored)} queries "
                  f"bit-anchored by {a.manifest_check}; oracle-sweeping "
                  f"{len(drift_only)}: {drift_only}", flush=True)

    sweep_skip = [q for q in SKIP6
                  if not (ngram_via_sweep and q == "q_dedup_ngram")]
    env = dict(os.environ,
               GRAFT_CHECK_SKIP=",".join(sweep_skip),
               GRAFT_CHECK_TIMEOUT=a.timeout)
    if drift_only is not None:
        env["GRAFT_CHECK_ONLY"] = ",".join(drift_only)
    if drift_only == []:
        # nothing drifted: an empty GRAFT_CHECK_ONLY would run the FULL
        # sweep (empty env var = no filter), so skip the stage explicitly
        stages["sweep"] = {"exit": 0, "wall_sec": 0.0,
                           "log": "(skipped: drift set empty)",
                           "statuses": {}}
        print("[gate] check.py sweep skipped: drift set empty", flush=True)
    else:
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
    if ngram_via_sweep:
        stages["ngram"] = {"exit": 0, "wall_sec": 0.0,
                           "log": "(skipped: sub-sf10 scale — q_dedup_ngram "
                                  "earns its status from the verbatim sweep)",
                           "statuses": {}}
        print("[gate] ngram replay skipped: sub-sf10 scale", flush=True)
    else:
        stages["ngram"] = run_stage(
            "ngram replay", [py, os.path.join(TOOLS, "ngram_replay.py"),
                             a.sf_dir, a.out_dir, "--threads", str(a.threads),
                             "--mem", a.mem,
                             "--tmp", os.path.join(a.logdir, "ngram_spill")]
            + val, dict(os.environ), os.path.join(a.logdir, "ngram.log"))

    # fold: manifest-anchored OKs (drift-sweep mode), then sweep statuses,
    # then replay statuses for the SKIP6. The SKIP6 are EXCLUDED from the
    # anchored pre-seed (ADVICE r19): they must always earn their status
    # from the replays, so a replay that exits 0 without emitting a status
    # line for one of its queries surfaces as NO-STATUS instead of
    # inheriting a pre-seeded OK.
    per_query = {q: "OK" for q in anchored if q not in SKIP6}
    per_query.update(stages["sweep"]["statuses"])
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
        "state_store": a.state_store if a.run_verify else "(pre-dumped tree)",
        "n_oracles": len(oracle),
        "n_ok": len(ok), "bad": bad, "replay_uncovered": still_skipped,
        # provenance split (drift-sweep mode): how many OKs came from the
        # manifest bit-anchor vs a fresh DuckDB oracle run this gate
        "n_anchored": len(anchored),
        "fresh_swept": drift_only if drift_only is not None else "all",
        "all_ok": all_ok,
        "stage_walls_sec": {k: v["wall_sec"] for k, v in stages.items()},
        "stage_exits": {k: v["exit"] for k, v in stages.items()},
        "logs": {k: v["log"] for k, v in stages.items()},
    }
    if load_gate:
        summary["load_gate"] = load_gate
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
