#!/usr/bin/env python3
"""Chunked replay of the q_dedup_ngram oracle at scales where the verbatim
DuckDB statement fills the disk (VERDICT r15 #4 — [ERR disk-full] at sf10).

Measured why it fills: the verbatim `common` CTE self-joins doc_grams on
the gram with NO doc-frequency cap, so its pre-aggregation size is
sum_g C(df_g, 2) = 13.9e9 rows at sf10 (measured; 61 GB of DuckDB spill),
while the `pairs` CTE only ever consumes `common` rows for `cand` pairs —
of which the same measurement bounds 2.38e6. The replay rewrites ONLY the
`common` CTE to compute intersection counts FOR CANDIDATE PAIRS (join cand
to both gram sides), which is semantically identical because `pairs`
inner-joins cand x common: rows of `common` outside cand can never reach
the output. Every other CTE runs as a VERBATIM slice of the oracle text
(hard require() on the markers). --validate asserts frame equality with
the untouched single-statement oracle at scales where it completes.

Usage:
  python3 tools/ngram_replay.py SF_DIR VERIFY_OUT_DIR [--validate]
      [--threads N] [--mem 24GB] [--tmp /tmp/ngram_spill]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import check  # noqa: E402
from replay_common import connect_views, load_oracle, make_logger  # noqa: E402

COMMON_VERBATIM = """,
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
  FROM doc_grams a JOIN doc_grams b USING (g)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
),"""

COMMON_CAND = """,
common AS (
  -- cand-restricted intersection counts: identical to the verbatim
  -- common for every row `pairs` can consume (pairs inner-joins cand)
  SELECT c.id_a, c.id_b, count(*) AS c
  FROM cand c
  JOIN doc_grams a ON a.doc_id = c.id_a
  JOIN doc_grams b ON b.doc_id = c.id_b AND b.g = a.g
  GROUP BY 1, 2
),"""


log = make_logger("ngreplay")


def main():
    t0 = time.time()
    con = connect_views(ARGS.sf_dir, ARGS.threads, ARGS.mem, ARGS.tmp)

    oracle = load_oracle(ARGS.out_dir)
    sql = oracle["q_dedup_ngram"]
    if COMMON_VERBATIM not in sql:
        raise AssertionError(
            "oracle shape changed: the verbatim `common` CTE text no longer "
            "matches — re-derive COMMON_VERBATIM from SparkEntry.oracleSql")
    replay_sql = sql.replace(COMMON_VERBATIM, COMMON_CAND)

    ok, lines = check.check_one(con, ARGS.out_dir, "q_dedup_ngram", replay_sql)
    print("\n".join(lines), flush=True)
    log(f"q_dedup_ngram: {'OK' if ok else 'FAIL'}", t0)
    rc = 0 if ok else 1
    if ARGS.validate:
        vt = time.time()
        got = con.execute(replay_sql).fetchdf()
        want = con.execute(sql).fetchdf()
        same = got.equals(want)
        log(f"verbatim-oracle validation {'EQUAL' if same else 'MISMATCH'} "
            f"in {time.time() - vt:.1f}s")
        rc |= (not same)
    return rc


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--validate", action="store_true")
    ap.add_argument("--threads", type=int, default=8)
    ap.add_argument("--mem", default="24GB")
    ap.add_argument("--tmp", default="/tmp/ngram_spill")
    ARGS = ap.parse_args()
    sys.exit(main())
