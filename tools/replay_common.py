"""Shared setup for the chunked oracle replay tools (minhash_replay,
vector_replay, ngram_replay): one place for the DuckDB session policy
(threads / memory limit / spill dir) and the table views, so a change to
the environment convention cannot silently apply to only one replay.
"""
import json
import os
import time

import duckdb
import numpy as np

import check  # tools/check.py — the gate's table list and compare

S33 = np.uint64(33)
C1 = np.uint64(18397679294719823053)   # 0xff51afd7ed558ccd
C2 = np.uint64(14181476777654086739)   # 0xc4ceb9fe1a85ec53


def fmix64(x):
    """murmur3 fmix64 over a uint64 ndarray (wrapping multiply)."""
    x = x ^ (x >> S33)
    x = x * C1
    x = x ^ (x >> S33)
    x = x * C2
    x = x ^ (x >> S33)
    return x


def make_logger(tag):
    def log(msg, t0=None):
        tail = f" [{time.time() - t0:.1f}s]" if t0 is not None else ""
        print(f"[{tag}] {msg}{tail}", flush=True)
    return log


def connect_views(sf_dir, threads=8, mem=None, tmp=None):
    """DuckDB connection with the gate's table views and the replay
    session policy applied."""
    con = duckdb.connect()
    con.execute(f"SET threads={threads}")
    if mem:
        con.execute(f"SET memory_limit='{mem}'")
    if tmp:
        os.makedirs(tmp, exist_ok=True)
        con.execute(f"SET temp_directory='{tmp}'")
    for t in check.TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path += "/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def load_oracle(out_dir):
    return json.load(open(os.path.join(out_dir, "oracle_sql.json")))
