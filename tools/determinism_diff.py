#!/usr/bin/env python3
"""Parallelism-determinism check: diff two graft.Verify output dirs.

Usage: python3 tools/determinism_diff.py <outDirA> <outDirB>

Run graft.Verify twice at different thread counts (e.g. SPARK_GRAFT_CPUS=32
and =7) into two dirs, then diff every query's parquet VALUE-AND-ROW-ORDER
exactly. This is the SURVEY §8.8 "parallelism determinism" protocol,
mechanized: any query whose output depends on partition count / task
interleaving (an unstable sort, a first()/head-style nondeterminism, a
float reduction order leak) shows up as a per-query diff.

Exit 1 on any mismatch or missing query dir.
"""
import glob
import os
import sys

import pandas as pd


def load(d, name):
    files = sorted(glob.glob(os.path.join(d, name, "*.parquet")))
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)


def main():
    a_dir, b_dir = sys.argv[1], sys.argv[2]
    names = sorted(
        os.path.basename(p.rstrip("/"))
        for p in glob.glob(os.path.join(a_dir, "*"))
        if os.path.isdir(p))
    bad = 0
    for name in names:
        a, b = load(a_dir, name), load(b_dir, name)
        if a is None or b is None:
            print(f"[MISS] {name}: missing in {'B' if a is not None else 'A'}")
            bad += 1
            continue
        if list(a.columns) != list(b.columns):
            print(f"[COLS] {name}: {list(a.columns)} vs {list(b.columns)}")
            bad += 1
            continue
        if len(a) != len(b):
            print(f"[ROWS] {name}: {len(a)} vs {len(b)}")
            bad += 1
            continue
        # exact value + row order equality (NaN == NaN via fillna sentinel)
        if not a.fillna("\x00nan").equals(b.fillna("\x00nan")):
            neq = (a.fillna("\x00nan") != b.fillna("\x00nan")).any(axis=1)
            print(f"[VALS] {name}: {int(neq.sum())} differing rows "
                  f"(first at index {int(neq.idxmax())})")
            bad += 1
            continue
        print(f"[OK]   {name}: {len(a)} rows identical (values + order)")
    print(f"== {len(names) - bad} identical, {bad} diffs ==")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
