#!/usr/bin/env python3
"""Partition-count determinism audit (the round-9 out-of-tree check,
kept as a tool): two graft.Verify dumps of every query made at
different local[] widths / shuffle-partition counts must be
ROW-IDENTICAL — same rows, same emitted order, bit-equal values.
ConcurrencySpec covers pool-width determinism in-tree; this covers the
partition-count axis (exchange fan-in, agg combine order, sample
pseudo-randomness), which needs two separate JVMs.

Usage: python3 tools/determinism_audit.py <dump_a> <dump_b>
"""
import sys, os, glob
import pandas as pd


def main():
    a_dir, b_dir = sys.argv[1], sys.argv[2]
    # union of both dumps: a query present only in B (rename, addition
    # between dumps) must flag as a diff, not silently escape the audit
    names = sorted(
        {os.path.basename(p) for d in (a_dir, b_dir)
         for p in glob.glob(os.path.join(d, "*")) if os.path.isdir(p)})
    n_same = 0
    diffs = []
    for name in names:
        pa = os.path.join(a_dir, name)
        pb = os.path.join(b_dir, name)
        if not os.path.isdir(pa):
            diffs.append((name, "missing in A"))
            continue
        if not os.path.isdir(pb):
            diffs.append((name, "missing in B"))
            continue
        da = pd.read_parquet(os.path.join(a_dir, name))
        db = pd.read_parquet(pb)
        if list(da.columns) != list(db.columns):
            diffs.append((name, f"schema {list(da.columns)} vs {list(db.columns)}"))
        elif len(da) != len(db):
            diffs.append((name, f"rows {len(da)} vs {len(db)}"))
        elif not da.equals(db):
            neq = (da != db) & ~(da.isna() & db.isna())
            diffs.append((name, f"{int(neq.any(axis=1).sum())} differing rows"))
        else:
            n_same += 1
    for name, why in diffs:
        print(f"DIFF {name}: {why}")
    print(f"== {n_same}/{len(names)} row-identical, {len(diffs)} diffs ==")
    sys.exit(1 if diffs else 0)


if __name__ == "__main__":
    main()
