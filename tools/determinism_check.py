#!/usr/bin/env python3
"""Cross-run determinism sweep: canonically compare two Verify output dirs.

Usage: determinism_check.py <outDirA> <outDirB>

Run graft.Verify twice (ideally with different SPARK_GRAFT_CPUS) and compare
every query's parquet output after canonicalization (columns sorted by name,
rows sorted by repr). Catches partition-count-dependent nondeterminism that
the oracle gate can't see (it only checks one run), e.g. unstable orderings
or float-sum order sensitivity. Dev tooling only.
"""
import glob, os, sys
import pyarrow.parquet as pq

def canon(base, n):
    fs = glob.glob(f'{base}/{n}/*.parquet')
    if not fs:
        return None
    t = pq.read_table(fs[0])
    cols = sorted(t.column_names)
    rows = sorted(tuple(repr(d[c]) for c in cols) for d in t.to_pylist())
    return (cols, rows)

def main():
    a, b = sys.argv[1], sys.argv[2]
    names = sorted(d for d in os.listdir(a) if os.path.isdir(os.path.join(a, d)))
    bad = [n for n in names if canon(a, n) != canon(b, n)]
    print(f"queries: {len(names)}  nondeterministic: {bad if bad else 'none'}")
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main()
