#!/usr/bin/env python3
"""Determinism insurance: compare two Verify output dirs query-by-query.

Usage: python3 scripts/determinism.py <outdirA> <outdirB>

Each <outdir> is a `graft.Verify` dump (one parquet dir per query). For
every query present in either dir, canonicalize (sort columns by name,
sort rows by their full value tuple, format floats like check.py) and
md5 the result; report any query whose hashes differ or that is missing
on one side. Partition-order nondeterminism can survive ONE lucky oracle
pass — two independent Spark runs hashed identically is the actual
evidence of a deterministic battery.

Exit 0 = all identical; 1 = any mismatch/missing.
"""
import json, sys, hashlib
from pathlib import Path

import pandas as pd


def fmt(v):
    if pd.isna(v):
        return "NULL"
    if isinstance(v, float):
        return f"{v:.6g}"
    return str(v)


def canon(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = sorted(tuple(fmt(v) for v in row) for row in df.itertuples(index=False))
    return hashlib.md5(json.dumps(rows).encode()).hexdigest()


def load(qdir: Path) -> pd.DataFrame:
    parts = sorted(qdir.glob("*.parquet"))
    if not parts:
        raise FileNotFoundError(f"no parquet parts in {qdir}")
    return pd.concat([pd.read_parquet(p) for p in parts], ignore_index=True)


def main():
    a, b = Path(sys.argv[1]), Path(sys.argv[2])
    queries = sorted(
        {p.name for p in a.iterdir() if p.is_dir()}
        | {p.name for p in b.iterdir() if p.is_dir()})
    bad = []
    for q in queries:
        if not (a / q).is_dir() or not (b / q).is_dir():
            bad.append((q, "missing on one side"))
            continue
        try:
            ha, hb = canon(load(a / q)), canon(load(b / q))
        except Exception as e:
            bad.append((q, f"unreadable: {e}"))
            continue
        if ha != hb:
            bad.append((q, f"hash mismatch {ha[:12]} != {hb[:12]}"))
    for q, why in bad:
        print(f"NONDETERMINISTIC {q}: {why}")
    print(f"{len(queries) - len(bad)}/{len(queries)} identical")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
