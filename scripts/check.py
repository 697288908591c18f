#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 scripts/check.py [sfdir] [outdir] [--skip-verify]

Runs `sbt "runMain graft.Verify <sfdir> <outdir>"`, then executes each
oracle_sql.json entry in DuckDB over the same parquet tables and compares
row count / column names / value hash, like CORRECTNESS_r{N}.json.
"""
import json, subprocess, sys, hashlib
from pathlib import Path

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out")

# target/ hygiene: drop test-report XMLs whose suite CLASS no longer exists
# (deleted scratch suites otherwise linger in target/test-reports and read
# as phantom coverage). Matching must be against declared class names, not
# file stems — a suite defined inside a differently-named file (e.g.
# ConnectionStringSpec in RemoteClientSpec.scala) is live coverage.
import re
reports = Path("/root/repo/target/test-reports")
if reports.is_dir():
    # Build PACKAGE-QUALIFIED suite names (package decl + declared classes,
    # including backtick-quoted names) so a report is pruned only when its
    # fully-qualified suite has no declaration anywhere — and log each
    # deletion so pruning is auditable rather than silent (round-8 ADVICE).
    qualified = set()
    for p in Path("/root/repo/src/test/scala").rglob("*.scala"):
        text = p.read_text()
        pkg = re.search(r"^\s*package\s+([\w.]+)", text, re.M)
        prefix = pkg.group(1) + "." if pkg else ""
        for name in re.findall(r"\bclass\s+(?:`([^`]+)`|(\w+))", text):
            qualified.add(prefix + (name[0] or name[1]))
    for xml in reports.glob("TEST-*.xml"):
        if xml.stem.removeprefix("TEST-") not in qualified:
            print(f"pruning orphaned test report: {xml.name}", file=sys.stderr)
            xml.unlink()

if "--skip-plans" not in sys.argv and "--skip-verify" not in sys.argv:
    # Plan-shape assertions (pushdown, broadcast, no-BNLJ, narrow band joins)
    # gate the same as a hash mismatch: a lost pushdown is a regression even
    # when the numbers still match. Runs at sf0.001 — plan shape, not data.
    rc = subprocess.run(
        ["sbt", "runMain graft.tools.Plans"],
        cwd="/root/repo").returncode
    if rc != 0:
        print("plan checks failed", file=sys.stderr)
        sys.exit(1)

if "--skip-verify" not in sys.argv:
    rc = subprocess.run(
        ["sbt", f'runMain graft.Verify {sfdir} {outdir}'],
        cwd="/root/repo").returncode
    if rc != 0:
        print("sbt verify failed", file=sys.stderr)
        sys.exit(1)

import duckdb
import pandas as pd

con = duckdb.connect()
for p in Path(sfdir).glob("*.parquet"):
    con.execute(f"CREATE VIEW {p.stem} AS SELECT * FROM '{p}'")

oracle = json.loads((outdir / "oracle_sql.json").read_text())

def fmt(v):
    # Round floats to 12 significant digits (tolerates last-ULP libm
    # differences: Spark Math.pow vs DuckDB pow) but keep float formatting
    # (str(123.0) == "123.0"): the driver's hash distinguishes int64 123
    # from float64 123.0 (r2: q_gap_fill/q_moving_sum failed on exactly
    # this), so dtype skew must fail locally too.
    if isinstance(v, float):
        return str(float(f"{v:.12g}"))
    return str(v)

def canon(df: pd.DataFrame):
    df = df.reindex(sorted(df.columns), axis=1)
    rows = sorted(tuple(fmt(v) for v in r) for r in df.itertuples(index=False))
    h = hashlib.md5(json.dumps(rows).encode()).hexdigest()
    return len(df), list(df.columns), h, rows

results = {}
fails = []
for name in sorted(set(list(oracle) + [p.name for p in outdir.iterdir() if p.is_dir()])):
    entry = {}
    try:
        spark_df = pd.read_parquet(outdir / name)
    except Exception as e:
        entry["err"] = f"spark result missing: {e}"
        results[name] = entry; fails.append(name); continue
    if name not in oracle:
        entry["rows_only"] = len(spark_df)
        results[name] = entry
        continue
    try:
        ora_df = con.execute(oracle[name]).df()
    except Exception as e:
        entry["err"] = f"oracle sql error: {e}"
        results[name] = entry; fails.append(name); continue
    sn, sc, sh, srows = canon(spark_df)
    on, oc, oh, orows = canon(ora_df)
    entry.update(rows_match=sn == on, schema_match=sc == oc, hash_match=sh == oh,
                 spark_rows=sn, oracle_rows=on)
    if not (sn == on and sc == oc and sh == oh):
        fails.append(name)
        if sc != oc:
            entry["spark_cols"], entry["oracle_cols"] = sc, oc
        else:
            diff = [(a, b) for a, b in zip(srows, orows) if a != b][:3]
            entry["first_diffs"] = diff
    results[name] = entry

print(json.dumps(results, indent=1, default=str))
print(f"\n{len(results) - len(fails)}/{len(results)} ok; FAIL: {fails}", file=sys.stderr)
sys.exit(1 if fails else 0)
