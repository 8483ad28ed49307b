#!/usr/bin/env python3
"""Correctness-artifact completeness check (round-9 verdict item 6).

The driver's CORRECTNESS_rN.json silently OMITS queries that threw
(round 9: the whole st family vanished) and has permanently omitted
sg27 since round 5. This script makes both failure modes visible:
given a Verify output dir and (optionally) a driver CORRECTNESS json,
it diffs the registered gate set against what was actually checked and
prints every unchecked gate plus _errors.json contents.

Usage:
    python3 scripts/check_completeness.py <verifyOutDir> [CORRECTNESS_rN.json]

Exit 1 when any registered gate has no parquet output (i.e. it threw or
was skipped) or when the driver artifact is missing rows for gates that
DID produce output.
"""
import sys, json, os, glob

outdir = sys.argv[1]
corr_path = sys.argv[2] if len(sys.argv) > 2 else None

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
try:
    errors = json.load(open(f"{outdir}/_errors.json"))
except FileNotFoundError:
    errors = {}

registered = set(oracle)
produced = {n for n in registered if glob.glob(f"{outdir}/{n}/*.parquet")}

bad = 0
threw = sorted(set(errors))
if threw:
    bad += len(threw)
    print(f"THREW ({len(threw)}):")
    for n in threw:
        print(f"  {n}: {errors[n]}")
missing_out = sorted(registered - produced - set(errors))
if missing_out:
    bad += len(missing_out)
    print(f"NO OUTPUT and not in _errors.json ({len(missing_out)}):")
    for n in missing_out:
        print(f"  {n}")

if corr_path and os.path.exists(corr_path):
    corr = set(json.load(open(corr_path)))
    dropped = sorted(produced - corr)
    if dropped:
        bad += len(dropped)
        print(f"DRIVER DROPPED (produced output, absent from {os.path.basename(corr_path)}, "
              f"{len(dropped)}):")
        for n in dropped:
            print(f"  {n}")
    extra = sorted(corr - registered)
    if extra:
        print(f"note: driver artifact has {len(extra)} rows for unregistered gates: {extra}")

print(f"\n{len(produced)}/{len(registered)} registered gates produced output; "
      f"{len(errors)} threw; "
      + (f"driver checked {len(set(json.load(open(corr_path))) & produced)} of them"
         if corr_path and os.path.exists(corr_path) else "no driver artifact given"))
sys.exit(1 if bad else 0)
