#!/usr/bin/env python3
"""Run every sg gate's LOWERED SQL string (dumped by graft.tools.SqlGenDump)
on DuckDB and compare it to the gate's independent handwritten oracle —
the lowering is validated by two SQL engines (Spark SQL via the sg gates,
DuckDB here) agreeing on the identical string. Usage:
    sbt -batch "runMain graft.tools.SqlGenDump <sfDir> target/sqlgen_dump.json"
    python3 scripts/check_sqlgen_duckdb.py target/sqlgen_dump.json [<sfDir>]
The optional sfDir (default /root/testdata/sf0.01) provides the base-table
views the HANDWRITTEN oracles read; the lowered strings read the dump's
own table list.
"""
import sys, json, math, os
import duckdb

dump = json.load(open(sys.argv[1]))
sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
BASE = ("region nation customer supplier part orders lineitem events "
        "documents embeddings").split()

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "nan"
        return f"{v:.6g}"
    return str(v)

def canon(rel):
    cols = [c.lower() for c in rel.columns]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = sorted(tuple(norm(r[i]) for i in order) for r in rel.fetchall())
    return sorted(cols), rows

fails = 0
for name in sorted(dump):
    d = dump[name]
    con = duckdb.connect()
    for t in BASE:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    for tbl, ref in d["tables"].items():
        if tbl in BASE:
            con.execute(f"DROP VIEW {tbl}")
        path, typ = ref["path"], ref.get("type", "parquet")
        if typ == "csv":
            # Spark CSV dirs; header from the lake options, types inferred
            # (the lowered SQL's casts absorb inference differences)
            hdr = str(ref.get("options", {}).get("header", "false") == "true").lower()
            src = f"read_csv('{path}/*.csv', header={hdr})"
        elif typ == "json":
            src = f"read_json_auto('{path}/*.json')"
        elif os.path.isdir(path) and not path.endswith(".parquet"):
            # Spark writes directory datasets; DuckDB infers format from
            # the extension, so extension-less dirs need an explicit glob
            src = f"read_parquet('{path}/*.parquet')"
        else:
            src = f"'{path}'"
        con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM {src}")
    try:
        gcols, got = canon(con.sql(d["sql"]))
        ecols, exp = canon(con.sql(d["oracle"]))
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
    if gcols != ecols:
        print(f"FAIL {name}: columns {gcols} != {ecols}"); fails += 1
    elif got != exp:
        print(f"FAIL {name}: {len(got)} rows vs {len(exp)}")
        for a, b in zip(got, exp):
            if a != b:
                print(f"  lowered={a}\n  oracle ={b}"); break
        fails += 1
    else:
        print(f"OK   {name} ({len(got)} rows)")
print(f"\n{len(dump) - fails}/{len(dump)} lowered strings agree on DuckDB")
sys.exit(1 if fails else 0)
