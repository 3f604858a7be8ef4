#!/usr/bin/env python3
"""Local mirror of the driver's t2 gate: compare graft.Verify parquet dumps
against DuckDB runs of SparkEntry.oracleSql on the same testdata.

Usage: python3 tools/check.py [outDir] [sfDir]
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)

Columns are sorted by name before compare (driver contract); rows compared
in result order; floats exact (stable aggregates make them bit-stable).
"""
import json, sys, glob, math
import duckdb

outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return repr(v)
    return repr(v)

fails, passes, skipped = [], [], []
qdirs = sorted(d.split("/")[-1] for d in glob.glob(f"{outdir}/*") if not d.endswith(".json"))
for name in qdirs:
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        fails.append((name, "no parquet output")); continue
    got = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
    gcols = sorted(got.columns)
    grows = con.sql(f"SELECT {', '.join(chr(34)+c+chr(34) for c in gcols)} FROM got").fetchall()
    gtypes = {c: t for c, t in zip(got.columns, got.types)}
    if name not in oracle:
        skipped.append((name, f"{len(grows)} rows (no oracle, rows-only)"))
        if len(grows) == 0: fails.append((name, "rows-only check but 0 rows"))
        continue
    try:
        exp = con.sql(oracle[name])
        ecols = sorted(exp.columns)
        etypes = {c: t for c, t in zip(exp.columns, exp.types)}
        erows = con.sql(f"SELECT {', '.join(chr(34)+c+chr(34) for c in ecols)} FROM exp").fetchall()
    except Exception as e:
        fails.append((name, f"oracle SQL error: {e}")); continue
    if gcols != ecols:
        fails.append((name, f"schema cols: spark={gcols} duck={ecols}")); continue
    ts_mismatch = [(c, str(gtypes[c]), str(etypes[c])) for c in got.columns
                   if str(gtypes.get(c)) != str(etypes.get(c))]
    if ts_mismatch:
        fails.append((name, f"type mismatch {ts_mismatch}")); continue
    if len(grows) != len(erows):
        fails.append((name, f"rowcount spark={len(grows)} duck={len(erows)}")); continue
    bad = None
    for i, (gr, er) in enumerate(zip(grows, erows)):
        if tuple(map(canon, gr)) != tuple(map(canon, er)):
            bad = (i, gr, er); break
    if bad:
        fails.append((name, f"row {bad[0]}: spark={bad[1]} duck={bad[2]}")); continue
    passes.append((name, f"{len(grows)} rows"))

for n, m in passes: print(f"PASS {n}: {m}")
for n, m in skipped: print(f"SKIP {n}: {m}")
for n, m in fails: print(f"FAIL {n}: {m}")
print(f"\n{len(passes)} pass, {len(skipped)} rows-only, {len(fails)} FAIL")
sys.exit(1 if fails else 0)
