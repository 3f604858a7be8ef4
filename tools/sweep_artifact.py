#!/usr/bin/env python3
"""Render a Verify dump + DuckDB compare as a CORRECTNESS-style JSON
artifact (the driver's per-query schema), for the per-round sf0.1
correctness sweep the driver itself does not run.

Usage: python3 tools/sweep_artifact.py <outDir> <sfDir> <artifact.json>
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)
"""
import json, sys, glob, math
import duckdb

outdir, sfdir, artifact = sys.argv[1], sys.argv[2], sys.argv[3]

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)

result = {}
qdirs = sorted(d.split("/")[-1] for d in glob.glob(f"{outdir}/*")
               if not d.endswith(".json") and not d.endswith("_failed"))
for name in qdirs:
    row = {"rows_match": False, "schema_match": False, "hash_match": False,
           "spark_rows": 0, "oracle_rows": 0, "err": None}
    result[name] = row
    try:
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            row["err"] = "no parquet output"
            continue
        got = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
        gcols = sorted(got.columns)
        grows = con.sql(
            f"SELECT {', '.join(chr(34)+c+chr(34) for c in gcols)} FROM got").fetchall()
        row["spark_rows"] = len(grows)
        if name not in oracle:
            # never compared against an oracle: report under a separate
            # mode instead of folding into the hash-green total
            row["mode"] = "rows-only"
            row["hash_match"] = None
            row["rows_match"] = row["schema_match"] = len(grows) > 0
            continue
        exp = con.sql(oracle[name])
        ecols = sorted(exp.columns)
        erows = con.sql(
            f"SELECT {', '.join(chr(34)+c+chr(34) for c in ecols)} FROM exp").fetchall()
        row["oracle_rows"] = len(erows)
        row["rows_match"] = len(grows) == len(erows)
        row["schema_match"] = gcols == ecols
        row["hash_match"] = (row["rows_match"] and row["schema_match"] and
            all(tuple(map(canon, g)) == tuple(map(canon, e))
                for g, e in zip(grows, erows)))
    except Exception as e:
        row["err"] = str(e)[:300]

json.dump(result, open(artifact, "w"), indent=0, sort_keys=True)
oracle_rows = [r for r in result.values() if r.get("mode") != "rows-only"]
rows_only = [r for r in result.values() if r.get("mode") == "rows-only"]
ok = sum(1 for r in oracle_rows
         if r["rows_match"] and r["schema_match"] and r["hash_match"])
ro_ok = sum(1 for r in rows_only if r["rows_match"])
tail = f" (+{ro_ok}/{len(rows_only)} rows-only)" if rows_only else ""
print(f"{ok}/{len(oracle_rows)} green{tail} -> {artifact}")
sys.exit(0 if ok == len(oracle_rows) and ro_ok == len(rows_only) else 1)
