#!/usr/bin/env python3
"""Merge chunked ScaleProbe artifacts (standard | decade+store, run in
separate JVMs so an AQE zombie stage can't wedge the whole gate) into
one SCALE_rN.json with unioned queries/failed/transitions."""
import json, sys

out = sys.argv[1]
parts = [json.load(open(p)) for p in sys.argv[2:]]
doc = dict(parts[0])
doc["queries"] = {}
doc["failed"] = []
doc["transitions"] = []
for p in parts:
    doc["queries"].update(p["queries"])
    doc["failed"] += [f for f in p.get("failed", []) if f not in doc["failed"]]
    doc["transitions"] += [t for t in p.get("transitions", [])
                           if t not in doc["transitions"]]
doc["failed"].sort()
doc["transitions"].sort()
json.dump(doc, open(out, "w"), sort_keys=True)
n = len(doc["queries"])
lin = sum(1 for q in doc["queries"].values() if q.get("linear"))
print(f"{out}: {n} rows, {lin} linear, failed={doc['failed']}, "
      f"transitions={doc['transitions']}")
sys.exit(1 if doc["failed"] else 0)
