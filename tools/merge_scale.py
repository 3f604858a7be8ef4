#!/usr/bin/env python3
"""Merge chunked ScaleProbe artifacts (standard | decade+store, run in
separate JVMs so an AQE zombie stage can't wedge the whole gate) into
one SCALE_rN.json with unioned queries/failed/transitions."""
import json, sys

out = sys.argv[1]
parts = [json.load(open(p)) for p in sys.argv[2:]]
doc = dict(parts[0])
doc["queries"] = {}
doc["transitions"] = []
for p in parts:
    doc["queries"].update(p["queries"])
    doc["transitions"] += [t for t in p.get("transitions", [])
                           if t not in doc["transitions"]]
# "failed" is recomputed from the MERGED rows' own linear flags, not
# unioned across parts: a later part's re-measure of the same row (e.g. a
# targeted re-run after a probe fix) supersedes the earlier row entirely,
# and the pass/fail verdict must follow the row that survived the merge.
# A failure can therefore never be hidden by omission — a row that only
# ever measured super-linear is still present with linear=false. Rows in
# "transitions" are exempt: the probe itself cleared them by proving
# proportionality one decade deeper (their own row keeps linear=false by
# design — the excess at that decade was real, just not a complexity
# class), and the deeper row is present and gated in the same artifact.
doc["failed"] = sorted(name for name, q in doc["queries"].items()
                       if not q.get("linear") and name not in doc["transitions"])
doc["transitions"].sort()
json.dump(doc, open(out, "w"), sort_keys=True)
n = len(doc["queries"])
lin = sum(1 for q in doc["queries"].values() if q.get("linear"))
print(f"{out}: {n} rows, {lin} linear, failed={doc['failed']}, "
      f"transitions={doc['transitions']}")
sys.exit(1 if doc["failed"] else 0)
