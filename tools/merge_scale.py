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
# A crashed chunk ("complete": false from ScaleProbe's finally-writer)
# must poison the MERGED artifact too: rows the dead section never
# measured are absent from "queries", so the recomputed "failed" below
# cannot surface them — without this flag a merged artifact could read
# as complete and passing while whole sections never ran.
doc["complete"] = all(p.get("complete", True) for p in parts)
for p in parts:
    doc["queries"].update(p["queries"])
    doc["transitions"] += [t for t in p.get("transitions", [])
                           if t not in doc["transitions"]]
# A transition exemption is only honored when its CLEARING deeper-decade
# row survived the merge and is linear: a later part may have re-measured
# the row itself (superseding the queries entry) without re-proving the
# deeper decade, and an earlier part's stale transition must not exempt
# the re-measured row from the recomputed "failed".
DEEPER = {"decade:": "decade3:", "skew3:": "skew4:"}
def clearing_row(t):
    for pfx, deeper in DEEPER.items():
        if t.startswith(pfx):
            return t.replace(pfx, deeper, 1)
    return None
stale = [t for t in doc["transitions"]
         if not (clearing_row(t) and
                 doc["queries"].get(clearing_row(t), {}).get("linear"))]
if stale:
    print(f"WARNING: dropping transitions without a linear clearing row "
          f"in the merged artifact: {sorted(stale)}", file=sys.stderr)
    doc["transitions"] = [t for t in doc["transitions"] if t not in stale]
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
print(f"{out}: {n} rows, {lin} linear, complete={doc['complete']}, "
      f"failed={doc['failed']}, transitions={doc['transitions']}")
if not doc["complete"]:
    print("ERROR: at least one merged part is incomplete (crashed "
          "mid-run) — sections it never measured are missing entirely",
          file=sys.stderr)
sys.exit(1 if doc["failed"] or not doc["complete"] else 0)
