#!/usr/bin/env python3
"""Cut a bench_full.json (or any artifact with a `queries` map) down to a
query subset — produces the sf0.1/sf1 legs for tools/sf10_spot_report.py
from the round's full-sweep artifacts, so the spot report's lower decades
reuse the committed median-of-3 records instead of paying a separate
per-query-JVM campaign at scales where in-JVM sweeps are the protocol.

Usage: filter_bench_subset.py <in.json> <out.json> <query> [query...]
"""
import json
import sys


def main():
    src, dst = sys.argv[1], sys.argv[2]
    subset = sys.argv[3:]
    with open(src) as f:
        d = json.load(f)
    qs = d["queries"]
    missing = [q for q in subset if q not in qs]
    if missing:
        sys.exit(f"{src}: missing queries {missing}")
    # no `sweeps` passthrough: the source's per-sweep maps cover ALL its
    # queries, so copying them next to a subset-only `value` makes one
    # artifact contradict itself (r14 advisory) — `source_artifact` is
    # the provenance pointer to the full sweeps instead
    out = {
        "metric": d.get("metric", "total"),
        "unit": "sec",
        "queries": {q: qs[q] for q in sorted(subset)},
        "sf": d.get("sf"),
        "source_artifact": src,
        "load_suspect": d.get("load_suspect"),
    }
    out["value"] = round(sum(out["queries"].values()), 3)
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(f"wrote {dst}: {len(subset)} queries, total {out['value']}s")


if __name__ == "__main__":
    main()
