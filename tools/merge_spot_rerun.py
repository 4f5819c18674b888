#!/usr/bin/env python3
"""Merge a quiet re-run of burst-hit queries into a spot artifact.

The spot protocol (tools/run_sf10_spot.py) runs each query in N fresh
JVMs; each JVM reports its own pre/post control scans and load_suspect
flag. One externally-loaded SAMPLE used to taint the whole artifact's
`load_suspect` (the runner ORs across samples), even when the kept
median comes from clean samples. The r13-precedented remedy is a
post-sweep re-run of ONLY the burst-hit queries on a quiet window with
everything retained: the tainted samples move (with their controls)
under `reruns`, the quiet samples become the record, and the artifact's
`load_suspect` is recomputed over KEPT samples only. Nothing is
discarded silently — every raw value and control stays in the artifact.

Per-sample controls are read from `samples_detail` when the runner
recorded them, else reconstructed from the runner's log lines
(`   <query>: <sec>s  (ctl <pre>/<post> suspect=<bool>)`).

Usage:
  python3 tools/merge_spot_rerun.py <base.json> <base.log> \
      <rerun.json> <rerun.log> <out.json> <query> [query...]
"""
import json
import re
import statistics
import sys

LINE = re.compile(
    r"^\s+(\S+): ([0-9.]+)s\s+\(ctl ([0-9.]+|None)/([0-9.]+|None) "
    r"suspect=(True|False)\)")


def parse_log(path):
    detail = {}
    with open(path) as f:
        for line in f:
            m = LINE.match(line)
            if m:
                q, sec, pre, post, susp = m.groups()
                detail.setdefault(q, []).append({
                    "sec": float(sec),
                    "control_pre_sec": None if pre == "None" else float(pre),
                    "control_post_sec": None if post == "None" else float(post),
                    "load_suspect": susp == "True"})
    return detail


def load(json_path, log_path):
    with open(json_path) as f:
        d = json.load(f)
    detail = d.get("samples_detail") or parse_log(log_path)
    return d, detail


def main():
    base_j, base_l, rerun_j, rerun_l, out_path = sys.argv[1:6]
    rerun_queries = sys.argv[6:]
    base, base_detail = load(base_j, base_l)
    rerun, rerun_detail = load(rerun_j, rerun_l)
    missing = [q for q in rerun_queries
               if q not in rerun.get("queries", {}) or q not in base_detail]
    if missing:
        sys.exit(f"rerun queries missing from inputs: {missing}")

    reruns = {}
    for q in rerun_queries:
        reruns[q] = {
            "reason": (
                "a sweep sample carried an elevated control (external "
                "load burst); query re-run post-sweep on a quiet window "
                "under the identical n>=3 fresh-JVM protocol — ALL raw "
                "samples and their controls retained here"),
            "discarded_samples": base_detail[q],
            "kept_samples": rerun_detail[q],
        }
        base["queries"][q] = rerun["queries"][q]
        base.setdefault("samples", {})[q] = rerun.get("samples", {}).get(
            q, [s["sec"] for s in rerun_detail[q]])
        base_detail[q] = rerun_detail[q]

    kept = [s for ss in base_detail.values() for s in ss]
    base["samples_detail"] = base_detail
    base["reruns"] = reruns
    base["load_suspect"] = any(s["load_suspect"] for s in kept)
    base["control_pre_sec"] = max(
        (s["control_pre_sec"] for s in kept
         if s["control_pre_sec"] is not None), default=None)
    base["control_post_sec"] = max(
        (s["control_post_sec"] for s in kept
         if s["control_post_sec"] is not None), default=None)
    base["value"] = round(sum(base["queries"].values()), 3)
    # sanity: every kept median must equal the median of its kept samples
    for q, ss in base_detail.items():
        med = round(statistics.median([s["sec"] for s in ss]), 3)
        if abs(med - base["queries"][q]) > 0.002:
            sys.exit(f"{q}: kept median {base['queries'][q]} != "
                     f"recomputed {med}")
    with open(out_path, "w") as f:
        json.dump(base, f, indent=1)
        f.write("\n")
    n_susp = sum(1 for s in kept if s["load_suspect"])
    print(f"wrote {out_path}: merged {rerun_queries}, "
          f"load_suspect={base['load_suspect']} "
          f"({n_susp}/{len(kept)} kept samples suspect)")


if __name__ == "__main__":
    main()
