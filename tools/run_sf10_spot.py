#!/usr/bin/env python3
"""Run the sf10 spot-bench: one query per local[32] JVM (fresh block
manager per query — a shared-JVM multi-query sweep accumulates tens of
GB of block-manager state on one host), SPARK_DRIVER_MEM=32g (1 GB/core;
the 8g default is sized for the sf0.1 bench). Collects each run's
one-line JSON into a bench_full-shaped map for tools/sf10_spot_report.py.

Usage:
  python3 tools/run_sf10_spot.py <sfDir> <out.json> <query> [query...]
"""
import json
import os
import subprocess
import sys


def main():
    sf_dir, out_path = sys.argv[1], sys.argv[2]
    queries = sys.argv[3:]
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_CPUS="32",
               SPARK_DRIVER_MEM="32g")
    qtimes, failed = {}, []
    ctl_pre, ctl_post, suspect = [], [], False
    for q in queries:
        print(f"== {q}", flush=True)
        p = subprocess.run(
            ["sbt", "-batch", f"runMain graft.Bench {q}"],
            env=env, capture_output=True, text=True, timeout=3600)
        line = next((l for l in reversed(p.stdout.splitlines())
                     if l.startswith('{"metric"')), None)
        if line is None:
            print(p.stdout[-2000:], file=sys.stderr)
            failed.append(q)
            continue
        d = json.loads(line)
        if d.get("failed"):
            failed.append(q)
        else:
            qtimes[q] = d["queries"][q]
        ctl_pre.append(d.get("control_pre_sec"))
        ctl_post.append(d.get("control_post_sec"))
        suspect = suspect or d.get("load_suspect", False)
        print(f"   {q}: {qtimes.get(q)}s  (ctl {d.get('control_pre_sec')}/"
              f"{d.get('control_post_sec')} suspect={d.get('load_suspect')})",
              flush=True)
    out = {
        "metric": "total", "value": round(sum(qtimes.values()), 3),
        "unit": "sec", "queries": qtimes, "failed": failed,
        "control_pre_sec": max([c for c in ctl_pre if c is not None],
                               default=None),
        "control_post_sec": max([c for c in ctl_post if c is not None],
                                default=None),
        "load_suspect": suspect, "sf": sf_dir,
        "per_query_jvm": True,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(f"wrote {out_path}: {len(qtimes)} ok, failed={failed}")


if __name__ == "__main__":
    main()
