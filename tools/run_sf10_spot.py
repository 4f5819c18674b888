#!/usr/bin/env python3
"""Run the sf10 spot-bench: one query per local[32] JVM (fresh block
manager per query — a shared-JVM multi-query sweep accumulates tens of
GB of block-manager state on one host), SPARK_DRIVER_MEM=32g (1 GB/core;
the 8g default is sized for the sf0.1 bench). Collects each run's
one-line JSON into a bench_full-shaped map for tools/sf10_spot_report.py.

Usage:
  python3 tools/run_sf10_spot.py <sfDir> <out.json> [--samples N] \
      [--driver-mem 48g] [--timeout SEC] <query> [query...]

--driver-mem / --timeout size the per-sample JVM heap (default 32g) and
per-sample wall limit (default 3600 s) — the sf30 probe runs 3x the
data of the protocol this tool was written for.

--samples N (default 1) runs each query in N FRESH JVMs and records the
per-sample values plus their median — the r12 verdict's n>=3 protocol
for long sf10 queries, whose single-sample spread measured 2.2x across
fresh JVMs. Each JVM runs one sweep (SPARK_GRAFT_SWEEPS=1): cross-JVM
medians already de-noise, and tripling inside the JVM on top would turn
a 130 s query into 20 minutes.
"""
import json
import os
import statistics
import subprocess
import sys

from hostmon import cpu_window, read_cpu

USAGE = ("usage: run_sf10_spot.py <sfDir> <out.json> [--samples N] "
         "[--driver-mem 48g] [--timeout SEC] <query> [query...]")


def main():
    if len(sys.argv) < 3:
        sys.exit(USAGE)
    sf_dir, out_path = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    samples = 1
    driver_mem = "32g"   # 1 GB/core, sized for sf10
    timeout = 3600
    while rest and rest[0].startswith("--"):
        if len(rest) < 2:
            sys.exit(USAGE)
        if rest[0] == "--samples":
            samples = int(rest[1])
        elif rest[0] == "--driver-mem":   # sf30 runs want more heap
            driver_mem = rest[1]
        elif rest[0] == "--timeout":      # per-sample, seconds
            timeout = int(rest[1])
        else:
            sys.exit(f"unknown flag {rest[0]}\n{USAGE}")
        rest = rest[2:]
    queries = rest
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_CPUS="32",
               SPARK_GRAFT_SWEEPS="1",
               SPARK_DRIVER_MEM=driver_mem)
    qtimes, failed, qsamples, partial = {}, [], {}, {}
    detail = {}
    ctl_pre, ctl_post, suspect = [], [], False
    for q in queries:
        vals = []
        q_failed = False
        for s in range(samples):
            print(f"== {q} [{s + 1}/{samples}]", flush=True)
            cpu0 = read_cpu()
            # fresh plain-java JVM via tools/java_run.sh — identical JVM
            # flags to sbt's forked run, minus ~30 s of sbt startup per
            # sample (pure harness overhead across dozens of launches);
            # requires a prior `sbt compile`.
            p = subprocess.run(
                [os.path.join(os.path.dirname(__file__), "java_run.sh"),
                 "graft.Bench", q],
                env=env, capture_output=True, text=True, timeout=timeout)
            line = next((l for l in reversed(p.stdout.splitlines())
                         if l.startswith('{"metric"')), None)
            if line is None:
                print(p.stdout[-2000:], file=sys.stderr)
                failed.append(q)
                q_failed = True
                break
            d = json.loads(line)
            if d.get("failed"):
                failed.append(q)
                q_failed = True
                break
            vals.append(d["queries"][q])
            ctl_pre.append(d.get("control_pre_sec"))
            ctl_post.append(d.get("control_post_sec"))
            suspect = suspect or d.get("load_suspect", False)
            # per-sample controls ship in the artifact so a single
            # burst-hit sample can be adjudicated (and re-run) without
            # reconstructing controls from the run log
            # per-sample host window (r16 verdict #5): steal%/iowait%
            # over the whole JVM lifetime, so the artifact carries its
            # own host adjudication — the /proc/stat evidence that
            # settled the r16 sf0.1 dispute, now inline
            host = cpu_window(cpu0, read_cpu())
            detail.setdefault(q, []).append({
                "sec": d["queries"][q],
                "control_pre_sec": d.get("control_pre_sec"),
                "control_post_sec": d.get("control_post_sec"),
                "load_suspect": d.get("load_suspect", False),
                "host_steal_pct": host["steal_pct"],
                "host_iowait_pct": host["iowait_pct"]})
            print(f"   {q}: {vals[-1]}s  (ctl {d.get('control_pre_sec')}/"
                  f"{d.get('control_post_sec')} "
                  f"suspect={d.get('load_suspect')} "
                  f"steal={host['steal_pct']}%)", flush=True)
        # `failed` and `queries` stay DISJOINT: when sample k>1 of a query
        # crashes, the earlier successful samples are evidence, not a
        # record — they ship under partial_samples and do NOT count into
        # the artifact's per-query map or total.
        if q_failed:
            if vals:
                partial[q] = vals
        elif vals:
            qtimes[q] = round(statistics.median(vals), 3)
            if samples > 1:
                qsamples[q] = vals
    out = {
        "metric": "total", "value": round(sum(qtimes.values()), 3),
        "unit": "sec", "queries": qtimes, "failed": failed,
        "control_pre_sec": max([c for c in ctl_pre if c is not None],
                               default=None),
        "control_post_sec": max([c for c in ctl_post if c is not None],
                                default=None),
        "load_suspect": suspect, "sf": sf_dir,
        "per_query_jvm": True,
        "samples_per_query": samples,
        "samples": qsamples,
        "samples_detail": detail,
        "partial_samples": partial,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(f"wrote {out_path}: {len(qtimes)} ok, failed={failed}")


if __name__ == "__main__":
    main()
