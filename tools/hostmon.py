"""Host contention sampler — the tool behind probes/host_drift_r16/.

Samples /proc/stat every INTERVAL seconds (default 10) and prints one
JSON line per tick: busy_pct (non-idle, non-iowait), steal_pct
(hypervisor steal — the r16 sf0.1 adjudication signal), iowait_pct,
load1. Run it beside any bench that needs its own host adjudication:

    python3 tools/hostmon.py [interval_sec] > /tmp/hostlog.jsonl &

cpu_window() is also imported by run_sf10_spot.py to stamp a per-sample
steal_pct into spot artifacts, so every future bench record carries the
host evidence inline instead of requiring a separate sampler run.
"""
import json
import sys
import time


def read_cpu():
    with open("/proc/stat") as f:
        return list(map(int, f.readline().split()[1:]))


def cpu_window(prev, cur):
    """Percentages over the window between two read_cpu() snapshots.

    /proc/stat fields: user nice system idle iowait irq softirq steal.
    """
    d = [c - p for c, p in zip(cur, prev)]
    tot = sum(d) or 1
    return {
        "busy_pct": round(100 * (1 - (d[3] + d[4]) / tot), 1),
        "steal_pct": round(100 * d[7] / tot, 2),
        "iowait_pct": round(100 * d[4] / tot, 2),
    }


def main():
    interval = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
    prev = read_cpu()
    while True:
        time.sleep(interval)
        cur = read_cpu()
        la = open("/proc/loadavg").read().split()[:3]
        rec = {"t": int(time.time()), "load1": float(la[0])}
        rec.update(cpu_window(prev, cur))
        print(json.dumps(rec), flush=True)
        prev = cur


if __name__ == "__main__":
    main()
