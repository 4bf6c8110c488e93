"""Host scaling-ceiling microbenchmarks — Spark-free evidence for why the
8→32-core legs of the scaling proxies cannot reach 0.8 on THIS host.

Two public-methodology probes, no Spark involved:

1. **Hypervisor steal** (`/proc/stat` field 8): a calibrated spin at
   width W for S seconds; steal/(W·S) is the fraction of the requested
   cycles the hypervisor gave to someone else.  A host that cannot
   deliver 32 idle vCPUs caps ANY 32-wide job below 32/8 = 4×.

2. **Memory bandwidth** (STREAM-triad, numpy `c = a + 2b`, arrays ≫ LLC,
   pre-touched, warmed): aggregate GB/s at widths 1/8/32 plus the
   per-core min/max.  Dedup is shuffle/hash/scan-heavy, i.e.
   bandwidth-bound; if the host's aggregate bandwidth grows < 4× from
   8→32 cores, 0.8 scaling efficiency is unreachable for this workload
   class REGARDLESS of the engine.

Appends a dated section to BENCH/BASELINE.md and prints one JSON line.

Usage:
    python tools/host_ceiling.py [--no-append]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SPIN_SECS = 15
TRIAD_SECS = 8
WIDTHS = (1, 8, 32)

_TRIAD_WORKER = """
import numpy as np, time
n = 20_000_000                      # 3 x 160 MB >> any LLC
a = np.ones(n); b = np.ones(n); c = np.empty(n); c[:] = 0.0   # pre-touch
c[:] = a + 2.0 * b                  # warmup rep
t0 = time.time(); reps = 0
while time.time() - t0 < %d:
    c[:] = a + 2.0 * b              # 24 bytes moved per element
    reps += 1
print(reps * n * 24 / (time.time() - t0) / 1e9)
""" % TRIAD_SECS


def _cpu_fields() -> dict[str, int]:
    with open("/proc/stat") as f:
        parts = f.readline().split()
    keys = ["user", "nice", "system", "idle", "iowait", "irq", "softirq", "steal"]
    return dict(zip(keys, map(int, parts[1:9])))


def steal_probe(width: int) -> dict:
    """Spin `width` pinned busy loops; report hypervisor steal fraction."""
    tick = os.sysconf("SC_CLK_TCK")
    s0, t0 = _cpu_fields(), time.time()
    procs = [
        subprocess.Popen(
            ["taskset", "-c", str(i), sys.executable, "-c",
             "import time\nt = time.time()\nx = 0\n"
             f"while time.time() - t < {SPIN_SECS}: x += 1"]
        )
        for i in range(width)
    ]
    for p in procs:
        p.wait()
    s1, wall = _cpu_fields(), time.time() - t0
    d = {k: (s1[k] - s0[k]) / tick for k in s0}
    busy = d["user"] + d["nice"] + d["system"]
    return {
        "width": width,
        "steal_frac_of_width": round(d["steal"] / (wall * width), 3),
        "busy_frac_of_width": round(busy / (wall * width), 3),
    }


def triad_probe(width: int) -> dict:
    """`width` pinned STREAM-triad workers; report aggregate + spread."""
    procs = [
        subprocess.Popen(
            ["taskset", "-c", str(i), sys.executable, "-c", _TRIAD_WORKER],
            stdout=subprocess.PIPE, text=True,
        )
        for i in range(width)
    ]
    per = [float(p.communicate()[0]) for p in procs]
    return {
        "width": width,
        "aggregate_GBps": round(sum(per), 1),
        "per_core_min_GBps": round(min(per), 2),
        "per_core_max_GBps": round(max(per), 2),
    }


def main() -> None:
    load0 = os.getloadavg()[0]
    steal = [steal_probe(w) for w in (8, 32)]
    triad = [triad_probe(w) for w in WIDTHS]
    bw8 = next(t["aggregate_GBps"] for t in triad if t["width"] == 8)
    bw32 = next(t["aggregate_GBps"] for t in triad if t["width"] == 32)
    out = {
        "load_before": round(load0, 2),
        "steal": steal,
        "triad": triad,
        "bw_speedup_8_to_32": round(bw32 / bw8, 2),
        "bw_speedup_ideal": 4.0,
    }
    print(json.dumps(out))

    if "--no-append" in sys.argv:
        return
    stamp = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(
            f"\n## Host scaling-ceiling probes {stamp} "
            f"(Spark-free, load at start {load0:.2f})\n\n"
            f"Hypervisor steal under a calibrated pinned spin "
            f"({SPIN_SECS}s/leg):\n\n"
            f"| width | steal (frac of requested cycles) | delivered |\n"
            f"|---|---|---|\n"
            + "".join(
                f"| {s['width']} | {s['steal_frac_of_width']} "
                f"| {s['busy_frac_of_width']} |\n" for s in steal
            )
            + f"\nSTREAM-triad aggregate bandwidth ({TRIAD_SECS}s/leg, "
            f"pre-touched 160 MB arrays):\n\n"
            f"| width | aggregate GB/s | per-core min | per-core max |\n"
            f"|---|---|---|---|\n"
            + "".join(
                f"| {t['width']} | {t['aggregate_GBps']} "
                f"| {t['per_core_min_GBps']} | {t['per_core_max_GBps']} |\n"
                for t in triad
            )
            + f"\nBandwidth speedup 8→32 cores: "
            f"**{bw32 / bw8:.2f}×** (ideal 4×).\n"
        )


if __name__ == "__main__":
    main()
