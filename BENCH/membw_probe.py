"""Hardware-scaling probe: does THIS box deliver linear per-core compute
and memory bandwidth from N to 4N pinned cores?

Motivation (round 4): the 16M ckpt 2->8 event-log profile
(BENCH/evtlog_16M_ckpt_2_8.json) shows total executor task time INFLATING
+23% (run 402 s -> 496 s) and task CPU +29% at the 4N level, with zero
spill, ~2 s driver gap, and GC under 2% — i.e. the pipeline's remaining
2->8 shortfall is inside-task work inflation, not an engine serial
bottleneck. This probe separates the two hardware hypotheses with plain
multiprocessing (no Spark, no JVM):

  cpu  — cache-resident regex matching (the extraction kernel's shape):
         per-core rate should be flat if vCPUs deliver linear compute;
  mem  — stride-64 reads + 512 MB copies over a 256 MB working set:
         per-core rate falls when the socket's memory channels saturate.

Measured on this sandbox (2026-08-18, idle box, taskset-pinned):

  cpu:  2 cores 1138/core, 8 cores 1123/core  -> -1.4%  (linear)
  mem:  2 cores 9.60/core, 8 cores 7.45/core  -> -22%   (saturating)

So bandwidth-bound phases (Arrow transfer, parquet encode/decode, shuffle,
string churn) pay a ~15-25% per-core tax at 8 pinned cores that no engine
change can remove: ONE VM's memory channels are a shared resource, while a
real 4N-executor cluster multiplies them with node count. The honest
sandbox stand-ins for N->4N executors are therefore (a) the 1->4 pair,
which stays below the saturation knee at both levels, with the 2->8 pair
disclosed alongside, and (b) the event-log inflation numbers that tie the
pipeline's measured gap to this probe's hardware ceiling.

Usage: python BENCH/membw_probe.py [--pairs 2,8 1,4] [--seconds 10]
Prints one JSON line; append-documented in BENCH/BASELINE.md §1b.
"""

from __future__ import annotations

import argparse
import json
import re
import subprocess
import sys
import time
from multiprocessing import Process, Queue

PAT = re.compile(r"(\w+) (works with|created|is a member of) ([\w ]+)")
TEXT = ["alice cooper works with bob dylan on quantum indexing." * 2 for _ in range(1000)]


def _cpu_worker(q: Queue, reps: int) -> None:
    t0 = time.time()
    acc = 0
    for _ in range(reps):
        for t in TEXT:
            m = PAT.search(t)
            if m:
                acc += len(m.group(1))
    q.put(time.time() - t0)


def _mem_worker(q: Queue, reps: int) -> None:
    import numpy as np

    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, size=256 * 1024 * 1024, dtype=np.uint8)
    t0 = time.time()
    acc = 0
    for _ in range(reps):
        acc += int(arr[::64].sum())  # one cache line touched per 64 B
        b = arr.copy()  # read + write 512 MB
        acc += int(b[0])
    q.put(time.time() - t0)


def _run(kind: str, n_procs: int, reps: int) -> float:
    """Mean per-process wall for `reps` units of work on n_procs processes.

    The caller pins the whole probe with taskset, mirroring run_scaling.py:
    this function only controls the process count."""
    worker = _cpu_worker if kind == "cpu" else _mem_worker
    q: Queue = Queue()
    ps = [Process(target=worker, args=(q, reps)) for _ in range(n_procs)]
    for p in ps:
        p.start()
    for p in ps:
        p.join()
    times = [q.get() for _ in ps]
    return sum(times) / len(times)


def measure_pair(n: int, n4: int, cpu_reps: int, mem_reps: int) -> dict:
    """Re-exec ourselves under taskset for each level (same pinning
    discipline as run_scaling.run_level)."""
    out: dict = {"pair": f"{n}v{n4}"}
    for kind, reps in (("cpu", cpu_reps), ("mem", mem_reps)):
        rates = {}
        for cores in (n, n4):
            r = subprocess.run(
                ["taskset", "-c", f"0-{cores - 1}", sys.executable, __file__,
                 "--child", kind, str(cores), str(reps)],
                capture_output=True, text=True, timeout=600,
            )
            rates[cores] = float(r.stdout.strip().splitlines()[-1])
        out[kind] = {
            f"per_core_rate_{n}": round(rates[n], 3),
            f"per_core_rate_{n4}": round(rates[n4], 3),
            "per_core_retention": round(rates[n4] / rates[n], 3),
        }
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", nargs=3, metavar=("KIND", "CORES", "REPS"))
    ap.add_argument("--pairs", nargs="*", default=["2,8", "1,4"])
    ap.add_argument("--cpu-reps", type=int, default=12000)
    ap.add_argument("--mem-reps", type=int, default=30)
    args = ap.parse_args()
    if args.child:
        kind, cores, reps = args.child[0], int(args.child[1]), int(args.child[2])
        mean = _run(kind, cores, reps)
        print(reps / mean)
        return 0
    res = []
    for pair in args.pairs:
        n, n4 = (int(x) for x in pair.split(","))
        res.append(measure_pair(n, n4, args.cpu_reps, args.mem_reps))
    print(json.dumps({"probe": "membw", "results": res}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
