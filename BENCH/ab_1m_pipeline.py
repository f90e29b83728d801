"""Interleaved A/B of the 1M-turn pipeline fixed-overhead suspects.

Round-4 verdict ("what's wrong #4"): kg_pipeline_fused regressed 5.71 s
(r2) -> 8.4-8.9 s (r4, three independent measurements) at bench.py's
1M/local[32] point; e2e 7.63 -> 9.2-10.2 s. Suspects, in verdict order:
  1. the unconditional 128-task Stage-E count (KGPIPE_PUBLISH_TASKS knob),
  2. the adaptive-dedup detection job (KGPIPE_INGEST_DEDUP=auto vs always
     [the r2 full-window plan] vs skip [detection-cost lower bound — NOT a
     legal production plan, diagnostic only]),
  3. the D_cc_labels side-write (now gated off in fused mode in code —
     this harness runs on HEAD, so fused variants already exclude it).

Protocol: one warmed local[32] session (bench.py's exact config), the
bench corpus (1M turns), N interleaved trials per variant (round-robin so
host drift hits all variants equally), min + all trials reported. Fused
mode unless --mode ckpt.

Usage: python BENCH/ab_1m_pipeline.py [--trials 3] [--mode fused|ckpt|both]
Writes BENCH/ab_1m_pipeline.md (or appends a section per mode).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # repo-root bench harness: corpus + run_kg_pipeline

VARIANTS = [
    # (tag, env overrides)
    ("head_default", {}),
    ("dedup_always_r2plan", {"KGPIPE_INGEST_DEDUP": "always"}),
    ("dedup_skip_diag", {"KGPIPE_INGEST_DEDUP": "skip"}),
    ("tasks_64", {"KGPIPE_PUBLISH_TASKS": "64"}),
    ("tasks_32", {"KGPIPE_PUBLISH_TASKS": "32"}),
    ("r2_combo_always_64", {"KGPIPE_INGEST_DEDUP": "always", "KGPIPE_PUBLISH_TASKS": "64"}),
]

KNOBS = ["KGPIPE_INGEST_DEDUP", "KGPIPE_PUBLISH_TASKS"]


def run_mode(spark, corpus_dir: str, mode: str, trials: int) -> dict:
    ckpt = mode == "ckpt"
    walls: dict[str, list[float]] = {t: [] for t, _ in VARIANTS}
    for trial in range(trials):
        for tag, env in VARIANTS:
            for k in KNOBS:
                os.environ.pop(k, None)
            os.environ.update(env)
            spark.catalog.clearCache()
            w, n = bench.run_kg_pipeline(
                spark, corpus_dir, f"ab1m_{mode}_{tag}_{trial}", checkpoints=ckpt
            )
            walls[tag].append(round(w, 3))
            print(f"[{mode} t{trial}] {tag}: {w:.3f} s ({n} triples)", flush=True)
    for k in KNOBS:
        os.environ.pop(k, None)
    return walls


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--mode", default="fused", choices=["fused", "ckpt", "both"])
    args = ap.parse_args()

    from kgpipe.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    spark = get_spark("ab-1m", master=f"local[{cpus}]", shuffle_partitions=2 * cpus)
    spark.sparkContext.setLogLevel("ERROR")

    corpus = bench.corpus_parquet(max(200, 1_000_000 // 70))
    # warm-up: JIT/codegen/Python workers, excluded from timing
    bench.run_kg_pipeline(spark, bench.corpus_parquet(800), "ab1m_warm")

    modes = ["fused", "ckpt"] if args.mode == "both" else [args.mode]
    out: dict[str, dict] = {}
    for m in modes:
        out[m] = run_mode(spark, corpus, m, args.trials)

    lines = ["# 1M-turn pipeline fixed-overhead A/B (round 5)", ""]
    lines.append(f"corpus=1M turns, local[{cpus}], trials={args.trials}, interleaved round-robin.")
    lines.append("")
    for m, walls in out.items():
        lines.append(f"## mode={m}")
        lines.append("")
        lines.append("| variant | min (s) | trials (s) |")
        lines.append("| --- | --- | --- |")
        for tag, _ in VARIANTS:
            ts = walls[tag]
            lines.append(f"| {tag} | {min(ts):.3f} | {', '.join(f'{t:.3f}' for t in ts)} |")
        lines.append("")
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "ab_1m_pipeline.md")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps({m: {t: min(v) for t, v in w.items()} for m, w in out.items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
