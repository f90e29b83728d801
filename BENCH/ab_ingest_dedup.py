"""A/B the round-4 adaptive Stage-A dedup (kgpipe/pipeline.py memoir).

Arms (same corpus, same level, fresh taskset-pinned JVM per arm via
BENCH/run_scaling.run_level, interleaved to cancel slow host drift):
  auto   — detection job + shuffle-free clean path (new default)
  always — the pre-round-4 full repartition(conv_id) + window plan

Usage: python BENCH/ab_ingest_dedup.py [--turns 16000000] [--cores 8]
       [--trials 2] [--mode fused] [--rounds 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from run_scaling import run_level  # noqa: E402  (same dir)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=16_000_000)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--trials", type=int, default=1)
    ap.add_argument("--rounds", type=int, default=2, help="interleaved A/B rounds")
    ap.add_argument("--mode", choices=["fused", "ckpt"], default="fused")
    ap.add_argument("--warm-turns", type=int, default=1_000_000)
    args = ap.parse_args()

    from bench import corpus_parquet

    corpus = corpus_parquet(max(200, args.turns // 70))
    warm = corpus_parquet(max(200, args.warm_turns // 70))
    ck = args.mode == "ckpt"

    results: dict[str, list] = {"auto": [], "always": []}
    for rnd in range(args.rounds):
        for arm in ("auto", "always"):
            os.environ["KGPIPE_INGEST_DEDUP"] = arm
            r = run_level(args.cores, corpus, args.trials, ck, "flat", warm)
            results[arm].append(r)
            print(
                f"round {rnd} arm {arm}: wall {r['wall_s']}s "
                f"stage_ms {r['stage_ms']}",
                flush=True,
            )
    os.environ.pop("KGPIPE_INGEST_DEDUP", None)
    summary = {
        "turns": args.turns,
        "cores": args.cores,
        "mode": args.mode,
        "walls": {a: [r["wall_s"] for r in rs] for a, rs in results.items()},
        "best": {a: min(r["wall_s"] for r in rs) for a, rs in results.items()},
        "stage_ms_best": {
            a: min(rs, key=lambda r: r["wall_s"])["stage_ms"]
            for a, rs in results.items()
        },
    }
    print("SUMMARY " + json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
