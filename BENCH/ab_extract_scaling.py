"""Stage-B kernel A/B at two parallelism levels (round 5).

The round-5 HEAD re-measurement of the production ckpt 1->4 gate showed
Stage B (extraction) scaling at 0.65 while Stage E scaled at 0.90 — the
RE2 mapInArrow kernel is the fastest per-core extractor (§3c) but ships
every surviving text byte across the JVM->Python Arrow socket and back,
and on one box that traffic rides the same DRAM bus the other stages
saturate at 4N. This harness measures JUST Stage B (ckpt mode,
stop_after='B', so the stage really materializes) for both kernels
(KGPIPE_EXTRACT_KERNEL=arrow|jvm) at local[1] and local[4], taskset-
pinned, fresh JVM per cell, warm-up pass on a 1M corpus discarded.

Decision rule (BENCH/BASELINE.md §3e): the shipping default is the kernel
that is faster AT THE 4N LEVEL — the level that stands in for the real
cluster — provided it does not lose the small level by more than noise.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys, time, tempfile
sys.path.insert(0, {repo!r})
from kgpipe import pipeline, schemas
from kgpipe.session import get_spark

cores = {cores}
spark = get_spark(
    "abx", master=f"local[{{cores}}]", shuffle_partitions=2 * cores
)
spark.sparkContext.setLogLevel("ERROR")
walls = []
for trial, src in enumerate([{warm!r}] + [{corpus!r}] * {trials}):
    t = spark.read.schema(schemas.TRANSCRIPTS).parquet(src + "/transcripts.parquet")
    e = spark.read.schema(schemas.ENTITY_DICT).parquet(src + "/entity_dict.parquet")
    t0 = time.time()
    cfg = pipeline.PipelineConfig(
        work_dir=tempfile.mkdtemp(prefix=f"abx{{cores}}_{{trial}}_"),
        input_fingerprint=f"abx{{trial}}",
        checkpoints=True,
    )
    pipeline.Pipeline(cfg).run(spark, t, e, stop_after="B")
    walls.append(round(time.time() - t0, 2))
    import shutil
    shutil.rmtree(cfg.work_dir, ignore_errors=True)
print("RESULT " + json.dumps({{"cores": cores, "walls": walls,
                               "best": min(walls[1:])}}))
"""


def run_cell(cores: int, kernel: str, corpus: str, warm: str, trials: int) -> dict:
    code = CHILD.format(
        repo=REPO, cores=cores, corpus=corpus, warm=warm, trials=trials
    )
    env = dict(os.environ)
    env["KGPIPE_EXTRACT_KERNEL"] = kernel
    env["KGPIPE_DRIVER_MEM"] = f"{min(3 * cores, 48)}g"
    env["PYTHONPATH"] = REPO + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else ""
    )
    out = subprocess.run(
        ["taskset", "-c", f"0-{cores - 1}", sys.executable, "-c", code],
        capture_output=True, text=True, timeout=3600, env=env,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            r = json.loads(line[len("RESULT "):])
            r["kernel"] = kernel
            return r
    raise RuntimeError(f"no RESULT ({kernel}, {cores}):\n{out.stderr[-2000:]}")


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=16_000_000)
    ap.add_argument("--trials", type=int, default=1)
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    from bench import corpus_parquet

    corpus = corpus_parquet(max(200, args.turns // 70))
    warm = corpus_parquet(max(200, 1_000_000 // 70))

    cells = []
    # interleave kernels within each level so host drift hits both arms
    for cores in (1, 4):
        for kernel in ("arrow", "jvm"):
            r = run_cell(cores, kernel, corpus, warm, args.trials)
            print(json.dumps(r), flush=True)
            cells.append(r)

    by = {(c["cores"], c["kernel"]): c["best"] for c in cells}
    summary = {
        "turns": args.turns,
        "stageB_wall_s": {f"local{c}_{k}": by[(c, k)] for c, k in by},
        "scaling_1_to_4": {
            k: round(by[(1, k)] / by[(4, k)] / 4, 3) for k in ("arrow", "jvm")
        },
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
