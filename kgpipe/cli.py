"""CLI entry point — the spark-submit surface (BASELINE.json north_rule:
"run via spark-submit --py-files on a multi-executor cluster").

Usage (cluster):
  spark-submit --py-files kgpipe.zip -m kgpipe.cli run \
      --input /path/transcripts.parquet --dict /path/entity_dict.parquet \
      --work /path/workdir [--resume]

Usage (sandbox, local master picked from env/--master):
  python -m kgpipe.cli run --input ... --dict ... --work ...
  python -m kgpipe.cli synth --out /tmp/corpus --convs 400   # test corpus
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import functions as F  # noqa: F401  (re-exported for jobs)

from . import pipeline, schemas
from .session import get_spark


def cmd_synth(args: argparse.Namespace) -> int:
    from . import synth

    c = synth.generate(n_convs=args.convs)
    import os

    os.makedirs(args.out, exist_ok=True)
    c.transcripts.to_parquet(f"{args.out}/transcripts.parquet", index=False)
    c.entity_dict.to_parquet(f"{args.out}/entity_dict.parquet", index=False)
    c.expected_triples.to_parquet(f"{args.out}/expected_triples.parquet", index=False)
    print(
        json.dumps(
            {
                "turns": len(c.transcripts),
                "entities": len(c.entity_dict),
                "expected_triples": len(c.expected_triples),
                "out": args.out,
            }
        )
    )
    return 0


def cmd_run(args: argparse.Namespace) -> int:
    spark = get_spark("kgpipe-run", master=args.master)
    spark.sparkContext.setLogLevel("ERROR")
    transcripts = spark.read.schema(schemas.TRANSCRIPTS).parquet(args.input)
    entity_dict = spark.read.schema(schemas.ENTITY_DICT).parquet(args.dict)
    cfg = pipeline.PipelineConfig(
        work_dir=args.work, input_fingerprint=args.fingerprint or args.input
    )
    t0 = time.time()
    p = pipeline.Pipeline(cfg)
    out = p.run(spark, transcripts, entity_dict, resume=args.resume)
    n = out.count()
    distinct = out.select("subj", "pred", "obj").distinct().count()
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "triples": n,
                "distinct_triples": distinct,
                "wall_s": round(wall, 2),
                "triples_per_sec": round(n / wall, 1),
                "stages": p.metrics,
                "work": args.work,
            }
        )
    )
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="kgpipe")
    sub = ap.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("synth", help="generate a deterministic test corpus")
    s.add_argument("--out", required=True)
    s.add_argument("--convs", type=int, default=400)
    s.set_defaults(fn=cmd_synth)

    r = sub.add_parser("run", help="run the full Stage A..E pipeline")
    r.add_argument("--input", required=True, help="transcripts parquet path/table")
    r.add_argument("--dict", required=True, help="entity dictionary parquet path")
    r.add_argument("--work", required=True, help="work dir for checkpoints + sink")
    r.add_argument("--master", default=None)
    r.add_argument("--resume", action="store_true")
    r.add_argument("--fingerprint", default=None)
    r.set_defaults(fn=cmd_run)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
