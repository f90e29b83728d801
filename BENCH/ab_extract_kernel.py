"""A/B of the two triple-extraction kernels — the evidence behind the
mapInArrow swap (kgpipe/rules.py `extract_triples_arrow` memoir and
BENCH/BASELINE.md §3c).

Arms, both fed the SAME Arrow RecordBatches a Spark mapInArrow /
mapInPandas task would see (conv_id, turn_idx, role, text_norm):

  arrow  — extract_triples_arrow: pure pyarrow.compute (match_substring
           anchor gate + extract_regex captures, RE2 in C++) directly on
           the columnar buffers; output stays Arrow.
  pandas — the mapInPandas-equivalent path: RecordBatch -> pandas
           (Arrow->pandas conversion, exactly what Spark's mapInPandas
           does per batch), extract_triples_batch (Python `re` under
           pandas str ops), result -> Arrow (the return conversion).

Spark-free on purpose: this isolates kernel + conversion cost from
scheduling, shuffle and scan, so the ratio is the per-batch speedup a
worker core sees. Interleaved trials cancel host drift.

Usage: python BENCH/ab_extract_kernel.py [--turns 210000] [--batch-rows 8192]
       [--trials 3]
Writes per-trial walls + triple-count cross-check to stdout (JSON line);
prose summary goes to BENCH/BASELINE.md §3c.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def make_batches(turns: int, batch_rows: int):
    import pyarrow as pa

    from kgpipe import synth
    from kgpipe.rules import normalize_series

    n_convs = max(10, turns // 70)
    c = synth.generate(n_convs=n_convs)
    df = c.transcripts[["conv_id", "turn_idx", "role", "text"]].copy()
    df["text_norm"] = normalize_series(df["text"])
    df = df.drop(columns=["text"])
    tbl = pa.Table.from_pandas(df, preserve_index=False)
    return tbl.to_batches(max_chunksize=batch_rows)


def run_arrow(batches) -> tuple[float, int]:
    from kgpipe.rules import extract_triples_arrow

    t0 = time.time()
    n = 0
    for b in batches:
        out = extract_triples_arrow(b)
        if out is not None:
            n += out.num_rows
    return time.time() - t0, n


def run_pandas(batches) -> tuple[float, int]:
    import pyarrow as pa

    from kgpipe.rules import extract_triples_batch

    t0 = time.time()
    n = 0
    for b in batches:
        pdf = b.to_pandas()  # the mapInPandas input conversion
        out = extract_triples_batch(pdf)
        if len(out):
            back = pa.Table.from_pandas(out, preserve_index=False)  # return conversion
            n += back.num_rows
    return time.time() - t0, n


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=210_000)
    ap.add_argument("--batch-rows", type=int, default=8192)
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()

    batches = make_batches(args.turns, args.batch_rows)
    rows = sum(b.num_rows for b in batches)
    walls = {"arrow": [], "pandas": []}
    counts = {}
    # one untimed warm pass each (regex compile caches, import cost)
    run_arrow(batches[:2]), run_pandas(batches[:2])
    for _ in range(args.trials):
        w, n = run_arrow(batches)
        walls["arrow"].append(round(w, 3))
        counts["arrow"] = n
        w, n = run_pandas(batches)
        walls["pandas"].append(round(w, 3))
        counts["pandas"] = n
    assert counts["arrow"] == counts["pandas"], counts  # same triple multiset size
    best_a, best_p = min(walls["arrow"]), min(walls["pandas"])
    print(
        json.dumps(
            {
                "turns": rows,
                "batches": len(batches),
                "batch_rows": args.batch_rows,
                "triples": counts["arrow"],
                "walls_s": walls,
                "best_s": {"arrow": best_a, "pandas": best_p},
                "speedup_best": round(best_p / best_a, 2),
                "speedup_per_trial": [
                    round(p / a, 2) for a, p in zip(walls["arrow"], walls["pandas"])
                ],
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
