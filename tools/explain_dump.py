"""Dump annotated physical plans for representative queries -> PLANS.md.

The scale claims in README/DEPLOY must be visible in the executed plans:
pushed filters, pruned read schemas, broadcast joins, single-shuffle
stages, whole-stage codegen, TakeOrderedAndProject for top-k. This tool
captures `.explain("formatted")` output per query and checks the expected
physical markers, so plan regressions show up in review diffs.

Usage: python tools/explain_dump.py > PLANS.md
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

SF = "/root/testdata/sf0.001"

# query -> (markers that MUST appear, one-line rationale)
EXPECTATIONS: dict[str, tuple[list[str], str]] = {
    "scan_parquet": (
        ["PushedFilters: [", "*(1)"],
        "filter + projection reach the parquet reader; `*(n)` = the stage "
        "is whole-stage-codegen compiled",
    ),
    "join_broadcast": (
        ["BroadcastHashJoin"],
        "dimension side explicitly broadcast — no shuffle of the fact table",
    ),
    "join_salted_skew": (
        ["BroadcastHashJoin", "xxhash64"],
        "salt = pmod(xxhash64(key), K) fans hot keys; dim exploded over salts",
    ),
    "limit_topk_global": (
        ["TakeOrderedAndProject"],
        "global top-k without a global sort",
    ),
    "agg_hash": (
        ["HashAggregate", "partial_"],
        "partial (map-side) + final aggregate — combine before shuffle",
    ),
    "agg_salted_twophase": (
        ["HashAggregate"],
        "two explicit phases: (key,salt) pre-agg then key merge",
    ),
    "win_topk_cand": (
        ["WindowGroupLimit", "Window"],
        "per-group top-k: Spark pushes a PARTIAL group-limit below the "
        "shuffle, so only ~k rows per group per task shuffle at all",
    ),
    "dedup_exact": (
        ["HashAggregate", "*(1)"],
        "hash groupBy on normalized text key — exact dedup in one shuffle, "
        "codegen-compiled",
    ),
    "udf_triple_extract": (
        ["MapInArrow", "!MapInPandas", "Filter"],
        "JVM anchor prefilter BEFORE the single mapInArrow pass (rows that "
        "cannot match any rule never reach the kernel); the kernel is "
        "pure pyarrow.compute/RE2 — no Arrow->pandas conversion "
        "(BENCH/BASELINE.md §3c: 4.04x over the mapInPandas path)",
    ),
    "ann_bruteforce_blas_topk": (
        ["MapInPandas", "Window"],
        "per-batch BLAS top-k in Python, global merge via window — the "
        "shuffle carries batches*queries*k rows, not the corpus",
    ),
    # markers prefixed '!' must be ABSENT from the executed plan
    "join_range_asof": (
        ["RangeFrame", "!Join"],
        "interval count as a RANGE window over unix_micros(ts): one shuffle "
        "+ one sort, ZERO joins — the r1 self-join generated "
        "O(per-user-rows^2) candidates before the interval filter",
    ),
    "dedup_embedding_cosine": (
        ["FlatMapGroupsInPandas", "!BroadcastNestedLoopJoin", "!CartesianProduct"],
        "blocked-BLAS exhaustive similarity self-join: triangle block-pair "
        "groups + one matmul per group — no nested-loop join anywhere",
    ),
    "ann_lsh_topk": (
        ["MapInPandas", "BroadcastHashJoin", "!BroadcastNestedLoopJoin"],
        "multi-table sign-LSH: bucket keys from one Arrow batch pass, "
        "candidates via (tbl, bucket) equi-join — never a corpus scan per "
        "query",
    ),
}


def _cc_loop_plan(spark):
    """cc_iterate with the iterative-join loop path FORCED (driver fast
    path disabled), on a diameter-16 chain — the plan test
    (tests/test_plans.py::test_cc_iterative_plan_stays_constant) pins that
    this plan has the SAME line count as the 2-round case; this dump shows
    what that O(1) plan is: a lineage-truncated checkpoint scan, no nested
    join DAG."""
    from kgpipe import canon

    saved = canon.DRIVER_CC_MAX_EDGES
    canon.DRIVER_CC_MAX_EDGES = 0
    try:
        edges = [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(16)]
        return canon.connected_components(
            spark.createDataFrame(edges, "a string, b string")
        )
    finally:
        canon.DRIVER_CC_MAX_EDGES = saved


def _curate_gate_plan(spark):
    """corpus_curation's lang+quality gate: per-row projections inline on
    ONE parquet scan (asserted: single scan node, zero Exchange, codegen
    span) — the join-back formulation would scan three times and shuffle
    twice for the same rows."""
    from kgpipe import curate

    return curate.gate(spark, SF)


# name -> (builder, markers, why): plans whose interesting shape needs a
# constructed input (loop path forced, sub-stage isolated) instead of the
# registry entry at sf0.001
SPECIAL: dict = {
    "cc_iterate (forced loop path, diameter 16)": (
        _cc_loop_plan,
        ["!Join", "Scan ExistingRDD"],
        "per-round localCheckpoint truncates lineage: the label frame's "
        "executed plan is a constant-size checkpoint scan no matter how "
        "many propagation rounds ran",
    ),
    "corpus_curation gate (lang+quality)": (
        _curate_gate_plan,
        ["Scan parquet", "!Exchange", "*(1)"],
        "single-scan inline gate — no join-back, no shuffle before dedup",
    ),
}


def main() -> int:
    import __spark_entry__ as E
    from kgpipe.session import get_spark

    spark = get_spark("plans", master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()

    print("# PLANS — annotated physical plans (auto-generated)")
    print()
    print("`python tools/explain_dump.py`; each section lists the physical")
    print("markers the design requires and the executed plan that proves")
    print("them, at sf0.001. A missing marker prints **MISSING** — treat as")
    print("a regression.")
    failures = []
    todo = [(n, qs[n], m, w) for n, (m, w) in EXPECTATIONS.items()] + [
        (n, b, m, w) for n, (b, m, w) in SPECIAL.items()
    ]
    for name, build, markers, why in todo:
        df = build(spark, SF) if name in EXPECTATIONS else build(spark)
        # execute first via the DataFrame's OWN query execution (collect —
        # a write wraps the plan in a separate execution and the original
        # AQE plan never finalizes): join strategy picks and codegen spans
        # only appear in the final plan
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        print(f"\n## {name}\n")
        print(f"_{why}_\n")
        for m in markers:
            if m.startswith("!"):
                ok = m[1:] not in plan
                label = "absent" if ok else "**PRESENT (must be absent)**"
            else:
                ok = m in plan
                label = "present" if ok else "**MISSING**"
            if not ok:
                failures.append((name, m))
            print(f"- `{m}`: {label}")
        print("\n```")
        # first 60 lines of the plan keep the file reviewable
        print("\n".join(plan.splitlines()[:60]))
        print("```")
    print()
    if failures:
        print(f"**{len(failures)} marker(s) missing: {failures}**")
        return 1
    print("**All expected physical markers present.**")
    return 0


if __name__ == "__main__":
    sys.exit(main())
