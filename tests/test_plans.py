"""Physical-plan assertions: the optimizations we claim must be visible in
.explain — pushed filters, column pruning, broadcast joins, single-shuffle
final stage, no row-at-a-time Python anywhere (SURVEY.md §4)."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_scan_parquet_pushdown_and_pruning(spark):
    plan = plan_of(E.queries()["scan_parquet"](spark, SF))
    assert "PushedFilters: [" in plan and "GreaterThan(l_quantity" in plan
    assert (
        "ReadSchema: struct<l_orderkey:bigint,l_partkey:bigint,l_quantity:double>"
        in plan
    )


def test_link_join_is_broadcast(spark, entity_dict_df):
    from kgpipe import link

    surf = spark.createDataFrame([("ada lovelace",)], "subj_raw string").select(
        "subj_raw",
        F.lit("p").alias("pred"),
        F.lit("o").alias("obj_raw"),
        F.lit("R1").alias("rule_id"),
        F.lit("surface").alias("subj_kind"),
        F.lit("node").alias("obj_kind"),
    )
    assert "BroadcastHashJoin" in plan_of(link.stage_link(surf, entity_dict_df))


def test_join_broadcast_query_plan(spark):
    assert "BroadcastHashJoin" in plan_of(E.queries()["join_broadcast"](spark, SF))


def test_topk_no_global_sort(spark):
    assert "TakeOrderedAndProject" in plan_of(E.queries()["limit_topk_global"](spark, SF))


def test_stage_e_is_single_shuffle(spark):
    """Final dedup+partition: exactly ONE Exchange — the part_key
    repartition; the hash-aggregate dedup must ride it (part_key is in the
    grouping set, so hash(part_key) satisfies the clustering requirement),
    and there must be no sort in the dedup itself."""
    from kgpipe import pipeline

    canoned = spark.createDataFrame(
        [("s", "p", "o", "c", 0, "R1")],
        "subj string, pred string, obj string, conv_id string, turn_idx int, rule_id string",
    )
    with_key = canoned.withColumn(
        "part_key", pipeline.part_key_col("subj", 64)
    ).repartition(64, "part_key")
    triples = with_key.distinct()
    plan = plan_of(triples)
    assert plan.count("Exchange") == 1
    assert "HashAggregate" in plan
    assert "Sort" not in plan


def test_stage_a_single_shuffle_and_window_pruning(spark, transcripts_df):
    """Stage A: exactly ONE Exchange (the conv_id repartition; the dedup
    window rides it), and the declared turn-order window is pruned by
    Catalyst when turn_rank is not consumed (the extraction path)."""
    from kgpipe import pipeline

    a = pipeline.stage_ingest(transcripts_df)
    # extraction-path projection: turn_rank unused -> its window pruned,
    # only the dedup window remains
    plan = plan_of(a.select("conv_id", "turn_idx", "role", "text"))
    assert plan.count("Exchange") == 1
    assert plan.count("Window [") == 1  # dedup only; turn-order pruned
    # when turn_rank IS consumed, the second window comes back
    plan_rank = plan_of(a.select("conv_id", "turn_idx", "turn_rank"))
    assert plan_rank.count("Window [") == 2


def test_extraction_stage_no_shuffle_after_ordering(spark, transcripts_df, entity_dict_df):
    """Stage B is narrow: between the conv_id repartition and raw triples
    there must be no further Exchange (ordering windows + extraction are
    all pipelined in one stage)."""
    from kgpipe import extract, pipeline  # noqa: F401

    a = transcripts_df.repartition(8, "conv_id")
    a = extract.with_turn_order(a)
    raw = extract.stage_extract(a, entity_dict_df)
    assert plan_of(raw).count("Exchange") == 1  # only the explicit repartition


def test_no_row_udfs_in_engine():
    """Engine-wide ban (BASELINE.json: zero per-row Python on the hot
    path): no row-at-a-time F.udf / RDD usage anywhere in kgpipe."""
    import pathlib

    src_dir = pathlib.Path(__file__).resolve().parents[1] / "kgpipe"
    offenders = [
        p.name
        for p in src_dir.glob("*.py")
        if "F.udf(" in p.read_text() or ".rdd." in p.read_text()
    ]
    assert not offenders, offenders
