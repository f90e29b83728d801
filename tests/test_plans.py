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


def test_stage_a_clean_input_is_shuffle_free(spark, transcripts_df):
    """Stage A adaptive dedup, CLEAN path (the fixture corpus has no
    duplicate (conv_id, turn_idx)): the detection job finds nothing, so the
    extraction-path plan has ZERO Exchange and ZERO Window — the old
    full-width repartition+window (~300 B/turn across the shuffle) is gone
    and the turn-order window is pruned when turn_rank is not consumed."""
    from kgpipe import pipeline

    a = pipeline.stage_ingest(transcripts_df)
    plan = plan_of(a.select("conv_id", "turn_idx", "role", "text"))
    assert plan.count("Exchange") == 0
    assert plan.count("Window [") == 0
    # when turn_rank IS consumed, the turn-order window (and its shuffle)
    # come back — that path's consumers pay for what they use
    plan_rank = plan_of(a.select("conv_id", "turn_idx", "turn_rank"))
    assert plan_rank.count("Window [") == 1


def test_stage_a_forced_full_path_single_shuffle(spark, transcripts_df, monkeypatch):
    """KGPIPE_INGEST_DEDUP=always → the pre-round-4 plan: exactly ONE
    Exchange (the conv_id repartition; the dedup window rides it)."""
    from kgpipe import pipeline

    monkeypatch.setenv("KGPIPE_INGEST_DEDUP", "always")
    a = pipeline.stage_ingest(transcripts_df)
    plan = plan_of(a.select("conv_id", "turn_idx", "role", "text"))
    assert plan.count("Exchange") == 1
    assert plan.count("Window [") == 1  # dedup only; turn-order pruned
    plan_rank = plan_of(a.select("conv_id", "turn_idx", "turn_rank"))
    assert plan_rank.count("Window [") == 2


def test_stage_a_dirty_input_broadcast_repair(spark, transcripts_df):
    """Stage A adaptive dedup, REPAIR path: with a handful of duplicated
    turns the clean slice crosses NO shuffle (broadcast anti join against
    the flagged hashes); only the dirty slice is windowed, so the only
    hash-partitioning Exchange in the plan is the one under the tiny dirty
    subtree."""
    from kgpipe import pipeline

    dups = transcripts_df.limit(3).withColumn("ts", F.expr("ts + interval 1 hour"))
    dirty_input = transcripts_df.unionByName(dups)
    a = pipeline.stage_ingest(dirty_input)
    plan = plan_of(a.select("conv_id", "turn_idx", "role", "text"))
    assert "BroadcastHashJoin" in plan  # flagged-hash split, both sides
    assert plan.count("Exchange hashpartitioning") == 1  # dirty window only
    assert plan.count("Window [") == 1


def test_extraction_stage_no_shuffle_after_ordering(spark, transcripts_df, entity_dict_df):
    """Stage B is narrow: between the conv_id repartition and raw triples
    there must be no further Exchange (ordering windows + extraction are
    all pipelined in one stage)."""
    from kgpipe import extract, pipeline  # noqa: F401

    a = transcripts_df.repartition(8, "conv_id")
    a = extract.with_turn_order(a)
    raw = extract.stage_extract(a, entity_dict_df)
    assert plan_of(raw).count("Exchange") == 1  # only the explicit repartition


def test_extraction_kernel_is_map_in_arrow(spark, transcripts_df, entity_dict_df):
    """The extraction hot path is mapInArrow (pure-Arrow RE2 kernel,
    kgpipe/rules.py extract_triples_arrow) — NOT mapInPandas. Pinned so the
    auto-generated PLANS.md can't silently drift from the shipping plan
    node again (r4 verdict 'what's wrong #3'): the physical node must be
    MapInArrow/ArrowEvalPython-free of a pandas conversion, i.e. the plan
    names MapInArrow and never MapInPandas."""
    from kgpipe import extract

    a = extract.with_turn_order(transcripts_df.repartition(4, "conv_id"))
    raw = extract.stage_extract(a, entity_dict_df)
    plan = plan_of(raw)
    assert "MapInArrow" in plan, plan
    assert "MapInPandas" not in plan, plan


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


def test_cc_iterative_plan_stays_constant(spark, monkeypatch):
    """cc_iterate at scale: localCheckpoint truncates lineage every round,
    so the executed plan of the label frame is the SAME small checkpoint
    scan regardless of how many propagation rounds ran — without it, each
    round would nest the previous round's join/agg DAG and the plan (and
    Catalyst analysis time) would grow linearly with graph diameter."""
    from kgpipe import canon

    monkeypatch.setattr(canon, "DRIVER_CC_MAX_EDGES", 0)  # force loop path

    def chain(n):
        edges = [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(n)]
        return spark.createDataFrame(edges, "a string, b string")

    # diameter 2 -> converges in ~2 rounds; diameter 16 -> ~5+ rounds
    short = canon.connected_components(chain(2))
    long = canon.connected_components(chain(16))
    assert set(r["component"] for r in long.collect()) == {"n000"}
    p_short, p_long = plan_of(short), plan_of(long)
    assert len(p_long.splitlines()) == len(p_short.splitlines())
    # and the result really is a lineage-truncated scan, not the join DAG
    assert "Join" not in p_long and "Scan ExistingRDD" in p_long


def test_corpus_curation_gate_is_single_scan(spark):
    """The curation gate (lang-ID + quality filters) must ride ONE parquet
    scan as inline projections: no Exchange, no second scan, one
    whole-stage-codegen span. The alternative formulation — running the
    lang and quality queries separately and joining their outputs back —
    costs three scans and two doc_id shuffles at 100 TB for the same
    rows."""
    from kgpipe import curate

    plan = plan_of(curate.gate(spark, SF))
    assert plan.count("Scan parquet") == 1, plan
    assert "Exchange" not in plan
    assert "*(1)" in plan  # the gate is codegen-compiled
