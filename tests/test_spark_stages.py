"""Per-stage Spark tests: extraction parity, linking, LSH+CC clustering."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from kgpipe import canon, extract, link, oracle, rules


def _triple_set(pdf: pd.DataFrame, cols=("subj_raw", "pred", "obj_raw")) -> set:
    return set(map(tuple, pdf[list(cols)].drop_duplicates().itertuples(index=False)))


def test_stage_extract_matches_oracle(spark, corpus, transcripts_df, entity_dict_df):
    got = extract.stage_extract(transcripts_df, entity_dict_df).toPandas()
    t = corpus.transcripts.copy()
    t["text_norm"] = rules.normalize_series(t["text"])
    want = rules.extract_triples_batch(t[["conv_id", "turn_idx", "role", "text_norm"]])
    assert _triple_set(got) == _triple_set(want)
    # full-row parity including provenance
    cols = ("conv_id", "turn_idx", "subj_raw", "pred", "obj_raw", "rule_id")
    assert _triple_set(got, cols) == _triple_set(want, cols)


def test_jvm_kernel_matches_pandas_kernel(spark, corpus, transcripts_df, entity_dict_df):
    """extract_triples_jvm (pure codegen rlike/regexp_extract) is
    MULTISET-identical to the pandas kernel — full row including kinds.
    Both engines must agree exactly or the KGPIPE_EXTRACT_KERNEL knob
    would silently change query results."""
    t = transcripts_df.withColumn(
        "text_norm", extract.normalize_text_col(F.col("text"))
    ).filter(extract.anchor_prefilter(F.col("text_norm")))
    got = extract.extract_triples_jvm(
        t.select("conv_id", "turn_idx", "role", "text_norm")
    ).toPandas()
    p = corpus.transcripts.copy()
    p["text_norm"] = rules.normalize_series(p["text"])
    want = rules.extract_triples_batch(
        p[["conv_id", "turn_idx", "role", "text_norm"]]
    )
    cols = [
        "conv_id", "turn_idx", "subj_raw", "pred", "obj_raw", "rule_id",
        "subj_kind", "obj_kind",
    ]
    got_m = sorted(map(tuple, got[cols].itertuples(index=False)))
    want_m = sorted(map(tuple, want[cols].itertuples(index=False)))
    assert got_m == want_m  # multiset, not set: duplicates must match too


def test_jvm_kernel_plan_is_codegen(spark, transcripts_df, entity_dict_df, monkeypatch):
    """With KGPIPE_EXTRACT_KERNEL=jvm, stage B has no Python node at all —
    no MapInArrow, no MapInPandas, no BatchEvalPython."""
    monkeypatch.setenv("KGPIPE_EXTRACT_KERNEL", "jvm")
    df = extract.stage_extract(transcripts_df, entity_dict_df)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for node in ("MapInArrow", "MapInPandas", "BatchEvalPython", "ArrowEval"):
        assert node not in plan, plan
    assert "Generate explode" in plan


def test_mentions_detected(spark, transcripts_df, entity_dict_df):
    t = transcripts_df.withColumn(
        "text_norm", extract.normalize_text_col(F.col("text"))
    )
    m = extract.detect_mentions(t, entity_dict_df)
    sample = (
        m.filter(F.col("text").contains("works with"))
        .select(F.size("mentions").alias("n"))
        .agg(F.min("n"))
        .collect()[0][0]
    )
    # every R1 turn embeds >= 2 dictionary aliases (b and c slots)
    assert sample >= 2


def test_link_exact_alias(spark, corpus, entity_dict_df):
    lm = oracle.link_map(corpus.entity_dict)
    surfaces = list(lm.items())[:50]
    df = spark.createDataFrame(
        [(s,) for s, _ in surfaces], "subj_raw string"
    ).select(
        "subj_raw",
        F.lit("p").alias("pred"),
        F.lit("o").alias("obj_raw"),
        F.lit("R1").alias("rule_id"),
        F.lit("surface").alias("subj_kind"),
        F.lit("node").alias("obj_kind"),
    )
    out = link.stage_link(df, entity_dict_df).toPandas().set_index("subj_raw")
    for s, eid in surfaces:
        assert out.loc[s, "subj_link"] == eid
    assert out["obj_link"].isna().all()  # node kind never links


def test_link_score_topk_deterministic(spark, entity_dict_df):
    surf = spark.createDataFrame([("ada lovelace",), ("ada lovelac",)], "surface string")
    out = link.score_candidates(surf, entity_dict_df, topk=1).toPandas()
    exact = out[out.surface == "ada lovelace"].iloc[0]
    assert exact.entity_id == "E000000" and exact.link_score >= 1.0
    typo = out[out.surface == "ada lovelac"].iloc[0]
    assert typo.entity_id == "E000000"  # 1-edit still wins via levenshtein


def test_candidate_pairs_and_cc_match_oracle(spark, corpus):
    nodes = list(corpus.expected_components.node)
    sdf = spark.createDataFrame([(n,) for n in nodes], "surface string")
    edges = canon.candidate_pairs(sdf)
    cc = canon.connected_components(edges).toPandas()
    rep = dict(zip(cc.node, cc.component))
    want = dict(zip(corpus.expected_components.node, corpus.expected_components.component))
    got = {n: rep.get(n, n) for n in nodes}
    assert got == want


def test_cc_random_graph_vs_unionfind(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    n = 80
    nodes = [f"n{i:03d}" for i in range(n)]
    edges = [
        (nodes[int(a)], nodes[int(b)])
        for a, b in rng.integers(0, n, size=(60, 2))
        if a != b
    ]
    uf = oracle.UnionFind()
    for a, b in edges:
        uf.union(a, b)
    want = {x: uf.find(x) for x in {v for e in edges for v in e}}
    edf = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges], "a string, b string"
    ).distinct()
    # driver union-find fast path
    cc = canon.connected_components(edf).toPandas()
    got = dict(zip(cc.node, cc.component))
    assert got == want
    # iterative-join at-scale path must produce identical labels
    import kgpipe.canon as canon_mod

    orig = canon_mod.DRIVER_CC_MAX_EDGES
    canon_mod.DRIVER_CC_MAX_EDGES = 0
    try:
        cc2 = canon.connected_components(edf).toPandas()
    finally:
        canon_mod.DRIVER_CC_MAX_EDGES = orig
    assert dict(zip(cc2.node, cc2.component)) == want
