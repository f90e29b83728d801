"""End-to-end pipeline gates: P/R vs golden fixture, invariants, resume."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from kgpipe import extract, oracle, pipeline, schemas


@pytest.fixture(scope="module")
def final_triples(spark, transcripts_df, entity_dict_df, tmp_path_factory):
    wd = str(tmp_path_factory.mktemp("pipe"))
    out = pipeline.run_simple(
        spark, transcripts_df, entity_dict_df, wd, input_fingerprint="fix120"
    )
    return out.toPandas()


def test_pr_gate(final_triples, corpus):
    p, r = oracle.precision_recall(final_triples, corpus.expected_triples)
    assert p >= 0.95 and r >= 0.95  # BASELINE.json gate
    assert p == 1.0 and r == 1.0  # and in fact exact on the fixture


def test_spark_matches_pandas_oracle(final_triples, corpus):
    want = oracle.run_pipeline(corpus.transcripts, corpus.entity_dict)
    cols = ["subj", "pred", "obj", "conv_id", "turn_idx", "rule_id"]
    got_set = set(map(tuple, final_triples[cols].drop_duplicates().itertuples(index=False)))
    want_set = set(map(tuple, want[cols].drop_duplicates().itertuples(index=False)))
    assert got_set == want_set


def test_text_equality_invariant(spark, corpus, transcripts_df):
    """Per-turn text equality under stable ordering (BASELINE.json input_hint):
    `text` survives Stage A + Arrow round-trip byte-for-byte."""
    a = extract.with_turn_order(transcripts_df.repartition(8, "conv_id"))
    got = (
        a.select("conv_id", "turn_idx", "text")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = (
        corpus.transcripts[["conv_id", "turn_idx", "text"]]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_order_permutation_invariance(spark, corpus, entity_dict_df, tmp_path, final_triples):
    """Shuffling input row order leaves the emitted triple SET identical."""
    shuffled = corpus.transcripts.sample(frac=1.0, random_state=999).reset_index(drop=True)
    sdf = spark.createDataFrame(shuffled, schema=schemas.TRANSCRIPTS)
    out = pipeline.run_simple(
        spark, sdf, entity_dict_df, str(tmp_path / "perm"), input_fingerprint="perm"
    ).toPandas()
    cols = ["subj", "pred", "obj"]
    assert set(map(tuple, out[cols].itertuples(index=False))) == set(
        map(tuple, final_triples[cols].itertuples(index=False))
    )


def test_resume_idempotent(spark, transcripts_df, entity_dict_df, tmp_path, final_triples):
    """Kill after stage C, resume: final triples + lineage ids identical to
    an uninterrupted run; second resume publishes zero new rows."""
    wd = str(tmp_path / "resume")
    cfg = pipeline.PipelineConfig(work_dir=wd, input_fingerprint="fix120")
    p1 = pipeline.Pipeline(cfg)
    assert p1.run(spark, transcripts_df, entity_dict_df, stop_after="C") is None

    p2 = pipeline.Pipeline(cfg)
    out = p2.run(spark, transcripts_df, entity_dict_df, resume=True)
    stages = {m["stage"]: m for m in p2.metrics}
    assert stages["B_extract"]["skipped"] and stages["C_link"]["skipped"]
    got = out.toPandas()
    cols = ["subj", "pred", "obj", "conv_id", "turn_idx", "rule_id", "lineage_id"]
    assert set(map(tuple, got[cols].itertuples(index=False))) == set(
        map(tuple, final_triples[cols].itertuples(index=False))
    )

    # idempotent re-publish: a full re-run appends zero new rows — the
    # cumulative sink is byte-identical to the single-run result
    p3 = pipeline.Pipeline(cfg)
    again = p3.run(spark, transcripts_df, entity_dict_df, resume=False).toPandas()
    assert len(again) == len(final_triples)
    assert set(map(tuple, again[cols].itertuples(index=False))) == set(
        map(tuple, final_triples[cols].itertuples(index=False))
    )


def test_lineage_deterministic(final_triples):
    """lineage_id is a pure function of the triple row — recompute in pandas.
    128-bit truncated sha256 hex (see pipeline.lineage_col's byte-diet
    memoir): collision-safe at 10^12 triples, half the bytes of the full
    digest on the one incompressible column of the sink."""
    import hashlib

    row = final_triples.iloc[0]
    blob = "\x1f".join(
        [row.subj, row.pred, row.obj, row.conv_id, str(row.turn_idx), row.rule_id]
    )
    assert hashlib.sha256(blob.encode()).hexdigest()[:32] == row.lineage_id
    assert len(row.lineage_id) == 32


def test_partition_key_bounds(final_triples):
    assert final_triples.part_key.between(0, pipeline.N_TRIPLE_PARTS - 1).all()


def test_parallelism_invariance(spark, transcripts_df, entity_dict_df, tmp_path, final_triples):
    """North-rule invariant: the emitted triple set (including lineage ids
    and sink part keys) is IDENTICAL at any parallelism level — re-run the
    full pipeline with spark.sql.shuffle.partitions dropped from the
    session default to 3 and compare against the module fixture's run."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try:
        out = pipeline.run_simple(
            spark,
            transcripts_df.repartition(3),
            entity_dict_df,
            str(tmp_path / "par3"),
            input_fingerprint="par3",
        ).toPandas()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    cols = ["subj", "pred", "obj", "conv_id", "turn_idx", "rule_id", "lineage_id", "part_key"]
    a = set(map(tuple, out[cols].itertuples(index=False)))
    b = set(map(tuple, final_triples[cols].itertuples(index=False)))
    assert a == b


def test_salted_publish_matches_unsalted(
    spark, transcripts_df, entity_dict_df, tmp_path, final_triples, monkeypatch
):
    """Hot-bucket salting (KGPIPE_PUBLISH_SALT>1 / large-corpus default):
    identical triple set + lineage + part_key, and the salted dedup stays a
    single shuffle (the salt is a function of the full dedup key, so the
    aggregate's clustering requirement is met by the salted exchange)."""
    monkeypatch.setenv("KGPIPE_PUBLISH_SALT", "4")
    out = pipeline.run_simple(
        spark, transcripts_df, entity_dict_df, str(tmp_path / "salted"),
        input_fingerprint="salt4",
    )
    cols = [
        "subj", "pred", "obj", "conv_id", "turn_idx", "rule_id",
        "lineage_id", "part_key",
    ]
    got = out.toPandas()[cols].sort_values(cols).reset_index(drop=True)
    want = final_triples[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert "_salt" not in out.columns


def test_publish_salt_sizing():
    """Salt factor: data-volume-sized with floor 1 (unsalted small-corpus
    plan byte-identical to round 3) and the documented cap."""
    f = pipeline.publish_salt_factor
    assert f(None) == 1
    assert f(1_000_000) == 1
    assert f(pipeline.PUBLISH_SALT_ROWS) == 1
    assert f(pipeline.PUBLISH_SALT_ROWS + 1) == 2
    assert f(18_000_000) == 4   # ~16M-turn corpus
    assert f(74_000_000) == 15  # ~64M-turn corpus
    assert f(10**12) == pipeline.PUBLISH_MAX_SALT
    assert pipeline.publish_task_count(18_000_000, 128, 8) == 512
    assert pipeline.publish_task_count(None, 128, 8) == 128


def test_ingest_partition_sizing():
    """Stage-A partition count: data-sized above the session shuffle
    default, floor keeps <=16M-turn plans identical to round 3."""
    f = pipeline.ingest_partitions
    assert f(None, 16) == 16
    assert f(1_000_000, 16) == 16
    assert f(16_000_000, 16) == 16      # 16M/local[8]: unchanged
    assert f(16_000_000, 4) == 16       # 16M/local[2]: bounded task size
    assert f(64_000_000, 16) == 64
    assert f(64_000_000, 4) == 64       # same count at BOTH cluster sizes
    assert f(10**12, 64) == pipeline.INGEST_MAX_PARTS
