"""Edge-case robustness: exotic unicode through the Arrow boundary (the
per-turn text-equality invariant must survive NFC-unnormalized text,
astral-plane emoji, CJK, combining marks), empty inputs, and degenerate
conversations. SURVEY.md §7 lists Arrow round-trip text fidelity as a
hard part — these pin it."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from kgpipe import extract, pipeline, schemas


NASTY_TEXTS = [
    "ada lovelace works with charles babbage on engines.",  # rule hit (R1)
    "emoji \U0001f600\U0001f9ea spread ☃ snowman",
    "cjk 漢字カタカナ한글 mixed",
    "combining é́́ acute stack",
    "rtl العربية text",
    "zero​width‍joiners﻿",
    "tabs\tand\nnewlines\r\nand  double  spaces",
    "quote ' backslash \\ pipe | unit \x1f sep",
    "",  # empty string (filtered by ingest null/empty handling? kept: not null)
]


def _df_from_texts(spark, texts):
    rows = pd.DataFrame(
        {
            "conv_id": ["cX"] * len(texts),
            "turn_idx": pd.array(range(len(texts)), dtype="int32"),
            "role": ["user"] * len(texts),
            "text": texts,
            "tool": [""] * len(texts),
            "ts": pd.to_datetime(["2026-01-01"] * len(texts)).astype("datetime64[us]"),
        }
    )
    return spark.createDataFrame(rows, schema=schemas.TRANSCRIPTS)


def test_unicode_text_survives_arrow_roundtrip(spark):
    df = _df_from_texts(spark, NASTY_TEXTS)
    back = (
        extract.with_turn_order(df.repartition(4, "conv_id"))
        .orderBy("turn_idx")
        .select("text")
        .toPandas()["text"]
        .tolist()
    )
    assert back == NASTY_TEXTS  # byte-exact per-turn text equality


def test_extraction_on_nasty_text_is_clean(spark, entity_dict_df, tmp_path):
    df = _df_from_texts(spark, NASTY_TEXTS)
    out = pipeline.run_simple(
        spark, df, entity_dict_df, str(tmp_path / "w"), input_fingerprint="nasty"
    ).toPandas()
    # only the R1 turn produces triples; nothing crashes on the rest
    assert set(out["conv_id"]) == {"cX"}
    assert set(out["pred"]) == {"works_with", "works_on"}
    assert len(out) == 2


def test_empty_corpus_full_pipeline(spark, entity_dict_df, tmp_path):
    empty = spark.createDataFrame([], schema=schemas.TRANSCRIPTS)
    out = pipeline.run_simple(
        spark, empty, entity_dict_df, str(tmp_path / "w"), input_fingerprint="empty"
    )
    assert out.count() == 0
    assert [f.name for f in out.schema.fields[:3]] == ["subj", "pred", "obj"]


def test_duplicate_turn_dedup_is_deterministic(spark, entity_dict_df, tmp_path):
    # same (conv_id, turn_idx) delivered twice with different ts: ingest
    # keeps the earliest-ts row, so re-delivery can't change the output
    rows = pd.DataFrame(
        {
            "conv_id": ["c1", "c1"],
            "turn_idx": pd.array([0, 0], dtype="int32"),
            "role": ["user", "user"],
            "text": [
                "ada lovelace works with charles babbage on engines.",
                "grace hopper works with alan turing on compilers.",
            ],
            "tool": ["", ""],
            "ts": pd.to_datetime(["2026-01-01", "2026-01-02"]).astype("datetime64[us]"),
        }
    )
    df = spark.createDataFrame(rows, schema=schemas.TRANSCRIPTS)
    out = pipeline.run_simple(
        spark, df, entity_dict_df, str(tmp_path / "w"), input_fingerprint="dup"
    ).toPandas()
    # the earliest-ts row wins; its subject links to the dictionary entity
    ada_id = (
        entity_dict_df.filter(F.col("canonical") == "ada lovelace")
        .select("entity_id")
        .first()[0]
    )
    assert set(out["subj"]) == {ada_id}
    assert len(out) == 2  # the 2026-01-02 redelivery contributed nothing


@pytest.mark.parametrize("n_rows", [1])
def test_single_turn_corpus(spark, entity_dict_df, tmp_path, n_rows):
    df = _df_from_texts(spark, ["solo turn with no rule anchors here"])
    out = pipeline.run_simple(
        spark, df, entity_dict_df, str(tmp_path / "w"), input_fingerprint="solo"
    )
    assert out.count() == 0
