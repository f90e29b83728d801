"""Composed training-data curation over the documents table: the shape of
a real 100 TB corpus-cleaning job, built entirely from this engine's own
operators — language ID -> quality gates -> exact dedup -> near-dup
clustering (MinHash-LSH pairs -> connected components -> one canonical doc
per cluster).

Every step is an equi-join / hash-agg / broadcast pattern that scales:
no O(n²) stage, no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .canon import connected_components
from .dedup import DOC_JACCARD, doc_minhash_pairs
from .qreg import load, register
from .textstats import text_lang_id, text_quality_score


def curate(spark: SparkSession, sf: str) -> DataFrame:
    lang = text_lang_id(spark, sf).select("doc_id", "lang_pred")
    qual = text_quality_score(spark, sf).select("doc_id", "n_tokens", "len_ok")
    docs = (
        load(spark, sf, "documents")
        .join(lang, "doc_id")
        .join(qual, "doc_id")
        .filter((F.col("lang_pred") == "en") & (F.col("len_ok") == 1))
    )

    # exact dedup: keep the min doc_id per normalized text
    winners = docs.groupBy(F.lower(F.trim("text")).alias("k")).agg(
        F.min("doc_id").alias("doc_id")
    )
    docs = docs.join(winners.select("doc_id"), "doc_id", "left_semi").persist()

    # near-dup clustering among survivors: LSH pairs -> CC -> keep the
    # cluster representative (min doc id; ids zero-padded so the string
    # min-label CC representative equals the numeric min)
    pad = lambda c: F.format_string("%012d", F.col(c).cast("long"))
    pairs = doc_minhash_pairs(docs).filter(F.col("jaccard") >= DOC_JACCARD)
    edges = pairs.select(pad("a").alias("a"), pad("b").alias("b"))
    cc = connected_components(edges)
    losers = cc.filter(F.col("node") != F.col("component")).select(
        F.col("node").cast("long").alias("doc_id")
    )
    kept = docs.join(losers, "doc_id", "left_anti")
    return kept.select("doc_id", "lang_pred", "n_tokens")


@register("corpus_curation", sql=None)  # composed (LSH/CC) -> rows-only
def corpus_curation(spark, sf):
    return curate(spark, sf)
