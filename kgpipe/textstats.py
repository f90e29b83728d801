"""Text analysis operators over the documents table: language-ID, quality
scoring, token counting, fingerprinting (training-data pipeline ops).

All built-in pyspark.sql.functions — the entire module is UDF-free and
stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .extract import normalize_text_col
from .qreg import load, register

# tiny per-language stopword lists for the n-gram/stopword heuristic
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "est"],
    "es": ["el", "la", "de", "que", "y", "los", "una", "por"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "不"],
}

# BPE-ish tokenization: letter runs, digit runs, single other non-space
TOKEN_RE = "[a-z]+|[0-9]+|[^a-z0-9\\s]"


@register(
    "text_token_count",
    sql=f"""SELECT doc_id,
                   LEN(STRING_SPLIT_REGEX(TRIM(text), '\\s+')) AS ws_tokens,
                   LEN(REGEXP_EXTRACT_ALL(LOWER(text), '{TOKEN_RE}')) AS bpe_tokens
            FROM documents""",
)
def text_token_count(spark, sf):
    d = load(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("ws_tokens"),
        F.size(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_RE), 0)
        ).alias("bpe_tokens"),
    )


@register(
    "text_quality_score",
    sql="""SELECT doc_id,
                  LEN(STRING_SPLIT_REGEX(TRIM(text), '\\s+')) AS n_tokens,
                  ROUND(CAST(LENGTH(REGEXP_REPLACE(text, '[^.!?,;]', '', 'g')) AS DOUBLE)
                        / GREATEST(LENGTH(text), 1), 4) AS punct_ratio,
                  ROUND(CAST(LENGTH(REGEXP_REPLACE(LOWER(text), '[^aeiou]', '', 'g')) AS DOUBLE)
                        / GREATEST(LENGTH(text), 1), 4) AS vowel_ratio,
                  CASE WHEN n_chars BETWEEN 50 AND 5000 THEN 1 ELSE 0 END AS len_ok
           FROM documents""",
)
def text_quality_score(spark, sf):
    d = load(spark, sf, "documents")
    tlen = F.greatest(F.length("text"), F.lit(1)).cast("double")
    return d.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tokens"),
        F.round(
            F.length(F.regexp_replace("text", r"[^.!?,;]", "")).cast("double") / tlen, 4
        ).alias("punct_ratio"),
        F.round(
            F.length(F.regexp_replace(F.lower(F.col("text")), r"[^aeiou]", "")).cast(
                "double"
            )
            / tlen,
            4,
        ).alias("vowel_ratio"),
        F.when(F.col("n_chars").between(50, 5000), 1).otherwise(0).alias("len_ok"),
    )


def _lang_id_sql() -> str:
    hit_cols = ",\n           ".join(
        "LEN(LIST_INTERSECT(toks, ["
        + ", ".join(f"'{w}'" for w in ws)
        + f"])) AS h_{lang}"
        for lang, ws in sorted(LANG_STOPWORDS.items())
    )
    langs_desc = sorted(LANG_STOPWORDS, reverse=True)
    # Spark's array_max over struct(hits, lang) tie-breaks on the LARGER
    # lang code; replicate by checking languages in reverse lexicographic
    # order
    case = " ".join(
        f"WHEN h_{lang} = mx THEN '{lang}'" for lang in langs_desc[:-1]
    )
    return f"""
    WITH t AS (
      SELECT doc_id,
             LIST_DISTINCT(STRING_SPLIT(
               LOWER(TRIM(REGEXP_REPLACE(text, '\\s+', ' ', 'g'))), ' ')) AS toks
      FROM documents),
    h AS (
      SELECT doc_id,
           {hit_cols}
      FROM t),
    m AS (SELECT *, GREATEST({", ".join("h_" + l for l in sorted(LANG_STOPWORDS))}) AS mx FROM h)
    SELECT doc_id,
           CASE {case} ELSE '{langs_desc[-1]}' END AS lang_pred,
           mx AS stopword_hits
    FROM m"""


def lang_best_col(text_col):
    """struct(hits, lang) of the winning language for a text column —
    argmax of stopword hits with deterministic tie-break on language code.
    A pure column expression so composed pipelines (corpus_curation) can
    compute it inline on their own scan instead of joining this module's
    query output back to the table."""
    toks = F.array_distinct(F.split(normalize_text_col(text_col), " "))
    scores = F.array(
        *[
            F.struct(
                F.size(
                    F.array_intersect(
                        toks, F.array(*[F.lit(w) for w in ws])
                    )
                ).alias("hits"),
                F.lit(lang).alias("lang"),
            )
            for lang, ws in sorted(LANG_STOPWORDS.items())
        ]
    )
    return F.array_max(scores)


@register("text_lang_id", sql=_lang_id_sql())
def text_lang_id(spark, sf):
    """Language ID by stopword-hit ratio: tokenize once, score each language
    via array_intersect against its stopword list, argmax with deterministic
    tie-break on language code."""
    d = load(spark, sf, "documents")
    best = lang_best_col(F.col("text"))
    return d.select(
        "doc_id",
        best["lang"].alias("lang_pred"),
        best["hits"].alias("stopword_hits"),
    )


@register(
    "text_fingerprint",
    sql="""SELECT doc_id,
                  MD5(LOWER(TRIM(REGEXP_REPLACE(text, '\\s+', ' ', 'g')))) AS content_md5
           FROM documents""",
)
def text_fingerprint(spark, sf):
    d = load(spark, sf, "documents")
    return d.select(
        "doc_id", F.md5(normalize_text_col(F.col("text"))).alias("content_md5")
    )


_WINNOW_SQL = """
WITH w AS (
  SELECT doc_id,
         STRING_SPLIT(LOWER(TRIM(REGEXP_REPLACE(text, '\\s+', ' ', 'g'))), ' ')
           AS toks
  FROM documents),
g AS (
  SELECT doc_id, toks,
         CASE WHEN LEN(toks) < 8 THEN [ARRAY_TO_STRING(toks, ' ')]
              ELSE [ARRAY_TO_STRING(LIST_SLICE(toks, i, i + 7), ' ')
                    FOR i IN GENERATE_SERIES(1, LEN(toks) - 7)] END AS grams
  FROM w)
SELECT doc_id,
       LIST_MIN(LIST_TRANSFORM(grams,
         x -> CAST(CONCAT('0x', SUBSTR(md5(x), 1, 15)) AS BIGINT))) AS fp_min,
       LIST_MAX(LIST_TRANSFORM(grams,
         x -> CAST(CONCAT('0x', SUBSTR(md5(x), 1, 15)) AS BIGINT))) AS fp_max,
       LEN(toks) AS n_tokens
FROM g
"""


@register("text_winnow_fingerprint", sql=_WINNOW_SQL)
def text_winnow_fingerprint(spark, sf):
    """Winnowing-style rolling fingerprint: min/max of a 60-bit gram hash
    over 8-token windows — a compact near-dup signature computable in one
    scan. Tokens are materialized in a prior projection so the transform
    lambda (which is interpreted per element) never re-runs the tokenizing
    regex.

    Gram hash = first 15 hex digits of md5 as a positive int64: identical
    in any engine, which buys the full value oracle. On a real 100 TB run
    swap the lambda for F.xxhash64 (one line) — ~10x cheaper per gram,
    same winnowing semantics, at the cost of engine-portable values."""
    from .dedup import tokens_col

    win = 8
    d = load(spark, sf, "documents").select(
        "doc_id", tokens_col("text").alias("toks")
    )
    grams = F.expr(
        f"CASE WHEN size(toks) < {win} THEN array(array_join(toks, ' ')) "
        f"ELSE transform(sequence(0, size(toks) - {win}), "
        f"i -> array_join(slice(toks, i + 1, {win}), ' ')) END"
    )
    hashes = F.transform(
        grams,
        lambda g: F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("long"),
    )
    return d.select(
        "doc_id",
        F.array_min(hashes).alias("fp_min"),
        F.array_max(hashes).alias("fp_max"),
        F.size("toks").alias("n_tokens"),
    )
