"""Stage B: mention detection (U1) + triple extraction (U2).

The reference's analog: per-field XML->RDF mapping rules applied one record
at a time in a Python loop (SURVEY.md §3.1). Here both steps are vectorized
Arrow-batched operations with zero per-row Python driver involvement
(BASELINE.json: "vectorized pandas/Arrow UDFs perform batched mention
detection and pattern-based triple extraction per turn").

Design notes (scale):
- `normalize_text_col` is pure Spark-builtin (lower∘trim∘regexp_replace) —
  stays inside whole-stage codegen; it must stay semantically identical to
  rules.normalize_series (tested in tests/test_rules.py).
- Mention detection is an iterator pandas UDF so the compiled alias
  alternation regex is built once per Python worker, not per batch.
- Triple extraction uses mapInArrow (round 4; was mapInPandas): one Arrow
  batch in, a (usually smaller) Arrow triple batch out — the kernel
  (rules.extract_triples_arrow) runs RE2 via pyarrow.compute over the
  columnar buffers, skipping the Arrow->pandas->Arrow conversion AND
  pandas' Python `re` engine; measured 2.5-4.4x faster per batch with a
  set-identical triple output (tests/test_rules.py pins equality).
- The mention-presence filter runs BEFORE extraction so distractor turns
  (no dictionary alias, ~20% of corpus) never reach the extraction regexes.
  Tool turns pass unconditionally (R5 keys on role, not aliases).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType, StringType

from . import schemas
from .rules import (
    build_mention_matcher,
    detect_mentions_batch,
    extract_triples_arrow,
    extract_triples_batch,  # noqa: F401  (pandas twin — oracle + tests)
)

RAW_TRIPLES_KINDED = StructType(
    schemas.RAW_TRIPLES.fields
    + [StructField("subj_kind", StringType(), False), StructField("obj_kind", StringType(), False)]
)


def normalize_text_col(col: Column) -> Column:
    """Spark twin of rules.normalize_series — keep in lockstep."""
    return F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))


def with_turn_order(df: DataFrame) -> DataFrame:
    """W1 — stable turn ordering (the correctness anchor, BASELINE.json):
    row_number over (conv_id) ordered by (turn_idx, ts). Input may arrive in
    any row order; everything downstream keys on (conv_id, turn_idx)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx", "ts")
    return df.withColumn("turn_rank", F.row_number().over(w))


def mention_udf(alias_norms: list[str], alias_types: list[str]):
    """Iterator pandas UDF: text_norm -> array<struct(surface,start,end,mtype)>.

    The alias automaton is built lazily inside the worker and cached at
    module level (rules._MENTION_CACHE), amortized across all batches the
    worker processes — the per-executor cache of SURVEY.md §2(i) U1.
    """

    @F.pandas_udf(schemas.MENTIONS_ARRAY)
    def detect(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        pat, type_of = build_mention_matcher(alias_norms, alias_types)
        for s in batches:
            yield detect_mentions_batch(s, pat, type_of)

    return detect


def detect_mentions(df: DataFrame, entity_dict: DataFrame) -> DataFrame:
    """Attach `mentions` array to each turn. entity_dict is collected to the
    driver once (it is the broadcast dimension — ~10^3..10^6 rows) and
    shipped inside the UDF closure, the pandas-UDF equivalent of a broadcast
    variable."""
    alias_rows = (
        entity_dict.select(
            F.explode("aliases").alias("alias"), F.col("etype")
        )
        .select(normalize_text_col(F.col("alias")).alias("alias_norm"), "etype")
        .distinct()
        .collect()
    )
    norms = [r["alias_norm"] for r in alias_rows]
    types = [r["etype"] for r in alias_rows]
    udf = mention_udf(norms, types)
    return df.withColumn("mentions", udf(F.col("text_norm")))


def _arrow_extract_runner(batches):
    """mapInArrow worker loop: RecordBatch in, RecordBatch(es) out (module-
    level so the serialized closure is tiny and version-stable)."""
    for b in batches:
        out = extract_triples_arrow(b)
        if out is not None and out.num_rows:
            yield from out.to_batches()


def extract_triples(df: DataFrame) -> DataFrame:
    """mapInArrow triple extraction over (conv_id, turn_idx, role, text_norm).

    Narrow transformation: zero shuffles between turn ordering and
    raw_triples (SURVEY.md §3.2); kernel rationale in rules.py."""
    cols = ["conv_id", "turn_idx", "role", "text_norm"]
    return df.select(cols).mapInArrow(_arrow_extract_runner, RAW_TRIPLES_KINDED)


def _collect_aliases(entity_dict: DataFrame) -> tuple[list[str], list[str]]:
    rows = (
        entity_dict.select(F.explode("aliases").alias("alias"), F.col("etype"))
        .select(normalize_text_col(F.col("alias")).alias("alias_norm"), "etype")
        .distinct()
        .collect()
    )
    return [r["alias_norm"] for r in rows], [r["etype"] for r in rows]


def anchor_prefilter(text_norm_col: Column) -> Column:
    """Rule-anchor pushdown (SURVEY.md §7's 'pre-filters into the scan'):
    a row can only produce a triple if its normalized text contains some
    rule's literal anchor. Evaluated JVM-side inside whole-stage codegen,
    so distractor/chatter turns (~50-60% of a conversation corpus) never
    cross the Arrow boundary into Python at all."""
    from .rules import RULES

    cond = F.lit(False)
    for r in RULES:
        cond = cond | text_norm_col.contains(r.anchor)
    return cond


def extract_triples_jvm(t: DataFrame) -> DataFrame:
    """Pure-JVM extraction twin of the mapInArrow kernel: the entire rule
    bank compiles to one whole-stage-codegen projection — per rule,
    `role ∈ roles AND contains(anchor) AND rlike(pattern)` guards an array
    of emit structs (`regexp_extract` per named group, first-match
    semantics identical to the kernels' `re.search`/RE2 search); the
    per-rule arrays are concatenated (array_compact drops non-matching
    rules' nulls) and exploded. One scan, zero Python workers, zero Arrow
    IPC — every text byte stays inside the JVM.

    Why this exists alongside the Arrow kernel: the RE2 kernel is the
    fastest *per-core* extractor (BENCH/BASELINE.md §3c), but it ships
    every surviving text byte across the local socket to a Python worker
    and back — on a single box that traffic rides the same DRAM bus the
    other 4N-level stages are already saturating, and the round-5 HEAD
    re-measurement showed Stage B scaling at 0.65 (1→4) against 0.90 for
    the rest of the pipeline. This twin trades a slower regex engine
    (java.util.regex vs RE2) for zero boundary traffic; which one ships
    is measured, not assumed — see BENCH/BASELINE.md §3e and
    KGPIPE_EXTRACT_KERNEL below.

    Input: DataFrame[conv_id, turn_idx, role, text_norm]. Output schema =
    RAW_TRIPLES_KINDED, set-identical to extract_triples_batch (pinned in
    tests/test_rules.py)."""
    from .rules import RULES, group_index, java_pattern

    turn_node = F.concat_ws(
        "#", F.col("conv_id"), F.col("turn_idx").cast("string")
    )

    def side(pattern: str, jpat: str, group: str) -> Column:
        if group == "@turn":
            return turn_node
        return F.trim(
            F.regexp_extract(F.col("text_norm"), jpat, group_index(pattern, group))
        )

    per_rule = []
    for rule in RULES:
        jpat = java_pattern(rule.pattern)
        cond = F.col("role").isin(*rule.roles)
        if rule.anchor:
            # literal-substring gate short-circuits the regex (And.eval is
            # lazy in codegen), mirroring the kernels' C-substring gate
            cond = cond & F.col("text_norm").contains(rule.anchor)
        cond = cond & F.col("text_norm").rlike(jpat)
        emits = [
            F.struct(
                side(rule.pattern, jpat, subj_g).alias("subj_raw"),
                F.lit(pred).alias("pred"),
                side(rule.pattern, jpat, obj_g).alias("obj_raw"),
                F.lit(rule.rule_id).alias("rule_id"),
                F.lit("node" if subj_g == "@turn" else "surface").alias(
                    "subj_kind"
                ),
                F.lit("node" if obj_g == "@turn" else "surface").alias(
                    "obj_kind"
                ),
            )
            for subj_g, pred, obj_g in rule.emits
        ]
        per_rule.append(F.when(cond, F.array(*emits)))

    exploded = t.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.explode(F.flatten(F.array_compact(F.array(*per_rule)))).alias("_t"),
    )
    return exploded.select(
        "conv_id",
        "turn_idx",
        "_t.subj_raw",
        "_t.pred",
        "_t.obj_raw",
        "_t.rule_id",
        "_t.subj_kind",
        "_t.obj_kind",
    )


def stage_extract(turns: DataFrame, entity_dict: DataFrame) -> DataFrame:
    """Full Stage B: normalize -> anchor prefilter (JVM) -> batched triple
    extraction (one mapInArrow pass, RE2 kernel in rules.py).

    The anchor prefilter never drops a row any rule could match (anchor is
    a literal substring of each rule's pattern — invariant tested), so the
    emitted triple set is identical to running extraction over every turn;
    it is pure pushdown. Dictionary-based mention detection remains
    available as its own operator (detect_mentions / udf_mention_detect)
    for enrichment queries; the hot path doesn't need the alias automaton —
    entity resolution happens in Stage C via the broadcast join.

    entity_dict is accepted (and ignored) to keep the stage signature
    stable for callers that pass it.

    Returns raw triples (conv_id, turn_idx, subj_raw, pred, obj_raw,
    rule_id, subj_kind, obj_kind)."""
    t = turns.withColumn("text_norm", normalize_text_col(F.col("text")))
    t = t.filter(anchor_prefilter(F.col("text_norm")))
    cols = ["conv_id", "turn_idx", "role", "text_norm"]
    if _extract_kernel() == "jvm":
        return extract_triples_jvm(t.select(cols))
    return t.select(cols).mapInArrow(_arrow_extract_runner, RAW_TRIPLES_KINDED)


def _extract_kernel() -> str:
    """Stage-B kernel selector: 'arrow' (mapInArrow + RE2 pyarrow.compute)
    or 'jvm' (whole-stage-codegen rlike/regexp_extract — zero Python
    boundary). Both are set-identical (tests/test_rules.py,
    tests/test_spark_stages.py); the default is the measured winner at the
    4N scaling level (BENCH/BASELINE.md §3e)."""
    import os

    name = os.environ.get("KGPIPE_EXTRACT_KERNEL", "arrow")
    if name not in ("arrow", "jvm"):
        raise ValueError(
            f"KGPIPE_EXTRACT_KERNEL={name!r}: expected 'arrow' or 'jvm'"
        )
    return name
