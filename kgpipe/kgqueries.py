"""KG-pipeline operators as registry entries (rows-only oracle).

These run on the deterministic synthetic transcript corpus (FIXTURES.md §2,
seeded — no external data), sized by the sf directory the driver passes.
The DuckDB views only cover the TPC-H-ish tables, so these register
sql=None; their value-level correctness is enforced by tests/ (pandas
oracle parity + golden fixture P/R) rather than the SQL oracle.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import canon, extract, io_tables, link, pipeline, schemas, synth
from .qreg import register

_CACHE: dict[str, dict[str, DataFrame]] = {}


def _convs_for(sf_dir: str) -> int:
    # keep driver correctness runs fast; bench.py scales separately
    return 60 if "0.001" in sf_dir else 150


def corpus_dfs(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    key = f"{id(spark)}|{_convs_for(sf_dir)}"
    if key not in _CACHE:
        c = synth.generate(n_convs=_convs_for(sf_dir))
        t = spark.createDataFrame(c.transcripts, schema=schemas.TRANSCRIPTS).cache()
        e = spark.createDataFrame(c.entity_dict, schema=schemas.ENTITY_DICT).cache()
        _CACHE[key] = {"transcripts": t, "entity_dict": e}
    return _CACHE[key]


@register("scan_transcripts", sql=None)
def scan_transcripts(spark, sf):
    d = corpus_dfs(spark, sf)
    return (
        d["transcripts"]
        .dropDuplicates(["conv_id", "turn_idx"])
        .filter(F.col("text").isNotNull())
    )


@register("scan_dict", sql=None)
def scan_dict(spark, sf):
    return corpus_dfs(spark, sf)["entity_dict"]


@register("filter_role", sql=None)
def filter_role(spark, sf):
    d = corpus_dfs(spark, sf)
    return d["transcripts"].filter(F.col("role").isin("user", "assistant"))


@register("kg_turn_order", sql=None)
def kg_turn_order(spark, sf):
    d = corpus_dfs(spark, sf)
    return extract.with_turn_order(d["transcripts"]).select(
        "conv_id", "turn_idx", "turn_rank"
    )


@register("udf_mention_detect", sql=None)
def udf_mention_detect(spark, sf):
    d = corpus_dfs(spark, sf)
    t = d["transcripts"].withColumn(
        "text_norm", extract.normalize_text_col(F.col("text"))
    )
    m = extract.detect_mentions(t, d["entity_dict"])
    return (
        m.select("conv_id", "turn_idx", F.explode("mentions").alias("m"))
        .select("conv_id", "turn_idx", "m.surface", "m.start", "m.end", "m.mtype")
    )


@register("udf_triple_extract", sql=None)
def udf_triple_extract(spark, sf):
    d = corpus_dfs(spark, sf)
    return extract.stage_extract(d["transcripts"], d["entity_dict"])


@register("link_score", sql=None)
def link_score(spark, sf):
    d = corpus_dfs(spark, sf)
    raw = extract.stage_extract(d["transcripts"], d["entity_dict"])
    surfaces = (
        raw.filter(F.col("subj_kind") == "surface")
        .select(F.col("subj_raw").alias("surface"))
        .distinct()
    )
    return link.score_candidates(surfaces, d["entity_dict"], topk=1)


@register("lsh_block", sql=None)
def lsh_block(spark, sf):
    d = corpus_dfs(spark, sf)
    raw = extract.stage_extract(d["transcripts"], d["entity_dict"])
    linked = link.stage_link(raw, d["entity_dict"])
    unlinked = (
        linked.filter((F.col("subj_kind") == "surface") & F.col("subj_link").isNull())
        .select(F.col("subj_raw").alias("surface"))
        .distinct()
    )
    return canon.candidate_pairs(unlinked)


@register("cc_iterate", sql=None)
def cc_iterate(spark, sf):
    return canon.connected_components(lsh_block(spark, sf))


@register("canon_rewrite", sql=None)
def canon_rewrite(spark, sf):
    d = corpus_dfs(spark, sf)
    raw = extract.stage_extract(d["transcripts"], d["entity_dict"])
    linked = link.stage_link(raw, d["entity_dict"])
    out, _ = canon.stage_canon(linked)
    return out


@register("triple_materialize", sql=None)
def triple_materialize(spark, sf):
    """Full Stage A..E including dedup + lineage + partition keys (reads
    the shared checkpointed run's final table)."""
    import os

    wd = _ckpt_run(spark, sf)
    return io_tables.read_stage(spark, os.path.join(wd, "E_triples"))


@register("agg_minhash_sig", sql=None)
def agg_minhash_sig(spark, sf):
    d = corpus_dfs(spark, sf)
    raw = extract.stage_extract(d["transcripts"], d["entity_dict"])
    surfaces = (
        raw.filter(F.col("subj_kind") == "surface")
        .select(F.col("subj_raw").alias("surface"))
        .distinct()
    )
    return canon.minhash_signatures(surfaces)


_CKPT_RUNS: dict[str, str] = {}


def _ckpt_run(spark: SparkSession, sf: str) -> str:
    """One shared checkpointed Stage A..E run per (session, sf): several
    registry entries expose different facets of the same pipeline artifacts
    (metrics, sink layout, resume) — run it once, reuse the work_dir."""
    key = f"{id(spark)}|{_convs_for(sf)}"
    if key not in _CKPT_RUNS:
        d = corpus_dfs(spark, sf)
        wd = tempfile.mkdtemp(prefix="kgm_")
        cfg = pipeline.PipelineConfig(work_dir=wd, input_fingerprint=f"kgm|{sf}")
        pipeline.Pipeline(cfg).run(spark, d["transcripts"], d["entity_dict"])
        _CKPT_RUNS[key] = wd
    return _CKPT_RUNS[key]


@register("sink_metrics", sql=None)
def sink_metrics(spark, sf):
    """Per-stage / per-partition metrics surface: run the pipeline, return
    the manifest-derived metrics as a DataFrame (rows, partition counts,
    wall) — the lineage/metrics checkpointing of BASELINE.json."""
    import json
    import os

    wd = _ckpt_run(spark, sf)
    rows = []
    for stage in ("B_extract", "C_link", "D_canon", "E_triples"):
        m = json.load(open(os.path.join(wd, stage, "_MANIFEST.json")))
        for part, n in m["partition_counts"].items():
            rows.append((stage, part, int(n), m["fingerprint"]))
    return spark.createDataFrame(
        rows, "stage string, partition string, rows long, fingerprint string"
    )


@register("sink_triples", sql=None)
def sink_triples(spark, sf):
    """The partitioned triple sink itself (SURVEY.md §2(a)): read the
    E_triples table back from the Iceberg-shim sink and surface its physical
    layout — one row per part_key with triple count and distinct subjects.
    At 100 TB this is `spark.read.table("cat.db.triples")` over bucketed
    Iceberg partitions; readers prune on part_key."""
    wd = _ckpt_run(spark, sf)
    import os

    t = io_tables.read_stage(spark, os.path.join(wd, "E_triples"))
    return t.groupBy("part_key").agg(
        F.count("*").alias("n_triples"),
        F.countDistinct("subj").alias("n_subjects"),
    )


@register("sink_checkpoint", sql=None)
def sink_checkpoint(spark, sf):
    """Exact-resume evidence (BASELINE.json: "resumable from checkpoint"):
    re-run the pipeline with resume=True over the completed work_dir; every
    stage must be skipped via its manifest fingerprint chain. Returns one
    row per stage with the skip flag and manifest row count."""
    wd = _ckpt_run(spark, sf)
    d = corpus_dfs(spark, sf)
    cfg = pipeline.PipelineConfig(work_dir=wd, input_fingerprint=f"kgm|{sf}")
    p = pipeline.Pipeline(cfg)
    p.run(spark, d["transcripts"], d["entity_dict"], resume=True)
    rows = [
        (m["stage"], bool(m.get("skipped", False)), int(m["rows"]))
        for m in p.metrics
    ]
    return spark.createDataFrame(rows, "stage string, skipped boolean, rows long")


@register("join_theta_selfjoin_lsh", sql=None)
def join_theta_selfjoin_lsh(spark, sf):
    """Bounded theta self-join (SURVEY.md §2(c)): similar-name pairs from
    the TPC-H part table. Candidate pairs come ONLY from an equi-join on
    MinHash-LSH band keys (never a nested loop); survivors verified by
    exact char-shingle Jaccard. Same kernel the KG canon stage uses, on an
    independent input surface."""
    from .qreg import load

    names = (
        load(spark, sf, "part")
        .select(F.lower(F.col("p_name")).alias("surface"))
        .distinct()
    )
    return canon.candidate_pairs(names).withColumn(
        "jaccard", F.round("jaccard", 4)
    )


@register("kg_triples_per_entity", sql=None)
def kg_triples_per_entity(spark, sf):
    """The reference's summarize stage (stats per composer) re-targeted:
    triples per subject entity, top-heavy ordering."""
    out = triple_materialize(spark, sf)
    return (
        out.groupBy("subj")
        .agg(
            F.count("*").alias("n_triples"),
            F.countDistinct("pred").alias("n_preds"),
        )
    )
