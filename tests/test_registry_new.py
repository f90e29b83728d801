"""Registry entries added for SURVEY.md §2 rows sink_triples,
sink_checkpoint, join_theta_selfjoin_lsh, stream_ingest,
stream_watermark_late."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"


def q(name):
    return E.queries()[name]


def test_sink_triples_layout_consistent(spark):
    layout = q("sink_triples")(spark, SF).toPandas()
    assert (layout["part_key"] >= 0).all() and (layout["part_key"] < 128).all()
    # sink partition counts must sum to the materialized triple table
    total = q("triple_materialize")(spark, SF).count()
    assert int(layout["n_triples"].sum()) == total


def test_sink_checkpoint_resume_skips_all_stages(spark):
    rows = q("sink_checkpoint")(spark, SF).toPandas().set_index("stage")
    assert set(rows.index) == {"B_extract", "C_link", "D_canon", "E_triples"}
    assert rows["skipped"].all()


def test_theta_selfjoin_pairs_are_ordered_and_verified(spark):
    pairs = q("join_theta_selfjoin_lsh")(spark, SF).toPandas()
    assert len(pairs) > 0  # TPC-H part names share many 2-of-3-word stems
    assert (pairs["a"] < pairs["b"]).all()
    assert (pairs["jaccard"] >= 0.5).all()
    # symmetric-duplicate free
    assert not pairs.duplicated(["a", "b"]).any()


def test_stream_ingest_equals_batch_scan(spark):
    got = q("stream_ingest")(spark, SF)
    want = spark.read.parquet(f"{SF}/events.parquet")
    assert got.count() == want.count()
    # float sum is order-dependent across partitions; compare approximately
    assert abs(
        got.agg(F.sum("value")).first()[0] - want.agg(F.sum("value")).first()[0]
    ) < 1e-6


def test_stream_watermark_drops_late_windows(spark):
    got = q("stream_watermark_late")(spark, SF).toPandas()
    all_windows = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select(F.window(F.col("ts").cast("timestamp"), "1 day").alias("w"))
        .select("w.start")
        .distinct()
        .count()
    )
    # batch 2 replays the oldest quartile beyond the watermark: some of its
    # day-windows must be dropped, and emitted counts exclude late rows
    assert 0 < len(got) < all_windows or (
        len(got) == all_windows and got["n"].sum()
        < spark.read.parquet(f"{SF}/events.parquet").count()
    )


def test_ann_blas_equals_bruteforce(spark):
    bf = q("ann_bruteforce_topk")(spark, SF).toPandas()
    bl = q("ann_bruteforce_blas_topk")(spark, SF).toPandas()
    key = ["query_id", "rnk"]
    bf = bf.sort_values(key).reset_index(drop=True)
    bl = bl.sort_values(key).reset_index(drop=True)
    assert bf[["query_id", "neighbor_id", "rnk"]].equals(
        bl[["query_id", "neighbor_id", "rnk"]]
    )
    assert (bf["cosine"] - bl["cosine"]).abs().max() < 1e-9


def test_ann_ivf_recall_vs_bruteforce(spark):
    bf = q("ann_bruteforce_topk")(spark, SF).toPandas()
    ivf = q("ann_ivf_topk")(spark, SF).toPandas()
    exact = set(map(tuple, bf[["query_id", "neighbor_id"]].values))
    approx = set(map(tuple, ivf[["query_id", "neighbor_id"]].values))
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, recall  # nprobe=4/16 cells; sane floor


def test_stateful_applyinpandas_accumulates_across_batches(spark):
    out = q("stream_stateful_applyinpandas")(spark, SF).toPandas()
    # two micro-batches (turn parity split) -> each conv reports twice
    assert (out.groupby("conv_id").size() == 2).all()
    # state accumulates: final turns_seen per conv == sum of its batch_rows
    final = out.groupby("conv_id").agg(
        total=("batch_rows", "sum"), last_seen=("turns_seen", "max")
    )
    assert (final["total"] == final["last_seen"]).all()


def test_resume_from_mid_pipeline_crash(spark, transcripts_df, entity_dict_df, tmp_path):
    """Simulated crash after Stage C: a resumed full run must skip B and C
    (manifest fingerprints) and produce the same triples as a clean run."""
    from kgpipe import pipeline

    wd_crash = str(tmp_path / "crash")
    cfg = pipeline.PipelineConfig(work_dir=wd_crash, input_fingerprint="crash")
    p1 = pipeline.Pipeline(cfg)
    p1.run(spark, transcripts_df, entity_dict_df, stop_after="C")
    assert {m["stage"] for m in p1.metrics} == {"B_extract", "C_link"}

    p2 = pipeline.Pipeline(pipeline.PipelineConfig(work_dir=wd_crash, input_fingerprint="crash"))
    out = p2.run(spark, transcripts_df, entity_dict_df, resume=True)
    by_stage = {m["stage"]: m for m in p2.metrics}
    assert by_stage["B_extract"]["skipped"] and by_stage["C_link"]["skipped"]
    assert not by_stage["D_canon"]["skipped"]

    wd_clean = str(tmp_path / "clean")
    clean = pipeline.run_simple(
        spark, transcripts_df, entity_dict_df, wd_clean, input_fingerprint="crash"
    )
    a = set(map(tuple, out.select("subj", "pred", "obj").toPandas().values))
    b = set(map(tuple, clean.select("subj", "pred", "obj").toPandas().values))
    assert a == b


def test_corpus_curation_invariants(spark):
    from pyspark.sql import functions as F

    from kgpipe.dedup import DOC_JACCARD, doc_minhash_pairs

    kept = q("corpus_curation")(spark, SF)
    kept_pdf = kept.toPandas()
    assert 0 < len(kept_pdf) <= 500
    assert (kept_pdf["lang_pred"] == "en").all()
    # no exact dups survive
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    kept_docs = docs.join(kept.select("doc_id"), "doc_id", "left_semi")
    texts = kept_docs.select(F.lower(F.trim("text")).alias("k"))
    assert texts.count() == texts.distinct().count()
    # no near-dup pair (>= threshold) survives within the kept set
    surviving_pairs = doc_minhash_pairs(kept_docs).filter(
        F.col("jaccard") >= DOC_JACCARD
    )
    assert surviving_pairs.count() == 0


def test_ann_lsh_recall_floor(spark):
    """Multi-table multi-probe sign-LSH top-k: recall@10 vs brute force.
    Top-10 neighbors sit at cosine ~0.3-0.6 — a hard regime for sign-LSH
    (round 1's exact-bucket probing measured 0.52). Hamming-radius-2
    multi-probe measures 1.0 here; the 0.9 floor pins against regressions
    like dropping the probe expansion or falling back to one table."""
    bf = q("ann_bruteforce_topk")(spark, SF).toPandas()
    ls = q("ann_lsh_topk")(spark, SF).toPandas()
    want = set(zip(bf.query_id, bf.neighbor_id))
    got = set(zip(ls.query_id, ls.neighbor_id))
    assert len(want & got) / len(want) >= 0.9


def test_dedup_embedding_blocked_equals_allpairs(spark):
    """The blocked-BLAS self-join must emit exactly the all-pairs result:
    every unordered pair computed once, fold-exact cosines, no block-edge
    losses (r1's review flagged the previous all-pairs plan; this pins the
    replacement's correctness)."""
    from kgpipe.ann import cosine_col

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    a = e.select(F.col("vec_id").alias("a"), F.col("embedding").alias("va"))
    b = e.select(F.col("vec_id").alias("b"), F.col("embedding").alias("vb"))
    cos = cosine_col(F.col("va"), F.col("vb"))
    ref = (
        a.join(b, F.col("a") < F.col("b"))
        .withColumn("cosine", F.round(cos, 6))
        .filter(cos >= 0.45)
        .select("a", "b", "cosine")
        .toPandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    got = (
        q("dedup_embedding_cosine")(spark, SF)
        .toPandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    assert len(got) == len(ref) > 0
    assert got[["a", "b"]].equals(ref[["a", "b"]])
    assert (got["cosine"] - ref["cosine"]).abs().max() == 0.0


def test_range_asof_window_equals_join_form(spark):
    """The range-window plan (one shuffle, zero joins) must reproduce the
    original equi-join + interval-predicate semantics exactly."""
    e = spark.read.parquet(f"{SF}/events.parquet")
    e1, e2 = e.alias("e1"), e.alias("e2")
    cond = (
        (F.col("e1.user_id") == F.col("e2.user_id"))
        & (F.col("e2.ts") >= F.col("e1.ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("e2.ts") < F.col("e1.ts"))
    )
    ref = (
        e1.join(e2, cond, "left")
        .groupBy(F.col("e1.event_id").alias("event_id"))
        .agg(F.count(F.col("e2.event_id")).alias("prior_cnt"))
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    got = (
        q("join_range_asof")(spark, SF)
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert got.equals(ref)


def test_sort_within_part_layout(spark):
    """Physical property the order-insensitive driver compare cannot see:
    within every partition, rows are sorted by (l_orderkey, l_linenumber)."""
    df = q("sort_within_part")(spark, SF)

    def check(it):
        import pandas as pd

        for pdf in it:
            keys = list(zip(pdf["l_orderkey"], pdf["l_linenumber"]))
            yield pd.DataFrame({"ok": [keys == sorted(keys)]})

    flags = df.mapInPandas(check, "ok boolean").toPandas()
    assert flags["ok"].all()


def test_approx_distinct_error_bound(spark):
    """agg_approx_distinct is rows-only for the driver (HLL sketch values
    are engine-specific); its value-level evidence is this bound: each
    group's estimate within 5x the configured 2% rsd of the exact count."""
    got = q("agg_approx_distinct")(spark, SF).toPandas().set_index("l_returnflag")
    exact = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .toPandas()
        .set_index("l_returnflag")
    )
    for flag, row in exact.iterrows():
        rel = abs(got.loc[flag, "approx_parts"] - row["n"]) / row["n"]
        assert rel <= 0.10, (flag, rel)


def test_simhash_signature_matches_naive_recompute(spark):
    """The lane-packed SimHash aggregate (4 bit-counts per 64-bit lane,
    dedup.simhash_df) claims bit-identical signatures to the obvious
    formulation; pin it by recomputing every signature naively in PURE
    PYTHON (hashlib md5 — no Spark, no DuckDB), which also pins the
    engine-neutral token hash itself across a third implementation."""
    import re

    from kgpipe import dedup, nhash

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = dedup.simhash_df(docs).toPandas().set_index("id")["sig"]
    pdf = docs.select("doc_id", "text").toPandas()
    for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
        toks = re.sub(r"\s+", " ", text).strip().lower().split(" ")
        hs = [nhash.base60_py(t) for t in toks]
        sig = 0
        for b in range(dedup.SIMHASH_BITS):
            ones = sum((h >> b) & 1 for h in hs)
            if ones * 2 > len(hs):
                sig |= 1 << b
        assert got.loc[doc_id] == sig, doc_id


def test_minhash_signature_matches_naive_recompute(spark):
    """canon.minhash_signatures' grouped min-per-hash aggregation pinned
    against a PURE-PYTHON recompute (hashlib md5 + the same affine
    literals, nhash.minhash_py) — a third engine for the value parity the
    DuckDB oracle also checks."""
    from kgpipe import canon, nhash, rules

    vals = ["ada lovelace", "rob larkspur", "x"]
    surfaces = spark.createDataFrame([(v,) for v in vals], "surface string")
    got = canon.minhash_signatures(surfaces).toPandas().set_index("surface")
    for s in vals:
        shingles = (
            [s]
            if len(s) < rules.SHINGLE_K
            else sorted({s[i : i + rules.SHINGLE_K] for i in range(len(s) - rules.SHINGLE_K + 1)})
        )
        want = nhash.minhash_py(shingles, canon.MH_AFFINE)
        for i, w in enumerate(want):
            assert got.loc[s, f"mh_{i}"] == w, (s, i)


def test_multimodal_meta_values(spark):
    """multimodal_media_meta is rows-only for the driver; pin its values
    here: n_bytes == utf-8 byte length, checksum == zlib.crc32 of the
    payload, and the stubbed feature vector — serialized to feature_str in
    the registry entry so the driver's pandas canonicalizer can hash the
    row (a bare array<float> crashed it in round 2) — is deterministic.
    The underlying array path is pinned separately via extract_media_meta."""
    import zlib

    from kgpipe.multimodal import extract_media_meta

    got = q("multimodal_media_meta")(spark, SF).toPandas().set_index("doc_id")
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .toPandas()
        .set_index("doc_id")
    )
    for doc_id, row in docs.head(50).iterrows():
        payload = row["text"].encode("utf-8")
        assert got.loc[doc_id, "n_bytes"] == len(payload)
        assert got.loc[doc_id, "checksum"] == zlib.crc32(payload)
        n = float(len(payload))
        fparts = got.loc[doc_id, "feature_str"].split("|")
        assert len(fparts) == 4
        assert float(fparts[0]) == n
        assert float(fparts[1]) == float(sum(payload) % 65521)
    # the library function still returns the typed array<float> column
    lib = (
        extract_media_meta(
            spark.read.parquet(f"{SF}/documents.parquet").select(
                "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
            )
        )
        .limit(5)
        .toPandas()
    )
    assert all(len(v) == 4 for v in lib["feature"])


def test_sink_metrics_counts_match_stages(spark):
    """sink_metrics is rows-only (partition ids are runtime state); pin
    the deterministic part: per-stage partition counts sum to the stage's
    total row count, and fingerprints are stable across the shared run."""
    m = q("sink_metrics")(spark, SF).toPandas()
    per_stage = m.groupby("stage").agg(
        rows=("rows", "sum"), fps=("fingerprint", "nunique")
    )
    assert set(per_stage.index) == {"B_extract", "C_link", "D_canon", "E_triples"}
    assert (per_stage["fps"] == 1).all()
    total = q("triple_materialize")(spark, SF).count()
    assert per_stage.loc["E_triples", "rows"] == total


def test_mention_detect_spark_equals_local(spark):
    """udf_mention_detect is rows-only for the driver (RE2 has no match
    offsets or lookarounds); pin the full values here: the Spark pandas-UDF
    path must equal an in-process run of the SAME matcher over the same
    normalized text — surfaces, offsets, and types."""
    import pandas as pd

    from kgpipe import extract, rules

    got = (
        q("udf_mention_detect")(spark, SF)
        .toPandas()
        .sort_values(["conv_id", "turn_idx", "start"])
        .reset_index(drop=True)
    )
    from kgpipe.kgqueries import corpus_dfs

    dfs = corpus_dfs(spark, SF)
    t = (
        dfs["transcripts"]
        .withColumn("text_norm", extract.normalize_text_col(F.col("text")))
        .select("conv_id", "turn_idx", "text_norm")
        .toPandas()
    )
    aliases = (
        dfs["entity_dict"]
        .select(F.explode("aliases").alias("a"), "etype")
        .select(extract.normalize_text_col(F.col("a")).alias("n"), "etype")
        .distinct()
        .toPandas()
    )
    pat, type_of = rules.build_mention_matcher(
        list(aliases["n"]), list(aliases["etype"])
    )
    rows = []
    for _, r in t.iterrows():
        for m in rules.detect_mentions_batch(
            pd.Series([r["text_norm"]]), pat, type_of
        )[0]:
            rows.append(
                (r["conv_id"], r["turn_idx"], m["surface"], m["start"],
                 m["end"], m["mtype"])
            )
    want = (
        pd.DataFrame(rows, columns=["conv_id", "turn_idx", "surface",
                                    "start", "end", "mtype"])
        .sort_values(["conv_id", "turn_idx", "start"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(got.astype(str), want.astype(str))
