"""Embedding similarity search (training-data pipeline ops).

Brute-force cosine top-k as the correctness baseline, plus a
random-hyperplane LSH-bucketed variant as the scale path (bucket key =
sign pattern over H fixed hyperplanes; candidate generation is an equi-join
on the bucket key, brute force only within buckets).

Dot products are sequential-fold builtin expressions (zip_with +
aggregate in double) so the DuckDB oracle (same left-to-right fold) is
bit-identical — no Python on the hot path; at real scale the same plan
vectorizes fine, or swaps to a pandas-UDF BLAS kernel behind the same API.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .qreg import load, register

ANN_QUERY_IDS = (0, 1, 2, 3, 4)
ANN_TOPK = 10
PLANE_SEED = 20260816


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a) -> F.Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine_col(a, b) -> F.Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    embeddings: DataFrame, query_ids=ANN_QUERY_IDS, k: int = ANN_TOPK
) -> DataFrame:
    """Exact top-k neighbors for the given query vectors.

    Queries (tiny) are broadcast against the corpus — the scan side streams
    once; at 100 TB the corpus side stays partitioned and the final top-k is
    a per-query window, never a global sort."""
    q = embeddings.filter(F.col("vec_id").isin(*query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    c = embeddings.select(F.col("vec_id").alias("neighbor_id"), "embedding")
    scored = c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id")).select(
        "query_id",
        "neighbor_id",
        F.round(cosine_col(F.col("qv"), F.col("embedding")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rnk")
    )


LSH_TABLES = 8  # OR-amplification: recall = 1-(1-p^bits)^tables
LSH_BITS = 5  # bucket fan-out 2^bits per table; size to n/bucket_target


def lsh_keys(
    embeddings: DataFrame,
    n_tables: int = LSH_TABLES,
    n_bits: int = LSH_BITS,
    seed: int = PLANE_SEED,
) -> DataFrame:
    """(vec_id, tbl, bucket) sign-LSH keys for every vector, multi-table.

    One Arrow-batched numpy pass: the (tables*bits, dims) hyperplane matrix
    is regenerated INSIDE each worker from the fixed seed and the batch's
    own vector width — no driver-side `.first()` dims probe, no per-plane
    literal arrays in the plan, and the whole key computation is one BLAS
    matmul per batch instead of tables*bits interpreted fold expressions.
    Data-independent planes => the same vector always lands in the same
    bucket at any cluster size / partitioning.
    """
    import pandas as pd

    def run(batches):
        planes = None
        for pdf in batches:
            M = np.array(list(pdf["embedding"]), dtype=np.float64)
            if planes is None:
                rng = np.random.default_rng(seed)
                planes = rng.standard_normal((n_tables * n_bits, M.shape[1]))
            bits = (M @ planes.T) > 0  # (batch, tables*bits)
            ids = pdf["vec_id"].to_numpy()
            weights = 1 << np.arange(n_bits)
            outs = []
            for t in range(n_tables):
                block = bits[:, t * n_bits : (t + 1) * n_bits]
                outs.append(
                    pd.DataFrame(
                        {
                            "vec_id": ids,
                            "tbl": t,
                            "bucket": block @ weights,
                        }
                    )
                )
            yield pd.concat(outs, ignore_index=True)

    return embeddings.select("vec_id", "embedding").mapInPandas(
        run, "vec_id long, tbl int, bucket long"
    )


def lsh_topk(
    embeddings: DataFrame,
    query_ids=ANN_QUERY_IDS,
    k: int = ANN_TOPK,
    n_tables: int = LSH_TABLES,
    n_bits: int = LSH_BITS,
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k: candidates = union over n_tables hash tables of
    the query's bucket — an equi-join on (tbl, bucket), never a scan of the
    full corpus. Multi-table OR-amplification is the recall knob (a single
    table has a recall cliff: one flipped plane loses the neighbor); n_bits
    controls bucket fan-out and should grow with corpus size so per-bucket
    candidate counts stay bounded.

    MULTI-PROBE (Lv et al., VLDB'07 — public technique): each query also
    probes every bucket within Hamming distance 2 of its own, purely a
    QUERY-side expansion — qk is (queries x tables) rows broadcast, so
    (1 + b + C(b,2))x more broadcast rows and ZERO change to the corpus
    side. For a neighbor at cosine ~0.45 (plane-agreement p ~= 0.65),
    per-table catch probability goes p^5 = 0.12 (exact bucket) -> P(<=2
    flipped planes) = 0.77, so 8-table recall ~0.63 -> ~0.999 in theory;
    measured on the test corpus it lifts recall@10 from 0.52 (exact
    bucket, round 1) to 0.88 (radius 1) to >= 0.9 (radius 2) —
    tests/test_registry_new.py::test_ann_lsh_recall_floor. At 100 TB:
    bucket the corpus table BY (tbl, bucket) so a query probe is partition
    pruning, not a shuffle; candidates/query ~= tables*(1+b+C(b,2))*
    n/2^bits — grow n_bits with the corpus (probe count grows O(b^2)
    while bucket count grows 2^b, so the candidate fraction shrinks)."""
    keys = lsh_keys(embeddings, n_tables, n_bits).persist()
    q = embeddings.filter(F.col("vec_id").isin(*query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    qk = keys.filter(F.col("vec_id").isin(*query_ids)).select(
        F.col("vec_id").alias("query_id"), "tbl", "bucket"
    )
    if multiprobe:
        masks = [0]
        masks += [1 << i for i in range(n_bits)]
        masks += [
            (1 << i) | (1 << j)
            for i in range(n_bits)
            for j in range(i + 1, n_bits)
        ]
        probes = F.array(
            *[F.col("bucket").bitwiseXOR(F.lit(m)) for m in masks]
        )
        qk = qk.select(
            "query_id", "tbl", F.explode(probes).alias("bucket")
        )
    cand = (
        keys.select(F.col("vec_id").alias("neighbor_id"), "tbl", "bucket")
        .join(F.broadcast(qk), ["tbl", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    scored = (
        cand.join(
            embeddings.select(F.col("vec_id").alias("neighbor_id"), "embedding"),
            "neighbor_id",
        )
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_col(F.col("qv"), F.col("embedding")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rnk")
    )


# ---------------------------------------------------------------------------
# registry entries
# ---------------------------------------------------------------------------

_ANN_SQL = f"""
WITH e AS (SELECT vec_id, LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id IN {ANN_QUERY_IDS}),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         ROUND(
           LIST_SUM(LIST_TRANSFORM(LIST_ZIP(q.qv, e.v), p -> p[1] * p[2]))
           / (SQRT(LIST_SUM(LIST_TRANSFORM(q.qv, x -> x * x)))
              * SQRT(LIST_SUM(LIST_TRANSFORM(e.v, x -> x * x)))), 6) AS cosine
  FROM e JOIN q ON e.vec_id <> q.query_id)
SELECT query_id, neighbor_id, cosine, rnk FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rnk
  FROM scored) WHERE rnk <= {ANN_TOPK}
"""


@register("ann_bruteforce_topk", sql=_ANN_SQL)
def ann_bruteforce_topk(spark, sf):
    return brute_force_topk(load(spark, sf, "embeddings"))


@register("ann_lsh_topk", sql=None)  # approximate -> rows-only
def ann_lsh_topk(spark, sf):
    return lsh_topk(load(spark, sf, "embeddings"))


def ivf_topk(
    embeddings: DataFrame,
    query_ids=ANN_QUERY_IDS,
    k: int = ANN_TOPK,
    n_centroids: int = 16,
    n_probe: int = 4,
    fit_sample_rows: int = 256,
) -> DataFrame:
    """IVF (inverted-file) ANN: a KMeans coarse quantizer assigns every
    vector to a centroid cell; each query probes only its n_probe nearest
    cells, so the scored candidate set is ~n_probe/n_centroids of the
    corpus. Centroids are tiny and live on the driver; the probe list is a
    broadcast join key. At 100 TB: persist centroids as a dim table,
    partition the corpus BY cell so a probe is a partition pruning, not a
    shuffle.

    The quantizer trains on a seeded SAMPLE (~fit_sample_rows rows), never
    the full corpus: a coarse quantizer only needs cluster CENTERS, whose
    estimate converges at O(1/sqrt(sample)) — scanning 100 TB through a
    driver-coordinated iterative ML fit would dominate the whole query.
    The default (256 rows, seeded) is deliberately below the sandbox
    corpus size so the SAMPLED quantizer is the code path the registry
    entry and the recall-vs-bruteforce pin actually exercise
    (tests/test_registry_new.py), not a prod-only branch."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    e = embeddings.select(
        "vec_id",
        "embedding",
        array_to_vector(F.col("embedding").cast("array<double>")).alias("fv"),
    )
    # fixed-size pseudo-random sample WITHOUT an exact count pass:
    # hash-order + limit is one TakeOrdered scan (top-N per partition,
    # N-row merge on the driver), deterministic under any partitioning —
    # a fraction-based .sample would need a full count() first just to
    # derive the fraction, i.e. an extra corpus scan per invocation.
    fit_set = e.orderBy(F.xxhash64("vec_id")).limit(fit_sample_rows)
    model = KMeans(
        k=n_centroids, seed=PLANE_SEED, featuresCol="fv", predictionCol="cell"
    ).fit(fit_set)
    assigned = model.transform(e).select("vec_id", "embedding", "cell")
    cents = np.array([c for c in model.clusterCenters()])
    qrows = embeddings.filter(F.col("vec_id").isin(*query_ids)).collect()
    probe_rows = []
    for r in qrows:
        qv = np.asarray(r["embedding"], dtype=np.float64)
        d = ((cents - qv) ** 2).sum(axis=1)
        for cell in np.argsort(d)[:n_probe]:
            probe_rows.append((int(r["vec_id"]), [float(x) for x in qv], int(cell)))
    spark = embeddings.sparkSession
    probes = spark.createDataFrame(
        probe_rows, "query_id long, qv array<double>, cell int"
    )
    scored = (
        assigned.join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine_col(F.col("qv"), F.col("embedding")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rnk")
    )


@register("ann_ivf_topk", sql=None)  # approximate -> rows-only
def ann_ivf_topk(spark, sf):
    return ivf_topk(load(spark, sf, "embeddings"))


def blas_topk(
    embeddings: DataFrame, query_ids=ANN_QUERY_IDS, k: int = ANN_TOPK
) -> DataFrame:
    """Exact top-k via an Arrow-batched numpy kernel: queries (normalized)
    ship in the closure; each corpus batch computes all query cosines as ONE
    matrix multiply and emits only its per-batch top-k per query (safe:
    ordering is (rounded cosine desc, neighbor_id asc), so a row cut by a
    batch's top-k can never enter the global top-k). The global window then
    merges ~(batches x queries x k) rows. Same result as brute_force_topk —
    shares its SQL oracle — but the per-row work is BLAS, not an interpreted
    fold; this is the 100 TB kernel."""
    import pandas as pd

    qrows = sorted(
        embeddings.filter(F.col("vec_id").isin(*query_ids)).collect(),
        key=lambda r: r["vec_id"],
    )
    qids = np.array([r["vec_id"] for r in qrows])
    Q = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)

    MARGIN = 32  # preselect depth beyond k; see fold-rescore note below

    def run(batches):
        for pdf in batches:
            M = np.array(list(pdf["embedding"]), dtype=np.float64)
            ids = pdf["vec_id"].to_numpy()
            Mn = M / np.clip(np.linalg.norm(M, axis=1, keepdims=True), 1e-30, None)
            cos = np.round(Mn @ Qn.T, 6)  # (batch, nq) — BLAS preselect
            # Exact-fold rescore: the BLAS matmul sums products in a
            # different order than the SQL-oracle's left-to-right fold, so
            # a cosine within ~1 ulp of a 1e-6 rounding boundary could
            # round differently and flip the driver's exact value-hash.
            # The emitted score is therefore recomputed for the (k+MARGIN)
            # preselected rows with np.cumsum — a strict running sum, i.e.
            # bit-identical to the left fold both Spark's F.aggregate and
            # DuckDB's LIST_SUM evaluate — and the final per-batch top-k is
            # re-ranked on that value. MARGIN covers rows a boundary flip
            # could promote past; flips need the unrounded value within
            # ~1e-12 of the grid edge (~1e-6 probability per row).
            fold_dot = lambda A, v: np.cumsum(A * v[None, :], axis=1)[:, -1]
            fold_sq = lambda A: np.cumsum(A * A, axis=1)[:, -1]
            outs = []
            m_norm = np.sqrt(fold_sq(M))
            for j, qid in enumerate(qids):
                mask = ids != qid
                cj, ij = cos[mask, j], ids[mask]
                pre = np.lexsort((ij, -cj))[: k + MARGIN]
                rows = np.flatnonzero(mask)[pre]
                q = Q[j]
                q_norm = np.sqrt(np.cumsum(q * q)[-1])
                exact = np.round(
                    fold_dot(M[rows], q) / (q_norm * m_norm[rows]), 6
                )
                order = np.lexsort((ids[rows], -exact))[:k]
                outs.append(
                    pd.DataFrame(
                        {
                            "query_id": int(qid),
                            "neighbor_id": ids[rows][order],
                            "cosine": exact[order],
                        }
                    )
                )
            yield pd.concat(outs, ignore_index=True)

    partial = embeddings.select("vec_id", "embedding").mapInPandas(
        run, "query_id long, neighbor_id long, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        partial.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rnk")
    )


@register("ann_bruteforce_blas_topk", sql=_ANN_SQL)
def ann_bruteforce_blas_topk(spark, sf):
    return blas_topk(load(spark, sf, "embeddings"))


def blocked_cosine_pairs(
    embeddings: DataFrame, threshold: float, n_blocks: int = 8
) -> DataFrame:
    """Exhaustive cosine-similarity self-join via blocked BLAS — the scale
    path for LOW similarity thresholds.

    Why not LSH here: at this operator's threshold (0.45, angle ~63°) the
    per-hyperplane agreement probability is ~0.65, so ANY sign-LSH banding
    sized for recall~1 generates MORE candidate pairs than the n² it is
    meant to avoid (measured on this corpus: recall-0.99 needs ~24 tables
    of 4 bits => 1.5x all pairs). LSH prefiltering only pays at near-dup
    thresholds (>=0.8); see lsh_topk for that regime. The honest exhaustive
    plan is the classic triangle block-join: split the corpus into B blocks,
    replicate each row to the B+1 block-pairs containing its block (O(n*B)
    shuffle, B chosen so a block pair fits executor memory), and compute
    each block-pair's cosines as ONE numpy matrix multiply — O(n²) work
    with a BLAS constant factor, evenly spread over B(B+1)/2 tasks. No
    BroadcastNestedLoopJoin, no driver involvement.

    Emitted values use the same left-to-right fold arithmetic as the
    DuckDB oracle (np.cumsum rescore of matmul-preselected pairs), so the
    driver's exact value-hash holds; each unordered pair is computed in
    exactly one block-pair group, so results are partitioning-independent.
    """
    import pandas as pd

    spark = embeddings.sparkSession
    bp = spark.createDataFrame(
        [(i, j) for i in range(n_blocks) for j in range(n_blocks) if i <= j],
        "bi int, bj int",
    )
    e = embeddings.select(
        "vec_id", "embedding", F.pmod("vec_id", F.lit(n_blocks)).alias("g")
    )
    left = e.join(F.broadcast(bp), e.g == bp.bi).select(
        "bi", "bj", F.lit("L").alias("side"), "vec_id", "embedding"
    )
    right = e.join(F.broadcast(bp), e.g == bp.bj).select(
        "bi", "bj", F.lit("R").alias("side"), "vec_id", "embedding"
    )
    both = left.unionByName(right)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        bi, bj = int(pdf["bi"].iloc[0]), int(pdf["bj"].iloc[0])
        diag = bi == bj
        if diag:  # diagonal groups carry each row twice (L and R tags)
            lp = rp = pdf[pdf["side"] == "L"]
        else:
            lp, rp = pdf[pdf["side"] == "L"], pdf[pdf["side"] == "R"]
        L = np.array(list(lp["embedding"]), dtype=np.float64)
        R = np.array(list(rp["embedding"]), dtype=np.float64)
        lid, rid = lp["vec_id"].to_numpy(), rp["vec_id"].to_numpy()
        Ln = L / np.clip(np.linalg.norm(L, axis=1, keepdims=True), 1e-30, None)
        Rn = R / np.clip(np.linalg.norm(R, axis=1, keepdims=True), 1e-30, None)
        cos = Ln @ Rn.T
        ii, jj = np.nonzero(cos >= threshold - 1e-9)  # BLAS preselect
        if diag:
            # upper triangle only: each unordered pair exactly once
            keep = lid[ii] < rid[jj]
            ii, jj = ii[keep], jj[keep]
        # off-diagonal: every L x R pair is unique already (disjoint blocks)
        # fold-exact rescore (matches DuckDB LIST_SUM / Spark F.aggregate)
        fold = lambda A: np.cumsum(A, axis=1)[:, -1] if len(A) else np.empty(0)
        dots = fold(L[ii] * R[jj])
        nl = np.sqrt(fold(L[ii] * L[ii]))
        nr = np.sqrt(fold(R[jj] * R[jj]))
        exact = dots / (nl * nr)
        ok = exact >= threshold
        la, rb = lid[ii][ok], rid[jj][ok]
        return pd.DataFrame(
            {
                "a": np.minimum(la, rb),
                "b": np.maximum(la, rb),
                "cosine": np.round(exact[ok], 6),
            }
        )

    return both.groupBy("bi", "bj").applyInPandas(
        kernel, "a long, b long, cosine double"
    )


@register(
    "dedup_embedding_cosine",
    sql="""WITH e AS (SELECT vec_id, LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS v
                      FROM embeddings)
           SELECT a.vec_id AS a, b.vec_id AS b,
                  ROUND(
                    LIST_SUM(LIST_TRANSFORM(LIST_ZIP(a.v, b.v), p -> p[1] * p[2]))
                    / (SQRT(LIST_SUM(LIST_TRANSFORM(a.v, x -> x * x)))
                       * SQRT(LIST_SUM(LIST_TRANSFORM(b.v, x -> x * x)))), 6) AS cosine
           FROM e a JOIN e b ON a.vec_id < b.vec_id
           WHERE LIST_SUM(LIST_TRANSFORM(LIST_ZIP(a.v, b.v), p -> p[1] * p[2]))
                 / (SQRT(LIST_SUM(LIST_TRANSFORM(a.v, x -> x * x)))
                    * SQRT(LIST_SUM(LIST_TRANSFORM(b.v, x -> x * x)))) >= 0.45""",
)
def dedup_embedding_cosine(spark, sf):
    """Embedding near-dup pairs (cosine >= 0.45 on this corpus): blocked
    BLAS exhaustive self-join — see blocked_cosine_pairs for why LSH is the
    wrong prefilter at this threshold and what the 100 TB layout is."""
    return blocked_cosine_pairs(load(spark, sf, "embeddings"), threshold=0.45)
