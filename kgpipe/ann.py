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
LSH_PLANES = 4  # 2^4 buckets; scale this with corpus size (recall knob)
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


def hyperplanes(dims: int, n_planes: int = LSH_PLANES, seed: int = PLANE_SEED) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dims)).round(6).tolist()


def lsh_bucket_col(vec, planes: list[list[float]]) -> F.Column:
    """Bucket key = bit pattern of sign(v·p_i) — data-independent fixed
    hyperplanes, so the same vector always lands in the same bucket on any
    cluster size."""
    key = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        pa = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(
            _dot(vec, pa) > 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
        key = key.bitwiseOR(bit)
    return key


def lsh_topk(
    embeddings: DataFrame,
    query_ids=ANN_QUERY_IDS,
    k: int = ANN_TOPK,
    n_planes: int = LSH_PLANES,
) -> DataFrame:
    """Approximate top-k: candidates restricted to vectors sharing the
    query's hyperplane-sign bucket (equi-join on bucket key)."""
    dims = len(embeddings.select("embedding").first()[0])
    planes = hyperplanes(dims, n_planes)
    with_bucket = embeddings.withColumn(
        "bucket", lsh_bucket_col(F.col("embedding"), planes)
    )
    q = with_bucket.filter(F.col("vec_id").isin(*query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"), "bucket"
    )
    c = with_bucket.select(F.col("vec_id").alias("neighbor_id"), "embedding", "bucket")
    scored = c.join(F.broadcast(q), "bucket").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.select(
            "query_id",
            "neighbor_id",
            F.round(cosine_col(F.col("qv"), F.col("embedding")), 6).alias("cosine"),
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
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
) -> DataFrame:
    """IVF (inverted-file) ANN: a KMeans coarse quantizer assigns every
    vector to a centroid cell; each query probes only its n_probe nearest
    cells, so the scored candidate set is ~n_probe/n_centroids of the
    corpus. Centroids are tiny and live on the driver; the probe list is a
    broadcast join key. At 100 TB: train on a sample, persist centroids as
    a dim table, partition the corpus BY cell so a probe is a partition
    pruning, not a shuffle."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    e = embeddings.select(
        "vec_id",
        "embedding",
        array_to_vector(F.col("embedding").cast("array<double>")).alias("fv"),
    )
    model = KMeans(
        k=n_centroids, seed=PLANE_SEED, featuresCol="fv", predictionCol="cell"
    ).fit(e)
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

    def run(batches):
        for pdf in batches:
            M = np.array(list(pdf["embedding"]), dtype=np.float64)
            ids = pdf["vec_id"].to_numpy()
            Mn = M / np.clip(np.linalg.norm(M, axis=1, keepdims=True), 1e-30, None)
            cos = np.round(Mn @ Qn.T, 6)  # (batch, nq)
            outs = []
            for j, qid in enumerate(qids):
                mask = ids != qid
                cj, ij = cos[mask, j], ids[mask]
                order = np.lexsort((ij, -cj))[:k]
                outs.append(
                    pd.DataFrame(
                        {
                            "query_id": int(qid),
                            "neighbor_id": ij[order],
                            "cosine": cj[order],
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
    """Embedding near-dup pairs (cosine >= 0.45 on this corpus; production
    threshold ~0.95 with an LSH pre-filter — this exercises the exact path)."""
    e = load(spark, sf, "embeddings")
    a = e.select(F.col("vec_id").alias("a"), F.col("embedding").alias("va"))
    b = e.select(F.col("vec_id").alias("b"), F.col("embedding").alias("vb"))
    cos = cosine_col(F.col("va"), F.col("vb"))
    return (
        a.join(b, F.col("a") < F.col("b"))
        .withColumn("cosine", F.round(cos, 6))
        .filter(cos >= 0.45)
        .select("a", "b", "cosine")
    )
