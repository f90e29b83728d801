"""Stage D: canonicalization of unlinked surfaces.

Reference analog: scoregraph's pairwise creator-name deduplication — an
O(n²) loop over name pairs (SURVEY.md §0.3). At 10^12-turn scale that is
impossible, so per BASELINE.json: "candidate canonicalization via
MinHash-LSH blocking plus GraphFrames/iterative-join connected components".
GraphFrames is absent in the sandbox (SURVEY.md §0.5), so connected
components is the iterative-join min-label-propagation variant with
per-round localCheckpoint to truncate lineage.

Everything up to the pair list is Spark-builtin expressions (engine-neutral
md5-prefix MinHash, kgpipe/nhash.py — JVM-side, deterministic,
whole-stage-codegen friendly); zero Python on this path. The hash family
was switched from xxhash64 to the md5-affine scheme in round 3 so the
signature values themselves are reproducible by an external SQL engine
(the DuckDB oracle) — one md5 per shingle fans out to all hash functions
via integer multiply-adds, so the swap is performance-neutral (measured;
see kgqueries.py oracle-ability header).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import nhash
from .rules import JACCARD_THRESHOLD, LSH_BANDS, MINHASH_HASHES, SHINGLE_K

# one affine (A, B) pair per MinHash function, fixed-seed deterministic;
# the SAME literals are embedded in the oracle SQL (kgqueries.py)
MH_AFFINE = nhash.affine_params(MINHASH_HASHES)


def shingles_col(col: str, k: int = SHINGLE_K):
    """array of distinct char k-shingles of a (normalized) string column —
    pure SQL `transform(sequence(...), substring(...))`, no UDF."""
    return F.array_distinct(
        F.expr(
            f"CASE WHEN length({col}) < {k} THEN array({col}) "
            f"ELSE transform(sequence(0, length({col}) - {k}), i -> substring({col}, i + 1, {k})) END"
        )
    )


def minhash_signatures(surfaces: DataFrame, n_hashes: int = MINHASH_HASHES) -> DataFrame:
    """surfaces[surface] -> one row per surface with mh_0..mh_{n-1}.

    MinHash_i(s) = min over shingles of (A_i * baseP(shingle) + B_i) % P —
    ONE engine-neutral md5-prefix base hash per shingle, fanned out to all
    n hash functions by modular affine permutations (classic universal-
    hashing MinHash). All builtins, deterministic across runs and cluster
    sizes (never Python hash()), and value-reproducible in the DuckDB
    oracle (kgpipe/nhash.py)."""
    assert n_hashes <= len(MH_AFFINE), (
        f"n_hashes={n_hashes} exceeds the {len(MH_AFFINE)} frozen affine "
        "pairs (MH_AFFINE) — raise MINHASH_HASHES in rules.py so the params "
        "(and the oracle SQL literals) are regenerated together"
    )
    ex = surfaces.select(
        "surface", F.explode(shingles_col("surface")).alias("sh")
    ).select("surface", nhash.basep_col(F.col("sh")).alias("hb"))
    aggs = [
        F.min(nhash.affine_col(F.col("hb"), a, b)).alias(f"mh_{i}")
        for i, (a, b) in enumerate(MH_AFFINE[:n_hashes])
    ]
    return ex.groupBy("surface").agg(*aggs)


def lsh_bands(sig: DataFrame, n_hashes: int = MINHASH_HASHES, bands: int = LSH_BANDS) -> DataFrame:
    """Reshape signature to (surface, band_id, band_hash) rows. With 2 rows
    per band the band key is the INJECTIVE pairing mh1 * P + mh2 (< 2^62)
    — no hash, no collisions, reproducible in SQL."""
    rows = n_hashes // bands
    assert rows == 2, "injective band pairing assumes 2 rows per band"
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                nhash.band_key_col(
                    F.col(f"mh_{b * rows}"), F.col(f"mh_{b * rows + 1}")
                ).alias("band_hash"),
            )
            for b in range(bands)
        ]
    )
    return sig.select("surface", F.explode(band_structs).alias("band")).select(
        "surface", "band.band_id", "band.band_hash"
    )


def candidate_pairs(surfaces: DataFrame) -> DataFrame:
    """LSH blocking self-join -> verified candidate edges (a, b) with exact
    char-shingle Jaccard >= JACCARD_THRESHOLD.

    The self-join is an EQUI-join on (band_id, band_hash) — blocking keys —
    never a nested loop (SURVEY.md §2(c) join_theta_selfjoin_lsh).
    """
    # surfaces feeds three branches of this DAG (signature + both shingle
    # sides of the verify join); Spark does not dedupe common subplans, so
    # persist or the upstream distinct executes three times per action
    surfaces = surfaces.persist()
    sig = minhash_signatures(surfaces)
    bands = lsh_bands(sig)
    left = bands.select(
        F.col("surface").alias("a"), "band_id", "band_hash"
    )
    right = bands.select(
        F.col("surface").alias("b"), "band_id", "band_hash"
    )
    pairs = (
        left.join(right, ["band_id", "band_hash"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    sha = surfaces.select(
        F.col("surface").alias("a"), shingles_col("surface").alias("sh_a")
    )
    shb = surfaces.select(
        F.col("surface").alias("b"), shingles_col("surface").alias("sh_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = (F.size("sh_a") + F.size("sh_b")).cast("double") - inter
    jac = F.when(union > 0, inter / union).otherwise(F.lit(1.0))
    return (
        pairs.join(sha, "a")
        .join(shb, "b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= F.lit(float(JACCARD_THRESHOLD)))
        .select("a", "b", "jaccard")
    )


# Below this many (symmetrized) edges the component graph fits trivially on
# the driver: a collect + union-find costs one job instead of K iterations x
# 2 shuffles. Above it, the iterative-join path scales arbitrarily.
DRIVER_CC_MAX_EDGES = 200_000

# Below this many distinct unlinked surfaces, exact all-pairs Jaccard on the
# driver beats the distributed LSH chain: the MinHash/banding/verify DAG is
# ~10 shuffle stages whose scheduling overhead (~3-4 s measured) dwarfs the
# actual work when the surface set is tiny — the common case, since unlinked
# surfaces are the dictionary MISSES, not the corpus. 1000 surfaces =
# ~500k pairs of set-intersections, well under a second of driver CPU.
# Above it, candidate_pairs (LSH blocking, equi-joins only) scales
# arbitrarily. Same hybrid-design precedent as DRIVER_CC_MAX_EDGES; the
# all-pairs form is exactly the pandas/SQL oracle semantics, so on corpora
# where LSH recall is total (tested) the two paths emit identical edges.
DRIVER_ALLPAIRS_MAX_SURFACES = 1_000


def _driver_allpairs_edges(surfaces: DataFrame) -> DataFrame:
    """Small-set fast path: exact char-shingle Jaccard over all pairs,
    computed on the driver with the shared rule-set functions."""
    from .rules import JACCARD_THRESHOLD, char_shingles, jaccard

    names = sorted(r["surface"] for r in surfaces.collect())
    sh = {s: char_shingles(s) for s in names}
    rows = []
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            j = jaccard(sh[a], sh[b])
            if j >= JACCARD_THRESHOLD:
                rows.append((a, b, float(j)))
    spark = surfaces.sparkSession
    return spark.createDataFrame(rows, "a string, b string, jaccard double")


def _driver_union_find(sym: DataFrame) -> DataFrame:
    """Small-graph fast path: same min-label semantics as the loop."""
    rows = sym.collect()
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        p = parent.setdefault(x, x)
        while p != x:
            parent[x] = p = parent.setdefault(p, p)
            x, p = p, parent[p]
        return x

    for r in rows:
        ra, rb = find(r["src"]), find(r["dst"])
        if ra != rb:
            lo, hi = sorted((ra, rb))
            parent[hi] = lo
    out = [(n, find(n)) for n in parent]
    return sym.sparkSession.createDataFrame(out, "node string, component string")


def connected_components(edges: DataFrame, max_iter: int = 25) -> DataFrame:
    """Connected components: min-label propagation.

    labels converge to the lexicographically smallest surface in each
    component — the same representative rule as oracle.UnionFind.

    Hybrid execution (both paths produce identical labels, tested):
    - edge set under DRIVER_CC_MAX_EDGES: collect + union-find on the
      driver (one job; the K-iteration loop is pure overhead there);
    - otherwise the iterative-join loop: per round, join labels across
      symmetrized edges and take the min neighbor label, localCheckpoint
      truncating lineage so plans stay O(1) per round. Parallelism is
      sized to the edge count, not the global shuffle setting.

    Returns DataFrame[node, component]. Nodes appearing in no edge are NOT
    returned (callers treat missing as singleton = itself).
    """
    sym = edges.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
        edges.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    # the count decides the execution path and the collect/loop reuses the
    # edge chain — persist so the (expensive) LSH chain runs exactly once
    sym = sym.persist()
    n_edges = sym.count()
    if n_edges <= DRIVER_CC_MAX_EDGES:
        out = _driver_union_find(sym)
        sym.unpersist()
        # consumers (stage_canon) can broadcast these labels: node count is
        # bounded by 2x the edge count we just measured
        out._kg_cc_small = True
        return out
    spark = edges.sparkSession
    max_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    n_parts = max(1, min(max_parts, n_edges // 100_000 + 1))
    sym = sym.repartition(n_parts, "dst").localCheckpoint()
    nodes = sym.select(F.col("src").alias("node")).distinct()
    labels = nodes.withColumn("component", F.col("node")).repartition(
        n_parts, "node"
    ).localCheckpoint()
    for _ in range(max_iter):
        neigh = (
            sym.join(labels, sym.dst == labels.node)
            .groupBy("src")
            .agg(F.min("component").alias("nmin"))
        )
        # convergence flag computed IN the propagation pass: new label =
        # least(old, nmin), so "changed" is exactly nmin < old — carrying
        # it as a column means the check is a filter over the freshly
        # checkpointed blocks instead of the old new-vs-old label JOIN
        # (round 3 shape), which cost one extra shuffle job per iteration
        # at both cluster sizes — pure serial-latency tax on the 4N level.
        new_labels = (
            labels.join(neigh, labels.node == neigh.src, "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nmin"), F.col("component"))
                ).alias("component"),
                (
                    F.coalesce(F.col("nmin"), F.col("component"))
                    < F.col("component")
                ).alias("_chg"),
            )
        )
        new_labels = new_labels.localCheckpoint()
        changed = new_labels.filter(F.col("_chg")).limit(1).count()
        labels = new_labels.drop("_chg")
        if changed == 0:
            break
    return labels


def unlinked_surfaces(linked: DataFrame) -> DataFrame:
    """Distinct surface strings Stage C could not link (subj or obj side).

    THE definition of Stage D's input population — shared by stage_canon
    and the registry's stage cache (kgqueries._stage) so the driver
    entries can never diverge from the pipeline; the DuckDB oracle's
    `unl` CTE mirrors it in SQL.
    """
    return (
        linked.filter((F.col("subj_kind") == "surface") & F.col("subj_link").isNull())
        .select(F.col("subj_raw").alias("surface"))
        .unionByName(
            linked.filter(
                (F.col("obj_kind") == "surface") & F.col("obj_link").isNull()
            ).select(F.col("obj_raw").alias("surface"))
        )
        .distinct()
    )


def stage_canon(linked: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Resolve unlinked surfaces to component representatives.

    Input: Stage C output (…, subj_raw/obj_raw, subj_kind/obj_kind,
    subj_link/obj_link). Output: (triples with final subj/obj, cc_labels).
    """
    unlinked = unlinked_surfaces(linked).persist()
    n_unl = unlinked.count()
    if n_unl <= DRIVER_ALLPAIRS_MAX_SURFACES:
        # pure-driver fast path: all-pairs edges AND union-find on the one
        # collected surface list. The round-3 shape built a driver edge
        # DataFrame only for connected_components to re-count and
        # re-collect it — ~5 near-empty Spark jobs whose scheduling
        # latency (measured: 3.2 s at BOTH levels of the 1M ckpt probe,
        # BENCH/profile_ckpt16M.py) is a pure Amdahl tax on the 4N level
        # of the production scaling pair (ckpt Stage D scaled 0.53 in r3).
        # Semantics are identical to _driver_allpairs_edges +
        # _driver_union_find (same shingle/jaccard/min-label code, order-
        # independent result); both remain the distributed path's oracle
        # twins in tests.
        from .rules import char_shingles, jaccard

        names = sorted(r["surface"] for r in unlinked.collect())
        unlinked.unpersist()  # collected already; nothing downstream reads it
        sh = {s: char_shingles(s) for s in names}
        parent: dict[str, str] = {}

        def find(x: str) -> str:
            p = parent.setdefault(x, x)
            while p != x:
                parent[x] = p = parent.setdefault(p, p)
                x, p = p, parent[p]
            return x

        for i, a in enumerate(names):
            for b in names[i + 1 :]:
                if jaccard(sh[a], sh[b]) >= JACCARD_THRESHOLD:
                    ra, rb = find(a), find(b)
                    if ra != rb:
                        lo, hi = sorted((ra, rb))
                        parent[hi] = lo
        label_rows = [(n, find(n)) for n in parent]
        cc = linked.sparkSession.createDataFrame(
            label_rows, "node string, component string"
        )
        cc._kg_cc_small = True
    else:
        edges = candidate_pairs(unlinked)  # lazy — keep unlinked persisted
        cc = connected_components(edges)

    # canon_rewrite: two joins against cc_labels (subj then obj); missing
    # nodes stay themselves (singleton components). When CC ran on the
    # driver (edge count measured small) the label table is tiny — without
    # the explicit broadcast hint Spark planned these as SortMergeJoins,
    # i.e. two full shuffles + sorts of the ENTIRE triple set against a
    # few-hundred-row table (measured: the bulk of stage D wall). Above the
    # driver threshold the label table can be arbitrarily large, so it
    # stays a shuffle join there.
    hint = F.broadcast if getattr(cc, "_kg_cc_small", False) else (lambda df: df)
    subj_cc = hint(
        cc.select(F.col("node").alias("_s_node"), F.col("component").alias("_s_comp"))
    )
    obj_cc = hint(
        cc.select(F.col("node").alias("_o_node"), F.col("component").alias("_o_comp"))
    )
    out = (
        linked.join(subj_cc, linked.subj_raw == F.col("_s_node"), "left")
        .join(obj_cc, linked.obj_raw == F.col("_o_node"), "left")
        .select(
            F.coalesce(
                "subj_link",
                F.when(F.col("subj_kind") == "node", F.col("subj_raw")),
                "_s_comp",
                "subj_raw",
            ).alias("subj"),
            "pred",
            F.coalesce(
                "obj_link",
                F.when(F.col("obj_kind") == "node", F.col("obj_raw")),
                "_o_comp",
                "obj_raw",
            ).alias("obj"),
            "conv_id",
            "turn_idx",
            "rule_id",
        )
    )
    return out, cc
