"""Similarity search over embedding columns (``array<float>``).

Two tiers, per the usual ANN playbook:

- **Brute-force cosine** (`cosine_topk`, `cosine_pairs`): exact, O(N·Q).
  The dot product is a single Catalyst ``aggregate`` over zipped arrays —
  JVM-side, no Python. Right answer for verification, small query sets, and
  as the within-bucket scorer for the bucketed tier.
- **Hyperplane-LSH bucketed ANN** (`lsh_ann_topk`): random-hyperplane
  signatures (SimHash for vectors) shard vectors into buckets; queries only
  score their own bucket (plus optional multi-probe neighbors). At 100 TB
  this is the difference between a full cross join and a bucket-local join:
  shuffle is on the bucket key, each bucket is independent, and recall is
  tunable by signature bits / probes.

All math is on doubles with a fixed left-to-right summation order so an
external engine (DuckDB oracle) reproduces values bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# deterministic pseudo-random hyperplanes: plane p, dim d weight =
# sin(1 + (p * 7919 + d * 104729) mod 10007) — engine-portable (no RNG)
_LSH_MOD = 10007


def _dot(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: F.Column) -> F.Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: F.Column, b: F.Column) -> F.Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
) -> DataFrame:
    """All pairs with cosine ≥ threshold (exact, cross-join).

    Output: (id_a, id_b, cosine), id_a < id_b. Quadratic — use only on
    bounded inputs or after LSH bucketing.
    """
    a = df.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"), _norm(F.col(vec_col)).alias("_na")
    )
    b = df.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"), _norm(F.col(vec_col)).alias("_nb")
    )
    # norms precomputed once per row (not once per pair): same arithmetic,
    # O(N·d) instead of O(N²·d) norm work
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", _dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    k: int = 10,
) -> DataFrame:
    """Exact top-k neighbors per query by cosine (brute force).

    Output: (query_id, neighbor_id, cosine, rank). Deterministic tie-break
    on neighbor id. Queries should be small enough to broadcast — Catalyst
    chooses broadcast-nested-loop for the cross join automatically when they
    are.
    """
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("_vq"),
        _norm(F.col(vec_col)).alias("_nq"),
    )
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_vn"),
        _norm(F.col(vec_col)).alias("_nn"),
    )
    scored = (
        F.broadcast(q)
        .crossJoin(v)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", _dot(F.col("_vq"), F.col("_vn")) / (F.col("_nq") * F.col("_nn")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def hyperplane_signature(vec_col: F.Column, dim: int, planes: int = 8) -> F.Column:
    """Random-hyperplane LSH signature (bigint in [0, 2^planes)).

    Bit p = 1 iff Σ_d v[d]·w(p,d) > 0 with the deterministic weights above.
    Pure expression — usable for bucketing in any join/groupBy.
    """
    sig = None
    for p in range(planes):
        proj = F.aggregate(
            F.zip_with(
                vec_col,
                F.array(*[
                    F.sin(F.lit(1.0 + ((p * 7919 + d * 104729) % _LSH_MOD)))
                    for d in range(dim)
                ]),
                lambda x, w: x.cast("double") * w,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bit = F.when(proj > 0, F.lit(2**p).cast("long")).otherwise(F.lit(0).cast("long"))
        sig = bit if sig is None else (sig + bit)
    return sig


def ivf_ann_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    k: int = 10,
    n_lists: int = 16,
    n_probes: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: KMeans coarse quantizer.

    Index phase: cluster all vectors into ``n_lists`` cells (Spark ML
    KMeans, seeded → deterministic); each vector is assigned to its cell.
    Query phase: each query scores only the vectors in its ``n_probes``
    nearest cells. The scoring join is an equi-join on the cell id — the
    same no-cross-join property as the LSH variant, but with data-adaptive
    cells (much better recall than hyperplanes on clustered embeddings).

    At 100 TB the index phase is one KMeans fit over a sample + one
    assignment pass, and cell ids become the table's bucketing/partition
    key so probes prune at the scan.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    vec = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_vn"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    km = KMeans(k=n_lists, seed=seed, featuresCol="features", predictionCol="_cell")
    model = km.fit(vec)
    assigned = model.transform(vec).select(
        "neighbor_id", "_vn", F.col("_cell"), _norm(F.col("_vn")).alias("_nn")
    )

    # query → n_probes nearest centroids (centroids are tiny: broadcast math)
    centers = [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())]
    centers_df = F.broadcast(
        vectors.sparkSession.createDataFrame(centers, "cell int, center array<double>")
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("_vq"),
        _norm(F.col(vec_col)).alias("_nq"),
    )
    q_cells = (
        q.crossJoin(centers_df)
        .withColumn(
            "_dist",
            F.aggregate(
                F.zip_with(
                    F.col("_vq"), F.col("center"), lambda x, c: (x.cast("double") - c) ** 2
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
        )
        .withColumn(
            "_rk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.asc("_dist"), F.asc("cell"))
            ),
        )
        .filter(F.col("_rk") <= n_probes)
        .select("query_id", "_vq", "_nq", F.col("cell").alias("_cell"))
    )

    scored = (
        q_cells.join(assigned, "_cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("cosine", _dot(F.col("_vq"), F.col("_vn")) / (F.col("_nq") * F.col("_nn")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def lsh_ann_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    dim: int,
    k: int = 10,
    planes: int = 8,
    probes: int = 1,
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's LSH bucket(s).

    Multi-probe: each query also searches the buckets whose signature
    differs by ≤ ``probes`` flipped bits (probes=1 → planes+1 buckets out
    of 2^planes), trading a linear factor in probed buckets for a large
    recall gain — the standard remedy for LSH on weakly-clustered data.

    Same output shape as ``cosine_topk``. The join is a bucket-key
    equi-join — shuffle on the signature, never a cross join, which is what
    survives a 100 TB corpus; only the small query side fans out per probe.
    """
    sig_v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_vn"),
        _norm(F.col(vec_col)).alias("_nn"),
        hyperplane_signature(F.col(vec_col), dim, planes).alias("_sig"),
    )
    base_sig = hyperplane_signature(F.col(vec_col), dim, planes)
    probe_sigs = [base_sig]
    if probes >= 1:
        probe_sigs += [base_sig.bitwiseXOR(F.lit(1 << p).cast("long")) for p in range(planes)]
    if probes >= 2:
        probe_sigs += [
            base_sig.bitwiseXOR(F.lit((1 << p) | (1 << q)).cast("long"))
            for p in range(planes)
            for q in range(p + 1, planes)
        ]
    sig_q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("_vq"),
        _norm(F.col(vec_col)).alias("_nq"),
        F.explode(F.array(*probe_sigs)).alias("_sig"),
    )
    scored = (
        sig_q.join(sig_v, "_sig")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("cosine", _dot(F.col("_vq"), F.col("_vn")) / (F.col("_nq") * F.col("_nn")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
