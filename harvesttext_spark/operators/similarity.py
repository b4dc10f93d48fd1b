"""Similarity search over embedding columns (array<float>).

Engine addition for the training-data pipeline: brute-force cosine top-k as
the correctness baseline, LSH-bucketed (random hyperplane signs) variant as
the 100TB scale path.

All math is JVM-side column arithmetic (``zip_with`` + ``aggregate`` — no
Python in the scoring loop).  The hyperplanes are DETERMINISTIC pseudo-random
vectors derived from md5(plane, dim) so any engine (and any rerun) builds the
identical partitioning — required for resume/lineage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine: broadcast the (small) query set against the
    (huge) vector table — one map-side pass + a top-k window per query.
    -> (query_id, vec_id, cos_sim, rank)."""
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("_qvec")
    )
    scored = vectors.crossJoin(F.broadcast(q)).select(
        query_id_col,
        id_col,
        cosine(F.col(vec_col), F.col("_qvec")).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def _hyperplane(dim: int, plane: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane: component j =
    (md5-derived uniform in [-1, 1)).  Pure function of (plane, j)."""
    import hashlib

    out = []
    for j in range(dim):
        h = hashlib.md5(f"{plane}:{j}".encode()).hexdigest()
        out.append(int(h[:8], 16) / float(2**31) - 1.0)
    return out


def lsh_bucket(vec: Column, dim: int, n_planes: int = 8) -> Column:
    """Sign-bit bucket id from n random hyperplanes -> int in [0, 2^n)."""
    bucket = F.lit(0)
    for p in range(n_planes):
        plane = F.array(*[F.lit(v) for v in _hyperplane(dim, p)])
        bucket = bucket + F.when(dot(vec, plane) > 0, F.lit(2**p)).otherwise(F.lit(0))
    return bucket


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's hyperplane-sign
    bucket (and the 1-bit-flip neighbor buckets, to cut miss rate).  The
    bucket join replaces the cross join — candidate set shrinks ~2^n/(n+1)×.
    """
    v = vectors.withColumn("_bucket", lsh_bucket(F.col(vec_col), dim, n_planes))
    q = queries.select(
        query_id_col,
        F.col(vec_col).alias("_qvec"),
        lsh_bucket(F.col(vec_col), dim, n_planes).alias("_qb"),
    )
    # probe buckets: exact + 1-bit flips
    probes = q.select(
        query_id_col,
        "_qvec",
        F.explode(
            F.array(
                F.col("_qb"),
                *[F.col("_qb").bitwiseXOR(F.lit(2**p)) for p in range(n_planes)],
            )
        ).alias("_bucket"),
    )
    scored = v.join(F.broadcast(probes), "_bucket").select(
        query_id_col,
        id_col,
        cosine(F.col(vec_col), F.col("_qvec")).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


# --- IVF (inverted-file) ANN: the coarse-quantizer scale path ---------------


def train_ivf_centroids(
    vectors: DataFrame,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 10,
) -> DataFrame:
    """Coarse quantizer via Spark ML KMeans (seeded -> deterministic
    centers; kmeans|| init is distributed, no driver-side loop over rows).
    -> (centroid_id int, centroid array<double>)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    ml = vectors.select(array_to_vector(F.col(vec_col)).alias("features"))
    model = KMeans(k=n_centroids, seed=seed, maxIter=max_iter).fit(ml)
    spark = vectors.sparkSession
    centers = [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())]
    return spark.createDataFrame(centers, "centroid_id int, centroid array<double>")


def _assign_centroid(df: DataFrame, centroids: DataFrame, vec_col: str, out: str) -> DataFrame:
    """Nearest centroid by cosine: broadcast join + one max_by aggregate
    (deterministic tie-break on the lower centroid_id; no per-row Python;
    the centroid table is tiny)."""
    scored = df.crossJoin(F.broadcast(centroids)).withColumn(
        "_sim", cosine(F.col(vec_col), F.col("centroid"))
    )
    return scored.groupBy(*df.columns).agg(
        F.max_by(
            "centroid_id",
            F.struct(F.col("_sim").alias("s"), (-F.col("centroid_id")).alias("nid")),
        ).alias(out)
    )


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    centroids: DataFrame | None = None,
    seed: int = 42,
) -> DataFrame:
    """IVF approximate top-k: assign every vector to its nearest coarse
    centroid (ONE pass, broadcast centroid table), then score each query
    only against the inverted lists of its ``n_probe`` nearest centroids.
    Candidate set shrinks ~n_centroids/n_probe x vs brute force; at 100TB
    the assignment is a map-side pass and the probe join shuffles on the
    bounded centroid_id key.  -> (query_id, vec_id, cos_sim, rank)."""
    if centroids is None:
        centroids = train_ivf_centroids(vectors, n_centroids, vec_col, seed)
    centroids = centroids.cache()

    v = _assign_centroid(vectors, centroids, vec_col, "centroid_id")
    # per-query n_probe nearest centroids
    qs = queries.select(query_id_col, F.col(vec_col).alias("_qvec"))
    qprobe = (
        qs.crossJoin(F.broadcast(centroids))
        .withColumn("_sim", cosine(F.col("_qvec"), F.col("centroid")))
        .withColumn(
            "_rk",
            F.row_number().over(
                Window.partitionBy(query_id_col).orderBy(
                    F.desc("_sim"), F.asc("centroid_id")
                )
            ),
        )
        .filter(F.col("_rk") <= n_probe)
        .select(query_id_col, "_qvec", "centroid_id")
    )
    scored = v.join(F.broadcast(qprobe), "centroid_id").select(
        query_id_col,
        id_col,
        cosine(F.col(vec_col), F.col("_qvec")).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
