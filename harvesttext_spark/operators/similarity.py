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
