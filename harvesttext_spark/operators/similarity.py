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


def brute_force_topk_blas(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine, BLAS scoring path (the 100 TB shape).

    The HOF variant (``brute_force_topk``) evaluates its aggregate/zip_with
    lambdas INTERPRETED — the same no-codegen pattern that cost 14x on the
    MinHash signature fold.  Here the (small, bounded) query set is
    collected to the driver ONCE as a numpy matrix — the same bounded-
    dimension read as the IVF centroid table — broadcast, and every Arrow
    batch is scored with one float64 matmul.  Each batch emits only its
    LOCAL top-k per query, so the final shuffle carries
    ``n_batches * nq * k`` rows instead of ``n_vectors * nq``; the global
    window then picks the true top-k.  Ranking contract identical to
    brute_force_topk (cos desc, id asc tie-break); cosine VALUES can
    differ from the left-associative HOF fold in the last ulp only, which
    is why the value-oracle queries keep the HOF path (fold-order
    contract) while pipelines get this one.
    -> (query_id, vec_id, cos_sim, rank)."""
    import numpy as np

    id_type = dict(vectors.dtypes).get(id_col, "bigint")
    q_type = dict(queries.dtypes).get(query_id_col, "bigint")
    qrows = queries.select(query_id_col, vec_col).collect()
    if not qrows:
        # mirror the real output schema (string ids etc.) so an empty
        # query set doesn't flip dtypes and break downstream unions
        return vectors.sparkSession.createDataFrame(
            [], f"{query_id_col} {q_type}, {id_col} {id_type}, cos_sim double, rank int"
        )
    qids = np.array([r[0] for r in qrows])
    qmat = np.array([r[1] for r in qrows], dtype=np.float64)
    qmat = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    bc = vectors.sparkSession.sparkContext.broadcast((qids, qmat))

    def score(batches):
        import pandas as pd

        qids_, qmat_ = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy()
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            np.divide(mat, norms, out=mat, where=norms != 0)
            sims = mat @ qmat_.T  # (batch, nq)
            kk = min(k, len(ids))
            out_q, out_id, out_s = [], [], []
            for qi in range(len(qids_)):
                col = sims[:, qi]
                # local top-k with the (cos desc, id asc) tie-break
                order = np.lexsort((ids, -col))[:kk]
                out_q.extend([qids_[qi]] * len(order))
                out_id.extend(ids[order])
                out_s.extend(col[order])
            yield pd.DataFrame(
                {query_id_col: out_q, id_col: out_id, "cos_sim": out_s}
            )

    scored = vectors.select(id_col, vec_col).mapInPandas(
        score, schema=f"{query_id_col} {q_type}, {id_col} {id_type}, cos_sim double"
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def lsh_topk_blas(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k, BLAS path: bucketing, probe matching, AND
    scoring all happen in ONE mapInPandas pass — each Arrow batch
    computes its sign-bit buckets with a single matmul against the
    broadcast hyperplane matrix, looks up which queries probe each
    bucket (exact + 1-bit flips, same probe policy as ``lsh_topk``),
    scores only those (row, query) candidates with numpy, and emits the
    batch-local top-k per query.  Zero shuffle until the final tiny
    global top-k window (batches*nq*k rows).

    vs ``lsh_topk``: that shape pays 8 interpreted HOF dot folds per
    vector for bucketing plus per-pair HOF cosines (~5s at 1M x 32q);
    this one measured ~5x faster.  Bucket bits can differ from the HOF
    fold in the measure-zero dot==0 boundary case (summation order) —
    the ann_lsh_topk value oracle therefore stays on the HOF path, and
    this is the pipeline variant (the brute_force_topk_blas precedent)."""
    import numpy as np

    planes = np.array(
        [_hyperplane(dim, p) for p in range(n_planes)], dtype=np.float64
    )  # (n_planes, dim)
    id_type = dict(vectors.dtypes).get(id_col, "bigint")
    q_type = dict(queries.dtypes).get(query_id_col, "bigint")
    qrows = queries.select(query_id_col, vec_col).collect()
    if not qrows:
        # mirror the real output schema (string ids etc.) so an empty
        # query set doesn't flip dtypes and break downstream unions
        return vectors.sparkSession.createDataFrame(
            [], f"{query_id_col} {q_type}, {id_col} {id_type}, cos_sim double, rank int"
        )
    qids = np.array([r[0] for r in qrows])
    qmat = np.array([r[1] for r in qrows], dtype=np.float64)
    qbits = (qmat @ planes.T > 0).astype(np.int64)
    qbuckets = qbits @ (1 << np.arange(n_planes))
    # probe map: bucket value -> query indices probing it (exact + flips)
    probe_map: dict = {}
    for qi, qb in enumerate(qbuckets):
        for b in [int(qb)] + [int(qb) ^ (1 << p) for p in range(n_planes)]:
            probe_map.setdefault(b, []).append(qi)
    qnorm = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    bc = vectors.sparkSession.sparkContext.broadcast(
        (qids, qnorm, probe_map, planes)
    )

    def score(batches):
        import pandas as pd

        qids_, qnorm_, pm_, planes_ = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy()
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            buckets = ((mat @ planes_.T > 0).astype(np.int64)) @ (
                1 << np.arange(len(planes_))
            )
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            np.divide(mat, norms, out=mat, where=norms != 0)
            out_q, out_id, out_s = [], [], []
            for b in np.unique(buckets):
                qis = pm_.get(int(b))
                if not qis:
                    continue
                rows = np.nonzero(buckets == b)[0]
                sub = mat[rows]
                sims = sub @ qnorm_[qis].T  # (rows, len(qis))
                kk = min(k, len(rows))
                for j, qi in enumerate(qis):
                    col = sims[:, j]
                    order = np.lexsort((ids[rows], -col))[:kk]
                    sel = rows[order]
                    out_q.extend([qids_[qi]] * len(sel))
                    out_id.extend(ids[sel])
                    out_s.extend(col[order])
            yield pd.DataFrame(
                {query_id_col: out_q, id_col: out_id, "cos_sim": out_s}
            )

    scored = vectors.select(id_col, vec_col).mapInPandas(
        score, schema=f"{query_id_col} {q_type}, {id_col} {id_type}, cos_sim double"
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


def fixture_centroids(
    spark, dim: int = 64, n_centroids: int = 8, plane_base: int = 9000
) -> DataFrame:
    """Deterministic pseudo-random coarse-quantizer fixture: md5-derived
    components from the SAME generator as the LSH hyperplanes, in a
    disjoint plane namespace (9000+).  Exists so the IVF assign/probe/
    score machinery can be value-oracled in SQL (centroid literals embed
    in the oracle the way ann_lsh pins its plane constants); production
    paths train KMeans (``train_ivf_centroids``) — trained-quantizer
    recall stays pytest-gated.  ``plane_base`` picks the namespace so
    independent fixtures (e.g. semdedup's level-2 residual splitter at
    9500+) never share planes with the default 9000+ set."""
    rows = [(j, _hyperplane(dim, plane_base + j)) for j in range(n_centroids)]
    return spark.createDataFrame(rows, "centroid_id int, centroid array<double>")


def pairwise_cosine_udf():
    """Arrow-batched rowwise cosine over two array columns (one numpy
    einsum per batch).  The engine scoring path for candidate pairs: the
    HOF ``cosine`` fold evaluates interpreted (measured 29x slower than
    BLAS at 1M vectors x 32 queries, tools/bench_similarity.py) and is
    kept only where a DuckDB value oracle pins its left-associative float
    fold order (brute_force_topk, lsh_topk)."""
    import numpy as np
    import pandas as pd

    # no type hints: module-level `from __future__ import annotations`
    # stringifies them and pyspark's hint-inference then rejects the
    # signature — returnType alone selects the scalar Arrow eval type
    @F.pandas_udf("double")
    def _cos(a, b):
        if not len(a):
            return pd.Series([], dtype="float64")
        A = np.stack(a.to_numpy()).astype(np.float64)
        B = np.stack(b.to_numpy()).astype(np.float64)
        num = np.einsum("ij,ij->i", A, B)
        den = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            return pd.Series(num / den)

    return _cos


def _assign_centroid(df: DataFrame, centroids: DataFrame, vec_col: str, out: str) -> DataFrame:
    """Nearest centroid by cosine — ONE map-side numpy pass, ZERO shuffle.

    The centroid table is a bounded dimension (it already originates on
    the driver): collect + broadcast it as a normalized float64 matrix,
    then argmax each Arrow batch with one matmul.  Replaces the previous
    crossJoin + groupBy(max_by) shape, which shuffled n_vectors x
    n_centroids rows and scored each with the interpreted HOF fold.
    Tie-break: numpy argmax takes the FIRST maximal entry = lowest
    centroid_id (centroids sorted by id), matching the old max_by order."""
    import numpy as np

    from pyspark.sql.types import IntegerType, StructField, StructType

    crows = sorted(centroids.collect(), key=lambda r: r["centroid_id"])
    cids = np.array([r["centroid_id"] for r in crows], dtype=np.int64)
    cmat = np.array([r["centroid"] for r in crows], dtype=np.float64)
    cmat = cmat / np.linalg.norm(cmat, axis=1, keepdims=True)
    bc = df.sparkSession.sparkContext.broadcast((cids, cmat))
    cols = list(df.columns)

    def assign(batches):
        cids_, cmat_ = bc.value
        CT = cmat_.T
        # row-chunk the scores gemm: a full batch x k score matrix is
        # rows*k*8 bytes — at the job's 2^16-centroid ceiling a 10k-row
        # Arrow batch would materialize 5.2 GB PER WORKER (measured: 32
        # workers OOM-killed the box at 6.5M pages).  Bound each chunk
        # to ~64 MB whatever k is, same rule as semdedup's scan gemm.
        block = max(8, (8 << 20) // max(len(cids_), 1))
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            np.divide(mat, norms, out=mat, where=norms != 0)
            best = np.empty(len(mat), dtype=np.int64)
            for r0 in range(0, len(mat), block):
                r1 = min(r0 + block, len(mat))
                best[r0:r1] = np.argmax(mat[r0:r1] @ CT, axis=1)
            pdf = pdf.copy()
            pdf[out] = cids_[best].astype("int32")
            yield pdf

    schema = StructType(df.schema.fields + [StructField(out, IntegerType())])
    return df.mapInPandas(assign, schema=schema)


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

    pcos = pairwise_cosine_udf()
    v = _assign_centroid(vectors, centroids, vec_col, "centroid_id")
    # per-query n_probe nearest centroids
    qs = queries.select(query_id_col, F.col(vec_col).alias("_qvec"))
    qprobe = (
        qs.crossJoin(F.broadcast(centroids))
        .withColumn("_sim", pcos(F.col("_qvec"), F.col("centroid")))
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
        pcos(F.col(vec_col), F.col("_qvec")).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
