"""SemDedup — embedding-space semantic deduplication (Abbas et al.
2023, "SemDedup: Data-efficient learning at web-scale through semantic
deduplication"): cluster the corpus embeddings with a coarse quantizer,
then WITHIN each cluster drop every item whose cosine similarity to an
already-kept item exceeds a threshold.  Catches paraphrase/boilerplate
near-dups that survive every lexical stage (exact, MinHash, SimHash,
substring) because the overlapping *tokens* differ while the meaning —
and the embedding — does not.

Determinism recast: the paper sorts cluster members by distance to the
centroid and keeps the first of each near-dup ball; ties and float
wobble make that order fragile across engines, so the engine uses the
id-ordered variant (the paragraph_dedup / band-cap keep-first
precedent):

    cluster(v) = argmax_c cos(v, centroid_c)      [first-max tie-break]
    keep(v)    = NOT EXISTS u: cluster(u) = cluster(v)
                 AND id(u) < id(v) AND cos(u, v) >= threshold

Note keep-first is evaluated against ALL smaller-id members (kept or
not) — a one-pass anti-join semantics rather than the sequential greedy
scan (which cannot be expressed without a per-cluster ordered fold).
For transitively-similar balls both rules keep the minimum id; they
differ only on chains where cos(a,b) >= t and cos(b,c) >= t but
cos(a,c) < t — the one-pass rule drops c (b vouches for it), the
greedy rule keeps it.  The one-pass form is the standard large-scale
implementation (it is exactly how MinHash band dedup consumes pairs)
and is SQL-expressible, so the whole pipeline carries an exact value
oracle (``semdedup`` in __spark_entry__.py, fixture-centroid literals
per the ann_ivf_topk precedent).

Scale shape: assignment is ONE zero-shuffle broadcast-centroid Arrow
pass (similarity._assign_centroid); the pair scan shuffles each vector
ONCE on centroid_id and runs one normalized gemm per cluster — the
point of clustering first is that k grows with N holding cluster size
C bounded, so total pair work is O(N * C) with BLAS constants.  For adversarial hot clusters
(a template family collapsing to one embedding) ``max_cluster_df``
caps the smaller-id REFERENCE side per cluster, mirroring the MinHash
``max_band_df`` guard: under-cap clusters are bit-identical, oversized
clusters compare each member against the cap smallest ids only (a
member can only be vouched for by a smaller id, so trimming the
reference side never creates false drops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from harvesttext_spark.operators.similarity import _assign_centroid

THRESHOLD = 0.95  # paper ballpark for web text (they sweep 0.9-0.999)


def word_hash_embedding_udf(dim: int = 64):
    """Deterministic signed word-hash embedding (feature hashing with a
    sign channel, Weinberger et al. 2009) as an Arrow-batched pandas
    UDF: bucket = md5(word)[:8] % dim, sign = parity of the next md5
    nibble, counts L2-normalized.  The job-stage embedder when no model
    embedding column exists — md5-derived like every other engine hash
    (no rand(), resume-deterministic), and one numpy pass per batch.
    All-empty/NULL texts embed to the zero vector (which matches
    nothing in the scanner — zero rows score sim 0 — and is kept)."""
    import hashlib

    import numpy as np
    import pandas as pd

    # no type hints: module-level `from __future__ import annotations`
    # stringifies them and pyspark's hint-inference rejects the signature
    @F.pandas_udf("array<float>")
    def _emb(texts):
        out = []
        for t in texts:
            v = np.zeros(dim, dtype=np.float64)
            if isinstance(t, str) and t:
                for w in t.lower().split():
                    h = hashlib.md5(w.encode("utf-8")).hexdigest()
                    b = int(h[:8], 16) % dim
                    v[b] += 1.0 if int(h[8], 16) % 2 == 0 else -1.0
            n = float(np.linalg.norm(v))
            if n > 0:
                v /= n
            out.append(v.astype(np.float32))
        return pd.Series(out)

    return _emb


def _spherical_kmeans_np(X, k, seed=0, iters=8):
    """Deterministic spherical Lloyd over UNIT-NORM rows (numpy only —
    the pq._kmeans_np precedent, recast for cosine): seeded distinct-row
    init, argmax-dot assignment (first-max tie-break = semdedup's own
    assignment rule), per-cluster mean renormalized each round, dead
    centroids reseeded farthest-first from the least-similar points.
    Chunked gemm bounds peak memory to ~64 MB whatever k is."""
    import numpy as np

    n = len(X)
    k = max(1, min(k, n))
    rng = np.random.default_rng(seed)
    C = X[rng.permutation(n)[:k]].astype(np.float64).copy()
    dim = X.shape[1]
    block = max(8, min(len(X), (8 << 20) // max(k, 1)))
    assign = np.empty(n, dtype=np.int64)
    best = np.empty(n)
    for _ in range(iters):
        CT = C.T
        for r0 in range(0, n, block):
            r1 = min(r0 + block, n)
            S = X[r0:r1] @ CT
            assign[r0:r1] = np.argmax(S, axis=1)
            best[r0:r1] = S.max(axis=1)
        # segment sums via per-dim bincount (ufunc.at is ~10x slower)
        newC = np.stack(
            [np.bincount(assign, weights=X[:, d], minlength=k) for d in range(dim)],
            axis=1,
        )
        norms = np.linalg.norm(newC, axis=1)
        dead = np.where(norms == 0)[0]
        if len(dead):
            # farthest-first reseed: points least similar to their own
            # centroid, in deterministic (sim, index) order
            order = np.lexsort((np.arange(n), best))
            for t, j in enumerate(dead):
                newC[j] = X[order[t % n]]
            norms = np.linalg.norm(newC, axis=1)
        np.divide(newC, norms[:, None], out=newC, where=norms[:, None] != 0)
        C = newC
    return C


def train_semdedup_centroids(
    vectors: DataFrame,
    n_centroids: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    sample_n: int | None = None,
    iters: int = 8,
    two_level_above: int = 4096,
) -> DataFrame:
    """Trained coarse quantizer for semdedup's job path (Abbas et al.
    2023 use k-means preclustering; the md5 fixture planes cannot spread
    a tight embedding cone — every member argmaxes the same random
    direction, collapsing the corpus onto few clusters and leaning on
    the max_cluster_df cap, which trades recall).  -> the same
    (centroid_id int, centroid array<double>) dim table as
    similarity.fixture_centroids / train_ivf_centroids.

    Deterministic end-to-end (resume rule: no rand() feeding output):
    the training sample is the ``sample_n`` smallest rows by
    md5(id) — a TakeOrderedAndProject, each input partition ships only
    its local top-N — and the Lloyd loop is seeded with fixed iteration
    counts and first-max tie-breaks, so the same corpus always yields
    the same centroid table under any partitioning.

    Scale shape: driver work is bounded by the SAMPLE (<=200k rows x
    dim), never the corpus.  Past ``two_level_above`` centroids the
    trainer goes hierarchical (the faiss coarse-quantizer recipe):
    sqrt(k) top-level spherical k-means, then per-branch sub-k-means
    with largest-remainder seat allocation — training cost
    O(sample x sqrt(k) x dim) per round instead of O(sample x k x dim),
    which is what keeps the job's 2^16-cluster ceiling trainable.  The
    flattened leaves are ordinary centroids; assignment stays the flat
    broadcast argmax (similarity._assign_centroid)."""
    import numpy as np

    spark = vectors.sparkSession
    if sample_n is None:
        # ~8 sample points per centroid (faiss trains coarse quantizers
        # at tens of points per centroid; the 200k ceiling bounds driver
        # memory at ~100 MB of float64 whatever k is)
        sample_n = min(max(20_000, 8 * n_centroids), 200_000)
    samp = (
        vectors.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .orderBy(F.md5(F.col("_id").cast("string")), F.col("_id"))
        .limit(sample_n)
    )
    pdf = samp.toPandas()
    if not len(pdf):
        raise ValueError("train_semdedup_centroids: empty vector table")
    X = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(X, axis=1, keepdims=True)
    # ZERO vectors (blank pages) carry no direction: training on them
    # poisons the quantizer — a dead-cluster reseed sorts by similarity
    # ascending and zero rows (sim 0) sort first, so every dead centroid
    # reseeded to a zero vector, which _assign_centroid normalizes to a
    # NaN row that argmax then always picks (measured: 63k vectors all
    # collapsing onto one cluster).  Drop them before Lloyd; at scan
    # time zero vectors cos-match nothing and are always kept anyway.
    nz = norms[:, 0] > 0
    X = X[nz] / norms[nz]
    dim = X.shape[1] if X.size else len(pdf["_v"].iloc[0])
    if not len(X):
        # all-blank sample: one arbitrary unit centroid keeps the
        # assignment well-defined (everything cos 0, kept)
        e0 = [0.0] * dim
        e0[0] = 1.0
        return spark.createDataFrame(
            [(0, e0)], "centroid_id int, centroid array<double>"
        )
    k = max(1, min(n_centroids, len(X)))
    if k <= two_level_above:
        C = _spherical_kmeans_np(X, k, seed=seed, iters=iters)
    else:
        k1 = int(np.ceil(np.sqrt(k)))
        C1 = _spherical_kmeans_np(X, k1, seed=seed, iters=iters)
        a = np.argmax(X @ C1.T, axis=1)
        counts = np.bincount(a, minlength=len(C1))
        # largest-remainder seat allocation proportional to branch mass,
        # >=1 seat per non-empty branch, capped by branch membership
        quota = counts * (k / max(counts.sum(), 1))
        seats = np.floor(quota).astype(np.int64)
        seats[counts > 0] = np.maximum(seats[counts > 0], 1)
        rem = k - seats.sum()
        if rem > 0:
            order = np.lexsort((np.arange(len(C1)), -(quota - np.floor(quota))))
            for j in order[: max(rem, 0)]:
                seats[j] += 1
        np.minimum(seats, counts, out=seats)
        parts = []
        for j in range(len(C1)):
            if seats[j] <= 0:
                continue
            parts.append(
                _spherical_kmeans_np(X[a == j], int(seats[j]), seed=seed + 1 + j, iters=iters)
            )
        C = np.vstack(parts)
    # a centroid can only be zero if its cluster stayed dead through
    # every reseed — drop it rather than ship a NaN row to the assigner
    C = C[np.linalg.norm(C, axis=1) > 0]
    rows = [(i, [float(x) for x in c]) for i, c in enumerate(C)]
    return spark.createDataFrame(rows, "centroid_id int, centroid array<double>")


def _assign_residual(df, centroids_l1, centroids_l2, vec_col, cid_col, out):
    """Second-level split key for hot clusters: remove each vector's
    component ALONG its level-1 centroid and argmax the normalized
    residual against the level-2 centroid set.  Random centroids cannot
    spread a tight cone (every member argmaxes the same one); the cone's
    RESIDUALS live in the orthogonal complement and do spread — while
    identical vectors keep identical residuals, so exact semantic
    copies always co-locate.  One zero-shuffle Arrow pass (the
    _assign_centroid shape)."""
    import numpy as np

    from pyspark.sql.types import IntegerType, StructField, StructType

    c1rows = sorted(centroids_l1.collect(), key=lambda r: r["centroid_id"])
    cmat1 = np.array([r["centroid"] for r in c1rows], dtype=np.float64)
    cmat1 /= np.linalg.norm(cmat1, axis=1, keepdims=True)
    cid_to_idx = {r["centroid_id"]: i for i, r in enumerate(c1rows)}
    c2rows = sorted(centroids_l2.collect(), key=lambda r: r["centroid_id"])
    cmat2 = np.array([r["centroid"] for r in c2rows], dtype=np.float64)
    cmat2 /= np.linalg.norm(cmat2, axis=1, keepdims=True)
    bc = df.sparkSession.sparkContext.broadcast((cmat1, cid_to_idx, cmat2))

    def assign(batches):
        cmat1_, idx_, cmat2_ = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            norms = np.linalg.norm(M, axis=1, keepdims=True)
            np.divide(M, norms, out=M, where=norms != 0)
            C1 = cmat1_[[idx_[c] for c in pdf[cid_col]]]
            res = M - (M * C1).sum(axis=1, keepdims=True) * C1
            rn = np.linalg.norm(res, axis=1, keepdims=True)
            np.divide(res, rn, out=res, where=rn != 0)
            pdf = pdf.copy()
            # zero residual (vector == centroid direction) argmaxes the
            # all-zero row deterministically to sub 0
            pdf[out] = np.argmax(res @ cmat2_.T, axis=1).astype("int32")
            yield pdf

    schema = StructType(df.schema.fields + [StructField(out, IntegerType())])
    return df.mapInPandas(assign, schema=schema)


def semdedup(
    vectors: DataFrame,
    centroids: DataFrame,
    threshold: float = THRESHOLD,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster_df: int | None = None,
    split_threshold: int | None = None,
    split_centroids: DataFrame | None = None,
) -> DataFrame:
    """-> (vec_id, centroid_id, max_prior_sim, semdedup_keep) — one row
    per input vector.  ``max_prior_sim`` is the largest cosine to any
    smaller-id member of the same cluster (NULL for each cluster's
    minimum id), rounded to 4 decimals; the keep decision compares the
    ROUNDED value so both engines make the same boundary call.

    ``centroids`` is a (centroid_id, centroid) dim table (trained via
    similarity.train_ivf_centroids or the deterministic
    fixture_centroids); it is collected + broadcast — bounded by
    construction.

    Pair-scan shape: ONE shuffle keyed on centroid_id, then a single
    normalized gemm per cluster inside applyInPandas — each vector
    crosses the exchange once (~id + dim floats), vs the earlier
    pair-join shape that shipped BOTH vectors of every candidate pair
    (measured ~90x more shuffle bytes at 100-member clusters).  A
    cluster materializes as one pandas group, so ``max_cluster_df``
    both bounds the gemm (n x cap instead of n x n) and is the guard
    to reach for if an adversarial hot cluster's group frame itself
    gets large."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    asg = _assign_centroid(
        vectors.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_v")),
        centroids,
        "_v",
        "centroid_id",
    )
    group_key = "centroid_id"
    if split_threshold is not None:
        # residual split of HOT clusters only (one k-cardinality size
        # agg, broadcast back): members of a cluster larger than
        # split_threshold get a level-2 residual sub-id and scan within
        # (centroid_id, sub) — the approximation touches hot clusters
        # alone (a 0.95-borderline pair can straddle subclusters; exact
        # copies never do), and max_cluster_df remains the backstop for
        # subclusters that are STILL degenerate (identical vectors
        # share one residual)
        if split_centroids is None:
            raise ValueError("split_threshold requires split_centroids")
        k2 = split_centroids.count()
        sizes = asg.groupBy("centroid_id").agg(F.count(F.lit(1)).alias("_csize"))
        asg = asg.join(F.broadcast(sizes), "centroid_id")
        small = asg.filter(F.col("_csize") <= split_threshold).withColumn(
            "_sub", F.lit(-1)
        )
        big = _assign_residual(
            asg.filter(F.col("_csize") > split_threshold),
            centroids,
            split_centroids,
            "_v",
            "centroid_id",
            "_sub",
        )
        asg = small.unionByName(big).withColumn(
            "_gk",
            F.col("centroid_id").cast("long") * (k2 + 1)
            + (F.col("_sub") + 1).cast("long"),
        )
        group_key = "_gk"
    cap = max_cluster_df
    id_field = asg.schema["vec_id"]

    def scan(pdf):
        pdf = pdf.sort_values("vec_id", kind="mergesort").reset_index(drop=True)
        m = len(pdf)
        if m == 0:
            return pd.DataFrame(
                {"vec_id": [], "centroid_id": [], "max_prior_sim": []}
            )
        M = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(M, axis=1, keepdims=True)
        # zero vectors stay zero rows: cosine with a zero vector is
        # undefined, so it matches NOTHING (sim 0 both directions) and
        # is always kept — the documented semantic (the job stage
        # additionally bypasses blank pages before embedding)
        np.divide(M, norms, out=M, where=norms != 0)
        ncols = m if cap is None else min(m, cap)
        R = M[:ncols].T
        # row-chunked gemm: peak memory is block x ncols, never m x m —
        # a degenerate corpus can drop an arbitrarily hot cluster on one
        # task (measured: a 1M-member cluster's full gram matrix is 8 TB;
        # the chunked+capped scan is bounded and linear in m)
        # bound each chunk's gram block to ~64 MB whatever ncols is
        block = max(8, min(4096, (8 << 20) // max(ncols, 1)))
        col = np.arange(ncols)
        vals = np.empty(m)
        for r0 in range(0, m, block):
            r1 = min(r0 + block, m)
            S = M[r0:r1] @ R
            j = np.minimum(np.arange(r0, r1), ncols)  # prior cols per row
            S[col[None, :] >= j[:, None]] = -np.inf
            vals[r0:r1] = S.max(axis=1)
        # nullable Float64: each cluster's minimum id has NO prior and
        # must reach Spark as NULL (keep) — a plain float column would
        # turn that None into NaN, which compares false against the
        # threshold and would drop every cluster minimum
        prior = pd.array(np.round(vals, 4), dtype="Float64")
        prior[np.isneginf(vals)] = pd.NA
        return pd.DataFrame(
            {
                "vec_id": pdf["vec_id"],
                "centroid_id": pdf["centroid_id"],
                "max_prior_sim": pd.array(prior, dtype="Float64"),
            }
        )

    schema = StructType(
        [
            StructField("vec_id", id_field.dataType),
            StructField("centroid_id", IntegerType()),
            StructField("max_prior_sim", DoubleType()),
        ]
    )
    scanned = asg.groupBy(group_key).applyInPandas(scan, schema=schema)
    return scanned.select(
        "vec_id",
        "centroid_id",
        "max_prior_sim",
        (
            F.col("max_prior_sim").isNull()
            | (F.col("max_prior_sim") < F.lit(threshold))
        ).alias("semdedup_keep"),
    )


def semdedup_sql(
    base_select: str,
    cent_values: str,
    threshold: float = THRESHOLD,
    max_cluster_df: int | None = None,
) -> str:
    """DuckDB mirror of the whole pipeline (assignment + keep-first
    pair scan) so the oracle and tests share one SQL source of truth.
    ``base_select`` must yield (vec_id, embedding); ``cent_values`` is a
    VALUES list ``(cid, [..]::DOUBLE[]), ...`` of centroid literals
    (fixture_centroids components, the ann_ivf_topk precedent).
    round(4) absorbs the numpy-float64 vs DuckDB dot-product ulp
    drift."""
    cos = (
        "list_dot_product({v}, {c})"
        " / (sqrt(list_dot_product({v}, {v})) * sqrt(list_dot_product({c}, {c})))"
    )
    cap_cte = ""
    left_src = "asg"
    if max_cluster_df is not None:
        cap_cte = f"""
capped AS (
  SELECT cid, vec_id, embedding FROM (
    SELECT cid, vec_id, embedding,
           row_number() OVER (PARTITION BY cid ORDER BY vec_id ASC) AS rk
    FROM asg) WHERE rk <= {max_cluster_df}),"""
        left_src = "capped"
    return f"""
WITH cent(cid, c) AS (VALUES {cent_values}),
base AS ({base_select}),
sims AS (
  SELECT b.vec_id, b.embedding, c.cid,
         {cos.format(v="b.embedding", c="c.c")} AS sim
  FROM base b CROSS JOIN cent c),
asg AS (
  SELECT vec_id, embedding, cid FROM (
    SELECT vec_id, embedding, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid ASC) AS rn
    FROM sims) WHERE rn = 1),{cap_cte}
prior AS (
  SELECT b.vec_id,
         round(max({cos.format(v="a.embedding", c="b.embedding")}), 4)
           AS max_prior_sim
  FROM {left_src} a JOIN asg b USING (cid)
  WHERE a.vec_id < b.vec_id
  GROUP BY b.vec_id)
SELECT g.vec_id, g.cid AS centroid_id, p.max_prior_sim,
       (p.max_prior_sim IS NULL OR p.max_prior_sim < {threshold})
         AS semdedup_keep
FROM asg g LEFT JOIN prior p ON g.vec_id = p.vec_id
"""
