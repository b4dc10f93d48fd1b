"""Product quantization (PQ) ANN — the web-scale memory path.

IVF and hyperplane LSH (operators/similarity.py) shrink the CANDIDATE
set; PQ shrinks the VECTORS: each embedding is cut into ``n_sub``
subvectors and every subvector is replaced by the id of its nearest
codeword from a per-subspace codebook (Jégou et al., "Product
Quantization for Nearest Neighbor Search", TPAMI 2011).  A 64-float
(256-byte) embedding becomes ``n_sub`` uint8 codes — 8 bytes at the
canonical 8×256 setting, a 32× memory cut, which is what makes
billion-vector indexes fit a cluster at all.

Query-time scoring is ADC (asymmetric distance computation): per query,
ONE small lookup table of ``n_sub × k_codes`` exact subdistances is
built against the codebooks, and each encoded vector's approximate
squared L2 distance is just ``n_sub`` table gathers + adds — no float
vector is ever touched again.  For unit-norm embeddings (the engine's
input contract for cosine ANN) L2 order == cosine order, so results
rank-compare directly with the exact searchers.

Spark shapes (everything bounded, nothing all-pairs):
  * training   — seeded Lloyd k-means per subspace over a BOUNDED driver
                 sample (the same bounded-dimension read as the IVF
                 centroid table); deterministic: seeded init, fixed
                 iteration count, ties to the lowest index.
  * encoding   — one zero-shuffle mapInPandas pass (argmin over the
                 broadcast codebooks, one matmul per subspace per batch).
  * search     — broadcast LUTs, batch-local top-k, global window over
                 batches·nq·k rows (the brute_force_topk_blas shape).
  * ivf_pq     — coarse-quantizer probe lists (operators/similarity.py
                 machinery) with PQ-ADC scoring inside the probed lists
                 only: candidate shrink × memory shrink composed.

Correctness gating: a pure-numpy reference implementation is pinned
row-for-row in tests (test_dedup_similarity.py), plus recall-vs-exact
bounds on the real embeddings table; training determinism is pinned by
a double-run.  Not SQL-expressible (trained codebooks), so the contract
entry is rows-only — the same honest split as IVF's trained path.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _kmeans_np(X: np.ndarray, k: int, iters: int = 15, seed: int = 0) -> np.ndarray:
    """Deterministic Lloyd: seeded distinct-row init, fixed iteration
    count, empty clusters re-seeded from the farthest points.  numpy
    only (scipy is absent from the image)."""
    rng = np.random.default_rng(seed)
    n = len(X)
    init = rng.permutation(n)[: min(k, n)]
    C = X[init].astype(np.float64).copy()
    if len(C) < k:  # fewer samples than codewords: pad by repeating
        C = np.vstack([C, C[rng.integers(0, len(C), k - len(C))]])
    for _ in range(iters):
        # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; argmin ties -> lowest id
        d = (
            (X * X).sum(1, keepdims=True)
            - 2.0 * (X @ C.T)
            + (C * C).sum(1)[None, :]
        )
        a = np.argmin(d, axis=1)
        far = np.argsort(-d[np.arange(n), a])  # farthest-first for re-seeding
        fi = 0
        for j in range(k):
            m = a == j
            if m.any():
                C[j] = X[m].mean(0)
            else:
                C[j] = X[far[fi % n]]
                fi += 1
    return C


def train_pq_codebooks(
    vectors: DataFrame,
    dim: int,
    n_sub: int = 8,
    k_codes: int = 256,
    vec_col: str = "embedding",
    sample: int = 20000,
    seed: int = 42,
) -> np.ndarray:
    """(n_sub, k_codes, dim/n_sub) codebooks from a bounded seeded sample
    of the vector table.  ``dim`` must divide by ``n_sub``."""
    assert dim % n_sub == 0, "dim must divide by n_sub"
    n = vectors.count()
    frac = min(1.0, sample / max(n, 1))
    rows = (
        vectors.select(vec_col).sample(fraction=frac, seed=seed).limit(sample).collect()
    )
    X = np.array([r[0] for r in rows], dtype=np.float64)
    dsub = dim // n_sub
    return np.stack(
        [
            _kmeans_np(X[:, s * dsub : (s + 1) * dsub], k_codes, seed=seed + s)
            for s in range(n_sub)
        ]
    )


def pq_encode(
    vectors: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>) — one zero-shuffle Arrow pass; per batch,
    one matmul + argmin per subspace against the broadcast codebooks."""
    n_sub, k_codes, dsub = codebooks.shape
    bc = vectors.sparkSession.sparkContext.broadcast(codebooks)
    id_type = dict(vectors.dtypes).get(id_col, "bigint")

    def encode(batches):
        import pandas as pd

        C = bc.value
        cnorm = [(C[s] * C[s]).sum(1) for s in range(n_sub)]
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            codes = np.empty((len(X), n_sub), dtype=np.int64)
            for s in range(n_sub):
                sub = X[:, s * dsub : (s + 1) * dsub]
                d = -2.0 * (sub @ C[s].T) + cnorm[s][None, :]
                codes[:, s] = np.argmin(d, axis=1)
            yield pd.DataFrame({"id": pdf[id_col], "codes": list(codes)})

    return vectors.select(id_col, vec_col).mapInPandas(
        encode, schema=f"id {id_type}, codes array<bigint>"
    ).withColumnRenamed("id", id_col)


def pq_topk(
    encoded: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k by ADC over PQ codes: per query a (n_sub,
    k_codes) LUT of exact subdistances, per encoded vector n_sub gathers
    + adds.  Batch-local top-k bounds the shuffle to batches·nq·k rows.
    -> (query_id, vec_id, adc_dist ascending, rank)."""
    n_sub, k_codes, dsub = codebooks.shape
    qrows = queries.select(query_id_col, vec_col).collect()
    id_type = dict(encoded.dtypes).get(id_col, "bigint")
    q_type = dict(queries.dtypes).get(query_id_col, "bigint")
    if not qrows:
        return encoded.sparkSession.createDataFrame(
            [], f"{query_id_col} {q_type}, {id_col} {id_type}, adc_dist double, rank int"
        )
    qids = np.array([r[0] for r in qrows])
    Q = np.array([r[1] for r in qrows], dtype=np.float64)
    C = codebooks
    # LUT[qi, s, c] = ||q_sub - codeword||^2
    lut = np.empty((len(Q), n_sub, k_codes), dtype=np.float64)
    for s in range(n_sub):
        qs = Q[:, s * dsub : (s + 1) * dsub]
        lut[:, s, :] = (
            (qs * qs).sum(1, keepdims=True)
            - 2.0 * (qs @ C[s].T)
            + (C[s] * C[s]).sum(1)[None, :]
        )
    bc = encoded.sparkSession.sparkContext.broadcast((qids, lut))

    def score(batches):
        import pandas as pd

        qids_, lut_ = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy()
            codes = np.stack(pdf["codes"].to_numpy()).astype(np.int64)  # (n, n_sub)
            kk = min(k, len(ids))
            out_q, out_id, out_d = [], [], []
            for qi in range(len(qids_)):
                # gather: d[n] = sum_s LUT[qi, s, codes[n, s]]
                d = lut_[qi][np.arange(n_sub)[None, :], codes].sum(1)
                order = np.lexsort((ids, d))[:kk]  # dist asc, id asc tie-break
                out_q.extend([qids_[qi]] * len(order))
                out_id.extend(ids[order])
                out_d.extend(d[order])
            yield pd.DataFrame(
                {query_id_col: out_q, id_col: out_id, "adc_dist": out_d}
            )

    scored = encoded.select(id_col, "codes").mapInPandas(
        score, schema=f"{query_id_col} {q_type}, {id_col} {id_type}, adc_dist double"
    )
    w = Window.partitionBy(query_id_col).orderBy(F.asc("adc_dist"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def ivf_pq_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    n_sub: int = 8,
    k_codes: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    centroids: DataFrame | None = None,
    codebooks: np.ndarray | None = None,
    seed: int = 42,
) -> DataFrame:
    """IVF-PQ: coarse-quantizer probe lists (candidate shrink) scored by
    ADC over PQ codes (memory shrink) — the composition every
    billion-vector index runs.  Assignment and encoding are each one
    zero-shuffle Arrow pass; the probe join shuffles on the bounded
    centroid_id key; ADC scores only probed candidates."""
    from harvesttext_spark.operators.similarity import train_ivf_centroids

    if centroids is None:
        centroids = train_ivf_centroids(vectors, n_centroids, vec_col, seed)
    if codebooks is None:
        codebooks = train_pq_codebooks(
            vectors, dim, n_sub, k_codes, vec_col, seed=seed
        )
    n_sub, k_codes, dsub = codebooks.shape
    # index build: coarse assignment + PQ encoding FUSED in one
    # zero-shuffle Arrow pass (the full-precision vector is read once,
    # never joined)
    enc = _encode_with_centroid(vectors, centroids, codebooks, id_col, vec_col)
    q = queries.select(query_id_col, vec_col)
    # per-query probe centroids (bounded dim, same as ivf_topk)
    from harvesttext_spark.operators.similarity import pairwise_cosine_udf

    pcos = pairwise_cosine_udf()
    qprobe = (
        q.crossJoin(F.broadcast(centroids))
        .withColumn("_sim", pcos(F.col(vec_col), F.col("centroid")))
        .withColumn(
            "_rk",
            F.row_number().over(
                Window.partitionBy(query_id_col).orderBy(
                    F.desc("_sim"), F.asc("centroid_id")
                )
            ),
        )
        .filter(F.col("_rk") <= n_probe)
        .select(query_id_col, "centroid_id")
    )
    qids_probing = qprobe.groupBy("centroid_id").agg(
        F.collect_list(query_id_col).alias("_qids")
    )
    cand = enc.join(F.broadcast(qids_probing), "centroid_id").select(
        id_col, "codes", F.explode("_qids").alias(query_id_col)
    )
    # ADC score the candidate (vector, query) pairs
    qrows = q.collect()
    if not qrows:
        # same typed-empty contract as pq_topk / the BLAS top-ks: schema
        # (and id dtypes) must not flip with |queries|
        id_type = dict(vectors.dtypes).get(id_col, "bigint")
        q_type = dict(queries.dtypes).get(query_id_col, "bigint")
        return vectors.sparkSession.createDataFrame(
            [], f"{query_id_col} {q_type}, {id_col} {id_type}, adc_dist double, rank int"
        )
    qmap_ids = np.array([r[0] for r in qrows])
    Q = np.array([r[1] for r in qrows], dtype=np.float64)
    lut = np.empty((len(Q), n_sub, k_codes), dtype=np.float64)
    for s in range(n_sub):
        qs = Q[:, s * dsub : (s + 1) * dsub]
        lut[:, s, :] = (
            (qs * qs).sum(1, keepdims=True)
            - 2.0 * (qs @ codebooks[s].T)
            + (codebooks[s] * codebooks[s]).sum(1)[None, :]
        )
    bc = vectors.sparkSession.sparkContext.broadcast(
        ({int(v) if isinstance(v, (int, np.integer)) else v: i
          for i, v in enumerate(qmap_ids)}, lut)
    )

    def score(batches):
        import pandas as pd

        qidx, lut_ = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.stack(pdf["codes"].to_numpy()).astype(np.int64)
            qi = np.array([qidx[v] for v in pdf[query_id_col]])
            d = lut_[qi[:, None], np.arange(n_sub)[None, :], codes].sum(1)
            yield pd.DataFrame(
                {
                    query_id_col: pdf[query_id_col],
                    id_col: pdf[id_col],
                    "adc_dist": d,
                }
            )

    id_type = dict(enc.dtypes).get(id_col, "bigint")
    q_type = dict(queries.dtypes).get(query_id_col, "bigint")
    scored = cand.select(id_col, "codes", query_id_col).mapInPandas(
        score, schema=f"{query_id_col} {q_type}, {id_col} {id_type}, adc_dist double"
    )
    w = Window.partitionBy(query_id_col).orderBy(F.asc("adc_dist"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def _encode_with_centroid(
    vectors: DataFrame,
    centroids: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, centroid_id, codes) in ONE zero-shuffle Arrow pass — the
    IVF-PQ index build: coarse assignment and PQ encoding fused, so the
    full-precision vector is read exactly once and never joined."""
    n_sub, k_codes, dsub = codebooks.shape
    crows = sorted(centroids.collect(), key=lambda r: r["centroid_id"])
    cids = np.array([r["centroid_id"] for r in crows], dtype=np.int64)
    cmat = np.array([r["centroid"] for r in crows], dtype=np.float64)
    cmat = cmat / np.linalg.norm(cmat, axis=1, keepdims=True)
    bc = vectors.sparkSession.sparkContext.broadcast((cids, cmat, codebooks))
    id_type = dict(vectors.dtypes).get(id_col, "bigint")

    def run(batches):
        import pandas as pd

        cids_, cmat_, C = bc.value
        cnorm = [(C[s] * C[s]).sum(1) for s in range(n_sub)]
        CT = cmat_.T
        # row-chunk the coarse scores like _assign_centroid: batch x k
        # float64 is 5.2 GB/worker at a 2^16-centroid quantizer
        block = max(8, (8 << 20) // max(len(cids_), 1))
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            norms = np.linalg.norm(X, axis=1, keepdims=True)
            Xn = np.divide(X, norms, out=X.copy(), where=norms != 0)
            best = np.empty(len(Xn), dtype=np.int64)
            for r0 in range(0, len(Xn), block):
                r1 = min(r0 + block, len(Xn))
                best[r0:r1] = np.argmax(Xn[r0:r1] @ CT, axis=1)
            cid = cids_[best]
            codes = np.empty((len(X), n_sub), dtype=np.int64)
            for s in range(n_sub):
                sub = X[:, s * dsub : (s + 1) * dsub]
                codes[:, s] = np.argmin(
                    -2.0 * (sub @ C[s].T) + cnorm[s][None, :], axis=1
                )
            yield pd.DataFrame(
                {"id": pdf[id_col], "centroid_id": cid.astype("int32"),
                 "codes": list(codes)}
            )

    return vectors.select(id_col, vec_col).mapInPandas(
        run, schema=f"id {id_type}, centroid_id int, codes array<bigint>"
    ).withColumnRenamed("id", id_col)
