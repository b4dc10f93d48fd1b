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
pass (similarity._assign_centroid); the pair generation self-joins on
centroid_id — the point of clustering first is that k grows with N
holding cluster size bounded, so the within-cluster quadratic term is
O(N * avg_cluster) with small constants.  For adversarial hot clusters
(a template family collapsing to one embedding) ``max_cluster_df``
caps the smaller-id REFERENCE side per cluster, mirroring the MinHash
``max_band_df`` guard: under-cap clusters are bit-identical, oversized
clusters compare each member against the cap smallest ids only (a
member can only be vouched for by a smaller id, so trimming the
reference side never creates false drops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from harvesttext_spark.operators.similarity import (
    _assign_centroid,
    pairwise_cosine_udf,
)

THRESHOLD = 0.95  # paper ballpark for web text (they sweep 0.9-0.999)


def word_hash_embedding_udf(dim: int = 64):
    """Deterministic signed word-hash embedding (feature hashing with a
    sign channel, Weinberger et al. 2009) as an Arrow-batched pandas
    UDF: bucket = md5(word)[:8] % dim, sign = parity of the next md5
    nibble, counts L2-normalized.  The job-stage embedder when no model
    embedding column exists — md5-derived like every other engine hash
    (no rand(), resume-deterministic), and one numpy pass per batch.
    All-empty/NULL texts embed to the zero vector (callers may drop or
    keep them; cosine against zero is NaN-guarded by the scorer)."""
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


def semdedup(
    vectors: DataFrame,
    centroids: DataFrame,
    threshold: float = THRESHOLD,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster_df: int | None = None,
) -> DataFrame:
    """-> (vec_id, centroid_id, max_prior_sim, semdedup_keep) — one row
    per input vector.  ``max_prior_sim`` is the largest cosine to any
    smaller-id member of the same cluster (NULL for each cluster's
    minimum id), rounded to 4 decimals; the keep decision compares the
    ROUNDED value so both engines make the same boundary call.

    ``centroids`` is a (centroid_id, centroid) dim table (trained via
    similarity.train_ivf_centroids or the deterministic
    fixture_centroids); it is collected + broadcast — bounded by
    construction."""
    pcos = pairwise_cosine_udf()
    asg = _assign_centroid(
        vectors.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_v")),
        centroids,
        "_v",
        "centroid_id",
    )
    left = asg.select(
        F.col("centroid_id"),
        F.col("vec_id").alias("_aid"),
        F.col("_v").alias("_av"),
    )
    if max_cluster_df is not None:
        # WindowGroupLimit trims map-side: each member can only be
        # vouched for by a smaller id, so keeping the cap smallest ids
        # as references bounds the join at cap * n without false drops
        w = Window.partitionBy("centroid_id").orderBy(F.asc("_aid"))
        left = (
            left.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= max_cluster_df)
            .drop("_rk")
        )
    pairs = (
        left.join(
            asg.select(
                "centroid_id",
                F.col("vec_id").alias("_bid"),
                F.col("_v").alias("_bv"),
            ),
            "centroid_id",
        )
        .filter(F.col("_aid") < F.col("_bid"))
        .select("_bid", pcos(F.col("_av"), F.col("_bv")).alias("_sim"))
    )
    prior = pairs.groupBy("_bid").agg(F.round(F.max("_sim"), 4).alias("max_prior_sim"))
    return (
        asg.select("vec_id", "centroid_id")
        .join(prior.withColumnRenamed("_bid", "vec_id"), "vec_id", "left")
        .select(
            "vec_id",
            "centroid_id",
            "max_prior_sim",
            (
                F.col("max_prior_sim").isNull()
                | (F.col("max_prior_sim") < F.lit(threshold))
            ).alias("semdedup_keep"),
        )
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
