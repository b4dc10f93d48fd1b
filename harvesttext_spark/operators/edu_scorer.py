"""FineWeb-Edu-style SCORED distillation — the graded sibling of the
binary quality classifier (Penedo et al. 2024: a teacher model scores
pages 0-5 for educational value, a cheap student regressor is distilled
onto those scores, and pages keep when ``int(round(score)) >= 3``).
The engine keeps the distillation SHAPE (regress a hashed-feature
student onto a continuous teacher column, then score every page) but
replaces the transformer student with a closed-form smoothed
target-encoding over the classifier's hashed word uni+bigram feature
space (operators/quality_classifier.py ``_gram_rows``) — training is
ONE distributed groupBy, scoring is a broadcast join:

    bucket b   = conv(md5(gram), 16, 10) % n_buckets
    ppm(doc)   = round(teacher * 10^4)            [exact integer sums —
                                                   no float-order wobble
                                                   in the training agg]
    mu_ppm     = Σ_b sum_ppm(b) / Σ_b cnt(b)      [occurrence-mean teacher]
    s(b)       = (sum_ppm(b) + m·mu_ppm) / (cnt(b) + m)
    score(doc) = mean over gram occurrences of s(b) / 10^4
                 (unseen bucket → mu_ppm; no grams at all → mu_ppm)
    edu_int    = floor(round(score, 4) + 0.5) clamped to [0, 5]
    keep       = edu_int >= min_score             [FineWeb-Edu uses 3]

Why target encoding and not least squares: ridge over 2^16 hashed
buckets needs a 2^16-dim solve; the smoothed per-bucket mean is the
diagonal approximation that trains in one counting pass, is exactly
reproducible (integer sums), and is the same additive-model shape
fastText itself learns for regression heads.

Scale shape (identical to the classifier): the only wide exchange is
the bucket aggregation, capped at ``n_buckets`` (2^16) rows regardless
of corpus size; the bucket-score table broadcast-joins the scoring
stream.  Holds at 100 TB — model size is constant in page count.

Fully md5-and-counts arithmetic → the ENTIRE train+score pipeline has
an exact DuckDB value oracle (``edu_score`` in __spark_entry__.py, the
quality_classifier / langid_trained pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from harvesttext_spark.operators.quality_classifier import (
    MAX_WORDS,
    N_BUCKETS,
    _gram_rows,
)

SMOOTHING = 100.0  # m: pseudo-occurrences of global-mean evidence
_PPM = 10_000  # teacher quantization grain (4 decimals, exact int sums)


def train_edu_scorer(
    docs: DataFrame,
    teacher_col: str = "teacher",
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
    max_words: int = MAX_WORDS,
    smoothing: float = SMOOTHING,
    persist: bool = False,
) -> tuple[DataFrame, dict]:
    """-> (bucket_scores(bucket, bscore), params {mu_ppm, n_buckets,
    max_words, smoothing}).  ``teacher_col`` is a double in [0, 5] (any
    bounded score works); it is quantized to ppm integers BEFORE the
    aggregation so the training sums are exact whatever the partition
    order.  Raises ValueError on an empty corpus (no occurrence mean to
    shrink toward)."""
    lab = docs.select(
        F.round(F.col(teacher_col) * _PPM, 0).cast("bigint").alias("ppm"),
        F.col(text_col).alias("_t"),
    )
    feats = _gram_rows(lab, "_t", ["ppm"], n_buckets, max_words)
    counts = feats.groupBy("bucket").agg(
        F.sum("ppm").alias("sum_ppm"), F.count(F.lit(1)).alias("cnt")
    )
    if persist:
        # totals action + bucket-score projection both consume counts —
        # without this the corpus feature extraction runs twice
        from harvesttext_spark.session import plan_keyed_persist

        counts = plan_keyed_persist(counts, "edu_scorer_counts")
    tots = counts.groupBy().agg(
        F.sum("sum_ppm").alias("ts"), F.sum("cnt").alias("tc")
    ).collect()[0]
    total_cnt = int(tots["tc"] or 0)
    if total_cnt == 0:
        raise ValueError("edu scorer needs a non-empty training corpus")
    mu_ppm = float(int(tots["ts"] or 0)) / total_cnt
    scores = counts.select(
        "bucket",
        (
            (F.col("sum_ppm") + F.lit(smoothing * mu_ppm))
            / (F.col("cnt") + F.lit(smoothing))
        ).alias("bscore"),
    )
    params = {
        "mu_ppm": mu_ppm,
        "n_buckets": n_buckets,
        "max_words": max_words,
        "smoothing": smoothing,
    }
    return scores, params


def score_edu(
    docs: DataFrame,
    bucket_scores: DataFrame,
    params: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_score: int = 3,
) -> DataFrame:
    """-> (doc_id, edu_score, edu_int, edu_keep).  Bucket scores
    broadcast-joined (≤ n_buckets rows by construction); docs with no
    grams — and grams in never-trained buckets — score the occurrence
    mean.  edu_score rounds to 4 decimals (the oracle grain; the per-doc
    double sum wobbles ~1e-10); edu_int derives from the ROUNDED score
    via floor(x + 0.5) so both engines make the same half-up call."""
    mu = float(params["mu_ppm"])
    base = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t"))
    feats = _gram_rows(
        base, "_t", ["doc_id"], params["n_buckets"], params["max_words"]
    )
    scored = (
        feats.join(F.broadcast(bucket_scores), "bucket", "left")
        .groupBy("doc_id")
        .agg(F.avg(F.coalesce(F.col("bscore"), F.lit(mu))).alias("_s"))
    )
    edu_score = F.round(F.coalesce(F.col("_s"), F.lit(mu)) / _PPM, 4)
    edu_int = F.greatest(
        F.lit(0),
        F.least(F.lit(5), F.floor(edu_score + F.lit(0.5)).cast("int")),
    )
    return (
        base.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            edu_score.alias("edu_score"),
            edu_int.alias("edu_int"),
            (edu_int >= F.lit(min_score)).alias("edu_keep"),
        )
    )


def edu_scorer_sql(
    train_select: str,
    score_select: str,
    n_buckets: int = N_BUCKETS,
    max_words: int = MAX_WORDS,
    smoothing: float = SMOOTHING,
    min_score: int = 3,
) -> str:
    """DuckDB mirror of the ENTIRE train+score pipeline (the
    domain_reputation_sql precedent: the oracle composes this so test
    and engine share one source of SQL truth).  ``train_select`` must
    yield (teacher DOUBLE, text); ``score_select`` must yield
    (doc_id, text).  Same explicit whitespace class, same md5
    bucketing, same ppm quantization, same 4-decimal grain."""
    ws = (
        "list_filter(regexp_split_to_array(lower(text), "
        f"'[ \t\n\x0b\f\r]+'), x -> x != '')[1:{max_words}]"
    )
    bucket = (
        "CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(string_split(substring(md5(g), 1, 8), ''), "
        "c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))), "
        f"(a, b) -> a * 16 + b) % {n_buckets} AS INT)"
    )
    return f"""
WITH tr AS (SELECT CAST(round(teacher * {_PPM}) AS BIGINT) AS ppm, {ws} AS ws
            FROM ({train_select})),
tg AS (
  SELECT ppm, unnest(ws) AS g FROM tr
  UNION ALL
  SELECT ppm, ws[i] || '_' || ws[i + 1] AS g
  FROM (SELECT ppm, ws, unnest(generate_series(1, len(ws) - 1)) AS i
        FROM tr WHERE len(ws) >= 2)
),
tf AS (SELECT ppm, {bucket} AS bucket FROM tg),
counts AS (SELECT bucket, sum(ppm) AS sum_ppm, count(*) AS cnt FROM tf GROUP BY 1),
mu AS (SELECT sum(sum_ppm) * 1.0 / sum(cnt) AS mu_ppm FROM counts),
bscores AS (
  SELECT bucket,
         (sum_ppm + {smoothing} * m.mu_ppm) / (cnt + {smoothing}) AS bscore
  FROM counts CROSS JOIN mu m
),
sbase AS (SELECT doc_id, text FROM ({score_select})),
sd AS (SELECT doc_id, {ws} AS ws FROM sbase),
sg AS (
  SELECT doc_id, unnest(ws) AS g FROM sd
  UNION ALL
  SELECT doc_id, ws[i] || '_' || ws[i + 1] AS g
  FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 1)) AS i
        FROM sd WHERE len(ws) >= 2)
),
sfeat AS (SELECT doc_id, {bucket} AS bucket FROM sg),
scored AS (
  SELECT f.doc_id, avg(coalesce(b.bscore, m.mu_ppm)) AS s
  FROM sfeat f LEFT JOIN bscores b USING (bucket) CROSS JOIN mu m
  GROUP BY 1
),
fin AS (
  SELECT b.doc_id,
         round(coalesce(s.s, m.mu_ppm) / {_PPM}, 4) AS edu_score
  FROM sbase b CROSS JOIN mu m LEFT JOIN scored s ON b.doc_id = s.doc_id
)
SELECT doc_id, edu_score,
       greatest(0, least(5, CAST(floor(edu_score + 0.5) AS INT))) AS edu_int,
       (greatest(0, least(5, CAST(floor(edu_score + 0.5) AS INT)))
        >= {min_score}) AS edu_keep
FROM fin
"""
