"""Domain-reputation shrinkage filter — the per-domain quality signal
web curation pipelines apply ABOVE the per-page cascade (RefinedWeb's
URL/domain scoring, CCNet's per-domain stats; the Beta-Binomial
empirical-Bayes form is the standard small-sample fix): a domain's raw
page keep-rate is meaningless at n=2, so shrink it toward the global
keep-rate with a pseudo-count prior before thresholding.

    p̂           = Σ keeps / Σ pages                (global keep rate)
    shrunk(d)   = (k_d + κ·p̂) / (n_d + κ)          (Beta(κp̂, κ(1−p̂)) posterior mean)

A domain with 2/2 kept pages lands near p̂ (no evidence), a domain with
9000/10000 lands near 0.9 (evidence dominates) — exactly the ranking a
raw rate gets wrong.  Dropping a low-reputation domain removes ALL its
pages, including ones the per-page rules kept: link-farm and SEO-spam
domains produce individually-plausible pages.

Scale shape: ONE map-side-partial groupBy on domain (the only wide
exchange, at domain cardinality), a 1-row global aggregate broadcast
back, and a join-back keyed on domain that AQE plans (broadcast when
the domain table is small, shuffle join at the 10⁷-domain scale of a
real crawl — per-domain rows are ~40 bytes, so even 10⁸ domains is a
4 GB exchange, constant in page count).  Fully SQL-expressible →
exact value oracle (``domain_reputation`` in __spark_entry__.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PRIOR_STRENGTH = 20.0  # κ: pseudo-pages of global-rate evidence


def domain_reputation(
    df: DataFrame,
    domain_col: str = "domain",
    keep_col: str = "keep",
    prior_strength: float = PRIOR_STRENGTH,
) -> DataFrame:
    """-> (domain, n_pages, n_keep, raw_rate, shrunk_rate) — one row per
    domain, rates rounded to 6 decimals (the oracle grain).  The global
    rate rides a broadcast 1-row crossJoin (scalar totals, the
    bigram_stats precedent)."""
    base = df.select(
        F.col(domain_col).alias("domain"),
        F.col(keep_col).cast("boolean").alias("_k"),
    )
    per = base.groupBy("domain").agg(
        F.count("*").alias("n_pages"),
        F.sum(F.when(F.col("_k"), 1).otherwise(0)).alias("n_keep"),
    )
    tot = per.groupBy().agg(
        F.sum("n_pages").alias("_tn"), F.sum("n_keep").alias("_tk")
    )
    kappa = float(prior_strength)
    return per.crossJoin(F.broadcast(tot)).select(
        "domain",
        "n_pages",
        "n_keep",
        F.round(F.col("n_keep") / F.col("n_pages"), 6).alias("raw_rate"),
        F.round(
            (F.col("n_keep") + kappa * F.col("_tk") / F.col("_tn"))
            / (F.col("n_pages") + kappa),
            6,
        ).alias("shrunk_rate"),
    )


def domain_reputation_sql(
    base_expr: str,
    prior_strength: float = PRIOR_STRENGTH,
) -> str:
    """DuckDB mirror: ``base_expr`` must select (domain, k boolean).
    Counts cast to BIGINT (DuckDB sums to HUGEINT); same 6-decimal
    rounding grain."""
    kappa = float(prior_strength)
    return f"""
WITH base AS ({base_expr}),
per AS (
  SELECT domain,
         CAST(count(*) AS BIGINT) AS n_pages,
         CAST(sum(CASE WHEN k THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
  FROM base GROUP BY 1
),
tot AS (SELECT sum(n_pages) AS tn, sum(n_keep) AS tk FROM per)
SELECT domain, n_pages, n_keep,
       round(n_keep * 1.0 / n_pages, 6) AS raw_rate,
       round((n_keep + {kappa} * tk / tn) / (n_pages + {kappa}), 6) AS shrunk_rate
FROM per CROSS JOIN tot
"""


def apply_domain_reputation(
    df: DataFrame,
    min_rate: float,
    domain_col: str = "domain",
    keep_col: str = "keep",
    prior_strength: float = PRIOR_STRENGTH,
) -> DataFrame:
    """All input rows + (domain_shrunk_rate, domain_reputation_keep):
    pages of domains whose shrunk keep-rate is below ``min_rate`` flag
    false.  The reputation table joins back on domain (AQE picks
    broadcast vs shuffle by its actual size)."""
    rep = domain_reputation(df, domain_col, keep_col, prior_strength).select(
        F.col("domain").alias("_rd"),
        F.col("shrunk_rate").alias("domain_shrunk_rate"),
    )
    return (
        df.join(rep, df[domain_col] == rep["_rd"], "left")
        .withColumn(
            "domain_reputation_keep",
            F.coalesce(F.col("domain_shrunk_rate"), F.lit(0.0)) >= min_rate,
        )
        .drop("_rd")
    )
