"""Static mixture sampling — deterministic down-sampling to a target
group composition (the "data mixing" step every LLM corpus recipe runs
after filtering: The Pile's per-source weights, DoReMi's domain
weights, Llama-style per-source sampling ratios — here as the exact
static-quota form).

Given target fractions t_g over groups (language, domain, source) and
observed counts n_g, the largest achievable output with composition
EXACTLY t is T = min_g n_g / t_g (the binding group keeps everything);
each group then keeps at rate r_g = t_g * T / n_g via the same salted
md5-ppm rule as curation.hash_split — membership is a pure function of
(id, seed), so the sample is reproducible across runs, partitionings,
and resumes, and duplicate ids never straddle the decision.

Scale shape: ONE groupBy at group cardinality (the only corpus-wide
exchange — works at 10^8 domains because nothing is collected), a
1-row min aggregate broadcast back, a broadcast join of the bounded
spec table, and a per-row hash compare riding the scan.  Fully
SQL-expressible; the driver prefix is full, so the value compare lives
in tests/test_mixture.py (the domain_timeseries pattern) and the
queries() entry ``mixture_sample`` is rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from harvesttext_spark.operators.curation import _M, _hash_ppm


def sample_to_mixture(
    df: DataFrame,
    fractions: dict[str, float],
    group_col: str = "lang",
    id_col: str = "url",
    seed: int = 7,
    budget_frac: float = 1.0,
    max_repeat: int = 1,
) -> DataFrame:
    """All rows + (mix_ppm, mix_copies, mix_keep).  ``fractions`` are
    the target composition over listed groups (must be positive and sum
    to 1 ±1e-6); unlisted groups get mix_ppm 0 and never keep.
    ``budget_frac`` scales the output below the maximum (e.g. 0.5 =
    half the largest exactly-composed sample); with the default
    ``max_repeat=1`` the binding group's keep rate is exactly
    ``budget_frac``.  NULL ids never keep (route explicitly, the
    hash_split rule).

    ``max_repeat > 1`` allows UP-sampling (the GPT-3/Pile recipe:
    high-weight sources repeat for several epochs): T becomes
    min_g n_g * max_repeat / t_g, each group's per-row copy count is
    c_g = t_g * T / n_g in (0, max_repeat], and a row emits
    ``mix_copies`` = floor(c_g) plus one more when its hash lands
    under frac(c_g) — expected copies exactly c_g, deterministic per
    id.  mix_keep = (mix_copies >= 1); the export step explodes by
    mix_copies (epoch repetition is an export concern, so the row set
    here stays one-row-per-input)."""
    if not fractions:
        raise ValueError("fractions must be non-empty")
    if any(f <= 0 for f in fractions.values()):
        raise ValueError("fractions must be positive")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-6:
        raise ValueError(f"fractions must sum to 1, got {total}")
    if not 0 < budget_frac <= 1:
        raise ValueError("budget_frac must be in (0, 1]")
    if max_repeat < 1:
        raise ValueError("max_repeat must be >= 1")
    spark = df.sparkSession
    spec = spark.createDataFrame(
        [(g, float(f)) for g, f in fractions.items()],
        f"{group_col} string, _tfrac double",
    )
    counts = (
        # NULL ids can never be sampled (no hash) — counting them would
        # silently depress their group's keep rate
        df.filter(F.col(id_col).isNotNull())
        .groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .join(F.broadcast(spec), group_col)
    )
    tmax = counts.groupBy().agg(
        F.min(F.col("_n") * max_repeat / F.col("_tfrac")).alias("_T")
    )
    # copies in ppm grain: c_g * 1e6, clamped to max_repeat epochs
    rates = counts.join(F.broadcast(tmax)).select(
        group_col,
        F.round(
            F.least(
                F.lit(float(max_repeat)),
                F.col("_tfrac") * F.lit(budget_frac) * F.col("_T") / F.col("_n"),
            )
            * _M,
            0,
        )
        .cast("bigint")
        .alias("mix_ppm"),
    )
    ppm = _hash_ppm(F.col(id_col), seed)
    copies = F.when(
        F.col(id_col).isNull(), F.lit(0)
    ).otherwise(
        (F.col("mix_ppm") / _M).cast("int")
        + (ppm < F.col("mix_ppm") % _M).cast("int")
    )
    return (
        df.join(rates, group_col, "left")
        .withColumn("mix_ppm", F.coalesce(F.col("mix_ppm"), F.lit(0)))
        .withColumn("mix_copies", copies)
        .withColumn("mix_keep", F.col("mix_copies") >= 1)
    )


def sample_to_mixture_sql(
    base_select: str,
    fractions: dict[str, float],
    group_col: str = "lang",
    id_col: str = "url",
    seed: int = 7,
    budget_frac: float = 1.0,
    max_repeat: int = 1,
) -> str:
    """DuckDB mirror (shared SQL source of truth for the parity test).
    ``base_select`` must yield at least (group_col, id_col); all its
    columns pass through plus (mix_ppm, mix_keep)."""
    spec_rows = ", ".join(
        "('{}', {!r})".format(g.replace("'", "''"), float(f))
        for g, f in fractions.items()
    )
    hash_ppm = (
        "CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split(substring(md5('{seed}:' || "
        f"CAST({id_col} AS VARCHAR)), 1, 15), ''), "
        "c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))), "
        f"(a, b) -> a * 16 + b) % {_M} AS INT)"
    )
    return f"""
WITH base AS ({base_select}),
spec({group_col}, tfrac) AS (VALUES {spec_rows}),
counts AS (
  SELECT b.{group_col}, count(*) AS n, any_value(s.tfrac) AS tfrac
  FROM base b JOIN spec s USING ({group_col})
  WHERE b.{id_col} IS NOT NULL
  GROUP BY b.{group_col}
),
tmax AS (SELECT min(n * {max_repeat} / tfrac) AS T FROM counts),
rates AS (
  SELECT {group_col},
         CAST(round(least(CAST({max_repeat} AS DOUBLE),
                          tfrac * {budget_frac!r} * t.T / n) * {_M})
              AS BIGINT) AS mix_ppm
  FROM counts CROSS JOIN tmax t
)
SELECT *,
       (mix_copies >= 1) AS mix_keep
FROM (
  SELECT b.*, coalesce(r.mix_ppm, 0) AS mix_ppm,
         CASE WHEN b.{id_col} IS NULL THEN 0
              ELSE CAST(coalesce(r.mix_ppm, 0) // {_M} AS INT)
                   + CAST({hash_ppm} < coalesce(r.mix_ppm, 0) % {_M} AS INT)
         END AS mix_copies
  FROM base b LEFT JOIN rates r USING ({group_col})
)
"""
