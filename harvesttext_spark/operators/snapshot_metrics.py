"""Per-domain metrics time series across snapshots — the monitoring
layer a dump-over-dump curation pipeline runs ABOVE single-run
filtering (CCNet processes Common Crawl per-dump; RefinedWeb/FineWeb
track per-dump quality drift; the cross_snapshot dedup index gave runs
an identity, this gives them a trend line): stack each run's persisted
``domain_metrics`` table with a snapshot ordinal and compute, per
domain, the keep-rate trajectory — previous rate, delta, page growth,
and the collapse / new-domain flags an operator pages through before
shipping a dump.

Scale shape: input is ALREADY domain-aggregated (one row per domain per
snapshot — the per-page work happened in each run), so the only
exchange is the window shuffle on domain, at domain x snapshot
cardinality, constant in page count.  Pure window arithmetic -> fully
SQL-expressible; the driver prefix is full, so the value check lives in
tests/test_snapshot_metrics.py::test_domain_timeseries_sql_parity (the
same DuckDB compare the contract uses) and the queries() entry
``domain_timeseries`` is rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

COLLAPSE_DELTA = 0.2  # keep-rate drop (absolute) that flags a domain


def domain_timeseries(
    dm: DataFrame,
    snapshot_col: str = "snapshot",
    domain_col: str = "domain",
    pages_col: str = "n_pages",
    keep_col: str = "n_keep",
    collapse_delta: float = COLLAPSE_DELTA,
) -> DataFrame:
    """-> (domain, snapshot, n_pages, n_keep, keep_rate, prev_rate,
    rate_delta, page_growth, is_new, collapsing) — one row per input
    row.  ``snapshot`` is any orderable ordinal (dump index, date int).
    keep_rate/prev_rate/rate_delta/page_growth round to 6 decimals (the
    oracle grain).  A domain's first snapshot has NULL prev/delta/growth
    and is_new = true; ``collapsing`` flags an absolute keep-rate drop
    of at least ``collapse_delta`` vs the domain's previous snapshot."""
    rate = F.col(keep_col) / F.greatest(F.col(pages_col), F.lit(1))
    base = dm.select(
        F.col(domain_col).alias("domain"),
        F.col(snapshot_col).alias("snapshot"),
        F.col(pages_col).alias("n_pages"),
        F.col(keep_col).alias("n_keep"),
        rate.alias("_rate"),
    )
    # ONE window spec for both lags -> a single Window node in the plan
    w = Window.partitionBy("domain").orderBy(F.asc("snapshot"))
    prev_rate = F.lag("_rate").over(w)
    prev_pages = F.lag("n_pages").over(w)
    out = base.select(
        "domain",
        "snapshot",
        "n_pages",
        "n_keep",
        F.round("_rate", 6).alias("keep_rate"),
        F.round(prev_rate, 6).alias("prev_rate"),
        F.round(F.col("_rate") - prev_rate, 6).alias("rate_delta"),
        F.when(
            prev_pages.isNull(), F.lit(None).cast("double")
        ).otherwise(
            F.round(F.col("n_pages") / F.greatest(prev_pages, F.lit(1)), 6)
        ).alias("page_growth"),
        prev_rate.isNull().alias("is_new"),
        F.coalesce(
            (F.round(F.col("_rate") - prev_rate, 6) <= F.lit(-collapse_delta)),
            F.lit(False),
        ).alias("collapsing"),
    )
    return out


def domain_timeseries_sql(
    base_select: str, collapse_delta: float = COLLAPSE_DELTA
) -> str:
    """DuckDB mirror (shared SQL source of truth for the parity test
    and any external checker).  ``base_select`` must yield
    (domain, snapshot, n_pages, n_keep)."""
    return f"""
WITH base AS ({base_select}),
r AS (
  SELECT domain, snapshot, n_pages, n_keep,
         n_keep * 1.0 / greatest(n_pages, 1) AS _rate,
         lag(n_keep * 1.0 / greatest(n_pages, 1)) OVER w AS _prev,
         lag(n_pages) OVER w AS _prev_pages
  FROM base
  WINDOW w AS (PARTITION BY domain ORDER BY snapshot ASC)
)
SELECT domain, snapshot, n_pages, n_keep,
       round(_rate, 6) AS keep_rate,
       round(_prev, 6) AS prev_rate,
       round(_rate - _prev, 6) AS rate_delta,
       CASE WHEN _prev_pages IS NULL THEN NULL
            ELSE round(n_pages * 1.0 / greatest(_prev_pages, 1), 6)
       END AS page_growth,
       (_prev IS NULL) AS is_new,
       coalesce(round(_rate - _prev, 6) <= -{collapse_delta}, false)
         AS collapsing
FROM r
"""
