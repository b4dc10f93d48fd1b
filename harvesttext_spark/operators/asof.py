"""As-of join — Spark has no native one (pyspark_guide: bucketize or
merge_asof per group); this is the fully-relational recast that scales:

    UNION both sides with a source tag, window per key ordered by
    (time, tag) with right rows sorting first at equal timestamps, then
    last(attr, ignorenulls=True) over rows UNBOUNDED PRECEDING..CURRENT —
    each left row picks up the most recent right row at-or-before it.

One shuffle on the key (the window), no point-in-time self-join explosion,
no per-group pandas.  DuckDB's native ASOF JOIN is the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    time_col: str,
    value_cols: list[str],
) -> DataFrame:
    """left rows + the latest right ``value_cols`` with right.time <=
    left.time per key (NULLs when no prior right row)."""
    lcols = left.columns
    l = left.withColumn("_src", F.lit(1))
    for c in value_cols:
        l = l.withColumn(f"_r_{c}", F.lit(None).cast(right.schema[c].dataType))
    r = right.select(
        key,
        time_col,
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    ).withColumn("_src", F.lit(0))
    for c in lcols:
        if c not in (key, time_col):
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    unioned = l.unionByName(r)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(time_col), F.col("_src"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in value_cols:
        unioned = unioned.withColumn(
            f"_r_{c}", F.last(f"_r_{c}", ignorenulls=True).over(w)
        )
    return (
        unioned.filter(F.col("_src") == 1)
        .select(*lcols, *[F.col(f"_r_{c}").alias(f"asof_{c}") for c in value_cols])
    )
