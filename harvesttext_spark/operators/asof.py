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
    left.time per key (NULLs when no prior right row).

    All value_cols are packed into ONE struct before the window's
    last(..., ignorenulls=True): per-column last() would skip a NULL in
    one right column (an older row's value leaking through) and could mix
    columns from different right rows — DuckDB's native ASOF JOIN (the
    oracle) picks exactly one right row, NULL fields included."""
    lcols = left.columns
    row_struct = F.struct(*[F.col(c).alias(c) for c in value_cols])
    l = left.withColumn("_src", F.lit(1)).withColumn(
        "_r",
        F.lit(None).cast(
            "struct<"
            + ",".join(f"{c}:{right.schema[c].dataType.simpleString()}" for c in value_cols)
            + ">"
        ),
    )
    r = right.select(key, time_col, row_struct.alias("_r")).withColumn(
        "_src", F.lit(0)
    )
    for c in lcols:
        if c not in (key, time_col):
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    unioned = l.unionByName(r)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(time_col), F.col("_src"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = unioned.withColumn("_r", F.last("_r", ignorenulls=True).over(w))
    return (
        unioned.filter(F.col("_src") == 1)
        .select(*lcols, *[F.col(f"_r.{c}").alias(f"asof_{c}") for c in value_cols])
    )
