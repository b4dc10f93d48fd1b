"""Punkt-style unsupervised abbreviation detection — the corpus-trained
half of an English sentence model (Kiss & Strunk 2006, "Unsupervised
Multilingual Sentence Boundary Detection").

The reference's en path calls nltk ``sent_tokenize`` (a pretrained punkt
model; ``/root/reference/harvesttext/harvesttext.py:707``) — nltk and its
pickled model are absent from this image, so round 2 shipped a hand list
of abbreviations.  This module closes the gap from scratch: TRAIN the
abbreviation list on the corpus itself with the paper's statistics,
expressed as ONE Spark aggregation pipeline (no Python in the loop, fully
mirrorable in ANSI SQL for the value oracle):

  For each word type ``typ`` (lowercased, final period stripped) with
  ``c_period`` occurrences ending in '.' and ``c_nonperiod`` without:

    p        = n_period_tokens / n_tokens          (corpus period rate)
    ll       = -2 * (c_period*ln(p)    + c_nonperiod*ln(1-p)
                   - c_period*ln(0.99) - c_nonperiod*ln(0.01))
    f_length = exp(-len)          len = chars of typ excluding periods
    f_periods= internal periods + 1
    f_penalty= len ^ -c_nonperiod
    score    = ll * f_length * f_periods * f_penalty
    abbreviation  <=>  score >= 0.3  and c_period > 0

(The log-likelihood ratio compares the null "periods attach to this type
at the corpus rate" against the abbreviation hypothesis "this type takes
a final period with probability 0.99"; short types, internal periods, and
few period-less occurrences all push toward abbreviation — exactly the
paper's type-based stage.  The token-based second stage (orthographic
heuristics for sentence starters) is out of scope; the trained list feeds
the rule splitter's shield.)

Scale: tokenize -> explode -> one groupBy(typ) -> broadcast of the
two-scalar totals row.  One shuffle on typ; candidate cardinality is
vocabulary-sized, orders of magnitude below corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tokens considered by the trainer: alphabetic, possibly with internal or
# final periods (e.g. "etc." "u.s." "Dr.") — matches the SQL mirror exactly
TOKEN_RE = "^[A-Za-z][A-Za-z.]*\\.?$"
ABBREV_THRESHOLD = 0.3
_P_ABBR = 0.99
_EPS = 1e-9


def punkt_abbreviations(
    df: DataFrame, text_col: str = "text", min_count: int = 1
) -> DataFrame:
    """(abbrev, score) for every trained abbreviation type, score rounded
    to 6 places (cross-engine float stability).  Pure DataFrame ops."""
    toks = (
        df.select(F.explode(F.split(F.col(text_col), "\\s+")).alias("tok"))
        .filter(F.col("tok").rlike(TOKEN_RE))
    )
    typed = toks.select(
        F.lower(F.regexp_replace("tok", "\\.$", "")).alias("typ"),
        F.col("tok").endswith(".").cast("long").alias("wp"),
    )
    by_typ = typed.groupBy("typ").agg(
        F.count("*").alias("c_total"), F.sum("wp").alias("c_period")
    )
    totals = typed.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("wp").cast("double").alias("np"),
    )
    # clamp the corpus period rate away from {0,1} so ln() stays finite on
    # degenerate corpora; the SQL mirror applies the same clamp
    j = by_typ.crossJoin(F.broadcast(totals))
    p = F.least(F.greatest(F.col("np") / F.col("n"), F.lit(_EPS)), F.lit(1 - _EPS))
    c_np = F.col("c_total") - F.col("c_period")
    ll = -2.0 * (
        F.col("c_period") * F.log(p)
        + c_np * F.log(1 - p)
        - F.col("c_period") * F.lit(float(__import__("math").log(_P_ABBR)))
        - c_np * F.lit(float(__import__("math").log(1 - _P_ABBR)))
    )
    len_ = F.length(F.regexp_replace("typ", "\\.", ""))
    n_periods = F.length("typ") - len_
    score = (
        ll
        * F.exp(-len_.cast("double"))
        * (n_periods + F.lit(1)).cast("double")
        * F.pow(len_.cast("double"), -c_np.cast("double"))
    )
    return (
        j.withColumn("score", F.round(score, 6))
        .filter(
            (F.col("c_period") > 0)
            & (F.col("c_total") >= min_count)
            & (F.col("score") >= ABBREV_THRESHOLD)
        )
        .select(F.col("typ").alias("abbrev"), "score")
    )


def punkt_abbreviations_sql(table: str = "documents", text_col: str = "text") -> str:
    """The exact same computation as ANSI SQL (DuckDB value oracle)."""
    import math

    ln_p99 = repr(math.log(_P_ABBR))
    ln_p01 = repr(math.log(1 - _P_ABBR))
    return f"""
WITH toks AS (
  SELECT unnest(regexp_split_to_array({text_col}, '\\s+')) AS tok FROM {table}
), cand AS (
  SELECT tok FROM toks WHERE regexp_matches(tok, '{TOKEN_RE}')
), typed AS (
  SELECT lower(regexp_replace(tok, '\\.$', '')) AS typ,
         CASE WHEN tok LIKE '%.' THEN 1 ELSE 0 END AS wp
  FROM cand
), tot AS (
  SELECT count(*)::DOUBLE AS n, sum(wp)::DOUBLE AS np FROM typed
), by_typ AS (
  SELECT typ, count(*) AS c_total, sum(wp) AS c_period FROM typed GROUP BY typ
), scored AS (
  SELECT typ,
         c_period,
         c_total,
         round(
           (-2.0 * (c_period * ln(least(greatest(np / n, {_EPS}), {1 - _EPS}))
                    + (c_total - c_period) * ln(1 - least(greatest(np / n, {_EPS}), {1 - _EPS}))
                    - c_period * ({ln_p99})
                    - (c_total - c_period) * ({ln_p01})))
           * exp(-(length(replace(typ, '.', ''))))
           * (length(typ) - length(replace(typ, '.', '')) + 1)
           * pow(length(replace(typ, '.', '')), -(c_total - c_period)),
         6) AS score
  FROM by_typ CROSS JOIN tot
)
SELECT typ AS abbrev, score
FROM scored
WHERE c_period > 0 AND score >= {ABBREV_THRESHOLD}
"""


def trained_abbrev_list(df: DataFrame, text_col: str = "text") -> list[str]:
    """Driver-side convenience: the trained abbreviation types, sorted.
    Vocabulary-sized collect (same class as the engine's dimension reads)."""
    return sorted(
        r["abbrev"] for r in punkt_abbreviations(df, text_col).collect()
    )
