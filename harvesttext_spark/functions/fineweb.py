"""FineWeb line-wise quality heuristics (Penedo et al. 2024, "The
FineWeb Datasets", §3 — the three custom line-level filters the FineWeb
pipeline adds ON TOP of the C4 and Gopher batteries after ablating each
rule against downstream benchmark scores):

  * terminal-punctuation line ratio — DROP the page when the fraction of
    lines ending in terminal punctuation is <= ``punct_ratio`` (paper
    default 0.12; this is their relaxation of C4's per-line terminal-
    punct rule, which they measured as too aggressive line-wise);
  * short-line ratio — DROP when the fraction of lines shorter than
    ``short_chars`` characters (default 30) is >= ``short_ratio``
    (default 0.67);
  * duplicated-line char ratio — DROP when the fraction of line
    characters sitting in repeat occurrences of a line is >=
    ``dup_ratio`` (default 0.1; the line-wise sibling of Gopher's
    dup_line_char_frac, thresholded tighter).

Layering vs the engine's other batteries (no overlap): C4 (functions/
c4.py) FILTERS individual lines and rebuilds the page; Gopher
(textstats.repetition_signals) measures doc-level repetition for the
cascade; FineWeb keeps/drops the WHOLE page on line-shape ratios.

Everything is pure Catalyst column work (split + higher-order filter /
transform + array_distinct), zero Python, zero shuffle — the battery
rides the scan and whole-stage codegen handles the outer expressions
(the HOF lambdas evaluate interpreted, but per-row line arrays are
small; the duplicated-chars term deliberately uses the O(L log L)
``array_distinct`` difference rather than an O(L²) per-line
occurrence count, so a 10k-line page costs 10k ops, not 1e8).

Line semantics match textstats.repetition_signals exactly (trim, drop
empties) so the two batteries agree on what a "line" is.  Lengths are
BMP-safe on both engines (Spark length = UTF-16 units, DuckDB = code
points — identical below U+10000, the documented corpus/probe domain).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# the published defaults (FineWeb §3.6, Table 3 of the datasheet)
PUNCT_RATIO = 0.12  # keep requires frac_lines_end_punct >  this
SHORT_RATIO = 0.67  # keep requires frac_lines_short     <  this
DUP_RATIO = 0.10  # keep requires frac_chars_dup_lines   <  this
SHORT_CHARS = 30  # a line is "short" below this many chars

# same terminal-punct class as the C4 battery (c4.py _TERMINAL_RE):
# period / ! / ? / closing straight or typographic double quote
_TERMINAL_RE = '[.!?"”]$'


def fineweb_lines(text: Column) -> Column:
    """Trimmed non-empty lines (NULL-safe: NULL text -> empty array).
    Matches repetition_signals' line normalization (trim, drop '')."""
    # NB: the lambda must be single-arg — passing F.trim directly makes
    # transform() call it as (element, index) (Spark 4 trim(col, trimstr)
    # accepts two args), silently turning it into trim-by-character
    return F.filter(
        F.transform(F.split(F.coalesce(text, F.lit("")), "\n"), lambda ln: F.trim(ln)),
        lambda ln: ln != "",
    )


def fineweb_signals(
    lines: Column,
    punct_ratio: float = PUNCT_RATIO,
    short_ratio: float = SHORT_RATIO,
    dup_ratio: float = DUP_RATIO,
    short_chars: int = SHORT_CHARS,
) -> dict[str, Column]:
    """The battery as named columns over a MATERIALIZED ``lines`` column
    (pass ``F.col(...)`` bound to :func:`fineweb_lines` output, not the
    inline expression — HOF lambdas get no CSE, so an inline split would
    re-evaluate per use).  Fractions are rounded to 6 decimals (oracle
    grain); a line-less page has all fractions 0 and keep = false (the
    punct rule fails), matching FineWeb's drop of empty extractions."""
    n_lines = F.size(lines)
    denom = F.greatest(n_lines, F.lit(1))
    n_punct = F.size(F.filter(lines, lambda ln: ln.rlike(_TERMINAL_RE)))
    n_short = F.size(F.filter(lines, lambda ln: F.length(ln) < short_chars))
    total_chars = F.aggregate(
        lines, F.lit(0).cast("long"), lambda acc, ln: acc + F.length(ln)
    )
    distinct_chars = F.aggregate(
        F.array_distinct(lines),
        F.lit(0).cast("long"),
        lambda acc, ln: acc + F.length(ln),
    )
    frac_punct = F.round(n_punct / denom, 6)
    frac_short = F.round(n_short / denom, 6)
    frac_dup = F.round(
        (total_chars - distinct_chars) / F.greatest(total_chars, F.lit(1)), 6
    )
    keep = (
        (frac_punct > punct_ratio)
        & (frac_short < short_ratio)
        & (frac_dup < dup_ratio)
    )
    return {
        "n_lines": n_lines,
        "frac_lines_end_punct": frac_punct,
        "frac_lines_short": frac_short,
        "frac_chars_dup_lines": frac_dup,
        "fineweb_keep": keep,
    }


def fineweb_signals_sql(
    text_expr: str = "text",
    punct_ratio: float = PUNCT_RATIO,
    short_ratio: float = SHORT_RATIO,
    dup_ratio: float = DUP_RATIO,
    short_chars: int = SHORT_CHARS,
) -> dict[str, str]:
    """DuckDB mirror of every signal — interpolate into an oracle.
    ``list_distinct`` reorders but the summed lengths are order-free;
    ``list_sum`` of an empty list is NULL -> coalesced to 0 to match
    Spark's 0-initialized aggregate."""
    lines = (
        f"list_filter(list_transform(string_split(coalesce({text_expr}, ''), "
        f"chr(10)), l -> trim(l)), l -> l != '')"
    )
    n_lines = f"len({lines})"
    denom = f"greatest({n_lines}, 1)"
    n_punct = f"len(list_filter({lines}, l -> regexp_matches(l, '[.!?\"”]$')))"
    n_short = f"len(list_filter({lines}, l -> length(l) < {short_chars}))"
    total = f"coalesce(list_sum(list_transform({lines}, l -> length(l))), 0)"
    distinct = (
        f"coalesce(list_sum(list_transform(list_distinct({lines}), "
        f"l -> length(l))), 0)"
    )
    frac_punct = f"round({n_punct} * 1.0 / {denom}, 6)"
    frac_short = f"round({n_short} * 1.0 / {denom}, 6)"
    frac_dup = f"round(({total} - {distinct}) * 1.0 / greatest({total}, 1), 6)"
    keep = (
        f"({frac_punct} > {punct_ratio} AND {frac_short} < {short_ratio} "
        f"AND {frac_dup} < {dup_ratio})"
    )
    return {
        "n_lines": n_lines,
        "frac_lines_end_punct": frac_punct,
        "frac_lines_short": frac_short,
        "frac_chars_dup_lines": frac_dup,
        "fineweb_keep": keep,
    }


def fineweb_filter(
    df,
    text_col: str = "text",
    punct_ratio: float = PUNCT_RATIO,
    short_ratio: float = SHORT_RATIO,
    dup_ratio: float = DUP_RATIO,
    short_chars: int = SHORT_CHARS,
):
    """All rows + the five signal columns (keep flag in ``fineweb_keep``).
    Materializes the line array once so every signal shares it."""
    out = df.withColumn("_fw_lines", fineweb_lines(F.col(text_col)))
    sig = fineweb_signals(
        F.col("_fw_lines"), punct_ratio, short_ratio, dup_ratio, short_chars
    )
    for name, col in sig.items():
        out = out.withColumn(name, col)
    return out.drop("_fw_lines")
