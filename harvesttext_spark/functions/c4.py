"""C4 line-level cleaning battery (Raffel et al. 2020, §2.2 — the
"Colossal Clean Crawled Corpus" rules): the classic per-line filters
every English web-pretraining pipeline applies between HTML extraction
and doc-level quality scoring.

Per-LINE rules (a line survives iff all hold):
  * ends in terminal punctuation — period / ! / ? / closing double
    quote, optionally after trailing whitespace (the paper's "terminal
    punctuation mark (i.e. a period, exclamation mark, question mark,
    or end quotation mark)");
  * has at least ``min_words`` words (paper: 5);
  * does not contain the word "javascript" (case-insensitive).

Per-PAGE rules (flags for the caller / job stage to drop on):
  * fewer than ``min_sentences`` sentences after line filtering
    (paper: 3; sentence count ≈ terminal-punct marks in retained text —
    documented approximation, the paper does not specify its counter);
  * contains "{" (code);
  * contains "lorem ipsum" (case-insensitive).
The paper's bad-word list is NOT duplicated here — compose with the
engine's toxicity lexicon stage (sentiment.py), which is that rule.

Everything is pure Catalyst column work (split + higher-order filter +
regexp), zero Python, zero shuffle — the battery rides the scan.  Word
counting uses the explicit class [^ \\t\\n\\x0B\\f\\r]+ because Java \\S
and RE2 \\S disagree on \\x0b (the substring_dedup tokenizer pin), so
the Spark battery, the DuckDB oracle, and the tests count identically.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# terminal punct at end-of-line (after rstrip): . ! ? or closing double
# quote (straight or typographic), per the C4 wording
_TERMINAL_RE = '[.!?"”]$'
_NONSPACE_RE = "[^ \\t\\n\\x0B\\f\\r]+"


def _line_ok(ln: Column, min_words: int) -> Column:
    t = F.rtrim(ln)
    return (
        t.rlike(_TERMINAL_RE)
        & (F.regexp_count(t, F.lit(_NONSPACE_RE)) >= min_words)
        & ~F.lower(t).contains("javascript")
    )


def c4_signals(
    text: Column, min_words: int = 5
) -> dict[str, Column]:
    """The battery as named columns over ``text`` (NULL-safe: NULL text
    yields text_c4 NULL, zero counts, false flags).  ``text_c4`` is the
    page rebuilt from surviving lines only, '\\n'-joined."""
    lines = F.split(F.coalesce(text, F.lit("")), "\n")
    kept = F.filter(lines, lambda ln: _line_ok(ln, min_words))
    text_c4 = F.array_join(kept, "\n")
    n_sentences = F.length(text_c4) - F.length(
        F.regexp_replace(text_c4, "[.!?]", "")
    )
    low = F.lower(F.coalesce(text, F.lit("")))
    return {
        "text_c4": F.when(text.isNull(), None).otherwise(text_c4),
        "n_lines": F.when(text.isNull(), F.lit(0)).otherwise(F.size(lines)),
        "n_lines_kept": F.size(kept),
        "n_sentences": n_sentences,
        "has_curly": low.contains("{"),
        "has_lorem_ipsum": low.contains("lorem ipsum"),
    }


def c4_signals_sql(
    text_expr: str = "text", min_words: int = 5
) -> dict[str, str]:
    """DuckDB mirror of every signal — interpolate into an oracle.  The
    same explicit whitespace class and terminal-punct class, RE2 side."""
    lines = f"string_split(coalesce({text_expr}, ''), chr(10))"
    ok = (
        f"regexp_matches(rtrim(ln), '[.!?\"”]$') AND "
        f"len(regexp_extract_all(rtrim(ln), '[^ \t\n\x0b\f\r]+')) >= {min_words} "
        f"AND NOT contains(lower(ln), 'javascript')"
    )
    kept = f"list_filter({lines}, ln -> {ok})"
    text_c4 = f"list_aggregate({kept}, 'string_agg', chr(10))"
    # string_agg over an empty list yields NULL; the Spark side joins to ''
    text_c4 = f"coalesce({text_c4}, '')"
    return {
        "text_c4": f"CASE WHEN {text_expr} IS NULL THEN NULL ELSE {text_c4} END",
        "n_lines": f"CASE WHEN {text_expr} IS NULL THEN 0 ELSE len({lines}) END",
        "n_lines_kept": f"len({kept})",
        "n_sentences": (
            f"length({text_c4}) - length(regexp_replace({text_c4}, '[.!?]', '', 'g'))"
        ),
        "has_curly": f"contains(lower(coalesce({text_expr}, '')), '{{')",
        "has_lorem_ipsum": f"contains(lower(coalesce({text_expr}, '')), 'lorem ipsum')",
    }


def c4_clean(
    df, text_col: str = "text", min_words: int = 5, out_col: str = "text_c4"
):
    """All rows + the six signal columns (text rebuilt in ``out_col``)."""
    sig = c4_signals(F.col(text_col), min_words)
    out = df
    for name, col in sig.items():
        out = out.withColumn(out_col if name == "text_c4" else name, col)
    return out
