"""Rule-based entity finding — ``find_entity_with_rule`` +
``algorithms/match_patterns.py`` re-expressed as NATIVE column predicates.

A ruleset is OR-of-(AND-of-conditions); each condition maps 1:1 onto a
Catalyst predicate over an exploded token column — fully whole-stage
codegen, no Python.  The output is the distinct set of matching tokens
(optionally with the type to register into the KB dimension).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# --- pattern constructors (match_patterns.py:6-29 semantics) ----------------


def all_english(col: Column) -> Column:
    return col.rlike("^[a-zA-Z]*$")


def all_english_or_num(col: Column) -> Column:
    return col.rlike("^[a-zA-Z0-9]*$")


def upper_first(col: Column) -> Column:
    return F.substring(col, 1, 1).rlike("^[A-Z]$")


def starts_with(prefix: str):
    return lambda col: col.startswith(prefix)


def ends_with(suffix: str):
    return lambda col: col.endswith(suffix)


def contains(span: str):
    return lambda col: col.rlike(span)


def with_length(length: int):
    return lambda col: F.length(col) == length


def find_entities_with_rule(
    docs: DataFrame,
    rulesets,
    words_col: str = "words",
) -> DataFrame:
    """-> (word) distinct tokens matching ANY ruleset (each ruleset is a
    single predicate fn or a tuple of predicate fns ANDed together),
    mirroring ``word_discover.py:98-130``."""
    tok = docs.select(F.explode(words_col).alias("word"))
    any_rule = F.lit(False)
    for ruleset in rulesets:
        conds = ruleset if isinstance(ruleset, tuple) else (ruleset,)
        all_conds = F.lit(True)
        for cond in conds:
            all_conds = all_conds & cond(F.col("word"))
        any_rule = any_rule | all_conds
    return tok.filter(any_rule).distinct()
