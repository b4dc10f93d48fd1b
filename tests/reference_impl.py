"""Single-threaded plain-Python reference semantics for the keep/drop gate.

This module deliberately re-derives the quality signals with ordinary Python
``re`` / string ops — INDEPENDENT of the Catalyst column expressions in
``harvesttext_spark/functions/textstats.py`` — so the F1/byte-identity test
is a genuine cross-implementation check, mirroring how the reference's
single-process pipeline would label each document.
"""

from __future__ import annotations

import re

from harvesttext_spark.functions.cleaning import clean_text_py

MIN_CHARS = 20
MAX_CHAR_RUN = 10
MIN_ALNUM_RATIO = 0.45
MIN_DISTINCT_RATIO = 0.30
DIVERSITY_MIN_TOKENS = 20

_ALNUM = re.compile(r"[A-Za-z0-9一-鿿]")
_RUN10 = re.compile(r"(.)\1{9}", re.DOTALL)


def label_py(raw_text: str, **clean_flags):
    """Returns (text_clean, keep, drop_reason) for one document."""
    if raw_text is None:
        return None, False, "null_text"
    clean = clean_text_py(raw_text, **clean_flags)
    n_chars = len(clean)
    if n_chars < MIN_CHARS:
        return clean, False, "too_short"
    if _RUN10.search(clean):
        return clean, False, "char_run"
    n_alnum = len(_ALNUM.findall(clean))
    if n_alnum / max(n_chars, 1) < MIN_ALNUM_RATIO:
        return clean, False, "low_alnum"
    toks = [t for t in re.split(r"\s+", clean) if t]
    if len(toks) >= DIVERSITY_MIN_TOKENS and len(set(toks)) / len(toks) < MIN_DISTINCT_RATIO:
        return clean, False, "low_diversity"
    return clean, True, None
