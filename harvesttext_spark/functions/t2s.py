"""Traditional -> simplified Chinese conversion (OpenCC t2s stand-in).

OpenCC is not in this image; this is a char-level conversion over a
committed map (``resources/zh_t2s.tsv``, 2200+ pairs of public
orthographic data — the standard mappings are also published in OpenCC's
TSCharacters).  Phrase-level OpenCC exceptions are a documented
divergence.  Exposed both as a Python translate table (for the cleaning
battery's Arrow UDF) and as a Catalyst ``translate`` column expression
(JVM-side fast path)."""

from __future__ import annotations

import os
from functools import lru_cache

from pyspark.sql import Column
from pyspark.sql import functions as F

_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "resources")


@lru_cache(maxsize=1)
def t2s_pairs() -> tuple[tuple[str, str], ...]:
    out = []
    with open(os.path.join(_DIR, "zh_t2s.tsv"), encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            t, s = line.split("\t")
            out.append((t, s))
    return tuple(out)


@lru_cache(maxsize=1)
def t2s_translate_table() -> dict[int, str]:
    """str.translate table (C-level single pass per string)."""
    return {ord(t): s for t, s in t2s_pairs()}


def t2s_py(text: str) -> str:
    return text.translate(t2s_translate_table())


def t2s_col(col: Column) -> Column:
    """Catalyst-native variant: F.translate with the full char map —
    whole-stage codegen, no Python.  (translate is 1:1 char mapping,
    exactly this table's shape.)"""
    src = "".join(t for t, _ in t2s_pairs())
    dst = "".join(s for _, s in t2s_pairs())
    return F.translate(col, src, dst)
