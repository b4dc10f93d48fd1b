"""Toneless pinyin for fuzzy entity linking.

The reference uses pypinyin's ``lazy_pinyin`` (absent from this image);
this module reproduces the needed subset over a committed curated
char->pinyin table (``resources/zh_char_pinyin.tsv``, most-common
readings, public phonetic knowledge):

  * han chars map through the table; chars not covered fall back to the
    char itself (graceful degradation — such a mention simply never
    matches a pinyin-edited query),
  * consecutive non-han chars group into one passthrough item, matching
    lazy_pinyin('#人名#') == ['#', 'ren', 'ming', '#'].
"""

from __future__ import annotations

import os
from functools import lru_cache

_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "resources")


@lru_cache(maxsize=1)
def char_pinyin_table() -> dict[str, str]:
    table = {}
    with open(os.path.join(_DIR, "zh_char_pinyin.tsv"), encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            ch, py = line.split("\t")
            table[ch] = py
    return table


def _is_han(ch: str) -> bool:
    return "一" <= ch <= "鿿"


def lazy_pinyin(word: str) -> list[str]:
    """Toneless pinyin list; non-han runs pass through as single items."""
    table = char_pinyin_table()
    out: list[str] = []
    run = ""
    for ch in word:
        if _is_han(ch):
            if run:
                out.append(run)
                run = ""
            out.append(table.get(ch, ch))
        else:
            run += ch
    if run:
        out.append(run)
    return out
