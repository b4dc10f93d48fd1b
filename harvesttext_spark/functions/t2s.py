"""Traditional -> simplified Chinese conversion (OpenCC t2s stand-in).

OpenCC is not in this image; this is a committed-data conversion in two
layers, the same structure OpenCC's published t2s config uses
(reference applies OpenCC in battery pass 16, harvesttext.py:826-828):

  1. PHRASE layer (``resources/zh_t2s_phrases.tsv``): multi-char
     exceptions — protections whose chars must not char-convert
     (乾隆 stays 乾隆) and overrides the char map cannot express
     (答覆→答复).  Applied longest-first via private-use-area
     placeholders so the char pass cannot touch their output.
  2. CHAR layer (``resources/zh_t2s.tsv``, 2200+ pairs of public
     orthographic data, the standard mappings also published in
     OpenCC's TSCharacters): a 1:1 ``translate``.

All three engines share the exact same replace-chain semantics, so they
are value-identical by construction:
  * Python: str.replace per phrase (loader order) + str.translate
  * Catalyst: F.replace chain + F.translate (whole-stage codegen)
  * DuckDB oracle: replace(...) chain + translate(...)

Documented divergence from OpenCC (tests/test_clean_text.py pins it):
OpenCC's trie matches LEFTMOST-LONGEST per position; the replace chain
applies each phrase GLOBALLY in longest-then-lexicographic order, so
when two phrases overlap in the text the chain can let the earlier-
ordered one win (e.g. 著名著作: 名著 substitutes first, leaving the
first 著 to the char default 着).  The failure mode is bounded: a
protection losing an overlap falls back to the char-level default —
under-protection, never corrupted output — and no SQL engine can
express per-match dictionary replacement, so the chain is the price of
the three-engine value-identity contract.
"""

from __future__ import annotations

import os
from functools import lru_cache

from pyspark.sql import Column
from pyspark.sql import functions as F

_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "resources")

# private-use-area placeholders, one per phrase.  Scraped web text CAN
# contain BMP private-use chars (icon fonts emit U+E000..U+F8FF and the
# battery does not strip them), so a pre-pass DELETES the whole BMP PUA
# block before phrase substitution — identically in all three engines —
# to guarantee placeholders never collide with input (OpenCC has no such
# collision because it substitutes in one trie pass; the replace-chain
# recast needs the guard).  PUA chars carry no meaning without the
# private font, so dropping them is a no-op for conversion semantics.
_PUA_BASE = 0xE000
_PUA_END = 0xF8FF  # inclusive; 6400 placeholders available
_PUA_CLASS = "[\ue000-\uf8ff]"  # RE2-safe positive class; same codepoints in the SQL mirror


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
def t2s_phrase_pairs() -> tuple[tuple[str, str], ...]:
    """(traditional_phrase, simplified_phrase), longest-first then
    lexicographic — deterministic application order shared by every
    engine (longer phrases must win over their own substrings)."""
    out = []
    with open(os.path.join(_DIR, "zh_t2s_phrases.tsv"), encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            t, s = line.split("\t")
            out.append((t, s))
    out.sort(key=lambda p: (-len(p[0]), p[0]))
    if len(out) > _PUA_END - _PUA_BASE + 1:  # placeholder space exhausted
        raise ValueError(
            f"{len(out)} t2s phrases exceed the {_PUA_END - _PUA_BASE + 1} "
            "BMP private-use placeholders"
        )
    return tuple(out)


@lru_cache(maxsize=1)
def t2s_translate_table() -> dict[int, str]:
    """str.translate table (C-level single pass per string)."""
    return {ord(t): s for t, s in t2s_pairs()}


@lru_cache(maxsize=1)
def _restore_table() -> dict[int, str]:
    return {
        _PUA_BASE + i: s for i, (_, s) in enumerate(t2s_phrase_pairs())
    }


@lru_cache(maxsize=1)
def _pua_delete_table() -> dict[int, None]:
    return {cp: None for cp in range(_PUA_BASE, _PUA_END + 1)}


def t2s_py(text: str, phrases: bool = True) -> str:
    if phrases:
        # collision guard: delete any pre-existing PUA chars so the
        # restore pass can never rewrite input bytes into phrase targets
        text = text.translate(_pua_delete_table())
        for i, (t, _) in enumerate(t2s_phrase_pairs()):
            if t in text:
                text = text.replace(t, chr(_PUA_BASE + i))
        return text.translate(t2s_translate_table()).translate(_restore_table())
    return text.translate(t2s_translate_table())


def t2s_col(col: Column, phrases: bool = True) -> Column:
    """Catalyst-native variant — whole-stage codegen, no Python: an
    F.replace chain substitutes each phrase with its PUA placeholder,
    F.translate runs the 1:1 char map, a second chain restores the
    phrase targets.  Literal (non-regex) replace throughout."""
    c = col
    if phrases:
        # same PUA collision guard as t2s_py (see _PUA_CLASS comment)
        c = F.regexp_replace(c, _PUA_CLASS, "")
        for i, (t, _) in enumerate(t2s_phrase_pairs()):
            c = F.replace(c, F.lit(t), F.lit(chr(_PUA_BASE + i)))
    src = "".join(t for t, _ in t2s_pairs())
    dst = "".join(s for _, s in t2s_pairs())
    c = F.translate(c, src, dst)
    if phrases:
        for i, (_, s) in enumerate(t2s_phrase_pairs()):
            c = F.replace(c, F.lit(chr(_PUA_BASE + i)), F.lit(s))
    return c


def _sql_replace_fold(col_sql: str, pairs) -> str:
    """Ordered replace-chain as a DuckDB ``list_reduce`` fold: nesting
    182 replace() calls blew the binder's max expression depth (128) once
    the phrase table grew past ~60 entries; the fold is depth-1 with the
    (find, repl) pairs as tab-separated list literals (tab can't occur in
    phrases or placeholders).  NULL propagates through like the chain."""

    def q(s: str) -> str:
        return s.replace("'", "''")

    items = ", ".join(f"'{q(find)}\t{q(repl)}'" for find, repl in pairs)
    return (
        f"list_reduce(list_value(CAST({col_sql} AS VARCHAR), {items}), "
        "(acc, x) -> replace(acc, split_part(x, chr(9), 1), "
        "split_part(x, chr(9), 2)))"
    )


def t2s_sql(col_expr: str, phrases: bool = True) -> str:
    """The SAME conversion as an ANSI-SQL expression (DuckDB oracle)."""

    def q(s: str) -> str:
        return s.replace("'", "''")

    c = col_expr
    if phrases:
        # same PUA collision guard; DuckDB literals are not
        # backslash-escaped, so the codepoints go in verbatim
        c = f"regexp_replace({c}, '{_PUA_CLASS}', '', 'g')"
        c = _sql_replace_fold(
            c,
            ((t, chr(_PUA_BASE + i)) for i, (t, _) in enumerate(t2s_phrase_pairs())),
        )
    src = "".join(t for t, _ in t2s_pairs())
    dst = "".join(s for _, s in t2s_pairs())
    c = f"translate({c}, '{q(src)}', '{q(dst)}')"
    if phrases:
        c = _sql_replace_fold(
            c,
            ((chr(_PUA_BASE + i), s) for i, (_, s) in enumerate(t2s_phrase_pairs())),
        )
    return c
