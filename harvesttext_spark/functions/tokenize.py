"""Tokenization with entity splicing — HarvestText ``seg``/``posseg``
(``harvesttext/harvesttext.py:557-610``) recast for Spark.

The reference tokenizes the decoref'd sentence with jieba and splices the
linked entity surface/standard names back in order.  jieba is not in this
image, so the base cutter is gated:
  * ``jieba`` if importable (exact reference behavior),
  * else a deterministic fallback: latin/digit runs as single tokens, CJK
    chars as single-char tokens, punct as single tokens (documented
    divergence — entity tokens and their order are still EXACT because
    linking happens before cutting and spans are spliced around, never
    through, an entity).

Spark surface: ``seg_documents`` — one ``mapInPandas`` stage holding the
broadcast KB; emits token arrays (and (word,pos) structs for posseg).
"""

from __future__ import annotations

import re
from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame

from harvesttext_spark.operators.linking import EntityKB

try:  # pragma: no cover - absent in this image
    import jieba  # type: ignore

    HAS_JIEBA = True
except ImportError:
    HAS_JIEBA = False

_FALLBACK_TOKEN = re.compile(
    r"[A-Za-z]+(?:'[A-Za-z]+)?|[0-9]+(?:\.[0-9]+)?|[一-鿿]|\s+|."
)


def base_cut(text: str) -> list[str]:
    """Base segmentation of entity-free text."""
    if HAS_JIEBA:
        return [t for t in jieba.cut(text) if t.strip()]
    return [t for t in _FALLBACK_TOKEN.findall(text) if t.strip()]


def _base_pos(tok: str) -> str:
    if re.fullmatch(r"[A-Za-z]+(?:'[A-Za-z]+)?", tok):
        return "eng"
    if re.fullmatch(r"[0-9]+(?:\.[0-9]+)?", tok):
        return "m"
    if re.fullmatch(r"[一-鿿]", tok):
        return "n"
    return "x"


def seg_py(
    sent: str,
    kb: EntityKB | None = None,
    standard_name: bool = False,
    stopwords: Iterable[str] | None = None,
    with_pos: bool = False,
):
    """Reference seg/posseg splice semantics: link entities first, cut the
    text BETWEEN spans, emit the entity surface (or standard name) as one
    token tagged with its type.  Stopword filter skips non-entity tokens
    only (reference behavior: entities bypass the stopword check)."""
    sw = set(stopwords or ())
    spans = kb.link(sent) if kb is not None else []
    out = []
    pos_out = []
    cursor = 0
    for l, r, entity, type0 in spans:
        for tok in base_cut(sent[cursor:l]):
            if tok in sw:
                continue
            out.append(tok)
            pos_out.append(_base_pos(tok))
        out.append(entity if standard_name else sent[l:r])
        pos_out.append(type0[1:-1])  # '#球员#' -> '球员'
        cursor = r
    for tok in base_cut(sent[cursor:]):
        if tok in sw:
            continue
        out.append(tok)
        pos_out.append(_base_pos(tok))
    if with_pos:
        return list(zip(out, pos_out))
    return out


def seg_documents(
    df: DataFrame,
    kb: EntityKB | None = None,
    text_col: str = "text",
    standard_name: bool = False,
    stopwords: Iterable[str] | None = None,
    with_pos: bool = False,
    out_col: str = "words",
) -> DataFrame:
    """Adds a token-array column (or array<struct<word,pos>> when
    ``with_pos``).  KB + stopwords broadcast once per executor."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast((kb, standard_name, tuple(stopwords or ()), with_pos))

    def run(batches):
        kb_, std, sw, wp = bc.value
        for pdf in batches:
            if wp:
                pdf[out_col] = [
                    [{"word": w, "pos": p} for w, p in seg_py(s, kb_, std, sw, True)]
                    if isinstance(s, str)
                    else []
                    for s in pdf[text_col]
                ]
            else:
                pdf[out_col] = [
                    seg_py(s, kb_, std, sw) if isinstance(s, str) else []
                    for s in pdf[text_col]
                ]
            yield pdf

    extra = (
        f"{out_col} array<struct<word:string,pos:string>>"
        if with_pos
        else f"{out_col} array<string>"
    )
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", " + extra
    return df.mapInPandas(run, schema=schema)
