"""Tokenization with entity splicing — HarvestText ``seg``/``posseg``
(``harvesttext/harvesttext.py:557-610``) recast for Spark.

The reference tokenizes the decoref'd sentence with jieba and splices the
linked entity surface/standard names back in order.  jieba is not in this
image, so the base cutter is selectable (``cutter=``):
  * ``"auto"`` (default): jieba if importable, else the from-scratch
    dict-DAG max-prob segmenter (``zh_cutter.py`` — curated lexicon +
    THUOCL, reproduces the reference seg/posseg goldens for the test
    vocabulary; OOV handling is a deterministic HMM stand-in),
  * ``"dict"``: force the dict-DAG segmenter,
  * ``"regex"``: the portable fallback — latin/digit runs as single
    tokens, CJK chars as single-char tokens, punct as single tokens.
    This mode is DuckDB-expressible and backs the seg_tokens oracle.
  Entity tokens and their order are EXACT in every mode because linking
  happens before cutting and spans are spliced around, never through,
  an entity.

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


def base_cut(text: str, cutter: str = "auto") -> list[str]:
    """Base segmentation of entity-free text.

    On jieba-equipped deployments the word-only path uses ``jieba.cut``
    (the reference's seg path, harvesttext.py:583), NOT ``jieba.posseg``:
    posseg's joint HMM can pick different token boundaries, which would be
    a silent segmentation change relative to the reference."""
    if cutter == "auto" and HAS_JIEBA:  # pragma: no cover - jieba absent
        return [w for w in jieba.cut(text) if w.strip()]
    return [w for w, _ in base_posseg(text, cutter)]


def _base_pos(tok: str) -> str:
    if re.fullmatch(r"[A-Za-z]+(?:'[A-Za-z]+)?", tok):
        return "eng"
    if re.fullmatch(r"[0-9]+(?:\.[0-9]+)?", tok):
        return "m"
    if re.fullmatch(r"[一-鿿]", tok):
        return "n"
    return "x"


def base_posseg(text: str, cutter: str = "auto") -> list[tuple[str, str]]:
    """(word, pos) pairs from the selected base cutter (module docstring)."""
    if cutter == "auto" and HAS_JIEBA:  # pragma: no cover - jieba absent
        import jieba.posseg as pseg  # type: ignore

        return [(w, p) for w, p in pseg.cut(text) if w.strip()]
    if cutter in ("auto", "dict"):
        from harvesttext_spark.functions.zh_cutter import default_cutter

        return default_cutter().posseg(text)
    if cutter == "regex":
        toks = [t for t in _FALLBACK_TOKEN.findall(text) if t.strip()]
        return [(t, _base_pos(t)) for t in toks]
    raise ValueError(f"unknown cutter {cutter!r} (use auto|dict|regex)")


def seg_py(
    sent: str,
    kb: EntityKB | None = None,
    standard_name: bool = False,
    stopwords: Iterable[str] | None = None,
    with_pos: bool = False,
    cutter: str = "auto",
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
        for tok, pos in base_posseg(sent[cursor:l], cutter):
            if tok in sw:
                continue
            out.append(tok)
            pos_out.append(pos)
        out.append(entity if standard_name else sent[l:r])
        pos_out.append(type0[1:-1])  # '#球员#' -> '球员'
        cursor = r
    for tok, pos in base_posseg(sent[cursor:], cutter):
        if tok in sw:
            continue
        out.append(tok)
        pos_out.append(pos)
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
    cutter: str = "auto",
) -> DataFrame:
    """Adds a token-array column (or array<struct<word,pos>> when
    ``with_pos``).  KB + stopwords broadcast once per executor; the dict
    cutter's lexicon is built once per Python worker from the packaged
    resources (lru_cache) rather than broadcast — same one-time
    deserialization cost, no 10 MB broadcast payload."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(
        (kb, standard_name, tuple(stopwords or ()), with_pos, cutter)
    )

    def run(batches):
        kb_, std, sw, wp, cutter_ = bc.value
        for pdf in batches:
            if wp:
                pdf[out_col] = [
                    [
                        {"word": w, "pos": p}
                        for w, p in seg_py(s, kb_, std, sw, True, cutter_)
                    ]
                    if isinstance(s, str)
                    else []
                    for s in pdf[text_col]
                ]
            else:
                pdf[out_col] = [
                    seg_py(s, kb_, std, sw, cutter=cutter_) if isinstance(s, str) else []
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


def zh_cut_join_udf(cutter: str = "auto"):
    """Arrow pandas UDF: text -> its dict-DAG segmentation joined by
    single spaces (NULL -> NULL).  The composition shim for the
    whitespace-token policy stages (toxicity density, benchmark
    decontamination): zh text carries no spaces, so those stages see one
    giant token and silently score 0 — segmenting first makes zh policy
    filtering actually fire (job flag --zh-policy-seg).  Latin tokens
    pass through the cutter unchanged, so mixed-script text keeps its
    existing token semantics.  The cutter lexicon is built once per
    Python worker (lru_cache), not broadcast."""
    from pyspark.sql import functions as F

    # no type hints: module-level future-annotations stringify them and
    # pyspark's hint inference then rejects the signature
    @F.pandas_udf("string")
    def _seg(s):
        return s.map(
            lambda t: " ".join(base_cut(t, cutter)), na_action="ignore"
        )

    return _seg
