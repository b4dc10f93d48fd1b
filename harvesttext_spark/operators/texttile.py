"""TextTiling paragraph segmentation — ``cut_paragraphs``
(``harvesttext/parsing.py:123-189`` + ``harvesttext/algorithms/texttile.py``)
as a per-document ``applyInPandas`` operator.

Algorithm (Hearst-style, reference-parity):
  1. sentence-block cosine similarities: sim[i-1] = cos(bow of the
     ``block_sents`` sentences left of gap i, bow right of gap i)
  2. depth score per gap: (left peak + right peak − 2·sim)
  3. auto paragraph count: #depths > mean − std_weight·std
  4. boundaries = top-(k−1) depths + the end; optionally aligned to the
     nearest original newline boundary (consuming them left-to-right).

State per document is a few hundred sentences — the document FLEET is the
parallelism, the per-doc algorithm stays local and exact.
"""

from __future__ import annotations

import math
import re
from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame

from harvesttext_spark.functions.sentences import cut_sentences_py
from harvesttext_spark.functions.tokenize import seg_py

_PUNCTS = re.compile(
    r"[，\_《。》、？；：‘’＂“”【「】」、·！@￥…（）—\,\<\.\>\/\?\;\:\'\"\[\]\{\}\~\`"
    r"\!\@\#\$\%\^\&\*\(\)\-\=\+]"
)


def _cos(words1: list[str], words2: list[str]) -> float:
    eps = 1e-5
    b1, b2 = Counter(words1), Counter(words2)
    n1 = math.sqrt(sum(x * x for x in b1.values())) + eps
    n2 = math.sqrt(sum(x * x for x in b2.values())) + eps
    return sum(b1[w] * b2[w] for w in set(b1) & set(b2)) / (n1 * n2)


def depth_scores(sims: list[float]) -> list[float]:
    """Depth of each gap vs the nearest flanking similarity peaks."""
    n = len(sims)
    left = list(sims)
    right = list(sims)
    offset = 0
    for i in range(n - 2):
        if sims[i + 1] < sims[i]:
            for j in range(offset, i + 1):
                right[j] = sims[i]
            offset = i + 1
    offset = n
    for i in range(n - 1, 0, -1):
        if sims[i - 1] < sims[i]:
            for j in range(i, offset):
                left[j] = sims[i]
            offset = i
    return [left[i] + right[i] - 2 * sims[i] for i in range(n - 1)]


def align_boundaries(pred: list[int], orig: list[int]) -> list[int]:
    """Snap each predicted boundary to the nearest unconsumed original
    boundary, consuming originals left-to-right (no duplicates)."""
    orig = list(orig)
    for i in range(len(pred)):
        preserve_to = len(orig) - (len(pred) - i) + 1
        best_at = preserve_to - 1
        dist = orig[best_at]
        for j in range(preserve_to):
            d0 = abs(pred[i] - orig[j])
            if d0 > dist:
                break
            dist, best_at = d0, j
        pred[i] = orig[best_at]
        del orig[: best_at + 1]
    return pred


def cut_paragraphs_py(
    text: str,
    num_paras: int | None = None,
    block_sents: int = 3,
    std_weight: float = 0.5,
    align_boundary: bool = True,
    stopwords=(),
    remove_puncts: bool = True,
    kb=None,
) -> list[str]:
    """Single-document TextTiling (tests / inside applyInPandas)."""
    if align_boundary:
        paras = [p.strip() for p in text.split("\n") if p.strip()]
        if num_paras is not None and num_paras >= len(paras):
            return paras
        sentences: list[str] = []
        original_boundary_ids = []
        for p in paras:
            sentences.extend(cut_sentences_py(p))
            original_boundary_ids.append(len(sentences))
    else:
        original_boundary_ids = None
        sentences = cut_sentences_py(text)
    if not sentences:
        return []

    sent_words = []
    for s in sentences:
        toks = seg_py(s, kb=kb, standard_name=True, stopwords=stopwords)
        if remove_puncts:
            toks = [t for t in (_PUNCTS.sub("", t) for t in toks) if t]
        sent_words.append(toks)

    n = len(sent_words)
    if n == 1:
        return ["".join(sentences)]
    sims = [0.0] * n
    for i in range(1, n):
        lw = [x for ws in sent_words[max(0, i - block_sents):i] for x in ws]
        rw = [x for ws in sent_words[i:min(n, i + block_sents)] for x in ws]
        sims[i - 1] = _cos(lw, rw)
    depths = depth_scores(sims)
    if not depths:
        return ["".join(sentences)]

    if num_paras is None:
        mean = sum(depths) / len(depths)
        std = math.sqrt(sum((d - mean) ** 2 for d in depths) / len(depths))
        num_paras = sum(1 for d in depths if d > mean - std_weight * std)
        if align_boundary and num_paras >= len(original_boundary_ids):
            bounds = original_boundary_ids
            return ["".join(sentences[l:r]) for l, r in zip([0] + bounds[:-1], bounds)]

    order = sorted(range(len(depths)), key=lambda i: -depths[i])
    bounds = sorted([i + 1 for i in order[: max(num_paras - 1, 0)]] + [n])
    if align_boundary:
        bounds = align_boundaries(bounds, original_boundary_ids)
    return ["".join(sentences[l:r]) for l, r in zip([0] + bounds[:-1], bounds)]


def cut_paragraphs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    **params,
) -> DataFrame:
    """(doc_id, text) -> (doc_id, para_id, paragraph) rows."""

    def per_doc(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, r in pdf.iterrows():
            for j, para in enumerate(cut_paragraphs_py(r[text_col] or "", **params)):
                rows.append((r[id_col], j, para))
        return pd.DataFrame(rows, columns=["doc_id", "para_id", "paragraph"])

    return df.groupBy(id_col).applyInPandas(
        per_doc, schema="doc_id long, para_id int, paragraph string"
    )
