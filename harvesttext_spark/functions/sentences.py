"""Sentence segmentation — HarvestText ``cut_sentences`` recast for Spark.

Reference semantics (``harvesttext/harvesttext.py:694-727``): zh path inserts
newlines after sentence-final punctuation via four regex passes and splits;
optional punctuation-run dedup; strip + drop-empty.  The en path in the
reference calls nltk ``sent_tokenize`` — nltk is not in this image, so the en
path here uses the same rule-based splitter restricted to ASCII terminators
(documented divergence; zh is the contract path).

Spark surface:
  * ``cut_sentences_py``      — str -> list[str]  (tests / oracle parity)
  * ``cut_sentences_udf``     — pandas UDF -> array<string> column
  * ``explode_sentences(df)`` — (doc_id, text) -> (doc_id, sent_id, sentence)
    rows via posexplode; downstream per-sentence operators stay relational.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

RE_PUNCT_RUN = re.compile(r"([。！？\!\?])\1+")
RE_ZH_SINGLE = re.compile(r"([。！？\?!])([^”’)\]）】])")
RE_EN_ELLIPSIS = re.compile(r"(\.{3,})([^”’)\]）】….])")
RE_ZH_ELLIPSIS = re.compile(r"(\…+)([^”’)\]）】….])")
RE_CLOSE_QUOTE = re.compile(r"([。！？\?!]|\.{3,}|\…+)([”’)\]）】])([^，。！？\?….])")


# boundary = terminator (optionally followed by ONE closing quote/bracket,
# which stays with the left sentence, as nltk's punkt does for
# ``He said "Stop." Then ...`` / ``(... began.) The ...``) + whitespace +
# capital/digit/opening.  Two fixed-width lookbehinds because Python re
# has no variable-length lookbehind.
RE_EN_SENT = re.compile(
    r"(?:(?<=[.!?])|(?<=[.!?][\"')\]’”]))\s+(?=[A-Z0-9\"'(])"
)

# common abbreviations whose trailing period must NOT split (the slice of
# nltk punkt behavior a rule splitter can honestly cover)
_EN_ABBREV = (
    "Mr", "Mrs", "Ms", "Dr", "Prof", "St", "Jr", "Sr", "vs", "etc",
    "e.g", "i.e", "No", "Inc", "Ltd", "Co", "Corp", "Fig", "Vol",
    "a.m", "p.m", "U.S", "U.K",
)
_EN_ABBREV_RE = re.compile(
    r"\b(" + "|".join(re.escape(a) for a in _EN_ABBREV) + r")\.(\s+)(?=[A-Z0-9\"'(])"
)
_SENTINEL = "\x00"


def _abbrev_shield_re(extra_abbrevs) -> re.Pattern:
    """Shield regex for the hand list plus (optionally) corpus-trained
    punkt abbreviations (operators/punkt.py).  Trained types are
    lowercase; match them case-insensitively like nltk does.  The
    lookahead CAPTURES the following word so the starter override can
    inspect it."""
    extras = sorted({a.rstrip(".") for a in (extra_abbrevs or ())}, key=len, reverse=True)
    hand = "|".join(re.escape(a) for a in _EN_ABBREV)
    if extras:
        hand += "|" + "|".join("(?i:" + re.escape(a) + ")" for a in extras)
    return re.compile(r"\b(" + hand + r")\.(\s+)(?=([A-Z0-9\"'(]\S*))")


def _next_word_type(w: str) -> str:
    return re.sub(r"[.!?,;:]+$", "", re.sub(r"^[\"'(]+", "", w)).lower()


# collocation shield candidates: a period-final single-letter initial or
# number followed by a capitalized/opening word the split would fire on
_COLLOC_CAND_RE = re.compile(
    r"(?<![\w.])((?i:[a-z])|[0-9][0-9.,]*)\.(\s+)(?=([A-Z0-9\"'(]\S*))"
)


def cut_sentences_py(
    para: str,
    drop_empty_line: bool = True,
    strip: bool = True,
    deduplicate: bool = False,
    language: str = "zh",
    extra_abbrevs=None,
    sentence_starters=None,
    collocations=None,
    ortho_starters=None,
) -> list[str]:
    """Rule-based sentence splitter, zh pass order per the reference.
    The reference's en path uses nltk sent_tokenize (a pretrained punkt
    model, absent here): the en path splits on terminator + whitespace +
    capital/opening, shielding abbreviation periods — the hand list plus
    an optional corpus-trained punkt list (operators/punkt.py), the
    from-scratch analog of nltk's trained model.  The token-stage
    evidence (all corpus-trained, operators/punkt.py) mirrors nltk's
    second-pass annotation:
      * ``sentence_starters`` — an abbreviation period followed by a
        trained frequent starter IS a boundary (override the shield);
      * ``ortho_starters`` — likewise when the next word's capitalization
        is not intrinsic (type seen lowercase somewhere, never uppercase
        mid-sentence): the paper's orthographic heuristic;
      * ``collocations`` — a period-final initial/number whose (w1, w2)
        pair trained as a collocation is NOT a boundary ("J. Smith",
        "No. 4"), shielding periods the hand list cannot know."""
    if para is None:
        return []
    if deduplicate:
        para = RE_PUNCT_RUN.sub(r"\1", para)
    if language == "en":
        # collocation shield first: initials/numbers are not in the
        # abbreviation lists but their trained collocates pin the period
        colloc = collocations or ()
        if colloc:
            colloc = {
                (a.lower().rstrip("."), b.lower()) for a, b in colloc
            }

            def _csub(m):
                pair = (m.group(1).lower(), _next_word_type(m.group(3)))
                if pair in colloc:
                    return m.group(1) + _SENTINEL + m.group(2)
                return m.group(0)

            para = _COLLOC_CAND_RE.sub(_csub, para)
        # shield abbreviation periods from the terminator split, then restore
        starters = {s.lower() for s in (sentence_starters or ())}
        orthos = {s.lower() for s in (ortho_starters or ())}
        if extra_abbrevs or starters or orthos:
            shield = _abbrev_shield_re(extra_abbrevs)

            def _sub(m):
                nxt = _next_word_type(m.group(3))
                # boundary evidence wins: keep the split
                if starters and nxt in starters:
                    return m.group(0)
                if orthos and m.group(3)[0].isupper() and nxt in orthos:
                    return m.group(0)
                return m.group(1) + _SENTINEL + m.group(2)

            shielded = shield.sub(_sub, para)
        else:
            shielded = _EN_ABBREV_RE.sub(
                lambda m: m.group(1) + _SENTINEL + m.group(2), para
            )
        sents = [s.replace(_SENTINEL, ".") for s in RE_EN_SENT.split(shielded)]
        if strip:
            sents = [s.strip() for s in sents]
        if drop_empty_line:
            sents = [s for s in sents if s.strip()]
        return sents
    para = RE_ZH_SINGLE.sub(r"\1\n\2", para)
    para = RE_EN_ELLIPSIS.sub(r"\1\n\2", para)
    para = RE_ZH_ELLIPSIS.sub(r"\1\n\2", para)
    para = RE_CLOSE_QUOTE.sub(r"\1\2\n\3", para)
    para = para.rstrip()
    sentences = para.split("\n")
    if strip:
        sentences = [s.strip() for s in sentences]
    if drop_empty_line:
        sentences = [s for s in sentences if len(s.strip()) > 0]
    return sentences


def cut_sentences_udf(
    drop_empty_line=True,
    strip=True,
    deduplicate=False,
    language="zh",
    extra_abbrevs=None,
    sentence_starters=None,
    collocations=None,
    ortho_starters=None,
):
    """Arrow-batched splitter UDF.  ``language="en"`` routes the en path
    with optional corpus-trained punkt evidence (operators/punkt.py
    trained_* helpers) — the lists are closure-captured, so they ship to
    executors once per task like a broadcast of a tiny dimension."""
    abbrevs = tuple(extra_abbrevs or ())
    starters = tuple(sentence_starters or ())
    colloc = tuple(collocations or ())
    orthos = tuple(ortho_starters or ())

    @pandas_udf(ArrayType(StringType()))
    def _cut(s: pd.Series) -> pd.Series:
        return s.map(
            lambda t: cut_sentences_py(
                t,
                drop_empty_line,
                strip,
                deduplicate,
                language=language,
                extra_abbrevs=abbrevs,
                sentence_starters=starters,
                collocations=colloc,
                ortho_starters=orthos,
            ),
            na_action="ignore",
        )

    return _cut


def explode_sentences(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", **cut_kwargs
) -> DataFrame:
    """(id, text) -> (id, sent_id, sentence) — narrow op then generator;
    no shuffle, sentence order is preserved via posexplode index.
    ``cut_kwargs`` pass through to ``cut_sentences_udf`` (language="en",
    trained punkt lists, ...)."""
    cut = cut_sentences_udf(**cut_kwargs)
    return df.select(
        F.col(id_col),
        F.posexplode(cut(F.col(text_col))).alias("sent_id", "sentence"),
    )
