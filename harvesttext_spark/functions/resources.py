"""Resource loaders — the engine analog of ``harvesttext/resources.py``.

Ships the FULL public lexicons the reference bundles (see
``harvesttext_spark/resources/README.md`` for provenance) so the
reference-default seed/stopword behavior is reproducible offline.  API
mirrors the reference: ``get_qh_sent_dict`` (resources.py:16-32),
``get_baidu_stopwords`` (:34-46), ``get_qh_typed_words`` (:61-78),
``get_english_senti_lexicon`` (:109-127), plus the pinyin adjacency list
and the 三国 entity KB used by the reference demos/tests.

The legacy ``*_subset`` loaders remain for existing tests.
"""

from __future__ import annotations

import functools
import json
import os

_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "resources")


def _load(name: str):
    with open(os.path.join(_DIR, name), encoding="utf-8") as f:
        return json.load(f)


def get_zh_stopwords() -> set[str]:
    with open(os.path.join(_DIR, "zh_stopwords_subset.json"), encoding="utf-8") as f:
        return set(json.load(f))


def get_senti_seeds() -> dict[str, list[str]]:
    """{'pos': [...], 'neg': [...]} seed lexicon for SO-PMI (small subset)."""
    with open(os.path.join(_DIR, "senti_seeds_subset.json"), encoding="utf-8") as f:
        return json.load(f)


@functools.lru_cache(maxsize=1)
def get_qh_sent_dict() -> dict[str, list[str]]:
    """清华 sentiment lexicon {'pos': [...5567], 'neg': [...4470]} — the
    reference's default SO-PMI seeds (harvesttext.py uses it when no seeds
    are given)."""
    return _load("qh_sent_dict.json")


@functools.lru_cache(maxsize=1)
def get_baidu_stopwords() -> frozenset[str]:
    """The full Baidu stopword list (1412 entries, zh+en+punct)."""
    return frozenset(_load("bd_stopwords.json"))


def get_qh_typed_words(
    used_types: tuple[str, ...] = (
        "IT", "动物", "医药", "历史人名", "地名", "成语", "法律", "财经", "食物",
    ),
) -> dict[str, set[str]]:
    """THUOCL typed lexicon: {type: set(words)} (reference default types)."""
    raw = _load("THUOCL.json")
    return {t: set(ws) for t, ws in raw.items() if t in used_types}


@functools.lru_cache(maxsize=1)
def get_en_stopwords() -> set[str]:
    """English stopwords — the engine analog of the reference's
    ``get_nltk_en_stopwords`` (``/root/reference/harvesttext/
    resources.py:47-56``), which downloads nltk's stopword corpus at
    call time (network + nltk, both absent here).  Ships the same
    public-domain 179-entry english list as a committed resource; same
    shape (set of lowercase strings, contractions split nltk-style:
    "don", "don't", "should've", ...) for the summary/keyword paths."""
    return set(_load("en_stopwords.json"))


@functools.lru_cache(maxsize=1)
def get_english_senti_lexicon() -> dict[str, list[str]]:
    """Hu & Liu English opinion lexicon {'pos': [...], 'neg': [...]}."""
    return _load("LH_senti_lexicon.json")


@functools.lru_cache(maxsize=1)
def get_pinyin_adjlist() -> dict[str, list[str]]:
    """pinyin -> similar-sounding pinyins (1-edit confusions), the data
    behind the reference's pinyin_tolerance linking."""
    return _load("pinyin_adjlist.json")


@functools.lru_cache(maxsize=1)
def get_sanguo_entity_dict() -> tuple[dict, dict]:
    """三国演义 entity KB: (entity_mention_dict, entity_type_dict)."""
    d = _load("sanguo_entity_dict.json")
    return d["mention"], d["type"]


@functools.lru_cache(maxsize=1)
def get_sanguo() -> list[str]:
    """三国演义 chapter texts (reference demo corpus)."""
    return _load("sanguo_docs.json")
