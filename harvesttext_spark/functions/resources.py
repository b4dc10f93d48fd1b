"""Resource loaders — the engine analog of ``harvesttext/resources.py``.

Ships SUBSETS of the public lexicons the reference bundles (Baidu stopword
list, Tsinghua sentiment lexicon) as package fixtures; production deploys
mount the full lexicons as dimension tables.  API mirrors the reference:
``get_zh_stopwords()`` ~ get_baidu_stopwords (resources.py:33-45),
``get_senti_seeds()`` ~ get_qh_sent_dict (resources.py:15-31).
"""

from __future__ import annotations

import json
import os

_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "resources")


def get_zh_stopwords() -> set[str]:
    with open(os.path.join(_DIR, "zh_stopwords_subset.json"), encoding="utf-8") as f:
        return set(json.load(f))


def get_senti_seeds() -> dict[str, list[str]]:
    """{'pos': [...], 'neg': [...]} seed lexicon for SO-PMI."""
    with open(os.path.join(_DIR, "senti_seeds_subset.json"), encoding="utf-8") as f:
        return json.load(f)
