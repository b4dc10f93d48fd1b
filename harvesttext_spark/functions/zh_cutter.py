"""Dictionary-driven Chinese word segmentation, written from scratch.

The reference tokenizes with jieba (``harvesttext/harvesttext.py:583-610``),
which is absent from this image and whose frequency dictionary is not
available offline.  This module re-implements the publicly documented
max-probability segmentation approach from first principles:

  1. a prefix dictionary over a committed lexicon
     (``resources/zh_common_words.tsv`` — hand-curated common words with
     coarse frequency tiers and ICTCLAS-style POS tags — merged with the
     THUOCL open lexicon's typed noun vocabulary),
  2. for each han run, a DAG of every dictionary word starting at each
     position,
  3. dynamic programming right-to-left for the max-log-prob route
     (unknown single chars get frequency 1),
  4. consecutive out-of-vocabulary single chars are buffered and merged
     into word-shaped chunks (whole run when <=3 chars, else 2-char chunks
     with a trailing 3-chunk) — a deterministic stand-in for jieba's
     trained BMES HMM, which cannot be reproduced without its parameter
     tables (documented divergence).

Non-han stretches use the same latin/digit/punct rules as the portable
regex cutter so both cutters agree outside CJK text.

This is NOT a port of jieba's code; it is the textbook unigram
max-prob segmenter over our own lexicon.  Where the committed lexicon's
POS tags matter for reference-golden parity (e.g. 进步→d), the tag cites
the reference test golden as the observable spec.
"""

from __future__ import annotations

import math
import os
import re
from functools import lru_cache

_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "resources")

RE_HAN = re.compile(r"([一-鿿]+)")
RE_NONHAN_TOKEN = re.compile(r"[A-Za-z]+(?:'[A-Za-z]+)?|[0-9]+(?:\.[0-9]+)?|\s+|.")

# THUOCL type -> ICTCLAS-ish tag for its words
_THUOCL_POS = {
    "IT": "n",
    "动物": "n",
    "医药": "n",
    "历史人名": "nr",
    "地名": "ns",
    "成语": "i",
    "法律": "n",
    "财经": "n",
    "食物": "n",
}
_THUOCL_FREQ = 200  # below every curated tier: curated words win ties


class ZhDict:
    """Prefix dictionary + unigram frequencies + POS tags."""

    def __init__(self, entries):
        self.freq: dict[str, int] = {}
        self.pos: dict[str, str] = {}
        total = 0
        for word, f, p in entries:
            f = max(int(f), 1)
            self.freq[word] = f
            self.pos[word] = p
            total += f
            # prefix-dict trick: register proper prefixes at freq 0 so the
            # DAG walk can stop as soon as no dictionary word continues
            for i in range(1, len(word)):
                self.freq.setdefault(word[:i], 0)
        self.total = max(total, 1)
        self.logtotal = math.log(self.total)

    def word_freq(self, w: str) -> int:
        return self.freq.get(w, 0)


def _iter_curated():
    path = os.path.join(_DIR, "zh_common_words.tsv")
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            w, freq, pos = line.split("\t")
            yield w, int(freq), pos


def _iter_thuocl(skip: set[str]):
    import json

    with open(os.path.join(_DIR, "THUOCL.json"), encoding="utf-8") as f:
        raw = json.load(f)
    for type0, words in raw.items():
        tag = _THUOCL_POS.get(type0, "n")
        for w in words:
            if w not in skip:
                yield w, _THUOCL_FREQ, tag


@lru_cache(maxsize=1)
def default_dict() -> ZhDict:
    curated = list(_iter_curated())
    have = {w for w, _, _ in curated}
    return ZhDict(curated + list(_iter_thuocl(have)))


class ZhCutter:
    def __init__(self, zdict: ZhDict | None = None):
        self.d = zdict or default_dict()

    # --- DAG + route -------------------------------------------------------

    def _dag(self, seg: str) -> dict[int, list[int]]:
        d, n = self.d, len(seg)
        dag: dict[int, list[int]] = {}
        for i in range(n):
            ends = [i]
            j = i + 1
            frag = seg[i:j]
            while j <= n and frag in d.freq:
                if d.freq[frag] > 0 and j > i + 1:
                    ends.append(j - 1)
                j += 1
                frag = seg[i:j]
            dag[i] = ends
        return dag

    def _route(self, seg: str, dag: dict[int, list[int]]) -> dict[int, tuple[float, int]]:
        d, n = self.d, len(seg)
        route: dict[int, tuple[float, int]] = {n: (0.0, 0)}
        for i in range(n - 1, -1, -1):
            route[i] = max(
                (
                    math.log(d.word_freq(seg[i : j + 1]) or 1)
                    - d.logtotal
                    + route[j + 1][0],
                    j,
                )
                for j in dag[i]
            )
        return route

    def _merge_oov(self, buf: str):
        """Word-shape OOV runs: <=3 chars whole, else 2-char chunks with a
        trailing 3-chunk for odd lengths (HMM stand-in, deterministic)."""
        if len(buf) <= 3:
            yield buf, self.d.pos.get(buf, "n")
            return
        i = 0
        while len(buf) - i > 3:
            yield buf[i : i + 2], "n"
            i += 2
        yield buf[i:], "n"

    def _cut_han(self, seg: str):
        dag = self._dag(seg)
        route = self._route(seg, dag)
        out = []
        buf = ""
        i, n = 0, len(seg)
        while i < n:
            j = route[i][1] + 1
            piece = seg[i:j]
            if j - i == 1 and self.d.word_freq(piece) == 0:
                buf += piece
            else:
                if buf:
                    out.extend(self._merge_oov(buf))
                    buf = ""
                out.append((piece, self.d.pos.get(piece, "n")))
            i = j
        if buf:
            out.extend(self._merge_oov(buf))
        return out

    @staticmethod
    def _cut_nonhan(seg: str):
        for tok in RE_NONHAN_TOKEN.findall(seg):
            if not tok.strip():
                continue
            if re.fullmatch(r"[A-Za-z]+(?:'[A-Za-z]+)?", tok):
                yield tok, "eng"
            elif re.fullmatch(r"[0-9]+(?:\.[0-9]+)?", tok):
                yield tok, "m"
            else:
                yield tok, "x"

    # --- public API --------------------------------------------------------

    def posseg(self, text: str) -> list[tuple[str, str]]:
        out: list[tuple[str, str]] = []
        for seg in RE_HAN.split(text):
            if not seg:
                continue
            if RE_HAN.fullmatch(seg):
                out.extend(self._cut_han(seg))
            else:
                out.extend(self._cut_nonhan(seg))
        return out

    def cut(self, text: str) -> list[str]:
        return [w for w, _ in self.posseg(text)]


@lru_cache(maxsize=1)
def default_cutter() -> ZhCutter:
    return ZhCutter()
