"""Dictionary-backed multi-pattern matching: entity mention linking and
PII / sensitive-term scrubbing.

Reference semantics re-expressed (``harvesttext/harvesttext.py``):
  * char-trie longest match from each cursor position with backtracking to
    the last complete mention seen (:292-307 — the 料酒 case);
  * cursor jumps past each linked span (:458-494);
  * linking strategies (:332-404): "None" → deterministic first candidate
    (we use lexicographic order; the reference's set-iteration order is
    hash-seed dependent — divergence documented, unambiguous mentions are
    identical), "freq" with PRESET priors → exact, including overlapping-
    span resolution (:467-485).  Running-count "freq" and cross-document
    "latest" are sequential semantics; scoped per document here.
  * decoref replaces linked spans with their #type# placeholder (:547-555)
    — reused verbatim as the PII scrub: match spans of a typed sensitive-
    term dictionary, splice the type placeholder in.
  * type names containing punctuation are rejected (:71-78).

Spark design: the KB is a small dimension — compile the trie ONCE on the
driver, ``sc.broadcast`` it, scan each document inside ``mapInPandas``
(Arrow batches; trie automaton state machine is O(len × depth) per doc,
executor-local, zero shuffle).  The relational alternative (broadcast join
on exploded tokens) can't express longest-match-with-overlap, hence the UDF.
"""

from __future__ import annotations

import re
from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TYPE_PUNCT_RE = re.compile(
    r"[、！？｡＂＃＄％＆＇（）＊＋，－／：；＜＝＞＠［＼］＾＿｀｛｜｝～｟｠｢｣､、〃》「」『』"
    r"【】〔〕〖〗〘〙〚〛〜〝〞〟〰〾〿–—‘’‛“”„‟…‧﹏!\"#$%&'()*+,\-./:;<=>?@\[\\\]^_`{|}~]"
)

LINK_SCHEMA = "array<struct<l:int,r:int,entity:string,type:string>>"


class EntityKB:
    """Mention dictionary compiled to a char trie.  Leaf values are sorted
    (entity, #type#) lists — deterministic candidate order."""

    def __init__(self):
        self.root: dict = {}
        self.mention_entities: dict[str, list[tuple[str, str]]] = {}
        self.entity_mentions: dict[str, set[str]] = {}
        # monotonic mutation counter: invalidates the compiled automaton
        # and pinyin index (len() alone misses add-then-remove sequences)
        self._gen = 0

    @staticmethod
    def check_type_name(entity_type: str) -> None:
        m = TYPE_PUNCT_RE.search(entity_type)
        if m:
            raise Exception(
                "Your type input '{}' includes punctuation '{}', "
                "please remove them first".format(entity_type, m.group())
            )

    def add(self, mention: str, entity: str, entity_type: str) -> None:
        self.check_type_name(entity_type)
        type0 = f"#{entity_type}#"
        pairs = self.mention_entities.setdefault(mention, [])
        # same entity re-registered under a new type: last wins
        pairs[:] = [(e, t) for (e, t) in pairs if e != entity]
        pairs.append((entity, type0))
        pairs.sort()
        self._gen += 1
        self.entity_mentions.setdefault(entity, set()).add(mention)
        node = self.root
        for ch in mention:
            node = node.setdefault(ch, {})
        node["leaf"] = mention

    def add_new_words(self, words: Iterable[str], type0: str = "新词") -> None:
        """Register plain words (their own entity/mention; default type
        新词 — harvesttext.py:211-221)."""
        for w in words:
            self.add(w, w, type0)

    def add_new_entity(
        self, entity: str, mention0: str | None = None, type0: str = "添加词"
    ) -> None:
        """harvesttext.py:231-244: entity with an initial mention."""
        self.add(mention0 or entity, entity, type0)
        if mention0 and mention0 != entity:
            self.add(entity, entity, type0)

    def clear(self) -> None:
        """Reset the KB (harvesttext.py clear()).  CLEAN semantics: unlike
        the reference, no segmentation state leaks (the reference's golden
        shows jieba's global add_word registrations surviving clear() —
        a process-global side effect a distributable KB must not have)."""
        self.root = {}
        self.mention_entities = {}
        self.entity_mentions = {}
        self._gen += 1

    def type_tags(self) -> frozenset[str]:
        """All entity types registered in the KB, as bare names (no ``#``).
        Generation-cached like the compiled automaton: rebuilding this set
        per call was O(|KB|) Python work inside the NER/SVO per-token hot
        path (mapInPandas) — a scale-killer with THUOCL-sized KBs."""
        gen = self._gen
        cached = getattr(self, "_types_cache", None)
        if cached is not None and cached[0] == gen:
            return cached[1]
        tags = frozenset(
            t[1:-1] for pairs in self.mention_entities.values() for _, t in pairs
        )
        self._types_cache = (gen, tags)
        return tags

    def add_typed_words(self, typed_words: dict[str, Iterable[str]]) -> None:
        """{type: words} -> each word registered as its own entity of that
        type (harvesttext.py add_typed_words semantics; what
        add_entities(type_entity_mention_dict) reduces to for plain
        typed-word dictionaries like THUOCL)."""
        for type0, words in typed_words.items():
            for w in words:
                self.add(w, w, type0)

    def add_new_mentions(self, entity: str, mentions: Iterable[str]) -> None:
        """Attach extra surfaces to an existing entity, keeping its type."""
        pairs = [
            (e, t)
            for m in self.entity_mentions.get(entity, ())
            for (e, t) in self.mention_entities.get(m, ())
            if e == entity
        ]
        type0 = pairs[0][1][1:-1] if pairs else "添加词"
        for m in mentions:
            self.add(m, entity, type0)

    @classmethod
    def from_triples(cls, triples: Iterable[tuple[str, str, str]]) -> "EntityKB":
        kb = cls()
        for mention, entity, entity_type in triples:
            kb.add(mention, entity, entity_type)
        return kb

    @classmethod
    def from_dataframe(cls, mentions_df: DataFrame) -> "EntityKB":
        rows = mentions_df.select("mention", "entity", "type").collect()
        return cls.from_triples((r[0], r[1], r[2]) for r in rows)

    # --- matching ---------------------------------------------------------

    def _automaton(self):
        """Compiled Aho-Corasick automaton (goto/fail/leaf-length lists),
        rebuilt only when the mention set changes (generation check).
        SURVEY §4 prescribed this: the per-char dict-trie rescan is
        O(len × depth) per document and was the 100 TB linker bottleneck;
        AC scans each document once, O(len + matches)."""
        gen = self._gen
        cached = getattr(self, "_ac_cache", None)
        if cached is not None and cached[0] == gen:
            return cached[1]
        goto: list[dict[str, int]] = [{}]
        leaf_len: list[int] = [0]  # mention length ending exactly here
        for m in self.mention_entities:
            node = 0
            for ch in m:
                nxt = goto[node].get(ch)
                if nxt is None:
                    goto.append({})
                    leaf_len.append(0)
                    nxt = len(goto) - 1
                    goto[node][ch] = nxt
                node = nxt
            leaf_len[node] = len(m)
        # BFS fail links + dictionary suffix links (nearest fail-chain
        # ancestor that is itself a mention end) so the scan emits EVERY
        # match in O(n + matches) — shorter suffix mentions have LATER
        # starts, and the freq-strategy overlap resolution needs those.
        fail = [0] * len(goto)
        dict_fail = [0] * len(goto)
        from collections import deque

        q = deque(goto[0].values())
        while q:
            u = q.popleft()
            for ch, v in goto[u].items():
                q.append(v)
                f = fail[u]
                while f and ch not in goto[f]:
                    f = fail[f]
                nxt = goto[f].get(ch, 0)
                fail[v] = nxt if nxt != v else 0
                dict_fail[v] = (
                    fail[v] if leaf_len[fail[v]] else dict_fail[fail[v]]
                )
        auto = (goto, fail, dict_fail, leaf_len)
        self._ac_cache = (gen, auto)
        return auto

    def scan_matches(self, sent: str) -> dict[int, int]:
        """ONE automaton pass -> {start: end} of the LONGEST mention
        starting at each position (identical to longest_match at every l,
        computed once instead of per-cursor rescans — this is also the
        memo the freq-strategy overlap resolution reads)."""
        goto, fail, dict_fail, leaf_len = self._automaton()
        best: dict[int, int] = {}
        st = 0
        for i, ch in enumerate(sent):
            while st and ch not in goto[st]:
                st = fail[st]
            st = goto[st].get(ch, 0)
            f = st if leaf_len[st] else dict_fail[st]
            while f:
                s = i + 1 - leaf_len[f]
                if best.get(s, 0) < i + 1:
                    best[s] = i + 1
                f = dict_fail[f]
        return best

    def longest_match(self, sent: str, l: int) -> tuple[int, str | None]:
        """Longest mention starting at l, remembering the last complete
        mention passed (backtracking record).  Retained as the simple
        trie reference semantics (property-tested equal to scan_matches)
        and for single-word probes; the hot path uses the automaton."""
        node = self.root
        best_r, best_mention = -1, None
        for i in range(l, len(sent)):
            node = node.get(sent[i])
            if node is None:
                break
            leaf = node.get("leaf")
            if leaf is not None:
                best_r, best_mention = i + 1, leaf
        return best_r, best_mention

    def remove_mention(self, mention: str) -> None:
        """Delete one surface form (harvesttext.py:98-108)."""
        node = self.root
        for ch in mention:
            node = node.get(ch)
            if node is None:
                return
        node.pop("leaf", None)
        self._gen += 1
        self.mention_entities.pop(mention, None)
        for ms in self.entity_mentions.values():
            ms.discard(mention)

    def remove_entity(self, entity: str) -> None:
        """Delete an entity from every mention's candidate list; mentions
        left with no candidates are removed (harvesttext.py:110-125)."""
        for mention in list(self.entity_mentions.get(entity, ())):
            pairs = self.mention_entities.get(mention, [])
            pairs[:] = [(e, t) for (e, t) in pairs if e != entity]
            if not pairs:
                self.remove_mention(mention)
        self.entity_mentions.pop(entity, None)

    def mention2entity(self, mention: str) -> tuple[str, str] | tuple[None, None]:
        """(entity, type) for a single surface, or (None, None)
        (harvesttext.py:406-418)."""
        cands = self.mention_entities.get(mention)
        if not cands:
            return None, None
        e, t = cands[0]
        return e, t[1:-1]

    # --- pinyin fuzzy matching ---------------------------------------------

    def pinyin_mention_dict(self) -> dict[tuple[str, ...], set[str]]:
        """pinyin-sequence -> mentions (harvesttext.py:41,83), rebuilt when
        the mention set changes (the reference maintains it incrementally;
        a generation-checked rebuild is equivalent and keeps add() lean)."""
        from harvesttext_spark.functions.pinyin import lazy_pinyin

        gen = self._gen
        cached = getattr(self, "_pinyin_cache", None)
        if cached is not None and cached[0] == gen:
            return cached[1]
        d: dict[tuple[str, ...], set[str]] = {}
        for m in self.mention_entities:
            d.setdefault(tuple(lazy_pinyin(m)), set()).add(m)
        self._pinyin_cache = (gen, d)
        return d

    def get_pinyin_correct_candidates(
        self, word: str, tolerance: int = 1
    ) -> list[str]:
        """Mentions whose pinyin equals ``word``'s with at most ``tolerance``
        similar-pinyin substitutions (adjacency list data)
        — harvesttext.py:420-433 semantics."""
        assert tolerance in (0, 1)
        from harvesttext_spark.functions.pinyin import lazy_pinyin
        from harvesttext_spark.functions.resources import get_pinyin_adjlist

        adj = get_pinyin_adjlist()
        pinyins = lazy_pinyin(word)
        cands = {tuple(pinyins)}
        if tolerance == 1:
            for i, py in enumerate(pinyins):
                if py in adj:
                    cands |= {
                        tuple(pinyins[:i] + [nb] + pinyins[i + 1 :])
                        for nb in adj[py]
                    }
        pmd = self.pinyin_mention_dict()
        mentions: set[str] = set()
        for key in cands & set(pmd):
            mentions |= pmd[key]
        return sorted(mentions)

    def search_word_trie(self, word: str, tolerance: int = 1) -> list[str]:
        """All registered mentions within ``tolerance`` single-char
        substitutions of ``word`` (same length) — DFS over the trie
        (harvesttext.py:309-330 semantics), used by the fuzzy recheck."""
        results: set[str] = set()

        def visit(node: dict, rest: str, tol: int) -> None:
            if not rest:
                if "leaf" in node:
                    results.add(node["leaf"])
                return
            ch = rest[0]
            child = node.get(ch)
            if child is not None:
                visit(child, rest[1:], tol)
            if tol:
                for other, child2 in node.items():
                    if other not in (ch, "leaf"):
                        visit(child2, rest[1:], tol - 1)

        visit(self.root, word, tolerance)
        return sorted(results)

    def link_all_candidates(self, sent: str) -> list[tuple[int, int, list]]:
        """keep_all=True semantics (harvesttext.py:489-491): every span with
        its full candidate set, no disambiguation."""
        out = []
        matches = self.scan_matches(sent)
        l, n = 0, len(sent)
        while l < n:
            r = matches.get(l, -1)
            if r == -1:
                l += 1
                continue
            out.append((l, r, list(self.mention_entities[sent[l:r]])))
            l = r
        return out

    def entity_type(self, entity: str) -> str | None:
        for m in self.entity_mentions.get(entity, ()):
            for e, t in self.mention_entities.get(m, ()):
                if e == entity:
                    return t[1:-1]
        return None

    def link(
        self,
        sent: str,
        strategy: str = "None",
        entity_freq: dict[str, int] | None = None,
        latest_mention: dict[str, str] | None = None,
        type_freq: dict[str, int] | None = None,
    ) -> list[tuple[int, int, str, str]]:
        """Leftmost-longest scan with cursor jump; returns
        [(l, r, entity, type)].

        Strategies (harvesttext.py:332-404, scoped per document — the
        reference's cross-call mutable state is not distributable):
          'None'   deterministic first candidate (lexicographic)
          'freq'   preset priors (entity_freq and/or type_freq, which adds
                   its value to every entity of the type) + overlapping-
                   span resolution
          'latest' remember the mention->entity choice made earlier IN THIS
                   DOCUMENT (seedable via latest_mention presets) and reuse
                   it for ambiguous later mentions
        """
        freq = dict(entity_freq or {})
        if type_freq:
            for entity in self.entity_mentions:
                t = self.entity_type(entity)
                if t in type_freq:
                    freq[entity] = freq.get(entity, 0) + type_freq[t]
        latest: dict[str, tuple[str, str]] = {}
        for surface, entity in (latest_mention or {}).items():
            for e, t in self.mention_entities.get(surface, ()):
                if e == entity:
                    latest[surface] = (e, t)
                    break

        def choose(mention: str) -> tuple[str, str]:
            cands = self.mention_entities[mention]
            if len(cands) > 1:
                if "latest" in strategy and mention in latest:
                    return latest[mention]
                if "freq" in strategy:
                    return max(cands, key=lambda et: (freq.get(et[0], 0),))
            chosen = cands[0]
            return chosen

        def record(et: tuple[str, str]) -> None:
            # reference _link_record: remember the choice for EVERY mention
            # of the linked entity (within this document)
            if "latest" in strategy:
                for m in self.entity_mentions.get(et[0], ()):
                    latest[m] = et

        out = []
        # ONE Aho-Corasick pass memoizes the longest match at every start;
        # the cursor walk and the freq-overlap rescan are dict lookups.
        matches = self.scan_matches(sent)
        l, n = 0, len(sent)
        while l < n:
            r = matches.get(l, -1)
            if r == -1:
                l += 1
                continue
            mention = sent[l:r]
            if strategy == "freq":
                # consider matches starting inside [l+1, r) and keep the one
                # whose chosen entity has the highest prior (first wins ties)
                best = (l, r, *choose(mention))
                best_cnt = freq.get(best[2], 0)
                for ll in range(l + 1, r):
                    rr = matches.get(ll, -1)
                    if rr == -1:
                        continue
                    e2, t2 = choose(sent[ll:rr])
                    c2 = freq.get(e2, 0)
                    if c2 > best_cnt:
                        best, best_cnt = (ll, rr, e2, t2), c2
                out.append(best)
                record((best[2], best[3]))
                l = best[1]
            else:
                e, t = choose(mention)
                out.append((l, r, e, t))
                record((e, t))
                l = r
        return out


    @staticmethod
    def _placeholder_tag(type0: str) -> str:
        """POS tag the reference registers for a #type# placeholder
        (harvesttext.py:246-258)."""
        if "人名" in type0:
            return "nr"
        if "地名" in type0:
            return "ns"
        if "机构" in type0:
            return "nt"
        if "其他专名" in type0:
            return "nz"
        return "n"

    def _posseg_decoref(self, sent2: str, cutter: str = "auto"):
        """posseg over a decoref'd sentence: each #type# placeholder is one
        token with its registered tag (the reference adds placeholders to
        jieba's dictionary; we split them out before cutting)."""
        from harvesttext_spark.functions.tokenize import base_posseg

        out: list[tuple[str, str]] = []
        for piece in re.split(r"(#[^#\s]+#)", sent2):
            if not piece:
                continue
            if piece.startswith("#") and piece.endswith("#") and len(piece) > 2:
                out.append((piece, self._placeholder_tag(piece[1:-1])))
            else:
                out.extend(base_posseg(piece, cutter))
        return out

    def _fuzzy_candidates(
        self,
        word: str,
        pinyin_tolerance: int | None,
        char_tolerance: int | None,
    ) -> list[str]:
        cands: list[str] = []
        if pinyin_tolerance is not None:
            cands += self.get_pinyin_correct_candidates(word, pinyin_tolerance)
        if char_tolerance is not None:
            cands += self.search_word_trie(word, char_tolerance)
        return cands

    def link_with_recheck(
        self,
        sent: str,
        strategy: str = "None",
        entity_freq: dict[str, int] | None = None,
        char_tolerance: int | None = 1,
        pinyin_tolerance: int | None = None,
        cutter: str = "auto",
    ) -> list[tuple[int, int, str, str]]:
        """Exact scan + fuzzy recheck — the reference ``_entity_recheck``
        (harvesttext.py:441-456): decoref the linked sentence, posseg it
        (placeholders are single tokens), and for every NOUN-tagged token
        look up mentions within ``char_tolerance`` substitutions and/or
        ``pinyin_tolerance`` similar-pinyin edits; matches are linked at
        ``sent.find(word)`` (the reference's own position rule, quirks
        included)."""
        spans = self.link(sent, strategy, entity_freq)
        sent2 = decoref(sent, spans)
        extra = []
        for word, flag in self._posseg_decoref(sent2, cutter):
            if not flag.startswith("n"):
                continue
            cands = self._fuzzy_candidates(word, pinyin_tolerance, char_tolerance)
            if not cands:
                continue
            e, t = self.mention_entities[cands[0]][0]
            l = sent.find(word)
            if l >= 0:
                extra.append((l, l + len(word), e, t))
        return sorted(spans + extra)

    def get_linking_mention_candidates(
        self,
        sent: str,
        pinyin_tolerance: int | None = None,
        char_tolerance: int | None = None,
        strategy: str = "None",
        cutter: str = "auto",
    ) -> tuple[str, dict[tuple[int, int], set[str]]]:
        """The reference ``get_linking_mention_candidates``
        (harvesttext.py:522-546): link, decoref, posseg; linked placeholders
        are replaced by their entity names; every noun token's fuzzy mention
        candidates are returned keyed by its (l, r) span in the
        RECONSTRUCTED sentence."""
        spans = self.link(sent, strategy)
        sent2 = decoref(sent, spans)
        mention_cands: dict[tuple[int, int], set[str]] = {}
        cut_result: list[str] = []
        l = 0
        i = 0
        for word, flag in self._posseg_decoref(sent2, cutter):
            if word.startswith("#") and word.endswith("#") and len(word) > 2:
                if i < len(spans):
                    word = spans[i][2]  # linked entity name
                    i += 1
            cut_result.append(word)
            if flag.startswith("n"):
                cands = self._fuzzy_candidates(word, pinyin_tolerance, char_tolerance)
                if cands:
                    mention_cands[(l, l + len(word))] = set(cands)
            l += len(word)
        return "".join(cut_result), mention_cands


def decoref(sent: str, spans: list[tuple[int, int, str, str]]) -> str:
    """Replace each linked span with its #type# placeholder (scrub)."""
    parts, left = [], 0
    for l, r, _entity, type0 in spans:
        parts.append(sent[left:l])
        parts.append(type0)
        left = r
    parts.append(sent[left:])
    return "".join(parts)


# --- Spark operators ------------------------------------------------------


def link_entities(
    df: DataFrame,
    kb: EntityKB,
    text_col: str = "text",
    strategy: str = "None",
    entity_freq: dict[str, int] | None = None,
    out_col: str = "entities",
) -> DataFrame:
    """Adds an array<struct<l,r,entity,type>> column of linked spans.
    The KB is broadcast once; scanning is per Arrow batch."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast((kb, strategy, entity_freq))

    def scan(batches):
        kb_, strat, freq = bc.value
        for pdf in batches:
            pdf[out_col] = [
                [
                    {"l": l, "r": r, "entity": e, "type": t}
                    for (l, r, e, t) in kb_.link(s, strat, freq)
                ]
                if isinstance(s, str)
                else []
                for s in pdf[text_col]
            ]
            yield pdf

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", {out_col} {LINK_SCHEMA}"
    return df.mapInPandas(scan, schema=out_schema)


def scrub_text(
    df: DataFrame,
    kb: EntityKB,
    text_col: str = "text",
    out_col: str = "text_scrubbed",
) -> DataFrame:
    """PII / sensitive-term scrub: replace every dictionary match with its
    #type# placeholder (decoref semantics), single map-side pass."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(kb)

    def scan(batches):
        kb_ = bc.value
        for pdf in batches:
            pdf[out_col] = [
                decoref(s, kb_.link(s)) if isinstance(s, str) else s
                for s in pdf[text_col]
            ]
            yield pdf

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", {out_col} string"
    return df.mapInPandas(scan, schema=out_schema)


# regex PII battery (engine addition per north rule): phones, id-like runs
PII_REGEXES = {
    "phone": r"(?<![0-9])1[3-9][0-9]{9}(?![0-9])",  # zh mobile
    "idnum": r"(?<![0-9Xx])[0-9]{17}[0-9Xx](?![0-9Xx])",  # zh national id
    "email": r"(?i)[-a-z0-9_.]+@(?:[-a-z0-9]+\.)+[a-z]{2,6}",
}


def scrub_pii_regex(col, categories: Iterable[str] = ("phone", "idnum", "email")):
    """Catalyst-native regex PII pass — replaces with <CAT> placeholders."""
    c = col
    for cat in categories:
        c = F.regexp_replace(c, PII_REGEXES[cat], f"<{cat.upper()}>")
    return c
