"""Rule-based NER and SVO triple extraction — Spark-first recasts of the
reference's pyhanlp-backed parsing features.

The reference (``harvesttext/word_discover.py:132-170``,
``harvesttext/parsing.py:13-121``) delegates NER and dependency parsing to
pyhanlp (a JVM model library absent from this image; the reference's own
CI disables these tests).  True dependency parsing is out of scope for a
from-scratch engine, so:

  * ``named_entity_recognition`` — entity-link first (KB wins), then map
    the dict cutter's ICTCLAS-style tags exactly as the reference maps
    hanlp natures: nr->人名, ns->地名, nt->机构名, nz->其他专名.
    A documented RECAST: recall is bounded by the lexicon (THUOCL
    历史人名/地名 feed nr/ns), not a trained tagger.
  * ``triple_extraction`` — shallow verb-centered SVO patterns over the
    posseg stream (the 主谓+动宾 core of the reference's dep-arc rules,
    without the arc expansion): subject = noun-ish run immediately left
    of a verb (skipping adverbs/aux), object = noun-ish run immediately
    right (skipping aux).  Linked entities are single tokens, so entity
    subjects/objects survive intact.
  * ``dependency_parse`` stays a stub (operators/nlp_stubs.py) — no
    honest from-scratch recast exists.

Spark surface: ``extract_svo_documents`` / ``ner_documents`` run per Arrow
batch with the broadcast KB, zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from harvesttext_spark.operators.linking import EntityKB

NER_TAG_TYPES = {"nr": "人名", "ns": "地名", "nt": "机构名", "nz": "其他专名"}
_NOUNISH = ("n", "nr", "ns", "nt", "nz", "ng", "eng", "vn")
_SKIP_BEFORE_VERB = {"d", "u", "uj", "ul", "ud", "uv", "uz", "ug"}
_SKIP_AFTER_VERB = {"u", "uj", "ul", "ud", "uv", "uz", "ug", "d"}


def _is_nounish(tag: str, kb: EntityKB | None) -> bool:
    if tag in NER_TAG_TYPES or tag.startswith(_NOUNISH):
        return True
    # entity tokens carry their KB type as the tag; type_tags() is
    # generation-cached on the KB (O(1) per token, not O(|KB|))
    return kb is not None and tag in kb.type_tags()


def named_entity_recognition(
    sent: str,
    kb: EntityKB | None = None,
    standard_name: bool = False,
    return_posseg: bool = False,
    cutter: str = "auto",
):
    """{entity: type} over one sentence — reference signature
    (word_discover.py:132-170) with the tag->type mapping it applies to
    hanlp natures.  Linked KB entities are reported under their KB type."""
    from harvesttext_spark.functions.tokenize import seg_py

    pairs = seg_py(sent, kb, standard_name=standard_name, with_pos=True, cutter=cutter)
    kb_types = kb.type_tags() if kb is not None else frozenset()
    out: dict[str, str] = {}
    for word, tag in pairs:
        if tag in kb_types:
            out[word] = tag
        elif tag in NER_TAG_TYPES:
            out[word] = NER_TAG_TYPES[tag]
        elif len(tag) > 1 and tag[:2] in NER_TAG_TYPES:
            out[word] = NER_TAG_TYPES[tag[:2]]
    if return_posseg:
        return out, pairs
    return out


def extract_svo(
    sent: str,
    kb: EntityKB | None = None,
    standard_name: bool = False,
    stopwords=None,
    cutter: str = "auto",
) -> list[list[str]]:
    """[[subject, verb, object], ...] by verb-centered adjacency patterns
    (the 主谓关系+动宾关系 core of parsing.py:92-99, sans dep arcs)."""
    from harvesttext_spark.functions.tokenize import seg_py

    pairs = seg_py(
        sent, kb, standard_name=standard_name, stopwords=stopwords, with_pos=True,
        cutter=cutter,
    )
    svos: list[list[str]] = []
    n = len(pairs)
    # noun-phrase run: noun-ish tokens plus 定中 glue (adjectives, 的,
    # numerals/measures) — the shallow analog of the reference's
    # complete_e 定中关系 prefix expansion; the run must END noun-ish.
    glue = {"a", "b", "m", "q", "uj"}

    def np_right(k: int) -> tuple[list[str], int]:
        toks: list[tuple[str, str]] = []
        while k < n and (_is_nounish(pairs[k][1], kb) or pairs[k][1] in glue):
            toks.append(pairs[k])
            k += 1
        while toks and not _is_nounish(toks[-1][1], kb):
            toks.pop()
        return [w for w, _ in toks], k

    def np_left(j: int) -> list[str]:
        # pronouns are valid subjects (他们/我们...) though never objects here
        if j >= 0 and pairs[j][1] == "r":
            return [pairs[j][0]]
        toks: list[tuple[str, str]] = []
        while j >= 0 and (_is_nounish(pairs[j][1], kb) or pairs[j][1] in glue):
            toks.insert(0, pairs[j])
            j -= 1
        while toks and not _is_nounish(toks[-1][1], kb):
            toks.pop()
        while toks and not _is_nounish(toks[0][1], kb):
            toks.pop(0)
        return [w for w, _ in toks]

    for i, (word, tag) in enumerate(pairs):
        if not tag.startswith("v") or tag == "vn":
            continue
        # subject: nearest NP scanning left, skipping adverbs/aux
        j = i - 1
        while j >= 0 and pairs[j][1] in _SKIP_BEFORE_VERB:
            j -= 1
        subj = np_left(j)
        # object: nearest NP scanning right, skipping aux
        k = i + 1
        while k < n and pairs[k][1] in _SKIP_AFTER_VERB:
            k += 1
        obj, _ = np_right(k)
        if subj and obj:
            svos.append(["".join(subj), word, "".join(obj)])
    return svos


# --- Spark operators --------------------------------------------------------


def ner_documents(
    df: DataFrame,
    kb: EntityKB | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    cutter: str = "auto",
) -> DataFrame:
    """(doc_id, entity, type) rows; KB broadcast, per Arrow batch."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast((kb, cutter))

    def run(batches):
        import pandas as pd

        kb_, cutter_ = bc.value
        for pdf in batches:
            rows = []
            for doc_id, s in zip(pdf[id_col], pdf[text_col]):
                if not isinstance(s, str):
                    continue
                for ent, t in named_entity_recognition(s, kb_, cutter=cutter_).items():
                    rows.append((doc_id, ent, t))
            yield pd.DataFrame(rows, columns=["doc_id", "entity", "type"])

    return df.mapInPandas(run, schema="doc_id long, entity string, type string")


def extract_svo_documents(
    df: DataFrame,
    kb: EntityKB | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    cutter: str = "auto",
) -> DataFrame:
    """(doc_id, subj, verb, obj) rows for KGQA / triples.py ingestion."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast((kb, cutter))

    def run(batches):
        import pandas as pd

        kb_, cutter_ = bc.value
        for pdf in batches:
            rows = []
            for doc_id, s in zip(pdf[id_col], pdf[text_col]):
                if not isinstance(s, str):
                    continue
                for subj, v, obj in extract_svo(s, kb_, cutter=cutter_):
                    rows.append((doc_id, subj, v, obj))
            yield pd.DataFrame(rows, columns=["doc_id", "subj", "verb", "obj"])

    return df.mapInPandas(run, schema="doc_id long, subj string, verb string, obj string")


def discover_named_entities(
    df: DataFrame,
    kb: EntityKB | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
    cutter: str = "auto",
) -> DataFrame:
    """Corpus-scale NERP-style discovery (the reference entity_discover
    NERP mode recast without hanlp): NER every document, count (entity,
    type) over the corpus, threshold.  One mapInPandas + one groupBy."""
    ner = ner_documents(df, kb, text_col, id_col, cutter)
    return (
        ner.groupBy("entity", "type")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= min_count)
    )
