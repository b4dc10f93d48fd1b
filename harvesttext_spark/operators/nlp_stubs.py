"""Explicit stubs for reference operators whose required runtimes are not
in this image.  Each raises NotImplementedError naming the dependency to
bake into the cluster image and the mapInPandas shape the implementation
takes — the plumbing decision is made, only the model call is absent.

Reference surfaces covered:
  * named_entity_recognition  (pyhanlp JVM NER, word_discover.py:132-170)
  * dependency_parse          (pyhanlp, parsing.py:13-45)
  * triple_extraction         (SVO patterns over dep parse, parsing.py:47-121)
  * t2s conversion            (OpenCC — also gated in functions/cleaning.py)
  * pinyin tolerance          (pypinyin lazy_pinyin + pinyin_adjlist,
                               harvesttext.py:420-433)
  * entity_discover NERP mode (NER-dependent; the NFL statistical mode is
                               implemented in operators/alias_discovery.py)
"""

from __future__ import annotations


def _stub(name: str, dep: str, shape: str):
    def fn(*_args, **_kwargs):
        raise NotImplementedError(
            f"{name} requires {dep}, which is not in this container image. "
            f"Implementation shape when available: {shape}"
        )

    fn.__name__ = name
    return fn


named_entity_recognition = _stub(
    "named_entity_recognition",
    "pyhanlp (JVM) or an equivalent tagger",
    "mapInPandas over sentences with an executor-local tagger singleton, "
    "emitting array<struct<word,type>> (nr->人名, ns->地名, nt->机构名, nz->其他专名)",
)

dependency_parse = _stub(
    "dependency_parse",
    "pyhanlp (JVM)",
    "mapInPandas per sentence -> array<struct<word,pos,head,rel>>",
)

triple_extraction = _stub(
    "triple_extraction",
    "pyhanlp (JVM)",
    "dependency_parse stage + SVO relation patterns (主谓/动宾/定中/动补/介宾) "
    "per sentence; output feeds operators/triples.py",
)

# get_pinyin_correct_candidates is IMPLEMENTED (no longer a stub):
# EntityKB.get_pinyin_correct_candidates over the committed char->pinyin
# table (functions/pinyin.py) + the bundled pinyin_adjlist resource.
