"""Explicit stubs for reference operators whose required runtimes are not
in this image.  Each raises NotImplementedError naming the dependency to
bake into the cluster image and the mapInPandas shape the implementation
takes — the plumbing decision is made, only the model call is absent.

Round-2 status of the surfaces this module once stubbed:
  * named_entity_recognition — IMPLEMENTED as a rule-based recast
    (operators/parsing.py: KB linking + dict-cutter nr/ns/nt/nz tags);
    this stub remains for the pyhanlp model-NER variant.
  * triple_extraction — IMPLEMENTED as shallow verb-centered SVO patterns
    (operators/parsing.py extract_svo); this stub remains for the
    dep-arc-based variant.
  * dependency_parse — still a stub (pyhanlp, parsing.py:13-45): a true
    dependency parser has no honest from-scratch recast.
  * t2s — IMPLEMENTED (functions/t2s.py, committed char map).
  * pinyin tolerance — IMPLEMENTED (functions/pinyin.py + EntityKB).
  * entity_discover NERP — IMPLEMENTED via the rule-based NER
    (operators/parsing.py discover_named_entities).
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


model_named_entity_recognition = _stub(
    "model_named_entity_recognition",
    "pyhanlp (JVM) or an equivalent trained tagger",
    "mapInPandas over sentences with an executor-local tagger singleton, "
    "emitting array<struct<word,type>> (nr->人名, ns->地名, nt->机构名, nz->其他专名); "
    "the rule-based recast lives in operators/parsing.py",
)

# back-compat alias: the dict-cutter recast is the default implementation
named_entity_recognition = model_named_entity_recognition

dependency_parse = _stub(
    "dependency_parse",
    "pyhanlp (JVM)",
    "mapInPandas per sentence -> array<struct<word,pos,head,rel>>",
)

triple_extraction = _stub(
    "triple_extraction",
    "pyhanlp (JVM) dep arcs",
    "dependency_parse stage + SVO relation patterns (主谓/动宾/定中/动补/介宾) "
    "per sentence; the shallow pattern recast lives in operators/parsing.py",
)
