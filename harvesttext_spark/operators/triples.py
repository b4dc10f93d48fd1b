"""Triple store & template queries — the reference's only declarative query
surface (``examples/naiveKGQA.py:38-58``): SPARQL ``SELECT ?x WHERE {s p o}``
templates over SVO triples, mapped onto Spark SQL over a
``(subject, predicate, object)`` DataFrame.

Each template binds any subset of {s, p, o} to constants and projects the
unbound positions — i.e. an equality-filtered scan; Catalyst pushes the
constants into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TRIPLES_SCHEMA = "subject string, predicate string, object string"


def triple_query(
    triples: DataFrame,
    s: str | None = None,
    p: str | None = None,
    o: str | None = None,
    limit: int | None = None,
) -> DataFrame:
    """SPARQL-template equivalent: constants filter, variables project."""
    out = triples
    if s is not None:
        out = out.filter(F.col("subject") == s)
    if p is not None:
        out = out.filter(F.col("predicate") == p)
    if o is not None:
        out = out.filter(F.col("object") == o)
    proj = [c for c, bound in (("subject", s), ("predicate", p), ("object", o)) if bound is None]
    out = out.select(*proj) if proj else out.select("subject", "predicate", "object")
    return out.limit(limit) if limit else out


def answer_question(triples: DataFrame, s=None, p=None, o=None) -> str:
    """naiveKGQA answer formatting: join each result row with '', rows with
    '、'; '你好' when empty (naiveKGQA.py:59-67)."""
    rows = triple_query(triples, s, p, o).collect()
    if not rows:
        return "你好"
    return "、".join("".join(str(v) for v in r) for r in rows)
