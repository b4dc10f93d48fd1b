"""Inverted index / entity counts / conjunctive entity search —
``harvesttext/ent_retrieve.py:9-43`` re-expressed as posting-list semi-joins.

Instead of a driver-side ``defaultdict(set)``, the index IS a normalized
posting DataFrame ``(key, doc_id)``; conjunctive search is a chain of
broadcast SEMI-joins (each term's posting list is tiny relative to the
corpus), so the query never materializes intersections driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_posting(
    linked: DataFrame,
    id_col: str = "doc_id",
    entities_col: str = "entities",
    with_entity: bool = True,
    with_type: bool = True,
) -> DataFrame:
    """(doc_id, key) distinct posting list from linked-entity spans; keys are
    entity names and/or #type# placeholders."""
    e = linked.select(
        F.col(id_col).alias("doc_id"), F.explode(entities_col).alias("ent")
    )
    parts = []
    if with_entity:
        parts.append(e.select("doc_id", F.col("ent.entity").alias("key")))
    if with_type:
        parts.append(e.select("doc_id", F.col("ent.type").alias("key")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.distinct()


def entity_counts(
    posting: DataFrame,
    entity_types: DataFrame | None = None,
    used_types: list[str] | None = None,
) -> DataFrame:
    """Doc-frequency per entity key -> (entity, n_docs); optional filter by
    type via the (entity, type) dimension (broadcast join)."""
    ents = posting.filter(~F.col("key").rlike("^#.*#$"))
    cnt = ents.groupBy(F.col("key").alias("entity")).agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    if used_types:
        assert entity_types is not None
        dim = entity_types.filter(F.col("type").isin(used_types))
        cnt = cnt.join(F.broadcast(dim.select("entity")), "entity")
    return cnt


def search_entity(
    docs: DataFrame, posting: DataFrame, query: str, id_col: str = "doc_id"
) -> DataFrame:
    """Conjunctive search: docs containing ALL space-separated terms
    (entities or #type#s) — chained semi-joins on the posting table."""
    terms = query.split()
    out = docs
    for t in terms:
        ids = posting.filter(F.col("key") == t).select(
            F.col("doc_id").alias(id_col)
        )
        out = out.join(ids, id_col, "semi")
    return out if terms else docs.limit(0)
