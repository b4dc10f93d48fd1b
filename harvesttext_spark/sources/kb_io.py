"""Entity-KB persistence.

Two formats:
  * the engine's native form — a (mention, entity, type) parquet DIMENSION
    table (versioned alongside the corpus; broadcast at query time);
  * the reference's line format for interchange / hand editing
    (``harvesttext/harvesttext.py:611-691``):
        entity||type mention||type mention||type
    first name on a line is the entity, the rest are its mentions.
"""

from __future__ import annotations

import os
from collections import defaultdict

from pyspark.sql import DataFrame, SparkSession

from harvesttext_spark.operators.linking import EntityKB

MENTIONS_SCHEMA = "mention string, entity string, type string"


def triples_from_text(path: str) -> list[tuple[str, str, str]]:
    """Parse the reference's line format into (mention, entity, type)
    triples (the entity itself is registered as a mention of itself, as
    ``load_entities`` does)."""
    triples = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            names = line.strip().split()
            if not names:
                continue
            entity, etype = names[0].split("||")
            mentions = {entity} | {x.split("||")[0] for x in names[1:]}
            for m in sorted(mentions):
                triples.append((m, entity, etype))
    return triples


def save_entity_text(triples: list[tuple[str, str, str]], path: str) -> None:
    """Write the reference's line format from (mention, entity, type)."""
    by_entity: dict[tuple[str, str], set] = defaultdict(set)
    for mention, entity, etype in triples:
        by_entity[(entity, etype)].add(mention)
    lines = []
    for (entity, etype), mentions in by_entity.items():
        names = [entity] + sorted(m for m in mentions if m != entity)
        lines.append(" ".join(f"{n}||{etype}" for n in names))
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(lines))


def mentions_df(spark: SparkSession, triples) -> DataFrame:
    return spark.createDataFrame(list(triples), MENTIONS_SCHEMA)


def load_kb(spark: SparkSession, parquet_path: str | None = None, text_path: str | None = None) -> EntityKB:
    """Compile the broadcastable KB from either storage form."""
    if parquet_path:
        df = spark.read.parquet(parquet_path)
        return EntityKB.from_dataframe(df)
    assert text_path
    return EntityKB.from_triples(triples_from_text(text_path))


def save_kb_parquet(df: DataFrame, path: str) -> None:
    df.select("mention", "entity", "type").write.mode("overwrite").parquet(path)
