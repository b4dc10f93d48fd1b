"""Learned embeddings in-engine (Spark ML Word2Vec) — the trained-vector
path for similarity search and embedding-cosine near-dup detection, and the
closest available analog of the reference's gensim-FastText stage
(``harvesttext/algorithms/entity_discoverer.py:138-166``) that actually
distributes.

  * ``train_word2vec``   — skip-gram over token arrays (JVM, distributed)
  * ``embed_documents``  — doc vector = Word2Vec average (model.transform)
  * ``embedding_dup_pairs`` — embedding-cosine near-dup: bucket by
    hyperplane-LSH signs, score candidates, keep cos >= threshold —
    the dense-vector sibling of MinHash/SimHash in operators/dedup.py.

NB: Word2Vec training is seeded but not bit-reproducible across executor
counts (asynchronous updates) — fine for dedup/ANN, excluded from the
DuckDB oracle gate by design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from harvesttext_spark.operators.similarity import cosine, lsh_bucket


def train_word2vec(
    docs: DataFrame,
    words_col: str = "words",
    dim: int = 32,
    min_count: int = 2,
    seed: int = 42,
    max_iter: int = 1,
):
    from pyspark.ml.feature import Word2Vec

    w2v = Word2Vec(
        vectorSize=dim,
        minCount=min_count,
        inputCol=words_col,
        outputCol="_vec",
        seed=seed,
        maxIter=max_iter,
    )
    return w2v.fit(docs)


def embed_documents(
    model, docs: DataFrame, words_col: str = "words", out_col: str = "embedding"
) -> DataFrame:
    """Adds array<double> doc embeddings (Word2Vec token average)."""
    from pyspark.ml.functions import vector_to_array

    out = model.transform(docs.withColumnRenamed(words_col, model.getInputCol()))
    return out.withColumn(out_col, vector_to_array(F.col("_vec"))).drop("_vec")


def embedding_dup_pairs(
    embedded: DataFrame,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    dim: int = 32,
    n_planes: int = 8,
    min_cos: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-dup pairs: candidates share an LSH sign bucket
    (never an O(n²) cross join), then exact cosine filters.
    -> (id_a, id_b, cos_sim)."""
    b = embedded.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        lsh_bucket(F.col(vec_col), dim, n_planes).alias("_bucket"),
    )
    pairs = (
        b.alias("a")
        .join(b.alias("b"), "_bucket")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            cosine(F.col("a.vec"), F.col("b.vec")).alias("cos_sim"),
        )
    )
    return pairs.filter(F.col("cos_sim") >= min_cos)
