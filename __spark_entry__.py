"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship quality-filter pipeline on sf0.001.
``queries()``   — one entry per implemented operator (SURVEY.md §2 + the
                  engine's web-scale additions), each (spark, sf_dir) -> DF.
``oracle_sql()``— DuckDB-runnable ANSI SQL producing the same columns and
                  values (floats rounded identically on both sides).
Non-SQL-expressible ops (regex battery UDF, per-doc pagerank, MinHash LSH
banding) are present in queries() without an oracle -> rows-only check.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from harvesttext_spark.functions.textstats import (
    LANG_MARKERS,
    STOPWORDS_EN,
    FP_BASE,
    FP_MOD,
    FP_PREFIX,
    bpe_piece_count,
    doc_fingerprint,
    lang_id,
    token_count,
    tokens_col,
)


def _raw_count(spark: SparkSession, sf_dir: str, name: str = "documents") -> int:
    """Unfiltered row count of a driver table straight off the parquet
    footer metadata (Spark's count-star optimization — no data pages are
    read and the read_scaled repartition never runs)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet")).count()


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from harvesttext_spark.session import read_scaled

    # hash-partition on doc_id (not round-robin): skips the
    # sortBeforeRepartition local sort and lets every downstream
    # groupBy/window keyed on doc_id run exchange-free (session.read_scaled)
    return read_scaled(spark, os.path.join(sf_dir, "documents.parquet"), key="doc_id")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    from harvesttext_spark.session import read_scaled

    return read_scaled(spark, os.path.join(sf_dir, "embeddings.parquet"), key="vec_id")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from harvesttext_spark.session import read_scaled

    # user_id: the sessionize/window family partitions by it — the scan
    # exchange doubles as the window exchange
    return read_scaled(spark, os.path.join(sf_dir, "events.parquet"), key="user_id")


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full quality-filter (clean battery + langid + keep/drop)
    over the documents table at sf0.001, per-source keep-rate rollup."""
    from harvesttext_spark.pipeline.quality_filter import label, scrub

    docs = _docs(spark, "/root/testdata/sf0.001").withColumnRenamed("text", "raw")
    out = label(scrub(docs, text_col="raw"))
    return (
        out.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("keep").cast("long")).alias("n_keep"),
            F.round(F.avg(F.length("text_clean")), 2).alias("avg_len"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# queries + oracles
# ---------------------------------------------------------------------------

def q_doc_stats(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        bpe_piece_count(F.col("text")).alias("n_pieces"),
        F.length("text").alias("len_chars"),
        F.size(F.array_distinct(tokens_col(F.col("text")))).alias("n_distinct_tokens"),
    )


SQL_DOC_STATS = """
SELECT doc_id,
       len(list_filter(regexp_split_to_array(text, '\\s+'), t -> t != '')) AS n_tokens,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_pieces,
       length(text) AS len_chars,
       len(list_distinct(list_filter(regexp_split_to_array(text, '\\s+'), t -> t != ''))) AS n_distinct_tokens
FROM documents
"""


def q_lang_id(spark, sf_dir):
    return _docs(spark, sf_dir).select("doc_id", lang_id(F.col("text")).alias("lang_pred"))


def _sql_marker_count(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in LANG_MARKERS[lang])
    return (
        "len(list_distinct(list_intersect("
        "list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t != ''), "
        f"[{words}])))"
    )


SQL_LANG_ID = f"""
WITH c AS (
  SELECT doc_id, text,
         {_sql_marker_count('en')} AS c_en,
         {_sql_marker_count('es')} AS c_es,
         {_sql_marker_count('de')} AS c_de,
         {_sql_marker_count('fr')} AS c_fr
  FROM documents
)
SELECT doc_id,
       CASE
         WHEN regexp_matches(text, '[\\x{{4e00}}-\\x{{9fff}}]') THEN 'zh'
         WHEN greatest(c_en, c_es, c_de, c_fr) = 0 THEN 'und'
         WHEN c_en >= c_es AND c_en >= c_de AND c_en >= c_fr THEN 'en'
         WHEN c_es >= c_de AND c_es >= c_fr THEN 'es'
         WHEN c_de >= c_fr THEN 'de'
         ELSE 'fr'
       END AS lang_pred
FROM c
"""


def q_quality_signals(spark, sf_dir):
    d = _docs(spark, sf_dir)
    toks = tokens_col(F.col("text"))
    n_tok = F.size(toks)
    safe_tok = F.greatest(n_tok, F.lit(1))
    n_chars = F.length("text")
    # positive class + length diff: Java negated unicode classes are ~5x slower
    n_alnum = n_chars - F.length(
        F.regexp_replace("text", "[A-Za-z0-9\\x{4e00}-\\x{9fff}]", "")
    )
    n_stop = F.size(
        F.array_intersect(
            F.transform(toks, lambda t: F.lower(t)),
            F.array(*[F.lit(w) for w in STOPWORDS_EN]),
        )
    )
    return d.select(
        "doc_id",
        F.round(n_alnum / F.greatest(n_chars, F.lit(1)), 6).alias("alnum_ratio"),
        F.round(F.size(F.array_distinct(toks)) / safe_tok, 6).alias("distinct_ratio"),
        F.round(
            F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t)) / safe_tok, 6
        ).alias("mean_token_len"),
        n_stop.alias("stopword_distinct"),
    )


_STOP_LIST = ", ".join(f"'{w}'" for w in STOPWORDS_EN)
SQL_QUALITY_SIGNALS = f"""
WITH t AS (
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS toks
  FROM documents
)
SELECT doc_id,
       round((length(text) - length(regexp_replace(text, '[A-Za-z0-9\\x{{4e00}}-\\x{{9fff}}]', '', 'g')))
             / greatest(length(text), 1), 6) AS alnum_ratio,
       round(len(list_distinct(toks)) * 1.0 / greatest(len(toks), 1), 6) AS distinct_ratio,
       round(list_reduce(list_prepend(0, list_transform(toks, x -> length(x))), (a, b) -> a + b)
             * 1.0 / greatest(len(toks), 1), 6) AS mean_token_len,
       len(list_distinct(list_intersect(list_transform(toks, x -> lower(x)), [{_STOP_LIST}]))) AS stopword_distinct
FROM t
"""


# probes: scripts the synthetic corpus lacks (cyrillic/arabic/fullwidth
# punct), the explicit whitespace class incl. \x0b, and the empty-doc
# 'none' branch — so the oracle exercises every class, not just the
# corpus's latin/han diet
SCRIPT_PROBES = [
    (1000001, "Привет мир это тест кириллицы сегодня"),
    (1000002, "مرحبا بالعالم هذا اختبار عربي"),
    (1000003, "中文字符 mixed with Latin words 123 等等"),
    (1000004, "！？（）、。「」【】：；"),
    (1000005, "tab\tvtab\x0bnewline\nspaces   end"),
    (1000006, "àéîõü Ωμέγα ελληνικά dashes…"),
    (1000007, "12345 67890 !!! ??? ..."),
    (1000008, ""),
]


def q_script_mix(spark, sf_dir):
    """Charset-composition signal (CCNet/RefinedWeb-class): per-script
    char fractions + dominant content script.  Pure codegen on the scan
    (functions/textstats.py script_mix_signals); the oracle interpolates
    the SAME class strings (all BMP ranges, so Java regex and RE2 agree
    char for char)."""
    from harvesttext_spark.functions.textstats import script_mix_signals

    d = _docs(spark, sf_dir).select("doc_id", "text").unionByName(
        _probe_df(spark, SCRIPT_PROBES, col="text")
    )
    sig = script_mix_signals(F.col("text"))
    cols = [F.col("doc_id")]
    for k, v in sig.items():
        cols.append(v.alias(k) if k == "dominant_script" else F.round(v, 6).alias(k))
    return d.select(*cols)


def _sql_script_mix() -> str:
    from harvesttext_spark.functions.textstats import (
        SCRIPT_CLASSES,
        SCRIPT_DOMINANCE_ORDER,
    )

    counts = ",\n         ".join(
        "length(text) - length(regexp_replace(text, '"
        + cls
        + "', '', 'g')) AS c_" + name
        for name, cls in SCRIPT_CLASSES.items()
    )
    all_sum = " + ".join("c_" + n for n in SCRIPT_CLASSES)
    dom_max = "greatest(" + ", ".join("c_" + n for n in SCRIPT_DOMINANCE_ORDER) + ")"
    dom_case = "\n            ".join(
        f"WHEN c_{n} = g THEN '{n}'" for n in SCRIPT_DOMINANCE_ORDER
    )
    fracs = ",\n       ".join(
        f"round(c_{n} * 1.0 / greatest(n, 1), 6) AS {n}_frac" for n in SCRIPT_CLASSES
    )
    probe_rows = ", ".join(
        "({}::BIGINT, '{}')".format(i, t.replace("'", "''"))
        for i, t in SCRIPT_PROBES
    )
    return f"""
WITH base AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT * FROM (VALUES {probe_rows}) v(doc_id, text)
),
c AS (
  SELECT doc_id, length(text) AS n,
         {counts}
  FROM base
),
g AS (SELECT *, {dom_max} AS g FROM c)
SELECT doc_id,
       {fracs},
       round((n - ({all_sum})) * 1.0 / greatest(n, 1), 6) AS other_frac,
       CASE WHEN g = 0 THEN 'none'
            {dom_case}
       END AS dominant_script,
       round(g * 1.0 / greatest(n, 1), 6) AS dominant_frac
FROM g
"""


def q_fingerprint(spark, sf_dir):
    return _docs(spark, sf_dir).select(
        "doc_id", doc_fingerprint(F.col("text")).alias("fp")
    )


SQL_FINGERPRINT = f"""
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(
             list_filter(regexp_split_to_array(substring(text, 1, {FP_PREFIX}), ''), c -> c != ''),
             c -> CAST(ord(c) AS BIGINT))),
         (acc, c) -> (acc * {FP_BASE} + c) % {FP_MOD}) AS fp
FROM documents
"""


def q_exact_dup_groups(spark, sf_dir):
    from harvesttext_spark.operators.dedup import exact_dup_groups

    return exact_dup_groups(_docs(spark, sf_dir))


SQL_EXACT_DUP_GROUPS = """
SELECT md5(text) AS digest, count(*) AS n_dups, min(doc_id) AS keep_id
FROM documents GROUP BY md5(text) HAVING count(*) > 1
"""


def q_minhash_signature(spark, sf_dir):
    """KM-pair MinHash signatures via the hot-path explode + codegen
    min-agg shape (round 4 — value-identical to the lambda fold it
    replaced, 14x faster; the DuckDB mirror is unchanged)."""
    from harvesttext_spark.operators.dedup import minhash_signature_frame

    sig = minhash_signature_frame(_docs(spark, sf_dir), k=8)
    return sig.select(
        F.col("id").alias("doc_id"),
        F.array_join(F.transform("sig", lambda v: v.cast("string")), ",").alias("sig"),
    )


SQL_MINHASH_SIGNATURE = """
WITH sh AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(toks) >= 3
           THEN list_transform(generate_series(1, len(toks) - 2),
                               i -> array_to_string(toks[i:i+2], ' '))
           ELSE [array_to_string(toks, ' ')] END) AS shingles
  FROM (SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), t -> t != '') AS toks
        FROM documents)
),
hp AS (
  SELECT doc_id,
         list_transform(shingles, s -> struct_pack(
           h1 := list_reduce(list_prepend(CAST(0 AS BIGINT),
                   list_transform(string_split(substring(md5(s), 1, 8), ''),
                                  c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))),
                 (a, b) -> a * 16 + b),
           h2 := list_reduce(list_prepend(CAST(0 AS BIGINT),
                   list_transform(string_split(substring(md5(s), 9, 8), ''),
                                  c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))),
                 (a, b) -> a * 16 + b))) AS hs
  FROM sh
)
SELECT doc_id,
       array_to_string(
         list_transform(generate_series(0, 7),
           i -> list_aggregate(list_transform(hs, p -> (p.h1 + i * p.h2) % 4294967296), 'min')),
         ',') AS sig
FROM hp
"""


def q_jaccard_pairs(spark, sf_dir):
    """df-capped exact Jaccard: the cap (50 of 500 docs at driver scale)
    is ACTIVE so the oracle value-verifies the candidate-generation
    mechanism, not just the uncapped self-join."""
    from harvesttext_spark.operators.dedup import jaccard_dup_pairs

    p = jaccard_dup_pairs(_docs(spark, sf_dir), min_jaccard=0.2, max_shingle_df=50)
    return p.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


SQL_JACCARD_PAIRS = """
WITH sh AS (
  SELECT doc_id, unnest(list_distinct(CASE WHEN len(toks) >= 3
           THEN list_transform(generate_series(1, len(toks) - 2),
                               i -> array_to_string(toks[i:i+2], ' '))
           ELSE [array_to_string(toks, ' ')] END)) AS s
  FROM (SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), t -> t != '') AS toks
        FROM documents)
),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
prefix AS (
  SELECT doc_id, s FROM (
    SELECT doc_id, s, df,
           row_number() OVER (PARTITION BY doc_id ORDER BY df, s) AS rn,
           count(*) OVER (PARTITION BY doc_id) AS n
    FROM (SELECT doc_id, s, count(*) OVER (PARTITION BY s) AS df FROM sh)
  ) WHERE rn <= n - ceil(0.2 * n - 0.000000001) + 1 AND df <= 50
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM prefix a JOIN prefix b USING (s) WHERE a.doc_id < b.doc_id
),
inter AS (
  SELECT c.id_a, c.id_b, count(*) AS i
  FROM cand c
  JOIN sh pa ON pa.doc_id = c.id_a
  JOIN sh pb ON pb.doc_id = c.id_b AND pb.s = pa.s
  GROUP BY c.id_a, c.id_b
)
SELECT id_a, id_b,
       round(i * 1.0 / (sa.sz + sb.sz - i), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE i * 1.0 / (sa.sz + sb.sz - i) >= 0.2
"""


def q_simhash(spark, sf_dir):
    """32-bit portable SimHash via the hot-path explode + codegen-agg
    shape (round 4 — value-identical to the lambda fold; oracle
    unchanged)."""
    from harvesttext_spark.operators.dedup import simhash32_frame

    return simhash32_frame(_docs(spark, sf_dir)).select(
        F.col("id").alias("doc_id"), "sh"
    )


SQL_SIMHASH = """
WITH tok AS (
  SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '\\s+'), t -> t != '')) AS t
  FROM documents
),
bits AS (
  SELECT doc_id, g.b,
         CASE WHEN ((strpos('0123456789abcdef', substring(md5(t), (g.b // 4) + 1, 1)) - 1)
                    // CAST(pow(2, 3 - (g.b % 4)) AS INT)) % 2 = 1
              THEN 1 ELSE -1 END AS sgn
  FROM tok, (SELECT unnest(generate_series(0, 31)) AS b) g
),
sums AS (SELECT doc_id, b, sum(sgn) AS s FROM bits GROUP BY doc_id, b)
SELECT doc_id,
       CAST(sum(CASE WHEN s > 0 THEN CAST(pow(2, 31 - b) AS BIGINT) ELSE 0 END) AS BIGINT) AS sh
FROM sums GROUP BY doc_id
"""


def q_token_freq(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return (
        d.select(F.explode(tokens_col(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= 5)
    )


SQL_TOKEN_FREQ = """
SELECT t AS word, count(*) AS cnt
FROM (SELECT unnest(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '')) AS t
      FROM documents)
GROUP BY t HAVING count(*) >= 5
"""


def q_token_docfreq(spark, sf_dir):
    """Doc-frequency posting counts (get_entity_counts analog over the token
    posting table: number of documents containing each token)."""
    d = _docs(spark, sf_dir)
    posting = d.select(
        "doc_id", F.explode(F.array_distinct(tokens_col(F.col("text")))).alias("key")
    )
    return (
        posting.groupBy(F.col("key").alias("word"))
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= 3)
    )


SQL_TOKEN_DOCFREQ = """
SELECT t AS word, count(DISTINCT doc_id) AS n_docs
FROM (SELECT doc_id, unnest(list_distinct(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != ''))) AS t
      FROM documents)
GROUP BY t HAVING count(DISTINCT doc_id) >= 3
"""


def q_bigram_stats(spark, sf_dir):
    from harvesttext_spark.operators.word_discovery import ngram_stats

    stats, _ = ngram_stats(_docs(spark, sf_dir), unit="token", max_word_len=2)
    return stats.filter(F.col("cnt") >= 3).select(
        "word",
        "cnt",
        F.round("freq", 8).alias("freq"),
        F.round("left_ent", 6).alias("left_ent"),
        F.round("right_ent", 6).alias("right_ent"),
        F.round("agg", 6).alias("agg"),
    )


SQL_BIGRAM_STATS = """
WITH base AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), t -> t != '') AS syms
  FROM documents WHERE length(trim(text)) > 0
),
meta AS (
  SELECT sum(len(syms)) + count(*) - 1 AS L,
         min(doc_id) AS first_id, max(doc_id) AS last_id
  FROM base
),
pos AS (
  SELECT doc_id, syms, len(syms) AS n, unnest(generate_series(1, len(syms))) AS i
  FROM base
),
cand AS (
  SELECT doc_id, syms, n, i, g.w AS wlen,
         array_to_string(syms[i:i+g.w-1], ' ') AS word
  FROM pos, (SELECT unnest(generate_series(1, 2)) AS w) g
  WHERE i + g.w - 1 <= n
),
neigh AS (
  SELECT c.word, c.wlen,
         CASE WHEN c.i > 1 THEN c.syms[c.i - 1] ELSE NULL END AS lft,
         CASE WHEN c.i + c.wlen <= c.n THEN c.syms[c.i + c.wlen] ELSE NULL END AS rgt
  FROM cand c
),
counts AS (SELECT word, count(*) AS cnt FROM neigh GROUP BY word),
lent AS (
  SELECT word, ln(sum(c)) - sum(c * ln(c)) / sum(c) AS left_ent
  FROM (SELECT word, lft, count(*) AS c FROM neigh WHERE lft IS NOT NULL GROUP BY word, lft)
  GROUP BY word
),
rent AS (
  SELECT word, ln(sum(c)) - sum(c * ln(c)) / sum(c) AS right_ent
  FROM (SELECT word, rgt, count(*) AS c FROM neigh WHERE rgt IS NOT NULL GROUP BY word, rgt)
  GROUP BY word
),
splits AS (
  SELECT c.word, c.cnt,
         string_split(c.word, ' ')[1] AS p1,
         string_split(c.word, ' ')[2] AS p2
  FROM counts c WHERE len(string_split(c.word, ' ')) = 2
),
aggt AS (
  SELECT s.word, min(s.cnt * (SELECT L FROM meta) * 1.0 / (c1.cnt * c2.cnt)) AS agg
  FROM splits s
  JOIN counts c1 ON c1.word = s.p1
  JOIN counts c2 ON c2.word = s.p2
  GROUP BY s.word
)
SELECT c.word, c.cnt,
       round(c.cnt * 1.0 / (SELECT L FROM meta), 8) AS freq,
       round(coalesce(l.left_ent, 0), 6) AS left_ent,
       round(coalesce(r.right_ent, 0), 6) AS right_ent,
       round(coalesce(a.agg, 0), 6) AS agg
FROM counts c
LEFT JOIN lent l USING (word)
LEFT JOIN rent r USING (word)
LEFT JOIN aggt a USING (word)
WHERE c.cnt >= 3
"""


def q_tfidf_topk(spark, sf_dir):
    from harvesttext_spark.operators.graph import tfidf_keywords

    d = _docs(spark, sf_dir).select(
        "doc_id", tokens_col(F.col("text")).alias("words")
    )
    # n_docs via the raw scan: Spark answers an unfiltered parquet count
    # from footer metadata — no data read, no repartition exchange (the
    # docs.count() default would execute both)
    out = tfidf_keywords(d, top_k=3, n_docs=_raw_count(spark, sf_dir))
    return out.select("doc_id", "word", F.round("tfidf", 6).alias("tfidf"), "rank")


SQL_TFIDF_TOPK = """
WITH tok AS (
  SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '')) AS word
  FROM documents
),
tf AS (SELECT doc_id, word, count(*) AS tf FROM tok GROUP BY doc_id, word),
idf AS (SELECT word, count(*) AS df FROM tf GROUP BY word),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.word, tf.tf * ln((SELECT n_docs FROM n) * 1.0 / idf.df) AS tfidf
  FROM tf JOIN idf USING (word)
),
ranked AS (
  SELECT doc_id, word, tfidf,
         row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, word ASC) AS rank
  FROM scored
)
SELECT doc_id, word, round(tfidf, 6) AS tfidf, rank FROM ranked WHERE rank <= 3
"""


SO_PMI_POS = ["fast", "big"]
SO_PMI_NEG = ["slow", "small"]


def q_so_pmi(spark, sf_dir):
    from harvesttext_spark.operators.sentiment import build_sent_dict

    d = _docs(spark, sf_dir).select(
        "doc_id", tokens_col(F.col("text")).alias("words")
    )
    out = build_sent_dict(d, SO_PMI_POS, SO_PMI_NEG, min_times=5)
    return out.select("word", F.round("senti", 6).alias("senti"))


SQL_SO_PMI = f"""
WITH docs_t AS (
  SELECT doc_id, list_distinct(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '')) AS toks
  FROM documents
  WHERE len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '')) > 0
),
n AS (SELECT count(*) AS n_docs FROM docs_t),
tok AS (SELECT doc_id, unnest(toks) AS word FROM docs_t),
one AS (SELECT word, count(*) AS c FROM tok GROUP BY word),
vocab AS (SELECT word, c FROM one WHERE c >= 5),
seeds AS (
  SELECT s.word, s.sign, v.c AS c_seed
  FROM (SELECT unnest({SO_PMI_POS!r}) AS word, 1 AS sign
        UNION ALL SELECT unnest({SO_PMI_NEG!r}), -1) s
  JOIN vocab v USING (word)
),
co AS (
  SELECT t.word, s.word AS seed, s.sign, s.c_seed, count(*) AS c12
  FROM tok t
  JOIN (SELECT tk.doc_id, sd.word, sd.sign, sd.c_seed
        FROM tok tk JOIN seeds sd ON tk.word = sd.word) s
    ON t.doc_id = s.doc_id
  GROUP BY t.word, s.word, s.sign, s.c_seed
),
contrib AS (
  SELECT co.word,
         co.sign * log2(co.c12 * (SELECT n_docs FROM n) * 1.0 / (one.c * co.c_seed)) AS pmi
  FROM co JOIN one USING (word)
)
SELECT v.word, round(coalesce(s.s, 0), 6) AS senti
FROM vocab v
LEFT JOIN (SELECT word, sum(pmi) AS s FROM contrib GROUP BY word) s USING (word)
"""


def q_search_conjunctive(spark, sf_dir):
    from harvesttext_spark.operators.retrieval import search_entity

    d = _docs(spark, sf_dir)
    posting = d.select(
        "doc_id", F.explode(F.array_distinct(tokens_col(F.col("text")))).alias("key")
    )
    return search_entity(d, posting, "spark window").select("doc_id")


SQL_SEARCH_CONJUNCTIVE = """
WITH tok AS (
  SELECT doc_id, unnest(list_distinct(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != ''))) AS key
  FROM documents
)
SELECT doc_id FROM documents
WHERE doc_id IN (SELECT doc_id FROM tok WHERE key = 'spark')
  AND doc_id IN (SELECT doc_id FROM tok WHERE key = 'window')
"""


def q_cooccur_edges(spark, sf_dir):
    from harvesttext_spark.operators.graph import word_cooccurrence_edges

    d = _docs(spark, sf_dir).select(
        "doc_id", tokens_col(F.col("text")).alias("words")
    )
    return word_cooccurrence_edges(d, center="spark", min_freq=5)


SQL_COOCCUR_EDGES = """
WITH d AS (
  SELECT doc_id, list_distinct(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '')) AS toks
  FROM documents
  WHERE list_contains(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != ''), 'spark')
),
tok AS (SELECT doc_id, unnest(toks) AS key FROM d)
SELECT a.key AS u, b.key AS v, count(DISTINCT a.doc_id) AS weight
FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND a.key < b.key
GROUP BY a.key, b.key
HAVING count(DISTINCT a.doc_id) >= 5
"""


def q_embedding_topk(spark, sf_dir):
    from harvesttext_spark.operators.similarity import brute_force_topk

    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = brute_force_topk(emb, queries, k=5)
    return out.select(
        "query_id", "vec_id", F.round("cos_sim", 4).alias("cos_sim"), "rank"
    )


SQL_EMBEDDING_TOPK = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < 3),
scored AS (
  SELECT q.query_id, e.vec_id,
         list_dot_product(e.embedding, q.qvec)
           / (sqrt(list_dot_product(e.embedding, e.embedding))
              * sqrt(list_dot_product(q.qvec, q.qvec))) AS cos_sim
  FROM embeddings e CROSS JOIN q
),
ranked AS (
  SELECT query_id, vec_id, cos_sim,
         row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, vec_id, round(cos_sim, 4) AS cos_sim, rank FROM ranked WHERE rank <= 5
"""


def q_ann_lsh_topk(spark, sf_dir):
    """Hyperplane-LSH approximate top-k (round 3 value oracle): bucket =
    8 md5-derived hyperplane sign bits, probe = exact bucket + all 1-bit
    flips, cosine re-score inside candidates.  The oracle reproduces the
    SAME buckets bit-exactly — the plane constants are embedded as SQL
    literals and each sign dot product is unrolled left-associatively, so
    float promotion and fold order match Spark's F.aggregate exactly."""
    from harvesttext_spark.operators.similarity import lsh_topk

    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = lsh_topk(emb, queries, dim=64, k=5, n_planes=8)
    return out.select(
        "query_id", "vec_id", F.round("cos_sim", 4).alias("cos_sim"), "rank"
    )


def _sql_ann_lsh(dim: int = 64, n_planes: int = 8, k: int = 5) -> str:
    from harvesttext_spark.operators.similarity import _hyperplane

    def sign_dot(p: int) -> str:
        plane = _hyperplane(dim, p)
        terms = " + ".join(
            f"embedding[{j + 1}]::DOUBLE * ({plane[j]!r})" for j in range(dim)
        )
        return f"CASE WHEN ({terms}) > 0 THEN {2 ** p} ELSE 0 END"

    bucket = " + ".join(sign_dot(p) for p in range(n_planes))
    flips = ", ".join(f"xor(qb, {2 ** p})" for p in range(n_planes))
    return f"""
WITH b AS (
  SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings
),
q AS (SELECT vec_id AS query_id, embedding AS qvec, bucket AS qb FROM b WHERE vec_id < 3),
probes AS (
  SELECT query_id, qvec, unnest([qb, {flips}]) AS bucket FROM q
),
scored AS (
  SELECT p.query_id, b.vec_id,
         list_dot_product(b.embedding, p.qvec)
           / (sqrt(list_dot_product(b.embedding, b.embedding))
              * sqrt(list_dot_product(p.qvec, p.qvec))) AS cos_sim
  FROM b JOIN probes p USING (bucket)
),
ranked AS (
  SELECT query_id, vec_id, cos_sim,
         row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, vec_id, round(cos_sim, 4) AS cos_sim, rank FROM ranked WHERE rank <= {k}
"""


def q_events_window(spark, sf_dir):
    e = _events(spark, sf_dir)
    return (
        e.groupBy(
            F.col("event_type"),
            F.date_trunc("hour", F.col("ts")).alias("hour"),
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
    )


SQL_EVENTS_WINDOW = """
SELECT event_type, date_trunc('hour', ts) AS hour,
       count(*) AS n, round(sum(value), 4) AS sum_value
FROM events GROUP BY event_type, date_trunc('hour', ts)
"""


def q_events_rollup(spark, sf_dir):
    """Hypertable-style multi-granularity rollup: event counts/sums at
    (type, day) and (type) levels in one pass — ROLLUP grouping sets."""
    e = _events(spark, sf_dir)
    day = F.date_trunc("day", F.col("ts")).alias("day")
    return (
        e.rollup(F.col("event_type"), day)
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 4)
            .cast("double")
            .alias("sum_value"),
        )
        .filter(F.col("event_type").isNotNull())  # drop the grand-total row
    )


SQL_EVENTS_ROLLUP = """
SELECT event_type, day, count(*) AS n,
       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_value
FROM (SELECT event_type, date_trunc('day', ts) AS day, value FROM events)
GROUP BY ROLLUP (event_type, day)
HAVING event_type IS NOT NULL
"""


def q_events_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS (not just rollup): aggregates at (type, user)
    and (day) — two unrelated granularities in one shuffle, the shape
    hypertable continuous aggregates compile to."""
    e = _events(spark, sf_dir).select(
        "event_type",
        F.col("user_id"),
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.col("value"),
    )
    e.createOrReplaceTempView("_ev_gs")
    return spark.sql(
        """
        SELECT event_type, user_id, day, count(*) AS n,
               CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_value
        FROM _ev_gs
        GROUP BY GROUPING SETS ((event_type, user_id), (day))
        """
    )


SQL_EVENTS_GROUPING_SETS = """
SELECT event_type, user_id, day, count(*) AS n,
       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_value
FROM (SELECT event_type, user_id, date_trunc('day', ts) AS day, value FROM events)
GROUP BY GROUPING SETS ((event_type, user_id), (day))
"""


def q_events_asof(spark, sf_dir):
    """As-of join: each 'click' event picks up the value of the user's most
    recent prior 'signup' event (union+window strategy; oracle = DuckDB's
    native ASOF JOIN)."""
    from harvesttext_spark.operators.asof import as_of_join

    e = _events(spark, sf_dir)
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", F.round("value", 4).alias("click_value")
    )
    signups = e.filter(F.col("event_type") == "signup").select(
        "user_id", "ts", F.round("value", 4).alias("signup_value")
    )
    out = as_of_join(clicks, signups, "user_id", "ts", ["signup_value"])
    return out.select(
        "event_id", "user_id", "click_value",
        F.col("asof_signup_value").alias("signup_value"),
    )


SQL_EVENTS_ASOF = """
WITH clicks AS (
  SELECT event_id, user_id, ts, round(value, 4) AS click_value
  FROM events WHERE event_type = 'click'
),
signups AS (
  SELECT user_id, ts, round(value, 4) AS signup_value
  FROM events WHERE event_type = 'signup'
)
SELECT c.event_id, c.user_id, c.click_value, s.signup_value
FROM clicks c ASOF LEFT JOIN signups s
  ON c.user_id = s.user_id AND c.ts >= s.ts
"""


def q_events_sessionize(spark, sf_dir):
    """Sessionization: per user, a new session starts after a >30min gap;
    emits per-session event counts — lag window + running sum."""
    from pyspark.sql.window import Window

    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))) > 1800
    sess = e.withColumn(
        "new_sess", F.when(gap | F.lag("ts").over(w).isNull(), 1).otherwise(0)
    ).withColumn("session_id", F.sum("new_sess").over(w))
    return (
        sess.groupBy("user_id", "session_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
    )


SQL_EVENTS_SESSIONIZE = """
WITH g AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, value,
         CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM g
)
SELECT user_id, session_id, count(*) AS n_events, round(sum(value), 4) AS sum_value
FROM s GROUP BY user_id, session_id
"""


def q_doc_coherence(spark, sf_dir):
    """Corpus n-gram cohesion repurposed as a per-document quality signal
    (north_star wording: word-discovery statistics as doc-quality signals)."""
    from harvesttext_spark.operators.word_discovery import doc_coherence

    out = doc_coherence(_docs(spark, sf_dir))
    return out.select(
        "doc_id",
        "n_bigrams",
        "n_known",
        F.round("coverage", 6).alias("coverage"),
        F.round("mean_log_agg", 6).alias("mean_log_agg"),
    )


SQL_DOC_COHERENCE = """
WITH base AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), t -> t != '') AS syms
  FROM documents WHERE length(trim(text)) > 0
),
meta AS (SELECT sum(len(syms)) + count(*) - 1 AS L FROM base),
uni AS (
  SELECT t AS word, count(*) AS c1
  FROM (SELECT unnest(syms) AS t FROM base) GROUP BY t
),
big AS (
  SELECT w1 || ' ' || w2 AS word, w1, w2, count(*) AS c2 FROM (
    SELECT syms[i] AS w1, syms[i+1] AS w2
    FROM (SELECT syms, unnest(generate_series(1, len(syms)-1)) AS i FROM base WHERE len(syms) >= 2)
  ) GROUP BY w1, w2
),
known AS (
  SELECT b.word, ln(b.c2 * (SELECT L FROM meta) * 1.0 / (u1.c1 * u2.c1)) AS log_agg
  FROM big b JOIN uni u1 ON b.w1 = u1.word JOIN uni u2 ON b.w2 = u2.word
  WHERE b.c2 >= 3 AND b.c2 * (SELECT L FROM meta) * 1.0 / (u1.c1 * u2.c1) > 0
),
pairs AS (
  SELECT doc_id, syms[i] || ' ' || syms[i+1] AS word
  FROM (SELECT doc_id, syms, unnest(generate_series(1, len(syms)-1)) AS i
        FROM base WHERE len(syms) >= 2)
)
SELECT p.doc_id,
       count(*) AS n_bigrams,
       count(k.log_agg) AS n_known,
       round(count(k.log_agg) * 1.0 / count(*), 6) AS coverage,
       round(avg(k.log_agg), 6) AS mean_log_agg
FROM pairs p LEFT JOIN known k USING (word)
GROUP BY p.doc_id
"""


def q_lm_perplexity(spark, sf_dir):
    """KenLM-style bigram stupid-backoff perplexity, self-trained on the
    documents corpus (north_star quality signal)."""
    from harvesttext_spark.operators.lm_perplexity import perplexity_signal

    out = perplexity_signal(_docs(spark, sf_dir))
    return out.select("doc_id", "n_bigrams", F.round("ppl", 6).alias("ppl"))


SQL_LM_PERPLEXITY = """
WITH base AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'), t -> t != '') AS ws,
         CASE WHEN len(ws) < 2 AND length(text) >= 2
              THEN list_filter(string_split(text, ''), c -> c != '' AND c != ' ')
              ELSE ws END AS toks
  FROM documents
),
valid AS (SELECT doc_id, toks FROM base WHERE len(toks) >= 2),
uni AS (
  SELECT t AS word, count(*) AS c1
  FROM (SELECT unnest(toks) AS t FROM valid) GROUP BY t
),
total AS (SELECT sum(c1) AS tt FROM uni),
big AS (
  SELECT w1, w2, count(*) AS c2 FROM (
    SELECT toks[i] AS w1, toks[i+1] AS w2
    FROM (SELECT toks, unnest(generate_series(1, len(toks)-1)) AS i FROM valid)
  ) GROUP BY w1, w2
),
pairs AS (
  SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2
  FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks)-1)) AS i FROM valid)
),
scored AS (
  SELECT p.doc_id,
         CASE WHEN b.c2 IS NOT NULL THEN ln(b.c2 * 1.0 / u1.c1)
              ELSE ln(0.4 * coalesce(u2.c1, 1) / (SELECT tt FROM total)) END AS lp
  FROM pairs p
  LEFT JOIN big b ON p.w1 = b.w1 AND p.w2 = b.w2
  LEFT JOIN uni u1 ON p.w1 = u1.word
  LEFT JOIN uni u2 ON p.w2 = u2.word
)
SELECT doc_id, count(*) AS n_bigrams, round(exp(-avg(lp)), 6) AS ppl
FROM scored GROUP BY doc_id
"""


def q_domain_quality(spark, sf_dir):
    """Per-source (domain analog) quality rollup: mean LM perplexity and
    n-gram coherence — the salted-partition metrics tables the pipeline
    writes alongside its output at scale."""
    from harvesttext_spark.operators.lm_perplexity import perplexity_signal
    from harvesttext_spark.operators.word_discovery import doc_coherence

    d = _docs(spark, sf_dir)
    ppl = perplexity_signal(d)
    coh = doc_coherence(d)
    joined = (
        d.select("doc_id", "source")
        .join(ppl.select("doc_id", "ppl"), "doc_id", "left")
        .join(coh.select("doc_id", "coverage", "mean_log_agg"), "doc_id", "left")
    )
    return joined.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("ppl"), 4).alias("avg_ppl"),
        F.round(F.avg("coverage"), 6).alias("avg_coverage"),
        F.round(F.avg("mean_log_agg"), 6).alias("avg_coherence"),
    )


SQL_DOMAIN_QUALITY = """
WITH base AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'), t -> t != '') AS ws,
         CASE WHEN len(ws) < 2 AND length(text) >= 2
              THEN list_filter(string_split(text, ''), c -> c != '' AND c != ' ')
              ELSE ws END AS toks
  FROM documents
),
valid AS (SELECT doc_id, toks FROM base WHERE len(toks) >= 2),
uni AS (SELECT t AS word, count(*) AS c1 FROM (SELECT unnest(toks) AS t FROM valid) GROUP BY t),
total AS (SELECT sum(c1) AS tt FROM uni),
big AS (
  SELECT w1, w2, count(*) AS c2 FROM (
    SELECT toks[i] AS w1, toks[i+1] AS w2
    FROM (SELECT toks, unnest(generate_series(1, len(toks)-1)) AS i FROM valid)
  ) GROUP BY w1, w2
),
pairs AS (
  SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2
  FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks)-1)) AS i FROM valid)
),
ppl AS (
  SELECT doc_id, exp(-avg(lp)) AS ppl FROM (
    SELECT p.doc_id,
           CASE WHEN b.c2 IS NOT NULL THEN ln(b.c2 * 1.0 / u1.c1)
                ELSE ln(0.4 * coalesce(u2.c1, 1) / (SELECT tt FROM total)) END AS lp
    FROM pairs p
    LEFT JOIN big b ON p.w1 = b.w1 AND p.w2 = b.w2
    LEFT JOIN uni u1 ON p.w1 = u1.word
    LEFT JOIN uni u2 ON p.w2 = u2.word
  ) GROUP BY doc_id
),
cbase AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), t -> t != '') AS syms
  FROM documents WHERE length(trim(text)) > 0
),
cmeta AS (SELECT sum(len(syms)) + count(*) - 1 AS L FROM cbase),
cuni AS (SELECT t AS word, count(*) AS c1 FROM (SELECT unnest(syms) AS t FROM cbase) GROUP BY t),
cbig AS (
  SELECT w1 || ' ' || w2 AS word, w1, w2, count(*) AS c2 FROM (
    SELECT syms[i] AS w1, syms[i+1] AS w2
    FROM (SELECT syms, unnest(generate_series(1, len(syms)-1)) AS i FROM cbase WHERE len(syms) >= 2)
  ) GROUP BY w1, w2
),
known AS (
  SELECT b.word, ln(b.c2 * (SELECT L FROM cmeta) * 1.0 / (u1.c1 * u2.c1)) AS log_agg
  FROM cbig b JOIN cuni u1 ON b.w1 = u1.word JOIN cuni u2 ON b.w2 = u2.word
  WHERE b.c2 >= 3 AND b.c2 * (SELECT L FROM cmeta) * 1.0 / (u1.c1 * u2.c1) > 0
),
cpairs AS (
  SELECT doc_id, syms[i] || ' ' || syms[i+1] AS word
  FROM (SELECT doc_id, syms, unnest(generate_series(1, len(syms)-1)) AS i
        FROM cbase WHERE len(syms) >= 2)
),
coh AS (
  SELECT p.doc_id,
         count(k.log_agg) * 1.0 / count(*) AS coverage,
         avg(k.log_agg) AS mean_log_agg
  FROM cpairs p LEFT JOIN known k USING (word)
  GROUP BY p.doc_id
)
SELECT d.source,
       count(*) AS n_docs,
       round(avg(ppl.ppl), 4) AS avg_ppl,
       round(avg(coh.coverage), 6) AS avg_coverage,
       round(avg(coh.mean_log_agg), 6) AS avg_coherence
FROM documents d
LEFT JOIN ppl ON d.doc_id = ppl.doc_id
LEFT JOIN coh ON d.doc_id = coh.doc_id
GROUP BY d.source
"""


# --- classic OLAP breadth (SURVEY §2.11 checklist: joins/aggs/windows) ------

def q_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: groupBy two flags + many aggregates, order by."""
    from harvesttext_spark.session import read_scaled

    li = read_scaled(spark, os.path.join(sf_dir, "lineitem.parquet"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            # decimal sums: double addition is order-dependent across engines
            F.round(F.sum(F.col("l_quantity").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("sum_base_price"),
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,6)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("sum_disc_price"),
            F.round(F.avg(F.col("l_quantity").cast("decimal(18,6)")), 6)
            .cast("double")
            .alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_qty,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_base_price,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_disc_price,
       CAST(round(avg(CAST(l_quantity AS DECIMAL(18,6))), 6) AS DOUBLE) AS avg_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q_top_customers(spark, sf_dir):
    """Join + window top-k: top 3 customers by revenue per nation."""
    from pyspark.sql.window import Window
    from harvesttext_spark.session import read_scaled

    cust = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    orders = read_scaled(spark, os.path.join(sf_dir, "orders.parquet"))
    rev = (
        orders.groupBy("o_custkey")
        .agg(
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("revenue")
        )
        .join(F.broadcast(cust), F.col("o_custkey") == cust["c_custkey"])
    )
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("revenue"), F.asc("c_custkey")
    )
    return (
        rev.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("c_nationkey", "c_custkey", "revenue", "rank")
    )


SQL_TOP_CUSTOMERS = """
WITH rev AS (
  SELECT o_custkey,
         CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT c.c_nationkey, c.c_custkey, rev.revenue,
         row_number() OVER (PARTITION BY c.c_nationkey
                            ORDER BY rev.revenue DESC, c.c_custkey ASC) AS rank
  FROM rev JOIN customer c ON rev.o_custkey = c.c_custkey
)
SELECT c_nationkey, c_custkey, revenue, rank FROM ranked WHERE rank <= 3
"""


def q_region_revenue(spark, sf_dir):
    """Multi-join star rollup: revenue per region name."""
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    cust = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    nation = spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))
    region = spark.read.parquet(os.path.join(sf_dir, "region.parquet"))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .groupBy("r_name")
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,6)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
    )


SQL_REGION_REVENUE = """
SELECT r.r_name,
       CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
"""


# --- rows-only entries (no SQL oracle: UDF / iterative / banding) -----------

def q_clean_text(spark, sf_dir):
    """Default battery, byte-checked (round 3 — was rows-only): same probe
    union + RE2 chain mirror as quality_filter_labels, minus the cascade."""
    from harvesttext_spark.functions.cleaning import make_clean_text_udf

    d = _docs(spark, sf_dir).select("doc_id", F.col("text").alias("raw"))
    return d.unionByName(_probe_df(spark, QF_PROBES)).select(
        "doc_id", make_clean_text_udf()(F.col("raw")).alias("text_clean")
    )


def _sql_clean_text() -> str:
    return (
        "WITH base AS (SELECT doc_id, text AS raw FROM documents UNION ALL "
        f"SELECT * FROM (VALUES {_sql_probe_rows()}) v(doc_id, raw)) "
        f"SELECT doc_id, {_sql_clean_chain('raw')} AS text_clean FROM base"
    )


def q_minhash_lsh_pairs(spark, sf_dir):
    from harvesttext_spark.operators.dedup import minhash_dup_pairs

    out = minhash_dup_pairs(_docs(spark, sf_dir), min_jaccard=0.4)
    return out.select("id_a", "id_b", F.round("est_jaccard", 6).alias("est_jaccard"))


# FULL value oracle for the LSH band join: the banding is portable md5
# arithmetic end to end (KM hash pairs -> 16-component signature -> md5 of
# each 4-component band slice -> (band, key) self-join -> signature-equality
# estimate), so DuckDB reproduces candidate PAIRS and estimates exactly.
# The hot-band cap (left side = the DEFAULT_MAX_BAND_DF smallest ids per
# bucket, dedup.py's 100TB guard) is mirrored via row_number so the oracle
# stays exact even on fixtures with oversized buckets.
SQL_MINHASH_LSH_PAIRS = """
WITH sh AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(toks) >= 3
           THEN list_transform(generate_series(1, len(toks) - 2),
                               i -> array_to_string(toks[i:i+2], ' '))
           ELSE [array_to_string(toks, ' ')] END) AS shingles
  FROM (SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), t -> t != '') AS toks
        FROM documents)
),
hp AS (
  SELECT doc_id,
         list_transform(shingles, s -> struct_pack(
           h1 := list_reduce(list_prepend(CAST(0 AS BIGINT),
                   list_transform(string_split(substring(md5(s), 1, 8), ''),
                                  c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))),
                 (a, b) -> a * 16 + b),
           h2 := list_reduce(list_prepend(CAST(0 AS BIGINT),
                   list_transform(string_split(substring(md5(s), 9, 8), ''),
                                  c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))),
                 (a, b) -> a * 16 + b))) AS hs
  FROM sh
),
sig AS (
  SELECT doc_id,
         list_transform(generate_series(0, 15),
           i -> list_aggregate(list_transform(hs, p -> (p.h1 + i * p.h2) % 4294967296), 'min')) AS sig
  FROM hp
),
bands AS (
  SELECT doc_id, b.b AS band,
         md5(array_to_string(sig[b.b * 4 + 1 : b.b * 4 + 4], ',')) AS key
  FROM sig, (SELECT unnest(generate_series(0, 3)) AS b) b
),
ra AS (
  SELECT doc_id, band, key,
         row_number() OVER (PARTITION BY band, key ORDER BY doc_id) AS rk
  FROM bands
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM ra a JOIN bands b USING (band, key)
  WHERE a.doc_id < b.doc_id AND a.rk <= {MAX_BAND_DF}
)
SELECT c.id_a, c.id_b,
       round(len(list_filter(generate_series(1, 16), i -> sa.sig[i] = sb.sig[i])) / 16.0, 6) AS est_jaccard
FROM cand c
JOIN sig sa ON sa.doc_id = c.id_a
JOIN sig sb ON sb.doc_id = c.id_b
WHERE len(list_filter(generate_series(1, 16), i -> sa.sig[i] = sb.sig[i])) / 16.0 >= 0.4
"""


def _interp_max_band_df(sql: str) -> str:
    from harvesttext_spark.operators.dedup import DEFAULT_MAX_BAND_DF

    return sql.replace("{MAX_BAND_DF}", str(DEFAULT_MAX_BAND_DF))


SQL_MINHASH_LSH_PAIRS = _interp_max_band_df(SQL_MINHASH_LSH_PAIRS)


def _t2s_probe_prefix() -> str:
    """Deterministic traditional-text prefix: the first 64 char-map pairs
    PLUS every phrase-exception's traditional form (protections like 乾隆
    and overrides like 答覆→答复) — the test corpus is mostly
    simplified/latin, so without it neither the translate pass nor the
    phrase layer would do real work.  Prepended identically in the Spark
    query and the DuckDB oracle."""
    from harvesttext_spark.functions.t2s import t2s_pairs, t2s_phrase_pairs

    chars = "".join(t for t, _ in t2s_pairs()[:64])
    phrases = "".join(t for t, _ in t2s_phrase_pairs())
    return chars + phrases


def q_t2s_text(spark, sf_dir):
    """Traditional->simplified conversion (battery pass 16) — phrase-level
    exceptions via placeholder replace chain + Catalyst translate over the
    committed char map; the DuckDB oracle runs the exact same replace/
    translate chain (t2s_sql).  A deterministic traditional probe prefix
    (_t2s_probe_prefix) makes both layers do real conversions on every
    corpus row."""
    from harvesttext_spark.functions.t2s import t2s_col

    prefix = _t2s_probe_prefix()
    return _docs(spark, sf_dir).select(
        "doc_id",
        t2s_col(F.concat(F.lit(prefix), F.col("text"))).alias("text_s"),
    )


def _sql_t2s() -> str:
    from harvesttext_spark.functions.t2s import t2s_sql

    prefix = _t2s_probe_prefix().replace("'", "''")
    expr = t2s_sql("'" + prefix + "' || text")
    return "SELECT doc_id, " + expr + " AS text_s FROM documents"


# probe appended to every document for the punkt trainer: the word-soup
# test corpus has ZERO period tokens, so without it the abbreviation
# detector would be value-checked on an empty result.  'Fig.'/'fig.' are
# always-with-period (true abbreviations); 'approx'/'growth' occur both
# with and without the period so the length-penalty branch is exercised
# (and correctly rejects them).  Mirrored verbatim in the oracle SQL.
PUNKT_PROBE = (
    " Fig. 4 shows approx. linear growth. The growth rate approx doubles. See fig. 2."
)


def q_punkt_abbrevs(spark, sf_dir):
    """Punkt-style unsupervised abbreviation detection (Kiss & Strunk 2006
    type stage) trained on the corpus — the from-scratch analog of nltk's
    pretrained sent_tokenize model the reference's en path calls
    (harvesttext.py:707).  One groupBy(typ) + broadcast totals; the full
    closed-form score is mirrored in DuckDB."""
    from harvesttext_spark.operators.punkt import punkt_abbreviations

    docs = _docs(spark, sf_dir).withColumn(
        "text", F.concat(F.col("text"), F.lit(PUNKT_PROBE))
    )
    return punkt_abbreviations(docs)


def _sql_punkt() -> str:
    from harvesttext_spark.operators.punkt import punkt_abbreviations_sql

    probe = PUNKT_PROBE.replace("'", "''")
    return punkt_abbreviations_sql(
        table=f"(SELECT text || '{probe}' AS text FROM documents)"
    )


def q_punkt_starters(spark, sf_dir):
    """Punkt TOKEN stage (round 3): frequent-sentence-starter detection —
    first-pass boundaries (terminator-final prev token that is not a
    trained abbreviation; lag window per doc), then the paper's
    two-binomial collocation LLR at threshold 30.  Full DuckDB oracle
    (lag window + identical clamped LLR).  Same probe suffix as
    punkt_abbrevs: its 'growth.'/'doubles.' terminators create real
    boundaries ('The'/'See' follow them on every row)."""
    from harvesttext_spark.operators.punkt import punkt_sentence_starters

    docs = _docs(spark, sf_dir).withColumn(
        "text", F.concat(F.col("text"), F.lit(PUNKT_PROBE))
    )
    return punkt_sentence_starters(docs)


def _sql_punkt_starters() -> str:
    from harvesttext_spark.operators.punkt import punkt_sentence_starters_sql

    probe = PUNKT_PROBE.replace("'", "''")
    return punkt_sentence_starters_sql(
        table=f"(SELECT doc_id, text || '{probe}' AS text FROM documents)"
    )


# probe for the round-4 token-stage queries: collocation pairs behind
# abbreviation/initial/number periods (Dr. Smith / J. Smith / No. 4) and
# orthographic-context evidence (The/Growth capitalized only at
# boundaries + lowercase elsewhere; Smith capitalized mid-sentence only)
PUNKT_ORTHO_PROBE = (
    " Dr. Smith met J. Smith today. The growth rate doubles daily. "
    "Growth is steady here. No. 4 ranks first among trends. the trend holds "
    "as trends shift daily here today"
    # the bare tail occurrences keep today/daily/here/trends from training
    # as abbreviations (sentence-final-only words on a tiny repetitive
    # corpus otherwise always carry a period — the known punkt artifact),
    # so first-pass boundaries after them are real and the ortho/colloc
    # tables train on the intended evidence
)


def q_punkt_collocations(spark, sf_dir):
    """Punkt token-stage COLLOCATIONS (round 4): period-final
    abbreviation/initial/number types paired with their successors at
    Dunning LLR >= 7.88 with over-representation — the 'J. Smith' /
    'No. 4' shield nltk's second pass applies (harvesttext.py:707 via
    nltk sent_tokenize).  Full DuckDB oracle."""
    from harvesttext_spark.operators.punkt import punkt_collocations

    docs = _docs(spark, sf_dir).withColumn(
        "text", F.concat(F.col("text"), F.lit(PUNKT_ORTHO_PROBE))
    )
    return punkt_collocations(docs)


def _sql_punkt_collocations() -> str:
    from harvesttext_spark.operators.punkt import punkt_collocations_sql

    probe = PUNKT_ORTHO_PROBE.replace("'", "''")
    return punkt_collocations_sql(
        table=f"(SELECT doc_id, text || '{probe}' AS text FROM documents)"
    )


def q_punkt_ortho(spark, sf_dir):
    """Punkt token-stage ORTHOGRAPHIC CONTEXT (round 4): per-type
    lowercase-anywhere / uppercase-mid-sentence evidence from first-pass
    boundaries; a capitalized word after an abbreviation period is a
    boundary iff lc_any AND NOT mid_uc.  Full DuckDB oracle."""
    from harvesttext_spark.operators.punkt import punkt_ortho_context

    docs = _docs(spark, sf_dir).withColumn(
        "text", F.concat(F.col("text"), F.lit(PUNKT_ORTHO_PROBE))
    )
    return punkt_ortho_context(docs)


def _sql_punkt_ortho() -> str:
    from harvesttext_spark.operators.punkt import punkt_ortho_context_sql

    probe = PUNKT_ORTHO_PROBE.replace("'", "''")
    return punkt_ortho_context_sql(
        table=f"(SELECT doc_id, text || '{probe}' AS text FROM documents)"
    )


def q_seg_posseg_dict(spark, sf_dir):
    """Dict-DAG cutter (the from-scratch max-prob segmenter) with POS tags,
    exploded to scalars.  Python-side algorithm -> rows-only check."""
    from harvesttext_spark.functions.tokenize import seg_documents

    segged = seg_documents(
        _docs(spark, sf_dir).filter(F.col("doc_id") < 100),
        with_pos=True,
        cutter="dict",
    )
    return segged.select(
        "doc_id", F.posexplode("words").alias("pos_idx", "wp")
    ).select(
        "doc_id",
        F.col("pos_idx").cast("int").alias("pos_idx"),
        F.col("wp.word").alias("word"),
        F.col("wp.pos").alias("tag"),
    )


def q_entity_linking_fuzzy(spark, sf_dir):
    """Linking WITH the round-2 fuzzy recheck (char tolerance over the
    posseg stream) — exact spans plus 1-substitution mentions.  Python
    scan semantics -> rows-only check."""
    from harvesttext_spark.operators.linking import EntityKB

    kb = EntityKB.from_triples(_DEMO_KB_TRIPLES)
    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 100)
    bc = spark.sparkContext.broadcast(kb)

    def scan(batches):
        import pandas as pd

        kb_ = bc.value
        for pdf in batches:
            rows = []
            for doc_id, s in zip(pdf["doc_id"], pdf["text"]):
                if not isinstance(s, str):
                    continue
                for l, r, e, t in kb_.link_with_recheck(s, char_tolerance=1):
                    rows.append((doc_id, l, r, e, t))
            yield pd.DataFrame(rows, columns=["doc_id", "l", "r", "entity", "type"])

    return d.mapInPandas(
        scan, schema="doc_id long, l int, r int, entity string, type string"
    )


def q_ner_entities(spark, sf_dir):
    """Rule-based NER recast (operators/parsing.py): KB-linked entities +
    tag-mapped names per document, corpus-thresholded (the NERP-style
    discovery).  Python-side rules -> rows-only check."""
    from harvesttext_spark.operators.linking import EntityKB
    from harvesttext_spark.operators.parsing import discover_named_entities

    kb = EntityKB.from_triples(_DEMO_KB_TRIPLES)
    return discover_named_entities(
        _docs(spark, sf_dir).filter(F.col("doc_id") < 200), kb, min_count=2
    )


def q_simhash_dup_pairs(spark, sf_dir):
    """64-bit SimHash near-dup candidates, Manku 4×16-bit block buckets
    (bounded bucket sizes at corpus scale).  xxhash64-based — engine hash,
    rows-only check."""
    from harvesttext_spark.operators.dedup import simhash_dup_pairs

    return simhash_dup_pairs(_docs(spark, sf_dir), max_hamming=3)


def q_simhash_pairs32(spark, sf_dir):
    """Portable 32-bit SimHash near-dup pipeline, VALUE-checked end to end
    (round 3): md5-based signature + Manku 4×8-bit pigeonhole blocking +
    bucket join + exact hamming verify, all mirrored in DuckDB.  The
    production 64-bit xxhash64 path stays rows-only (engine hash)."""
    from harvesttext_spark.operators.dedup import simhash_dup_pairs_portable

    return simhash_dup_pairs_portable(_docs(spark, sf_dir), max_hamming=3)


SQL_SIMHASH_PAIRS32 = """
WITH tok AS (
  SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '\\s+'), t -> t != '')) AS t
  FROM documents
),
bits AS (
  SELECT doc_id, g.b,
         CASE WHEN ((strpos('0123456789abcdef', substring(md5(t), (g.b // 4) + 1, 1)) - 1)
                    // CAST(pow(2, 3 - (g.b % 4)) AS INT)) % 2 = 1
              THEN 1 ELSE -1 END AS sgn
  FROM tok, (SELECT unnest(generate_series(0, 31)) AS b) g
),
sums AS (SELECT doc_id, b, sum(sgn) AS s FROM bits GROUP BY doc_id, b),
sig AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN s > 0 THEN CAST(pow(2, 31 - b) AS BIGINT) ELSE 0 END) AS BIGINT) AS sh
  FROM sums GROUP BY doc_id
),
buckets AS (
  SELECT doc_id, sh, g.i AS bi, (sh >> (8 * g.i)) & 255 AS bv
  FROM sig, (SELECT unnest(generate_series(0, 3)) AS i) g
),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.sh AS sh_a, b.sh AS sh_b
  FROM buckets a JOIN buckets b USING (bi, bv)
  WHERE a.doc_id < b.doc_id
)
SELECT id_a, id_b, bit_count(xor(sh_a, sh_b)) AS hamming
FROM pairs
WHERE bit_count(xor(sh_a, sh_b)) <= 3
"""


def q_repetition_signals(spark, sf_dir):
    """Gopher-style repetition rules (dup-line fraction, dup-line char
    fraction, top-bigram char coverage) — the post-cascade web-filter
    signals.  Probe rows carry real repeated lines/bigrams (the word-soup
    corpus has no newlines); full DuckDB value oracle."""
    from harvesttext_spark.functions.textstats import repetition_signals

    d = _docs(spark, sf_dir).select("doc_id", "text")
    return repetition_signals(d.unionByName(_probe_df(spark, REP_PROBES, col="text")))


REP_PROBES = [
    (2000001, "alpha beta\nalpha beta\nalpha beta\ngamma delta"),
    (2000002, "one line only"),
    (2000003, "x y x y x y x y x y"),
    (2000004, "  \n\npadded line\npadded line  \n"),
]


SQL_REPETITION_SIGNALS_TMPL = """
WITH base AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT * FROM (VALUES {probes}) v(doc_id, text)
),
ln AS (
  SELECT doc_id, trim(l) AS line
  FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS l FROM base)
  WHERE trim(l) != ''
),
per_line AS (SELECT doc_id, line, count(*) AS cnt FROM ln GROUP BY doc_id, line),
lstats AS (
  SELECT doc_id,
         1.0 - count(*) * 1.0 / sum(cnt) AS dlf,
         sum((cnt - 1) * length(line)) * 1.0 / greatest(sum(cnt * length(line)), 1) AS dlcf
  FROM per_line GROUP BY doc_id
),
tok AS (
  SELECT doc_id, length(text) AS n_chars,
         list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS ws
  FROM base
),
bg AS (
  SELECT doc_id, n_chars, ws[i] || ' ' || ws[i + 1] AS bg
  FROM (SELECT doc_id, n_chars, ws, unnest(generate_series(1, len(ws) - 1)) AS i
        FROM tok WHERE len(ws) >= 2)
),
per_bg AS (SELECT doc_id, n_chars, bg, count(*) AS cnt FROM bg GROUP BY doc_id, n_chars, bg),
bstats AS (
  SELECT doc_id, max(cnt * length(bg)) * 1.0 / greatest(any_value(n_chars), 1) AS tbcf
  FROM per_bg GROUP BY doc_id
)
SELECT b.doc_id,
       round(coalesce(lstats.dlf, 0), 6) AS dup_line_frac,
       round(coalesce(lstats.dlcf, 0), 6) AS dup_line_char_frac,
       round(coalesce(bstats.tbcf, 0), 6) AS top_bigram_char_frac
FROM base b LEFT JOIN lstats ON b.doc_id = lstats.doc_id
LEFT JOIN bstats ON b.doc_id = bstats.doc_id
"""


def _sql_repetition_signals() -> str:
    probes = ", ".join(
        "({}::BIGINT, '{}')".format(i, t.replace("'", "''").replace("\n", "' || chr(10) || '"))
        for i, t in REP_PROBES
    )
    return SQL_REPETITION_SIGNALS_TMPL.format(probes=probes)


RN_PROBES = [
    (2100001, "a b c a b c a b c x y z"),                 # top-3gram + dup-5gram
    (2100002, "p q r s t p q r s t u v w x y z"),          # dup-5gram union 0.625
    (2100003, "one two three four five six seven"),        # no repetition
    (2100004, "alpha beta gamma delta epsilon zeta eta theta iota kappa "
              "alpha beta gamma delta epsilon zeta eta theta iota kappa "
              "closing tail words here"),                  # dup-10gram
]


def q_repetition_ngrams(spark, sf_dir):
    """The rest of the Gopher repetition family (round 4): top-3/4-gram
    char coverage and duplicate-5/10-gram char coverage (union of
    overlapping duplicate spans, counted once per token position) —
    completes Rae et al. table A1 beyond dup-line/top-bigram.  Probe
    rows plant each case; full DuckDB value oracle."""
    from harvesttext_spark.functions.textstats import repetition_ngram_signals

    d = _docs(spark, sf_dir).select("doc_id", "text")
    return repetition_ngram_signals(
        d.unionByName(_probe_df(spark, RN_PROBES, col="text"))
    )


def _sql_repetition_ngrams() -> str:
    probes = ", ".join(
        "({}::BIGINT, '{}')".format(i, t.replace("'", "''")) for i, t in RN_PROBES
    )

    def gram(n: int) -> str:
        return " || ' ' || ".join(f"ws[i + {j}]" for j in range(n))

    def top_cte(n: int) -> str:
        return f"""
g{n} AS (
  SELECT doc_id, n_chars, {gram(n)} AS g
  FROM (SELECT doc_id, n_chars, ws, unnest(generate_series(1, len(ws) - {n - 1})) AS i
        FROM tok WHERE len(ws) >= {n})
),
t{n} AS (
  SELECT doc_id, max(cnt * length(g)) * 1.0 / greatest(any_value(n_chars), 1) AS f
  FROM (SELECT doc_id, n_chars, g, count(*) AS cnt FROM g{n} GROUP BY doc_id, n_chars, g)
  GROUP BY doc_id
)"""

    def dup_cte(n: int) -> str:
        return f"""
p{n} AS (
  SELECT doc_id, i, {gram(n)} AS g
  FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - {n - 1})) AS i
        FROM tok WHERE len(ws) >= {n})
),
d{n} AS (
  SELECT doc_id, g FROM (SELECT doc_id, g, count(*) AS cnt FROM p{n} GROUP BY doc_id, g)
  WHERE cnt >= 2
),
cov{n} AS (
  SELECT DISTINCT doc_id, pos FROM (
    SELECT p.doc_id, unnest(generate_series(p.i, p.i + {n - 1})) AS pos
    FROM p{n} p JOIN d{n} d ON p.doc_id = d.doc_id AND p.g = d.g
  )
),
c{n} AS (
  SELECT cov{n}.doc_id, sum(tp.tlen) AS cov
  FROM cov{n} JOIN tokpos tp ON cov{n}.doc_id = tp.doc_id AND cov{n}.pos = tp.pos
  GROUP BY cov{n}.doc_id
)"""

    return f"""
WITH base AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT * FROM (VALUES {probes}) v(doc_id, text)
),
tok AS (
  SELECT doc_id, length(text) AS n_chars,
         list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS ws
  FROM base
),
tchars AS (
  SELECT doc_id, coalesce(list_sum(list_transform(ws, x -> length(x))), 0) AS tok_chars
  FROM tok
),
tokpos AS (
  SELECT doc_id, i AS pos, length(ws[i]) AS tlen
  FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS i FROM tok)
),{top_cte(3)},{top_cte(4)},{dup_cte(5)},{dup_cte(10)}
SELECT b.doc_id,
       round(coalesce(t3.f, 0), 6) AS top_3gram_char_frac,
       round(coalesce(t4.f, 0), 6) AS top_4gram_char_frac,
       round(coalesce(c5.cov, 0) * 1.0 / greatest(tc.tok_chars, 1), 6) AS dup_5gram_char_frac,
       round(coalesce(c10.cov, 0) * 1.0 / greatest(tc.tok_chars, 1), 6) AS dup_10gram_char_frac
FROM base b
LEFT JOIN t3 ON b.doc_id = t3.doc_id
LEFT JOIN t4 ON b.doc_id = t4.doc_id
LEFT JOIN c5 ON b.doc_id = c5.doc_id
LEFT JOIN c10 ON b.doc_id = c10.doc_id
JOIN tchars tc ON b.doc_id = tc.doc_id
"""


# boilerplate-dedup probe suffix (the word-soup corpus has no newlines):
# two lines shared by EVERY doc (always dropped at min_df=10), one shared
# by even docs only (dropped), one unique per doc (always survives —
# proves reassembly keeps surviving lines in order)
def _boiler_docs(spark, sf_dir):
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit("\nSubscribe to our newsletter\nAll rights reserved."),
            F.when(F.col("doc_id") % 2 == 0, F.lit("\nLimited time offer")).otherwise(
                F.lit("")
            ),
            F.lit("\nnote "),
            F.col("doc_id").cast("string"),
        ).alias("text"),
    )


def q_boilerplate_dedup(spark, sf_dir):
    """CCNet-style cross-corpus boilerplate removal: census of normalized
    line doc-frequencies, drop lines present in >= 10 docs, reassemble
    surviving lines in order.  Probe suffix plants corpus-wide lines
    (dropped), an even-docs-only line (dropped), and a per-doc unique
    line (survives) — order-preserving reassembly is value-checked."""
    from harvesttext_spark.operators.dedup import drop_boilerplate_lines

    return drop_boilerplate_lines(_boiler_docs(spark, sf_dir), min_df=10)


SQL_BOILERPLATE_DEDUP = """
WITH base AS (
  SELECT doc_id,
         text || chr(10) || 'Subscribe to our newsletter' || chr(10) || 'All rights reserved.'
              || CASE WHEN doc_id % 2 = 0 THEN chr(10) || 'Limited time offer' ELSE '' END
              || chr(10) || 'note ' || doc_id AS text
  FROM documents
),
lines AS (
  SELECT doc_id, s.pos AS pos, s.line AS line,
         lower(trim(s.line)) AS line_key
  FROM (
    SELECT doc_id, unnest(list_transform(string_split(text, chr(10)),
             (x, i) -> struct_pack(pos := i - 1, line := x))) AS s
    FROM base
  )
),
hot AS (
  SELECT line_key FROM lines WHERE line_key != ''
  GROUP BY line_key HAVING count(DISTINCT doc_id) >= 10
),
kept AS (
  SELECT l.doc_id, l.pos, l.line FROM lines l
  WHERE l.line_key NOT IN (SELECT line_key FROM hot)
),
rebuilt AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text_clean
  FROM kept GROUP BY doc_id
)
SELECT b.doc_id, coalesce(r.text_clean, '') AS text_clean
FROM base b LEFT JOIN rebuilt r ON b.doc_id = r.doc_id
"""


def q_canonical_urls(spark, sf_dir):
    """URL canonicalization (the URL-level dedup key; round 3): three URL
    variants synthesized deterministically per doc_id — mixed-case hosts,
    default ports, utm/gclid/fbclid params, fragments — canonicalized by
    the native regexp chain; the oracle builds the same strings and runs
    the same chain in RE2."""
    from harvesttext_spark.functions.urls import canonical_url

    d = _docs(spark, sf_dir).select("doc_id")
    url = (
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit("HTTPS://WWW.Example.COM:443/p/"),
                F.col("doc_id"),
                F.lit("?id="),
                F.col("doc_id"),
                F.lit("&utm_source=feed#top"),
            ),
        )
        .when(
            F.col("doc_id") % 3 == 1,
            F.concat(
                F.lit("HTTP://Site"),
                F.col("doc_id") % 7,
                F.lit(".org:80/a/B?utm_campaign=x&q=1&gclid=zz"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("https://cdn.Example.net/img/"),
                F.col("doc_id"),
                F.lit("?fbclid=f"),
            )
        )
    )
    return d.select(
        "doc_id", url.alias("url_raw"), canonical_url(url).alias("url_canon")
    )


def _sql_canonical_urls() -> str:
    from harvesttext_spark.functions.urls import canonical_url_sql

    url = (
        "CASE WHEN doc_id % 3 = 0 THEN 'HTTPS://WWW.Example.COM:443/p/' || doc_id"
        " || '?id=' || doc_id || '&utm_source=feed#top'"
        " WHEN doc_id % 3 = 1 THEN 'HTTP://Site' || (doc_id % 7) ||"
        " '.org:80/a/B?utm_campaign=x&q=1&gclid=zz'"
        " ELSE 'https://cdn.Example.net/img/' || doc_id || '?fbclid=f' END"
    )
    return (
        "WITH u AS (SELECT doc_id, " + url + " AS url_raw FROM documents) "
        "SELECT doc_id, url_raw, " + canonical_url_sql("url_raw")
        + " AS url_canon FROM u"
    )


def q_textrank_keywords(spark, sf_dir):
    from harvesttext_spark.operators.graph import textrank_keywords

    d = _docs(spark, sf_dir).select(
        "doc_id", F.lit(0).alias("sent_id"), tokens_col(F.col("text")).alias("words")
    ).filter(F.col("doc_id") < 50)
    return textrank_keywords(d, top_k=3)


# probe rows union'd identically in Spark and the oracle: the word-soup
# corpus triggers NO battery pass and no drop rule (verified: zero rows
# contain '<', '[', '@', 'http', '#', zero-width chars, multi-whitespace,
# non-ASCII, or a 10-char run at sf0.001/sf0.01), so without probes the
# flagship labels oracle would only check the identity path.  Each probe
# exercises one battery pass or one drop reason.
QF_PROBES = [
    (1000001, None),                                              # null_text
    (1000002, "tiny."),                                           # too_short
    (1000003, ",.;:!?,.;:!?,.;:!?,.;:!? mixed punct row ,.;:"),   # low_alnum
    (1000004, "dup " * 24 + "dup"),                               # low_diversity
    (1000005, "The quick brown fox jumps over the lazy dog near a calm river today."),
    (1000006, "xxxxxxxxxxxx repeated character run makes this row junk clearly."),
    (1000007, "Visit http://example.com/page?q=1 now for offers and details today okay."),
    (1000008, "Contact bob.smith@example.com for info about the new offers today."),
    (1000009, "<b>Bold</b> tags removed leaving twenty plus characters here today."),
    (1000010, "[link](http://x.io/a) markdown anchor kept with more text following here."),
    (1000011, "  leading and trailing   spaces collapse   then strip here  "),
    (1000012, "reply //@someuser: weibo mention replaced with space in this row today."),
]


def _probe_df(spark, rows, col: str = "raw"):
    """Probe rows as a JVM-side VALUES relation.  createDataFrame paid
    ~0.4s per call (Py4J conversion + local-relation analysis — measured
    0.88s vs 0.50s steady for the clean_text query); spark.sql VALUES
    stays on the JVM and is plan-only."""

    def lit(t):
        if t is None:
            return "CAST(NULL AS STRING)"
        esc = t.replace("\\", "\\\\").replace("'", "\\'").replace("\n", "\\n")
        return "'" + esc + "'"

    vals = ", ".join(f"({i}, {lit(t)})" for i, t in rows)
    return spark.sql(
        f"SELECT CAST(doc_id AS BIGINT) AS doc_id, {col} "
        f"FROM (VALUES {vals}) AS t(doc_id, {col})"
    )


def q_quality_filter_labels(spark, sf_dir):
    """FLAGSHIP value oracle (round 3 — was rows-only): the full default
    battery + keep/drop cascade, byte- and label-checked against a DuckDB
    mirror of every default pass (RE2 chain, equivalent on ASCII — the
    same equivalence tests/test_fast_path.py gates for the native chain).
    The char_run rule is mirrored WITHOUT backreferences via
    "some distinct char's 10-repeat is a substring" — exact by definition."""
    from harvesttext_spark.pipeline.quality_filter import label, scrub

    d = _docs(spark, sf_dir).select("doc_id", F.col("text").alias("raw"))
    base = d.unionByName(_probe_df(spark, QF_PROBES))
    return label(scrub(base, text_col="raw")).select(
        "doc_id", F.col("text_clean"), "keep", "drop_reason"
    )


def _sql_clean_chain(col: str = "raw") -> str:
    """The default battery as an RE2 regexp_replace chain (pass order of
    functions/cleaning.py make_cleaner; unconditional application equals
    the guarded Python chain because every guard literal is REQUIRED by
    its pattern)."""
    steps = [
        # (pattern, replacement, flags)
        (r"[\x{200b}-\x{200d}]", "", "g"),
        (r"(\\u200b|\\u200c|\\u200d)", "", "g"),
        (r"(?s)</?([^ >/]+).*?>", "", "g"),
        (r"\[(.+?)\]\(\S+\)", r"\1", "g"),
        (r"\[\S{1,6}?\]", "", "g"),
        (
            r"[\x{1F600}-\x{1F64F}\x{1F300}-\x{1F5FF}\x{1F680}-\x{1F6FF}"
            r"\x{1F1E0}-\x{1F1FF}\x{2702}-\x{27B0}]+",
            "",
            "g",
        ),
        (r"http[s]?://(?:[a-zA-Z]|[0-9]|[#$%*-;=?&@~.&+]|[!*,])+", "", "gi"),
        (r"[-a-z0-9_.]+@(?:[-a-z0-9]+\.)+[a-z]{2,6}", "", "gi"),
        (r"(回复)?(//)?\s*@\S*?\s*(:|：| |$)", " ", "g"),
        (r"(\s)+", r"\1", "g"),
    ]
    c = col
    for pat, repl, flags in steps:
        p = pat.replace("'", "''")
        r = repl.replace("'", "''")
        c = f"regexp_replace({c}, '{p}', '{r}', '{flags}')"
    c = f"replace({c}, '转发微博', '')"
    ws = "' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)"
    return f"trim({c}, {ws})"


def _sql_probe_rows() -> str:
    return ", ".join(
        "({}::BIGINT, {})".format(
            i, "NULL::VARCHAR" if t is None else "'" + t.replace("'", "''") + "'"
        )
        for i, t in QF_PROBES
    )


def _sql_quality_filter_labels() -> str:
    """Battery chain (_sql_clean_chain) + the keep/drop cascade."""
    c = _sql_clean_chain("raw")
    probe_rows = _sql_probe_rows()
    return f"""
WITH base AS (
  SELECT doc_id, text AS raw FROM documents
  UNION ALL
  SELECT * FROM (VALUES {probe_rows}) v(doc_id, raw)
),
cleaned AS (
  SELECT doc_id, {c} AS text_clean FROM base
),
sig AS (
  SELECT doc_id, text_clean,
         length(text_clean) AS n_chars,
         (length(text_clean) - length(regexp_replace(text_clean, '[A-Za-z0-9\\x{{4e00}}-\\x{{9fff}}]', '', 'g')))
           / greatest(length(text_clean), 1) AS alnum_ratio,
         list_filter(regexp_split_to_array(text_clean, '\\s+'), x -> x != '') AS toks,
         -- char_run10 without backreferences: some distinct char's
         -- 10-repeat appears as a substring (exact by definition)
         len(list_filter(list_distinct(string_split(text_clean, '')),
                         ch -> ch != '' AND contains(text_clean, repeat(ch, 10)))) > 0 AS char_run10
  FROM cleaned
),
lab AS (
  SELECT doc_id, text_clean,
         CASE WHEN text_clean IS NULL THEN 'null_text'
              WHEN n_chars < 20 THEN 'too_short'
              WHEN char_run10 THEN 'char_run'
              WHEN alnum_ratio < 0.45 THEN 'low_alnum'
              WHEN len(toks) >= 20 AND len(list_distinct(toks)) * 1.0 / greatest(len(toks), 1) < 0.30
                   THEN 'low_diversity'
              ELSE NULL END AS drop_reason
  FROM sig
)
SELECT doc_id, text_clean, drop_reason IS NULL AS keep, drop_reason FROM lab
"""


# --- extended cascade (round 4): base + Gopher repetition + high_ppl --------

# sits in a measured gap of the self-trained ppl distribution: word-soup
# docs cluster at ~26-39 with no value in (34.08, 34.43) at sf0.001 and
# none in (33.62, 34.68) at sf0.01 — fires on the 2-3 per-SF outliers,
# never within fp64-noise of a doc
QFF_PPL_THRESHOLD = 34.2

QFF_EXTRA_PROBES = [
    # high_dup_lines: passes the base cascade (52 tokens, 0.6 distinct
    # ratio, no run, alnum ok) but 4/8 lines identical -> dlf 0.375
    (1000013, "\n".join(
        ["spark engines shuffle data across partitions"] * 4
        + [
            "morning fog settles over quiet rivers today",
            "seventeen green bottles stand along the wall",
            "quantum harvest metrics improve with tuning",
            "final unique closing line about nothing else",
        ]
    )),
    # high_top_bigram: single line (dlf 0), 217 chars >= the 200 floor,
    # 'alpha beta' covers 80/217 = 0.369 > 0.20, diversity 14/28 = 0.5
    (1000014, " ".join(
        f"alpha beta {w}"
        for w in [
            "granitefield", "harborstones", "jasminecourt", "kernelsprout",
            "lanternglass", "meadowsworth", "nimbuscarved", "orchardgates",
        ]
    ) + " closing words differ here"),
]

# probes isolating each Gopher n-gram rule (round 4): each trips ITS rule
# while staying under every EARLIER threshold in the when-chain (long
# unique words tune the tri/bi coverage ratios; distinct fillers prevent
# accidental longer duplicate runs)


def _qff_ngram_probes():
    fill = [f"fillword{j:03d}" for j in range(130)]
    # top-3gram: 'trialpha tribetaa trigamma' x6 -> tri 156/~700 > 0.18,
    # bigram 102/~700 < 0.20; no repeated 4-gram (fillers differ)
    tri_parts, fi = [], 0
    for _ in range(6):
        tri_parts.append("trialpha tribetaa trigamma")
        tri_parts.extend(fill[fi : fi + 8])
        fi += 8
    tri_doc = " ".join(tri_parts)
    # top-4gram: 4-word phrase x4 -> four ~0.17 > 0.16 while its
    # sub-trigram stays ~0.13 < 0.18 and bigram ~0.08 < 0.20
    four_parts, fi = [], 0
    for _ in range(4):
        four_parts.append("quadnorth quadsouth quadeaster quadwestern")
        four_parts.extend(fill[fi : fi + 14])
        fi += 14
    four_doc = " ".join(four_parts)
    # dup-10gram: one 11-token run repeated twice in a long doc ->
    # dup5 == dup10 (same covered span, 22 positions x 9 chars = 198 of
    # ~1430 token chars ~ 0.138): passes dup5 (<= 0.15), trips dup10
    # (> 0.10)
    run = " ".join(f"runword{j:02d}" for j in range(11))
    ten_parts = [run] + fill[0:60] + [run] + fill[60:120] + [
        "closing tail words differ here entirely today"
    ]
    ten_doc = " ".join(ten_parts)
    # dup-5gram: FOUR different 5-token runs each repeated twice ->
    # dup5 union ~0.38 > 0.15 while no single n-gram dominates (top4
    # ~0.07) and no 10-token run repeats (distinct fillers between)
    segs = [" ".join(f"seg{i}{c}" for c in "abcde") for i in range(4)]
    five_parts, fi = [], 0
    for _ in range(2):
        for sg in segs:
            five_parts.append(sg)
            five_parts.extend(fill[fi : fi + 5])
            fi += 5
    five_doc = " ".join(five_parts)
    return [
        (1000015, tri_doc),
        (1000016, four_doc),
        (1000017, ten_doc),
        (1000018, five_doc),
    ]


QFF_NGRAM_PROBES = _qff_ngram_probes()


def q_quality_filter_full_labels(spark, sf_dir):
    """FULL-cascade value oracle (round 4 — the quality_filter_full
    drops were pytest-only): battery + base cascade + BOTH Gopher
    repetition stages (dup-lines/top-bigram AND the table-A1 n-gram
    rules) + KenLM-style high_ppl at a FIXED threshold — all TEN drop
    reasons composed through the real pipeline function and label+ppl
    hash-checked against a DuckDB mirror of every stage.  Probe rows
    isolate each rule (dup-lines, top-bigram, top-trigram,
    top-fourgram, dup-10gram — each tuned under every EARLIER
    threshold); high_ppl fires on the word-soup ppl outliers."""
    from harvesttext_spark.pipeline.quality_filter import quality_filter_full

    d = _docs(spark, sf_dir).select("doc_id", F.col("text").alias("raw"))
    base = d.unionByName(
        _probe_df(spark, QF_PROBES + QFF_EXTRA_PROBES + QFF_NGRAM_PROBES)
    )
    pages = base.select(
        "doc_id",
        F.concat(F.lit("u"), F.col("doc_id")).alias("url"),
        F.lit(None).cast("binary").alias("html"),
        F.col("raw").alias("text"),
    )
    out = quality_filter_full(
        pages,
        ppl_threshold=QFF_PPL_THRESHOLD,
        repetition_rules=True,
        gopher_ngram_rules=True,
    )
    return out.select(
        "doc_id", "keep", "drop_reason", F.round("ppl", 6).alias("ppl")
    )


def _sql_quality_filter_full_labels() -> str:
    """Battery chain + base cascade (as _sql_quality_filter_labels), then
    the repetition signals (SQL_REPETITION_SIGNALS shapes) and the
    self-trained bigram LM (SQL_LM_PERPLEXITY shapes) over text_clean,
    composed into the same when-chain as quality_filter_full."""
    c = _sql_clean_chain("raw")
    probe_rows = ", ".join(
        "({}::BIGINT, {})".format(
            i,
            "NULL::VARCHAR"
            if t is None
            else "'" + t.replace("'", "''").replace("\n", "' || chr(10) || '") + "'",
        )
        for i, t in QF_PROBES + QFF_EXTRA_PROBES + QFF_NGRAM_PROBES
    )

    def gram(n: int) -> str:
        return " || ' ' || ".join(f"ws[i + {j}]" for j in range(n))

    def top_cte(n: int) -> str:
        return f"""
ng{n} AS (
  SELECT doc_id, n_chars, {gram(n)} AS g
  FROM (SELECT doc_id, n_chars, ws, unnest(generate_series(1, len(ws) - {n - 1})) AS i
        FROM tok WHERE len(ws) >= {n})
),
nt{n} AS (
  SELECT doc_id, max(cnt * length(g)) * 1.0 / greatest(any_value(n_chars), 1) AS f
  FROM (SELECT doc_id, n_chars, g, count(*) AS cnt FROM ng{n} GROUP BY doc_id, n_chars, g)
  GROUP BY doc_id
)"""

    def dup_cte(n: int) -> str:
        return f"""
np{n} AS (
  SELECT doc_id, i, {gram(n)} AS g
  FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - {n - 1})) AS i
        FROM tok WHERE len(ws) >= {n})
),
nd{n} AS (
  SELECT doc_id, g FROM (SELECT doc_id, g, count(*) AS cnt FROM np{n} GROUP BY doc_id, g)
  WHERE cnt >= 2
),
ncov{n} AS (
  SELECT DISTINCT doc_id, pos FROM (
    SELECT p.doc_id, unnest(generate_series(p.i, p.i + {n - 1})) AS pos
    FROM np{n} p JOIN nd{n} d ON p.doc_id = d.doc_id AND p.g = d.g
  )
),
nc{n} AS (
  SELECT ncov{n}.doc_id,
         sum(tp.tlen) * 1.0 / greatest(any_value(tc.tok_chars), 1) AS f
  FROM ncov{n}
  JOIN tokpos tp ON ncov{n}.doc_id = tp.doc_id AND ncov{n}.pos = tp.pos
  JOIN tchars tc ON ncov{n}.doc_id = tc.doc_id
  GROUP BY ncov{n}.doc_id
)"""

    return f"""
WITH base AS (
  SELECT doc_id, text AS raw FROM documents
  UNION ALL
  SELECT * FROM (VALUES {probe_rows}) v(doc_id, raw)
),
cleaned AS (SELECT doc_id, {c} AS text_clean FROM base),
sig AS (
  SELECT doc_id, text_clean,
         length(text_clean) AS n_chars,
         (length(text_clean) - length(regexp_replace(text_clean, '[A-Za-z0-9\\x{{4e00}}-\\x{{9fff}}]', '', 'g')))
           / greatest(length(text_clean), 1) AS alnum_ratio,
         list_filter(regexp_split_to_array(text_clean, '\\s+'), x -> x != '') AS toks,
         len(list_filter(list_distinct(string_split(text_clean, '')),
                         ch -> ch != '' AND contains(text_clean, repeat(ch, 10)))) > 0 AS char_run10
  FROM cleaned
),
lab AS (
  SELECT doc_id, text_clean,
         CASE WHEN text_clean IS NULL THEN 'null_text'
              WHEN n_chars < 20 THEN 'too_short'
              WHEN char_run10 THEN 'char_run'
              WHEN alnum_ratio < 0.45 THEN 'low_alnum'
              WHEN len(toks) >= 20 AND len(list_distinct(toks)) * 1.0 / greatest(len(toks), 1) < 0.30
                   THEN 'low_diversity'
              ELSE NULL END AS drop_reason
  FROM sig
),
ln AS (
  SELECT doc_id, trim(l) AS line
  FROM (SELECT doc_id, unnest(string_split(text_clean, chr(10))) AS l FROM cleaned)
  WHERE trim(l) != ''
),
per_line AS (SELECT doc_id, line, count(*) AS cnt FROM ln GROUP BY doc_id, line),
lstats AS (
  SELECT doc_id, 1.0 - count(*) * 1.0 / sum(cnt) AS dlf
  FROM per_line GROUP BY doc_id
),
tok AS (
  SELECT doc_id, length(text_clean) AS n_chars,
         list_filter(regexp_split_to_array(text_clean, '\\s+'), x -> x != '') AS ws
  FROM cleaned
),
bg AS (
  SELECT doc_id, n_chars, ws[i] || ' ' || ws[i + 1] AS bg
  FROM (SELECT doc_id, n_chars, ws, unnest(generate_series(1, len(ws) - 1)) AS i
        FROM tok WHERE len(ws) >= 2)
),
per_bg AS (SELECT doc_id, n_chars, bg, count(*) AS cnt FROM bg GROUP BY doc_id, n_chars, bg),
bstats AS (
  SELECT doc_id, max(cnt * length(bg)) * 1.0 / greatest(any_value(n_chars), 1) AS tbcf
  FROM per_bg GROUP BY doc_id
),
tchars AS (
  SELECT doc_id, coalesce(list_sum(list_transform(ws, x -> length(x))), 0) AS tok_chars
  FROM tok
),
tokpos AS (
  SELECT doc_id, i AS pos, length(ws[i]) AS tlen
  FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS i FROM tok)
),{top_cte(3)},{top_cte(4)},{dup_cte(5)},{dup_cte(10)},
lmbase AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text_clean, '\\s+'), t -> t != '') AS ws,
         CASE WHEN len(ws) < 2 AND length(text_clean) >= 2
              THEN list_filter(string_split(text_clean, ''), c -> c != '' AND c != ' ')
              ELSE ws END AS toks
  FROM cleaned
),
valid AS (SELECT doc_id, toks FROM lmbase WHERE len(toks) >= 2),
uni AS (SELECT t AS word, count(*) AS c1 FROM (SELECT unnest(toks) AS t FROM valid) GROUP BY t),
total AS (SELECT sum(c1) AS tt FROM uni),
big AS (
  SELECT w1, w2, count(*) AS c2 FROM (
    SELECT toks[i] AS w1, toks[i+1] AS w2
    FROM (SELECT toks, unnest(generate_series(1, len(toks)-1)) AS i FROM valid)
  ) GROUP BY w1, w2
),
pairs AS (
  SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2
  FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks)-1)) AS i FROM valid)
),
ppl AS (
  SELECT doc_id, exp(-avg(lp)) AS ppl FROM (
    SELECT p.doc_id,
           CASE WHEN b.c2 IS NOT NULL THEN ln(b.c2 * 1.0 / u1.c1)
                ELSE ln(0.4 * coalesce(u2.c1, 1) / (SELECT tt FROM total)) END AS lp
    FROM pairs p
    LEFT JOIN big b ON p.w1 = b.w1 AND p.w2 = b.w2
    LEFT JOIN uni u1 ON p.w1 = u1.word
    LEFT JOIN uni u2 ON p.w2 = u2.word
  ) GROUP BY doc_id
),
lab2 AS (
  SELECT l.doc_id, l.text_clean,
         CASE WHEN l.drop_reason IS NOT NULL THEN l.drop_reason
              WHEN length(l.text_clean) >= 200 AND round(coalesce(ls.dlf, 0), 6) > 0.30
                   THEN 'high_dup_lines'
              WHEN length(l.text_clean) >= 200 AND round(coalesce(bs.tbcf, 0), 6) > 0.20
                   THEN 'high_top_bigram'
              WHEN length(l.text_clean) >= 200 AND round(coalesce(nt3.f, 0), 6) > 0.18
                   THEN 'high_top_trigram'
              WHEN length(l.text_clean) >= 200 AND round(coalesce(nt4.f, 0), 6) > 0.16
                   THEN 'high_top_fourgram'
              WHEN length(l.text_clean) >= 200 AND round(coalesce(nc5.f, 0), 6) > 0.15
                   THEN 'high_dup_5gram'
              WHEN length(l.text_clean) >= 200 AND round(coalesce(nc10.f, 0), 6) > 0.10
                   THEN 'high_dup_10gram'
              ELSE NULL END AS dr1
  FROM lab l
  LEFT JOIN lstats ls ON l.doc_id = ls.doc_id
  LEFT JOIN bstats bs ON l.doc_id = bs.doc_id
  LEFT JOIN nt3 ON l.doc_id = nt3.doc_id
  LEFT JOIN nt4 ON l.doc_id = nt4.doc_id
  LEFT JOIN nc5 ON l.doc_id = nc5.doc_id
  LEFT JOIN nc10 ON l.doc_id = nc10.doc_id
),
fin AS (
  SELECT lab2.doc_id,
         CASE WHEN dr1 IS NOT NULL THEN dr1
              WHEN p.ppl > {QFF_PPL_THRESHOLD} THEN 'high_ppl'
              ELSE NULL END AS drop_reason,
         p.ppl AS ppl
  FROM lab2 LEFT JOIN ppl p ON lab2.doc_id = p.doc_id
)
SELECT doc_id, drop_reason IS NULL AS keep, drop_reason, round(ppl, 6) AS ppl FROM fin
"""


PII_PROBES = [
    (3000001, "call me at 13812345678 or mail a.b@example.com today"),
    (3000002, "id 11010519491231002X should scrub and 13912345678 too"),
    (3000003, "plain text with number 12345 stays put"),
    (3000004, "boundary check ends with 13812345678"),
    (3000005, "13812345678 starts the line and x13812345678 is glued"),
    (3000006, "UPPER.CASE@EXAMPLE.ORG and 170-prefix 17012345678 both go"),
]


def q_pii_scrub(spark, sf_dir):
    """PII regex battery (north rule: 'PII/toxicity-scrub ... regex scrub'
    — round 4, was pytest-only): zh mobile numbers, national-id runs, and
    emails replaced by <CAT> placeholders in one Catalyst regexp chain.
    Spark keeps the lookaround form (stronger on adjacent PII); the
    DuckDB mirror re-emits captured boundary chars (RE2 has no
    lookarounds) — equivalent except PII separated by a single char,
    which the probes avoid; the word-soup corpus has no digits at all."""
    from harvesttext_spark.operators.linking import scrub_pii_regex

    d = _docs(spark, sf_dir).select("doc_id", "text")
    base = d.unionByName(_probe_df(spark, PII_PROBES, col="text"))
    return base.select("doc_id", scrub_pii_regex(F.col("text")).alias("scrubbed"))


def _sql_pii_scrub() -> str:
    probes = ", ".join(
        "({}::BIGINT, '{}')".format(i, t.replace("'", "''")) for i, t in PII_PROBES
    )
    steps = [
        ("(^|[^0-9])(1[3-9][0-9]{9})($|[^0-9])", r"\1<PHONE>\3"),
        ("(^|[^0-9Xx])([0-9]{17}[0-9Xx])($|[^0-9Xx])", r"\1<IDNUM>\3"),
        ("(?i)[-a-z0-9_.]+@(?:[-a-z0-9]+\\.)+[a-z]{2,6}", "<EMAIL>"),
    ]
    c = "text"
    for pat, repl in steps:
        c = f"regexp_replace({c}, '{pat}', '{repl}', 'g')"
    return (
        "WITH base AS (SELECT doc_id, text FROM documents UNION ALL "
        f"SELECT * FROM (VALUES {probes}) v(doc_id, text)) "
        f"SELECT doc_id, {c} AS scrubbed FROM base"
    )


def q_ann_ivf_topk(spark, sf_dir):
    """IVF approximate nearest neighbors — FULL VALUE ORACLE (round 6):
    the assign/probe/score machinery runs against the deterministic
    md5-derived centroid fixture, whose components embed in the oracle
    SQL as literals (the ann_lsh plane-constant precedent), so nearest-
    centroid assignment, n_probe centroid selection, candidate scoring,
    and the final top-k window are all value-checked.  The TRAINED
    quantizer (seeded KMeans||) stays pytest-gated for recall/
    determinism — training is the one step SQL can't express.
    Assignment is one broadcast-centroid Arrow pass; the probe join
    shuffles on the bounded centroid_id key."""
    from harvesttext_spark.operators.similarity import fixture_centroids, ivf_topk

    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cent = fixture_centroids(spark, dim=64, n_centroids=8)
    out = ivf_topk(emb, queries, k=5, n_centroids=8, n_probe=3, centroids=cent)
    return out.select(
        "query_id", "vec_id", F.round("cos_sim", 4).alias("cos_sim"), "rank"
    )


def _sql_ann_ivf(dim: int = 64, n_centroids: int = 8, n_probe: int = 3, k: int = 5) -> str:
    """DuckDB mirror of q_ann_ivf_topk over the SAME centroid fixture:
    assignment = rank-1 cosine per vector (first-max tie-break == numpy
    argmax via cid ASC), probe = top-n_probe centroids per query, score =
    cosine over the probed inverted lists, round(4) absorbing the
    numpy-float64 vs DuckDB fold ulp drift (embedding_topk precedent)."""
    from harvesttext_spark.operators.similarity import _hyperplane

    cent_rows = ", ".join(
        "({}, [{}]::DOUBLE[])".format(
            j, ", ".join(repr(x) for x in _hyperplane(dim, 9000 + j))
        )
        for j in range(n_centroids)
    )
    cos = (
        "list_dot_product({v}, {c})"
        " / (sqrt(list_dot_product({v}, {v})) * sqrt(list_dot_product({c}, {c})))"
    )
    return f"""
WITH cent(cid, c) AS (VALUES {cent_rows}),
sims AS (
  SELECT e.vec_id, e.embedding, c.cid,
         {cos.format(v="e.embedding", c="c.c")} AS sim
  FROM embeddings e CROSS JOIN cent c),
asg AS (
  SELECT vec_id, embedding, cid FROM (
    SELECT vec_id, embedding, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid ASC) AS rn
    FROM sims) WHERE rn = 1),
q AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < 3),
qprobe AS (
  SELECT query_id, qvec, cid FROM (
    SELECT q.query_id, q.qvec, c.cid,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY {cos.format(v="q.qvec", c="c.c")} DESC,
                                       c.cid ASC) AS rn
    FROM q CROSS JOIN cent c) WHERE rn <= {n_probe}),
scored AS (
  SELECT p.query_id, a.vec_id,
         {cos.format(v="a.embedding", c="p.qvec")} AS cos_sim
  FROM asg a JOIN qprobe p USING (cid)),
ranked AS (
  SELECT query_id, vec_id, cos_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, vec_id ASC) AS rank
  FROM scored)
SELECT query_id, vec_id, round(cos_sim, 4) AS cos_sim, rank
FROM ranked WHERE rank <= {k}
"""


def _semdedup_probe_embeddings(emb):
    """Planted semantic near-dups derived from existing rows with ops
    that are EXACT in IEEE float (copy, x2 power-of-two scale, negation,
    component replacement) so Spark float32 arrays and the DuckDB mirror
    see bit-equal inputs: the copy and the scaled copy must drop
    (cos = 1 with a smaller id — scaling by 2 leaves the normalized
    vector bit-identical, so cluster assignment provably agrees), the
    negation and the +10-component outlier must keep."""
    two = F.lit(2.0).cast("float")
    return emb.filter(F.col("vec_id") < 4).select(
        (F.col("vec_id") + F.lit(9000001)).alias("vec_id"),
        F.when(F.col("vec_id") == 0, F.col("embedding"))
        .when(F.col("vec_id") == 1, F.transform("embedding", lambda x: x * two))
        .when(F.col("vec_id") == 2, F.transform("embedding", lambda x: -x))
        .otherwise(
            F.concat(
                F.array(F.lit(10.0).cast("float")), F.slice("embedding", 2, 63)
            )
        )
        .alias("embedding"),
    )


def q_semdedup(spark, sf_dir):
    """SemDedup — embedding-space semantic dedup (Abbas et al. 2023,
    operators/semdedup.py): coarse-cluster on the deterministic centroid
    fixture (ann_ivf_topk precedent), then within each cluster drop
    every vector whose cosine to a smaller-id member reaches 0.95.
    Catches paraphrase near-dups every lexical dedup stage misses.
    FULL value oracle: assignment, the keep-first pair scan, and the
    keep decision are all mirrored in SQL over the same centroid
    literals; planted probe vectors (exact copy / x2 scale / negation /
    outlier) pin both sides of the threshold."""
    from harvesttext_spark.operators.semdedup import semdedup
    from harvesttext_spark.operators.similarity import fixture_centroids

    emb = _emb(spark, sf_dir).select("vec_id", "embedding")
    base = emb.unionByName(_semdedup_probe_embeddings(emb))
    cent = fixture_centroids(spark, dim=64, n_centroids=8)
    return semdedup(base, cent, threshold=0.95)


def _sql_semdedup(dim: int = 64, n_centroids: int = 8) -> str:
    from harvesttext_spark.operators.semdedup import semdedup_sql
    from harvesttext_spark.operators.similarity import _hyperplane

    cent_rows = ", ".join(
        "({}, [{}]::DOUBLE[])".format(
            j, ", ".join(repr(x) for x in _hyperplane(dim, 9000 + j))
        )
        for j in range(n_centroids)
    )
    base = """SELECT vec_id, embedding FROM embeddings
UNION ALL
SELECT vec_id + 9000001 AS vec_id,
       CASE WHEN vec_id = 0 THEN embedding
            WHEN vec_id = 1 THEN list_transform(embedding, x -> CAST(x * 2.0 AS FLOAT))
            WHEN vec_id = 2 THEN list_transform(embedding, x -> CAST(-x AS FLOAT))
            ELSE [CAST(10.0 AS FLOAT)] || embedding[2:] END AS embedding
FROM embeddings WHERE vec_id < 4"""
    return semdedup_sql(base, cent_rows, threshold=0.95)


def q_pq_topk(spark, sf_dir):
    """Product-quantization ANN (rows-only: the trained per-subspace
    codebooks are not SQL-expressible — the same honest split as the
    trained IVF path; a pure-numpy reference implementation is pinned
    row-for-row in pytest, plus recall + determinism bounds).  Encoding
    is one zero-shuffle Arrow pass; ADC scoring gathers n_sub lookup
    table entries per code row with batch-local top-k."""
    from harvesttext_spark.operators.pq import (
        pq_encode,
        pq_topk,
        train_pq_codebooks,
    )

    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cb = train_pq_codebooks(emb, dim=64, n_sub=8, k_codes=16, sample=1000, seed=7)
    out = pq_topk(pq_encode(emb, cb), queries, cb, k=5)
    return out.select(
        "query_id", "vec_id", F.round("adc_dist", 4).alias("adc_dist"), "rank"
    )


def q_image_stats(spark, sf_dir):
    """REAL multimodal image stage (rows-only: BMP decoding is binary
    parsing, not SQL): deterministic synth BMP table -> decode ->
    width/height/channel means."""
    from harvesttext_spark.sources.multimodal import (
        decode_image_stats,
        synth_bmp_table,
    )

    out = decode_image_stats(synth_bmp_table(spark, n=40, seed=7))
    return out.select(
        "item_id", "width", "height",
        F.round("mean_r", 4).alias("mean_r"),
        F.round("mean_g", 4).alias("mean_g"),
        F.round("mean_b", 4).alias("mean_b"),
    )


def q_audio_stats(spark, sf_dir):
    """REAL multimodal audio stage (rows-only: WAV decoding is binary
    parsing): deterministic synth PCM table -> decode -> rate/duration/
    rms/peak."""
    from harvesttext_spark.sources.multimodal import (
        decode_audio_stats,
        synth_wav_table,
    )

    out = decode_audio_stats(synth_wav_table(spark, n=40, seed=11))
    return out.select(
        "item_id", "sample_rate", "n_samples",
        F.round("duration_s", 6).alias("duration_s"),
        F.round("rms", 4).alias("rms"),
        "peak",
    )


SUBSTR_PROBES = [
    (3500001, "w1 w2 w3 w4 w5 w6 w7 w8 first occurrence survives intact"),
    (3500002, "lead-in w1 w2 w3 w4 w5 w6 w7 w8 trailing words here"),
    (3500003, "pad1 pad2 pad3 w1 w2 w3 w4 w5 w6 w7 w8 w9 bigger shared run"),
    (3500004, "q1 q2 q3 q4 q5 q6 q7 q8 q1 q2 q3 q4 q5 q6 q7 q8 selfrepeat"),
    (3500005, "short row"),
    (3500006, None),
    # \x0b (vertical tab) separates tokens on the Spark/Java side; RE2's
    # \s EXCLUDES it, so the oracle must use the explicit class
    # '[ \t\n\v\f\r]+' — this probe duplicates 3500001's 8-token run with
    # a \x0b separator and fails the hash match if the tokenizers diverge.
    (3500007, "w1 w2\x0bw3 w4 w5\x0bw6 w7 w8 vertical tab dup of the run"),
]


SPLIT_PROBES = [(9100001,), (9100001,), (9100002,), (None,)]  # dup id + NULL


def q_curation_split(spark, sf_dir):
    """Deterministic train/eval/holdout split (curation primitive): the
    split is a pure function of (id, seed) — salted md5 ppm against
    cumulative fraction boundaries, pure codegen on the scan, no rand()
    and no shuffle, so membership survives any partitioning/resume and
    duplicate ids can never straddle the eval boundary.  Probes pin the
    dup-id and NULL modes."""
    from harvesttext_spark.operators.curation import hash_split

    base = _docs(spark, sf_dir).select("doc_id").unionByName(
        spark.createDataFrame(SPLIT_PROBES, "doc_id bigint")
    )
    return hash_split(
        base, {"train": 0.9, "eval": 0.08, "holdout": 0.02}, id_col="doc_id"
    )


def _sql_curation_split() -> str:
    probes = ", ".join(
        "({})".format("NULL::BIGINT" if i is None else f"{i}::BIGINT")
        for (i,) in SPLIT_PROBES
    )
    # hex -> bigint via the strpos digit fold (the fingerprint/minhash
    # oracle pattern; DuckDB has no conv()): 15 hex digits < 2^60
    return f"""
WITH base AS (SELECT doc_id FROM documents UNION ALL
              SELECT * FROM (VALUES {probes}) v(doc_id)),
h AS (SELECT doc_id,
             CASE WHEN doc_id IS NULL THEN NULL ELSE
               list_reduce(
                 list_transform(
                   list_filter(regexp_split_to_array(
                     substring(md5('42:' || doc_id::VARCHAR), 1, 15), ''),
                     c -> c != ''),
                   c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
                 (a, c) -> a * 16 + c) % 1000000
             END AS ppm
      FROM base)
SELECT doc_id,
       CASE WHEN ppm IS NULL THEN NULL
            WHEN ppm < 900000 THEN 'train'
            WHEN ppm < 980000 THEN 'eval'
            ELSE 'holdout' END AS split
FROM h
"""


DSIR_PROBES = [
    (3950001, None),                     # featureless: logw must be 0
    (3950002, ""),                       # ditto (empty string)
    (3950003, "   \t  "),                # ditto (whitespace only)
    (3950004, "spark"),                  # single token: no bigram features
]


def q_dsir_topk(spark, sf_dir):
    """DSIR importance resampling (Xie et al., NeurIPS 2023): hashed
    word-unigram+bigram models of a TARGET subset (doc_id % 7 == 0) and
    the raw corpus, per-doc log importance weight Σ ln(p_t/p_r), Gumbel
    top-k selection with md5-derived noise — train AND select fully
    value-oracled (the langid_trained pattern: the whole pipeline is md5
    bucket arithmetic + closed-form counts, entirely SQL-expressible).
    logw/gkey rounded to 4 on both sides; selection uses full precision
    (boundary flips would need sub-1e-10 key ties)."""
    from harvesttext_spark.operators.dsir import dsir_topk

    base = _docs(spark, sf_dir).select("doc_id", "text").unionByName(
        _probe_df(spark, DSIR_PROBES, col="text")
    )
    target = base.filter((F.col("doc_id") % 7) == 0)
    # persist: the raw feature stream feeds both the raw-distribution
    # count and the scoring join (langid shared-feature pattern).
    # target_filter: the target is a row-subset of base, so its bucket
    # counts come from FILTERING the persisted stream — no second
    # tokenize pass (r9; value-identical, and exactly how the oracle's
    # `tc` CTE derives it from `fb`)
    return dsir_topk(
        base,
        target,
        k=50,
        persist=True,
        target_filter=lambda c: (c % 7) == 0,
    )


def _sql_dsir_topk() -> str:
    probes = ", ".join(
        "({}::BIGINT, {})".format(i, "NULL::VARCHAR" if t is None else f"'{t}'")
        for i, t in DSIR_PROBES
    )
    # hex -> bigint via the strpos digit fold (langid/curation idiom)
    fold8 = (
        "CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(string_split(substring(md5(f), 1, 8), ''), "
        "c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))), "
        "(a, b) -> a * 16 + b) % 8192 AS INT)"
    )
    fold15 = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(string_split(substring(md5('42:' || doc_id::VARCHAR), 1, 15), ''), "
        "c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))), "
        "(a, b) -> a * 16 + b)"
    )
    return f"""
WITH base AS (SELECT doc_id, text FROM documents UNION ALL
              SELECT * FROM (VALUES {probes}) v(doc_id, text)),
tok AS (SELECT doc_id,
               list_filter(regexp_split_to_array(lower(coalesce(text, '')),
                                                 '[ \t\n\x0B\f\r]+'),
                           t -> t != '') AS toks
        FROM base),
feat AS (
  SELECT doc_id, unnest(toks) AS f FROM tok
  UNION ALL
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(toks) - 1),
                               i -> toks[i] || ' ' || toks[i + 1])) AS f
  FROM tok WHERE len(toks) >= 2
),
fb AS (SELECT doc_id, {fold8} AS bucket FROM feat),
rc AS (SELECT bucket, count(*) AS cr FROM fb GROUP BY 1),
tc AS (SELECT bucket, count(*) AS ct FROM fb WHERE doc_id % 7 = 0 GROUP BY 1),
tots AS (SELECT (SELECT CAST(sum(cr) AS BIGINT) FROM rc) AS r_tot,
                (SELECT CAST(coalesce(sum(ct), 0) AS BIGINT) FROM tc) AS t_tot),
ratio AS (SELECT rc.bucket,
                 ln((coalesce(tc.ct, 0) + 1.0) / (tots.t_tot + 8192.0))
               - ln((rc.cr + 1.0) / (tots.r_tot + 8192.0)) AS logratio
          FROM rc LEFT JOIN tc USING (bucket) CROSS JOIN tots),
w AS (SELECT doc_id, sum(logratio) AS logw FROM fb JOIN ratio USING (bucket)
      GROUP BY 1),
allw AS (SELECT b.doc_id, coalesce(w.logw, 0.0) AS logw
         FROM base b LEFT JOIN w USING (doc_id)),
keyed AS (SELECT doc_id, logw,
                 logw + (-ln(-ln((CAST({fold15} AS DOUBLE) + 0.5)
                                 / 1152921504606846976.0))) AS gkey
          FROM allw),
ranked AS (SELECT doc_id, logw, gkey,
                  row_number() OVER (ORDER BY gkey DESC, doc_id ASC) AS rk
           FROM keyed)
SELECT doc_id, round(logw, 4) AS logw, round(gkey, 4) AS gkey
FROM ranked WHERE rk <= 50
"""


C4_PROBES = [
    (3960001, "Good line with five words here.\nshort line.\nNo terminal punct at all\nAnother good sentence with many words!\nthis line mentions JavaScript code today."),
    (3960002, "A page with braces { in code.\nA proper sentence with enough words?"),
    (3960003, "Lorem Ipsum dolor sit amet filler text."),
    (3960004, None),
    (3960005, ""),
    (3960006, 'He said "this quoted line has enough words"\nTrailing spaces after period with words here.   '),
]


def q_c4_line_filters(spark, sf_dir):
    """C4 cleaning battery (Raffel et al. 2020 §2.2): per-line terminal-
    punct / min-words / javascript rules + page-level brace, lorem-ipsum
    and sentence-count flags — pure codegen riding the scan, value-
    oracled byte-for-byte against a DuckDB mirror of every rule (probes
    isolate each rule; the synthetic corpus is single-line so probes
    carry the multi-line modes)."""
    from harvesttext_spark.functions.c4 import c4_clean

    base = _docs(spark, sf_dir).select("doc_id", "text").unionByName(
        _probe_df(spark, C4_PROBES, col="text")
    )
    return c4_clean(base).select(
        "doc_id", "text_c4", "n_lines", "n_lines_kept", "n_sentences",
        "has_curly", "has_lorem_ipsum",
    )


def _sql_c4_line_filters() -> str:
    from harvesttext_spark.functions.c4 import c4_signals_sql

    probes = ", ".join(
        "({}::BIGINT, {})".format(
            i,
            "NULL::VARCHAR"
            if t is None
            else "'" + t.replace("'", "''").replace("\n", "' || chr(10) || '") + "'",
        )
        for i, t in C4_PROBES
    )
    sig = c4_signals_sql()
    cols = ", ".join(f"{expr} AS {name}" for name, expr in sig.items())
    return (
        "WITH base AS (SELECT doc_id, text FROM documents UNION ALL "
        f"SELECT * FROM (VALUES {probes}) v(doc_id, text)) "
        f"SELECT doc_id, {cols} FROM base"
    )


FW_PROBES = [
    # all-keep page: long, distinct, punct-terminated lines
    (3980001, "This is a good long sentence that ends with a period.\n"
              "Another properly terminated long line follows right here.\n"
              "A third distinct long line carries enough characters too.\n"
              "The fourth long line also terminates with punctuation."),
    # punct-poor page (terminal-punct ratio 0 <= 0.12 -> drop)
    (3980002, "this long line carries plenty of characters but no ending\n"
              "and neither does this second long line of webby filler text\n"
              "nor the third one which also just trails off mid thought\n"
              "the fourth line keeps the pattern going without any stop"),
    # short-line-heavy page (3/4 lines under 30 chars -> 0.75 >= 0.67 -> drop)
    (3980003, "Tiny line.\nAnother tiny.\nStill tiny.\n"
              "Only this final line is long enough to escape the short rule."),
    # duplicated-line-heavy page (repeat chars dominate -> drop)
    (3980004, "This exact boilerplate navigation line repeats three times.\n"
              "This exact boilerplate navigation line repeats three times.\n"
              "This exact boilerplate navigation line repeats three times.\n"
              "One distinct long closing line terminates with punctuation."),
    (3980005, None),
    (3980006, ""),
    # terminal-punct boundary: 1/8 = 0.125 > 0.12 -> keep ...
    (3980007, "Exactly one line of these eight ends with terminal punct.\n"
              "line two stretches well past thirty characters unpunctuated\n"
              "line three stretches well past thirty characters to count\n"
              "line four stretches well past thirty characters unpunctuated\n"
              "line five stretches well past thirty characters to count\n"
              "line six stretches well past thirty characters unpunctuated\n"
              "line seven stretches well past thirty characters to count\n"
              "line eight stretches well past thirty characters unending"),
    # ... while 1/9 = 0.111 <= 0.12 -> drop (same page + one more line)
    (3980008, "Exactly one line of these nine ends with terminal punct.\n"
              "line two stretches well past thirty characters unpunctuated\n"
              "line three stretches well past thirty characters to count\n"
              "line four stretches well past thirty characters unpunctuated\n"
              "line five stretches well past thirty characters to count\n"
              "line six stretches well past thirty characters unpunctuated\n"
              "line seven stretches well past thirty characters to count\n"
              "line eight stretches well past thirty characters unending\n"
              "line nine stretches well past thirty characters unpunctuated"),
    # closing typographic quote counts as terminal; trailing spaces trim
    (3980009, 'He closed with a long spoken line inside curly quotes today”\n'
              "Trailing spaces follow the period of this long line here.   \n"
              "   \n"
              "A third distinct long line carries enough characters too."),
]


def q_fineweb_signals(spark, sf_dir):
    """FineWeb line-wise heuristics (Penedo et al. 2024 §3.6): terminal-
    punct line ratio / short-line ratio / duplicated-line char ratio +
    the page keep decision at the published thresholds (0.12 / 0.67 /
    0.10) — pure codegen riding the scan, every ratio mirrored in the
    DuckDB oracle (probes isolate each rule incl. both sides of the
    0.12 punct boundary; the synthetic corpus is single-line so probes
    carry the multi-line modes)."""
    from harvesttext_spark.functions.fineweb import fineweb_filter

    base = _docs(spark, sf_dir).select("doc_id", "text").unionByName(
        _probe_df(spark, FW_PROBES, col="text")
    )
    return fineweb_filter(base).select(
        "doc_id", "n_lines", "frac_lines_end_punct", "frac_lines_short",
        "frac_chars_dup_lines", "fineweb_keep",
    )


def _sql_fineweb_signals() -> str:
    from harvesttext_spark.functions.fineweb import fineweb_signals_sql

    probes = ", ".join(
        "({}::BIGINT, {})".format(
            i,
            "NULL::VARCHAR"
            if t is None
            else "'" + t.replace("'", "''").replace("\n", "' || chr(10) || '") + "'",
        )
        for i, t in FW_PROBES
    )
    sig = fineweb_signals_sql()
    cols = ", ".join(f"{expr} AS {name}" for name, expr in sig.items())
    return (
        "WITH base AS (SELECT doc_id, text FROM documents UNION ALL "
        f"SELECT * FROM (VALUES {probes}) v(doc_id, text)) "
        f"SELECT doc_id, {cols} FROM base"
    )


def q_pack_sequences(spark, sf_dir):
    """Sequence packing (training-export bin packing): shard by salted
    id-hash, first-fit-decreasing per shard into 256-token bins —
    deterministic on any partitioning, metadata-only shuffle (rows-only:
    FFD's stateful first-fit scan is not SQL-expressible; the pure-python
    row-for-row reference in tests/test_packing.py pins correctness)."""
    from harvesttext_spark.operators.packing import pack_sequences

    d = _docs(spark, sf_dir).select("doc_id", "text")
    return pack_sequences(d, max_tokens=256, n_shards=16).select(
        "doc_id", "pack_shard", "pack_bin", "pack_tokens", "oversize"
    )


MOJI_PROBES = [
    (3700001, "CafÃ© au lait â€” itâ€™s good"),
    (3700002, "clean text stays byte-identical"),
    (3700003, "quotes: â€œhiâ€\x9d and â€¦ and â‚¬99"),   # sloppy 0x9D + 3-byte family
    (3700004, "double-encoded: ÃƒÂ© lands on e-acute"),
    (3700005, "espaÃ±ol maÃ±ana Â¿quÃ©? Â¡sÃ­!"),
    (3700006, None),
]


def q_mojibake_fix(spark, sf_dir):
    """UTF-8-as-cp1252 mojibake repair (ftfy-class, the C4/CCNet crawl
    pre-fix): a fixed deterministic chain of literal replaces — pure
    whole-stage-codegen string work riding the scan (no UDF, no
    shuffle) — plus the chars-removed metric.  The oracle runs the
    IDENTICAL chain as nested DuckDB replace() calls, so repaired bytes
    and metric are value-checked exactly."""
    from harvesttext_spark.functions.mojibake import (
        fix_mojibake,
        mojibake_chars_fixed,
    )

    base = _docs(spark, sf_dir).select("doc_id", "text").unionByName(
        _probe_df(spark, MOJI_PROBES, col="text")
    )
    return base.select(
        "doc_id",
        fix_mojibake(F.col("text")).alias("text_fixed"),
        mojibake_chars_fixed(F.col("text")).alias("chars_fixed"),
    )


def _sql_mojibake_fix() -> str:
    from harvesttext_spark.functions.mojibake import fix_mojibake_sql

    probes = ", ".join(
        "({}::BIGINT, {})".format(
            i, "NULL" if t is None else "'" + t.replace("'", "''") + "'"
        )
        for i, t in MOJI_PROBES
    )
    fixed = fix_mojibake_sql("text")
    return f"""
WITH base AS (SELECT doc_id, text FROM documents UNION ALL
              SELECT * FROM (VALUES {probes}) v(doc_id, text))
SELECT doc_id, {fixed} AS text_fixed,
       CAST(length(text) - length({fixed}) AS INT) AS chars_fixed
FROM base
"""


PARA_PROBES = [
    (3600001, "alpha one\nshared paragraph here\ntail a"),       # first occurrence
    (3600002, "beta intro\nshared paragraph here\nbeta tail"),   # later: cut
    (3600003, "SHARED PARAGRAPH HERE  \nonly unique stuff"),     # case/trim-normalized dup
    (3600004, "untouched doc\n\nwith empty line"),               # byte-identical, empty line kept
    (3600005, "shared paragraph here"),                          # all paragraphs removed -> ''
    (3600006, None),
]


def q_paragraph_dedup(spark, sf_dir):
    """Corpus-level keep-first paragraph dedup (CCNet rule): every
    occurrence of a duplicated lower(trim)-normalized paragraph except
    the globally first (id, pos) is removed; untouched docs pass through
    byte-identical, all-removed docs become '', NULL stays NULL.  One
    explode + census groupBy on the md5 paragraph key + per-doc removal
    position lists + positional HOF cut (no second explode)."""
    from harvesttext_spark.operators.dedup import drop_duplicate_paragraphs

    base = _docs(spark, sf_dir).select("doc_id", "text").unionByName(
        _probe_df(spark, PARA_PROBES, col="text")
    )
    return drop_duplicate_paragraphs(base).select("doc_id", "text_dedup")


def _sql_paragraph_dedup() -> str:
    probes = ", ".join(
        "({}::BIGINT, {})".format(
            i, "NULL" if t is None else "'" + t.replace("'", "''") + "'"
        )
        for i, t in PARA_PROBES
    )
    return f"""
WITH base AS (SELECT doc_id, text FROM documents UNION ALL
              SELECT * FROM (VALUES {probes}) v(doc_id, text)),
tk AS (SELECT doc_id, string_split(text, chr(10)) AS parr FROM base
       WHERE text IS NOT NULL),
iw AS (SELECT doc_id, parr, unnest(generate_series(1, len(parr))) AS i FROM tk),
paras AS (SELECT doc_id, i - 1 AS pos, parr[i] AS para FROM iw),
ranked AS (SELECT doc_id, pos,
                  row_number() OVER (PARTITION BY lower(trim(para))
                                     ORDER BY doc_id, pos) AS rn,
                  count(*) OVER (PARTITION BY lower(trim(para))) AS cnt
           FROM paras WHERE trim(para) != ''),
dups AS (SELECT doc_id, pos FROM ranked WHERE cnt > 1 AND rn > 1),
affected AS (SELECT DISTINCT doc_id FROM dups),
kept AS (SELECT p.doc_id, p.pos, p.para
         FROM paras p JOIN affected a USING (doc_id)
         LEFT JOIN dups d ON p.doc_id = d.doc_id AND p.pos = d.pos
         WHERE d.doc_id IS NULL),
rebuilt AS (SELECT doc_id, string_agg(para, chr(10) ORDER BY pos) AS txt
            FROM kept GROUP BY doc_id)
SELECT b.doc_id,
       CASE WHEN a.doc_id IS NULL THEN b.text
            ELSE coalesce(rb.txt, '') END AS text_dedup
FROM base b
LEFT JOIN affected a USING (doc_id)
LEFT JOIN rebuilt rb USING (doc_id)
"""


def q_substring_spans(spark, sf_dir):
    """Exact-substring dedup spans (Lee et al. 2022 recast): merged token
    spans covered by k-token windows whose exact content occurs earlier
    in the corpus (keep-first, global doc/pos order).  Window census =
    one zero-shuffle Arrow pass emitting a 3-channel polynomial rolling
    hash per position (O(1)/position, no k-token materialization) + a
    shuffle on the uniform hash triple; span merge is gaps-and-islands
    over the (tiny) duplicate set.  The oracle reproduces every modular
    fold bit-exactly in DuckDB BIGINT arithmetic.
    k=8 here so probes pin every mode (cross-doc, longer-run merge,
    in-doc self repeat, first-occurrence survival); the operator default
    is the paper's 50."""
    from harvesttext_spark.operators.substring_dedup import duplicate_window_spans

    base = _docs(spark, sf_dir).select("doc_id", "text").unionByName(
        _probe_df(spark, SUBSTR_PROBES, col="text")
    )
    return duplicate_window_spans(base, k=8)


def _sql_substring_spans() -> str:
    probes = ", ".join(
        "({}::BIGINT, {})".format(
            i, "NULL" if t is None else "'" + t.replace("'", "''") + "'"
        )
        for i, t in SUBSTR_PROBES
    )
    from harvesttext_spark.operators.substring_dedup import (
        SS_CHAR_BASE,
        SS_MODS,
        SS_WIN_BASE,
    )

    # Per-channel token hash (char fold) and window hash (token-hash
    # fold) — the same modular arithmetic the Spark census vectorizes;
    # list_reduce seeds with the first element, which equals the
    # acc=0 fold since (0*B + x) % m == x for x < m.
    tok_h = ", ".join(
        f"""list_transform(toks, t -> list_reduce(
                  list_transform(list_filter(regexp_split_to_array(t, ''), c -> c != ''),
                                 c -> CAST(ascii(c) AS BIGINT)),
                  (a, c) -> (a * {SS_CHAR_BASE} + c) % {m})) AS h{i + 1}"""
        for i, m in enumerate(SS_MODS)
    )
    win_h = ", ".join(
        f"list_reduce(h{i + 1}[i:i+7], (a, h) -> (a * {SS_WIN_BASE} + h) % {m}) AS k{i + 1}"
        for i, m in enumerate(SS_MODS)
    )
    return f"""
WITH base AS (SELECT doc_id, text FROM documents UNION ALL
              SELECT * FROM (VALUES {probes}) v(doc_id, text)),
tk AS (SELECT doc_id,
              list_filter(regexp_split_to_array(text, '[ \\t\\n\\v\\f\\r]+'), x -> x != '') AS toks
       FROM base),
hs AS (SELECT doc_id, {tok_h}
       FROM tk WHERE len(toks) >= 8),
iw AS (SELECT doc_id, h1, h2, h3, unnest(generate_series(1, len(h1) - 7)) AS i
       FROM hs),
wins AS (SELECT doc_id, i - 1 AS pos, {win_h}
         FROM iw),
ranked AS (SELECT doc_id, pos,
                  row_number() OVER (PARTITION BY k1, k2, k3
                                     ORDER BY doc_id, pos) AS rn,
                  count(*) OVER (PARTITION BY k1, k2, k3) AS cnt
           FROM wins),
dups AS (SELECT doc_id, pos FROM ranked WHERE cnt > 1 AND rn > 1),
isl AS (SELECT doc_id, pos,
               CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
                    OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 8
                    THEN 1 ELSE 0 END AS brk
        FROM dups),
isl2 AS (SELECT doc_id, pos,
                sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                               ROWS UNBOUNDED PRECEDING) AS island
         FROM isl)
SELECT doc_id, CAST(min(pos) AS INT) AS start_tok,
       CAST(max(pos) + 8 AS INT) AS end_tok
FROM isl2 GROUP BY doc_id, island
"""


URL_RISK_PROBES = [
    (3400001, "https://freepornhub.example/xxx/videos"),       # glued: 2 hits
    (3400002, "https://www.sussex.ac.uk/history"),             # 'sussex' -> 1 (why it's a score)
    (3400003, "https://casino-poker.bet/slots?ref=1"),         # 3 hits
    (3400004, "https://plain.example.org/articles/today"),     # 0
    (3400005, "https://dl.example.net/warez/keygen-crack.zip"),  # 3
]


def q_url_risk(spark, sf_dir):
    """RefinedWeb-style URL risk scoring (adult/gambling/pharma/piracy
    keyword battery over the lowercased url) — pure whole-stage-codegen
    column math riding the scan, no join/shuffle; the job thresholds it
    via --max-url-risk.  The documents table has no url column, so the
    oracle derives a deterministic one from (source, doc_id) identically
    in both engines, plus probes pinning glued-keyword and
    false-positive-substring semantics."""
    from harvesttext_spark.functions.urls import url_risk_score

    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example/p/"), F.col("doc_id")
        ).alias("url"),
    )
    base = d.unionByName(_probe_df(spark, URL_RISK_PROBES, col="url"))
    return base.select("doc_id", "url", url_risk_score(F.col("url")).alias("url_risk"))


def _sql_url_risk() -> str:
    from harvesttext_spark.functions.urls import url_risk_score_sql

    probes = ", ".join(
        "({}::BIGINT, '{}')".format(i, u) for i, u in URL_RISK_PROBES
    )
    return (
        "WITH base AS (SELECT doc_id, 'https://' || source || '.example/p/' || "
        "CAST(doc_id AS VARCHAR) AS url FROM documents UNION ALL "
        f"SELECT * FROM (VALUES {probes}) v(doc_id, url)) "
        f"SELECT doc_id, url, {url_risk_score_sql('url')} AS url_risk FROM base"
    )


# benchmark set for the decontamination oracle: one long phrase (6
# 5-gram shingles) + one short row (< n tokens -> whole-text shingle);
# the word-soup corpus can't collide with the English phrases, so corpus
# rows score 0 and the probes pin every hit mode
DECON_BENCH = (
    "the model must not see this exact evaluation sentence ever",
    "tiny eval row",
)

DECON_PROBES = [
    (3300001, "leading words then must not see this exact evaluation text"),
    (3300002, "tiny eval row"),
    (3300003, "prefix tiny eval row suffix"),  # 5 tokens -> 5-gram only: NO hit
    (3300004, "completely unrelated clean probe text here"),
    (3300005, None),
    (3300006, "MUST NOT SEE THIS EXACT evaluation leak in upper case"),
]


def q_contamination_flags(spark, sf_dir):
    """Benchmark decontamination (GPT-3/Pile n-gram overlap rule as an
    engine pipeline stage): per-doc count of distinct case-folded token
    n-grams shared with the benchmark set + a contaminated flag.  The
    benchmark side shingles once and BROADCASTS (eval suites are tiny);
    the corpus side is one scan + broadcast probe; the only shuffle is
    the per-doc hit count.  n=5 here so probes can pin hit modes; the
    job default is the standard 13 (--decontaminate)."""
    from harvesttext_spark.operators.decontamination import contamination_flags

    base = _docs(spark, sf_dir).select("doc_id", "text").unionByName(
        _probe_df(spark, DECON_PROBES, col="text")
    )
    bench = spark.createDataFrame([(t,) for t in DECON_BENCH], "text string")
    return contamination_flags(base, bench, n=5)


def _sql_contamination() -> str:
    probes = ", ".join(
        "({}::BIGINT, {})".format(
            i, "NULL" if t is None else "'" + t.replace("'", "''") + "'"
        )
        for i, t in DECON_PROBES
    )
    bench = ", ".join("('" + t.replace("'", "''") + "')" for t in DECON_BENCH)
    # token_shingles mirror: whitespace tokens, n=5 slices (DuckDB list
    # slicing is 1-based INCLUSIVE), shorter-than-n -> whole-text shingle,
    # per-side dedup (list_distinct / DISTINCT) like array_distinct
    shingle = (
        "CASE WHEN len(toks) >= 5 THEN list_transform(generate_series(1, len(toks) - 4), "
        "i -> array_to_string(toks[i:i+4], ' ')) "
        "ELSE [array_to_string(toks, ' ')] END"
    )
    toks = "list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x != '')"
    return f"""
WITH bench(text) AS (VALUES {bench}),
bsh AS (
  SELECT DISTINCT unnest({shingle}) AS s
  FROM (SELECT {toks} AS toks FROM bench)
  ), bsh2 AS (SELECT s FROM bsh WHERE s != ''),
base AS (SELECT doc_id, text FROM documents UNION ALL
         SELECT * FROM (VALUES {probes}) v(doc_id, text)),
dsh AS (
  SELECT doc_id, unnest(list_distinct({shingle})) AS s
  FROM (SELECT doc_id, {toks} AS toks FROM base)
),
hits AS (
  SELECT doc_id, count(*) AS h FROM dsh JOIN bsh2 USING (s) GROUP BY doc_id
)
SELECT base.doc_id, CAST(coalesce(h, 0) AS BIGINT) AS n_hits,
       coalesce(h, 0) > 0 AS contaminated
FROM base LEFT JOIN hits ON base.doc_id = hits.doc_id
"""


# toxicity lexicon for the oracle: corpus-hitting terms ('slow'/'dup' are
# in the word-soup vocab) + terms only the probes contain; MiXeD case pins
# the lowercase fold
TOX_LEXICON = ("slow", "dup", "Vile", "AWFUL")

TOX_PROBES = [
    (3200001, "vile awful vile words drown the clean ones"),
    (3200002, "perfectly fine prose with zero flagged terms"),
    (3200003, "SLOW Slow slow dup mixed case counts each time"),
    (3200004, "   "),
    (3200005, None),
]


def q_toxicity_score(spark, sf_dir):
    """Toxic-term density per document (north rule: 'PII/toxicity-scrub'
    — SURVEY §2.6's lexicon scoring as a quality-filter stage): |tokens
    in lexicon| / |tokens|, multiset, case-folded, whitespace tokens.
    ONE Arrow-batched per-row map, zero shuffle (operators/sentiment.py
    toxicity_udf); the job applies it via --max-toxicity."""
    from harvesttext_spark.operators.sentiment import toxicity_score

    base = _docs(spark, sf_dir).select("doc_id", "text").unionByName(
        _probe_df(spark, TOX_PROBES, col="text")
    )
    return toxicity_score(base, TOX_LEXICON).select(
        "doc_id", F.round("toxicity", 6).alias("toxicity")
    )


def _sql_toxicity_score() -> str:
    probes = ", ".join(
        "({}::BIGINT, {})".format(
            i, "NULL" if t is None else "'" + t.replace("'", "''") + "'"
        )
        for i, t in TOX_PROBES
    )
    terms = ", ".join("'" + t.lower() + "'" for t in TOX_LEXICON)
    return f"""
WITH base AS (SELECT doc_id, text FROM documents UNION ALL
              SELECT * FROM (VALUES {probes}) v(doc_id, text)),
tok AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t != '')) AS t
  FROM base
),
agg AS (
  SELECT doc_id, count(*) AS n,
         sum(CASE WHEN t IN ({terms}) THEN 1 ELSE 0 END) AS h
  FROM tok GROUP BY doc_id
)
SELECT base.doc_id, round(CAST(h AS DOUBLE) / n, 6) AS toxicity
FROM base LEFT JOIN agg ON base.doc_id = agg.doc_id
"""


def q_domain_drop_samples(spark, sf_dir):
    """Deterministic per-domain drop triage (round 4): the k=3 smallest-
    md5(url) dropped pages per domain via salted two-level partial top-k
    (map-side state bounded at k per salt — the non-algebraic aggregate
    shape the domain metrics tables grow at 100 TB).  Urls synthesized
    over 7 domains from doc_id; labels from the real quality_filter
    cascade; full DuckDB oracle (row_number over md5 mirror)."""
    from harvesttext_spark.pipeline.quality_filter import (
        domain_drop_samples,
        quality_filter,
    )

    d = _docs(spark, sf_dir).select("doc_id", "text")
    pages = d.select(
        F.concat(
            F.lit("https://d"), F.col("doc_id") % 7, F.lit(".example/p/"), F.col("doc_id")
        ).alias("url"),
        F.lit(None).cast("binary").alias("html"),
        F.col("text"),
    )
    return domain_drop_samples(quality_filter(pages), k=3)


def _sql_domain_drop_samples() -> str:
    c = _sql_clean_chain("text")
    return f"""
WITH cleaned AS (
  SELECT 'https://d' || (doc_id % 7) || '.example/p/' || doc_id AS url,
         'd' || (doc_id % 7) || '.example' AS domain,
         {c} AS text_clean
  FROM documents
),
sig AS (
  SELECT url, domain, text_clean,
         length(text_clean) AS n_chars,
         (length(text_clean) - length(regexp_replace(text_clean, '[A-Za-z0-9\\x{{4e00}}-\\x{{9fff}}]', '', 'g')))
           / greatest(length(text_clean), 1) AS alnum_ratio,
         list_filter(regexp_split_to_array(text_clean, '\\s+'), x -> x != '') AS toks,
         len(list_filter(list_distinct(string_split(text_clean, '')),
                         ch -> ch != '' AND contains(text_clean, repeat(ch, 10)))) > 0 AS char_run10
  FROM cleaned
),
lab AS (
  SELECT url, domain,
         CASE WHEN text_clean IS NULL THEN 'null_text'
              WHEN n_chars < 20 THEN 'too_short'
              WHEN char_run10 THEN 'char_run'
              WHEN alnum_ratio < 0.45 THEN 'low_alnum'
              WHEN len(toks) >= 20 AND len(list_distinct(toks)) * 1.0 / greatest(len(toks), 1) < 0.30
                   THEN 'low_diversity'
              ELSE NULL END AS drop_reason
  FROM sig
),
ranked AS (
  SELECT domain, url, drop_reason,
         row_number() OVER (PARTITION BY domain ORDER BY md5(url), url) - 1 AS rnk
  FROM lab WHERE drop_reason IS NOT NULL
)
SELECT domain, CAST(rnk AS INT) AS rnk, url, drop_reason FROM ranked WHERE rnk < 3
"""


def q_cut_sentences(spark, sf_dir):
    from harvesttext_spark.functions.sentences import explode_sentences

    out = explode_sentences(_docs(spark, sf_dir))
    return out.select(
        "doc_id", F.col("sent_id").cast("int").alias("sent_id"), "sentence"
    )


# the zh splitter is 4 regex passes + split — fully DuckDB-expressible
# (verified byte-exact on all sf0.01 docs), so this is a value oracle for
# the pandas-UDF path, not a rows-only check.
SQL_CUT_SENTENCES = r"""
WITH s1 AS (
  SELECT doc_id,
    regexp_replace(text, '([。！？?!])([^”’)\]）】])', '\1' || chr(10) || '\2', 'g') AS t
  FROM documents
), s2 AS (
  SELECT doc_id, regexp_replace(t, '(\.{3,})([^”’)\]）】….])', '\1' || chr(10) || '\2', 'g') AS t FROM s1
), s3 AS (
  SELECT doc_id, regexp_replace(t, '(…+)([^”’)\]）】….])', '\1' || chr(10) || '\2', 'g') AS t FROM s2
), s4 AS (
  SELECT doc_id, regexp_replace(t, '([。！？?!]|\.{3,}|…+)([”’)\]）】])([^，。！？?….])', '\1\2' || chr(10) || '\3', 'g') AS t FROM s3
), cut AS (
  SELECT doc_id,
    list_filter(
      list_transform(string_split(rtrim(t, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), chr(10)),
                     x -> trim(x, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11))),
      x -> x != '') AS sents
  FROM s4
)
SELECT doc_id, CAST(s.sent_id AS INT) AS sent_id, s.sentence AS sentence
FROM (
  SELECT doc_id,
         unnest(list_transform(sents, (x, i) -> struct_pack(sent_id := i - 1, sentence := x))) AS s
  FROM cut
)
"""


def q_seg_tokens(spark, sf_dir):
    """seg over the (KB-less) documents table, EXPLODED to sortable scalars
    (doc_id, pos, word) — array columns break the driver's canonical sort.
    With no KB the cutter is exactly the _FALLBACK_TOKEN regex + strip
    filter, which DuckDB regexp_extract_all reproduces (full oracle)."""
    from harvesttext_spark.functions.tokenize import seg_documents

    segged = seg_documents(
        _docs(spark, sf_dir).filter(F.col("doc_id") < 100), cutter="regex"
    )
    return segged.select(
        "doc_id", F.posexplode("words").alias("pos", "word")
    ).select("doc_id", F.col("pos").cast("int").alias("pos"), "word")


SQL_SEG_TOKENS = """
WITH t AS (
  SELECT doc_id,
         list_filter(
           regexp_extract_all(text,
             '[A-Za-z]+(?:''[A-Za-z]+)?|[0-9]+(?:\\.[0-9]+)?|[一-鿿]|\\s+|.'),
           x -> trim(x, ' \t\n\r\f\v') != '') AS toks
  FROM documents WHERE doc_id < 100
)
SELECT doc_id, CAST(s.pos AS INT) AS pos, s.word AS word
FROM (
  SELECT doc_id,
         unnest(list_transform(toks, (x, i) -> struct_pack(pos := i - 1, word := x))) AS s
  FROM t
)
"""


def q_texttile_paragraphs(spark, sf_dir):
    from harvesttext_spark.operators.texttile import cut_paragraphs

    return cut_paragraphs(
        _docs(spark, sf_dir).filter(F.col("doc_id") < 50), align_boundary=False
    )


def q_summarize(spark, sf_dir):
    from harvesttext_spark.operators.graph import summarize

    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 50)
    # documents are single-"sentence" word soups: treat 20-token windows as
    # pseudo-sentences to exercise the operator shape
    sent = d.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.greatest(
                        (F.size(tokens_col(F.col("text"))) / 20).cast("int") - 1,
                        F.lit(0),
                    ),
                ),
                lambda i: F.array_join(
                    F.slice(tokens_col(F.col("text")), i * 20 + 1, 20), " "
                ),
            )
        ).alias("sent_id", "sentence"),
    ).withColumn("words", tokens_col(F.col("sentence")))
    return summarize(sent, top_k=2)


_DEMO_KB_TRIPLES = [
    ("spark", "apache_spark", "engine"),
    ("flink", "apache_flink", "engine"),
    ("hash join", "hash_join", "operator"),
    ("merge join", "merge_join", "operator"),
    ("sort merge", "sort_merge", "operator"),
    ("window", "window_op", "operator"),
    ("customer", "customer_table", "table"),
    ("lineitem", "lineitem_table", "table"),
]


def q_entity_linking(spark, sf_dir):
    """Dictionary entity linking over the documents corpus with a demo KB
    (rows-only: longest-match scan is not SQL-expressible)."""
    from harvesttext_spark.operators.linking import EntityKB, link_entities

    kb = EntityKB.from_triples(_DEMO_KB_TRIPLES)
    out = link_entities(_docs(spark, sf_dir), kb)
    return out.select(
        "doc_id", F.explode("entities").alias("e")
    ).select("doc_id", "e.l", "e.r", "e.entity", "e.type")


# Chain-replace mirror of the AC leftmost-longest scan over
# _DEMO_KB_TRIPLES.  Equivalence holds because the only overlapping
# mention pair in the KB is ("sort merge", "merge join") — in any text
# containing "sort merge join" the leftmost-longest scan links
# "sort merge", so the chain applies "sort merge" FIRST; every other
# pair of mentions cannot overlap in text (no mention's proper suffix is
# another's prefix), and no placeholder contains a mention.  The general
# AC scan and a chain CAN diverge on pathological overlaps outside this
# KB (e.g. "customerge join" with mentions customer + merge join) —
# tests/test_entry_contract.py re-verifies row-for-row equality of
# scrub_text vs this chain on the real tables + probes.
_SCRUB_CHAIN = [
    ("sort merge", "#operator#"),
    ("merge join", "#operator#"),
    ("hash join", "#operator#"),
    ("customer", "#table#"),
    ("lineitem", "#table#"),
    ("window", "#operator#"),
    ("spark", "#engine#"),
    ("flink", "#engine#"),
]

SCRUB_PROBES = [
    (3100001, "spark beats flink at the hash join and the merge join"),
    (3100002, "sort merge join resolves to the leftmost longest match"),
    (3100003, "customer lineitem window table scan plan"),
    (3100004, "windowindow glued run and spark spark repeated"),
    (3100005, "no dictionary mentions in this row at all"),
]


def q_scrub_text(spark, sf_dir):
    """Sensitive-term scrub (north rule: 'sensitive-word/PII scrub ...
    broadcast Aho-Corasick automata'): every KB dictionary match replaced
    by its #type# placeholder via the real AC leftmost-longest scan
    (reference decoref semantics, harvesttext.py:547-555) inside one
    Arrow-batched mapInPandas pass.  Value-oracled against the
    chain-replace mirror (_SCRUB_CHAIN) — see the equivalence note there."""
    from harvesttext_spark.operators.linking import EntityKB, scrub_text

    kb = EntityKB.from_triples(_DEMO_KB_TRIPLES)
    base = _docs(spark, sf_dir).select("doc_id", "text").unionByName(
        _probe_df(spark, SCRUB_PROBES, col="text")
    )
    return scrub_text(base, kb).select("doc_id", "text_scrubbed")


def _sql_scrub_text() -> str:
    probes = ", ".join(
        "({}::BIGINT, '{}')".format(i, t.replace("'", "''")) for i, t in SCRUB_PROBES
    )
    c = "text"
    for mention, placeholder in _SCRUB_CHAIN:
        c = f"replace({c}, '{mention}', '{placeholder}')"
    return (
        "WITH base AS (SELECT doc_id, text FROM documents UNION ALL "
        f"SELECT * FROM (VALUES {probes}) v(doc_id, text)) "
        f"SELECT doc_id, {c} AS text_scrubbed FROM base"
    )


def q_langid_trained(spark, sf_dir):
    """Hashed char-trigram NB language ID trained on the documents table's
    own labels, scored back over it (rows-only: the 16k-bucket weight
    pipeline is expressible but impractically slow in the oracle)."""
    from harvesttext_spark.operators.langid_model import (
        _feature_rows,
        predict_from_features,
        train_langid,
    )

    d = _docs(spark, sf_dir)
    # one shared feature extraction for train AND predict (same corpus)
    feats = _feature_rows(d, "text", ["doc_id", "lang"]).cache()
    weights, stats = train_langid(
        d, feats=feats, persist=True, n_docs=_raw_count(spark, sf_dir)
    )
    out = predict_from_features(feats.select("doc_id", "bucket"), weights, stats)
    return out.select("doc_id", "lang_pred", F.round("margin", 4).alias("margin"))


# FULL value oracle: the hashed-trigram NB is md5-bucket arithmetic plus
# closed-form counts — entirely SQL-expressible.  Score sums are doubles;
# margin is rounded to 4 decimals on both sides (wobble ~1e-10, far below
# the rounding grain; argmax flips would need a sub-1e-10 score tie).
SQL_LANGID_TRAINED = """
WITH d AS (SELECT doc_id, lang, lower(text) AS lt FROM documents),
tri AS (
  SELECT doc_id, lang,
         unnest(list_transform(generate_series(1, least(length(lt) - 2, 300)),
                               i -> substring(lt, i, 3))) AS tri
  FROM d WHERE length(lt) >= 3
  UNION ALL
  SELECT doc_id, lang, lt AS tri FROM d WHERE length(lt) < 3
),
feats AS (
  SELECT doc_id, lang,
         CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(string_split(substring(md5(tri), 1, 8), ''),
                               c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))),
              (a, b) -> a * 16 + b) % 16384 AS INT) AS bucket
  FROM tri
),
counts AS (SELECT lang, bucket, count(*) AS c FROM feats GROUP BY 1, 2),
lang_tot AS (SELECT lang, sum(c) AS tot FROM counts GROUP BY 1),
weights AS (
  SELECT lang, bucket, ln((c + 1.0) / (tot + 16384)) AS logp
  FROM counts JOIN lang_tot USING (lang)
),
nd AS (SELECT lang, count(*) AS nd FROM documents GROUP BY 1),
n AS (SELECT count(*) AS n FROM documents),
stats AS (
  SELECT lang, ln(nd * 1.0 / n.n) AS prior, ln(1.0 / (tot + 16384)) AS default_logp
  FROM nd JOIN lang_tot USING (lang) CROSS JOIN n
),
sizes AS (SELECT doc_id, count(*) AS n_feats FROM feats GROUP BY 1),
matched AS (
  SELECT f.doc_id, w.lang, sum(w.logp) AS s, count(*) AS m
  FROM feats f JOIN weights w ON f.bucket = w.bucket
  GROUP BY 1, 2
),
scored AS (
  SELECT z.doc_id, st.lang,
         st.prior + coalesce(m.s, 0) + (z.n_feats - coalesce(m.m, 0)) * st.default_logp AS score
  FROM sizes z CROSS JOIN stats st
  LEFT JOIN matched m ON m.doc_id = z.doc_id AND m.lang = st.lang
),
ranked AS (
  SELECT doc_id, lang, score,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang ASC) AS rk
  FROM scored
)
SELECT doc_id,
       max(CASE WHEN rk = 1 THEN lang END) AS lang_pred,
       round(max(CASE WHEN rk = 1 THEN score END)
             - coalesce(max(CASE WHEN rk = 2 THEN score END),
                        max(CASE WHEN rk = 1 THEN score END)), 4) AS margin
FROM ranked GROUP BY doc_id
"""


# scoring-side probes for the quality classifier (training uses ONLY the
# documents table so probes can't shift the model): empty + NULL text pin
# the bare-prior path; the two word-soup rows pin a confident positive
# (English function words) and negative (Spanish function words)
QC_PROBES = [
    (4000001, ""),
    (4000002, None),
    (4000003, "the of and to is in that it for was the of and to is"),
    (4000004, "el la los las de que y en un una el la los las de"),
]


def q_quality_classifier(spark, sf_dir):
    """Supervised quality classifier (CCNet/fastText shape, Wenzek et al.
    2020 §4.3 recast as binomial NB — operators/quality_classifier.py):
    hashed word uni+bigram buckets, closed-form LLR training, broadcast
    score join.  Demonstrated here as distillation on a deterministic
    binary label (lang = 'en' — any boolean column works; the job stage
    trains on the cascade's own keep flag).  FULL value oracle: the
    whole train+score pipeline is md5-bucket arithmetic plus counts
    (the langid_trained pattern)."""
    from harvesttext_spark.operators.quality_classifier import (
        score_quality,
        train_quality_classifier,
    )

    d = _docs(spark, sf_dir)
    # class counts off the raw scan (label column only, no repartition);
    # persist=True: the totals collect AND the broadcast weight build both
    # consume the bucket counts — without it the full gram extraction runs
    # TWICE per invocation (measured; the langid shared-feature pattern)
    cc = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .groupBy()
        .agg(
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)),
            F.sum(F.when(~(F.col("lang") == "en"), 1).otherwise(0)),
        )
        .collect()[0]
    )
    weights, params = train_quality_classifier(
        d.select((F.col("lang") == "en").alias("label"), "text"),
        label_col="label",
        persist=True,
        class_counts=(int(cc[0] or 0), int(cc[1] or 0)),
    )
    base = d.select("doc_id", "text").unionByName(
        _probe_df(spark, QC_PROBES, col="text")
    )
    out = score_quality(base, weights, params)
    return out.select(
        "doc_id",
        "quality_lodds",
        "quality_prob",
        (F.col("quality_lodds") >= 0).alias("quality_keep"),
    )


def _sql_quality_classifier() -> str:
    """DuckDB mirror of the ENTIRE train+score pipeline: same explicit
    whitespace class, same md5 bucketing, same +1/B smoothing, same
    unseen-bucket default mass, same 4/6-decimal rounding grain."""
    probes = ", ".join(
        "({}::BIGINT, {})".format(
            i, "NULL::VARCHAR" if t is None else "'" + t.replace("'", "''") + "'"
        )
        for i, t in QC_PROBES
    )
    B = 1 << 16
    ws = (
        "list_filter(regexp_split_to_array(lower(text), "
        "'[ \t\n\x0b\f\r]+'), x -> x != '')[1:200]"
    )
    bucket = (
        "CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(string_split(substring(md5(g), 1, 8), ''), "
        "c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))), "
        f"(a, b) -> a * 16 + b) % {B} AS INT)"
    )
    return f"""
WITH d AS (SELECT doc_id, (lang = 'en') AS lab, {ws} AS ws FROM documents),
tg AS (
  SELECT lab, unnest(ws) AS g FROM d
  UNION ALL
  SELECT lab, ws[i] || '_' || ws[i + 1] AS g
  FROM (SELECT lab, ws, unnest(generate_series(1, len(ws) - 1)) AS i
        FROM d WHERE len(ws) >= 2)
),
tf AS (SELECT lab, {bucket} AS bucket FROM tg),
counts AS (
  SELECT bucket,
         sum(CASE WHEN lab THEN 1 ELSE 0 END) AS cp,
         sum(CASE WHEN NOT lab THEN 1 ELSE 0 END) AS cn
  FROM tf GROUP BY 1
),
tots AS (SELECT sum(cp) AS tp, sum(cn) AS tn FROM counts),
nd AS (
  SELECT sum(CASE WHEN lab THEN 1 ELSE 0 END) AS np,
         sum(CASE WHEN NOT lab THEN 1 ELSE 0 END) AS nn
  FROM d
),
weights AS (
  SELECT bucket, ln((cp + 1.0) / (tp + {B})) - ln((cn + 1.0) / (tn + {B})) AS llr
  FROM counts CROSS JOIN tots
),
params AS (
  SELECT ln(np * 1.0 / nn) AS prior, ln((tn + {B} * 1.0) / (tp + {B})) AS dflt
  FROM nd CROSS JOIN tots
),
sbase AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT * FROM (VALUES {probes}) v(doc_id, text)
),
sd AS (SELECT doc_id, {ws} AS ws FROM sbase),
sg AS (
  SELECT doc_id, unnest(ws) AS g FROM sd
  UNION ALL
  SELECT doc_id, ws[i] || '_' || ws[i + 1] AS g
  FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 1)) AS i
        FROM sd WHERE len(ws) >= 2)
),
sf AS (SELECT doc_id, {bucket} AS bucket FROM sg),
scored AS (
  SELECT f.doc_id, sum(coalesce(w.llr, p.dflt)) AS s
  FROM sf f LEFT JOIN weights w USING (bucket) CROSS JOIN params p
  GROUP BY 1
)
SELECT b.doc_id,
       round(p.prior + coalesce(s.s, 0), 4) AS quality_lodds,
       round(1.0 / (1.0 + exp(-(p.prior + coalesce(s.s, 0)))), 6) AS quality_prob,
       (round(p.prior + coalesce(s.s, 0), 4) >= 0) AS quality_keep
FROM sbase b CROSS JOIN params p LEFT JOIN scored s ON b.doc_id = s.doc_id
"""


# tiny planted domains pinning the empirical-Bayes pull-to-mean: 2/2
# kept must land near the global rate (not 1.0), 0/2 near it from below,
# 1/2 almost exactly on it
DR_PROBES = [
    ("probe_small_good", True),
    ("probe_small_good", True),
    ("probe_small_bad", False),
    ("probe_small_bad", False),
    ("probe_mixed", True),
    ("probe_mixed", False),
]


def q_domain_reputation(spark, sf_dir):
    """Domain-reputation shrinkage (operators/domain_reputation.py):
    per-domain Beta-Binomial posterior keep-rate — raw rate shrunk
    toward the global rate by κ=20 pseudo-pages — plus the ≥0.5
    threshold decision.  Keep signal here is the deterministic
    n_chars ≥ 300 proxy over the documents table's source domains;
    planted 2-page probe domains pin the pull-to-mean.  FULL value
    oracle (one groupBy + scalar totals — trivially SQL)."""
    from harvesttext_spark.operators.domain_reputation import domain_reputation

    vals = ", ".join(
        "('{}', {})".format(d, "true" if k else "false") for d, k in DR_PROBES
    )
    probe = spark.sql(f"SELECT domain, k FROM (VALUES {vals}) AS t(domain, k)")
    base = _docs(spark, sf_dir).select(
        F.col("source").alias("domain"), (F.col("n_chars") >= 300).alias("k")
    ).unionByName(probe)
    out = domain_reputation(base, domain_col="domain", keep_col="k")
    return out.select(
        "domain", "n_pages", "n_keep", "raw_rate", "shrunk_rate",
        (F.col("shrunk_rate") >= 0.5).alias("reputation_keep"),
    )


def _sql_domain_reputation() -> str:
    from harvesttext_spark.operators.domain_reputation import (
        domain_reputation_sql,
    )

    vals = ", ".join(
        "('{}', {})".format(d, "true" if k else "false") for d, k in DR_PROBES
    )
    base = (
        "SELECT source AS domain, (n_chars >= 300) AS k FROM documents "
        f"UNION ALL SELECT * FROM (VALUES {vals}) v(domain, k)"
    )
    inner = domain_reputation_sql(base)
    return (
        f"WITH rep AS ({inner}) "
        "SELECT domain, n_pages, n_keep, raw_rate, shrunk_rate, "
        "(shrunk_rate >= 0.5) AS reputation_keep FROM rep"
    )


# scoring-side probes for the edu scorer: empty/NULL text must score the
# occurrence mean, as must gibberish whose buckets carry no training mass
# (collisions with trained buckets are fine — both engines hash alike);
# the common-word probe exercises the trained-bucket path
EDU_PROBES = [
    (5000001, ""),
    (5000002, None),
    (5000003, "zzqx vvwp qqjj kkzz unseen gibberish tokens nowhere else"),
    (5000004, "the quick brown fox jumps over the lazy dog and the river"),
    # vocabulary planted by EDU_TRAIN_PROBES: the synthetic corpus draws
    # every lang from ONE shared word pool, so real columns cannot
    # separate — these pin a high-teacher page (keep) and a low-teacher
    # page (drop), exercising both decision branches and the graded ints
    (5000005, "lemma " * 50),
    (5000006, "jackpot " * 50),
]

# planted TRAINING rows (teacher, text): distinctive repeated vocabulary
# whose bucket counts (200 unigram + 199 bigram occurrences each) beat
# the m=100 smoothing pull, giving the planted buckets means near their
# teachers — (cnt*t + m*mu)/(cnt + m)
EDU_TRAIN_PROBES = [
    (5.0, "lemma " * 200),
    (5.0, "theorem " * 200),
    (0.0, "jackpot " * 200),
    (0.0, "viagra " * 200),
]


def q_edu_score(spark, sf_dir):
    """FineWeb-Edu-style scored distillation (operators/edu_scorer.py):
    a continuous 0-5 teacher column is distilled into a smoothed
    target-encoding over the classifier's hashed word uni+bigram
    buckets, then every page gets a graded edu_score / edu_int /
    keep-at-3 decision (Penedo et al. 2024's scored variant of the
    binary classifier).  Teacher here is the deterministic
    content-correlated proxy 5.0 for target-domain (en) pages / 1.0
    elsewhere — any bounded score column works, and a content signal
    (unlike a length proxy) gives the bucket means real spread, so the
    scored output exercises BOTH keep branches and a range of edu_int
    grades.  FULL value oracle (integer ppm sums -> no float-order
    wobble in training)."""
    from harvesttext_spark.operators.edu_scorer import (
        score_edu,
        train_edu_scorer,
    )

    d = _docs(spark, sf_dir)
    tvals = ", ".join(f"({t}, '{txt}')" for t, txt in EDU_TRAIN_PROBES)
    tprobes = spark.sql(
        "SELECT CAST(t AS DOUBLE) AS teacher, txt AS text "
        f"FROM (VALUES {tvals}) v(t, txt)"
    )
    train = d.select(
        F.when(F.col("lang") == "en", F.lit(5.0)).otherwise(F.lit(1.0)).alias(
            "teacher"
        ),
        "text",
    ).unionByName(tprobes)
    # persist=True: totals collect + bucket-score broadcast build share one
    # materialized counts table instead of re-extracting grams twice
    scores, params = train_edu_scorer(train, persist=True)
    base = d.select("doc_id", "text").unionByName(
        _probe_df(spark, EDU_PROBES, col="text")
    )
    return score_edu(base, scores, params)


def _sql_edu_score() -> str:
    from harvesttext_spark.operators.edu_scorer import edu_scorer_sql

    probes = ", ".join(
        "({}::BIGINT, {})".format(
            i, "NULL::VARCHAR" if t is None else "'" + t.replace("'", "''") + "'"
        )
        for i, t in EDU_PROBES
    )
    tvals = ", ".join(f"({t}, '{txt}')" for t, txt in EDU_TRAIN_PROBES)
    return edu_scorer_sql(
        train_select=(
            "SELECT CASE WHEN lang = 'en' THEN 5.0 ELSE 1.0 END AS teacher, "
            "text FROM documents "
            f"UNION ALL SELECT CAST(t AS DOUBLE), txt FROM (VALUES {tvals}) v(t, txt)"
        ),
        score_select=(
            "SELECT doc_id, text FROM documents "
            f"UNION ALL SELECT * FROM (VALUES {probes}) v(doc_id, text)"
        ),
    )


def q_ppl_buckets(spark, sf_dir):
    """CCNet head/middle/tail perplexity terciles per language
    (operators/lm_perplexity.py ppl_buckets, Wenzek et al. 2020 §4.4):
    the self-trained bigram LM's per-doc perplexity percent-ranked
    within each lang and cut at 1/3, 2/3.  Rows-only in the driver
    contract (prefix full); contract-grade value compare in
    tests/test_lm_langid.py::test_ppl_buckets_sql_parity wraps the
    lm_perplexity oracle SQL with the same window."""
    from harvesttext_spark.operators.lm_perplexity import ppl_buckets

    base = q_lm_perplexity(spark, sf_dir).select("doc_id", "ppl")
    langs = _docs(spark, sf_dir).select("doc_id", "lang")
    return ppl_buckets(base.join(langs, "doc_id"), group_col="lang")


MIXTURE_TARGET = {"en": 0.5, "zh": 0.2, "de": 0.15, "es": 0.1, "fr": 0.05}


def q_mixture_sample(spark, sf_dir):
    """Static mixture sampling (operators/mixture.py): down-sample the
    documents table to an exact target language composition via the
    salted-md5 ppm rule (curation machinery) — T = min_g n_g/t_g, each
    group keeps at t_g*T/n_g.  Rows-only in the driver contract
    (prefix full); the contract-grade value compare lives in
    tests/test_mixture.py::test_mixture_sql_parity."""
    from harvesttext_spark.operators.mixture import sample_to_mixture

    d = _docs(spark, sf_dir).select("doc_id", "lang")
    out = sample_to_mixture(
        d, MIXTURE_TARGET, group_col="lang", id_col="doc_id"
    )
    return out.select("doc_id", "lang", "mix_ppm", "mix_copies", "mix_keep")


def q_classifier_calibration(spark, sf_dir):
    """Reliability diagram of the distilled quality classifier
    (operators/quality_classifier.py calibration_curve): per probability
    bin, how often the 'en' label actually holds vs the mean predicted
    probability.  Rows-only in the driver contract (prefix full); the
    contract-grade value compare lives in tests/test_quality_classifier
    .py::test_calibration_sql_parity over the composed classifier+bin
    SQL."""
    from harvesttext_spark.operators.quality_classifier import (
        calibration_curve,
    )

    scored = q_quality_classifier(spark, sf_dir)
    # the en/es stopword probes DO have ground truth (their text is the
    # label signal itself) — labeling them occupies the high-prob bin
    # the word-soup corpus never reaches (its lang column is
    # uncorrelated with text, so corpus probs collapse near 0: itself
    # the calibration story this curve exists to expose)
    labels = _docs(spark, sf_dir).select(
        "doc_id", (F.col("lang") == "en").alias("label")
    ).unionByName(
        spark.sql(
            "SELECT CAST(doc_id AS BIGINT) AS doc_id, label FROM (VALUES "
            "(4000003, true), (4000004, false)) t(doc_id, label)"
        )
    )
    return calibration_curve(scored.join(labels, "doc_id"))


def q_pack_epochs(spark, sf_dir):
    """Mixture-aware epoch packing (operators/packing.pack_epochs, round
    8): deterministic per-doc copy counts (1 + doc_id % 3) stand in for
    mixture max_repeat up-sampling; one (doc, mix_copy) pack slot per
    row, the copy ORDINAL salted into the deterministic shard hash so
    epochs spread across bins.  Rows-only (FFD's stateful first-fit scan
    is not SQL-expressible — the pack_sequences precedent); per-copy
    membership + capacity invariant + partition-invariance pinned in
    tests/test_packing.py."""
    from harvesttext_spark.operators.packing import pack_epochs

    d = _docs(spark, sf_dir).select(
        "doc_id",
        "text",
        (F.lit(1) + F.col("doc_id") % 3).cast("int").alias("copies"),
    )
    return pack_epochs(
        d, max_tokens=256, copies_col="copies", n_shards=16
    )


def q_classifier_calibrated(spark, sf_dir):
    """Isotonic recalibration of the distilled classifier (round 8,
    operators/quality_classifier.train_isotonic_calibrator +
    apply_calibration): integer-count PAV over the fixed-width 64-bin
    log-odds histogram on the same labels classifier_calibration uses,
    broadcast back as quality_prob_cal.  Rows-only (PAV's sequential
    pooling is not SQL-expressible); pinned against a textbook
    weighted-PAV reference plus monotonicity/ECE/determinism tests in
    tests/test_quality_classifier.py."""
    from harvesttext_spark.operators.quality_classifier import (
        apply_calibration,
        train_isotonic_calibrator,
    )

    scored = q_quality_classifier(spark, sf_dir)
    labels = _docs(spark, sf_dir).select(
        "doc_id", (F.col("lang") == "en").alias("label")
    )
    calib = train_isotonic_calibrator(
        scored.join(labels, "doc_id"), label_col="label"
    )
    return apply_calibration(scored, calib).select(
        "doc_id", "quality_lodds", "quality_prob", "quality_prob_cal"
    )


def q_semdedup_trained(spark, sf_dir):
    """SemDedup over TRAINED spherical-k-means centroids (round 8,
    operators/semdedup.train_semdedup_centroids — the job's
    --semdedup-centroids trained path): seeded deterministic trainer on
    an md5-ordered sample of the embeddings table, flat broadcast argmax
    assignment, within-cluster keep-first.  Rows-only (trained centroids
    are data-derived, not SQL literals — the same honest split as IVF/PQ
    trained paths; the fixture-centroid `semdedup` oracle pins the scan
    itself); trainer determinism, zero-vector hygiene, and
    recall-where-fixture-misses pinned in tests/test_semdedup.py."""
    from harvesttext_spark.operators.semdedup import (
        semdedup,
        train_semdedup_centroids,
    )

    emb = _emb(spark, sf_dir).select("vec_id", "embedding")
    cents = train_semdedup_centroids(
        emb, 8, vec_col="embedding", id_col="vec_id"
    )
    return semdedup(emb, cents, threshold=0.95)


def q_domain_timeseries(spark, sf_dir):
    """Per-domain keep-rate trajectory across snapshots
    (operators/snapshot_metrics.py): three deterministic pseudo-
    snapshots (doc_id % 3) over the documents table's source domains
    with the n_chars >= 300 keep proxy (domain_reputation precedent),
    then the lag-window drift columns.  Rows-only in the driver
    contract (the 50-slot prefix is full); the SAME full value compare
    runs in tests/test_snapshot_metrics.py::
    test_domain_timeseries_sql_parity against the shared SQL mirror."""
    from harvesttext_spark.operators.snapshot_metrics import domain_timeseries

    d = _docs(spark, sf_dir)
    dm = (
        d.select(
            F.col("source").alias("domain"),
            (F.col("doc_id") % 3).alias("snapshot"),
            (F.col("n_chars") >= 300).alias("k"),
        )
        .groupBy("domain", "snapshot")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.sum(F.col("k").cast("long")).alias("n_keep"),
        )
    )
    return domain_timeseries(dm)


def q_bpe_tokens(spark, sf_dir):
    """Distributed BPE train + tokenize (operators/bpe.py, Sennrich et
    al. 2016; rows-only — the merge loop is inherently sequential and
    not SQL-expressible; row-for-row correctness incl. the Sennrich
    worked example is pinned in tests/test_bpe.py).  The only corpus
    exchange is the capped word count; merges broadcast back for one
    Arrow tokenize pass."""
    from harvesttext_spark.operators.bpe import bpe_tokenize, train_bpe

    d = _docs(spark, sf_dir).select("doc_id", "text")
    model = train_bpe(d, n_merges=100, max_word_types=1 << 14)
    return bpe_tokenize(d, model)


def q_cross_snapshot_dedup(spark, sf_dir):
    """Cross-snapshot incremental dedup (rows-only: the signature chain
    is already value-pinned via the minhash_lsh_pairs oracle; the
    planted-dup semantics are pinned row-for-row in
    tests/test_cross_snapshot_dedup.py).  Prior snapshot = even doc_ids'
    persisted band index; the 'new dump' = odd doc_ids plus planted
    copies of two prior docs — the copies must flag, the rest follows
    in-run LSH semantics."""
    from harvesttext_spark.operators.dedup import (
        flag_dups_against,
        snapshot_band_index,
    )

    d = _docs(spark, sf_dir).select("doc_id", "text")
    prior = snapshot_band_index(d.filter(F.col("doc_id") % 2 == 0))
    planted = d.filter(F.col("doc_id").isin(0, 2)).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
    )
    new = d.filter(F.col("doc_id") % 2 == 1).unionByName(planted)
    return flag_dups_against(new, prior).select(
        F.col("id").alias("doc_id"), "cross_dup"
    )


def q_alias_discovery(spark, sf_dir):
    """Alias clusters over frequent document tokens (rows-only)."""
    from harvesttext_spark.operators.alias_discovery import discover_aliases

    d = _docs(spark, sf_dir)
    mentions = (
        d.select(F.explode(tokens_col(F.col("text"))).alias("mention"))
        .groupBy("mention")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= 20)
    )
    return discover_aliases(mentions, min_count=20, threshold=0.5)


def q_pagerank_tokens(spark, sf_dir):
    """8-iteration weighted PageRank over the token co-occurrence graph.
    Value-oracled (round 3): the oracle unrolls the same power iteration
    as 8 chained CTEs in DuckDB — same edge weights, same damping, same
    uniform init — so an ITERATIVE algorithm is value-checked end to end."""
    from harvesttext_spark.operators.graph import (
        pagerank_edges,
        word_cooccurrence_edges,
    )

    d = _docs(spark, sf_dir).select("doc_id", tokens_col(F.col("text")).alias("words"))
    edges = word_cooccurrence_edges(d, min_freq=10)
    pr = pagerank_edges(edges, iters=8)
    return pr.select("node", F.round("rank", 6).alias("rank"))


def _sql_pagerank(iters: int = 8, damping: float = 0.85, min_freq: int = 10) -> str:
    """Unrolled power iteration (standard SQL forbids GROUP BY in a
    recursive CTE term, so each iteration is its own CTE)."""
    head = f"""
WITH tok AS (
  SELECT doc_id, unnest(list_distinct(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != ''))) AS key
  FROM documents
),
edges AS (
  SELECT a.key AS u, b.key AS v, count(DISTINCT a.doc_id)::DOUBLE AS weight
  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND a.key < b.key
  GROUP BY a.key, b.key
  HAVING count(DISTINCT a.doc_id) >= {min_freq}
),
sym AS (SELECT u, v, weight FROM edges UNION ALL SELECT v, u, weight FROM edges),
outw AS (SELECT u, sum(weight) AS w_out FROM sym GROUP BY u),
norm AS (SELECT s.u, s.v, s.weight / o.w_out AS p FROM sym s JOIN outw o USING (u)),
nodes AS (SELECT DISTINCT u AS node FROM sym),
nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes)"""
    steps = []
    for i in range(1, iters + 1):
        steps.append(f""",
r{i} AS (
  SELECT nd.node,
         (SELECT ({1 - damping!r}) / n FROM nn) + {damping!r} * coalesce(c.acc, 0) AS rank
  FROM nodes nd LEFT JOIN (
    SELECT m.v AS node, sum(m.p * r.rank) AS acc
    FROM norm m JOIN r{i - 1} r ON m.u = r.node GROUP BY m.v
  ) c ON nd.node = c.node
)""")
    return head + "".join(steps) + f"\nSELECT node, round(rank, 6) AS rank FROM r{iters}"


def q_pattern_entities(spark, sf_dir):
    from harvesttext_spark.operators.patterns import (
        all_english,
        find_entities_with_rule,
        with_length,
    )

    d = _docs(spark, sf_dir).select("doc_id", tokens_col(F.col("text")).alias("words"))
    return find_entities_with_rule(d, [(all_english, with_length(5))])


SQL_PATTERN_ENTITIES = """
SELECT DISTINCT t AS word
FROM (SELECT unnest(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '')) AS t
      FROM documents)
WHERE regexp_matches(t, '^[a-zA-Z]*$') AND length(t) = 5
"""


# Queries retired from the live contract (operator + SQL mirror remain,
# verified by a dedicated test_retired_*_oracle_parity test each).  The
# drift check in tools/check_contract.py consults this manifest so a
# documented retirement is distinguishable from an accidental rename.
# retirement artifacts: the manifest test requires each retired query to
# keep an importable q_<name> callable and SQL_<NAME> mirror string
SQL_QUALITY_FILTER_LABELS = _sql_quality_filter_labels()
SQL_REPETITION_SIGNALS = _sql_repetition_signals()
SQL_REPETITION_NGRAMS = _sql_repetition_ngrams()

RETIRED_QUERIES = {
    "events_grouping_sets": "round 6: redundant with events_rollup",
    "minhash_signature": "round 7: chain recomputed inside minhash_lsh_pairs",
    "events_window": "round 7: redundant with events_sessionize+events_rollup",
    "quality_filter_labels": (
        "round 7: chain recomputed inside quality_filter_full_labels"
    ),
    "repetition_signals": (
        "round 7: shapes recomputed inside quality_filter_full_labels"
    ),
    "repetition_ngrams": (
        "round 7: shapes recomputed inside quality_filter_full_labels"
    ),
    "simhash": "round 7: chain recomputed inside simhash_pairs32",
    "token_freq": "round 7: chain recomputed as domain_quality's uni CTE",
    "token_docfreq": "round 7: chain recomputed as tfidf_topk's idf CTE",
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # ORDER MATTERS: the driver records the first 50 entries in
    # CORRECTNESS_r{N}.json.  Every oracle-bearing query (an entry in
    # oracle_sql()) sits inside that prefix; rows-only entries absorb the
    # overflow past the cap and are value-checked locally by
    # tools/check_contract.py instead.  tests/test_entry_contract.py pins
    # the invariant so a new query can't silently push an oracle out.
    return {
        "lang_id": q_lang_id,
        "quality_signals": q_quality_signals,
        # minhash_signature RETIRED round 7 (its sh->hp->sig chain is
        # recomputed end-to-end inside the minhash_lsh_pairs oracle;
        # test_retired_minhash_signature_oracle_parity keeps the full
        # per-doc value check) — slot goes to script_mix
        "script_mix": q_script_mix,
        "jaccard_pairs": q_jaccard_pairs,
        # simhash RETIRED round 7 (its tok->bit->sign->fold chain is
        # recomputed end-to-end inside the simhash_pairs32 oracle; 6
        # rounds of driver green) — per-doc signature check preserved in
        # test_retired_simhash_oracle_parity; slot freed for the C4
        # line-filter battery
        "c4_line_filters": q_c4_line_filters,
        "bigram_stats": q_bigram_stats,
        "tfidf_topk": q_tfidf_topk,
        "so_pmi": q_so_pmi,
        "search_conjunctive": q_search_conjunctive,
        "cooccur_edges": q_cooccur_edges,
        "embedding_topk": q_embedding_topk,
        "ann_lsh_topk": q_ann_lsh_topk,
        "events_sessionize": q_events_sessionize,
        "pricing_summary": q_pricing_summary,
        # top_customers + region_revenue rotated PAST the cap this round
        # (relational family, driver-green r01-r06 — they join the
        # allowlist slots token_freq/token_docfreq vacated when those
        # retired outright: token_freq's tokenize+count chain is
        # recomputed as domain_quality's `uni` CTE, token_docfreq's as
        # tfidf_topk's `idf` CTE; parity tests keep both value checks).
        # The freed prefix slots go to the two new pipeline oracles:
        "edu_score": q_edu_score,
        "semdedup": q_semdedup,
        "pattern_entities": q_pattern_entities,
        "lm_perplexity": q_lm_perplexity,
        "doc_coherence": q_doc_coherence,
        "domain_quality": q_domain_quality,
        "seg_tokens": q_seg_tokens,
        "cut_sentences": q_cut_sentences,
        "t2s_text": q_t2s_text,
        "punkt_abbrevs": q_punkt_abbrevs,
        "punkt_starters": q_punkt_starters,
        "punkt_collocations": q_punkt_collocations,
        "punkt_ortho": q_punkt_ortho,
        "clean_text": q_clean_text,
        "minhash_lsh_pairs": q_minhash_lsh_pairs,
        "simhash_pairs32": q_simhash_pairs32,
        # repetition_signals RETIRED round 7 (its dup-line/top-bigram SQL
        # shapes are recomputed inside the quality_filter_full_labels
        # oracle's repetition when-chain; green r04-r06) — full per-doc
        # ratio value check preserved in
        # test_retired_repetition_signals_oracle_parity; slot goes to the
        # supervised quality classifier
        "quality_classifier": q_quality_classifier,
        # repetition_ngrams RETIRED round 7 (its top-n-gram CTE shapes are
        # recomputed inside the quality_filter_full_labels oracle's gopher
        # when-chain; green r04-r06) — full per-doc value check preserved
        # in test_retired_repetition_ngrams_oracle_parity; slot goes to
        # the domain-reputation shrinkage filter
        "domain_reputation": q_domain_reputation,
        "boilerplate_dedup": q_boilerplate_dedup,
        "canonical_urls": q_canonical_urls,
        # quality_filter_labels RETIRED round 7 (its battery chain + base
        # cascade SQL is recomputed verbatim inside the
        # quality_filter_full_labels oracle — _sql_quality_filter_full_labels
        # composes _sql_clean_chain + the same when-chain; green r03-r06)
        # — full value check preserved in
        # test_retired_quality_filter_labels_oracle_parity; slot goes to
        # the FineWeb line-ratio battery
        "fineweb_signals": q_fineweb_signals,
        "quality_filter_full_labels": q_quality_filter_full_labels,
        "pii_scrub": q_pii_scrub,
        "domain_drop_samples": q_domain_drop_samples,
        "pagerank_tokens": q_pagerank_tokens,
        "langid_trained": q_langid_trained,
        "toxicity_score": q_toxicity_score,
        "contamination_flags": q_contamination_flags,
        "url_risk": q_url_risk,
        "substring_spans": q_substring_spans,
        "scrub_text": q_scrub_text,
        "ann_ivf_topk": q_ann_ivf_topk,
        "paragraph_dedup": q_paragraph_dedup,
        "mojibake_fix": q_mojibake_fix,
        "curation_split": q_curation_split,
        "dsir_topk": q_dsir_topk,
        # --- past the driver's 50-entry cap: rows-only entries plus the
        # long-driver-green oracles the newer pipeline oracles displaced
        # (events relational family, r01-r04 driver files; fingerprint,
        # r01-r05 driver files — displaced by the round-6 ann_ivf_topk
        # promotion; all still value-checked locally every wrap by
        # tools/check_contract.py) ---
        "doc_stats": q_doc_stats,  # rotated round 7 for dsir_topk (green r01-r06)
        "fingerprint": q_fingerprint,
        # token_freq / token_docfreq RETIRED round 7 third session (their
        # tokenize+count chains are recomputed verbatim inside the
        # domain_quality `uni` / tfidf_topk `idf` CTEs; green r01-r06) —
        # value checks preserved in test_retired_token_freq_oracle_parity
        # / test_retired_token_docfreq_oracle_parity; their allowlist
        # slots go to top_customers + region_revenue, whose prefix slots
        # go to edu_score + semdedup
        "top_customers": q_top_customers,  # rotated round 7 (green r01-r06)
        "region_revenue": q_region_revenue,  # rotated round 7 (green r01-r06)
        "exact_dup_groups": q_exact_dup_groups,
        "events_rollup": q_events_rollup,
        "events_asof": q_events_asof,
        # events_window RETIRED round 7 (windowed-agg coverage is redundant
        # with events_sessionize+events_rollup; green r01-r06) — operator
        # and SQL mirror stay verified by
        # test_retired_events_window_oracle_parity; freed the allowlist
        # slot doc_stats rotated into
        "simhash_dup_pairs": q_simhash_dup_pairs,
        "seg_posseg_dict": q_seg_posseg_dict,
        "ner_entities": q_ner_entities,
        "entity_linking_fuzzy": q_entity_linking_fuzzy,
        "textrank_keywords": q_textrank_keywords,
        "pq_topk": q_pq_topk,
        "image_stats": q_image_stats,
        "audio_stats": q_audio_stats,
        "texttile_paragraphs": q_texttile_paragraphs,
        "summarize": q_summarize,
        "alias_discovery": q_alias_discovery,
        "entity_linking": q_entity_linking,
        "pack_sequences": q_pack_sequences,
        "cross_snapshot_dedup": q_cross_snapshot_dedup,
        "bpe_tokens": q_bpe_tokens,
        "domain_timeseries": q_domain_timeseries,
        "classifier_calibration": q_classifier_calibration,
        "mixture_sample": q_mixture_sample,
        "ppl_buckets": q_ppl_buckets,
        "pack_epochs": q_pack_epochs,
        "classifier_calibrated": q_classifier_calibrated,
        "semdedup_trained": q_semdedup_trained,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "doc_stats": SQL_DOC_STATS,
        "lang_id": SQL_LANG_ID,
        "quality_signals": SQL_QUALITY_SIGNALS,
        "fingerprint": SQL_FINGERPRINT,
        "exact_dup_groups": SQL_EXACT_DUP_GROUPS,
        "script_mix": _sql_script_mix(),
        "jaccard_pairs": SQL_JACCARD_PAIRS,
        "c4_line_filters": _sql_c4_line_filters(),
        "simhash_pairs32": SQL_SIMHASH_PAIRS32,
        "quality_classifier": _sql_quality_classifier(),
        "domain_reputation": _sql_domain_reputation(),
        "boilerplate_dedup": SQL_BOILERPLATE_DEDUP,
        "canonical_urls": _sql_canonical_urls(),
        "edu_score": _sql_edu_score(),
        "semdedup": _sql_semdedup(),
        "bigram_stats": SQL_BIGRAM_STATS,
        "tfidf_topk": SQL_TFIDF_TOPK,
        "so_pmi": SQL_SO_PMI,
        "search_conjunctive": SQL_SEARCH_CONJUNCTIVE,
        "cooccur_edges": SQL_COOCCUR_EDGES,
        "embedding_topk": SQL_EMBEDDING_TOPK,
        "ann_lsh_topk": _sql_ann_lsh(),
        "ann_ivf_topk": _sql_ann_ivf(),
        "paragraph_dedup": _sql_paragraph_dedup(),
        "mojibake_fix": _sql_mojibake_fix(),
        "curation_split": _sql_curation_split(),
        "events_sessionize": SQL_EVENTS_SESSIONIZE,
        "events_asof": SQL_EVENTS_ASOF,
        "events_rollup": SQL_EVENTS_ROLLUP,

        "pricing_summary": SQL_PRICING_SUMMARY,
        "top_customers": SQL_TOP_CUSTOMERS,
        "region_revenue": SQL_REGION_REVENUE,
        "pattern_entities": SQL_PATTERN_ENTITIES,
        "lm_perplexity": SQL_LM_PERPLEXITY,
        "doc_coherence": SQL_DOC_COHERENCE,
        "domain_quality": SQL_DOMAIN_QUALITY,
        "seg_tokens": SQL_SEG_TOKENS,
        "cut_sentences": SQL_CUT_SENTENCES,
        "t2s_text": _sql_t2s(),
        "punkt_abbrevs": _sql_punkt(),
        "punkt_starters": _sql_punkt_starters(),
        "punkt_collocations": _sql_punkt_collocations(),
        "punkt_ortho": _sql_punkt_ortho(),
        "minhash_lsh_pairs": SQL_MINHASH_LSH_PAIRS,
        "langid_trained": SQL_LANGID_TRAINED,
        "pagerank_tokens": _sql_pagerank(),
        "fineweb_signals": _sql_fineweb_signals(),
        "quality_filter_full_labels": _sql_quality_filter_full_labels(),
        "pii_scrub": _sql_pii_scrub(),
        "domain_drop_samples": _sql_domain_drop_samples(),
        "clean_text": _sql_clean_text(),
        "scrub_text": _sql_scrub_text(),
        "toxicity_score": _sql_toxicity_score(),
        "contamination_flags": _sql_contamination(),
        "url_risk": _sql_url_risk(),
        "substring_spans": _sql_substring_spans(),
        "dsir_topk": _sql_dsir_topk(),
    }
