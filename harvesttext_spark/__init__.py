"""harvesttext_spark — a from-scratch, PySpark-native re-implementation of the
query/data-processing capabilities of blmoistawinde/HarvestText, recast as a
web-scale text quality-filter engine.

Design principles (see SURVEY.md):
  * DataFrame/SQL first — Catalyst plans everything relational (n-gram stats,
    PMI, entropy, TF-IDF, inverted index, co-occurrence graphs, dedup).
  * Python only where semantics demand it, always vectorized: scalar
    ``pandas_udf`` for the regex cleaning battery (byte-identical to the
    reference's CPython ``re`` semantics), ``mapInPandas`` for tokenizing /
    Aho-Corasick entity matching, ``applyInPandas`` for tiny per-document
    graph algorithms (TextRank / summary / TextTiling).
  * Scale hygiene: broadcast dimension tables, salted two-level aggregation
    for Zipfian-skewed keys (domains, head n-grams), AQE on, explicit
    shuffle-partition sizing.
"""

__version__ = "0.1.0"

from harvesttext_spark.session import get_spark  # noqa: F401
from harvesttext_spark.functions.t2s import t2s_py, t2s_col  # noqa: F401
from harvesttext_spark.functions.pinyin import lazy_pinyin  # noqa: F401
from harvesttext_spark.functions.zh_cutter import default_cutter  # noqa: F401
from harvesttext_spark.operators.linking import EntityKB  # noqa: F401
from harvesttext_spark.operators.punkt import (  # noqa: F401
    punkt_abbreviations,
    punkt_sentence_starters,
    trained_abbrev_list,
    trained_starter_list,
)
from harvesttext_spark.operators.dedup import (  # noqa: F401
    drop_boilerplate_lines,
    line_doc_freq,
)
from harvesttext_spark.functions.textstats import repetition_signals  # noqa: F401
from harvesttext_spark.pipeline.quality_filter import (  # noqa: F401
    domain_metrics_full,
)
from harvesttext_spark.functions.urls import canonical_url  # noqa: F401
