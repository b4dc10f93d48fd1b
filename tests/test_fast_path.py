"""ASCII fast-path equivalence: the Catalyst-native battery must be
byte-identical to the Python battery on pure-ASCII input (the routing
condition), across random and adversarial strings."""

import random
import string

import pytest
from pyspark.sql import functions as F

from harvesttext_spark.functions.cleaning import (
    clean_text_native,
    make_clean_text_udf,
)
from harvesttext_spark.pipeline.quality_filter import extract_text, label, scrub

ADVERSARIAL = [
    "",
    "   ",
    "\t\t tabs \n\n and newlines \r\n mixed",
    "<b>tags</b> <div class='x'>nested <i>inner</i></div> <>",
    "url http://a.b/c?d=e&f=g and HTTPS://X.Y/Z tail",
    "mail a.b-c@ex-ample.org and UPPER@CASE.COM done",
    "[x] [toolongbracket] [ok1] [][]",
    "markdown [text](http://x.y) and [no link]",
    "@user: reply //@other: chain @end",
    "a  b   c    d",
    "ends with url http://t.co/x",
    "@",
    "[",
    "](",
    "http",
    "...paragraph. spacing! question? ",
    "repeat aaaaaaaaaaaaaa and 1111111111",
]


def _random_ascii(rng, n):
    pool = string.printable
    return "".join(rng.choice(pool) for _ in range(rng.randint(0, n)))


def test_native_equals_python_on_ascii(spark):
    rng = random.Random(7)
    rows = [(t,) for t in ADVERSARIAL] + [(_random_ascii(rng, 200),) for _ in range(300)]
    df = spark.createDataFrame(rows, "raw string")
    out = df.select(
        "raw",
        clean_text_native(F.col("raw")).alias("native"),
        make_clean_text_udf()(F.col("raw")).alias("py"),
    ).collect()
    bad = [(r["raw"], r["native"], r["py"]) for r in out if r["native"] != r["py"]]
    assert not bad, bad[:5]


def test_native_path_diverges_on_non_ascii(spark):
    """Negative control: the gate exists because Java and CPython regex
    genuinely disagree outside ASCII — e.g. Java's \\S+? quantifier over a
    supplementary (astral-plane) character inside the bracket-emoticon rule
    counts UTF-16 code units, CPython counts codepoints.  At least one
    non-ASCII case must differ, else the routing condition is dead code."""
    cases = [
        ("[𝄞]",),  # astral-plane char inside brackets
        ("[😀😀😀😀]",),
        ("回复@用户: 正文",),  # zh @mention rule
        ("a  b",),  # non-breaking-space runs
    ]
    df = spark.createDataFrame(cases, "raw string")
    out = df.select(
        "raw",
        clean_text_native(F.col("raw")).alias("native"),
        make_clean_text_udf()(F.col("raw")).alias("py"),
    ).collect()
    assert any(r["native"] != r["py"] for r in out), (
        "no divergence found — fast path could be promoted to all rows"
    )


def test_fast_path_pipeline_equivalence(spark):
    """quality_filter with fast_path must produce identical rows to the
    pure-UDF path over the mixed-language synthetic corpus."""
    from harvesttext_spark.pipeline.pages import synthesize_pages

    pages = synthesize_pages(spark, n=800, seed=9, partitions=4)
    base = label(scrub(extract_text(pages))).select("url", "text_clean", "keep")
    fast = label(scrub(extract_text(pages), fast_path=True)).select(
        "url", "text_clean", "keep"
    )
    a = {r["url"]: (r["text_clean"], r["keep"]) for r in base.collect()}
    b = {r["url"]: (r["text_clean"], r["keep"]) for r in fast.collect()}
    assert a == b
