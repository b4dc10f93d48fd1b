"""The cleaning / scrubbing battery — HarvestText ``clean_text`` re-expressed
for Spark.

Semantics contract: the reference applies a FIXED ORDER of regex / string
passes (``/root/reference/harvesttext/harvesttext.py:729-840``), and our
output must be byte-identical per document.  Pass order (defaults marked *):

   1. zero-width chars, raw + escaped          (:757-761)  *
   2. custom_regex removals                    (:765-769)
   3. norm_html  (html.unescape)               (:771-772)
   4. to_url     (urllib quote)                (:773-774)
   5. remove_tags (w3lib-style tag regex)      (:775-776)  *
   6. markdown hyperlink -> anchor text        (:777-778)  *
   7. weibo topic  #...#  (greedy)             (:779-780)
   8. bracket emoticon [doge] w/ length guard  (:781-790)  *
   9. unicode emoji codepoint classes          (:792-799)  *
  10. URL removal (primary + fallback regex)   (:801-813)  *
  11. norm_url  (urllib unquote)               (:814-815)
  12. email removal                            (:816-818)  *
  13. weibo @mention / reply  -> " "           (:819-820)  *
  14. linesep2space                            (:822-823)
  15. whitespace-run -> first whitespace char  (:824-825)  *
  16. t2s (OpenCC)                             (:826-828)   [unavailable here]
  17. stop_terms literal removal               (:829-834)  *  default ("转发微博",)
  18. punctuation strip                        (:835-838)
  19. final str.strip()                        (:840)      *

Execution strategy (scale): the default engine path runs the WHOLE battery as
one scalar ``pandas_udf`` — a single Arrow-batched ``Project``, no shuffle,
CPython ``re`` (identical engine to the reference, so astral-plane/backref
corner cases match exactly).  A Catalyst-native ``regexp_replace`` chain
(``clean_text_native``) covers the Java-regex-safe subset as a fast path and
is golden-gated by tests before use.
"""

from __future__ import annotations

import html
import re
import urllib.parse
from typing import Callable, Iterable

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

# --- compiled constants (compile once per process; executors reuse) -------

RE_ZERO_WIDTH = re.compile(r"[​-‍]")
RE_ZERO_WIDTH_ESCAPED = re.compile(r"(\\u200b|\\u200c|\\u200d)")
# w3lib.html.remove_tags() semantics with no keep/which_ones: every match of
# the tag regex is deleted (DOTALL so tags may span newlines).
RE_HTML_TAG = re.compile(r"</?([^ >/]+).*?>", re.DOTALL)
RE_MARKDOWN_LINK = re.compile(r"\[(.+?)\]\(\S+\)")
RE_WEIBO_TOPIC = re.compile(r"#.+#")  # greedy on purpose (reference behavior)
RE_EMOJI_CODEPOINTS = re.compile(
    "["
    "\U0001f600-\U0001f64f"  # emoticons
    "\U0001f300-\U0001f5ff"  # symbols & pictographs
    "\U0001f680-\U0001f6ff"  # transport & map
    "\U0001f1e0-\U0001f1ff"  # flags
    "\U00002702-\U000027b0"
    "]+",
    flags=re.UNICODE,
)
RE_URL_PRIMARY = re.compile(
    r"(?i)http[s]?://(?:[a-zA-Z]|[0-9]|[#$%*-;=?&@~.&+]|[!*,])+", re.IGNORECASE
)
_ZH_PUNCTS = "，；、。！？（）《》【】"
RE_URL_FALLBACK = re.compile(
    r"(?i)((?:https?://|www\d{0,3}[.]|[a-z0-9.\-]+[.][a-z]{2,4}/)"
    r"(?:[^\s()<>" + _ZH_PUNCTS + r"]+|\(([^\s()<>]+|(\([^\s()<>]+\)))*\))+"
    r"(?:\(([^\s()<>]+|(\([^\s()<>]+\)))*\)"
    r"|[^\s`!()\[\]{};:\'\".,<>?«»“”‘’" + _ZH_PUNCTS + r"]))",
    re.IGNORECASE,
)
RE_EMAIL = re.compile(r"[-a-z0-9_.]+@(?:[-a-z0-9]+\.)+[a-z]{2,6}", re.IGNORECASE)
RE_WEIBO_AT = re.compile(r"(回复)?(//)?\s*@\S*?\s*(:|：| |$)")
RE_SPACE_RUNS = re.compile(r"(\s)+")
RE_ALL_PUNCTS = re.compile(
    r"[，\_《。》、？；：‘’＂“”【「】」·！@￥…（）—\,\<\.\>\/\?\;\:\'\"\[\]\{\}\~\`"
    r"\!\@\#\$\%\^\&\*\(\)\-\=\+]"
)

DEFAULT_STOP_TERMS = ("转发微博",)


def make_cleaner(
    remove_url: bool = True,
    email: bool = True,
    weibo_at: bool = True,
    stop_terms: Iterable[str] = DEFAULT_STOP_TERMS,
    emoji: bool = True,
    weibo_topic: bool = False,
    markdown_hyperlink: bool = True,
    deduplicate_space: bool = True,
    norm_url: bool = False,
    norm_html: bool = False,
    to_url: bool = False,
    remove_puncts: bool = False,
    remove_tags: bool = True,
    t2s: bool = False,
    expression_len=(1, 6),
    linesep2space: bool = False,
    custom_regex=None,
) -> Callable[[str], str]:
    """Build a str -> str cleaner with the reference's exact pass order.

    Flag names, defaults, and semantics mirror ``clean_text``
    (``harvesttext/harvesttext.py:729-733``).  Raises on the same
    contradictory flag combination (norm_url & to_url).
    """
    if norm_url and to_url:
        raise Exception("norm_url和to_url是矛盾的设置")
    t2s_fn = None
    if t2s:
        # OpenCC is absent; committed data replaces it: phrase-level
        # exceptions (resources/zh_t2s_phrases.tsv, OpenCC TSPhrases-style)
        # via placeholder substitution, then the 2200+-pair char map
        # (resources/zh_t2s.tsv) in one C-level str.translate pass.
        from harvesttext_spark.functions.t2s import t2s_py

        t2s_fn = t2s_py
    if custom_regex is not None and isinstance(custom_regex, str):
        custom_regex = [custom_regex]
    custom_compiled = [re.compile(p) for p in (custom_regex or [])]

    if isinstance(expression_len, (tuple, list)) and len(expression_len) == 2:
        lb, rb = expression_len
        bracket_re = re.compile(r"\[\S{" + str(lb) + "," + str(rb) + "}?\\]")
    else:
        bracket_re = re.compile(r"\[\S+?\]")

    if isinstance(stop_terms, str):
        stop_list = None  # plain .replace of the single string
        stop_str = stop_terms
    else:
        assert hasattr(stop_terms, "__iter__")
        stop_list = list(stop_terms)
        stop_str = None

    def clean(text: str) -> str:
        # Short-circuit guards: each regex pass runs only when a NECESSARY
        # literal of its pattern occurs in the text (str containment is ~10x
        # cheaper than a failed regex scan); semantics are exactly the
        # reference's — a pass that cannot match is a no-op.
        if text is None:
            return None
        text = RE_ZERO_WIDTH.sub("", text)
        if "\\u200" in text:
            text = RE_ZERO_WIDTH_ESCAPED.sub("", text)
        for pat in custom_compiled:
            text = pat.sub("", text)
        if norm_html:
            text = html.unescape(text)
        if to_url:
            text = urllib.parse.quote(text)
        if remove_tags and "<" in text:
            text = RE_HTML_TAG.sub("", text)
        if markdown_hyperlink and "](" in text:
            text = RE_MARKDOWN_LINK.sub(r"\1", text)
        if weibo_topic and "#" in text:
            text = RE_WEIBO_TOPIC.sub("", text)
        if emoji:
            if "[" in text:
                text = bracket_re.sub("", text)
            text = RE_EMOJI_CODEPOINTS.sub("", text)
        if remove_url and "http" in text.lower():
            try:
                text = RE_URL_PRIMARY.sub("", text)
            except Exception:  # reference keeps a backtracking fallback
                text = RE_URL_FALLBACK.sub("", text)
        if norm_url:
            text = urllib.parse.unquote(text)
        if email and "@" in text:
            text = RE_EMAIL.sub("", text)
        if weibo_at and "@" in text:
            text = RE_WEIBO_AT.sub(" ", text)
        if linesep2space:
            text = text.replace("\n", " ")
        if deduplicate_space:
            text = RE_SPACE_RUNS.sub(r"\1", text)
        if t2s_fn is not None:
            # reference pass position: after space dedup, before stop_terms
            # (harvesttext.py:826-828)
            text = t2s_fn(text)
        if stop_str is not None:
            text = text.replace(stop_str, "")
        else:
            for term in stop_list:
                text = text.replace(term, "")
        if remove_puncts:
            text = RE_ALL_PUNCTS.sub("", text)
        return text.strip()

    return clean


def clean_text_py(text: str, **flags) -> str:
    """One-off scalar entry point (tests / label generation)."""
    return make_cleaner(**flags)(text)


def make_clean_text_udf(**flags):
    """Vectorized Arrow-batched UDF running the full battery.

    One ``Project`` over the scan — no shuffle; the cleaner closure compiles
    its regexes once per Python worker (pandas_udf pickles the closure, and
    module-level constants re-resolve on import executor-side).
    """
    cleaner = make_cleaner(**flags)

    @pandas_udf(StringType())
    def _clean(s: pd.Series) -> pd.Series:
        return s.map(cleaner, na_action="ignore")

    return _clean


def clean_text_udf_col(col, **flags) -> Column:
    return make_clean_text_udf(**flags)(col)


def _native_steps() -> list:
    """The native battery as a list of Column->Column passes.  Each pass
    references its input Column a bounded number of times; chaining them
    INLINE (one expression) triples the running subtree per guarded step —
    a 3^n-node analyzed tree that blew janino's 64KB method limit once a
    coalesce over an extracted Python UDF shared the Project (interpreted
    fallback, ~40x slower).  `clean_text_native_frame` applies them as
    successive Projects instead: CollapseProject keeps non-cheap producers
    referenced >1x in separate operators, so the plan stays linear AND
    whole-stage-codegen fuses all of them into one stage anyway."""

    def guarded(needle, pat, repl):
        return lambda c: F.when(
            F.instr(c, needle) > 0, F.regexp_replace(c, pat, repl)
        ).otherwise(c)

    return [
        lambda c: F.regexp_replace(c, "[\\u200b-\\u200d]", ""),
        guarded("\\u200", "(\\\\u200b|\\\\u200c|\\\\u200d)", ""),
        guarded("<", "</?([^ >/]+)(?s:.)*?>", ""),
        guarded("](", "\\[(.+?)\\]\\(\\S+\\)", "$1"),
        guarded("[", "\\[\\S{1,6}?\\]", ""),
        lambda c: F.regexp_replace(
            c,
            "[\\x{1F600}-\\x{1F64F}\\x{1F300}-\\x{1F5FF}\\x{1F680}-\\x{1F6FF}"
            "\\x{1F1E0}-\\x{1F1FF}\\x{2702}-\\x{27B0}]+",
            "",
        ),
        lambda c: F.when(
            F.instr(F.lower(c), "http") > 0,
            F.regexp_replace(
                c, "(?i)http[s]?://(?:[a-zA-Z]|[0-9]|[#$%*-;=?&@~.&+]|[!*,])+", ""
            ),
        ).otherwise(c),
        guarded("@", "(?i)[-a-z0-9_.]+@(?:[-a-z0-9]+\\.)+[a-z]{2,6}", ""),
        guarded("@", "(回复)?(//)?\\s*@\\S*?\\s*(:|：| |$)", " "),
        lambda c: F.regexp_replace(c, "(\\s)+", "$1"),
        guarded("转发微博", "转发微博", ""),
        lambda c: F.regexp_replace(F.regexp_replace(c, "^\\s+", ""), "\\s+$", ""),
    ]


def clean_text_native(col: Column) -> Column:
    """Catalyst-native fast path for the Java-regex-safe subset of the
    default battery (zero-width, markdown links, bracket emoticons, emoji
    codepoints, URLs, emails, whitespace collapse, trim).

    NOT byte-identical in every corner case (Java vs CPython ``re``); tests
    golden-gate it against ``clean_text_py`` on the fixture corpus before it
    is allowed in the plan.  Entirely whole-stage-codegen — zero Python.

    Each regex pass is guarded by an ``instr`` probe for a literal the
    pattern REQUIRES (the JVM analog of the Python battery's str-contains
    short circuits): a guarded pass that cannot match is skipped without a
    regex scan, and skipping it is exactly a no-op.

    Single-Column form: fine standalone in a small Project, but the chained
    when/otherwise tree grows 3^n — prefer ``clean_text_native_frame`` when
    composing with other expressions (see _native_steps docstring)."""
    c = col
    for step in _native_steps():
        c = step(c)
    return c


def clean_text_native_frame(df, in_col: str, out_col: str):
    """Linear-plan form of the native battery: one Project per pass over a
    working column.  Catalyst's CollapseProject leaves the chain alone
    (each producer is non-cheap and referenced up to 3x by its consumer),
    janino gets n small methods instead of one 3^n-node expression, and
    whole-stage codegen still fuses the whole chain into a single stage."""
    steps = _native_steps()
    work = f"__{out_col}_w"
    df = df.withColumn(work, F.col(in_col))
    for step in steps:
        df = df.withColumn(work, step(F.col(work)))
    return df.withColumnRenamed(work, out_col)
