"""Text-analysis signal columns — language-ID, quality scores, token counts,
document fingerprints.  All Catalyst-native column expressions (whole-stage
codegen; no Python in the hot path) so they are also DuckDB-oracle
expressible for the correctness gate.

These are the engine's additions for a web-scale training-data pipeline
(BASELINE.json north_star: langid + heuristic quality rules feeding the
keep/drop decision), layered on the statistics vocabulary of the reference's
word-discovery module (``harvesttext/algorithms/word_discoverer.py``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- tokenization (relational) -------------------------------------------

# BPE-ish word/number/symbol pieces; RE2-compatible so DuckDB agrees.
TOKEN_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def tokens_col(text: Column) -> Column:
    """Whitespace tokens as array<string> (empty-safe)."""
    return F.filter(F.split(text, "\\s+"), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokens_col(text))


def bpe_piece_count(text: Column) -> Column:
    """Count of BPE-ish pieces (letters run / digits run / single symbol)."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_PATTERN), F.lit(0)))


# --- language ID (marker-word heuristic) ---------------------------------

# distinct high-frequency function words per language; zh by CJK codepoints.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "for", "was"],
    "es": ["el", "la", "los", "las", "de", "que", "y", "en", "un", "una"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "zu"],
    "fr": ["le", "la", "les", "et", "est", "une", "dans", "que", "pour", "des"],
}
LANG_ORDER = ["en", "es", "de", "fr"]  # deterministic tie-break order


def lang_marker_counts(text: Column) -> dict[str, Column]:
    """#distinct marker words present, per language (array_intersect dedups —
    DuckDB mirror uses list_distinct(list_intersect(...)))."""
    toks = tokens_col(F.lower(text))
    return {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))
        for lang, words in LANG_MARKERS.items()
    }


def lang_id(text: Column) -> Column:
    """Predicted language: zh if any CJK char, else argmax of marker counts
    (ties broken by LANG_ORDER), 'und' when no markers hit.

    Implemented as ONE array_max over (count, -order, lang) structs so each
    marker-count subexpression appears exactly once — a nested when() chain
    would re-inline the token split 2^|langs| times (measured 3× slower)."""
    counts = lang_marker_counts(text)
    candidates = F.array(
        *[
            F.struct(
                counts[lang].alias("cnt"),
                F.lit(-i).alias("prio"),
                F.lit(lang).alias("lang"),
            )
            for i, lang in enumerate(LANG_ORDER)
        ]
    )
    best = F.array_max(candidates)
    pred = F.when(best["cnt"] > 0, best["lang"]).otherwise(F.lit("und"))
    has_cjk = text.rlike("[\\x{4e00}-\\x{9fff}]")
    return F.when(has_cjk, F.lit("zh")).otherwise(pred)


# --- quality scoring ------------------------------------------------------

STOPWORDS_EN = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "was", "with", "as", "at", "by", "be",
]


def quality_signals(text: Column) -> dict[str, Column]:
    """Heuristic quality features (Gopher/C4-style rules re-expressed over the
    reference's cleaning vocabulary).  All pure column arithmetic.

    PERF: char-class counts use POSITIVE classes + length difference —
    Java's negated classes with supplementary ranges are ~5x slower
    (measured 4.75s vs 0.94s per 300k docs), and regexp_extract_all
    allocates a match array per row."""
    toks = tokens_col(text)
    n_tok = F.size(toks)
    n_chars = F.length(text)
    n_alnum = n_chars - F.length(
        F.regexp_replace(text, "[A-Za-z0-9\\x{4e00}-\\x{9fff}]", "")
    )
    n_punct = F.length(F.regexp_replace(text, "[A-Za-z0-9\\s]", ""))
    n_stop = F.size(
        F.array_intersect(
            F.transform(toks, lambda t: F.lower(t)),
            F.array(*[F.lit(w) for w in STOPWORDS_EN]),
        )
    )
    n_distinct = F.size(F.array_distinct(toks))
    safe_tok = F.greatest(n_tok, F.lit(1))
    safe_chars = F.greatest(n_chars, F.lit(1))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tok,
        "alnum_ratio": (n_alnum / safe_chars).cast("double"),
        "punct_ratio": (n_punct / safe_chars).cast("double"),
        "stopword_distinct": n_stop,
        "distinct_token_ratio": (n_distinct / safe_tok).cast("double"),
        "mean_token_len": (
            F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)) / safe_tok
        ).cast("double"),
        "char_run10": has_char_run(text, 10),
    }


# --- script mix / charset composition ------------------------------------

# Per-script BMP codepoint classes.  POSITIVE classes only (the negated-
# class 5x penalty measured for quality_signals applies here too), and
# every range is BMP so Java regex (Spark) and RE2 (DuckDB) agree char
# for char.  Latin deliberately EXCLUDES U+00D7 (×) and U+00F7 (÷) —
# they are math symbols inside the Latin-1 letter run.
SCRIPT_CLASSES: dict[str, str] = {
    "latin": "[A-Za-z\\x{00C0}-\\x{00D6}\\x{00D8}-\\x{00F6}\\x{00F8}-\\x{00FF}\\x{0100}-\\x{024F}]",
    "han": "[\\x{3400}-\\x{4DBF}\\x{4E00}-\\x{9FFF}]",
    "cyrillic": "[\\x{0400}-\\x{04FF}]",
    "arabic": "[\\x{0600}-\\x{06FF}]",
    "digit": "[0-9]",
    # ASCII punct runs + CJK symbols/punct + fullwidth punct (fullwidth
    # LETTER/DIGIT ranges excluded on purpose)
    "punct": (
        "[!-/:-@\\[-`{-~\\x{3000}-\\x{303F}\\x{FF01}-\\x{FF0F}"
        "\\x{FF1A}-\\x{FF20}\\x{FF3B}-\\x{FF40}\\x{FF5B}-\\x{FF65}]"
    ),
    # explicit class: Java default \s and RE2 \s disagree on \x0b
    # (substring_dedup.py precedent), so neither side uses \s
    "space": "[ \\t\\n\\x0b\\f\\r]",
}
# deterministic dominance preference on count ties (content scripts first)
SCRIPT_DOMINANCE_ORDER = ["han", "latin", "cyrillic", "arabic", "digit", "punct"]


def script_counts(text: Column) -> dict[str, Column]:
    """Per-script char counts via positive-class strip + length diff."""
    n = F.length(text)
    return {
        name: n - F.length(F.regexp_replace(text, cls, ""))
        for name, cls in SCRIPT_CLASSES.items()
    }


def script_mix_signals(text: Column) -> dict[str, Column]:
    """Charset-composition quality features — the standard CC-pipeline
    signal (CCNet/RefinedWeb use per-script char fractions to catch
    wrong-charset decodes, script-mixing spam, and encoding mojibake
    that survives repair): per-script char fraction, an ``other_frac``
    for unclassified codepoints, and the dominant content script with
    its fraction.  Pure codegen column arithmetic, DuckDB-mirrorable."""
    counts = script_counts(text)
    n_chars = F.length(text)
    safe = F.greatest(n_chars, F.lit(1))
    fracs = {f"{k}_frac": (v / safe).cast("double") for k, v in counts.items()}
    classified = None
    for v in counts.values():
        classified = v if classified is None else classified + v
    dom_names = SCRIPT_DOMINANCE_ORDER
    dom_count = F.greatest(*[counts[k] for k in dom_names])
    # first script in preference order holding the max count; all-zero
    # (empty / whitespace-free-unclassified) docs report 'none'
    dominant = F.lit("none")
    for name in reversed(dom_names):
        dominant = F.when(counts[name] == dom_count, F.lit(name)).otherwise(dominant)
    dominant = F.when(dom_count > 0, dominant).otherwise(F.lit("none"))
    return {
        **fracs,
        "other_frac": ((n_chars - classified) / safe).cast("double"),
        "dominant_script": dominant,
        "dominant_frac": (dom_count / safe).cast("double"),
    }


def has_char_run(text: Column, k: int = 10) -> Column:
    """True iff some single character repeats >= k times consecutively
    (repeated-char junk rule) — ONE backreference probe, not a probe ladder.
    (?s) makes Java's '.' match line terminators so newline/CR runs count,
    agreeing with the re.DOTALL cross-check in tests/reference_impl.py."""
    return text.rlike("(?s)(.)" + "\\1" * (k - 1))


def max_char_run(text: Column) -> Column:
    """Length of the longest single-character run, capped at 20, via regex
    probes.  Kept for analytics; the keep/drop label path uses the single
    has_char_run probe (7x fewer regex passes)."""
    probes = [
        F.when(text.rlike("(?s)(.)" + "\\1" * (k - 1)), F.lit(k)).otherwise(F.lit(0))
        for k in (2, 3, 5, 8, 10, 15, 20)
    ]
    return F.greatest(F.least(F.length(text), F.lit(1)), *probes)


# --- fingerprinting -------------------------------------------------------

FP_MOD = 1_000_000_007
FP_BASE = 131
FP_PREFIX = 64


def doc_fingerprint(text: Column) -> Column:
    """Deterministic polynomial rolling hash of the first FP_PREFIX chars:
    acc = (acc*131 + codepoint) mod 1e9+7.  Portable: identical fold in
    DuckDB via list_reduce, no engine hash() involved."""
    chars = F.split(F.substring(text, 1, FP_PREFIX), "")
    chars = F.filter(chars, lambda c: c != "")
    return F.aggregate(
        chars,
        F.lit(0).cast("bigint"),
        lambda acc, c: (acc * FP_BASE + F.ascii(c)) % FP_MOD,
    )


# --- Gopher-style repetition signals ----------------------------------------


def repetition_signals(
    df, text_col: str = "text", id_col: str = "doc_id"
):
    """(doc_id, dup_line_frac, dup_line_char_frac, top_bigram_char_frac) —
    the Rae et al. (Gopher) repetition rules web filters apply after the
    heuristic cascade:

      dup_line_frac       1 - distinct_lines / lines (trimmed, non-empty)
      dup_line_char_frac  chars in repeat occurrences of a line / line chars
      top_bigram_char_frac  chars covered by the most frequent word bigram
                            / doc chars (max of cnt*len, no argmax ties)

    Two explodes + per-doc groupBys (parallelism = documents), left-joined
    back so line-less docs get zeros.  Fully mirrored in the DuckDB
    oracle."""
    from pyspark.sql import functions as F

    base = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("t"))
    ln = (
        base.select("id", F.explode(F.split("t", "\n")).alias("raw"))
        .select("id", F.trim(F.col("raw")).alias("line"))
        .filter(F.col("line") != "")
    )
    per_line = ln.groupBy("id", "line").agg(F.count("*").alias("cnt"))
    lstats = per_line.groupBy("id").agg(
        (1.0 - F.count("*") / F.sum("cnt")).alias("dup_line_frac"),
        (
            F.sum((F.col("cnt") - 1) * F.length("line"))
            / F.greatest(F.sum(F.col("cnt") * F.length("line")), F.lit(1))
        ).alias("dup_line_char_frac"),
    )
    toks = base.select(
        "id",
        F.length("t").alias("n_chars"),
        F.filter(F.split("t", "\\s+"), lambda x: x != "").alias("ws"),
    )
    bigrams = toks.select(
        "id",
        "n_chars",
        F.explode(
            F.when(
                F.size("ws") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("ws") - 1),
                    lambda i: F.concat_ws(" ", F.element_at("ws", i), F.element_at("ws", i + 1)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("bg"),
    )
    per_bg = bigrams.groupBy("id", "n_chars", "bg").agg(F.count("*").alias("cnt"))
    bstats = per_bg.groupBy("id").agg(
        (
            F.max(F.col("cnt") * F.length("bg"))
            / F.greatest(F.first("n_chars"), F.lit(1))
        ).alias("top_bigram_char_frac")
    )
    return (
        base.select(F.col("id"))
        .join(lstats, "id", "left")
        .join(bstats, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.round(F.coalesce("dup_line_frac", F.lit(0.0)), 6).alias("dup_line_frac"),
            F.round(F.coalesce("dup_line_char_frac", F.lit(0.0)), 6).alias("dup_line_char_frac"),
            F.round(F.coalesce("top_bigram_char_frac", F.lit(0.0)), 6).alias("top_bigram_char_frac"),
        )
    )


def repetition_ngram_signals(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_ns: tuple = (3, 4),
    dup_ns: tuple = (5, 10),
):
    """The rest of the Gopher repetition rule family (Rae et al. 2021,
    table A1) beyond ``repetition_signals``'s dup-line / top-bigram pair:

      top_{n}gram_char_frac   chars covered by the single most frequent
                              word n-gram / doc chars  (n in ``top_ns``)
      dup_{n}gram_char_frac   chars of tokens covered by ANY n-gram that
                              occurs >= 2 times, counted once per token
                              position (union of overlapping duplicate
                              spans) / total token chars  (n in ``dup_ns``)

    Shuffle shape: one posexplode of per-position n-grams per n, grouped
    on (doc, gram) — uniform keys, parallelism = documents, no
    cross-doc joins.  The dup variant resolves overlap by exploding each
    duplicate occurrence into its covered token positions and counting
    DISTINCT positions (exactly Gopher's "fraction of characters inside
    duplicate n-grams").  Whitespace chars are excluded from both
    numerator and denominator (token chars only; documented divergence
    from counting raw chars — line/para whitespace is not repetition
    evidence).  Fully mirrored in the DuckDB oracle."""
    from pyspark.sql import functions as F

    base = df.select(
        F.col(id_col).alias("id"),
        F.filter(F.split(F.col(text_col), "\\s+"), lambda x: x != "").alias("ws"),
        F.length(F.col(text_col)).alias("n_chars"),
    )
    tok_chars = base.select(
        "id",
        F.aggregate(
            "ws", F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        ).alias("tok_chars"),
    )
    out = base.select("id")
    for n in top_ns:
        grams = base.select(
            "id",
            "n_chars",
            F.explode(
                F.when(
                    F.size("ws") >= n,
                    F.transform(
                        F.sequence(F.lit(1), F.size("ws") - (n - 1)),
                        lambda i: F.concat_ws(
                            " ", *[F.element_at("ws", i + j) for j in range(n)]
                        ),
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("g"),
        )
        per_g = grams.groupBy("id", "n_chars", "g").agg(F.count("*").alias("cnt"))
        stat = per_g.groupBy("id").agg(
            (
                F.max(F.col("cnt") * F.length("g"))
                / F.greatest(F.first("n_chars"), F.lit(1))
            ).alias(f"top_{n}gram_char_frac")
        )
        out = out.join(stat, "id", "left")
    for n in dup_ns:
        pos_grams = base.select(
            "id",
            F.posexplode(
                F.when(
                    F.size("ws") >= n,
                    F.transform(
                        F.sequence(F.lit(1), F.size("ws") - (n - 1)),
                        lambda i: F.concat_ws(
                            " ", *[F.element_at("ws", i + j) for j in range(n)]
                        ),
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("p", "g"),
        )
        dup = (
            pos_grams.groupBy("id", "g")
            .agg(F.count("*").alias("cnt"), F.collect_list("p").alias("ps"))
            .filter(F.col("cnt") >= 2)
        )
        covered = (
            dup.select(
                "id",
                F.explode(
                    F.flatten(
                        F.transform(
                            "ps", lambda p: F.sequence(p, p + F.lit(n - 1))
                        )
                    )
                ).alias("pos"),
            )
            .distinct()
        )
        toks = base.select(
            "id", F.posexplode("ws").alias("pos", "tok")
        ).select("id", "pos", F.length("tok").alias("tlen"))
        cov_chars = (
            covered.join(toks, ["id", "pos"])
            .groupBy("id")
            .agg(F.sum("tlen").alias("cov"))
        )
        stat = (
            tok_chars.join(cov_chars, "id", "left")
            .select(
                "id",
                (
                    F.coalesce(F.col("cov"), F.lit(0))
                    / F.greatest(F.col("tok_chars"), F.lit(1))
                ).alias(f"dup_{n}gram_char_frac"),
            )
        )
        out = out.join(stat, "id", "left")
    cols = [F.col("id").alias(id_col)]
    for n in top_ns:
        cols.append(
            F.round(F.coalesce(f"top_{n}gram_char_frac", F.lit(0.0)), 6).alias(
                f"top_{n}gram_char_frac"
            )
        )
    for n in dup_ns:
        cols.append(
            F.round(F.coalesce(f"dup_{n}gram_char_frac", F.lit(0.0)), 6).alias(
                f"dup_{n}gram_char_frac"
            )
        )
    return out.select(*cols)
