"""Punkt-style unsupervised abbreviation detection — the corpus-trained
half of an English sentence model (Kiss & Strunk 2006, "Unsupervised
Multilingual Sentence Boundary Detection").

The reference's en path calls nltk ``sent_tokenize`` (a pretrained punkt
model; ``/root/reference/harvesttext/harvesttext.py:707``) — nltk and its
pickled model are absent from this image, so round 2 shipped a hand list
of abbreviations.  This module closes the gap from scratch: TRAIN the
abbreviation list on the corpus itself with the paper's statistics,
expressed as ONE Spark aggregation pipeline (no Python in the loop, fully
mirrorable in ANSI SQL for the value oracle):

  For each word type ``typ`` (lowercased, final period stripped) with
  ``c_period`` occurrences ending in '.' and ``c_nonperiod`` without:

    p        = n_period_tokens / n_tokens          (corpus period rate)
    ll       = -2 * (c_period*ln(p)    + c_nonperiod*ln(1-p)
                   - c_period*ln(0.99) - c_nonperiod*ln(0.01))
    f_length = exp(-len)          len = chars of typ excluding periods
    f_periods= internal periods + 1
    f_penalty= len ^ -c_nonperiod
    score    = ll * f_length * f_periods * f_penalty
    abbreviation  <=>  score >= 0.3  and c_period > 0

(The log-likelihood ratio compares the null "periods attach to this type
at the corpus rate" against the abbreviation hypothesis "this type takes
a final period with probability 0.99"; short types, internal periods, and
few period-less occurrences all push toward abbreviation — exactly the
paper's type-based stage.  The token-based second stage (orthographic
heuristics for sentence starters) is out of scope; the trained list feeds
the rule splitter's shield.)

Scale: tokenize -> explode -> one groupBy(typ) -> broadcast of the
two-scalar totals row.  One shuffle on typ; candidate cardinality is
vocabulary-sized, orders of magnitude below corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tokens considered by the trainer: alphabetic, possibly with internal or
# final periods (e.g. "etc." "u.s." "Dr.") — matches the SQL mirror exactly
TOKEN_RE = "^[A-Za-z][A-Za-z.]*\\.?$"
ABBREV_THRESHOLD = 0.3
_P_ABBR = 0.99
_EPS = 1e-9


def punkt_abbreviations(
    df: DataFrame, text_col: str = "text", min_count: int = 1
) -> DataFrame:
    """(abbrev, score) for every trained abbreviation type, score rounded
    to 6 places (cross-engine float stability).  Pure DataFrame ops."""
    toks = (
        df.select(F.explode(F.split(F.col(text_col), "\\s+")).alias("tok"))
        .filter(F.col("tok").rlike(TOKEN_RE))
    )
    typed = toks.select(
        F.lower(F.regexp_replace("tok", "\\.$", "")).alias("typ"),
        F.col("tok").endswith(".").cast("long").alias("wp"),
    )
    by_typ = typed.groupBy("typ").agg(
        F.count("*").alias("c_total"), F.sum("wp").alias("c_period")
    )
    totals = typed.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("wp").cast("double").alias("np"),
    )
    # clamp the corpus period rate away from {0,1} so ln() stays finite on
    # degenerate corpora; the SQL mirror applies the same clamp
    j = by_typ.crossJoin(F.broadcast(totals))
    p = F.least(F.greatest(F.col("np") / F.col("n"), F.lit(_EPS)), F.lit(1 - _EPS))
    c_np = F.col("c_total") - F.col("c_period")
    ll = -2.0 * (
        F.col("c_period") * F.log(p)
        + c_np * F.log(1 - p)
        - F.col("c_period") * F.lit(float(__import__("math").log(_P_ABBR)))
        - c_np * F.lit(float(__import__("math").log(1 - _P_ABBR)))
    )
    len_ = F.length(F.regexp_replace("typ", "\\.", ""))
    n_periods = F.length("typ") - len_
    score = (
        ll
        * F.exp(-len_.cast("double"))
        * (n_periods + F.lit(1)).cast("double")
        * F.pow(len_.cast("double"), -c_np.cast("double"))
    )
    return (
        j.withColumn("score", F.round(score, 6))
        .filter(
            (F.col("c_period") > 0)
            & (F.col("c_total") >= min_count)
            & (F.col("score") >= ABBREV_THRESHOLD)
        )
        .select(F.col("typ").alias("abbrev"), "score")
    )


def punkt_abbreviations_sql(table: str = "documents", text_col: str = "text") -> str:
    """The exact same computation as ANSI SQL (DuckDB value oracle)."""
    import math

    ln_p99 = repr(math.log(_P_ABBR))
    ln_p01 = repr(math.log(1 - _P_ABBR))
    return f"""
WITH toks AS (
  SELECT unnest(regexp_split_to_array({text_col}, '\\s+')) AS tok FROM {table}
), cand AS (
  SELECT tok FROM toks WHERE regexp_matches(tok, '{TOKEN_RE}')
), typed AS (
  SELECT lower(regexp_replace(tok, '\\.$', '')) AS typ,
         CASE WHEN tok LIKE '%.' THEN 1 ELSE 0 END AS wp
  FROM cand
), tot AS (
  SELECT count(*)::DOUBLE AS n, sum(wp)::DOUBLE AS np FROM typed
), by_typ AS (
  SELECT typ, count(*) AS c_total, sum(wp) AS c_period FROM typed GROUP BY typ
), scored AS (
  SELECT typ,
         c_period,
         c_total,
         round(
           (-2.0 * (c_period * ln(least(greatest(np / n, {_EPS}), {1 - _EPS}))
                    + (c_total - c_period) * ln(1 - least(greatest(np / n, {_EPS}), {1 - _EPS}))
                    - c_period * ({ln_p99})
                    - (c_total - c_period) * ({ln_p01})))
           * exp(-(length(replace(typ, '.', ''))))
           * (length(typ) - length(replace(typ, '.', '')) + 1)
           * pow(length(replace(typ, '.', '')), -(c_total - c_period)),
         6) AS score
  FROM by_typ CROSS JOIN tot
)
SELECT typ AS abbrev, score
FROM scored
WHERE c_period > 0 AND score >= {ABBREV_THRESHOLD}
"""


def trained_abbrev_list(df: DataFrame, text_col: str = "text") -> list[str]:
    """Driver-side convenience: the trained abbreviation types, sorted.
    Vocabulary-sized collect (same class as the engine's dimension reads)."""
    return sorted(
        r["abbrev"] for r in punkt_abbreviations(df, text_col).collect()
    )


# --- token stage: sentence starters ----------------------------------------
#
# Second stage of the paper (the part nltk ships pretrained): a FIRST-PASS
# boundary assignment (terminator-final previous token that is NOT a trained
# abbreviation), then a per-type log-likelihood ratio between "word" and
# "sentence boundary" (the paper's col_log_likelihood, threshold 30).  Types
# that clear it are FREQUENT SENTENCE STARTERS — strong boundary evidence
# that overrides an abbreviation's non-boundary default in the splitter.

SENT_STARTER_THRESHOLD = 30.0


def _clamp_log(c):
    return F.log(F.least(F.greatest(c, F.lit(_EPS)), F.lit(1.0 - _EPS)))


def punkt_sentence_starters(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    abbrevs: DataFrame | None = None,
) -> DataFrame:
    """(starter, score): word types whose sentence-initial rate clears the
    paper's collocation LLR at threshold 30.

    Relational first-pass boundaries: posexplode tokens per doc, one lag
    window per doc (partition = doc, tiny per-partition sort), left join
    the (vocabulary-sized, broadcast) abbreviation table on the previous
    token's type.  Then one groupBy(typ) + broadcast two-scalar totals —
    same shuffle shape as the type stage."""
    from pyspark.sql import Window

    if abbrevs is None:
        abbrevs = punkt_abbreviations(df, text_col)
    # filter empties in the ARRAY before posexplode so positions match the
    # SQL mirror exactly (filtering after posexplode would keep original
    # indices and un-flag pos==0 on whitespace-leading docs)
    toks = df.select(
        F.col(id_col).alias("_doc"),
        F.posexplode(
            F.filter(F.split(F.col(text_col), "\\s+"), lambda t: t != "")
        ).alias("pos", "tok"),
    )
    w = Window.partitionBy("_doc").orderBy("pos")
    t = toks.withColumn("prev", F.lag("tok").over(w))
    t = t.withColumn(
        "prev_type", F.lower(F.regexp_replace("prev", "\\.$", ""))
    ).withColumn("typ", F.lower(F.regexp_replace("tok", "[.!?,;:]+$", "")))
    ab = abbrevs.select(F.col("abbrev").alias("prev_type"), F.lit(1).alias("_isab"))
    t = t.join(F.broadcast(ab), "prev_type", "left")
    is_start = (F.col("pos") == 0) | (
        F.col("prev").rlike("[.!?]$")
        & ~(F.col("prev").endswith(".") & F.col("_isab").isNotNull())
    )
    t = t.filter(F.col("typ") != "").select(
        "typ", is_start.cast("long").alias("st")
    )
    by_typ = t.groupBy("typ").agg(
        F.count("*").alias("c_total"), F.sum("st").alias("c_start")
    )
    totals = t.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("st").cast("double").alias("nb"),
    )
    j = by_typ.crossJoin(F.broadcast(totals))
    # col_log_likelihood(count_a = boundaries, count_b = word count,
    # count_ab = word-at-boundary count, N) — two-binomial LLR with
    # clamped logs so degenerate cells stay finite; identical clamping in
    # the SQL mirror keeps parity exact.
    ca, cb, cab, n = F.col("nb"), F.col("c_total"), F.col("c_start"), F.col("n")
    p = cb / n
    p1 = cab / ca
    p2 = (cb - cab) / (n - ca)
    s1 = cab * _clamp_log(p) + (ca - cab) * _clamp_log(1 - p)
    s2 = (cb - cab) * _clamp_log(p) + (n - ca - cb + cab) * _clamp_log(1 - p)
    s3 = cab * _clamp_log(p1) + (ca - cab) * _clamp_log(1 - p1)
    s4 = (cb - cab) * _clamp_log(p2) + (n - ca - cb + cab) * _clamp_log(1 - p2)
    score = F.round(-2.0 * (s1 + s2 - s3 - s4), 6)
    return (
        j.withColumn("score", score)
        .filter(
            (F.col("c_start") > 0)
            & (F.col("c_start") < F.col("c_total"))
            & (F.col("score") >= SENT_STARTER_THRESHOLD)
            # starter must be OVER-represented at boundaries, not under-
            # (the LLR is two-sided): boundary rate > corpus boundary rate
            & (F.col("c_start") / F.col("c_total") > F.col("nb") / F.col("n"))
        )
        .select(F.col("typ").alias("starter"), "score")
    )


def punkt_sentence_starters_sql(
    table: str = "documents", text_col: str = "text", abbrev_table_sql: str | None = None
) -> str:
    """The same computation in ANSI SQL (DuckDB oracle): index-lambda
    posexplode mirror, lag window per doc, same clamped two-binomial LLR."""
    ab_sql = abbrev_table_sql or punkt_abbreviations_sql(table, text_col)
    clamp = lambda x: f"ln(least(greatest({x}, {_EPS}), {1 - _EPS}))"  # noqa: E731
    return f"""
WITH abbr AS ({ab_sql}),
toks0 AS (
  SELECT doc_id, unnest(list_transform(
           list_filter(regexp_split_to_array({text_col}, '\\s+'), x -> x != ''),
           (x, i) -> struct_pack(pos := i - 1, tok := x))) AS s
  FROM {table}
),
toks AS (
  SELECT doc_id, s.pos AS pos, s.tok AS tok,
         lag(s.tok) OVER (PARTITION BY doc_id ORDER BY s.pos) AS prev
  FROM toks0
),
typed AS (
  SELECT lower(regexp_replace(tok, '[.!?,;:]+$', '')) AS typ,
         CASE WHEN pos = 0 OR (
                regexp_matches(prev, '[.!?]$')
                AND NOT (prev LIKE '%.' AND lower(regexp_replace(prev, '\\.$', '')) IN (SELECT abbrev FROM abbr))
              ) THEN 1 ELSE 0 END AS st
  FROM toks
),
tt AS (SELECT typ, st FROM typed WHERE typ != ''),
by_typ AS (SELECT typ, count(*) AS c_total, sum(st) AS c_start FROM tt GROUP BY typ),
tot AS (SELECT count(*)::DOUBLE AS n, sum(st)::DOUBLE AS nb FROM tt),
scored AS (
  SELECT typ, c_total, c_start, n, nb,
         round(-2.0 * (
             c_start * {clamp("c_total / n")} + (nb - c_start) * {clamp("1 - c_total / n")}
           + (c_total - c_start) * {clamp("c_total / n")} + (n - nb - c_total + c_start) * {clamp("1 - c_total / n")}
           - (c_start * {clamp("c_start / nb")} + (nb - c_start) * {clamp("1 - c_start / nb")})
           - ((c_total - c_start) * {clamp("(c_total - c_start) / (n - nb)")} + (n - nb - c_total + c_start) * {clamp("1 - (c_total - c_start) / (n - nb)")})
         ), 6) AS score
  FROM by_typ CROSS JOIN tot
)
SELECT typ AS starter, score
FROM scored
WHERE c_start > 0 AND c_start < c_total AND score >= {SENT_STARTER_THRESHOLD}
  AND c_start / c_total > nb / n
"""


def trained_starter_list(df: DataFrame, text_col: str = "text") -> list[str]:
    return sorted(r["starter"] for r in punkt_sentence_starters(df, text_col).collect())


# --- token stage: collocations + orthographic context (round 4) -------------
#
# The remaining two heuristics of the paper's second pass (nltk's
# _second_pass_annotation):
#   * COLLOCATIONS: a period-final initial ("J."), number ("No."-style
#     trained abbreviation), followed by a word it collocates with at
#     LLR >= 7.88 is NOT a boundary ("J. Smith", "No. 4").
#   * ORTHOGRAPHIC CONTEXT: a word seen lowercase somewhere in the corpus
#     and NEVER uppercase sentence-internally is, when capitalized after
#     an abbreviation period, strong BOUNDARY evidence (the capital is
#     not the word's intrinsic casing).
# Both train as one aggregation each over the same first-pass-boundary
# token frame as the starter stage; both fully mirrored in DuckDB.
# Position typing follows nltk's three classes: sentence-START (pos 0 or
# after a non-abbreviation terminator), UNKNOWN (right after an
# abbreviation period — the ambiguous case the model exists to decide),
# and INTERNAL (everything else).  Orthographic mid-uppercase evidence
# counts ONLY the internal class: an uppercase occurrence in an unknown
# position must not poison a type's boundary evidence.

COLLOCATION_THRESHOLD = 7.88
MIN_COLLOC_FREQ = 1
_TYPE_STRIP = "[.!?,;:]+$"


def _first_pass_frame(
    df: DataFrame,
    text_col: str,
    id_col: str,
    abbrevs: DataFrame,
):
    """Shared token frame of the token-stage trainers: (pos, tok, prev,
    typ, st, unk) with first-pass boundaries (st: pos==0, or
    terminator-final previous token that is not a trained abbreviation)
    and nltk's UNKNOWN position class (unk: right after an abbreviation
    period — ambiguous, neither boundary nor internal evidence).  One
    lag window per doc (tiny per-partition sort), broadcast
    abbreviation join."""
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col).alias("_doc"),
        F.posexplode(
            F.filter(F.split(F.col(text_col), "\\s+"), lambda t: t != "")
        ).alias("pos", "tok"),
    )
    w = Window.partitionBy("_doc").orderBy("pos")
    t = toks.withColumn("prev", F.lag("tok").over(w))
    t = t.withColumn(
        "prev_type", F.lower(F.regexp_replace("prev", "\\.$", ""))
    ).withColumn("typ", F.lower(F.regexp_replace("tok", _TYPE_STRIP, "")))
    ab = abbrevs.select(F.col("abbrev").alias("prev_type"), F.lit(1).alias("_isab"))
    t = t.join(F.broadcast(ab), "prev_type", "left")
    after_abbr = (
        F.col("prev").endswith(".") & F.col("_isab").isNotNull()
    )
    is_start = (F.col("pos") == 0) | (
        F.col("prev").rlike("[.!?]$") & ~after_abbr
    )
    return t.withColumn("st", is_start.cast("long")).withColumn(
        "unk", ((~is_start) & after_abbr).cast("long")
    )


def _col_ll(ca, cb, cab, n):
    """Dunning two-binomial collocation log-likelihood (the paper's
    col_log_likelihood; same clamped form the starter stage uses)."""
    p = cb / n
    p1 = cab / ca
    p2 = (cb - cab) / (n - ca)
    s1 = cab * _clamp_log(p) + (ca - cab) * _clamp_log(1 - p)
    s2 = (cb - cab) * _clamp_log(p) + (n - ca - cb + cab) * _clamp_log(1 - p)
    s3 = cab * _clamp_log(p1) + (ca - cab) * _clamp_log(1 - p1)
    s4 = (cb - cab) * _clamp_log(p2) + (n - ca - cb + cab) * _clamp_log(1 - p2)
    return -2.0 * (s1 + s2 - s3 - s4)


def punkt_collocations(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    abbrevs: DataFrame | None = None,
) -> DataFrame:
    """(w1, w2, score): candidate pairs — a period-final token whose type
    is a trained abbreviation, a single-letter initial, or a number,
    plus its successor — whose corpus-wide LLR clears 7.88 with
    over-representation (cab*N > c1*c2).  Shuffle shape: the shared lag
    frame, one groupBy(pair), vocabulary-sized count joins."""
    if abbrevs is None:
        abbrevs = punkt_abbreviations(df, text_col)
    t = _first_pass_frame(df, text_col, id_col, abbrevs)
    tt = t.filter(F.col("typ") != "").select("typ")
    counts = tt.groupBy("typ").agg(F.count("*").alias("c"))
    totals = tt.agg(F.count("*").cast("double").alias("n"))
    t1 = F.lower(F.regexp_replace("prev", _TYPE_STRIP, ""))
    cand = (
        t.filter(
            F.col("prev").endswith(".")
            & (F.col("typ") != "")
            & (t1 != "")
            & (
                F.col("_isab").isNotNull()
                | t1.rlike("^[a-z]$")
                | t1.rlike("^[0-9][0-9.,]*$")
            )
        )
        .select(t1.alias("w1"), F.col("typ").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("cab"))
    )
    j = (
        cand.join(F.broadcast(counts.select(F.col("typ").alias("w1"), F.col("c").alias("c1"))), "w1")
        .join(F.broadcast(counts.select(F.col("typ").alias("w2"), F.col("c").alias("c2"))), "w2")
        .crossJoin(F.broadcast(totals))
    )
    score = F.round(
        _col_ll(F.col("c1"), F.col("c2"), F.col("cab"), F.col("n")), 6
    )
    return (
        j.withColumn("score", score)
        .filter(
            (F.col("cab") >= MIN_COLLOC_FREQ)
            & (F.col("score") >= COLLOCATION_THRESHOLD)
            & (F.col("cab") * F.col("n") > F.col("c1") * F.col("c2"))
        )
        .select("w1", "w2", "score")
    )


def punkt_ortho_context(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    abbrevs: DataFrame | None = None,
) -> DataFrame:
    """(typ, lc_any, mid_uc) for every type seen uppercase-first at least
    once — the orthographic-context table the boundary decision consults:
    a capitalized word after an abbreviation period is a boundary iff
    lc_any AND NOT mid_uc (seen lowercase somewhere, never capitalized
    sentence-internally).  Positions right after an abbreviation period
    are nltk's UNKNOWN class and count as NEITHER internal nor boundary
    ('Smith' in a corpus of 'Dr. Smith' sightings has no mid-uc
    evidence — the ambiguous position can't testify).  One groupBy(typ)
    of boolean aggregates."""
    if abbrevs is None:
        abbrevs = punkt_abbreviations(df, text_col)
    t = _first_pass_frame(df, text_col, id_col, abbrevs)
    t = t.filter(F.col("typ") != "").select(
        "typ",
        F.col("tok").rlike("^[a-z]").cast("long").alias("lc"),
        F.col("tok").rlike("^[A-Z]").cast("long").alias("uc"),
        ((F.col("st") == 0) & (F.col("unk") == 0)).cast("long").alias("mid"),
    )
    agg = t.groupBy("typ").agg(
        (F.sum("lc") > 0).alias("lc_any"),
        (F.sum("uc") > 0).alias("uc_any"),
        (F.sum(F.col("uc") * F.col("mid")) > 0).alias("mid_uc"),
    )
    return agg.filter(F.col("uc_any")).select("typ", "lc_any", "mid_uc")


def punkt_collocations_sql(
    table: str = "documents", text_col: str = "text", abbrev_table_sql: str | None = None
) -> str:
    """punkt_collocations as ANSI SQL (DuckDB oracle) — same lag-window
    first pass, same clamped two-binomial LLR."""
    ab_sql = abbrev_table_sql or punkt_abbreviations_sql(table, text_col)
    clamp = lambda x: f"ln(least(greatest({x}, {_EPS}), {1 - _EPS}))"  # noqa: E731
    return f"""
WITH abbr AS ({ab_sql}),
toks0 AS (
  SELECT doc_id, unnest(list_transform(
           list_filter(regexp_split_to_array({text_col}, '\\s+'), x -> x != ''),
           (x, i) -> struct_pack(pos := i - 1, tok := x))) AS s
  FROM {table}
),
toks AS (
  SELECT doc_id, s.pos AS pos, s.tok AS tok,
         lag(s.tok) OVER (PARTITION BY doc_id ORDER BY s.pos) AS prev
  FROM toks0
),
typed AS (
  SELECT tok, prev,
         lower(regexp_replace(tok, '{_TYPE_STRIP}', '')) AS typ,
         lower(regexp_replace(prev, '{_TYPE_STRIP}', '')) AS t1
  FROM toks
),
tt AS (SELECT typ FROM typed WHERE typ != ''),
counts AS (SELECT typ, count(*) AS c FROM tt GROUP BY typ),
tot AS (SELECT count(*)::DOUBLE AS n FROM tt),
cand AS (
  SELECT t1 AS w1, typ AS w2, count(*) AS cab
  FROM typed
  WHERE prev LIKE '%.' AND typ != '' AND t1 != ''
    AND (lower(regexp_replace(prev, '\\.$', '')) IN (SELECT abbrev FROM abbr)
         OR regexp_matches(t1, '^[a-z]$')
         OR regexp_matches(t1, '^[0-9][0-9.,]*$'))
  GROUP BY t1, typ
),
scored AS (
  SELECT w1, w2, cab, c1.c AS c1, c2.c AS c2, n,
         round(-2.0 * (
             cab * {clamp("c2.c / n")} + (c1.c - cab) * {clamp("1 - c2.c / n")}
           + (c2.c - cab) * {clamp("c2.c / n")} + (n - c1.c - c2.c + cab) * {clamp("1 - c2.c / n")}
           - (cab * {clamp("cab / c1.c")} + (c1.c - cab) * {clamp("1 - cab / c1.c")})
           - ((c2.c - cab) * {clamp("(c2.c - cab) / (n - c1.c)")} + (n - c1.c - c2.c + cab) * {clamp("1 - (c2.c - cab) / (n - c1.c)")})
         ), 6) AS score
  FROM cand
  JOIN counts c1 ON cand.w1 = c1.typ
  JOIN counts c2 ON cand.w2 = c2.typ
  CROSS JOIN tot
)
SELECT w1, w2, score
FROM scored
WHERE cab >= {MIN_COLLOC_FREQ} AND score >= {COLLOCATION_THRESHOLD}
  AND cab * n > c1 * c2
"""


def punkt_ortho_context_sql(
    table: str = "documents", text_col: str = "text", abbrev_table_sql: str | None = None
) -> str:
    """punkt_ortho_context as ANSI SQL (DuckDB oracle)."""
    ab_sql = abbrev_table_sql or punkt_abbreviations_sql(table, text_col)
    return f"""
WITH abbr AS ({ab_sql}),
toks0 AS (
  SELECT doc_id, unnest(list_transform(
           list_filter(regexp_split_to_array({text_col}, '\\s+'), x -> x != ''),
           (x, i) -> struct_pack(pos := i - 1, tok := x))) AS s
  FROM {table}
),
toks AS (
  SELECT doc_id, s.pos AS pos, s.tok AS tok,
         lag(s.tok) OVER (PARTITION BY doc_id ORDER BY s.pos) AS prev
  FROM toks0
),
typed AS (
  SELECT lower(regexp_replace(tok, '{_TYPE_STRIP}', '')) AS typ,
         CASE WHEN regexp_matches(tok, '^[a-z]') THEN 1 ELSE 0 END AS lc,
         CASE WHEN regexp_matches(tok, '^[A-Z]') THEN 1 ELSE 0 END AS uc,
         -- three position classes: START (0), UNKNOWN after an
         -- abbreviation period (0 — ambiguous, no internal evidence),
         -- INTERNAL (1)
         CASE WHEN pos = 0 OR (
                regexp_matches(prev, '[.!?]$')
                AND NOT (prev LIKE '%.' AND lower(regexp_replace(prev, '\\.$', '')) IN (SELECT abbrev FROM abbr))
              ) THEN 0
              WHEN prev LIKE '%.' AND lower(regexp_replace(prev, '\\.$', '')) IN (SELECT abbrev FROM abbr)
              THEN 0
              ELSE 1 END AS mid
  FROM toks
),
agg AS (
  SELECT typ,
         sum(lc) > 0 AS lc_any,
         sum(uc) > 0 AS uc_any,
         sum(uc * mid) > 0 AS mid_uc
  FROM typed WHERE typ != '' GROUP BY typ
)
SELECT typ, lc_any, mid_uc FROM agg WHERE uc_any
"""


def trained_collocation_set(df: DataFrame, text_col: str = "text") -> set[tuple[str, str]]:
    """Driver-side convenience: trained (w1, w2) collocation type pairs."""
    return {
        (r["w1"], r["w2"]) for r in punkt_collocations(df, text_col).collect()
    }


def trained_ortho_starter_list(df: DataFrame, text_col: str = "text") -> list[str]:
    """Types whose capitalization after an abbreviation period is boundary
    evidence: seen lowercase somewhere, never uppercase mid-sentence."""
    return sorted(
        r["typ"]
        for r in punkt_ortho_context(df, text_col).collect()
        if r["lc_any"] and not r["mid_uc"]
    )
