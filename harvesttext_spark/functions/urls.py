"""URL canonicalization — the URL-level dedup key a Common-Crawl-style
pipeline needs before exact text dedup (the same page is crawled under
?utm_source=... / #fragment / mixed-case-host variants).

Engine addition (the reference has no URL handling beyond clean_text's
URL REMOVAL).  One whole-stage-codegen regexp chain, mirrored verbatim
in the DuckDB oracle:

  1. lowercase the scheme://host[:port] prefix (path/query stay cased)
  2. strip the #fragment
  3. drop tracking params (utm_*, gclid, fbclid, msclkid; configurable)
  4. tidy separators the param removal left behind (&& / ?& / trailing)
  5. drop default ports (:80 for http, :443 for https)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (pattern, replacement) pairs shared with the SQL mirror — RE2-safe.
# Only UNAMBIGUOUS tracking params by default: a bare `ref` (previous
# default) is functional on some sites (git refs, referral codes that
# change the page), and stripping it collides canonical keys so
# drop_url_dups deletes genuinely distinct pages.  Jobs with a known
# site mix pass their own alternation via `tracking_params`.
TRACKING_PARAMS = "utm_[a-z]+|gclid|fbclid|msclkid"
_PREFIX_RE = "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)"


def url_steps(tracking_params: str = TRACKING_PARAMS) -> list[tuple[str, str]]:
    return [
        ("#.*$", ""),                                          # fragment
        (f"([?&])({tracking_params})=[^&#]*", "$1"),           # tracking params
        ("\\?&+", "?"),                                        # ?&x -> ?x
        ("&&+", "&"),                                          # a&&b -> a&b
        ("[?&]+$", ""),                                        # trailing ? / &
        # default ports — NO lookahead (RE2 has none): capture the
        # optional tail and re-emit it
        ("^(http://[^/?#:]*):80([/?#].*)?$", "$1$2"),
        ("^(https://[^/?#:]*):443([/?#].*)?$", "$1$2"),
    ]


def canonical_url(col: Column, tracking_params: str = TRACKING_PARAMS) -> Column:
    """Canonical form of a URL column — deterministic dedup key.
    Pure Catalyst expressions; NULL in -> NULL out."""
    prefix = F.regexp_extract(col, _PREFIX_RE, 1)
    plen = F.length(prefix)
    tail = col.substr(plen + 1, F.length(col))
    c = F.when(plen > 0, F.concat(F.lower(prefix), tail)).otherwise(col)
    for pat, repl in url_steps(tracking_params):
        c = F.regexp_replace(c, pat, repl)
    return c


def canonical_url_sql(col_expr: str, tracking_params: str = TRACKING_PARAMS) -> str:
    """The same chain as ANSI SQL (DuckDB oracle).  Spark's $1 backref
    becomes RE2's \\1; the chain avoids lookarounds (RE2 has none)."""
    prefix = f"regexp_extract({col_expr}, '{_PREFIX_RE}', 1)"
    c = (
        f"CASE WHEN length({prefix}) > 0 THEN lower({prefix}) || "
        f"substring({col_expr}, length({prefix}) + 1) ELSE {col_expr} END"
    )
    for pat, repl in url_steps(tracking_params):
        # DuckDB string literals are NOT backslash-escaped — the pattern
        # goes in verbatim (doubling \? into \\? turns it into
        # "literal backslash, optional" and corrupts the match)
        p = pat.replace("'", "''")
        r = repl.replace("$", "\\")
        c = f"regexp_replace({c}, '{p}', '{r}', 'g')"
    return c


# --- URL risk heuristics (RefinedWeb-style URL filtering) -------------------

# public-knowledge keyword battery: adult / gambling / pharma-spam / piracy
# tokens whose presence in the HOST or PATH marks a page for review.  Small
# on purpose — production deployments swap in a curated blocklist via the
# `keywords` parameter (the UT1-style domain blocklist is the job's
# --block-domains stage; this is the substring fallback for hosts the
# blocklist has never seen).
URL_RISK_KEYWORDS = (
    "porn", "xxx", "sex", "adult", "escort",
    "casino", "poker", "betting", "slots",
    "viagra", "cialis", "pharma",
    "warez", "crack", "keygen", "torrent",
)


def url_risk_score(col: Column, keywords=URL_RISK_KEYWORDS) -> Column:
    """Count of risk keywords appearing as substrings of the lowercased
    url (host + path + query).  Pure whole-stage-codegen column math —
    one `instr` per keyword, no join, no shuffle; at 100 TB this rides
    the same scan as every other per-row signal.  Substring semantics
    (not token) on purpose: spam hosts glue keywords (`freepornhub`,
    `xxxmovies`); false positives (e.g. `sussex`, `essex`) are why this
    is a SCORE the caller thresholds, not a hard drop."""
    lowered = F.lower(col)
    score = F.lit(0)
    for kw in keywords:
        score = score + F.when(F.instr(lowered, kw) > 0, 1).otherwise(0)
    return score


def url_risk_score_sql(col_expr: str, keywords=URL_RISK_KEYWORDS) -> str:
    """DuckDB mirror of url_risk_score (strpos == instr).  Keywords are
    arbitrary caller input — quotes are doubled so an apostrophe can't
    break (or inject into) the generated SQL literal."""
    terms = " + ".join(
        "CASE WHEN strpos(lower({}), '{}') > 0 THEN 1 ELSE 0 END".format(
            col_expr, kw.replace("'", "''")
        )
        for kw in keywords
    )
    return f"({terms})"
