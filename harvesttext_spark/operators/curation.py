"""Dataset-curation primitives: deterministic splits and samples.

Training-data pipelines need held-out splits and down-samples that are
REPRODUCIBLE across runs, partitionings, and resumes — which rules out
``rand()``/``monotonically_increasing_id`` (this repo's ground rule: no
nondeterminism feeding output).  Both operators key on a salted md5 of
the ID COLUMN, so membership is a pure function of (id, seed): the same
url lands in the same split on every run, any cluster size, any
partition count.  Pure codegen column math on the scan — no shuffle, no
UDF, no driver state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_M = 1_000_000  # ppm grain: fractions resolve to parts-per-million


def _hash_ppm(id_col: Column, seed: int) -> Column:
    """Uniform value in [0, 1e6) from md5(seed || id) — first 15 hex
    digits (60 bits) mod 1e6; portable (conv + mod, mirrorable in SQL)."""
    h = F.md5(F.concat(F.lit(f"{seed}:"), id_col.cast("string")))
    return (F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint") % _M).cast("int")


def hash_split(
    df: DataFrame,
    fractions: dict[str, float],
    id_col: str = "url",
    seed: int = 42,
    out_col: str = "split",
) -> DataFrame:
    """All rows + ``out_col``: the split name chosen by the id's hash
    position against cumulative fraction boundaries (ppm grain).
    Fractions must sum to 1 (±1ppm).  Deterministic, content-keyed:
    duplicate ids always land in the SAME split — no eval-set leakage
    through near-duplicate copies of a page that exact dedup missed by
    id.  NULL ids get NULL split (route explicitly, don't guess)."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-6:
        raise ValueError(f"fractions must sum to 1, got {total}")
    ppm = _hash_ppm(F.col(id_col), seed)
    expr = F.lit(None).cast("string")
    acc = 0
    bounds = []
    for name, frac in fractions.items():
        acc += round(frac * _M)
        bounds.append((name, acc))
    # per-fraction round() can leave the final cumulative bound 1-2 ppm
    # short of _M even when the fractions pass the sum check (e.g.
    # {1/3, 1/3, 1/3} -> 999999): clamp the LAST bound to _M so every
    # ppm value maps to a split — ids must never silently fall out.
    bounds[-1] = (bounds[-1][0], _M)
    # build when-chain from the last bound down so earlier names win ties
    for name, hi in reversed(bounds):
        expr = F.when(ppm < hi, F.lit(name)).otherwise(expr)
    return df.withColumn(out_col, F.when(F.col(id_col).isNull(), None).otherwise(expr))


def sample_by_hash(
    df: DataFrame,
    rate: float,
    id_col: str = "url",
    seed: int = 42,
) -> DataFrame:
    """Deterministic down-sample: keep rows whose id hashes below
    ``rate`` (ppm grain).  Same id -> same decision, every run."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return df.filter(_hash_ppm(F.col(id_col), seed) < int(round(rate * _M)))
