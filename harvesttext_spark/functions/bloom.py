"""Deterministic Bloom filter for bounded seen-set state.

Built for the streaming seen-URL problem (stream_filter.py): exact
first-seen dedup keeps one state-store entry per distinct canonical URL,
which at crawl scale (billions of URLs) is unbounded state.  A Bloom
filter bounds state to a FIXED bit budget at the cost of a false-positive
rate — an FP here means a NOVEL url is wrongly treated as seen (falsely
dropped); there are no false negatives, so a true duplicate is never
re-emitted.

Everything is deterministic (md5 double hashing, no rand()): the same
insert sequence always produces the same bit array and the same FP set —
required by the repo's resume-determinism rule and what makes streaming
checkpoint replay exact.

Standard sizing math (public formulae):
    m = ceil(-n * ln(p) / ln(2)^2)     bits for capacity n at FP p
    k = max(1, round(m / n * ln(2)))   hash count
    p_actual(n_inserted) = (1 - exp(-k * n_inserted / m)) ** k
At p=1e-4 that is ~19.2 bits (2.4 bytes) per element: a 64-shard filter
sized for 1M URLs/shard holds 64M URLs in ~154 MB total state, versus
~64M individual state-store rows for the exact operator.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np


def bloom_params(capacity: int, fp_rate: float) -> tuple[int, int]:
    """(m_bits, k) sized so that after ``capacity`` inserts the FP rate
    is ~``fp_rate``."""
    if capacity <= 0:
        raise ValueError("capacity must be positive")
    if not (0.0 < fp_rate < 1.0):
        raise ValueError("fp_rate must be in (0, 1)")
    m = math.ceil(-capacity * math.log(fp_rate) / (math.log(2) ** 2))
    k = max(1, round(m / capacity * math.log(2)))
    return m, k


def expected_fp_rate(m_bits: int, k: int, n_inserted: int) -> float:
    """Theoretical FP probability after ``n_inserted`` distinct inserts."""
    return (1.0 - math.exp(-k * n_inserted / m_bits)) ** k


class BloomFilter:
    """Fixed-size Bloom filter over strings; serializable to bytes for
    state-store storage.  Double hashing (Kirsch-Mitzenmacher): the k
    probe positions are (h1 + i*h2) mod m from one md5 digest."""

    def __init__(self, m_bits: int, k: int, bits: bytes | None = None):
        self.m = int(m_bits)
        self.k = int(k)
        n_bytes = (self.m + 7) // 8
        if bits is None:
            self.arr = np.zeros(n_bytes, dtype=np.uint8)
        else:
            if len(bits) != n_bytes:
                raise ValueError(
                    f"bit array is {len(bits)} bytes, expected {n_bytes} "
                    f"for m={self.m} (state written with different params?)"
                )
            self.arr = np.frombuffer(bits, dtype=np.uint8).copy()

    @classmethod
    def for_capacity(cls, capacity: int, fp_rate: float) -> "BloomFilter":
        return cls(*bloom_params(capacity, fp_rate))

    def _positions(self, key: str) -> list[int]:
        d = hashlib.md5(key.encode("utf-8")).digest()
        h1 = int.from_bytes(d[:8], "little")
        h2 = int.from_bytes(d[8:], "little") | 1  # odd -> full-period step
        return [(h1 + i * h2) % self.m for i in range(self.k)]

    def __contains__(self, key: str) -> bool:
        return all(
            self.arr[p >> 3] & (1 << (p & 7)) for p in self._positions(key)
        )

    def add(self, key: str) -> None:
        for p in self._positions(key):
            self.arr[p >> 3] |= 1 << (p & 7)

    def test_and_add(self, key: str) -> bool:
        """True iff ``key`` was (possibly) already present; inserts it
        either way.  One digest, one probe pass."""
        seen = True
        for p in self._positions(key):
            byte, bit = p >> 3, 1 << (p & 7)
            if not self.arr[byte] & bit:
                seen = False
                self.arr[byte] |= bit
        return seen

    def to_bytes(self) -> bytes:
        return self.arr.tobytes()

    @property
    def fill_ratio(self) -> float:
        return float(np.unpackbits(self.arr).sum()) / self.m
