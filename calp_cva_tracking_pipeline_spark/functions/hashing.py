"""Stable cross-engine hashing primitives.

Spark's ``xxhash64``/``hash`` and DuckDB's ``hash`` use different algorithms,
so deduplication / fingerprint operators that must be *verifiable* against an
ANSI-SQL oracle derive integer hashes from md5 hex (identical everywhere).
md5 runs JVM-side in codegen; at 100 TB the hash is a tiny fraction of scan
cost. Engine-internal operators that never need oracle parity (e.g. salting)
can use xxhash64 instead — see ``operators/dedup.py``.

60-bit slices (15 hex chars) keep every intermediate product of the MinHash
universal-hash family ``(a*h + b) mod p`` inside int64.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Mersenne prime 2^31 - 1: universal-hash modulus. a,b < p and (h % p) < p
# keep a*(h%p)+b < 2^62 — no int64 overflow in either engine.
MERSENNE_P = 2_147_483_647


def stable_hash64(col: Column | str) -> Column:
    """First 60 bits of md5 as a non-negative int64 (engine-portable).

    Oracle-SQL equivalent (DuckDB):
    ``CAST(('0x' || substring(md5(x), 1, 15)) AS UBIGINT)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def stable_hash_mod_p(col: Column | str) -> Column:
    """stable_hash64 reduced mod the Mersenne prime (fits universal hashing)."""
    return stable_hash64(col) % F.lit(MERSENNE_P)


def word_hashes(tokens_col: Column) -> Column:
    """array<string> → array<long> of stable hashes (for fingerprints)."""
    return F.transform(tokens_col, lambda w: stable_hash64(w))


def minhash_params(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the universal hash family.

    Generated from a fixed LCG so Python, the Spark plan, and any SQL oracle
    can enumerate the identical family without sharing state.
    """
    params = []
    state = seed
    for _ in range(num_hashes):
        state = (1103515245 * state + 12345) % (2**31)
        a = (state % (MERSENNE_P - 1)) + 1
        state = (1103515245 * state + 12345) % (2**31)
        b = state % MERSENNE_P
        params.append((a, b))
    return params
