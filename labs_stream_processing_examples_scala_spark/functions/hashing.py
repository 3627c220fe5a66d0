"""Deterministic cross-engine hashing primitives.

The dedup / fingerprint operators must be oracle-checkable: the Spark
plan and the DuckDB SQL have to compute bit-identical hashes. Neither
engine's built-in hash matches the other (Spark = Murmur3, DuckDB =
its own), so the engine uses explicit integer arithmetic both sides:

    rolling hash:  h := (h * 31 + codepoint) mod P,   P = 1e9+7
    minhash perm:  h_i := (A_i * h + B_i) mod P       (A_i, B_i fixed)
    band hash:     fold of 4 signature slots with the same *31 fold

All values stay < P < 2^30, so every intermediate fits comfortably in a
64-bit signed integer in both engines (A_i * h < 2^60). Text fixtures
are ASCII; ``ascii()`` (Spark) and ``ord()`` (DuckDB) agree on code
points regardless.

Scale note: the rolling hash is a per-row Catalyst higher-order function
(aggregate over split) — JVM-side, no Python, no shuffle; it
whole-stage-codegens like any other projection.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

P = 1_000_000_007

# MinHash permutation constants (Knuth multiplicative + odd offsets),
# generated once so Spark and the SQL builder share literals.
NUM_PERMS = 16
A = [(2654435761 * (i + 1)) % P for i in range(NUM_PERMS)]
B = [(40503 * (i + 1) * (i + 1) + 17) % P for i in range(NUM_PERMS)]

BANDS = 4
ROWS_PER_BAND = NUM_PERMS // BANDS


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def rolling_hash(col: Column | str) -> Column:
    """(h*31 + code) mod P over the string's characters (fold from 0)."""
    codes = F.transform(F.split(_col(col), ""), lambda c: F.ascii(c).cast("long"))
    return F.aggregate(codes, F.lit(0).cast("long"), lambda h, c: (h * 31 + c) % P)


def rolling_hash_sql(expr: str) -> str:
    """DuckDB SQL computing exactly :func:`rolling_hash` (prepending the
    0 seed because list_reduce seeds with the first element)."""
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split({expr}, ''), c -> ord(c))), "
        f"(h, c) -> (h * 31 + c) % {P})"
    )


def rolling_hash_word(col: Column | str) -> Column:
    """Alias of :func:`rolling_hash` for per-word hashing (the shingle
    fast path hashes each word once, then composes)."""
    return rolling_hash(col)


def compose_hashes(cols: list[Column]) -> Column:
    """Fold word hashes into a shingle hash: acc := (acc*31 + h) mod P,
    seeded by the first hash. Values stay < P so acc*31 + h < 2^35."""
    acc = cols[0]
    for c in cols[1:]:
        acc = (acc * 31 + c) % P
    return acc


def compose_hashes_sql(exprs: list[str]) -> str:
    acc = exprs[0]
    for e in exprs[1:]:
        acc = f"(({acc}) * 31 + ({e})) % {P}"
    return acc


def minhash_slot(base_hash: Column | str, i: int) -> Column:
    """Permuted hash for slot i: (A_i * h + B_i) mod P."""
    return (F.lit(A[i]) * _col(base_hash) + F.lit(B[i])) % P


def minhash_slot_sql(expr: str, i: int) -> str:
    return f"(({A[i]} * {expr} + {B[i]}) % {P})"


def band_hash(slots: list[Column]) -> Column:
    """Fold ROWS_PER_BAND signature slots into one band bucket key."""
    acc = slots[0]
    for s in slots[1:]:
        acc = (acc * 31 + s) % P
    return acc


def band_hash_sql(exprs: list[str]) -> str:
    acc = exprs[0]
    for e in exprs[1:]:
        acc = f"(({acc}) * 31 + ({e})) % {P}"
    return acc


# 32-bit word hash for SimHash: same fold, power-of-two modulus so bit
# extraction is well-defined and identical cross-engine.
M32 = 1 << 32


def word_hash32(col: Column | str) -> Column:
    codes = F.transform(F.split(_col(col), ""), lambda c: F.ascii(c).cast("long"))
    return F.aggregate(codes, F.lit(0).cast("long"), lambda h, c: (h * 31 + c) % M32)


def word_hash32_sql(expr: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split({expr}, ''), c -> ord(c))), "
        f"(h, c) -> (h * 31 + c) % {M32})"
    )


# Second independent rolling-hash family (multiplier 37, prime P2) for
# operators that need a near-injective key: one 30-bit hash collides
# visibly at corpus scale (birthday bound ~50k keys), so span-dedup
# combines two independent 30-bit hashes into one ~59-bit key:
#     key = h1 * 2^30 + (h2 mod 2^30)
# Both factors are per-character folds — same shape as rolling_hash, so
# the DuckDB oracle reproduces them exactly.
P2 = 999_999_937
COMBINE = 1 << 30


def rolling_hash2(col: Column | str) -> Column:
    """(h*37 + code) mod P2 over the string's characters (fold from 0)."""
    codes = F.transform(F.split(_col(col), ""), lambda c: F.ascii(c).cast("long"))
    return F.aggregate(codes, F.lit(0).cast("long"), lambda h, c: (h * 37 + c) % P2)


def rolling_hash2_sql(expr: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split({expr}, ''), c -> ord(c))), "
        f"(h, c) -> (h * 37 + c) % {P2})"
    )


def combine_hashes(h1: Column, h2: Column) -> Column:
    """~59-bit key from two independent 30-bit hashes (fits in a long)."""
    return h1 * F.lit(COMBINE) + (h2 % F.lit(COMBINE))


def combine_hashes_sql(e1: str, e2: str) -> str:
    return f"(({e1}) * {COMBINE} + (({e2}) % {COMBINE}))"
