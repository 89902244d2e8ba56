"""Hashing primitives for dedup/similarity: shingles, MinHash, SimHash.

All pure Column expressions (JVM-side, codegen) — no Python in the hot path.
Two hash families are offered:

- md5-string based (portable: DuckDB computes the identical value, so the
  correctness oracle can replicate signatures bit-for-bit);
- xxhash64 based (the fast path at scale — 64-bit integer math, no hex
  strings; used by the engine's large fan-out stages).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .text import tokens_of


def shingles(text: Column, k: int = 3) -> Column:
    """Word k-gram shingle array (space-joined, lowercase). Shorter docs
    yield one shingle of all their tokens."""
    toks = tokens_of(text)
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1)))
    return F.array_distinct(
        F.when(n >= k, F.transform(idx, lambda i: F.array_join(F.slice(toks, i, k), " ")))
        .otherwise(F.array(F.array_join(toks, " ")))
    )


def minhash_signature(shingle_arr: Column, num_hashes: int = 16) -> Column:
    """MinHash signature as array<string>: element i = min over shingles of
    md5(i || '|' || shingle). String-min is lexicographic — identical in
    Spark and DuckDB, making signatures oracle-checkable."""
    return F.array(
        *[
            F.array_min(F.transform(
                shingle_arr, lambda s, i=i: F.md5(F.concat(F.lit(f"{i}|"), s))
            ))
            for i in range(num_hashes)
        ]
    )


def lsh_band_keys(signature: Column, bands: int, rows: int) -> Column:
    """Banding: split the signature into ``bands`` groups of ``rows`` and
    hash each group → array<string> of band keys. Docs sharing any band key
    are near-dup candidates (classic MinHash-LSH)."""
    return F.array(
        *[
            F.concat(
                F.lit(f"b{b}:"),
                F.md5(F.array_join(F.slice(signature, b * rows + 1, rows), "|")),
            )
            for b in range(bands)
        ]
    )


def simhash64_fast(text: Column) -> Column:
    """64-bit SimHash over distinct whitespace tokens using xxhash64 token
    hashes (JVM integer math — the at-scale path). Bit b of the result is
    the sign of the vote sum over tokens of (bit b present ? +1 : -1)."""
    toks = F.array_distinct(tokens_of(text))
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    votes = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda b: F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + (F.shiftrightunsigned(h, b).bitwiseAND(F.lit(1)) * 2 - 1).cast("int"),
        ),
    )
    return F.aggregate(
        F.zip_with(votes, F.sequence(F.lit(0), F.lit(63)),
                   lambda v, b: F.when(v > 0, F.shiftleft(F.lit(1).cast("long"), b))
                   .otherwise(F.lit(0).cast("long"))),
        F.lit(0).cast("long"),
        lambda acc, x: acc.bitwiseOR(x),
    )


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit signatures (bit_count of xor)."""
    return F.bit_count(a.bitwiseXOR(b))


def jaccard(a_arr: Column, b_arr: Column) -> Column:
    """Exact Jaccard similarity of two string arrays (set semantics)."""
    inter = F.size(F.array_intersect(a_arr, b_arr))
    union = F.size(F.array_union(a_arr, b_arr))
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))
