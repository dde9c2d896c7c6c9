"""Canonical hashing (reference X2) + portable hash primitives.

The reference's ``sendHash`` config attaches a canonical hash of each dataset
(``config.schema.json:55-59``; CHANGELOG 1.0.0 "Use jena utils for canonical
hash calculation"). Canonical form here = the dataset's N-Triples lines,
sorted, joined with newlines, SHA-256 — deterministic under partitioning and
row order.

MinHash helpers use md5 (available and byte-identical in both Spark and
DuckDB) so LSH results are oracle-checkable; the lexicographic MIN of the
md5 hex digests of salted shingles is a valid min-wise hash family.
At 100 TB scale md5-as-string is ~2× the bytes of xxhash64-as-long; swap
``minhash_hex`` for ``F.xxhash64`` when oracle parity is not needed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def canonical_hash_agg(nt_line_col: str = "nt_line") -> Column:
    """Aggregate expression: SHA-256 over sorted N-Triples lines.

    Use inside ``groupBy(dataset_id).agg(...)``.
    """
    return F.sha2(
        F.concat_ws("\n", F.array_sort(F.collect_list(nt_line_col))), 256
    ).alias("content_hash")


def sql_canonical_hash_agg(nt_line_expr: str = "nt_line") -> str:
    """DuckDB twin: ``string_agg(... ORDER BY ...)`` == sorted+joined."""
    return f"sha256(string_agg({nt_line_expr}, chr(10) order by {nt_line_expr}))"


def minhash_hex(text: Column, perm: int) -> Column:
    """One min-wise hash: min md5 hex over the salted value.

    Caller applies this per shingle then aggregates with ``F.min``.
    """
    return F.md5(F.concat(F.lit(f"p{perm}:"), text))


def sql_minhash_hex(text_expr: str, perm: int) -> str:
    return f"md5('p{perm}:'||{text_expr})"
