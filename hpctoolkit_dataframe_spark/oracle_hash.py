"""Order-insensitive multiset digest for cross-engine result compare.

``tools/oracle_check.py`` verifies every registry entry's values against
its DuckDB oracle.  Collecting both result sets into Python tuples is
exact but O(result) in driver memory — at the 100x clone several CCT
entries return ~62M rows and ``collect()`` dies long before the engine
does (the query itself finishes in ~70 s).  A correctness gate that
cannot scale past the engine it gates is the wrong design at 100 TB.

This module computes a canonical per-row 64-bit hash over Arrow record
batches and folds rows into an order-insensitive digest
``(n, sum(h) mod 2^64, sum(mix(h)) mod 2^64)``.  Digests are additive,
so the Spark side reduces them per partition via ``mapInArrow`` (no row
ever reaches the driver) and the DuckDB side streams record batches;
equality of digests attests multiset equality of results up to 64-bit
collision odds (two independent 64-bit sums must both collide).

Exactness does NOT depend on any cross-engine hash agreement: BOTH
engines' batches pass through this same canonicalizer, so a value pair
hashes equal iff the canonical forms are bit-identical — the same
strictness the driver's value-hash gate applies.  Canonical forms:

- integers (any width) -> int64 two's-complement bits (the exact-path
  Python compare is width-blind the same way);
- floats -> float64 bits with -0.0 -> +0.0 and all NaNs -> one NaN
  (mirrors the exact path, where ``0.0 == -0.0`` and NaN==NaN);
- strings -> siphash of UTF-8 bytes (pandas ``hash_array``, fixed key);
- bool -> int64; decimal -> decimal text (integer-exact at scale 0);
- NULL -> a fixed constant, distinct from every value above (Arrow
  null masks distinguish NULL from NaN on both engines);
- timestamps / arrays / maps raise — the repo's output contract
  (queries/__init__.py docstring) already bans them from results.

Worker-side use requires by-value pickling (see ``_pickle.py``); the
Spark closure in oracle_check registers this module before mapInArrow.
"""

from __future__ import annotations

from typing import Iterable, Tuple

_MASK = (1 << 64) - 1
_NULL_HASH = 0x9E3779B97F4A7C15
_FNV_OFFSET = 0xCBF29CE484222325


def _mix64(x):
    """splitmix64 finalizer, vectorized over a uint64 ndarray."""
    import numpy as np

    x = (x + np.uint64(0x9E3779B97F4A7C15))
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _column_hashes(col):
    """uint64 per-row hashes for one pyarrow ChunkedArray/Array."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = col.type
    null_mask = pc.is_null(col).to_numpy(zero_copy_only=False)
    if pa.types.is_integer(t):
        vals = pc.cast(col.fill_null(0), pa.int64()).to_numpy(
            zero_copy_only=False).astype(np.int64, copy=False)
        h = _mix64(vals.view(np.uint64))
    elif pa.types.is_floating(t):
        vals = pc.cast(col.fill_null(0.0), pa.float64()).to_numpy(
            zero_copy_only=False).astype(np.float64, copy=False).copy()
        vals[vals == 0.0] = 0.0          # -0.0 -> +0.0
        vals[np.isnan(vals)] = np.nan    # all NaN payloads -> canonical
        h = _mix64(vals.view(np.uint64))
    elif pa.types.is_boolean(t):
        vals = pc.cast(col.fill_null(False), pa.int64()).to_numpy(
            zero_copy_only=False).astype(np.int64, copy=False)
        h = _mix64(vals.view(np.uint64))
    elif pa.types.is_string(t) or pa.types.is_large_string(t):
        from pandas.util import hash_array

        arr = col.fill_null("").to_pandas().to_numpy(dtype=object)
        h = hash_array(arr, categorize=True).astype(np.uint64, copy=False)
    elif pa.types.is_decimal(t):
        from pandas.util import hash_array

        arr = pc.cast(col.fill_null(0), pa.string()).to_pandas().to_numpy(
            dtype=object)
        h = hash_array(arr, categorize=True).astype(np.uint64, copy=False)
    else:
        raise ValueError(
            f"hash-compare: unsupported result column type {t} — the "
            "output contract bans it (queries/__init__.py docstring)")
    if null_mask.any():
        h = h.copy()
        h[null_mask] = np.uint64(_NULL_HASH)
    return h


def batch_digest(batch, col_order) -> Tuple[int, int, int]:
    """(n, s1, s2) digest of one RecordBatch, columns taken in col_order."""
    import numpy as np

    n = batch.num_rows
    if n == 0:
        return 0, 0, 0
    row = np.full(n, np.uint64(_FNV_OFFSET), dtype=np.uint64)
    for name in col_order:
        row = _mix64(row ^ _column_hashes(batch.column(batch.schema
                                                       .get_field_index(name))))
    s1 = int(np.sum(row, dtype=np.uint64))
    s2 = int(np.sum(_mix64(row), dtype=np.uint64))
    return n, s1, s2


def fold(digests: Iterable[Tuple[int, int, int]]) -> Tuple[int, int, int]:
    n = s1 = s2 = 0
    for dn, d1, d2 in digests:
        n += dn
        s1 = (s1 + d1) & _MASK
        s2 = (s2 + d2) & _MASK
    return n, s1, s2


def spark_digest(sdf, col_order) -> Tuple[int, int, int]:
    """Digest a Spark DataFrame distributively: one (n,s1,s2) row per
    partition via mapInArrow; only partition digests reach the driver."""
    from . import _pickle

    _pickle.register_module_by_value(__name__)
    cols = list(col_order)
    # capture as locals: a runtime package import inside the worker fn
    # would fail on executors (CLAUDE.md worker-side import rule)
    _digest, _fold = batch_digest, fold

    def per_partition(batches):
        import pyarrow as pa

        acc = (0, 0, 0)
        for b in batches:
            acc = _fold([acc, _digest(b, cols)])
        # uint64 sums reinterpreted as int64 for the BIGINT columns
        def signed(v):
            return v - (1 << 64) if v >= (1 << 63) else v

        yield pa.RecordBatch.from_pylist(
            [{"n": acc[0], "s1": signed(acc[1]), "s2": signed(acc[2])}],
            schema=pa.schema([("n", pa.int64()), ("s1", pa.int64()),
                              ("s2", pa.int64())]))

    out = sdf.select(*cols).mapInArrow(
        per_partition, "n bigint, s1 bigint, s2 bigint").collect()
    return fold((r.n, r.s1 & _MASK, r.s2 & _MASK) for r in out)


def duckdb_digest(result, col_order,
                  rows_per_batch: int = 1 << 20) -> Tuple[int, int, int]:
    """Digest a DuckDB result by streaming Arrow record batches."""
    reader = result.fetch_record_batch(rows_per_batch)
    acc = (0, 0, 0)
    for batch in reader:
        acc = fold([acc, batch_digest(batch, col_order)])
    return acc
