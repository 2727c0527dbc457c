"""Pin the multiset-digest compare (oracle_hash.py).

The digest replaces ``collect()`` in oracle_check above a row
threshold, so its canonicalization must be exactly as strict as the
exact path's Python tuple compare: width-blind on ints, -0.0 == +0.0,
NaN == NaN, NULL distinct from 0/""/NaN, and any single changed value
must flip the digest.
"""

from __future__ import annotations

import math

import duckdb
import pyarrow as pa
import pytest

from hpctoolkit_dataframe_spark import oracle_hash as oh


def _digest(rows, schema, cols=None):
    batch = pa.RecordBatch.from_pylist(rows, schema=schema)
    return oh.batch_digest(batch, cols or [f.name for f in schema])


S_IDV = pa.schema([("id", pa.int64()), ("v", pa.float64()),
                   ("s", pa.string())])


def test_order_insensitive_and_batch_split_invariant():
    rows = [{"id": i, "v": i * 0.5, "s": f"r{i}"} for i in range(100)]
    full = _digest(rows, S_IDV)
    assert full == _digest(rows[::-1], S_IDV)
    halves = oh.fold([_digest(rows[:37], S_IDV), _digest(rows[37:], S_IDV)])
    assert halves == full


def test_value_change_detected_each_column():
    rows = [{"id": 1, "v": 2.0, "s": "a"}, {"id": 2, "v": 3.0, "s": "b"}]
    base = _digest(rows, S_IDV)
    for mut in ({"id": 9, "v": 2.0, "s": "a"},
                {"id": 1, "v": 2.0000000001, "s": "a"},
                {"id": 1, "v": 2.0, "s": "A"}):
        assert _digest([mut, rows[1]], S_IDV) != base


def test_null_distinct_from_zero_empty_nan():
    s = pa.schema([("x", pa.int64())])
    assert _digest([{"x": None}], s) != _digest([{"x": 0}], s)
    sf = pa.schema([("x", pa.float64())])
    assert _digest([{"x": None}], sf) != _digest([{"x": 0.0}], sf)
    assert _digest([{"x": None}], sf) != _digest([{"x": float("nan")}], sf)
    ss = pa.schema([("x", pa.string())])
    assert _digest([{"x": None}], ss) != _digest([{"x": ""}], ss)


def test_exact_path_equivalences_mirrored():
    # int width-blind
    s32 = pa.schema([("x", pa.int32())])
    s64 = pa.schema([("x", pa.int64())])
    assert _digest([{"x": 7}], s32) == _digest([{"x": 7}], s64)
    # -0.0 == +0.0, NaN == NaN (any payload)
    sf = pa.schema([("x", pa.float64())])
    assert _digest([{"x": -0.0}], sf) == _digest([{"x": 0.0}], sf)
    nan2 = float.fromhex("0x1.fffffffffffffp+1023") * math.inf * 0  # nan
    assert _digest([{"x": float("nan")}], sf) == _digest([{"x": nan2}], sf)


def test_column_order_param_not_row_order_matters():
    rows = [{"id": 1, "v": 2.0, "s": "a"}]
    a = _digest(rows, S_IDV, cols=["id", "s", "v"])
    b = _digest(rows, S_IDV, cols=["v", "s", "id"])
    assert a != b  # column role is positional in the digest...
    # ...so both engines must use the same sorted(cols) order
    assert _digest(rows, S_IDV, cols=sorted(["id", "v", "s"])) == \
        _digest(rows, S_IDV, cols=sorted(["v", "s", "id"]))


def test_unsupported_type_raises():
    s = pa.schema([("t", pa.timestamp("us"))])
    with pytest.raises(ValueError, match="unsupported"):
        _digest([{"t": 0}], s)


def test_spark_equals_duckdb_digest(spark):
    rows = [(i, None if i % 7 == 0 else i / 3.0,
             None if i % 11 == 0 else f"s{i % 5}") for i in range(1000)]
    sdf = spark.createDataFrame(rows, "id bigint, v double, s string")
    cols = sorted(sdf.columns)
    s_dig = oh.spark_digest(sdf, cols)

    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, v DOUBLE, s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    d_dig = oh.duckdb_digest(con.execute("SELECT * FROM t"), cols)
    assert s_dig == d_dig
    assert s_dig[0] == 1000

    # one changed cell in 1000 rows must flip it
    con.execute("UPDATE t SET v = v + 1e-12 WHERE id = 500")
    assert oh.duckdb_digest(con.execute("SELECT * FROM t"), cols) != s_dig
