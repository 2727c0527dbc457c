"""Unit tests for the as-of join operator (semantics pandas merge_asof
users expect; the backward path is also oracle-checked end-to-end by the
events_asof_attribution driver query)."""

import pytest

from hpctoolkit_dataframe_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [("a", 1, 100), ("a", 2, 205), ("a", 3, 400), ("b", 4, 50)],
        "k string, pid long, t long")
    right = spark.createDataFrame(
        [("a", 10, 100), ("a", 11, 200), ("a", 12, 205), ("a", 13, 300),
         ("c", 14, 1)],
        "k string, rid long, t long")
    return left, right


def _by_pid(df):
    return {r["pid"]: (r["rid"], r["t_right"]) for r in df.collect()}


def test_backward_with_exact(sides):
    left, right = sides
    out = asof_join(left, right, on="k", left_ts="t",
                    right_cols=["rid"])
    got = _by_pid(out)
    assert got[1] == (10, 100)    # exact match allowed
    assert got[2] == (12, 205)    # exact beats earlier 200
    assert got[3] == (13, 300)
    assert got[4] == (None, None)  # key 'b' has no right rows


def test_backward_no_exact(sides):
    left, right = sides
    out = asof_join(left, right, on="k", left_ts="t", right_cols=["rid"],
                    allow_exact_matches=False)
    got = _by_pid(out)
    assert got[1] == (None, None)  # only an exact candidate exists
    assert got[2] == (11, 200)     # exact 205 excluded
    assert got[3] == (13, 300)


def test_forward(sides):
    left, right = sides
    out = asof_join(left, right, on="k", left_ts="t", right_cols=["rid"],
                    direction="forward")
    got = _by_pid(out)
    assert got[1] == (10, 100)
    assert got[2] == (12, 205)
    assert got[3] == (None, None)  # nothing at/after 400


def test_tolerance(sides):
    left, right = sides
    out = asof_join(left, right, on="k", left_ts="t", right_cols=["rid"],
                    tolerance=10)
    got = _by_pid(out)
    assert got[1] == (10, 100)
    assert got[2] == (12, 205)
    assert got[3] == (None, None)  # 400-300 > 10


def test_right_ts_tiebreak(spark):
    # two right rows with identical ts: the larger payload wins,
    # deterministically (matches the oracle's max-id-at-max-ts)
    left = spark.createDataFrame([("a", 1, 10)], "k string, pid long, t long")
    right = spark.createDataFrame(
        [("a", 7, 5), ("a", 9, 5), ("a", 8, 5)], "k string, rid long, t long")
    out = asof_join(left, right, on="k", left_ts="t", right_cols=["rid"])
    assert _by_pid(out)[1] == (9, 5)


def test_asof_property_vs_pandas_merge_asof(spark):
    """Randomized equivalence with pandas merge_asof (backward, exact
    matches).  Right timestamps are unique per key so the tie-break
    convention difference cannot bite."""
    import random

    import pandas as pd

    rng = random.Random(7)
    keys = ["a", "b", "c"]
    left_rows = [(k, i, rng.randrange(0, 500))
                 for i, k in enumerate(rng.choices(keys, k=60))]
    right_ts = {k: rng.sample(range(0, 500), 40) for k in keys}
    right_rows = [(k, 1000 * (ki + 1) + j, t)
                  for ki, k in enumerate(keys)
                  for j, t in enumerate(right_ts[k])]

    left = spark.createDataFrame(left_rows, "k string, pid long, t long")
    right = spark.createDataFrame(right_rows, "k string, rid long, t long")
    got = {r["pid"]: (r["rid"], r["t_right"])
           for r in asof_join(left, right, on="k", left_ts="t",
                              right_cols=["rid"]).collect()}

    lp = pd.DataFrame(left_rows, columns=["k", "pid", "t"]).sort_values("t")
    rp = pd.DataFrame(right_rows, columns=["k", "rid", "t"]).sort_values("t")
    merged = pd.merge_asof(lp, rp, on="t", by="k", direction="backward",
                           suffixes=("", "_r"))
    for row in merged.itertuples():
        rid = None if pd.isna(row.rid) else int(row.rid)
        want = (rid, None if rid is None else
                int(rp.loc[rp.rid == rid, "t"].iloc[0]))
        assert got[row.pid] == want, (row.pid, got[row.pid], want)


def test_null_timestamps(spark):
    left = spark.createDataFrame([("a", 1, 10), ("a", 2, None)],
                                 "k string, pid long, t long")
    right = spark.createDataFrame([("a", 7, 5), ("a", 8, None)],
                                  "k string, rid long, t long")
    got = _by_pid(asof_join(left, right, on="k", left_ts="t",
                            right_cols=["rid"]))
    assert got[1] == (7, 5)        # null-ts right row never matches
    assert got[2] == (None, None)  # null-ts probe matches nothing


@pytest.mark.parametrize("direction,tolerance", [
    ("forward", None), ("backward", 50), ("forward", 50)])
def test_asof_property_modes_vs_pandas(spark, direction, tolerance):
    """Randomized equivalence with pandas merge_asof across direction
    and tolerance modes (unique right ts per key)."""
    import random

    import pandas as pd

    rng = random.Random(13)
    keys = ["a", "b"]
    left_rows = [(k, i, rng.randrange(0, 400))
                 for i, k in enumerate(rng.choices(keys, k=40))]
    right_ts = {k: rng.sample(range(0, 400), 30) for k in keys}
    right_rows = [(k, 1000 * (ki + 1) + j, t)
                  for ki, k in enumerate(keys)
                  for j, t in enumerate(right_ts[k])]

    left = spark.createDataFrame(left_rows, "k string, pid long, t long")
    right = spark.createDataFrame(right_rows, "k string, rid long, t long")
    got = {r["pid"]: r["rid"]
           for r in asof_join(left, right, on="k", left_ts="t",
                              right_cols=["rid"], direction=direction,
                              tolerance=tolerance).collect()}

    lp = pd.DataFrame(left_rows, columns=["k", "pid", "t"]).sort_values("t")
    rp = pd.DataFrame(right_rows, columns=["k", "rid", "t"]).sort_values("t")
    merged = pd.merge_asof(
        lp, rp, on="t", by="k", direction=direction,
        tolerance=tolerance, suffixes=("", "_r"))
    for row in merged.itertuples():
        want = None if pd.isna(row.rid) else int(row.rid)
        assert got[row.pid] == want, (direction, tolerance, row.pid)


@pytest.mark.parametrize("direction,exact,tolerance", [
    ("backward", True, None), ("backward", False, 50),
    ("forward", True, None), ("forward", False, 50)])
def test_time_buckets_identical_to_default(spark, direction, exact,
                                           tolerance):
    """The hot-key pre-split (time_buckets=N) must return EXACTLY the
    default path's rows in every mode — the carry-in stitching is an
    execution detail, not a semantics change."""
    import random

    rng = random.Random(29)
    left_rows = [(rng.choice(["a", "b", "c"]), i, rng.randrange(0, 500))
                 for i in range(200)]
    right_rows = [(rng.choice(["a", "b", "c"]), 10_000 + i,
                   rng.randrange(0, 500)) for i in range(80)]
    left = spark.createDataFrame(left_rows, "k string, pid long, t long")
    right = spark.createDataFrame(right_rows, "k string, rid long, t long")

    kw = dict(on="k", left_ts="t", right_cols=["rid"],
              direction=direction, allow_exact_matches=exact,
              tolerance=tolerance)
    base = sorted(map(tuple, asof_join(left, right, **kw).collect()))
    split = sorted(map(tuple, asof_join(left, right, time_buckets=8,
                                        **kw).collect()))
    assert base == split


def test_time_buckets_single_dominant_key(spark):
    """One key holding ~all rows (the motivating skew case) still
    matches the default path, including across empty buckets."""
    left = spark.createDataFrame(
        [("hot", i, i * 7 % 1000) for i in range(500)]
        + [("cold", 10_000, 3)], "k string, pid long, t long")
    right = spark.createDataFrame(
        # right rows clustered early: later buckets carry in only
        [("hot", 20_000 + i, i * 3 % 120) for i in range(100)],
        "k string, rid long, t long")
    kw = dict(on="k", left_ts="t", right_cols=["rid"])
    base = sorted(map(tuple, asof_join(left, right, **kw).collect()))
    split = sorted(map(tuple, asof_join(left, right, time_buckets=16,
                                        **kw).collect()))
    assert base == split
