"""Unit tests for the finalize-formula compiler (no eval, no UDF)."""

import cmath

import pytest
from pyspark.sql import functions as F

from hpctoolkit_dataframe_spark.functions import formulas


CASES = [
    # (formula, raw metric values, expected complex result) — formulas
    # observed in the fixtures (experiment1.xml:245,250,260,274)
    ("$2", {2: 7.5}, 7.5),
    ("$3 / $4", {3: 10.0, 4: 4.0}, 2.5),
    ("sqrt(($6 / $7) - pow($5 / $7, 2))", {5: 2.0, 6: 10.0, 7: 2.0}, 2.0),
    # negative variance -> complex (cmath.sqrt semantics, reference :3)
    ("sqrt(($6 / $7) - pow($5 / $7, 2))", {5: 6.0, 6: 10.0, 7: 2.0},
     cmath.sqrt(5.0 - 9.0)),
    ("sqrt(($9 / $10) - pow($8 / $10, 2)) / ($8 / $10)",
     {8: 6.0, 9: 10.0, 10: 2.0}, cmath.sqrt(5.0 - 9.0) / 3.0),
    ("1 - $2 * 2", {2: 0.25}, 0.5),
    ("-$2 + 3", {2: 1.0}, 2.0),
]


@pytest.mark.parametrize("formula,raw,expected", CASES)
def test_formula_values(spark, formula, raw, expected):
    df = spark.createDataFrame(
        [tuple(float(v) for v in raw.values())],
        [f"m{k}" for k in raw])
    re_, im_ = formulas.compile_formula(formula, lambda n: F.col(f"m{n}"))
    row = df.select(re_.alias("re"),
                    (im_ if im_ is not None else F.lit(0.0)).alias("im")).first()
    expected = complex(expected)
    assert row["re"] == pytest.approx(expected.real, abs=1e-12)
    assert row["im"] == pytest.approx(expected.imag, abs=1e-12)


def test_referenced_ids():
    assert formulas.referenced_metric_ids("sqrt(($6 / $7) - pow($5 / $7, 2))") \
        == {5, 6, 7}


def test_rejects_unknown_function():
    with pytest.raises(ValueError):
        formulas.parse_formula("exec('rm -rf /')")


def test_rejects_garbage():
    with pytest.raises(ValueError):
        formulas.parse_formula("$1 $2")
    with pytest.raises(ValueError):
        formulas.parse_formula("__import__")
