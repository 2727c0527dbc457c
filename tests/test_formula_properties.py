"""Property test: random formulas vs direct Python cmath evaluation.

Generates random ASTs in the reference's finalize-formula grammar
($N, + - * /, pow, sqrt), renders them to text, compiles through the
engine's parser->Column pipeline, and compares against evaluating the
same text with Python cmath semantics (the reference eval's behavior,
hpctoolkit_dataframe.py:59-76) — including negative sqrt (complex),
zero denominators (engine: NULL; python: ZeroDivisionError) and missing
metrics (engine: NULL; python: TypeError)."""

import cmath
import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hpctoolkit_dataframe_spark.functions import formulas

METRIC_IDS = [2, 3, 4]


@st.composite
def formula(draw, depth=0):
    if depth >= 3 or draw(st.booleans()):
        if draw(st.booleans()):
            return f"${draw(st.sampled_from(METRIC_IDS))}"
        return str(draw(st.integers(0, 9)))
    kind = draw(st.sampled_from(["+", "-", "*", "/", "sqrt", "pow", "paren"]))
    if kind == "sqrt":
        inner = draw(formula(depth=depth + 1))
        # engine restriction: sqrt over provably-complex args unsupported
        if "sqrt" in inner:
            return f"sqrt(${draw(st.sampled_from(METRIC_IDS))})"
        return f"sqrt({inner})"
    if kind == "pow":
        a = draw(formula(depth=depth + 1))
        b = str(draw(st.integers(0, 3)))
        if "sqrt" in a:
            a = f"${draw(st.sampled_from(METRIC_IDS))}"
        return f"pow({a}, {b})"
    if kind == "paren":
        return f"({draw(formula(depth=depth + 1))})"
    a = draw(formula(depth=depth + 1))
    b = draw(formula(depth=depth + 1))
    if kind in "*/" and "sqrt" in b:
        b = str(draw(st.integers(1, 9)))
    return f"{a} {kind} {b}"


def _python_eval(text, values):
    env = {"sqrt": cmath.sqrt, "pow": pow}
    expr = text
    for mid, v in values.items():
        expr = expr.replace(f"${mid}", f"({v!r})")
    return eval(expr, env)  # trusted test-local text


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(text=formula(),
       vals=st.tuples(*[st.integers(-5, 9) for _ in METRIC_IDS]))
def test_formula_matches_cmath(spark, text, vals):
    values = dict(zip(METRIC_IDS, [float(v) for v in vals]))
    try:
        expected = complex(_python_eval(text, values))
    except ZeroDivisionError:
        expected = None  # engine: try_divide -> NULL
    except ValueError:
        return  # e.g. 0**negative — not generated, but guard anyway

    try:
        re_, im_ = formulas.compile_formula(
            text, lambda n: F.lit(values[n]))
    except ValueError:
        return  # engine documents sqrt-of-complex as unsupported
    row = spark.range(1).select(
        re_.alias("re"),
        (im_ if im_ is not None else F.lit(0.0)).alias("im")).first()
    if expected is None:
        assert row["re"] is None
        return
    if math.isinf(expected.real) or math.isnan(expected.real):
        return
    assert row["re"] == pytest.approx(expected.real, rel=1e-9, abs=1e-9), text
    assert (row["im"] or 0.0) == pytest.approx(expected.imag, rel=1e-9,
                                               abs=1e-9), text


def test_null_metric_propagates(spark):
    # absent metric -> NULL result, never 0.0 (the bug parity_check found)
    re_, im_ = formulas.compile_formula(
        "sqrt(($2 / $3) - pow($4 / $3, 2))",
        lambda n: F.lit(None).cast("double"))
    row = spark.range(1).select(re_.alias("re"), im_.alias("im")).first()
    assert row["re"] is None and row["im"] is None
