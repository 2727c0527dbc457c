"""PII scrub semantics (queries/pii.py) on handcrafted strings; the
cross-engine exactness is pinned by the pii_redact_stats oracle."""

from pyspark.sql import functions as F

from hpctoolkit_dataframe_spark.plans import explain
from hpctoolkit_dataframe_spark.queries import REGISTRY
from hpctoolkit_dataframe_spark.queries.pii import redact

from .conftest import SF_DIR


def _scrub(spark, s):
    df = spark.createDataFrame([(s,)], "t string")
    return df.select(redact(F.col("t")).alias("r")).head().r


def test_redacts_all_three_categories(spark):
    out = _scrub(spark, "mail a.b+c_d%e@sub.example.co, call +1-800-555-0199,"
                        " ssh 192.168.0.17 now")
    assert out == "mail <EMAIL>, call <PHONE>, ssh <IP> now"


def test_replaces_every_occurrence_not_first(spark):
    out = _scrub(spark, "x@y.com then z@w.org and 1.2.3.4 or 5.6.7.8")
    assert out == "<EMAIL> then <EMAIL> and <IP> or <IP>"


def test_ip_inside_email_not_double_redacted(spark):
    # the domain-ish local text must be consumed by the email pass
    out = _scrub(spark, "user@10.0.0.1.example.com stays one token")
    assert out == "<EMAIL> stays one token"


def test_plain_text_untouched(spark):
    s = "no contact info here, just words + numbers like 12-34"
    assert _scrub(spark, s) == s


def test_pii_query_is_narrow(spark):
    df = REGISTRY["pii_redact_stats"].fn(spark, SF_DIR)
    assert explain.python_udf_count(df) == 0
    assert explain.join_strategies(df)["cartesian"] == 0
