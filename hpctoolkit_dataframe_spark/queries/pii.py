"""PII detection + redaction over the documents table — the scrubbing
stage of a training-data pipeline (emails, phone numbers, IPv4
addresses -> typed placeholders).

The synthetic corpus contains no PII, so each query first INJECTS a
deterministic contact line derived from ``doc_id`` (identical string
construction in Spark and DuckDB), then detects/redacts it.  The
redaction logic is therefore genuinely exercised and the oracle is
hash-exact: the output carries an order-independent BIGINT hash-sum of
every redacted document, so a single character of divergence between
the two engines' regex behavior fails the gate.

Regex subset chosen to be dialect-identical between Java regex (Spark)
and RE2 (DuckDB): character classes, bounded/unbounded greedy
quantifiers, no lookaround, no backreferences.  All matching is
JVM-side `regexp_replace` / `regexp_count` — zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import hash8_sql, load_table, register

EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PHONE_RE = r"\+[0-9][0-9-]{6,}[0-9]"
IPV4_RE = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"

# injected contact line: every piece is integer-derived from doc_id so
# both engines build byte-identical input text
_INJECT_SQL = """concat(text, ' contact user', CAST(doc_id AS VARCHAR),
 '@mail.example.com or +1-555-', lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
 ' host 10.', CAST(doc_id % 256 AS VARCHAR), '.0.',
 CAST((doc_id * 7) % 256 AS VARCHAR))"""


def _inject():
    return F.concat(
        F.col("text"), F.lit(" contact user"),
        F.col("doc_id").cast("string"), F.lit("@mail.example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" host 10."), (F.col("doc_id") % 256).cast("string"),
        F.lit(".0."), ((F.col("doc_id") * 7) % 256).cast("string"))


def redact(col, email="<EMAIL>", phone="<PHONE>", ip="<IP>"):
    """Typed-placeholder scrub: email first (its local part may contain
    digits a later pattern could clip), then phone, then IP.  The
    placeholders contain no pattern-matchable characters, so the three
    passes compose without re-matching each other's output."""
    out = F.regexp_replace(col, EMAIL_RE, email)
    out = F.regexp_replace(out, PHONE_RE, phone)
    return F.regexp_replace(out, IPV4_RE, ip)


def _partial_sql(expr: str) -> str:
    out = f"regexp_replace({expr}, '{EMAIL_RE}', '<EMAIL>', 'g')"
    return f"regexp_replace({out}, '{PHONE_RE}', '<PHONE>', 'g')"


def _redact_sql(expr: str) -> str:
    return f"regexp_replace({_partial_sql(expr)}, '{IPV4_RE}', '<IP>', 'g')"


@register("pii_redact_stats", sql=f"""
WITH enriched AS (SELECT doc_id, source, {_INJECT_SQL} AS text2
                  FROM documents WHERE text IS NOT NULL),
scrubbed AS (
  SELECT source,
         len(regexp_extract_all(text2, '{EMAIL_RE}')) AS n_email,
         len(regexp_extract_all(text2, '{PHONE_RE}')) AS n_phone,
         len(regexp_extract_all({_partial_sql('text2')}, '{IPV4_RE}'))
           AS n_ip,
         {_redact_sql('text2')} AS red
  FROM enriched)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_email) AS BIGINT) AS emails,
       CAST(SUM(n_phone) AS BIGINT) AS phones,
       CAST(SUM(n_ip) AS BIGINT) AS ips,
       CAST(SUM({hash8_sql('red')}) AS BIGINT) AS redacted_hash_sum
FROM scrubbed GROUP BY source""")
def pii_redact_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source PII census + scrub fingerprint.  Counts run on the
    pre-redaction text (emails, phones) and on the partially-scrubbed
    text for IPs (so an IP-looking fragment inside an email/phone is
    not double-counted); the hash-sum pins the exact redacted bytes.
    Narrow per-row work — the only exchange is the source groupBy."""
    docs = load_table(spark, sf_dir, "documents", spread=True).filter(
        F.col("text").isNotNull())
    text2 = _inject()
    part = F.regexp_replace(
        F.regexp_replace(text2, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>")
    red = redact(text2)
    red_hash = F.conv(F.substring(F.md5(red), 1, 8), 16, 10).cast("long")
    return (docs.select(
        "source",
        F.regexp_count(text2, F.lit(EMAIL_RE)).alias("n_email"),
        F.regexp_count(text2, F.lit(PHONE_RE)).alias("n_phone"),
        F.regexp_count(part, F.lit(IPV4_RE)).alias("n_ip"),
        red_hash.alias("rh"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
             F.sum("n_email").cast("long").alias("emails"),
             F.sum("n_phone").cast("long").alias("phones"),
             F.sum("n_ip").cast("long").alias("ips"),
             F.sum("rh").cast("long").alias("redacted_hash_sum")))
