#!/usr/bin/env python
"""Build the ADVERSARIAL-TEXT clone: sf0.01 with 14 edge-case documents
appended — the third probe axis after volume (make_scale_data) and key
skew (make_skew_data).

Testdata text is plain ASCII words, so cross-engine string semantics
(Java regex vs DuckDB RE2 vs the pure-Python fixture twins) are never
exercised by the gate.  This clone adds the cases where they differ:

- NULL text, empty text, whitespace-only text
- unicode: accents/ß, CJK, cyrillic, Turkish dotted-I, emoji
- UNICODE WHITESPACE (NBSP U+00A0, thin space U+2009) — the case that
  found two real divergences in r7: Python's default ``\\s``/
  ``str.split`` are unicode-aware while Java regex and RE2 ``\\s`` are
  ASCII-only (winnow NULL handling; BPE fixture/encode tokenization —
  both fixed to one ASCII-\\s rule)
- tab/newline separators, a 5000-char single word, heavy punctuation,
  200x repeated bigram

The embeddings table gets 5 edge vectors appended (the axis that found
the ANSI DIVIDE_BY_ZERO crash class in every cosine query — one
zero-norm vector killed the whole job):

- the all-zeros vector (undefined cosine), a near-zero vector,
  a byte-exact duplicate of vec 0, its antipodal negation, and a
  one-hot axis vector

The events table gets 12 edge events appended (this axis found three
more job-killers: ANSI CAST_INVALID_INPUT on a non-numeric JSON field,
DuckDB raising on malformed/empty JSON where Spark returns NULL, and
INT64 overflow of sum-of-squares moments on one $10^10 value):

- NULL value, NULL props, empty-string props, non-JSON props, nested
  JSON, a 1e12 value, epoch-0 and year-2099 timestamps, an unseen
  event_type, and a NULL-user view->click->purchase chain (equi-joins
  never match NULL keys; window scans partitioned by user_id must
  apply the same convention — r8)

All other tables copy through unchanged so every oracle runs:

    python tools/make_adv_data.py [out_dir]        # default /tmp/adv_sf
    python tools/oracle_check.py /tmp/adv_sf <text-family queries>

BPE entries need the corpus-keyed golden regenerated first:
``python tools/make_bpe_fixture.py /tmp/skew_sf1 /tmp/adv_sf`` (list
every clone that should stay covered — the fixture only holds entries
for corpora passed at build time).
"""

from __future__ import annotations

import shutil
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

BASE = "/root/testdata/sf0.01"

ADV_DOCS = [
    (900001, "", "en"),
    (900002, "   ", "en"),
    (900003, None, "en"),
    (900004, "café naïve résumé über straße",
     "de"),
    (900005, "日本語 テスト 中文 "
     "文本", "ja"),
    (900006, "emoji \U0001f600 \U0001f680 mixed ascii", "en"),
    (900007, "TAB\tSEPARATED\tWORDS and\nnewline lines", "en"),
    (900008, "Iİstanbul İZMİR turkish dotted", "tr"),
    (900009, "a" * 5000, "en"),
    (900010, ("repeat word " * 200).strip(), "en"),
    (900011, "punct!!! ... ??? ,,,; :: () [] {} \"quoted\" 'single'", "en"),
    (900012, "nbsp\xa0joined and\u2009thin\u2009spaces", "en"),  # NBSP + thin space, EXPLICIT escapes (invisible chars get normalized by editors)
    (900013, "Жизнь "
     "прекрасна cyrillic",
     "ru"),
    (900014, "ALLCAPS SHOUTING TEXT WITH Stops.", "en"),
]


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/adv_sf"
    import os
    os.makedirs(out, exist_ok=True)
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"):
        dst = f"{out}/{t}.parquet"
        if os.path.isdir(f"{BASE}/{t}.parquet"):
            shutil.copytree(f"{BASE}/{t}.parquet", dst, dirs_exist_ok=True)
        else:
            shutil.copy(f"{BASE}/{t}.parquet", dst)
    evs = duckdb.connect().execute(
        f"select event_id, ts, user_id, event_type, value, props from "
        f"'{BASE}/events.parquet' order by event_id").fetchall()
    erows = [list(r) for r in evs]
    base_ts = erows[0][1]
    import datetime as dt
    erows += [
        [700001, base_ts, 1, "view", None, '{"a": 1}'],
        [700002, base_ts, 1, "purchase", None, None],
        [700003, base_ts, 1, "click", 0.0, ""],
        [700004, base_ts, 1, "view", -5.5, "not json at all"],
        [700005, base_ts, 1, "purchase", 1e12,
         '{"nested": {"deep": [1,2]}}'],
        [700006, dt.datetime(1970, 1, 1), 2, "view", 1.0, "{}"],
        [700007, dt.datetime(2099, 12, 31, 23, 59, 59, 999999), 2,
         "click", 2.0, "{}"],
        [700008, base_ts, 3, "UNKNOWN_TYPE", 3.0, "{}"],
        [700009, base_ts, 1, "view", 12345.678,
         '{"k":"v with \\"quotes\\""}'],
        # NULL-user funnel chain (r8, ADVICE r7): an equi-join never
        # matches NULL keys, but a window partitioned by user_id puts
        # all NULL users in ONE partition — these three rows form a
        # perfect view->click->purchase chain that must count as an
        # unconverted view in both engines.
        [700010, base_ts, None, "view", 1.0, "{}"],
        [700011, base_ts + dt.timedelta(hours=1), None, "click",
         1.0, "{}"],
        [700012, base_ts + dt.timedelta(hours=2), None, "purchase",
         9.99, "{}"],
    ]
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in erows], pa.int64()),
        "ts": pa.array([r[1] for r in erows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in erows], pa.int64()),
        "event_type": pa.array([r[3] for r in erows], pa.string()),
        "value": pa.array([r[4] for r in erows], pa.float64()),
        "props": pa.array([r[5] for r in erows], pa.string()),
    }), f"{out}/events.parquet")
    vecs = duckdb.connect().execute(
        f"select vec_id, embedding, label from "
        f"'{BASE}/embeddings.parquet' order by vec_id").fetchall()
    vrows = [list(r) for r in vecs]
    dim = len(vrows[0][1])
    first = vrows[0][1]
    vrows += [
        [800001, [0.0] * dim, 0],                 # zero norm
        [800002, [1e-8] * dim, 0],                # near-zero
        [800003, list(first), 1],                 # exact dup of vec 0
        [800004, [-x for x in first], 1],         # antipodal
        [800005, [1.0] + [0.0] * (dim - 1), 2],   # one-hot axis
    ]
    pq.write_table(pa.table({
        "vec_id": pa.array([r[0] for r in vrows], pa.int64()),
        "embedding": pa.array([[float(x) for x in r[1]] for r in vrows],
                              pa.list_(pa.float32())),
        "label": pa.array([r[2] for r in vrows], pa.int32()),
    }), f"{out}/embeddings.parquet")
    base = duckdb.connect().execute(
        f"select doc_id, text, lang, source, n_chars from "
        f"'{BASE}/documents.parquet' order by doc_id").fetchall()
    rows = [list(r) for r in base]
    for doc_id, text, lang in ADV_DOCS:
        rows.append([doc_id, text, lang, "edge",
                     len(text) if text is not None else None])
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
        "source": pa.array([r[3] for r in rows], pa.string()),
        "n_chars": pa.array([r[4] for r in rows], pa.int64()),
    }), f"{out}/documents.parquet")
    print(f"wrote {len(rows)} docs ({len(ADV_DOCS)} adversarial) to {out}")


if __name__ == "__main__":
    main()
