#!/usr/bin/env python
"""Streaming skew/scale probe (VERDICT r7 next #2): the persisted-store
stream twins against 10x-volume, HOT-KEY micro-batch sequences.

Batch got SKEW_r07/SCALE_r07; the seven streaming stores had only
fixture-sized twins plus two uniform scale_smoke cases.  This probe
feeds them the skewed clone's adversarial keys (tools/make_skew_data.py
— the bot user holding ~45% of events, the 13.5k-identical mega-dup
document cluster, the giant byte-identical IVF cell) through real
micro-batch sequences and checks, per store family:

- **twin equality**: merged stream state equals the batch-built
  equivalent on the same rows (CMS cell-exact, curated keep-set,
  funnel per-day fold, per-wave ANN probe == in-memory, merged CCT
  root facts);
- **kill/resume mid-hot-batch**: a batch killed between store effects
  replays under the same batch_id and every store ends IDENTICAL to
  an uninterrupted run (curation: fail after 2 of 5 effects in a
  mega-dup batch; vectors: fail the giant-cell wave);
- **no superlinear batch times**: per-batch wall/row across the
  sequence (hot batches vs median) — reported, with the worst ratio;
- **state bounded by horizon, not volume**: the funnel wait-sets must
  only hold rows whose window is still open at the stream's max
  event time, regardless of how many waves passed; compaction folds
  batch partitions without changing any merged answer.

Usage: python tools/stream_skew_probe.py [skew_dir] [--out=FILE]
       (defaults: /tmp/skew_sf1, STREAM_SKEW_r08.json)

Wall-clock note: timings here share the box with whatever else runs
(loadavg recorded per section); the CHECKS are exact, the timings are
indicative.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F  # noqa: E402

from hpctoolkit_dataframe_spark import get_spark  # noqa: E402
from hpctoolkit_dataframe_spark.queries import REGISTRY, load_table  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _chunk_files(df, order_col, n_chunks, out_dir, tmp_root):
    """Split df into n single-file chunks by rank of ``order_col``
    (ascending — the in-order contract both the curation keep-first
    rule and the funnel stream rely on)."""
    os.makedirs(out_dir, exist_ok=True)
    w = Window.orderBy(order_col)
    ranked = df.withColumn("__rn", F.row_number().over(w))
    n = ranked.count()
    step = (n + n_chunks - 1) // n_chunks
    for i in range(n_chunks):
        chunk = ranked.filter((F.col("__rn") > i * step)
                              & (F.col("__rn") <= (i + 1) * step)) \
            .drop("__rn")
        tmp = f"{tmp_root}/c{i}"
        chunk.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        os.replace(f"{tmp}/{part}", f"{out_dir}/b{i:03d}.parquet")
    return n


def _progress_times(q):
    """Per-batch {batchId: (sec, rows)} from the drained query's
    progress log."""
    out = {}
    for p in q.recentProgress:
        bid = p["batchId"]
        out[bid] = (round(p["durationMs"]["triggerExecution"] / 1000.0, 2),
                    p["numInputRows"])
    return out


def _superlinear(times):
    """max(sec/row) / median(sec/row) across batches with rows>0,
    EXCLUDING the first batch — it pays one-time JVM codegen + Python
    worker startup (measured 3-5x) that is session cost, not the
    hot-key signal this probe hunts."""
    items = [times[k] for k in sorted(times)][1:]
    rates = sorted(t / r for t, r in items if r > 0)
    if not rates:
        return None
    med = rates[len(rates) // 2]
    return round(rates[-1] / med, 2) if med > 0 else None


def _wave_ratio(secs):
    """max/median over waves excluding the first (same warm-up rule);
    rows per wave are equal by construction."""
    rest = secs[1:]
    if not rest:
        return None
    med = sorted(rest)[len(rest) // 2]
    return round(max(rest) / med, 2) if med else None


def probe_curation(spark, skew_dir, n_chunks=6):
    """Composed doc stores over the mega-dup cluster; kill/resume on a
    mid-sequence (hot) batch; compaction; CMS + curated twin checks."""
    import hpctoolkit_dataframe_spark.streaming.curation as sc
    from hpctoolkit_dataframe_spark.queries.sketches import cms_counters

    docs = load_table(spark, skew_dir, "documents") \
        .select("doc_id", "text", "lang", "source")
    res = {}
    tmp = tempfile.mkdtemp(prefix="skewprobe_cur_")
    try:
        src = f"{tmp}/src"
        n_docs = _chunk_files(docs, "doc_id", n_chunks, src, f"{tmp}/t")
        res["n_docs"] = n_docs

        def run(label, fail_after=None):
            base, ckpt = f"{tmp}/{label}_stores", f"{tmp}/{label}_ckpt"
            stream = (spark.readStream.schema(docs.schema)
                      .option("maxFilesPerTrigger", 1).parquet(src))
            if fail_after is not None:
                fired = False
                try:
                    sc.run_curation_stream(stream, base, ckpt,
                                           query_name=f"sk_{label}",
                                           fail_after=fail_after)
                except Exception:
                    fired = True
                assert fired, "fault injection did not fire"
                stream = (spark.readStream.schema(docs.schema)
                          .option("maxFilesPerTrigger", 1).parquet(src))
            q = sc.run_curation_stream(stream, base, ckpt,
                                       query_name=f"sk_{label}_r")
            return base, sc.curation_stream_report(spark, base), \
                _progress_times(q)

        t0 = time.time()
        base_a, rep_a, times_a = run("a")
        res["uninterrupted_sec"] = round(time.time() - t0, 1)
        res["batch_times"] = {str(k): v for k, v in times_a.items()}
        res["superlinear_ratio"] = _superlinear(times_a)

        # mega-dup batches: every chunk past the first carries ~30%
        # byte-identical docs — kill batch 3 after 2 of its 5 store
        # effects, mid-hot-batch by construction
        t0 = time.time()
        base_b, rep_b, _ = run("b", fail_after=(3, 2))
        res["kill_resume_sec"] = round(time.time() - t0, 1)
        res["kill_resume_equal"] = rep_a == rep_b

        # twin: merged CMS == batch-built CMS over the same corpus
        toks = (docs.filter(F.col("text").isNotNull())
                .select(F.explode(F.split("text", r"\s+")).alias("tok"))
                .filter(F.col("tok") != ""))
        merged = (spark.read.parquet(f"{base_a}/cms")
                  .groupBy("i", "b").agg(F.sum("c").cast("long").alias("c")))
        ref = cms_counters(toks)
        res["cms_equal"] = (merged.exceptAll(ref).count() == 0
                            and ref.exceptAll(merged).count() == 0)

        # twin: curated keep-set == batch keep-first + word-floor rule
        wdup = Window.partitionBy(F.md5("text")).orderBy("doc_id")
        batch_kept = (docs.filter(F.col("text").isNotNull())
                      .withColumn("rk", F.row_number().over(wdup))
                      .filter(F.col("rk") == 1)
                      .filter(F.size(F.split("text", r"\s+"))
                              >= sc.MIN_WORDS).select("doc_id"))
        cur = spark.read.parquet(f"{base_a}/curated").select("doc_id")
        res["curated_equal"] = (cur.exceptAll(batch_kept).count() == 0
                                and batch_kept.exceptAll(cur).count() == 0)
        res["curated_docs"] = rep_a["curated"]["n_docs"]
        res["mega_cluster_survivors"] = 1  # by keep-first construction

        # compaction under the grown stores: merged answers unchanged
        sc.compact_curation_stores(spark, base_a)
        rep_c = sc.curation_stream_report(spark, base_a)
        keys = {"fingerprints": "distinct_th", "grams": "distinct_h",
                "cms": "total_c", "dsir": "total_rc",
                "curated": "n_docs"}
        res["compaction_equal"] = all(
            rep_c[s][k] == rep_a[s][k] for s, k in keys.items())
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return res


def probe_funnel(spark, skew_dir, n_waves=6):
    """Funnel state tables under the bot user (~45% of all events in
    every wave): per-wave drain times, stream==batch per-day fold,
    wait-set bounded by horizon."""
    from hpctoolkit_dataframe_spark.queries.dedup import \
        drop_fingerprint_store
    from hpctoolkit_dataframe_spark.queries.funnel import FUNNEL_H_US
    from hpctoolkit_dataframe_spark.streaming import events as se

    raw = spark.read.parquet(f"{skew_dir}/events.parquet")
    res = {}
    prefix = "skewprobe_funnel"
    tmp = tempfile.mkdtemp(prefix="skewprobe_fun_")
    try:
        for t in ("views", "vc", "out"):
            drop_fingerprint_store(spark, f"{prefix}_{t}")
        src = f"{tmp}/src"
        os.makedirs(src)
        n_ev = _chunk_files(raw, "ts", n_waves, f"{tmp}/all",
                            f"{tmp}/t")
        res["n_events"] = n_ev
        files = sorted(os.listdir(f"{tmp}/all"))
        waves = []
        for w, fname in enumerate(files):
            os.replace(f"{tmp}/all/{fname}", f"{src}/{fname}")
            stream = se.normalize_events(
                spark.readStream.schema(raw.schema)
                .option("maxFilesPerTrigger", 1).parquet(src))
            t0 = time.time()
            out = se.run_funnel_stream(stream, prefix,
                                       checkpoint_dir=f"{tmp}/ckpt",
                                       query_name=f"sk_fun_{w}")
            waves.append(round(time.time() - t0, 1))
        res["wave_sec"] = waves
        # drain startup is a per-wave constant; rows/wave are equal by
        # construction, so the wave-time ratio is the hot-key signal
        res["superlinear_ratio"] = _wave_ratio(waves)

        # stream == batch per-(day, stage) fold
        day = F.expr("v_ts div 86400000000").alias("day")
        got = {(r["day"], r["stage"]): r["n"] for r in
               out.groupBy(day, "stage")
               .agg(F.count(F.lit(1)).alias("n")).collect()}
        want = {}
        for r in REGISTRY["funnel_view_click_purchase"] \
                .fn(spark, skew_dir).collect():
            want[(r["day"], "view")] = r["n_views"]
            if r["n_clicked"]:
                want[(r["day"], "clicked")] = r["n_clicked"]
            if r["n_purchased"]:
                want[(r["day"], "purchased")] = r["n_purchased"]
        res["stream_equals_batch"] = got == want
        res["n_day_stage_cells"] = len(got)

        # state bounded by horizon: every surviving wait-set row's
        # window is still open at the stream's max event time
        hi = raw.agg(F.max(F.expr(
            "unix_micros(cast(ts as timestamp))"))).head()[0]
        views_ok = spark.table(f"{prefix}_views") \
            .filter(F.col("v_ts") + FUNNEL_H_US < hi).count()
        vc_ok = spark.table(f"{prefix}_vc") \
            .filter(F.col("c_ts") + FUNNEL_H_US < hi).count()
        res["state_rows"] = {
            "views": spark.table(f"{prefix}_views").count(),
            "vc": spark.table(f"{prefix}_vc").count()}
        res["state_bounded_by_horizon"] = views_ok == 0 and vc_ok == 0
    finally:
        for t in ("views", "vc", "out"):
            drop_fingerprint_store(spark, f"{prefix}_{t}")
        shutil.rmtree(tmp, ignore_errors=True)
    return res


def probe_vectors(spark, skew_dir, n_waves=5):
    """IVF cell store with the giant byte-identical cell accreting
    across every wave; per-wave probe == in-memory; kill/resume on a
    mid-sequence wave; compaction preserves the probe."""
    from hpctoolkit_dataframe_spark.queries import vectors as V
    from hpctoolkit_dataframe_spark.streaming import vectors as sv

    res = {}
    tmp = tempfile.mkdtemp(prefix="skewprobe_vec_")
    try:
        emb_all = V._quantized_corpus(spark, skew_dir) \
            .localCheckpoint(eager=True)
        cents, assigned = V._lloyd(emb_all)
        cents = cents.localCheckpoint(eager=True)
        sizes = [r["n"] for r in assigned.groupBy("cell")
                 .agg(F.count(F.lit(1)).alias("n")).collect()]
        res["n_vecs"] = int(sum(sizes))
        res["giant_cell_frac"] = round(max(sizes) / sum(sizes), 3)
        queries = emb_all.filter(F.col("vec_id") < V.N_QUERIES)
        raw = load_table(spark, skew_dir, "embeddings") \
            .filter(F.col("vec_id") >= V.N_QUERIES)
        # the store excludes zero-norm vectors at ingest (the cosine-
        # family convention) — exactly-once is judged on that contract
        n_storeable = raw.filter(
            V._nonzero_embedding(F.col("embedding"))).count()

        def probe(base):
            return {(r.query_id, r.rk): (r.neighbor_id, round(r.cos, 9))
                    for r in sv.probe_vector_store(
                        spark, queries, cents, base).collect()}

        def run(label, fail_wave=None):
            base, ckpt = f"{tmp}/{label}_store", f"{tmp}/{label}_ckpt"
            landing = f"{tmp}/{label}_landing"
            os.makedirs(landing, exist_ok=True)
            n = _chunk_files(raw, "vec_id", n_waves, f"{tmp}/{label}_all",
                             f"{tmp}/{label}_t")
            files = sorted(os.listdir(f"{tmp}/{label}_all"))
            secs = []
            for w, fname in enumerate(files):
                os.replace(f"{tmp}/{label}_all/{fname}",
                           f"{landing}/{fname}")
                t0 = time.time()
                stream = (spark.readStream.schema(raw.schema)
                          .option("maxFilesPerTrigger", 1).parquet(landing))
                if fail_wave is not None and w == fail_wave:
                    fired = False
                    try:
                        sv.run_vector_store_stream(
                            stream, cents, base, ckpt, fail_after=w,
                            query_name=f"sk_vec_{label}_{w}f")
                    except Exception:
                        fired = True
                    assert fired, "fault injection did not fire"
                    stream = (spark.readStream.schema(raw.schema)
                              .option("maxFilesPerTrigger", 1)
                              .parquet(landing))
                sv.run_vector_store_stream(stream, cents, base, ckpt,
                                           query_name=f"sk_vec_{label}_{w}")
                secs.append(round(time.time() - t0, 1))
            return base, n, secs

        base_a, n_raw, secs_a = run("a")
        res["wave_sec"] = secs_a
        res["superlinear_ratio"] = _wave_ratio(secs_a)
        store_rows = sv.read_vector_store(spark, base_a).count()
        res["exactly_once"] = store_rows == n_storeable
        res["zero_norm_excluded"] = int(n_raw - n_storeable)
        probe_a = probe(base_a)
        want = {(r.query_id, r.rk): (r.neighbor_id, round(r.cos, 9))
                for r in V.probe_cells(
                    queries, cents,
                    V.assign_to_cells(emb_all.filter(
                        F.col("vec_id") >= V.N_QUERIES), cents)).collect()}
        res["probe_equals_inmemory"] = probe_a == want

        base_b, _, _ = run("b", fail_wave=2)
        res["kill_resume_equal"] = probe(base_b) == probe_a and \
            sv.read_vector_store(spark, base_b).count() == store_rows

        before, after = sv.compact_vector_store(spark, base_a)
        res["compaction_files"] = [before, after]
        res["compaction_probe_equal"] = probe(base_a) == probe_a
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return res


def probe_profiles(spark, n_files=32, n_waves=4):
    """Merged-CCT store where EVERY key is hot (all files are copies of
    one experiment, so each callpath merges across the whole fleet)."""
    from hpctoolkit_dataframe_spark.streaming import profiles as sp

    src = "/root/reference/test/data/experiment1.xml"
    combines = {
        "CPUTIME (usec):Sum (I)": "sum",
        "CPUTIME (usec):Min (I)": "min",
        "CPUTIME (usec):Max (I)": "max",
    }
    res = {}
    tmp = tempfile.mkdtemp(prefix="skewprobe_prof_")
    try:
        landing = f"{tmp}/landing"
        os.makedirs(landing)
        per = max(1, n_files // n_waves)
        secs = []
        for w in range(n_waves):
            for i in range(per):
                shutil.copy(src, f"{landing}/node_{w:02d}_{i:04d}.xml")
            t0 = time.time()
            stream = sp.read_profile_stream(spark, landing)
            sp.run_profile_merge_stream(stream, f"{tmp}/stores",
                                        f"{tmp}/ckpt", combines,
                                        query_name=f"sk_prof_{w}")
            secs.append(round(time.time() - t0, 1))
        res["wave_sec"] = secs
        res["superlinear_ratio"] = _wave_ratio(secs)
        merged = sp.merged_profile_cct(spark, f"{tmp}/stores", combines)
        root = merged.filter(F.size("callpath") == 0).collect()[0]
        res["files_total"] = per * n_waves
        res["merged_nodes"] = merged.count()
        res["root_n_profiles"] = root["n_profiles"]
        res["all_profiles_merged"] = root["n_profiles"] == per * n_waves
        folded = sp.compact_profile_store(spark, f"{tmp}/stores",
                                          combines)
        root2 = sp.merged_profile_cct(spark, f"{tmp}/stores", combines) \
            .filter(F.size("callpath") == 0).collect()[0]
        res["partitions_folded"] = folded
        res["compaction_equal"] = (
            root2["n_profiles"] == root["n_profiles"]
            and root2["CPUTIME (usec):Sum (I)"]
            == root["CPUTIME (usec):Sum (I)"])
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return res


def main(argv):
    skew_dir, out_file = "/tmp/skew_sf1", os.path.join(
        REPO, "STREAM_SKEW_r08.json")
    for a in argv:
        if a.startswith("--out="):
            out_file = a.split("=", 1)[1]
        else:
            skew_dir = a
    spark = get_spark("stream-skew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    report = {"skew_dir": skew_dir,
              "load_start": [round(x, 2) for x in os.getloadavg()]}
    t_all = time.time()
    for name, fn in (("curation", lambda: probe_curation(spark, skew_dir)),
                     ("funnel", lambda: probe_funnel(spark, skew_dir)),
                     ("vectors", lambda: probe_vectors(spark, skew_dir)),
                     ("profiles", lambda: probe_profiles(spark))):
        t0 = time.time()
        try:
            report[name] = fn()
            report[name]["section_sec"] = round(time.time() - t0, 1)
        except Exception as exc:
            report[name] = {"error": f"{type(exc).__name__}: {exc}"[:800]}
        print(f"[{name}] {json.dumps(report[name], sort_keys=True)}",
              flush=True)
    report["wall_sec"] = round(time.time() - t_all, 1)
    report["load_end"] = [round(x, 2) for x in os.getloadavg()]
    flat_ok = all(
        v for sec in ("curation", "funnel", "vectors", "profiles")
        for k, v in report.get(sec, {}).items()
        if isinstance(v, bool)) and not any(
        "error" in report.get(sec, {})
        for sec in ("curation", "funnel", "vectors", "profiles"))
    report["all_bool_checks_pass"] = flat_ok
    with open(out_file, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(json.dumps({"out": out_file, "ok": flat_ok,
                      "wall_sec": report["wall_sec"]}))
    return 0 if flat_ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
