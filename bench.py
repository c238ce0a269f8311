#!/usr/bin/env python3
"""Benchmark harness.

Default mode: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] plus a
synthetic-corpus HTML-parse throughput measurement, and prints ONE
JSON line:

  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "parse_docs_per_sec": ...,
   "parse_mb_per_sec": ...}

--scaling mode: runs the identical parse job at local[8] and
local[32] (the sandbox stand-in for N vs 4N executors per
BASELINE.md) and reports throughput at both + scaling efficiency.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "extract_text", "extract_title", "element_histogram",
    "pricing_summary", "top_customers", "events_hourly",
    "top_event_per_user", "lang_id", "quality", "token_count",
    "fingerprint", "dedup_exact", "minhash_lsh_pairs", "simhash",
    "knn_cosine", "knn_lsh",
]

# corpus sized to the parser: with the r4 compiled executor the old
# 12k corpus (~88 MB) finishes in <1 s at local[32] and measures the
# Arrow/JVM round-trip floor, not the parse (measured r4: 12k -> 80
# MB/s "throughput", 40k -> ~390 MB/s on the same build).  40k docs
# ≈ 295 MB keeps the timed region in parse-dominated steady state;
# grow this again if the parser gets faster (same lesson as the r3
# scaling-corpus bump).
PARSE_DOCS = int(os.environ.get("BENCH_PARSE_DOCS", "40000"))


def _force(df):
    """Fully execute a DataFrame without driver materialization
    bottlenecks."""
    df.write.format("noop").mode("overwrite").save()


def run_queries(spark, sf_dir):
    """Best-of-2 per query (same protocol as parse_throughput): the
    first execution absorbs python-worker startup, codegen, and
    co-tenant noise spikes; the min is the stable figure."""
    from packages_sgml_spark.spark.queries import QUERIES
    timings = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        best = float("inf")
        df = fn(spark, sf_dir)
        # measure each query against a settled heap: earlier queries
        # leave the JVM mid-GC-cycle, which throttles the
        # allocation-heavy ones (shingle explodes) by 3-5x and makes
        # per-query numbers reflect run order instead of the query
        spark._jvm.System.gc()
        for _ in range(2):
            t0 = time.time()
            _force(df)
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
    return timings


def parse_throughput(spark, n_docs=PARSE_DOCS, unique_links=False,
                     unquoted_links=False, empty_tags=False):
    """Synthetic Common-Crawl-style corpus -> extract() -> docs/sec,
    MB/sec.  Input is generated JVM-side and cached so the measured
    cost is the parse."""
    from pyspark.sql import functions as F
    from packages_sgml_spark.spark.pages import synthetic_pages
    from packages_sgml_spark.spark.extract import extract
    from packages_sgml_spark.spark.queries import ensure_workers

    ensure_workers(spark)
    pages = synthetic_pages(spark, n_docs, scale=12,
                            unique_links=unique_links,
                            unquoted_links=unquoted_links,
                            empty_tags=empty_tags).cache()
    stats = pages.select(F.count("*").alias("n"),
                         F.sum(F.length("html")).alias("bytes")).collect()[0]
    # warm-up: one full pass touches every python worker (package
    # import + shared DTD build); then best-of-2 timed passes (first
    # timed pass can still catch page-cache/JIT noise)
    ex = extract(pages, dialect="html5", nodes=False)
    # settled-heap rule (same as run_queries): the prior parse phase
    # leaves the JVM mid-GC-cycle and the LAST phase also carries the
    # heaviest Arrow result (warning rows), so without this the
    # phase order — not the code path — sets the reading
    spark._jvm.System.gc()
    _force(ex)
    dt = float("inf")
    for _ in range(2):
        t0 = time.time()
        _force(ex)
        dt = min(dt, time.time() - t0)
    pages.unpersist()
    return {
        "n_docs": int(stats.n),
        "mb": round(stats.bytes / 1e6, 2),
        "sec": round(dt, 3),
        "docs_per_sec": round(stats.n / dt, 1),
        "mb_per_sec": round(stats.bytes / 1e6 / dt, 2),
    }


def _box_load():
    """Load average + a 0.2 s single-thread CPU probe, recorded so a
    bench JSON can be read against the box's co-tenant noise at the
    time of the run (round-2 VERDICT item 8: 12-18 s headline swings
    track load, not code)."""
    try:
        la1, la5, _ = os.getloadavg()
    except OSError:
        la1 = la5 = None
    t0 = time.process_time()
    t_wall = time.time()
    x = 0
    while time.time() - t_wall < 0.2:
        x += 1
    cpu_frac = (time.process_time() - t0) / max(time.time() - t_wall,
                                                1e-9)
    return {"loadavg_1m": round(la1, 2) if la1 is not None else None,
            "loadavg_5m": round(la5, 2) if la5 is not None else None,
            "cpu_probe_frac": round(cpu_frac, 3),
            "spins": x}


def bench_default():
    from packages_sgml_spark.spark.session import get_spark
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    load0 = _box_load()
    spark = get_spark(app="bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    timings = run_queries(spark, sf_dir)
    pt = parse_throughput(spark)
    # real-crawl shape: every <a href> unique (shape-replay path, r6).
    # Same doc count as the main corpus so the MB/s readings compare
    # without fixed-cost dilution.
    ptu = parse_throughput(spark, unique_links=True)
    # legacy-soup shape: same unique hrefs, UNQUOTED (<a href=url>) —
    # the itake_unquoted path the r7 shape scanner accepts; done
    # criterion (VERDICT r6 item 2) is this within ~20% of the quoted
    # unique-links figure.
    ptq = parse_throughput(spark, unique_links=True,
                           unquoted_links=True)
    # real-crawl EMPTY-element density: a <br> and a unique-src <img>
    # per paragraph on top of the unique links (r8: the executor's
    # implied close of C_EMPTY tops — pre-r8 this shape ran at ~25%
    # of the unique-links figure, bailing to Python once per br/img)
    pte = parse_throughput(spark, unique_links=True, empty_tags=True)
    load1 = _box_load()
    # mid-run box collapse (r6: a co-tenant landing mid-loop inflated
    # every query uniformly +10-35% while the same file's parse
    # throughput improved): when the post-run CPU probe drops >20%
    # vs the pre-run probe, the query loop ran on a degraded box —
    # re-run it once and report BOTH readings (headline = better run,
    # both kept in the JSON for honesty).
    rerun = None
    load2 = None
    if load1["spins"] < 0.8 * load0["spins"]:
        rerun = run_queries(spark, sf_dir)
        load2 = _box_load()
    # headline value = sum of per-query best times + the timed parse
    # pass (run_queries executes each query twice and keeps the min,
    # so raw wall time would double-count)
    if rerun is not None and sum(rerun.values()) < sum(timings.values()):
        timings, rerun = rerun, timings
    total = round(sum(timings.values()) + pt["sec"], 3)
    spark.stop()
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "headline query wall time + HTML-parse throughput",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "parse_docs_per_sec": pt["docs_per_sec"],
        "parse_mb_per_sec": pt["mb_per_sec"],
        "parse_corpus": {"n_docs": pt["n_docs"], "mb": pt["mb"]},
        "parse_mb_per_sec_unique_links": ptu["mb_per_sec"],
        "parse_corpus_unique_links": {"n_docs": ptu["n_docs"],
                                      "mb": ptu["mb"]},
        "parse_mb_per_sec_unique_unquoted": ptq["mb_per_sec"],
        "parse_corpus_unique_unquoted": {"n_docs": ptq["n_docs"],
                                         "mb": ptq["mb"]},
        "parse_mb_per_sec_empties": pte["mb_per_sec"],
        "parse_corpus_empties": {"n_docs": pte["n_docs"],
                                 "mb": pte["mb"]},
        "cpus": cpus,
        "box_load_before": load0,
        "box_load_after": load1,
    }
    if rerun is not None:
        result["probe_collapse_detected"] = True
        result["queries_other_run"] = rerun
        result["value_other_run"] = round(
            sum(rerun.values()) + pt["sec"], 3)
        result["box_load_after_rerun"] = load2
    print(json.dumps(result))


def _burn(_):
    t0 = time.time()
    x = 0
    while time.time() - t0 < 0.8:
        x += 1
    return x


def _cpu_ceiling(n_lo, n_hi):
    """Raw CPU-bound scaling of this box between n_lo and n_hi worker
    processes (SMT/throttling ceiling) — the fairness baseline for
    the Spark efficiency number."""
    import multiprocessing as mp

    burn = _burn
    out = {}
    for n in (n_lo, n_hi):
        with mp.Pool(n) as p:
            out[n] = sum(p.map(burn, range(n)))
    return out[n_hi] / (out[n_lo] * (n_hi // n_lo))


def finish_scaling(out, levels):
    """Shared tail of every north-rule scaling probe (bench_scaling,
    tools/scale_staged.py, tools/scale_curate.py): derive throughput
    ratio, scaling efficiency, the simultaneously-measured raw-CPU
    ceiling, and efficiency-vs-ceiling from a populated
    out["levels"] = {str(n): {"mb_per_sec": ...}} dict.  ONE
    definition so a fix to the efficiency math reaches every probe
    (r8 session-5 review: two hand-maintained copies had already
    appeared)."""
    lo, hi = (str(c) for c in levels)
    thr = (out["levels"][hi]["mb_per_sec"] /
           out["levels"][lo]["mb_per_sec"])
    out["core_ratio"] = levels[1] / levels[0]
    out["scaling_efficiency"] = round(thr / out["core_ratio"], 3)
    out["cpu_ceiling_efficiency"] = round(_cpu_ceiling(*levels), 3)
    out["efficiency_vs_ceiling"] = round(
        out["scaling_efficiency"] / out["cpu_ceiling_efficiency"], 3)
    return out


def bench_scaling(n_lo=None, n_hi=None):
    """Same parse job at local[N] vs local[4N] (sandbox stand-in for
    N vs 4N executors per BASELINE.md).  Default N=4: the box's 32
    hardware threads are ~16 physical cores, so 8->32 is capped by
    SMT at ~0.75 regardless of code; 4->16 exposes real code scaling.
    Reports the raw-CPU ceiling alongside for honest accounting."""
    from packages_sgml_spark.spark.session import get_spark
    # default N=2: 2->8 stays within this box's physical cores, so
    # the measurement reflects code scaling; 4->16 and 8->32 are
    # capped by SMT at ~0.68-0.9 regardless of code (see BENCH.md)
    n_lo = n_lo or int(os.environ.get("BENCH_SCALE_N", "2"))
    n_hi = n_hi or 4 * n_lo
    results = {}
    # interleave the two configs twice and keep the best run of each:
    # the box is co-tenant-noisy, so single runs mislead either way
    # larger corpus than the default bench: at high N a short run
    # finishes in ~2s and fixed costs (scheduling, Arrow batch ramp)
    # dominate, understating steady-state scaling.  Round 3: the
    # parser got ~1.7x faster, so 16k docs dropped local[8] under 3 s
    # and measured 0.77; at 40k (~7 s) the same build measured 0.93.
    # Round 4: the compiled executor is ~5x faster again, so the
    # scaling corpus grows to 120k docs (~0.9 GB) to keep local[8]
    # in steady state for several seconds.
    # Round 5: at 120k the local[8] leg finishes in ~3.5 s and the
    # JVM/Arrow ramp variance produced the r4 0.72-0.84 spread; at
    # 240k (~1.8 GB, local[8] ~6-7 s) consecutive quiet runs measure
    # 0.82-1.00 (BENCH.md r5) — most of the r4 "memory-bus" deficit
    # was actually fixed-cost dilution on a too-small corpus.
    n_docs = int(os.environ.get("BENCH_SCALE_DOCS", "240000"))
    for cpus in (n_lo, n_hi, n_lo, n_hi):
        spark = get_spark(app="bench-scaling-%d" % cpus, cpus=cpus)
        spark.sparkContext.setLogLevel("ERROR")
        r = parse_throughput(spark, n_docs=n_docs)
        if cpus not in results or \
                r["docs_per_sec"] > results[cpus]["docs_per_sec"]:
            results[cpus] = r
        spark.stop()
    eff = results[n_hi]["docs_per_sec"] / (4 * results[n_lo]["docs_per_sec"])
    ceiling = _cpu_ceiling(n_lo, n_hi)
    print(json.dumps({
        "metric": "parse throughput scaling local[%d] -> local[%d]"
                  % (n_lo, n_hi),
        "value": round(eff, 3),
        "unit": "efficiency",
        "cpu_ceiling_efficiency": round(ceiling, 3),
        "efficiency_vs_ceiling": round(eff / ceiling, 3),
        "throughput": {str(k): v for k, v in results.items()},
        "box_load": _box_load(),
    }))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        bench_scaling()
    else:
        bench_default()
