"""Skewed-corpus soak: exercise the skew machinery end to end.

Corpus: ~N docs with a DELIBERATELY Zipfian host distribution (60%
of pages on one host, long tail on the rest) and 30% byte-identical
boilerplate bodies — the two real-crawl pathologies the engine
guards against (url-hash spread for hot hosts; salting for skewed
aggregation keys; identical-signature star-collapse for LSH).

Stages + what is measured:
  1. extract()        — per-task wall/cpu/rows from inside the UDF:
                        the url-hash spread must keep the hot host
                        from serializing (max/median task wall).
  2. source_stats     — unsalted vs salted groupBy on the skewed
                        host key, wall-clock compared.
  3. minhash_lsh_pairs — the r4 mega-cluster guard: must complete
                        with star edges, no O(cluster^2) task.

Prints one JSON line (recorded in BENCH.md's soak section).
Usage: python tools/soak_skew.py [n_docs] [cpus]
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    from pyspark.sql import functions as F
    from packages_sgml_spark.spark.session import get_spark
    from packages_sgml_spark.spark.pages import synthetic_pages
    from packages_sgml_spark.spark.queries import ensure_workers
    from packages_sgml_spark.spark.skew import salted_agg

    spark = get_spark(app="soak-skew", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    ensure_workers(spark)

    # -- skewed corpus ------------------------------------------------
    base = synthetic_pages(spark, n_docs, scale=12)
    h = F.abs(F.xxhash64("url"))
    u = (h % 1000000) / 1000000.0
    host = (F.when(u < 0.6, F.lit("hot.example.org"))
            .otherwise(F.concat(F.lit("tail"),
                                (h % 5000).cast("string"),
                                F.lit(".example.org"))))
    boiler = F.lit("<html><body>" +
                   "<p>identical boilerplate page body</p>" * 40 +
                   "</body></html>")
    pages = base.select(
        F.col("url"),
        host.alias("host"),
        F.when(u < 0.3, F.encode(boiler, "utf-8"))
         .otherwise(F.col("html")).alias("html")).cache()
    stats = pages.select(
        F.count("*").alias("n"),
        F.sum(F.length("html")).alias("bytes")).collect()[0]
    hot_frac = pages.filter(F.col("host") == "hot.example.org") \
        .count() / stats.n

    # -- 1. extract with per-task instrumentation ---------------------
    import pandas as pd  # noqa: F401

    def instrumented(batches):
        import time as _t

        import pandas as _pd
        from packages_sgml_spark.spark.extract import extract_batch_iter
        t0w = _t.time()
        t0c = _t.process_time()
        nrows = 0
        for pdf in extract_batch_iter(batches, "html5", False, False):
            nrows += len(pdf)
        yield _pd.DataFrame({"wall": [_t.time() - t0w],
                             "cpu": [_t.process_time() - t0c],
                             "rows": [nrows]})

    from packages_sgml_spark.spark.util import spread
    src = spread(pages.select("url", "html"), F.xxhash64("url"))
    inst = src.mapInPandas(instrumented,
                           schema="wall double, cpu double, rows long")
    inst.collect()                      # warm workers
    t0 = time.time()
    task_rows = inst.collect()
    extract_wall = time.time() - t0
    walls = sorted(r.wall for r in task_rows)
    rowcounts = [r.rows for r in task_rows]

    # -- 2. skewed-key aggregation: unsalted vs salted ----------------
    def timed(df):
        df.write.format("noop").mode("overwrite").save()
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    plain = (pages.groupBy("host")
             .agg(F.count("*").alias("n"),
                  F.sum(F.length("html")).alias("b")))
    t_plain = timed(plain)
    salted = salted_agg(
        pages.withColumn("sz", F.length("html")), ["host"],
        {"n": ("count", "sz"), "b": ("sum", "sz")}, shards=32)
    t_salt = timed(salted)
    # correctness of the salted result on skewed data
    pd_plain = {r.host: (r.n, r.b) for r in plain.collect()}
    pd_salt = {r.host: (r.n, r.b) for r in salted.collect()}
    assert pd_plain == pd_salt, "salted aggregation mismatch"

    # -- 3. LSH over the 30%-identical corpus -------------------------
    from packages_sgml_spark.spark import dedup
    docs = pages.select(
        F.xxhash64("url").alias("doc_id"),
        F.decode("html", "utf-8").alias("text"))
    t0 = time.time()
    bstats = {r.band: r for r in
              dedup.lsh_bucket_stats(docs).collect()}
    pairs_n = dedup.minhash_lsh_pairs(docs).count()
    lsh_wall = time.time() - t0

    print(json.dumps({
        "n_docs": int(stats.n), "mb": round(stats.bytes / 1e6, 1),
        "cpus": cpus, "hot_host_frac": round(hot_frac, 3),
        "extract": {
            "wall_sec": round(extract_wall, 2),
            "mb_per_sec": round(stats.bytes / 1e6 / extract_wall, 1),
            "n_tasks": len(walls),
            "task_wall_max": round(walls[-1], 2),
            "task_wall_median": round(statistics.median(walls), 2),
            "task_rows_max": max(rowcounts),
            "task_rows_median": int(statistics.median(rowcounts)),
        },
        "host_agg": {"plain_sec": round(t_plain, 2),
                     "salted_sec": round(t_salt, 2)},
        "lsh": {"wall_sec": round(lsh_wall, 2),
                "n_pairs": pairs_n,
                "n_star_members": int(bstats[0].n_star_members),
                "max_bucket": max(int(r.max_bucket_size)
                                  for r in bstats.values()),
                "overflow_buckets": sum(int(r.n_overflow_buckets)
                                        for r in bstats.values())},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
