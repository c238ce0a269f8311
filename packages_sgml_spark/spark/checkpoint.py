"""Checkpoint / resume / metrics plumbing (north rule: per-partition
lineage + parse-error metrics to a sidecar table, exact resume).

Design for 10^12 docs:
- The unit of completion is the document (url).  The done-set is a
  parquet table of url hashes, partitioned like the input; resume is
  a left_anti join on xxhash64(url) — a key-partitioned join that AQE
  sizes, no broadcast of the (large) done-set needed.
- Metrics are aggregated per input partition with
  spark_partition_id() — one row per task, so the sidecar stays tiny
  (thousands of rows per run, not per-document).
- Idempotence: re-running a finished batch re-extracts nothing
  (anti-join empties), and writes are append-only with run_id so a
  killed run resumes by filtering on its own lineage.
"""

import time

from pyspark.sql import DataFrame, functions as F


def read_parquet_or_none(spark, path):
    """Read a sink that may not exist yet; None means "first run".

    Only a genuinely-missing or genuinely-empty sink qualifies —
    PATH_NOT_FOUND / "Path does not exist" for missing,
    UNABLE_TO_INFER_SCHEMA for a dir a crashed first attempt created
    but never committed (only _temporary/, or a 0-row partitioned
    write which produces no part files at all).  Any other read
    failure (permissions, corrupt footer, FS hiccup) must surface:
    treating it as "first run" would silently recompute and break
    exactly-once/resume.  THE one definition — every job's resume
    path routes through here (a session-5 review catch: four
    hand-maintained copies of this three-string match would drift
    on the next Spark error-class rename)."""
    from pyspark.errors import AnalysisException
    try:
        return spark.read.parquet(path)
    except AnalysisException as ex:
        msg = str(ex)
        if ("PATH_NOT_FOUND" not in msg
                and "Path does not exist" not in msg
                and "UNABLE_TO_INFER_SCHEMA" not in msg):
            raise
        return None


def with_lineage(extracted: DataFrame, run_id: str) -> DataFrame:
    """Tag extraction output with run lineage + partition id."""
    return (extracted
            .withColumn("run_id", F.lit(run_id))
            .withColumn("partition_id", F.spark_partition_id())
            .withColumn("url_hash", F.xxhash64("url")))


def partition_metrics(tagged: DataFrame) -> DataFrame:
    """Per-partition metrics rollup (SURVEY.md §2.5 'our pipeline
    metrics'): map-side partial agg, one row per partition."""
    return (tagged.groupBy("run_id", "partition_id")
            .agg(F.count("*").alias("docs"),
                 F.sum("html_bytes").alias("bytes"),
                 F.sum("n_errors").alias("parse_errors"),
                 F.sum(F.when(F.col("status") != "ok", 1).otherwise(0))
                 .alias("failed_docs"),
                 F.min("url_hash").alias("url_hash_min"),
                 F.max("url_hash").alias("url_hash_max"),
                 F.max(F.lit(int(time.time() * 1000)))
                 .alias("updated_at_ms")))


def resume_filter(pages: DataFrame, done: DataFrame) -> DataFrame:
    """Drop already-extracted urls.  `done` needs only a url column
    (e.g. the text sink read back, or the checkpoint table)."""
    return pages.join(done.select("url"), "url", "left_anti")


def run_extract_with_checkpoint(pages: DataFrame, out_dir: str,
                                run_id: str, dialect="html5"):
    """One resumable extraction pass: filters done urls, extracts,
    appends results + metrics.  Returns (n_new, metrics_rows)."""
    from .extract import extract

    spark = pages.sparkSession
    text_path = out_dir + "/text"
    metrics_path = out_dir + "/metrics"
    done = read_parquet_or_none(spark, text_path)
    todo = pages if done is None else resume_filter(pages, done)
    ex = extract(todo, dialect=dialect, nodes=False)
    tagged = with_lineage(ex, run_id)
    tagged.select("url", "url_hash", "text_extracted", "n_errors",
                  "html_bytes", "status", "run_id", "partition_id") \
          .write.mode("append").parquet(text_path)
    out = spark.read.parquet(text_path) \
        .filter(F.col("run_id") == run_id)
    m = partition_metrics(out)
    m.write.mode("append").parquet(metrics_path)
    n_new = out.count()
    return n_new, spark.read.parquet(metrics_path)
