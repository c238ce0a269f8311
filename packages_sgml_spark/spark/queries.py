"""Query registry backing __spark_entry__.py.

Each entry: a Spark callable (spark, sf_dir) -> DataFrame and,
where ANSI-SQL-expressible, a DuckDB oracle string over the same
parquet tables.  Column names/aliases match exactly on both sides
(the driver sorts columns by name and value-hashes).

Float discipline: aggregate sums go through DECIMAL casts (exact in
both engines); ratios are single IEEE double ops rounded to 6
decimals — deterministic and engine-portable.
"""

import os
import tempfile
import zipfile

from pyspark.sql import DataFrame, Window, functions as F

from . import dedup, similarity, textops
from .extract import extract
from .nodes import child_text, count_named, explode_nodes
from .pages import docs_as_pages

_PYFILE_SENT = {}


def ensure_workers(spark):
    """Ship the package to python workers (addPyFile zip) so
    mapInPandas closures can import it regardless of the driver's
    PYTHONPATH."""
    key = id(spark.sparkContext)
    if _PYFILE_SENT.get(key):
        return
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zip_path = os.path.join(tempfile.gettempdir(),
                            "packages_sgml_spark_%d.zip" % os.getpid())
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w") as z:
            for dirpath, _dirs, files in os.walk(pkg_root):
                for fn in files:
                    if fn.endswith(".py"):
                        full = os.path.join(dirpath, fn)
                        rel = os.path.relpath(
                            full, os.path.dirname(pkg_root))
                        z.write(full, rel)
    spark.sparkContext.addPyFile(zip_path)
    _PYFILE_SENT[key] = True


def _t(spark, sf_dir, name):
    return spark.read.parquet(os.path.join(sf_dir, name + ".parquet"))


# ---------------------------------------------------------------------
# extraction queries (documents -> synthesized pages -> parse)
# ---------------------------------------------------------------------

def q_extract_text(spark, sf_dir):
    ensure_workers(spark)
    docs = _t(spark, sf_dir, "documents")
    pages = docs_as_pages(docs)
    ex = extract(pages, dialect="html5", nodes=False)
    return (ex.select(
        F.substring("url", 7, 32).cast("bigint").alias("doc_id"),
        F.col("text_extracted")))


def q_extract_title(spark, sf_dir):
    ensure_workers(spark)
    docs = _t(spark, sf_dir, "documents")
    pages = docs_as_pages(docs)
    ex = extract(pages, dialect="html5", nodes=True)
    nodes = explode_nodes(ex)
    titles = nodes.filter((F.col("kind") == "element") &
                          (F.col("name") == "title"))
    txt = child_text(nodes)
    return (titles.join(txt, ["url", "node_id"])
            .select(F.substring("url", 7, 32).cast("bigint")
                    .alias("doc_id"),
                    F.col("text_direct").alias("title_text")))


def q_count_links(spark, sf_dir):
    ensure_workers(spark)
    docs = _t(spark, sf_dir, "documents")
    pages = docs_as_pages(docs, links=True)
    ex = extract(pages, dialect="html5", nodes=True)
    nodes = explode_nodes(ex)
    links = (nodes.filter((F.col("kind") == "element") &
                          (F.col("name") == "a"))
             .groupBy("url").agg(F.count("*").alias("n_links")))
    return links.select(
        F.substring("url", 7, 32).cast("bigint").alias("doc_id"),
        "n_links")


def q_element_histogram(spark, sf_dir):
    ensure_workers(spark)
    docs = _t(spark, sf_dir, "documents")
    pages = docs_as_pages(docs, links=True)
    ex = extract(pages, dialect="html5", nodes=True)
    nodes = explode_nodes(ex)
    return (count_named(nodes)
            .groupBy("name").agg(F.sum("n").alias("total"))
            .select("name", F.col("total").cast("bigint").alias("total")))


# ---------------------------------------------------------------------
# relational / aggregation / window (engine ops per SURVEY §2.12)
# ---------------------------------------------------------------------

def q_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (li.filter(F.col("l_shipdate") <=
                      F.lit("1998-09-02").cast("timestamp"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum(dec("l_quantity")).cast("decimal(38,2)")
                 .alias("sum_qty"),
                 F.sum(dec("l_extendedprice")).cast("decimal(38,2)")
                 .alias("sum_base_price"),
                 F.sum((dec("l_extendedprice") *
                        (F.lit(1).cast("decimal(18,2)") -
                         dec("l_discount")))).cast("decimal(38,4)")
                 .alias("sum_disc_price"),
                 F.count("*").alias("count_order"))
            .orderBy("l_returnflag", "l_linestatus"))


def q_top_customers(spark, sf_dir):
    """Broadcast-join orders x customer, revenue top-20."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    rev = (orders.groupBy("o_custkey")
           .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("decimal(38,2)").alias("revenue"),
                F.count("*").alias("n_orders")))
    joined = rev.join(F.broadcast(cust),
                      rev.o_custkey == cust.c_custkey)
    return (joined.select("c_custkey", "c_name", "c_mktsegment",
                          "revenue", "n_orders")
            .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
            .limit(20))


def q_segment_order_priority(spark, sf_dir):
    """3-way join + agg: customer segment x order priority counts."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    j = orders.join(F.broadcast(cust),
                    orders.o_custkey == cust.c_custkey)
    return (j.groupBy("c_mktsegment", "o_orderpriority")
            .agg(F.count("*").alias("n"),
                 F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                 .cast("decimal(38,2)").alias("total")))


def q_events_hourly(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (ev.groupBy(F.date_trunc("hour", "ts").alias("hour"),
                       "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.sum(F.col("value").cast("decimal(18,6)"))
                 .cast("decimal(38,6)").alias("sum_value")))


def q_top_event_per_user(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("value").desc(), F.col("event_id").asc())
    return (ev.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("user_id", "event_id", "event_type",
                    F.round("value", 6).alias("value")))


def q_source_stats(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return (docs.groupBy("source", "lang")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_chars").alias("sum_chars")))


def q_resume_filter(spark, sf_dir):
    """Checkpoint-resume analog: anti-join against a done-set
    (north rule resumability primitive)."""
    docs = _t(spark, sf_dir, "documents")
    done = docs.filter(F.col("doc_id") % 10 == 0).select("doc_id")
    return (docs.join(done, "doc_id", "left_anti")
            .select("doc_id", "n_chars"))


def q_dedup_newest(spark, sf_dir):
    """as-of-newest per user from events (dropDuplicates-by-window
    per SURVEY §2.12)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc())
    return (ev.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("user_id", "event_id",
                    F.col("ts").alias("last_ts")))


# ---------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------

def q_lang_id(spark, sf_dir):
    return textops.lang_id_stopwords(_t(spark, sf_dir, "documents"))


def q_quality(spark, sf_dir):
    return textops.quality_score(_t(spark, sf_dir, "documents"))


def q_token_count(spark, sf_dir):
    return textops.token_count(_t(spark, sf_dir, "documents"))


def q_fingerprint(spark, sf_dir):
    return textops.fingerprint(_t(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------
# dedup & similarity
# ---------------------------------------------------------------------

def q_dedup_exact(spark, sf_dir):
    return dedup.exact_dedup(_t(spark, sf_dir, "documents"))


def q_minhash_signatures(spark, sf_dir):
    sig = dedup.minhash_signatures(_t(spark, sf_dir, "documents"), k=4)
    return sig


def q_minhash_lsh_pairs(spark, sf_dir):
    return dedup.minhash_lsh_pairs(_t(spark, sf_dir, "documents"))


def q_simhash(spark, sf_dir):
    return dedup.simhash(_t(spark, sf_dir, "documents"))


def q_knn_cosine(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    emb = emb.withColumn("embedding",
                         F.col("embedding").cast("array<double>"))
    return similarity.knn_bruteforce(emb, list(range(8)), k=5)


def q_knn_lsh(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    emb = emb.withColumn("embedding",
                         F.col("embedding").cast("array<double>"))
    return similarity.knn_lsh(emb, list(range(8)), dim=64, k=5)


QUERIES = {
    "extract_text": q_extract_text,
    "extract_title": q_extract_title,
    "count_links": q_count_links,
    "element_histogram": q_element_histogram,
    "pricing_summary": q_pricing_summary,
    "top_customers": q_top_customers,
    "segment_order_priority": q_segment_order_priority,
    "events_hourly": q_events_hourly,
    "top_event_per_user": q_top_event_per_user,
    "source_stats": q_source_stats,
    "resume_filter": q_resume_filter,
    "dedup_newest": q_dedup_newest,
    "lang_id": q_lang_id,
    "quality": q_quality,
    "token_count": q_token_count,
    "fingerprint": q_fingerprint,
    "dedup_exact": q_dedup_exact,
    "minhash_signatures": q_minhash_signatures,
    "minhash_lsh_pairs": q_minhash_lsh_pairs,
    "simhash": q_simhash,
    "knn_cosine": q_knn_cosine,
    "knn_lsh": q_knn_lsh,
}
