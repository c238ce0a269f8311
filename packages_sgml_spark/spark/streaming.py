"""Structured Streaming variants (SURVEY.md §2.10).

The reference's incremental push-parse (resumable per character,
parser.c:4682-4718) maps at job level to Structured Streaming over
arriving page files: readStream -> the same extract() mapInPandas ->
sink with checkpointLocation.  Late/ordered data semantics (not in
the reference — documents are independent) are provided for the
events table via watermarked tumbling windows.
"""

from pyspark.sql import DataFrame, functions as F

from .extract import extract


def stream_extract(spark, input_dir: str, schema,
                   dialect="html5") -> DataFrame:
    """File-source stream of pages -> streaming extraction.  Caller
    attaches .writeStream with a checkpointLocation (exact-once file
    sink); trigger=availableNow gives batch-catchup semantics."""
    pages = (spark.readStream.schema(schema)
             .parquet(input_dir))
    return extract(pages, dialect=dialect, nodes=False)


def windowed_event_counts(events: DataFrame, watermark="10 minutes",
                          window="1 hour") -> DataFrame:
    """Watermarked tumbling-window aggregation (late data dropped
    after the watermark)."""
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.sum("value").alias("sum_value"))
            .select(F.col("w.start").alias("window_start"),
                    "event_type", "n_events", "sum_value"))


def run_stream_to_memory(spark, input_dir, schema, query_name,
                         dialect="html5"):
    """availableNow streaming extraction into an in-memory sink;
    returns the finished query's result DataFrame (test helper)."""
    sdf = stream_extract(spark, input_dir, schema, dialect)
    q = (sdf.select("url", "text_extracted", "n_errors", "status")
         .writeStream.format("memory").queryName(query_name)
         .trigger(availableNow=True)
         .option("checkpointLocation",
                 input_dir.rstrip("/") + "_ckpt_" + query_name)
         .start())
    q.awaitTermination(120)
    return spark.table(query_name)
