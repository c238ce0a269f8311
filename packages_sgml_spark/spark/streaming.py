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


# ----------------------------------------------------------------------
# custom stateful operator: applyInPandasWithState sessionizer
# ----------------------------------------------------------------------

SESSION_OUTPUT = ("user_id long, session_start timestamp, "
                  "last_ts timestamp, n_events long, sum_value double, "
                  "closed boolean")
SESSION_STATE = ("session_start timestamp, last_ts timestamp, "
                 "n_events long, sum_value double")


def _sessionize_fn(gap_seconds):
    import datetime as _dt

    def fn(key, pdf_iter, state):
        import pandas as pd
        (user_id,) = key
        if state.hasTimedOut:
            (s0, s1, n, sv) = state.get
            state.remove()
            yield pd.DataFrame([{
                "user_id": user_id, "session_start": s0,
                "last_ts": s1, "n_events": n, "sum_value": sv,
                "closed": True}])
            return
        rows = []
        for pdf in pdf_iter:
            rows.append(pdf[["ts", "value"]])
        batch = pd.concat(rows).sort_values("ts")
        if state.exists:
            (s0, s1, n, sv) = state.get
        else:
            s0 = s1 = None
            n, sv = 0, 0.0
        out = []
        gap = _dt.timedelta(seconds=gap_seconds)
        for ts, value in zip(batch["ts"], batch["value"]):
            ts = ts.to_pydatetime()
            if s0 is None:
                s0, s1, n, sv = ts, ts, 1, float(value)
            elif ts - s1 >= gap:
                out.append({"user_id": user_id, "session_start": s0,
                            "last_ts": s1, "n_events": n,
                            "sum_value": sv, "closed": True})
                s0, s1, n, sv = ts, ts, 1, float(value)
            else:
                s1 = max(s1, ts)
                n += 1
                sv += float(value)
        state.update((s0, s1, n, sv))
        state.setTimeoutDuration(gap_seconds * 1000)
        out.append({"user_id": user_id, "session_start": s0,
                    "last_ts": s1, "n_events": n, "sum_value": sv,
                    "closed": False})
        yield pd.DataFrame(out)

    return fn


def stateful_sessionize(event_stream, gap_seconds=600):
    """Custom stateful streaming operator (applyInPandasWithState,
    SURVEY §2.10): per-user session accumulation with processing-time
    timeout close.  Emits an open-session update each batch and a
    closed record when the gap elapses."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (event_stream
            .groupBy("user_id")
            .applyInPandasWithState(
                _sessionize_fn(gap_seconds),
                outputStructType=SESSION_OUTPUT,
                stateStructType=SESSION_STATE,
                outputMode="update",
                timeoutConf=GroupStateTimeout.ProcessingTimeTimeout))


def stream_quality(spark, input_dir: str, schema) -> DataFrame:
    """File-source stream of documents -> the fused curation filter
    projection (textops.quality_features: Gopher + C4 + lang-id in
    one stateless pass).  The whole per-doc filter stack is a single
    narrow projection, so it streams UNCHANGED — no state store, no
    watermark, exactly-once by the file-sink checkpoint; this is the
    continuous-ingest half of the curation pipeline (the global
    decisions — dedup, shards — stay batch by design: they are
    corpus-snapshot functions, jobs/curate_job.py's argument).
    Caller attaches .writeStream + checkpointLocation;
    trigger=availableNow gives batch catch-up semantics."""
    from .textops import quality_features
    docs = (spark.readStream.schema(schema)
            .parquet(input_dir))
    return quality_features(docs)
