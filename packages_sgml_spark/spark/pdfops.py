"""PDF text/layout extraction operator (north rule: 'PDF/layout
parse') — same narrow-map shape as the HTML extractor.

The per-row extractor is the pure-stdlib core/pdf.py subset (Flate
streams + Tj/TJ text operators).  On a cluster with pdfium/poppler,
swap the `_extract` callable; the operator, schema, batching, and
error isolation stay identical.
"""

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (ArrayType, IntegerType, StringType,
                               StructField, StructType)

PDF_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("text", StringType()),
    StructField("title", StringType()),
    StructField("n_pages", IntegerType()),
    StructField("n_objects", IntegerType()),
    StructField("flags", ArrayType(StringType())),
    StructField("status", StringType()),
])

MAX_PDF_BYTES = 64 * 1024 * 1024


def extract_pdf_text(pdfs: DataFrame, repartition=0) -> DataFrame:
    """pdfs(url, pdf binary) -> PDF_SCHEMA."""
    src = pdfs.select("url", "pdf")
    if repartition:
        src = src.repartition(repartition, F.xxhash64("url"))

    def fn(batches: Iterator[pd.DataFrame]):
        from packages_sgml_spark.core.pdf import extract_pdf
        for pdf_batch in batches:
            out = {k: [] for k in ("url", "text", "title", "n_pages",
                                   "n_objects", "flags", "status")}
            urls = pdf_batch["url"].tolist()
            blobs = pdf_batch["pdf"].tolist()
            for i in range(len(urls)):
                out["url"].append(urls[i])
                blob = blobs[i]
                if blob is None or len(blob) == 0:
                    out["text"].append(None)
                    out["title"].append(None)
                    out["n_pages"].append(0)
                    out["n_objects"].append(0)
                    out["flags"].append([])
                    out["status"].append("empty")
                    continue
                if len(blob) > MAX_PDF_BYTES:
                    out["text"].append(None)
                    out["title"].append(None)
                    out["n_pages"].append(0)
                    out["n_objects"].append(0)
                    out["flags"].append(["too_large"])
                    out["status"].append("too_large")
                    continue
                try:
                    r = extract_pdf(bytes(blob))
                    out["text"].append(r["text"])
                    out["title"].append(r["title"])
                    out["n_pages"].append(r["n_pages"])
                    out["n_objects"].append(r["n_objects"])
                    out["flags"].append(r["flags"])
                    out["status"].append(
                        "ok" if "not_pdf" not in r["flags"]
                        else "not_pdf")
                except Exception as ex:    # noqa: BLE001
                    out["text"].append(None)
                    out["title"].append(None)
                    out["n_pages"].append(0)
                    out["n_objects"].append(0)
                    out["flags"].append(["exception"])
                    out["status"].append("exception: %s" % ex)
            yield pd.DataFrame(out)

    return src.mapInPandas(fn, schema=PDF_SCHEMA)


def synthetic_pdfs(spark, docs: DataFrame) -> DataFrame:
    """documents rows -> deterministic single-page PDFs (test/bench
    fixture; built per-batch in the workers)."""
    from pyspark.sql.types import BinaryType

    def fn(batches):
        from packages_sgml_spark.core.pdf import make_simple_pdf
        for b in batches:
            rows = {"url": [], "pdf": []}
            for doc_id, text in zip(b["doc_id"].tolist(),
                                    b["text"].tolist()):
                rows["url"].append("pdf://%d" % doc_id)
                rows["pdf"].append(make_simple_pdf(
                    [text[:400]], title="Doc %d" % doc_id,
                    compress=doc_id % 2 == 0))
            yield pd.DataFrame(rows)

    schema = StructType([StructField("url", StringType()),
                         StructField("pdf", BinaryType())])
    from .util import spread
    # r9: spread so PDF synthesis runs on every core at gate scale
    return spread(docs.select("doc_id", "text"),
                  "doc_id").mapInPandas(fn, schema=schema)
