"""Job scripts under jobs/: the end-to-end crawl pipeline (WARC in ->
text + metrics + WET out, two-level resume) driven in-process, and
one REAL ``spark-submit --py-files`` launch — the north rule's stated
launch mode — as a subprocess with the package shipped only via the
zip."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "jobs"))


def _write_archive(path, docs):
    from packages_sgml_spark.core.warc import (build_response_record,
                                               write_warc)
    with open(path, "wb") as out:
        write_warc(out, [build_response_record(u, d, b)
                         for u, d, b in docs])


def _args(**kw):
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--run-id", default="t-run")
    ap.add_argument("--dialect", default="html5")
    ap.add_argument("--statuses", default="200")
    ap.add_argument("--repartition", default="auto")
    ap.add_argument("--wet", action="store_true")
    ap.add_argument("--quality", action="store_true")
    ap.add_argument("--text-format", default="plain",
                    dest="text_format")
    argv = []
    for k, v in kw.items():
        argv += ["--" + k.replace("_", "-")] + \
            ([] if v is True else [str(v)])
    return ap.parse_args(argv)


DOCS1 = [
    ("https://j.example/1", "2026-01-01T00:00:01Z",
     b"<html><head><title>One</title></head><p>alpha</html>"),
    ("https://j.example/2", "2026-01-01T00:00:02Z",
     b"<html><head><title>Two</title></head><p>beta</html>"),
]
DOCS2 = [
    ("https://j.example/3", "2026-01-01T00:00:03Z",
     b"<html><head><title>Three</title></head><p>gamma</html>"),
]


def test_crawl_job_two_level_resume(spark, tmp_path):
    import crawl_job
    land = tmp_path / "warc"
    land.mkdir()
    out = str(tmp_path / "sink")
    _write_archive(land / "c-00000.warc.gz", DOCS1)

    s1 = crawl_job.run(spark, _args(
        input=str(land), output=out, run_id="r1", wet=True,
        quality=True))
    assert s1 == {"run_id": "r1", "archives": 1, "docs_new": 2,
                  "wet_records": 2, "docs_pass_quality": 0}
    q = {r.url: r for r in
         spark.read.parquet(out + "/quality").collect()}
    assert sorted(q) == ["https://j.example/1", "https://j.example/2"]
    # tiny docs: present in the sidecar, correctly failing the gates
    assert q["https://j.example/1"].n_words == 1     # "Onealpha"
    assert q["https://j.example/1"].gopher_pass == 0
    assert q["https://j.example/1"].c4_keep == 0

    # nothing new: file-level prune leaves zero archives to read
    s2 = crawl_job.run(spark, _args(
        input=str(land), output=out, run_id="r2"))
    assert s2 == {"run_id": "r2", "archives": 0, "docs_new": 0}

    # a new archive lands; one old doc also reappears in it (a crawl
    # refetch) — file prune admits the archive, url anti-join drops
    # the refetched doc
    _write_archive(land / "c-00001.warc.gz",
                   DOCS2 + [DOCS1[0]])
    s3 = crawl_job.run(spark, _args(
        input=str(land), output=out, run_id="r3", wet=True))
    assert s3 == {"run_id": "r3", "archives": 1, "docs_new": 1,
                  "wet_records": 1}

    text = spark.read.parquet(out + "/text")
    rows = {r.url: r for r in text.collect()}
    assert sorted(rows) == ["https://j.example/1", "https://j.example/2",
                            "https://j.example/3"]   # no duplicates
    assert rows["https://j.example/3"].text_extracted == "Threegamma"
    assert rows["https://j.example/3"].run_id == "r3"

    # metrics sidecar: one run_id per pass that extracted anything
    metrics = spark.read.parquet(out + "/metrics")
    per_run = {r.run_id: r.docs for r in
               metrics.groupBy("run_id").sum("docs")
               .withColumnRenamed("sum(docs)", "docs").collect()}
    assert per_run == {"r1": 2, "r3": 1}

    # WET layer reads back with the extracted text
    from packages_sgml_spark.spark.warc import read_wet
    wet = {r.url: r.text for r in
           read_wet(spark, out + "/wet/*.warc.gz").collect()}
    assert wet["https://j.example/1"] == "Onealpha"
    assert wet["https://j.example/3"] == "Threegamma"

    # archive manifest records both processed files exactly once
    arch = spark.read.parquet(out + "/archives")
    names = sorted(os.path.basename(r.warc_file) for r in arch.collect())
    assert names == ["c-00000.warc.gz", "c-00001.warc.gz"]


def test_crawl_job_url_resume_after_partial_write(spark, tmp_path):
    """Kill-between-sinks shape: text written but the archive
    manifest commit never happened (manifest is written LAST).  The
    rerun re-admits the archive at file level and the url anti-join
    extracts nothing twice."""
    import crawl_job
    land = tmp_path / "warc"
    land.mkdir()
    out = str(tmp_path / "sink")
    _write_archive(land / "c-00000.warc.gz", DOCS1)
    crawl_job.run(spark, _args(input=str(land), output=out,
                               run_id="r1"))
    # simulate the crash: drop the manifest commit
    import shutil
    shutil.rmtree(out + "/archives")
    s2 = crawl_job.run(spark, _args(input=str(land), output=out,
                                    run_id="r2"))
    assert s2["archives"] == 1 and s2["docs_new"] == 0
    text = spark.read.parquet(out + "/text")
    assert text.count() == 2          # still exactly one row per doc


@pytest.mark.slow
def test_spark_submit_py_files_launch(tmp_path):
    """The real launch mode: a fresh spark-submit JVM, package code
    shipped ONLY through --py-files (cwd outside the repo), crawl job
    end-to-end."""
    sys.path.insert(0, REPO)
    from tools.make_pyfiles_zip import build
    zip_path = build(str(tmp_path / "packages_sgml_spark.zip"))
    land = tmp_path / "warc"
    land.mkdir()
    _write_archive(land / "c-00000.warc.gz", DOCS1)
    out = str(tmp_path / "sink")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        ["spark-submit", "--master", "local[4]",
         "--conf", "spark.ui.enabled=false",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--py-files", zip_path,
         os.path.join(REPO, "jobs", "crawl_job.py"),
         "--input", str(land), "--output", out,
         "--run-id", "submit1", "--wet"],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=600)
    assert proc.returncode == 0, proc.stderr[-4000:]
    summary = json.loads(
        [l for l in proc.stdout.splitlines()
         if l.startswith("{")][-1])
    assert summary == {"archives": 1, "docs_new": 2, "run_id": "submit1",
                       "wet_records": 2}
    assert os.path.exists(out + "/text/_SUCCESS")


def test_quality_sidecar_heals_and_never_duplicates(spark, tmp_path):
    """Crash orderings around the quality sidecar: quality rows are
    produced for text rows missing one (self-healing), and a rerun
    never duplicates rows — regardless of run_id reuse."""
    import crawl_job
    import shutil
    land = tmp_path / "warc"
    land.mkdir()
    out = str(tmp_path / "sink")
    _write_archive(land / "c-00000.warc.gz", DOCS1)
    crawl_job.run(spark, _args(input=str(land), output=out,
                               run_id="r1", quality=True))
    # crash between text and quality commits: quality + manifest gone
    shutil.rmtree(out + "/quality")
    shutil.rmtree(out + "/archives")
    s2 = crawl_job.run(spark, _args(input=str(land), output=out,
                                    run_id="r2", quality=True))
    assert s2["docs_new"] == 0                 # text resume exact
    q = spark.read.parquet(out + "/quality")
    assert q.count() == 2                      # healed, once per url
    # crash between quality and manifest, SAME run_id rerun
    shutil.rmtree(out + "/archives")
    crawl_job.run(spark, _args(input=str(land), output=out,
                               run_id="r2", quality=True))
    q2 = spark.read.parquet(out + "/quality")
    assert q2.count() == 2                     # no duplicates
    assert q2.select("url").distinct().count() == 2


def test_crawl_job_markdown_text_format(spark, tmp_path):
    """--text-format markdown writes Markdown into text_extracted
    with the same schema/lineage/resume semantics — and the value
    matches extract_markdown's renderer exactly."""
    import crawl_job
    land = tmp_path / "warc"
    land.mkdir()
    _write_archive(str(land / "a.warc.gz"), [
        ("https://m.example/1", "2026-01-01T00:00:01Z",
         b"<html><body><h1>Title</h1><p>alpha <b>bold</b> and "
         b"<a href='https://m.example/r'>ref</a></p></body></html>"),
    ])
    out = str(tmp_path / "sink")
    s = crawl_job.run(spark, _args(input=str(land) + "/*.warc.gz",
                                   output=out,
                                   text_format="markdown"))
    assert s["docs_new"] == 1
    row = spark.read.parquet(out + "/text").collect()[0]
    assert row.text_extracted == (
        "# Title\n\nalpha **bold** and [ref](https://m.example/r)")
    # resume still no-ops on a second run
    s2 = crawl_job.run(spark, _args(input=str(land) + "/*.warc.gz",
                                    output=out,
                                    text_format="markdown"))
    assert s2["archives"] == 0 and s2["docs_new"] == 0


def test_extract_text_format_matches_extract_markdown(spark):
    """extract(text_format='markdown') and extract_markdown render
    identical markdown for the same pages (one renderer, two
    surfaces), and the invalid combinations raise."""
    from packages_sgml_spark.spark.extract import (extract,
                                                   extract_markdown)
    from packages_sgml_spark.spark.pages import synthetic_pages
    from packages_sgml_spark.spark.queries import ensure_workers
    ensure_workers(spark)
    pages = synthetic_pages(spark, 40, scale=2, unique_links=True,
                            empty_tags=True)
    a = {r.url: r.text_extracted
         for r in extract(pages, nodes=False,
                          text_format="markdown").collect()}
    b = {r.url: r.markdown for r in extract_markdown(pages).collect()}
    assert a == b and len(a) == 40
    import pytest
    with pytest.raises(ValueError):
        extract(pages, nodes=True, text_format="markdown")
    with pytest.raises(ValueError):
        extract(pages, nodes=False, text_format="tokens")


def _curate_args(**kw):
    import argparse
    base = dict(run_id="cur-test", id_col="doc_id", text_col="text",
                strip_spans=False, ngram=8, min_kept_words=5,
                n_shards=4)
    base.update(kw)
    return argparse.Namespace(**base)


def _curate_corpus(spark):
    """Planted curation funnel: an exact-dup pair (dedup removes one),
    a word-soup doc (quality removes it), and two distinct good docs
    sharing one 8-word boilerplate sentence (span strip cuts it from
    BOTH while their unique text survives)."""
    fox = "\n".join(
        ["The quick brown fox jumps over the lazy dog and then "
         "runs back to the barn with a bone that it found near "
         "the old oak tree by the river."] * 4)
    boiler = "all rights reserved contact the site owner today"
    uniq_a = ("The morning market opened early and the vendors "
              "sold fresh bread with cheese and fruit to the "
              "people walking past the long wooden stalls.\n"
              "The harbour was busy at dawn when the boats came "
              "in and the gulls circled over the nets in the "
              "cold air.\n"
              "The fishers counted their catch beside the stone "
              "pier while the carts rolled up the narrow lane "
              "toward the square.")
    uniq_b = ("A quiet library stood at the end of the street "
              "and the readers came each evening to borrow the "
              "old books about the sea.\n"
              "The lamps burned softly over the long tables "
              "while the keeper stamped each card by hand at "
              "the desk.\n"
              "Nobody spoke above a whisper and the clock on "
              "the wall counted the hours until the doors were "
              "closed for the night.")
    return spark.createDataFrame(
        [(1, fox), (2, fox),
         (3, ("zq wx kv jn " * 20).strip()),
         (4, uniq_a + "\n" + boiler),
         (5, uniq_b + "\n" + boiler)],
        "doc_id long, text string")


def test_curate_job_end_to_end_with_strip(spark, tmp_path):
    from pyspark.sql import functions as F

    from jobs.curate_job import run as curate_run
    docs = _curate_corpus(spark)
    inp = str(tmp_path / "docs")
    docs.write.parquet(inp)
    out = str(tmp_path / "cur")
    summary = curate_run(spark, _curate_args(
        input=inp, output=out, strip_spans=True))
    # funnel: 5 in; doc 2 fails dedup; doc 3 fails quality
    assert summary["docs_in"] == 5
    assert summary["pass_dedup"] == 4
    assert summary["docs_kept"] == 3
    assert summary["docs_out"] == 3
    assert summary["tokens_after_strip"] < summary[
        "tokens_before_strip"]
    clean = {r.doc_id: r for r in
             spark.read.parquet(out + "/clean").collect()}
    assert set(clean) == {1, 4, 5}
    # the fox doc repeats only WITHIN itself (its dup was removed
    # BEFORE the span pass — Lee et al. order), so it keeps all text
    assert clean[1].n_kept == clean[1].n_words
    # the shared boilerplate sentence (8 words = one cross-doc
    # duplicated 8-gram) is cut from BOTH survivors
    for d in (4, 5):
        assert clean[d].n_kept == clean[d].n_words - 8, clean[d]
        assert "rights reserved" not in clean[d].text
        # original case preserved (only whitespace is reflowed)
        assert clean[d].text.startswith(("The morning", "A quiet"))
    # shard layout: every clean doc exactly once, ranks contiguous
    shards = spark.read.parquet(out + "/shards")
    assert {r.doc_id for r in shards.collect()} == {1, 4, 5}
    per = shards.groupBy("shard").agg(
        F.count("*").alias("n"), F.max("shard_pos").alias("mx"))
    assert all(r.n == r.mx for r in per.collect())


def test_curate_job_stage_level_resume(spark, tmp_path):
    import glob
    import os

    from jobs.curate_job import run as curate_run
    docs = _curate_corpus(spark)
    inp = str(tmp_path / "docs")
    docs.write.parquet(inp)
    out = str(tmp_path / "cur")
    s1 = curate_run(spark, _curate_args(input=inp, output=out))
    assert s1["resumed_stages"] == []
    dec_parts = sorted(glob.glob(out + "/decisions/*.parquet"))
    mtimes = [os.path.getmtime(p) for p in dec_parts]

    # full rerun: every stage skipped, sinks untouched, same funnel
    s2 = curate_run(spark, _curate_args(input=inp, output=out,
                                        run_id="cur-test-2"))
    assert s2["resumed_stages"] == ["clean", "decisions",
                                    "metrics", "shards"]
    assert [os.path.getmtime(p) for p in dec_parts] == mtimes
    for k in ("docs_in", "docs_kept", "docs_out"):
        assert s2[k] == s1[k]

    # crash simulation: the manifest rows for shards+metrics never
    # landed -> only those two stages recompute; decisions untouched
    man = spark.read.parquet(out + "/stages") \
        .filter("stage IN ('decisions', 'clean')").collect()
    import shutil
    shutil.rmtree(out + "/stages")
    spark.createDataFrame(man).coalesce(1) \
        .write.parquet(out + "/stages")
    s3 = curate_run(spark, _curate_args(input=inp, output=out,
                                        run_id="cur-test-3"))
    assert s3["resumed_stages"] == ["clean", "decisions"]
    assert [os.path.getmtime(p) for p in dec_parts] == mtimes
    assert s3["docs_out"] == s1["docs_out"]
    shards = spark.read.parquet(out + "/shards")
    assert shards.count() == s1["docs_out"]


def test_curate_job_all_filtered_corpus(spark, tmp_path):
    """A corpus where every doc fails quality must complete, not
    crash: an empty PARTITIONED shards sink has no part files at all
    (partitionBy writes nothing for 0 rows) and reads as
    UNABLE_TO_INFER_SCHEMA — the job must treat that as a valid
    empty result, and a rerun must still resume every stage."""
    from jobs.curate_job import run as curate_run
    docs = spark.createDataFrame(
        [(i, "zq wx kv jn " * 20) for i in range(4)],
        "doc_id long, text string")
    inp = str(tmp_path / "docs")
    docs.write.parquet(inp)
    out = str(tmp_path / "cur")
    s1 = curate_run(spark, _curate_args(
        input=inp, output=out, strip_spans=True))
    assert s1["docs_in"] == 4 and s1["docs_kept"] == 0
    assert s1["docs_out"] == 0
    s2 = curate_run(spark, _curate_args(
        input=inp, output=out, strip_spans=True, run_id="rerun"))
    assert s2["resumed_stages"] == ["clean", "decisions",
                                    "metrics", "shards"]
    assert s2["docs_out"] == 0


def test_curate_job_refuses_stale_resume(spark, tmp_path):
    """Resume against a manifest written under DIFFERENT parameters
    (or a changed corpus) must refuse loudly, not silently reuse
    sinks computed under the old contract."""
    import pytest as _pytest

    from jobs.curate_job import run as curate_run
    docs = _curate_corpus(spark)
    inp = str(tmp_path / "docs")
    docs.write.parquet(inp)
    out = str(tmp_path / "cur")
    curate_run(spark, _curate_args(input=inp, output=out,
                                   n_shards=8))
    with _pytest.raises(ValueError, match="different parameters"):
        curate_run(spark, _curate_args(input=inp, output=out,
                                       n_shards=64))
    # same params, grown corpus under the same input path
    docs.limit(2).withColumn(
        "doc_id", docs.doc_id + 100).write.mode("append").parquet(inp)
    with _pytest.raises(ValueError, match="corpus changed"):
        curate_run(spark, _curate_args(input=inp, output=out,
                                       n_shards=8))


def test_crawl_to_curate_pipeline(spark, tmp_path):
    """The two jobs compose as documented: crawl_job's text sink is
    curate_job's input with --id-col url --text-col text_extracted.
    String doc ids flow through every stage (dedup components,
    span-strip, md5 sharding all order/hash strings fine)."""
    import crawl_job

    from jobs.curate_job import run as curate_run
    land = tmp_path / "warc"
    land.mkdir()
    sink = str(tmp_path / "sink")
    _write_archive(land / "c-00000.warc.gz", DOCS1)
    crawl_job.run(spark, _args(input=str(land), output=sink,
                               run_id="r1"))
    out = str(tmp_path / "cur")
    summary = curate_run(spark, _curate_args(
        input=sink + "/text", output=out, id_col="url",
        text_col="text_extracted", strip_spans=True))
    # tiny pages fail the quality gates (same as the crawl-job
    # quality sidecar asserts) — the funnel completes regardless
    assert summary["docs_in"] == 2
    assert summary["pass_dedup"] == 2      # distinct texts
    assert summary["docs_kept"] == 0       # gopher rejects tiny docs
    dec = {r.doc_id: r for r in
           spark.read.parquet(out + "/decisions").collect()}
    assert sorted(dec) == ["https://j.example/1",
                           "https://j.example/2"]
    assert all(r.keep_dedup == 1 for r in dec.values())


@pytest.mark.slow
def test_spark_submit_curate_launch(spark, tmp_path):
    """The curation job's real launch mode: fresh spark-submit JVM,
    package shipped ONLY via --py-files, cwd outside the repo."""
    sys.path.insert(0, REPO)
    from tools.make_pyfiles_zip import build
    zip_path = build(str(tmp_path / "packages_sgml_spark.zip"))
    inp = str(tmp_path / "docs")
    _curate_corpus(spark).write.parquet(inp)
    out = str(tmp_path / "cur")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        ["spark-submit", "--master", "local[4]",
         "--conf", "spark.ui.enabled=false",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--py-files", zip_path,
         os.path.join(REPO, "jobs", "curate_job.py"),
         "--input", inp, "--output", out,
         "--run-id", "submit-cur", "--strip-spans",
         "--n-shards", "4"],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=600)
    assert proc.returncode == 0, proc.stderr[-4000:]
    summary = json.loads(
        [l for l in proc.stdout.splitlines()
         if l.startswith("{")][-1])
    assert summary["docs_in"] == 5 and summary["docs_out"] == 3
    assert os.path.exists(out + "/stages/_SUCCESS")
    assert os.path.exists(out + "/decisions/_SUCCESS")
