"""WARC reader/writer: core roundtrips, malformed-content resync,
HTTP split, and the Spark source/sink (read_warc / warc_pages /
write_warc_pages) against synthesized member-per-record archives."""

import gzip
import os
import io
import zlib

import pytest
from pyspark.sql import functions as F

from packages_sgml_spark.core.warc import (
    build_record, build_response_record, gzip_member,
    http_content_type, iter_gzip_members, iter_warc_records,
    parse_warc_buffer, sha1_digest, split_http_response, write_warc)


def _one(data, errors=None):
    recs = list(iter_warc_records(data, errors))
    assert len(recs) == 1
    return recs[0]


def test_plain_roundtrip():
    body = b"hello \x00 world"
    raw = build_record("resource", body, url="https://x.example/r",
                       date="2026-01-02T03:04:05Z")
    rec = _one(raw)
    assert rec.type == "resource"
    assert rec.url == "https://x.example/r"
    assert rec.date == "2026-01-02T03:04:05Z"
    assert rec.body == body
    assert rec.get("WARC-Block-Digest") == sha1_digest(body)
    assert rec.get("content-length") == str(len(body))  # case-insens
    assert rec.record_id.startswith("<urn:uuid:")
    # deterministic id: same inputs -> same bytes
    assert raw == build_record("resource", body,
                               url="https://x.example/r",
                               date="2026-01-02T03:04:05Z")


def test_gzip_member_per_record_and_offsets():
    recs_raw = [build_record("metadata", b"m%d" % i,
                             url="https://x/%d" % i,
                             date="2026-01-01T00:00:00Z")
                for i in range(3)]
    buf = io.BytesIO()
    assert write_warc(buf, recs_raw) == 3
    data = buf.getvalue()
    # multi-member: stdlib gzip sees the concatenation
    assert gzip.decompress(data) == b"".join(recs_raw)
    members = list(iter_gzip_members(data))
    assert len(members) == 3 and members[0][0] == 0
    errors = []
    recs = list(iter_warc_records(data, errors))
    assert errors == []
    assert [r.body for r in recs] == [b"m0", b"m1", b"m2"]
    # offsets are compressed member offsets (CDX convention)
    assert [r.offset for r in recs] == [m[0] for m in members]
    # gzip writer is deterministic (mtime 0)
    assert gzip_member(recs_raw[0]) == gzip_member(recs_raw[0])


def test_http_response_split_and_charset():
    payload = "<html><p>café</html>".encode("iso-8859-1")
    raw = build_response_record(
        "https://h.example/a", "2026-01-01T00:00:00Z", payload,
        http_content_type="text/html; charset=ISO-8859-1",
        http_headers=(("Server", "x"),))
    rec = _one(raw)
    assert rec.type == "response"
    status, headers, got = split_http_response(rec.body)
    assert status == 200 and got == payload
    mime, charset = http_content_type(headers)
    assert mime == "text/html" and charset == "iso-8859-1"
    assert rec.get("WARC-Payload-Digest") == sha1_digest(payload)


def test_http_split_no_separator():
    errors = []
    status, headers, payload = split_http_response(b"not http", errors)
    assert status is None and payload == b"not http" and errors


def test_warc11_bracketed_uri_and_continuation():
    raw = (b"WARC/1.1\r\n"
           b"WARC-Type: response\r\n"
           b"WARC-Target-URI: <https://w.example/x>\r\n"
           b"X-Folded: a\r\n  b\r\n"
           b"Content-Length: 2\r\n"
           b"\r\nhi\r\n\r\n")
    rec = _one(raw)
    assert rec.version == "WARC/1.1"
    assert rec.url == "https://w.example/x"
    assert rec.get("X-Folded") == "a b"
    assert rec.body == b"hi"


def test_malformed_resync_and_truncation():
    good = build_record("resource", b"ok", url="https://x/1",
                        date="2026-01-01T00:00:00Z")
    bad = b"WARC/1.0\r\nContent-Length: oops\r\n\r\nzz\r\n\r\n"
    garbage = b"random junk\r\n"
    errors = []
    recs = list(iter_warc_records(garbage + bad + good, errors))
    assert [r.body for r in recs] == [b"ok"]
    assert any("garbage" in e for e in errors)
    assert any("Content-Length" in e for e in errors)
    # truncated tail: reported, good prefix still parsed
    errors2 = []
    recs2 = list(iter_warc_records(good + good[:40], errors2))
    assert len(recs2) == 1 and any("truncated" in e for e in errors2)
    # bad gzip tail
    errors3 = []
    data = gzip_member(good) + b"\x1f\x8b\x00garbage"
    recs3 = list(iter_warc_records(data, errors3))
    assert len(recs3) == 1 and any("gzip" in e for e in errors3)


def test_sniff_charset_priority():
    from packages_sgml_spark.core.warc import sniff_charset
    # BOM beats everything
    assert sniff_charset(b"\xef\xbb\xbf<html>", "iso-8859-1") == "utf-8"
    assert sniff_charset(b"\xff\xfex\x00", "") == "utf-16le"
    # HTTP header beats meta; WHATWG alias folds latin-1 family
    assert sniff_charset(
        b'<meta charset="shift_jis">', "ISO-8859-1") == "windows-1252"
    # meta prescan variants
    assert sniff_charset(b'<html><META CHARSET=Shift_JIS>', "") == \
        "shift_jis"
    assert sniff_charset(
        b'<meta http-equiv="Content-Type" content="text/html; '
        b'charset=EUC-JP">', "") == "euc-jp"
    # meta outside the 1 KiB prescan window is ignored
    assert sniff_charset(b"<p>" + b"x" * 1100 +
                         b'<meta charset="euc-jp">', "") == ""
    # xml decl
    assert sniff_charset(
        b"<?xml version='1.0' encoding='ISO-8859-2'?><r/>", "") == \
        "iso-8859-2"
    assert sniff_charset(b"<html>plain", "") == ""


def test_to_utf8_passthrough_and_transcode():
    from packages_sgml_spark.core.warc import to_utf8
    # utf-8 and unknown: byte-identical passthrough, even invalid utf-8
    bad = b"<p>\xc3</p>"
    assert to_utf8(bad, "utf-8") == (bad, None)
    assert to_utf8(bad, "") == (bad, None)
    out, err = to_utf8(bad, "not-a-charset")
    assert out == bad and "unknown charset" in err
    # windows-1252 curly quote + iso-8859-1 alias
    assert to_utf8(b"\x93hi\x94", "windows-1252") == \
        ("“hi”".encode("utf-8"), None)
    assert to_utf8(b"caf\xe9", "iso-8859-1") == \
        ("café".encode("utf-8"), None)
    # utf-16le with BOM: BOM stripped on transcode
    src = "﻿<p>héllo</p>".encode("utf-16le")
    assert to_utf8(src, "utf-16le") == \
        ("<p>héllo</p>".encode("utf-8"), None)


def test_warc_pages_transcode_spark(spark, tmp_path):
    from packages_sgml_spark.spark.warc import read_warc, warc_pages
    legacy = "<html><p>café “quoted”</html>".encode(
        "windows-1252")
    utf8_doc = "<html><p>café</html>".encode("utf-8")
    f = tmp_path / "legacy.warc.gz"
    with open(f, "wb") as out:
        write_warc(out, [
            build_response_record(
                "https://l.example/1", "2026-01-01T00:00:00Z", legacy,
                http_content_type="text/html; charset=windows-1252"),
            build_response_record(
                "https://l.example/2", "2026-01-01T00:00:01Z",
                utf8_doc),
        ])
    got = {r.url: bytes(r.html)
           for r in warc_pages(spark, str(f)).collect()}
    assert got["https://l.example/1"] == \
        "<html><p>café “quoted”</html>".encode("utf-8")
    assert got["https://l.example/2"] == utf8_doc   # byte-identical
    # charset column reports the source charset
    cs = {r.url: r.charset for r in
          read_warc(spark, str(f), transcode=True).collect()}
    assert cs["https://l.example/1"] == "windows-1252"
    assert cs["https://l.example/2"] == "utf-8"


@pytest.fixture()
def archive_dir(tmp_path):
    docs = [
        ("https://a.example/1", "2026-01-01T00:00:01Z",
         b"<html><head><title>One</title></head><p>alpha</html>"),
        ("https://a.example/2", "2026-01-01T00:00:02Z",
         b"<html><head><title>Two</title></head><p>beta</html>"),
        ("https://b.example/3", "2026-01-01T00:00:03Z",
         b"<html><head><title>Three</title></head><p>gamma</html>"),
    ]
    f1 = tmp_path / "crawl-00000.warc.gz"
    with open(f1, "wb") as out:
        # warcinfo + request records must be filtered by warc_pages
        write_warc(out, [
            build_record("warcinfo", b"software: test\r\n",
                         date="2026-01-01T00:00:00Z",
                         content_type="application/warc-fields"),
            build_response_record(*docs[0]),
            build_record("request", b"GET /2 HTTP/1.1\r\n\r\n",
                         url=docs[1][0], date=docs[1][1],
                         content_type="application/http;msgtype=request"),
            build_response_record(*docs[1]),
            # 404 response: filtered by statuses=(200,)
            build_response_record("https://a.example/miss", docs[1][1],
                                  b"gone", status=404,
                                  reason="Not Found"),
        ])
    f2 = tmp_path / "crawl-00001.warc"        # plain variant
    with open(f2, "wb") as out:
        write_warc(out, [build_response_record(*docs[2])],
                   compress=False)
    return tmp_path, docs


def test_read_warc_spark(spark, archive_dir):
    from packages_sgml_spark.spark.warc import read_warc
    path, docs = archive_dir
    df = read_warc(spark, str(path) + "/*.warc*", record_types=None)
    rows = df.collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r.record_type, []).append(r)
    assert len(by_type["warcinfo"]) == 1
    assert len(by_type["request"]) == 1
    assert len(by_type["response"]) == 4
    assert "x-parse-errors" not in by_type
    ok = {r.url: r for r in by_type["response"]}
    for url, date, payload in docs:
        r = ok[url]
        assert bytes(r.html) == payload          # byte-identical payload
        assert r.http_status == 200
        assert r.content_type == "text/html"
        assert r.charset == "utf-8"
        assert r.warc_ts.strftime("%Y-%m-%dT%H:%M:%SZ") == date
    assert ok["https://a.example/miss"].http_status == 404


def test_warc_pages_feeds_extract(spark, archive_dir):
    from packages_sgml_spark.spark.warc import warc_pages
    from packages_sgml_spark.spark.extract import extract_element_text
    path, docs = archive_dir
    pages = warc_pages(spark, str(path) + "/*.warc*")
    assert pages.columns == ["url", "warc_ts", "html", "text", "lang"]
    got = {r.url: bytes(r.html) for r in pages.collect()}
    assert got == {u: p for u, _, p in docs}     # 404 + non-response gone
    titles = {r.url: r.element_text for r in
              extract_element_text(pages, "title").collect()}
    assert titles == {"https://a.example/1": "One",
                      "https://a.example/2": "Two",
                      "https://b.example/3": "Three"}


def test_wet_roundtrip_from_extraction(spark, tmp_path, archive_dir):
    """End-to-end CC trio: WARC in -> extract -> WET out -> WET in,
    text byte-identical through the conversion records."""
    from packages_sgml_spark.spark.extract import extract, \
        extracted_with_meta
    from packages_sgml_spark.spark.warc import (read_wet, warc_pages,
                                                write_wet_pages)
    path, docs = archive_dir
    pages = warc_pages(spark, str(path) + "/*.warc*")
    extracted = extracted_with_meta(
        pages, extract(pages, nodes=False)).select(
        "url", "warc_ts", F.col("text_extracted").alias("text"))
    out = tmp_path / "wet"
    manifest = write_wet_pages(extracted, str(out)).collect()
    assert sum(m.n_records for m in manifest) == len(docs)
    direct = {r.url: (r.warc_ts, r.text) for r in
              extracted.select("url", "warc_ts", "text").collect()}
    back = {r.url: (r.warc_ts, r.text) for r in
            read_wet(spark, str(out) + "/*.warc.gz").collect()}
    assert back == direct
    assert back["https://a.example/1"][1] == "Onealpha"


def test_write_warc_pages_roundtrip(spark, tmp_path, archive_dir):
    from packages_sgml_spark.spark.warc import (read_warc, warc_pages,
                                                write_warc_pages)
    path, docs = archive_dir
    pages = warc_pages(spark, str(path) + "/*.warc*")
    out = tmp_path / "out"
    manifest = write_warc_pages(pages, str(out)).collect()
    assert sum(m.n_records for m in manifest) == len(docs)
    back = warc_pages(spark, str(out) + "/*.warc.gz")
    got = {(r.url, r.warc_ts.strftime("%Y-%m-%dT%H:%M:%SZ"),
            bytes(r.html)) for r in back.collect()}
    assert got == set(docs)


def test_stream_warc_incremental(spark, tmp_path):
    """Landing-directory ingest: availableNow catch-up processes the
    files present, the checkpoint journals them, and a restart after a
    new archive lands parses ONLY the new file (file-level
    exactly-once — the north-rule resume contract at the ingest
    stage)."""
    from packages_sgml_spark.spark.warc import stream_warc
    land = tmp_path / "land"
    land.mkdir()
    out, chk = tmp_path / "out", tmp_path / "chk"

    def drop(name, url, body):
        with open(land / name, "wb") as f:
            write_warc(f, [build_response_record(
                url, "2026-01-01T00:00:00Z", body)])

    def run_once():
        q = (stream_warc(spark, str(land))
             .writeStream.format("parquet")
             .option("path", str(out))
             .option("checkpointLocation", str(chk))
             .trigger(availableNow=True)
             .start())
        assert q.awaitTermination(180)

    drop("c-0.warc.gz", "https://s.example/1", b"<html><p>one</html>")
    run_once()
    got = spark.read.parquet(str(out))
    assert [r.url for r in got.collect()] == ["https://s.example/1"]

    drop("c-1.warc.gz", "https://s.example/2", b"<html><p>two</html>")
    run_once()
    rows = spark.read.parquet(str(out)).collect()
    # old archive NOT re-parsed: exactly one row per record ever
    assert sorted(r.url for r in rows) == \
        ["https://s.example/1", "https://s.example/2"]
    files = {os.path.basename(r.warc_file) for r in rows}
    assert files == {"c-0.warc.gz", "c-1.warc.gz"}


def test_warc_todo_paths(spark, archive_dir):
    """File-level batch resume: archives minus the processed set."""
    from packages_sgml_spark.spark.warc import read_warc, \
        warc_todo_paths
    path, _docs = archive_dir
    glob = str(path) + "/*.warc*"
    empty = spark.createDataFrame([], "warc_file string")
    todo0 = warc_todo_paths(spark, glob, empty)
    assert sorted(os.path.basename(p) for p in todo0) == \
        ["crawl-00000.warc.gz", "crawl-00001.warc"]
    # mark the first archive done via its own read output
    done = read_warc(spark, todo0[0]).select("warc_file")
    todo1 = warc_todo_paths(spark, glob, done)
    assert [os.path.basename(p) for p in todo1] == \
        [os.path.basename(p) for p in todo0 if p != todo0[0]]
    # the returned paths load directly
    assert read_warc(spark, todo1[0] if len(todo1) == 1 else todo1
                     ).count() > 0


def test_warc_reader_mutation_fuzz():
    """A task at crawl scale WILL meet corrupt archives; the reader
    contract is rows + error strings, never an exception.  Seeded
    byte-level mutations (flips, truncations, duplications, junk
    splices) over a valid multi-record archive, gzip and plain."""
    import random
    rng = random.Random(0xC0FFEE)
    recs = [build_response_record(
        "https://f.example/%d" % i, "2026-01-01T00:00:%02dZ" % i,
        ("<html><p>doc %d</p></html>" % i).encode())
        for i in range(5)]
    gz = io.BytesIO()
    write_warc(gz, recs)
    plain = b"".join(recs)
    corpora = [gz.getvalue(), plain]
    for trial in range(300):
        base = bytearray(corpora[trial % 2])
        op = trial % 4
        if op == 0:      # flip 1-8 bytes
            for _ in range(rng.randint(1, 8)):
                base[rng.randrange(len(base))] = rng.randrange(256)
        elif op == 1:    # truncate
            del base[rng.randrange(1, len(base)):]
        elif op == 2:    # splice junk
            pos = rng.randrange(len(base))
            junk = bytes(rng.randrange(256)
                         for _ in range(rng.randint(1, 64)))
            base[pos:pos] = junk
        else:            # duplicate a slice (resync stress)
            a = rng.randrange(len(base))
            b = min(len(base), a + rng.randint(1, 200))
            base[a:a] = base[a:b]
        errors = []
        out = list(iter_warc_records(bytes(base), errors))
        for r in out:
            assert isinstance(r.body, bytes)
        # mutated archives either parse some records or explain why
        assert out or errors, "silent empty parse on trial %d" % trial


def test_non_iso_warc_date_fallback():
    """Non-conforming writers emit RFC-1123 dates; the vectorized
    ISO fast path must fall back, not null them out."""
    raw = (b"WARC/1.0\r\n"
           b"WARC-Type: resource\r\n"
           b"WARC-Target-URI: https://d.example/x\r\n"
           b"WARC-Date: Mon, 01 Jan 2026 00:00:00 GMT\r\n"
           b"Content-Length: 2\r\n\r\nhi\r\n\r\n")
    from packages_sgml_spark.spark.warc import _records_frame
    f = _records_frame("f", raw, ("resource",), False)
    assert str(f["warc_ts"].iloc[0]) == "2026-01-01 00:00:00"


# ------------------------------------------------------------------
# r8: oversized-archive range split
# ------------------------------------------------------------------

def test_range_reader_tiles_file_exactly(tmp_path):
    """iter_warc_records_file_range over adjacent ranges yields
    exactly the whole-file record sequence, for every split point —
    including payloads that embed fake gzip magic bytes."""
    import io
    from packages_sgml_spark.core.warc import (
        build_response_record, iter_warc_records,
        iter_warc_records_file_range, write_warc, GZIP_MAGIC)
    recs = []
    for i in range(60):
        body = (b"<html>page %d " % i +
                GZIP_MAGIC + b"\x08 fake magic inside " * 3 +
                b"WARC/1.0 fake header too</html>")
        recs.append(build_response_record(
            "https://h%d.example/p/%d" % (i % 7, i),
            "2026-01-01T00:00:00Z", body))
    buf = io.BytesIO()
    write_warc(buf, recs)
    data = buf.getvalue()
    whole = [(r.url, r.offset, r.body) for r in
             iter_warc_records(data)]
    assert len(whole) == 60
    for n_ranges in (2, 3, 7):
        step = len(data) // n_ranges + 1
        got = []
        for s in range(0, len(data), step):
            got += [(r.url, r.offset, r.body) for r in
                    iter_warc_records_file_range(
                        io.BytesIO(data), s, min(s + step, len(data)))]
        assert got == whole, n_ranges


def test_read_warc_split_matches_single_task(spark, tmp_path):
    """A .warc.gz above split_bytes reads as N range tasks with rows
    identical to the single-task binaryFile read."""
    from packages_sgml_spark.core.warc import (build_response_record,
                                               write_warc)
    from packages_sgml_spark.spark.warc import read_warc
    recs = [build_response_record(
        "https://s%d.example/p/%d" % (i % 11, i),
        "2026-01-02T03:04:05Z",
        ("<html><body>doc %d " % i + "word " * 200 +
         "</body></html>").encode())
        for i in range(400)]
    big = tmp_path / "big.warc.gz"
    with open(big, "wb") as f:
        write_warc(f, recs)
    small = tmp_path / "small.warc.gz"
    with open(small, "wb") as f:
        write_warc(f, recs[:5])
    size = big.stat().st_size
    assert size > 120_000

    def rows(df):
        return sorted((r.url, r.warc_offset, bytes(r.html or b""),
                       r.record_type) for r in df.collect())

    single = rows(read_warc(spark, str(tmp_path) + "/*.warc.gz"))
    split = read_warc(spark, str(tmp_path) + "/*.warc.gz",
                      split_bytes=100_000, range_bytes=30_000)
    # the big file must ACTUALLY have split into range tasks — a
    # silent fall-back to the single-task path would keep rows equal
    # while the whole range code path goes unexercised (review r8:
    # the original assert here was vacuous)
    n_tasks = split.rdd.getNumPartitions()
    assert n_tasks >= size // 30_000, (n_tasks, size)
    assert rows(split) == single


def test_range_task_bounded_when_member_exceeds_range():
    """An interior range that falls inside one oversized member must
    yield nothing AND stop scanning at its range end instead of
    buffering the rest of the file (review r8)."""
    import io
    from packages_sgml_spark.core import warc as W
    recs = [W.build_response_record(
        "https://x/0", "2026-01-01T00:00:00Z",
        b"<html>" + b"A" * 3_000_000 + b"</html>")]
    recs += [W.build_response_record(
        "https://x/%d" % i, "2026-01-01T00:00:00Z",
        b"<html>x</html>") for i in (1, 2)]
    buf = io.BytesIO()
    W.write_warc(buf, recs)
    data = buf.getvalue()

    seen = {"max": 0}
    orig = W._FileWindow

    class SpyWin(orig):
        def ensure(self, upto, chunk=1 << 20):
            super().ensure(upto, chunk)
            seen["max"] = max(seen["max"], len(self.buf))

    W._FileWindow = SpyWin
    try:
        got = list(W.iter_warc_records_file_range(
            io.BytesIO(data), 100, 200))
    finally:
        W._FileWindow = orig
    assert got == []
    assert seen["max"] < 100_000, seen
    # and adjacent ranges still tile the file exactly
    whole = [r.url for r in W.iter_warc_records(data)]
    parts = []
    for s in range(0, len(data), 1000):
        parts += [r.url for r in W.iter_warc_records_file_range(
            io.BytesIO(data), s, min(s + 1000, len(data)))]
    assert parts == whole
