"""Planted-truth tests for the pure-stdlib mp4/ISO-BMFF sampling-
metadata walk (core.media.parse_mp4, r5): a hand-assembled minimal
moov with known stts/stss/stsz/stsc/stco tables must reproduce the
exact per-sample offsets, timestamps and keyframe flags, and the
Spark video_frame_sample(fake=False) path must surface them."""

import struct

import pytest

from packages_sgml_spark.core.media import (
    MediaDecodeError, is_mp4, mp4_frame_samples, parse_mp4)


def box(btype, payload):
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def full(btype, version, payload):
    return box(btype, bytes([version, 0, 0, 0]) + payload)


def build_mp4(n_samples=10, timescale=1000, delta=200, keyframes=(1, 5, 9),
              sizes=None, width=320, height=180, chunk_split=4):
    """Minimal valid mp4: ftyp + mdat + moov with one video track.
    Samples live in two chunks (first `chunk_split`, then the rest)
    so the stsc/stco join is exercised for real."""
    if sizes is None:
        sizes = [100 + 10 * i for i in range(n_samples)]
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomavc1")
    mdat_payload = b"".join(bytes([i]) * sizes[i]
                            for i in range(n_samples))
    mdat = box(b"mdat", mdat_payload)
    mdat_body = len(ftyp) + 8
    chunk1_off = mdat_body
    chunk2_off = mdat_body + sum(sizes[:chunk_split])

    mvhd = full(b"mvhd", 0, struct.pack(
        ">II II", 0, 0, timescale, n_samples * delta) + b"\x00" * 80)
    tkhd = full(b"tkhd", 0, struct.pack(">III", 0, 0, 1) + b"\x00" * 4 +
                struct.pack(">I", n_samples * delta) + b"\x00" * 8 +
                b"\x00" * 8 + b"\x00" * 36 +
                struct.pack(">II", width << 16, height << 16))
    mdhd = full(b"mdhd", 0, struct.pack(
        ">IIII", 0, 0, timescale, n_samples * delta) +
        struct.pack(">HH", 0x55C4, 0))
    hdlr = full(b"hdlr", 0, struct.pack(">I", 0) + b"vide" +
                b"\x00" * 12 + b"v\x00")
    # VisualSampleEntry: 6 reserved + 2 dataref + 16 predefined +
    # width/height + the rest zero-padded to >= 70 bytes
    entry = (b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 16 +
             struct.pack(">HH", width, height) + b"\x00" * 50)
    stsd = full(b"stsd", 0, struct.pack(">I", 1) + box(b"avc1", entry))
    stts = full(b"stts", 0, struct.pack(">III", 1, n_samples, delta))
    stss = full(b"stss", 0, struct.pack(
        ">I%dI" % len(keyframes), len(keyframes), *keyframes))
    stsz = full(b"stsz", 0, struct.pack(
        ">II%dI" % n_samples, 0, n_samples, *sizes))
    stsc = full(b"stsc", 0, struct.pack(
        ">I III III", 2, 1, chunk_split, 1,
        2, n_samples - chunk_split, 1))
    stco = full(b"stco", 0, struct.pack(">III", 2, chunk1_off,
                                        chunk2_off))
    stbl = box(b"stbl", stsd + stts + stss + stsz + stsc + stco)
    minf = box(b"minf", stbl)
    mdia = box(b"mdia", mdhd + hdlr + minf)
    trak = box(b"trak", tkhd + mdia)
    moov = box(b"moov", mvhd + trak)
    return ftyp + mdat + moov, chunk1_off, chunk2_off, sizes


def test_parse_mp4_sample_table():
    pl, c1, c2, sizes = build_mp4()
    assert is_mp4(pl)
    info = parse_mp4(pl)
    assert (info["width"], info["height"]) == (320, 180)
    assert info["n_samples"] == 10
    assert info["timescale"] == 1000
    assert info["duration_ms"] == 2000
    s = info["samples"]
    assert len(s) == 10
    # timestamps: 200 ms cadence
    assert [x[1] for x in s] == [i * 200 for i in range(10)]
    # offsets: cumulative within each chunk, reset at chunk 2
    assert s[0][2] == c1
    assert s[1][2] == c1 + sizes[0]
    assert s[4][2] == c2
    assert s[5][2] == c2 + sizes[4]
    # sizes + keyframes (stss is 1-based)
    assert [x[3] for x in s] == sizes
    assert [x[4] for x in s] == [i + 1 in (1, 5, 9) for i in range(10)]


def test_mp4_keyframe_seek_plan():
    pl, _c1, _c2, _sizes = build_mp4()
    _info, picked = mp4_frame_samples(pl, every_ms=700, max_frames=8)
    # targets 0,700,1400,2100,... -> keyframes at-or-before:
    # ts 0 (s1), 700->s5 (ts 800? no: keyframes ts 0,800,1600; at-or-
    # before 700 is 0 -> dedup), 1400->800, 2100->1600
    assert [(p[0], p[1]) for p in picked] == [(0, 0), (4, 800),
                                              (8, 1600)]
    assert all(p[4] for p in picked)


def test_mp4_no_stss_means_all_sync():
    pl, *_ = build_mp4()
    # rebuild without stss: strip it by re-assembling
    pl2, *_ = build_mp4(keyframes=tuple(range(1, 11)))
    info = parse_mp4(pl2)
    assert all(x[4] for x in info["samples"])


def test_mp4_malformed_typed_errors():
    pl, *_ = build_mp4()
    with pytest.raises(MediaDecodeError):
        parse_mp4(b"\x00\x00\x00\x08free")          # no ftyp
    with pytest.raises(MediaDecodeError):
        parse_mp4(pl[:40])                           # no moov
    # truncated mid-moov: box overruns enclosure
    with pytest.raises(MediaDecodeError):
        parse_mp4(pl[:len(pl) - 30])


def test_mp4_poison_table_counts_are_decode_errors():
    """Corrupt sample-table counts must fail as MediaDecodeError, not
    struct.error (one poison mp4 must never kill a Spark task) and
    must not allocate unbounded lists (huge uniform stsz)."""
    pl, *_ = build_mp4()
    for table in (b"stsz", b"stts", b"stss", b"stco", b"stsc"):
        idx = pl.index(table)
        # the count field: stsz has it at +8 (after uniform), the
        # rest at +4 (after version/flags)
        off = idx + 4 + (8 if table == b"stsz" else 4)
        poisoned = pl[:off] + struct.pack(">I", 0x7FFFFFFF) + \
            pl[off + 4:]
        with pytest.raises(MediaDecodeError):
            parse_mp4(poisoned)
    # huge count with uniform sizes: no per-entry array to overrun,
    # so the guard is the file-size bound (no [x]*2**31 allocation)
    idx = pl.index(b"stsz")
    poisoned = (pl[:idx + 8] + struct.pack(">II", 64, 0x7FFFFFFF) +
                pl[idx + 16:])
    with pytest.raises(MediaDecodeError):
        parse_mp4(poisoned)


def test_mp4_tkhd_dimensions_without_stsd_refinement():
    """tkhd's 16.16 width/height live at body offset 76 (v0); prove
    they are read by shrinking the stsd sample entry below the
    70-byte VisualSampleEntry threshold so no refinement happens."""
    def small_entry_mp4():
        n_samples, timescale, delta = 10, 1000, 200
        sizes = [100 + 10 * i for i in range(n_samples)]
        ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) +
                   b"isomavc1")
        mdat = box(b"mdat", b"".join(bytes([i]) * sizes[i]
                                     for i in range(n_samples)))
        c1 = len(ftyp) + 8
        c2 = c1 + sum(sizes[:4])
        mvhd = full(b"mvhd", 0, struct.pack(
            ">II II", 0, 0, timescale, n_samples * delta) + b"\x00" * 80)
        tkhd = full(b"tkhd", 0, struct.pack(">III", 0, 0, 1) +
                    b"\x00" * 4 + struct.pack(">I", n_samples * delta) +
                    b"\x00" * 8 + b"\x00" * 8 + b"\x00" * 36 +
                    struct.pack(">II", 640 << 16, 360 << 16))
        mdhd = full(b"mdhd", 0, struct.pack(
            ">IIII", 0, 0, timescale, n_samples * delta) +
            struct.pack(">HH", 0x55C4, 0))
        hdlr = full(b"hdlr", 0, struct.pack(">I", 0) + b"vide" +
                    b"\x00" * 12 + b"v\x00")
        stsd = full(b"stsd", 0, struct.pack(">I", 1) +
                    box(b"avc1", b"\x00" * 8))     # sub-70-byte entry
        stts = full(b"stts", 0, struct.pack(">III", 1, n_samples,
                                            delta))
        stsz = full(b"stsz", 0, struct.pack(
            ">II%dI" % n_samples, 0, n_samples, *sizes))
        stsc = full(b"stsc", 0, struct.pack(
            ">I III III", 2, 1, 4, 1, 2, n_samples - 4, 1))
        stco = full(b"stco", 0, struct.pack(">III", 2, c1, c2))
        stbl = box(b"stbl", stsd + stts + stsz + stsc + stco)
        minf = box(b"minf", stbl)
        mdia = box(b"mdia", mdhd + hdlr + minf)
        trak = box(b"trak", tkhd + mdia)
        return ftyp + mdat + box(b"moov", mvhd + trak)

    info = parse_mp4(small_entry_mp4())
    assert (info["width"], info["height"]) == (640, 360)


def test_video_frame_sample_real_path(spark):
    pl, *_ = build_mp4()
    media = spark.createDataFrame(
        [("m1", "video", bytearray(pl)),
         ("m2", "video", bytearray(b"not a video")),
         ("m3", "video", None)],
        "media_id string, kind string, payload binary")
    from packages_sgml_spark.spark.multimodal import video_frame_sample
    out = {r.media_id: r for r in
           video_frame_sample(media, every_ms=700, max_frames=8,
                              fake=False).collect()}
    rows = video_frame_sample(media, every_ms=700, max_frames=8,
                              fake=False).collect()
    m1 = sorted([r for r in rows if r.media_id == "m1"],
                key=lambda r: r.frame_idx)
    assert [(r.frame_idx, r.ts_ms, r.status) for r in m1] == \
        [(0, 0, "ok"), (1, 800, "ok"), (2, 1600, "ok")]
    assert all(r.frame.startswith("mp4:") for r in m1)
    assert out["m2"].status == "decoder_unavailable"
    assert out["m3"].status == "empty"
