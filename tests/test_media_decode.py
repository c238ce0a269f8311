"""Real (pure-stdlib) media decode: PNG decoder round-trips against
known pixels under every scanline filter type; WAV decoder against
stdlib-written fixtures; Spark-level fake=False paths isolate decode
errors per row.
"""

import io
import struct
import wave
import zlib

import numpy as np
import pytest

from packages_sgml_spark.core.media import (
    MediaDecodeError, PNG_MAGIC, audio_band_energies, decode_png,
    decode_wav, encode_png, image_grid_features)


def _png_with_filter(px, ftype):
    """Build a PNG whose every scanline uses filter `ftype`, applying
    the FORWARD filter here so the decoder must invert it."""
    h, w, ch = px.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    stride = w * ch
    flat = px.reshape(h, stride).astype(np.int16)
    out = bytearray()
    prev = np.zeros(stride, dtype=np.int16)
    for y in range(h):
        row = flat[y]
        if ftype == 0:
            filt = row
        elif ftype == 1:      # Sub
            left = np.concatenate([np.zeros(ch, np.int16),
                                   row[:-ch]])
            filt = row - left
        elif ftype == 2:      # Up
            filt = row - prev
        elif ftype == 3:      # Average
            left = np.concatenate([np.zeros(ch, np.int16),
                                   row[:-ch]])
            filt = row - ((left + prev) >> 1)
        else:                 # Paeth
            left = np.concatenate([np.zeros(ch, np.int16),
                                   row[:-ch]])
            ul = np.concatenate([np.zeros(ch, np.int16),
                                 prev[:-ch]])
            p = left + prev - ul
            pa, pb, pc = (np.abs(p - left), np.abs(p - prev),
                          np.abs(p - ul))
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, prev, ul))
            filt = row - pred
        out += bytes([ftype]) + bytes((filt & 0xFF).astype(np.uint8))
        prev = row

    def chunk(ctype, data):
        c = struct.pack(">I", len(data)) + ctype + data
        return c + struct.pack(">I",
                               zlib.crc32(ctype + data) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (PNG_MAGIC + chunk(b"IHDR", ihdr) +
            chunk(b"IDAT", zlib.compress(bytes(out), 6)) +
            chunk(b"IEND", b""))


def _pixels(h=9, w=7, ch=3, seed=3):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, ch), dtype=np.uint8)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("ch", [1, 2, 3, 4])
def test_png_roundtrip_all_filters(ftype, ch):
    px = _pixels(ch=ch, seed=ftype * 10 + ch)
    data = _png_with_filter(px, ftype)
    w, h, ch2, got = decode_png(data)
    assert (w, h, ch2) == (7, 9, ch)
    assert np.array_equal(got, px), (ftype, ch)


def test_png_encoder_decoder_roundtrip():
    px = _pixels(h=16, w=16, ch=3, seed=7)
    w, h, ch, got = decode_png(encode_png(px))
    assert (w, h, ch) == (16, 16, 3)
    assert np.array_equal(got, px)


def test_png_palette():
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]],
                   dtype=np.uint8)
    idx = np.array([[0, 1], [2, 0]], dtype=np.uint8)[:, :, None]
    # build palette PNG by hand
    h, w = 2, 2
    raw = b"".join(b"\x00" + idx[y, :, 0].tobytes() for y in range(h))

    def chunk(ctype, data):
        c = struct.pack(">I", len(data)) + ctype + data
        return c + struct.pack(">I",
                               zlib.crc32(ctype + data) & 0xFFFFFFFF)

    data = (PNG_MAGIC +
            chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)) +
            chunk(b"PLTE", pal.tobytes()) +
            chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    w2, h2, ch, px = decode_png(data)
    assert (w2, h2, ch) == (2, 2, 3)
    assert np.array_equal(px[0, 0], [255, 0, 0])
    assert np.array_equal(px[0, 1], [0, 255, 0])
    assert np.array_equal(px[1, 0], [0, 0, 255])


def test_png_rejects_garbage():
    with pytest.raises(MediaDecodeError):
        decode_png(b"not a png at all")
    with pytest.raises(MediaDecodeError):
        decode_png(PNG_MAGIC + b"\x00\x00\x00\x00XXXX")


def test_png_truncated_chunk_raises_decode_error():
    """r4 advice fix: a chunk whose declared length runs past the
    payload (or a short IHDR) raises MediaDecodeError, never a raw
    struct.error, per the decode-error contract."""
    from packages_sgml_spark.core.media import (
        MediaDecodeError, decode_png, PNG_MAGIC)
    import struct as _s
    # IHDR declaring 13 bytes but only 4 present
    bad = PNG_MAGIC + _s.pack(">I", 13) + b"IHDR" + b"\x00" * 4
    with pytest.raises(MediaDecodeError):
        decode_png(bad)
    # IHDR present-but-short (length field says 4, unpack needs 13)
    bad2 = (PNG_MAGIC + _s.pack(">I", 4) + b"IHDR" + b"\x00" * 4
            + b"\x00" * 4)
    with pytest.raises(MediaDecodeError):
        decode_png(bad2)
    # PLTE not 3-aligned
    ihdr = _s.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    bad3 = (PNG_MAGIC + _s.pack(">I", 13) + b"IHDR" + ihdr + b"crc0"
            + _s.pack(">I", 4) + b"PLTE" + b"\x00" * 4 + b"crc0")
    with pytest.raises(MediaDecodeError):
        decode_png(bad3)


def test_grid_features_shape_and_range():
    px = _pixels(h=32, w=48, ch=3)
    f = image_grid_features(px)
    assert len(f) == 16
    assert all(0.0 <= x <= 1.0 for x in f)
    # uniform image -> uniform features
    flat = np.full((20, 20, 1), 128, dtype=np.uint8)
    ff = image_grid_features(flat)
    assert all(abs(x - 128 / 255.0) < 1e-6 for x in ff)


def _wav_bytes(rate=8000, n=800, nch=2, freq=440.0):
    t = np.arange(n) / rate
    sig = (np.sin(2 * np.pi * freq * t) * 32000).astype("<i2")
    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(nch)
    w.setsampwidth(2)
    w.setframerate(rate)
    frames = np.repeat(sig, nch).tobytes() if nch > 1 else sig.tobytes()
    w.writeframes(frames)
    w.close()
    return buf.getvalue()


def test_wav_decode():
    data = _wav_bytes()
    rate, nch, samples = decode_wav(data)
    assert rate == 8000 and nch == 2
    assert len(samples) == 800
    assert np.abs(samples).max() <= 1.0
    bands = audio_band_energies(samples)
    assert len(bands) == 13
    # a 440 Hz tone at 8 kHz puts its energy in the low bands
    assert np.argmax(bands) < 4


def test_wav_rejects_garbage():
    with pytest.raises(MediaDecodeError):
        decode_wav(b"RIFFgarbage")


def test_jpeg_roundtrip_gray():
    """r4: pure-stdlib baseline JPEG — encoder/decoder round-trip on
    grayscale (lossy: exact dims + approximate pixels)."""
    from packages_sgml_spark.core.media import (
        decode_jpeg, encode_jpeg_gray)
    rng = np.random.default_rng(7)
    px = (np.linspace(0, 255, 24 * 16).reshape(24, 16) +
          rng.integers(0, 30, (24, 16))).clip(0, 255).astype(np.uint8)
    w, h, ch, out = decode_jpeg(encode_jpeg_gray(px))
    assert (w, h, ch) == (16, 24, 1)
    assert np.abs(out[:, :, 0].astype(float) -
                  px.astype(float)).mean() < 10.0


def test_jpeg_roundtrip_color():
    """3-component interleaved MCUs + YCbCr->RGB conversion."""
    from packages_sgml_spark.core.media import (
        decode_jpeg, encode_jpeg_rgb)
    rgb = np.zeros((20, 30, 3), np.uint8)
    rgb[:, :, 0] = np.linspace(0, 255, 30)[None, :]
    rgb[:, :, 1] = np.linspace(255, 0, 20)[:, None]
    rgb[:, :, 2] = 90
    w, h, ch, out = decode_jpeg(encode_jpeg_rgb(rgb))
    assert (w, h, ch) == (30, 20, 3)
    assert np.abs(out.astype(float) - rgb.astype(float)).mean() < 6.0


def test_jpeg_flat_block_exact_dc():
    """A flat 8x8 block survives the DCT round-trip almost exactly
    (only DC, quant step 16 -> within one step)."""
    from packages_sgml_spark.core.media import (
        decode_jpeg, encode_jpeg_gray)
    px = np.full((8, 8), 200, np.uint8)
    _w, _h, _c, out = decode_jpeg(encode_jpeg_gray(px))
    assert np.abs(out[:, :, 0].astype(int) - 200).max() <= 8


def test_jpeg_rejects_unsupported():
    from packages_sgml_spark.core.media import (
        decode_jpeg, encode_jpeg_gray)
    with pytest.raises(MediaDecodeError):
        decode_jpeg(b"\xff\xd8\xff\xd9")            # no scan
    with pytest.raises(MediaDecodeError):
        decode_jpeg(b"not a jpeg at all")
    good = encode_jpeg_gray(np.full((8, 8), 100, np.uint8))
    # flip SOF0 -> SOF2 (progressive): must refuse, not mis-decode
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(MediaDecodeError):
        decode_jpeg(prog)
    # truncated entropy segment
    with pytest.raises(MediaDecodeError):
        decode_jpeg(good[:len(good) - (len(good) - good.find(b"\xff\xda")) // 2][:-2])


def test_spark_real_decode_paths(spark):
    """fake=False end to end: real PNG and JPEG rows decode, garbage
    rows isolate to decode_error, WAV rows produce real durations."""
    from packages_sgml_spark.core.media import encode_jpeg_rgb
    from packages_sgml_spark.spark.multimodal import (
        audio_features, image_features)
    from packages_sgml_spark.spark.queries import ensure_workers
    ensure_workers(spark)
    png = encode_png(_pixels(h=10, w=12, ch=3))
    jpg = encode_jpeg_rgb(_pixels(h=16, w=24, ch=3))
    wavb = _wav_bytes(rate=16000, n=1600, nch=1)
    rows = [("m1", "image", bytearray(png), "image/png"),
            ("m2", "image", bytearray(b"JPEG-ish garbage"), "image/jpeg"),
            ("m3", "audio", bytearray(wavb), "audio/wav"),
            ("m4", "audio", bytearray(b"noise"), "audio/wav"),
            ("m5", "image", bytearray(jpg), "image/jpeg")]
    media = spark.createDataFrame(
        rows, "media_id string, kind string, payload binary, mime string")
    img = {r.media_id: r for r in
           image_features(media, fake=False).collect()}
    assert img["m1"].status == "ok"
    assert (img["m1"].width, img["m1"].height) == (12, 10)
    assert len(img["m1"].features) == 16
    assert img["m2"].status == "decode_error"
    assert img["m3"].status == "skipped"
    assert img["m5"].status == "ok"
    assert (img["m5"].width, img["m5"].height) == (24, 16)
    assert len(img["m5"].features) == 16
    aud = {r.media_id: r for r in
           audio_features(media, fake=False).collect()}
    assert aud["m3"].status == "ok"
    assert aud["m3"].n_samples == 1600
    assert aud["m3"].duration_ms == 100
    assert len(aud["m3"].mfcc) == 13
    assert aud["m4"].status == "decode_error"
    assert aud["m1"].status == "skipped"
