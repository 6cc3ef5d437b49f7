"""Multimodal binary-column operators: schema/batch plumbing is real;
decoders are deterministic fakes (real codecs stubbed, not installed)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from social_and_media_data_ingestion_spark.operators import multimodal as MM


@pytest.fixture
def media(spark):
    rows = [(i, bytes(range(256)) * (i + 1)) for i in range(4)]
    df = spark.createDataFrame(rows, ["media_id", "payload"])
    return MM.attach_meta(df, "payload", kind="image", mime="image/png")


def test_attach_meta(media):
    r = {x.media_id: x.meta for x in media.collect()}
    assert r[0].kind == "image" and r[0].n_bytes == 256
    assert r[3].n_bytes == 1024


def test_decode_images_fake(media):
    got = {r.media_id: r for r in MM.decode_images(media).collect()}
    # 256 bytes -> w=256%256+1=1, h=256//256%256+1=2
    assert (got[0].width, got[0].height, got[0].channels) == (1, 2, 3)
    assert got[3].width == 1024 % 256 + 1


def test_decode_images_real_stub_raises(media):
    with pytest.raises(Exception, match="Pillow"):
        MM.decode_images(media, fake=False).collect()


def test_resize_budget(media):
    out = MM.resize_images(media, 4, 4).collect()
    assert all(len(bytes(r.payload)) == 4 * 4 * 3 for r in out)


def test_extract_features(media):
    got = {r.media_id: r.feature for r in MM.extract_features(media, dim=4).collect()}
    assert got[0] == pytest.approx([0 / 255, 1 / 255, 2 / 255, 3 / 255])
    assert all(len(v) == 4 for v in got.values())


def test_sample_frames(spark):
    df = spark.createDataFrame(
        [(1, 2500), (2, 999), (3, 0)], ["media_id", "duration_ms"]
    )
    rows = MM.sample_frames(df, every_ms=1000).collect()
    got = {(r.media_id, r.frame_index): r.frame_offset_ms for r in rows}
    assert got == {(1, 0): 0, (1, 1): 1000, (1, 2): 2000, (2, 0): 0}
    # video 3 has zero duration -> no frames
    assert not any(r.media_id == 3 for r in rows)


def test_chunk_audio_window_math(spark):
    df = spark.createDataFrame(
        [(1, bytearray(bytes([10] * 6))), (2, bytearray(b"")), (3, bytearray(bytes([3, 4])))],
        ["media_id", "payload"],
    )
    # 1000 Hz, 4 ms window -> 4 samples per chunk
    rows = MM.chunk_audio(df, sample_rate=1000, window_ms=4).collect()
    got = {(r.media_id, r.chunk_index): (r.start_ms, r.n_samples, r.rms) for r in rows}
    assert got[(1, 0)] == (0, 4, 10.0)     # full window of constant 10s
    assert got[(1, 1)] == (4, 2, 10.0)     # 2-sample tail
    assert (3, 0) in got and got[(3, 0)][1] == 2
    assert got[(3, 0)][2] == pytest.approx(((9 + 16) / 2) ** 0.5)
    # empty payload -> no chunks
    assert not any(r.media_id == 2 for r in rows)


def test_chunk_audio_real_wav_decode(spark):
    """fake=False is a REAL decode now (round-9): stdlib `wave` parses
    RIFF/WAVE PCM. A generated 16-bit mono 1 kHz WAV with known sample
    values must chunk on the FILE's frame rate (not the fake-path arg)
    with exact RMS; a stereo file mixes down by per-frame mean; a
    non-WAV payload still raises."""
    import io
    import wave

    def make_wav(samples, rate=1000, nch=1):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(nch)
            w.setsampwidth(2)
            w.setframerate(rate)
            import struct

            w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
        return bytearray(buf.getvalue())

    mono = make_wav([10] * 4 + [20] * 2)  # 6 samples @1kHz
    stereo = make_wav([100, 200] * 3, nch=2)  # 3 frames, mean 150
    df = spark.createDataFrame(
        [(1, mono), (2, stereo)], ["media_id", "payload"]
    )
    rows = MM.chunk_audio(df, window_ms=4, fake=False).collect()
    got = {
        (r.media_id, r.chunk_index): (r.start_ms, r.n_samples, r.rms)
        for r in rows
    }
    # 1 kHz file rate, 4 ms window -> 4 samples/chunk
    assert got[(1, 0)] == (0, 4, 10.0)
    assert got[(1, 1)][1] == 2
    assert got[(1, 1)][2] == pytest.approx(20.0)
    assert got[(2, 0)] == (0, 3, pytest.approx(150.0))

    bad = spark.createDataFrame(
        [(9, bytearray(b"not a wav"))], ["media_id", "payload"]
    )
    with pytest.raises(Exception, match="(?i)wave|riff|file does not"):
        MM.chunk_audio(bad, fake=False).collect()


def test_decode_wav_pcm_8bit_unsigned_centering():
    """8-bit WAV PCM is UNSIGNED (silence = 128): the decoder must
    center it so RMS math matches the signed 16-bit path."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(8000)
        w.writeframes(bytes([128, 138, 118]))
    rate, samples = MM.decode_wav_pcm(buf.getvalue())
    assert rate == 8000
    assert samples == [0, 10, -10]


def test_decode_wav_pcm_24_and_32_bit():
    """r13: 24-bit (3-byte signed LE, the studio-common width) and
    32-bit integer PCM decode for real — exact signed values incl.
    the type extremes, stereo mixdown intact. Unreachable widths
    still raise (wave itself rejects float WAV before the width
    branch)."""
    import io
    import struct
    import wave

    def wav(sw, frames, nch=1):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(nch)
            w.setsampwidth(sw)
            w.setframerate(44100)
            w.writeframes(frames)
        return buf.getvalue()

    vals24 = [0, 1, -1, 8388607, -8388608, -40000]
    raw24 = b"".join(
        v.to_bytes(3, "little", signed=True) for v in vals24
    )
    rate, samples = MM.decode_wav_pcm(wav(3, raw24))
    assert rate == 44100 and samples == vals24

    vals32 = [0, 2147483647, -2147483648, 123456789, -987654321, 7]
    raw32 = struct.pack("<6i", *vals32)
    rate, samples = MM.decode_wav_pcm(wav(4, raw32))
    assert rate == 44100 and samples == vals32

    # stereo 24-bit mixdown: per-frame mean
    st = [100, 300, -500, 700]
    raw = b"".join(v.to_bytes(3, "little", signed=True) for v in st)
    _, mixed = MM.decode_wav_pcm(wav(3, raw, nch=2))
    assert mixed == [200, 100]


def test_sniff_format_magic_bytes(spark):
    """Magic-byte detection: every signature resolves, RIFF without a
    WAVE form-type stays unknown (it could be AVI), payloads shorter
    than the probe windows never error, and detection is pure native
    expressions (no Python eval node in the plan)."""
    cases = [
        (0, bytes([0xFF, 0xD8, 0xFF]) + b"rest", "image/jpeg"),
        (1, bytes([0x89]) + b"PNG\r\n", "image/png"),
        (2, b"GIF87a...", "image/gif"),
        (3, b"GIF89a...", "image/gif"),
        (4, b"RIFF" + bytes(4) + b"WAVEfmt ", "audio/x-wav"),
        (5, b"RIFF" + bytes(4) + b"AVI LIST", "application/octet-stream"),
        (6, b"plain text", "application/octet-stream"),
        (7, b"", "application/octet-stream"),
        (8, bytes([0xFF]), "application/octet-stream"),  # truncated JPEG
        (9, b"RIFF", "application/octet-stream"),  # truncated RIFF
    ]
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p, _ in cases], ["media_id", "payload"]
    )
    out = MM.sniff_format(df)
    got = {r.media_id: r.detected_mime for r in out.collect()}
    assert got == {i: mime for i, _, mime in cases}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # JVM-native, no UDF boundary


def test_decode_wav_pcm_roundtrip_property():
    """Property (hypothesis): any 16-bit sample array written through
    stdlib wave decodes back EXACTLY — the decoder is lossless on the
    format it claims, at any rate and either channel count (stereo
    mixes down by per-frame mean, checked against the same arithmetic)."""
    import io
    import struct
    import wave

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=50, deadline=None)
    @given(
        samples=st.lists(
            st.integers(min_value=-32768, max_value=32767),
            min_size=1,
            max_size=64,
        ),
        rate=st.sampled_from([1000, 8000, 16000, 44100]),
        nch=st.sampled_from([1, 2]),
    )
    def check(samples, rate, nch):
        if nch == 2 and len(samples) % 2:
            samples = samples + [0]  # wave needs whole frames
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(nch)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
        got_rate, got = MM.decode_wav_pcm(buf.getvalue())
        assert got_rate == rate
        if nch == 1:
            assert got == samples
        else:
            want = [
                (samples[i] + samples[i + 1]) / 2
                for i in range(0, len(samples), 2)
            ]
            assert got == want

    check()


def test_sniff_routes_wav_to_real_decode(spark):
    """Integration of the two REAL media paths: sniff_format detects
    RIFF/WAVE from magic bytes (native exprs, no decode), and the rows
    it routes as audio/x-wav decode for real through
    chunk_audio(fake=False) — while the non-WAV rows it rejects would
    have crashed the decoder. This is the production shape: sniff
    cheaply everywhere, decode only what sniffing admits."""
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(1000)
        w.writeframes(struct.pack("<4h", 7, 7, 7, 7))
    wav = bytearray(buf.getvalue())
    df = spark.createDataFrame(
        [(1, wav), (2, bytearray(b"\xff\xd8\xff notjpegreally"))],
        ["media_id", "payload"],
    )
    sniffed = MM.sniff_format(df)
    kinds = {r.media_id: r.detected_mime for r in sniffed.collect()}
    assert kinds == {1: "audio/x-wav", 2: "image/jpeg"}
    wav_rows = sniffed.filter(F.col("detected_mime") == "audio/x-wav")
    chunks = MM.chunk_audio(wav_rows, window_ms=4, fake=False).collect()
    assert [(c.media_id, c.n_samples, c.rms) for c in chunks] == [(1, 4, 7.0)]


def test_hostile_wav_header_rates_fail_loud(spark):
    """stdlib wave happily parses a header declaring frame rate 0 (and
    any absurdly low rate) — both previously surfaced as a bare
    ZeroDivisionError inside the Arrow UDF. They must raise wave.Error
    with a message naming the hostile header, the SAME error class as
    any other undecodable container, so sniff-and-route callers treat
    them uniformly."""
    import io
    import struct
    import wave

    import social_and_media_data_ingestion_spark.operators.multimodal as MM

    def make_wav(samples, rate):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
        return bytearray(buf.getvalue())

    # rate 0: the writer refuses it, so patch the canonical header's
    # 4-byte sample-rate field (offset 24) in a valid file
    zero_rate = make_wav([1, 2, 3, 4], rate=1000)
    assert struct.unpack_from("<I", zero_rate, 24)[0] == 1000
    struct.pack_into("<I", zero_rate, 24, 0)
    with pytest.raises(wave.Error, match="not positive"):
        MM.decode_wav_pcm(bytes(zero_rate))

    # rate 3 with a 250 ms window: 3*250//1000 == 0 samples/window —
    # a "valid" header the decode accepts but the chunker must refuse
    low_rate = make_wav([1, 2, 3, 4], rate=3)
    df = spark.createDataFrame([(1, low_rate)], ["media_id", "payload"])
    with pytest.raises(Exception, match="too low"):
        MM.chunk_audio(df, window_ms=250, fake=False).collect()


def _png_bytes(w, h):
    import struct

    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">II", w, h)
        + b"\x08\x06\x00\x00\x00"
    )


def _png_full(w, h, samples, ctype=2, filters=None, split_idat=False,
              depth=8, palette=None, interlace=False):
    """A complete, spec-valid PNG (real zlib IDAT, real CRCs) built
    with stdlib only: `samples` is the flat top-down raster (palette
    INDICES for ctype 3, raw gray values for low-depth ctype 0,
    16-bit values for depth 16), `filters` the per-row filter type
    (default all 0) — rows are ENCODED with that filter so decode_png
    must invert it. depth<8 packs samples MSB-first; depth 16 writes
    big-endian pairs; `palette` emits a PLTE chunk of (r,g,b) tuples;
    interlace=True splits the raster into the seven Adam7 passes,
    each independently filtered (r13: the surface decode_png now
    covers in full)."""
    import struct
    import zlib

    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    spp = w * nch
    bpp = max(1, (depth * nch) // 8)
    sub_images = []  # (wp, hp, per-pass pixel-sample rows)
    if not interlace:
        sub_images.append(
            (w, h, [samples[r * spp : (r + 1) * spp] for r in range(h)])
        )
    else:
        for x0, y0, dx, dy in ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8),
                               (2, 0, 4, 4), (0, 2, 2, 4), (1, 0, 2, 2),
                               (0, 1, 1, 2)):
            wp = (w - x0 + dx - 1) // dx
            hp = (h - y0 + dy - 1) // dy
            if wp <= 0 or hp <= 0:
                continue
            rows = []
            for r in range(hp):
                y = y0 + r * dy
                row = []
                for i in range(wp):
                    px = (y * w + x0 + i * dx) * nch
                    row.extend(samples[px : px + nch])
                rows.append(row)
            sub_images.append((wp, hp, rows))
    raw = bytearray()
    fi = 0
    filters = filters or [0] * sum(hp for _, hp, _ in sub_images)
    for wp, hp, rows in sub_images:
        stride = (wp * depth * nch + 7) // 8
        packed_rows = []
        for row in rows:
            if depth == 8:
                packed_rows.append(bytes(row))
            elif depth == 16:
                rb = bytearray()
                for v in row:
                    rb += struct.pack(">H", v)
                packed_rows.append(bytes(rb))
            else:
                per_byte = 8 // depth
                rb = bytearray(stride)
                for i, v in enumerate(row):
                    byte_i, slot = divmod(i, per_byte)
                    rb[byte_i] |= (v & ((1 << depth) - 1)) << (
                        (per_byte - 1 - slot) * depth
                    )
                packed_rows.append(bytes(rb))
        prev = bytes(stride)
        for row in packed_rows:
            ft = filters[fi]
            fi += 1
            enc = bytearray(row)
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                if ft == 1:
                    enc[i] = (row[i] - a) & 0xFF
                elif ft == 2:
                    enc[i] = (row[i] - b) & 0xFF
                elif ft == 3:
                    enc[i] = (row[i] - (a + b) // 2) & 0xFF
                elif ft == 4:
                    pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                    pred = (
                        a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                    )
                    enc[i] = (row[i] - pred) & 0xFF
            raw += bytes([ft]) + bytes(enc)
            prev = row

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload))
        )

    ihdr = struct.pack(
        ">IIBBBBB", w, h, depth, ctype, 0, 0, 1 if interlace else 0
    )
    plte = b""
    if palette is not None:
        plte = chunk(b"PLTE", b"".join(bytes(rgb) for rgb in palette))
    z = zlib.compress(bytes(raw))
    if split_idat:
        mid = len(z) // 2
        idat = chunk(b"IDAT", z[:mid]) + chunk(b"IDAT", z[mid:])
    else:
        idat = chunk(b"IDAT", z)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + plte
        + idat
        + chunk(b"IEND", b"")
    )


def _jpeg_bytes(w, h, pad=0, sof=b"\xc0"):
    import struct

    app0 = b"\xff\xe0" + struct.pack(">H", 7 + pad) + b"JFIF\x00" + b"\x00" * pad
    dqt = b"\xff\xdb" + struct.pack(">H", 5) + b"\x01\x02\x03"
    sofseg = b"\xff" + sof + struct.pack(">H", 17) + b"\x08" + struct.pack(">HH", h, w) + b"\x03"
    return b"\xff\xd8" + app0 + dqt + sofseg + b"\xff\xd9"


def _bmp_bytes(w, h, pixels=None):
    """Uncompressed 24-bit BMP; pixels = top-down rows of (r,g,b),
    defaults to zeros. Negative h writes top-down row order."""
    import struct

    stride = (w * 3 + 3) // 4 * 4
    ah = abs(h)
    raster = bytearray(stride * ah)
    if pixels:
        for ri in range(ah):
            # storage row ri holds logical (top-down) row ri when
            # top-down (h < 0), else the mirrored row (bottom-up)
            row = pixels[ri] if h < 0 else pixels[ah - 1 - ri]
            for ci, (r, g, b) in enumerate(row):
                raster[ri * stride + 3 * ci : ri * stride + 3 * ci + 3] = bytes(
                    (b, g, r)
                )
    header = b"BM" + struct.pack("<IHHI", 54 + len(raster), 0, 0, 54)
    info = struct.pack("<Iii HHIIiiII".replace(" ", ""), 40, w, h, 1, 24, 0, len(raster), 2835, 2835, 0, 0)
    return header + info + bytes(raster)


def test_decode_bmp_pixels_and_orientation():
    import social_and_media_data_ingestion_spark.operators.multimodal as MM

    px = [[(1, 2, 3), (4, 5, 6), (7, 8, 9)], [(10, 11, 12), (13, 14, 15), (16, 17, 18)]]
    flat = [v for row in px for t in row for v in t]
    # bottom-up storage (h > 0) and top-down (h < 0) both normalize
    # to the SAME top-down RGB sample stream
    for h in (2, -2):
        w, hh, c, samples = MM.decode_bmp(_bmp_bytes(3, h, px))
        assert (w, hh, c) == (3, 2, 3)
        assert samples == flat
    with pytest.raises(ValueError, match="truncated"):
        MM.decode_bmp(_bmp_bytes(3, 2, px)[:-4])
    bad_bpp = bytearray(_bmp_bytes(1, 1))
    # claiming 8 bpp makes the (absent) 256-entry palette truncated
    bad_bpp[28] = 8
    with pytest.raises(ValueError, match="palette"):
        MM.decode_bmp(bytes(bad_bpp))


def _bmp_ext(w, h, bpp, raster_rows, palette=None, compression=0,
             rle=None, clr_used=0):
    """A BITMAPINFOHEADER BMP at any bit depth: `raster_rows` are
    BOTTOM-UP storage rows of raw bytes (already packed/padded), or
    pass `rle` as the raw RLE8 byte stream. `palette` is (r,g,b)
    tuples stored BGRX."""
    import struct

    pal = b""
    if palette is not None:
        pal = b"".join(bytes((b, g, r, 0)) for r, g, b in palette)
    data = rle if rle is not None else b"".join(raster_rows)
    data_off = 54 + len(pal)
    header = b"BM" + struct.pack("<IHHI", data_off + len(data), 0, 0,
                                 data_off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, compression,
                       len(data), 2835, 2835, clr_used, 0)
    return header + info + pal + data


def test_decode_bmp_extended_depths_and_palette():
    """r13: 32-bit BI_RGB (X byte ignored), 16-bit XRGB555 (255/31
    rescale), and 1/4/8-bpp palette BMPs decode for REAL — pinned
    against the 24-bit decode of the same raster / closed-form
    channel values, with MSB-first sub-byte indices and 4-byte row
    padding exercised by odd widths."""
    import struct

    import social_and_media_data_ingestion_spark.operators.multimodal as MM

    # 32-bit vs 24-bit: same colors, X byte varies and must be ignored
    px = [[(1, 2, 3), (4, 5, 6), (7, 8, 9)],
          [(10, 11, 12), (13, 14, 15), (250, 251, 252)]]
    want = MM.decode_bmp(_bmp_bytes(3, 2, px))
    rows32 = []
    for ri in range(1, -1, -1):  # bottom-up
        row = b"".join(
            bytes((b, g, r, 0xAA)) for r, g, b in px[ri]
        )
        rows32.append(row)
    assert MM.decode_bmp(_bmp_ext(3, 2, 32, rows32)) == want

    # 16-bit XRGB555 closed form
    v = (20 << 10) | (7 << 5) | 31  # r=20, g=7, b=31 in 5-bit
    row16 = struct.pack("<HH", v, 0)  # w=1 padded to 4 bytes
    got = MM.decode_bmp(_bmp_ext(1, 1, 16, [row16]))
    assert got == (1, 1, 3, [20 * 255 // 31, 7 * 255 // 31, 255])

    # 8-bpp palette, w=3 (stride pads to 4)
    palette = [(i * 3 % 256, i * 5 % 256, i * 7 % 256) for i in range(16)]
    rows8 = [bytes([4, 9, 2, 0]), bytes([1, 0, 15, 0])]  # bottom-up
    got = MM.decode_bmp(_bmp_ext(3, 2, 8, rows8, palette=palette,
                                 clr_used=16))
    flat = [c for i in (1, 0, 15, 4, 9, 2) for c in palette[i]]
    assert got == (3, 2, 3, flat)

    # 4-bpp: indices pack two per byte MSB-first; w=3 leaves a pad
    # nibble; stride pads to 4 bytes
    rows4 = [bytes([0x49, 0x20, 0, 0]), bytes([0x10, 0xF0, 0, 0])]
    got4 = MM.decode_bmp(_bmp_ext(3, 2, 4, rows4, palette=palette,
                                  clr_used=16))
    assert got4 == (3, 2, 3, flat)

    # 1-bpp: w=9 spans two bytes per row
    pal2 = [(0, 0, 0), (255, 255, 255)]
    bits = [1, 0, 1, 1, 0, 0, 1, 0, 1]
    packed = bytes([0b10110010, 0b10000000, 0, 0])
    got1 = MM.decode_bmp(_bmp_ext(9, 1, 1, [packed], palette=pal2))
    assert got1 == (9, 1, 3, [c for b in bits for c in pal2[b]])

    # palette index past a short table: corrupt
    with pytest.raises(ValueError, match="palette index"):
        MM.decode_bmp(_bmp_ext(3, 2, 8, rows8, palette=palette[:9],
                               clr_used=9))


def test_decode_bmp_rle8_and_needs_codec():
    """r13: RLE8 decodes for REAL — encoded runs, absolute mode with
    word padding, EOL, delta (skipped pixels default to palette 0),
    EOS — pinned against the uncompressed 8-bpp decode of the same
    grid; hostile RLE escaping the grid or top-down RLE is corrupt;
    BI_BITFIELDS / RLE4 / embedded JPEG report needs_codec."""
    import social_and_media_data_ingestion_spark.operators.multimodal as MM

    palette = [(i, 2 * i, 3 * i) for i in range(64)]
    # target 5x3 grid (storage bottom-up). Absolute mode needs n >= 3
    # (n=0/1/2 are the EOL/EOS/delta escapes) and pads to a word
    # boundary. Bottom row: run 2x7, absolute [7,9,8]+pad, EOL.
    # Middle row: delta (1,0) skips one pixel (palette 0), runs
    # 2x5 1x6 1x6, EOL. Top row: run 5x1, EOS.
    rle = bytes(
        [2, 7, 0, 3, 7, 9, 8, 0, 0, 0,          # run, absolute(3)+pad, EOL
         0, 2, 1, 0, 2, 5, 1, 6, 1, 6, 0, 0,    # delta, runs, EOL
         5, 1, 0, 1]                             # run, EOS
    )
    bottom = [7, 7, 7, 9, 8]
    middle = [0, 5, 5, 6, 6]
    top = [1, 1, 1, 1, 1]
    rows8 = [bytes(bottom + [0, 0, 0]), bytes(middle + [0, 0, 0]),
             bytes(top + [0, 0, 0])]
    want = MM.decode_bmp(_bmp_ext(5, 3, 8, rows8, palette=palette,
                                  clr_used=64))
    got = MM.decode_bmp(_bmp_ext(5, 3, 8, None, palette=palette,
                                 compression=1, rle=rle, clr_used=64))
    assert got == want

    import pytest

    with pytest.raises(ValueError, match="escapes"):
        MM.decode_bmp(_bmp_ext(5, 3, 8, None, palette=palette,
                               compression=1, rle=bytes([9, 1, 0, 1]),
                               clr_used=64))
    with pytest.raises(ValueError, match="top-down"):
        MM.decode_bmp(_bmp_ext(5, -3, 8, None, palette=palette,
                               compression=1, rle=rle, clr_used=64))
    with pytest.raises(NotImplementedError):
        MM.decode_bmp(_bmp_ext(2, 2, 16, [bytes(8), bytes(8)],
                               compression=3))
    with pytest.raises(NotImplementedError):
        MM.decode_bmp(_bmp_ext(2, 2, 4, None, palette=palette[:16],
                               compression=2, rle=b"\x00\x01"))


def test_decode_ppm_variants():
    import social_and_media_data_ingestion_spark.operators.multimodal as MM

    p6 = b"P6 # comment\n2 2\n255\n" + bytes(range(12))
    assert MM.decode_ppm(p6) == (2, 2, 3, list(range(12)))
    p5 = b"P5\n3 1 255 " + bytes([9, 8, 7])
    assert MM.decode_ppm(p5) == (3, 1, 1, [9, 8, 7])
    with pytest.raises(ValueError, match="maxval|geometry"):
        MM.decode_ppm(b"P6\n2 2\n65535\n" + bytes(24))
    with pytest.raises(ValueError, match="truncated"):
        MM.decode_ppm(b"P6\n4 4\n255\n" + bytes(3))


def test_decode_images_real_path_routes_by_magic(spark):
    """fake=False is a REAL decode for the stdlib-decodable formats
    (BMP, PPM) — dims from actual header+raster parsing; malformed
    payloads yield NULL dims (data, not bugs); formats needing a codec
    still raise the Pillow stub."""
    import social_and_media_data_ingestion_spark.operators.multimodal as MM

    rows = [
        (1, bytearray(_bmp_bytes(5, 4))),
        (2, bytearray(b"P6\n2 3\n255\n" + bytes(18))),
        (3, bytearray(_bmp_bytes(5, 4)[:20])),  # truncated -> NULL dims
        (4, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        r.media_id: (r.width, r.height, r.channels)
        for r in MM.decode_images(df, fake=False).collect()
    }
    assert got[1] == (5, 4, 3)
    assert got[2] == (2, 3, 3)
    assert got[3] == (None, None, None)
    assert got[4] == (None, None, None)
    # r12: a malformed baseline JPEG (header-only, truncated SOF) is
    # DATA -> NULL dims; a genuinely-needs-codec frame (progressive)
    # still raises the stub
    jpg = spark.createDataFrame(
        [(9, bytearray(_jpeg_bytes(4, 4)))], "media_id long, payload binary"
    )
    got_j = {r.media_id: (r.width, r.height, r.channels)
             for r in MM.decode_images(jpg, fake=False).collect()}
    assert got_j[9] == (None, None, None)
    # r13: progressive is a real decode now; lossless (SOF3) is the
    # genuinely-needs-codec frame that still raises the stub
    lossless = spark.createDataFrame(
        [(9, bytearray(b"\xff\xd8\xff\xc3"))], "media_id long, payload binary"
    )
    with pytest.raises(Exception, match="codec"):
        MM.decode_images(lossless, fake=False).collect()


def test_sniff_image_dims_native(spark):
    """The native header sniff: PNG fixed-offset, JPEG variable-offset
    marker walk (APPn padding shifts SOF; SOF2 progressive counts), BMP
    little-endian signed int32 (top-down negative height -> abs). Every
    corrupt class degrades to NULL dims, never a wrong read or error."""
    import social_and_media_data_ingestion_spark.operators.multimodal as MM

    rows = [
        (1, bytearray(_png_bytes(640, 480))),
        (2, bytearray(_jpeg_bytes(123, 456, pad=7))),
        (3, bytearray(_jpeg_bytes(65500, 1, sof=b"\xc2"))),
        (4, bytearray(_bmp_bytes(31, 17))),
        (5, bytearray(_bmp_bytes(31, -17))),
        (6, bytearray(b"\x00\x01garbage")),
        (7, bytearray(_jpeg_bytes(9, 9)[:5])),
        (8, bytearray(_png_bytes(1, 1)[:10])),
        (9, None),
        (10, bytearray(b"GIF89a" + (300).to_bytes(2, "little") + (200).to_bytes(2, "little") + b"\x00\x00\x00")),
        (11, bytearray(b"GIF87a\x05")),  # truncated descriptor
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        r.media_id: (r.dim_format, r.width, r.height)
        for r in MM.sniff_image_dims(df).collect()
    }
    assert got[1] == ("png", 640, 480)
    assert got[2] == ("jpeg", 123, 456)
    assert got[3] == ("jpeg", 65500, 1)
    assert got[4] == ("bmp", 31, 17)
    assert got[5] == ("bmp", 31, 17)
    assert got[10] == ("gif", 300, 200)
    for k in (6, 7, 8, 9, 11):
        assert got[k] == (None, None, None)


def test_dim_sniff_query_hostile_ids_vs_oracle(spark, tmp_path):
    """multimodal_image_dim_sniff vs its DuckDB oracle on a hostile id
    fixture the generated corpus never produces: NULL doc_id (payload
    synthesis yields NULL -> NULL dims in BOTH engines, no CASE
    fallthrough) and a 10-digit id (the % arithmetic and the hex/lpad
    encoding stay in range)."""
    import duckdb

    from social_and_media_data_ingestion_spark.plans.queries import registry
    from social_and_media_data_ingestion_spark.plans.queries_ext5 import (
        multimodal_image_dim_sniff,
    )

    # r11 TIFF class (%11==7): 18 = II byte order + SHORT width, 29 =
    # MM + LONG, 40 = II + LONG; 7 also satisfies %11==7 but %7==0
    # garbage takes precedence in BOTH engines (the precedence probe)
    rows = [
        (i, "s", "x")
        for i in (0, 1, 2, 3, 6, 7, 14, 18, 21, 29, 40, 9999999999)
    ]
    rows.append((None, "s", "x"))
    spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = (
        multimodal_image_dim_sniff(spark, str(tmp_path))
        .toPandas()
        .sort_values("doc_id", na_position="last")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    want = (
        con.execute(registry()["multimodal_image_dim_sniff"].oracle)
        .fetchdf()
        .sort_values("doc_id", na_position="last")
        .reset_index(drop=True)
    )
    assert got.astype(str).equals(want.astype(str))


def test_image_pixel_stats_operator(spark):
    """Real raster decode end-to-end: BMP channel means reflect BGR
    ordering + stride padding + bottom-up storage; PGM grayscale
    reports its channel three times; truncated and NULL payloads and
    NULL ids survive as NULL-stats rows."""
    import social_and_media_data_ingestion_spark.operators.multimodal as MM

    px = [[(10, 20, 30), (40, 50, 60)]]  # 2x1 RGB
    rows = [
        (1, bytearray(_bmp_bytes(2, 1, px))),
        (2, bytearray(b"P5\n2 2\n255\n" + bytes([0, 10, 20, 30]))),
        (3, bytearray(_bmp_bytes(2, 2)[:30])),  # truncated
        (4, None),
        (None, bytearray(b"P5\n1 1\n255\n\x07")),
        # recognized formats that need a real codec must report
        # status='needs_codec', NOT blend into the corrupt class; a
        # PNG with no IDAT is decodable-format-but-corrupt (PNG is a
        # REAL stdlib decode since round 11), and since r12 so is a
        # baseline-JPEG header with a truncated SOF (6) — the
        # genuinely-needs-codec frame (10) is lossless SOF3 since r13
        # (progressive SOF2 decodes for real now)
        (5, bytearray(_png_bytes(4, 4))),  # IHDR only, no IDAT
        (6, bytearray(_jpeg_bytes(8, 8))),
        (10, bytearray(b"\xff\xd8\xff\xc3")),
        (7, bytearray(_webp_bytes(3, 3, "vp8l"))),
        (8, bytearray(b"\x00\x01not an image")),
        (9, bytearray(_png_full(2, 2, [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12]))),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        r.media_id: (r.width, r.height, r.mean_r, r.mean_g, r.mean_b, r.status)
        for r in MM.image_pixel_stats(df).collect()
    }
    assert got[1] == (2, 1, 25.0, 35.0, 45.0, "ok")
    assert got[2] == (2, 2, 15.0, 15.0, 15.0, "ok")
    assert got[3] == (None, None, None, None, None, "corrupt")
    assert got[4] == (None, None, None, None, None, "null_payload")
    assert got[None] == (1, 1, 7.0, 7.0, 7.0, "ok")
    assert got[5] == (None, None, None, None, None, "corrupt")
    assert got[6] == (None, None, None, None, None, "corrupt")
    for k in (7, 10):
        assert got[k] == (None, None, None, None, None, "needs_codec")
    assert got[8] == (None, None, None, None, None, "unknown_format")
    assert got[9] == (2, 2, 5.5, 6.5, 7.5, "ok")


def test_decode_png_all_filters_and_color_types():
    """decode_png (round 11, stdlib zlib): every filter type 0-4 must
    invert exactly — rows are ENCODED with the filter under test, so a
    wrong Sub/Up/Average/Paeth reconstruction corrupts the samples and
    fails the roundtrip. Gray (ct 0), RGB (ct 2), RGBA (ct 6), and an
    IDAT split across two chunks all roundtrip."""
    import random

    import social_and_media_data_ingestion_spark.operators.multimodal as MM

    rng = random.Random(11)
    for ctype, nch in ((0, 1), (2, 3), (6, 4)):
        for ft in range(5):
            w, h = 5, 4
            samples = [rng.randrange(256) for _ in range(w * h * nch)]
            png = _png_full(w, h, samples, ctype=ctype, filters=[ft] * h)
            assert MM.decode_png(png) == (w, h, nch, samples), (ctype, ft)
    # mixed filters per row + multi-chunk IDAT
    w, h = 7, 6
    samples = [rng.randrange(256) for _ in range(w * h * 3)]
    png = _png_full(w, h, samples, filters=[0, 1, 2, 3, 4, 2], split_idat=True)
    assert MM.decode_png(png) == (w, h, 3, samples)


def test_decode_png_palette_and_low_depths():
    """r13: palette color (ctype 3) at bit depths 1/2/4/8 and
    low-depth grayscale decode for REAL — indices resolve through
    PLTE, sub-byte samples unpack MSB-first (odd widths exercise the
    partial final byte), filters invert over the PACKED bytes with a
    one-byte left unit, and gray samples rescale by the spec's
    255/(2^depth-1) mapping."""
    import random

    import social_and_media_data_ingestion_spark.operators.multimodal as MM

    rng = random.Random(77)
    palette = [(rng.randrange(256), rng.randrange(256), rng.randrange(256))
               for _ in range(16)]
    for depth in (1, 2, 4, 8):
        ncol = min(len(palette), 1 << depth)
        for w, h in ((7, 5), (8, 3), (1, 4)):
            idx = [rng.randrange(ncol) for _ in range(w * h)]
            for ft in (0, 1, 2, 3, 4):
                png = _png_full(
                    w, h, idx, ctype=3, depth=depth,
                    palette=palette[:ncol], filters=[ft] * h,
                )
                want = [c for v in idx for c in palette[v]]
                assert MM.decode_png(png) == (w, h, 3, want), (depth, w, ft)
    # low-depth grayscale: 2-bit sample v decodes to v*85, 4-bit v*17,
    # 1-bit v*255
    for depth, scale in ((1, 255), (2, 85), (4, 17)):
        w, h = 9, 4
        vals = [rng.randrange(1 << depth) for _ in range(w * h)]
        png = _png_full(w, h, vals, ctype=0, depth=depth, filters=[2] * h)
        assert MM.decode_png(png) == (w, h, 1, [v * scale for v in vals])
    # gray+alpha (ctype 4): both channels come back; the stats means
    # use luminance only
    w, h = 5, 3
    ga = [rng.randrange(256) for _ in range(w * h * 2)]
    png = _png_full(w, h, ga, ctype=4, filters=[4] * h)
    assert MM.decode_png(png) == (w, h, 2, ga)
    assert MM._channel_means(ga, w * h, 2) == [sum(ga[::2]) / (w * h)] * 3
    # palette index past the PLTE: corrupt, not garbage pixels
    import pytest

    short = _png_full(2, 2, [0, 1, 2, 3], ctype=3, depth=8,
                      palette=palette[:3])
    with pytest.raises(ValueError):
        MM.decode_png(short)


def test_decode_png_adam7_roundtrip():
    """r13: Adam7-interlaced PNGs decode for REAL. The encoder splits
    the raster into the seven passes (each independently filtered);
    decode must return exactly the sequential decode of the same
    raster. Distinct per-pixel values make any scatter error visible;
    tiny geometries (1x1..5x5) exercise absent passes, and the
    filter rotation crosses pass boundaries so per-pass filter state
    is load-bearing."""
    import random

    import social_and_media_data_ingestion_spark.operators.multimodal as MM

    rng = random.Random(31)
    palette = [(i * 3 % 256, i * 7 % 256, i * 11 % 256) for i in range(16)]
    for ctype, depth, pal in (
        (2, 8, None), (0, 8, None), (6, 8, None), (4, 8, None),
        (3, 4, palette), (0, 2, None), (2, 16, None),
    ):
        nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
        top = {8: 256, 16: 65536}.get(depth, 1 << depth)
        if ctype == 3:
            top = len(pal)
        for w, h in ((1, 1), (2, 2), (3, 5), (5, 3), (9, 10), (16, 9)):
            samples = [rng.randrange(top) for _ in range(w * h * nch)]
            nrows_adam7 = sum(
                max(0, (h - y0 + dy - 1) // dy)
                for x0, y0, dx, dy in (
                    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
                    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
                )
                if (w - x0 + dx - 1) // dx > 0
            )
            filters = [(0, 1, 2, 3, 4)[i % 5] for i in range(nrows_adam7)]
            plain = MM.decode_png(
                _png_full(w, h, samples, ctype=ctype, depth=depth,
                          palette=pal)
            )
            inter = MM.decode_png(
                _png_full(w, h, samples, ctype=ctype, depth=depth,
                          palette=pal, interlace=True, filters=filters)
            )
            assert inter == plain, (ctype, depth, w, h)


def test_decode_png_16bit_reduction():
    """r13: 16-bit samples decode through the spec's
    round(v*255/65535) reduction — pinned by closed-form pairs
    (0->0, 65535->255, 257->1, 128->0, 129->1, 32896->128) and a
    filtered roundtrip against the 8-bit encode of the reduced
    raster."""
    import social_and_media_data_ingestion_spark.operators.multimodal as MM

    vals16 = [0, 65535, 257, 128, 129, 32896, 65278, 514, 771]
    png = _png_full(3, 3, vals16, ctype=0, depth=16, filters=[2, 4, 1])
    want = [(v * 255 + 32767) // 65535 for v in vals16]
    assert MM.decode_png(png) == (3, 3, 1, want)
    assert want[:6] == [0, 255, 1, 0, 1, 128]
    # RGB 16-bit: reduce then compare against the 8-bit decode path
    import random

    rng = random.Random(5)
    w, h = 4, 5
    v16 = [rng.randrange(65536) for _ in range(w * h * 3)]
    v8 = [(v * 255 + 32767) // 65535 for v in v16]
    got = MM.decode_png(
        _png_full(w, h, v16, ctype=2, depth=16, filters=[3] * h)
    )
    assert got == (w, h, 3, v8)


def test_decode_gif_interlaced_roundtrip():
    """r13: interlaced GIFs decode for REAL. The encoder writes rows
    in the four-pass order and sets the flag; decode must return
    exactly the non-interlaced decode of the same raster. Per-row
    sentinel indices pin the permutation row by row (a wrong pass
    boundary cannot cancel out), across heights hitting every pass-
    count edge (1..13 incl. h<5 where later passes are empty)."""
    import social_and_media_data_ingestion_spark.operators.multimodal as MM

    palette = [(i, 255 - i, i ^ 0x55) for i in range(16)]
    w = 6
    for h in (1, 2, 3, 4, 5, 8, 9, 13):
        # row y filled with index y%16: decoded row r must hold
        # palette[r%16]
        pixels = [y % 16 for y in range(h) for _ in range(w)]
        plain = MM.decode_gif(
            _gif_full(w, h, pixels, palette, mcs=4)
        )
        inter = MM.decode_gif(
            _gif_full(w, h, pixels, palette, mcs=4, interlace=True)
        )
        assert inter == plain, h
        _, _, _, s = inter
        for y in range(h):
            row = s[y * w * 3 : (y + 1) * w * 3]
            assert row == list(palette[y % 16]) * w, (h, y)


def test_decode_png_hostile_payloads():
    """Hostile PNGs raise ValueError (never crash, never garbage):
    truncated IDAT, bad filter byte, a palette image with no PLTE,
    an IHDR lying about the layout (depth/interlace flags demanding
    more raster bytes than the stream holds), zip-bomb geometry, and
    a zero dimension."""
    import struct
    import zlib

    import pytest

    import social_and_media_data_ingestion_spark.operators.multimodal as MM

    good = _png_full(3, 3, list(range(27)))

    def mutated_ihdr(**kw):
        w, h, depth, ctype, comp, filt, inter = struct.unpack_from(
            ">IIBBBBB", good, 16
        )
        d = dict(w=w, h=h, depth=depth, ctype=ctype, comp=comp, filt=filt,
                 inter=inter)
        d.update(kw)
        ihdr = struct.pack(">IIBBBBB", d["w"], d["h"], d["depth"], d["ctype"],
                           d["comp"], d["filt"], d["inter"])
        return good[:16] + ihdr + good[29:]

    cases = [
        good[: len(good) - 20],  # truncated inside IDAT
        mutated_ihdr(ctype=3),  # palette claimed but no PLTE chunk
        mutated_ihdr(ctype=2, depth=4),  # illegal depth for RGB
        mutated_ihdr(depth=16),  # 16-bit claim doubles the needed bytes
        mutated_ihdr(inter=1),  # Adam7 claim re-shapes the pass layout
        mutated_ihdr(w=0),
        mutated_ihdr(w=1 << 23, h=1 << 23),  # bomb geometry: reject pre-alloc
        b"\x89PNG\r\n\x1a\n" + b"\x00" * 10,  # no IHDR
    ]
    for p in cases:
        with pytest.raises(ValueError):
            MM.decode_png(bytes(p))
    # bad filter byte: re-compress a raster whose first row claims
    # filter 9 — must be a clean ValueError, not an IndexError
    raw = bytes([9]) + bytes(9)
    bad = _png_full(3, 1, list(range(9)))
    z = zlib.compress(raw)
    idat = struct.pack(">I", len(z)) + b"IDAT" + z + struct.pack(
        ">I", zlib.crc32(b"IDAT" + z)
    )
    iend = struct.pack(">I", 0) + b"IEND" + struct.pack(
        ">I", zlib.crc32(b"IEND")
    )
    with pytest.raises(ValueError):
        MM.decode_png(bad[:33] + idat + iend)


def test_decode_png_fuzz_never_crashes():
    """Property (hypothesis): decode_png on arbitrary mutations of a
    valid PNG — flipped bytes, truncations, appended garbage — either
    returns a well-formed tuple or raises ValueError, never any other
    exception (the corrupt-media-is-data contract of the stats UDF)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import social_and_media_data_ingestion_spark.operators.multimodal as MM

    base = _png_full(4, 3, list(range(36)))

    @settings(max_examples=150, deadline=None)
    @given(
        pos=st.integers(min_value=0, max_value=len(base) - 1),
        val=st.integers(min_value=0, max_value=255),
        cut=st.integers(min_value=8, max_value=len(base)),
        tail=st.binary(max_size=16),
    )
    def prop(pos, val, cut, tail):
        p = bytearray(base)
        p[pos] = val
        p = bytes(p[:cut]) + tail
        try:
            w, h, nch, s = MM.decode_png(p)
            assert w >= 1 and h >= 1 and len(s) == w * h * nch
        except ValueError:
            pass

    prop()


def test_pixel_stats_query_hostile_ids_vs_oracle(spark, tmp_path):
    """multimodal_image_pixel_stats vs its closed-form oracle on NULL
    and 10-digit doc_ids (same hostile-id contract as the dim sniff)."""
    import duckdb

    from social_and_media_data_ingestion_spark.plans.queries import registry
    from social_and_media_data_ingestion_spark.plans.queries_ext5 import (
        multimodal_image_pixel_stats,
    )

    rows = [(i, "s", "x") for i in (0, 1, 2, 3, 5, 7, 11, 9999999999)]
    rows.append((None, "s", "x"))
    spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = (
        multimodal_image_pixel_stats(spark, str(tmp_path))
        .toPandas()
        .sort_values("media_id", na_position="last")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    want = (
        con.execute(registry()["multimodal_image_pixel_stats"].oracle)
        .fetchdf()
        .sort_values("media_id", na_position="last")
        .reset_index(drop=True)
    )
    assert got.astype(str).equals(want.astype(str))


def test_png_pixel_stats_query_hostile_ids_vs_oracle(spark, tmp_path):
    """multimodal_png_pixel_stats vs its closed-form oracle on NULL
    and 10-digit doc_ids, plus ids hitting every (filter-class,
    corrupt, needs_codec, palette) branch: 0 (corrupt), 3
    (needs_codec), 7/14 (Up/Sub filter classes), 10 (%5 and... %7
    precedence), 21 (Sub + needs_codec precedence), 2/9/16/23 (r13
    4-bit palette incl. v=0 and v=9), 30 (corrupt beats palette)."""
    import duckdb

    from social_and_media_data_ingestion_spark.plans.queries import registry
    from social_and_media_data_ingestion_spark.plans.queries_ext5 import (
        multimodal_png_pixel_stats,
    )

    ids = (0, 1, 2, 3, 5, 7, 9, 10, 14, 16, 17, 21, 23, 30, 9999999999)
    rows = [(i, "s", "x") for i in ids]
    rows.append((None, "s", "x"))
    spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = (
        multimodal_png_pixel_stats(spark, str(tmp_path))
        .toPandas()
        .sort_values("media_id", na_position="last")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    want = (
        con.execute(registry()["multimodal_png_pixel_stats"].oracle)
        .fetchdf()
        .sort_values("media_id", na_position="last")
        .reset_index(drop=True)
    )
    assert got.astype(str).equals(want.astype(str))
    by_id = {r.media_id: (r.status, r.mean_r) for _, r in got.iterrows()}
    assert by_id[16] == ("ok", 0.0)          # palette v=0 -> PLTE[0]
    assert by_id[9] == ("ok", 45.0)          # palette v=9 -> 9*5
    assert by_id[30][0] == "corrupt"         # %5 beats the palette class


def test_sniff_image_dims_never_errors_property(spark):
    """Property (hypothesis): sniff_image_dims on ARBITRARY bytes —
    including bytes that start with a real magic and degenerate into
    garbage — never raises and never emits a negative dimension. A
    sniff runs before any validation at lake scale, so crash-freedom
    on hostile input is its core contract (one batch assembles all
    examples into a single Spark job to keep the property cheap)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import social_and_media_data_ingestion_spark.operators.multimodal as MM

    magics = [
        b"",
        b"\x89PNG\r\n\x1a\n",
        b"\xff\xd8\xff",
        b"BM",
        b"P6",
        b"GIF89a",
        b"RIFF\x00\x00\x00\x00WEBP",
        b"II*\x00",
        b"MM\x00*",
    ]
    cases = []

    @settings(max_examples=120, deadline=None)
    @given(
        magic=st.sampled_from(magics),
        tail=st.binary(min_size=0, max_size=80),
    )
    def collect(magic, tail):
        cases.append(magic + tail)

    collect()
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in enumerate(cases)],
        "media_id long, payload binary",
    )
    rows = MM.sniff_image_dims(df).collect()  # must not raise
    assert len(rows) == len(cases)
    for r in rows:
        assert r.width is None or r.width >= 0
        assert r.height is None or r.height >= 0


def test_sniff_image_dims_deep_marker_chain_degrades_to_null(spark):
    """A JPEG whose SOF hides behind MORE than the walk's 24 bounded
    hops must degrade to NULL dims (documented), never a wrong read —
    and one at exactly the bound still parses."""
    import struct

    import social_and_media_data_ingestion_spark.operators.multimodal as MM

    def jpeg_chain(n_segments, w=77, h=55):
        segs = b"".join(
            b"\xff\xe1" + struct.pack(">H", 4) + b"\x00\x00"
            for _ in range(n_segments)
        )
        sof = b"\xff\xc0" + struct.pack(">H", 17) + b"\x08" + struct.pack(">HH", h, w)
        return b"\xff\xd8" + segs + sof

    df = spark.createDataFrame(
        [(1, bytearray(jpeg_chain(23))), (2, bytearray(jpeg_chain(40)))],
        "media_id long, payload binary",
    )
    got = {r.media_id: (r.width, r.height) for r in MM.sniff_image_dims(df).collect()}
    assert got[1] == (77, 55)  # SOF on the 24th hop: still inside the bound
    assert got[2] == (None, None)  # beyond the bound: NULL, not garbage


def test_sniff_image_dims_fill_bytes_and_partial_headers(spark):
    """Round-11 advice fixes: (a) repeated 0xFF fill bytes before a
    marker id are legal JPEG padding — the walk must skip them, not
    read the fill byte as a marker with a bogus length; (b) a header
    truncated BETWEEN the width and height fields (e.g. a 9-byte GIF
    whose width parses but height doesn't) must NULL both dims AND
    dim_format; (c) a declared zero dimension is NULL uniformly across
    formats (PNG/GIF included, not just WebP/BMP)."""
    import struct

    import social_and_media_data_ingestion_spark.operators.multimodal as MM

    def jpeg_fill(n_fill, w=321, h=123):
        sof = (
            b"\xff" * n_fill
            + b"\xff\xc0"
            + struct.pack(">H", 17)
            + b"\x08"
            + struct.pack(">HH", h, w)
        )
        return b"\xff\xd8" + sof

    rows = [
        (1, bytearray(jpeg_fill(1))),
        (2, bytearray(jpeg_fill(5))),
        (3, bytearray(jpeg_fill(40))),  # pathological: degrade to NULL
        (4, bytearray(b"GIF89a" + (300).to_bytes(2, "little") + b"\x01")),
        (5, bytearray(_png_bytes(0, 480))),
        (6, bytearray(b"GIF89a" + (0).to_bytes(2, "little") + (5).to_bytes(2, "little") + b"\x00")),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        r.media_id: (r.dim_format, r.width, r.height)
        for r in MM.sniff_image_dims(df).collect()
    }
    assert got[1] == ("jpeg", 321, 123)
    assert got[2] == ("jpeg", 321, 123)
    for k in (3, 4, 5, 6):
        assert got[k] == (None, None, None)


def _webp_bytes(w, h, variant="vp8x"):
    """Minimal WebP headers for all three first-chunk layouts."""
    import struct

    if variant == "vp8x":
        payload = b"\x00\x00\x00\x00" + (w - 1).to_bytes(3, "little") + (
            h - 1
        ).to_bytes(3, "little")
        chunk = b"VP8X" + struct.pack("<I", len(payload)) + payload
    elif variant == "vp8":
        payload = b"\x00\x00\x00" + b"\x9d\x01\x2a" + struct.pack("<HH", w, h)
        chunk = b"VP8 " + struct.pack("<I", len(payload)) + payload
    else:  # vp8l
        bits = (w - 1) | ((h - 1) << 14)
        payload = b"\x2f" + struct.pack("<I", bits)
        chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def test_sniff_image_dims_webp_variants(spark):
    """All three WebP first-chunk layouts parse natively; a lossy chunk
    with a wrong start code and a RIFF that is a WAV (not WEBP) both
    yield NULLs, never a misread."""
    import social_and_media_data_ingestion_spark.operators.multimodal as MM

    bad_vp8 = bytearray(_webp_bytes(10, 10, "vp8"))
    bad_vp8[23] = 0x00  # corrupt the 9D012A start code
    rows = [
        (1, bytearray(_webp_bytes(640, 480, "vp8x"))),
        (2, bytearray(_webp_bytes(123, 456, "vp8"))),
        (3, bytearray(_webp_bytes(16383, 1, "vp8l"))),
        (4, bad_vp8),
        (5, bytearray(b"RIFF" + bytes(4) + b"WAVEfmt ")),
        (6, bytearray(_webp_bytes(1, 1, "vp8x")[:16])),  # truncated
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        r.media_id: (r.dim_format, r.width, r.height)
        for r in MM.sniff_image_dims(df).collect()
    }
    assert got[1] == ("webp", 640, 480)
    assert got[2] == ("webp", 123, 456)
    assert got[3] == ("webp", 16383, 1)
    for k in (4, 5, 6):
        assert got[k] == (None, None, None)
    # and the mime sniff now tells WEBP from WAV inside the same RIFF
    mimes = {
        r.media_id: r.detected_mime for r in MM.sniff_format(df).collect()
    }
    assert mimes[1] == "image/webp" and mimes[5] == "audio/x-wav"


# ---------------------------------------------------------------------------
# GIF (round 11): decode_gif = container struct-parse + pure-Python LZW.
# The tests carry their OWN LZW encoder — the repo ships only the decoder,
# so a round-trip here is evidence against an independent implementation,
# including variable code-width growth the registry query's synthesized
# streams never reach (their tables stay under 256 entries).
# ---------------------------------------------------------------------------


def _lzw_codes(mcs, pixels):
    """Classic LZW encode to a code list: [clear, data..., end]."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = clear + 2
    codes = [clear]
    cur = b""
    for px in pixels:
        cand = cur + bytes([px])
        if cand in table:
            cur = cand
        else:
            codes.append(table[cur])
            if next_code < 4096:
                table[cand] = next_code
                next_code += 1
            cur = bytes([px])
    if cur:
        codes.append(table[cur])
    codes.append(end)
    return codes


def _lzw_pack(codes, mcs):
    """LSB-first variable-width bit packing; the width schedule is
    derived by SIMULATING the decoder's table growth, so it is correct
    by construction (no encoder-side off-by-one can slip in)."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    out = bytearray()
    bitbuf = bits = 0
    table_len, width, first = clear + 2, mcs + 1, True
    for code in codes:
        bitbuf |= code << bits
        bits += width
        while bits >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            bits -= 8
        if code == clear:
            table_len, width, first = clear + 2, mcs + 1, True
        elif code != end:
            if first:
                first = False
            elif table_len < 4096:
                table_len += 1
                if table_len == (1 << width) and width < 12:
                    width += 1
    if bits:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def _gif_full(w, h, pixels, palette, mcs, sub_size=255, extensions=b"",
              interlace=False, animated_second_frame=False):
    """A spec-shaped GIF89a from pixel indices + an RGB palette list
    (padded to the next power-of-two size the header can declare).
    interlace=True stores the rows in the spec's four-pass order
    (0,8,16.. / 4,12.. / 2,6,10.. / 1,3,5..) and sets the flag, so
    decode_gif must permute them home."""
    import struct

    n = len(palette)
    size_field = max(1, (n - 1).bit_length()) - 1
    while (2 << size_field) < n:
        size_field += 1
    gct = bytearray()
    for rgb in palette:
        gct += bytes(rgb)
    gct += bytes(3 * ((2 << size_field) - n))
    p = bytearray(b"GIF89a")
    p += struct.pack("<HHBBB", w, h, 0x80 | 0x70 | size_field, 0, 0)
    p += gct
    p += extensions
    p += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlace else 0)
    p += bytes([mcs])
    if interlace:
        order = (
            list(range(0, h, 8)) + list(range(4, h, 8))
            + list(range(2, h, 4)) + list(range(1, h, 2))
        )
        pixels = [v for y in order for v in pixels[y * w : (y + 1) * w]]
    data = _lzw_pack(_lzw_codes(mcs, pixels), mcs)
    for i in range(0, len(data), sub_size):
        seg = data[i : i + sub_size]
        p += bytes([len(seg)]) + seg
    p += b"\x00"
    if animated_second_frame:
        p += b"\x2c" + struct.pack("<HHHHB", 0, 0, 1, 1, 0)
        p += bytes([mcs])
        d2 = _lzw_pack(_lzw_codes(mcs, [0]), mcs)
        p += bytes([len(d2)]) + d2 + b"\x00"
    p += b"\x3b"
    return bytes(p)


def test_decode_gif_lzw_roundtrip_property():
    """Property (hypothesis): encode random pixel grids with the
    test-side LZW encoder at every min-code-size 2-7 and decode with
    decode_gif — pixels and palette-mapped samples must match exactly.
    Large grids at mcs=2 push the table past 256/512 entries, so the
    variable code-width growth path (8->9 bits and beyond) is
    exercised, which the registry query's fixed-width streams never
    reach."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import social_and_media_data_ingestion_spark.operators.multimodal as MM

    @settings(max_examples=60, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=16),
        h=st.integers(min_value=1, max_value=12),
        mcs=st.integers(min_value=2, max_value=7),
        data=st.data(),
    )
    def prop(w, h, mcs, data):
        ncolors = 1 << mcs
        pixels = data.draw(
            st.lists(
                st.integers(min_value=0, max_value=ncolors - 1),
                min_size=w * h,
                max_size=w * h,
            )
        )
        palette = [(3 * i % 256, (3 * i + 1) % 256, (3 * i + 2) % 256)
                   for i in range(ncolors)]
        sub = data.draw(st.sampled_from([1, 7, 255]))
        gif = _gif_full(w, h, pixels, palette, mcs, sub_size=sub)
        gw, gh, nch, samples = MM.decode_gif(gif)
        assert (gw, gh, nch) == (w, h, 3)
        expect = [c for px in pixels for c in palette[px]]
        assert samples == expect

    prop()


def test_decode_gif_width_growth_and_midstream_clear():
    """Deterministic checks of the two LZW paths hostile to off-by-ones:
    (a) a 64x48 grid at mcs=2 drives the code width from 3 bits up
    through 9+ as the table passes 256/512 entries; (b) a mid-stream
    CLEAR code resets the table and width, and decoding continues."""
    import social_and_media_data_ingestion_spark.operators.multimodal as MM

    # (a) width growth: a de Bruijn-ish repeating texture compresses
    w, h = 64, 48
    pixels = [(i * 7 + (i * i) // 3) % 4 for i in range(w * h)]
    palette = [(i, i + 1, i + 2) for i in range(4)]
    gif = _gif_full(w, h, pixels, palette, mcs=2)
    gw, gh, _, samples = MM.decode_gif(gif)
    assert (gw, gh) == (w, h)
    assert samples == [c for px in pixels for c in palette[px]]

    # (b) mid-stream clear: encode two halves separately, join with the
    # second half's leading clear code intact
    half1, half2 = pixels[: w * h // 2], pixels[w * h // 2 :]
    codes = _lzw_codes(2, half1)[:-1] + _lzw_codes(2, half2)
    data = _lzw_pack(codes, 2)
    base = _gif_full(w, h, pixels, palette, mcs=2)
    # splice: rebuild the payload with the custom code stream
    import struct

    hdr_len = 13 + 3 * 4  # header + 4-entry GCT (size field 1 -> 4)
    p = bytearray(base[: hdr_len + 11])  # ...image descriptor + mcs byte
    for i in range(0, len(data), 255):
        seg = data[i : i + 255]
        p += bytes([len(seg)]) + seg
    p += b"\x00\x3b"
    gw, gh, _, samples = MM.decode_gif(bytes(p))
    assert (gw, gh) == (w, h)
    assert samples == [c for px in pixels for c in palette[px]]


def test_decode_gif_container_features():
    """Container handling: extension blocks are skipped (animated GIFs
    yield the FIRST frame), a local color table overrides the global
    one, GIF87a parses, and 1-byte sub-blocks reassemble."""
    import struct

    import social_and_media_data_ingestion_spark.operators.multimodal as MM

    palette = [(9, 8, 7), (1, 2, 3)]
    pixels = [0, 1, 1, 0]
    gce = b"\x21\xf9\x04\x04\x0a\x00\x00\x00"
    comment = b"\x21\xfe\x03abc\x00"
    gif = _gif_full(2, 2, pixels, palette, mcs=2,
                    extensions=gce + comment, animated_second_frame=True)
    w, h, nch, samples = MM.decode_gif(gif)
    assert (w, h, nch) == (2, 2, 3)
    assert samples == [9, 8, 7, 1, 2, 3, 1, 2, 3, 9, 8, 7]

    # GIF87a magic parses identically
    gif87 = b"GIF87a" + gif[6:]
    assert MM.decode_gif(gif87)[3] == samples

    # local color table wins over the global one
    base = _gif_full(2, 2, pixels, palette, mcs=2)
    hdr_len = 13 + 3 * 2  # 2-entry palette pads to a 2-entry GCT
    lct = bytes((40, 41, 42)) + bytes((50, 51, 52)) + bytes(6)
    p = (
        base[:hdr_len]
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 2, 0x80 | 0x01)
        + lct
        + base[hdr_len + 10 :]
    )
    w, h, _, samples = MM.decode_gif(bytes(p))
    assert samples == [40, 41, 42, 50, 51, 52, 50, 51, 52, 40, 41, 42]

    # 1-byte sub-blocks reassemble into the same stream
    tiny = _gif_full(2, 2, pixels, palette, mcs=2, sub_size=1)
    assert MM.decode_gif(tiny)[3] == [9, 8, 7, 1, 2, 3, 1, 2, 3, 9, 8, 7]


def test_decode_gif_hostile_payloads():
    """Hostile GIFs raise ValueError (never crash, never garbage):
    truncated everywhere a length is declared, pixel index outside
    the palette, trailer before any frame, unknown block tag, bomb
    geometry, and an LZW code outside the table. (Interlaced frames
    decode for real since r13 — see the interlace roundtrip test.)"""
    import struct

    import pytest

    import social_and_media_data_ingestion_spark.operators.multimodal as MM

    palette = [(0, 0, 0), (255, 255, 255)]
    good = _gif_full(3, 2, [0, 1, 0, 1, 0, 1], palette, mcs=2)
    hdr_len = 13 + 3 * 2  # 2-entry palette pads to a 2-entry GCT

    cases = [
        b"GIF89a\x03\x00",  # short header
        good[:hdr_len],  # no blocks at all
        good[:hdr_len] + b"\x3b",  # trailer before any frame
        good[:hdr_len] + b"\xaa" + good[hdr_len + 1 :],  # unknown tag
        good[: hdr_len + 5],  # truncated image descriptor
        good[:-3],  # sub-block chain never terminated
        # frame larger than the logical screen
        good[:hdr_len] + b"\x2c"
        + struct.pack("<HHHHB", 0, 0, 9, 9, 0) + good[hdr_len + 10 :],
        # bomb geometry in the logical screen descriptor
        b"GIF89a" + struct.pack("<HHBBB", 0xFFFF, 0xFFFF, 0, 0, 0) + b"\x2c",
        # declared 10-byte sub-block, ships none
        good[: hdr_len + 10] + b"\x0a",
    ]
    for p in cases:
        with pytest.raises(ValueError):
            MM.decode_gif(bytes(p))

    # pixel index outside a 2-entry palette: hand-build with index 3
    codes = _lzw_codes(2, [3, 3])
    data = _lzw_pack(codes, 2)
    p = bytearray(b"GIF89a")
    p += struct.pack("<HHBBB", 2, 1, 0x80, 0, 0)  # size field 0 -> 2 entries
    p += bytes((0, 0, 0, 1, 1, 1))
    p += b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 1, 0)
    p += b"\x02" + bytes([len(data)]) + data + b"\x00\x3b"
    with pytest.raises(ValueError):
        MM.decode_gif(bytes(p))

    # an LZW code beyond the table (code 200 at mcs=2 width 3 is
    # impossible; craft width-3 stream with code 6 right after clear)
    stream = _lzw_pack([4, 6, 5], 2)  # 6 = clear+2, undefined, prev=None
    p = bytearray(good[: hdr_len + 11]) + bytes([len(stream)]) + stream
    p += b"\x00\x3b"
    with pytest.raises(ValueError):
        MM.decode_gif(bytes(p))


def test_decode_gif_fuzz_never_crashes():
    """Property (hypothesis): decode_gif on arbitrary mutations of a
    valid GIF — flipped bytes, truncations, appended garbage — either
    returns a well-formed tuple or raises ValueError, never any other
    exception (the corrupt-media-is-data contract of the stats UDF)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import social_and_media_data_ingestion_spark.operators.multimodal as MM

    palette = [(i, 2 * i, 3 * i) for i in range(8)]
    base = _gif_full(5, 4, [i % 8 for i in range(20)], palette, mcs=3)

    @settings(max_examples=150, deadline=None)
    @given(
        pos=st.integers(min_value=0, max_value=len(base) - 1),
        val=st.integers(min_value=0, max_value=255),
        cut=st.integers(min_value=6, max_value=len(base)),
        tail=st.binary(max_size=16),
    )
    def prop(pos, val, cut, tail):
        p = bytearray(base)
        p[pos] = val
        p = bytes(p[:cut]) + tail
        try:
            w, h, nch, s = MM.decode_gif(p)
            assert w >= 1 and h >= 1 and len(s) == w * h * nch
        except ValueError:
            pass

    prop()


def test_gif_pixel_stats_query_hostile_ids_vs_oracle(spark, tmp_path):
    """multimodal_gif_pixel_stats vs its closed-form oracle on NULL and
    10-digit doc_ids, plus ids hitting every class and precedence
    branch: 0/5/15 (corrupt, incl. %7-class collisions), 3/17
    (needs_codec), 12 (dict-hit class), 1/8 (KwKwK class), 2/4/6/11
    (main arithmetic class)."""
    import duckdb

    from social_and_media_data_ingestion_spark.plans.queries import registry
    from social_and_media_data_ingestion_spark.plans.queries_ext5 import (
        multimodal_gif_pixel_stats,
    )

    ids = (0, 1, 2, 3, 4, 5, 6, 8, 11, 12, 15, 17, 9999999999)
    rows = [(i, "s", "x") for i in ids]
    rows.append((None, "s", "x"))
    spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = (
        multimodal_gif_pixel_stats(spark, str(tmp_path))
        .toPandas()
        .sort_values("media_id", na_position="last")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    want = (
        con.execute(registry()["multimodal_gif_pixel_stats"].oracle)
        .fetchdf()
        .sort_values("media_id", na_position="last")
        .reset_index(drop=True)
    )
    assert got.astype(str).equals(want.astype(str))


def _tiff_bytes(w, h, le=True, pad=0, w_short=False, extra_entries=True):
    """A spec-shaped baseline-TIFF header: magic, IFD0 at a declared
    offset (pad junk in between), ascending-tag entries with inline
    SHORT/LONG values."""
    import struct

    e = "<" if le else ">"
    p = bytearray(b"II*\x00" if le else b"MM\x00*")
    p += struct.pack(e + "I", 8 + pad)
    p += bytes(pad)
    entries = []
    if extra_entries:
        entries.append(
            struct.pack(e + "HHI", 254, 4, 1) + struct.pack(e + "I", 0)
        )
    if w_short:
        entries.append(
            struct.pack(e + "HHI", 256, 3, 1)
            + struct.pack(e + "H", w) + b"\x00\x00"
        )
    else:
        entries.append(
            struct.pack(e + "HHI", 256, 4, 1) + struct.pack(e + "I", w)
        )
    entries.append(struct.pack(e + "HHI", 257, 4, 1) + struct.pack(e + "I", h))
    if extra_entries:
        entries.append(
            struct.pack(e + "HHI", 259, 3, 1)
            + struct.pack(e + "H", 1) + b"\x00\x00"
        )
    p += struct.pack(e + "H", len(entries))
    for en in entries:
        p += en
    p += struct.pack(e + "I", 0)
    return bytes(p)


def test_sniff_image_dims_tiff(spark):
    """TIFF dims via the native IFD0 walk (r11): both byte orders,
    SHORT and LONG width types, a did-independent junk pad before the
    IFD (the dynamic-offset read is load-bearing), and hostile shapes
    — truncated header, garbage IFD, zero width, and a count>1 width
    entry whose value field is an OFFSET the sniff must refuse to
    chase — all degrade to NULL dims, never a wrong read."""
    import struct

    import social_and_media_data_ingestion_spark.operators.multimodal as MM

    offset_width = bytearray(_tiff_bytes(9, 9, le=True))
    offset_width = bytearray(
        bytes(offset_width).replace(
            struct.pack("<HHI", 256, 4, 1), struct.pack("<HHI", 256, 4, 2)
        )
    )
    rows = [
        (1, bytearray(_tiff_bytes(640, 480, le=True))),
        (2, bytearray(_tiff_bytes(123, 456, le=False))),
        (3, bytearray(_tiff_bytes(77, 88, le=True, pad=9, w_short=True))),
        (4, bytearray(_tiff_bytes(65535, 1, le=False, w_short=True))),
        (5, bytearray(b"II*\x00\x08\x00\x00")),  # truncated before IFD
        (6, bytearray(_tiff_bytes(0, 10, le=True))),  # zero width
        (7, bytearray(b"MM\x00*" + b"\xff" * 40)),  # garbage IFD
        (8, offset_width),  # count>1: value field is an offset
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        r.media_id: (r.dim_format, r.width, r.height)
        for r in MM.sniff_image_dims(df).collect()
    }
    assert got[1] == ("tiff", 640, 480)
    assert got[2] == ("tiff", 123, 456)
    assert got[3] == ("tiff", 77, 88)
    assert got[4] == ("tiff", 65535, 1)
    for k in (5, 6, 7, 8):
        assert got[k] == (None, None, None)
    # the mime sniff knows both TIFF byte orders (r11) and stays
    # magic-level: the garbage-IFD payload still reads image/tiff here
    # (the sniff is a prefix probe), while the dims above are NULL
    mimes = {
        r.media_id: r.detected_mime for r in MM.sniff_format(df).collect()
    }
    assert mimes[1] == "image/tiff" and mimes[2] == "image/tiff"
    assert mimes[7] == "image/tiff"
    assert mimes[5] == "image/tiff"  # truncated but magic-valid prefix


def test_sniff_image_dims_tiff_truncated_mid_entry_never_wrong_read(spark):
    """r12 advice fix: a doubly-malformed TIFF — height tag BEFORE
    width, payload cut mid-way through the width entry's value field —
    used to hex-slice the partial entry into a smaller-but-plausible
    width (the surviving low byte of 1281 read as width=1). The fold
    now skips any entry shorter than the full 12 bytes, so the dims
    degrade to NULL: 'never a wrong read' is the contract."""
    import struct

    import social_and_media_data_ingestion_spark.operators.multimodal as MM

    def cut_mid_value(le):
        e = "<" if le else ">"
        p = bytearray(b"II*\x00" if le else b"MM\x00*")
        p += struct.pack(e + "I", 8)  # IFD0 right after the header
        p += struct.pack(e + "H", 2)  # declares 2 entries
        # complete height entry first (tag 257, SHORT, value 5)
        p += struct.pack(e + "HHI", 257, 3, 1)
        p += struct.pack(e + "H", 5) + b"\x00\x00"
        # width entry (tag 256, SHORT, real value 1281) cut after ONE
        # value byte: little-endian keeps the low byte (reads 1),
        # big-endian keeps the high byte (reads 5) — both plausible
        p += struct.pack(e + "HHI", 256, 3, 1)
        p += struct.pack(e + "H", 1281)[:1]
        return bytes(p)

    rows = [
        (1, bytearray(cut_mid_value(le=True))),
        (2, bytearray(cut_mid_value(le=False))),
        # control: the same out-of-ascending-order tags, complete file
        (3, bytearray(_tiff_bytes(1281, 5, le=True))),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        r.media_id: (r.dim_format, r.width, r.height)
        for r in MM.sniff_image_dims(df).collect()
    }
    assert got[1] == (None, None, None)
    assert got[2] == (None, None, None)
    assert got[3] == ("tiff", 1281, 5)


def test_image_pixel_stats_tiff_reports_needs_codec(spark):
    """r12 advice fix: TIFF is a recognized format (sniff_format and
    sniff_image_dims both know it since r11), so the stats UDF must
    report 'needs_codec' for it — 'unknown_format' made a TIFF corpus
    indistinguishable from garbage, the exact ambiguity the status
    column exists to prevent. Both byte orders."""
    import social_and_media_data_ingestion_spark.operators.multimodal as MM

    rows = [
        (1, bytearray(_tiff_bytes(64, 48, le=True))),
        (2, bytearray(_tiff_bytes(64, 48, le=False))),
        (3, bytearray(b"\x00\x01not an image")),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r.media_id: r.status for r in MM.image_pixel_stats(df).collect()}
    assert got[1] == "needs_codec"
    assert got[2] == "needs_codec"
    assert got[3] == "unknown_format"


# =============================================================================
# JPEG (r12): decode_jpeg is a REAL baseline-sequential decode. The
# roundtrip tests below use a spec-shaped TEST-SIDE ENCODER (forward
# DCT + quantize + canonical Huffman tables built per image + MSB-first
# bit packing with FF00 stuffing + optional restart intervals) so the
# decoder is exercised on real multi-coefficient entropy streams — AC
# run-lengths, ZRL, EOB, code-width growth — not just the DC-only
# closed-form fixtures the oracle query uses.
# =============================================================================


def _jpeg_cat(v):
    s = 0
    a = abs(v)
    while a:
        a >>= 1
        s += 1
    return s


class _JpegBitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code, size):
        for i in range(size - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.put(1, 1)  # pad with 1-bits to the byte boundary


def _jpeg_fdct_quant(block, q):
    import math

    c = [1 / math.sqrt(2)] + [1.0] * 7
    cos = [
        [math.cos((2 * x + 1) * u * math.pi / 16) for u in range(8)]
        for x in range(8)
    ]
    out = []
    for v in range(8):
        for u in range(8):
            s = 0.0
            for y in range(8):
                for x in range(8):
                    s += (block[y * 8 + x] - 128) * cos[x][u] * cos[y][v]
            out.append(int(round(0.25 * c[u] * c[v] * s / q[v * 8 + u])))
    return out


def _jpeg_subsampled_planes(w, h, raster, subsample):
    """RGB->YCbCr (or gray), box-average subsample, pad to the MCU
    grid by replication. -> (comps [(cid, ch, cv)], 2-D planes, mx,
    my, per-comp ceil block grids (nbw, nbh)). Shared by the baseline,
    progressive, and sequential-multi-scan encoders."""
    gray = subsample is None
    if gray:
        comps = [(1, 1, 1)]
        planes_in = [list(raster)]
    else:
        sh, sv = subsample
        comps = [(1, sh, sv), (2, 1, 1), (3, 1, 1)]
        yp, cbp, crp = [], [], []
        for i in range(w * h):
            r, g, b = raster[3 * i : 3 * i + 3]
            yy = 0.299 * r + 0.587 * g + 0.114 * b
            cb = 128 - 0.168736 * r - 0.331264 * g + 0.5 * b
            cr = 128 + 0.5 * r - 0.418688 * g - 0.081312 * b
            for plane, v in ((yp, yy), (cbp, cb), (crp, cr)):
                plane.append(min(255, max(0, int(v + 0.5))))
        planes_in = [yp, cbp, crp]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mx = (w + 8 * hmax - 1) // (8 * hmax)
    my = (h + 8 * vmax - 1) // (8 * vmax)
    # component planes: subsample by box-averaging, pad by replication
    planes = []
    grids = []
    for (cid, ch, cv), pin in zip(comps, planes_in):
        pw, ph = mx * ch * 8, my * cv * 8
        sw = (w * ch + hmax - 1) // hmax  # true subsampled extent
        sh_ = (h * cv + vmax - 1) // vmax
        plane = [[0] * pw for _ in range(ph)]
        for yy in range(ph):
            for xx in range(pw):
                sx, sy = min(xx, sw - 1), min(yy, sh_ - 1)
                # box average of the source pixels this sample covers
                x0, y0 = sx * hmax // ch, sy * vmax // cv
                x1 = min(w, (sx + 1) * hmax // ch) or x0 + 1
                y1 = min(h, (sy + 1) * vmax // cv) or y0 + 1
                x0, y0 = min(x0, w - 1), min(y0, h - 1)
                acc = cnt = 0
                for py in range(y0, max(y1, y0 + 1)):
                    for px in range(x0, max(x1, x0 + 1)):
                        acc += pin[min(py, h - 1) * w + min(px, w - 1)]
                        cnt += 1
                plane[yy][xx] = int(acc / cnt + 0.5)
        planes.append(plane)
        grids.append(((sw + 7) // 8, (sh_ + 7) // 8))
    return comps, planes, mx, my, grids


def _jpeg_encode(w, h, raster, subsample=(1, 1), q=1, restart=0):
    """Minimal spec-correct baseline encoder: `raster` is a flat list —
    RGB triples (3-component) or gray samples (1-component, pass
    subsample=None). subsample=(2,2) makes Y 2x2 vs 1x1 chroma
    (4:2:0); (2,1) gives 4:2:2. One DC and one AC Huffman table serve
    all components, built canonically from the symbols the image
    actually uses (all at fixed code lengths — legal, if suboptimal)."""
    import struct

    from social_and_media_data_ingestion_spark.operators.multimodal import (
        _JPEG_ZIGZAG,
    )

    qtab = [q] * 64
    comps, planes, mx, my, _ = _jpeg_subsampled_planes(
        w, h, raster, subsample
    )
    # entropy-encode twice: pass 1 collects symbols, pass 2 emits
    for collect_only in (True, False):
        dc_syms, ac_syms = set(), set()
        if not collect_only:
            dcl = sorted(dc_syms_f)
            acl = sorted(ac_syms_f)
            dc_len = 4 if len(dcl) < 15 else 8
            dc_code = {s: i for i, s in enumerate(dcl)}
            ac_code = {s: i for i, s in enumerate(acl)}
            bw = _JpegBitWriter()
            segs = []
        preds = [0] * len(comps)
        mcu = 0
        for myi in range(my):
            for mxi in range(mx):
                if restart and mcu and mcu % restart == 0:
                    if not collect_only:
                        bw.flush()
                        bw.out += bytes(
                            [0xFF, 0xD0 + (mcu // restart - 1) % 8]
                        )
                    preds = [0] * len(comps)
                for ci, (cid, ch, cv) in enumerate(comps):
                    for by in range(cv):
                        for bx in range(ch):
                            ox, oy = (mxi * ch + bx) * 8, (myi * cv + by) * 8
                            block = [
                                planes[ci][oy + yy][ox + xx]
                                for yy in range(8)
                                for xx in range(8)
                            ]
                            coef = _jpeg_fdct_quant(block, qtab)
                            diff = coef[0] - preds[ci]
                            preds[ci] = coef[0]
                            s = _jpeg_cat(diff)
                            if collect_only:
                                dc_syms.add(s)
                            else:
                                bw.put(dc_code[s], dc_len)
                                if s:
                                    bw.put(
                                        diff if diff > 0 else diff + (1 << s) - 1,
                                        s,
                                    )
                            zz = [coef[_JPEG_ZIGZAG[k]] for k in range(64)]
                            run = 0
                            for k in range(1, 64):
                                if zz[k] == 0:
                                    run += 1
                                    continue
                                while run > 15:
                                    if collect_only:
                                        ac_syms.add(0xF0)
                                    else:
                                        bw.put(ac_code[0xF0], 8)
                                    run -= 16
                                s = _jpeg_cat(zz[k])
                                sym = (run << 4) | s
                                if collect_only:
                                    ac_syms.add(sym)
                                else:
                                    bw.put(ac_code[sym], 8)
                                    v = zz[k]
                                    bw.put(v if v > 0 else v + (1 << s) - 1, s)
                                run = 0
                            if run:
                                if collect_only:
                                    ac_syms.add(0x00)
                                else:
                                    bw.put(ac_code[0x00], 8)
                mcu += 1
        if collect_only:
            if not ac_syms:
                ac_syms.add(0x00)
            dc_syms_f, ac_syms_f = dc_syms, ac_syms
        else:
            bw.flush()
    # assemble the file
    def dht(tc, th, length, symbols):
        counts = [0] * 16
        counts[length - 1] = len(symbols)
        body = bytes([(tc << 4) | th]) + bytes(counts) + bytes(symbols)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    out = b"\xff\xd8"
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(
        [qtab[_JPEG_ZIGZAG[k]] for k in range(64)]
    )
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for cid, ch, cv in comps:
        sof += bytes([cid, (ch << 4) | cv, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    out += dht(0, 0, dc_len, dcl) + dht(1, 0, 8, acl)
    if restart:
        out += b"\xff\xdd" + struct.pack(">H", 4) + struct.pack(">H", restart)
    sos = bytes([len(comps)])
    for cid, _, _ in comps:
        sos += bytes([cid, 0x00])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += bytes(bw.out) + b"\xff\xd9"
    return out


def _jpeg_coef_blocks(w, h, raster, subsample, q):
    """FDCT+quantize every padded-grid block. -> (comps, per-comp
    {(bx, by): 64 natural-order coefs}, ceil grids, mx, my, qtab)."""
    qtab = [q] * 64
    comps, planes, mx, my, grids = _jpeg_subsampled_planes(
        w, h, raster, subsample
    )
    blocks = []
    for ci, (cid, ch, cv) in enumerate(comps):
        cmap = {}
        for by in range(my * cv):
            for bx in range(mx * ch):
                block = [
                    planes[ci][by * 8 + yy][bx * 8 + xx]
                    for yy in range(8)
                    for xx in range(8)
                ]
                cmap[(bx, by)] = _jpeg_fdct_quant(block, qtab)
        blocks.append(cmap)
    return comps, blocks, grids, mx, my, qtab


def _jpeg_scan_payload(emit):
    """Run `emit(put_sym, put_bits, put_rst)` twice: pass 1 collects
    the Huffman symbols each table id (0=DC, 1=AC) needs, pass 2
    writes the entropy bits with canonical fixed-length tables.
    -> ({tc: (code_len, symbols)}, payload bytes)."""
    syms = {0: set(), 1: set()}
    emit(lambda tc, s: syms[tc].add(s), lambda v, n: None, lambda n: None)
    tables = {}
    for tc in (0, 1):
        sl = sorted(syms[tc]) or [0]
        ln = 4 if len(sl) < 15 else 8
        tables[tc] = (ln, sl, {s: i for i, s in enumerate(sl)})
    bw = _JpegBitWriter()

    def put_sym(tc, s):
        ln, _, code = tables[tc]
        bw.put(code[s], ln)

    def put_rst(n):
        bw.flush()
        bw.out += bytes([0xFF, 0xD0 + n % 8])

    emit(put_sym, bw.put, put_rst)
    bw.flush()
    return {tc: tables[tc][:2] for tc in tables}, bytes(bw.out)


def _jpeg_headers(marker, w, h, comps, qtab, restart):
    import struct

    from social_and_media_data_ingestion_spark.operators.multimodal import (
        _JPEG_ZIGZAG,
    )

    out = b"\xff\xd8"
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(
        [qtab[_JPEG_ZIGZAG[k]] for k in range(64)]
    )
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for cid, ch, cv in comps:
        sof += bytes([cid, (ch << 4) | cv, 0])
    out += marker + struct.pack(">H", 2 + len(sof)) + sof
    if restart:
        out += b"\xff\xdd" + struct.pack(">H", 4) + struct.pack(">H", restart)
    return out


def _jpeg_dht(tc, th, ln, symbols):
    import struct

    counts = [0] * 16
    counts[ln - 1] = len(symbols)
    body = bytes([(tc << 4) | th]) + bytes(counts) + bytes(symbols)
    return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body


def _jpeg_encode_progressive(w, h, raster, subsample=None, q=1,
                             script="sa", restart=0, eobn=False):
    """Spec-correct progressive (SOF2) encoder, the multi-scan mirror
    of _jpeg_encode — proves decode_jpeg's coefficient-store path by
    differential roundtrip (same quantized coefficients as a baseline
    encode of the same raster, so decoded pixels must match exactly).

    script='spectral': DC scan (Al=0), then one full AC band per
    component (spectral selection only). script='sa': successive
    approximation — DC first at Al=1 + DC refinement, per-component
    split AC bands (1..5, 6..63) at Al=1 + AC refinement passes to
    Al=0 (the correction-bit surface). eobn=True accumulates
    cross-block EOBn runs in AC-first scans. restart=N emits RSTn
    every N MCUs / blocks, resetting predictors and EOB runs."""
    import struct

    from social_and_media_data_ingestion_spark.operators.multimodal import (
        _JPEG_ZIGZAG,
    )

    ZZ = _JPEG_ZIGZAG
    comps, blocks, grids, mx, my, qtab = _jpeg_coef_blocks(
        w, h, raster, subsample, q
    )
    ncomp = len(comps)

    def mcu_groups():
        # one yielded list per MCU: [(ci, (bx, by)), ...]
        for myi in range(my):
            for mxi in range(mx):
                g = []
                for ci, (cid, ch, cv) in enumerate(comps):
                    for by in range(cv):
                        for bx in range(ch):
                            g.append((ci, (mxi * ch + bx, myi * cv + by)))
                yield g

    def comp_order(ci):
        nbw, nbh = grids[ci]
        for by in range(nbh):
            for bx in range(nbw):
                yield (bx, by)

    def dc_first_emit(al):
        def emit(put_sym, put_bits, put_rst):
            preds = [0] * ncomp
            rstn = 0
            for mcu, group in enumerate(mcu_groups()):
                if restart and mcu and mcu % restart == 0:
                    put_rst(rstn)
                    rstn += 1
                    preds = [0] * ncomp
                for ci, key in group:
                    v = blocks[ci][key][0] >> al  # arithmetic shift
                    diff = v - preds[ci]
                    preds[ci] = v
                    s = _jpeg_cat(diff)
                    put_sym(0, s)
                    if s:
                        put_bits(
                            diff if diff > 0 else diff + (1 << s) - 1, s
                        )
        return emit

    def dc_refine_emit(al):
        def emit(put_sym, put_bits, put_rst):
            rstn = 0
            for mcu, group in enumerate(mcu_groups()):
                if restart and mcu and mcu % restart == 0:
                    put_rst(rstn)
                    rstn += 1
                for ci, key in group:
                    put_bits((blocks[ci][key][0] >> al) & 1, 1)
        return emit

    def ac_first_emit(ci, ss, se, al):
        def emit(put_sym, put_bits, put_rst):
            pend_eob = 0
            rstn = 0

            def flush_eob():
                nonlocal pend_eob
                if pend_eob:
                    r = pend_eob.bit_length() - 1
                    put_sym(1, r << 4)
                    if r:
                        put_bits(pend_eob - (1 << r), r)
                    pend_eob = 0

            for unit, key in enumerate(comp_order(ci)):
                if restart and unit and unit % restart == 0:
                    flush_eob()
                    put_rst(rstn)
                    rstn += 1
                C = blocks[ci][key]
                # AC point transform divides MAGNITUDE (unlike DC)
                vals = [
                    (abs(C[ZZ[k]]) >> al) * (1 if C[ZZ[k]] > 0 else -1)
                    for k in range(ss, se + 1)
                ]
                if not any(vals):
                    pend_eob += 1
                    if pend_eob == (32767 if eobn else 1):
                        flush_eob()
                    continue
                flush_eob()
                run = 0
                last_nz = max(i for i, v in enumerate(vals) if v)
                for v in vals[: last_nz + 1]:
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        put_sym(1, 0xF0)
                        run -= 16
                    s = _jpeg_cat(v)
                    put_sym(1, (run << 4) | s)
                    put_bits(v if v > 0 else v + (1 << s) - 1, s)
                    run = 0
                if last_nz < len(vals) - 1:
                    pend_eob += 1  # EOB run INCLUDES this block
                    if not eobn:
                        flush_eob()
            flush_eob()
        return emit

    def ac_refine_emit(ci, ss, se, al):
        def emit(put_sym, put_bits, put_rst):
            rstn = 0
            for unit, key in enumerate(comp_order(ci)):
                if restart and unit and unit % restart == 0:
                    put_rst(rstn)
                    rstn += 1
                C = blocks[ci][key]
                idxs = list(range(ss, se + 1))
                # t==0: zero history; t==1: newly nonzero this pass;
                # t>1: history nonzero -> correction bit (t & 1)
                ts = [abs(C[ZZ[k]]) >> al for k in idxs]
                newly = [i for i, t in enumerate(ts) if t == 1]
                pos = 0
                for target in newly:
                    run = sum(1 for j in range(pos, target) if ts[j] == 0)
                    while run > 15:
                        # ZRL skips 16 zero-history positions; the
                        # correction bits of history coefficients ride
                        # along in positional order
                        put_sym(1, 0xF0)
                        zeros = 0
                        while zeros < 16:
                            if ts[pos] == 0:
                                zeros += 1
                            elif ts[pos] > 1:
                                put_bits(ts[pos] & 1, 1)
                            pos += 1
                        run -= 16
                    put_sym(1, (run << 4) | 1)
                    put_bits(1 if C[ZZ[idxs[target]]] > 0 else 0, 1)
                    while pos < target:
                        if ts[pos] > 1:
                            put_bits(ts[pos] & 1, 1)
                        pos += 1
                    pos = target + 1
                if pos < len(idxs):
                    # decoder reads another symbol whenever k <= Se:
                    # close the block with EOB0 + tail correction bits
                    put_sym(1, 0x00)
                    for j in range(pos, len(idxs)):
                        if ts[j] > 1:
                            put_bits(ts[j] & 1, 1)
        return emit

    scans = []  # (scan component indexes, ss, se, ah, al, emit)
    if script == "spectral":
        scans.append((list(range(ncomp)), 0, 0, 0, 0, dc_first_emit(0)))
        for ci in range(ncomp):
            scans.append(([ci], 1, 63, 0, 0, ac_first_emit(ci, 1, 63, 0)))
    else:
        scans.append((list(range(ncomp)), 0, 0, 0, 1, dc_first_emit(1)))
        for ci in range(ncomp):
            scans.append(([ci], 1, 5, 0, 1, ac_first_emit(ci, 1, 5, 1)))
            scans.append(([ci], 6, 63, 0, 1, ac_first_emit(ci, 6, 63, 1)))
        scans.append((list(range(ncomp)), 0, 0, 1, 0, dc_refine_emit(0)))
        for ci in range(ncomp):
            scans.append(([ci], 1, 5, 1, 0, ac_refine_emit(ci, 1, 5, 0)))
            scans.append(([ci], 6, 63, 1, 0, ac_refine_emit(ci, 6, 63, 0)))

    import struct as _st

    out = _jpeg_headers(b"\xff\xc2", w, h, comps, qtab, restart)
    for scan_cis, ss, se, ah, al, emit in scans:
        tables, payload = _jpeg_scan_payload(emit)
        if ss == 0 and ah == 0:
            ln, sl = tables[0]
            out += _jpeg_dht(0, 0, ln, sl)
        if ss > 0:
            ln, sl = tables[1]
            out += _jpeg_dht(1, 0, ln, sl)
        sos = bytes([len(scan_cis)])
        for ci in scan_cis:
            sos += bytes([comps[ci][0], 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        out += b"\xff\xda" + _st.pack(">H", 2 + len(sos)) + sos + payload
    return out + b"\xff\xd9"


def _jpeg_encode_seq_multiscan(w, h, raster, subsample=None, q=1):
    """Sequential (SOF0) encoder with ONE full-band SOS per component —
    the spec-legal non-interleaved multi-scan baseline layout
    decode_jpeg routed 'needs_codec' through r12 and now decodes."""
    import struct

    from social_and_media_data_ingestion_spark.operators.multimodal import (
        _JPEG_ZIGZAG,
    )

    ZZ = _JPEG_ZIGZAG
    comps, blocks, grids, mx, my, qtab = _jpeg_coef_blocks(
        w, h, raster, subsample, q
    )

    out = _jpeg_headers(b"\xff\xc0", w, h, comps, qtab, 0)
    for ci in range(len(comps)):
        def emit(put_sym, put_bits, put_rst, ci=ci):
            nbw, nbh = grids[ci]
            pred = 0
            for by in range(nbh):
                for bx in range(nbw):
                    C = blocks[ci][(bx, by)]
                    diff = C[0] - pred
                    pred = C[0]
                    s = _jpeg_cat(diff)
                    put_sym(0, s)
                    if s:
                        put_bits(
                            diff if diff > 0 else diff + (1 << s) - 1, s
                        )
                    zz = [C[ZZ[k]] for k in range(64)]
                    run = 0
                    for k in range(1, 64):
                        if zz[k] == 0:
                            run += 1
                            continue
                        while run > 15:
                            put_sym(1, 0xF0)
                            run -= 16
                        s = _jpeg_cat(zz[k])
                        put_sym(1, (run << 4) | s)
                        put_bits(
                            zz[k] if zz[k] > 0 else zz[k] + (1 << s) - 1, s
                        )
                        run = 0
                    if run:
                        put_sym(1, 0x00)
        tables, payload = _jpeg_scan_payload(emit)
        ln0, sl0 = tables[0]
        ln1, sl1 = tables[1]
        out += _jpeg_dht(0, 0, ln0, sl0) + _jpeg_dht(1, 0, ln1, sl1)
        sos = bytes([1, comps[ci][0], 0x00, 0, 63, 0])
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos + payload
    return out + b"\xff\xd9"


def _rand_raster(n, seed=1234):
    # deterministic LCG so the fuzz/roundtrip fixtures never depend on
    # the environment
    vals = []
    x = seed
    for _ in range(n):
        x = (x * 1103515245 + 12345) % (1 << 31)
        vals.append(x % 256)
    return vals


def test_decode_jpeg_roundtrip_gray_and_color_444():
    from social_and_media_data_ingestion_spark.operators.multimodal import (
        decode_jpeg,
    )

    # gray 16x10: gradient + noise, quant=1 -> near-lossless
    w, h = 16, 10
    gray = [(x * 7 + y * 11 + n) % 256 for n, (y, x) in enumerate(
        (y, x) for y in range(h) for x in range(w)
    )]
    jp = _jpeg_encode(w, h, gray, subsample=None, q=1)
    W, H, nch, s = decode_jpeg(jp)
    assert (W, H, nch) == (w, h, 1)
    errs = [abs(a - b) for a, b in zip(s, gray)]
    assert max(errs) <= 6 and sum(errs) / len(errs) <= 1.5

    # color 4:4:4 11x9 pseudo-random RGB — exercises AC runs, ZRL, and
    # byte stuffing on a real entropy stream
    w, h = 11, 9
    rgb = _rand_raster(w * h * 3)
    jp = _jpeg_encode(w, h, rgb, subsample=(1, 1), q=1)
    W, H, nch, s = decode_jpeg(jp)
    assert (W, H, nch) == (w, h, 3)
    errs = [abs(a - b) for a, b in zip(s, rgb)]
    # RGB->YCbCr->RGB costs ~2 both ways even before DCT rounding
    assert max(errs) <= 10 and sum(errs) / len(errs) <= 2.5


def test_decode_jpeg_roundtrip_subsampled_and_quantized():
    from social_and_media_data_ingestion_spark.operators.multimodal import (
        decode_jpeg,
    )

    # 4:2:0 with chroma constant per 2x2 (so subsampling is lossless)
    w, h = 18, 14
    rgb = []
    for y in range(h):
        for x in range(w):
            g = (x * 13 + y * 5) % 200
            rgb.extend((g, (g + 40) % 256, 30))
    jp = _jpeg_encode(w, h, rgb, subsample=(2, 2), q=1)
    W, H, nch, s = decode_jpeg(jp)
    assert (W, H, nch) == (w, h, 3)
    # 4:2:2 as well — the generic hmax/vmax geometry must handle it
    jp2 = _jpeg_encode(w, h, rgb, subsample=(2, 1), q=1)
    assert decode_jpeg(jp2)[:3] == (w, h, 3)
    # a coarser quant table (dequant multiply is load-bearing)
    flat = [77, 150, 40] * (w * h)
    jp3 = _jpeg_encode(w, h, flat, subsample=(2, 2), q=16)
    W, H, nch, s3 = decode_jpeg(jp3)
    for c in range(3):
        ch = s3[c::3]
        assert max(ch) - min(ch) == 0  # flat stays flat
        assert abs(ch[0] - flat[c]) <= 8  # q=16 DC rounding bound


def test_decode_jpeg_restart_intervals():
    from social_and_media_data_ingestion_spark.operators.multimodal import (
        decode_jpeg,
    )

    w, h = 32, 8  # 4 MCUs at 4:4:4 -> restarts after every MCU
    rgb = _rand_raster(w * h * 3, seed=77)
    for ri in (1, 2):
        jp = _jpeg_encode(w, h, rgb, subsample=(1, 1), q=1, restart=ri)
        W, H, nch, s = decode_jpeg(jp)
        assert (W, H, nch) == (w, h, 3)
        errs = [abs(a - b) for a, b in zip(s, rgb)]
        assert max(errs) <= 10
    # a missing RST marker is corruption, not a crash
    jp = _jpeg_encode(w, h, rgb, subsample=(1, 1), q=1, restart=1)
    broken = jp.replace(b"\xff\xd0", b"\x00\x00", 1)
    with pytest.raises(ValueError):
        decode_jpeg(broken)


def test_decode_jpeg_error_taxonomy():
    """The two failure classes stay distinguishable: NotImplementedError
    for valid-but-needs-codec frames, ValueError for malformed files —
    that split IS the status-column contract (needs_codec vs corrupt)."""
    from social_and_media_data_ingestion_spark.operators.multimodal import (
        decode_jpeg,
    )

    base = _jpeg_encode(8, 8, _rand_raster(8 * 8 * 3), subsample=(1, 1))
    # needs_codec: lossless, arithmetic, hierarchical, 12-bit
    # (progressive SOF2 is a REAL decode since r13 — a bare C2 prefix
    # is now a TRUNCATED progressive file, i.e. corrupt, tested below)
    for sof in (0xC3, 0xC5, 0xC9, 0xCA, 0xCE):
        with pytest.raises(NotImplementedError):
            decode_jpeg(b"\xff\xd8\xff" + bytes([sof]))
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xc2")
    twelve = base.replace(
        b"\xff\xc0\x00\x11\x08", b"\xff\xc0\x00\x11\x0c", 1
    )
    with pytest.raises(NotImplementedError):
        decode_jpeg(twelve)
    # corrupt: not-a-jpeg, EOI before SOS, truncated scan, zip-bomb
    # geometry, 2-component frame, missing tables
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG")
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xd9")
    with pytest.raises(ValueError):
        decode_jpeg(base[: len(base) // 2])
    bomb = base.replace(
        b"\xff\xc0\x00\x11\x08\x00\x08\x00\x08",
        b"\xff\xc0\x00\x11\x08\xff\xff\xff\xff",
        1,
    )
    with pytest.raises(ValueError):
        decode_jpeg(bomb)


def test_decode_jpeg_spec_valid_variants():
    """r12 ADVICE refined by r13: non-interleaved multi-scan baseline
    files are a REAL decode now (the coefficient-store path), so the
    needs_codec split moves — a COMPLETE multi-scan file decodes, a
    file whose scans never cover every frame component is malformed
    ('corrupt'), and 4-component CMYK/YCCK frames stay
    NotImplementedError (-> 'needs_codec')."""
    import struct

    from social_and_media_data_ingestion_spark.operators.multimodal import (
        decode_jpeg,
    )

    # a single SOS covering only component 1 of 3, then EOI: scans
    # never cover components 2/3 -> corrupt (incomplete file), not a
    # crash and not needs_codec
    base = _jpeg_encode(8, 8, _rand_raster(8 * 8 * 3), subsample=(1, 1))
    full_sos = (
        b"\xff\xda" + struct.pack(">H", 12)
        + bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])
    )
    assert full_sos in base
    single_sos = (
        b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00, 0, 63, 0])
    )
    with pytest.raises(ValueError):
        decode_jpeg(base.replace(full_sos, single_sos, 1))
    # an SOS claiming MORE components than the frame stays corrupt
    over_sos = (
        b"\xff\xda" + struct.pack(">H", 14)
        + bytes([4, 1, 0x00, 2, 0x00, 3, 0x00, 4, 0x00, 0, 63, 0])
    )
    with pytest.raises(ValueError):
        decode_jpeg(base.replace(full_sos, over_sos, 1))
    # two SOF markers in one frame: corrupt
    sof = base[base.index(b"\xff\xc0") : base.index(b"\xff\xc0") + 19]
    with pytest.raises(ValueError):
        decode_jpeg(base[:2] + sof + base[2:])

    # 4-component (CMYK/YCCK) SOF0
    sof4 = bytes([8, 0, 8, 0, 8, 4]) + bytes(
        [1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0, 4, 0x11, 0]
    )
    cmyk = (
        b"\xff\xd8\xff\xc0" + struct.pack(">H", 2 + len(sof4)) + sof4
    )
    with pytest.raises(NotImplementedError):
        decode_jpeg(cmyk)


def test_decode_jpeg_progressive_roundtrip():
    """The r13 coefficient-store path, proven differentially: a
    progressive encode of a raster carries EXACTLY the same quantized
    coefficients as the baseline encode (shared FDCT pipeline), so
    decode_jpeg must return byte-identical pixels for both files —
    across gray/4:4:4/4:2:0/4:2:2, spectral-selection-only scripts,
    and full successive approximation (DC+AC refinement scans)."""
    from social_and_media_data_ingestion_spark.operators.multimodal import (
        decode_jpeg,
    )

    for name, w, h, sub, q, script in [
        ("gray-spectral", 16, 10, None, 1, "spectral"),
        ("gray-sa", 16, 10, None, 4, "sa"),
        ("c444-sa", 13, 9, (1, 1), 2, "sa"),
        ("c420-spectral", 21, 15, (2, 2), 3, "spectral"),
        ("c420-sa", 21, 15, (2, 2), 3, "sa"),
        ("c422-sa", 18, 11, (2, 1), 2, "sa"),
    ]:
        n = w * h * (1 if sub is None else 3)
        raster = _rand_raster(n, seed=hash(name) % (1 << 30))
        want = decode_jpeg(_jpeg_encode(w, h, raster, subsample=sub, q=q))
        got = decode_jpeg(
            _jpeg_encode_progressive(
                w, h, raster, subsample=sub, q=q, script=script
            )
        )
        assert got == want, name


def test_decode_jpeg_progressive_restart_and_eobn():
    """Restart intervals inside progressive scans (predictors AND EOB
    runs reset at every RSTn) and cross-block EOBn runs decode to the
    same pixels as the baseline encode."""
    from social_and_media_data_ingestion_spark.operators.multimodal import (
        decode_jpeg,
    )

    for name, w, h, sub, q, script, restart, eobn in [
        ("rst2-gray-sa", 24, 17, None, 2, "sa", 2, False),
        ("rst3-420-sa", 21, 15, (2, 2), 3, "sa", 3, True),
        ("eobn-444-spectral", 13, 9, (1, 1), 2, "spectral", 0, True),
        ("rst2-444-spectral", 13, 9, (1, 1), 2, "spectral", 2, True),
    ]:
        n = w * h * (1 if sub is None else 3)
        raster = _rand_raster(n, seed=hash(name) % (1 << 30))
        want = decode_jpeg(_jpeg_encode(w, h, raster, subsample=sub, q=q))
        got = decode_jpeg(
            _jpeg_encode_progressive(
                w, h, raster, subsample=sub, q=q, script=script,
                restart=restart, eobn=eobn,
            )
        )
        assert got == want, name


def test_decode_jpeg_sequential_multiscan_roundtrip():
    """Non-interleaved sequential multi-scan files (one full-band SOS
    per component) decode identically to the interleaved single-scan
    baseline encode of the same raster."""
    from social_and_media_data_ingestion_spark.operators.multimodal import (
        decode_jpeg,
    )

    for name, w, h, sub, q in [
        ("seq-gray", 16, 10, None, 1),
        ("seq-420", 21, 15, (2, 2), 3),
        ("seq-422", 18, 11, (2, 1), 2),
    ]:
        n = w * h * (1 if sub is None else 3)
        raster = _rand_raster(n, seed=hash(name) % (1 << 30))
        want = decode_jpeg(_jpeg_encode(w, h, raster, subsample=sub, q=q))
        got = decode_jpeg(
            _jpeg_encode_seq_multiscan(w, h, raster, subsample=sub, q=q)
        )
        assert got == want, name


def test_decode_jpeg_progressive_error_taxonomy():
    """Hostile progressive structure is data-level corruption
    (ValueError), never a crash or a needs_codec mislabel: AC scans
    before the DC scan, interleaved AC scans, bad successive-
    approximation sequences, truncated scan data, and scans past the
    band end."""
    from social_and_media_data_ingestion_spark.operators.multimodal import (
        decode_jpeg,
    )

    raster = _rand_raster(13 * 9 * 3, seed=99)
    good = _jpeg_encode_progressive(
        13, 9, raster, subsample=(1, 1), q=2, script="spectral"
    )
    assert decode_jpeg(good)[0] == 13

    # drop the DC scan (DHT + SOS + payload): the first AC scan then
    # arrives with no DC history -> corrupt (entropy data is
    # FF-stuffed, so marker searches cannot false-hit inside payloads)
    dc_dht = good.index(b"\xff\xc4")
    dc_sos = good.index(b"\xff\xda")
    ac_dht = good.index(b"\xff\xc4", dc_sos)
    with pytest.raises(ValueError):
        decode_jpeg(good[:dc_dht] + good[ac_dht:])

    # interleaved AC scan: rewrite an AC SOS to claim 3 components
    with pytest.raises(ValueError):
        import struct

        first_ac_sos = good.index(b"\xff\xda", dc_sos + 2)
        bad = good[:first_ac_sos] + (
            b"\xff\xda" + struct.pack(">H", 12)
            + bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 1, 63, 0])
        ) + good[first_ac_sos + 10 :]
        decode_jpeg(bad)

    # truncated mid-scan
    with pytest.raises(ValueError):
        decode_jpeg(good[: len(good) * 2 // 3])

    # bad successive approximation: Ah=2 with Al=0 (must be Al=Ah-1)
    sa = _jpeg_encode_progressive(
        8, 8, _rand_raster(64, seed=7), subsample=None, q=1, script="sa"
    )
    refine_sos = b"\xff\xda\x00\x08\x01\x01\x00\x00\x00\x10"
    pos = sa.index(refine_sos)  # the gray DC refinement SOS
    with pytest.raises(ValueError):
        decode_jpeg(
            sa[:pos] + refine_sos[:-1] + b"\x20" + sa[pos + len(refine_sos):]
        )


def test_decode_jpeg_adobe_app14_rgb_transform():
    """r12 ADVICE: APP14 'Adobe' transform=0 means the 3 planes are
    plain RGB — the JFIF YCbCr matrix must NOT run. With a flat-color
    image the encoder's Y/Cb/Cr plane values are closed-form, so the
    transform=0 decode must return exactly those plane values as
    channels; transform=1 must match the APP14-less decode."""
    import struct

    from social_and_media_data_ingestion_spark.operators.multimodal import (
        decode_jpeg,
    )

    w, h = 16, 8
    r, g, b = 77, 150, 40
    flat = [r, g, b] * (w * h)
    base = _jpeg_encode(w, h, flat, subsample=(1, 1), q=1)

    def app14(transform):
        seg = b"Adobe" + bytes([0, 100, 0, 0, 0, 0, transform])
        return b"\xff\xee" + struct.pack(">H", 2 + len(seg)) + seg

    # plane values the encoder wrote (its own RGB->YCbCr formula)
    yy = min(255, max(0, int(0.299 * r + 0.587 * g + 0.114 * b + 0.5)))
    cb = min(255, max(0, int(128 - 0.168736 * r - 0.331264 * g + 0.5 * b + 0.5)))
    cr = min(255, max(0, int(128 + 0.5 * r - 0.418688 * g - 0.081312 * b + 0.5)))

    W, H, nch, s0 = decode_jpeg(base[:2] + app14(0) + base[2:])
    assert (W, H, nch) == (w, h, 3)
    for c, want in enumerate((yy, cb, cr)):
        ch = s0[c::3]
        assert max(ch) - min(ch) == 0  # flat stays flat
        assert abs(ch[0] - want) <= 2  # q=1 DCT rounding only

    # transform=1 (explicit YCbCr) == no-APP14 decode, which recovers
    # the original RGB
    s1 = decode_jpeg(base[:2] + app14(1) + base[2:])[3]
    assert s1 == decode_jpeg(base)[3]
    assert all(
        abs(a - want) <= 4 for a, want in zip(s1[:3], (r, g, b))
    )


def test_decode_jpeg_mutation_fuzz_never_crashes():
    """Bit flips, truncations, and segment-length lies must yield a
    decode or a ValueError/NotImplementedError — never any other
    exception (the PNG/GIF fuzz precedent)."""
    from social_and_media_data_ingestion_spark.operators.multimodal import (
        decode_jpeg,
    )

    muts = []
    for base in (
        _jpeg_encode(
            10, 7, _rand_raster(10 * 7 * 3, seed=9), subsample=(2, 2), q=2
        ),
        # r13: the progressive multi-scan surface fuzzes too
        _jpeg_encode_progressive(
            10, 7, _rand_raster(10 * 7 * 3, seed=9), subsample=(2, 2),
            q=2, script="sa",
        ),
    ):
        for i in range(0, len(base), 3):
            b = bytearray(base)
            b[i] ^= 0xFF
            muts.append(bytes(b))
        muts += [base[:i] for i in range(2, len(base), 5)]
        lcg = 424242
        for _ in range(60):
            lcg = (lcg * 1103515245 + 12345) % (1 << 31)
            b = bytearray(base)
            b[lcg % len(b)] = (lcg >> 8) % 256
            muts.append(bytes(b))
    decoded = failed = 0
    for m in muts:
        try:
            w, h, nch, s = decode_jpeg(m)
            assert len(s) == w * h * nch
            decoded += 1
        except (ValueError, NotImplementedError):
            failed += 1
    assert decoded + failed == len(muts) and failed > 0


def _jpeg_dc_bytes(w, h, vy, vcb=None, vcr=None, mode="444"):
    """The DC-only closed-form fixture the oracle query synthesizes in
    SQL, built here in Python: flat blocks, 2-symbol DC table (cat 0 at
    '00', cat 6 at '0100'), 1-symbol AC table (EOB at '000000'), quant
    all 8s — every block byte-aligned by construction. mode='prog' is
    the r13 progressive twin: SOF2 + a single DC scan against a
    1-symbol table 1 (cat 6 at the 2-bit '00'), so each component's
    scan byte IS its 6 extra bits — one byte per block, single MCU."""
    import struct

    def cat6(V):
        e = V if V >= 0 else V + 63
        return bytes([0x40 | (e >> 2), (e & 3) << 6])

    dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([8] * 64)
    dc = b"\xff\xc4" + struct.pack(">H", 21) + b"\x00" + bytes(
        [0, 1, 0, 1] + [0] * 12
    ) + bytes([0x00, 0x06])
    ac = b"\xff\xc4" + struct.pack(">H", 20) + b"\x10" + bytes(
        [0, 0, 0, 0, 0, 1] + [0] * 10
    ) + bytes([0x00])
    if mode == "prog":
        dc1 = b"\xff\xc4" + struct.pack(">H", 20) + b"\x01" + bytes(
            [0, 1] + [0] * 14
        ) + bytes([0x06])
        sof = b"\xff\xc2" + struct.pack(">H", 17) + bytes([8]) + struct.pack(
            ">HH", h, w
        ) + bytes([3, 1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0])
        sos = b"\xff\xda" + struct.pack(">H", 12) + bytes(
            [3, 1, 0x10, 2, 0x10, 3, 0x10, 0, 0, 0]
        )
        scan = bytes(
            [v if v >= 0 else v + 63 for v in (vy, vcb, vcr)]
        )
        return (
            b"\xff\xd8" + dqt + dc + ac + dc1 + sof + sos + scan
            + b"\xff\xd9"
        )
    if mode == "gray":
        sof = b"\xff\xc0" + struct.pack(">H", 11) + bytes([8]) + struct.pack(
            ">HH", h, w
        ) + bytes([1, 1, 0x11, 0])
        sos = b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0, 0, 63, 0])
        scan = cat6(vy)
    else:
        samp = 0x22 if mode == "420" else 0x11
        sof = b"\xff\xc0" + struct.pack(">H", 17) + bytes([8]) + struct.pack(
            ">HH", h, w
        ) + bytes([3, 1, samp, 0, 2, 0x11, 0, 3, 0x11, 0])
        sos = b"\xff\xda" + struct.pack(">H", 12) + bytes(
            [3, 1, 0, 2, 0, 3, 0, 0, 63, 0]
        )
        if mode == "420":
            scan = cat6(vy) + b"\x00" * 3 + cat6(vcb) + cat6(vcr)
        else:
            n_mcu = ((w + 7) // 8) * ((h + 7) // 8)
            scan = (cat6(vy) + cat6(vcb) + cat6(vcr)) + b"\x00\x00\x00" * (
                n_mcu - 1
            )
    return b"\xff\xd8" + dqt + dc + ac + sof + sos + scan + b"\xff\xd9"


def test_image_pixel_stats_jpeg_real_decode(spark):
    """End-to-end through the stats UDF: baseline AND progressive
    (r13) JPEGs decode to status='ok' with the closed-form channel
    means (quant 8 x cat-6 DC V -> flat plane 128+V; JFIF YCbCr->RGB
    with floor(x+0.5)); lossless SOF3 reports needs_codec; truncated
    scans — baseline or progressive — report corrupt."""
    import math

    import social_and_media_data_ingestion_spark.operators.multimodal as MM

    vy, vcb, vcr = 50, -40, -35
    exp_r = math.floor(128 + vy + 1.402 * vcr + 0.5)
    exp_g = math.floor((128 + vy) - 0.344136 * vcb - 0.714136 * vcr + 0.5)
    exp_b = math.floor(128 + vy + 1.772 * vcb + 0.5)
    rows = [
        (1, bytearray(_jpeg_dc_bytes(10, 9, vy, vcb, vcr))),
        (2, bytearray(_jpeg_dc_bytes(5, 7, 33, mode="gray"))),
        (3, bytearray(_jpeg_dc_bytes(13, 11, vy, vcb, vcr, mode="420"))),
        (4, bytearray(b"\xff\xd8\xff\xc3")),
        (5, bytearray(_jpeg_dc_bytes(10, 9, vy, vcb, vcr)[:-12])),
        (6, bytearray(_jpeg_dc_bytes(7, 6, vy, vcb, vcr, mode="prog"))),
        (7, bytearray(_jpeg_dc_bytes(7, 6, vy, vcb, vcr, mode="prog")[:-4])),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        r.media_id: (r.width, r.height, r.mean_r, r.mean_g, r.mean_b, r.status)
        for r in MM.image_pixel_stats(df).collect()
    }
    assert got[1] == (10, 9, float(exp_r), float(exp_g), float(exp_b), "ok")
    assert got[2] == (5, 7, 161.0, 161.0, 161.0, "ok")
    assert got[3] == (13, 11, float(exp_r), float(exp_g), float(exp_b), "ok")
    assert got[4] == (None, None, None, None, None, "needs_codec")
    assert got[5] == (None, None, None, None, None, "corrupt")
    assert got[6] == (7, 6, float(exp_r), float(exp_g), float(exp_b), "ok")
    assert got[7] == (None, None, None, None, None, "corrupt")


def test_jpeg_pixel_stats_query_hostile_ids_vs_oracle(spark, tmp_path):
    """multimodal_jpeg_pixel_stats vs its closed-form oracle on NULL
    and 10-digit doc_ids, plus ids hitting every class and precedence
    branch: 0/5/15/40 (corrupt, incl. %7-class collisions), 3/10
    (REAL progressive since r13, incl. the %5 collision at 10 — the
    %7==3 branch wins), 18/51 (needs_codec lossless via %11==7),
    12/26 (grayscale), 8/22 (4:2:0), 2/4/6/11/13 (4:4:4 incl.
    multi-MCU geometries)."""
    import duckdb

    from social_and_media_data_ingestion_spark.plans.queries import registry
    from social_and_media_data_ingestion_spark.plans.queries_ext5 import (
        multimodal_jpeg_pixel_stats,
    )

    ids = (0, 2, 3, 4, 5, 6, 8, 10, 11, 12, 13, 15, 18, 22, 26, 40, 51,
           9999999999)
    rows = [(i, "s", "x") for i in ids]
    rows.append((None, "s", "x"))
    spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = (
        multimodal_jpeg_pixel_stats(spark, str(tmp_path))
        .toPandas()
        .sort_values("media_id", na_position="last")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    want = (
        con.execute(registry()["multimodal_jpeg_pixel_stats"].oracle)
        .fetchdf()
        .sort_values("media_id", na_position="last")
        .reset_index(drop=True)
    )
    assert got.astype(str).equals(want.astype(str))
    by_id = {r.media_id: r.status for _, r in got.iterrows()}
    assert by_id[12] == "ok" and by_id[8] == "ok" and by_id[2] == "ok"
    assert by_id[3] == "ok" and by_id[10] == "ok"  # progressive (r13)
    assert by_id[18] == "needs_codec" and by_id[51] == "needs_codec"
    assert by_id[40] == "corrupt"


def test_decode_jpeg_table_and_header_edges():
    """Pure-decoder edges the encoder roundtrips never construct: a
    16-bit-precision DQT (pq=1), a DHT whose counts over-subscribe the
    code space, an SOS naming a component the frame lacks, a scan
    selecting Huffman tables never defined, and a 2-component frame —
    every one a loud ValueError, never a wrong decode."""
    import struct

    from social_and_media_data_ingestion_spark.operators.multimodal import (
        decode_jpeg,
    )

    base = _jpeg_dc_bytes(4, 4, 40, -35, -40)

    # pq=1 (16-bit) DQT parses: rebuild the fixture's DQT with 16-bit
    # entries of the same value 8 — decode must agree with the 8-bit one
    dqt8 = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([8] * 64)
    dqt16 = (
        b"\xff\xdb" + struct.pack(">H", 131) + b"\x10"
        + struct.pack(">H", 8) * 64
    )
    assert dqt8 in base
    w, h, nch, s = decode_jpeg(base.replace(dqt8, dqt16))
    assert (w, h, nch) == (4, 4, 3)
    assert s == decode_jpeg(base)[3]

    # counts over-subscribe the code space: 3 codes of length 1
    bad_dht = b"\xff\xc4" + struct.pack(">H", 22) + b"\x00" + bytes(
        [3] + [0] * 15
    ) + bytes([0, 1, 2])
    good_dc = b"\xff\xc4" + struct.pack(">H", 21) + b"\x00" + bytes(
        [0, 1, 0, 1] + [0] * 12
    ) + bytes([0x00, 0x06])
    assert good_dc in base
    with pytest.raises(ValueError):
        decode_jpeg(base.replace(good_dc, bad_dht))

    # scan references component id 9 that the frame never declared
    sos = b"\xff\xda" + struct.pack(">H", 12) + bytes(
        [3, 1, 0, 2, 0, 3, 0, 0, 63, 0]
    )
    bad_sos = b"\xff\xda" + struct.pack(">H", 12) + bytes(
        [3, 9, 0, 2, 0, 3, 0, 0, 63, 0]
    )
    assert sos in base
    with pytest.raises(ValueError):
        decode_jpeg(base.replace(sos, bad_sos))

    # scan selects AC table 3, never defined
    bad_sel = b"\xff\xda" + struct.pack(">H", 12) + bytes(
        [3, 1, 3, 2, 0, 3, 0, 0, 63, 0]
    )
    with pytest.raises(ValueError):
        decode_jpeg(base.replace(sos, bad_sel))

    # 2-component frames are not a JPEG thing this decoder accepts
    sof3 = b"\xff\xc0" + struct.pack(">H", 17) + bytes([8]) + struct.pack(
        ">HH", 4, 4
    ) + bytes([3, 1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0])
    sof2c = b"\xff\xc0" + struct.pack(">H", 14) + bytes([8]) + struct.pack(
        ">HH", 4, 4
    ) + bytes([2, 1, 0x11, 0, 2, 0x11, 0])
    assert sof3 in base
    with pytest.raises(ValueError):
        decode_jpeg(base.replace(sof3, sof2c))
