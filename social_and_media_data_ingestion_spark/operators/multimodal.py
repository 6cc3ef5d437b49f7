"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Design for 100 TB of media:
- payload is an opaque `binary` column; metadata is a typed struct column
  (never re-derived by decoding twice);
- decode / feature-extract / resize / frame-sample run as Arrow-batched
  pandas functions inside `mapInPandas` — one Python boundary, whole
  batches per crossing;
- partitioning: media rows are heavy, so operators preserve the incoming
  partitioning and never shuffle; repartition by size upstream if batches
  overflow Arrow limits (`spark.sql.execution.arrow.maxRecordsPerBatch`).

The real codec libraries (PIL / torchaudio / pyav) are NOT in this
container (re-probed every round), so the image/video decoders are STUBS
that raise NotImplementedError with a clear message; every operator also
ships a deterministic fake (`fake=True`, the default) so the Spark-side
plumbing — schema, UDF signature, batch shape, metadata contract — is
real and tested end-to-end. Two REAL paths need no codec library at all
and are fully implemented: magic-byte format sniffing (native prefix
expressions) and RIFF/WAVE PCM audio decode (`decode_wav_pcm`, stdlib
`wave` — `chunk_audio(fake=False)` chunks real WAV samples).
"""

from __future__ import annotations

from array import array
from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("kind", T.StringType()),       # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
    ]
)

IMAGE_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("frame_offset_ms", T.IntegerType()),
    ]
)

_STUB_MSG = (
    "real {what} decoding requires {lib}, which is not installed in this "
    "environment; use fake=True for the deterministic stand-in"
)


def attach_meta(df: DataFrame, payload_col: str, kind: str, mime: str) -> DataFrame:
    """Stamp the typed metadata struct for an opaque payload column."""
    return df.withColumn(
        "meta",
        F.struct(
            F.lit(kind).alias("kind"),
            F.lit(mime).alias("mime"),
            F.length(F.col(payload_col)).cast("long").alias("n_bytes"),
        ),
    )


# Real container magic numbers (public file-format signatures), hex
# uppercase as both Spark's and DuckDB's hex() emit them. RIFF/WAVE is
# handled separately (two windows: 'RIFF' at byte 1, 'WAVE' at byte 9).
MAGIC_MIMES = [
    ("FFD8FF", "image/jpeg"),  # JPEG SOI marker
    ("89504E47", "image/png"),  # \x89 P N G
    ("474946383761", "image/gif"),  # GIF87a
    ("474946383961", "image/gif"),  # GIF89a
    ("49492A00", "image/tiff"),  # II little-endian TIFF (r11)
    ("4D4D002A", "image/tiff"),  # MM big-endian TIFF (r11)
]
_RIFF_HEX, _WAVE_HEX, _WAV_MIME = "52494646", "57415645", "audio/x-wav"
UNKNOWN_MIME = "application/octet-stream"


def sniff_format(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Append `detected_mime` from the payload's leading MAGIC BYTES —
    the only format check that scales to 100 TB of media, because it
    reads a fixed-size prefix with native JVM expressions (hex of a
    bounded substring; zero Python, zero decode, zero shuffle) instead
    of handing every payload to a codec. Declared-vs-detected mismatch
    is the standard corrupt-upload / mislabeled-extension audit.
    Unknown signatures fall through to application/octet-stream."""
    p = F.col(payload_col)

    def _prefix(nbytes: int) -> "F.Column":
        return F.hex(F.substring(p, 1, nbytes))

    expr = F.when(
        (_prefix(4) == _RIFF_HEX)
        & (F.hex(F.substring(p, 9, 4)) == _WAVE_HEX),
        F.lit(_WAV_MIME),
    ).when(
        # RIFF container again, WEBP form type (r10)
        (_prefix(4) == _RIFF_HEX)
        & (F.hex(F.substring(p, 9, 4)) == "57454250"),
        F.lit("image/webp"),
    )
    for sig, mime in MAGIC_MIMES:
        expr = expr.when(_prefix(len(sig) // 2) == sig, F.lit(mime))
    return df.withColumn("detected_mime", expr.otherwise(F.lit(UNKNOWN_MIME)))


def sniff_image_dims(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Append (`dim_format`, `width`, `height`) parsed from the image
    HEADER with native JVM expressions — zero Python, zero codec, zero
    shuffle, exactly the sniff_format scaling story but one level
    deeper than the magic bytes:

    - PNG: the IHDR chunk is mandated first, so width/height are
      big-endian int32 at fixed offsets 17/21 (1-based) — two
      `conv(hex(substring(...)))` reads.
    - BMP: BITMAPINFOHEADER carries LITTLE-endian SIGNED int32 at
      offsets 19/23 — bytes are reassembled arithmetically (hex() is
      big-endian) and a negative height (top-down row order) maps to
      abs(), the convention every raster library applies.
    - GIF: the logical-screen descriptor directly follows the 6-byte
      signature — width/height as little-endian uint16 at offsets 7/9.
    - WebP: RIFF..WEBP, then the first chunk's fourcc picks one of
      three fixed layouts — VP8X extended (24-bit LE canvas−1), VP8
      lossy (14-bit dims in LE uint16s behind the 9D012A start code),
      VP8L lossless (14+14 bits packed in one LE uint32 after the 2F
      signature).
    - JPEG: dimensions live in the SOF segment at a VARIABLE offset
      behind any number of APPn/DQT/COM segments, so a fixed-offset
      read cannot work — the marker chain is walked with a bounded
      `aggregate(sequence(1, 24), ...)` fold: each step either stops at
      an SOF marker (C0-CF minus DHT/JPG/DAC; height then width as
      big-endian uint16 at +5/+7), hops `2 + segment_length`, or
      poisons the offset on a malformed/truncated chain. 24 hops cover
      any sane header (EXIF+ICC+DQT+DHT stacks run ~10); a deeper
      chain degrades to NULL dims, never a wrong read.
    - TIFF (r11): dims live in IFD0 entries (tag 256 ImageWidth /
      257 ImageLength) at a position the header only points to, in
      EITHER byte order (II little / MM big) — a bounded fold over the
      first 16 IFD entries reads tag/type/count per 12-byte entry and
      takes inline SHORT(3)/LONG(4) values with count 1 (a count > 1
      means the value field is an offset, which a header-only sniff
      must not chase). Tags are spec-ordered ascending, so 256/257
      land in the first few entries of any sane file; deeper or
      indirect layouts degrade to NULL dims, never a wrong read.

    Unknown signatures, truncated headers, and NULL payloads all yield
    NULL dims with NULL `dim_format` — the row survives, the failure is
    visible (the decode contract shared with the fake decoder)."""
    p = payload_col
    d = F.col("_dims")

    def _be(pos: str, n: int) -> str:
        # try_cast, not cast: a garbage header can declare a dimension
        # past int32 (e.g. PNG width FFFFFFFF) and ANSI cast would kill
        # the job — absurd dims degrade to NULL like any other corrupt
        # header (found by the hypothesis fuzz over arbitrary payloads)
        return f"try_cast(conv(hex(substring({p}, {pos}, {n})), 16, 10) as int)"

    def _le32(pos: int) -> str:
        b = [f"conv(hex(substring({p}, {pos + i}, 1)), 16, 10)" for i in range(4)]
        raw = f"({b[0]} + {b[1]}*256 + {b[2]}*65536 + {b[3]}*16777216)"
        return (
            f"cast(CASE WHEN {raw} >= 2147483648 THEN {raw} - 4294967296 "
            f"ELSE {raw} END as bigint)"
        )

    sof = "(192,193,194,195,197,198,199,201,202,203,205,206,207)"
    # the byte after 0xFF may itself be 0xFF: the JPEG spec permits any
    # number of 0xFF fill bytes before a marker id, so a fill byte
    # advances one position and costs one hop instead of being read as
    # a marker with a bogus length (round-11 advice fix — real encoders
    # do emit padding; a pathological run of >20 fill bytes degrades to
    # NULL dims, never a wrong read)
    jwalk = f"""aggregate(
      sequence(1, 24),
      named_struct('off', 3, 'w', cast(null as int), 'h', cast(null as int)),
      (s, i) -> CASE
        WHEN s.w IS NOT NULL OR s.off IS NULL THEN s
        WHEN {_be('s.off', 1)} <> 255
          THEN named_struct('off', cast(null as int), 'w', s.w, 'h', s.h)
        WHEN {_be('s.off + 1', 1)} = 255
          THEN named_struct('off', s.off + 1, 'w', s.w, 'h', s.h)
        WHEN {_be('s.off + 1', 1)} IN {sof}
          THEN named_struct('off', s.off,
                 'w', {_be('s.off + 7', 2)}, 'h', {_be('s.off + 5', 2)})
        ELSE named_struct('off', s.off + 2 + {_be('s.off + 2', 2)},
                          'w', s.w, 'h', s.h)
      END,
      s -> named_struct('w', s.w, 'h', s.h))"""
    def _le16(pos: int) -> str:
        return (
            f"try_cast(conv(hex(substring({p}, {pos + 1}, 1)), 16, 10) * 256 "
            f"+ conv(hex(substring({p}, {pos}, 1)), 16, 10) as int)"
        )

    def _leu(pos: int, n: int) -> str:  # little-endian UNSIGNED n-byte int
        terms = " + ".join(
            f"conv(hex(substring({p}, {pos + i}, 1)), 16, 10) * {256 ** i}"
            for i in range(n)
        )
        return f"cast({terms} as bigint)"

    # WebP (r10): RIFF..WEBP, then ONE of three first-chunk layouts —
    # VP8X (extended): 24-bit LE canvas-minus-one at payload +4/+7;
    # VP8 (lossy): after the 9D012A start code, 14-bit dims in LE
    # uint16s; VP8L (lossless): 14+14 bits packed into a LE uint32
    # after the 2F signature. All fixed offsets once the fourcc is
    # known — no walk needed. Dims gated >= 1 (a garbage 0 is NULL).
    def _ok(expr_: str) -> str:
        return f"try_cast(CASE WHEN {expr_} >= 1 THEN {expr_} END as int)"

    webp = f"""CASE hex(substring({p}, 13, 4))
      WHEN '56503858' THEN named_struct(
        'w', {_ok(f"{_leu(25, 3)} + 1")}, 'h', {_ok(f"{_leu(28, 3)} + 1")})
      WHEN '56503820' THEN CASE WHEN hex(substring({p}, 24, 3)) = '9D012A'
        THEN named_struct('w', {_ok(f"{_leu(27, 2)} % 16384")},
                          'h', {_ok(f"{_leu(29, 2)} % 16384")})
        ELSE named_struct('w', cast(null as int), 'h', cast(null as int)) END
      WHEN '5650384C' THEN CASE WHEN hex(substring({p}, 21, 1)) = '2F'
        THEN named_struct('w', {_ok(f"{_leu(22, 4)} % 16384 + 1")},
                          'h', {_ok(f"({_leu(22, 4)} div 16384) % 16384 + 1")})
        ELSE named_struct('w', cast(null as int), 'h', cast(null as int)) END
      ELSE named_struct('w', cast(null as int), 'h', cast(null as int))
    END"""

    # TIFF (r11): IFD0 walk in both byte orders. Readers take a 1-based
    # POSITION EXPRESSION so the same helpers read at the dynamic
    # offsets the header declares; truncated reads conv('') -> NULL and
    # propagate to NULL dims through the fold's ELSE branch.
    def _led(pos: str, n: int) -> str:  # little-endian uint at dynamic pos
        terms = " + ".join(
            f"conv(hex(substring({p}, ({pos}) + {i}, 1)), 16, 10) * {256 ** i}"
            for i in range(n)
        )
        return f"try_cast({terms} as int)"

    def _tiff_walk(u16, u32, le: bool) -> str:
        # entries start at ifd+3 (1-based: 4-byte magic, 4-byte IFD
        # offset at 5, 2-byte entry count at ifd+1); 12 bytes each.
        # Per-entry cost is the scaling story here: a first cut that
        # re-read tag/type/count/value as separate binary substrings
        # inside the fold ran TIFF rows ~50x slower than PNG rows
        # (measured r11, 5M-row A/B). This shape reads each entry's
        # 12 bytes ONCE as a hex string (positions generated directly
        # by sequence(start, stop, 12), bounded by the real entry
        # count) and slices tag/type/count/value out of the 24 hex
        # chars with cheap string ops. A payload cut mid-entry hexes
        # the final entry to < 24 chars and its slices would concat
        # into smaller-but-plausible values (a height tag before a
        # truncated width tag read width=1 — r12 advice fix), so the
        # fold skips any entry shorter than the full 24 hex chars.
        def hx16(b: int) -> str:  # uint16 at byte offset b of the entry
            if le:
                return (
                    f"conv(concat(substr(e, {2 * b + 3}, 2), "
                    f"substr(e, {2 * b + 1}, 2)), 16, 10)"
                )
            return f"conv(substr(e, {2 * b + 1}, 4), 16, 10)"

        def hx32(b: int) -> str:  # uint32 at byte offset b of the entry
            if le:
                return (
                    f"conv(concat(substr(e, {2 * b + 7}, 2), "
                    f"substr(e, {2 * b + 5}, 2), substr(e, {2 * b + 3}, 2), "
                    f"substr(e, {2 * b + 1}, 2)), 16, 10)"
                )
            return f"conv(substr(e, {2 * b + 1}, 8), 16, 10)"

        val = (
            f"try_cast(CASE WHEN {hx32(4)} = 1 AND {hx16(2)} = 3 "
            f"THEN {hx16(8)} WHEN {hx32(4)} = 1 AND {hx16(2)} = 4 "
            f"THEN {hx32(8)} END as int)"
        )
        ifd0 = u32("5")
        n0 = u16(f"({ifd0}) + 1")
        first = f"(({ifd0}) + 3)"
        return f"""aggregate(
          CASE WHEN ({n0}) >= 1 THEN transform(
            sequence({first}, {first} + 12 * (least(16, {n0}) - 1), 12),
            pos -> hex(substring({p}, pos, 12))) END,
          named_struct('w', cast(null as int), 'h', cast(null as int)),
          (s, e) -> CASE
            WHEN length(e) < 24 THEN s
            WHEN {hx16(0)} = 256 THEN named_struct('w', {val}, 'h', s.h)
            WHEN {hx16(0)} = 257 THEN named_struct('w', s.w, 'h', {val})
            ELSE s END,
          s -> s)"""

    tiff_ii = _tiff_walk(
        lambda pos: _led(pos, 2), lambda pos: _led(pos, 4), le=True
    )
    tiff_mm = _tiff_walk(
        lambda pos: _be(pos, 2), lambda pos: _be(pos, 4), le=False
    )

    nulls = "named_struct('w', cast(null as int), 'h', cast(null as int))"
    dims = (
        f"CASE WHEN hex(substring({p}, 1, 8)) = '89504E470D0A1A0A' "
        f"THEN named_struct('w', {_be('17', 4)}, 'h', {_be('21', 4)}) "
        f"WHEN hex(substring({p}, 1, 3)) = 'FFD8FF' THEN {jwalk} "
        f"WHEN hex(substring({p}, 1, 6)) IN ('474946383761', '474946383961') "
        f"THEN named_struct('w', {_le16(7)}, 'h', {_le16(9)}) "
        f"WHEN hex(substring({p}, 1, 4)) = '52494646' "
        f"AND hex(substring({p}, 9, 4)) = '57454250' THEN {webp} "
        f"WHEN hex(substring({p}, 1, 4)) = '49492A00' THEN {tiff_ii} "
        f"WHEN hex(substring({p}, 1, 4)) = '4D4D002A' THEN {tiff_mm} "
        # BMP dims are SIGNED: only height may legally be negative
        # (top-down storage, abs() below); a non-positive width or a
        # zero height is a malformed header -> NULL, never a negative
        # dimension leaking out (hypothesis fuzz, r10)
        f"WHEN hex(substring({p}, 1, 2)) = '424D' "
        f"THEN named_struct("
        f"'w', try_cast(CASE WHEN {_le32(19)} >= 1 THEN {_le32(19)} END as int), "
        f"'h', try_cast(CASE WHEN abs({_le32(23)}) >= 1 "
        f"THEN abs({_le32(23)}) END as int)) "
        f"ELSE {nulls} END"
    )
    fmt = (
        F.when(F.hex(F.substring(F.col(p), 1, 8)) == "89504E470D0A1A0A", "png")
        .when(F.hex(F.substring(F.col(p), 1, 3)) == "FFD8FF", "jpeg")
        .when(
            F.hex(F.substring(F.col(p), 1, 6)).isin(
                "474946383761", "474946383961"
            ),
            "gif",
        )
        .when(
            (F.hex(F.substring(F.col(p), 1, 4)) == "52494646")
            & (F.hex(F.substring(F.col(p), 9, 4)) == "57454250"),
            "webp",
        )
        .when(
            F.hex(F.substring(F.col(p), 1, 4)).isin("49492A00", "4D4D002A"),
            "tiff",
        )
        .when(F.hex(F.substring(F.col(p), 1, 2)) == "424D", "bmp")
    )
    # both dims must parse AND both must be >= 1, uniformly across
    # formats — a header truncated between the width and height fields
    # (or a declared zero dimension in formats whose branch lacks an
    # inline gate, e.g. PNG/GIF/JPEG) yields NULL width AND height AND
    # dim_format, honoring the docstring contract (round-11 advice fix)
    ok = d["w"].isNotNull() & d["h"].isNotNull() & (d["w"] >= 1) & (d["h"] >= 1)
    return (
        df.withColumn("_dims", F.expr(dims))
        .withColumn("dim_format", F.when(ok, fmt))
        .withColumn("width", F.when(ok, d["w"]))
        .withColumn("height", F.when(ok, d["h"]))
        .drop("_dims")
    )


def decode_ppm(p: bytes) -> tuple[int, int, int, list[int]]:
    """(width, height, channels, flat samples) from binary PPM (P6,
    RGB) / PGM (P5, grayscale) bytes — a REAL pixel decode with ZERO
    third-party dependencies, the image sibling of `decode_wav_pcm`.
    Netpbm headers are whitespace/comment-delimited ASCII tokens; only
    maxval <= 255 (1 byte/sample) is supported — 2-byte-maxval files
    need a real codec library. Raises ValueError on any malformation
    so callers route hostile rows like undecodable WAVs."""
    if p[:2] not in (b"P6", b"P5"):
        raise ValueError(f"not a binary PPM/PGM payload: {p[:2]!r}")
    nch = 3 if p[:2] == b"P6" else 1
    toks: list[int] = []
    i = 2
    while len(toks) < 3:
        while i < len(p) and p[i : i + 1].isspace():
            i += 1
        if i < len(p) and p[i : i + 1] == b"#":  # comment to end of line
            while i < len(p) and p[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(p) and not p[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated PPM header")
        toks.append(int(p[i:j]))
        i = j
    w, h, maxval = toks
    if w < 1 or h < 1 or not (0 < maxval <= 255):
        raise ValueError(f"unsupported PPM geometry {w}x{h} maxval={maxval}")
    i += 1  # exactly ONE whitespace byte separates header from raster
    need = w * h * nch
    raster = p[i : i + need]
    if len(raster) < need:
        raise ValueError(f"truncated PPM raster: {len(raster)} < {need}")
    return w, h, nch, list(raster)


def decode_png(p: bytes) -> tuple[int, int, int, list[int]]:
    """(width, height, channels, flat top-down samples) from a PNG —
    a REAL pixel decode with ZERO third-party dependencies: IDAT is a
    zlib stream of per-scanline-filtered rows, `zlib` is stdlib, and
    filters 0-4 (None/Sub/Up/Average/Paeth) are ~30 lines. Covers the
    FULL spec surface (r13): gray / RGB / RGBA / gray+alpha at 8-bit,
    PALETTE color at bit depths 1/2/4/8 (the web's second-most-common
    PNG layout was a 'corrupt' mislabel through r12), 1/2/4-bit
    grayscale (samples rescaled by the spec's 255/(2^depth-1)
    max-intensity mapping), 16-bit samples (reduced to 8 bits via the
    spec's round(v*255/65535) — the high byte ±1), and ADAM7
    interlacing: each of the seven passes is an independently
    filtered sub-image (filters reference the previous row OF THE
    SAME PASS; empty passes contribute no bytes at all), whose pixels
    scatter home through the (x0, y0, dx, dy) grid. Palette images
    decode to RGB; a tRNS chunk (palette transparency) is ignored —
    transparent pixels contribute their palette color.

    Deliberately LENIENT where strictness buys nothing at crawl scale:
    chunk CRC32s and the zlib adler32 are not verified (the stream is
    inflated raw via `decompressobj(wbits=-15)` after the 2-byte zlib
    header), so a bit-rotted-but-parseable file still yields pixels.
    Deliberately STRICT where a hostile header could hurt a worker: a
    declared geometry past 2^24 pixels raises before any allocation
    (the IDAT stream is also inflated with max_length, so a zip-bomb
    IDAT cannot expand past the declared raster)."""
    import struct as _struct
    import zlib as _zlib

    if p[:8] != b"\x89PNG\r\n\x1a\n" or len(p) < 33:
        raise ValueError("not a PNG payload")
    (ihdr_len,) = _struct.unpack_from(">I", p, 8)
    if p[12:16] != b"IHDR" or ihdr_len != 13:
        raise ValueError("missing IHDR")
    w, h, depth, ctype, comp, filt, interlace = _struct.unpack_from(
        ">IIBBBBB", p, 16
    )
    if w < 1 or h < 1 or w * h > 1 << 24:
        raise ValueError(f"bad PNG geometry {w}x{h}")
    if comp != 0 or filt != 0:
        raise ValueError(
            f"bad PNG compression/filter method {comp}/{filt}"
        )
    if interlace not in (0, 1):
        raise ValueError(f"bad PNG interlace method {interlace}")
    # samples per pixel and legal depths per color type (the spec's
    # table 11.1)
    spec = {0: (1, (1, 2, 4, 8, 16)), 2: (3, (8, 16)),
            3: (1, (1, 2, 4, 8)), 4: (2, (8, 16)), 6: (4, (8, 16))}
    if ctype not in spec or depth not in spec[ctype][1]:
        raise ValueError(
            f"bad PNG depth/color-type combination "
            f"(depth {depth}, color type {ctype})"
        )
    nch_raw = spec[ctype][0]
    idat = bytearray()
    plte: bytes | None = None
    off = 33  # first chunk after IHDR(13) + its CRC
    while off + 8 <= len(p):
        (ln,) = _struct.unpack_from(">I", p, off)
        tag = p[off + 4 : off + 8]
        if tag == b"IEND":
            break
        if tag == b"IDAT":
            seg = p[off + 8 : off + 8 + ln]
            if len(seg) < ln:
                raise ValueError("truncated IDAT chunk")
            idat += seg
        elif tag == b"PLTE":
            plte = p[off + 8 : off + 8 + ln]
            if len(plte) < ln or ln % 3 or not 3 <= ln <= 768:
                raise ValueError("bad PLTE chunk")
        off += 12 + ln
    if ctype == 3 and plte is None:
        raise ValueError("palette PNG without PLTE")
    if len(idat) < 3:
        raise ValueError("no IDAT data")
    if idat[0] & 0x0F != 8:
        raise ValueError("bad zlib header in IDAT")
    # one (x0, y0, dx, dy) pass for sequential files, the spec's seven
    # for Adam7; each pass is an independently filtered sub-image
    passes = (
        [(0, 0, 1, 1)]
        if interlace == 0
        else [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
    )
    geo = []  # (x0, y0, dx, dy, wp, hp, stride) for non-empty passes
    need = 0
    for x0, y0, dx, dy in passes:
        wp = (w - x0 + dx - 1) // dx
        hp = (h - y0 + dy - 1) // dy
        if wp <= 0 or hp <= 0:
            continue  # empty pass: not even filter bytes
        stride = (wp * depth * nch_raw + 7) // 8
        geo.append((x0, y0, dx, dy, wp, hp, stride))
        need += (stride + 1) * hp
    bpp = max(1, (depth * nch_raw) // 8)
    try:
        raw = _zlib.decompressobj(wbits=-15).decompress(bytes(idat[2:]), need)
    except _zlib.error as exc:
        raise ValueError(f"bad IDAT stream: {exc}") from None
    if len(raw) < need:
        raise ValueError(f"truncated PNG raster: {len(raw)} < {need}")
    vals = [0] * (w * h * nch_raw)  # 8-bit samples, pixel-interleaved
    mask = (1 << depth) - 1
    off = 0
    for x0, y0, dx, dy, wp, hp, stride in geo:
        out = bytearray(stride * hp)
        zero = bytes(stride)
        for r in range(hp):
            base = off + r * (stride + 1)
            ft = raw[base]
            row = bytearray(raw[base + 1 : base + 1 + stride])
            prev = bytes(out[(r - 1) * stride : r * stride]) if r else zero
            if ft == 0:
                pass
            elif ft == 1:  # Sub: left neighbour, bpp bytes back
                for i in range(bpp, stride):
                    row[i] = (row[i] + row[i - bpp]) & 0xFF
            elif ft == 2:  # Up
                for i in range(stride):
                    row[i] = (row[i] + prev[i]) & 0xFF
            elif ft == 3:  # Average: floor((left + up) / 2)
                for i in range(stride):
                    a = row[i - bpp] if i >= bpp else 0
                    row[i] = (row[i] + (a + prev[i]) // 2) & 0xFF
            elif ft == 4:  # Paeth predictor
                for i in range(stride):
                    a = row[i - bpp] if i >= bpp else 0
                    b = prev[i]
                    c = prev[i - bpp] if i >= bpp else 0
                    pa = abs(b - c)
                    pb = abs(a - c)
                    pc = abs(a + b - 2 * c)
                    pred = (
                        a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                    )
                    row[i] = (row[i] + pred) & 0xFF
            else:
                raise ValueError(f"bad PNG filter type {ft} on row {r}")
            out[r * stride : (r + 1) * stride] = row
        off += (stride + 1) * hp
        # scatter this pass's samples home (the sequential single pass
        # is the identity scatter)
        if interlace == 0 and depth == 8:
            vals = list(out)
            break
        for r in range(hp):
            rowb = out[r * stride : (r + 1) * stride]
            y = y0 + r * dy
            if depth == 8:
                for i in range(wp):
                    px = (y * w + x0 + i * dx) * nch_raw
                    for c in range(nch_raw):
                        vals[px + c] = rowb[i * nch_raw + c]
            elif depth == 16:
                # spec 16->8 reduction: round(v * 255 / 65535)
                for i in range(wp):
                    px = (y * w + x0 + i * dx) * nch_raw
                    for c in range(nch_raw):
                        j = (i * nch_raw + c) * 2
                        v16 = (rowb[j] << 8) | rowb[j + 1]
                        vals[px + c] = (v16 * 255 + 32767) // 65535
            else:
                per_byte = 8 // depth
                for i in range(wp):
                    byte_i, slot = divmod(i, per_byte)
                    vals[y * w + x0 + i * dx] = (
                        rowb[byte_i] >> ((per_byte - 1 - slot) * depth)
                    ) & mask
    if depth in (8, 16) and ctype != 3:
        return w, h, nch_raw, vals
    if ctype == 0:
        scale = 255 // ((1 << depth) - 1)
        return w, h, 1, [v * scale for v in vals]
    ncolors = len(plte) // 3
    samples: list[int] = []
    for v in vals:
        if v >= ncolors:
            raise ValueError(
                f"palette index {v} outside {ncolors}-entry PLTE"
            )
        samples.extend(plte[3 * v : 3 * v + 3])
    return w, h, 3, samples


def decode_bmp(p: bytes) -> tuple[int, int, int, list[int]]:
    """(width, height, channels, flat BGR->RGB samples in top-down row
    order) from a BITMAPINFOHEADER BMP. Pure stdlib `struct` parsing:
    rows are 4-byte aligned and stored bottom-up unless height is
    negative (top-down); both normalize to top-down RGB here. Covers
    (r13, previously 24-bit-only with everything else a 'corrupt'
    mislabel): 24- and 32-bit BI_RGB (the X byte ignored), 16-bit
    BI_RGB (XRGB555, channels rescaled by 255/31), PALETTE images at
    1/4/8 bpp (BGRX color table, MSB-first sub-byte indices), and
    RLE8 runs (encoded, absolute with word padding, EOL / delta /
    EOS; untouched pixels default to palette 0, the de-facto
    behavior). BI_BITFIELDS / RLE4 / embedded JPEG-PNG raise
    NotImplementedError -> 'needs_codec'; malformed files (truncated
    raster or palette, RLE escaping the grid, top-down RLE, palette
    index past the table) raise ValueError -> 'corrupt'."""
    import struct as _struct

    if p[:2] != b"BM" or len(p) < 54:
        raise ValueError("not a BMP payload")
    (data_off,) = _struct.unpack_from("<I", p, 10)
    hdr_size, w, h_raw = _struct.unpack_from("<Iii", p, 14)
    planes, bpp, compression = _struct.unpack_from("<HHI", p, 26)
    (clr_used,) = _struct.unpack_from("<I", p, 46)
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    if compression in (3, 6):
        raise NotImplementedError("BI_BITFIELDS BMP needs a codec library")
    if compression == 2:
        raise NotImplementedError("RLE4 BMP needs a codec library")
    if compression in (4, 5):
        raise NotImplementedError(
            "BMP with embedded JPEG/PNG needs a codec library"
        )
    if compression not in (0, 1):
        raise ValueError(f"bad BMP compression {compression}")
    if compression == 1 and bpp != 8:
        raise ValueError(f"RLE8 with {bpp} bpp")
    if bpp not in (1, 4, 8, 16, 24, 32):
        raise ValueError(f"bad BMP bit depth {bpp}")
    if w < 1 or h_raw == 0 or w * abs(h_raw) > 1 << 24:
        raise ValueError(f"bad BMP geometry {w}x{h_raw}")
    h = abs(h_raw)
    palette: list[tuple[int, int, int]] | None = None
    if bpp <= 8:
        ncol = clr_used or (1 << bpp)
        pal_off = 14 + hdr_size
        if ncol > 1 << bpp or pal_off + 4 * ncol > min(len(p), data_off):
            raise ValueError("truncated BMP palette")
        palette = [
            (p[pal_off + 4 * i + 2], p[pal_off + 4 * i + 1],
             p[pal_off + 4 * i])
            for i in range(ncol)
        ]
    samples: list[int] = []
    if compression == 1:
        # RLE8: decoded into the bottom-up index grid
        if h_raw < 0:
            raise ValueError("top-down RLE BMP is not spec-legal")
        idx = [0] * (w * h)
        x = y = 0
        i = data_off
        while True:
            if i + 2 > len(p):
                raise ValueError("truncated BMP RLE stream")
            a, b = p[i], p[i + 1]
            i += 2
            if a > 0:  # encoded run
                if y >= h or x + a > w:
                    raise ValueError("BMP RLE run escapes the pixel grid")
                for k in range(a):
                    idx[y * w + x + k] = b
                x += a
            elif b == 0:  # end of line
                x, y = 0, y + 1
            elif b == 1:  # end of stream
                break
            elif b == 2:  # delta
                if i + 2 > len(p):
                    raise ValueError("truncated BMP RLE delta")
                x += p[i]
                y += p[i + 1]
                i += 2
                if x > w or y > h:
                    raise ValueError("BMP RLE delta escapes the pixel grid")
            else:  # absolute mode: b literal indices, word-padded
                if y >= h or x + b > w or i + b > len(p):
                    raise ValueError("BMP RLE absolute run escapes the grid")
                for k in range(b):
                    idx[y * w + x + k] = p[i + k]
                x += b
                i += b + (b & 1)
        ncolors = len(palette)
        for r in range(h - 1, -1, -1):
            for v in idx[r * w : (r + 1) * w]:
                if v >= ncolors:
                    raise ValueError(
                        f"BMP palette index {v} outside {ncolors} entries"
                    )
                samples.extend(palette[v])
        return w, h, 3, samples
    stride = (w * bpp + 31) // 32 * 4
    if len(p) < data_off + stride * h:
        raise ValueError("truncated BMP raster")
    rows = range(h) if h_raw < 0 else range(h - 1, -1, -1)
    for r in rows:
        base = data_off + r * stride
        if bpp == 24:
            for c in range(w):
                b, g, rr = p[base + 3 * c : base + 3 * c + 3]
                samples.extend((rr, g, b))
        elif bpp == 32:
            for c in range(w):
                b, g, rr = p[base + 4 * c : base + 4 * c + 3]
                samples.extend((rr, g, b))
        elif bpp == 16:  # BI_RGB 16-bit is XRGB555
            for c in range(w):
                (v,) = _struct.unpack_from("<H", p, base + 2 * c)
                samples.extend((
                    (v >> 10 & 31) * 255 // 31,
                    (v >> 5 & 31) * 255 // 31,
                    (v & 31) * 255 // 31,
                ))
        else:  # 1 / 4 / 8 bpp palette, MSB-first within each byte
            per_byte = 8 // bpp
            mask = (1 << bpp) - 1
            ncolors = len(palette)
            for c in range(w):
                byte_i, slot = divmod(c, per_byte)
                v = (p[base + byte_i] >> ((per_byte - 1 - slot) * bpp)) & mask
                if v >= ncolors:
                    raise ValueError(
                        f"BMP palette index {v} outside {ncolors} entries"
                    )
                samples.extend(palette[v])
    return w, h, 3, samples


def _lzw_decode(mcs: int, stream: bytes, npix: int) -> list[int]:
    """GIF-flavour LZW decode (LSB-first variable-width codes, clear /
    end codes, 12-bit cap, KwKwK case) of an unwrapped code stream.
    Pure Python — the dictionary is index lists, never strings — and
    bounded: decoding stops at `npix` output pixels, so a hostile
    stream cannot expand past the declared raster (the PNG max_length
    precedent). Raises ValueError on truncation or an out-of-range
    code so callers route hostile rows like undecodable PNGs."""
    if not 2 <= mcs <= 11:
        raise ValueError(f"bad LZW min code size {mcs}")
    clear, end = 1 << mcs, (1 << mcs) + 1
    width = mcs + 1
    table: list[list[int] | None] = [[i] for i in range(clear)] + [None, None]
    out: list[int] = []
    prev: list[int] | None = None
    bitbuf = bits = pos = 0
    while len(out) < npix:
        while bits < width:
            if pos >= len(stream):
                raise ValueError("truncated LZW stream")
            bitbuf |= stream[pos] << bits
            bits += 8
            pos += 1
        code = bitbuf & ((1 << width) - 1)
        bitbuf >>= width
        bits -= width
        if code == clear:
            del table[clear + 2 :]
            width = mcs + 1
            prev = None
            continue
        if code == end:
            break
        if code < len(table) and table[code] is not None:
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # KwKwK: code emitted before defined
        else:
            raise ValueError(f"LZW code {code} outside table of {len(table)}")
        out.extend(entry)
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) < npix:
        raise ValueError(f"short LZW pixel stream: {len(out)} < {npix}")
    return out[:npix]


def decode_gif(p: bytes) -> tuple[int, int, int, list[int]]:
    """(width, height, channels, flat RGB samples) of the FIRST image
    frame in a GIF87a/GIF89a payload — a REAL pixel decode with ZERO
    third-party dependencies: the container is `struct`-parsed and the
    raster is inflated by `_lzw_decode` (GIF's only compression is
    LZW, which is ~40 lines of pure Python; the `zlib`-PNG precedent,
    one codec further). Extension blocks (graphics control, comments,
    application — the animation machinery) are skipped, so animated
    GIFs yield their first frame; a local color table overrides the
    global one for the frame. Interlaced frames decode for REAL
    (r13): the LZW stream carries rows in the spec's four-pass order
    (rows 0,8,16.. then 4,12.. then 2,6,10.. then 1,3,5..), so
    de-interlacing is a pure row permutation — verified
    differentially against the non-interlaced encode of the same
    raster, with per-row sentinel colors pinning the permutation
    itself. Any pixel index
    outside the active color table, a truncated sub-block chain, or a
    frame larger than the logical screen raises ValueError so callers
    route hostile rows as 'corrupt' data, not job failures."""
    import struct as _struct

    if p[:6] not in (b"GIF87a", b"GIF89a") or len(p) < 13:
        raise ValueError("not a GIF payload")
    sw, sh, packed, _bg, _aspect = _struct.unpack_from("<HHBBB", p, 6)
    if sw < 1 or sh < 1 or sw * sh > 1 << 24:
        raise ValueError(f"bad GIF logical screen {sw}x{sh}")
    off = 13
    gct: bytes | None = None
    if packed & 0x80:
        n = 3 * (2 << (packed & 0x07))
        gct = p[off : off + n]
        if len(gct) < n:
            raise ValueError("truncated global color table")
        off += n
    while True:
        if off >= len(p):
            raise ValueError("no image descriptor before end of payload")
        tag = p[off]
        off += 1
        if tag == 0x2C:  # image descriptor
            break
        if tag == 0x21:  # extension: label byte + sub-block chain
            off += 1
            while True:
                if off >= len(p):
                    raise ValueError("truncated extension block")
                n = p[off]
                off += 1 + n
                if n == 0:
                    break
            continue
        if tag == 0x3B:
            raise ValueError("GIF trailer before any image frame")
        raise ValueError(f"unknown GIF block tag 0x{tag:02x}")
    if off + 9 > len(p):
        raise ValueError("truncated image descriptor")
    _lf, _tp, w, h, ipacked = _struct.unpack_from("<HHHHB", p, off)
    off += 9
    if w < 1 or h < 1 or w > sw or h > sh:
        raise ValueError(f"bad GIF frame geometry {w}x{h} in {sw}x{sh}")
    interlaced = bool(ipacked & 0x40)
    if ipacked & 0x80:  # local color table overrides the global one
        n = 3 * (2 << (ipacked & 0x07))
        gct = p[off : off + n]
        if len(gct) < n:
            raise ValueError("truncated local color table")
        off += n
    if not gct:
        raise ValueError("GIF frame has no color table")
    if off >= len(p):
        raise ValueError("missing LZW min code size")
    mcs = p[off]
    off += 1
    data = bytearray()
    while True:  # unwrap the length-prefixed sub-block chain
        if off >= len(p):
            raise ValueError("truncated GIF data sub-blocks")
        n = p[off]
        off += 1
        if n == 0:
            break
        seg = p[off : off + n]
        if len(seg) < n:
            raise ValueError("truncated GIF data sub-block")
        data += seg
        off += n
    idx = _lzw_decode(mcs, bytes(data), w * h)
    if interlaced:
        # the stream's rows arrive pass-by-pass; permute them home
        order = (
            list(range(0, h, 8)) + list(range(4, h, 8))
            + list(range(2, h, 4)) + list(range(1, h, 2))
        )
        deint = [0] * (w * h)
        for src, dst in enumerate(order):
            deint[dst * w : (dst + 1) * w] = idx[src * w : (src + 1) * w]
        idx = deint
    ncolors = len(gct) // 3
    samples: list[int] = []
    for i in idx:
        if i >= ncolors:
            raise ValueError(f"pixel index {i} outside {ncolors}-color table")
        samples.extend(gct[3 * i : 3 * i + 3])
    return w, h, 3, samples


# zigzag scan position k -> natural (row-major) coefficient index
_JPEG_ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
)

# natural (row-major) coefficient index -> zigzag scan position; the
# DQT parse stores quant tables in ZIGZAG order (block() indexes them
# by scan position k), so the coefficient-store finish — which holds
# coefficients in NATURAL order — maps back through this to dequantize.
_JPEG_ZZINV = tuple(
    _JPEG_ZIGZAG.index(nat) for nat in range(64)
)

_IDCT_BASIS: list[list[float]] | None = None


def _jpeg_idct_basis() -> list[list[float]]:
    """64 precomputed 8x8 IDCT basis functions (natural coefficient
    order), built once per worker. The IDCT below is SPARSE: cost is
    64 x (number of nonzero coefficients), so the DC-only blocks that
    dominate smooth regions cost 64 adds, not a dense 2-D transform —
    the shape that keeps the Python block loop honest at fixture
    scale."""
    global _IDCT_BASIS
    if _IDCT_BASIS is None:
        import math as _math

        c = [1.0 / _math.sqrt(2.0)] + [1.0] * 7
        cos = [
            [_math.cos((2 * x + 1) * u * _math.pi / 16) for u in range(8)]
            for x in range(8)
        ]
        _IDCT_BASIS = [
            [
                c[u] * c[v] * cos[x][u] * cos[y][v] / 4.0
                for y in range(8)
                for x in range(8)
            ]
            for v in range(8)
            for u in range(8)
        ]
    return _IDCT_BASIS


def _jpeg_huff_lut(counts: bytes, symbols: bytes) -> dict[tuple[int, int], int]:
    """Canonical JPEG Huffman table -> {(code_length, code): symbol}.
    Raises ValueError when the counts over-subscribe the code space or
    the symbol list is short (hostile DHT segments)."""
    lut: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for size in range(1, 17):
        for _ in range(counts[size - 1]):
            if code >= 1 << size:
                raise ValueError("DHT counts overflow the code space")
            if k >= len(symbols):
                raise ValueError("truncated DHT symbol list")
            lut[(size, code)] = symbols[k]
            k += 1
            code += 1
        code <<= 1
    return lut


class _JpegBits:
    """MSB-first bit reader over the entropy-coded segment: unstuffs
    FF 00, byte-aligns + consumes RSTn at restart boundaries, and
    raises ValueError when a real marker (e.g. a premature EOI)
    interrupts the stream — a truncated scan is data-level corruption,
    never a crash."""

    def __init__(self, p: bytes, i: int):
        self.p = p
        self.i = i
        self.buf = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.i >= len(self.p):
                raise ValueError("truncated JPEG entropy stream")
            b = self.p[self.i]
            if b == 0xFF:
                nxt = self.p[self.i + 1] if self.i + 1 < len(self.p) else None
                if nxt != 0x00:
                    raise ValueError(
                        f"marker 0xff{nxt:02x} inside entropy stream"
                        if nxt is not None
                        else "truncated JPEG entropy stream"
                    )
                self.i += 2
            else:
                self.i += 1
            self.buf = b
            self.n = 8
        self.n -= 1
        return (self.buf >> self.n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def huff(self, lut: dict[tuple[int, int], int]) -> int:
        code = 0
        for size in range(1, 17):
            code = (code << 1) | self.bit()
            sym = lut.get((size, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in entropy stream")

    def restart(self) -> None:
        # byte-align, then the 2-byte RSTn marker
        self.n = 0
        if self.i + 2 > len(self.p) or self.p[self.i] != 0xFF or not (
            0xD0 <= self.p[self.i + 1] <= 0xD7
        ):
            raise ValueError("missing restart marker")
        self.i += 2


def _jpeg_extend(v: int, s: int) -> int:
    """T.81 EXTEND: an s-bit magnitude value whose top bit is 0 codes
    a negative number."""
    return v - (1 << s) + 1 if s and v < 1 << (s - 1) else v


def decode_jpeg(p: bytes) -> tuple[int, int, int, list[int]]:
    """(width, height, channels, flat samples — RGB for 3-component,
    grayscale for 1) from a BASELINE SEQUENTIAL (SOF0) or PROGRESSIVE
    (SOF2, r13) JPEG — a REAL pixel decode with ZERO third-party
    dependencies, the codec-one-further step after zlib-PNG and
    pure-LZW GIF: marker walk, DQT / DHT table parse, Huffman entropy
    decode (byte unstuffing, restart intervals), dequantize +
    dezigzag, sparse IDCT, level shift, and chroma upsampling +
    YCbCr->RGB (JFIF coefficients). Sampling factors up to the spec's
    4 are handled generically (4:4:4, 4:2:0, 4:2:2 all fall out of
    the hmax/vmax MCU geometry).

    Interleaved single-scan baseline files take the one-pass fast
    path (_jpeg_decode_scan, no coefficient buffering). Progressive
    files — spectral selection, successive approximation with DC/AC
    refinement scans, EOBn runs — and non-interleaved sequential
    multi-scan files (one SOS per component subset; both were
    'needs_codec' refusals through r12) accumulate scans into a
    per-component coefficient store and render at EOI
    (_jpeg_store_scan / _jpeg_finish_store).

    The Adobe APP14 transform flag is honored (r13 advice): transform=0
    on a 3-component frame decodes the planes as plain RGB instead of
    running the JFIF YCbCr matrix.

    Hierarchical / lossless / arithmetic-coded frames, 12-bit
    precision, and 4-component (CMYK/YCCK) frames raise
    NotImplementedError — spec-valid but genuinely a codec library's
    job, and callers route those rows 'needs_codec'. Malformed
    payloads raise ValueError ('corrupt'): the
    two failure classes stay distinguishable, which is the
    status-column contract.
    Zip-bomb geometry is refused before any allocation (the PNG
    precedent): declared rasters past 2^24 pixels raise.

    Parity: the reference's crawl stores exactly this format
    (reference reddit_image_scraper.py:31,35-39 writes {id}.jpg)."""
    if p[:3] != b"\xff\xd8\xff":
        raise ValueError("not a JPEG payload")
    qt: dict[int, list[int]] = {}
    dc_luts: dict[int, dict] = {}
    ac_luts: dict[int, dict] = {}
    frame = None  # (w, h, [(comp_id, h_i, v_i, tq)])
    progressive = False
    restart_interval = 0
    adobe_transform = 1  # absent APP14 -> JFIF YCbCr for 3 components
    store: list[array] | None = None  # coefficient store (multi-scan)
    comp_q: list[list[int]] | None = None
    dc_seen: list[bool] | None = None
    i = 2
    while True:
        if i + 2 > len(p):
            raise ValueError("truncated JPEG before SOS")
        if p[i] != 0xFF:
            raise ValueError(f"bad marker alignment at offset {i}")
        while i < len(p) and p[i] == 0xFF:
            i += 1  # fill bytes before the marker id are legal
        if i >= len(p):
            raise ValueError("truncated JPEG before SOS")
        m = p[i]
        i += 1
        if m == 0x01 or 0xD0 <= m <= 0xD7:
            continue  # standalone markers
        if m == 0xD9:
            # EOI closes a multi-scan file once every frame component
            # has its first DC or full-band scan; AC bands a
            # progressive file never sent simply stay zero
            if store is not None and all(dc_seen):
                return _jpeg_finish_store(
                    frame, store, comp_q, adobe_transform != 0
                )
            if store is not None:
                raise ValueError("EOI before every component was scanned")
            raise ValueError("EOI before SOS")
        if m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            # hierarchical / lossless / arithmetic frames: a valid
            # JPEG this decoder honestly does not cover
            raise NotImplementedError(
                f"non-baseline JPEG frame (SOF marker 0xff{m:02x}) needs a "
                f"codec library"
            )
        if i + 2 > len(p):
            raise ValueError("truncated JPEG segment length")
        seglen = (p[i] << 8) | p[i + 1]
        if seglen < 2 or i + seglen > len(p):
            raise ValueError("truncated JPEG segment")
        seg = p[i + 2 : i + seglen]
        data_start = i + seglen
        i += seglen
        if m == 0xDB:  # DQT: one or more tables, zigzag order
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 15
                j += 1
                n = 128 if pq else 64
                if pq > 1 or j + n > len(seg):
                    raise ValueError("bad DQT segment")
                if pq:
                    qt[tq] = [
                        (seg[j + 2 * k] << 8) | seg[j + 2 * k + 1]
                        for k in range(64)
                    ]
                else:
                    qt[tq] = list(seg[j : j + 64])
                j += n
        elif m == 0xC4:  # DHT: one or more tables
            j = 0
            while j < len(seg):
                if j + 17 > len(seg):
                    raise ValueError("bad DHT segment")
                tc, th = seg[j] >> 4, seg[j] & 15
                counts = seg[j + 1 : j + 17]
                nsym = sum(counts)
                symbols = seg[j + 17 : j + 17 + nsym]
                if tc > 1 or len(symbols) < nsym:
                    raise ValueError("bad DHT segment")
                (ac_luts if tc else dc_luts)[th] = _jpeg_huff_lut(
                    counts, symbols
                )
                j += 17 + nsym
        elif m in (0xC0, 0xC1, 0xC2):  # sequential / progressive SOF
            if frame is not None:
                raise ValueError("multiple SOF markers")
            progressive = m == 0xC2
            if len(seg) < 6:
                raise ValueError("truncated SOF")
            prec, h, w, ncomp = seg[0], (seg[1] << 8) | seg[2], (
                seg[3] << 8
            ) | seg[4], seg[5]
            if prec != 8:
                raise NotImplementedError(
                    f"{prec}-bit JPEG precision needs a codec library"
                )
            if w < 1 or h < 1 or w * h > 1 << 24:
                raise ValueError(f"bad JPEG geometry {w}x{h}")
            if len(seg) < 6 + 3 * ncomp:
                raise ValueError("truncated SOF component list")
            if ncomp == 4:
                # spec-legal Adobe CMYK/YCCK baseline (r12 advice):
                # valid-but-undecodable routes 'needs_codec', not
                # 'corrupt'
                raise NotImplementedError(
                    "4-component (CMYK/YCCK) baseline JPEG needs a codec "
                    "library"
                )
            if ncomp not in (1, 3):
                raise ValueError(f"unsupported JPEG component count {ncomp}")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                h_i, v_i = hv >> 4, hv & 15
                if not (1 <= h_i <= 4 and 1 <= v_i <= 4):
                    raise ValueError(f"bad sampling factors {h_i}x{v_i}")
                comps.append((cid, h_i, v_i, tq))
            frame = (w, h, comps)
        elif m == 0xDD:  # DRI
            if len(seg) < 2:
                raise ValueError("truncated DRI")
            restart_interval = (seg[0] << 8) | seg[1]
        elif m == 0xEE:  # APP14: Adobe color-transform flag
            # 'Adobe' + version(2) + flags0(2) + flags1(2) + transform(1);
            # transform=0 on a 3-component frame means the planes are
            # plain RGB and the JFIF YCbCr matrix must NOT run (r12
            # advice: skipping this flag silently mis-colored Adobe RGB
            # JPEGs while reporting status='ok')
            if seg[:5] == b"Adobe" and len(seg) >= 12:
                adobe_transform = seg[11]
        elif m == 0xDA:  # SOS: selector parse, then the entropy scan
            if frame is None:
                raise ValueError("SOS before SOF")
            w, h, comps = frame
            ns = seg[0] if seg else 0
            if ns < 1 or ns > len(comps) or len(seg) < 4 + 2 * ns:
                raise ValueError("SOS component list mismatch")
            if not progressive and ns == len(comps) and store is None:
                # interleaved single-scan baseline: the one-pass fast
                # path (no coefficient buffering)
                sel = {}
                for c in range(len(comps)):
                    cid, tds = seg[1 + 2 * c], seg[2 + 2 * c]
                    sel[cid] = (tds >> 4, tds & 15)
                return _jpeg_decode_scan(
                    p, data_start, w, h, comps, sel, qt, dc_luts, ac_luts,
                    restart_interval, ycbcr=adobe_transform != 0,
                )
            # multi-scan path: progressive, or sequential scans over
            # component subsets (one SOS each, r13)
            cid_to_ci = {c[0]: ci for ci, c in enumerate(comps)}
            scan = []
            for c in range(ns):
                cid, tds = seg[1 + 2 * c], seg[2 + 2 * c]
                ci = cid_to_ci.get(cid)
                if ci is None or any(s[0] == ci for s in scan):
                    raise ValueError("bad SOS component selector")
                scan.append((ci, tds >> 4, tds & 15))
            ss_, se_, ahal = seg[1 + 2 * ns : 4 + 2 * ns]
            if not progressive and (ss_ != 0 or se_ != 63 or ahal != 0):
                raise ValueError("bad sequential scan header")
            if store is None:
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                mx = (w + 8 * hmax - 1) // (8 * hmax)
                my = (h + 8 * vmax - 1) // (8 * vmax)
                store, comp_q = [], []
                dc_seen = [False] * len(comps)
                for cid, h_i, v_i, tq in comps:
                    if tq not in qt:
                        raise ValueError(f"missing quant table {tq}")
                    # ~4 bytes/coefficient; bounded by the 2^24-pixel
                    # geometry guard above
                    store.append(
                        array("i", bytes(256 * mx * h_i * my * v_i))
                    )
                    comp_q.append(list(qt[tq]))
            i = _jpeg_store_scan(
                p, data_start, w, h, comps, scan, store, dc_luts,
                ac_luts, restart_interval, ss_, se_, ahal >> 4,
                ahal & 15, not progressive, dc_seen,
            )
        # all other segments (APPn, COM, ...) are skipped


def _jpeg_decode_scan(
    p, start, w, h, comps, sel, qt, dc_luts, ac_luts, restart_interval,
    ycbcr: bool = True,
) -> tuple[int, int, int, list[int]]:
    basis = _jpeg_idct_basis()
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mx = (w + 8 * hmax - 1) // (8 * hmax)
    my = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    meta = []  # (h_i, v_i, plane_stride, qtab, dc_lut, ac_lut)
    for cid, h_i, v_i, tq in comps:
        if tq not in qt:
            raise ValueError(f"missing quant table {tq}")
        if cid not in sel:
            raise ValueError(f"scan omits frame component {cid}")
        td, ta = sel[cid]
        if td not in dc_luts or ta not in ac_luts:
            raise ValueError(f"missing Huffman table DC{td}/AC{ta}")
        stride = mx * h_i * 8
        planes.append(bytearray(stride * my * v_i * 8))
        meta.append((h_i, v_i, stride, qt[tq], dc_luts[td], ac_luts[ta]))
    br = _JpegBits(p, start)
    preds = [0] * len(comps)

    def block(qtab, dc_lut, ac_lut, ci):
        # -> list of (natural_index, dequantized_value) nonzeros
        s = br.huff(dc_lut)
        if s > 11:
            raise ValueError(f"bad DC magnitude category {s}")
        preds[ci] += _jpeg_extend(br.bits(s), s)
        nz = []
        if preds[ci]:
            nz.append((0, preds[ci] * qtab[0]))
        k = 1
        while k < 64:
            rs = br.huff(ac_lut)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r == 15:  # ZRL: sixteen zero coefficients
                    k += 16
                    continue
                break  # EOB
            k += r
            if k > 63:
                raise ValueError("AC coefficient index past 63")
            nz.append(
                (_JPEG_ZIGZAG[k], _jpeg_extend(br.bits(s), s) * qtab[k])
            )
            k += 1
        return nz

    mcu = 0
    for myi in range(my):
        for mxi in range(mx):
            if restart_interval and mcu and mcu % restart_interval == 0:
                br.restart()
                for ci in range(len(preds)):
                    preds[ci] = 0
            for ci, (h_i, v_i, stride, qtab, dcl, acl) in enumerate(meta):
                for by in range(v_i):
                    for bx in range(h_i):
                        nz = block(qtab, dcl, acl, ci)
                        f = [0.0] * 64
                        for idx, cval in nz:
                            b = basis[idx]
                            for pnt in range(64):
                                f[pnt] += cval * b[pnt]
                        ox = (mxi * h_i + bx) * 8
                        oy = (myi * v_i + by) * 8
                        plane = planes[ci]
                        for r in range(8):
                            base = (oy + r) * stride + ox
                            fr = f[r * 8 : r * 8 + 8]
                            for cx in range(8):
                                v = int(fr[cx] + 128.5)
                                plane[base + cx] = (
                                    0 if v < 0 else (255 if v > 255 else v)
                                )
            mcu += 1
    return _jpeg_planes_to_samples(w, h, meta, planes, hmax, vmax, ycbcr)


def _jpeg_planes_to_samples(
    w, h, meta, planes, hmax, vmax, ycbcr
) -> tuple[int, int, int, list[int]]:
    """Crop + upsample decoded component planes into the flat sample
    list (gray for 1 component, RGB for 3): shared tail of the baseline
    fast path and the coefficient-store (progressive / multi-scan)
    finish. meta rows start (h_i, v_i, plane_stride, ...)."""
    samples: list[int] = []
    if len(meta) == 1:
        stride = meta[0][2]
        for y in range(h):
            samples.extend(planes[0][y * stride : y * stride + w])
        return w, h, 1, samples
    (yh, yv, ystride, *_), (bh, bv, bstride, *_), (rh, rv, rstride, *_) = meta
    for y in range(h):
        yrow = (y * yv // vmax) * ystride
        brow = (y * bv // vmax) * bstride
        rrow = (y * rv // vmax) * rstride
        if ycbcr:
            for x in range(w):
                yy = planes[0][yrow + x * yh // hmax]
                cbd = planes[1][brow + x * bh // hmax] - 128
                crd = planes[2][rrow + x * rh // hmax] - 128
                rr = int(yy + 1.402 * crd + 0.5)
                gg = int(yy - 0.344136 * cbd - 0.714136 * crd + 0.5)
                bb = int(yy + 1.772 * cbd + 0.5)
                samples.append(0 if rr < 0 else (255 if rr > 255 else rr))
                samples.append(0 if gg < 0 else (255 if gg > 255 else gg))
                samples.append(0 if bb < 0 else (255 if bb > 255 else bb))
        else:
            # Adobe APP14 transform=0: the three planes are already
            # R, G, B — same upsampling geometry, no matrix
            for x in range(w):
                samples.append(planes[0][yrow + x * yh // hmax])
                samples.append(planes[1][brow + x * bh // hmax])
                samples.append(planes[2][rrow + x * rh // hmax])
    return w, h, 3, samples


def _jpeg_store_scan(
    p, start, w, h, comps, scan, store, dc_luts, ac_luts, ri,
    ss, se, ah, al, seq, dc_seen,
):
    """Decode ONE entropy-coded scan into the per-component coefficient
    store — the path behind progressive (SOF2) and non-interleaved
    sequential multi-scan files (r13; both previously honest
    'needs_codec' refusals). T.81 Annex G data flow: DC first scans
    carry point-transformed predictor diffs, DC refinement one raw bit
    per block, AC first scans run-length bands with EOBn block runs,
    AC refinement the correction-bit walk (ZRL skips 16 zero-HISTORY
    positions; every nonzero-history coefficient passed consumes one
    correction bit). Sequential scans (seq=True) decode the full band
    DC+AC per block, baseline-style.

    comps: frame components [(cid, h_i, v_i, tq)]. scan: [(ci, td,
    ta)] frame-component INDEXES in scan order. store: per-ci
    array('i'), padded-MCU-grid blocks x 64 coefficients in NATURAL
    order, dequantization deferred to _jpeg_finish_store. Returns the
    byte offset just past the scan's entropy data (the marker loop
    resumes there — progressive files carry many scans per frame)."""
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mx = (w + 8 * hmax - 1) // (8 * hmax)
    my = (h + 8 * vmax - 1) // (8 * vmax)
    if ah > 13 or al > 13:
        raise ValueError("bad successive-approximation bit position")
    if ah and ah != al + 1:
        raise ValueError("bad successive-approximation sequence")
    if not seq:
        if ss == 0 and se != 0:
            raise ValueError("progressive DC scan with Se != 0")
        if ss > 0 and len(scan) != 1:
            raise ValueError("interleaved progressive AC scan")
        if ss > 63 or se > 63 or (ss > 0 and se < ss):
            raise ValueError("bad spectral selection")
    br = _JpegBits(p, start)
    preds = [0] * len(comps)
    eobrun = 0

    def dc_first(cb, ci, dcl):
        s = br.huff(dcl)
        if s > 11:
            raise ValueError(f"bad DC magnitude category {s}")
        preds[ci] += _jpeg_extend(br.bits(s), s)
        cb[0] = preds[ci] << al

    def dc_refine(cb):
        # negative DC values OR correctly through two's complement
        if br.bit():
            cb[0] |= 1 << al

    def seq_block(cb, dcl, acl, ci):
        s = br.huff(dcl)
        if s > 11:
            raise ValueError(f"bad DC magnitude category {s}")
        preds[ci] += _jpeg_extend(br.bits(s), s)
        cb[0] = preds[ci]
        k = 1
        while k < 64:
            rs = br.huff(acl)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r == 15:
                    k += 16
                    continue
                break
            k += r
            if k > 63:
                raise ValueError("AC coefficient index past 63")
            cb[_JPEG_ZIGZAG[k]] = _jpeg_extend(br.bits(s), s)
            k += 1

    def ac_first(cb, acl):
        nonlocal eobrun
        if eobrun:  # inside an EOBn run: whole band stays zero
            eobrun -= 1
            return
        k = ss
        while k <= se:
            rs = br.huff(acl)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r != 15:
                    # EOBn: this block ends; (run - 1) more all-zero
                    # bands follow
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += br.bits(r)
                    break
                k += 16
                continue
            k += r
            if k > se:
                raise ValueError("AC coefficient index past band end")
            cb[_JPEG_ZIGZAG[k]] = _jpeg_extend(br.bits(s), s) << al
            k += 1

    def refine_nonzero(cb, z, p1):
        # correction bit 1 appends this pass's magnitude bit — once
        # (the p1 check skips coefficients already refined this pass)
        if br.bit() and not (abs(cb[z]) & p1):
            cb[z] += p1 if cb[z] > 0 else -p1

    def ac_refine(cb, acl):
        nonlocal eobrun
        p1 = 1 << al
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = br.huff(acl)
                r, s = rs >> 4, rs & 15
                newval = 0
                if s == 0:
                    if r != 15:
                        # run INCLUDES this block: its tail still
                        # consumes correction bits below
                        eobrun = (1 << r) + (br.bits(r) if r else 0)
                        break
                    # ZRL: skip 16 zero-history positions
                else:
                    if s != 1:
                        raise ValueError("bad AC refinement magnitude")
                    newval = p1 if br.bit() else -p1
                while k <= se:
                    z = _JPEG_ZIGZAG[k]
                    if cb[z]:
                        refine_nonzero(cb, z, p1)
                        k += 1
                    else:
                        if r == 0:
                            break
                        r -= 1
                        k += 1
                if newval:
                    if k > se:
                        raise ValueError("AC refinement past band end")
                    cb[_JPEG_ZIGZAG[k]] = newval
                k += 1
        if eobrun:
            while k <= se:
                z = _JPEG_ZIGZAG[k]
                if cb[z]:
                    refine_nonzero(cb, z, p1)
                k += 1
            eobrun -= 1

    ctx = []
    for ci, td, ta in scan:
        _, h_i, v_i, _ = comps[ci]
        dcl = acl = None
        if seq or (ss == 0 and ah == 0):
            dcl = dc_luts.get(td)
            if dcl is None:
                raise ValueError(f"missing Huffman table DC{td}")
        if seq or ss > 0:  # AC refinement reads the table too
            acl = ac_luts.get(ta)
            if acl is None:
                raise ValueError(f"missing Huffman table AC{ta}")
        if not seq and not dc_seen[ci] and (ss > 0 or ah > 0):
            raise ValueError("AC or refinement scan before first DC scan")
        ctx.append((ci, h_i, v_i, dcl, acl))

    def unit(ci, dcl, acl, bx, by, bw):
        off = (by * bw + bx) * 64
        cb = memoryview(store[ci])[off : off + 64]
        if seq:
            seq_block(cb, dcl, acl, ci)
        elif ss == 0:
            if ah == 0:
                dc_first(cb, ci, dcl)
            else:
                dc_refine(cb)
        elif ah == 0:
            ac_first(cb, acl)
        else:
            ac_refine(cb, acl)

    nunits = 0
    if len(scan) > 1:
        # interleaved (DC or sequential): MCU order over the frame grid
        for myi in range(my):
            for mxi in range(mx):
                if ri and nunits and nunits % ri == 0:
                    br.restart()
                    preds[:] = [0] * len(comps)
                    eobrun = 0
                for ci, h_i, v_i, dcl, acl in ctx:
                    bw = mx * h_i
                    for by in range(v_i):
                        for bx in range(h_i):
                            unit(ci, dcl, acl,
                                 mxi * h_i + bx, myi * v_i + by, bw)
                nunits += 1
    else:
        # single-component scans are ALWAYS non-interleaved (T.81
        # A.2.2): the data-unit order is the component's own ceil
        # block grid, NOT the padded MCU grid
        ci, h_i, v_i, dcl, acl = ctx[0]
        nbw = ((w * h_i + hmax - 1) // hmax + 7) // 8
        nbh = ((h * v_i + vmax - 1) // vmax + 7) // 8
        bw = mx * h_i
        for by in range(nbh):
            for bx in range(nbw):
                if ri and nunits and nunits % ri == 0:
                    br.restart()
                    preds[:] = [0] * len(comps)
                    eobrun = 0
                unit(ci, dcl, acl, bx, by, bw)
                nunits += 1
    if seq or ss == 0:
        for ci, _, _ in scan:
            dc_seen[ci] = True
    return br.i


def _jpeg_finish_store(
    frame, store, comp_q, ycbcr
) -> tuple[int, int, int, list[int]]:
    """Dequantize + sparse-IDCT the accumulated coefficient store into
    component planes (run at EOI, when every scan has landed), then the
    shared crop/upsample/color tail. Same per-block cost shape as the
    baseline fast path: 64 x nonzero coefficients."""
    w, h, comps = frame
    basis = _jpeg_idct_basis()
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mx = (w + 8 * hmax - 1) // (8 * hmax)
    my = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    meta = []
    for ci, (cid, h_i, v_i, tq) in enumerate(comps):
        stride = mx * h_i * 8
        plane = bytearray(stride * my * v_i * 8)
        cst = store[ci]
        q = comp_q[ci]
        bw = mx * h_i
        for by in range(my * v_i):
            for bx in range(bw):
                off = (by * bw + bx) * 64
                f = [0.0] * 64
                for idx in range(64):
                    cval = cst[off + idx]
                    if cval:
                        d = cval * q[_JPEG_ZZINV[idx]]
                        b = basis[idx]
                        for pnt in range(64):
                            f[pnt] += d * b[pnt]
                ox, oy = bx * 8, by * 8
                for r in range(8):
                    base = (oy + r) * stride + ox
                    fr = f[r * 8 : r * 8 + 8]
                    for cx in range(8):
                        v = int(fr[cx] + 128.5)
                        plane[base + cx] = (
                            0 if v < 0 else (255 if v > 255 else v)
                        )
        planes.append(plane)
        meta.append((h_i, v_i, stride))
    return _jpeg_planes_to_samples(w, h, meta, planes, hmax, vmax, ycbcr)


PIXEL_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
        T.StructField("status", T.StringType()),
    ]
)

# magics the stats UDF recognizes but cannot decode without a codec
# library — these report status='needs_codec', NOT a silent NULL-stats
# row, so a corpus of valid WebPs is distinguishable from 100% corrupt
# media (round-11 advice fix). PNG is NOT here: IDAT is zlib + stdlib
# filters, decoded for real by decode_png (round 11). GIF is not
# either: its only compression is LZW, decoded for real by decode_gif
# (round 11 — the pure-Python codec-one-further step after zlib-PNG).
# JPEG left in round 12: baseline sequential decodes for real via
# decode_jpeg; only its NON-baseline frames (progressive etc.) still
# report 'needs_codec', via decode_jpeg's NotImplementedError.
_NEEDS_CODEC_MAGICS: tuple[tuple[bytes, int], ...] = (
    (b"WEBP", 8),  # RIFF....WEBP
    # TIFF (r12 advice fix): recognized by sniff_format/sniff_image_dims
    # since r11, so the stats UDF must say 'needs_codec' (raster may be
    # LZW/JPEG/deflate-compressed with arbitrary tag layouts), not
    # 'unknown_format' — a TIFF corpus must be distinguishable from
    # garbage.
    (b"II*\x00", 0),
    (b"MM\x00*", 0),
)


def _channel_means(s: list[int], n: int, nch: int) -> list[float]:
    """Per-channel means from a flat interleaved sample list: grayscale
    (with or without an alpha channel) reports its single luminance
    channel three times; RGBA means ignore alpha."""
    if nch in (1, 2):
        m = sum(s[::nch]) / n
        return [m, m, m]
    return [sum(s[c::nch]) / n for c in range(3)]


def image_pixel_stats(
    df: DataFrame, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """payload -> per-image channel means over REAL decoded pixels
    (width, height, mean_r/g/b) — the image analog of chunk_audio's
    real path: Arrow-batched mapInPandas over the stdlib decoders
    (`decode_bmp`, `decode_ppm`, `decode_png`, `decode_gif`,
    `decode_jpeg` for baseline sequential), no codec library.
    Grayscale (PGM) reports its single channel as all three
    means. Strictly 1-in/1-out row-aligned (the decode_images
    passthrough precedent — never re-keyed on a possibly-duplicate
    id); NULL, undecodable, or truncated payloads yield a NULL-stats
    row, so corrupt media is visible data, not a job failure. The
    `status` column says WHY the stats are NULL: 'ok' (decoded),
    'needs_codec' (a format that genuinely needs a codec library —
    WebP/TIFF, and non-baseline JPEG frames such as progressive; see
    decode_images' Pillow stub), 'corrupt'
    (a known magic whose header or raster fails to parse),
    'unknown_format' (unrecognized magic), 'null_payload'. Without it
    a corpus of valid JPEGs would be indistinguishable from 100%
    corrupt media."""

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                # a NULL id must survive as a NULL-id row (null harness
                # contract), so never int() it blind
                mid = None if pd.isna(mid) else int(mid)
                row = (mid, None, None, None, None, None, "null_payload")
                if p is not None:
                    b = bytes(p)
                    try:
                        if b[:2] == b"BM":
                            w, h, nch, s = decode_bmp(b)
                            row = (mid, w, h, *_channel_means(s, w * h, nch), "ok")
                        elif b[:2] in (b"P6", b"P5"):
                            w, h, nch, s = decode_ppm(b)
                            row = (mid, w, h, *_channel_means(s, w * h, nch), "ok")
                        elif b[:8] == b"\x89PNG\r\n\x1a\n":
                            w, h, nch, s = decode_png(b)
                            row = (mid, w, h, *_channel_means(s, w * h, nch), "ok")
                        elif b[:6] in (b"GIF87a", b"GIF89a"):
                            w, h, nch, s = decode_gif(b)
                            row = (mid, w, h, *_channel_means(s, w * h, nch), "ok")
                        elif b[:3] == b"\xff\xd8\xff":
                            # baseline sequential decodes for real (r12);
                            # progressive & friends raise
                            # NotImplementedError -> 'needs_codec', while
                            # a malformed baseline file raises ValueError
                            # -> 'corrupt' via the outer handler
                            try:
                                w, h, nch, s = decode_jpeg(b)
                                row = (
                                    mid, w, h,
                                    *_channel_means(s, w * h, nch), "ok",
                                )
                            except NotImplementedError:
                                row = (
                                    mid, None, None, None, None, None,
                                    "needs_codec",
                                )
                        elif any(
                            b[o : o + len(m)] == m
                            for m, o in _NEEDS_CODEC_MAGICS
                        ):
                            row = (mid, None, None, None, None, None, "needs_codec")
                        else:
                            row = (mid, None, None, None, None, None,
                                   "unknown_format")
                    except ValueError:
                        # corrupt raster/header -> NULL-stats row
                        row = (mid, None, None, None, None, None, "corrupt")
                out.append(row)
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "width", "height",
                    "mean_r", "mean_g", "mean_b", "status",
                ],
            ).astype(
                {
                    "media_id": "Int64",
                    "width": "Int32",
                    "height": "Int32",
                    "mean_r": "float64",
                    "mean_g": "float64",
                    "mean_b": "float64",
                    "status": "object",
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_stats, PIXEL_STATS_SCHEMA)


def _fake_dims(n: int) -> tuple[int, int, int]:
    """Deterministic pseudo-dimensions from payload length — pure
    arithmetic, reproducible in any engine (used by the oracle too)."""
    return (n % 256 + 1, n // 256 % 256 + 1, 3)


def decode_images(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    fake: bool = True,
    passthrough: Sequence[str] = (),
) -> DataFrame:
    """payload -> (width, height, channels). Arrow-batched mapInPandas.

    `passthrough` columns ride THROUGH the UDF and come back next to
    the decode output. This exists because the alternative — decoding
    on (id, payload) alone and joining the profile back on the id —
    silently MULTIPLIES rows when the id is not unique (k duplicate
    ids -> k² joined rows; found by the r7 duplicate-doc_id probe on
    multimodal_image_profile). A media lake under at-least-once
    ingestion WILL contain duplicate ids; a 1-in/1-out decode must
    stay row-aligned by construction, never re-keyed."""
    keep = list(passthrough)

    def _real_dims(p: bytes) -> tuple[int | None, int | None, int | None]:
        # round-10/11/12 real path, following the WAV precedent: the
        # formats stdlib can genuinely decode (BMP, PPM/PGM; PNG via
        # zlib and GIF via pure-Python LZW since round 11; baseline
        # sequential JPEG since round 12) decode for real; anything
        # else still needs Pillow. Malformed payloads
        # yield NULL dims (the row survives, the failure is visible)
        # — they are DATA, not bugs, at crawl scale.
        try:
            if p[:2] == b"BM":
                w, h, c, _ = decode_bmp(p)
                return w, h, c
            if p[:2] in (b"P6", b"P5"):
                w, h, c, _ = decode_ppm(p)
                return w, h, c
            if p[:8] == b"\x89PNG\r\n\x1a\n":
                w, h, c, _ = decode_png(p)
                return w, h, c
            if p[:6] in (b"GIF87a", b"GIF89a"):
                w, h, c, _ = decode_gif(p)
                return w, h, c
            if p[:3] == b"\xff\xd8\xff":
                # r12: baseline sequential decodes for real; progressive
                # & friends raise NotImplementedError below, keeping the
                # Pillow-stub contract for genuinely-needs-codec media
                w, h, c, _ = decode_jpeg(p)
                return w, h, c
        except ValueError:
            return None, None, None
        raise NotImplementedError(_STUB_MSG.format(what="image", lib="Pillow"))

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # a NULL payload decodes to NULL dims (the row survives,
            # the failure is visible) — a lake WILL contain them, and
            # bytes(None) would kill the whole batch (r7 null harness)
            dims = [
                (None, None, None)
                if p is None
                else (_fake_dims(len(bytes(p))) if fake else _real_dims(bytes(p)))
                for p in pdf[payload_col]
            ]
            out = {"media_id": pdf[id_col].astype("int64")}
            for c in keep:
                out[c] = pdf[c]
            out["width"] = pd.array([d[0] for d in dims], dtype="Int32")
            out["height"] = pd.array([d[1] for d in dims], dtype="Int32")
            out["channels"] = pd.array([d[2] for d in dims], dtype="Int32")
            yield pd.DataFrame(out)

    if keep:
        schema = T.StructType(
            [T.StructField("media_id", T.LongType())]
            + [T.StructField(c, df.schema[c].dataType) for c in keep]
            + [
                T.StructField("width", T.IntegerType()),
                T.StructField("height", T.IntegerType()),
                T.StructField("channels", T.IntegerType()),
            ]
        )
    else:
        schema = IMAGE_DECODE_SCHEMA
    return df.select(id_col, payload_col, *keep).mapInPandas(_decode, schema)


def resize_images(
    df: DataFrame,
    target_w: int,
    target_h: int,
    id_col: str = "media_id",
    payload_col: str = "payload",
    fake: bool = True,
) -> DataFrame:
    """payload -> resized payload (stub: truncated/padded byte budget
    proportional to target area — keeps batch/byte plumbing honest)."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        budget = target_w * target_h * 3
        for pdf in batches:
            if not fake:
                raise NotImplementedError(_STUB_MSG.format(what="image", lib="Pillow"))
            out = [
                None if p is None else bytes(p)[:budget].ljust(budget, b"\0")
                for p in pdf[payload_col]
            ]
            yield pd.DataFrame({"media_id": pdf[id_col].astype("int64"), "payload": out})

    schema = T.StructType(
        [T.StructField("media_id", T.LongType()), T.StructField("payload", T.BinaryType())]
    )
    return df.select(id_col, payload_col).mapInPandas(_resize, schema)


def extract_features(
    df: DataFrame,
    dim: int = 8,
    id_col: str = "media_id",
    payload_col: str = "payload",
    fake: bool = True,
) -> DataFrame:
    """payload -> float feature vector (stub: first `dim` bytes / 255)."""

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    _STUB_MSG.format(what="media-embedding", lib="torch/PIL")
                )
            feats = [
                None
                if p is None
                else [b / 255.0 for b in bytes(p)[:dim].ljust(dim, b"\0")]
                for p in pdf[payload_col]
            ]
            yield pd.DataFrame({"media_id": pdf[id_col].astype("int64"), "feature": feats})

    return df.select(id_col, payload_col).mapInPandas(_feat, FEATURE_SCHEMA)


def sample_frames(
    df: DataFrame,
    every_ms: int = 1000,
    id_col: str = "media_id",
    duration_ms_col: str = "duration_ms",
    fake: bool = True,
) -> DataFrame:
    """video metadata -> one row per sampled frame (1-file -> N-rows UDTF
    shape; stub needs only duration, no codec)."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(_STUB_MSG.format(what="video", lib="pyav"))
            ids, idxs, offs = [], [], []
            for mid, dur in zip(pdf[id_col], pdf[duration_ms_col]):
                if dur is None or pd.isna(dur):
                    continue  # NULL duration -> no frames (mirrors the
                    # oracle's range(0, NULL) producing no rows)
                for i, off in enumerate(range(0, int(dur), every_ms)):
                    ids.append(int(mid))
                    idxs.append(i)
                    offs.append(off)
            yield pd.DataFrame(
                {"media_id": ids, "frame_index": idxs, "frame_offset_ms": offs}
            )

    return df.select(id_col, duration_ms_col).mapInPandas(_sample, FRAME_SAMPLE_SCHEMA)


AUDIO_CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("chunk_index", T.IntegerType()),
        T.StructField("start_ms", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


def decode_wav_pcm(p: bytes) -> tuple[int, list[float]]:
    """(frame_rate, mono samples) from RIFF/WAVE PCM bytes — a REAL
    decode with ZERO third-party dependencies: the stdlib `wave` module
    parses the RIFF container and `array` unpacks the PCM frames (WAV
    is little-endian; byteswapped on big-endian hosts). 8-bit PCM is
    unsigned (centered by -128); 16-, 24- (r13) and 32-bit (r13) are
    signed; multi-channel audio mixes down by per-frame arithmetic
    mean (the standard mono mixdown, deterministic). Raises
    wave.Error on a non-WAV payload — sniff first (`sniff_format`
    detects RIFF/WAVE natively) and route non-WAV rows to the
    stub-gated codec paths. (IEEE-float WAV is format tag 3, which
    stdlib `wave` itself rejects before the width branch.)"""
    import array
    import io
    import sys as _sys
    import wave

    with wave.open(io.BytesIO(p)) as w:
        nch = w.getnchannels()
        sw = w.getsampwidth()
        rate = w.getframerate()
        raw = w.readframes(w.getnframes())
    if rate < 1:
        # stdlib wave accepts a header declaring frame rate 0; letting
        # it through turns into a ZeroDivisionError deep inside the
        # chunking UDF — fail with the same error class as a corrupt
        # container so callers route it like any other undecodable row
        raise wave.Error(f"declared frame rate {rate} is not positive")
    if sw == 1:
        samples: list[float] = [v - 128 for v in raw]
    elif sw == 2:
        arr = array.array("h", raw)
        if _sys.byteorder == "big":
            arr.byteswap()
        samples = list(arr)
    elif sw == 3:
        # 24-bit signed little-endian (r13): studio-common, no array
        # typecode — 3-byte windows through int.from_bytes
        samples = [
            int.from_bytes(raw[i : i + 3], "little", signed=True)
            for i in range(0, len(raw) - len(raw) % 3, 3)
        ]
    elif sw == 4:
        # 32-bit signed integer PCM (r13)
        arr32 = array.array("i", raw[: len(raw) - len(raw) % 4])
        if _sys.byteorder == "big":
            arr32.byteswap()
        samples = list(arr32)
    else:
        raise NotImplementedError(
            f"{8 * sw}-bit PCM needs a real codec library (not installed)"
        )
    if nch > 1:
        samples = [
            sum(samples[i : i + nch]) / nch
            for i in range(0, len(samples), nch)
        ]
    return rate, samples


def chunk_audio(
    df: DataFrame,
    sample_rate: int = 1000,
    window_ms: int = 250,
    id_col: str = "media_id",
    payload_col: str = "payload",
    fake: bool = True,
) -> DataFrame:
    """payload -> fixed-duration windows with per-window RMS energy
    (1-file -> N-rows UDTF shape). The fake (default) treats each
    payload byte as one 8-bit PCM sample at `sample_rate`; the integer
    arithmetic is exact, so the fake is oracle-verifiable. fake=False
    is a REAL decode (round-9: the only media decoder this container
    can run) — stdlib-wave RIFF/WAVE PCM via `decode_wav_pcm`, using
    the FILE's own frame rate (the `sample_rate` arg applies to the
    fake only); window boundaries and the RMS loop are byte-identical
    between the two paths, so every fake-path test pins the real
    path's chunk math too."""
    fake_win = sample_rate * window_ms // 1000

    def _chunk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, starts, ns, rms = [], [], [], [], []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                if p is None:
                    continue  # NULL payload -> no chunks (same shape
                    # as an empty payload; bytes(None) would throw)
                if fake:
                    samples: list[float] = list(bytes(p))
                    win = fake_win
                else:
                    rate, samples = decode_wav_pcm(bytes(p))
                    win = rate * window_ms // 1000
                    if win < 1:
                        # a (valid) frame rate below 1000/window_ms
                        # yields zero samples per window — the ceil
                        # division below would divide by zero; name
                        # the hostile header instead of crashing deep
                        # in the Arrow batch
                        import wave

                        raise wave.Error(
                            f"frame rate {rate} too low for a "
                            f"{window_ms} ms window (0 samples/window)"
                        )
                for ci in range((len(samples) + win - 1) // win):
                    seg = samples[ci * win : (ci + 1) * win]
                    ids.append(int(mid))
                    idxs.append(ci)
                    starts.append(ci * window_ms)
                    ns.append(len(seg))
                    rms.append((sum(b * b for b in seg) / len(seg)) ** 0.5)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "chunk_index": pd.Series(idxs, dtype="int32"),
                    "start_ms": pd.Series(starts, dtype="int32"),
                    "n_samples": pd.Series(ns, dtype="int32"),
                    "rms": pd.Series(rms, dtype="float64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_chunk, AUDIO_CHUNK_SCHEMA)
