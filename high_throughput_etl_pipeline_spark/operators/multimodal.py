"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns next to a
metadata struct; heavy per-item work (decode, resize, frame-sample,
feature-extract) runs as Arrow-batched ``mapInPandas`` stages so Python
cost is amortized per batch, not per row.

IMAGE/VIDEO decode internals are STUBBED (PIL/pyav are not in this
container): ``extract_features``/``sample_frames`` raise
``NotImplementedError`` unless ``fake=True``, which substitutes a
deterministic fake decoder so the Spark-side plumbing — schema, batch
shape, partitioning — is fully exercised by tests.  Swapping the fake
for PIL/libav is a one-function change that does not touch any plan.

AUDIO decode is REAL: :func:`decode_wav` parses RIFF/WAVE PCM16 with the
stdlib ``wave`` module (header + frame bytes → integer samples) and
:func:`extract_wav_features` runs it behind the same Arrow
``mapInPandas`` boundary, computing RMS / zero-crossings / peak from the
DECODED samples — no third-party library, raises nothing in this
sandbox.  :func:`synth_wav_pcm16` builds genuine WAV payloads from a
closed-form integer waveform, which is what lets an engine-independent
oracle value-check the whole encode → Arrow transfer → decode → DSP
path (``multimodal_wav_decode`` in queries.py).
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id BIGINT, payload BINARY, "
    "meta STRUCT<kind: STRING, mime: STRING, width: INT, height: INT, "
    "duration_ms: INT, source: STRING>"
)

FEATURE_SCHEMA = (
    "media_id BIGINT, kind STRING, feat_dim INT, features ARRAY<FLOAT>, "
    "decode_ok BOOLEAN"
)


def make_media_table(documents: DataFrame) -> DataFrame:
    """Derive a synthetic media table from `documents` (binary payload =
    utf-8 text bytes) — the test stand-in for an image/audio table."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.lit("image").alias("kind"),
            F.lit("application/octet-stream").alias("mime"),
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            F.lit(0).alias("duration_ms"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes, dim: int) -> list[float]:
    """Deterministic fake 'decoder': md5-seeded feature vector in [0,1)."""
    out = []
    h = payload or b""
    for i in range(dim):
        d = hashlib.md5(h + i.to_bytes(4, "little")).digest()
        out.append(int.from_bytes(d[:4], "little") / 2**32)
    return out


def extract_features(
    media: DataFrame, feat_dim: int = 8, fake: bool = True
) -> DataFrame:
    """Decode + feature-extract as an Arrow-batched mapInPandas stage.

    Real deployment: replace `_fake_decode` with the actual decoder
    (PIL.Image.open / soundfile / pyav frame sampling).  Batch shape and
    output schema stay identical.
    """
    if not fake:
        raise NotImplementedError(
            "real image/audio decoding requires PIL/soundfile/pyav "
            "(not installed in this environment); use fake=True"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": [m["kind"] for m in pdf["meta"]],
                    "feat_dim": feat_dim,
                    "features": [
                        _fake_decode(p, feat_dim) for p in pdf["payload"]
                    ],
                    "decode_ok": True,
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def resize_plan(media: DataFrame, width: int, height: int) -> DataFrame:
    """Metadata-only 'resize' marking target dims (decode stubbed).

    Shows the pattern: cheap metadata transforms stay Column expressions;
    only pixel work would enter mapInPandas.
    """
    return media.withColumn(
        "meta",
        F.col("meta")
        .withField("width", F.lit(width))
        .withField("height", F.lit(height)),
    )


FRAME_SCHEMA = (
    "media_id BIGINT, frame_index INT, frame_ts_ms INT, "
    "features ARRAY<FLOAT>, decode_ok BOOLEAN"
)


def sample_frames(
    media: DataFrame,
    fps: float = 1.0,
    max_frames: int = 16,
    feat_dim: int = 8,
    fake: bool = True,
) -> DataFrame:
    """Frame sampling for video payloads: one output row per sampled
    frame, evenly spaced at ``fps`` over ``meta.duration_ms`` (capped at
    ``max_frames``).

    The frame GRID is computed JVM-side (explode over a sequence — the
    row multiplication never touches Python); only the per-frame decode
    runs in the Arrow-batched stage, and it is stubbed exactly like
    extract_features.  Swap `_fake_decode` for a real frame grab
    (pyav seek+decode) without touching the plan.
    """
    if not fake:
        raise NotImplementedError(
            "real video decoding requires pyav (not installed); use fake=True"
        )
    interval_ms = int(1000.0 / fps)
    n_frames = F.least(
        F.greatest(
            (F.col("meta.duration_ms") / interval_ms).cast("int"), F.lit(1)
        ),
        F.lit(max_frames),
    )
    grid = media.select(
        "media_id",
        "payload",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_index"),
    ).withColumn("frame_ts_ms", F.col("frame_index") * interval_ms)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frame_index": pdf["frame_index"],
                    "frame_ts_ms": pdf["frame_ts_ms"],
                    "features": [
                        _fake_decode(
                            (p or b"") + int(i).to_bytes(4, "little"), feat_dim
                        )
                        for p, i in zip(pdf["payload"], pdf["frame_index"])
                    ],
                    "decode_ok": True,
                }
            )

    return grid.mapInPandas(batches, schema=FRAME_SCHEMA)


WAV_MEDIA_SCHEMA = "media_id BIGINT, payload BINARY"

WAV_FEATURE_SCHEMA = (
    "media_id BIGINT, sample_rate INT, n_samples INT, "
    "sum_sq BIGINT, zero_crossings INT, peak INT, decode_ok BOOLEAN"
)


def synth_sample(seed: int, k: int) -> int:
    """Sample ``k`` of the deterministic test waveform for ``seed``:
    ``((seed·(k+1) + 2654435761·k²) mod 65536) − 32768`` — a closed-form
    (no recurrence) signed-16-bit integer sequence that an
    engine-independent oracle can replay with plain integer arithmetic
    over a ``k``-grid.  2654435761 is the Knuth multiplicative-hash
    constant (⌊2³²/φ⌋); ``seed`` is expected in [0, 65536)."""
    return (seed * (k + 1) + 2654435761 * k * k) % 65536 - 32768


def synth_wav_pcm16(
    seed: int, n_samples: int, sample_rate: int = 8000
) -> bytes:
    """Build a GENUINE RIFF/WAVE PCM16 mono payload (stdlib ``wave``)
    whose frames are :func:`synth_sample` values — real 44-byte header,
    real little-endian frame bytes.  This is the test-stand-in for
    reading a binary audio column off object storage: everything
    downstream of these bytes (Arrow transfer, header parse, frame
    decode, DSP) is the real production path."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(
            b"".join(
                struct.pack("<h", synth_sample(seed, k))
                for k in range(n_samples)
            )
        )
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[int, list[int]]:
    """REAL WAV decoder — pure stdlib, raises nothing in this sandbox.

    Parses the RIFF/WAVE header and PCM16 frame bytes with the ``wave``
    module and returns ``(sample_rate, samples)`` as Python ints.
    Raises ``wave.Error`` on malformed headers and ``ValueError`` on
    unsupported shapes (only mono PCM16 here — the formats this engine
    synthesizes; a stereo/24-bit branch is a decode-loop extension, not
    a plan change).  This is the function the r6-adjudicated image/video
    stubs were waiting on a library for: WAV needs none."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getnchannels() != 1 or w.getsampwidth() != 2:
            raise ValueError(
                f"unsupported WAV shape: channels={w.getnchannels()} "
                f"sampwidth={w.getsampwidth()} (mono PCM16 only)"
            )
        rate = w.getframerate()
        n = w.getnframes()
        raw = w.readframes(n)
    return rate, list(struct.unpack(f"<{n}h", raw))


def make_wav_table(
    documents: DataFrame, sample_rate: int = 8000, max_samples: int = 64
) -> DataFrame:
    """documents → a media table whose ``payload`` column holds REAL WAV
    bytes (Arrow-batched synth stage).  Seed and length are derived from
    ``doc_id`` by the portable keyed-md5 idiom, so an oracle knows the
    exact waveform inside every payload without parsing RIFF:
    ``seed = md5_64('wav-v1:' || doc_id) % 65536``,
    ``n = 16 + doc_id % (max_samples - 15)``."""
    mod = max_samples - 15

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = [int(i) for i in pdf["doc_id"]]
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "payload": [
                        synth_wav_pcm16(
                            int(
                                hashlib.md5(
                                    f"wav-v1:{i}".encode()
                                ).hexdigest()[17:32],
                                16,
                            )
                            % 65536,
                            16 + i % mod,
                            sample_rate,
                        )
                        for i in ids
                    ],
                }
            )

    return documents.select("doc_id").mapInPandas(
        batches, schema=WAV_MEDIA_SCHEMA
    )


def extract_wav_features(media: DataFrame) -> DataFrame:
    """REAL audio decode + DSP behind the Arrow ``mapInPandas`` boundary:
    for each binary payload, parse the WAV header, decode the PCM frames
    (:func:`decode_wav`), and compute integer-exact signal statistics
    from the DECODED samples — Σx² (for RMS), strict zero crossings
    (x_k·x_{k+1} < 0), and peak |x|.  Float math (the final
    sqrt-of-mean) stays JVM/engine-side so the oracle's expression tree
    is identical.  A payload that fails to parse yields
    ``decode_ok = false`` with zeroed stats instead of killing the
    stage (quarantine discipline, reference DEVELOPER_GUIDE.md's
    bad-record path)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rates, ns, ssqs, zcs, peaks, oks = [], [], [], [], [], []
            for payload in pdf["payload"]:
                try:
                    rate, xs = decode_wav(bytes(payload))
                    rates.append(rate)
                    ns.append(len(xs))
                    ssqs.append(sum(x * x for x in xs))
                    zcs.append(
                        sum(
                            1
                            for a, b in zip(xs, xs[1:])
                            if a * b < 0
                        )
                    )
                    peaks.append(max((abs(x) for x in xs), default=0))
                    oks.append(True)
                except (wave.Error, ValueError, EOFError, struct.error):
                    rates.append(0)
                    ns.append(0)
                    ssqs.append(0)
                    zcs.append(0)
                    peaks.append(0)
                    oks.append(False)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sample_rate": rates,
                    "n_samples": ns,
                    "sum_sq": ssqs,
                    "zero_crossings": zcs,
                    "peak": peaks,
                    "decode_ok": oks,
                }
            )

    return media.mapInPandas(batches, schema=WAV_FEATURE_SCHEMA)


PPM_MEDIA_SCHEMA = "media_id BIGINT, payload BINARY"

PPM_FEATURE_SCHEMA = (
    "media_id BIGINT, width INT, height INT, "
    "sum_r BIGINT, sum_g BIGINT, sum_b BIGINT, "
    "edge_energy BIGINT, decode_ok BOOLEAN"
)


def synth_pixel(seed: int, x: int, y: int, c: int) -> int:
    """Channel ``c`` of pixel (x, y) for ``seed``: ``(seed·(3xy + x +
    2y + c + 7) + 2654435761·(x + 17y + 31c)) mod 256`` — closed-form
    integer, oracle-replayable over an (x, y, c) grid."""
    return (
        seed * (3 * x * y + x + 2 * y + c + 7)
        + 2654435761 * (x + 17 * y + 31 * c)
    ) % 256


def synth_ppm(seed: int, width: int, height: int) -> bytes:
    """Build a GENUINE binary PPM (P6) image: real "P6\\n<w> <h>\\n255\\n"
    header, real RGB24 raster in row-major order, pixels from
    :func:`synth_pixel`.  The image twin of :func:`synth_wav_pcm16` —
    the stand-in for reading an image column off object storage, with
    everything downstream of the bytes being the real path."""
    header = f"P6\n{width} {height}\n255\n".encode()
    raster = bytes(
        synth_pixel(seed, x, y, c)
        for y in range(height)
        for x in range(width)
        for c in range(3)
    )
    return header + raster


def decode_ppm(payload: bytes) -> tuple[int, int, list[int]]:
    """REAL PPM (P6) decoder — pure stdlib, raises nothing in this
    sandbox: parses the magic, whitespace/comment-tolerant header
    tokens (width, height, maxval), then the binary RGB24 raster.
    Returns ``(width, height, flat_rgb)`` with ``len(flat_rgb) ==
    3·w·h``.  Raises ``ValueError`` on a wrong magic, maxval != 255, or
    a short raster.  This retires the image-decode stub the same way
    ``decode_wav`` retired the audio one; only compressed formats
    (JPEG/PNG) still wait on a library."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    # header = magic + 3 ASCII tokens, '#' comments legal between them
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if pos < len(payload) and payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace byte after maxval, then raster
    width, height, maxval = tokens
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval} (8-bit only)")
    need = 3 * width * height
    raster = payload[pos : pos + need]
    if len(raster) != need:
        raise ValueError(
            f"short PPM raster: {len(raster)} of {need} bytes"
        )
    return width, height, list(raster)


def make_ppm_table(
    documents: DataFrame, width: int = 8, height: int = 6
) -> DataFrame:
    """documents → a media table whose ``payload`` holds REAL P6 PPM
    bytes (Arrow-batched synth stage); ``seed = md5_64('ppm-v1:' ||
    doc_id) % 256`` so an oracle knows every pixel without parsing."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = [int(i) for i in pdf["doc_id"]]
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "payload": [
                        synth_ppm(
                            int(
                                hashlib.md5(
                                    f"ppm-v1:{i}".encode()
                                ).hexdigest()[17:32],
                                16,
                            )
                            % 256,
                            width,
                            height,
                        )
                        for i in ids
                    ],
                }
            )

    return documents.select("doc_id").mapInPandas(
        batches, schema=PPM_MEDIA_SCHEMA
    )


def extract_ppm_features(media: DataFrame) -> DataFrame:
    """REAL image decode + pixel statistics behind the Arrow boundary:
    parse the PPM header and raster (:func:`decode_ppm`), then compute
    per-channel brightness sums and a horizontal-gradient edge energy
    Σ|R(x+1,y) − R(x,y)| from the DECODED pixels — integer DSP, so an
    engine-independent oracle that replays the pixel formula must agree
    exactly.  Malformed payloads land as ``decode_ok = false`` with
    zeroed stats (quarantine discipline)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ws, hs, srs, sgs, sbs, edges, oks = (
                [], [], [], [], [], [], [],
            )
            for payload in pdf["payload"]:
                try:
                    w, h, px = decode_ppm(bytes(payload))
                    ws.append(w)
                    hs.append(h)
                    srs.append(sum(px[0::3]))
                    sgs.append(sum(px[1::3]))
                    sbs.append(sum(px[2::3]))
                    edge = 0
                    for y in range(h):
                        row = y * w * 3
                        for x in range(w - 1):
                            edge += abs(
                                px[row + 3 * (x + 1)] - px[row + 3 * x]
                            )
                    edges.append(edge)
                    oks.append(True)
                except (ValueError, IndexError):
                    ws.append(0)
                    hs.append(0)
                    srs.append(0)
                    sgs.append(0)
                    sbs.append(0)
                    edges.append(0)
                    oks.append(False)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": ws,
                    "height": hs,
                    "sum_r": srs,
                    "sum_g": sgs,
                    "sum_b": sbs,
                    "edge_energy": edges,
                    "decode_ok": oks,
                }
            )

    return media.mapInPandas(batches, schema=PPM_FEATURE_SCHEMA)


def make_audio_table(documents: DataFrame) -> DataFrame:
    """Derive a synthetic AUDIO table from `documents` (payload = utf-8
    text bytes; duration = n_chars ms, 16 kHz) — the test stand-in for a
    speech corpus."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.lit("audio").alias("kind"),
            F.lit("audio/wav").alias("mime"),
            F.lit(16000).alias("sample_rate"),
            F.col("n_chars").cast("int").alias("duration_ms"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def audio_windows(
    audio: DataFrame,
    win_ms: int = 400,
    hop_ms: int = 200,
    max_windows: int = 8,
) -> DataFrame:
    """Overlapping analysis windows over audio clips — the framing grid
    every speech-feature pipeline (fbank, wav2vec chunks) starts from.

    Pure Column algebra: window count/offsets come from the metadata
    (``meta.duration_ms``, ``meta.sample_rate``), the row multiplication
    is a JVM-side ``explode(sequence(...))``, and sample offsets are
    integer arithmetic — the actual waveform decode (the only part that
    would need an audio lib) stays behind the same Arrow-batched stub
    boundary as ``extract_features``.  A clip shorter than one window
    yields ONE truncated window ([0, duration)); otherwise full windows
    at ``hop_ms`` strides, capped at ``max_windows``.

    Returns (media_id, window_index, start_ms, end_ms, start_sample,
    end_sample, n_windows).
    """
    dur = F.col("meta.duration_ms")
    rate = F.col("meta.sample_rate")
    n_full = (
        F.floor((dur - F.lit(win_ms)) / F.lit(hop_ms)).cast("int") + 1
    )
    n_win = F.when(dur < win_ms, F.lit(1)).otherwise(
        F.least(n_full, F.lit(max_windows))
    )
    g = audio.select(
        "media_id",
        dur.alias("_dur"),
        rate.alias("_rate"),
        n_win.alias("n_windows"),
        F.explode(F.sequence(F.lit(0), n_win - 1)).alias("window_index"),
    )
    start = F.col("window_index") * F.lit(hop_ms)
    end = F.least(start + F.lit(win_ms), F.col("_dur"))
    return g.select(
        "media_id",
        "window_index",
        start.cast("int").alias("start_ms"),
        end.cast("int").alias("end_ms"),
        (start * F.col("_rate") / 1000).cast("bigint").alias("start_sample"),
        (end * F.col("_rate") / 1000).cast("bigint").alias("end_sample"),
        "n_windows",
    )


PPM_AHASH_SCHEMA = "media_id BIGINT, ahash BIGINT, decode_ok BOOLEAN"


def extract_ppm_ahash(media: DataFrame) -> DataFrame:
    """Average-hash (aHash) perceptual fingerprint from REAL PPM decode:
    parse header + raster (:func:`decode_ppm`), gray = r+g+b per pixel,
    bit(x, y) = 1 iff (w·h)·gray > Σgray (cross-multiplied — the mean
    threshold with NO division), packed raster-order into one BIGINT
    (bit index y·w + x).  The canonical cheap image-dedup key: identical
    frames collide exactly; near-identical frames land within a few
    Hamming bits.  Integer-only from decoded bytes, so a formula-
    replaying oracle agrees bit-for-bit.  Requires w·h ≤ 63 (one
    BIGINT); the synthetic 8×6 grid uses 48 bits.  Malformed payloads
    land as ``decode_ok = false`` with hash 0 (quarantine discipline).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            hashes, oks = [], []
            for payload in pdf["payload"]:
                try:
                    w, h, px = decode_ppm(bytes(payload))
                    if w * h > 63:
                        raise ValueError("aHash grid exceeds 63 bits")
                    grays = [
                        px[3 * i] + px[3 * i + 1] + px[3 * i + 2]
                        for i in range(w * h)
                    ]
                    tot = sum(grays)
                    hv = 0
                    for i, g in enumerate(grays):
                        if w * h * g > tot:
                            hv |= 1 << i
                    hashes.append(hv)
                    oks.append(True)
                except (ValueError, IndexError):
                    hashes.append(0)
                    oks.append(False)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "ahash": hashes,
                    "decode_ok": oks,
                }
            )

    return media.mapInPandas(batches, schema=PPM_AHASH_SCHEMA)


BMP_MEDIA_SCHEMA = "media_id BIGINT, payload BINARY"

BMP_FEATURE_SCHEMA = (
    "media_id BIGINT, width INT, height INT, "
    "sum_r BIGINT, sum_g BIGINT, sum_b BIGINT, "
    "vedge_energy BIGINT, decode_ok BOOLEAN"
)


def synth_bmp(seed: int, width: int, height: int) -> bytes:
    """Build a GENUINE 24-bit uncompressed Windows BMP: real 14-byte
    file header + 40-byte BITMAPINFOHEADER (all little-endian via
    ``struct``), real BGR raster stored BOTTOM-UP with each row padded
    to a 4-byte boundary — the three format mechanics PPM doesn't have.
    Pixels come from the same closed-form :func:`synth_pixel` (r, g, b
    = channels 0, 1, 2 of the row-major TOP-DOWN image), so the writer
    must flip rows and swap to BGR and the decoder must undo both —
    which is exactly what a value-checking oracle then proves."""
    stride = (3 * width + 3) & ~3
    rows = []
    for y in range(height - 1, -1, -1):  # bottom-up storage order
        row = bytearray()
        for x in range(width):
            row.append(synth_pixel(seed, x, y, 2))  # B
            row.append(synth_pixel(seed, x, y, 1))  # G
            row.append(synth_pixel(seed, x, y, 0))  # R
        row.extend(b"\x00" * (stride - 3 * width))
        rows.append(bytes(row))
    raster = b"".join(rows)
    pixel_offset = 14 + 40
    file_size = pixel_offset + len(raster)
    file_header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, pixel_offset)
    info_header = struct.pack(
        "<IiiHHIIiiII",
        40,            # biSize: BITMAPINFOHEADER
        width,         # biWidth
        height,        # biHeight > 0: bottom-up
        1,             # biPlanes
        24,            # biBitCount: RGB24
        0,             # biCompression: BI_RGB (uncompressed)
        len(raster),   # biSizeImage
        2835, 2835,    # 72 DPI in pixels/metre
        0, 0,          # palette unused at 24 bpp
    )
    return file_header + info_header + raster


def decode_bmp(payload: bytes) -> tuple[int, int, list[int]]:
    """REAL BMP decoder — pure stdlib ``struct``, raises nothing in
    this sandbox: validates the ``BM`` magic, reads the pixel-data
    offset from the file header, parses BITMAPINFOHEADER (24 bpp,
    BI_RGB only), then walks the padded bottom-up BGR raster back into
    row-major top-down flat RGB — ``(width, height, flat_rgb)`` with
    ``len(flat_rgb) == 3·w·h``, the same contract as
    :func:`decode_ppm`.  Negative biHeight (top-down storage) is
    handled per the spec.  Raises ``ValueError`` on wrong magic,
    non-BITMAPINFOHEADER, unsupported depth/compression, or a short
    raster.  Third REAL stdlib decoder after WAV and PPM; compressed
    formats (JPEG/PNG) remain documented library-blocked stubs."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pixel_offset = struct.unpack_from("<I", payload, 10)[0]
    bi_size, width, height_raw, planes, bitcount, compression = (
        struct.unpack_from("<IiiHHI", payload, 14)
    )
    if bi_size < 40:
        raise ValueError(f"unsupported DIB header size {bi_size}")
    if planes != 1 or bitcount != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP variant (planes={planes}, "
            f"bpp={bitcount}, compression={compression}); RGB24 "
            "BI_RGB only"
        )
    top_down = height_raw < 0
    height = -height_raw if top_down else height_raw
    if width <= 0 or height <= 0:
        raise ValueError(f"bad BMP dimensions {width}x{height}")
    stride = (3 * width + 3) & ~3
    need = stride * height
    raster = payload[pixel_offset : pixel_offset + need]
    if len(raster) != need:
        raise ValueError(f"short BMP raster: {len(raster)} of {need} bytes")
    flat: list[int] = []
    ys = range(height) if top_down else range(height - 1, -1, -1)
    for y in ys:
        base = y * stride
        for x in range(width):
            o = base + 3 * x
            flat.append(raster[o + 2])  # R (stored BGR)
            flat.append(raster[o + 1])  # G
            flat.append(raster[o])      # B
    return width, height, flat


def make_bmp_table(
    documents: DataFrame, width: int = 10, height: int = 7
) -> DataFrame:
    """documents → a media table whose ``payload`` holds REAL BMP24
    bytes (Arrow-batched synth stage); ``seed = md5_64('bmp-v1:' ||
    doc_id) % 256`` so an oracle knows every pixel without parsing.
    The default 10×7 grid makes the row stride 32 = 30 + 2 pad bytes,
    so the padding path is exercised on every row."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = [int(i) for i in pdf["doc_id"]]
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "payload": [
                        synth_bmp(
                            int(
                                hashlib.md5(
                                    f"bmp-v1:{i}".encode()
                                ).hexdigest()[17:32],
                                16,
                            )
                            % 256,
                            width,
                            height,
                        )
                        for i in ids
                    ],
                }
            )

    return documents.select("doc_id").mapInPandas(
        batches, schema=BMP_MEDIA_SCHEMA
    )


def extract_bmp_features(media: DataFrame) -> DataFrame:
    """REAL BMP decode + pixel statistics behind the Arrow boundary:
    per-channel brightness sums plus a VERTICAL-gradient edge energy
    Σ|R(x,y+1) − R(x,y)| from the DECODED top-down RGB pixels — the
    orthogonal gradient to the PPM path's horizontal one, so a hash
    match can't be inherited from the PPM query's green values; it has
    to come from this decoder's own row-flip/BGR/padding handling.
    Malformed payloads land as ``decode_ok = false`` with zeroed stats
    (quarantine discipline)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ws, hs, srs, sgs, sbs, edges, oks = (
                [], [], [], [], [], [], [],
            )
            for payload in pdf["payload"]:
                try:
                    w, h, px = decode_bmp(bytes(payload))
                    ws.append(w)
                    hs.append(h)
                    srs.append(sum(px[0::3]))
                    sgs.append(sum(px[1::3]))
                    sbs.append(sum(px[2::3]))
                    edge = 0
                    for y in range(h - 1):
                        for x in range(w):
                            edge += abs(
                                px[3 * ((y + 1) * w + x)]
                                - px[3 * (y * w + x)]
                            )
                    edges.append(edge)
                    oks.append(True)
                except (ValueError, IndexError):
                    ws.append(0)
                    hs.append(0)
                    srs.append(0)
                    sgs.append(0)
                    sbs.append(0)
                    edges.append(0)
                    oks.append(False)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": ws,
                    "height": hs,
                    "sum_r": srs,
                    "sum_g": sgs,
                    "sum_b": sbs,
                    "vedge_energy": edges,
                    "decode_ok": oks,
                }
            )

    return media.mapInPandas(batches, schema=BMP_FEATURE_SCHEMA)
