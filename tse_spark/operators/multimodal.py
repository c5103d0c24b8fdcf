"""Multimodal (image/audio/video) column plumbing for training-data
pipelines at 100 TB scale.

Media ride as opaque ``binary`` columns with typed metadata structs —
the Spark-side concerns (schema, Arrow batch shape, partition sizing,
iterator-based mapInPandas so one task never materializes its whole
partition of blobs) are real and tested.  ``decode_backend`` selects
the byte decoder:

- ``"fake"`` (default): deterministic pseudo-decode derived from the
  blob bytes (stable across runs/parallelism — the oracle-checkable
  mode the driver correctness gate uses);
- ``"stdlib"``: REAL byte decoding with no third-party deps —
  :func:`decode_png` (8-bit gray/RGB PNG: zlib inflate + all five
  scanline filters incl. Paeth) and :func:`decode_wav` (RIFF/PCM via
  the ``wave`` module), pytest-verified on real encoded blobs;
- ``"pillow"``: PIL-backed image decode for arbitrary formats —
  activates when pillow is importable, otherwise raises
  NotImplementedError EAGERLY (at operator build, not inside tasks);
- ``"ffmpeg"``: video/audio container demux — NotImplementedError with
  the integration point documented (no ffmpeg in this container).

Fixture generation for the media table is in :func:`gen_media`.
"""

from __future__ import annotations

import hashlib
import io
import struct
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                ]
            ),
            False,
        ),
    ]
)

_KINDS = ("image", "audio", "video")
_MIMES = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}


def _payload_bytes(i: int) -> bytes:
    """Deterministic payload for media_id ``i``: byte j is
    ``(i*131 + j*7) % 256``.  The law is intentionally plain modular
    arithmetic (not a hash) so a SQL oracle can recompute the expected
    DECODED features from media_id alone — the Spark side still decodes
    the actual bytes, so the oracle cross-checks the whole
    generate -> store -> decode round trip."""
    size = 64 + ((i * 131) % 64) * 4
    j = np.arange(size, dtype=np.int64)
    return ((i * 131 + j * 7) % 256).astype(np.uint8).tobytes()


def _meta_for(i: int, kind: str) -> dict:
    return {
        "width": 16 + (i * 37) % 64 if kind in ("image", "video") else None,
        "height": 16 + (i * 53) % 64 if kind in ("image", "video") else None,
        "sample_rate": 8000 + 100 * ((i * 29) % 9) if kind == "audio" else None,
        "n_frames": 1 + (i * 17) % 32 if kind == "video" else None,
    }


def gen_media(n_rows: int, seed: int = 42) -> pd.DataFrame:
    """Deterministic media blobs + typed metadata (no external data;
    see :func:`_payload_bytes` for the SQL-mirrorable generation law).
    ``seed`` is accepted for API stability but unused — content is a
    pure function of media_id."""
    return _gen_media_pdf(np.arange(n_rows, dtype=np.int64))


def _gen_media_pdf(ids: np.ndarray) -> pd.DataFrame:
    rows = []
    for i in ids:
        i = int(i)
        kind = _KINDS[i % 3]
        rows.append(
            {
                "media_id": i,
                "kind": kind,
                "mime": _MIMES[kind],
                "payload": _payload_bytes(i),
                "meta": _meta_for(i, kind),
            }
        )
    return pd.DataFrame(rows)


def media_df(spark: SparkSession, n_rows: int = 300) -> DataFrame:
    """Distributed media table: generation runs inside mapInPandas over
    ``spark.range`` splits (content is a pure function of media_id, so
    the result is identical at any parallelism) — no driver-side
    materialization, scales to any n_rows."""

    def gen(batches):
        for pdf in batches:
            yield _gen_media_pdf(pdf["id"].to_numpy())

    return spark.range(n_rows).mapInPandas(gen, schema=MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# real byte codecs (pure stdlib): PNG and WAV
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_png(px: np.ndarray) -> bytes:
    """Minimal real PNG encoder (stdlib zlib): uint8 (h, w) gray or
    (h, w, 3) RGB, filter 0 scanlines.  Produces standard PNGs any
    viewer opens; used by the resize path and the codec tests."""
    px = np.ascontiguousarray(px, dtype=np.uint8)
    if px.ndim == 2:
        h, w, ctype, ch = px.shape[0], px.shape[1], 0, 1
    elif px.ndim == 3 and px.shape[2] == 3:
        h, w, ctype, ch = px.shape[0], px.shape[1], 2, 3
    else:
        raise ValueError("need (h, w) gray or (h, w, 3) RGB uint8")
    rows = px.reshape(h, w * ch)
    raw = b"".join(b"\x00" + rows[y].tobytes() for y in range(h))

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> np.ndarray:
    """Minimal real PNG decoder (stdlib zlib): 8-bit depth, color types
    0 (gray) / 2 (RGB), no interlace — the common case for stored
    training images; anything else raises (route to the pillow
    backend).  Implements all five scanline filters (None/Sub/Up/
    Average/Paeth), so PNGs from real encoders decode too, not just
    :func:`encode_png`'s filter-0 output."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, width, height, ctype, idat = 8, None, None, None, []
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + body + crc
        if tag == b"IHDR":
            width, height, depth, ctype, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if depth != 8 or ctype not in (0, 2) or interlace:
                raise ValueError(
                    "unsupported PNG variant (need 8-bit gray/RGB, "
                    "no interlace) — use decode_backend='pillow'"
                )
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("no IHDR chunk")
    raw = zlib.decompress(b"".join(idat))
    ch = 1 if ctype == 0 else 3
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise ValueError("scanline data size mismatch")
    img = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int64)
        if f == 0:
            cur = line
        elif f == 2:  # Up — vectorized (the common filter)
            cur = (line + prev) & 0xFF
        elif f in (1, 3, 4):  # Sub/Average/Paeth: left-dependency loop
            cur = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + b) // 2
                else:
                    pred = _paeth(int(a), int(b), int(c))
                cur[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {f}")
        prev = cur
        img[y] = cur.astype(np.uint8)
    return img.reshape(height, width) if ch == 1 else img.reshape(
        height, width, 3
    )


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Real 16-bit PCM mono WAV encoder (stdlib ``wave``)."""
    import wave

    s = np.clip(np.asarray(samples), -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(int(sample_rate))
        w.writeframes(s.tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """Real RIFF/PCM WAV decoder (stdlib ``wave``): returns
    (sample_rate, float64 samples); 8-bit is centered at 0, multi-
    channel is averaged to mono."""
    import wave

    with wave.open(io.BytesIO(data), "rb") as w:
        sr = w.getframerate()
        sw = w.getsampwidth()
        nch = w.getnchannels()
        raw = w.readframes(w.getnframes())
    if sw == 1:
        a = np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0
    elif sw == 2:
        a = np.frombuffer(raw, dtype="<i2").astype(np.float64)
    else:
        raise ValueError(f"unsupported PCM sample width {sw}")
    if nch > 1:
        a = a.reshape(-1, nch).mean(axis=1)
    return sr, a


def _image_decoder(decode_backend: str):
    """Resolve the per-blob image decode function for a backend, or
    raise NotImplementedError EAGERLY (operator build time, not inside
    Spark tasks)."""
    if decode_backend == "stdlib":
        return decode_png
    if decode_backend == "pillow":
        try:
            from PIL import Image  # type: ignore[import-not-found]
        except ImportError as e:  # pragma: no cover - env-dependent
            raise NotImplementedError(
                "decode_backend='pillow' needs the pillow package "
                "(pip install pillow); decode_backend='stdlib' handles "
                "8-bit gray/RGB PNG with no deps"
            ) from e

        def _pil(data: bytes) -> np.ndarray:  # pragma: no cover
            return np.asarray(Image.open(io.BytesIO(data)))

        return _pil
    raise NotImplementedError(
        f"decode_backend={decode_backend!r}: no such image decoder "
        "(have: fake, stdlib, pillow)"
    )


def _fake_pixels(payload: bytes, w: int, h: int) -> np.ndarray:
    """Deterministic pseudo-decode: tile the payload bytes into (h, w)."""
    a = np.frombuffer(payload, dtype=np.uint8)
    need = w * h
    reps = (need // a.size) + 1
    return np.tile(a, reps)[:need].reshape(h, w)


def decode_image_features(
    media: DataFrame, decode_backend: str = "fake"
) -> DataFrame:
    """(media_id, width, height, mean_px, std_px) for image/video rows.

    mapInPandas over an iterator of Arrow batches: blobs stream through
    the task batch-by-batch (spark.sql.execution.arrow.maxRecordsPerBatch
    bounds peak memory — size it so batch_rows * max_blob fits the
    python worker).

    ``decode_backend="fake"`` pseudo-decodes with (w, h) from the meta
    struct (the oracle-checkable mode); real backends ("stdlib" PNG,
    "pillow") decode the actual payload bytes and report the DECODED
    dimensions; mean/std are over all samples (channels flattened).
    """
    decode = None if decode_backend == "fake" else _image_decoder(
        decode_backend
    )

    out_schema = (
        "media_id long, width int, height int, mean_px double, std_px double"
    )

    def run(batches):
        for pdf in batches:
            recs = []
            for r in pdf.itertuples():
                if decode is None:
                    w = int(r.meta["width"] or 1)
                    h = int(r.meta["height"] or 1)
                    px = _fake_pixels(bytes(r.payload), w, h)
                else:
                    px = decode(bytes(r.payload))
                    h, w = int(px.shape[0]), int(px.shape[1])
                a = px.astype(np.float64)
                recs.append(
                    (int(r.media_id), w, h, float(a.mean()), float(a.std()))
                )
            yield pd.DataFrame(
                recs,
                columns=["media_id", "width", "height", "mean_px", "std_px"],
            )

    imgs = media.filter(F.col("kind").isin("image", "video"))
    return imgs.mapInPandas(run, schema=out_schema)


def resize_images(
    media: DataFrame, out_w: int, out_h: int, decode_backend: str = "fake"
) -> DataFrame:
    """(media_id, payload binary, width, height) — nearest-neighbor
    resample.  "fake" resamples the pseudo-decoded grid and emits raw
    bytes; "stdlib"/"pillow" decode the real payload and re-encode the
    resized image as a real PNG (:func:`encode_png`)."""
    decode = None if decode_backend == "fake" else _image_decoder(
        decode_backend
    )

    out_schema = "media_id long, payload binary, width int, height int"

    def run(batches):
        for pdf in batches:
            recs = []
            for r in pdf.itertuples():
                if decode is None:
                    w = int(r.meta["width"] or 1)
                    h = int(r.meta["height"] or 1)
                    px = _fake_pixels(bytes(r.payload), w, h)
                else:
                    px = decode(bytes(r.payload))
                    h, w = int(px.shape[0]), int(px.shape[1])
                yi = (np.arange(out_h) * h // out_h).astype(np.int64)
                xi = (np.arange(out_w) * w // out_w).astype(np.int64)
                small = px[np.ix_(yi, xi)]
                payload = (
                    small.tobytes()
                    if decode is None
                    else encode_png(small.astype(np.uint8))
                )
                recs.append((int(r.media_id), payload, out_w, out_h))
            yield pd.DataFrame(
                recs, columns=["media_id", "payload", "width", "height"]
            )

    imgs = media.filter(F.col("kind").isin("image", "video"))
    return imgs.mapInPandas(run, schema=out_schema)


def sample_video_frames(
    media: DataFrame, every_n: int = 4, decode_backend: str = "fake"
) -> DataFrame:
    """Explode videos to (media_id, frame_no, frame binary): payload is
    treated as n_frames equal slices, every ``every_n``-th kept."""
    if decode_backend != "fake":
        raise NotImplementedError(
            f"decode_backend={decode_backend!r}: real container demux "
            "needs ffmpeg (absent here); integrate it at this single "
            "call site — the batching/schema shape is unchanged"
        )

    out_schema = "media_id long, frame_no int, frame binary"

    def run(batches):
        for pdf in batches:
            ids, fnos, frames = [], [], []
            for r in pdf.itertuples():
                n = int(r.meta["n_frames"] or 1)
                payload = bytes(r.payload)
                step = max(len(payload) // n, 1)
                for f in range(0, n, every_n):
                    ids.append(int(r.media_id))
                    fnos.append(f)
                    frames.append(payload[f * step : (f + 1) * step])
            yield pd.DataFrame(
                {"media_id": ids, "frame_no": fnos, "frame": frames}
            )

    vids = media.filter(F.col("kind") == "video")
    return vids.mapInPandas(run, schema=out_schema)


def audio_features(
    media: DataFrame, n_bands: int = 8, decode_backend: str = "fake"
) -> DataFrame:
    """(media_id, sample_rate, duration_s, bands array<double>) —
    per-band mean magnitudes over ``n_bands`` equal time segments
    (stand-in for MFCC/filterbank features).  "fake" treats payload
    bytes as centered 8-bit samples with sample_rate from the meta
    struct; "stdlib" REALLY parses the payload as RIFF/PCM WAV
    (:func:`decode_wav`) and takes sample_rate from the header."""
    if decode_backend not in ("fake", "stdlib"):
        raise NotImplementedError(
            f"decode_backend={decode_backend!r}: no such audio decoder "
            "(have: fake, stdlib; mp3/ogg need an ffmpeg integration "
            "at this single call site)"
        )

    out_schema = (
        "media_id long, sample_rate int, duration_s double, "
        "bands array<double>"
    )

    def run(batches):
        for pdf in batches:
            recs = []
            for r in pdf.itertuples():
                if decode_backend == "fake":
                    sr = int(r.meta["sample_rate"] or 8000)
                    a = np.frombuffer(bytes(r.payload), dtype=np.uint8)
                    a = a.astype(np.float64) - 128.0
                else:
                    sr, a = decode_wav(bytes(r.payload))
                pad = (-a.size) % n_bands
                if pad:
                    a = np.pad(a, (0, pad))
                bands = np.abs(a.reshape(n_bands, -1)).mean(axis=1)
                # raw (unrounded) duration: rounding policy belongs to
                # the query layer (Spark F.round HALF_UPs like DuckDB;
                # Python round() half-evens and would diverge)
                recs.append(
                    (
                        int(r.media_id),
                        sr,
                        a.size / sr,
                        [float(x) for x in bands],
                    )
                )
            yield pd.DataFrame(
                recs,
                columns=["media_id", "sample_rate", "duration_s", "bands"],
            )

    auds = media.filter(F.col("kind") == "audio")
    return auds.mapInPandas(run, schema=out_schema)
