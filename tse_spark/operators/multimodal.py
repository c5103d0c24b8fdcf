"""Multimodal (image/audio/video) column plumbing for training-data
pipelines at 100 TB scale.

Media ride as opaque ``binary`` columns with typed metadata structs —
the Spark-side concerns (schema, Arrow batch shape, partition sizing,
iterator-based mapInPandas so one task never materializes its whole
partition of blobs) are real and tested; the actual byte decoding is
STUBBED behind ``decode_backend`` because no image/audio libs exist in
this container:

- ``decode_backend="fake"`` (default): deterministic pseudo-decode
  derived from the blob bytes (stable across runs/parallelism — usable
  in tests and benches);
- ``decode_backend="pillow"`` / ``"ffmpeg"``: raise NotImplementedError
  with the integration point documented, so swapping in a real decoder
  is a one-function change.

Fixture generation for the media table is in :func:`gen_media`.
"""

from __future__ import annotations

import hashlib
import struct

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
    python worker).  Swap ``decode_backend`` to integrate a real decoder.
    """
    if decode_backend != "fake":
        raise NotImplementedError(
            f"decode_backend={decode_backend!r}: install the codec lib and "
            "replace _fake_pixels with the real decode at this single call"
        )

    out_schema = (
        "media_id long, width int, height int, mean_px double, std_px double"
    )

    def run(batches):
        for pdf in batches:
            recs = []
            for r in pdf.itertuples():
                w = r.meta["width"] or 1
                h = r.meta["height"] or 1
                px = _fake_pixels(bytes(r.payload), int(w), int(h))
                recs.append(
                    (
                        int(r.media_id),
                        int(w),
                        int(h),
                        float(px.mean()),
                        float(px.std()),
                    )
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
    resample of the pseudo-decoded grid, re-encoded as raw bytes.  The
    batching/partitioning shape is exactly what a real resize needs."""
    if decode_backend != "fake":
        raise NotImplementedError("see decode_image_features")

    out_schema = "media_id long, payload binary, width int, height int"

    def run(batches):
        for pdf in batches:
            recs = []
            for r in pdf.itertuples():
                w = r.meta["width"] or 1
                h = r.meta["height"] or 1
                px = _fake_pixels(bytes(r.payload), int(w), int(h))
                yi = (np.arange(out_h) * h // out_h).astype(np.int64)
                xi = (np.arange(out_w) * w // out_w).astype(np.int64)
                small = px[np.ix_(yi, xi)]
                recs.append(
                    (int(r.media_id), small.tobytes(), out_w, out_h)
                )
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
        raise NotImplementedError("see decode_image_features")

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
    """(media_id, sample_rate, duration_s, bands array<double>) — the
    pseudo-decode treats payload bytes as 8-bit samples and emits
    per-band mean magnitudes (stand-in for MFCC/filterbank features)."""
    if decode_backend != "fake":
        raise NotImplementedError("see decode_image_features")

    out_schema = (
        "media_id long, sample_rate int, duration_s double, "
        "bands array<double>"
    )

    def run(batches):
        for pdf in batches:
            recs = []
            for r in pdf.itertuples():
                sr = int(r.meta["sample_rate"] or 8000)
                a = np.frombuffer(bytes(r.payload), dtype=np.uint8)
                a = a.astype(np.float64) - 128.0
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
