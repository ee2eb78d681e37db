"""Multimodal column plumbing (beyond-reference LLM-pipeline surface) and
the Pandas-UDF operator surface (SURVEY.md X18).

Multimodal stance: image/audio/video payloads are opaque `binary` columns
with a typed metadata struct alongside. Decode / feature-extraction runs as
Arrow-batched `mapInPandas` — the Spark-side plumbing (schema, batch shape,
partitioning) is real and tested; the actual codec call is stubbed behind
a deterministic fake because the container ships no image/audio libs (see
`decode_image_stub`).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from elric_rs_spark.registry import query
from elric_rs_spark.tables import load_table

MULTIMODAL_SCHEMA = (
    "doc_id long, modality string, payload binary, "
    "meta struct<width:int, height:int, codec:string>"
)

FEATURE_SCHEMA = (
    "doc_id long, modality string, n_bytes int, header string, "
    "feat array<double>"
)


def decode_image_stub(payload: bytes) -> dict:
    """STUB codec: a real deployment calls PIL/librosa/ffmpeg here.
    Raises NotImplementedError for codecs we don't fake; produces a
    deterministic fake feature vector for the 'raw' codec so the pipeline
    is end-to-end testable without media libraries."""
    if payload is None:
        raise NotImplementedError("real decoder not available in this environment")
    # deterministic fake: 4 moments of the byte distribution
    import numpy as np

    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    if arr.size == 0:
        return {"n_bytes": 0, "header": "", "feat": [0.0, 0.0, 0.0, 0.0]}
    return {
        "n_bytes": int(arr.size),
        "header": payload[:4].hex(),
        "feat": [
            float(arr.mean()),
            float(arr.std()),
            float(arr.min()),
            float(arr.max()),
        ],
    }


def _extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: Arrow batches in, feature rows out. This is the
    exact batch shape a real decoder plugs into — one vectorized pass per
    Arrow batch, no per-row Python round trips through the JVM."""
    for pdf in batches:
        feats = [decode_image_stub(p) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "modality": pdf["modality"].values,
                "n_bytes": [f["n_bytes"] for f in feats],
                "header": [f["header"] for f in feats],
                "feat": [f["feat"] for f in feats],
            }
        )


def build_multimodal_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lift documents into the multimodal shape: utf-8 bytes play the
    opaque payload, metadata struct is synthesized."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.lit("image").alias("modality"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.col("n_chars").cast("int").alias("width"),
            F.lit(1).cast("int").alias("height"),
            F.lit("raw").alias("codec"),
        ).alias("meta"),
    )


@query("q_multimodal")  # rows-only: Pandas-UDF decode path, not SQL-expressible
def q_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode pipeline: binary payload + metadata -> mapInPandas
    feature extraction -> aggregate. Repartitioned by doc_id so decode
    parallelism is even regardless of upstream file layout."""
    mm = build_multimodal_table(spark, sf_dir).repartition(8, "doc_id")
    feats = mm.mapInPandas(_extract_features, FEATURE_SCHEMA)
    return feats.select(
        "doc_id",
        "modality",
        "n_bytes",
        "header",
        F.round(F.element_at("feat", 1), 6).alias("byte_mean"),
        F.round(F.element_at("feat", 2), 6).alias("byte_std"),
    )


@query(
    "q_udf_pandas",
    oracle="""
WITH stats AS (
  SELECT event_type,
         avg(value) AS mu,
         stddev_samp(value) AS sigma
  FROM events GROUP BY event_type
)
SELECT
  e.event_id,
  e.event_type,
  round((e.value - s.mu) / s.sigma, 6) AS value_zscore
FROM events e JOIN stats s ON e.event_type = s.event_type
""",
)
def q_udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas-UDF surface (X18): per-group z-score via applyInPandas
    (grouped-map, Arrow-batched). SQL-expressible, so unlike most UDF
    paths it gets a full value-checked oracle."""
    ev = load_table(spark, sf_dir, "events")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["value"].mean()
        sigma = pdf["value"].std(ddof=1)
        out = pdf[["event_id", "event_type"]].copy()
        out["value_zscore"] = ((pdf["value"] - mu) / sigma).round(6)
        return out

    return ev.groupBy("event_type").applyInPandas(
        zscore, "event_id long, event_type string, value_zscore double"
    )


# ---------------------------------------------------------------------------
# Audio: REAL decode via stdlib `wave` (no media libs needed). Payloads are
# genuine RIFF/WAVE files (PCM16 mono sine tones synthesized per doc), and
# the decoder parses the actual container + frames — this is the one
# modality where the full decode path runs for real in this environment.
# ---------------------------------------------------------------------------

AUDIO_RATE = 8000  # Hz
AUDIO_SCHEMA = (
    "doc_id long, sample_rate long, n_channels long, n_samples long, "
    "duration_ms long, rms double"
)


def synth_wav(doc_id: int, n_samples: int) -> bytes:
    """Deterministic fixture synthesis: a real PCM16 mono WAV of a sine
    tone whose amplitude derives from doc_id. This is test-data
    generation, not a codec stub — the bytes are a spec-conformant WAV
    any player could open."""
    import io
    import math
    import struct
    import wave

    amp = 1000 + (doc_id % 20000)
    samples = [
        int(amp * math.sin(2 * math.pi * 440 * i / AUDIO_RATE))
        for i in range(n_samples)
    ]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(AUDIO_RATE)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def decode_wav(payload: bytes) -> dict:
    """REAL audio decode: parse the RIFF/WAVE container and PCM frames
    with the stdlib `wave` module — header fields + RMS energy. The
    Spark-side contract is identical to a librosa/ffmpeg call."""
    import io
    import math
    import struct
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        n = w.getnframes()
        rate = w.getframerate()
        ch = w.getnchannels()
        raw = w.readframes(n)
    vals = struct.unpack(f"<{n * ch}h", raw)
    rms = math.sqrt(sum(v * v for v in vals) / len(vals)) if vals else 0.0
    return {
        "sample_rate": rate,
        "n_channels": ch,
        "n_samples": n,
        "duration_ms": n * 1000 // rate,
        "rms": rms,
    }


def _decode_audio(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = {k: [] for k in (
            "doc_id", "sample_rate", "n_channels", "n_samples",
            "duration_ms", "rms",
        )}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            d = decode_wav(payload)
            out["doc_id"].append(doc_id)
            for k in ("sample_rate", "n_channels", "n_samples", "duration_ms", "rms"):
                out[k].append(d[k])
        yield pd.DataFrame(out)


def _synth_audio(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "payload": [
                    synth_wav(int(i), int(n))
                    for i, n in zip(pdf["doc_id"], pdf["n_samples"])
                ],
            }
        )


@query(
    "q_multimodal_audio",
    oracle="""
SELECT
  doc_id,
  CAST(8000 AS BIGINT) AS sample_rate,
  CAST(1 AS BIGINT) AS n_channels,
  CAST((n_chars % 100 + 10) * 8 AS BIGINT) AS n_samples,
  CAST(((n_chars % 100 + 10) * 8) * 1000 // 8000 AS BIGINT) AS duration_ms
FROM documents
""",
)
def q_multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio decode, for REAL (stdlib wave): synthesize a true PCM WAV per
    document (one mapInPandas stage — fixture generation), then parse the
    container + frames back (a second mapInPandas stage — the actual
    decoder). The oracle predicts the container fields from the synthesis
    parameters, proving the bytes round-trip through a spec-conformant
    encode->decode; RMS energy is asserted against the analytic sine
    amplitude in pytest (not hash-stable enough for the oracle)."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", ((F.col("n_chars") % 100 + 10) * 8).alias("n_samples")
    ).repartition(spark.sparkContext.defaultParallelism, "doc_id")
    wavs = d.mapInPandas(_synth_audio, "doc_id long, payload binary")
    decoded = wavs.mapInPandas(_decode_audio, AUDIO_SCHEMA)
    return decoded.select(
        "doc_id", "sample_rate", "n_channels", "n_samples", "duration_ms"
    )


# ---------------------------------------------------------------------------
# Image: REAL decode of uncompressed 24-bit BMP (pure struct parsing, no
# PIL). Like the audio path: payloads are spec-conformant bitmaps
# synthesized per doc, the decoder parses the actual BITMAPFILEHEADER /
# BITMAPINFOHEADER and padded pixel rows.
# ---------------------------------------------------------------------------

BMP_HEIGHT = 4


def synth_bmp(doc_id: int, width: int) -> bytes:
    """Deterministic fixture synthesis: a real uncompressed 24bpp BMP
    (BM magic, 54-byte headers, 4-byte-aligned rows, bottom-up), pixel
    values a gradient seeded by doc_id. Spec-conformant — any viewer
    opens it."""
    import struct

    height = BMP_HEIGHT
    row_size = (3 * width + 3) // 4 * 4
    pixel_bytes = row_size * height
    rows = bytearray()
    for y in range(height):
        row = bytearray()
        for x in range(width):
            v = (doc_id * 31 + y * 17 + x * 7) % 256
            row += bytes((v, (v * 3) % 256, (v * 5) % 256))  # B, G, R
        row += b"\x00" * (row_size - len(row))
        rows += row
    file_header = struct.pack("<2sIHHI", b"BM", 54 + pixel_bytes, 0, 0, 54)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, pixel_bytes, 2835, 2835, 0, 0
    )
    return bytes(file_header + info_header + rows)


def decode_bmp(payload: bytes) -> dict:
    """REAL image decode: parse the BMP headers and pixel rows with
    struct — width/height/bpp plus the mean of each BGR channel over the
    unpadded pixels. The Spark-side contract is identical to a
    PIL.Image.open call."""
    import struct

    magic, _file_size, _r1, _r2, offset = struct.unpack_from("<2sIHHI", payload, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    (_hdr, width, height, _planes, bpp) = struct.unpack_from("<IiiHH", payload, 14)
    row_size = (bpp // 8 * width + 3) // 4 * 4
    sums = [0, 0, 0]
    n = 0
    for y in range(abs(height)):
        base = offset + y * row_size
        for x in range(width):
            i = base + 3 * x
            sums[0] += payload[i]
            sums[1] += payload[i + 1]
            sums[2] += payload[i + 2]
            n += 1
    return {
        "width": width,
        "height": abs(height),
        "bpp": bpp,
        "n_pixels": n,
        "mean_b": sums[0] / n if n else 0.0,
        "mean_g": sums[1] / n if n else 0.0,
        "mean_r": sums[2] / n if n else 0.0,
    }


IMAGE_SCHEMA = (
    "doc_id long, width long, height long, bpp long, n_pixels long, "
    "n_bytes long"
)


def _synth_and_decode_images(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = {k: [] for k in (
            "doc_id", "width", "height", "bpp", "n_pixels", "n_bytes",
        )}
        for doc_id, width in zip(pdf["doc_id"], pdf["width"]):
            payload = synth_bmp(int(doc_id), int(width))
            d = decode_bmp(payload)
            out["doc_id"].append(doc_id)
            out["width"].append(d["width"])
            out["height"].append(d["height"])
            out["bpp"].append(d["bpp"])
            out["n_pixels"].append(d["n_pixels"])
            out["n_bytes"].append(len(payload))
        yield pd.DataFrame(out)


@query(
    "q_multimodal_image",
    oracle="""
SELECT
  doc_id,
  CAST(doc_id % 13 + 3 AS BIGINT) AS width,
  CAST(4 AS BIGINT) AS height,
  CAST(24 AS BIGINT) AS bpp,
  CAST((doc_id % 13 + 3) * 4 AS BIGINT) AS n_pixels,
  CAST(54 + ((3 * (doc_id % 13 + 3) + 3) // 4 * 4) * 4 AS BIGINT) AS n_bytes
FROM documents
""",
)
def q_multimodal_image(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image decode, for REAL (struct-level BMP): synthesize a true
    uncompressed 24bpp bitmap per document and parse the actual headers +
    padded pixel rows back. The oracle predicts every container field —
    including the 4-byte row alignment in n_bytes — from the synthesis
    parameters, proving a spec-level encode->decode round-trip. Channel
    means are asserted against the gradient formula in pytest."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", (F.col("doc_id") % 13 + 3).alias("width")
    ).repartition(spark.sparkContext.defaultParallelism, "doc_id")
    return d.mapInPandas(_synth_and_decode_images, IMAGE_SCHEMA)


# ---------------------------------------------------------------------------
# Frame sampling + resize plumbing (video/image shape; codecs stubbed)
# ---------------------------------------------------------------------------

FRAME_SIZE_BYTES = 256  # fake fixed-size frame
FRAME_STRIDE = 4  # keep every 4th frame

FRAME_SCHEMA = (
    "doc_id long, frame_idx int, n_frame_bytes int, frame_mean double"
)


def resize_image_stub(payload: bytes, target_len: int) -> bytes:
    """STUB resize: a real deployment calls PIL.Image.resize here. The
    deterministic fake keeps every len//target-th byte — the Spark-side
    contract (bytes in, smaller bytes out, pure function) is what the
    pipeline tests."""
    if payload is None:
        raise NotImplementedError("real resizer not available in this environment")
    if len(payload) <= target_len:
        return payload
    step = len(payload) // target_len
    return payload[::step][:target_len]


def _sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: split each payload into fixed-size frames,
    keep every FRAME_STRIDE-th, emit one row per sampled frame — the
    batch shape of a real ffmpeg frame sampler (1 input row -> N output
    rows, vectorized per Arrow batch)."""
    for pdf in batches:
        out = {"doc_id": [], "frame_idx": [], "n_frame_bytes": [], "frame_mean": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            frames = [
                payload[i : i + FRAME_SIZE_BYTES]
                for i in range(0, len(payload), FRAME_SIZE_BYTES)
            ][::FRAME_STRIDE]
            for idx, fr in enumerate(frames):
                fr = resize_image_stub(fr, 64)
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(idx)
                out["n_frame_bytes"].append(len(fr))
                out["frame_mean"].append(float(sum(fr)) / max(len(fr), 1))
        yield pd.DataFrame(out)


@query("q_multimodal_frames")  # rows-only: Pandas-UDF frame sampler
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-shaped pipeline: payload -> frame split -> stride sampling ->
    per-frame resize + features, then a per-doc aggregate. 1->N row fan-out
    through mapInPandas; repartitioned so frame extraction parallelizes
    regardless of upstream layout."""
    mm = build_multimodal_table(spark, sf_dir).repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    frames = mm.mapInPandas(_sample_frames, FRAME_SCHEMA)
    return (
        frames.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.round(F.avg("frame_mean"), 6).alias("avg_frame_mean"),
            F.min("n_frame_bytes").alias("min_frame_bytes"),
        )
        .orderBy("doc_id")
    )


RESIZE_W, RESIZE_H = 2, 2

RESIZE_SCHEMA = (
    "doc_id long, rw long, rh long, b_sum long, g_sum long, r_sum long"
)


def resize_bmp_nearest(payload: bytes, out_w: int, out_h: int):
    """REAL nearest-neighbor resize: decode the BMP pixel grid into a
    numpy (h, w, 3) array — honoring the bottom-up row order, i.e. a
    true orientation-aware decode — and sample it at floor(i*src/dst)
    indices, the standard nearest-neighbor kernel (what PIL's
    Image.NEAREST computes). Returns the resized array (BGR)."""
    import struct

    import numpy as np

    magic, _sz, _r1, _r2, offset = struct.unpack_from("<2sIHHI", payload, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    (_hdr, width, height, _planes, bpp) = struct.unpack_from("<IiiHH", payload, 14)
    row_size = (bpp // 8 * width + 3) // 4 * 4
    h = abs(height)
    raw = np.frombuffer(payload, dtype=np.uint8, offset=offset, count=row_size * h)
    rows = raw.reshape(h, row_size)[:, : 3 * width].reshape(h, width, 3)
    img = rows[::-1]  # BMP stores bottom-up; flip to logical top-down
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * width) // out_w
    return img[ys][:, xs]


def _synth_and_resize_images(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    for pdf in batches:
        out = {k: [] for k in ("doc_id", "rw", "rh", "b_sum", "g_sum", "r_sum")}
        for doc_id, width in zip(pdf["doc_id"], pdf["width"]):
            payload = synth_bmp(int(doc_id), int(width))
            small = resize_bmp_nearest(payload, RESIZE_W, RESIZE_H)
            sums = small.reshape(-1, 3).astype(np.int64).sum(axis=0)
            out["doc_id"].append(doc_id)
            out["rw"].append(RESIZE_W)
            out["rh"].append(RESIZE_H)
            out["b_sum"].append(int(sums[0]))
            out["g_sum"].append(int(sums[1]))
            out["r_sum"].append(int(sums[2]))
        yield pd.DataFrame(out)


def _resize_oracle() -> str:
    """The oracle predicts the resized pixels from the synthesis gradient:
    logical sample rows floor(yy*4/2) map to storage rows 3 - 2*yy
    (bottom-up flip), sample cols are (xx*w)//2."""
    b_terms, g_terms, r_terms = [], [], []
    for yy in range(RESIZE_H):
        y_store = (4 - 1) - (yy * 4) // RESIZE_H
        for xx in range(RESIZE_W):
            x = f"(({xx} * w) // {RESIZE_W})"
            b = f"((doc_id * 31 + {y_store} * 17 + {x} * 7) % 256)"
            b_terms.append(b)
            g_terms.append(f"(({b} * 3) % 256)")
            r_terms.append(f"(({b} * 5) % 256)")
    return f"""
WITH p AS (SELECT doc_id, doc_id % 13 + 3 AS w FROM documents)
SELECT doc_id,
       CAST({RESIZE_W} AS BIGINT) AS rw,
       CAST({RESIZE_H} AS BIGINT) AS rh,
       CAST({' + '.join(b_terms)} AS BIGINT) AS b_sum,
       CAST({' + '.join(g_terms)} AS BIGINT) AS g_sum,
       CAST({' + '.join(r_terms)} AS BIGINT) AS r_sum
FROM p
"""


@query("q_multimodal_resize", oracle=_resize_oracle())
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize, for REAL (numpy nearest-neighbor over decoded BMP
    pixel grids — not the byte-subsampling stub): every document's
    synthesized bitmap is decoded orientation-aware (bottom-up flip),
    resized 2x2, and the resized pixels' channel sums are checked
    against a SQL oracle that re-derives each sampled pixel from the
    synthesis gradient — header parse, row padding, flip, and index
    math all verified end to end. Arrow-batched mapInPandas, same
    contract as a PIL.resize deployment."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", (F.col("doc_id") % 13 + 3).alias("width")
    ).repartition(spark.sparkContext.defaultParallelism, "doc_id")
    return d.mapInPandas(_synth_and_resize_images, RESIZE_SCHEMA)
