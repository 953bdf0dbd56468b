"""Multimodal column operators (driver mandate, SURVEY §2.6).

Image/audio/video payloads are opaque ``binary`` columns with a
typed metadata struct; jq (on a JSON metadata column) doubles as the
metadata-extraction operator.  Decode/resize/frame-sample run as
Arrow-batched ``mapInPandas`` stages.

``use_real_codecs=True`` is REAL for the formats that need no
external library: 24-bit BMP and baseline PNG (8-bit RGB/RGBA)
images and 16-bit PCM WAV audio decode/encode/resize/feature-extract
through operators/codecs.py (pure stdlib struct + zlib + numpy —
value-tested against local references).  JPEG/MP4 remain stubbed
with a clear error: a DCT/video codec needs libraries this container
does not have; plug one into the same dispatch.

Scale shape: mapInPandas streams Arrow batches; binary payloads
never pass through Python row-at-a-time, and metadata-only
operations (filtering, routing by modality/size) stay JVM-side so
pruning happens before any decode."""

from __future__ import annotations

from struct import error as struct_error
from typing import Iterator
from zlib import error as zlib_error

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),  # image|audio|video|text
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                    T.StructField("n_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("decode_ok", T.BooleanType()),
    ]
)


def docs_as_media(docs: DataFrame) -> DataFrame:
    """Pack the documents table into the multimodal shape (text
    payloads as bytes) — the deterministic stand-in corpus."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text").alias("modality"),
        F.encode(F.col("text"), "utf-8").alias("content"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.length(F.encode(F.col("text"), "utf-8")).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def _fake_decode_features(content: bytes, modality: str, dim: int) -> list[float]:
    """Deterministic fake feature extractor: byte-histogram moments.
    Stands in for a real decoder+model; same signature and batch
    shape as the real thing."""
    if content is None:
        return [0.0] * dim
    n = len(content)
    out = []
    for i in range(dim):
        # stride the payload — cheap, deterministic, content-sensitive
        s = content[i::dim] if n else b""
        out.append(float(sum(s) % 997) / 997.0 if s else 0.0)
    return out


def _real_decode_features(content: bytes, dim: int) -> tuple[list[float], bool]:
    """Dispatch on the payload's magic bytes; BMP/PNG → per-channel
    pixel stats, WAV → PCM signal stats, all zero-padded to ``dim``.
    Unknown/undecodable payloads return (zeros, False) — a curation
    pipeline routes them, it doesn't crash on them."""
    import numpy as np

    from . import codecs

    if content is None:
        return [0.0] * dim, False

    def _pixel_feats(px):
        n = px.shape[0] * px.shape[1]
        if n == 0:
            return None
        # exact integer channel sums, THEN the two divisions — one
        # float rounding path, reproducible by plain SQL arithmetic
        # (per-element b/255 then mean would accumulate float error)
        means = [
            float(int(px[:, :, k].sum(dtype=np.int64))) / n / 255.0
            for k in range(px.shape[2])
        ]
        return means + [float((px.astype(np.float64) / 255.0).std())]

    try:
        if content[:2] == b"BM":
            feats = _pixel_feats(codecs.decode_bmp(bytes(content)))
            if feats is None:
                # a header can declare width/height 0 — route it, the
                # contract is decode_ok=False, never a task crash
                return [0.0] * dim, False
        elif bytes(content[:8]) == b"\x89PNG\r\n\x1a\n":
            feats = _pixel_feats(codecs.decode_png(bytes(content)))
            if feats is None:
                return [0.0] * dim, False
        elif bytes(content[:3]) == b"\xff\xd8\xff":
            feats = _pixel_feats(codecs.decode_jpeg(bytes(content)))
            if feats is None:
                return [0.0] * dim, False
        elif content[:4] == b"RIFF":
            samples, _rate = codecs.decode_wav(bytes(content))
            feats = codecs.wav_features(samples)
        else:
            return [0.0] * dim, False
    except (ValueError, struct_error, zlib_error):
        return [0.0] * dim, False
    return (feats + [0.0] * dim)[:dim], True


def extract_features(
    media: DataFrame, dim: int = 8, use_real_codecs: bool = False
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    use_real_codecs=True decodes BMP/WAV for real (codecs.py);
    anything else comes back decode_ok=False.  The default fake path
    (byte-histogram moments) keeps working for arbitrary payloads —
    it is the stand-in for decoders this container cannot host."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if use_real_codecs:
                pairs = [
                    _real_decode_features(c, dim) for c in pdf["content"]
                ]
                feats = [p[0] for p in pairs]
                oks = [p[1] for p in pairs]
            else:
                feats = [
                    _fake_decode_features(c, m, dim)
                    for c, m in zip(pdf["content"], pdf["modality"])
                ]
                oks = [c is not None for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "feature": feats,
                    "decode_ok": oks,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_images(
    media: DataFrame, width: int = 224, height: int = 224, use_real_codecs: bool = False
) -> DataFrame:
    """Image resize stage (stub): passes payloads through and stamps
    the target dimensions into metadata; a real implementation swaps
    the passthrough for decode→resize→encode inside the same
    mapInPandas body.

    use_real_codecs=True REALLY resizes BMP, PNG, and baseline JPEG
    payloads (decode → nearest-neighbor → re-encode, codecs.py; PNG
    keeps its RGB/RGBA channel count, JPEG its gray/color one);
    other payloads raise NotImplementedError — video stays stubbed."""
    out_schema = MEDIA_SCHEMA

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import codecs

        for pdf in batches:
            contents = list(pdf["content"])
            if use_real_codecs:
                resized = []
                for c in contents:
                    if c is None:
                        resized.append(None)
                        continue
                    if bytes(c[:2]) == b"BM":
                        px = codecs.decode_bmp(bytes(c))
                        resized.append(
                            codecs.encode_bmp(
                                codecs.resize_rgb_nearest(px, width, height)
                            )
                        )
                    elif bytes(c[:8]) == b"\x89PNG\r\n\x1a\n":
                        px = codecs.decode_png(bytes(c))
                        resized.append(
                            codecs.encode_png(
                                codecs.resize_rgb_nearest(px, width, height)
                            )
                        )
                    elif bytes(c[:3]) == b"\xff\xd8\xff":
                        px = codecs.decode_jpeg(bytes(c))
                        px = codecs.resize_rgb_nearest(px, width, height)
                        if px.shape[2] == 1:
                            px = px[:, :, 0]
                        resized.append(codecs.encode_jpeg(px))
                    else:
                        raise NotImplementedError(
                            "real resize implemented for BMP/PNG/JPEG "
                            "only — no video codec in this environment"
                        )
                contents = resized
            meta = [
                {
                    **(m or {}),
                    "width": width,
                    "height": height,
                    **(
                        {"n_bytes": len(c)}
                        if (use_real_codecs and c is not None)
                        else {}
                    ),
                }
                for m, c in zip(pdf["meta"], contents)
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "content": contents,
                    "meta": meta,
                }
            )

    return media.mapInPandas(run, schema=out_schema)


def sample_frames(
    media: DataFrame, every_ms: int = 1000, use_real_codecs: bool = False
) -> DataFrame:
    """Video frame sampling (stub): 1→N fan-out per video payload,
    one synthetic frame marker per interval of duration_ms."""
    if use_real_codecs:
        raise NotImplementedError("no video codecs in this environment")

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_ts_ms", T.LongType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "frame_ts_ms": [], "frame": []}
            for mid, meta, content in zip(pdf["media_id"], pdf["meta"], pdf["content"]):
                dur = (meta or {}).get("duration_ms") or 0
                n = max(int(dur // every_ms), 0)
                for i in range(n):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(i)
                    rows["frame_ts_ms"].append(i * every_ms)
                    rows["frame"].append(content[:16] if content is not None else None)
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=schema)


def modality_stats(media: DataFrame) -> DataFrame:
    """Metadata-only statistics — stays entirely JVM-side (column
    pruning drops the binary payload from the scan)."""
    return (
        media.groupBy("modality")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("meta.n_bytes")).alias("total_bytes"),
            F.round(F.avg(F.col("meta.n_bytes")), 4).alias("avg_bytes"),
        )
        .orderBy("modality")
    )
