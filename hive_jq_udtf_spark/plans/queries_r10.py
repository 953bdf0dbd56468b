"""Round-10 queries.

- ``png_decode_stats`` — the from-scratch baseline PNG codec
  (VERDICT r9 #5) under the driver gate, on the bmp_decode_stats
  pattern: deterministic RGBA PNGs synthesized from document text
  bytes, ENCODED with mixed scanline filters (rows cycle filters
  0..4, so the driver-gated decode exercises every unfilter path
  including Paeth), decoded back by the real decoder inside the
  Arrow feature stage, reduced to integer-exact per-channel sums the
  oracle recomputes straight from the text bytes — it never sees a
  PNG, so a chunk/CRC/filter/channel bug in either codec direction
  is a value mismatch.

Registers into plans.queries.QUERIES/ORACLES on import.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .queries import ORACLES, QUERIES

# 5 x 6 RGBA = 120 payload bytes per image; 6 rows so 'mixed'
# filtering reaches filter 4 (Paeth) with row 5 wrapping back to 0
_PNG_W, _PNG_H, _PNG_C = 5, 6, 4
_PNG_NBYTES = _PNG_W * _PNG_H * _PNG_C


def q_png_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real PNG decode path, value-gated end-to-end.

    Scale audit: synthesis and decode are one Arrow mapInPandas pass
    each over a pruned 2-column scan (doc_id, text) — no shuffle, no
    collect; the per-image work is O(pixels) with zlib on ~100-byte
    buffers.  At 100 TB this is a pure map pipeline like the BMP/WAV
    twins (queries_r5.py).  Reference parity: the reference ships no
    media codecs; this closes the most common real image format with
    stdlib zlib only (operators/codecs.py::decode_png)."""
    import numpy as np

    from ..operators import codecs
    from ..operators.multimodal import MEDIA_SCHEMA, extract_features

    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 200)
        .select("doc_id", "text")
    )

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            rows = {"media_id": [], "modality": [], "content": [], "meta": []}
            for mid, text in zip(pdf["doc_id"], pdf["text"]):
                raw = (text or "").encode("utf-8")[:_PNG_NBYTES]
                buf = np.zeros(_PNG_NBYTES, dtype=np.uint8)
                buf[: len(raw)] = np.frombuffer(raw, dtype=np.uint8)
                png = codecs.encode_png(
                    buf.reshape(_PNG_H, _PNG_W, _PNG_C), filter_mode="mixed"
                )
                rows["media_id"].append(mid)
                rows["modality"].append("image")
                rows["content"].append(png)
                rows["meta"].append(
                    {
                        "mime": "image/png",
                        "width": _PNG_W,
                        "height": _PNG_H,
                        "duration_ms": None,
                        "n_bytes": len(png),
                    }
                )
            yield pd.DataFrame(rows)

    media = docs.mapInPandas(synth, schema=MEDIA_SCHEMA)
    feats = extract_features(media, dim=_PNG_C + 1, use_real_codecs=True)

    # integer channel SUMS recovered exactly from the float32 means
    # (sum <= 30*255 = 7650; float32 relative error ~6e-8 * 7650 <<
    # 0.5) — the bmp_decode_stats gate, bit-exact across codec,
    # schema, and oracle
    npix = _PNG_W * _PNG_H

    def ch_sum(i: int):
        return F.round(
            F.element_at("feature", i).cast("double") * (npix * 255)
        ).cast("bigint")

    return feats.select(
        "media_id",
        "decode_ok",
        ch_sum(1).alias("sum_r"),
        ch_sum(2).alias("sum_g"),
        ch_sum(3).alias("sum_b"),
        ch_sum(4).alias("sum_a"),
    ).orderBy("media_id")


# channel c = text byte positions p (1-based) with (p-1) % 4 == c,
# zero-padded to 120 bytes -> exact integer channel sums.  Bytes come
# from to_hex(encode(text)) — UTF-8 BYTE truncation like the Spark
# side, never character-based substr (the bmp_decode_stats rule,
# ADVICE r5).
_ORACLE_PNG_STATS = f"""
WITH base AS (SELECT doc_id, substr(to_hex(encode(text)), 1, {2 * _PNG_NBYTES}) AS hx
              FROM documents WHERE doc_id < 200),
pos AS (SELECT doc_id, i,
               ('0x' || substr(hx, CAST(2 * i - 1 AS INTEGER), 2))::INTEGER AS b
        FROM base, unnest(range(1, {_PNG_NBYTES + 1})) AS r(i)
        WHERE 2 * i <= length(hx)),
ch AS (SELECT doc_id, (i - 1) % 4 AS c, sum(b) AS s
       FROM pos GROUP BY 1, 2)
SELECT b.doc_id AS media_id, TRUE AS decode_ok,
       CAST(coalesce(max(CASE WHEN c = 0 THEN s END), 0) AS BIGINT) AS sum_r,
       CAST(coalesce(max(CASE WHEN c = 1 THEN s END), 0) AS BIGINT) AS sum_g,
       CAST(coalesce(max(CASE WHEN c = 2 THEN s END), 0) AS BIGINT) AS sum_b,
       CAST(coalesce(max(CASE WHEN c = 3 THEN s END), 0) AS BIGINT) AS sum_a
FROM base b LEFT JOIN ch ON ch.doc_id = b.doc_id
GROUP BY b.doc_id ORDER BY media_id
"""

QUERIES["png_decode_stats"] = q_png_decode_stats
ORACLES["png_decode_stats"] = _ORACLE_PNG_STATS
