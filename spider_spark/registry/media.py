"""Multimodal plumbing (real image codec) — registry tier split out of the former
monolithic queries.py (round 4). Conventions live in
spider_spark/registry/__init__.py; enumeration order is preserved by
the import order there."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from spider_spark import media
from spider_spark.registry._base import T, q


# =====================================================================
# Multimodal plumbing
# =====================================================================

@q(
    "media_meta",
    """
    SELECT doc_id AS media_id,
           octet_length(encode(text))::BIGINT AS n_bytes,
           substr(sha256(text), 1, 16) AS sha256_prefix
    FROM documents
    """,
)
def media_meta(spark, sf_dir):
    """Opaque-binary metadata extraction through Arrow-batched mapInPandas
    (media.extract_media_meta); payload synthesized as utf-8 bytes of text.
    Decode columns (width/height) use the deterministic fake decoder and are
    asserted in pytest; the oracle checks the codec-free stat columns."""
    d = T(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"), F.encode("text", "UTF-8").alias("payload")
    )
    meta = media.extract_media_meta(d, decoder=media.fake_decoder)
    return meta.select("media_id", "n_bytes", "sha256_prefix")


@q(
    "media_resize",
    """
    WITH m AS (
      SELECT doc_id AS media_id,
             64 + ('0x' || substr(sha256(text), 1, 4))::INT % 512 AS w,
             64 + ('0x' || substr(sha256(text), 5, 4))::INT % 512 AS h
      FROM documents),
    s AS (SELECT media_id, w, h,
                 least(320.0 / w, 240.0 / h, 1.0) AS scale FROM m)
    SELECT media_id,
           w AS src_width, h AS src_height,
           greatest(1, floor(w * scale))::INT AS out_width,
           greatest(1, floor(h * scale))::INT AS out_height,
           greatest(1, floor(w * scale))::BIGINT
             * greatest(1, floor(h * scale))::BIGINT * 3 AS n_out_bytes
    FROM s
    """,
)
def media_resize(spark, sf_dir):
    """Fit-within image resize through Arrow-batched mapInPandas
    (media.resize_media — decode → scale → fake re-encode in one map-only
    task, no shuffle). Unlike media_meta, the DECODE output itself is
    oracle-checked: sha_dims_decoder derives dims from sha256(payload) so
    DuckDB reproduces decode + scale math value-level (the crc32-based
    fake_decoder has no DuckDB builtin); n_out_bytes pins the re-encode
    contract (3 bytes/px). Reference has no resize analog (media bytes go
    straight to disk, 钓鱼视频.py:25-28); this is builder-brief multimodal
    pipeline surface."""
    d = T(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"), F.encode("text", "UTF-8").alias("payload")
    )
    out = media.resize_media(d, 320, 240, decoder=media.sha_dims_decoder)
    return out.select("media_id", "src_width", "src_height",
                      "out_width", "out_height", "n_out_bytes")


@q(
    "media_frame_sample",
    """
    WITH m AS (SELECT doc_id AS media_id,
                      octet_length(encode(text)) // 16 + 1 AS n_frames
               FROM documents)
    SELECT media_id,
           unnest(generate_series(0, n_frames - 1, 3))::BIGINT AS frame_no
    FROM m
    """,
)
def media_frame_sample(spark, sf_dir):
    """Video frame-sampling plumbing (media.frame_sample_plan): each opaque
    media payload expands to every-3rd-frame decode tasks — the explode
    side of a mapInPandas decode (codec absent in this container; frame
    count derives deterministically from payload length, so the EXPANSION
    itself is oracle-checked). The explode is map-only (no shuffle): at
    100 TB the frame tasks inherit the media scan's partitioning and flow
    straight into the decode stage. Builder-brief multimodal surface
    (frame-sample); reference downloads video bytes wholesale
    (钓鱼视频.py:25-28) with no sampling tier."""
    d = T(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"), F.encode("text", "UTF-8").alias("payload")
    )
    plan = media.frame_sample_plan(d, every_n=3)
    return plan.select("media_id", F.col("frame_no").cast("long").alias("frame_no"))


def _plant_png_batches(it):
    """Deterministic real-PNG payloads from doc_id alone: solid gray
    (color = doc_id % 256) at w = 8 + doc_id % 24, h = 8 + 7*doc_id % 24 —
    dims/color an ANSI-SQL oracle can restate, bytes a real codec must
    actually decode."""
    import numpy as np
    import pandas as pd

    from spider_spark import imagecodec

    for pdf in it:
        payloads = []
        for did in pdf["doc_id"]:
            w = 8 + int(did) % 24
            h = 8 + (int(did) * 7) % 24
            c = int(did) % 256
            payloads.append(imagecodec.png_encode(np.full((h, w), c, dtype=np.uint8)))
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"].astype("int64"), "payload": payloads}
        )


def _planted_media(spark, sf_dir) -> DataFrame:
    # repartition the ids before planting: one parquet file → one task
    # otherwise, serializing all codec work (see media_jpeg_decode)
    d = (T(spark, sf_dir, "documents").select("doc_id")
         .repartition(max(2, spark.sparkContext.defaultParallelism)))
    return d.mapInPandas(_plant_png_batches, schema="media_id long, payload binary")


@q(
    "media_real_decode",
    """
    SELECT doc_id AS media_id,
           (8 + doc_id % 24)::INT AS width,
           (8 + (doc_id * 7) % 24)::INT AS height,
           'png' AS format
    FROM documents
    """,
)
def media_real_decode(spark, sf_dir):
    """REAL image decode through the default media pipeline (VERDICT r3
    item 5): payloads are actual PNG bytes written by the vendored codec
    (imagecodec.png_encode) and re-parsed by media.extract_media_meta's
    default decoder (imagecodec.sniff_dims — no fake injected). The oracle
    restates the planted dims from doc_id, so a decode that misreads IHDR
    hash-mismatches. Map-only both stages (plant + decode share the scan's
    partitioning; no shuffle)."""
    meta = media.extract_media_meta(_planted_media(spark, sf_dir))
    return meta.select("media_id", "width", "height", "format")


@q(
    "media_real_resize",
    """
    WITH m AS (
      SELECT doc_id AS media_id,
             8 + doc_id % 24 AS w,
             8 + (doc_id * 7) % 24 AS h
      FROM documents),
    s AS (SELECT media_id, w, h,
                 least(12.0 / w, 12.0 / h, 1.0) AS scale FROM m)
    SELECT media_id,
           greatest(1, floor(w * scale))::INT AS out_width,
           greatest(1, floor(h * scale))::INT AS out_height,
           (media_id % 256)::INT AS solid_color
    FROM s
    """,
)
def media_real_resize(spark, sf_dir):
    """Pixel-true decode → nearest-neighbor resize → PNG re-encode →
    re-decode, all with the vendored codec inside one Arrow-batched
    mapInPandas (no shuffle; per-row working set is one thumbnail). The
    re-decoded output must still be the planted solid color at the
    fit-within dims — pinning filter reversal, resize indexing, and the
    encoder, value-level, against SQL that never touches image bytes."""

    def batches(it):
        import pandas as pd

        from spider_spark import imagecodec

        for pdf in it:
            rows = {"media_id": [], "out_width": [], "out_height": [], "solid_color": []}
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                img = imagecodec.png_decode(bytes(b))
                h, w = img.shape[:2]
                scale = min(12 / w, 12 / h, 1.0)
                ow, oh = max(1, int(w * scale)), max(1, int(h * scale))
                out = imagecodec.png_decode(imagecodec.real_resizer(bytes(b), ow, oh))
                assert out.shape[:2] == (oh, ow)
                colors = set(out.reshape(-1).tolist())
                rows["media_id"].append(int(mid))
                rows["out_width"].append(ow)
                rows["out_height"].append(oh)
                rows["solid_color"].append(colors.pop() if len(colors) == 1 else -1)
            yield pd.DataFrame(rows)

    return _planted_media(spark, sf_dir).mapInPandas(
        batches, schema="media_id long, out_width int, out_height int, solid_color int"
    )


@q(
    "media_jpeg_decode",
    """
    SELECT doc_id AS media_id,
           (8 + doc_id % 29)::INT AS width,
           (8 + (doc_id * 5) % 29)::INT AS height,
           (CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END)::INT AS n_channels,
           (doc_id % 256)::INT AS solid_value
    FROM documents
    """,
)
def media_jpeg_decode(spark, sf_dir):
    """REAL baseline-JPEG pixel decode (VERDICT r4 item 4): per doc each
    task encodes a solid-value baseline sequential JPEG — grayscale for
    even ids, YCbCr 4:2:0 color for odd, RSTn markers every 2 MCUs when
    id % 3 == 0 — then decodes it back with imagecodec.jpeg_decode
    (Annex-K huffman decode, dequant, IDCT, chroma upsample, T.871 color
    convert) and reports dims / channel count / the uniform pixel value
    (-1 if decode isn't uniform). With quality-95 Annex-K tables the DC
    quant step is 2, so a flat field round-trips bit-exactly for every
    value 0-255 — the ANSI-SQL oracle restates the planted truth with no
    image math. Map-only (plant + decode inside one Arrow batch task,
    no shuffle); per-row working set is one thumbnail, bounded further
    by imagecodec.MAX_DECODE_PIXELS."""

    def batches(it):
        import numpy as np
        import pandas as pd

        from spider_spark import imagecodec

        for pdf in it:
            rows = {"media_id": [], "width": [], "height": [],
                    "n_channels": [], "solid_value": []}
            for did in pdf["doc_id"]:
                did = int(did)
                w = 8 + did % 29
                h = 8 + (did * 5) % 29
                v = did % 256
                shape = (h, w) if did % 2 == 0 else (h, w, 3)
                payload = imagecodec.jpeg_encode(
                    np.full(shape, v, dtype=np.uint8), quality=95,
                    subsampling="4:2:0",
                    restart_interval=2 if did % 3 == 0 else 0)
                img = imagecodec.jpeg_decode(payload)
                oh, ow = img.shape[:2]
                ch = 1 if img.ndim == 2 else img.shape[2]
                vals = set(img.reshape(-1).tolist())
                rows["media_id"].append(did)
                rows["width"].append(ow)
                rows["height"].append(oh)
                rows["n_channels"].append(ch)
                rows["solid_value"].append(vals.pop() if len(vals) == 1 else -1)
            yield pd.DataFrame(rows)

    # repartition the 8-byte ids BEFORE the codec work: a small-SF
    # documents table is one parquet file → one task, which would
    # serialize ~1 ms/doc of pure-Python codec onto a single core (at
    # warehouse scale the scan arrives multi-file and this shuffle is
    # noise either way)
    n_parts = max(2, spark.sparkContext.defaultParallelism)
    return (T(spark, sf_dir, "documents").select("doc_id")
            .repartition(n_parts)
            .mapInPandas(
                batches,
                schema="media_id long, width int, height int, n_channels int, solid_value int",
            ))


