"""Multimodal column plumbing (image/audio/video as opaque binary).

The reference downloads media bytes to files (钓鱼视频.py:25-28 video GET →
open(...,'wb')) and matches images in C++ (OpencvMatch/imgmatch.cpp) — the
Spark-native shape is a ``binary`` payload column + typed metadata struct,
processed in Arrow-batched ``mapInPandas`` so each task streams batches
without materializing whole partitions.

Image decode is REAL: the vendored pure-Python codec (imagecodec.py)
handles PNG (full pixel decode/encode), GIF (LZW first frame), and JPEG
dimensions, with no native library. Audio/video codecs are not in this
container, so those stay behind the injectable decoder seam. Everything
Spark-side — schema, batch iteration, partitioning, UDF signatures — is
identical whichever decoder is injected.
"""

from __future__ import annotations

import hashlib
import zlib
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "media_id long, n_bytes long, crc32 long, sha256_prefix string, "
    "width int, height int, format string, error string"
)


def decode_image(payload: bytes) -> tuple[int, int, str]:
    """(width, height, format) via the vendored pure-Python codec
    (imagecodec.sniff_dims): real header decode for PNG/GIF/JPEG.
    Unrecognized containers raise ValueError, which extract_media_meta
    turns into an ``error`` row (errors-become-data policy). Remains an
    injectable seam — deploys with native codecs pass their own."""
    from spider_spark import imagecodec

    return imagecodec.sniff_dims(payload)


def real_resizer(payload: bytes, out_w: int, out_h: int) -> bytes:
    """Pixel-true resize: decode (PNG/GIF) → nearest-neighbor → PNG
    re-encode, via the vendored codec. Counterpart of fake_resizer for
    payloads that are actual images."""
    from spider_spark import imagecodec

    return imagecodec.real_resizer(payload, out_w, out_h)


def fake_decoder(payload: bytes) -> tuple[int, int, str]:
    """Deterministic stand-in: derives dims from the payload hash — lets the
    full pipeline (schema, batching, error paths) run and be asserted on."""
    h = zlib.crc32(payload)
    return (64 + h % 512, 64 + (h >> 9) % 512, "fake")


def extract_media_meta(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    decoder: Callable[[bytes], tuple[int, int, str]] = decode_image,
) -> DataFrame:
    """Binary payloads → metadata rows via mapInPandas (Arrow batches).

    Decode failures land in ``error`` (never thrown — same policy as the
    parser, SURVEY.md §2.H.10). Stat columns (n_bytes, crc32, sha1) are
    always computed — they don't need a codec."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            # NULL payloads (failed fetches) become empty bytes so the
            # metadata row still emits (len 0, crc of b'', decode error in
            # the error column) — len(None) killed the python worker and
            # aborted the job, violating the errors-become-data policy
            body = pdf[payload_col].map(lambda b: b"" if b is None else bytes(b))
            out = {
                "media_id": pdf[id_col].astype("int64"),
                "n_bytes": body.map(len).astype("int64"),
                "crc32": body.map(zlib.crc32).astype("int64"),
                "sha256_prefix": body.map(
                    lambda b: hashlib.sha256(b).hexdigest()[:16]
                ),
            }
            dims = {"width": [], "height": [], "format": [], "error": []}
            for b in body:
                try:
                    w, h, fmt = decoder(bytes(b))
                    dims["width"].append(w)
                    dims["height"].append(h)
                    dims["format"].append(fmt)
                    dims["error"].append(None)
                except Exception as exc:  # noqa: BLE001 — error becomes data
                    dims["width"].append(None)
                    dims["height"].append(None)
                    dims["format"].append(None)
                    dims["error"].append(f"{type(exc).__name__}: {exc}")
            out.update(
                {
                    "width": pd.array(dims["width"], dtype="Int32"),
                    "height": pd.array(dims["height"], dtype="Int32"),
                    "format": dims["format"],
                    "error": dims["error"],
                }
            )
            yield pd.DataFrame(out)

    return media.select(id_col, payload_col).mapInPandas(batches, schema=MEDIA_META_SCHEMA)


def sha_dims_decoder(payload: bytes) -> tuple[int, int, str]:
    """Deterministic fake decoder whose dims an ANSI-SQL oracle can
    reproduce: width/height come from the first 8 hex chars of
    sha256(payload) (DuckDB: 64 + ('0x' || substr(sha256(col),1,4))::INT
    % 512), unlike fake_decoder's crc32 (no DuckDB builtin). Used by the
    registered media_resize query so decode+resize plumbing gets a
    value-level oracle, not just a pytest assertion."""
    h = hashlib.sha256(payload).hexdigest()
    return (64 + int(h[0:4], 16) % 512, 64 + int(h[4:8], 16) % 512, "fake")


def fake_resizer(payload: bytes, out_w: int, out_h: int) -> bytes:
    """Deterministic stand-in for the re-encode step: emits a fake RGB
    buffer of the right size class (3 bytes/pixel, content derived from
    the source digest) so byte-count invariants are assertable."""
    seed = hashlib.sha256(payload).digest()
    n = out_w * out_h * 3
    return (seed * (n // len(seed) + 1))[:n]


RESIZE_SCHEMA = (
    "media_id long, src_width int, src_height int, out_width int, "
    "out_height int, n_out_bytes long, error string"
)


def resize_media(
    media: DataFrame,
    max_w: int,
    max_h: int,
    id_col: str = "media_id",
    payload_col: str = "payload",
    decoder: Callable[[bytes], tuple[int, int, str]] = decode_image,
    resizer: Callable[[bytes, int, int], bytes] = None,
) -> DataFrame:
    """Fit-within resize through Arrow-batched ``mapInPandas`` — the
    image-resize leg of the multimodal pipeline (decode → scale →
    re-encode in one task, no shuffle: a pure map over payload batches,
    so it scales with input partitions and never materializes a partition
    in memory — per-row working set is one image).

    Scale factor = min(max_w/w, max_h/h, 1.0) (never upscales), output
    dims floor-rounded with a 1-px floor — the same IEEE-double
    expression the SQL oracle evaluates, so results are comparable
    value-level. Decode/resize failures land in ``error`` as data (parser
    policy, SURVEY.md §2.H.10). ``resizer`` defaults to fake_resizer;
    like the decoder it is injectable so a real codec drops in without
    touching the Spark plumbing."""
    resizer = resizer or fake_resizer

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k: [] for k in ("media_id", "src_width", "src_height",
                                    "out_width", "out_height", "n_out_bytes",
                                    "error")}
            for mid, b in zip(pdf[id_col], pdf[payload_col]):
                rows["media_id"].append(int(mid))
                try:
                    payload = bytes(b)
                    w, h, _fmt = decoder(payload)
                    scale = min(max_w / w, max_h / h, 1.0)
                    ow = max(1, int(w * scale))
                    oh = max(1, int(h * scale))
                    out = resizer(payload, ow, oh)
                    rows["src_width"].append(w)
                    rows["src_height"].append(h)
                    rows["out_width"].append(ow)
                    rows["out_height"].append(oh)
                    rows["n_out_bytes"].append(len(out))
                    rows["error"].append(None)
                except Exception as exc:  # noqa: BLE001 — error becomes data
                    for k in ("src_width", "src_height", "out_width",
                              "out_height", "n_out_bytes"):
                        rows[k].append(None)
                    rows["error"].append(f"{type(exc).__name__}: {exc}")
            yield pd.DataFrame(
                {
                    "media_id": pd.array(rows["media_id"], dtype="int64"),
                    "src_width": pd.array(rows["src_width"], dtype="Int32"),
                    "src_height": pd.array(rows["src_height"], dtype="Int32"),
                    "out_width": pd.array(rows["out_width"], dtype="Int32"),
                    "out_height": pd.array(rows["out_height"], dtype="Int32"),
                    "n_out_bytes": pd.array(rows["n_out_bytes"], dtype="Int64"),
                    "error": rows["error"],
                }
            )

    return media.select(id_col, payload_col).mapInPandas(batches, schema=RESIZE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int,
                      id_col: str = "media_id",
                      payload_col: str = "payload") -> DataFrame:
    """Video frame-sampling *plumbing*: expands each media row into frame
    tasks (media_id, frame_no) without decoding — the explode side of a
    decode that would run in the same mapInPandas slot. Deterministic frame
    count derives from payload length (real decoder would read container
    metadata)."""
    n_frames = (F.octet_length(F.col(payload_col)) / F.lit(16)).cast("int") + 1
    return media.select(
        F.col(id_col).alias("media_id"),
        F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))).alias("frame_no"),
    )


# ----------------------------------------------------- content-type sniffing
#: magic-byte verdict → the MIME type an honest server would declare
MAGIC_MIME = {
    "pdf": "application/pdf", "png": "image/png", "jpeg": "image/jpeg",
    "gif": "image/gif", "gzip": "application/gzip", "zip": "application/zip",
    "webm": "video/webm", "mp3": "audio/mpeg", "webp": "image/webp",
    "mp4": "video/mp4", "html": "text/html",
}


def sniff_type_col(payload) -> "F.Column":
    """Magic-byte content sniffing, pure JVM (hex-prefix CASE inside
    codegen — no UDF, no decode): the crawl-side router that decides
    parse-vs-media-vs-skip BEFORE trusting the server's Content-Type.
    Servers lie (the classic crawl QA signal is sniffed≠declared);
    signatures are the public file-magic constants. Binary-safe: never
    casts payload to string (ANSI would throw on non-UTF-8 bytes)."""
    hx = F.hex(F.substring(payload, 1, 12))
    return (
        F.when(hx.startswith("25504446"), "pdf")
        .when(hx.startswith("89504E47"), "png")
        .when(hx.startswith("FFD8FF"), "jpeg")
        .when(hx.startswith("47494638"), "gif")
        .when(hx.startswith("1F8B"), "gzip")
        .when(hx.startswith("504B0304"), "zip")
        .when(hx.startswith("1A45DFA3"), "webm")
        .when(hx.startswith("494433"), "mp3")
        .when(
            (F.substring(payload, 1, 4) == F.lit(b"RIFF"))
            & (F.substring(payload, 9, 4) == F.lit(b"WEBP")), "webp")
        .when(F.substring(payload, 5, 4) == F.lit(b"ftyp"), "mp4")
        .when(hx.startswith("3C3F786D6C"), "xml")  # '<?xml' declaration
        .when(hx.startswith("3C"), "html")  # '<' first byte
        .otherwise("unknown")
    )


def declared_mime_col(content_type) -> "F.Column":
    """'Text/HTML ; charset=...' → 'text/html' (lowercased, params dropped)."""
    return F.lower(F.trim(F.split(content_type, ";")[0]))


def declared_charset_col(content_type) -> "F.Column":
    """charset parameter, lowercased; NULL when absent (quotes tolerated)."""
    cs = F.regexp_extract(F.lower(content_type), r'charset\s*=\s*"?([a-z0-9_\-]+)', 1)
    return F.when(cs != "", cs)


def type_mismatch_col(sniffed, declared_mime) -> "F.Column":
    """True when the bytes contradict the header — sniffed maps to a known
    MIME and the server declared something else. 'unknown' bytes never
    mismatch (no evidence)."""
    expected = F.lit(None).cast("string")
    for k, v in sorted(MAGIC_MIME.items()):
        expected = F.when(sniffed == k, v).otherwise(expected)
    # xml bytes ('<?xml') are honestly served under MANY mimes
    # (application/xml, text/xml, +rss/+atom/+svg suffixes) — a single
    # expected value flagged every honest XML response as a lying server
    xml_ok = declared_mime.contains("xml")
    return F.when(sniffed == "xml", ~xml_ok).otherwise(
        expected.isNotNull() & (expected != declared_mime)
    )
