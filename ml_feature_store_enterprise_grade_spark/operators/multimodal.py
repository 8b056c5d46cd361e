"""Multimodal column plumbing (SURVEY §7 M5 / BASELINE north star).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata.  The container ships no decode libraries (PIL/ffmpeg), so
the *decode kernel* is stubbed — but everything Spark-side is real
and tested: schema, binary encoding, Arrow batch shape through
``mapInPandas``, partitioning, and metadata extraction.

* ``multimodal_metadata`` — oracle-checked: byte length + content
  hash + deterministic pseudo-dimensions derived from the hash
  (stands in for width/height a real decoder would emit).
* ``multimodal_decode_features`` — rows-only: the full
  binary-payload → ``mapInPandas`` feature-extraction pipeline with
  a deterministic fake decoder (``decode_image`` raises
  ``NotImplementedError`` until a real codec is wired in).

Scale: payload tables at 100 TB are read with
``spark.sql.files.maxPartitionBytes`` sized so a batch of payloads
fits executor memory; the Arrow batch size caps per-batch decode
memory (``spark.sql.execution.arrow.maxRecordsPerBatch``).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load_table, spread
from ..registry import register


def binary_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal source frame: documents' text re-encoded as an
    opaque binary payload + typed metadata — the exact shape an
    image/audio table has (payload bytes + sidecar metadata)."""
    d = spread(load_table(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length("text").alias("n_bytes"),
            F.col("lang").alias("tag"),
        ).alias("meta"),
    )


@register(
    "multimodal_metadata",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5,
           CAST(16 + (CAST('0x' || substr(md5(text), 1, 6) AS BIGINT) % 624) AS INTEGER)
               AS pseudo_width,
           CAST(16 + (CAST('0x' || substr(md5(text), 7, 6) AS BIGINT) % 464) AS INTEGER)
               AS pseudo_height
    FROM documents
    """,
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata extraction over the binary payload: size, content
    hash, and deterministic pseudo-dimensions (hash-derived stand-ins
    for decoder-emitted width/height, keeping the query oracle-checkable
    without a codec)."""
    d = spread(load_table(spark, sf_dir, "documents"))
    md5 = F.md5("text")
    return d.select(
        "doc_id",
        F.octet_length("text").cast("bigint").alias("n_bytes"),
        md5.alias("content_md5"),
        (F.lit(16) + F.conv(F.substring(md5, 1, 6), 16, 10).cast("bigint") % 624)
        .cast("int")
        .alias("pseudo_width"),
        (F.lit(16) + F.conv(F.substring(md5, 7, 6), 16, 10).cast("bigint") % 464)
        .cast("int")
        .alias("pseudo_height"),
    )


try:  # guarded import: the container ships no PIL/libjpeg
    from PIL import Image as _PILImage  # type: ignore
except ImportError:  # pragma: no cover - exercised via monkeypatch
    _PILImage = None


def has_codec() -> bool:
    """True when a real image codec (PIL) is importable — the decode
    kernels select it at runtime, falling back to the deterministic
    fake featurizer so the Spark plumbing stays testable either way."""
    return _PILImage is not None


def decode_image(payload: bytes) -> object:
    """Real image decode via PIL when available; raises
    ``NotImplementedError`` otherwise (honest codec slot — the
    pipeline falls back to :func:`_fake_featurize`)."""
    if _PILImage is None:
        raise NotImplementedError(
            "no image codec in this environment; use fake_features"
        )
    import io

    return _PILImage.open(io.BytesIO(payload))


_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def _fake_featurize(payload: bytes) -> list[float]:
    """Deterministic 8-dim stand-in for a decoder+CNN featurizer:
    normalized byte histogram over 8 buckets."""
    if not payload:
        return [0.0] * 8
    hist = [0] * 8
    for by in payload:
        hist[by >> 5] += 1
    n = float(len(payload))
    return [round(h / n, 6) for h in hist]


def _codec_featurize(payload: bytes) -> list[float]:
    """Real featurizer: decode, grayscale, resize to 8x8, and emit
    the 8 per-row mean luminances normalized to [0, 1] — same 8-dim
    output contract as the fake, so downstream schemas are identical
    in both modes."""
    img = decode_image(payload).convert("L").resize((8, 8))
    px = list(img.getdata())
    return [round(sum(px[r * 8 : (r + 1) * 8]) / (8 * 255.0), 6) for r in range(8)]


def decode_features(df: DataFrame, use_codec: bool | None = None) -> DataFrame:
    """The multimodal feature-extraction operator: Arrow-batched
    ``mapInPandas`` over (doc_id, payload) producing typed features.
    Batch shape, schema and partitioning are production-real; the
    per-payload kernel selects the REAL codec featurizer at runtime
    when PIL is importable (``use_codec=None`` → :func:`has_codec`),
    else the deterministic fake.  Pass ``use_codec=False`` when the
    payload column is known not to hold decodable images (e.g. the
    registered oracle query, whose payloads are text bytes)."""
    if use_codec is None:
        use_codec = has_codec()
    featurize = _codec_featurize if use_codec else _fake_featurize

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len),
                    "mean_byte": payloads.map(
                        lambda p: round(sum(p) / len(p), 6) if len(p) else 0.0
                    ),
                    "feature": payloads.map(featurize),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(batches, _DECODE_SCHEMA)


@register("multimodal_decode_features", rows_only="pandas-UDF decode kernel: stubbed codec, not SQL-expressible; parity tested in tests/test_operators.py")
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered (rows-only) form of :func:`decode_features`.  The
    raw ``feature array<double>`` column is projected to a
    comma-joined string digest so the result frame is hashable by any
    pandas-side canonicalizer (ndarray cells are not); API users call
    :func:`decode_features` directly for the typed array."""
    # use_codec=False always: these payloads are text bytes, not
    # decodable images — deterministic in containers with or without
    # a codec installed.
    out = decode_features(binary_documents(spark, sf_dir), use_codec=False)
    return out.select(
        "doc_id",
        "n_bytes",
        "mean_byte",
        F.concat_ws(
            ",", F.transform("feature", lambda x: F.format_number(x, 6))
        ).alias("feature_csv"),
    )


_FRAME_BYTES = 64
_FRAME_STRIDE = 4


@register(
    "multimodal_frame_sample",
    oracle=f"""
    WITH f AS (
        SELECT doc_id, text,
               unnest(generate_series(0,
                   CAST(floor((length(text) - 1) / {_FRAME_BYTES * _FRAME_STRIDE}) AS INTEGER)
               )) AS k
        FROM documents
        WHERE length(text) >= 1
    )
    SELECT doc_id,
           CAST(k * {_FRAME_STRIDE} AS INTEGER) AS frame_idx,
           md5(substring(text, k * {_FRAME_BYTES * _FRAME_STRIDE} + 1, {_FRAME_BYTES})) AS frame_md5,
           CAST(length(substring(text, k * {_FRAME_BYTES * _FRAME_STRIDE} + 1, {_FRAME_BYTES})) AS INTEGER)
               AS n_frame_chars
    FROM f
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling, pure Catalyst: treat the payload as
    fixed-size frames and keep every Nth one via ``substring`` slicing
    — no Python in the hot path, so frame extraction whole-stage-
    codegens and scales like any projection.  A real container-format
    demuxer would replace fixed-size slicing with codec frame
    boundaries (that kernel belongs in ``decode_image``'s deployment
    slot); frame hashes keep it oracle-checkable.  Frames are
    character slices here because the stand-in payload is text (DuckDB
    cannot slice BLOBs with substring); byte slicing is the
    one-line swap for true binary payloads."""
    frames_per_stride = _FRAME_BYTES * _FRAME_STRIDE
    d = spread(load_table(spark, sf_dir, "documents")).filter(F.length("text") >= 1)
    k = F.explode(
        F.sequence(
            F.lit(0),
            F.floor((F.length("text") - 1) / frames_per_stride).cast("int"),
        )
    ).alias("k")
    f = d.select("doc_id", "text", k)
    frame = F.expr(f"substring(text, k * {frames_per_stride} + 1, {_FRAME_BYTES})")
    return f.select(
        "doc_id",
        (F.col("k") * _FRAME_STRIDE).cast("int").alias("frame_idx"),
        F.md5(frame).alias("frame_md5"),
        F.length(frame).cast("int").alias("n_frame_chars"),
    )


@register(
    "multimodal_frame_dedup",
    oracle=f"""
    WITH f AS (
        SELECT doc_id, text,
               unnest(generate_series(0,
                   CAST(floor((length(text) - 1) / {_FRAME_BYTES * _FRAME_STRIDE}) AS INTEGER)
               )) AS k
        FROM documents
        WHERE length(text) >= 1
    ),
    fr AS (
        SELECT doc_id,
               md5(substring(text, k * {_FRAME_BYTES * _FRAME_STRIDE} + 1, {_FRAME_BYTES}))
                   AS frame_md5
        FROM f
    )
    SELECT frame_md5,
           COUNT(*) AS n_frames,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           MIN(doc_id) AS canonical_doc_id
    FROM fr
    GROUP BY frame_md5
    HAVING COUNT(*) > 1
    """,
)
def multimodal_frame_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicate-frame detection: compose the frame
    sampler with the exact-dedup pattern (frame_md5 → hash-groupBy →
    dup groups), the way a video pipeline finds shared intro/outro
    segments or re-uploads.  One shuffle on the frame hash; the
    canonical representative is the lowest doc_id, matching
    operators.dedup's convention."""
    frames = multimodal_frame_sample(spark, sf_dir)
    return (
        frames.groupBy("frame_md5")
        .agg(
            F.count("*").alias("n_frames"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
        .filter(F.col("n_frames") > 1)
    )


@register(
    "multimodal_sidecar_kv",
    oracle="""
    WITH kv AS (
        SELECT d.doc_id, e.k, e.v
        FROM documents d, LATERAL (VALUES
            ('mime', 'text/plain'),
            ('lang', d.lang),
            ('bytes', CAST(d.n_chars AS VARCHAR)),
            ('camera', 'cam' || CAST(d.doc_id % 5 AS VARCHAR))
        ) e(k, v)
        WHERE d.lang IS NOT NULL AND d.n_chars IS NOT NULL
    )
    SELECT k, COUNT(*) AS n_docs,
           CAST(COUNT(DISTINCT v) AS BIGINT) AS n_values,
           MIN(v) AS min_value, MAX(v) AS max_value
    FROM kv GROUP BY k
    """,
)
def multimodal_sidecar_kv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXIF-style sidecar parsing: each payload arrives with an opaque
    JSON key-value sidecar (here synthesized deterministically from
    the document fields, as an upstream capture device would attach
    it); the operator parses it schema-on-read with
    ``from_json(map<string,string>)``, explodes the map, and profiles
    per-key cardinality/range — the P2 JSON family applied to the
    multimodal pillar.  The oracle computes the same profile straight
    from the base columns, so a green row proves the construct→parse→
    explode round trip is lossless.  Pure Catalyst: parse + generate +
    one shuffle on the key."""
    d = spread(load_table(spark, sf_dir, "documents")).filter(
        F.col("lang").isNotNull() & F.col("n_chars").isNotNull()
    )
    sidecar = F.concat(
        F.lit('{"mime":"text/plain","lang":"'),
        F.col("lang"),
        F.lit('","bytes":"'),
        F.col("n_chars").cast("string"),
        F.lit('","camera":"cam'),
        (F.col("doc_id") % 5).cast("string"),
        F.lit('"}'),
    )
    kv = d.select(
        "doc_id", F.explode(F.from_json(sidecar, "map<string,string>")).alias("k", "v")
    )
    return kv.groupBy("k").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("v").alias("n_values"),
        F.min("v").alias("min_value"),
        F.max("v").alias("max_value"),
    )


_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("thumbnail", T.BinaryType()),
    ]
)


def resize_images(
    df: DataFrame,
    width: int = 16,
    height: int = 16,
    use_codec: bool | None = None,
) -> DataFrame:
    """Image-resize operator shell: Arrow-batched ``mapInPandas`` with
    the production schema (doc_id, width, height, thumbnail binary).
    The kernel selects the real codec at runtime when PIL is
    importable (``use_codec=None`` → :func:`has_codec`): decode →
    grayscale → resize → raw luminance bytes.  Without a codec it is
    a deterministic fake (truncate/zero-pad the payload to
    width×height bytes)."""
    if use_codec is None:
        use_codec = has_codec()
    n = width * height

    def _codec_thumb(p: bytes) -> bytes:
        img = decode_image(p).convert("L").resize((width, height))
        return bytes(img.getdata())

    def _fake_thumb(p: bytes) -> bytes:
        return bytes(p[:n]) + b"\x00" * max(0, n - len(p))

    thumb = _codec_thumb if use_codec else _fake_thumb

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            thumbs = pdf["payload"].map(thumb)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": width,
                    "height": height,
                    "thumbnail": thumbs,
                }
            )

    return df.select("doc_id", "payload").mapInPandas(batches, _RESIZE_SCHEMA)


@register("multimodal_resize", rows_only="pandas-UDF resize kernel: stubbed codec, not SQL-expressible; shape tested in tests/test_operators.py")
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    # use_codec=False: text-byte payloads are not decodable images.
    return resize_images(binary_documents(spark, sf_dir), use_codec=False)
