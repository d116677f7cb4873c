"""Multimodal column plumbing: opaque binary payloads + typed metadata +
Arrow-batched Pandas-UDF decode/feature-extract stages.

The north-star contract (BASELINE.json): treat image/audio/video as opaque
``binary`` columns with typed metadata; decode / feature-extract / resize /
frame-sample run as Pandas UDFs over ``mapInPandas``.  The image/audio codec
libraries are not in this container, so the DECODE step is a deterministic
fake (documented stub) — but everything Spark-side is real and tested:
schema, binary column handling, Arrow batch shapes, partition-parallel
``mapInPandas``, and the anti-join-against-cache incremental-enrichment
pattern that the reference uses for its LLM UDFs
(fetch_instagram_data.py:428-439 skip-if-already-analyzed; SURVEY.md §2.10 F4).

The payloads are derived from documents.text (utf-8 bytes) so the pipeline
is deterministic and self-contained.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table

FEATURE_SCHEMA = (
    "doc_id long, n_bytes int, checksum long, width int, height int, mean_byte double"
)


def build_media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque binary payload + typed metadata struct per document."""
    docs = load_table(spark, sf_dir, "documents")
    blob = F.encode(F.col("text"), "utf-8")
    return docs.select(
        "doc_id",
        blob.alias("payload"),
        F.struct(
            F.length(blob).alias("n_bytes"),
            F.lit("text/plain").alias("mime"),
            F.col("source").alias("origin"),
        ).alias("media_meta"),
    )


def decode_features(media: DataFrame) -> DataFrame:
    """'Decode' + feature-extract via mapInPandas (Arrow-batched).

    Real deployments replace ``_fake_decode`` with PIL/ffmpeg calls; the
    batch iteration, schema contract, and partition parallelism are exactly
    what a real decoder needs.
    """
    import math

    import pandas as pd

    def _fake_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            n_bytes = payloads.map(len)
            checksum = payloads.map(lambda b: sum(b) % 1_000_000_007)
            # a real image decoder would return pixel dims; the fake derives
            # deterministic dims from the checksum
            width = (checksum % 640).astype("int32") + 1
            height = (checksum % 480).astype("int32") + 1
            # fixed-point rounding (floor(x*1e4+0.5)) for engine parity
            mean_byte = payloads.map(
                lambda b: math.floor(sum(b) / max(len(b), 1) * 10000.0 + 0.5) / 10000.0
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes.astype("int32"),
                    "checksum": checksum.astype("int64"),
                    "width": width,
                    "height": height,
                    "mean_byte": mean_byte,
                }
            )

    return media.mapInPandas(_fake_decode, FEATURE_SCHEMA)


def decode_image(payload: bytes) -> dict:
    """Byte-level fake image decode (no codec libs in this container).

    Same signature and return contract a PIL/opencv decoder would honor:
    ``{"width", "height", "pixels"}`` where ``pixels`` is a row-major
    grayscale bytearray of ``width * height``.  Dimensions derive
    deterministically from the payload checksum (identical to the
    ``decode_features`` fake, so the two stay differential-testable), and
    pixels are the payload bytes tiled to fill the frame.  A real deployment
    swaps the body for ``PIL.Image.open(io.BytesIO(payload))``.
    """
    checksum = sum(payload) % 1_000_000_007
    width = checksum % 640 + 1
    height = checksum % 480 + 1
    n = width * height
    src = payload if payload else b"\x00"
    reps = -(-n // len(src))  # ceil-divide: tile payload to cover the frame
    return {"width": width, "height": height, "pixels": (src * reps)[:n]}


def sample_frames(payload: bytes, every_n: int = 10) -> list[bytes]:
    """Byte-level fake video frame-sampling (no ffmpeg in this container).

    Treats the payload as fixed-size 64-byte "frames" and keeps every
    ``every_n``-th one — the same stride-sampling contract an ffmpeg
    ``select='not(mod(n,N))'`` filter implements.  Short trailing frames are
    kept, zero-padded, so no payload bytes are silently dropped.
    """
    if every_n < 1:
        raise ValueError("every_n must be >= 1")
    frame_size = 64
    frames = [
        payload[i : i + frame_size].ljust(frame_size, b"\x00")
        for i in range(0, max(len(payload), 1), frame_size)
    ]
    return frames[::every_n]


def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end: build media table → Pandas-UDF decode → features joined
    back to metadata."""
    media = build_media_table(spark, sf_dir)
    feats = decode_features(media)
    return (
        media.select("doc_id", F.col("media_meta.n_bytes").alias("meta_bytes"))
        .join(feats, "doc_id")
        .orderBy("doc_id")
    )


def enrich_incremental(media: DataFrame, cache: DataFrame) -> DataFrame:
    """The LLM-enrichment incremental pattern (reference
    fetch_instagram_data.py:428-439; email_templates.py:19-107 durable
    cache): anti-join the input against the already-enriched cache, run the
    expensive UDF stage ONLY on new rows, union with the cache.  At 100 TB
    this is the difference between re-enriching everything and touching only
    the delta."""
    new_rows = media.join(cache.select("doc_id"), "doc_id", "left_anti")
    return decode_features(new_rows).unionByName(cache)


def media_features_sql() -> str:
    """The fake decode is arithmetic over utf-8 bytes, so it IS
    SQL-expressible — DuckDB mirrors byte-sum/length via the blob functions,
    making even the Pandas-UDF stage oracle-checkable.  Byte values come
    from hex-pair extraction over hex(payload) — casting the blob to
    varchar and summing ord() would count CODE POINTS, which silently
    diverges from the byte sum on any non-ASCII document (the
    media_frame_sample lesson, applied here)."""
    return """
WITH s AS (
  SELECT doc_id,
         hex(encode(text)) AS hx,
         octet_length(encode(text))::int AS n_bytes
  FROM documents
),
r AS (
  SELECT doc_id, n_bytes,
         coalesce(list_sum([
           (strpos('0123456789ABCDEF', substring(hx, 2 * i - 1, 1)) - 1) * 16
           + (strpos('0123456789ABCDEF', substring(hx, 2 * i, 1)) - 1)
           FOR i IN range(1, n_bytes + 1)]), 0)::bigint AS raw
  FROM s
)
SELECT doc_id,
       n_bytes AS meta_bytes,
       n_bytes,
       raw % 1000000007 AS checksum,
       ((raw % 1000000007) % 640)::int + 1 AS width,
       ((raw % 1000000007) % 480)::int + 1 AS height,
       floor(raw::double / greatest(n_bytes, 1) * 10000.0 + 0.5) / 10000.0 AS mean_byte
FROM r
ORDER BY doc_id
"""


THUMB_SIDE = 8  # thumbnail edge for the resize stage

RESIZE_SCHEMA = (
    "doc_id long, width int, height int, thumb_sum long, thumb_mean double"
)


def resize_image(payload: bytes, out_w: int = THUMB_SIDE, out_h: int = THUMB_SIDE) -> dict:
    """Nearest-neighbor resize over the (fake-)decoded grayscale frame.

    The DECODE under it is the container stub, but the resampling math is
    the real algorithm (source index = floor(dst·src_extent/dst_extent)
    per axis — what PIL's ``Image.NEAREST`` computes); swapping the
    decoder for PIL leaves this function untouched."""
    img = decode_image(payload)
    w, h, px = img["width"], img["height"], img["pixels"]
    out = bytearray()
    for y in range(out_h):
        sy = y * h // out_h
        for x in range(out_w):
            sx = x * w // out_w
            out.append(px[sy * w + sx])
    return {"width": out_w, "height": out_h, "pixels": bytes(out)}


def media_resize_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RESIZE stage as a driver-checked query: decode → 8×8
    nearest-neighbor thumbnail → thumbnail stats, over Arrow-batched
    ``mapInPandas`` (the plan position a real PIL resize occupies).  The
    stub decode tiles payload bytes, so thumbnail pixel (y,x) is
    payload[(sy·W+sx) mod n] — arithmetic, hence the DuckDB oracle can
    replay even the resampling bit-exactly."""
    import math

    import pandas as pd

    media = build_media_table(spark, sf_dir)

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = decode_image(bytes(payload))
                thumb = resize_image(bytes(payload))
                s = sum(thumb["pixels"])
                n = THUMB_SIDE * THUMB_SIDE
                rows.append(
                    (
                        doc_id,
                        img["width"],
                        img["height"],
                        s,
                        math.floor(s / n * 10000.0 + 0.5) / 10000.0,
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "thumb_sum", "thumb_mean"]
            )

    return media.mapInPandas(_resize, RESIZE_SCHEMA).orderBy("doc_id")


def media_resize_features_sql() -> str:
    # byte-at-1-based-position extractor over hex(payload): the pixel
    # stream is BYTES of the utf-8 payload, so indexing characters of the
    # text would diverge on multi-byte code points (same fix as
    # media_features_sql / media_frame_sample_sql)
    def byte_at(pos: str) -> str:
        return (
            f"(strpos('0123456789ABCDEF', substring(hx, 2 * ({pos}) - 1, 1)) - 1) * 16"
            f" + (strpos('0123456789ABCDEF', substring(hx, 2 * ({pos}), 1)) - 1)"
        )

    n = THUMB_SIDE
    cells = n * n
    pix = f"((((i // {n}) * h // {n}) * w + ((i % {n}) * w // {n})) % nb)::int + 1"
    return f"""
WITH s AS (
  SELECT doc_id, hex(encode(text)) AS hx,
         octet_length(encode(text)) AS nb,
         coalesce(list_sum([
           {byte_at('j')}
           FOR j IN range(1, octet_length(encode(text)) + 1)]), 0)::bigint
           % 1000000007 AS checksum
  FROM documents
),
dims AS (
  SELECT doc_id, hx, nb,
         (checksum % 640)::bigint + 1 AS w,
         (checksum % 480)::bigint + 1 AS h
  FROM s
),
thumb AS (
  SELECT doc_id, w, h,
         -- empty payload: the python decode stub substitutes a single
         -- 0x00 byte (decode_image), so the thumbnail is all-zero; the
         -- raw expression would instead hit `% 0` -> NULL (the capstone
         -- combined-adversarial corpus caught exactly this)
         CASE WHEN nb = 0 THEN 0 ELSE list_sum([
           {byte_at(pix)}
           FOR i IN range(0, {cells})
         ])::bigint END AS thumb_sum
  FROM dims
)
SELECT doc_id, w::int AS width, h::int AS height, thumb_sum,
       floor(thumb_sum::double / {cells} * 10000.0 + 0.5) / 10000.0 AS thumb_mean
FROM thumb
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# frame sampling as a driver-checked query
# ---------------------------------------------------------------------------

FRAME_SAMPLE_EVERY_N = 10
FRAME_SIZE_BYTES = 64

FRAME_SAMPLE_SCHEMA = (
    "doc_id long, n_frames long, n_sampled long, sampled_checksum long"
)


def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FRAME-SAMPLE stage as a driver-checked query: treat each payload
    as a fixed-size frame stream, keep every ``FRAME_SAMPLE_EVERY_N``-th
    frame (:func:`sample_frames` — the ffmpeg ``select=not(mod(n,N))``
    contract), and emit per-document frame counts plus an exact integer
    byte-sum checksum over the sampled frames, via Arrow-batched
    ``mapInPandas``.  Completes the multimodal quartet
    (decode / feature-extract / resize / frame-sample) as registered
    queries.  The stub frames are byte slices, so the DuckDB oracle
    replays the stride arithmetic on the utf-8 text bit-exactly.

    Scale shape: embarrassingly parallel map over payload partitions —
    no shuffle until the (tiny) presentation sort; a real ffmpeg sampler
    occupies exactly this plan position with the same batch contract."""
    import pandas as pd

    media = build_media_table(spark, sf_dir)

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                all_frames = [
                    b[i : i + FRAME_SIZE_BYTES].ljust(FRAME_SIZE_BYTES, b"\x00")
                    for i in range(0, max(len(b), 1), FRAME_SIZE_BYTES)
                ]
                sampled = sample_frames(b, every_n=FRAME_SAMPLE_EVERY_N)
                rows.append(
                    (
                        doc_id,
                        len(all_frames),
                        len(sampled),
                        sum(sum(f) for f in sampled),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_frames", "n_sampled", "sampled_checksum"]
            )

    return media.mapInPandas(_sample, FRAME_SAMPLE_SCHEMA).orderBy("doc_id")


def media_frame_sample_sql() -> str:
    # The checksum is defined over utf-8 PAYLOAD BYTES, so the oracle must
    # iterate octet positions, not character positions (they differ the
    # moment any document contains a non-ASCII code point).  DuckDB cannot
    # index into a BLOB directly, but hex(encode(text)) exposes byte i as
    # the hex pair at chars (2i-1, 2i); strpos against the hex alphabet
    # recovers the byte value exactly.
    fs = FRAME_SIZE_BYTES
    k = FRAME_SAMPLE_EVERY_N
    return f"""
WITH s AS (
  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS nb
  FROM documents
),
dims AS (
  SELECT doc_id, hx, nb,
         CAST(ceil(greatest(nb, 1)::double / {fs}) AS BIGINT) AS n_frames
  FROM s
),
sums AS (
  SELECT doc_id, n_frames,
         CAST((n_frames + {k} - 1) // {k} AS BIGINT) AS n_sampled,
         CAST(coalesce(list_sum(
           [CASE WHEN ((i - 1) // {fs}) % {k} = 0
                 THEN (strpos('0123456789ABCDEF', substring(hx, 2 * i - 1, 1)) - 1) * 16
                      + (strpos('0123456789ABCDEF', substring(hx, 2 * i, 1)) - 1)
                 ELSE 0 END
            FOR i IN range(1, nb + 1)]
         ), 0) AS BIGINT) AS sampled_checksum
  FROM dims
)
SELECT doc_id, n_frames, n_sampled, sampled_checksum
FROM sums
ORDER BY doc_id
"""
