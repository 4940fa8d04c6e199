"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode step itself is STUBBED (``decode_stub``) — image/audio codecs
are not in this environment — but everything Spark-side is real and
tested: the schema convention, Arrow-batched ``mapInPandas`` pipeline
shape, deterministic fake feature extraction, and batch-size-aware
partitioning.  Swapping the stub for PIL/torchaudio is a one-function
change on executors.

Schema convention for a multimodal asset column::

    asset:       binary                 (opaque payload)
    asset_meta:  struct<mime:string, width:int, height:int, duration_ms:int>

At 100 TB: payloads stay in parquet binary columns (or object-store URIs
for >row-group-sized blobs); ``mapInPandas`` processes them in Arrow
batches so Python touches each batch once; ``maxRecordsPerBatch`` bounds
executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cs186_query_optimization_project_spark.parallel import ensure_parallelism

ASSET_META_SCHEMA = T.StructType([
    T.StructField("mime", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.IntegerType()),
])

#: feature columns appended after the caller's id column (the id field
#: keeps its input name AND type — see _with_id_field)
FEATURE_FIELDS = [
    T.StructField("mime", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("checksum", T.StringType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
]


def _with_id_field(df: DataFrame, id_col: str,
                   fields: list[T.StructField]) -> T.StructType:
    """Output schema led by the input's OWN id field — hardcoding
    ('doc_id', LongType) would silently rename a caller's id column and
    crash Arrow serialization for non-long id types."""
    return T.StructType([T.StructField(id_col,
                                       df.schema[id_col].dataType),
                         *fields])


def _mime_of(meta) -> str | None:
    return meta["mime"] if meta is not None else None


def decode_stub(payload: bytes, mime: str) -> list[float]:
    """STUB for the real decoder (no image/audio libs in this container).

    Produces a deterministic 8-dim 'feature' from payload bytes so the
    pipeline shape (binary in → fixed-dim vector out) is exercised
    end-to-end.  Replace with e.g. PIL decode + model forward on real
    clusters."""
    if not payload:
        return [0.0] * 8
    acc = [0] * 8
    for i, b in enumerate(payload):
        acc[i % 8] = (acc[i % 8] + b) % 997
    return [float(v) / 997.0 for v in acc]


def attach_fake_assets(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Test/demo helper: derive a deterministic binary payload + metadata
    from an existing text column (stands in for real image bytes)."""
    payload = F.encode(F.col(text_col), "UTF-8").cast("binary")
    meta = F.struct(
        F.lit("image/fake").alias("mime"),
        (F.length(text_col) % 640).cast("int").alias("width"),
        (F.length(text_col) % 480).cast("int").alias("height"),
        F.lit(0).cast("int").alias("duration_ms"),
    )
    return df.withColumn("asset", payload).withColumn("asset_meta", meta)


def extract_features(df: DataFrame, id_col: str = "doc_id",
                     asset_col: str = "asset",
                     meta_col: str = "asset_meta") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas``: each Python task receives an iterator of Arrow
    batches; we emit one row per asset with byte stats + the (stubbed)
    decoded feature vector.  No driver involvement, scales with
    partitions.  The parallelism guard matters most here: Python decode
    work on a single-partition input would serialize on one worker."""
    import hashlib

    df = ensure_parallelism(df, id_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[asset_col]
            mimes = pdf[meta_col].map(_mime_of)  # NULL meta tolerated
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "mime": mimes,
                "n_bytes": payloads.map(lambda p: len(p or b"")),
                "checksum": payloads.map(
                    lambda p: hashlib.md5(p or b"").hexdigest()),
                "feature": [decode_stub(p, m)
                            for p, m in zip(payloads, mimes)],
            })

    return df.mapInPandas(run, _with_id_field(df, id_col,
                                              FEATURE_FIELDS))


def resize_stub(payload: bytes, width: int, height: int) -> bytes:
    """STUB decoder+resizer (no PIL here): deterministic byte transform
    standing in for decode → resize → re-encode.  Real clusters replace
    the body with PIL; the signature (bytes in, bytes out) and the Spark
    plumbing around it are what's being exercised."""
    if not payload:
        return b""
    stride = max(len(payload) // max(width * height // 64, 1), 1)
    return payload[::stride][: width * height]


def resize_assets(df: DataFrame, width: int = 64, height: int = 64,
                  id_col: str = "doc_id", asset_col: str = "asset",
                  meta_col: str = "asset_meta") -> DataFrame:
    """Arrow-batched image resize: binary in → binary out with updated
    metadata.  Output schema mirrors the input asset convention so resize
    stages compose (resize → feature-extract pipelines)."""
    out_schema = _with_id_field(df, id_col, [
        T.StructField(asset_col, T.BinaryType()),
        T.StructField(meta_col, ASSET_META_SCHEMA),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [None if m is None
                     else {"mime": m["mime"], "width": width,
                           "height": height,
                           "duration_ms": m["duration_ms"]}
                     for m in pdf[meta_col]]
            yield pd.DataFrame({
                id_col: pdf[id_col],
                asset_col: [resize_stub(p, width, height)
                            for p in pdf[asset_col]],
                meta_col: metas,
            })

    return ensure_parallelism(df, id_col).mapInPandas(run, out_schema)


FRAME_FIELDS = [
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("frame_n_bytes", T.IntegerType()),
    T.StructField("frame_feature", T.ArrayType(T.FloatType())),
]


def sample_frames(df: DataFrame, n_frames: int = 4,
                  id_col: str = "doc_id", asset_col: str = "asset",
                  meta_col: str = "asset_meta") -> DataFrame:
    """Video frame sampling plumbing: one input row (binary 'video') →
    n_frames output rows, each with a decoded-frame feature (stubbed: the
    payload is sliced into n_frames windows and each window goes through
    decode_stub).  The 1→N row fan-out inside mapInPandas is the part a
    real frame sampler needs from Spark — batch in, exploded rows out,
    no driver involvement."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sizes, feats = [], [], [], []
            for doc_id, payload, meta in zip(
                    pdf[id_col], pdf[asset_col], pdf[meta_col]):
                payload = payload or b""
                step = max(len(payload) // n_frames, 1)
                for i in range(n_frames):
                    window = payload[i * step: (i + 1) * step]
                    ids.append(doc_id)
                    idxs.append(i)
                    sizes.append(len(window))
                    feats.append(decode_stub(window, _mime_of(meta)))
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs,
                                "frame_n_bytes": sizes,
                                "frame_feature": feats})

    return ensure_parallelism(df, id_col).mapInPandas(
        run, _with_id_field(df, id_col, FRAME_FIELDS))


AUDIO_CHUNK_FIELDS = [
    T.StructField("chunk_idx", T.LongType()),
    T.StructField("chunk_n_samples", T.LongType()),
    T.StructField("duration_s", T.DoubleType()),
    T.StructField("chunk_feature", T.ArrayType(T.FloatType())),
]


def attach_fake_audio(df: DataFrame, text_col: str = "text",
                      sample_rate: int = 100) -> DataFrame:
    """Deterministic stand-in for real audio: the text's utf-8 bytes
    act as int8 PCM mono samples, with typed metadata carrying the
    sample rate and sample count — the schema shape a real audio
    column needs (opaque binary + sidecar metadata)."""
    return df.select(
        "doc_id",
        F.encode(F.col(text_col), "utf-8").alias("audio"),
        F.struct(
            F.lit("audio/fake").alias("mime"),
            F.lit(sample_rate).alias("sample_rate"),
            F.octet_length(F.encode(F.col(text_col), "utf-8"))
            .cast("long").alias("n_samples")).alias("audio_meta"))


def chunk_audio(df: DataFrame, chunk_seconds: int = 2,
                id_col: str = "doc_id", asset_col: str = "audio",
                meta_col: str = "audio_meta") -> DataFrame:
    """Fixed-duration audio chunking: one input row (binary waveform)
    → ceil(n_samples / chunk_len) output rows, the final chunk
    partial.  Unlike :func:`sample_frames`' fixed fan-out, the 1→N
    here is DATA-DEPENDENT (long recordings explode into many rows)
    inside a single Arrow batch — the shape an ASR/feature pipeline
    needs.  Decode is stubbed (``decode_stub`` over the chunk's byte
    window); a real resampler slots into the same signature.  Chunk
    boundary math is pure integer arithmetic on the metadata, so an
    external oracle replays everything except the stub feature."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ns, durs, feats = [], [], [], [], []
            for doc_id, payload, meta in zip(
                    pdf[id_col], pdf[asset_col], pdf[meta_col]):
                payload = payload or b""
                # clamp the rate itself, not just chunk_len: a zero,
                # negative, or NULL sample_rate must degrade, not
                # divide by zero (or TypeError) in the duration below
                rate = max(int(meta["sample_rate"] or 1), 1) \
                    if meta is not None else 1
                chunk_len = max(rate * chunk_seconds, 1)
                n = max((len(payload) + chunk_len - 1) // chunk_len, 1)
                for i in range(n):
                    window = payload[i * chunk_len: (i + 1) * chunk_len]
                    ids.append(doc_id)
                    idxs.append(i)
                    ns.append(len(window))
                    durs.append(len(window) / rate)
                    feats.append(decode_stub(window, _mime_of(meta)))
            yield pd.DataFrame({id_col: ids, "chunk_idx": idxs,
                                "chunk_n_samples": ns,
                                "duration_s": durs,
                                "chunk_feature": feats})

    return ensure_parallelism(df, id_col).mapInPandas(
        run, _with_id_field(df, id_col, AUDIO_CHUNK_FIELDS))
