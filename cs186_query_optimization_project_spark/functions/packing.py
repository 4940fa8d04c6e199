"""Sequence packing and document chunking for pretraining pipelines.

Two operators a training-data materialization needs between "clean
corpus" and "token shards" (additive over the reference, like the rest
of the pipeline block):

- :func:`pack_sequences` — assign documents to fixed-token-budget packs
  (the batch-construction step that turns ragged documents into dense
  training sequences).  Deterministic: documents are sharded by md5
  bucket of their id and packed in id order within each shard, so the
  layout is a pure function of (ids, token counts) — independent of
  partitioning, executor count, and engine, and therefore replayable by
  the SQL oracle (a windowed running sum).
- :func:`chunk_documents` — split long documents into overlapping
  fixed-size token windows (context-length fitting / retrieval chunking).
  Pure per-row array expressions; one output row per chunk.

Scale shape: ``pack_sequences`` is ONE shuffle (repartition by shard) +
an in-partition sort per shard — the window never sees more than one
shard, and n_shards bounds both sort size and skew.  At 100 TB you size
n_shards so a shard's token metadata fits a task (the DOCUMENTS don't
ride this shuffle — only (id, token count) pairs; the text joins back by
id afterwards if the writer needs it).  ``chunk_documents`` is map-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cs186_query_optimization_project_spark.functions.sampling import (
    hash_bucket,
)


def pack_sequences(df: DataFrame, token_col: str, budget: int,
                   id_col: str = "doc_id", n_shards: int = 16,
                   salt: str = "") -> DataFrame:
    """Assign each row to a training pack of ~``budget`` tokens.

    Semantics (document-preserving, start-offset packing): within a
    shard, documents are laid out end-to-end in ``id_col`` order; a
    document belongs to the pack containing its START offset, i.e.
    ``pack_id = floor(start_offset / budget)``.  A pack may therefore
    overflow by at most one document's tail — the standard
    "don't split documents" trade; documents LONGER than the budget
    still land in exactly one pack (chunk them first with
    :func:`chunk_documents` if that matters).

    Output: ``(id_col, token_col, shard, pack_id, start_offset)`` —
    everything a shard writer needs to materialize packs.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    sharded = df.select(
        F.col(id_col), F.col(token_col),
        hash_bucket(id_col, n_shards, salt).alias("shard"))
    w = (Window.partitionBy("shard").orderBy(F.col(id_col))
         .rowsBetween(Window.unboundedPreceding, -1))
    return (sharded
            .withColumn("start_offset",
                        F.coalesce(F.sum(F.col(token_col)).over(w),
                                   F.lit(0)).cast("long"))
            .withColumn("pack_id",
                        F.expr(f"start_offset div {int(budget)}"))
            .select(id_col, token_col, "shard", "pack_id", "start_offset"))


def chunk_documents(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", max_tokens: int = 512,
                    overlap: int = 64) -> DataFrame:
    """Split each document into overlapping windows of whitespace tokens.

    Chunk ``i`` covers tokens ``[i*stride, i*stride + max_tokens)`` with
    ``stride = max_tokens - overlap``; the last chunk starts at the last
    stride boundary that still introduces new tokens, so every token
    appears in at least one chunk and short documents yield exactly one.
    Map-only (explode over a per-row sequence); deterministic, so the
    chunk set is SQL-replayable.

    Output: ``(id_col, chunk_idx, n_chunks, chunk_text)``.
    """
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be positive, got {max_tokens}")
    if not 0 <= overlap < max_tokens:
        raise ValueError(
            f"overlap must be in [0, max_tokens), got {overlap}")
    stride = max_tokens - overlap
    toks = F.split(F.col(text_col), r"\s+")
    n = F.size(toks)
    # number of stride starts needed to cover n tokens:
    # 1 + ceil(max(n - max_tokens, 0) / stride)
    n_chunks = (F.lit(1)
                + F.ceil(F.greatest(n - max_tokens, F.lit(0))
                         / F.lit(stride)).cast("int"))
    return (df.select(F.col(id_col), toks.alias("__toks"),
                      n_chunks.alias("n_chunks"))
            .select(F.col(id_col), F.col("__toks"), F.col("n_chunks"),
                    F.explode(F.sequence(
                        F.lit(0), F.col("n_chunks") - 1)).alias("chunk_idx"))
            .select(F.col(id_col), F.col("chunk_idx"), F.col("n_chunks"),
                    F.array_join(
                        F.slice(F.col("__toks"),
                                F.col("chunk_idx") * stride + 1,
                                max_tokens), " ").alias("chunk_text")))


def epoch_shuffle(df: DataFrame, id_col: str, n_shards: int = 16,
                  epoch: int = 0, salt: str = "") -> DataFrame:
    """Deterministic between-epochs reshuffle: assign every row a
    ``shard`` and a ``pos`` within its shard, as a pure function of
    (epoch, salt, id) — the training-data analog of ``pack_sequences``'
    layout determinism applied to ORDER.

    Training loaders need a different global order each epoch without
    RNG state to checkpoint: here order is md5(epoch:salt:id), so epoch
    k's permutation is reproducible from the ids alone (resumable from
    any point, independent of partitioning/executor count/engine) and
    epoch k+1's is an independent permutation (the hash re-keys).

    Scale shape: ONE hash shuffle on ``shard`` + an in-partition sort —
    exactly how shards are materialized at 100 TB (each shard is a
    bounded sort; n_shards sized so a shard fits a task).  No global
    sort, no RNG, no driver state.  Hash ties (birthday-bounded) break
    by id, so the permutation is total and the SQL oracle replays it
    row-for-row.
    """
    if n_shards <= 0:
        raise ValueError(f"n_shards must be > 0, got {n_shards}")
    # the (epoch, salt) prefix rides in as a Column literal, never
    # interpolated into SQL text — a salt with quotes/backslashes must
    # not crash or alter the hash expression (the funnel escaping
    # lesson); int(epoch) keeps the prefix canonical
    h = (F.conv(F.substring(F.md5(F.concat(
            F.lit(f"{int(epoch)}:{salt}:"),
            F.col(id_col).cast("string"))), 1, 15), 16, 10)
         .cast("bigint"))
    out = df.withColumn("__h", h).withColumn(
        "shard", F.pmod(F.col("__h"), F.lit(n_shards)).cast("int"))
    w = Window.partitionBy("shard").orderBy(F.col("__h"), F.col(id_col))
    return (out.withColumn("pos", F.row_number().over(w).cast("long"))
            .drop("__h"))
