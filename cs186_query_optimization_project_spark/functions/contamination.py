"""Benchmark-contamination detection for training corpora.

Beyond-reference LLM-pipeline surface (the reference engine — see
SURVEY.md §6 — has no contamination operator): n-gram-overlap
decontamination as used for LLM training-set hygiene (GPT-3 appendix C
style): a training document is *contaminated* when a sufficient
fraction of its k-gram shingles also appears in any benchmark/eval
document, and contaminated documents are dropped (or at least flagged)
before training.

Scale shape (100 TB corpus, MB–GB benchmark):
- The benchmark side is reduced to its DISTINCT shingle hashes first —
  eval suites are tiny relative to the corpus, so this set broadcasts
  and the corpus-side probe is a map-only broadcast join (no corpus
  shuffle for the membership test).  ``broadcast_bench=False`` falls
  back to a shuffle join for pathologically large benchmark sets.
- Corpus shingles are per-row arrays (``array_distinct`` inside the
  row), so no global distinct shuffle is needed; after the broadcast
  probe the per-doc count/sum aggregate partial-aggregates to ONE row
  per document before its (tiny) shuffle.
- Shingles travel as 60-bit portable hashes (top-60-bits-of-md5 mod p,
  same family as MinHash — ``dedup._PORTABLE_BASE_HASH``), ~8 bytes vs
  ~50 for a k=5 word string, and bit-reproducible in ANSI SQL so the
  whole check is oracle-verifiable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cs186_query_optimization_project_spark.functions.dedup import (
    _PORTABLE_BASE_HASH,
    _PRIME,
)
from cs186_query_optimization_project_spark.functions.text import shingles


def _gram_hashes(df: DataFrame, text_col: str, id_col: str | None,
                 k: int) -> DataFrame:
    """Explode each row's DISTINCT k-gram shingles as portable 60-bit
    hashes.  Distinctness is per-row (``array_distinct``), so this is
    map-only; duplicate grams ACROSS documents are intentional on the
    corpus side (each doc is scored independently)."""
    cols = ([F.col(id_col)] if id_col else [])
    base = _PORTABLE_BASE_HASH.format(col="__s", p=_PRIME)
    return (df.select(*cols,
                      F.explode(F.array_distinct(shingles(text_col, k)))
                      .alias("__s"))
            .select(*cols, F.expr(base).alias("__g")))


def benchmark_ngrams(bench: DataFrame, text_col: str = "text",
                     k: int = 5) -> DataFrame:
    """The benchmark's distinct shingle-hash set — one column ``__g``.
    Materialize/cache this when decontaminating many corpora against
    the same eval suite."""
    return _gram_hashes(bench, text_col, None, k).distinct()


def contamination_scores(docs: DataFrame, bench: DataFrame,
                         text_col: str = "text", id_col: str = "doc_id",
                         k: int = 5, threshold: float = 0.5,
                         broadcast_bench: bool = True) -> DataFrame:
    """Per-document benchmark overlap:
    (id, n_grams, n_matched, contamination, contaminated).

    ``contamination`` = |doc's distinct k-grams ∩ benchmark k-grams|
    / |doc's distinct k-grams|; ``contaminated`` flags ratio >=
    threshold.  Documents shorter than k tokens have one whole-text
    shingle (the ``shingles`` contract), so they are scored 0-or-1 on
    an exact-text basis rather than silently skipped."""
    bg = benchmark_ngrams(bench, text_col, k).withColumn("__hit", F.lit(1))
    if broadcast_bench:
        bg = F.broadcast(bg)
    marked = _gram_hashes(docs, text_col, id_col, k).join(
        bg, "__g", "left")
    ratio = F.col("n_matched") / F.col("n_grams")
    return (marked.groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_grams"),
                 F.sum(F.coalesce(F.col("__hit"), F.lit(0)))
                 .cast("bigint").alias("n_matched"))
            .select(id_col, "n_grams", "n_matched",
                    F.round(ratio, 6).alias("contamination"),
                    (ratio >= threshold).alias("contaminated")))


def decontaminate(docs: DataFrame, bench: DataFrame,
                  text_col: str = "text", id_col: str = "doc_id",
                  k: int = 5, threshold: float = 0.5,
                  broadcast_bench: bool = True) -> DataFrame:
    """Drop contaminated documents (the train-side act of record).
    Scoring touches only (id, shingle-hash) projections, so the wide
    document payload never rides the scoring joins — the flagged id set
    comes back as one semi-join against the original rows."""
    flagged = (contamination_scores(docs, bench, text_col, id_col, k,
                                    threshold, broadcast_bench)
               .filter(F.col("contaminated"))
               .select(id_col))
    return docs.join(flagged, id_col, "left_anti")
