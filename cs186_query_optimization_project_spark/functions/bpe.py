"""Byte-pair-encoding merge learning — tokenizer training as a
DataFrame-iterative operator (Sennrich et al., "Neural Machine
Translation of Rare Words with Subword Units", ACL 2016).

Shape, and why it scales: BPE trains on the WORD-FREQUENCY table, not
the raw corpus — the corpus-scale work (tokenize + word count, one
explode + one shuffle with map-side combine) runs ONCE and is pinned
with a localCheckpoint; every merge round then runs over the bounded
distinct-word vocabulary.  Each round is one pair-count aggregate
(shuffle carries distinct symbol pairs only), a single-row top-1
collect (the argmax merge rule — the only driver traffic), and one
narrow literal string replace applied to every word sequence.  At
100 TB the vocabulary is millions of rows, not trillions — the rounds
cost vocabulary-sized work regardless of corpus size.

Representation: a word's symbol sequence is a single string — one
space at each end, TWO spaces between symbols (``"abc"`` →
``" a  b  c "``).  Merging pair (l, r) is then the literal replace of
``" l  r "`` with ``" lr "``: each match consumes one boundary space
from either side, leaving exactly one, so adjacent matches stay
matchable and the invariant is restored by the single-space flanks of
the replacement.  Both Spark's ``replace`` and the DuckDB oracle's
``replace`` substitute all non-overlapping occurrences left-to-right,
so engine and oracle are exact twins (the oracle unrolls the rounds as
MATERIALIZED CTEs — see ``__spark_entry__._bpe_sql``).

Ties break deterministically by (count DESC, lhs ASC, rhs ASC).
Symbols never contain spaces (whitespace tokenization upstream), so
the two-space convention is unambiguous.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cs186_query_optimization_project_spark.functions.text import tokens
from cs186_query_optimization_project_spark.parallel import local_rows_df

MERGE_SCHEMA = T.StructType([
    T.StructField("merge_rank", T.LongType(), False),
    T.StructField("lhs", T.StringType(), False),
    T.StructField("rhs", T.StringType(), False),
    T.StructField("pair_count", T.LongType(), False),
])


def learn_bpe_merges(df: DataFrame, text_col: str = "text",
                     n_merges: int = 5) -> DataFrame:
    """Learn the first ``n_merges`` BPE merge rules from a corpus.

    Returns (merge_rank 1..n, lhs, rhs, pair_count) — pair_count is the
    corpus-weighted adjacency count at the time the rule was learned.
    Stops early (fewer rows) if the vocabulary runs out of adjacent
    pairs."""
    spark = df.sparkSession
    words = (df.select(F.explode(tokens(text_col)).alias("w"))
             .filter(F.col("w") != "")
             .groupBy("w").agg(F.count(F.lit(1)).alias("n")))
    # " a  b  c " representation; corpus-scale work ends here — pin it
    seqs = (words.select(
        F.concat(F.lit(" "),
                 F.rtrim(F.regexp_replace("w", "(.)", "$1  ")),
                 F.lit(" ")).alias("seq"),
        "n").localCheckpoint(eager=False))

    merges = []
    for k in range(1, n_merges + 1):
        toks = seqs.select(F.split(F.trim(F.col("seq")), "  ")
                           .alias("t"), "n").filter(F.size("t") >= 2)
        pairs = toks.select(
            "n",
            F.explode(F.expr(
                "transform(sequence(0, size(t) - 2), "
                "i -> named_struct('lhs', t[i], 'rhs', t[i + 1]))"))
            .alias("p"))
        top = (pairs.groupBy("p.lhs", "p.rhs")
               .agg(F.sum("n").alias("cnt"))
               .orderBy(F.desc("cnt"), "lhs", "rhs")
               .limit(1).collect())
        if not top:
            break
        lhs, rhs, cnt = top[0]["lhs"], top[0]["rhs"], int(top[0]["cnt"])
        merges.append((k, lhs, rhs, cnt))
        seqs = seqs.withColumn(
            "seq", F.replace(F.col("seq"),
                             F.lit(f" {lhs}  {rhs} "),
                             F.lit(f" {lhs}{rhs} ")))
    return local_rows_df(spark, merges, MERGE_SCHEMA)


def apply_bpe_merges(df: DataFrame, merges: list[tuple[str, str]],
                     text_col: str = "text",
                     out_col: str = "bpe_tokens") -> DataFrame:
    """Segment each document with an already-learned merge list (rank
    order matters — merges never cross word boundaries, like training).
    Pure narrow JVM expressions: one transform lambda per word runs the
    sequence expansion and every merge replace inside whole-stage
    codegen; no shuffle, no Python.  Output is the flattened subword
    array for the document."""
    def segment(w):
        seq = F.concat(F.lit(" "),
                       F.rtrim(F.regexp_replace(w, "(.)", "$1  ")),
                       F.lit(" "))
        for lhs, rhs in merges:
            seq = F.replace(seq, F.lit(f" {lhs}  {rhs} "),
                            F.lit(f" {lhs}{rhs} "))
        return F.split(F.trim(seq), "  ")

    words = F.filter(tokens(text_col), lambda t: t != "")
    return df.withColumn(out_col,
                         F.flatten(F.transform(words, segment)))
