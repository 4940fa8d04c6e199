"""Full-text retrieval: positional inverted index, phrase search, and
BM25 ranking — the keyword-retrieval half of a RAG/data-curation stack
(the embedding half lives in ``functions/similarity.py``).

Shapes at scale:

- The **postings table** (token, doc_id, pos) is the classic inverted
  index as a DataFrame — built with one posexplode (map-only), best
  persisted partitioned/bucketed by token so term lookups prune.
- **Phrase search** is the textbook positional join: postings of the
  i-th phrase term self-joined on (doc, pos + i).  Each join keys on
  (token_i ∧ doc ∧ pos) — after filtering to the phrase's terms the
  joined sides are term-posting-list-sized, never corpus-sized.
- **BM25** needs only per-term document frequencies, per-doc term
  frequencies, and doc lengths — three aggregates off the postings
  table; the query side filters postings to the query's terms FIRST, so
  scoring touches |postings(query terms)| rows, not the corpus.
"""

from __future__ import annotations



from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cs186_query_optimization_project_spark.functions.text import tokens


def build_postings(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Positional postings (id, token, pos) — pos is 0-based token
    position.  Map-only; empty tokens (leading-whitespace artifacts)
    dropped."""
    return (df.select(F.col(id_col),
                      F.posexplode(tokens(text_col))
                      .alias("pos", "token"))
            .filter(F.col("token") != ""))


def phrase_search(df: DataFrame, phrase: str, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Documents containing ``phrase`` as consecutive tokens, with the
    match count — exact positional phrase match, whitespace tokens.

    The first term's postings anchor; each subsequent term joins on
    (same doc, pos + i).  All joins are equi-joins on (doc, pos) over
    single-term posting lists.  Output: (id, n_matches) ordered by id.
    """
    terms = [t for t in phrase.split() if t]
    if not terms:
        raise ValueError("empty phrase")
    post = build_postings(df, text_col, id_col)
    anchor = (post.filter(F.col("token") == terms[0])
              .select(F.col(id_col), F.col("pos")))
    for i, term in enumerate(terms[1:], start=1):
        nxt = (post.filter(F.col("token") == term)
               .select(F.col(id_col).alias("__id"),
                       (F.col("pos") - i).alias("__p")))
        anchor = (anchor.join(nxt,
                              (anchor[id_col] == nxt["__id"])
                              & (anchor["pos"] == nxt["__p"]))
                  .select(anchor[id_col], anchor["pos"]))
    return (anchor.groupBy(id_col)
            .agg(F.count(F.lit(1)).cast("long").alias("n_matches"))
            .orderBy(id_col))


def bm25_scores(df: DataFrame, query: str, text_col: str = "text",
                id_col: str = "doc_id", k1: float = 1.2, b: float = 0.75,
                top_k: int = 10) -> DataFrame:
    """Top-``top_k`` documents for ``query`` under BM25 (Lucene's
    non-negative IDF variant: ``ln(1 + (N - n_t + 0.5)/(n_t + 0.5))``).

    Postings are filtered to the query's terms before any aggregation,
    so the score computation is proportional to the matched posting
    lists.  N and avgdl ride in as a broadcast one-row aggregate.
    Scores round to 6 decimals before ranking (id tie-break) — ranking
    stable across partitionings and replayable in SQL.
    """
    terms = sorted({t for t in query.split() if t})
    if not terms:
        raise ValueError("empty query")
    post = build_postings(df, text_col, id_col)
    doc_len = post.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("__dl"))
    corpus = doc_len.agg(F.count(F.lit(1)).alias("__n"),
                         F.avg("__dl").alias("__avgdl"))
    tf = (post.filter(F.col("token").isin(terms))
          .groupBy(id_col, "token")
          .agg(F.count(F.lit(1)).alias("__tf")))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("__df"))
    idf = F.log(F.lit(1.0)
                + (F.col("__n") - F.col("__df") + 0.5)
                / (F.col("__df") + 0.5))
    per_term = (tf.join(F.broadcast(dfreq), "token")
                .join(doc_len, id_col)
                .crossJoin(F.broadcast(corpus))
                .select(F.col(id_col),
                        (idf * (F.col("__tf") * (k1 + 1))
                         / (F.col("__tf")
                            + k1 * (1 - b
                                    + b * F.col("__dl")
                                    / F.col("__avgdl"))))
                        .alias("__s")))
    return (per_term.groupBy(id_col)
            .agg(F.round(F.sum("__s"), 6).alias("bm25"))
            .orderBy(F.col("bm25").desc(), F.col(id_col).asc())
            .limit(top_k))


def similar_docs(df: DataFrame, query_id, text_col: str = "text",
                 id_col: str = "doc_id", k: int = 10,
                 shingle_k: int = 3) -> DataFrame:
    """"More like this": top-``k`` documents by shingle-set Jaccard to
    one query document — the query-time, one-vs-all complement of the
    corpus-wide pair detection in ``functions/dedup.py``.

    Shape: the query doc's (tiny) shingle set broadcasts; the corpus
    postings semi-join it, so only documents sharing ≥ 1 shingle are
    scored and the scoring aggregate touches |postings(query
    shingles)| rows, never the corpus.  Jaccard from three integers
    (|∩|, |A|, |B|) — exact, no hashing.  Rounded-then-ranked with id
    tie-break: stable across partitionings, SQL-replayable.
    """
    from cs186_query_optimization_project_spark.functions.text import (
        shingles,
    )

    sized = df.select(
        F.col(id_col),
        F.array_distinct(shingles(text_col, shingle_k)).alias("__sh"))
    sized = sized.select(id_col, "__sh", F.size("__sh").alias("__n"))
    q = sized.filter(F.col(id_col) == query_id)
    q_sh = q.select(F.explode("__sh").alias("shingle"))
    q_n = q.select(F.col("__n").alias("__qn"))
    post = sized.select(id_col, "__n",
                        F.explode("__sh").alias("shingle"))
    common = (post.join(F.broadcast(q_sh), "shingle")
              .filter(F.col(id_col) != query_id)
              .groupBy(id_col, "__n")
              .agg(F.count(F.lit(1)).alias("__c")))
    return (common.crossJoin(F.broadcast(q_n))
            .select(F.col(id_col),
                    F.round(F.col("__c")
                            / (F.col("__qn") + F.col("__n")
                               - F.col("__c")), 6).alias("jaccard"))
            .orderBy(F.col("jaccard").desc(), F.col(id_col).asc())
            .limit(k))
