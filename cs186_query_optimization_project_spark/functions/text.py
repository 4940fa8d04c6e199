"""Text-analysis operators over a document column.

The reference has no scalar functions at all (SURVEY.md §2.7); these are the
additive text ops a 100 TB training-data pipeline needs: token counting,
quality scoring, language ID, and document fingerprinting.  Every function
returns a Spark ``Column`` built from JVM-side primitives — no Python UDFs —
so they vectorize inside whole-stage codegen and scale linearly with
executors.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cs186_query_optimization_project_spark.parallel import ensure_parallelism

#: Marker stopwords per language for the n-gram-free heuristic language ID.
#: Deliberately tiny + deterministic: hit counts are computed by substring
#: counting, the argmax is taken in a fixed language order, and the same
#: arithmetic is expressible in ANSI SQL for the oracle.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of"),
    "de": ("der", "und", "die"),
    "fr": ("le", "et", "les"),
    "es": ("el", "y", "los"),
}


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization → array<string>.

    CONTRACT: leading/trailing whitespace yields empty boundary tokens
    (Spark ``split`` keeps them) — deliberately NOT stripped here,
    because every DuckDB oracle mirrors ``regexp_split_to_array``,
    which has the same behavior, and ~15 oracle-verified operators
    (profile, repetition, chunking, packing, vocab, LM stats) are
    consistent twins on that basis.  Consumers that must not see
    empties filter ``token <> ''`` after exploding, exactly like the
    oracles do."""
    return F.split(F.col(text) if isinstance(text, str) else text, r"\s+")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


#: BPE-ish pre-tokenization pattern (GPT-2 style, ASCII simplification):
#: letter runs, digit runs, and punctuation runs are separate tokens.  The
#: same regex runs unchanged in DuckDB for the oracle.
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def bpe_tokens(text: Column | str) -> Column:
    """Regex pre-tokenization → array<string> (the token stream a BPE
    tokenizer would merge; counts approximate LLM token counts ~1.3× low)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(c, F.lit(BPE_TOKEN_PATTERN), F.lit(0))


def bpe_token_count(text: Column | str) -> Column:
    return F.size(bpe_tokens(text))


def char_count(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.length(c)


def alpha_ratio(text: Column | str) -> Column:
    """Fraction of characters that are ASCII letters — a basic quality
    signal (binary junk and markup score low)."""
    c = F.col(text) if isinstance(text, str) else text
    letters = F.length(F.regexp_replace(c, "[^A-Za-z]", ""))
    return letters / F.greatest(F.length(c), F.lit(1))


def avg_token_length(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    stripped = F.length(F.regexp_replace(c, r"\s+", ""))
    return stripped / F.greatest(token_count(c), F.lit(1))


def marker_hits(text: Column | str, word: str) -> Column:
    """Occurrences of ``word`` as a whole token, via length arithmetic
    (substring counting — identical semantics in ANSI SQL for the oracle:
    ``(length(x) - length(replace(x, p, ''))) / length(p)``).

    Counting is NON-overlapping: in ``"the the the"`` adjacent repeats
    share a delimiting space, so this counts 2, not 3.  Deliberate — the
    same arithmetic runs in the DuckDB oracle, and for language ID only
    relative marker frequencies matter."""
    c = F.col(text) if isinstance(text, str) else text
    padded = F.concat(F.lit(" "), c, F.lit(" "))
    pat = f" {word} "
    return ((F.length(padded) - F.length(F.replace(padded, F.lit(pat))))
            / F.lit(len(pat))).cast("int")


def lang_score(text: Column | str, lang: str) -> Column:
    cols = [marker_hits(text, w) for w in LANG_MARKERS[lang]]
    out = cols[0]
    for c in cols[1:]:
        out = out + c
    return out


def lang_id(text: Column | str) -> Column:
    """Heuristic language ID: argmax of marker-stopword hit counts with a
    fixed-order tie-break (en > de > fr > es), 'und' (undetermined) when no
    marker hits at all."""
    scores = {lang: lang_score(text, lang) for lang in LANG_MARKERS}
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    # wrap from lowest to highest priority: the last wrap (en) is checked
    # first, so earlier languages in LANG_MARKERS order win ties
    for lang in reversed(list(LANG_MARKERS)):
        expr = F.when((scores[lang] == best) & (best > 0),
                      F.lit(lang)).otherwise(expr)
    return expr


def quality_score(text: Column | str) -> Column:
    """Composite [0,1] quality score: alpha ratio, sane token lengths, and
    document length, combined with fixed weights.  Deterministic double
    arithmetic (same expression used for the SQL oracle)."""
    c = F.col(text) if isinstance(text, str) else text
    len_score = F.least(F.length(c) / F.lit(500.0), F.lit(1.0))
    tok = avg_token_length(c)
    tok_score = F.when((tok >= 3.0) & (tok <= 10.0), F.lit(1.0)) \
                 .otherwise(F.lit(0.5))
    return F.round(
        0.4 * alpha_ratio(c) + 0.3 * tok_score + 0.3 * len_score, 6)


def fingerprint(text: Column | str) -> Column:
    """128-bit content fingerprint (md5 hex) — exact-dup key at any scale."""
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(c)


def rolling_fingerprint(text: Column | str, base: int = 1_000_003,
                        mod: int = (1 << 31) - 1) -> Column:
    """Order-sensitive rolling (polynomial) fingerprint over the token
    stream: ``h = Σ hash(tok_i) · base^(n−i) mod m`` via a JVM
    ``aggregate`` fold.  Unlike the set-style md5 fingerprint, transposed
    tokens change the value — the Rabin-Karp-family hash used for
    order-aware document identity and chunk dedup.  ``mod`` is the 2^31−1
    Mersenne prime so ``acc·base + h`` stays < 2^52 and never overflows a
    long under ANSI arithmetic (keep ``base·mod`` < 2^62 if overriding)."""
    c = F.col(text) if isinstance(text, str) else text
    toks = F.split(c, r"\s+")
    return F.aggregate(
        toks, F.lit(0).cast("long"),
        lambda acc, t: F.pmod(
            F.pmod(acc * F.lit(base), F.lit(mod))
            + F.pmod(F.xxhash64(t), F.lit(mod)), F.lit(mod)))


def winnow_fingerprints(text_col: str, k: int = 8, w: int = 4) -> Column:
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 —
    the MOSS scheme): hash every character k-gram, slide a window of w
    consecutive hashes, keep each window's minimum, return the DISTINCT
    selected hashes.  Guarantees any shared substring of length
    >= k + w − 1 contributes at least one common fingerprint, so two
    documents sharing a long passage share fingerprints even when the
    rest differs — the partial-overlap detector that whole-doc
    fingerprints (md5 / rolling) cannot be.

    Pure JVM array expressions, O(len·w) per row, no shuffle.  Gram
    hashes use the portable top-60-bits-of-md5 family (mod 1e9+7), so
    the selected fingerprints are bit-reproducible in ANSI SQL.  Texts
    shorter than k characters yield one whole-text fingerprint.  The
    outer ``transform(array(...), hs -> ...)`` is the let-binding idiom
    (see ``shingles``): it evaluates the gram-hash array ONCE per row
    instead of once per window position."""
    grams = (f"CASE WHEN length({text_col}) < {k} THEN array({text_col}) "
             f"ELSE transform(sequence(1, length({text_col}) - {k} + 1), "
             f"i -> substring({text_col}, i, {k})) END")
    hashes = (f"transform({grams}, g -> pmod(cast("
              f"conv(substr(md5(g), 1, 15), 16, 10) as bigint), "
              f"1000000007))")
    return F.expr(
        f"array_distinct(flatten(transform(array({hashes}), hs -> "
        f"CASE WHEN size(hs) <= {w} THEN array(array_min(hs)) "
        f"ELSE transform(sequence(1, size(hs) - {w} + 1), "
        f"j -> array_min(slice(hs, j, {w}))) END)))")


def shingles(text_col: str, k: int = 3) -> Column:
    """Word k-shingles: array of k-grams joined by single spaces (input for
    MinHash / Jaccard dedup).  Documents with fewer than k words get one
    shingle = the whole text.  Pure JVM expression (``transform`` +
    ``slice`` over the token array).

    The single-element ``transform(array(split(..)), t -> ..)`` wrapper
    is a let-binding: it evaluates the tokenizing regex split ONCE per
    row and binds it to ``t``.  Referencing ``split(..)`` directly inside
    the per-position lambda re-tokenizes the document at EVERY shingle
    position — O(tokens²) work that measured 7× slower on the bench
    corpus."""
    return shingles_of_tokens(f"split({text_col}, '\\\\s+')", k)


def shingles_of_tokens(tok_expr: str, k: int = 3) -> Column:
    """K-shingles from a token-array SQL expression (see
    :func:`shingles`); use directly when the caller has already bound
    the token array to a column."""
    return F.expr(
        f"flatten(transform(array({tok_expr}), t -> "
        f"CASE WHEN size(t) <= {k} THEN array(concat_ws(' ', t)) "
        f"ELSE transform(sequence(1, size(t) - {k} + 1), "
        f"i -> concat_ws(' ', slice(t, i, {k}))) END))")


#: Frozen logistic quality-classifier weights — the model-based filter
#: stage of a web-corpus pipeline (CCNet, Wenzek et al. 2020; DCLM,
#: Li et al. 2024 use fastText models; this is the same inference shape
#: with a transparent linear model over portable text features).  The
#: margin z = bias + w·x uses ONLY +,*,/ double arithmetic — IEEE 754
#: ops are exactly specified, so the keep/drop decision (z >= 0) is
#: bit-identical in Spark and any SQL oracle; the sigmoid score is
#: reported at 4 decimals (the one libm exp, rounded well past its ulp).
QUALITY_CLF_WEIGHTS = {
    "bias": -5.4,
    "alpha_ratio": 4.0,        # letters / chars
    "type_token_ratio": 2.0,   # distinct tokens / tokens
    "length_saturation": 1.5,  # min(chars/500, 1)
    "stopword_ratio": 6.0,     # whole-token 'the' hits / tokens
}


def classifier_margin(text: Column | str) -> Column:
    """Linear margin z of the frozen quality classifier (see
    :data:`QUALITY_CLF_WEIGHTS`).  Kept ⇔ z >= 0 ⇔ sigmoid(z) >= 0.5."""
    c = F.col(text) if isinstance(text, str) else text
    tk = F.filter(tokens(c), lambda x: x != "")
    ntok = F.greatest(F.size(tk), F.lit(1))
    w = QUALITY_CLF_WEIGHTS
    return (F.lit(w["bias"])
            + F.lit(w["alpha_ratio"]) * alpha_ratio(c)
            + F.lit(w["type_token_ratio"])
            * (F.size(F.array_distinct(tk)) / ntok)
            + F.lit(w["length_saturation"])
            * F.least(F.length(c) / F.lit(500.0), F.lit(1.0))
            + F.lit(w["stopword_ratio"]) * (marker_hits(c, "the") / ntok))


def classifier_quality(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Quality-classifier inference over the corpus → ``(id, clf_score,
    kept)``.  Pure row-wise JVM expressions — no shuffle, no UDF; at
    100 TB this is a map-only stage that pipelines into whatever scan
    produced the rows (predicates on ``kept`` push into the same
    stage)."""
    df = ensure_parallelism(df, id_col)
    z = classifier_margin(text_col)
    return df.select(
        F.col(id_col),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 4)
        .alias("clf_score"),
        (z >= 0).alias("kept"))


def profile(df: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """One-pass text profile: id, token count, char count, quality, lang,
    fingerprint.  Regex-heavy per-row work → parallelism guard first."""
    df = ensure_parallelism(df, id_col)
    return df.select(
        F.col(id_col),
        token_count(text_col).alias("n_tokens"),
        char_count(text_col).alias("n_chars_computed"),
        F.round(alpha_ratio(text_col), 6).alias("alpha_ratio"),
        quality_score(text_col).alias("quality"),
        lang_id(text_col).alias("lang_pred"),
        fingerprint(text_col).alias("fingerprint"),
    )


def repetition_stats(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id",
                     ngram: int = 3) -> DataFrame:
    """Within-document repetition signals (the Gopher quality rules,
    Rae et al. 2021 §A1.1): the fraction of tokens that are repeats of
    an earlier token, and the fraction of word n-grams that are repeats
    of an earlier n-gram.  Boilerplate, keyboard-mash, and template spam
    score high; prose scores low — the standard pretraining-corpus
    filter alongside :func:`quality_score`.

    Pure per-row JVM array expressions (token/shingle arrays +
    ``array_distinct``) — map-only, no shuffle, no Python.  Fractions
    round to 6 decimals so the result is engine-reproducible
    (DuckDB: ``list_distinct``/``len`` on the same splits).  The token
    array is bound to a column first so the tokenizer runs once per row
    (not once per expression) — 13× on the bench corpus."""
    toked = df.select(F.col(id_col),
                      F.split(F.col(text_col), r"\s+").alias("__toks"))
    sh = shingles_of_tokens("__toks", ngram)
    n = F.size(F.col("__toks"))
    n_sh = F.size(sh)
    rep_tok = F.when(
        n > 0, 1.0 - F.size(F.array_distinct(F.col("__toks"))) / n) \
        .otherwise(F.lit(0.0))
    rep_ng = F.when(n_sh > 0, 1.0 - F.size(F.array_distinct(sh)) / n_sh) \
        .otherwise(F.lit(0.0))
    return toked.select(
        F.col(id_col),
        n.alias("n_tokens"),
        F.round(rep_tok, 6).alias("rep_token_frac"),
        F.round(rep_ng, 6).alias(f"rep_{ngram}gram_frac"))


def drop_repetitive(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id",
                    max_token_rep: float = 0.6,
                    max_ngram_rep: float = 0.2,
                    ngram: int = 3) -> DataFrame:
    """Gopher-style repetition filter: keep documents under BOTH
    repetition thresholds (defaults in the published rules' range).
    Composes with :func:`profile` in a single map-only pass."""
    stats = repetition_stats(df, text_col, id_col, ngram)
    keep = stats.filter(
        (F.col("rep_token_frac") <= max_token_rep)
        & (F.col(f"rep_{ngram}gram_frac") <= max_ngram_rep)) \
        .select(id_col)
    return df.join(keep, id_col, "left_semi")


# --------------------------------------------------------------------- #
# vocabulary / TF-IDF (tokenizer vocab selection and classic sparse
# featurization for a training-data pipeline; pure JVM expressions,
# arithmetic replayable in ANSI SQL)
# --------------------------------------------------------------------- #
def vocab(df: DataFrame, text_col: str = "text",
          id_col: str = "doc_id", min_doc_freq: int = 1) -> DataFrame:
    """(token, doc_freq, total_count) over the whitespace tokenization.

    Shape: explode → ONE shuffle on token with two aggregates;
    ``doc_freq`` counts distinct documents (a token repeated within one
    doc counts once), ``total_count`` counts occurrences.  At 100 TB
    the hot keys are stopwords — map-side partial aggregation absorbs
    them before the shuffle, and ``min_doc_freq`` prunes the hapax tail
    (typically >40% of distinct tokens) from the result."""
    tok = (df.select(F.col(id_col),
                     F.explode(tokens(text_col)).alias("token"))
           .filter(F.col("token") != ""))
    out = (tok.groupBy("token")
           .agg(F.count_distinct(F.col(id_col)).alias("doc_freq"),
                F.count(F.lit(1)).alias("total_count")))
    return out.filter(F.col("doc_freq") >= min_doc_freq)


def tfidf(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
          n_docs: int | None = None) -> DataFrame:
    """Per-(doc, token) TF-IDF with the smooth idf
    ``ln((N+1)/(df+1)) + 1`` (sklearn's formulation, so tokens present
    in every document still score > 0).

    tf and df are exact integers from two aggregates over one explode;
    the only float op is the final ``ln``, and the output rounds to 4
    decimals so the value is engine-portable (libm implementations
    differ in the last ulp).  ``n_docs`` may be passed when the caller
    already knows the corpus size; otherwise it is ONE bounded scalar
    count (not a per-row collect)."""
    tok = (df.select(F.col(id_col),
                     F.explode(tokens(text_col)).alias("token"))
           .filter(F.col("token") != ""))
    tf = tok.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("doc_freq"))
    if n_docs is None:
        n_docs = df.select(id_col).distinct().count()
    idf = F.log((F.lit(float(n_docs + 1))) / (F.col("doc_freq") + 1)) + 1
    return (tf.join(dfreq, "token")
            .select(F.col(id_col), F.col("token"), F.col("tf"),
                    F.col("doc_freq"),
                    F.round(F.col("tf") * idf, 4).alias("tfidf")))


# --------------------------------------------------------------------- #
# PII redaction (corpus scrubbing before training; patterns are
# RE2-safe — no backreferences or lookaround — so an external engine
# can replay them verbatim)
# --------------------------------------------------------------------- #
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("phone", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
)


def redact_pii(df: DataFrame, text_col: str = "text",
               out_col: str | None = None) -> DataFrame:
    """Sequential global ``regexp_replace`` per PII class, email first
    (so digits inside an address never half-match a phone), SSN last
    (its 3-2-4 grouping cannot collide with the phone's 3-3-4).
    Map-only, no shuffle; each pattern is a single linear RE2-safe
    scan, ~3 passes over the text per row."""
    out_col = out_col or text_col
    c = F.col(text_col)
    for _, pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return df.withColumn(out_col, c)


def vocab_with_ids(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", size: int | None = None,
                   min_doc_freq: int = 1) -> DataFrame:
    """(token, token_id) — ids assigned 1..N by corpus frequency
    (total_count desc, token asc as the deterministic tie-break; 0 is
    reserved for OOV).  The ranking runs over the ALREADY-AGGREGATED
    vocab (|distinct tokens| rows, not corpus rows) and is DISTRIBUTED
    (operators.windows.global_row_number: range partitions + driver
    prefix offsets) — web-scale corpora have vocabularies far too big
    for a single-partition ranking window.  Cap with ``size`` for a
    fixed vocabulary."""
    from cs186_query_optimization_project_spark.operators.windows import (
        global_row_number)

    v = vocab(df, text_col, id_col, min_doc_freq)
    out = (global_row_number(v, F.col("total_count").desc(),
                             F.col("token"), out_col="token_id")
           .select("token", F.col("token_id").cast("int")
                   .alias("token_id")))
    # `is not None`: size=0 is a legitimate (empty) cap, not "no cap"
    return (out.filter(F.col("token_id") <= size)
            if size is not None else out)


def encode_documents(df: DataFrame, vocab_ids: DataFrame,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Tokenize and map each document to its id sequence:
    (id, n_tokens, n_oov, ids) with ``ids`` the comma-joined token-id
    string in document order (OOV → 0).  The bridge between
    ``vocab``/``vocab_with_ids`` and sequence packing — together they
    are the tokenize→encode→pack training-data path.

    Shape: posexplode (position must survive the shuffle to rebuild
    order), broadcast vocab join (a vocabulary is ≤ a few million rows
    — dimension-sized next to a corpus), then one groupBy(id) that
    sorts (pos, id) structs row-locally.  Ids ride as a STRING, not
    array<int>, because downstream comparators hash rows (arrays are
    unhashable in pandas-based canonicalizers)."""
    tok = (df.select(F.col(id_col),
                     F.posexplode(tokens(text_col))
                     .alias("__pos", "token"))
           .filter(F.col("token") != ""))
    mapped = (tok.join(F.broadcast(vocab_ids), "token", "left")
              .select(F.col(id_col),
                      F.struct("__pos",
                               F.coalesce(F.col("token_id"), F.lit(0))
                               .alias("tid")).alias("__s")))
    ordered = F.transform(F.sort_array(F.collect_list("__s")),
                          lambda s: s["tid"])
    encoded = (mapped.groupBy(id_col)
               .agg(F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
                    F.sum((F.col("__s.tid") == 0).cast("bigint"))
                    .cast("bigint").alias("n_oov"),
                    F.array_join(ordered, ",").alias("ids")))
    # empty/whitespace-only documents lose all their rows to the token
    # filter above — re-attach them as n_tokens=0 rows rather than
    # silently dropping documents from a tokenize→encode→pack pipeline
    return (df.select(id_col).distinct()
            .join(encoded, id_col, "left")
            .select(id_col,
                    F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
                    F.coalesce("n_oov", F.lit(0)).alias("n_oov"),
                    F.coalesce("ids", F.lit("")).alias("ids")))


# --------------------------------------------------------------------- #
# corpus language-model statistics
# --------------------------------------------------------------------- #
def unigram_logprob(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's own
    empirical unigram distribution — the classic cheap "perplexity"
    quality signal (a doc of globally-rare tokens scores low; natural
    prose scores high).

    Shape at scale: one explode + groupBy builds the vocabulary (token
    count table); docs' tokens join it on token and re-aggregate per
    doc.  The vocab table is Zipf-bounded (far smaller than the corpus)
    and the join key is the token itself, so AQE can broadcast it for
    real corpora; no Python anywhere.

    Output: ``(id, n_tokens, avg_logprob, pseudo_perplexity)`` where
    ``pseudo_perplexity = exp(-avg_logprob)``.
    """
    toks = (df.select(F.col(id_col),
                      F.explode(tokens(text_col)).alias("token"))
            .filter(F.col("token") != ""))
    vocab_counts = toks.groupBy("token").agg(
        F.count(F.lit(1)).alias("__tc"))
    total = toks.agg(F.count(F.lit(1)).alias("__n"))
    return (toks.join(vocab_counts, "token")
            .crossJoin(F.broadcast(total))
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).cast("long").alias("n_tokens"),
                 F.round(F.avg(F.log(F.col("__tc") / F.col("__n"))), 6)
                 .alias("avg_logprob"))
            .withColumn("pseudo_perplexity",
                        F.round(F.exp(-F.col("avg_logprob")), 4)))


def bigram_counts(df: DataFrame, text_col: str = "text",
                  min_count: int = 2) -> DataFrame:
    """Corpus bigram table with conditional probability
    ``p(next | first) = count(first next) / count(first ·)``.

    The bigram array is built in place with ``zip_with`` over two
    shifted slices (O(tokens) per doc, zero Python); counting is the
    standard explode + partial-aggregated groupBy.  The denominator
    counts *bigram occurrences starting with the token* (i.e. the token
    as a non-final position), so probabilities sum to 1 per first
    token.  At web scale you'd add count-min for the tail; the exact
    table here is Zipf-bounded like the vocabulary.
    """
    # named intermediate column so both slices share one tokenization
    # (the lambda let-binding lesson, SCALE.md)
    with_toks = df.select(tokens(text_col).alias(f"{text_col}_toks"))
    pair = (with_toks
            .select(F.explode(F.expr(
                f"zip_with(slice({text_col}_toks, 1, "
                f"size({text_col}_toks) - 1), "
                f"slice({text_col}_toks, 2, size({text_col}_toks) - 1), "
                f"(a, b) -> concat(a, ' ', b))")).alias("bigram"))
            .filter(~F.col("bigram").rlike("^ | $"))
            .groupBy("bigram")
            .agg(F.count(F.lit(1)).alias("pair_count")))
    first = (pair
             .withColumn("first_token",
                         F.substring_index("bigram", " ", 1)))
    totals = (first.groupBy("first_token")
              .agg(F.sum("pair_count").alias("first_count")))
    return (first.join(totals, "first_token")
            .filter(F.col("pair_count") >= min_count)
            .select("bigram",
                    F.col("pair_count").cast("long").alias("pair_count"),
                    F.col("first_count").cast("long").alias("first_count"),
                    F.round(F.col("pair_count") / F.col("first_count"), 6)
                    .alias("cond_prob")))


# --------------------------------------------------------------------- #
# URL canonicalization (crawl-pipeline dedup key)
# --------------------------------------------------------------------- #
#: query parameters that carry tracking state, not content identity —
#: the standard strip set (Google Analytics utm_*, Facebook fbclid,
#: Google Ads gclid, Microsoft msclkid)
TRACKING_PARAM_PREFIXES: tuple[str, ...] = ("utm_",)
TRACKING_PARAMS: tuple[str, ...] = ("fbclid", "gclid", "msclkid")


def url_normalize(url: Column | str, strip_www: bool = True) -> Column:
    """Canonical form of an absolute http(s) URL, entirely JVM-side —
    the dedup key a crawl pipeline groups on (the same page arrives
    under dozens of surface forms; content-hash dedup misses them when
    boilerplate differs, URL canonicalization catches them for free):

    - scheme and host lowercase; ``www.`` stripped (``strip_www``)
    - default ports dropped (``:80`` for http, ``:443`` for https)
    - fragment removed (never sent to the server)
    - tracking query params removed (``TRACKING_PARAM_PREFIXES`` /
      ``TRACKING_PARAMS``), remaining params SORTED byte-wise so
      ``?b=2&a=1`` equals ``?a=1&b=2``
    - one trailing slash stripped from a non-root path

    Input must carry an explicit scheme (crawl frontiers store
    absolute URLs); anything else passes through ``trim`` unchanged
    enough to stay a stable (if non-canonical) key.  URLs whose
    authority carries userinfo (``user:pass@host``) or an IPv6 literal
    (``[2001:db8::1]``) ALSO pass through trim-only: the host/port
    split below would mis-parse them and collapse *distinct* URLs to
    one canonical key — silent data loss in ``url_dedup``.  Trim-only
    keeps them stable, never falsely colliding, keys.  Pure
    ``pyspark.sql.functions`` composition — no UDF, and every rule is
    ANSI-SQL-replayable for oracles."""
    raw = F.trim(url if isinstance(url, Column) else F.col(url))
    u = F.substring_index(raw, "#", 1)               # drop fragment
    base = F.substring_index(u, "?", 1)
    query = F.when(u.contains("?"),
                   F.substr(u, F.instr(u, "?") + F.lit(1)))
    scheme = F.lower(F.substring_index(base, "://", 1))
    rest = F.substring_index(base, "://", -1)
    hostport = F.substring_index(rest, "/", 1)
    path = F.substr(rest, F.length(hostport) + F.lit(1))
    host = F.lower(F.substring_index(hostport, ":", 1))
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    port = F.when(hostport.contains(":"),
                  F.substring_index(hostport, ":", -1))
    keep_port = (port.isNotNull()
                 & ~((scheme == "http") & (port == "80"))
                 & ~((scheme == "https") & (port == "443")))
    path = F.when(path == "", F.lit("")) \
        .otherwise(F.regexp_replace(path, r"/$", ""))
    drop = F.lit(list(TRACKING_PARAMS))
    prefixes = list(TRACKING_PARAM_PREFIXES)

    def _kept(p):
        name = F.substring_index(p, "=", 1)
        cond = ~F.array_contains(drop, name)
        for pre in prefixes:
            cond = cond & ~name.startswith(pre)
        return cond & (p != "")

    params = F.array_sort(F.filter(F.split(query, "&"), _kept))
    qstr = F.when(query.isNotNull() & (F.size(params) > 0),
                  F.concat(F.lit("?"), F.array_join(params, "&"))) \
        .otherwise(F.lit(""))
    # userinfo / IPv6 authorities: the ':'-split host/port parse above
    # would collapse distinct URLs — pass through trim-only instead
    opaque_authority = hostport.contains("@") | hostport.startswith("[")
    return F.when(opaque_authority, raw).otherwise(F.concat(
        scheme, F.lit("://"), host,
        F.when(keep_port, F.concat(F.lit(":"), port))
        .otherwise(F.lit("")),
        path, qstr))


def url_dedup(df: DataFrame, url_col: str = "url",
              id_col: str = "doc_id") -> DataFrame:
    """One keeper per canonical URL (min id — deterministic), plus the
    group size: ``groupBy(url_normalize(url))`` — a hash aggregate on
    the canonical key, the cheapest dedup tier a crawl pipeline runs
    BEFORE any content hashing.  Returns (canonical_url, keeper id,
    n_dups)."""
    return (df.select(url_normalize(url_col).alias("canonical_url"),
                      F.col(id_col))
            .groupBy("canonical_url")
            .agg(F.min(id_col).alias("keeper"),
                 F.count(F.lit(1)).alias("n_dups")))


# --------------------------------------------------------------------- #
# Boilerplate line stripping (C4 / RefinedWeb-style line-level dedup)
# --------------------------------------------------------------------- #
def strip_boilerplate(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id",
                      group_col: str = "source",
                      min_doc_ratio: float = 0.5,
                      min_docs: int = 2,
                      sep: str = "\n") -> DataFrame:
    """LINE-level boilerplate removal within a domain — the C4 /
    RefinedWeb cleaning step document-level dedup cannot express: a
    line (nav bar, cookie banner, footer) appearing in ≥
    ``min_doc_ratio`` of a ``group_col`` domain's documents (and in at
    least ``min_docs`` of them — the ratio alone would strip every
    line of a one-document domain) is removed from EVERY document of
    that domain; the survivors reassemble in original line order.

    Returns ``(id_col, group_col, n_lines, n_kept, text)`` with
    ``text`` rebuilt from the kept lines.  A document whose every line
    was boilerplate keeps a row with ``n_kept = 0`` and empty text —
    dropping it is the caller's policy decision, not the cleaner's.

    Scale shape: one ``posexplode`` (linear), one per-(domain, line)
    distinct-doc count whose shuffle carries distinct lines — bounded
    by content, with map-side partial aggregation — a broadcast-able
    boilerplate list per domain in the common case, and one
    ``collect_list`` reassembly per document (the same width as the
    input row).  No UDFs, no driver materialization; every step is
    ANSI-SQL-replayable (``string_agg(line, sep ORDER BY pos)``)."""
    # `sep` is a LITERAL separator: F.split takes a Java regex, so a
    # metacharacter sep ('|', '.') would silently split per-character
    # while array_join rebuilt with the literal — escape before split.
    sep_rx = re.escape(sep)
    lines = (df.select(
        F.col(id_col), F.col(group_col),
        F.posexplode(F.split(F.col(text_col), sep_rx))
        .alias("__pos", "__line")))
    domain_docs = (df.groupBy(group_col)
                   .agg(F.count(F.lit(1)).alias("__n_docs")))
    boiler = (lines.groupBy(group_col, "__line")
              .agg(F.count_distinct(F.col(id_col)).alias("__n_in"))
              .join(F.broadcast(domain_docs), group_col)
              .filter((F.col("__n_in") >= F.lit(min_docs))
                      & (F.col("__n_in")
                         >= F.col("__n_docs") * F.lit(min_doc_ratio)))
              .select(group_col, "__line"))
    kept = lines.join(boiler, [group_col, "__line"], "left_anti")
    totals = (lines.groupBy(id_col, group_col)
              .agg(F.count(F.lit(1)).alias("n_lines")))
    # reassembly keys on id_col ALONE (a document id names one doc —
    # its group is already carried by `totals`): joining on group_col
    # too would silently blank every NULL-domain document's text, a
    # plain equi-join never matching NULL = NULL
    rebuilt = (kept.groupBy(id_col)
               .agg(F.count(F.lit(1)).alias("n_kept"),
                    F.array_join(
                        F.transform(
                            F.array_sort(F.collect_list(
                                F.struct("__pos", "__line"))),
                            lambda s: s["__line"]),
                        sep).alias("text")))
    return (totals.join(rebuilt, [id_col], "left")
            .select(id_col, group_col,
                    F.col("n_lines").cast("long").alias("n_lines"),
                    F.coalesce("n_kept", F.lit(0)).cast("long")
                    .alias("n_kept"),
                    F.coalesce("text", F.lit("")).alias("text")))
