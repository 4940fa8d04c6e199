"""Sampling operators for training-data pipelines.

The reference engine has no sampling surface (its API is exact-only);
these are the additive ops a corpus pipeline needs when materializing
training mixtures. Two shapes:

- :func:`hash_split` — *deterministic* membership: a row's split depends
  only on its id (md5 bucket), not on partitioning, executor count, or
  engine. ``df.randomSplit`` reshuffles membership whenever the
  partition layout changes, which silently leaks test rows into training
  sets between runs; hash bucketing is the reproducible alternative and
  is what any other system (DuckDB, Trino, plain Python) can replay
  bit-for-bit from the same ids.
- :func:`stratified_sample` — per-stratum Bernoulli sampling
  (``sampleBy``), the class-rebalancing primitive. Seeded, but the draw
  depends on row order within partitions, so it is checked rows-only.

Both are pure JVM expressions / built-in operators — no Python in the
row path, so they scale like any scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket(id_col: str | Column, n_buckets: int = 100,
                salt: str = "") -> Column:
    """Stable bucket in ``[0, n_buckets)`` from the first 8 hex digits of
    ``md5(id || salt)``.  32 bits of the digest are enough for bucket
    assignment and keep the arithmetic in BIGINT range everywhere."""
    col = id_col if isinstance(id_col, Column) else F.col(id_col)
    hashed = F.md5(F.concat(col.cast("string"), F.lit(salt)))
    return (F.conv(F.substring(hashed, 1, 8), 16, 10)
            .cast("bigint") % n_buckets)


def hash_split(df: DataFrame, id_col: str, train_pct: int = 80,
               salt: str = "", out: str = "split") -> DataFrame:
    """Tag each row ``train``/``test`` by deterministic hash bucket.

    ``salt`` versions the split: a new salt is a fresh, independent
    assignment (e.g. per experiment) without touching the data.
    """
    if not 0 < train_pct < 100:
        raise ValueError(f"train_pct must be in (0, 100), got {train_pct}")
    bucket = hash_bucket(id_col, 100, salt)
    return df.withColumn(
        out, F.when(bucket < train_pct, F.lit("train"))
        .otherwise(F.lit("test")))


def stratified_sample(df: DataFrame, strata_col: str,
                      fractions: dict[object, float],
                      seed: int = 42) -> DataFrame:
    """Per-stratum Bernoulli sample (``sampleBy``): keeps ~``fractions[v]``
    of the rows with ``strata_col = v`` and drops strata not listed.
    At scale this is a map-only pass — no shuffle, no collected state."""
    return df.sampleBy(strata_col, fractions, seed)


def hash_stratified_sample(df: DataFrame, strata_col: str, id_col: str,
                           fractions: dict[object, float],
                           salt: str = "") -> DataFrame:
    """Deterministic stratified sample: keep a row iff its md5 bucket (of
    ``id_col``, in [0, 1000)) falls under ``fractions[stratum] * 1000``.

    Same reproducibility argument as :func:`hash_split` vs ``randomSplit``:
    ``sampleBy``'s seeded draw depends on row order *within partitions*,
    so a repartition — or a different executor count — silently reselects
    the sample.  Hash membership depends only on the row's id, survives
    any relayout, and is replayable bit-for-bit by any engine with md5
    (which also makes it oracle-checkable).  Strata not listed are
    dropped, matching ``sampleBy``.  Fractions are quantized to 1/1000."""
    for v, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for stratum {v!r} must be in "
                             f"[0, 1], got {frac}")
    bucket = hash_bucket(id_col, 1000, salt)
    thresh = F.create_map(*[
        x for v, frac in fractions.items()
        for x in (F.lit(v), F.lit(int(round(frac * 1000))))])
    return df.filter(bucket < thresh[F.col(strata_col)])


def weighted_sample(df: DataFrame, weight_col: str, id_col: str,
                    rate: float = 1.0) -> DataFrame:
    """Deterministic weighted Bernoulli sample: each row keeps with
    probability ``rate * weight / max_weight``.

    The coin flip is ``hash_uniform(id) < p(row)`` with the portable
    md5-based uniform — membership depends only on the row's id and
    weight, never on partition layout, executor count, or visit order,
    so the sample is reproducible across cluster shapes (the property
    ``rand(seed)`` does NOT give you: its stream is per-partition).

    ``max_weight`` comes from a one-row aggregate crossJoined back
    (broadcast — no driver collect, no second pass over the data in
    the plan; Spark reuses the scan via the exchange).
    """
    from cs186_query_optimization_project_spark.functions.sketches import (
        _H60,
    )
    mx = df.agg(F.max(weight_col).alias("__mx"))
    u = (F.expr(_H60.format(x=f"cast({id_col} as string)")).cast("double")
         / float(2 ** 60))
    # weight-domain guard: membership requires a POSITIVE weight and a
    # positive max.  Without it, an all-non-positive weight column
    # flips the ratio's sign (negative/negative) and would sample the
    # MOST negative weights with the highest probability; with it,
    # zero/negative-weight rows are never sampled (p ∝ weight, and
    # p <= 0 means out) and a degenerate corpus yields an empty sample
    # instead of a nonsensical one.
    return (df.crossJoin(F.broadcast(mx))
            .filter((F.col(weight_col) > 0) & (F.col("__mx") > 0)
                    & (u < F.lit(rate) * F.col(weight_col)
                       / F.col("__mx")))
            .drop("__mx"))


def mixture_sample(df: DataFrame, domain_col: str, weights: dict,
                   id_col: str, salt: str = "") -> DataFrame:
    """Compose a training mixture to TARGET PROPORTIONS: keep a subset
    of ``df`` in which each listed domain contributes ``weights[d]`` of
    the output (in expectation), at the largest total the corpus can
    supply without repeating rows.

    This is the data-mixture step of corpus assembly (e.g. "50% web,
    25% code, 25% books"): :func:`hash_stratified_sample` takes per-
    stratum RATES; this derives the rates FROM the targets and the
    observed counts.  Feasibility: the output total is capped by the
    scarcest domain, ``T = min_d(count_d / weight_d)``, giving keep
    rates ``rate_d = weight_d * T / count_d`` (== 1.0 for the binding
    domain).  Domains not listed are dropped; a listed domain with no
    rows raises (the mixture is unsatisfiable, not silently skewed).

    Shape at scale: one tiny aggregate collects |domains| counts
    (bounded-scalar class, like the IVF centroid pull), then the filter
    is a map-only pass — membership is ``hash_uniform(id) < rate_d``
    with the portable md5 uniform, so the sample is independent of
    partition layout and replayable bit-for-bit by an external SQL
    oracle (the :func:`hash_split` reproducibility argument).
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    for d, w in weights.items():
        if w <= 0:
            raise ValueError(
                f"weight for domain {d!r} must be > 0, got {w}")
    total_w = sum(weights.values())
    norm = {d: w / total_w for d, w in weights.items()}
    counts = {r["d"]: r["n"] for r in
              (df.filter(F.col(domain_col).isin(list(weights)))
               .groupBy(F.col(domain_col).alias("d"))
               .agg(F.count(F.lit(1)).alias("n")).collect())}
    missing = [d for d in weights if d not in counts]
    if missing:
        raise ValueError(
            f"mixture unsatisfiable: no rows for domains {missing!r}")
    cap = min(counts[d] / norm[d] for d in norm)
    rates = {d: min(1.0, norm[d] * cap / counts[d]) for d in norm}
    # salt rides in as a Column literal, never interpolated into SQL
    # text (the funnel/correlation_matrix escaping lesson): a salt
    # containing quotes/backslashes must not alter the hash expression
    u = (F.conv(F.substring(F.md5(F.concat(
            F.lit(salt), F.col(id_col).cast("string"))), 1, 15), 16, 10)
         .cast("bigint").cast("double") / float(2 ** 60))
    rate = F.create_map(*[
        x for d, r in rates.items() for x in (F.lit(d), F.lit(r))])
    return df.filter(u < rate[F.col(domain_col)])


def sample_k_per_group(df: DataFrame, strata_col: str, id_col: str,
                       k: int, salt: str = "") -> DataFrame:
    """Exact-``k`` deterministic sample per stratum ("give me k docs
    per language"): rows rank within their stratum by the portable
    md5 uniform (id tie-break) and the first ``k`` win.  Membership is
    a pure function of (id, salt) order statistics — partition-layout
    independent and replayable in SQL.

    Two-phase at scale: ranking a 100 TB stratum outright would sort
    the whole stratum under one window.  Instead a broadcast count per
    stratum derives a loose hash threshold ``rate = min(1,
    (20k + 100) / n)`` that pre-prunes each stratum to an expected
    ``20k + 100`` candidate rows MAP-SIDE (the same coin the final
    rank orders by, so the true top-k always survives it unless fewer
    than k candidates pass — Chernoff-bounded below e^-40 even at
    k=1); the row_number window then sorts only the tiny candidate
    set.  The pre-prune is part of the operator's definition (the
    oracle replays both phases), so the output is deterministic even
    on the astronomically-unlikely tail.
    """
    if k <= 0:
        raise ValueError(f"k must be > 0, got {k}")
    counts = (df.groupBy(F.col(strata_col).alias("__d"))
              .agg(F.count(F.lit(1)).cast("double").alias("__n")))
    rates = counts.select(
        "__d", F.least(F.lit(1.0),
                       F.lit(float(20 * k + 100)) / F.col("__n"))
        .alias("__rate"))
    u = (F.conv(F.substring(F.md5(F.concat(
            F.lit(salt), F.col(id_col).cast("string"))), 1, 15), 16, 10)
         .cast("bigint").cast("double") / float(2 ** 60))
    cand = (df.join(F.broadcast(rates), df[strata_col] == F.col("__d"))
            .withColumn("__u", u)
            .filter(F.col("__u") < F.col("__rate")))
    w = (Window.partitionBy(strata_col)
         .orderBy(F.col("__u"), F.col(id_col)))
    return (cand.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .drop("__d", "__rate", "__u"))


def temperature_mixture(df: DataFrame, domain_col: str, id_col: str,
                        alpha: float = 0.5, salt: str = "") -> DataFrame:
    """Temperature-flattened mixture: resample so domain d's output
    share ∝ p_d^alpha — the multilingual-pretraining rebalance
    (Arivazhagan et al. 2019 §5, "Massively Multilingual NMT"; XLM-R,
    Conneau et al. 2020) that lifts tail domains without repeating
    rows.  With no-repeat sampling the rate algebra collapses: the
    binding (fully-kept) domain is the rarest one and every other
    domain keeps ``rate_d = (c_min / c_d)^(1-alpha)``.

    ``alpha=0.5`` (temperature 2, the default) computes the rate as
    ``sqrt(c_min) / sqrt(c_d)`` — IEEE-754 ``sqrt`` and divide are
    exactly rounded, so the rates (hence the md5-coin membership) are
    bit-identical in any conforming engine, SQL oracles included.
    Other alphas route through libm ``pow`` — deterministic on one
    machine, last-ulp risk across math libraries (documented, not
    oracle-checked).

    Fully distributed — no driver collect: per-domain counts are a
    groupBy, the min count is a one-row aggregate crossJoined back
    (broadcast), and the |domains|-row rate table broadcast-joins onto
    the corpus; the final membership filter is map-side.
    """
    counts = (df.groupBy(F.col(domain_col).alias("__d"))
              .agg(F.count(F.lit(1)).cast("double").alias("__n")))
    mn = counts.agg(F.min("__n").alias("__mn"))
    if alpha == 0.5:
        rate = F.sqrt(F.col("__mn")) / F.sqrt(F.col("__n"))
    else:
        rate = F.pow(F.col("__mn") / F.col("__n"), F.lit(1.0 - alpha))
    rates = (counts.crossJoin(F.broadcast(mn))
             .select("__d", rate.alias("__rate")))
    u = (F.conv(F.substring(F.md5(F.concat(
            F.lit(salt), F.col(id_col).cast("string"))), 1, 15), 16, 10)
         .cast("bigint").cast("double") / float(2 ** 60))
    return (df.join(F.broadcast(rates),
                    df[domain_col] == F.col("__d"))
            .filter(u < F.col("__rate"))
            .drop("__d", "__rate"))


def preference_pairs(df: DataFrame, group_col: str, id_col: str,
                     score_col: str,
                     min_margin: float = 0.0) -> DataFrame:
    """Preference-PAIR mining — the DPO/RLHF data-assembly step that
    turns a scored pool into (chosen, rejected) training pairs: per
    ``group_col`` (prompt id, domain, source), the highest-scored
    example pairs against the lowest-scored, keeping pairs whose
    score margin is at least ``min_margin``.  Deterministic
    tie-breaks so the pairing is engine-replayable: chosen = argmax
    of ``(score, id)`` (highest score, then LARGEST id), rejected =
    argmin of ``(score, id)`` (lowest score, then SMALLEST id);
    NULL-scored rows are excluded (unscorable examples can anchor
    neither side), and single-example groups produce no pair
    (chosen = rejected is filtered).

    Output: ``(group_col, chosen_id, rejected_id, chosen_score,
    rejected_score, margin)`` with margin rounded to 6 decimals
    before the threshold.

    NULL group keys anchor NO pair: rows whose ``group_col`` is NULL
    are dropped up front (an unattributable example belongs to no
    prompt/source group).  Spark's ``groupBy`` would otherwise form a
    NULL group — which a SQL equality self-join (the natural oracle
    shape) silently drops — so filtering is both the semantically
    honest choice and what keeps the operator engine-replayable.

    Scale shape: ONE aggregation (``max_by``/``min_by`` over a struct
    ordering) with MAP-SIDE PARTIAL merge — each input partition
    reduces to at most one candidate per group BEFORE the shuffle, so
    the exchange carries O(partitions × groups) rows, never the
    corpus (a per-group ``row_number`` window would shuffle every
    row).  Spark plans the struct-ordered extrema as a SortAggregate
    (the sort is by GROUP KEY within partitions — spillable, not a
    per-group ordering by score); there is no Window anywhere, pinned
    by a plan test."""
    scored = df.filter(F.col(score_col).isNotNull()
                       & F.col(group_col).isNotNull())
    agg = (scored.groupBy(group_col)
           .agg(F.expr(f"max_by({id_col}, struct({score_col}, "
                       f"{id_col}))").alias("chosen_id"),
                F.max(score_col).alias("chosen_score"),
                F.expr(f"min_by({id_col}, struct({score_col}, "
                       f"{id_col}))").alias("rejected_id"),
                F.min(score_col).alias("rejected_score")))
    return (agg.filter(F.col("chosen_id") != F.col("rejected_id"))
            .select(group_col, "chosen_id", "rejected_id",
                    "chosen_score", "rejected_score",
                    F.round(F.col("chosen_score")
                            - F.col("rejected_score"), 6)
                    .alias("margin"))
            .filter(F.col("margin") >= F.lit(float(min_margin))))


def token_budget_mix(df: DataFrame, domain_col: str, id_col: str,
                     text_col: str = "text",
                     budget_tokens: int = 10_000,
                     salt: str = "") -> DataFrame:
    """Budget-capped per-domain selection — the "take B tokens of each
    domain" step of training-mixture assembly: within each domain,
    rows order by the portable md5 coin (a uniform shuffle that
    depends only on ids — reproducible across partitionings and
    engines, unlike ``rand(seed)``'s per-partition streams) and a row
    is kept while the RUNNING token total BEFORE it is under the
    budget.  The first row of a domain is therefore always kept (every
    budget admits at least one document, the standard greedy-knapsack
    convention), and each domain overshoots by at most one document.

    One cumulative-sum window per domain — a single shuffle on
    ``domain_col``.  A skewed mega-domain serializes its own window
    into one task; if that bites, pre-filter with
    :func:`hash_stratified_sample` to a few× the budget first so the
    window runs over a bounded candidate set (the budget itself bounds
    how much can be kept, so pre-thinning loses nothing but tail
    randomness).

    Returns the kept rows with ``n_tokens`` (whitespace count, the
    same definition the token-counting operator uses) and
    ``cum_before`` — deterministic, SQL-replayable."""
    toks = F.size(F.split(F.col(text_col), r"\s+"))
    # the portable md5-top-60-bit uniform, built from COLUMN
    # expressions (F.lit carries the salt) — interpolating the salt
    # into an F.expr SQL string would break on quotes/backslashes
    u = F.conv(F.substring(F.md5(F.concat(
        F.lit(salt), F.col(id_col).cast("string"))), 1, 15),
        16, 10).cast("bigint")
    w = (Window.partitionBy(domain_col)
         .orderBy(u.asc(), F.col(id_col).asc()))
    cum_before = (F.sum(toks).over(w) - toks).cast("bigint")
    return (df.withColumn("n_tokens", toks.cast("bigint"))
            .withColumn("cum_before", cum_before)
            .filter(F.col("cum_before") < F.lit(int(budget_tokens))))
