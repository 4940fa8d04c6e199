"""Data-profiling operators: key-skew diagnostics and outlier flags.

Operational companions to the optimizer's table stats
(``plans/stats.py``): before running a 100 TB join you want to know
whether the join key is skewed (one reducer gets the hot key's rows)
and whether a numeric column has pathological values.  Both operators
are pure two-level aggregations — the first groupBy shuffles on the
key/group, the second collapses to a handful of rows — so they cost
one pass over the table and are safe to run at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cs186_query_optimization_project_spark.parallel import local_rows_df


def key_skew(df: DataFrame, key_col: str,
             hot_factor: float = 2.0) -> DataFrame:
    """One-row skew profile of ``key_col``'s value distribution.

    ``skew_ratio = max_count / avg_count`` is the headline: it bounds
    how unbalanced a shuffle partitioned on this key can get (ratio 1 =
    uniform; at ratio 50 the hot key's reducer does 50× the average
    work and you want salting or AQE skew-join before running the real
    query).  ``hot_keys`` counts keys above ``hot_factor ×`` average.

    Shape: groupBy(key).count() — the same partial-aggregated shuffle
    the real join would do, but carrying only counts — then a scalar
    aggregate.  Counts are re-aggregated, never collected.
    """
    per_key = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("cnt"))
    stats = per_key.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("cnt").cast("long").alias("n_rows"),
        F.max("cnt").cast("long").alias("max_count"),
        (F.sum("cnt") / F.count(F.lit(1))).alias("__avg"))
    hot = (per_key.crossJoin(F.broadcast(stats.select("__avg")))
           .filter(F.col("cnt") > F.lit(hot_factor) * F.col("__avg"))
           .agg(F.count(F.lit(1)).cast("long").alias("hot_keys")))
    return (stats.crossJoin(hot)
            .select("n_keys", "n_rows", "max_count",
                    F.round("__avg", 6).alias("avg_count"),
                    F.round(F.col("max_count") / F.col("__avg"), 4)
                    .alias("skew_ratio"),
                    "hot_keys"))


def zscore_outliers(df: DataFrame, value_col: str, group_col: str,
                    threshold: float = 3.0) -> DataFrame:
    """Rows whose ``value_col`` is more than ``threshold`` population
    standard deviations from their group's mean.

    Two-pass shape that scales: pass 1 computes per-group (mean, stddev)
    — a tiny aggregate that *broadcasts* back; pass 2 re-scans and
    filters.  No window function, so no per-group sort and no state
    beyond the group stats.  ``stddev_pop`` (not sample) so a 1-row
    group yields 0, never null/NaN division.

    Output: the outlier rows' ids plus their z-score (rounded — ranking
    stable across partitionings).
    """
    stats = (df.groupBy(group_col)
             .agg(F.avg(value_col).alias("__mu"),
                  F.stddev_pop(value_col).alias("__sigma")))
    cols = [F.col(c) for c in df.columns]
    return (df.join(F.broadcast(stats), group_col)
            .filter((F.col("__sigma") > 0)
                    & (F.abs(F.col(value_col) - F.col("__mu"))
                       > F.lit(threshold) * F.col("__sigma")))
            .select(*cols,
                    F.round((F.col(value_col) - F.col("__mu"))
                            / F.col("__sigma"), 4).alias("zscore")))


def psi_drift(df_a: DataFrame, df_b: DataFrame, value_col: str,
              n_bins: int = 10, eps: float = 1e-6) -> DataFrame:
    """Population Stability Index between two samples of ``value_col``
    — the standard train-vs-serve / week-over-week drift check
    (PSI < 0.1 stable, 0.1–0.25 moderate, > 0.25 action).

    Bin edges are equal-width over the UNION's [min, max] (one tiny
    scalar aggregate, broadcast back), so both samples are binned
    identically; each side then collapses to ≤ n_bins rows before the
    final ≤ n_bins-row join — totals are re-aggregated from those bin
    counts, so each sample is scanned once, lazily.  ``eps`` floors
    empty-bin proportions so the log term stays finite (the PSI
    convention).  NULL values are excluded (a drift check on presence
    of nulls is a different check); a constant column (min == max)
    degenerates to one bin with PSI 0 instead of dividing by a zero
    bin width.

    Output: one row per bin (bin, pct_a, pct_b, psi_term) — sum
    psi_term for the headline index.
    """
    va = (df_a.select(F.col(value_col).cast("double").alias("v"))
          .filter(F.col("v").isNotNull()))
    vb = (df_b.select(F.col(value_col).cast("double").alias("v"))
          .filter(F.col("v").isNotNull()))
    mm = (va.unionAll(vb)
          .agg(F.min("v").alias("__lo"), F.max("v").alias("__hi")))

    def binned(df, side):
        # the CASE guards the otherwise-branch division: Spark
        # evaluates CASE branches lazily per row, so hi == lo never
        # reaches the zero-width divide (ANSI mode raises on it)
        return (df.crossJoin(F.broadcast(mm))
                .select(F.when(F.col("__hi") == F.col("__lo"), F.lit(1))
                        .otherwise(F.least(
                            F.floor((F.col("v") - F.col("__lo"))
                                    / ((F.col("__hi") - F.col("__lo"))
                                       / n_bins))
                            .cast("int") + 1, F.lit(n_bins)))
                        .alias("bin"))
                .groupBy("bin")
                .agg(F.count(F.lit(1)).alias(f"n_{side}")))
    a, b = binned(va, "a"), binned(vb, "b")
    tot_a = a.agg(F.greatest(F.coalesce(F.sum("n_a"), F.lit(0)),
                             F.lit(1)).alias("__ta"))
    tot_b = b.agg(F.greatest(F.coalesce(F.sum("n_b"), F.lit(0)),
                             F.lit(1)).alias("__tb"))
    joined = (a.join(b, "bin", "full_outer")
              .crossJoin(F.broadcast(tot_a))
              .crossJoin(F.broadcast(tot_b)))
    pct_a = F.greatest(F.coalesce(F.col("n_a"), F.lit(0))
                       / F.col("__ta"), F.lit(eps))
    pct_b = F.greatest(F.coalesce(F.col("n_b"), F.lit(0))
                       / F.col("__tb"), F.lit(eps))
    return (joined.select(
        F.col("bin"),
        F.round(pct_a, 6).alias("pct_a"),
        F.round(pct_b, 6).alias("pct_b"),
        F.round((pct_a - pct_b) * F.log(pct_a / pct_b), 6)
        .alias("psi_term"))
        .orderBy("bin"))


def correlation_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pairwise Pearson correlations of ``cols`` in one aggregation
    pass: all C(n,2) ``corr`` aggregates compute map-side in a single
    scan/shuffle (vs one job per pair the naive loop would run).

    Output: (col_a, col_b, corr) for a < b, ordered.
    """
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1:]]
    aggs = [F.round(F.corr(a, b), 6).alias(f"{a}__{b}")
            for a, b in pairs]
    wide = df.agg(*aggs)

    # column names are DATA here: backtick-quote the identifier
    # references (doubling any embedded backtick) and escape the string
    # literals, so names with spaces/quotes/dashes generate valid SQL
    def _ident(name: str) -> str:
        return "`" + name.replace("`", "``") + "`"

    def _lit(name: str) -> str:
        return "'" + name.replace("\\", "\\\\").replace("'", "\\'") + "'"

    stack = ", ".join(
        f"{_lit(a)}, {_lit(b)}, {_ident(f'{a}__{b}')}" for a, b in pairs)
    return (wide.select(F.expr(
        f"stack({len(pairs)}, {stack}) AS (col_a, col_b, corr)"))
        .orderBy("col_a", "col_b"))


def ks_drift(df_a: DataFrame, df_b: DataFrame,
             value_col: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic D = sup over v of
    |ECDF_a(v) − ECDF_b(v)| — the bin-free complement to
    :func:`psi_drift` (PSI needs a bin count and is blind to drift
    inside a bin; KS is exact on the observed value domain, the
    classic train-vs-serve distribution test).

    Shape — the fully distributed ECDF (no global window): each side
    collapses to per-value counts first (one groupBy whose shuffle
    carries DISTINCT values with map-side combine, not rows), the two
    count tables full-outer-merge on the value, and the merged table is
    range-repartitioned by value and pinned with a localCheckpoint so
    two passes see identical partitions.  Pass 1 collects ONE row per
    partition (its count totals — bounded by the partition count, never
    the data) and the driver turns them into per-partition prefix
    offsets; pass 2 is an Arrow mapInPandas cumsum within each
    range-sorted partition, offset by its prefix, so every partition
    computes its ECDF span in parallel.  This keeps KS exact even for a
    continuous column whose distinct-value domain is proportional to
    the corpus — no single-partition WindowExec anywhere.  NULLs are
    excluded on both sides; an empty side yields ks_stat 0 via the
    guarded division rather than an ANSI divide-by-zero.

    Output: one row (n_a, n_b, ks_stat).
    """
    import pandas as pd

    def counts(df, side):
        return (df.select(F.col(value_col).cast("double").alias("v"))
                .filter(F.col("v").isNotNull())
                .groupBy("v").agg(F.count(F.lit(1)).alias(f"n_{side}")))

    merged = (counts(df_a, "a")
              .join(counts(df_b, "b"), "v", "full_outer")
              .fillna(0, ["n_a", "n_b"]))
    spark = merged.sparkSession
    nparts = max(spark.sparkContext.defaultParallelism, 1)
    part = (merged.repartitionByRange(nparts, "v")
            .sortWithinPartitions("v")
            .withColumn("__pid", F.spark_partition_id())
            .localCheckpoint(eager=False))
    # pass 1: one row per partition; prefix-sum on the driver is over
    # <= nparts entries regardless of data volume
    offsets, cum_a, cum_b = {}, 0, 0
    for r in sorted(part.groupBy("__pid")
                    .agg(F.sum("n_a").alias("ta"),
                         F.sum("n_b").alias("tb")).collect(),
                    key=lambda r: r["__pid"]):
        offsets[int(r["__pid"])] = (cum_a, cum_b)
        cum_a += int(r["ta"] or 0)
        cum_b += int(r["tb"] or 0)
    total_a, total_b = cum_a, cum_b
    b_offsets = spark.sparkContext.broadcast(offsets)

    # pass 2: in-partition running sum (input order = range sort), each
    # partition shifted by its prefix offset
    def run(batches):
        run_a = run_b = None
        for pdf in batches:
            if run_a is None:
                pid = int(pdf["__pid"].iloc[0])
                run_a, run_b = b_offsets.value.get(pid, (0, 0))
            ca = pdf["n_a"].cumsum() + run_a
            cb = pdf["n_b"].cumsum() + run_b
            run_a, run_b = int(ca.iloc[-1]), int(cb.iloc[-1])
            ea = ca / total_a if total_a > 0 else 0.0
            eb = cb / total_b if total_b > 0 else 0.0
            yield pd.DataFrame({"gap": (ea - eb).abs()})

    gaps = part.mapInPandas(run, "gap double")
    # totals ride as literals (max over empty input -> NULL -> 0, the
    # same empty-side degradation the windowed version had)
    return gaps.agg(
        F.coalesce(F.max(F.lit(total_a)), F.lit(0)).cast("long")
        .alias("n_a"),
        F.coalesce(F.max(F.lit(total_b)), F.lit(0)).cast("long")
        .alias("n_b"),
        F.round(F.coalesce(F.max("gap"), F.lit(0.0)), 6)
        .alias("ks_stat"))


# --------------------------------------------------------------------- #
# declarative data-quality expectations (DLT-expectations analog)
# --------------------------------------------------------------------- #
def expectations_report(df: DataFrame,
                        rules: dict[str, str]) -> DataFrame:
    """Evaluate named SQL boolean expectations in ONE aggregate pass —
    the Delta Live Tables ``EXPECT`` report shape: per rule, total
    rows, violation count (a row violates when the predicate is FALSE
    **or NULL** — an unknown cannot certify quality, the DLT/CHECK
    convention), the violation rate, and a pass flag.  However many
    rules, the scan happens once: each rule is a conditional-sum
    aggregate riding the same map-side pass, so a 100-rule audit on
    100 TB costs one read.  Rules must plan against the schema —
    validated eagerly with a named error, not at job time."""
    from cs186_query_optimization_project_spark.errors import (
        DatabaseException,
    )

    if not rules:
        raise DatabaseException("expectations_report: no rules given")
    for name, sql in rules.items():
        try:
            df.limit(0).filter(F.expr(sql)).schema
        except Exception as exc:
            raise DatabaseException(
                f"expectations_report: rule '{name}' ({sql!r}) does "
                f"not plan against {df.columns}: {exc}") from None
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, (name, sql) in enumerate(rules.items()):
        cond = F.expr(sql)
        aggs.append(F.sum(F.when(cond, 0).otherwise(1))
                    .alias(f"__v{i}"))
    row = df.agg(*aggs).collect()[0]
    n = row["__n"]
    out = []
    for i, (name, sql) in enumerate(rules.items()):
        v = int(row[f"__v{i}"] or 0)
        rate = round(v / n, 6) if n else 0.0
        out.append((name, int(n), v, rate, v == 0))
    spark = df.sparkSession
    return local_rows_df(
        spark, out, "expectation string, n_rows bigint, n_violations bigint, "
             "violation_rate double, passed boolean")


def expect_or_drop(df: DataFrame, rules: dict[str, str]) -> DataFrame:
    """Quarantine semantics (DLT ``expect_or_drop``): keep only rows
    satisfying EVERY expectation (FALSE or NULL drops).  A map-side
    filter — composes with any downstream plan, no action here."""
    out = df
    for sql in rules.values():
        # filter keeps only TRUE — FALSE and NULL rows both drop,
        # exactly the violation definition the report uses
        out = out.filter(F.expr(sql))
    return out


def expect_or_fail(df: DataFrame, rules: dict[str, str]) -> DataFrame:
    """Gate semantics (DLT ``expect_or_fail``): raise a named error
    listing every failed expectation (with counts) if ANY rule has a
    violation; otherwise return ``df`` unchanged.  One aggregate pass
    (the report), then the caller's plan proceeds untouched."""
    from cs186_query_optimization_project_spark.errors import (
        DatabaseException,
    )

    failed = [(r["expectation"], r["n_violations"], r["violation_rate"])
              for r in expectations_report(df, rules).collect()
              if not r["passed"]]
    if failed:
        detail = "; ".join(f"{n}: {v} rows ({rate:.2%})"
                           for n, v, rate in failed)
        raise DatabaseException(
            f"expectations failed — {detail}")
    return df


def mad_outliers(df: DataFrame, value_col: str, group_col: str,
                 threshold: float = 3.5) -> DataFrame:
    """Rows whose ``value_col`` deviates from their group's MEDIAN by
    more than ``threshold`` robust sigmas — the heavy-tail-safe
    complement of :func:`zscore_outliers`: mean/stddev are themselves
    dragged by the outliers they're meant to find (masking), while
    median/MAD have a 50% breakdown point (Iglewicz & Hoaglin's
    modified z-score; 1.4826·MAD estimates sigma under normality, so
    the default 3.5 corresponds to the classic cutoff).

    Same two-pass broadcast shape as the z-score version — per-group
    (median, MAD) are two exact-percentile aggregates (Spark computes
    them without a per-group sort window), broadcast back for a
    filter re-scan.  Exact ``percentile`` keeps the oracle exact
    (DuckDB's quantile_cont interpolates identically);
    ``approx_percentile`` is the knob at extreme group cardinality.

    Output: the input row plus ``robust_z`` (rounded).  Groups whose
    MAD is 0 (over half the values identical) emit nothing — the
    robust score is undefined there, and the zscore variant is the
    right tool.
    """
    med = F.expr(f"percentile({value_col}, 0.5)")
    stats1 = (df.groupBy(group_col).agg(med.alias("__med")))
    dev = (df.join(F.broadcast(stats1), group_col)
           .withColumn("__ad", F.abs(F.col(value_col) - F.col("__med"))))
    stats2 = (dev.groupBy(group_col)
              .agg(F.expr("percentile(__ad, 0.5)").alias("__mad")))
    cols = [F.col(c) for c in df.columns]
    sigma = F.lit(1.4826) * F.col("__mad")
    return (dev.join(F.broadcast(stats2), group_col)
            .filter((F.col("__mad") > 0)
                    & (F.col("__ad") > F.lit(threshold) * sigma))
            .select(*cols,
                    F.round((F.col(value_col) - F.col("__med"))
                            / sigma, 4).alias("robust_z")))
