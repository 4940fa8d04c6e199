"""Distributed probabilistic sketches: HyperLogLog and Count-Min.

At 100 TB an exact ``COUNT(DISTINCT token)`` or exact per-token counts
over a web corpus shuffle the full key space; sketches bound the state:

- **HyperLogLog** (Flajolet et al., AMS 2007 formulation): the whole
  estimate reduces to ``m`` integer registers — a ``groupBy(register)
  .max(rho)`` whose shuffle carries at most ``m`` rows per partition
  after partial aggregation, regardless of input size.  Registers are
  also mergeable (max), so sketches for different partitions/days union
  for free.
- **Count-Min** (Cormode & Muthukrishnan 2005): per-token frequency
  estimates from a fixed ``d × w`` counter grid — ``groupBy((row,
  idx)).count()`` with at most ``d·w`` output rows.  Point estimates
  never touch the raw stream again; over-estimation is one-sided and
  bounded by ``e·N/w`` with prob ``1 - e^-d``.

Both use the repo's *portable* hash family (md5-hex prefix → 60-bit
integer) so the exact register/counter contents are reproducible in
ANSI SQL — the DuckDB oracles rebuild the sketches bit-for-bit rather
than trusting the engine.  Spark's ``approx_count_distinct`` is the
built-in alternative; this module exists because its HLL++ internals
are not replayable by an external oracle (and the reference engine has
no sketch surface at all — this is part of the training-data-pipeline
extension, not reference parity).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: 60-bit portable hash of a string expression (same family as
#: dedup._PORTABLE_BASE_HASH): first 15 hex chars of md5 → bigint.
#: DuckDB twin: ('0x' || substr(md5(x), 1, 15))::UBIGINT.
_H60 = "cast(conv(substr(md5({x}), 1, 15), 16, 10) as bigint)"

def hll_register_sql(col_sql: str, m: int) -> tuple[str, str]:
    """THE definition of the sketch's register contents:
    ``(register_sql, rho_sql)`` for the value expression ``col_sql``.
    register = h mod m; rho = leading zeros of the remaining-bits
    suffix + 1 (``bin()`` drops leading zeros in every engine, so
    rho = field_bits + 1 - length(bin(suffix)); an all-zero suffix
    takes the max, field_bits + 1).  Batch (:func:`hll_registers`) and
    streaming (``streaming.windows.hll_window_registers``) sketches
    both build from this one template — they MUST stay bit-identical
    for groupBy-max merge/reconciliation to be sound, and the DuckDB
    oracles re-encode exactly this formula."""
    if m & (m - 1):
        raise ValueError(f"m must be a power of two, got {m}")
    h = _H60.format(x=col_sql)
    suffix_bits = 60 - m.bit_length() + 1  # 60 - log2(m)
    register = f"cast(pmod({h}, {m}) as int)"
    rho = (f"cast(CASE WHEN ({h}) div {m} = 0 THEN {suffix_bits + 1} "
           f"ELSE {suffix_bits + 1} - length(bin(({h}) div {m})) END "
           f"as int)")
    return register, rho


def hll_registers(df: DataFrame, col: str, m: int = 256) -> DataFrame:
    """The ``m``-register HLL sketch of ``col``'s distinct values.

    Output: ``(register int, rho int)`` — one row per *occupied*
    register, ``rho`` = max over hashed values of (leading zeros of the
    52-bit suffix + 1).  Absent registers mean rho 0.

    Shape at scale: the map side collapses every partition to ≤ m rows
    before the (tiny) shuffle; no distinct, no wide state.  Sketches
    from different inputs merge with ``unionByName`` + the same
    groupBy-max.
    """
    register, rho = hll_register_sql(col, m)
    return (df.select(F.expr(register).alias("register"),
                      F.expr(rho).alias("__rho"))
            .groupBy("register")
            .agg(F.max("__rho").alias("rho")))


def hll_estimate_expr(filled, present_sum, m: int):
    """THE estimator expression — bias-corrected harmonic mean with
    linear counting below 2.5·m (the original HLL paper's regimes) —
    over a filled-register count and a sum of 2^-rho across occupied
    registers.  Shared by :func:`hll_estimate` and the materialized
    view's HLL reader (``mview.read(with_distinct=True)``), whose
    exact-parity contract would silently drift if either side carried
    its own copy of the constants."""
    alpha = 0.7213 / (1.0 + 1.079 / m)
    raw = F.lit(alpha * m * m) / (present_sum + (F.lit(m) - filled))
    zeros = F.lit(m) - filled
    return F.when((raw <= 2.5 * m) & (zeros > 0),
                  F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)
                  ).otherwise(raw)


def hll_estimate(registers: DataFrame, m: int = 256,
                 group_cols: list[str] | None = None) -> DataFrame:
    """Collapse a register table to the cardinality estimate — one row
    per group (``group_cols``, e.g. a time window), or a single scalar
    row with no groups.

    Columns: group cols, ``m``, ``filled_registers``, ``estimate``
    (double, the bias-corrected harmonic mean; linear counting below
    2.5·m per the original paper).  Pure aggregate.
    """
    group_cols = group_cols or []
    agg = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("filled"),
        F.sum(F.expr("pow(2.0, -rho)")).alias("present_sum"))
    est = hll_estimate_expr(F.col("filled"), F.col("present_sum"), m)
    return agg.select(
        *group_cols,
        F.lit(m).alias("m"),
        F.col("filled").cast("long").alias("filled_registers"),
        F.round(est, 4).alias("estimate"))


def hll_distinct(df: DataFrame, col: str, m: int = 256) -> DataFrame:
    """One-row HLL distinct-count of ``col`` with the exact count
    alongside (the exact column is for accuracy reporting at test
    scale; at 100 TB you'd run the sketch alone)."""
    sketch = hll_estimate(hll_registers(df, col, m), m)
    exact = df.agg(F.count_distinct(F.col(col)).alias("exact_distinct"))
    return (sketch.crossJoin(exact)
            .select("m", "filled_registers", "estimate", "exact_distinct",
                    F.round(F.abs(F.col("estimate")
                                  - F.col("exact_distinct"))
                            / F.col("exact_distinct"), 4)
                    .alias("rel_error")))


def hll_registers_by(df: DataFrame, col: str, group_cols: list[str],
                     m: int = 256) -> DataFrame:
    """Per-group HLL register tables: ``(group cols, register, rho)``
    with ≤ m rows per group.  Same register template as the global
    sketch (:func:`hll_register_sql`), so per-group sketches merge with
    the global/streaming ones by groupBy-max."""
    register, rho = hll_register_sql(col, m)
    return (df.select(*group_cols,
                      F.expr(register).alias("register"),
                      F.expr(rho).alias("__rho"))
            .groupBy(*group_cols, "register")
            .agg(F.max("__rho").alias("rho")))


def hll_distinct_by(df: DataFrame, col: str, group_cols: list[str],
                    m: int = 256) -> DataFrame:
    """Approximate ``COUNT(DISTINCT col) GROUP BY group_cols`` via
    per-group HLL sketches, with the exact counts alongside for
    accuracy reporting at test scale.

    This is the sketch shape that replaces exact grouped
    count-distinct at 100 TB: exact grouped distinct shuffles every
    (group, value) pair; the sketch's map side collapses each
    partition to ≤ m rows PER GROUP before the shuffle, so state is
    bounded by groups × m regardless of value cardinality — and the
    register tables remain mergeable across days/partitions/streams.
    """
    sketch = hll_estimate(hll_registers_by(df, col, group_cols, m),
                          m, group_cols)
    exact = (df.groupBy(*group_cols)
             .agg(F.count_distinct(F.col(col)).alias("exact_distinct")))
    return (sketch.join(exact, group_cols)
            .select(*group_cols, "m", "filled_registers", "estimate",
                    F.col("exact_distinct").cast("long")
                    .alias("exact_distinct"),
                    F.round(F.abs(F.col("estimate")
                                  - F.col("exact_distinct"))
                            / F.col("exact_distinct"), 4)
                    .alias("rel_error")))


# --------------------------------------------------------------------- #
# Count-Min
# --------------------------------------------------------------------- #
def _cms_idx(col: str, row: int, w: int) -> str:
    """SQL for the row-``row`` counter index of ``col``: salt the
    portable hash with the row number so the d rows are independent."""
    h = _H60.format(x=f"concat('{row}:', {col})")
    return f"pmod({h}, {w})"


def cms_counters(df: DataFrame, col: str, d: int = 3,
                 w: int = 2048) -> DataFrame:
    """The ``d × w`` Count-Min grid over ``col``'s values.

    Output ``(row int, idx int, cnt long)`` — at most ``d·w`` rows total
    (map-side partial counts make the shuffle O(d·w) per partition).
    The d index computations are one generated projection, no Python.
    """
    rows = F.array(*[
        F.struct(F.lit(r).alias("row"),
                 F.expr(_cms_idx(col, r, w)).cast("int").alias("idx"))
        for r in range(d)])
    return (df.select(F.explode(rows).alias("c"))
            .groupBy(F.col("c.row").alias("row"),
                     F.col("c.idx").alias("idx"))
            .agg(F.count(F.lit(1)).alias("cnt")))


def cms_point_estimates(counters: DataFrame, keys: DataFrame, col: str,
                        d: int = 3, w: int = 2048) -> DataFrame:
    """min-over-rows CMS estimate for each distinct key in ``keys``.

    ``keys`` rows are joined to the (≤ d·w row) counter grid on
    ``(row, idx)`` — the grid broadcasts, so the probe is shuffle-free
    no matter how many keys are probed.  LEFT join with
    missing-cell-is-zero: a cell no value hashed into is an exact 0,
    so a key absent from the stream estimates 0 (never a positive
    collision artifact, and never silently dropped).
    """
    probes = keys.select(
        F.col(col),
        F.explode(F.array(*[
            F.struct(F.lit(r).alias("row"),
                     F.expr(_cms_idx(col, r, w)).cast("int").alias("idx"))
            for r in range(d)])).alias("p"))
    return (probes
            .join(F.broadcast(counters),
                  (F.col("p.row") == F.col("row"))
                  & (F.col("p.idx") == F.col("idx")), "left")
            .groupBy(col)
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0)))
                 .alias("cms_estimate")))


def cms_heavy_hitters(df: DataFrame, col: str, k: int = 20, d: int = 3,
                      w: int = 2048) -> DataFrame:
    """Top-``k`` values of ``col`` by exact count, with the CMS estimate
    alongside — ``cms_estimate >= exact_count`` always (one-sided
    error), equality when no collision landed in all d rows.  The
    exact column exists to surface the sketch's error at test scale;
    the sketch itself never rescans the input."""
    exact = (df.groupBy(col)
             .agg(F.count(F.lit(1)).alias("exact_count")))
    top = (exact.orderBy(F.col("exact_count").desc(), F.col(col).asc())
           .limit(k))
    counters = cms_counters(df, col, d, w)
    est = cms_point_estimates(counters, top.select(col), col, d, w)
    return (top.join(est, col)
            .select(col, "exact_count", "cms_estimate")
            .orderBy(F.col("exact_count").desc(), F.col(col).asc()))


# --------------------------------------------------------------------- #
# KMV (k-minimum-values / theta) — distinct counts AND set overlap
# --------------------------------------------------------------------- #
# HLL answers |A| but cannot estimate |A ∩ B| (register-max merge only
# unions).  The KMV sketch (Bar-Yossef et al. 2002; the theta sketch's
# core) keeps the k SMALLEST distinct hash values of a set: union is
# merge-and-trim, and the Jaccard of two sets is estimated by the
# fraction of the union sketch's members present in both — giving
# dataset-overlap measurement (train/eval contamination rates, shared
# users across segments, cross-crawl coverage) from k-row summaries
# instead of a distinct-join over the full key space.
#
# Same portable hash family as HLL/CMS above, so every sketch value —
# and therefore every estimate — is reproducible in ANSI SQL by an
# external oracle, not just "approximately equal".

#: the hash domain: _H60 yields values uniform on [0, 2^60)
_KMV_DOMAIN = float(1 << 60)


def kmv_sketch(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """The KMV sketch of ``col``'s distinct values: one column ``h``
    with the k smallest distinct 60-bit portable hashes (fewer rows
    when the set itself is smaller — then the sketch is the exact
    hashed set).  NULLs are ignored, matching COUNT(DISTINCT).

    Shape at scale: hash → distinct (the one shuffle, map-side
    partial) → global top-k by ascending hash, which Spark executes as
    per-partition limits + a k-row driver merge (TakeOrderedAndProject)
    — state is O(k) per partition, never corpus-sized."""
    h = F.expr(_H60.format(x=f"cast({col} as string)"))
    return (df.select(h.alias("h")).where(F.col("h").isNotNull())
            .distinct().orderBy("h").limit(k))


def kmv_union(a: DataFrame, b: DataFrame, k: int) -> DataFrame:
    """Union of two KMV sketches: merge, dedup, keep the k smallest —
    EXACTLY the sketch of the unioned sets (trim-to-k commutes with
    set union), so sketches built per day/partition/source compose."""
    return (a.select("h").unionByName(b.select("h"))
            .distinct().orderBy("h").limit(k))


def kmv_estimate(sketch: DataFrame, k: int = 256) -> DataFrame:
    """One-row distinct-count estimate of a :func:`kmv_sketch`:
    ``(k, n_sketch, estimate)``.  Under-full sketches (n < k) are the
    exact distinct set, so the estimate is exact; full sketches use
    the unbiased k-th-minimum estimator ``(k-1) · 2^60 / h_(k)``."""
    agg = sketch.agg(F.count(F.lit(1)).alias("n"),
                     F.max("h").alias("hmax"))
    est = F.when(F.col("n") < k, F.col("n").cast("double")) \
        .otherwise(F.lit(float(k - 1)) * F.lit(_KMV_DOMAIN)
                   / F.col("hmax").cast("double"))
    return agg.select(F.lit(k).alias("k"),
                      F.col("n").cast("long").alias("n_sketch"),
                      F.round(est, 4).alias("estimate"))


def kmv_overlap(a: DataFrame, b: DataFrame, col: str,
                k: int = 256) -> DataFrame:
    """Set-overlap estimate between ``col``'s distinct values in ``a``
    and in ``b`` from two k-row KMV sketches: one row with per-set and
    union cardinality estimates, the Jaccard estimate (fraction of the
    union sketch's k members present in BOTH input sketches — each
    sketch member's set-membership is EXACT, since a hash below a
    sketch's max would be in that sketch), and the intersection
    estimate ``jaccard · |A ∪ B|``.

    At 100 TB this replaces the exact ``A JOIN B ON key`` overlap
    audit — two independent k-row sketches that can be built on
    different days/clusters and compared driver-side — at the cost of
    ±O(1/√k) relative error."""
    sa = kmv_sketch(a, col, k).withColumn("in_a", F.lit(1))
    sb = kmv_sketch(b, col, k).withColumn("in_b", F.lit(1))
    merged = (sa.join(sb, "h", "full")
              .select("h", F.coalesce("in_a", F.lit(0)).alias("in_a"),
                      F.coalesce("in_b", F.lit(0)).alias("in_b"))
              .orderBy("h").limit(k))
    u = merged.agg(
        F.count(F.lit(1)).alias("n"),
        F.max("h").alias("hmax"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("n_both"))
    est_u = F.when(F.col("n") < k, F.col("n").cast("double")) \
        .otherwise(F.lit(float(k - 1)) * F.lit(_KMV_DOMAIN)
                   / F.col("hmax").cast("double"))
    ea = kmv_estimate(sa, k).select(F.col("estimate").alias("est_a"))
    eb = kmv_estimate(sb, k).select(F.col("estimate").alias("est_b"))
    # two empty inputs: 0/0 Jaccard is pinned to 0.0 (empty sets
    # overlap nothing), never a NULL that poisons downstream math
    jacc = F.when(F.col("n") > 0,
                  F.col("n_both") / F.col("n")).otherwise(F.lit(0.0))
    return (u.crossJoin(F.broadcast(ea)).crossJoin(F.broadcast(eb))
            .select(F.lit(k).alias("k"),
                    F.col("n").cast("long").alias("n_union_sketch"),
                    "est_a", "est_b",
                    F.round(est_u, 4).alias("est_union"),
                    F.round(jacc, 6).alias("jaccard"),
                    F.round(jacc * est_u, 4).alias("est_intersection")))


def kmv_sketch_by(df: DataFrame, col: str, group_cols: list[str],
                  k: int = 256) -> DataFrame:
    """Per-group KMV sketches: ``(group cols, h)`` with ≤ k rows per
    group — the k smallest distinct hashes of ``col`` within each
    group.  One shuffle keyed on the group (map-side distinct
    partials), then a rank window bounds every group's state to k;
    at 100 TB this is the grouped-distinct-overlap state bound the
    exact per-group distinct join cannot offer."""
    from pyspark.sql import Window

    h = F.expr(_H60.format(x=f"cast({col} as string)"))
    w = Window.partitionBy(*group_cols).orderBy("h")
    return (df.select(*group_cols, h.alias("h"))
            .where(F.col("h").isNotNull())
            .distinct()
            .withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= k).drop("__rk"))


def kmv_overlap_by(a: DataFrame, b: DataFrame, col: str,
                   group_cols: list[str], k: int = 256) -> DataFrame:
    """Per-group set-overlap estimates — :func:`kmv_overlap` grouped
    (per-domain train/eval leakage rates, shared users per segment):
    one row per group present in EITHER input, with the same
    estimate columns.  Groups seen on one side only estimate zero
    overlap; every per-group estimate is exactly SQL-replayable."""
    from pyspark.sql import Window

    sa = kmv_sketch_by(a, col, group_cols, k).withColumn(
        "in_a", F.lit(1))
    sb = kmv_sketch_by(b, col, group_cols, k).withColumn(
        "in_b", F.lit(1))
    joined = (sa.join(sb, [*group_cols, "h"], "full")
              .select(*group_cols, "h",
                      F.coalesce("in_a", F.lit(0)).alias("in_a"),
                      F.coalesce("in_b", F.lit(0)).alias("in_b")))
    w = Window.partitionBy(*group_cols).orderBy("h")
    merged = (joined.withColumn("__rk", F.row_number().over(w))
              .filter(F.col("__rk") <= k).drop("__rk"))

    def _est(n_col, hmax_col):
        return F.when(n_col < k, n_col.cast("double")) \
            .otherwise(F.lit(float(k - 1)) * F.lit(_KMV_DOMAIN)
                       / hmax_col.cast("double"))

    ea = (sa.groupBy(*group_cols)
          .agg(F.count(F.lit(1)).alias("na"), F.max("h").alias("ha"))
          .select(*group_cols,
                  F.round(_est(F.col("na"), F.col("ha")), 4)
                  .alias("est_a")))
    eb = (sb.groupBy(*group_cols)
          .agg(F.count(F.lit(1)).alias("nb"), F.max("h").alias("hb"))
          .select(*group_cols,
                  F.round(_est(F.col("nb"), F.col("hb")), 4)
                  .alias("est_b")))
    u = merged.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.max("h").alias("hmax"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("n_both"))
    est_u = _est(F.col("n"), F.col("hmax"))
    jacc = F.when(F.col("n") > 0,
                  F.col("n_both") / F.col("n")).otherwise(F.lit(0.0))
    return (u.join(ea, group_cols, "left").join(eb, group_cols, "left")
            .select(*group_cols,
                    F.lit(k).alias("k"),
                    F.col("n").cast("long").alias("n_union_sketch"),
                    F.coalesce("est_a", F.lit(0.0)).alias("est_a"),
                    F.coalesce("est_b", F.lit(0.0)).alias("est_b"),
                    F.round(est_u, 4).alias("est_union"),
                    F.round(jacc, 6).alias("jaccard"),
                    F.round(jacc * est_u, 4).alias("est_intersection")))
