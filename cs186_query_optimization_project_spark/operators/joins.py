"""Custom join operators Spark lacks as built-ins (SURVEY.md §2.4 "absent
join forms"): as-of join, range (interval) join, and an explicit salted
join for skewed keys.

Each is a composition of existing DataFrame ops — no Python in the hot
path — chosen for its shuffle behavior at scale:

- **as-of**: union + window (one shuffle+sort per key) instead of the
  naive per-left-row subquery, which would be a quadratic theta join.
- **range**: bin-bucketed equi-join — intervals are exploded into the
  fixed-width bins they cover, the probe side joins on its bin, then an
  exact containment filter; turns an unbounded theta join into an
  equi-join whose blowup is bounded by interval_width / bin_size.
- **salted**: explicit hot-key mitigation for engines/paths where AQE's
  skew splitting doesn't apply (e.g. pinned shuffle-hash strategy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str = "ts", right_ts: str = "ts",
              value_cols: list[str] | None = None,
              suffix: str = "_right") -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right_ts <= left_ts`` within the same ``on`` key (backward as-of
    join, LEFT semantics: unmatched left rows keep nulls).

    Shape: tag both sides, union on (key, ts), one window sort per key,
    ``last(value, ignorenulls)`` carries the latest right values forward,
    keep only left rows.  One shuffle + sort total — same cost as a
    sort-merge join, no matter how many right rows precede each left row.

    Right side must be unique per (key, right_ts); pre-aggregate if not
    (ties would make the result nondeterministic in any engine)."""
    value_cols = value_cols or [
        c for c in right.columns if c not in (on, right_ts)]
    # The right row's values travel as ONE struct: the whole most-recent
    # right ROW is carried or none of it.  Carrying bare columns with
    # last(ignorenulls) would (a) skip a genuinely-NULL value in the
    # latest right row in favor of a stale older one and (b) mix values
    # from different right rows when several columns are carried.
    vals = F.struct(*[F.col(c).alias(c) for c in value_cols])
    # join semantics for NULL keys: a NULL never equals a NULL, so
    # NULL-key right rows can never match — but window PARTITION BY
    # groups NULLs together, which would carry a NULL-key right row
    # onto a NULL-key left row; drop them before the union (NULL-key
    # left rows then sit alone in their partition and keep nulls, the
    # correct LEFT-join outcome)
    right = right.filter(F.col(on).isNotNull())
    r_tag = right.select(
        F.col(on), F.col(right_ts).alias("__ts"), F.lit(0).alias("__is_left"),
        vals.alias("__vals"))
    null_vals = F.lit(None).cast(r_tag.schema["__vals"].dataType)
    l_tag = left.select(
        F.col(on), F.col(left_ts).alias("__ts"), F.lit(1).alias("__is_left"),
        null_vals.alias("__vals"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"))
    r_tag = r_tag.withColumn(
        "__lrow", F.lit(None).cast(l_tag.schema["__lrow"].dataType))
    unioned = l_tag.unionByName(r_tag)
    # right rows (tag 0) sort before left rows at equal ts => ties match
    w = (Window.partitionBy(on).orderBy("__ts", "__is_left")
         .rowsBetween(Window.unboundedPreceding, 0))
    carried = unioned.withColumn(
        "__c", F.last("__vals", ignorenulls=True).over(w))
    out_cols = ([F.col(f"__lrow.{c}").alias(c) for c in left.columns]
                + [F.col(f"__c.{c}").alias(
                    c + suffix if c in left.columns else c)
                   for c in value_cols])
    return carried.filter(F.col("__is_left") == 1).select(*out_cols)


def range_join(left: DataFrame, right: DataFrame, value_col: str,
               lo_col: str, hi_col: str,
               bin_size: float | None = None) -> DataFrame:
    """Inner join on interval containment ``lo_col <= value_col < hi_col``.

    With ``bin_size``, both sides map to fixed-width bins (the interval
    side explodes into every bin it covers) and join on the bin — an
    equi-join Catalyst can hash-partition — then filter exact containment.
    Without it, a plain conditional join (fine when one side broadcasts).
    """
    if bin_size is None:
        return left.join(
            right, (left[value_col] >= right[lo_col])
            & (left[value_col] < right[hi_col]))
    b = float(bin_size)
    binned_left = left.withColumn(
        "__bin", F.floor(F.col(value_col) / b).cast("long"))
    exploded_right = right.withColumn(
        "__bin", F.explode(F.sequence(
            F.floor(F.col(lo_col) / b).cast("long"),
            # hi is exclusive: a hi exactly on a bin edge doesn't reach
            # into the next bin
            F.ceil(F.col(hi_col) / b).cast("long") - 1)))
    return (binned_left.join(exploded_right, "__bin")
            .filter((F.col(value_col) >= F.col(lo_col))
                    & (F.col(value_col) < F.col(hi_col)))
            .drop("__bin"))


def salted_join(left: DataFrame, right: DataFrame, on: str,
                n_salts: int = 8, how: str = "inner") -> DataFrame:
    """Equi-join with hot-key salting: left rows pick a random salt in
    [0, n_salts), the (small-ish) right side is replicated n_salts times,
    and the join key becomes (key, salt) — a hot key's rows now spread
    over n_salts reducers instead of one.

    Results are identical to ``left.join(right, on, how)`` for inner/left/
    semi/anti joins.  Right/full outer are REJECTED: every replicated
    right copy whose salt matches no left row would surface as a spurious
    null-padded output row.  Prefer AQE skew-join splitting when available
    — this is for paths AQE can't touch (pinned strategies, streaming
    joins)."""
    # normalize Spark's aliases (right_outer/rightouter/right, ...)
    if how.lower().replace("_", "").replace("outer", "") in ("right",
                                                             "full", ""):
        raise ValueError(
            f"salted_join does not support how='{how}': replicated right "
            f"copies would emit spurious unmatched rows; use AQE skew "
            f"splitting for outer joins")
    salted_left = left.withColumn(
        "__salt", (F.rand(seed=42) * n_salts).cast("int"))
    salted_right = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    return (salted_left.join(salted_right, [on, "__salt"], how)
            .drop("__salt"))


# --------------------------------------------------------------------- #
# Bloom-filter semi-join pruning
# --------------------------------------------------------------------- #
#: floor for adaptive mask sizing — 16 Kbit / 2 KB, negligible to ship.
_BLOOM_MIN_M = 16384
#: ceiling for adaptive mask sizing.  The mask is inlined into the probe
#: filter as a SQL array literal (that's what lets it ride the scan with
#: no shuffle), so it has a hard practical size limit: 2^20 bits =
#: 16,384 longs ≈ 300 KB of expression text.  Beyond ~242k build keys (m·ln2/k)
#: even the ceiling mask saturates (>50% fill at k=3) and prunes
#: nothing — the adaptive path then SKIPS the Bloom pass entirely
#: rather than paying for a filter that drops no rows.
_BLOOM_MAX_M = 1 << 20


def adaptive_bloom_m(n_keys: int, k: int = 3) -> int | None:
    """Mask size (bits) for ``n_keys`` distinct build keys: ~10 bits per
    key (false-positive rate ≈ 1.7% at k=3), rounded up to a power of
    two and clamped to [_BLOOM_MIN_M, _BLOOM_MAX_M].  Returns ``None``
    when even the ceiling mask would exceed 50% estimated fill
    (1 - e^(-k·n/m)) — the caller should skip the Bloom pass."""
    import math

    n_keys = max(int(n_keys), 1)
    m = _BLOOM_MIN_M
    while m < 10 * n_keys and m < _BLOOM_MAX_M:
        m <<= 1
    est_fill = 1.0 - math.exp(-k * n_keys / m)
    if est_fill > 0.5:
        return None
    return m


def bloom_semi_join(probe: DataFrame, build: DataFrame, probe_key: str,
                    build_key: str, m: int | None = None,
                    k: int = 3) -> DataFrame:
    """Semi-join ``probe`` to ``build`` with a Bloom-filter pre-pass.

    The production problem: ``probe ⋉ build`` where build is too big to
    broadcast but its *key set summary* isn't — a selective dimension
    filter leaves millions of keys, and shuffling the full 100 TB probe
    side just to discard 95% of it in the join is the dominant cost.
    A Bloom filter of build's keys is O(m) bits regardless of build
    size; probing it removes most non-matching probe rows *before* the
    shuffle.  (Spark's own runtime row-level-filtering does this
    automatically in some plans; this operator is the explicit,
    plannable form, and its filter is replayable by an external
    oracle via the portable hash family.)

    Mechanics:
    1. build side → its k bit positions (portable md5 hash, salted per
       hash function) → OR-fold into an m-bit mask of m/64 longs.  The
       fold is a distributed aggregate (map-side partial masks merge
       with bitwise OR); only the finished 2 KB mask reaches the driver
       — a bounded scalar collect, same class as the IVF centroid pull.
    2. probe side filters on pure JVM expressions against the mask
       array literal: all k bits set → candidate.  **No shuffle, no
       join** — the Bloom test rides the probe scan itself, which is
       the whole point at 100 TB.
    3. exact ``leftsemi`` join against build keys removes the Bloom's
       false positives, restoring exact semantics — but it now sees
       only the pre-filtered probe rows.

    The exactness contract means the result is identical to a plain
    semi-join — the Bloom pass only changes *where* rows are dropped
    (on the scan, before the shuffle, not after).

    ``m=None`` (the default) sizes the mask adaptively: one
    ``approx_count_distinct`` pass over the build keys picks ~10 bits
    per key (power-of-two, clamped to [2^14, 2^20] — see
    :data:`_BLOOM_MAX_M`).  When the build cardinality is so large
    that even the ceiling mask would sit above 50% fill and prune
    nothing, the Bloom pass is skipped and the operator degrades
    EXPLICITLY (with a warning) to the plain exact semi-join it
    wraps — never a silently saturated filter.
    """
    if m is None:
        n_keys = (build.filter(F.col(build_key).isNotNull())
                  .agg(F.approx_count_distinct(build_key)).first()[0])
        m = adaptive_bloom_m(n_keys, k)
        if m is None:
            import logging

            logging.getLogger(__name__).warning(
                "bloom_semi_join: ~%d distinct build keys would "
                "saturate even the %d-bit ceiling mask; skipping the "
                "Bloom pass (plain exact semi-join)", n_keys,
                _BLOOM_MAX_M)
            return probe.join(
                build.select(F.col(build_key).alias("__bk")).distinct(),
                probe[probe_key] == F.col("__bk"), "leftsemi")
    mask = bloom_mask(build, build_key, m, k)
    candidates = probe.filter(bloom_test(probe_key, mask, m, k))
    return candidates.join(build.select(F.col(build_key).alias("__bk"))
                           .distinct(),
                           candidates[probe_key] == F.col("__bk"),
                           "leftsemi")


def _bloom_pos(col: str, r: int, m: int) -> str:
    """SQL for hash-function ``r``'s bit position of ``col`` — the
    shared portable 60-bit md5 family (sketches._H60), row-salted.
    Every oracle depends on this family staying bit-identical across
    call sites, so the template lives in exactly one place."""
    from cs186_query_optimization_project_spark.functions.sketches import (
        _H60,
    )
    salted = f"concat('{r}:', {col})"
    return f"pmod({_H60.format(x=salted)}, {m})"


def bloom_mask(build: DataFrame, build_key: str, m: int = 16384,
               k: int = 3) -> list[int]:
    """The m-bit Bloom mask of ``build_key``'s values, as m/64 longs.

    Distributed OR-fold: each row contributes k single-bit words,
    partial-aggregated per partition with ``bit_or``; only the ≤ m/64
    finished words reach the driver."""
    n_words = (m + 63) // 64
    # NULL keys can never match any probe row (NULL != NULL in a join),
    # and a NULL hash would surface as a None word index crashing the
    # fold — drop them up front
    build = build.filter(F.col(build_key).isNotNull())
    contribs = build.select(F.explode(F.array(*[
        F.struct(
            (F.expr(_bloom_pos(build_key, r, m)) / 64).cast("int")
            .alias("w"),
            F.expr(f"shiftleft(1L, cast(pmod({_bloom_pos(build_key, r, m)}"
                   f", 64) as int))").alias("bit"))
        for r in range(k)])).alias("c"))
    words = (contribs.groupBy(F.col("c.w").alias("w"))
             .agg(F.bit_or("c.bit").alias("word"))
             .collect())
    mask = [0] * n_words
    for row in words:
        mask[row["w"]] = row["word"]
    fill = sum(bin(w & 0xFFFFFFFFFFFFFFFF).count("1") for w in mask) / m
    if fill > 0.5:
        import logging

        logging.getLogger(__name__).warning(
            "bloom_mask: %.0f%% of %d bits set — the filter will prune "
            "little; widen m (or let bloom_semi_join size it "
            "adaptively)", 100 * fill, m)
    return mask


def bloom_test(probe_key: str, mask: list[int], m: int = 16384,
               k: int = 3):
    """Pure-expression membership test against a :func:`bloom_mask` —
    rides the probe scan, no shuffle, no join."""
    mask_lit = ", ".join(f"{v}L" for v in mask)
    tests = [
        f"(element_at(array({mask_lit}), "
        f"cast({_bloom_pos(probe_key, r, m)} / 64 as int) + 1) & "
        f"shiftleft(1L, cast(pmod({_bloom_pos(probe_key, r, m)}, 64) "
        f"as int))) != 0"
        for r in range(k)]
    return F.expr(" AND ".join(tests))
