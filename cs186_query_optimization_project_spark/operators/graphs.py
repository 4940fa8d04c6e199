"""Distributed graph primitives on DataFrames.

Connected components live in functions/dedup.py (min-label + star
contraction, built for the near-dup use); this module holds the general
graph operators.  Beyond-reference surface (the reference engine has no
graph operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def orient_by_degree(edges: DataFrame, a: str = "a",
                     b: str = "b") -> DataFrame:
    """Acyclically orient an undirected edge set from the lower-degree
    endpoint to the higher (ties by vertex id) — the standard trick
    (Suri & Vassilvitskii, WWW'11) that bounds per-vertex out-degree by
    O(sqrt(m)), so wedge enumeration is O(m^1.5) even on power-law
    graphs where id-ordering would leave a hub with out-degree ~n.
    Input edges must be distinct with ``a != b`` (either direction).
    Output columns: (src, dst), each undirected edge appearing once."""
    # materialize once: und feeds the degree count AND the orientation
    # join, and the caller self-joins the result three ways — without a
    # checkpoint every reference re-derives the whole edge lineage
    # (measured 8× slower on the co-supplier graph).  Symmetrize via
    # explode-of-both-directions rather than a self-union: a union
    # embeds the caller's edge derivation TWICE in this one job (for
    # the co-supplier graph that is the lineitem distinct + self-join
    # run twice), an explode scans it once.
    und = (edges.select(F.explode(F.array(
               F.struct(F.col(a).alias("u"), F.col(b).alias("v")),
               F.struct(F.col(b).alias("u"), F.col(a).alias("v"))))
           .alias("__e"))
           .select("__e.u", "__e.v")
           .distinct().localCheckpoint())
    deg = und.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    ranked = (und.join(deg, "u")
              .join(deg.select(F.col("u").alias("v"),
                               F.col("deg").alias("deg_v")), "v"))
    fwd = (F.col("deg") < F.col("deg_v")) | (
        (F.col("deg") == F.col("deg_v")) & (F.col("u") < F.col("v")))
    return (ranked.filter(fwd)
            .select(F.col("u").alias("src"), F.col("v").alias("dst")))


def triangles(edges: DataFrame, a: str = "a", b: str = "b") -> DataFrame:
    """Enumerate each triangle of the undirected graph exactly once as
    (v1, v2, v3).  Degree-oriented edges → wedges (src with two
    out-neighbors) → close the wedge against the oriented edge set.
    Every triangle has exactly one vertex with two out-edges under an
    acyclic orientation, so no dedup pass is needed.  Two shuffles
    (wedge join on src, closing join on the far pair) after the
    orientation's degree join."""
    # o is referenced three times (both wedge legs + the closing set);
    # at scale this is the "write the oriented edge list, then join it"
    # step of the MapReduce formulation
    o = orient_by_degree(edges, a, b).localCheckpoint()
    e1, e2 = o.alias("e1"), o.alias("e2")
    wedges = (e1.join(e2, (F.col("e1.src") == F.col("e2.src"))
                     & (F.col("e1.dst") < F.col("e2.dst")))
              .select(F.col("e1.src").alias("apex"),
                      F.col("e1.dst").alias("w1"),
                      F.col("e2.dst").alias("w2")))
    # the closing edge's degree orientation is unknown relative to the
    # wedge's id-ordered far pair — canonicalize it to (min, max) so the
    # close is a pure EQUI-join on both columns (an OR-of-directions
    # predicate would force a nested-loop join: measured 10× slower)
    canon = o.select(F.least("src", "dst").alias("w1"),
                     F.greatest("src", "dst").alias("w2"))
    return (wedges.join(canon, ["w1", "w2"])
            .select(F.col("apex").alias("v1"), F.col("w1").alias("v2"),
                    F.col("w2").alias("v3")))


def triangle_counts(edges: DataFrame, a: str = "a",
                    b: str = "b") -> DataFrame:
    """Per-vertex triangle participation: (vertex, n_triangles).
    Vertices in no triangle are absent (semi-join them back against
    the vertex set if zeros are needed)."""
    t = triangles(edges, a, b)
    # one corner per output row via explode — the previous 3-way union
    # of t's corner columns re-ran the whole triangle enumeration (two
    # sort-merge joins) once per branch because t is not materialized;
    # explode emits the identical (vertex) multiset in ONE enumeration
    verts = t.select(
        F.explode(F.array("v1", "v2", "v3")).alias("vertex"))
    return verts.groupBy("vertex").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_triangles"))


def pagerank(edges: DataFrame, iterations: int = 3,
             damping: float = 0.85) -> DataFrame:
    """Fixed-iteration PageRank over DIRECTED (src, dst) edges:
    rank' = (1−d)/N + d·Σ_in rank/out_degree.  Returns (v, rank).

    Scale/determinism shape:
    - each iteration is one contributions join (keyed on src, reusing
      the out-degree aggregation's partitioning) plus one groupBy(dst);
      ranks are localCheckpoint-ed per round so lineage stays O(1), the
      same discipline as the connected-components loop in
      functions/dedup.py.
    - the per-vertex contribution sum goes through DECIMAL(27,15) —
      float addition is not associative, so a raw double sum would vary
      with partitioning run to run; the decimal sum is exact and
      engine-independent, which is what makes a 3-iteration unrolled
      SQL replay agree to full precision.
    - N is a single scalar count (one aggregate; the only driver-side
      value).  Vertices with no in-edges get the (1−d)/N floor via the
      left join's coalesce.  Dangling vertices (no OUT-edges) simply
      leak their mass, the common simplification; symmetrize the edge
      set if that matters for your graph."""
    # materialize the edge list once: every iteration joins it, and
    # without this each round re-derives the caller's whole edge
    # lineage (for the co-supplier demo that is a fact-table distinct +
    # self-join PER ITERATION — the "write the edge list first" step
    # every production PageRank starts with)
    from pyspark.sql import Observation

    edges = edges.localCheckpoint()
    # the vertex count rides the vertex checkpoint as an observed
    # metric (no separate count job)
    obs = Observation()
    # both endpoints from one edge scan (explode, not a self-union)
    verts = (edges.select(F.explode(F.array("src", "dst")).alias("v"))
             .distinct()
             .observe(obs, F.count(F.lit(1)).alias("n"))
             .localCheckpoint())
    n = int(obs.get["n"])
    # loop-invariant hoist: an edge's contribution divisor is its
    # src's out-degree, so the edges⋈out_degree join is identical in
    # every round — materialize the (src, dst, __outd) table ONCE.
    # The previous shape re-ran that join (a full edge-set pass and
    # hash-relation build) inside every iteration's plan.
    out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("__outd"))
    edges_outd = edges.join(out_deg, "src").localCheckpoint()
    ranks = verts.select("v", F.lit(1.0 / n).alias("rank"))
    for i in range(iterations):
        contribs = (edges_outd
                    .join(ranks.select(F.col("v").alias("src"),
                                       "rank"), "src")
                    .select(F.col("dst").alias("v"),
                            (F.col("rank") / F.col("__outd"))
                            .alias("__c")))
        sums = (contribs.groupBy("v")
                .agg(F.sum(F.col("__c").cast("decimal(27,15)"))
                     .cast("double").alias("__s")))
        ranks = (verts.join(sums, "v", "left")
                 .select("v",
                         (F.lit((1 - damping) / n)
                          + F.lit(damping)
                          * F.coalesce(F.col("__s"), F.lit(0.0)))
                         .alias("rank")))
        # Checkpoint every 4th round, not every round: each round's
        # plan references the previous ranks subtree exactly once, so
        # lineage depth is linear in rounds-since-checkpoint and a
        # small cadence keeps plans bounded — while the common short
        # calls (the 3-iteration entry) build ONE lazy dataflow with
        # zero intermediate materialization jobs.  The decimal
        # contribution sums are exact, so rank values are identical
        # under any materialization cadence.
        if (i + 1) % 4 == 0 and (i + 1) < iterations:
            ranks = ranks.localCheckpoint()
    return ranks
