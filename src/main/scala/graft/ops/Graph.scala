package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over id-pair edge frames — the companion of the
  * connected-components propagation in [[Dedup.clustersFromPairs]], for
  * graphs the pipeline itself produces (the kNN graph of
  * [[Similarity.knnGraph]], dup-pair graphs, citation/link tables).
  */
object Graph {

  /** PageRank with a FIXED iteration count over directed edges
    * (src, dst): r_{t+1}(v) = (1-d)/N + d * sum over in-edges of
    * r_t(u)/outdeg(u), starting from the uniform vector. A fixed
    * iteration budget (not a convergence test) keeps the result exactly
    * reproducible — the form an offline corpus-audit ranking wants.
    * Dangling nodes (no out-edges) leak their mass by default: relative
    * ranking is unaffected and the oracle stays a pure join chain.
    * `redistributeDangling = true` adds the standard per-round
    * dangling-sum term (each round's rank gains d·S/N where S is the
    * total rank parked on dangling nodes), restoring true stochastic
    * normalization (ranks sum to 1) for consumers that need calibrated
    * mass — one extra bounded aggregation per round (an anti-join of
    * the ≤N-row rank frame against the out-degree keys reduced to ONE
    * driver double), hash-gated by gr5's oracle.
    *
    * Scale notes: the node and degree frames are `localCheckpoint`ed once
    * (same discipline as clustersFromPairs — the ContextCleaner frees
    * them with the query); each iteration is ONE join keyed on src plus
    * ONE aggregation shuffle keyed on dst, and the rank frame is
    * checkpointed per round so the plan stays one iteration deep instead
    * of nesting. At cluster scale, pre-partition `edges` by src once and
    * every iteration's join reuses that partitioning.
    *
    * RETURN CONTRACT (since the optimization rounds): for the default
    * non-dangling path with iters not a multiple of 8 the returned frame
    * is a NESTED, unmaterialized plan — a caller that fans the result
    * into more than one action (or references it in more than one branch
    * of one plan — Catalyst does not dedup common subplans) re-executes
    * the remaining iterations per consumer and should `localCheckpoint()`
    * the result itself. Single-action consumers (the gr1/gr3 queries,
    * any write) pay the iterations exactly once either way; keeping the
    * final checkpoint out of this op is what collapsed iters+1 jobs into
    * one. */
  def pageRank(edges: DataFrame, iters: Int = 5, d: Double = 0.85,
      redistributeDangling: Boolean = false): DataFrame = {
    require(iters >= 1, "iters >= 1")
    val e = edges.select(col("src"), col("dst")).localCheckpoint()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct().localCheckpoint()
    val n = nodes.count().toDouble
    val withDeg = e
      .join(e.groupBy("src").agg(count(lit(1)).cast("double").as("deg")),
        "src")
      .localCheckpoint() // (src, dst, deg) — static across iterations
    val outNodes =
      if (redistributeDangling)
        e.select(col("src").as("id")).distinct().localCheckpoint()
      else null
    var ranks = nodes.select(col("id"), lit(1.0 / n).as("rank"))
    var it = 0
    while (it < iters) {
      // total rank parked on dangling nodes this round: one bounded agg
      // (<= N rank rows anti-joined against the out-degree keys) folded
      // to a single driver double — the same bounded-collect posture as
      // the Lloyd centroids. The .head is an ACTION, so the dangling
      // variant materializes ranks every round regardless (see the
      // checkpoint note below).
      val dangTerm =
        if (!redistributeDangling) 0.0
        else {
          val r = ranks.join(outNodes, Seq("id"), "left_anti")
            .agg(sum(col("rank"))).head
          (if (r.isNullAt(0)) 0.0 else r.getDouble(0)) / n
        }
      val in = withDeg
        .join(ranks, withDeg("src") === ranks("id"))
        .select(col("dst").as("id"), (col("rank") / col("deg")).as("c"))
        .groupBy("id").agg(sum(col("c")).as("in_sum"))
      ranks = nodes.join(in, Seq("id"), "left")
        .select(col("id"), (lit((1 - d) / n) +
          lit(d) * (coalesce(col("in_sum"), lit(0.0)) + lit(dangTerm)))
          .as("rank"))
      // CHECKPOINT POLICY (optimization round, guide §2.4): each round's
      // rank frame feeds the next round exactly ONCE, so nesting the
      // iterations into one lineage re-computes nothing — the old
      // per-round localCheckpoint bought only a shorter plan at the
      // price of one materialization JOB per round (iters+1 jobs where
      // one suffices). Nesting is bounded every 8 rounds (plan depth /
      // re-optimization cost grows with the chain — §3.3's "very large
      // plans" note), and the dangling variant still checkpoints every
      // round: its per-round .head action would otherwise re-run the
      // whole prefix chain once per round (quadratic re-execution).
      // Same arithmetic either way — results are bit-identical
      // (oracle-gated gr1/gr3/gr5).
      it += 1
      if (redistributeDangling || it % 8 == 0) ranks = ranks.localCheckpoint()
    }
    ranks
  }

  /** Per-node triangle counts and local clustering coefficient over a
    * directed edge frame — the density diagnostic of a near-dup/kNN
    * graph (a node whose neighbors all know each other sits inside a
    * mirror cluster; a hub whose neighbors are strangers bridges
    * unrelated content). Edges are undirected and canonicalized
    * (least, greatest, distinct) first; triangles enumerate once each as
    * ordered wedges a<b<c closed by the (a, c) edge — the standard
    * edge-join algorithm.
    *
    * Scale notes: edges are oriented from the LOWER-(degree, id)
    * endpoint before the wedge join (the compact-forward / node-iterator
    * ordering), so the wedge fan-out is Σ_v C(outdeg(v), 2) with
    * outdeg(v) = |{u ~ v : (deg(u), u) > (deg(v), v)}| ≤ O(√m) for ANY
    * graph — a power-law hub of degree d contributes ~0 wedges at the
    * hub instead of d², because every hub edge points INTO the hub.
    * Each triangle {u, v, w} with u < v < w in the degree order is
    * enumerated exactly once, as the wedge (u→v, u→w) closed by the
    * oriented edge (v→w). Both the wedge and the closing probe are
    * equi-joins on the oriented frame, which is `localCheckpoint`ed once
    * and reused three times. Output: (id, degree, triangles,
    * clustering = 2T/deg(deg−1), 6dp; degree < 2 ⇒ 0.0). */
  def triangleStats(edges: DataFrame): DataFrame = {
    val (oriented, deg) = orientEdges(edges)
    // wedge at the lowest-ordered apex, dst order keys disambiguate
    val tri = oriented
      .select(col("src"), col("dst").as("x"), col("dk").as("kx"))
      .join(oriented.select(col("src"), col("dst").as("y"),
        col("dk").as("ky")), "src")
      .where(col("kx") < col("ky")) // each unordered wedge once
      .join(oriented.select(col("src").as("x"), col("dst").as("y")),
        Seq("x", "y")) // closing edge, oriented x→y by transitivity
      .select(col("src").as("a"), col("x").as("b"), col("y").as("c"))
    val perNode = tri
      .select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("triangles"))
    deg.join(perNode, Seq("id"), "left")
      .select(col("id"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
      .withColumn("clustering",
        when(col("degree") < 2, lit(0.0))
          .otherwise(round(col("triangles") * lit(2.0) /
            (col("degree") * (col("degree") - 1)), 6)))
  }

  /** Canonicalize, dedup, and ORIENT an edge frame from the lower-
    * (degree, id) endpoint; returns (oriented(src, dst, dk), degree).
    * `dk` is the destination's (degree, id) order key, so the wedge join
    * can order its two legs without re-joining degrees. Package-visible:
    * ScaleSpec pins the planted-hub wedge bound on this frame. */
  private[graft] def orientEdges(edges: DataFrame)
      : (DataFrame, DataFrame) = {
    val und = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint()
    val deg = und
      .select(explode(array(col("a"), col("b"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("degree"))
      .localCheckpoint()
    // identical field names on both keys: struct comparison requires the
    // same type, and StructType equality includes field names
    val ka = struct(col("da").as("d"), col("a").as("i"))
    val kb = struct(col("db").as("d"), col("b").as("i"))
    val oriented = und
      .join(deg.select(col("id").as("a"), col("degree").as("da")), "a")
      .join(deg.select(col("id").as("b"), col("degree").as("db")), "b")
      .select(
        when(ka < kb, col("a")).otherwise(col("b")).as("src"),
        when(ka < kb, col("b")).otherwise(col("a")).as("dst"),
        when(ka < kb, kb).otherwise(ka).as("dk"))
      .localCheckpoint()
    (oriented, deg)
  }
}
