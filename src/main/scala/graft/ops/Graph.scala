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
    * Dangling nodes (no out-edges) leak their mass instead of
    * redistributing it: relative ranking is unaffected and the oracle
    * stays a pure join chain; add a dangling-sum term per iteration if
    * stochastic normalization ever matters.
    *
    * Scale notes: the node and degree frames are `localCheckpoint`ed once
    * (same discipline as clustersFromPairs — the ContextCleaner frees
    * them with the query); each iteration is ONE join keyed on src plus
    * ONE aggregation shuffle keyed on dst, and the rank frame is
    * checkpointed per round so the plan stays one iteration deep instead
    * of nesting. At cluster scale, pre-partition `edges` by src once and
    * every iteration's join reuses that partitioning. */
  def pageRank(edges: DataFrame, iters: Int = 5,
      d: Double = 0.85): DataFrame = {
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
    var ranks = nodes.select(col("id"), lit(1.0 / n).as("rank"))
      .localCheckpoint()
    var it = 0
    while (it < iters) {
      val in = withDeg
        .join(ranks, withDeg("src") === ranks("id"))
        .select(col("dst").as("id"), (col("rank") / col("deg")).as("c"))
        .groupBy("id").agg(sum(col("c")).as("in_sum"))
      ranks = nodes.join(in, Seq("id"), "left")
        .select(col("id"), (lit((1 - d) / n) +
          lit(d) * coalesce(col("in_sum"), lit(0.0))).as("rank"))
        .localCheckpoint()
      it += 1
    }
    ranks
  }
}
