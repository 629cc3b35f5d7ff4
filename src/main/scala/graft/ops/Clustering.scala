package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding clustering for corpus curation — the grouping primitive under
  * SemDeDup-style semantic dedup and cluster-balanced sampling. Classic
  * Lloyd k-means, expressed Spark-first: the MODEL (k × dim centroids) is
  * the only driver-side state, the data pass is a narrow broadcast-literal
  * argmin, and the update is one (cluster, dim)-keyed aggregation per
  * round. Nothing reference-derived (the reference has no ML surface);
  * design follows the standard scalable-Lloyd shape.
  *
  * Determinism contract (what makes the DuckDB oracle possible):
  *  - init: the k embeddings with the smallest vec_ids, cluster ids 0..k-1
  *    in vec_id order;
  *  - distance: squared L2 summed in ordinal dimension order, doubles;
  *  - argmin tie-break: smallest cluster id;
  *  - centroid update: round(sum/count, 6) per dimension — rounding each
  *    round snaps both engines to the same decimals, so parallel-sum
  *    ordering noise (~1e-15) cannot accumulate across rounds;
  *  - clusters that receive no points drop out for later rounds.
  *
  * Scale shape: per round, ONE shuffle of (cluster, dim) partial sums
  * (map-side combined to k·dim rows per partition) and a k·dim-row collect
  * — the 100 TB cost is the narrow assignment scans, exactly Lloyd's
  * lower bound. The assignment expression stays in whole-stage codegen
  * (functions-only, no UDF).
  */
object Clustering {

  private def sqDist(v: Column, cen: Seq[Double]): Column =
    aggregate(
      zip_with(v, lit(cen.toArray), (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, x) => acc + x)

  /** argmin over the centroid list: array_position of the min distance is
    * 1-based FIRST match, so equal distances break toward the smaller
    * cluster id; the cid lookup indirects through the (possibly sparse
    * after empty-cluster drop) id list. */
  private def nearest(cents: Seq[(Int, Seq[Double])]): Column = {
    val dists = array(cents.map { case (_, cen) => sqDist(col("v"), cen) }: _*)
    val ids = array(cents.map { case (cid, _) => lit(cid) }: _*)
    element_at(ids, array_position(dists, array_min(dists)).cast("int"))
  }

  /** `iters` Lloyd rounds from the deterministic init, then the final
    * assignment against the last (rounded) centroids: (vec_id, cluster).
    */
  def kmeansAssign(embeddings: DataFrame, k: Int = 8,
      iters: Int = 2): DataFrame = {
    require(k >= 1 && iters >= 0, "k and iters must be positive")
    val emb = embeddings
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("v"))
      .localCheckpoint() // scanned iters+1 times — materialize once
    var cents: Seq[(Int, Seq[Double])] = emb
      .orderBy(col("vec_id")).limit(k).collect().toSeq
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](1)) }
    for (_ <- 1 to iters) {
      // one aggregation pass: (cluster, dim) -> rounded mean; the round(6)
      // happens IN the query so both engines apply their SQL ROUND to the
      // same double
      val means = emb
        .select(nearest(cents).as("cluster"),
          posexplode(col("v")).as(Seq("i", "x")))
        .groupBy(col("cluster"), col("i"))
        .agg(round(sum(col("x")) / count(lit(1)), 6).as("m"))
        .collect()
      cents = means
        .groupBy(_.getInt(0))
        .map { case (cid, rows) =>
          (cid, rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq)
        }
        .toSeq.sortBy(_._1)
    }
    emb.select(col("vec_id"), nearest(cents).as("cluster"))
  }

  /** Within-cluster sum of squared distances for a given assignment —
    * Lloyd's objective; each round must not increase it (spec'd).
    * Spec-support only: collects the vectors, so small frames only. */
  def sse(embeddings: DataFrame, k: Int, iters: Int): Double = {
    val emb = embeddings.select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("v"))
    val asg = kmeansAssign(embeddings, k, iters)
    val cents = emb.join(asg, "vec_id")
      .select(col("cluster"), posexplode(col("v")).as(Seq("i", "x")))
      .groupBy(col("cluster"), col("i"))
      .agg((sum(col("x")) / count(lit(1))).as("m"))
      .collect()
      .groupBy(_.getInt(0))
      .map { case (cid, rows) =>
        (cid, rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq)
      }
    emb.join(asg, "vec_id")
      .select(col("cluster"), col("v"))
      .collect()
      .map { r =>
        val cen = cents(r.getInt(0))
        r.getSeq[Double](1).zip(cen).map { case (a, b) => (a - b) * (a - b) }
          .sum
      }
      .sum
  }
}
