package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Vectors

/** Approximate-nearest-neighbor search over an `array<float>` embedding
  * column.
  *
  * Baseline: brute-force cosine top-k — exact, O(|Q| x |N|), the oracle for
  * recall. Scale paths: hyperplane-LSH bucketed search (no training) and an
  * IVF-style cell-pruned search (precomputed coarse assignment, here the
  * `label` column standing in for a k-means cell id). Both cut the
  * candidate set from |N| to a bucket, trading recall for a >10x scan
  * reduction that grows with corpus size.
  */
object Similarity {

  /** Exact brute-force cosine top-k for queries `vec_id < numQueries`.
    * The query side is tiny => broadcast it, so the corpus is scanned once
    * with no shuffle of the big side. */
  def bruteForceTopK(embeddings: DataFrame, numQueries: Int, k: Int): DataFrame = {
    val q = embeddings.where(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("q_emb"))
    val ranked = embeddings
      .select(col("vec_id").as("nid"), col("embedding").as("n_emb"))
      .join(broadcast(q), col("qid") =!= col("nid"))
      .withColumn("cos", Vectors.cosine(col("q_emb"), col("n_emb")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("cos").desc, col("nid"))))
      .where(col("rn") <= k)
    ranked.select(col("qid"), col("rn"), col("nid"))
  }

  /** Hyperplane-LSH ANN: candidates share a bucket with the query in any of
    * `tables` hash tables; exact cosine ranks candidates. */
  def lshTopK(embeddings: DataFrame, numQueries: Int, k: Int,
      bits: Int = 8, tables: Int = 4, dims: Int = 64): DataFrame = {
    val sigs = embeddings.select(col("vec_id"), col("embedding"),
      explode(array((0 until tables).map(tbl =>
        struct(lit(tbl).as("tbl"),
          Vectors.hyperplaneSig(col("embedding"), dims, bits, tbl)
            .as("sig"))): _*)).as("ts"))
      .select(col("vec_id"), col("embedding"),
        col("ts.tbl").as("tbl"), col("ts.sig").as("sig"))
    val q = sigs.where(col("vec_id") < numQueries)
      .toDF("qid", "q_emb", "tbl", "sig")
    val cand = sigs.toDF("nid", "n_emb", "tbl", "sig")
      .join(broadcast(q), Seq("tbl", "sig"))
      .where(col("qid") =!= col("nid"))
      .select(col("qid"), col("q_emb"), col("nid"), col("n_emb"))
      .distinct()
    cand
      .withColumn("cos", Vectors.cosine(col("q_emb"), col("n_emb")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("cos").desc, col("nid"))))
      .where(col("rn") <= k)
      .select(col("qid"), col("rn"), col("nid"), col("cos"))
  }

  /** IVF ANN: k-means coarse quantizer (MLlib, fixed seed) partitions the
    * corpus into cells; each query probes the `nprobe` cells whose
    * centroids are nearest, then exact cosine ranks candidates. At 100 TB
    * the centroids are trained on a sample and the corpus is written
    * bucketed by cell, so a query touches nprobe/nCells of the data. */
  def ivfTopK(embeddings: DataFrame, numQueries: Int, k: Int,
      nCells: Int = 16, nprobe: Int = 2): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    val toVec = udf((a: Seq[Float]) =>
      org.apache.spark.ml.linalg.Vectors.dense(a.map(_.toDouble).toArray))
    val withVec = embeddings.withColumn("fv", toVec(col("embedding")))
    val model = new KMeans().setK(nCells).setSeed(42L)
      .setFeaturesCol("fv").setPredictionCol("cell").fit(withVec)
    val corpus = model.transform(withVec)
      .select(col("vec_id").as("nid"), col("embedding").as("n_emb"),
        col("cell"))
    val centersLit = array(model.clusterCenters.zipWithIndex.map {
      case (c, i) => struct(lit(i).as("cell"),
        array(c.toArray.map(lit(_)): _*).as("ctr"))
    }: _*)
    val sqDist = aggregate(
      zip_with(transform(col("q_emb"), x => x.cast("double")),
        col("c.ctr"), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)
    val q = embeddings.where(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("q_emb"))
      .withColumn("c", explode(centersLit))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(sqDist, col("c.cell"))))
      .where(col("rk") <= nprobe)
      .select(col("qid"), col("q_emb"), col("c.cell").as("cell"))
    corpus.join(broadcast(q), Seq("cell"))
      .where(col("qid") =!= col("nid"))
      .withColumn("cos", Vectors.cosine(col("q_emb"), col("n_emb")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("cos").desc, col("nid"))))
      .where(col("rn") <= k)
      .select(col("qid"), col("rn"), col("nid"), col("cos"))
  }
}
