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
  * IVF search with a k-means coarse quantizer. Both cut the candidate set
  * from |N| to a bucket, trading recall for a scan reduction that grows
  * with corpus size.
  *
  * Plan shape shared by all three: per-vector norms are computed ONCE
  * before pairing (never per pair), the tiny query side is broadcast, and
  * only ids travel through dedup shuffles — embeddings are re-attached
  * after. */
object Similarity {

  private def withNorm(df: DataFrame): DataFrame =
    df.withColumn("nrm", Vectors.normFast(col("embedding")))

  private def rankTopK(pairs: DataFrame, k: Int): DataFrame =
    pairs
      .withColumn("cos",
        Vectors.cosineFast(col("q_emb"), col("n_emb"), col("q_nrm"),
          col("n_nrm")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("cos").desc, col("nid"))))
      .where(col("rn") <= k)

  /** Exact brute-force cosine top-k for queries `vec_id < numQueries`. */
  def bruteForceTopK(embeddings: DataFrame, numQueries: Int, k: Int): DataFrame = {
    val base = withNorm(embeddings)
    val q = base.where(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"))
    val pairs = base
      .select(col("vec_id").as("nid"), col("embedding").as("n_emb"),
        col("nrm").as("n_nrm"))
      .join(broadcast(q), col("qid") =!= col("nid"))
    rankTopK(pairs, k).select(col("qid"), col("rn"), col("nid"))
  }

  /** Hyperplane-LSH ANN: candidates share a bucket with the query in any of
    * `tables` hash tables; exact cosine ranks candidates. */
  def lshTopK(embeddings: DataFrame, numQueries: Int, k: Int,
      bits: Int = 5, tables: Int = 12, dims: Int = 64): DataFrame = {
    // localCheckpoint: the signature frame feeds both the query side and
    // the corpus side of the bucket join — materialize the hyperplane UDF
    // once instead of twice
    val sigs = embeddings
      .select(col("vec_id"),
        posexplode(Vectors.sigsUdf(dims, bits, tables)(col("embedding")))
          .as(Seq("tbl", "sig")))
      .localCheckpoint()
    val q = sigs.where(col("vec_id") < numQueries).toDF("qid", "tbl", "sig")
    val candIds = sigs.toDF("nid", "tbl", "sig")
      .join(broadcast(q), Seq("tbl", "sig"))
      .where(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid")).distinct()
    val base = withNorm(embeddings)
    val pairs = candIds
      .join(base.select(col("vec_id").as("qid"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm")), "qid")
      .join(base.select(col("vec_id").as("nid"), col("embedding").as("n_emb"),
        col("nrm").as("n_nrm")), "nid")
    rankTopK(pairs, k).select(col("qid"), col("rn"), col("nid"), col("cos"))
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
      .setMaxIter(8).setInitMode("random") // coarse cells only — full
      .setFeaturesCol("fv").setPredictionCol("cell") // convergence buys no
      .fit(withVec) // recall at nprobe<<nCells
    val base = withNorm(model.transform(withVec))
    val corpus = base.select(col("vec_id").as("nid"),
      col("embedding").as("n_emb"), col("nrm").as("n_nrm"), col("cell"))
    val centersLit = array(model.clusterCenters.zipWithIndex.map {
      case (c, i) => struct(lit(i).as("cell"),
        array(c.toArray.map(lit(_)): _*).as("ctr"))
    }: _*)
    val sqDist = aggregate(
      zip_with(transform(col("q_emb"), x => x.cast("double")),
        col("c.ctr"), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)
    val q = base.where(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"))
      .withColumn("c", explode(centersLit))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(sqDist, col("c.cell"))))
      .where(col("rk") <= nprobe)
      .select(col("qid"), col("q_emb"), col("q_nrm"), col("c.cell").as("cell"))
    val pairs = corpus.join(broadcast(q), Seq("cell"))
      .where(col("qid") =!= col("nid"))
    rankTopK(pairs, k).select(col("qid"), col("rn"), col("nid"), col("cos"))
  }
}
