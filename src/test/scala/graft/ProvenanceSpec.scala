package graft

import org.apache.spark.sql.functions._
import graft.ops._

/** Round-11 capability laws: leakage-safe splitting, the corpus
  * provenance funnel, winsorized moments, KMV pair overlap, and int8
  * quantization error — each pinned by an algebraic law its oracle
  * cannot express (straddle-freedom, conservation, robustness,
  * small-union exactness, half-level error bounds). */
class ProvenanceSpec extends GraftSuite {
  import spark.implicits._

  private def docs = spark.read.parquet(s"$sf/documents.parquet")
  private def events = spark.read.parquet(s"$sf/events.parquet")
  private def embs = spark.read.parquet(s"$sf/embeddings.parquet")

  test("smp10 law: no near-dup pair straddles splits; clusters are split-pure") {
    val split = Sampling.leakageSafeSplit(docs).cache()
    try {
      val s1 = split.select(col("doc_id").as("doc1"), col("split").as("s1"))
      val s2 = split.select(col("doc_id").as("doc2"), col("split").as("s2"))
      val straddle = Dedup.jaccardPairs(docs, 3, 0.5)
        .join(s1, "doc1").join(s2, "doc2")
        .where(col("s1") =!= col("s2"))
      assert(straddle.count() == 0L,
        "a near-dup pair landed in two different splits")
      val impure = split.groupBy("cluster_id")
        .agg(countDistinct("split").as("k")).where(col("k") > 1)
      assert(impure.count() == 0L, "a cluster spans multiple splits")
      // exhaustive: one row per document, all three splits populated
      assert(split.count() == docs.count())
      assert(split.select("split").distinct().count() == 3L)
      // the per-doc hash split DOES straddle on this corpus — the mode
      // smp10 exists to prevent is real here, not vacuous
      val naive = Sampling.trainValTestSplit(docs, "doc_id")
      val naiveStraddle = Dedup.jaccardPairs(docs, 3, 0.5)
        .join(naive.select(col("doc_id").as("doc1"),
          col("split").as("s1")), "doc1")
        .join(naive.select(col("doc_id").as("doc2"),
          col("split").as("s2")), "doc2")
        .where(col("s1") =!= col("s2"))
      assert(naiveStraddle.count() > 0L,
        "fixture has no straddling pairs under the naive split; " +
          "the leakage law would be vacuous")
    } finally split.unpersist()
  }

  test("smp10 scale path: the LSH-blocked pair source yields the same split") {
    // minhashDuplicates is the deployed 100 TB pair source; on this
    // corpus its pair set equals the exact join (the d3 oracle), so the
    // leakage-safe split must be identical through either source
    val exact = Sampling.leakageSafeSplit(docs)
    val viaLsh = Sampling.leakageSafeSplitFromPairs(
      docs, Dedup.minhashDuplicates(docs))
    assert(exact.exceptAll(viaLsh).isEmpty &&
      viaLsh.exceptAll(exact).isEmpty,
      "LSH-sourced split diverged from the exact-pair split")
  }

  test("audit1 law: stages conserve docs and tokens; kept == e3 survivors") {
    val funnel = Pipeline.filterFunnel(docs).collect()
    assert(funnel.map(_.getAs[Long]("n_docs")).sum == docs.count())
    val totTok = docs
      .select(sum(size(split(col("text"), "\\s+")).cast("long")))
      .head.getLong(0)
    assert(funnel.map(_.getAs[Long]("n_tokens")).sum == totTok)
    val keptN = funnel.find(_.getAs[String]("stage") == "kept")
      .map(_.getAs[Long]("n_docs")).getOrElse(0L)
    val corpusN = Pipeline.trainingCorpus(docs)
      .select("doc_id").distinct().count()
    assert(keptN == corpusN,
      s"funnel kept $keptN but trainingCorpus emitted $corpusN docs")
  }

  test("dq4 law: winsorized moments shrug off a planted corrupt reading") {
    val base = (1 to 100).map(i => ("a", i.toDouble))
    val poisoned = (base :+ (("a", 1e9))).toDF("g", "v")
    val r = DataQuality.winsorizedStats(poisoned, "g", "v").head
    val winMean = r.getAs[Double]("win_mean")
    val winStd = r.getAs[Double]("win_std")
    // raw mean is ~9.9e6; the clipped mean must stay at data scale
    assert(winMean > 40.0 && winMean < 110.0,
      s"win_mean $winMean was not robust to the outlier")
    val rawStd = poisoned.select(stddev_samp(col("v"))).head.getDouble(0)
    assert(winStd < rawStd, "winsorized std must not exceed the raw std")
    assert(r.getAs[Double]("p_lo") <= r.getAs[Double]("p_hi"))
    // clean group: bounds inside the data range
    val c = DataQuality.winsorizedStats(base.toDF("g", "v"), "g", "v").head
    assert(c.getAs[Double]("p_lo") >= 1.0 && c.getAs[Double]("p_hi") <= 100.0)
  }

  test("a26 law: a pair whose union fits in k is estimated exactly") {
    val df = ((1 to 40).map(u => ("A", u.toLong)) ++
      (21 to 60).map(u => ("B", u.toLong))).toDF("t", "u")
    val r = Sketches.kmvOverlapPairs(df, "t", "u", 64).head
    assert(r.getAs[Long]("ku") == 60L)
    assert(r.getAs[Double]("est_union") == 60.0)
    assert(r.getAs[Long]("matches") == 20L)
    assert(math.abs(r.getAs[Double]("est_overlap") - 20.0) < 1e-4,
      "sub-k union must reproduce the exact intersection")
  }

  test("a26 estimator: overlap tracks the exact intersection on real events") {
    val est = Sketches.kmvOverlapPairs(events, "event_type", "user_id", 64)
    val au = events.where(col("user_id").isNotNull)
      .select(col("event_type"), col("user_id")).distinct()
    val exact = au.toDF("type_a", "u")
      .join(au.toDF("type_b", "u"), Seq("u"))
      .where(col("type_a") < col("type_b"))
      .groupBy("type_a", "type_b").agg(count(lit(1)).as("exact"))
    val rows = est.join(exact, Seq("type_a", "type_b"), "left").collect()
    assert(rows.length == 10, "5 event types should yield 10 pairs")
    rows.foreach { r =>
      val e = r.getAs[Double]("est_overlap")
      val x = Option(r.getAs[Any]("exact")).map(_.toString.toLong).getOrElse(0L)
      assert(e >= 0.0 && e <= r.getAs[Double]("est_union") + 1e-9)
      // deterministic fixture: generous 2/sqrt(k)-scale relative bound
      assert(math.abs(e - x) <= math.max(0.5 * x, 15.0),
        s"pair ${r.getAs[String]("type_a")}/${r.getAs[String]("type_b")}: " +
          s"est $e vs exact $x")
    }
  }

  test("cur3 law: pos is a 1..n permutation consumed high-band-first") {
    val ord = Sampling
      .curriculumOrder(TextAnalysis.modelQualityScore(docs)).cache()
    try {
      val n = ord.count()
      assert(ord.select("pos").distinct().count() == n,
        "pos must be collision-free")
      val mm = ord.agg(min(col("pos")), max(col("pos"))).head
      assert(mm.getLong(0) == 1L && mm.getLong(1) == n,
        "pos must cover exactly 1..n")
      val bands = ord.groupBy("band")
        .agg(min(col("pos")).as("mn"), max(col("pos")).as("mx"))
        .collect().sortBy(-_.getAs[Long]("band"))
      assert(bands.length > 1, "fixture must populate multiple bands")
      bands.sliding(2).foreach {
        case Array(hi, lo) =>
          assert(hi.getAs[Long]("mx") < lo.getAs[Long]("mn"),
            "a higher band must finish before a lower band starts")
        case _ =>
      }
    } finally ord.unpersist()
  }

  test("r5 law: grade-ordered runs are perfect, total misses score zero") {
    val qrels = Seq(("q1", 10L, 3), ("q1", 11L, 2), ("q1", 12L, 1),
      ("q2", 20L, 3), ("q2", 21L, 2), ("q2", 22L, 1))
      .toDF("query_id", "doc_id", "grade")
    val perfect = Seq(("q1", 10L, 1), ("q1", 11L, 2), ("q1", 12L, 3),
      ("q2", 20L, 1), ("q2", 21L, 2), ("q2", 22L, 3))
      .toDF("query_id", "doc_id", "rn")
    Pipeline.retrievalNdcg(perfect, qrels).collect().foreach { r =>
      assert(math.abs(r.getAs[Double]("ndcg") - 1.0) < 1e-5,
        "ideal-ordered run must score ndcg == 1")
    }
    val miss = Seq(("q1", 99L, 1), ("q2", 98L, 1))
      .toDF("query_id", "doc_id", "rn")
    Pipeline.retrievalNdcg(miss, qrels).collect().foreach { r =>
      assert(r.getAs[Double]("ndcg") == 0.0 &&
        r.getAs[Double]("dcg") == 0.0,
        "a run with no relevant hit must score zero, visibly")
    }
    val rev = Seq(("q1", 12L, 1), ("q1", 11L, 2), ("q1", 10L, 3))
      .toDF("query_id", "doc_id", "rn")
    val rv = Pipeline
      .retrievalNdcg(rev, qrels.where($"query_id" === "q1")).head
    assert(rv.getAs[Double]("ndcg") > 0.0 && rv.getAs[Double]("ndcg") < 1.0,
      "a reversed ranking must land strictly between miss and perfect")
  }

  test("emb4 law: errors bounded by half a level; constant dims are free") {
    val rows = Similarity.int8QuantStats(embs).collect()
    assert(rows.length == 64)
    rows.foreach { r =>
      val range = r.getAs[Double]("max_v") - r.getAs[Double]("min_v")
      val halfLevel = range / 510.0 + 2e-6 // + input-quantization slack
      assert(r.getAs[Double]("max_abs_err") <= halfLevel,
        s"dim ${r.getAs[Int]("dim")}: max_abs_err exceeds half a level")
      assert(r.getAs[Double]("rmse") <= r.getAs[Double]("max_abs_err") + 1e-9)
    }
    val const = Seq(
      (1L, Array(0.5f, 0.1f)), (2L, Array(0.5f, 0.9f)))
      .toDF("vec_id", "embedding")
    val c = Similarity.int8QuantStats(const).orderBy("dim").collect()
    assert(c(0).getAs[Double]("rmse") == 0.0 &&
      c(0).getAs[Double]("max_abs_err") == 0.0,
      "a constant dimension must reconstruct exactly")
    assert(c(1).getAs[Double]("max_abs_err") <= 0.8 / 510.0 + 2e-6)
  }
}
