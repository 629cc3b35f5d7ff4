package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-level measurement probe (optimization-round diagnostic, guide
  * §1): times individual SUB-STAGES of the expensive queries with the
  * same noop-sink methodology as the bench, after the same substrate
  * warm-up, so the per-query cost can be attributed to the operator
  * that owns it. Reads SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS like
  * Bench; SPARK_GRAFT_PROBE_ONLY (comma list) selects probes. Each
  * probe runs SPARK_GRAFT_PROBE_REPS times (default 3) and prints all
  * rep times — rep1 is cold (builds memos), later reps are the warm
  * cost a bench rep-2 pays. NOT part of the bench contract; purely a
  * diagnostic main like PlanDump. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String): DataFrame = Tables.load(spark, sfDir, name)
    val docs = t("documents")
    val embs = t("embeddings")
    docs.count(); embs.count()
    ops.Dedup.warmSubstrate(docs, 3, 0.5)

    import ops._
    lazy val flags = Pipeline.multimodalFlags(docs, embs, 25L)
    val probes: Seq[(String, () => DataFrame)] = Seq(
      "near_dups" -> (() => Dedup.jaccardPairs(docs, 3, 0.5)
        .select(col("doc2").as("doc_id")).distinct()),
      "exact_dups" -> (() => {
        val fp = md5(trim(regexp_replace(lower(col("text")),
          "[^a-z0-9]+", " ")))
        docs.select(col("doc_id"), fp.as("fp"))
          .withColumn("keeper", min(col("doc_id")).over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))))
          .where(col("doc_id") =!= col("keeper"))
          .select(col("doc_id"))
      }),
      "contaminated" -> (() => Dedup
        .contaminationSplitCheck(docs, 25L, 3, 5)
        .select(col("doc_id")).distinct()),
      "semantic_flags" -> (() => Pipeline.semanticFlags(embs, 25L, 0.4)),
      "media_dup" -> (() => Pipeline.mediaNearDupDrops(docs, 3, 2)),
      "media_contam" -> (() => Pipeline.mediaContamDrops(docs, 25L, 5, 3)),
      "span_plan" -> (() => Dedup.quoteRedactionSpans(docs, 25L, 3, 0.8,
        tol = 1, minPositions = 3)),
      "e3survivors_plain" -> (() =>
        Pipeline.e3Survivors(docs, 25L, 100, 0.5, None)),
      "e3survivors_e18drops" -> (() =>
        Pipeline.e3Survivors(docs, 25L, 100, 0.5, Some(flags.drops))),
      "redactpack_counts_tokenize" -> (() => {
        val sv = Pipeline.e3Survivors(docs, 25L, 100, 0.5, None)
        sv.select(col("doc_id"),
          size(graft.functions.Text.tokenizeUdf(col("text")))
            .cast("long").as("n_tok_orig"))
      }),
      "redactpack_full" -> (() => {
        val sv = Pipeline.e3Survivors(docs, 25L, 100, 0.5, None)
        Pipeline.redactPack(sv, flags.spanPlan, 4096)
      }),
      "union_spans" -> (() => Pipeline.unionTokenSpans(flags.spanPlan)),
      "redacted_text_delta" -> (() => Pipeline.redactedTextFromSpans(docs,
        flags.spanPlan.localCheckpoint())),
      "offsets_from_counts" -> (() => {
        val counts = docs.where(col("doc_id") >= 25L)
          .select(col("doc_id"),
            size(split(col("text"), "\\s+")).cast("long").as("n_tok"))
        Sampling.offsetsFromCounts(counts, 4096)
      }),
      "e3" -> (() => Pipeline.trainingCorpus(docs)),
      "e13" -> (() => Pipeline.surgicalCorpus(docs)),
      "e16" -> (() => Pipeline.surgicalCorpusText(docs)),
      "e17" -> (() => Pipeline.fullRelease(docs, embs)),
      "e18" -> (() => Pipeline.fullMultimodalRelease(docs, embs)),
      "e19" -> (() => Pipeline.fullMultimodalReleaseText(docs, embs)),
      "e20" -> (() => Pipeline.releaseFingerprint(
        Pipeline.fullMultimodalRelease(docs, embs))),
      "audit5" -> (() => Pipeline.surgicalFilterFunnel(docs, embs)),
      "audit2" -> (() => Pipeline.mediaFilterFunnel(docs)),
      "emb3" -> (() => SparkEntry.queries("emb3_top_pc")(spark, sfDir)),
      "sim12" -> (() =>
        SparkEntry.queries("sim12_ivfadc_portable")(spark, sfDir)),
      "gr3" -> (() =>
        SparkEntry.queries("gr3_portable_pagerank")(spark, sfDir)),
      "gr4" -> (() => SparkEntry.queries("gr4_triangle_stats")(spark, sfDir)),
      "j7" -> (() =>
        SparkEntry.queries("j7_star_revenue_by_region")(spark, sfDir)),
      "d27" -> (() =>
        SparkEntry.queries("d27_aligned_containment")(spark, sfDir)),
      "e2_rev_year" -> (() =>
        SparkEntry.queries("e2_sql_revenue_by_year")(spark, sfDir)),
      "p1" -> (() => SparkEntry.queries("p1_parse_validate")(spark, sfDir)),
      "p12" -> (() => SparkEntry.queries("p12_parse_rejects")(spark, sfDir)),
      "d18" -> (() =>
        SparkEntry.queries("d18_portable_neardup")(spark, sfDir)),
      "d19" -> (() =>
        SparkEntry.queries("d19_portable_simhash")(spark, sfDir)),
      "d33" -> (() =>
        SparkEntry.queries("d33_redaction_char_spans")(spark, sfDir)),
      "d14" -> (() => SparkEntry.queries("d14_dup_spans")(spark, sfDir)),
      "r7" -> (() =>
        SparkEntry.queries("r7_pruned_benchmark_mrr")(spark, sfDir)),
      "gr5" -> (() =>
        SparkEntry.queries("gr5_pagerank_dangling")(spark, sfDir)),
      "gr1" -> (() => SparkEntry.queries("gr1_knn_pagerank")(spark, sfDir)),
      "e15" -> (() => SparkEntry.queries("e15_redacted_text")(spark, sfDir)),
      "e12" -> (() =>
        SparkEntry.queries("e12_redacted_corpus")(spark, sfDir)))

    val only = sys.env.get("SPARK_GRAFT_PROBE_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "3").toInt
    probes.foreach { case (name, fn) =>
      if (only.forall(_.contains(name))) {
        val times = (0 until reps).map { _ =>
          val t0 = System.nanoTime()
          try fn().write.format("noop").mode("overwrite").save()
          catch { case e: Throwable =>
            System.err.println(s"[probe] $name failed: ${e.getMessage}")
          }
          (System.nanoTime() - t0) / 1e9
        }
        println(f"PROBE $name%-28s " +
          times.map(x => f"$x%7.3f").mkString(" "))
      }
    }
    spark.stop()
  }
}
