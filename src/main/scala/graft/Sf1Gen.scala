package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1 replica generator (driver tooling, like [[ScaleCurve]]): builds a
  * 10x copy of the sf0.1 tables so the COMPLETE bench suite can be
  * measured one decade up the scale curve (BASELINE.md sf1 addendum —
  * the family curves cover the blocked ops; this covers everything
  * else, flagging super-linear stragglers).
  *
  * Replication protocol (the [[ScaleCurve]] rules, table by table):
  *  - region/nation: NOT replicated — fixed-cardinality dims, constant
  *    with SF exactly as in TPC-H.
  *  - customer/supplier/part/orders/lineitem/events: replicated with a
  *    CONSISTENT id offset (replica i adds i·1e8 to every entity key on
  *    every table that carries it), so referential joins hold and join
  *    fan-outs stay constant — the corpus grows 10x, the per-key
  *    structure doesn't.
  *  - documents: id offset + every third word of replica i > 0 replaced
  *    by a replica-specific token. With 3-gram shingles every shingle
  *    then contains >= 1 replaced word, so CROSS-replica Jaccard of the
  *    copied texts collapses to ~0 (no fake dup inflation measuring the
  *    data instead of the operator), while WITHIN a replica the
  *    transform is position-deterministic, so the planted near-dup
  *    structure survives at constant density.
  *  - embeddings: id offset + the orthogonal map (cyclic dim shift
  *    composed with a deterministic diagonal sign flip — preserves
  *    inner products within a replica, decorrelates across replicas),
  *    verbatim from [[ScaleCurve]].
  *
  * Usage: runMain graft.Sf1Gen [srcDir] [outDir] [replicas]
  */
object Sf1Gen {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "target/sf1"
    val reps = if (args.length > 2) args(2).toInt else 10
    val OFF = 100000000L
    val dims = 64
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")
    // Big tables get >= one file per local core: at sf1 every file is far
    // below the 128 MB split size, so file count IS scan parallelism —
    // `coalesce(reps)` capped CPU-heavy linear queries (parse, quality
    // stats) at 10 of 32 cores and read as a fake 17x in the first sf1
    // run (BASELINE.md sf1 addendum). repartition, not coalesce: an even
    // rebalance, and the shuffle is one-off generator cost.
    def write(df: DataFrame, name: String, parts: Int): Unit = {
      val n = if (parts <= 1) 1 else math.max(parts, 32)
      df.repartition(n).write.mode("overwrite")
        .parquet(s"$out/$name.parquet")
    }

    // fixed dims: straight copy
    Seq("region", "nation").foreach(n => write(t(n), n, 1))

    def offsetted(name: String, keys: Seq[String]): DataFrame = {
      val base = t(name)
      (0 until reps).map { i =>
        keys.foldLeft(base) { (df, k) =>
          df.withColumn(k, col(k) + lit(i * OFF))
        }
      }.reduce(_ unionByName _)
    }
    write(offsetted("customer", Seq("c_custkey")), "customer", reps)
    write(offsetted("supplier", Seq("s_suppkey")), "supplier", reps)
    write(offsetted("part", Seq("p_partkey")), "part", reps)
    write(offsetted("orders", Seq("o_orderkey", "o_custkey")), "orders",
      reps)
    write(offsetted("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey")),
      "lineitem", reps)
    write(offsetted("events", Seq("event_id", "user_id")), "events", reps)

    val docs = t("documents")
    write((0 until reps).map { i =>
      if (i == 0) docs
      else docs
        .withColumn("doc_id", col("doc_id") + lit(i * OFF))
        .withColumn("text", expr(
          s"""array_join(transform(split(text, ' '),
             |  (w, j) -> CASE WHEN j % 3 = 2 THEN 'rseed$i' ELSE w END),
             |  ' ')""".stripMargin))
    }.reduce(_ unionByName _), "documents", reps)

    val emb = t("embeddings")
    write((0 until reps).map { i =>
      if (i == 0) emb
      else emb.select(
        (col("vec_id") + lit(i * OFF)).as("vec_id"),
        expr(
          s"""transform(
             |  concat(slice(embedding, ${i % dims + 1}, ${dims - i % dims}),
             |         slice(embedding, 1, ${i % dims})),
             |  (x, j) -> CAST(x * (CASE WHEN pmod((j + 1) * ${2 * i + 1}, 5) < 2
             |                       THEN -1.0 ELSE 1.0 END) AS FLOAT))
             |""".stripMargin).as("embedding"),
        col("label"))
    }.reduce(_ unionByName _), "embeddings", reps)

    println(s"""{"sf1gen":"done","out":"$out","reps":$reps}""")
    spark.stop()
  }
}
