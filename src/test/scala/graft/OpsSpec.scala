package graft

import org.apache.spark.sql.functions._

class OpsSpec extends GraftSuite {
  import ops._

  private lazy val events = Tables.load(spark, sf, "events")
  private lazy val docs = Tables.load(spark, sf, "documents")

  test("a6 custom Aggregator equals built-in countDistinct") {
    val got = Aggs.distinctUsersByType(events)
      .select("event_type", "uu").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exp = events.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("uu")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == exp)
  }

  test("a7 keep-last is idempotent and one row per user") {
    val once = Aggs.keepLastPerUser(events)
    assert(once.count() == events.select("user_id").distinct().count())
    assert(once.groupBy("user_id").count().where(col("count") > 1).count() == 0)
  }

  test("p4 deltas telescope back to last value per user") {
    // sum of deltas over a user's history == last value (A7 netting law)
    val sums = Etl.deltaVsPrevious(events)
      .groupBy("user_id")
      .agg(round(sum(col("delta")), 2).as("s"))
    val last = Aggs.keepLastPerUser(events)
      .select(col("user_id"), round(col("last_value"), 2).as("v"))
    assert(sums.join(last, "user_id").where(col("s") =!= col("v")).count() == 0)
  }

  test("x1 split legs partition the input") {
    val legs = Splits.splitLog(events)
    val total = legs.values.map(_.count()).sum
    assert(total == events.count())
    // and the single-pass counts agree with the multi-frame split
    val counts = Splits.splitLogCounts(events).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    legs.foreach { case (name, df) => assert(counts(name) == df.count()) }
  }

  test("u1 tokenizer: deterministic, lowercase, no empties") {
    val toks = docs.select(functions.Text.kwSplit(col("text")).as("kw"))
    assert(toks.where(col("kw") === "" || col("kw") =!= lower(col("kw"))).count() == 0)
  }

  test("j2 left join keeps customers with zero orders") {
    val c = Tables.load(spark, sf, "customer")
    val o = Tables.load(spark, sf, "orders")
    val summary = Joins.customerOrderSummary(c, o)
    assert(summary.count() == c.count())
    val zero = summary.where(col("n_orders") === 0)
    assert(zero.where(col("spend") =!= 0.0).count() == 0)
  }

  test("j9 as-of join picks the most recent prior right row, equal ts matches") {
    import spark.implicits._
    def ts(s: Int) = new java.sql.Timestamp(1704067200000L + s * 1000L)
    val left = Seq((100L, 1L, ts(10)), (101L, 1L, ts(5)), (102L, 2L, ts(3)))
      .toDF("lid", "k", "ts")
    val right = Seq((200L, 1L, ts(4)), (201L, 1L, ts(8)), (202L, 1L, ts(10)),
      (203L, 3L, ts(1))).toDF("rid", "k", "ts")
    val got = ops.Joins.asofJoin(left, right, "k", "ts", "ts", "lid", "rid")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // lid 100 @t10: rids at t4,t8,t10 -> equal-ts 202 matches (<=)
    // lid 101 @t5: most recent prior is 200 @t4
    // lid 102 key 2: no right rows -> dropped
    assert(got == Map(100L -> 202L, 101L -> 200L))
  }

  test("p1 drops malformed JSON without raising") {
    import spark.implicits._
    val frame = Seq(
      (1L, 1L, "click", """{"k": 5}"""),
      (2L, 1L, "click", """{bad json"""),
      (3L, 1L, "click", null: String))
      .toDF("event_id", "user_id", "event_type", "props")
    val got = ops.Etl.parseValidate(frame, Seq("click"))
      .select("event_id").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L))
  }

  test("p6 config-as-data pruning equals static-config pruning") {
    import spark.implicits._
    val cfgDf = Seq(("cart_info", "id,user_id"), ("order_info", "id,amount"),
      ("user_info", "id"), ("page_log", "id"))
      .toDF("table", "sink_columns")
    val env = ops.Etl.toCdcEnvelope(events)
    val viaDf = ops.Etl.pruneColumnsFromConfig(env, cfgDf)
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    val viaMap = ops.Etl.pruneColumns(env, Map(
      "cart_info" -> Seq("id", "user_id"), "order_info" -> Seq("id", "amount"),
      "user_info" -> Seq("id"), "page_log" -> Seq("id")))
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    assert(viaDf == viaMap && viaDf.nonEmpty)
  }

  test("s7 dynamic partition overwrite rewrites only the touched partitions") {
    val out = java.nio.file.Files.createTempDirectory("graft_dpo").toString + "/t"
    val daily = ops.Aggs.globalDailyStats(events)
    sources.Sinks.writeDatePartitioned(daily, "d", out)
    val before = spark.read.parquet(out)
    val nDays = before.select("_date").distinct().count()
    // restate ONE day with altered counts
    val restated = daily.where(col("d") === "2024-01-05")
      .withColumn("cnt", col("cnt") + 1000000L)
    sources.Sinks.overwriteDatePartitions(restated, "d", out)
    val after = spark.read.parquet(out)
    assert(after.select("_date").distinct().count() == nDays,
      "untouched partitions must survive")
    assert(after.where(col("_date") === "2024-01-05")
      .select("cnt").collect()(0).getLong(0) > 1000000L)
    assert(after.where(col("_date") === "2024-01-06").count() == 1)
  }

  test("s4/s5 kafka record shape: per-row topic + compact JSON value") {
    val routed = ops.Splits.routeByConfig(events,
      ops.Splits.defaultRouteConfig(spark))
    val recs = sources.Sinks.toKafkaRecords(
      routed.select("sink_topic", "event_id", "event_type"), "sink_topic")
    assert(recs.columns.toSeq == Seq("topic", "value"))
    val r = recs.limit(1).collect()(0)
    assert(r.getString(0).startsWith("dwd_"))
    assert(r.getString(1).startsWith("{\"event_id\":"))
  }

  test("a14 approx quantiles within tolerance of exact percentiles") {
    val approx = SparkEntry.queries("a14_approx_quantiles")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    val exact = events.groupBy("event_type")
      .agg(expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.95)").as("p95"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    exact.foreach { case (k, (e50, e95)) =>
      val (a50, a95) = approx(k)
      assert(math.abs(a50 - e50) / e50 < 0.05, s"$k p50 $a50 vs $e50")
      assert(math.abs(a95 - e95) / e95 < 0.05, s"$k p95 $a95 vs $e95")
    }
  }

  test("a10 approx distinct within 10% of exact; bound flag green") {
    // the raw HLL estimate (not exposed by the bound-gated query shape)
    val approx = events.groupBy("event_type")
      .agg(approx_count_distinct(col("user_id")).as("uu")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = events.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("uu")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, e) =>
      assert(math.abs(approx(k) - e).toDouble / e < 0.1,
        s"$k: approx=${approx(k)} exact=$e")
    }
    // and the shipped query agrees on the exact leg with flag = 1
    val q = SparkEntry.queries("a10_approx_distinct")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getInt(2)))
      .toMap
    exact.foreach { case (k, e) =>
      assert(q(k) == (e, 1), s"$k: ${q(k)} vs exact $e")
    }
  }

  test("e2 SQL kwsplit counts equal DSL per-doc-distinct keyword counts") {
    val viaSql = graft.sql.SqlJobs.keywordCounts(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaDsl = docs.select(col("doc_id"),
        explode(array_distinct(functions.Text.tokenizeUdf(col("text"))))
          .as("keyword"))
      .groupBy("keyword").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaSql == viaDsl)
  }

  test("s1 scan pushes filters and prunes columns") {
    val plan = Relational.scanPushdown(events)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["))
    assert(plan.contains("IsNotNull"))
  }

  test("f1 top-k plans TakeOrderedAndProject (no global sort)") {
    val plan = Relational.topPurchases(events, 100)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("bucketed interval join equals the direct range-condition join") {
    val ev = events
    val p = ev.where(col("event_type") === "purchase")
    val s = ev.where(col("event_type") === "signup")
    val direct = ops.Joins.purchasesWithRecentSignup(ev)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val bucketed = ops.Joins.bucketedIntervalJoin(p, s)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(direct.nonEmpty)
    assert(bucketed == direct)
  }

  test("bloom pre-filtered anti-join equals the plain anti-join") {
    val ev = events
    val dropKeys = ev.select(col("user_id")).distinct()
      .where(col("user_id") % 3 === 0)
    val exact = ev.join(dropKeys, Seq("user_id"), "left_anti")
      .select("event_id").collect().map(_.getLong(0)).toSet
    val bloomed = Sketches.bloomAntiJoin(ev, dropKeys, "user_id",
        expectedKeys = 10000L)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(bloomed == exact)
    assert(exact.nonEmpty && exact.size < ev.count())
  }

  test("count-min heavy hitters: estimates bound true counts from above, top key right") {
    val ev = events
    val exact = ev.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val got = Sketches.cmsTopKeys(ev, "event_type", 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got.foreach { case (k, est) =>
      assert(est >= exact(k), s"CMS must never undercount: $k")
      assert(est <= exact(k) + (0.001 * n).toLong + 1, s"overcount bound: $k")
    }
    assert(got.maxBy(_._2)._1 == exact.maxBy(_._2)._1)
  }

  test("cms candidate pass is bounded and retains heavy hitters at high cardinality") {
    import spark.implicits._
    // 60k unique tail keys + two planted heavy keys
    val tail = spark.range(60000).select(concat(lit("u"), col("id")).as("key"))
    val hot = spark.range(5000).select(lit("hot1").as("key"))
      .union(spark.range(3000).select(lit("hot2").as("key")))
    val df = tail.union(hot).repartition(8)
    val m = 64
    val cand = Sketches.mgCandidates(df, "key", m)
    val nParts = df.rdd.getNumPartitions
    // bounded: never the full 60k key universe
    assert(cand.count() <= nParts.toLong * m,
      s"candidates exceed partitions x m bound")
    val keys = cand.collect().map(_.getString(0)).toSet
    assert(keys.contains("hot1") && keys.contains("hot2"),
      "Misra-Gries must retain keys with freq > N/(m+1)")
    val top = Sketches.cmsTopKeys(df, "key", 2, m = m)
      .collect().map(_.getString(0)).toSeq
    assert(top == Seq("hot1", "hot2"))
  }

  test("cms1 verified heavy hitters equal the plain exact top-k on skewed keys") {
    import spark.implicits._
    // Zipf-ish: key i appears ~600/i times across 8 partitions
    val rows = (1 to 50).flatMap(i => Seq.fill(600 / i)(s"k$i"))
    val df = spark.sparkContext.parallelize(rows, 8).toDF("key")
    val got = Sketches.verifiedTopKeys(df, "key", 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val exact = df.groupBy("key").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("key")).limit(5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // exact counts AND exact ranking — the CMS prune and the bounded
    // candidate pass must be invisible in the result
    assert(got == exact)
  }

  test("kmv sketch: exact below k, unbiased-ish above k, bounded size") {
    import spark.implicits._
    val k = 64
    // estimator regime: events has ~150 distinct users per type at test SF
    val ev = events
    val est = Sketches.kmvEstimate(
        Sketches.kmvSketch(ev, Seq("event_type"), "user_id", k),
        Seq("event_type"), k)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val exact = ev.where(col("user_id").isNotNull)
      .groupBy("event_type").agg(countDistinct(col("user_id")).as("uu"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (t, uu) =>
      val rel = math.abs(est(t) - uu) / uu
      assert(rel < 0.4, s"$t: kmv=${est(t)} exact=$uu rel=$rel " +
        "(k=64 std err ~12.7%; 40% is a ~3-sigma gate)")
    }
    // exact regime: fewer than k distinct keys => the sketch IS the set
    val tiny = (1 to 100).map(i => ("a", (i % 10).toLong)).toDF("g", "uid")
    val tinyEst = Sketches.kmvEstimate(
        Sketches.kmvSketch(tiny, Seq("g"), "uid", k), Seq("g"), k)
      .collect().head.getDouble(2)
    assert(tinyEst == 10.0, s"below-k estimate must be the exact count")
    // sketch size bound
    val sk = Sketches.kmvSketch(ev, Seq("event_type"), "user_id", k)
    val perGroup = sk.groupBy("event_type").count()
      .collect().map(_.getLong(1))
    assert(perGroup.forall(_ <= k))
  }

  test("kmv merge of daily sketches equals the direct global sketch") {
    val k = 64
    val ev = events.withColumn("event_date", to_date(col("ts")))
    val daily = Sketches.kmvSketch(
      ev, Seq("event_date", "event_type"), "user_id", k)
    val merged = Sketches.kmvMerge(daily, Seq("event_type"), k)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val direct = Sketches.kmvSketch(ev, Seq("event_type"), "user_id", k)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // mergeability is EXACT: any global top-k hash is top-k within its day
    assert(merged == direct && merged.nonEmpty)
  }

  test("z-order: column formula matches the bit-loop reference") {
    import spark.implicits._
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L),
      (65535L, 65535L), (70000L, 123L), (123456789L, 987654321L)) ++
      (0 until 500).map(i => ((i * 2654435761L) % 100000,
        (i * 40503L + 7) % 100000))
    val got = cases.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zValue(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    cases.foreach { case (x, y) =>
      assert(got((x, y)) == Layout.zValueRef(x & 65535L, y & 65535L),
        s"z($x, $y)")
    }
  }

  test("z-order layout: rectangles tight in BOTH dims, x-sort in one") {
    import spark.implicits._
    // deterministic pseudo-uniform 16-bit pairs
    val rows = (0 until 20000).map { i =>
      ((i * 2654435761L) % 65536, (i * 40503L + 12345) % 65536)
    }.toDF("x", "y")
    def meanExtents(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val parts = df.withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg((max(col("x")) - min(col("x"))).as("ex"),
          (max(col("y")) - min(col("y"))).as("ey"))
        .collect()
      (parts.map(_.getAs[Long]("ex")).sum.toDouble / parts.length / 65536.0,
        parts.map(_.getAs[Long]("ey")).sum.toDouble / parts.length / 65536.0)
    }
    val (zx, zy) = meanExtents(
      Layout.zOrderRepartition(rows, col("x"), col("y"), 64))
    val (_, sy) = meanExtents(rows.repartitionByRange(64, col("x")))
    // single-column range sort: every partition spans ~the full y range —
    // a y predicate prunes nothing
    assert(sy > 0.9, s"x-sorted mean y-extent $sy")
    // z-order: every partition is a small rectangle (ideal 1/8 = 0.125
    // per dim at 64 partitions) — predicates on EITHER column prune
    assert(zx < 0.3 && zy < 0.3, s"z-order extents ($zx, $zy)")
  }

  test("sampled quantiles: exact below k, DKW-bounded above k") {
    import spark.implicits._
    val qs = Seq(0.5, 0.9, 0.99)
    // exact regime: group smaller than k => sample is the group and the
    // nearest-rank quantile is the true nearest-rank quantile
    val tiny = (1 to 100).map(i => ("a", i.toLong, i.toDouble))
      .toDF("g", "id", "v")
    val tinyEst = Sketches.sampledQuantiles(tiny, Seq("g"), "v", "id",
        256, qs)
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    assert(tinyEst == Map(0.5 -> 50.0, 0.9 -> 90.0, 0.99 -> 99.0))
    // estimator regime on real data: the sampled quantile's true CDF
    // position must sit within the 3-sigma DKW band sqrt(q(1-q)/k)
    val k = 256
    val ev = events.where(col("value").isNotNull)
    val est = Sketches.sampledQuantiles(ev, Seq("event_type"), "value",
        "event_id", k, qs)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2))
      .toMap
    val totals = ev.groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    est.foreach { case ((t, q), v) =>
      val below = ev.where(col("event_type") === t && col("value") <= v)
        .count().toDouble / totals(t)
      val tol = 3 * math.sqrt(q * (1 - q) / k) + 1.0 / k
      assert(math.abs(below - q) <= tol,
        s"$t q=$q est=$v cdf=$below tol=$tol")
    }
  }

  test("a25 rollup equals a24 direct: the k-min merge law end to end") {
    val direct = SparkEntry.queries("a24_sampled_quantiles")(spark, sf)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      .toSet
    val rolled = SparkEntry.queries("a25_quantile_rollup")(spark, sf)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      .toSet
    assert(direct == rolled && direct.nonEmpty)
  }

  test("bottom-k sample merges exactly across a day split") {
    val k = 64
    val ev = events.withColumn("event_date", to_date(col("ts")))
    // bottom-k of the union of daily bottom-k sets == direct bottom-k:
    // the same k-min mergeability the KMV sketch relies on
    val daily = Sketches.bottomKSample(ev, Seq("event_date", "event_type"),
      "event_id", k)
    val remerged = Sketches.bottomKSample(daily, Seq("event_type"),
        "event_id", k)
      .select("event_type", "event_id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val direct = Sketches.bottomKSample(ev, Seq("event_type"), "event_id", k)
      .select("event_type", "event_id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(remerged == direct && direct.nonEmpty)
  }

  test("smp4 stratified sample honors per-stratum fractions and stays composable") {
    val docs = Tables.load(spark, sf, "documents")
    val frs = Map("en" -> 0.8, "zh" -> 0.2)
    val got = Sampling.stratifiedSample(docs, "doc_id", "lang", frs, 0.5)
    val perLang = got.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    totals.foreach { case (lang, tot) =>
      val want = frs.getOrElse(lang, 0.5)
      val fracGot = perLang.getOrElse(lang, 0L).toDouble / tot
      assert(math.abs(fracGot - want) < 0.15,
        s"$lang: got $fracGot want ~$want")
    }
    // per-stratum selection is the SAME hash order as the flat sample:
    // the 0.2-stratum rows are exactly the flat 0.2 sample of that stratum
    val zhGot = got.where(col("lang") === "zh").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val zhFlat = Sampling.deterministicSample(
        docs.where(col("lang") === "zh"), "doc_id", 0.2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(zhGot == zhFlat)
  }

  test("smp5 token budget: cut is tight, deterministic, and hash-ordered") {
    val docs = Tables.load(spark, sf, "documents")
    val budget = 15000L
    val got = Sampling.tokenBudgetSample(docs, budget).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val kept = got.values.map(_.toLong).sum
    assert(kept <= budget, s"kept $kept tokens > budget")
    // tight: no excluded doc could still have fit at the cut point (the
    // cut is a prefix of the hash order, so the NEXT doc in that order
    // must overflow the budget)
    val all = docs.selectExpr("doc_id",
        "size(split(text, '\\\\s+')) as n_tok",
        "substring(md5(cast(cast(doc_id as string) as binary)), 1, 8) as h")
      .collect().map(r => (r.getString(2), r.getLong(0), r.getInt(1)))
      .sortBy(t => (t._1, t._2))
    val firstExcluded = all.find { case (_, id, _) => !got.contains(id) }
    firstExcluded.foreach { case (_, _, n) =>
      assert(kept + n > budget, "cut left room for the next doc in order")
    }
    // reproducible
    val again = Sampling.tokenBudgetSample(docs, budget).collect()
      .map(_.getLong(0)).toSet
    assert(again == got.keySet)
  }

  test("sel5 quality budget: kept set is the exact quality-order " +
      "prefix, cut is sharp, two-phase cumsum == the naive one") {
    import graft.ops.TextAnalysis
    val docs = Tables.load(spark, sf, "documents")
    val budget = 12000L
    val got = Sampling.qualityBudgetSelection(docs, budget).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2),
        r.getLong(3)))
    assert(got.nonEmpty && got.map(_._3).sum <= budget)
    // naive oracle: driver-side cumsum over the SAME q1 scores in
    // (score desc, doc_id) order — the two-phase banded prefix sum
    // must reproduce every running total, and the kept set must be the
    // maximal prefix (sharp cut: the next doc overflows)
    val all = TextAnalysis.modelQualityScore(docs)
      .select("doc_id", "score", "n_toks").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      .sortBy { case (id, sc, _) => (-sc, id) }
    val cums = all.scanLeft(0L)(_ + _._3).tail
    val naive = all.zip(cums).takeWhile(_._2 <= budget)
      .map { case ((id, sc, n), c) => (id, sc, n, c) }
    assert(got.sortBy(t => (-t._2, t._1)).toSeq == naive.toSeq,
      "two-phase selection must equal the naive quality-order prefix")
    if (naive.length < all.length)
      assert(cums(naive.length) > budget, "cut must be sharp")
    // degenerate budgets: 0 keeps nothing, total keeps everything
    assert(Sampling.qualityBudgetSelection(docs, 0L).count() == 0L)
    assert(Sampling.qualityBudgetSelection(docs, cums.last).count()
      == all.length.toLong)
    // band-count invariance: band boundaries coarsen the (score desc,
    // doc_id) order, so ANY nBands yields the identical selection —
    // the knob only sizes partitions (the curriculumOrder posture)
    val fine = Sampling.qualityBudgetSelection(docs, budget, nBands = 100)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    assert(fine == got.map(t => (t._1, t._4)).toSet,
      "nBands must not change the selection or its running sums")
  }

  test("smp6 weighted mix: per-stratum mix factors, deterministic replicas") {
    val docs = Tables.load(spark, sf, "documents")
    val got = Sampling.mixWithWeights(docs, "doc_id", "lang",
      Map("en" -> 1.5, "zh" -> 0.25), 1.0)
    val rows = got.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    totals.foreach { case (lang, tot) =>
      val w = Map("en" -> 1.5, "zh" -> 0.25).getOrElse(lang, 1.0)
      val factor = rows.getOrElse(lang, 0L).toDouble / tot
      assert(math.abs(factor - w) < 0.2, s"$lang: factor $factor want ~$w")
    }
    // whole weights replicate exactly: every kept en doc has replica 1,
    // and replica 2 appears iff the doc is in the fractional hash sample
    val en2 = got.where(col("lang") === "en" && col("replica") === 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val enHalf = Sampling.deterministicSample(
        docs.where(col("lang") === "en"), "doc_id", 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(en2 == enHalf)
    // default stratum passes through exactly once
    val frCount = got.where(col("lang") === "fr").count()
    assert(frCount == totals("fr"))
  }

  test("t11 passage chunks: full token coverage, stride overlap, short tail only") {
    val docs = Tables.load(spark, sf, "documents")
    val lens = docs.selectExpr("doc_id", "size(split(text, '\\\\s+')) as n")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val chunks = TextAnalysis.passageChunks(docs, 64, 48)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .groupBy(_._1)
    assert(chunks.keySet == lens.keySet)
    chunks.foreach { case (doc, cs) =>
      val sorted = cs.sortBy(_._2)
      // starts are exactly 0, 48, 96, ...
      assert(sorted.map(_._2).toSeq == sorted.indices.map(_.toLong))
      // every token covered: last chunk ends at the doc's token count
      val last = sorted.last
      assert(last._2 * 48 + last._3 == lens(doc),
        s"doc $doc tail not covered")
      // only the last chunk may be shorter than chunkTokens
      assert(sorted.dropRight(1).forall(_._3 == 64), s"doc $doc short mid-chunk")
    }
  }

  test("t16 blocklist filter: hand-computed hits, integer keep threshold") {
    import spark.implicits._
    val fix = Seq(
      // 2 hits in 20 words: 2*20 > 20 -> drop
      (1L, (Seq.fill(18)("ok") ++ Seq("bad", "worse")).mkString(" ")),
      // 1 hit in 20 words: exactly at the 5% cap -> keep
      (2L, (Seq.fill(19)("ok") :+ "bad").mkString(" ")),
      (3L, "totally clean words here"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.blocklistFilter(fix, Seq("bad", "worse"), 20)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out(1L) == ((20L, 2L, false)))
    assert(out(2L) == ((20L, 1L, true)))
    assert(out(3L) == ((4L, 0L, true)))
    intercept[IllegalArgumentException] {
      TextAnalysis.blocklistFilter(fix, Nil, 20)
    }
  }

  test("smp5 token budget monotonicity: a larger budget keeps a superset") {
    val docs = Tables.load(spark, sf, "documents")
    val small = Sampling.tokenBudgetSample(docs, 8000L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val large = Sampling.tokenBudgetSample(docs, 16000L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(large) && small.size < large.size,
      s"prefix property violated: ${small.size} vs ${large.size}")
  }

  test("smp4 stratified sample composes with a flat sub-sample") {
    val docs = Tables.load(spark, sf, "documents")
    val strat = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 0.8), 0.5)
    // a flat 0.25 sample of the stratified sample equals stratifying the
    // flat 0.25 sample: selection depends only on the content hash
    val a = Sampling.deterministicSample(strat, "doc_id", 0.25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.stratifiedSample(
        Sampling.deterministicSample(docs, "doc_id", 0.25),
        "doc_id", "lang", Map("en" -> 0.8), 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b && a.nonEmpty)
  }

  test("BPE training: hand-computed merges, encode round-trip, determinism") {
    // words: abab x3, ab x2 -> pair (a,b) count 8 beats (b,a) count 3;
    // after merging, (ab,ab) count 3 is the only pair left
    val merges = Bpe.trainMerges(Array("abab" -> 3L, "ab" -> 2L), 5)
    assert(merges == Seq(("a", "b"), ("ab", "ab")))
    val rank = merges.zipWithIndex.toMap
    assert(Bpe.encodeWord("ababab", rank).toSeq == Seq("abab", "ab"))
    assert(Bpe.encodeWord("ba", rank).toSeq == Seq("b", "a"))
    // encoding always reconstructs the word
    Seq("abab", "ab", "aabb", "xyz").foreach { w =>
      assert(Bpe.encodeWord(w, rank).mkString == w)
    }
    // corpus training is deterministic and the encoder compresses
    val docs = Tables.load(spark, sf, "documents")
    val m1 = Bpe.train(docs, 50, 2L)
    val m2 = Bpe.train(docs, 50, 2L)
    assert(m1 == m2 && m1.size == 50)
    val stats = Bpe.subwordStats(docs, 50, 2L).collect()
    assert(stats.nonEmpty)
    stats.foreach { r =>
      assert(r.getInt(1) > 0 && r.getInt(1) <= r.getInt(2),
        s"doc ${r.getLong(0)}: subtokens must be in (0, n_chars]")
    }
  }

  test("BPE fixed-merge encode: rank precedence and chained merges (the t18 table)") {
    // the t18 fixed table: chained (o,r)->(or,t) in `sort`; rank
    // precedence merges (e,r) before (s,t) in `customer` despite position
    val fixed = Seq("a" -> "t", "t" -> "h", "th" -> "e", "a" -> "n",
      "o" -> "r", "e" -> "r", "or" -> "t", "s" -> "t", "q" -> "u",
      "e" -> "y")
    val rank = fixed.zipWithIndex.toMap
    assert(Bpe.encodeWord("sort", rank).toSeq == Seq("s", "ort"))
    assert(Bpe.encodeWord("the", rank).toSeq == Seq("the"))
    assert(Bpe.encodeWord("customer", rank).toSeq ==
      Seq("c", "u", "st", "o", "m", "er"))
    assert(Bpe.encodeWord("query", rank).toSeq == Seq("qu", "er", "y"))
    assert(Bpe.encodeWord("key", rank).toSeq == Seq("k", "ey"))
    assert(Bpe.encodeWord("data", rank).toSeq == Seq("d", "at", "a"))
  }

  test("round-8 ops degrade cleanly on empty and degenerate inputs") {
    import spark.implicits._
    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Sampling.lengthBuckets(noDocs, 64, 16).count() == 0)
    val noRows = Seq.empty[(String, Long, Double)].toDF("g", "id", "v")
    assert(Sketches.sampledQuantiles(noRows, Seq("g"), "v", "id", 8,
      Seq(0.5)).count() == 0)
    // single-row group: every quantile is that row's value
    val one = Seq(("a", 1L, 42.0)).toDF("g", "id", "v")
    val oneQ = Sketches.sampledQuantiles(one, Seq("g"), "v", "id", 8,
      Seq(0.01, 0.5, 0.99)).collect()
    assert(oneQ.length == 3 && oneQ.forall(_.getDouble(2) == 42.0))
    // all-null keys: zOrderStats emits nothing rather than a null bucket
    val nulls = Seq((Option.empty[Long], Option.empty[Long]),
      (Some(3L), None), (None, Some(5L))).toDF("x", "y")
    assert(ops.Layout.zOrderStats(nulls, col("x"), col("y"), 4, 8)
      .count() == 0)
    // self-loops and an empty edge frame: no triangles, no crash
    val loops = Seq((1L, 1L), (2L, 2L)).toDF("src", "dst")
    assert(Graph.triangleStats(loops).count() == 0)
    assert(Graph.triangleStats(
      Seq.empty[(Long, Long)].toDF("src", "dst")).count() == 0)
    // one-sided snapshots: everything added / everything removed
    val some = Seq((1L, "a b c")).toDF("doc_id", "text")
    assert(Corpus.snapshotDiff(noDocs, some).collect()
      .map(_.getString(1)).toSeq == Seq("added"))
    assert(Corpus.snapshotDiff(some, noDocs).collect()
      .map(_.getString(1)).toSeq == Seq("removed"))
    // fertility over only zero-word docs: empty report, no divide-by-zero
    val punct = Seq((1L, "??? !!!", "xx")).toDF("doc_id", "text", "lang")
    assert(TextAnalysis.tokenizerFertility(punct, Seq("a" -> "b"))
      .count() == 0)
  }

  test("e7 bucketed corpus: manifests exactly the curated keep-set") {
    val docs = Tables.load(spark, sf, "documents")
    val kept = Pipeline.curatedCorpus(docs).select("doc_id")
    val manifest = SparkEntry.queries("e7_bucketed_corpus")(spark, sf)
      .collect()
    // every kept doc lands in exactly one batch; nothing else does
    assert(manifest.map(_.getLong(2)).sum == kept.count())
    assert(manifest.forall(_.getLong(2) <= 16L))
  }

  test("dd1 snapshot diff: statuses, normalization-insensitive change") {
    import spark.implicits._
    val prev = Seq((1L, "gone"), (2L, "Same, text!"), (3L, "x y"))
      .toDF("doc_id", "text")
    val next = Seq((2L, "same text"), (3L, "x z"), (4L, "fresh"))
      .toDF("doc_id", "text")
    val got = Corpus.snapshotDiff(prev, next).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // 2: case/punct churn only -> unchanged under the d1 fingerprint
    assert(got == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
    // corpus slices: every status present, counts conserve both versions
    val docs = Tables.load(spark, sf, "documents")
    val h = Sampling.contentHash("doc_id")
    val prev2 = docs.where(h < lit("e6666666"))
    val next2 = docs.where(h >= lit("19999999"))
      .withColumn("text", when(h >= lit("66666666") && h < lit("80000000"),
        concat(col("text"), lit(" rev2"))).otherwise(col("text")))
    val diff = Corpus.snapshotDiff(prev2, next2)
    val byStatus = diff.groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStatus.keySet ==
      Set("added", "removed", "changed", "unchanged"))
    assert(byStatus.values.sum ==
      prev2.select("doc_id").union(next2.select("doc_id"))
        .distinct().count())
    assert(byStatus("removed") + byStatus("changed") +
      byStatus("unchanged") == prev2.count())
    assert(byStatus("added") + byStatus("changed") +
      byStatus("unchanged") == next2.count())
  }

  test("t19 tokenizer fertility: hand-computed per-language ratios") {
    import spark.implicits._
    val docs = Seq(
      (1L, "ab ab cd", "aa"), // enc: ab=1 tok, ab=1, cd=2 -> 4 sub, 3 w, 6 ch
      (2L, "ab", "bb"), // 1 sub, 1 w, 2 ch
      (3L, "??? !!!", "aa")) // zero words -> excluded
      .toDF("doc_id", "text", "lang")
    val got = TextAnalysis.tokenizerFertility(docs, Seq("a" -> "b"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got == Map(
      "aa" -> ((1L, 1.333333, 1.5)), // fertility 4/3 @6dp, chars/tok 6/4
      "bb" -> ((1L, 1.0, 2.0))))
    // fertility >= 1 everywhere on the corpus (a word is >= 1 subtoken)
    // and every language group is present
    val corpus = Tables.load(spark, sf, "documents")
    val fixed = Seq("a" -> "t", "t" -> "h", "th" -> "e", "a" -> "n",
      "o" -> "r", "e" -> "r", "or" -> "t", "s" -> "t", "q" -> "u",
      "e" -> "y")
    val full = TextAnalysis.tokenizerFertility(corpus, fixed).collect()
    assert(full.length ==
      corpus.select("lang").distinct().count().toInt)
    full.foreach(r => assert(r.getDouble(2) >= 1.0 && r.getDouble(3) > 0))
  }

  test("BPE train: vocabulary above maxVocab degrades to the frequency head") {
    import spark.implicits._
    // 6 distinct words; cap at 3 -> training sees only the 3 most
    // frequent (aaaa x5, bbbb x4, cccc x3); merges must never touch the
    // dropped tail's characters (x/y/z)
    val docs = Seq(
      (1L, "aaaa aaaa aaaa aaaa aaaa bbbb bbbb bbbb bbbb"),
      (2L, "cccc cccc cccc xx yy zz"))
      .toDF("doc_id", "text")
    val capped = Bpe.train(docs, 10, 1L, maxVocab = 3)
    assert(capped.nonEmpty)
    val syms = capped.flatMap(p => Seq(p._1, p._2)).mkString
    assert(!syms.exists(c => c == 'x' || c == 'y' || c == 'z'),
      s"tail words leaked into capped training: $capped")
    // and the cap is a no-op when the vocabulary fits
    val full = Bpe.train(docs, 10, 1L)
    val fullCapped = Bpe.train(docs, 10, 1L, maxVocab = 6)
    assert(full == fullCapped)
  }

  test("smp deterministic sampling: reproducible, composable, ~uniform") {
    val docs = Tables.load(spark, sf, "documents")
    val total = docs.count().toDouble
    val s25 = Sampling.deterministicSample(docs, "doc_id", 0.25)
    // reproducible: same rows every run
    assert(s25.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Sampling.deterministicSample(docs, "doc_id", 0.25)
        .select("doc_id").collect().map(_.getLong(0)).toSet)
    // ~uniform fraction (binomial tolerance)
    val frac = s25.count() / total
    assert(frac > 0.15 && frac < 0.35, s"25% sample returned $frac")
    // composable: a 0.10 sample is a strict subset of the 0.25 sample
    val s10 = Sampling.deterministicSample(docs, "doc_id", 0.10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s25ids = s25.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s10.subsetOf(s25ids))
  }

  test("smp train/val/test split is disjoint and exhaustive") {
    val docs = Tables.load(spark, sf, "documents")
    val split = Sampling.trainValTestSplit(docs, "doc_id")
    assert(split.count() == docs.count())
    val byS = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byS.keySet == Set("train", "val", "test"))
    assert(byS.values.sum == docs.count())
    assert(byS("train") > byS("val") && byS("train") > byS("test"))
  }

  test("pack1 packed sequences: hand-computed manifest") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c"), // 3 tokens, stream [0,3)
      (2L, "d e f g h"), // 5 tokens, [3,8)
      (3L, "i j k l")) // 4 tokens, [8,12)
      .toDF("doc_id", "text")
    val got = Sampling.packedSequences(docs, 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == Set(
      (0L, 2L, 1L, 2L, 4L), // seq0: all of doc1 + 1 slot of doc2
      (1L, 1L, 2L, 2L, 4L), // seq1: doc2 alone
      (2L, 1L, 3L, 3L, 4L))) // seq2: doc3 fills it exactly
    // a doc longer than a whole sequence spans several manifest rows
    val long = Seq((7L, (1 to 10).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val spans = Sampling.packedSequences(long, 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSet
    assert(spans == Set((0L, 1L, 4L), (1L, 1L, 4L), (2L, 1L, 2L)))
  }

  test("pack1 packed sequences: slots full, token stream conserved") {
    val docs = Tables.load(spark, sf, "documents")
    val seqs = Sampling.packedSequences(docs, 2048).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    val total = docs
      .select(sum(size(split(col("text"), "\\s+"))).cast("long"))
      .head.getLong(0)
    assert(seqs.values.sum == total) // no token lost or double-counted
    val tail = seqs.keys.max
    seqs.foreach { case (sid, n) =>
      if (sid != tail) assert(n == 2048L) else assert(n <= 2048L)
    }
  }

  test("pack2 length buckets: conservation, batch caps, window parity") {
    val docs = Tables.load(spark, sf, "documents")
    val got = Sampling.lengthBuckets(docs, 64, 16)
    val rows = got.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    // token + doc conservation: every doc lands in exactly one batch
    assert(rows.map(_._3).sum == docs.count())
    val totalTok = docs
      .select(sum(size(split(col("text"), "\\s+"))).cast("long"))
      .head.getLong(0)
    assert(rows.map(_._5).sum == totalTok)
    // batch caps and padding law: n_docs <= batchSize, pad_waste is the
    // exact pad-to-max slot count, max_tok sits inside its bucket's range
    rows.foreach { case (bkt, _, nd, mx, sm, pad) =>
      assert(nd <= 16L && pad == nd * mx - sm && pad >= 0L)
      assert(mx >= bkt * 64 + 1 && mx <= (bkt + 1) * 64)
    }
    // all batches but the per-bucket last are full
    rows.groupBy(_._1).foreach { case (_, bs) =>
      val lastBatch = bs.map(_._2).max
      bs.foreach { case (_, bid, nd, _, _, _) =>
        if (bid != lastBatch) assert(nd == 16L)
      }
    }
    // the two-phase (cell + broadcast offset) rank must equal the plain
    // per-bucket window the oracle uses
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket"))
      .orderBy(Sampling.contentHash("doc_id"), col("doc_id"))
    val ref = docs
      .select(col("doc_id"),
        size(split(col("text"), "\\s+")).cast("long").as("n_tok"))
      .withColumn("bucket", floor((col("n_tok") - 1) / 64))
      .withColumn("batch_id",
        floor((row_number().over(w) - 1) / 16))
      .groupBy(col("bucket"), col("batch_id"))
      .agg(count(lit(1)).as("n_docs"), max(col("n_tok")).as("max_tok"),
        sum(col("n_tok")).as("sum_tok"))
      .withColumn("pad_waste",
        col("n_docs") * col("max_tok") - col("sum_tok"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(rows.toSet == ref)
  }

  test("smp8/cur1 per-group cap: exact size, order, rank semantics") {
    import spark.implicits._
    val rows = Seq(
      (1L, "a", 30L), (2L, "a", 50L), (3L, "a", 50L), (4L, "a", 10L),
      (5L, "b", 99L)) // group below the cap survives whole
      .toDF("doc_id", "source", "n_chars")
    val got = Sampling.perGroupCap(rows, "source",
      Seq(col("n_chars").desc, col("doc_id")), 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(3)))
      .toSet
    // group a: 50s first, doc_id breaks the tie; 30 and 10 are cut
    assert(got == Set((2L, "a", 1), (3L, "a", 2), (5L, "b", 1)))
    // hash-ordered contract: exactly min(cap, group size) per group and
    // stable across runs
    val docs = Tables.load(spark, sf, "documents")
    val capped = Sampling.perGroupCap(docs, "lang",
      Seq(Sampling.contentHash("doc_id"), col("doc_id")), 50)
    val sizes = capped.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    full.foreach { case (l, n) => assert(sizes(l) == math.min(50L, n)) }
    assert(capped.collect().map(_.getLong(0)).sorted.toSeq ==
      Sampling.perGroupCap(docs, "lang",
        Seq(Sampling.contentHash("doc_id"), col("doc_id")), 50)
        .collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("smp9 shuffle positions: a permutation matching the window form") {
    val docs = Tables.load(spark, sf, "documents")
    val pos = Sampling.shufflePositions(docs, "doc_id")
    val got = pos.collect().map(r => r.getLong(0) -> r.getLong(1))
    // 0..n-1, each exactly once
    assert(got.map(_._2).sorted.toSeq == (0L until got.length).toSeq)
    // equals the single-window formulation (the oracle's shape)
    val w = org.apache.spark.sql.expressions.Window.orderBy(
      Sampling.contentHash("doc_id"), col("doc_id"))
    val ref = docs
      .select(col("doc_id"),
        (row_number().over(w) - 1).cast("long").as("position"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach { case (id, p) => assert(ref(id) == p) }
  }

  test("es1 weighted sample: deterministic, weight-proportional, " +
    "zero-weight excluded") {
    import spark.implicits._
    val rows = (1L to 200L).map(i =>
      (i, if (i <= 100) 10000L else 1L)).toDF("doc_id", "w")
    val s1 = Sampling.weightedSample(rows, "doc_id", "w", 50)
      .collect().map(_.getLong(0)).toSet
    val s2 = Sampling.weightedSample(rows, "doc_id", "w", 50)
      .collect().map(_.getLong(0)).toSet
    assert(s1 == s2 && s1.size == 50) // reproducible, exact size
    // 10000x weight dominates: essentially the whole sample is heavy
    assert(s1.count(_ <= 100L) >= 45)
    // zero and negative weights can never be drawn
    val z = (1L to 5L).map(i => (i, if (i <= 3) 0L else 7L))
      .toDF("doc_id", "w")
    val zs = Sampling.weightedSample(z, "doc_id", "w", 5)
      .collect().map(_.getLong(0)).toSet
    assert(zs == Set(4L, 5L))
    // keys beyond 2^31 (a 100 TB id space) must not overflow the Knuth
    // multiply or produce NaN keys that a desc sort would always select
    val big = Seq((5000000000L, 5L), (4999999999L, 5L), (7L, 5L))
      .toDF("doc_id", "w")
    val b1 = Sampling.weightedSample(big, "doc_id", "w", 2)
      .collect().map(_.getLong(0)).toSet
    val b2 = Sampling.weightedSample(big, "doc_id", "w", 2)
      .collect().map(_.getLong(0)).toSet
    assert(b1.size == 2 && b1 == b2)
  }

  test("e6 packed corpus: conservation and full-slot laws over the " +
    "e5 keep-set") {
    val kept = Pipeline.curatedCorpus(docs).select("doc_id")
    val keptTokens = docs.join(kept, "doc_id")
      .select(sum(size(split(col("text"), "\\s+"))).cast("long"))
      .head.getLong(0)
    val seqs = SparkEntry.queries("e6_packed_corpus")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(seqs.values.sum == keptTokens,
      "every kept token lands in exactly one sequence")
    val tail = seqs.keys.max
    seqs.foreach { case (sid, n) =>
      if (sid != tail) assert(n == 2048L) else assert(n <= 2048L)
    }
  }

  test("out1 centroid outliers: hand-computed cosines, outlier ordering") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Array(1f, 0f), 0), (1L, Array(0f, 1f), 0), // centroid (.5,.5)
      (2L, Array(1f, 0f), 1), (3L, Array(1f, 0f), 1), // centroid (1,0)
      (4L, Array(1f, 0f), 2), (5L, Array(0.9f, 0.1f), 2),
      (6L, Array(0f, 1f), 2)) // the planted outlier of label 2
      .toDF("vec_id", "embedding", "label")
    val got = Clustering.centroidOutliers(vecs).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // label 0: cos(v, (.5,.5)) = 1/sqrt(2) for both members
    assert(got(0L) == 0.707107 && got(1L) == 0.707107)
    // label 1: both vectors ARE the centroid
    assert(got(2L) == 1.0 && got(3L) == 1.0)
    // label 2: the orthogonal member scores far below the aligned ones
    assert(got(6L) < got(5L) && got(6L) < got(4L))
    assert(got(4L) > 0.8 && got(6L) < 0.6)
  }

  test("cur2 best-of-cluster: argmax keeper laws vs the component ops") {
    val clusters = Dedup.dupClusters(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val scores = TextAnalysis.modelQualityScore(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val got = Dedup.bestOfCluster(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // one row per cluster; members account for the whole corpus
    assert(got.map(_._1).distinct.length == got.length)
    assert(got.map(_._1).toSet == clusters.map(_._2).toSet)
    assert(got.map(_._3).sum == docs.count())
    val byCluster = clusters.groupBy(_._2)
    got.foreach { case (cid, keeper, nm, best) =>
      val members = byCluster(cid).map(_._1)
      assert(members.contains(keeper), s"keeper $keeper not in $cid")
      assert(nm == members.length.toLong)
      // the keeper's score is the cluster max, ties to the smaller id
      val maxScore = members.map(scores).max
      assert(best == maxScore)
      assert(keeper == members.filter(m => scores(m) == maxScore).min)
    }
  }

  test("xsrc1 source overlap: planted shared shingle, df-independent") {
    import spark.implicits._
    val docs = (Seq(
      (1L, "one two three four", "A"),
      (2L, "one two three zzz", "B"),
      (3L, "qq ww ee", "C")) ++
      // df inflation attempt: many more A-docs with the shared shingle
      (10L to 14L).map(i => (i, "one two three four", "A")))
      .toDF("doc_id", "text", "source")
    val got = Dedup.sourceOverlap(docs, 3).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // A and B share exactly ONE distinct shingle ("one two three") no
    // matter how many A-docs carry it; C shares nothing
    assert(got == Map(("A", "B") -> 1L))
  }

  test("mix2 temperature mix: alpha=1 is uniform, alpha<1 upweights " +
    "small sources") {
    import spark.implicits._
    // alpha = 1 degenerates to plain uniform sampling at targetFrac:
    // same rate for every source == deterministicSample's threshold
    val corpus = Tables.load(spark, sf, "documents")
    val viaMix = Sampling.temperatureMix(corpus, "doc_id", "source",
      1.0, 0.25).select("doc_id").collect().map(_.getLong(0)).toSet
    val viaUniform = Sampling.deterministicSample(corpus, "doc_id", 0.25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaMix == viaUniform && viaMix.nonEmpty)
    // skewed corpus: 1000 big-source docs vs 10 small-source docs;
    // alpha=0.5 drives the small source's rate to the cap (all kept)
    // while the big source samples well below it
    val skew = ((1L to 1000L).map(i => (i, "big")) ++
      (2001L to 2010L).map(i => (i, "small")))
      .toDF("doc_id", "source")
    val got = Sampling.temperatureMix(skew, "doc_id", "source", 0.5, 0.3)
      .select("doc_id", "source")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val nSmall = got.count(_._2 == "small")
    val nBig = got.count(_._2 == "big")
    assert(nSmall == 10, s"small source must be fully kept, got $nSmall")
    // expected ~275 of 1000; generous band for hash variance
    assert(nBig > 180 && nBig < 380, s"big-source sample out of band: $nBig")
    // reproducible
    val again = Sampling.temperatureMix(skew, "doc_id", "source", 0.5, 0.3)
      .select("doc_id", "source")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(got.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("nov1 ngram novelty: planted duplicate and unique eval docs") {
    import spark.implicits._
    def hp(id: Long): String = java.security.MessageDigest
      .getInstance("MD5").digest(id.toString.getBytes("UTF-8"))
      .take(4).map(b => f"${b & 0xff}%02x").mkString
    val ids = (1L to 60L).toSeq
    val evalIds = ids.filter(hp(_) >= "cccccccc") // the 20% held-out slice
    val refIds = ids.filter(hp(_) < "cccccccc")
    assert(evalIds.size >= 2 && refIds.nonEmpty) // fixture sanity
    val uniq = evalIds.head
    val shared = "alpha beta gamma delta epsilon zeta"
    val docs = ids.map(i =>
      (i, if (i == uniq) "qqq www eee rrr ttt yyy" else shared))
      .toDF("doc_id", "text")
    val got = Dedup.ngramNovelty(docs, 0.8, 3).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // only held-out docs are scored
    assert(got.keySet == evalIds.toSet)
    // duplicated eval text: every shingle seen in the reference slice
    evalIds.filterNot(_ == uniq).foreach { i =>
      val (n, seen, nov) = got(i)
      assert(n == seen && nov == 0.0)
    }
    // unique eval text: nothing seen, fully novel
    val (nU, seenU, novU) = got(uniq)
    assert(nU > 0 && seenU == 0L && novU == 1.0)
    // with an empty reference slice everything is novel
    val none = Dedup.ngramNovelty(docs, 0.0, 3).collect()
    assert(none.length == ids.size && none.forall(_.getDouble(3) == 1.0))
  }

  test("smp token offsets form a contiguous stream in doc order") {
    val docs = Tables.load(spark, sf, "documents")
    val rows = Sampling.tokenOffsets(docs, 4096)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.length == docs.count())
    assert(rows.head._3 == 0L)
    rows.sliding(2).foreach {
      case Array((_, n1, o1), (_, _, o2)) => assert(o2 == o1 + n1)
      case _ =>
    }
  }

  test("bench gate baselines parse earliest-wins and cover every query") {
    val f = java.nio.file.Files.createTempFile("graft_baseline", ".md")
    java.nio.file.Files.writeString(f,
      """# prose header the parser must skip
        |{"metric":"total","value":1,"queries":{"q_a":1.5,"q_b":0.4}}
        |interleaved prose, not a baseline line
        |{"metric":"total","value":2,"queries":{"q_a":9.9,"q_c":2.0}}
        |""".stripMargin)
    // q_a keeps its FIRST recorded gate (the benchgate.py rule — the
    // in-process retry pass must adjudicate against the same numbers)
    assert(Bench.readBaselines(f.toString)
      == Map("q_a" -> 1.5, "q_b" -> 0.4, "q_c" -> 2.0))
    // the standing invariant behind `benchgate.py --list-ungated`: the
    // real file gates EVERY declared query, so a new query without a
    // seeded baseline fails here before the round-close script does
    val real = Bench.readBaselines("BASELINE.md")
    val missing = SparkEntry.queries.keySet -- real.keySet
    assert(missing.isEmpty, s"queries without a bench baseline: $missing")
  }

  test("hammingBandLayout resolves the pigeonhole for every family") {
    // the one shared layout rule (d4/d19/d21/d23/d24): widths tile the
    // low `bits` exactly, offsets are the prefix sums, and the tightest
    // layout is maxHamming+1 bands — so banded == brute holds for any
    // budget a call site asks for, not just the pinned defaults
    for (bits <- Seq(31, 56, 60, 64); mh <- 0 until math.min(bits, 9)) {
      val (w, o) = Dedup.hammingBandLayout(bits, mh)
      assert(w.length == mh + 1, s"bits=$bits mh=$mh")
      assert(w.sum == bits, s"widths must tile bits=$bits mh=$mh")
      assert(w.forall(x => x == bits / (mh + 1) || x == bits / (mh + 1) + 1))
      assert(o.toSeq == w.scanLeft(0)(_ + _).take(w.length).toSeq)
    }
    // the pinned production layouts, byte for byte: a future change to
    // the resolver cannot silently move the oracle-gated families
    assert(Dedup.hammingBandLayout(64, 3)._1.toSeq == Seq(16, 16, 16, 16))
    assert(Dedup.hammingBandLayout(60, 3)._1.toSeq == Seq(15, 15, 15, 15))
    assert(Dedup.hammingBandLayout(56, 3)._1.toSeq == Seq(14, 14, 14, 14))
    assert(Dedup.hammingBandLayout(31, 2)._1.toSeq == Seq(11, 10, 10))
    assert(Dedup.hammingBandLayout(56, 5)._1.toSeq
      == Seq(10, 10, 9, 9, 9, 9))
    // explicit layouts must still satisfy the pigeonhole; the clamp
    // case (bands == bits) is the documented 1-bit-band diagnostic
    intercept[IllegalArgumentException](Dedup.hammingBandLayout(64, 7, 7))
    intercept[IllegalArgumentException](Dedup.hammingBandLayout(64, 3, 65))
    assert(Dedup.hammingBandLayout(60, 60)._1.length == 60)
    assert(Dedup.hammingBandLayout(8, 3, 8)._1.toSeq
      == Seq.fill(8)(1))
  }

  test("banded Hamming pair set is layout-invariant on a planted fixture") {
    // two legal layouts (tightest 4-band and an uneven 7-band) over the
    // same signatures must produce the identical pair set — the small-SF
    // twin of the Sf1Check cross-layout identity, run per-commit
    val sigs = spark.createDataFrame(Seq(
      (1L, 0x0123456789abcdefL), (2L, 0x0123456789abcdeeL), // hamming 1
      (3L, 0x0123456789abcdefL),                            // exact dup of 1
      (4L, 0xfedcba9876543210L),                            // far away
      (5L, 0x0123456789abcdf0L),                            // hamming 5 from 1 (5 low bits flipped)
      (6L, -1L), (7L, -3L)                                  // negative sigs, hamming 1
    )).toDF("doc_id", "simhash")
    def run(bands: Int) = Dedup
      .bandedHammingPairs(sigs, 64, 3, bands)
      .orderBy("doc1", "doc2").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val tight = run(0)
    assert(tight == run(7))
    assert(tight.contains((1L, 2L, 1)) && tight.contains((1L, 3L, 0)) &&
      tight.contains((2L, 3L, 1)) && tight.contains((6L, 7L, 1)))
    assert(!tight.exists(p => p._1 == 4L || p._2 == 4L))
    assert(!tight.exists(p => (p._1, p._2) == (1L, 5L)))
  }
}
