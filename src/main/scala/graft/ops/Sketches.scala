package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Probabilistic-sketch patterns for 100 TB plans (beyond the built-in
  * `approx_count_distinct` / `percentile_approx` already in the query
  * surface):
  *
  * - Bloom pre-filtered anti-join: the classic big-side pushdown. The
  *   exact anti-join of a 100 TB fact against a drop-list shuffles the
  *   whole fact; a Bloom filter built over the drop-list keys and
  *   broadcast as a scan-side predicate removes the guaranteed-clean rows
  *   (no false negatives) BEFORE the shuffle, leaving the exact anti-join
  *   to run over the tiny maybe-set. Result is exactly the plain
  *   anti-join's (spec-enforced).
  *
  * - Count-min heavy-hitters: one-pass approximate per-key counts with a
  *   proven overcount bound; candidates verified exactly. */
object Sketches {

  /** `big` minus rows whose `keyCol` appears in `keys`: semantically a
    * LEFT ANTI join, executed as bloom-prefilter + exact anti-join on the
    * survivors. `expectedKeys`/`fpp` size the filter (~ -n·ln(fpp)/ln2²
    * bits — 1M keys at 1% fpp ≈ 1.2 MB broadcast). */
  def bloomAntiJoin(big: DataFrame, keys: DataFrame, keyCol: String,
      expectedKeys: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val bloom = keys.stat.bloomFilter(keyCol, expectedKeys, fpp)
    val spark = big.sparkSession
    val bloomBc = spark.sparkContext.broadcast(bloom)
    // native codegen probe (no ScalaUDF boundary on the 100 TB side —
    // the scan stays one fused loop; PlanSpec-asserted)
    def mightContain(c: org.apache.spark.sql.Column) =
      graft.functions.SketchExpressions.bloomMightContain(bloomBc, c)
    // rows failing the bloom test are definitely not in `keys` — emit
    // directly; only the maybe-set (true matches + fpp false positives)
    // pays the exact anti-join. NULL keys never match an anti-join key,
    // so they go straight to the clean branch (the null-intolerant
    // probe expression would return NULL for them and silently drop the
    // row from BOTH branches otherwise).
    val maybe = big
      .where(col(keyCol).isNotNull && mightContain(col(keyCol)))
      .join(keys.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
    big.where(col(keyCol).isNull || !mightContain(col(keyCol)))
      .unionByName(maybe)
  }

  /** Approximate heavy-hitters via count-min sketch: one pass builds the
    * sketch (mergeable, driver-combined); candidates come from a bounded
    * per-partition Misra-Gries pass (`m` counters per partition — never a
    * shuffle of the full key universe, which on a heavy-tailed 100 TB key
    * space would negate the sketch's one-pass win); each candidate's
    * estimate carries the CMS overcount guarantee (est >= true;
    * est <= true + eps·N with prob 1-delta).
    *
    * Candidate completeness: Misra-Gries with `m` counters retains every
    * key occurring > n_p/(m+1) times in its partition, so any key with
    * global frequency > N/(m+1) — every true heavy hitter long before
    * top-k matters — survives in at least one partition. The candidate
    * union is <= partitions x m rows (spec-bounded). */
  def cmsTopKeys(df: DataFrame, keyCol: String, k: Int,
      eps: Double = 0.001, delta: Double = 0.01, m: Int = 256): DataFrame = {
    // the result is the top-k AMONG CANDIDATES: complete for keys with
    // global frequency > N/(m+1) (true heavy hitters), but on near-flat
    // distributions ranks close to k may be missed — so the candidate
    // budget must dominate k with a generous margin, not merely bound it
    require(m >= 4 * k, s"candidate budget m=$m must be >= 4*k (k=$k): " +
      "ranks near k are only reliable well inside the Misra-Gries budget")
    // the sketch and the candidate probe must hash the SAME representation:
    // build it over the string-cast column, since candidates and estimates
    // flow through strings (a numeric-built sketch probed with strings
    // would return collision noise)
    val cms = df.stat.countMinSketch(col(keyCol).cast("string"), eps, delta,
      seed = 42)
    val spark = df.sparkSession
    val cmsBc = spark.sparkContext.broadcast(cms)
    // native codegen probe over the candidate frame (no ScalaUDF)
    def estimate(c: org.apache.spark.sql.Column) =
      graft.functions.SketchExpressions.cmsEstimate(cmsBc, c)
    // candidates flow through strings (the sketch is string-keyed); cast
    // back to the input column's native type so the output schema matches
    // the input regardless of key type. Lossless: every candidate value
    // was produced by casting the original column to string.
    val keyType = df.schema(keyCol).dataType
    mgCandidates(df, keyCol, m)
      .withColumn("est_count", estimate(col(keyCol)))
      .withColumn(keyCol, col(keyCol).cast(keyType))
      .orderBy(col("est_count").desc, col(keyCol))
      .limit(k)
  }

  /** Exact-VERIFIED heavy hitters — the two-pass pattern a production
    * top-k runs at 100 TB: (1) a bounded candidate pass (per-partition
    * Misra-Gries, <= partitions x m rows — never a shuffle of the full
    * key universe); (2) a CMS prune that discards candidates whose
    * estimate falls below the Misra-Gries guarantee floor N/(m+1) —
    * SAFE, because CMS never undercounts, so no key with true count >=
    * the floor can be pruned; (3) an exact count of the surviving
    * candidates only (a semi-join of the data against the broadcast
    * candidate set), ranked (count desc, key) for a total order.
    *
    * The result equals the plain exact top-k whenever every true top-k
    * key clears the Misra-Gries floor — i.e. on any heavy-tailed (Zipf)
    * key distribution with m >> k, which is the regime heavy-hitter
    * queries target; the completeness condition is the same one
    * `cmsTopKeys` documents. Three passes over the data here (sketch,
    * candidates, verify); a production deployment fuses the first two
    * into one mapPartitions — kept separate to compose the two existing
    * primitives. */
  def verifiedTopKeys(df: DataFrame, keyCol: String, k: Int,
      eps: Double = 0.001, delta: Double = 0.01, m: Int = 256): DataFrame = {
    require(m >= 4 * k, s"candidate budget m=$m must be >= 4*k (k=$k)")
    val keyed = df.select(col(keyCol).cast("string").as(keyCol))
    val cms = keyed.stat.countMinSketch(col(keyCol), eps, delta, seed = 42)
    val floor = cms.totalCount() / (m + 1L) // MG guarantee threshold
    val spark = df.sparkSession
    val cmsBc = spark.sparkContext.broadcast(cms)
    def estimate(c: org.apache.spark.sql.Column) =
      graft.functions.SketchExpressions.cmsEstimate(cmsBc, c)
    val survivors = mgCandidates(df, keyCol, m)
      .where(estimate(col(keyCol)) >= floor)
    keyed.join(broadcast(survivors), Seq(keyCol), "left_semi")
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col(keyCol))
      .limit(k)
  }

  /** KMV (k-minimum-values) distinct-count sketch — the engine-portable
    * twin of the HLL queries (a10/a15): same mergeable-sketch rollup
    * shape, but every step is exact integer/IEEE arithmetic another
    * engine can replay, so the result is hash-verifiable (HLL internals
    * are implementation-defined; KMV's are not).
    *
    * Keys are hashed with the shared portable quadratic mix
    * ([[Similarity.portableWeight]], shifted to [0, M)); the sketch is
    * the k smallest DISTINCT hash values per group. Bounded at scale
    * without a bounded aggregator: the modulus caps distinct hashes at
    * M = 1,000,003 per group, so the per-group window sorts at most ~1M
    * rows no matter how many billions of raw keys flowed in — the
    * distinct-shuffle before it is the same shuffle an exact
    * count-distinct would pay, over an already-hash-compressed domain.
    *
    * Estimator: with hashes ~ uniform on [0, M), E[(k-1)·M / h_(k)] = D
    * (the distinct count). When the group has fewer than k distinct
    * hashes the sketch IS the whole hash set and the count is exact.
    * Mergeable: the k smallest of a union of per-partition k-min sets
    * equals the global k-min set (any globally-top-k hash is top-k
    * within its own partition) — [[kmvMerge]] + the rollup query
    * exercise exactly that property. */
  def kmvSketch(df: DataFrame, groupCols: Seq[String], keyCol: String,
      k: Int): DataFrame = {
    val HALF = 500001L
    val h = (Similarity.portableWeight(col(keyCol)) + HALF).as("h")
    val grp = groupCols.map(col)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(grp: _*).orderBy(col("h"))
    df.where(col(keyCol).isNotNull)
      .select(grp :+ h: _*)
      .distinct()
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .drop("rn")
  }

  /** Merge per-subgroup KMV sketches down to coarser groups: distinct the
    * unioned hash sets, keep the k smallest per output group. Exact — see
    * [[kmvSketch]] mergeability note. */
  def kmvMerge(sketch: DataFrame, groupCols: Seq[String],
      k: Int): DataFrame = {
    val grp = groupCols.map(col)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(grp: _*).orderBy(col("h"))
    sketch.select(grp :+ col("h"): _*)
      .distinct()
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .drop("rn")
  }

  /** Collapse a KMV sketch to `(group..., kth_min, kmv_uu)`. The estimate
    * is plain IEEE double arithmetic ((k-1)·M / (h_(k)+1), +1 guarding
    * h=0) evaluated in the same expression shape the oracle uses, so the
    * doubles agree bit-for-bit across engines. */
  def kmvEstimate(sketch: DataFrame, groupCols: Seq[String],
      k: Int): DataFrame = {
    val M = 1000003L
    sketch.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("sk_n"), max(col("h")).as("kth_min"))
      .withColumn("kmv_uu",
        when(col("sk_n") < k, col("sk_n").cast("double"))
          .otherwise(lit((k - 1).toDouble * M) / (col("kth_min") + 1)
            .cast("double")))
      .drop("sk_n")
  }

  /** Bottom-k uniform sample per group — the k rows with the SMALLEST
    * content-stable hash of `keyCol` ([[graft.ops.Sampling.contentHash]]:
    * 8-hex md5 prefix, ties broken by the key). Like the KMV hash set this
    * is a mergeable bounded sketch: the k smallest of a union of
    * per-partition/per-day bottom-k sets equal the global bottom-k set, so
    * per-shard samples roll up EXACTLY — and unlike RNG sampling the
    * result is content-stable across runs, repartitioning, and engines.
    * Per-group state is <= k rows; the window sorts only rows that survive
    * per-partition top-k pushdown of the rank filter. */
  def bottomKSample(df: DataFrame, groupCols: Seq[String], keyCol: String,
      k: Int): DataFrame = {
    val grp = groupCols.map(col)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(grp: _*)
      .orderBy(col("bk_h"), col(keyCol))
    df.withColumn("bk_h", Sampling.contentHash(keyCol))
      .withColumn("bk_rn", row_number().over(w))
      .where(col("bk_rn") <= k)
      .drop("bk_rn")
  }

  /** Sampled-quantile sketch — the engine-portable, mergeable quantile
    * estimator that completes the sketch family (KMV = distinct counts,
    * CMS = heavy hitters, bottom-k sample = quantiles). `percentile_approx`
    * (a14) is Spark's t-digest-style built-in; its internals are
    * implementation-defined, so like HLL it can never be hash-gated. This
    * twin can: the sketch is [[bottomKSample]] (deterministic, mergeable,
    * bounded at k rows per group) and the estimate is the NEAREST-RANK
    * quantile of the sample — pure selection, no interpolation, so the
    * output values are input values and hash identically in any engine.
    *
    * Estimator: est_q = sample value at rank max(1, ceil(q*m)) (m = sample
    * size). When the group has <= k rows the sample IS the group and the
    * nearest-rank quantile is exact. Above k, the rank error of a uniform
    * k-sample is ~ sqrt(q(1-q)/k) (Dvoretzky-Kiefer-Wolfowitz) — the
    * bound the estimator spec asserts at 3 sigma.
    *
    * Scale shape: one hash-partitioned exchange on the group key shared by
    * both windows (selection and value-rank sort reuse the exchange); the
    * rank filter caps every group at k rows before the cheap qs fan-out.
    * Output: (group..., q, est) with est drawn from `valueCol`. */
  def sampledQuantiles(df: DataFrame, groupCols: Seq[String],
      valueCol: String, keyCol: String, k: Int,
      qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      "quantiles must lie in (0, 1]")
    val grp = groupCols.map(col)
    val smp = bottomKSample(
      df.where(col(valueCol).isNotNull), groupCols, keyCol, k)
    val wVal = org.apache.spark.sql.expressions.Window
      .partitionBy(grp: _*).orderBy(col(valueCol), col(keyCol))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(grp: _*)
    smp
      .withColumn("vr", row_number().over(wVal).cast("long"))
      .withColumn("m", count(lit(1)).over(wAll))
      .select(grp ++ Seq(col(valueCol),
        explode(array(qs.map(lit): _*)).as("q"), col("vr"), col("m")): _*)
      .where(col("vr") === greatest(lit(1L), ceil(col("q") * col("m"))))
      .select(grp ++ Seq(col("q"), col(valueCol).as("est")): _*)
  }

  /** The bounded candidate pass of `cmsTopKeys`: per-partition Misra-Gries
    * summaries (m counters each), unioned and deduped — at most
    * partitions x m rows. Exposed for the candidate-bound spec. */
  private[graft] def mgCandidates(df: DataFrame, keyCol: String,
      m: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string")).as[String]
      .mapPartitions { it =>
        // Misra-Gries summary: O(m) memory regardless of partition size
        val counters = new scala.collection.mutable.HashMap[String, Long]
        it.foreach { s =>
          if (s != null) {
            if (counters.contains(s)) counters(s) += 1L
            else if (counters.size < m) counters(s) = 1L
            else {
              // decrement-all step; drop zeroed counters
              val dead = new scala.collection.mutable.ArrayBuffer[String]
              counters.keysIterator.foreach { key =>
                val c = counters(key) - 1L
                if (c == 0L) dead += key else counters(key) = c
              }
              dead.foreach(counters.remove)
            }
          }
        }
        counters.keysIterator
      }.toDF(keyCol).distinct()
  }

  /** KMV set-INTERSECTION estimates for every unordered pair of groups —
    * the audience-overlap question ("how many users both click AND
    * purchase?") answered from the same bounded sketches [[kmvSketch]]
    * already maintains per group, without ever shuffling the raw key
    * sets against each other.
    *
    * Estimator (Beyer et al., SIGMOD'07 k-min-value set operations): for
    * groups A, B take the k smallest hashes of sA ∪ sB (exact — KMV
    * mergeability), count how many of those lie in BOTH sketches:
    * J_est = matches/k' (k' = |union top-k|, < k only when the union is
    * exhausted, in which case everything is exact), then
    * overlap_est = J_est · D_est(A ∪ B). Every step is integer selection
    * plus one double multiply on identical inputs, so the result is
    * engine-replayable and hash-gated.
    *
    * Scale shape: the only corpus-scale work is the one [[kmvSketch]]
    * pass (distinct-shuffle over the hash-compressed domain); the pair
    * expansion runs on ≤ |groups|·k sketch rows — config-scale however
    * large the raw table is, so the groups² term costs nothing real.
    * Output: (type_a, type_b, ku, kth_min, matches, est_union,
    * est_jaccard, est_overlap), one row per unordered group pair. */
  def kmvOverlapPairs(df: DataFrame, groupCol: String, keyCol: String,
      k: Int): DataFrame = {
    val M = 1000003L
    val sk = kmvSketch(df, Seq(groupCol), keyCol, k).localCheckpoint()
    val pairs = sk.select(col(groupCol).as("type_a")).distinct()
      .join(sk.select(col(groupCol).as("type_b")).distinct(),
        col("type_a") < col("type_b"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("type_a"), col("type_b")).orderBy(col("h"))
    pairs
      .join(sk.select(col(groupCol).as("t"), col("h")),
        col("t") === col("type_a") || col("t") === col("type_b"))
      .groupBy(col("type_a"), col("type_b"), col("h"))
      .agg(
        max(when(col("t") === col("type_a"), 1).otherwise(0)).as("in_a"),
        max(when(col("t") === col("type_b"), 1).otherwise(0)).as("in_b"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("ku"), max(col("h")).as("kth_min"),
        sum(col("in_a") * col("in_b")).as("matches"))
      .withColumn("est_union",
        when(col("ku") < k, col("ku").cast("double"))
          .otherwise(lit((k - 1).toDouble * M) / (col("kth_min") + 1)
            .cast("double")))
      .select(col("type_a"), col("type_b"), col("ku"), col("kth_min"),
        col("matches"),
        col("est_union"),
        round(col("matches").cast("double") / col("ku"), 6)
          .as("est_jaccard"),
        round(col("matches").cast("double") / col("ku")
          * col("est_union"), 6).as("est_overlap"))
  }
}
