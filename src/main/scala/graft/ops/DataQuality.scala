package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Declarative data-quality validation over a table — the admission gate a
  * training-data pipeline runs before a corpus drop is accepted (the same
  * role the reference's parse-and-validate splits play per record, e.g.
  * gmall-realtime-dws/.../DwsTrafficVcChArIsNewPageViewWindow.java's dirty
  * routing, generalized to a config-driven check suite à la AWS Deequ).
  *
  * Both entry points are SINGLE-PASS: every check compiles to a conditional
  * aggregate over one scan, partial-aggregated map-side, so validating a
  * 100 TB table costs one read and a one-row-per-partition shuffle. The
  * only expansion is Spark's expand node for exact distinct aggregates
  * (one extra in-memory projection per distinct column — swap in
  * `approx_count_distinct` at scale if 2% error is acceptable; the exact
  * form is kept here because it is the oracle-comparable one, and the
  * HLL twin already exists as `a10`/`a14`).
  */
object DataQuality {

  /** One declarative expectation. `id` keys the output row; `column` is the
    * checked column; the violation predicate is per `kind`:
    *  - `not_null`: value IS NULL
    *  - `between`:  value outside [lo, hi] (NULLs are NOT range violations —
    *    pair with a `not_null` check to forbid them)
    *  - `in_set`:   value not among `allowed` (NULLs pass, as above)
    *  - `matches`:  value does not match `regex` (RE2-safe subset only, so
    *    the same pattern runs on Spark and DuckDB/RE2 engines)
    *  - `unique`:   duplicated values; violations = count(*) − count(distinct)
    *    (NULL rows count as violations — count(distinct) ignores them)
    */
  final case class Check(id: String, column: String, kind: String,
      lo: Double = Double.NaN, hi: Double = Double.NaN,
      allowed: Seq[String] = Nil, regex: String = "")

  /** Run a check suite in one scan. Output: one row per check,
    * (check_id, col_name, kind, violations, total) — all counts exact
    * BIGINTs, so the result is engine-portable (hash-comparable).
    *
    * The single wide `agg` keeps everything in whole-stage codegen; the
    * per-check rows come from an unpivot (`stack`) of the one aggregated
    * row, which is driver-negligible. Empty input yields zero violations
    * (sums coalesced), matching the SQL convention.
    */
  def expectations(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "at least one check")
    require(checks.map(_.id).distinct.size == checks.size, "check ids unique")
    // reject the misconfigurations that would silently pass everything:
    // NaN bounds never compare true, an empty regex matches every row,
    // an empty set would flag every row instead of failing loudly
    checks.foreach { c =>
      c.kind match {
        case "between" => require(!c.lo.isNaN && !c.hi.isNaN,
          s"check '${c.id}': between requires lo and hi")
        case "in_set" => require(c.allowed.nonEmpty,
          s"check '${c.id}': in_set requires a non-empty allowed list")
        case "matches" => require(c.regex.nonEmpty,
          s"check '${c.id}': matches requires a non-empty regex")
        case _ => ()
      }
    }
    val aggs = checks.map { c =>
      val v = col(c.column)
      val violations = c.kind match {
        case "not_null" => sum(when(v.isNull, 1L).otherwise(0L))
        case "between" =>
          sum(when(v < c.lo || v > c.hi, 1L).otherwise(0L))
        case "in_set" =>
          sum(when(!v.isin(c.allowed: _*), 1L).otherwise(0L))
        case "matches" =>
          sum(when(!v.rlike(c.regex), 1L).otherwise(0L))
        case "unique" => count(lit(1)) - count_distinct(v)
        case other => throw new IllegalArgumentException(
          s"unknown check kind '$other'")
      }
      coalesce(violations, lit(0L)).as(c.id)
    }
    val one = df.agg(count(lit(1)).as("__total"), aggs: _*)
    val stackArgs = checks.map(c =>
      s"'${c.id}', '${c.column}', '${c.kind}', `${c.id}`").mkString(", ")
    one.selectExpr(
      s"stack(${checks.size}, $stackArgs)" +
        " AS (check_id, col_name, kind, violations)",
      "__total AS total")
  }

  /** Per-column profile in one scan: NULL count, exact distinct count, and
    * (for numeric columns) min/max as 6-dp doubles — the summary a corpus
    * registry records per ingested drop. Non-numeric columns report NULL
    * min/max rather than string extremes, keeping the output
    * engine-portable (string collation differs across engines; counts and
    * rounded numerics do not). */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "at least one column")
    val numeric = df.schema.fields
      .filter(_.dataType.isInstanceOf[NumericType]).map(_.name).toSet
    val aggs = cols.flatMap { c =>
      val (mn, mx) =
        if (numeric(c))
          (round(min(col(c)).cast("double"), 6),
           round(max(col(c)).cast("double"), 6))
        else (lit(null).cast("double"), lit(null).cast("double"))
      Seq(
        coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L))
          .as(s"__null_$c"),
        count_distinct(col(c)).as(s"__nd_$c"),
        mn.as(s"__min_$c"), mx.as(s"__max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', `__null_$c`, `__nd_$c`, `__min_$c`, `__max_$c`")
      .mkString(", ")
    one.selectExpr(
      s"stack(${cols.size}, $stackArgs)" +
        " AS (col_name, n_null, n_distinct, min_num, max_num)")
  }

  /** Referential-integrity check: how many child rows point at a key
    * absent from the parent table — the cross-TABLE companion of the
    * single-table [[expectations]] gate (a corpus drop whose fact rows
    * reference missing dimension keys fails admission the same way a
    * NULL-ridden column does). NULL child keys are excluded — pair with
    * a `not_null` expectation to forbid them.
    *
    * Output: ONE row, (relation, n_child, n_orphans) — compose several
    * relations with `unionAll` for a whole-schema gate.
    *
    * Scale: the parent side is reduced to DISTINCT keys before a LEFT
    * join (never a row-multiplying join — one output row per child row),
    * then a conditional count aggregates to one row with map-side
    * partials. The join shuffles on the key; AQE broadcasts the parent
    * key set while it is small (dimension tables), and the same plan
    * degrades gracefully to a shuffle join when the parent is itself
    * fact-scale. */
  def refIntegrity(child: DataFrame, childCol: String, parent: DataFrame,
      parentCol: String, relation: String): DataFrame = {
    val pk = parent.select(col(parentCol).as("__pk")).where(col("__pk")
      .isNotNull).distinct().withColumn("__hit", lit(1))
    child.select(col(childCol).as("__ck"))
      .where(col("__ck").isNotNull)
      .join(pk, col("__ck") === col("__pk"), "left")
      .agg(
        count(lit(1)).as("n_child"),
        coalesce(sum(when(col("__hit").isNull, 1L).otherwise(0L)), lit(0L))
          .as("n_orphans"))
      .select(lit(relation).as("relation"), col("n_child"),
        col("n_orphans"))
  }

  /** Population Stability Index between two slices of one table — the
    * distribution-drift alarm a corpus registry raises when a new drop's
    * feature distribution has moved from the reference drop's (the
    * between-drops companion of the within-drop gates above).
    *
    * `valueCol` is bucketed into `nBins` equal-width bins over [lo, hi)
    * (out-of-range values clamp into the edge bins, the standard PSI
    * convention so probability mass is conserved); NULLs are excluded —
    * pair with a `not_null` expectation to forbid them. Proportions are
    * Laplace-smoothed, p = (n + 1) / (N + nBins), so empty bins never
    * produce ln(0) and the per-bin term (p_ref − p_cur) · ln(p_ref/p_cur)
    * is total. Output: one row per bin (bin spine included even for
    * empty bins), (bin, n_ref, n_cur, psi_term@6dp); total PSI = the sum
    * of psi_term (>0.2 conventionally = significant drift).
    *
    * Scale: ONE scan, ONE plan — bin + slice flag are projected, a
    * single groupBy(bin) with two conditional sums partial-aggregates
    * map-side to ≤ nBins rows per partition, and everything after
    * (slice totals, the full-bin spine, the smoothed terms) is array
    * arithmetic over the ONE collected ≤ nBins-element row: totals via
    * an `aggregate` HOF, the spine via `explode(sequence(...))`, the
    * per-bin lookup via `filter`. No second branch re-reading the scan
    * (Catalyst does not dedup common subplans — PlanSpec-asserted), no
    * unpartitioned window, no driver round-trip; the interpreted HOF
    * lambdas touch one nBins-element array, not the data. */
  def psi(df: DataFrame, valueCol: String, isRef: Column, nBins: Int,
      lo: Double, hi: Double): DataFrame = {
    require(nBins >= 2, "need at least two bins")
    require(hi > lo, "hi must exceed lo")
    val width = (hi - lo) / nBins
    val bin = least(greatest(
      floor((col(valueCol) - lo) / width), lit(0L)), lit(nBins - 1L))
    val counts = df
      .where(col(valueCol).isNotNull)
      .select(bin.as("bin"), isRef.as("is_ref"))
      .groupBy("bin")
      .agg(
        sum(when(col("is_ref"), 1L).otherwise(0L)).as("n_ref"),
        sum(when(!col("is_ref"), 1L).otherwise(0L)).as("n_cur"))
    counts
      .agg(collect_list(struct(col("bin"), col("n_ref"), col("n_cur")))
        .as("cs"))
      .select(col("cs"),
        aggregate(col("cs"), lit(0L), (a, x) => a + x("n_ref"))
          .as("t_ref"),
        aggregate(col("cs"), lit(0L), (a, x) => a + x("n_cur"))
          .as("t_cur"),
        explode(sequence(lit(0L), lit(nBins - 1L))).as("b"))
      .withColumn("hit", try_element_at( // empty bin -> NULL, not ANSI error
        filter(col("cs"), x => x("bin") === col("b")), lit(1)))
      .select(col("b").as("bin"),
        coalesce(col("hit.n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("hit.n_cur"), lit(0L)).as("n_cur"),
        col("t_ref"), col("t_cur"))
      .withColumn("p_ref",
        (col("n_ref") + 1.0) / (col("t_ref") + lit(nBins.toDouble)))
      .withColumn("p_cur",
        (col("n_cur") + 1.0) / (col("t_cur") + lit(nBins.toDouble)))
      .select(col("bin"), col("n_ref"), col("n_cur"),
        round((col("p_ref") - col("p_cur")) * log(col("p_ref") / col("p_cur")),
          6).as("psi_term"))
  }

  /** Jensen-Shannon divergence between two slices' CATEGORICAL
    * distributions — the companion of [[psi]] for columns with no
    * numeric order (event types, languages, sources). Per observed
    * category: 0.5·p·ln(p/m) + 0.5·q·ln(q/m) with m = (p+q)/2 and the
    * same Laplace smoothing as psi over K = the number of observed
    * categories; the term sum is the JSD, bounded by ln 2 and symmetric
    * in the two slices (unlike KL). NULL categories are excluded.
    *
    * Same ONE-scan ONE-plan shape as [[psi]]: groupBy(category) with
    * two conditional sums partial-aggregates map-side, then totals and
    * K come from `aggregate`/`size` HOFs over the single collected
    * category array (K is categorical cardinality — profile with
    * [[columnProfile]] first if it might not be config-scale), and the
    * per-category rows explode back out. No spine is needed: the
    * observed category set IS the union of both slices' supports. */
  def jsDivergence(df: DataFrame, catCol: String,
      isRef: Column): DataFrame = {
    val counts = df
      .where(col(catCol).isNotNull)
      .select(col(catCol).as("cat"), isRef.as("is_ref"))
      .groupBy("cat")
      .agg(
        sum(when(col("is_ref"), 1L).otherwise(0L)).as("n_ref"),
        sum(when(!col("is_ref"), 1L).otherwise(0L)).as("n_cur"))
    counts
      .agg(collect_list(struct(col("cat"), col("n_ref"), col("n_cur")))
        .as("cs"))
      .select(col("cs"),
        aggregate(col("cs"), lit(0L), (a, x) => a + x("n_ref"))
          .as("t_ref"),
        aggregate(col("cs"), lit(0L), (a, x) => a + x("n_cur"))
          .as("t_cur"),
        size(col("cs")).cast("double").as("k"))
      .select(explode(col("cs")).as("r"), col("t_ref"), col("t_cur"),
        col("k"))
      .select(col("r.cat").as(catCol),
        col("r.n_ref").as("n_ref"), col("r.n_cur").as("n_cur"),
        ((col("r.n_ref") + 1.0) / (col("t_ref") + col("k"))).as("p"),
        ((col("r.n_cur") + 1.0) / (col("t_cur") + col("k"))).as("q"))
      .withColumn("m", (col("p") + col("q")) / 2)
      .select(col(catCol), col("n_ref"), col("n_cur"),
        round(lit(0.5) * col("p") * log(col("p") / col("m"))
          + lit(0.5) * col("q") * log(col("q") / col("m")), 6)
          .as("js_term"))
  }

  /** Winsorized (outlier-clipped) per-group moments — the robust
    * normalization statistic feature pipelines use instead of raw
    * mean/std (one corrupt 1e12 reading would otherwise poison the
    * z-scores of a whole group). Values are clipped to the exact
    * [loP, hiP] percentiles before the moments are taken.
    *
    * Engine-portable by the corpus twin rule: values are quantized to
    * 1e-6 ints up front; the exact interpolated percentile runs on those
    * ints (identical doubles in any engine) and is ROUNDED BACK to an
    * integer clip bound, so the clipped column stays int64 and both
    * row-spanning sums are exact integer arithmetic (the squared sum in
    * decimal(38) — qv² alone reaches 3·10¹⁷ here, int64 would overflow
    * within 30 rows). Mean/std then divide exact sums in double and
    * round to 6dp.
    *
    * Scale shape: ONE groupCol exchange total — the clip bounds come
    * from a window over the same partitioning the final groupBy needs,
    * so the aggregation reuses the exchange instead of paying a
    * bounds-join. `percentile` is Spark's exact aggregator (per-group
    * sorted buffer — right for groups that fit an executor; swap
    * `percentile_approx` in for billion-row groups, at the documented
    * cost of oracle exactness). */
  def winsorizedStats(df: DataFrame, groupCol: String, valCol: String,
      loP: Double = 0.05, hiP: Double = 0.95): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
    val qv = round(col(valCol).cast("double") * 1e6).cast("long")
    val cq = least(greatest(col("qv"), col("lo_q")), col("hi_q"))
    df.where(col(valCol).isNotNull)
      .select(col(groupCol), qv.as("qv"))
      .withColumn("lo_q",
        round(expr(s"percentile(qv, $loP)").over(w)).cast("long"))
      .withColumn("hi_q",
        round(expr(s"percentile(qv, $hiP)").over(w)).cast("long"))
      .select(col(groupCol), col("lo_q"), col("hi_q"), cq.as("cq"))
      .groupBy(groupCol)
      .agg(
        count(lit(1)).as("n"),
        first(col("lo_q")).as("lo_q"),
        first(col("hi_q")).as("hi_q"),
        sum(col("cq")).as("s"),
        sum(col("cq").cast("decimal(38,0)") * col("cq")).as("ss"))
      .select(col(groupCol), col("n"),
        round(col("lo_q").cast("double") / 1e6, 6).as("p_lo"),
        round(col("hi_q").cast("double") / 1e6, 6).as("p_hi"),
        round(col("s").cast("double") / col("n") / 1e6, 6).as("win_mean"),
        round(
          when(col("n") > 1,
            sqrt((col("ss").cast("double")
              - col("s").cast("double") * col("s") / col("n"))
              / (col("n") - 1)) / 1e6), 6).as("win_std"))
  }

  /** Deterministic Poisson-bootstrap confidence interval for the corpus
    * mean quality score — the uncertainty bar a "did this drop shift
    * quality?" comparison needs next to the point estimate. Replicate
    * weights are Poisson(1) drawn by inverse-CDF over the shared
    * quadratic-residue hash (`Similarity.portableWeight`'s mix, mod the
    * same prime), so the whole resampling procedure replays bit-for-bit
    * in any engine AND in any future re-run: no RNG, no seed plumbing.
    * Per replicate, the weighted score sum is exact int64 (scores
    * quantized 1e-6); the per-replicate mean is the one float ratio; the
    * CI is the ceil(0.025·m)/floor(0.975·m)-th order statistic of the
    * m surviving replicate means (a reps-row frame).
    *
    * Scale: ONE pass over the score frame fanned out `reps`× (narrow
    * integer columns — at 100 TB this is the cheapest resampling there
    * is: no shuffling of documents, just a reps-key aggregate with
    * map-side partials), then an O(reps log reps) sort of a config-size
    * frame. */
  def bootstrapScoreCi(documents: DataFrame, reps: Int = 32): DataFrame = {
    require(reps >= 4, "need enough replicates for an interval")
    import org.apache.spark.sql.expressions.Window
    val M = 1000003L
    val q = TextAnalysis.modelQualityScore(documents)
      .select(col("doc_id"), round(col("score") * 1e6).cast("long").as("qs"))
    val y = (col("doc_id") * 131L + col("b")) % M
    val u = (lit(1013L) * y * y + lit(2654435761L) * y) % M
    // Poisson(1) inverse CDF at 1e-6 resolution over u in [0, M)
    val w = when(u < 367879L, 0L).when(u < 735759L, 1L)
      .when(u < 919699L, 2L).when(u < 981012L, 3L).otherwise(4L)
    val perRep = q
      .select(col("doc_id"), col("qs"),
        explode(sequence(lit(0L), lit(reps - 1L))).as("b"))
      .select(col("b"), w.as("w"), (w * col("qs")).as("ws"))
      .groupBy(col("b"))
      .agg(sum(col("ws")).as("sws"), sum(col("w")).as("sw"))
      .where(col("sw") > 0)
      .select(col("b"),
        (col("sws").cast("double") / col("sw") / 1e6).as("m"))
    // reps-row frame: the unpartitioned rank window is config-scale.
    // Order-stat ranks come from the SURVIVING replicate count m (an
    // all-zero-weight replicate drops at the sw > 0 guard): lo = the
    // ceil(0.025·m)-th smallest mean, hi = the floor(0.975·m)-th — so a
    // dropped replicate shifts the ranks instead of silently selecting
    // the maximum (or no row at all), and the bounds actually track the
    // nominal 95% as m grows.
    val ranked = perRep
      .withColumn("rn", row_number().over(Window.orderBy(col("m"))))
      .withColumn("mm", count(lit(1)).over(Window.partitionBy()))
    val loRn = greatest(lit(1L), ceil(col("mm") * 0.025))
    val hiRn = least(col("mm"), greatest(loRn, floor(col("mm") * 0.975)))
    val base = q.agg(count(lit(1)).as("n_docs"), sum(col("qs")).as("sqs"))
    base.crossJoin(
        ranked.where(col("rn") === loRn).select(col("m").as("lo_m")))
      .crossJoin(ranked.where(col("rn") === hiRn)
        .select(col("m").as("hi_m")))
      .select(col("n_docs"), lit(reps).cast("long").as("n_reps"),
        round(col("sqs").cast("double") / col("n_docs") / 1e6, 6)
          .as("mean_score"),
        round(col("lo_m"), 6).as("lo95"),
        round(col("hi_m"), 6).as("hi95"))
  }

  /** Per-dimension 1-D Wasserstein-1 (earth-mover) distance between two
    * slices' EMBEDDING distributions — the drift alarm for vector
    * spaces, completing the family: [[psi]] watches a scalar feature,
    * [[jsDivergence]] a categorical one, this one the representation a
    * retrieval/semantic-dedup index is built on. A re-embedded or
    * model-upgraded drop can pass every scalar gate while its vectors
    * move; W1 per dimension localizes WHICH components moved and by how
    * much (in embedding units — for a constant shift δ on one dim, W1 on
    * that dim is exactly |δ|, unlike KL-family scores with no unit).
    *
    * Exact-integer portability: components quantize to 1e-6 ints, and
    * over the merged support W1 = Σ_k |F_ref(x_k) − F_cur(x_k)| · Δx_k.
    * Scaling both ECDFs by (t_ref · t_cur) keeps every term an exact
    * integer — |cr·tc − cc·tr| · Δx, summed in decimal(38) against
    * corpus-scale overflow — so the ONLY float ops are the final two
    * divisions, identical IEEE on identical integers in any engine.
    *
    * Scale: one narrow scan; the groupBy(dim, qx) partial-aggregates
    * map-side to ≤ dims · |support| rows (support ≤ 2e6 + 1 per dim for
    * unit-range components at 1e-6 — config-bounded, never
    * corpus-proportional); the cumulative windows are PARTITIONED by
    * dim over that aggregated frame, so no task ever sees more than one
    * dim's support. Dims where either slice is empty are dropped (W1
    * undefined against an empty distribution). */
  def embeddingW1(embeddings: DataFrame, isRef: Column): DataFrame = {
    val q = quantizedComponents(embeddings)
      .withColumn("is_ref", isRef)
    w1FromCounts(q.groupBy(col("dim"), col("qx"))
      .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("n_ref"),
        sum(when(!col("is_ref"), 1L).otherwise(0L)).as("n_cur")))
  }

  /** The shared 1e-6 component quantization of [[embeddingW1]] and the
    * streaming monitor (`Streams.w1Sink`): (original columns…, dim, qx).
    * Both sides of a drift comparison MUST bin on this one grid. */
  private[graft] def quantizedComponents(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("*"), posexplode(col("embedding")).as(Seq("i0", "x")))
      .select(col("*"), (col("i0") + 1).cast("int").as("dim"),
        round(col("x").cast("double") * 1e6).cast("long").as("qx"))
      .drop("i0", "x", "embedding")

  /** The ECDF-area core of [[embeddingW1]] over a prepared per-(dim, qx)
    * count frame (n_ref, n_cur; zero-count support rows welcome) —
    * shared with the streaming monitor, which feeds it the full-outer
    * join of its static reference counts with the accumulated stream
    * counts. */
  private[graft] def w1FromCounts(counts: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byDim = Window.partitionBy("dim")
    val cum = byDim.orderBy("qx")
    counts
      .withColumn("cr", sum(col("n_ref")).over(cum))
      .withColumn("cc", sum(col("n_cur")).over(cum))
      .withColumn("tr", sum(col("n_ref")).over(byDim))
      .withColumn("tc", sum(col("n_cur")).over(byDim))
      .withColumn("nx", lead(col("qx"), 1).over(cum))
      // decimal BEFORE the products: cr·tc is already past int64 at
      // corpus scale (1e12 rows → 1e24)
      .withColumn("term",
        abs(col("cr").cast("decimal(38,0)") * col("tc")
          - col("cc").cast("decimal(38,0)") * col("tr"))
          * coalesce(col("nx") - col("qx"), lit(0L)).cast("decimal(38,0)"))
      .groupBy(col("dim"), col("tr"), col("tc"))
      .agg(sum(col("term")).as("num"))
      .where(col("tr") > 0 && col("tc") > 0)
      .select(col("dim"), col("tr").as("n_ref"), col("tc").as("n_cur"),
        round(col("num").cast("double")
          / (col("tr").cast("double") * col("tc").cast("double")) / 1e6, 6)
          .as("w1"))
  }
}
