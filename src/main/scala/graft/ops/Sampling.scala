package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** Reproducible data-selection ops for training pipelines: deterministic
  * sampling, train/val/test splits, and token-stream chunking.
  *
  * Selection is by CONTENT-STABLE hash, not RNG: a row's fate depends only
  * on its key (md5 prefix compared against a hex threshold), so samples are
  * reproducible across runs/clusters, stable under repartitioning, and
  * composable (a 10% sample of a 50% sample is a true 5%). All three ops
  * are narrow (no shuffle) except the chunker's two-phase prefix sum.
  */
object Sampling {

  /** First 8 hex chars of md5(key) — uniform in [0, 2^32) as a hex string,
    * so a lexical compare against an 8-hex threshold selects a uniform
    * fraction. Identical SQL exists in every engine with md5(). */
  private def hashPrefix(keyCol: String) =
    substring(md5(col(keyCol).cast("string").cast("binary")), 1, 8)

  /** Hex threshold string for a fraction (e.g. 0.25 -> "40000000"). */
  def fractionThreshold(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction in [0,1]")
    f"${math.min((fraction * 4294967296.0).toLong, 4294967295L)}%08x"
  }

  /** The content-stable selection hash as a column — for callers that need
    * to order or cap a deterministic sample (e.g. a bounded, unbiased
    * training sample: filter by threshold, then take the lowest hashes). */
  def contentHash(keyCol: String) = hashPrefix(keyCol)

  /** Deterministic uniform sample: keep rows with hash(key) below the
    * fraction threshold. Narrow — the predicate evaluates at the scan. */
  def deterministicSample(df: DataFrame, keyCol: String,
      fraction: Double): DataFrame =
    df.where(hashPrefix(keyCol) < lit(fractionThreshold(fraction)))

  /** Disjoint, exhaustive train/val/test assignment from the same hash:
    * [0, train) -> train, [train, train+val) -> val, rest -> test. */
  def trainValTestSplit(df: DataFrame, keyCol: String,
      trainFrac: Double = 0.8, valFrac: Double = 0.1): DataFrame = {
    val h = hashPrefix(keyCol)
    df.withColumn("split",
      when(h < lit(fractionThreshold(trainFrac)), "train")
        .when(h < lit(fractionThreshold(trainFrac + valFrac)), "val")
        .otherwise("test"))
  }

  /** Stratified deterministic sample — the corpus-mixing knob (keep 100%
    * of one language/source, 25% of another). Same content-stable hash as
    * `deterministicSample`, so per-stratum samples stay reproducible,
    * composable, and stable under repartitioning. The fraction table is
    * config turned into a literal map expression (config-scale by
    * definition), so the whole thing remains ONE narrow scan-level
    * predicate — no join, no shuffle, evaluated at the parquet scan. */
  def stratifiedSample(df: DataFrame, keyCol: String, stratumCol: String,
      fractions: Map[String, Double],
      defaultFraction: Double): DataFrame = {
    val entries = fractions.toSeq.flatMap { case (s, f) =>
      Seq(lit(s), lit(fractionThreshold(f)))
    }
    val thr =
      if (entries.isEmpty) lit(fractionThreshold(defaultFraction))
      else coalesce(element_at(map(entries: _*), col(stratumCol)),
        lit(fractionThreshold(defaultFraction)))
    df.where(hashPrefix(keyCol) < thr)
  }

  /** Exclusive prefix sum over a tiny per-bucket totals frame WITHOUT any
    * window: off(k) = sum of `valCol` at strictly "smaller" keys (by
    * `before`), via a broadcast non-equi self-join + re-aggregation. The
    * totals frame is bounded (256 hash buckets / O(sqrt(tokens)) distinct
    * tf values), so the O(buckets^2) nested-loop join is driver-scale —
    * and unlike an unpartitioned `Window.orderBy`, it never funnels rows
    * through a single partition (no `WindowExec: No Partition Defined`).
    * Callers must pass an already-materialized (checkpointed) `totals` so
    * the two join sides don't recompute the upstream aggregation. */
  private[ops] def exclusiveOffsets(totals: DataFrame, keyCol: String,
      valCol: String, offCol: String,
      before: (Column, Column) => Column = _ < _): DataFrame =
    totals.as("a")
      .join(broadcast(totals.as("b")),
        before(col(s"b.$keyCol"), col(s"a.$keyCol")), "left")
      .groupBy(col(s"a.$keyCol").as(keyCol))
      .agg(coalesce(sum(col(s"b.$valCol")), lit(0L)).as(offCol))

  /** Deterministic token-budget cut: keep documents in content-hash order
    * until the cumulative token count reaches `budget` — "take ~N tokens
    * of corpus, reproducibly", the selection a scaling-law or ablation run
    * makes. Hash order is simultaneously the shuffle (unbiased corpus
    * order) and the stability guarantee (adding hardware or repartitioning
    * cannot change which docs make the cut).
    *
    * Scale shape: the global running sum over hash order is the same
    * two-phase prefix sum as `tokenOffsets` — an intra-bucket window
    * cumsum over 256 UNIFORM buckets (the first two hex chars of the
    * hash) plus a broadcast per-bucket offset computed by
    * `exclusiveOffsets` — no single-partition window anywhere. The narrow
    * (doc_id, h, n_tok) projection is checkpointed once so the tokenize
    * feeds both the window branch and the totals branch from one pass. */
  def tokenBudgetSample(documents: DataFrame, budget: Long): DataFrame = {
    val h = hashPrefix("doc_id")
    val n = documents.select(col("doc_id"), h.as("h"),
      size(split(col("text"), "\\s+")).as("n_tok"))
      .withColumn("bkt", substring(col("h"), 1, 2))
      .localCheckpoint()
    val wIn = Window.partitionBy(col("bkt")).orderBy(col("h"), col("doc_id"))
    val local = n.withColumn("cum_in", sum(col("n_tok")).over(wIn))
    val totals = n.groupBy(col("bkt")).agg(sum(col("n_tok")).as("bt"))
      .localCheckpoint() // 256 rows — materialized for the self-join
    val offs = exclusiveOffsets(totals, "bkt", "bt", "bkt_off")
    local.join(broadcast(offs), "bkt")
      .where(col("cum_in") + col("bkt_off") <= budget)
      .select(col("doc_id"), col("n_tok"))
  }

  /** SEL5 — QUALITY-ordered token-budget selection: ship the
    * highest-quality documents whose cumulative token mass fits
    * `budget` — the kept set is the maximal prefix of the
    * (q1 score desc, doc_id) order with running sum <= budget, the
    * "best N tokens" mix a DataComp/DCLM-style curation run draws
    * ([[tokenBudgetSample]] is the unbiased hash-order cut; this is its
    * quality-greedy sibling, and the budget boundary is sharp: the
    * first doc that would overflow is excluded along with everything
    * below it — a dataloader reads a sorted manifest prefix). Token
    * counts are q1's own n_toks, so selection and score share one
    * derivation.
    *
    * Scale shape: the global quality-ordered cumsum runs two-phase like
    * every prefix sum here — score bands (band = floor(score·nBands),
    * clamped, over the SAME 6dp score q1 hash-matches — the cur3
    * banding) are the buckets, an intra-band window cumsum plus
    * broadcast exclusive band offsets via [[exclusiveOffsets]] — no
    * single-partition window anywhere. Band boundaries are a
    * coarsening of the (score desc, doc_id) order, so any nBands
    * yields identical output (spec-pinned); at 100 TB size nBands so a
    * band's rows sort within executor spill budgets — the
    * [[curriculumOrder]] knob, same posture, and a score distribution
    * concentrated on few values bounds what banding alone can split
    * (the cur3 caveat verbatim). Output (doc_id, score, n_tok,
    * cum_tok), kept rows only. */
  def qualityBudgetSelection(documents: DataFrame,
      budget: Long, nBands: Int = 10): DataFrame = {
    require(budget >= 0L, "budget must be >= 0")
    require(nBands >= 1, "nBands must be >= 1")
    val band = least(greatest(floor(col("score") * nBands), lit(0.0)),
      lit((nBands - 1).toDouble)).cast("long")
    val n = TextAnalysis.modelQualityScore(documents)
      .select(col("doc_id"), col("score"),
        col("n_toks").cast("long").as("n_tok"))
      // descending band == descending score: the `>` comparator below
      // walks the quality order band by band
      .withColumn("band", band)
      .localCheckpoint()
    val wIn = Window.partitionBy(col("band"))
      .orderBy(col("score").desc, col("doc_id"))
    val local = n.withColumn("cum_in", sum(col("n_tok")).over(wIn))
    val totals = n.groupBy(col("band")).agg(sum(col("n_tok")).as("bt"))
      .localCheckpoint() // <= nBands rows — materialized for the join
    val offs = exclusiveOffsets(totals, "band", "bt", "band_off", _ > _)
    local.join(broadcast(offs), "band")
      .select(col("doc_id"), col("score"), col("n_tok"),
        (col("cum_in") + col("band_off")).as("cum_tok"))
      .where(col("cum_tok") <= budget)
  }

  /** Weighted corpus mixing — the epoch-upsampling knob: a stratum with
    * weight w contributes floor(w) copies of every doc plus one extra copy
    * for a hash-selected (w - floor(w)) fraction; w < 1 downsamples (docs
    * with zero copies drop out). Deterministic end to end: the fractional
    * copy is the same content-stable hash selection as
    * `deterministicSample`, so a mix is reproducible across runs and
    * clusters and composes with the other sampling ops. Replication is a
    * narrow explode(sequence) — output grows by exactly the mix factor,
    * no shuffle, no RNG. Returns the input row + `replica` (1-based). */
  def mixWithWeights(df: DataFrame, keyCol: String, stratumCol: String,
      weights: Map[String, Double], defaultWeight: Double): DataFrame = {
    require((defaultWeight +: weights.values.toSeq).forall(_ >= 0.0),
      "weights must be >= 0")
    def wholeOf(w: Double) = lit(math.floor(w).toLong)
    def fracThr(w: Double) = lit(fractionThreshold(w - math.floor(w)))
    val wholeEntries = weights.toSeq.flatMap { case (s, w) =>
      Seq(lit(s), wholeOf(w)) }
    val fracEntries = weights.toSeq.flatMap { case (s, w) =>
      Seq(lit(s), fracThr(w)) }
    val whole =
      if (wholeEntries.isEmpty) wholeOf(defaultWeight)
      else coalesce(element_at(map(wholeEntries: _*), col(stratumCol)),
        wholeOf(defaultWeight))
    val thr =
      if (fracEntries.isEmpty) fracThr(defaultWeight)
      else coalesce(element_at(map(fracEntries: _*), col(stratumCol)),
        fracThr(defaultWeight))
    val copies = whole +
      when(hashPrefix(keyCol) < thr, lit(1L)).otherwise(lit(0L))
    df.withColumn("copies", copies)
      .where(col("copies") >= 1) // sequence(1,0) would generate [1,0]
      .withColumn("replica", explode(sequence(lit(1L), col("copies"))))
      .drop("copies")
  }

  /** Token-stream chunking (sequence packing): concatenate the corpus in
    * doc_id order and cut every `seqLen` tokens — each doc gets its global
    * token start offset and the chunk id containing that offset (docs may
    * straddle chunk boundaries, as pretraining packers do).
    *
    * Scale shape: a global running sum is computed two-phase — an
    * intra-bucket window cumsum (buckets = doc_id ranges, parallel) plus a
    * tiny per-bucket totals frame whose exclusive cumsum comes from the
    * `exclusiveOffsets` self-join and is broadcast back. No
    * single-partition global window; the only full shuffle is the bucket
    * window's hash partition, and the tokenize runs once (the narrow
    * per-doc projection is checkpointed before it fans out). */
  def tokenOffsets(documents: DataFrame, seqLen: Int,
      bucketSize: Long = 4096L): DataFrame =
    offsetsFromCounts(documents.select(col("doc_id"),
      size(split(col("text"), "\\s+")).as("n_tok")), seqLen, bucketSize)

  /** [[tokenOffsets]] over a PRECOMPUTED (doc_id, n_tok) frame — the
    * composition point for pipelines whose token counts are not the
    * whitespace split of raw text (e.g. the post-redaction counts of
    * `Pipeline.redactedCorpus`, where quoted spans were excised from
    * the token stream first). Same two-phase offsets, same output
    * columns. */
  def offsetsFromCounts(counts: DataFrame, seqLen: Int,
      bucketSize: Long = 4096L): DataFrame =
    offsetsCore(counts, seqLen, bucketSize, materialize = true)

  /** [[offsetsFromCounts]] for a counts frame the caller ALREADY
    * materialized (localCheckpoint/persist) — optimization round: the
    * internal checkpoint exists so the window branch and the totals
    * branch don't recompute the counts subtree twice, but when the
    * input is a checkpointed frame (redactPack's counts), re-running
    * the trivial (doc_id, n_tok, bkt) projection against it twice is
    * free and the extra materialization job is pure overhead — at
    * scale it is a second corpus-sized copy pinned for nothing. */
  private[ops] def offsetsFromMaterializedCounts(counts: DataFrame,
      seqLen: Int, bucketSize: Long = 4096L): DataFrame =
    offsetsCore(counts, seqLen, bucketSize, materialize = false)

  private def offsetsCore(counts: DataFrame, seqLen: Int,
      bucketSize: Long, materialize: Boolean): DataFrame = {
    val n0 = counts.select(col("doc_id"), col("n_tok"),
      floor(col("doc_id") / bucketSize).as("bkt"))
    val n = if (materialize) n0.localCheckpoint() else n0
    val wIn = Window.partitionBy(col("bkt")).orderBy(col("doc_id"))
    val local = n.withColumn("local_end", sum(col("n_tok")).over(wIn))
    val totals = n.groupBy(col("bkt")).agg(sum(col("n_tok")).as("bt"))
      .localCheckpoint() // one row per bucket — materialized for the join
    val offsets = exclusiveOffsets(totals, "bkt", "bt", "bkt_off")
    local.join(broadcast(offsets), "bkt")
      .select(col("doc_id"), col("n_tok"),
        (col("local_end") - col("n_tok") + col("bkt_off"))
          .as("start_offset"))
      .withColumn("chunk_id", floor(col("start_offset") / seqLen))
  }

  /** Per-group fixed-size cap: keep the first `n` rows of every group
    * under `order` — ONE op with two pipeline contracts. Ordered by the
    * content hash it is an unbiased fixed-size per-stratum sample (eval
    * sets: "exactly 50 docs per language"); ordered by a quality column
    * it is the CCNet-style domain cap ("at most N docs per source, best
    * first"), the standard defense against one domain dominating a
    * training mix. The window is PARTITIONED by the group key — fully
    * parallel, no global sort; skew is bounded by the largest group,
    * which is exactly the thing this op caps. Emits `grp_rank` (1-based
    * within-group rank) alongside the input row. */
  def perGroupCap(df: DataFrame, groupCol: String, order: Seq[Column],
      n: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(order: _*)
    df.withColumn("grp_rank", row_number().over(w))
      .where(col("grp_rank") <= n)
  }

  /** Deterministic global shuffle: every row's 0-based ordinal position
    * under the content-hash order — the reproducible "shuffled corpus"
    * a dataloader reads sequentially (position k = k-th doc of the
    * shuffled epoch). Same two-phase rank as `tokenOffsets`: row_number
    * within 256 uniform hash buckets + broadcast exclusive bucket-count
    * offsets — no single-partition window, stable under repartitioning,
    * and composable with `packedSequences` for a shuffled packing. */
  def shufflePositions(df: DataFrame, keyCol: String): DataFrame = {
    val n = df.select(col(keyCol), hashPrefix(keyCol).as("h"))
      .withColumn("bkt", substring(col("h"), 1, 2))
      .localCheckpoint()
    val wIn = Window.partitionBy(col("bkt")).orderBy(col("h"), col(keyCol))
    val local = n.withColumn("pos_in", row_number().over(wIn))
    val totals = n.groupBy(col("bkt")).agg(count(lit(1)).as("bc"))
      .localCheckpoint() // 256 rows — materialized for the self-join
    val offs = exclusiveOffsets(totals, "bkt", "bc", "bkt_off")
    local.join(broadcast(offs), "bkt")
      .select(col(keyCol),
        (col("pos_in") + col("bkt_off") - 1).as("position"))
  }

  /** Deterministic weighted sample WITHOUT replacement (Efraimidis &
    * Spirakis 2006): each row draws u from a content-stable integer hash
    * of its key and ranks by ln(u)/w — the top `n` keys are an exact
    * weight-proportional sample. With w = token/char count this is
    * token-uniform document sampling (every token equally likely to be
    * covered), the mix a scaling-law ablation wants. The key hash is the
    * Knuth multiplicative scramble (pure 64-bit integer arithmetic, so
    * any engine reproduces it bit-exactly; swap in the md5 path for
    * adversarial keys). Selection is `orderBy.limit` = distributed
    * top-n (TakeOrdered): per-partition heaps, no global sort, no
    * single-partition window. Zero/negative weights are excluded (their
    * inclusion probability is 0). */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String,
      n: Int): DataFrame = {
    // The key reduces below 2^31 BEFORE the Knuth multiply so the product
    // stays under 2^63 in every engine (a raw key above ~3.47e9 would
    // silently wrap in Spark but range-error in engines with checked
    // int64 math). pmod, not %: a negative key under % would feed log()
    // a negative u (NaN — which a descending sort ranks FIRST, i.e.
    // always selected). For keys in [0, 2^31) the two-step form equals
    // the plain product mod 2^32.
    val h = pmod(pmod(col(keyCol).cast("long"), lit(2147483648L)) *
      lit(2654435761L), lit(4294967296L))
    val u = (h.cast("double") + lit(0.5)) / lit(4294967296.0)
    df.where(col(weightCol) > 0)
      .withColumn("es_key", log(u) / col(weightCol).cast("double"))
      .orderBy(col("es_key").desc, col(keyCol))
      .limit(n)
      .drop("es_key")
  }

  /** Temperature-rebalanced corpus sampling (the T5/mC4 mixing rule):
    * stratum s is sampled at a rate making its expected share proportional
    * to n_s^alpha — alpha < 1 UPWEIGHTS small sources relative to their
    * natural share, the standard fix for head-domain dominance. Unlike
    * `stratifiedSample` (rates given) the rates are DERIVED from corpus
    * statistics in the same plan: rate_s = min(1, targetFrac * N *
    * n_s^(alpha-1) / sum_t n_t^alpha), so the op is the full two-pass
    * shape — a count pass whose tiny per-stratum result broadcasts back
    * as hash thresholds onto the scan filter. Selection stays the
    * content-stable md5 rule, so the mix composes with every other
    * sampling op and is reproducible across runs and cluster layouts. */
  def temperatureMix(df: DataFrame, keyCol: String, stratumCol: String,
      alpha: Double, targetFrac: Double): DataFrame = {
    val counts = df.groupBy(col(stratumCol))
      .agg(count(lit(1)).cast("double").as("n_s"))
    val z = counts.agg(sum(pow(col("n_s"), alpha)).as("z"),
      sum(col("n_s")).as("n_tot"))
    val thr = counts.crossJoin(broadcast(z))
      .select(col(stratumCol),
        least(lit(1.0),
          lit(targetFrac) * col("n_tot") * pow(col("n_s"), alpha - 1) /
            col("z")).as("rate"))
      .select(col(stratumCol),
        lpad(lower(hex(least(floor(col("rate") * 4294967296.0)
          .cast("long"), lit(4294967295L)))), 8, "0").as("thr"))
    df.join(broadcast(thr), stratumCol)
      .where(hashPrefix(keyCol) < col("thr"))
  }

  /** Packed-sequence manifest: the per-SEQUENCE view of `tokenOffsets` —
    * for every fixed-length training sequence, how many documents overlap
    * it, which documents bound it, and how many of its token slots are
    * filled (== seqLen everywhere except the ragged tail). This is the
    * packer's output contract a dataloader consumes: seq s holds tokens
    * [s*L, (s+1)*L) of the doc_id-ordered concatenated corpus.
    *
    * Scale shape: reuses the two-phase prefix sum of `tokenOffsets` (no
    * single-partition window), then each doc explodes to the sequences it
    * overlaps — the fan-out is ceil(n_tok/L)+1 per doc, i.e. ~1 unless a
    * document is longer than a whole sequence — and one groupBy(seq_id)
    * shuffle aggregates the manifest. Overlap arithmetic stays in longs. */
  /** Length-bucketed batching manifest — the OTHER dataloader strategy
    * next to `packedSequences`: instead of concatenating docs into fixed
    * windows, group docs of similar token length and pad each batch to its
    * own max, trading the packer's cross-doc attention leakage for bounded
    * padding waste. The manifest quantifies that trade: per (bucket,
    * batch) it reports the filled and padded slot counts a training run
    * budgets with.
    *
    * Mechanics: bucket = floor((n_tok-1)/bucketWidth) (pure integer
    * arithmetic); within a bucket docs are ordered by the content-stable
    * hash (unbiased, reproducible batch composition) and cut into batches
    * of `batchSize`. The within-bucket global rank uses the same two-phase
    * pattern as `shufflePositions` — a (bucket, cell) window over the 256
    * uniform hash-prefix cells plus broadcast per-cell offsets — so no
    * single-partition window exists at any bucket size; since the cell is
    * a PREFIX of the ordering hash, the two-phase rank equals the plain
    * per-bucket rank ordered by (hash, doc_id). Everything emitted is
    * integer, so the oracle compare is exact. */
  def lengthBuckets(documents: DataFrame, bucketWidth: Int = 64,
      batchSize: Int = 16): DataFrame = {
    val n = documents.select(col("doc_id"),
      size(split(col("text"), "\\s+")).cast("long").as("n_tok"),
      hashPrefix("doc_id").as("h"))
      .withColumn("bucket", floor((col("n_tok") - 1) / bucketWidth))
      .withColumn("cell", substring(col("h"), 1, 2))
      .localCheckpoint() // tokenize once before the rank + totals fan-out
    val wIn = Window.partitionBy(col("bucket"), col("cell"))
      .orderBy(col("h"), col("doc_id"))
    val local = n.withColumn("rn_in", row_number().over(wIn))
    val totals = n.groupBy(col("bucket"), col("cell"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint() // <= buckets x 256 rows — materialized for join
    val offs = totals.as("a")
      .join(broadcast(totals.as("b")),
        col("a.bucket") === col("b.bucket") && col("b.cell") < col("a.cell"),
        "left")
      .groupBy(col("a.bucket").as("bucket"), col("a.cell").as("cell"))
      .agg(coalesce(sum(col("b.c")), lit(0L)).as("off"))
    local.join(broadcast(offs), Seq("bucket", "cell"))
      .withColumn("batch_id",
        floor((col("rn_in") + col("off") - 1) / batchSize))
      .groupBy(col("bucket"), col("batch_id"))
      .agg(count(lit(1)).as("n_docs"),
        max(col("n_tok")).as("max_tok"),
        sum(col("n_tok")).as("sum_tok"))
      .withColumn("pad_waste",
        col("n_docs") * col("max_tok") - col("sum_tok"))
  }

  def packedSequences(documents: DataFrame, seqLen: Int): DataFrame = {
    val off = tokenOffsets(documents, seqLen)
    val end = col("start_offset") + col("n_tok") // exclusive token end
    off
      .withColumn("seq_id",
        explode(sequence(col("chunk_id"), floor((end - 1) / seqLen))))
      .groupBy(col("seq_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"),
        sum(
          least(lit(seqLen.toLong) * (col("seq_id") + 1), end) -
            greatest(lit(seqLen.toLong) * col("seq_id"),
              col("start_offset"))).as("n_tokens"))
  }

  /** Leakage-safe train/val/test split: every member of a near-dup
    * cluster receives the SPLIT OF ITS CLUSTER REPRESENTATIVE (the
    * component-minimum doc_id), so two near-duplicate documents can
    * never straddle train and test — the contamination mode a plain
    * per-doc hash split cannot prevent (a doc and its mirror hash
    * independently and land in different splits ~32% of the time at
    * 80/10/10). The group-aware split is the standard fix in training
    * pipelines (dedup-cluster–level splitting).
    *
    * Composition: [[graft.ops.Dedup.dupClusters]] supplies the
    * (doc_id, cluster_id) assignment (cluster_id = component min,
    * singletons map to themselves), then the same content-stable md5
    * threshold rule as [[trainValTestSplit]] is applied to the CLUSTER
    * id instead of the doc id. Per-cluster fractions still converge to
    * trainFrac/valFrac over many clusters, weighted by cluster size.
    *
    * Scale shape: the cluster assignment is the d7 operator (bounded
    * label-propagation rounds over the near-dup pair frame); the split
    * itself adds one narrow projection — no extra shuffle. */
  def leakageSafeSplit(documents: DataFrame, n: Int = 3,
      threshold: Double = 0.5, trainFrac: Double = 0.8,
      valFrac: Double = 0.1): DataFrame =
    leakageSafeSplitFromPairs(documents,
      Dedup.jaccardPairs(documents, n, threshold), trainFrac, valFrac)

  /** [[leakageSafeSplit]] with a PLUGGABLE pair source — the deployed
    * 100 TB form: feed `Dedup.minhashDuplicates` (LSH-blocked, linear)
    * instead of the exact-Jaccard pair join, which on a corpus with a
    * degenerate hot vocabulary degrades toward all-pairs (the d2 anchor
    * note in BASELINE.md). Any (doc1, doc2) frame works — the split
    * only needs the connectivity, and `clustersFromPairs` is
    * pair-source-agnostic. Equality of the two forms when the pair
    * frames agree is spec-pinned. */
  def leakageSafeSplitFromPairs(documents: DataFrame, pairFrame: DataFrame,
      trainFrac: Double = 0.8, valFrac: Double = 0.1): DataFrame = {
    val cl = Dedup.clustersFromPairs(
      documents.select(col("doc_id")), pairFrame)
    val h = hashPrefix("cluster_id")
    cl.select(col("doc_id"), col("cluster_id"),
      when(h < lit(fractionThreshold(trainFrac)), "train")
        .when(h < lit(fractionThreshold(trainFrac + valFrac)), "val")
        .otherwise("test").as("split"))
  }

  /** Curriculum training order: documents banded by a quality score
    * (band = floor(score·nBands), clamped), consumed HIGH band first,
    * deterministically shuffled WITHIN each band by the content-stable
    * hash — the easy/clean-first ordering curriculum-learning data
    * loaders read, reproducible across runs and engines. Output is
    * (doc_id, band, pos) with `pos` the global 1-based position in that
    * order.
    *
    * Scale shape: one band-keyed exchange for the within-band rank
    * window, then the global position comes from the two-phase
    * `exclusiveOffsets` trick — band totals are ≤ nBands rows, so the
    * offset join is broadcast and NO global-order window exists
    * anywhere (the same no-`WindowExec: No Partition Defined` posture
    * as `shufflePositions`). Bands have ~n/nBands rows each; the rank
    * window sorts per band partition, which at 100 TB wants nBands
    * sized so a band's (hash, id) pairs sort within executor spill
    * budgets — raise nBands (finer curriculum) to shrink partitions. */
  def curriculumOrder(scored: DataFrame, scoreCol: String = "score",
      nBands: Int = 10): DataFrame = {
    val band = least(greatest(floor(col(scoreCol) * nBands), lit(0.0)),
      lit((nBands - 1).toDouble)).cast("long")
    val b = scored.select(col("doc_id"), band.as("band"),
      hashPrefix("doc_id").as("h"))
    val w = Window.partitionBy(col("band")).orderBy(col("h"), col("doc_id"))
    val ranked = b.withColumn("rk", row_number().over(w).cast("long"))
    val totals = b.groupBy("band").agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val offs = exclusiveOffsets(totals, "band", "n", "off", _ > _)
    ranked.join(broadcast(offs), "band")
      .select(col("doc_id"), col("band"), (col("off") + col("rk")).as("pos"))
  }

  /** Uniform-token-budget mixture weights: given a total token budget,
    * the per-source sampling fraction that hits an equal token share per
    * source (capped at 1 — a small source contributes everything it
    * has). This is the config a [[stratifiedSample]]/[[weightedMix]] run
    * consumes: compute the weights ONCE from corpus stats, then apply
    * them as scan-level predicates; the under-budget slack from capped
    * sources is visible in the output for a second rebalancing pass if
    * the run wants one.
    *
    * Engine-portable: token counts are exact integer sums; the target is
    * floor(budget / n_sources) on identical ints; only `frac` divides —
    * one double op rounded 6dp. The per-source stats frame is
    * |sources|-row config-scale, so the unpartitioned count window runs
    * on a bounded frame (never on corpus rows). */
  /** Multi-epoch repeat plan under a uniform per-source token budget —
    * the companion [[budgetWeights]] reads when a source is SMALLER than
    * its share: how many epochs (repeats, capped at `maxEpochs` per the
    * data-constrained-scaling practice of bounding repetition) each
    * source contributes, the tokens actually planned, and the shortfall
    * that even max repetition cannot fill (the slack a second
    * rebalancing pass redistributes).
    *
    * Every column is exact integer arithmetic: target =
    * floor(budget/n_sources) (the mix3 convention), epochs =
    * min(maxEpochs, ceildiv(target, n_toks)) via integer `div`, planned =
    * min(target, epochs·n_toks). Engine-portable with no float anywhere.
    *
    * Scale: same shape as [[budgetWeights]] — one groupBy(source) with
    * map-side partials; the count window runs on the |sources|-row
    * config frame only. */
  def epochPlan(documents: DataFrame, totalBudget: Long,
      maxEpochs: Int = 4): DataFrame = {
    require(totalBudget > 0, "budget must be positive")
    require(maxEpochs >= 1, "at least one epoch")
    val per = documents.groupBy("source")
      .agg(sum(size(split(col("text"), "\\s+")).cast("long")).as("n_toks"))
    // integer `div`, not a double round-trip: the documented convention
    // is exact floor(budget/n_sources), and the double path diverges
    // from it for budgets above 2^53
    val target = expr(s"CAST($totalBudget AS BIGINT) div n_sources")
    per
      .withColumn("n_sources", count(lit(1)).over(Window.partitionBy()))
      .select(col("source"), col("n_toks"), target.as("target_toks"))
      .withColumn("epochs",
        least(lit(maxEpochs.toLong),
          expr("(target_toks + n_toks - 1) div n_toks")))
      .withColumn("planned_toks",
        least(col("target_toks"), col("epochs") * col("n_toks")))
      .withColumn("shortfall", col("target_toks") - col("planned_toks"))
  }

  /** DSIR-style hashed n-gram importance weights (Xie et al., "Data
    * Selection for Language Models via Importance Resampling",
    * NeurIPS 2023): score every RAW-side document by how much more
    * likely its bigrams are under the TARGET slice's hashed-bigram
    * distribution than under the raw slice's own — the standard
    * pretraining-data-selection statistic for steering a crawl toward a
    * curated reference corpus. weight(d) = Σ_{g ∈ bigrams(d)}
    * ln(p̂_target(bucket(g)) / p̂_raw(bucket(g))), both sides Laplace
    * (c+1)/(T+B) over B hash buckets; positive = more target-like.
    *
    * Portability: buckets are md5-PREFIX strings (hexChars chars, B =
    * 16^hexChars) — engine-identical with no numeric hex conversion —
    * and each bucket's log-ratio is one double op quantized to 1e-6
    * ints, so the per-doc row-spanning sum is exact int64 and only the
    * final /1e6 is float (the twin rule). Output (doc_id, n_ngrams,
    * weight) for raw docs with ≥ 1 bigram.
    *
    * Oracle caveat: the corpus-wide DuckDB twin (sel2) tokenizes with
    * the `[^a-z0-9]+` convention, which agrees with `Text.tokenizeUdf`
    * on Latin text only — the Spark side also emits CJK character
    * bigrams the SQL regex drops. On a corpus with real CJK text the
    * OPERATOR is fine (the tokenizer is the corpus-wide one) but that
    * twin under-counts those buckets; re-derive it with a CJK-aware SQL
    * tokenizer before hash-gating such a corpus. The CJK domain itself
    * IS hash-gated: `sel2z_dsir_cjk` runs this operator over inline CJK
    * text against a hand-tokenized oracle (the seg1 fixture pattern),
    * so a tokenizer/bucketing divergence on CJK fails loudly.
    *
    * Scale: TWO narrow token passes — one building the B-row bucket
    * table (map-side combinable groupBy), one scoring docs against the
    * broadcast weights (B ≤ 65536 by construction). Catalyst does not
    * dedup the shared ngram subplan, and checkpointing a corpus-scale
    * ngram frame to save one cheap columnar re-scan would be the wrong
    * trade at 100 TB (the e5 posture). Nothing else is
    * corpus-proportional. */
  def dsirWeights(documents: DataFrame, isTarget: Column,
      hexChars: Int = 2): DataFrame = {
    require(hexChars >= 1 && hexChars <= 4,
      "bucket key must be 1-4 hex chars (16..65536 buckets)")
    val b = math.pow(16.0, hexChars) // exact for hexChars <= 4
    val empty = slice(array(lit(1)), 1, 0)
    val wins = when(size(col("toks")) >= 2,
      sequence(lit(1), size(col("toks")) - 1)).otherwise(empty)
    val ng = documents
      .select(col("doc_id"), isTarget.as("is_t"),
        graft.functions.Text.tokenizeUdf(col("text")).as("toks"))
      .select(col("doc_id"), col("is_t"), explode(wins).as("i"),
        col("toks"))
      .select(col("doc_id"), col("is_t"),
        substring(md5(concat_ws(" ", slice(col("toks"), col("i"),
          lit(2)))), 1, hexChars).as("b"))
    val counts = ng.groupBy(col("b"))
      .agg(sum(when(col("is_t"), 1L).otherwise(0L)).as("ct"),
        sum(when(!col("is_t"), 1L).otherwise(0L)).as("cr"))
    val totals = counts.agg(sum(col("ct")).as("tt"),
      sum(col("cr")).as("tr"))
    // per-bucket quantized log-ratio — the ONLY float op before the
    // final division; same expression order as the oracle
    val wq = counts.crossJoin(totals)
      .select(col("b"),
        round(log(((col("ct") + 1.0) / (col("tt") + lit(b)))
          / ((col("cr") + 1.0) / (col("tr") + lit(b)))) * 1e6)
          .cast("long").as("wq"))
    ng.where(!col("is_t"))
      .join(broadcast(wq), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_ngrams"),
        round(sum(col("wq")).cast("double") / 1e6, 6).as("weight"))
  }

  /** DSIR selection — the RESAMPLING half of [[dsirWeights]]: k raw-side
    * docs drawn without replacement with probability proportional to
    * exp(weight / temperature), via the Gumbel-top-k identity (the k
    * largest perturbed keys equal k sequential proportional draws
    * without replacement — Vieira 2014). The Gumbel noise is
    * DETERMINISTIC, not RNG: u ∈ (0, 1) comes from the quadratic-
    * residue hash of doc_id (the bootstrapScoreCi replay discipline),
    * so a selection replays bit-for-bit in any engine and any re-run —
    * the reproducibility contract every op in this file carries.
    * `temperature` interpolates between proportional sampling (1.0) and
    * hard top-k by weight (→ 0; the noise is dominated).
    *
    * Scale: [[dsirWeights]]' two narrow passes + a DISTRIBUTED top-k —
    * k is config-scale, so the plan is TakeOrderedAndProject
    * (per-partition heads merged on the driver, no global sort, no
    * corpus-sized exchange; PlanSpec-pinned). Output (doc_id, n_ngrams,
    * weight, key), the k selected docs. */
  def dsirResample(documents: DataFrame, isTarget: Column, k: Int,
      temperature: Double = 1.0, hexChars: Int = 2): DataFrame = {
    require(k >= 1, "need a positive sample size")
    require(temperature > 0.0, "temperature must be positive")
    val M = 1000003L
    // pmod, not %, and the id reduced BEFORE the multiplies (the
    // weightedSample discipline above): a negative doc_id — routine
    // when ids come from a 64-bit hash — would otherwise drive u <= 0,
    // log() to NULL, and the doc silently out of every draw; reducing
    // first also keeps every product far under 2^63 in engines with
    // checked int64 math. TWO coprime residues of the full 64-bit id
    // feed the mix (1000003 and 999983, both prime), so two docs share
    // noise only when their ids are congruent mod BOTH — ids lcm ≈
    // 1e12 apart — not every ~1e6 as a single-residue mix would give;
    // at any realistic corpus the perturbations are pairwise distinct
    val y = pmod(pmod(col("doc_id"), lit(M)) * 131L
      + pmod(col("doc_id"), lit(999983L)) * 31L + 17L, lit(M))
    val u = (quadResidue(y, M) + 1.0) / (M + 2.0) // strictly in (0, 1)
    dsirWeights(documents, isTarget, hexChars)
      .withColumn("key",
        round(col("weight") / temperature - log(-log(u)), 6))
      .orderBy(col("key").desc, col("doc_id"))
      .limit(k)
  }

  /** SELECT-THEN-PACK — the deployment composition of the DSIR family
    * (the shape a selection actually ships in): the k docs
    * [[dsirResample]] draws, concatenated in doc_id order and cut into
    * `seqLen`-token training sequences via [[tokenOffsets]] — exactly
    * what e6 does for the curated keep-set, here for the selected set.
    * Output (doc_id, weight, n_tok, start_offset, chunk_id): the
    * selected doc, its importance weight (kept for mixture-audit
    * provenance), and its packed position.
    *
    * Scale: the selected set is k rows (config-scale), so BOTH joins
    * broadcast; the only corpus-proportional work is dsirWeights' two
    * narrow token passes. Token counts use the corpus-wide whitespace
    * convention (the e3/e6 packing space), not the DSIR scoring
    * tokenizer — packing counts what the trainer loads. */
  def dsirSelectedPack(documents: DataFrame, isTarget: Column, k: Int,
      temperature: Double = 1.0, hexChars: Int = 2,
      seqLen: Int = 4096): DataFrame = {
    // localCheckpoint: the k-row selection fans into TWO joins (the
    // corpus semi-join and the weight carry), and without the barrier
    // each would recompute dsirResample's corpus-wide token passes
    val sel = dsirResample(documents, isTarget, k, temperature, hexChars)
      .select(col("doc_id"), col("weight"))
      .localCheckpoint()
    val picked = documents.join(broadcast(sel.select(col("doc_id"))),
      Seq("doc_id"), "left_semi")
    tokenOffsets(picked, seqLen)
      .join(broadcast(sel), "doc_id")
      .select(col("doc_id"), col("weight"), col("n_tok"),
        col("start_offset"), col("chunk_id"))
  }

  /** The quadratic-residue mixing step of the portable-hash family —
    * (1013·y² + 2654435761·y) mod m for a pre-reduced y ∈ [0, m) with
    * m ≤ ~1.9e6 (keeps 2654435761·y under 2^63). The same polynomial
    * lives in `DataQuality.bootstrapScoreCi` (plain `%`, non-negative
    * inputs by construction) and, over modulus 2^32, in
    * `Similarity.portableWeight`; a constant change must be replicated
    * there. */
  private[ops] def quadResidue(y: Column, m: Long): Column = {
    require(m > 0 && m <= 1900000L,
      "modulus must keep 2654435761*y under 2^63")
    pmod(lit(1013L) * y * y + lit(2654435761L) * y, lit(m))
  }

  def budgetWeights(documents: DataFrame, totalBudget: Long): DataFrame = {
    require(totalBudget > 0, "budget must be positive")
    val per = documents.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), "\\s+")).cast("long")).as("n_toks"))
    // same integer-div convention as epochPlan (see the note there)
    val target = expr(s"CAST($totalBudget AS BIGINT) div n_sources")
    per
      .withColumn("n_sources",
        count(lit(1)).over(Window.partitionBy()))
      .select(col("source"), col("n_docs"), col("n_toks"),
        target.as("target_toks"),
        round(least(lit(1.0),
          target.cast("double") / col("n_toks")), 6).as("frac"))
  }
}
