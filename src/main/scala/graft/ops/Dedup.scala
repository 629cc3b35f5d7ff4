package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication suite for training-data pipelines: exact, n-gram Jaccard,
  * MinHash+LSH, SimHash, and embedding-cosine near-dup.
  *
  * Scale design: every near-dup variant is candidate-generation-first —
  * pairs are only materialized inside a bucket (LSH band, SimHash chunk,
  * hyperplane bucket), never via a global cross join. Exact verification
  * (Jaccard / Hamming / cosine) runs only on candidates. At 100 TB the
  * bucket join shuffles O(n · bands) rows, and AQE's skew split handles a
  * hot bucket.
  */
object Dedup {

  private def normText = trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " "))

  /** Exact dedup by content hash of normalized text: one row per distinct
    * content with the kept (minimum) doc id and the duplicate count. */
  def exactDuplicates(documents: DataFrame): DataFrame =
    documents
      .groupBy(md5(normText).as("fingerprint"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("cnt"))

  /** Distinct word n-gram shingles per document (the common substrate of
    * the Jaccard and MinHash paths). */
  def shingles(documents: DataFrame, n: Int): DataFrame = {
    val toks = graft.functions.Text.tokenizeUdf(col("text"))
    documents.select(col("doc_id"),
      explode(array_distinct(transform(
        sequence(lit(0), greatest(size(toks) - n, lit(0))),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))).as("shingle"))
      .where(col("shingle") =!= "")
      .distinct()
  }

  /** Exact n-gram Jaccard near-dup pairs: candidates = docs sharing >=1
    * shingle (inverted-index join), then jaccard = |∩| / |∪| >= threshold.
    * doc1 < doc2 canonical order. */
  def jaccardPairs(documents: DataFrame, n: Int, threshold: Double): DataFrame = {
    val sh = shingles(documents, n).cache()
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val common = sh.toDF("doc1", "shingle")
      .join(sh.toDF("doc2", "shingle"), "shingle")
      .where(col("doc1") < col("doc2"))
      .groupBy(col("doc1"), col("doc2")).agg(count(lit(1)).as("common"))
    common
      .join(sizes.toDF("doc1", "sz1"), "doc1")
      .join(sizes.toDF("doc2", "sz2"), "doc2")
      .withColumn("jaccard",
        col("common") / (col("sz1") + col("sz2") - col("common")))
      .where(col("jaccard") >= threshold)
      .select(col("doc1"), col("doc2"), col("jaccard"))
  }

  /** MinHash signature: `numHashes` permutation-min hashes over the shingle
    * set. h_i(s) = mix(xxhash64(s) * A_i + B_i) with fixed odd constants —
    * deterministic, no stored hash family. Signature laid out as
    * (doc_id, hash_idx, min_hash) rows grouped into band arrays.
    */
  def minhashBands(documents: DataFrame, n: Int, numHashes: Int,
      bands: Int): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    val sh = shingles(documents, n)
    val hashCols = (0 until numHashes).map { i =>
      min(xxhash64(col("shingle"), lit(i))).as(s"h$i")
    }
    val sig = sh.groupBy(col("doc_id")).agg(hashCols.head, hashCols.tail: _*)
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64((b * rowsPerBand until (b + 1) * rowsPerBand)
          .map(i => col(s"h$i")): _*).as("band_sig"))
    }
    sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"),
        col("bs.band_sig").as("band_sig"))
  }

  /** MinHash+LSH candidate pairs: docs agreeing on >=1 full band. */
  def minhashCandidates(documents: DataFrame, n: Int = 3,
      numHashes: Int = 32, bands: Int = 8): DataFrame = {
    val b = minhashBands(documents, n, numHashes, bands)
    b.toDF("doc1", "band", "band_sig")
      .join(b.toDF("doc2", "band", "band_sig"), Seq("band", "band_sig"))
      .where(col("doc1") < col("doc2"))
      .select(col("doc1"), col("doc2")).distinct()
  }

  /** MinHash+LSH near-dup pairs: candidates verified by exact Jaccard. */
  def minhashDuplicates(documents: DataFrame, n: Int = 3,
      numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.5): DataFrame = {
    val cand = minhashCandidates(documents, n, numHashes, bands)
    val sh = shingles(documents, n).cache()
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    cand
      .join(sh.toDF("doc1", "shingle"), "doc1")
      .join(sh.toDF("doc2", "shingle"), Seq("doc2", "shingle"))
      .groupBy(col("doc1"), col("doc2")).agg(count(lit(1)).as("common"))
      .join(sizes.toDF("doc1", "sz1"), "doc1")
      .join(sizes.toDF("doc2", "sz2"), "doc2")
      .withColumn("jaccard",
        col("common") / (col("sz1") + col("sz2") - col("common")))
      .where(col("jaccard") >= threshold)
      .select(col("doc1"), col("doc2"), col("jaccard"))
  }

  /** Prefix-filtered exact Jaccard (PPJoin-style): identical result set to
    * `jaccardPairs`, far smaller candidate join ON SKEWED CORPORA. Docs are
    * joined only on their PREFIX shingles — the (sz - ceil(t*sz) + 1)
    * globally-rarest shingles of each doc. Any pair with jaccard >= t
    * shares at least one prefix shingle (pigeonhole on the overlap lower
    * bound), so no qualifying pair is lost; hot shingles (the quadratic
    * blowup in the inverted-index join) land at the END of the frequency
    * order and mostly drop out of prefixes. Exact |∩| is then recounted on
    * full shingle sets for candidates only.
    *
    * Measured on the driver test data (uniform vocabulary, NO hot
    * shingles): direct join 1.3 s vs prefix 8.8 s warm at sf0.1 — the
    * extra frequency/rank shuffles only pay off when the shingle df
    * distribution is Zipfian (real text). `jaccardPairs` stays the default;
    * this is the skew path. */
  def jaccardPairsPrefix(documents: DataFrame, n: Int,
      threshold: Double): DataFrame = {
    val sh = shingles(documents, n).cache()
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val freq = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    val ranked = sh.join(freq, "shingle").join(sizes, "doc_id")
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id"))
          .orderBy(col("df"), col("shingle"))))
      .where(col("rk") <= col("sz") - ceil(lit(threshold) * col("sz")) + 1)
      .select(col("doc_id"), col("shingle"))
    val cand = ranked.toDF("doc1", "shingle")
      .join(ranked.toDF("doc2", "shingle"), "shingle")
      .where(col("doc1") < col("doc2"))
      .select(col("doc1"), col("doc2")).distinct()
    cand
      .join(sh.toDF("doc1", "shingle"), "doc1")
      .join(sh.toDF("doc2", "shingle"), Seq("doc2", "shingle"))
      .groupBy(col("doc1"), col("doc2")).agg(count(lit(1)).as("common"))
      .join(sizes.toDF("doc1", "sz1"), "doc1")
      .join(sizes.toDF("doc2", "sz2"), "doc2")
      .withColumn("jaccard",
        col("common") / (col("sz1") + col("sz2") - col("common")))
      .where(col("jaccard") >= threshold)
      .select(col("doc1"), col("doc2"), col("jaccard"))
  }

  /** End-to-end dedup pass: drop every doc that is an exact OR near
    * duplicate (n-gram Jaccard >= threshold) of a lower-id keeper — the
    * "deduplicate the corpus" pipeline a training-data run executes.
    * Anti-join against the duplicate side keeps the plan shuffle-light:
    * candidates come from the bucketed near-dup path, never a cross join. */
  def dedupedCorpus(documents: DataFrame, n: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    val dupIds = jaccardPairs(documents, n, threshold)
      .select(col("doc2").as("doc_id")).distinct()
    documents.join(dupIds, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("source"))
  }

  /** Fuzzy verification of candidate pairs by edit distance: levenshtein
    * over normalized 40-char prefixes (bounded cost per pair) — the
    * string-similarity check that complements set-based Jaccard. Runs only
    * on LSH candidates, never all pairs. */
  def editDistancePairs(documents: DataFrame, maxDist: Int = 10): DataFrame = {
    val sh = shingles(documents, 3)
    val cand = sh.toDF("doc1", "shingle")
      .join(sh.toDF("doc2", "shingle"), "shingle")
      .where(col("doc1") < col("doc2"))
      .select(col("doc1"), col("doc2")).distinct()
    val prefix = documents.select(col("doc_id"),
      substring(trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")),
        1, 40).as("p"))
    cand
      .join(prefix.toDF("doc1", "p1"), "doc1")
      .join(prefix.toDF("doc2", "p2"), "doc2")
      .select(col("doc1"), col("doc2"),
        levenshtein(col("p1"), col("p2")).as("edit_dist"))
      .where(col("edit_dist") <= maxDist)
  }

  /** Connected components over the near-dup pair graph: iterative min-label
    * propagation until fixpoint (transitive closure of "is a near-dup of").
    * Each doc ends with cluster_id = smallest doc_id reachable through dup
    * edges — the canonical representative. Iterations are whole-graph
    * DataFrame joins (checkpoint-friendly, no driver-side graph); diameter
    * of dup clusters is tiny in practice so this converges in 2-4 rounds.
    */
  def dupClusters(documents: DataFrame, n: Int = 3,
      threshold: Double = 0.5, maxIter: Int = 10): DataFrame = {
    val pairs = jaccardPairs(documents, n, threshold)
      .select(col("doc1"), col("doc2")).cache()
    // only nodes that appear in a pair need propagation — typically a tiny
    // fraction of the corpus; everyone else keeps their own id. Iterations
    // therefore join frames of O(|dup docs|), not O(|corpus|).
    val edges = pairs
      .union(pairs.select(col("doc2").as("doc1"), col("doc1").as("doc2")))
      .cache()
    var labels = edges.select(col("doc1").as("doc_id")).distinct()
      .select(col("doc_id"), col("doc_id").as("cluster_id")).cache()
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIter) {
      // each node adopts min(own label, neighbors' labels)
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("doc_id", "doc2"), Seq("doc2"))
        .groupBy(col("doc1").as("doc_id"))
        .agg(min(col("cluster_id")).as("n_min"))
      val next = labels.join(viaNeighbors, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("cluster_id"), coalesce(col("n_min"), col("cluster_id")))
            .as("cluster_id"))
        .cache()
      changed = next.join(labels.withColumnRenamed("cluster_id", "old"),
        Seq("doc_id")).where(col("cluster_id") =!= col("old")).count()
      labels.unpersist()
      labels = next
      it += 1
    }
    documents.select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
  }

  /** 64-bit SimHash over tokens: bit j is the sign of the token-frequency-
    * weighted sum of (+-1) for bit j of each token's 64-bit hash. Single
    * tight-loop UDF per row (tokenize + vote + pack) — no explode, no
    * shuffle, one pass over the text. */
  private val simhashUdf = udf { (text: String) =>
    val votes = new Array[Int](64)
    if (text != null) {
      text.toLowerCase.split("[^a-z0-9]+").foreach { t =>
        if (t.nonEmpty) {
          // 64-bit token hash from two 32-bit murmur passes
          val h1 = scala.util.hashing.MurmurHash3.stringHash(t, 0)
          val h2 = scala.util.hashing.MurmurHash3.stringHash(t, 0x9747b28c)
          val h = (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
          var j = 0
          while (j < 64) {
            if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
            j += 1
          }
        }
      }
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  def simhash(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"), simhashUdf(col("text")).as("simhash"))

  /** SimHash near-dup pairs with Hamming distance <= maxHamming, candidates
    * via 4x16-bit chunk banding (pigeonhole: distance <=3 implies an equal
    * chunk). */
  def simhashPairs(documents: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sig = simhash(documents)
    val chunks = sig.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(c =>
        struct(lit(c).as("chunk"),
          shiftright(col("simhash"), c * 16).bitwiseAND(0xffffL)
            .as("chunk_val"))): _*)).as("ck"))
      .select(col("doc_id"), col("simhash"),
        col("ck.chunk").as("chunk"), col("ck.chunk_val").as("chunk_val"))
    chunks.toDF("doc1", "sim1", "chunk", "chunk_val")
      .join(chunks.toDF("doc2", "sim2", "chunk", "chunk_val"),
        Seq("chunk", "chunk_val"))
      .where(col("doc1") < col("doc2"))
      .select(col("doc1"), col("doc2"),
        bit_count(col("sim1").bitwiseXOR(col("sim2"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** Embedding-cosine near-dup pairs: hyperplane-LSH buckets (L tables of
    * b bits) generate candidates; exact cosine >= threshold verifies.
    * Only ids travel through the bucket join + dedup; embeddings and
    * precomputed norms are re-attached afterwards for the cosine check. */
  def embeddingNearDup(embeddings: DataFrame, threshold: Double = 0.95,
      bits: Int = 12, tables: Int = 4, dims: Int = 64): DataFrame = {
    import graft.functions.Vectors
    val sigs = embeddings.select(col("vec_id"),
      posexplode(Vectors.sigsUdf(dims, bits, tables)(col("embedding")))
        .as(Seq("tbl", "sig")))
    val candIds = sigs.toDF("vec1", "tbl", "sig")
      .join(sigs.toDF("vec2", "tbl", "sig"), Seq("tbl", "sig"))
      .where(col("vec1") < col("vec2"))
      .select(col("vec1"), col("vec2")).distinct()
    val base = embeddings.select(col("vec_id"), col("embedding"),
      Vectors.normFast(col("embedding")).as("nrm"))
    candIds
      .join(base.toDF("vec1", "emb1", "nrm1"), "vec1")
      .join(base.toDF("vec2", "emb2", "nrm2"), "vec2")
      .withColumn("cos", Vectors.cosineFast(col("emb1"), col("emb2"),
        col("nrm1"), col("nrm2")))
      .where(col("cos") >= threshold)
      .select(col("vec1"), col("vec2"), col("cos"))
  }
}
