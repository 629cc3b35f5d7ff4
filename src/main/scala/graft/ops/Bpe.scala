package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training and application — the vocabulary
  * step of a training-data pipeline.
  *
  * Scale design mirrors production trainers (SentencePiece / HF
  * tokenizers): the corpus contributes ONE distributed pass — word
  * frequencies, map-side combined, bounded below by `minCount` — and the
  * merge loop then runs over that bounded word-frequency table
  * driver-side. The corpus is never re-scanned per merge (the textbook
  * per-iteration re-tokenization would be `numMerges` Spark jobs over
  * 100 TB; the word-table form is exact for whitespace-pretokenized BPE
  * because merges never cross word boundaries). Encoding broadcasts the
  * ranked merge list and applies it greedily per word — narrow, no
  * shuffle, and cacheable per distinct word inside each task.
  *
  * Determinism: merge selection is (max pair count, then lexicographically
  * smallest pair), so a trained vocabulary is reproducible run to run —
  * the same property every sampling op here guarantees.
  */
object Bpe {

  /** The one distributed step: corpus word frequencies (lowercased
    * alnum runs), thresholded to bound the driver-side table. */
  def wordCounts(documents: DataFrame, minCount: Long = 1L): DataFrame =
    documents
      .select(explode(split(lower(col("text")), "[^a-z0-9]+")).as("word"))
      .where(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount)

  /** Greedy BPE merge training over a word-frequency table. Returns the
    * merges in application order. */
  def trainMerges(words: Array[(String, Long)],
      numMerges: Int): Seq[(String, String)] = {
    // each word as a mutable symbol sequence, starting from characters
    val seqs = words.map { case (w, c) =>
      (scala.collection.mutable.ArrayBuffer(w.map(_.toString): _*), c)
    }
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var i = 0
    var done = false
    while (i < numMerges && !done) {
      val counts = scala.collection.mutable.HashMap[(String, String), Long]()
      seqs.foreach { case (s, c) =>
        var j = 0
        while (j + 1 < s.length) {
          val p = (s(j), s(j + 1))
          counts.update(p, counts.getOrElse(p, 0L) + c)
          j += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        // deterministic: max count, ties to the lexicographically
        // smallest pair
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        val joined = best._1 + best._2
        seqs.foreach { case (s, _) =>
          var j = 0
          while (j + 1 < s.length) {
            if (s(j) == best._1 && s(j + 1) == best._2) {
              s.update(j, joined)
              s.remove(j + 1)
            } else j += 1
          }
        }
        i += 1
      }
    }
    merges.toSeq
  }

  /** End-to-end training: word-count pass + driver-side merge loop.
    *
    * The collected word table is HARD-BOUNDED by `maxVocab` (the
    * `minCount` threshold alone is a weak bound on a 100 TB CJK-scale
    * corpus): a `maxVocab+1` probe decides, and a corpus whose vocabulary
    * exceeds the cap degrades gracefully to training on the `maxVocab`
    * MOST FREQUENT words (cnt desc, word asc ties — a deterministic
    * distributed TakeOrdered, nothing unbounded driver-side). Training on
    * the frequency head is exactly what production tokenizers do with a
    * vocab bound; the tail words it drops are the ones too rare to win a
    * merge anyway. Same probe-then-branch shape as
    * `TextAnalysis.lmScoreAgainst`. */
  def train(documents: DataFrame, numMerges: Int,
      minCount: Long = 1L, maxVocab: Int = 1000000): Seq[(String, String)] = {
    require(maxVocab >= 1, s"maxVocab must be >= 1, got $maxVocab")
    // materialize once: the probe and the over-cap TakeOrdered both read
    // it, and the corpus tokenize+agg subtree should not run twice
    val wc = wordCounts(documents, minCount).localCheckpoint()
    val probe = wc.limit(maxVocab + 1).collect()
    val rows =
      if (probe.length <= maxVocab) probe
      else wc.orderBy(col("cnt").desc, col("word")).limit(maxVocab).collect()
    trainMerges(
      rows.map(r => r.getString(0) -> r.getLong(1))
        .sortBy(_._1), // stable input order for deterministic training
      numMerges)
  }

  /** Apply trained merges to one word: replay merges in rank order
    * (greedy BPE application — equivalent to lowest-rank-first pairs). */
  def encodeWord(word: String,
      rank: Map[(String, String), Int]): Array[String] = {
    var s = word.map(_.toString).toArray
    var changed = true
    while (changed && s.length > 1) {
      // find the lowest-rank adjacent pair
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var j = 0
      while (j + 1 < s.length) {
        rank.get((s(j), s(j + 1))).foreach { r =>
          if (r < bestRank) { bestRank = r; bestIdx = j }
        }
        j += 1
      }
      if (bestIdx < 0) changed = false
      else {
        val merged = s(bestIdx) + s(bestIdx + 1)
        s = (s.take(bestIdx) :+ merged) ++ s.drop(bestIdx + 2)
      }
    }
    s
  }

  /** Subword tokenization UDF: text -> array of BPE tokens. The ranked
    * merge list broadcasts; per-word results are memoized in a cache held
    * by the UDF closure — one map per deserialized UDF instance, shared
    * across all rows of a task (the Zipfian word distribution makes the
    * hit rate ~1). ConcurrentHashMap keeps a shared instance thread-safe
    * in local mode; its size is bounded by the corpus vocabulary. */
  def encodeUdf(spark: SparkSession,
      merges: Seq[(String, String)]): UserDefinedFunction = {
    val rank = merges.zipWithIndex.toMap
    val bc = spark.sparkContext.broadcast(rank)
    val cache =
      new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()
    udf { (text: String) =>
      Option(text).getOrElse("").toLowerCase(java.util.Locale.ROOT)
        .split("[^a-z0-9]+").iterator
        .filter(_.nonEmpty)
        .flatMap(w =>
          cache.computeIfAbsent(w, k => encodeWord(k, bc.value)))
        .toArray
    }
  }

  /** Per-doc subword statistics under a trained vocabulary: token count
    * and the compression ratio vs characters — the "how many tokens is my
    * corpus" question every training run asks. */
  def subwordStats(documents: DataFrame, numMerges: Int = 200,
      minCount: Long = 1L, maxVocab: Int = 1000000): DataFrame = {
    val spark = documents.sparkSession
    val enc = encodeUdf(spark,
      train(documents, numMerges, minCount, maxVocab))
    documents.select(col("doc_id"),
      size(enc(col("text"))).as("n_subtokens"),
      length(col("text")).as("n_chars"))
  }
}
