package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.{col, udf}

/** Dictionary-driven CJK segmentation — the reference's IK analyzer
  * capability (realtime-dws .../util/IkUtil.java:14-35, ikanalyzer dep in
  * realtime-dws/pom.xml:210) re-expressed Spark-first:
  *
  *   - The dictionary is DATA, not a bundled resource: a word list loaded
  *     from any DataFrame (parquet table, JDBC dim, CDC config stream —
  *     the same config-as-data pattern as the X3 router). It is collected
  *     once (bounded by construction: segmentation dictionaries are
  *     config-scale, ~10^5 words, not corpus-scale) and broadcast, so
  *     executors segment locally with zero per-row lookups crossing the
  *     network — the analogue of IK loading its .dic files per JVM.
  *   - Segmentation is forward maximum matching (FMM, IK's core strategy):
  *     at each position of a CJK run the longest dictionary word wins;
  *     spans no dictionary word covers fall back to character bigrams —
  *     exactly `Text.tokenize`'s dictionary-free behavior, so an EMPTY
  *     dictionary reproduces Text.tokenize verbatim (spec-pinned) and a
  *     richer dictionary only ever improves fidelity.
  *   - Latin/digit runs tokenize as in `Text.tokenize` (lowercase words),
  *     keeping mixed-script text consistent across both tokenizers.
  *
  * Dictionary updates follow the config-as-data cadence: re-read the word
  * frame and rebuild the broadcast per micro-batch (Streams.routedSink
  * pattern) for streaming jobs, or per job for batch.
  */
object DictSegment {

  /** Immutable broadcastable dictionary: word set + longest word length
    * (bounds the FMM lookahead). */
  final class Dict private[DictSegment] (
      private[DictSegment] val words: java.util.HashSet[String],
      private[DictSegment] val maxLen: Int) extends Serializable {
    def size: Int = words.size
    def contains(w: String): Boolean = words.contains(w)
  }

  def buildDict(entries: Iterable[String]): Dict = {
    val set = new java.util.HashSet[String]()
    var maxLen = 1
    entries.foreach { w =>
      if (w != null && w.length >= 2) { // 1-char "words" add nothing: a
        set.add(w)                      // lone char is emitted anyway
        if (w.length > maxLen) maxLen = w.length
      }
    }
    new Dict(set, maxLen)
  }

  /** Load a dictionary from a word-list DataFrame. The collect is bounded
    * by construction (dictionaries are config-scale); corpus-derived
    * vocabularies should be thresholded before being passed here. */
  def fromFrame(words: DataFrame, column: String): Dict =
    buildDict(words.select(col(column)).collect().map(_.getString(0)))

  private def isCjk(c: Char): Boolean =
    (c >= 0x3400 && c <= 0x9fff) || (c >= 0x3040 && c <= 0x30ff) ||
    (c >= 0xac00 && c <= 0xd7af) || (c >= 0xf900 && c <= 0xfaff)

  /** Segment one string. Latin/digit runs -> lowercase words; CJK runs ->
    * FMM against the dictionary with char-bigram fallback on uncovered
    * spans (single uncovered char between matches emits as itself). */
  def segment(dict: Dict, s: String): Array[String] = {
    if (s == null) return Array.empty[String]
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val latin = new java.lang.StringBuilder
    val cjk = new java.lang.StringBuilder
    def endLatin(): Unit =
      if (latin.length > 0) { out += latin.toString; latin.setLength(0) }
    // bigram a dictionary-uncovered span (IK emits unknown chars as
    // singles; we keep Text.tokenize's bigram convention so the empty-dict
    // case degenerates exactly to the dictionary-free tokenizer)
    def emitOov(run: String, from: Int, until: Int): Unit = {
      val len = until - from
      if (len == 1) out += run.substring(from, until)
      else {
        var i = from
        while (i + 2 <= until) { out += run.substring(i, i + 2); i += 1 }
      }
    }
    def endCjk(): Unit = {
      if (cjk.length > 0) {
        val run = cjk.toString
        var i = 0
        var oovStart = -1
        while (i < run.length) {
          // longest dictionary word at i, capped by dict.maxLen
          var j = math.min(dict.maxLen, run.length - i)
          var hit = 0
          while (hit == 0 && j >= 2) {
            if (dict.contains(run.substring(i, i + j))) hit = j else j -= 1
          }
          if (hit > 0) {
            if (oovStart >= 0) { emitOov(run, oovStart, i); oovStart = -1 }
            out += run.substring(i, i + hit)
            i += hit
          } else {
            if (oovStart < 0) oovStart = i
            i += 1
          }
        }
        if (oovStart >= 0) emitOov(run, oovStart, run.length)
        cjk.setLength(0)
      }
    }
    var i = 0
    while (i < s.length) {
      val c = Character.toLowerCase(s.charAt(i))
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        endCjk()
        latin.append(c)
      } else if (isCjk(c)) {
        endLatin()
        cjk.append(c)
      } else {
        endLatin()
        endCjk()
      }
      i += 1
    }
    endLatin()
    endCjk()
    out.toArray
  }

  /** Broadcast the dictionary and return the segmentation UDF — the
    * KwSplit-with-dictionary form: `explode(segmentUdf(...)(col))`. */
  def segmentUdf(spark: SparkSession, dict: Dict): UserDefinedFunction = {
    val bc = spark.sparkContext.broadcast(dict)
    udf { (s: String) => segment(bc.value, s) }
  }
}
