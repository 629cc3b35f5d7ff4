package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Elementwise sum of an `array<float>` column, as a typed `Aggregator` —
  * the Lloyd M-step's shuffle shape for a 100 TB corpus.
  *
  * The explode-based mean (`posexplode` to (id, dim, x) rows, then
  * groupBy) is fine for ONE pass but forces the iterating caller to
  * materialize the n·dims exploded frame to reuse it across rounds —
  * at corpus scale that checkpoint is the dominant memory/storage cost
  * of training. This Aggregator keeps the per-task state at k buffers of
  * `dims` doubles (k = group count): partial sums combine map-side, the
  * shuffle carries k·dims doubles per task, and each training round is
  * ONE scan of the raw vectors with no joins and nothing persisted.
  * Summation order (sequential within a partition, arbitrary merge order
  * across partitions) matches the double-sum semantics of the explode
  * form — both are parallel double sums; consumers round before use.
  *
  * Null/ragged care: null arrays are skipped; ragged lengths clamp to
  * the shorter (callers feed fixed-dims embeddings, the clamp just keeps
  * the buffer total rather than throwing mid-shuffle). */
class VecSum extends Aggregator[Seq[Float], Array[Double], Seq[Double]] {
  override def zero: Array[Double] = Array.emptyDoubleArray

  override def reduce(b: Array[Double], a: Seq[Float]): Array[Double] = {
    if (a == null) return b
    val buf = if (b.length == 0) new Array[Double](a.length) else b
    var i = 0
    val n = math.min(buf.length, a.length)
    while (i < n) { buf(i) += a(i); i += 1 }
    buf
  }

  override def merge(x: Array[Double], y: Array[Double]): Array[Double] = {
    if (x.length == 0) return y
    if (y.length == 0) return x
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) { x(i) += y(i); i += 1 }
    x
  }

  override def finish(r: Array[Double]): Seq[Double] = r.toSeq
  override def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder()
}

/** [[VecSum]] over an `array<double>` column (callers that already hold
  * doubles — synthetic frames, pre-widened pipelines). Same buffer and
  * merge discipline. */
class VecSumD extends Aggregator[Seq[Double], Array[Double], Seq[Double]] {
  override def zero: Array[Double] = Array.emptyDoubleArray

  override def reduce(b: Array[Double], a: Seq[Double]): Array[Double] = {
    if (a == null) return b
    val buf = if (b.length == 0) new Array[Double](a.length) else b
    var i = 0
    val n = math.min(buf.length, a.length)
    while (i < n) { buf(i) += a(i); i += 1 }
    buf
  }

  override def merge(x: Array[Double], y: Array[Double]): Array[Double] =
    (new VecSum).merge(x, y)

  override def finish(r: Array[Double]): Seq[Double] = r.toSeq
  override def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder()
}

object VecSumAgg {
  /** Column form: elementwise double sum of an `array<float>` column. */
  def vecSum(c: Column): Column =
    udaf(new VecSum, ExpressionEncoder[Seq[Float]]()).apply(c)

  /** Column form for an `array<double>` column. */
  def vecSumD(c: Column): Column =
    udaf(new VecSumD, ExpressionEncoder[Seq[Double]]()).apply(c)
}
