package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, fully declarative
  * (zip_with / aggregate stay inside codegen'd expression evaluation — no
  * UDF serialization on the hot path). Elements are cast to double before
  * arithmetic so accumulation precision matches the DuckDB oracle.
  */
object Vectors {

  private def d(a: Column): Column = transform(a, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** NaN (not an ANSI DIVIDE_BY_ZERO error) when either vector has zero
    * norm: the rankers treat "no meaningful cosine" as an excludable NaN,
    * and under Spark 4's default ANSI mode a bare `/` would instead kill
    * the whole query on the first degenerate vector. */
  def cosine(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom === 0.0, lit(Double.NaN)).otherwise(dot(a, b) / denom)
  }

  /** Hot-path kernels as native Catalyst expressions (VecExpressions):
    * no per-call boxing, tight primitive loops under whole-stage codegen,
    * ascending-index accumulation — bit-identical to the declarative forms
    * above and to the DuckDB oracle. */
  def dotFast(a: Column, b: Column): Column = VecExpressions.vecDot(a, b)

  def normFast(a: Column): Column = VecExpressions.vecNorm(a)

  /** Same zero-norm -> NaN contract as `cosine` (ANSI-safe). */
  def cosineFast(aEmb: Column, bEmb: Column, aNorm: Column,
      bNorm: Column): Column = {
    val denom = aNorm * bNorm
    when(denom === 0.0, lit(Double.NaN))
      .otherwise(dotFast(aEmb, bEmb) / denom)
  }

  private[functions] def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Random-hyperplane signatures for ALL hash tables in one pass: element
    * t of the result packs `bits` sign bits of pseudo-random ±1 hyperplane
    * projections for table t. Planes derive deterministically from
    * (tableId, bit, dim) via a splitmix-style index mix — no training pass,
    * identical on every executor. */
  /** Codegen form of [[sigsUdf]] — same signatures bit for bit
    * (spec-pinned parity), evaluated as a native expression with a
    * precomputed ±1 sign table instead of a per-row Scala UDF; the
    * deployed path for every signature consumer. */
  def sigsFast(a: Column, dims: Int, bits: Int, tables: Int): Column =
    VecExpressions.signBits(a, dims, bits, tables)

  /** Kept as [[sigsFast]]'s independent reference implementation (the
    * parity spec compares the two) — not called on any query path. */
  def sigsUdf(dims: Int, bits: Int, tables: Int)
      : org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (a: Seq[Float]) =>
      Array.tabulate(tables) { t =>
        var sig = 0L
        var b = 0
        while (b < bits) {
          var proj = 0.0
          var i = 0
          val n = math.min(dims, a.length)
          while (i < n) {
            val c = if (mix(t.toLong * 1000003L + b * 1009L + i) >= 0) 1.0 else -1.0
            proj += a(i).toDouble * c
            i += 1
          }
          if (proj >= 0) sig |= (1L << b)
          b += 1
        }
        sig
      }
    }
}
