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

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Random-hyperplane signature: `bits` sign bits packed into a long.
    * Planes are pseudo-random ±1 hyperplanes derived deterministically from
    * (tableId, bit, dim) via a splitmix-style mix of the indices — no
    * training pass, identical on every executor, cheap to inline as a
    * literal-free expression.
    */
  def hyperplaneSig(emb: Column, dims: Int, bits: Int, tableId: Int): Column = {
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val bitCols = (0 until bits).map { b =>
      val coeffs = (0 until dims).map { i =>
        if (mix(tableId.toLong * 1000003L + b * 1009L + i) >= 0) 1.0 else -1.0
      }
      val proj = aggregate(
        zip_with(transform(emb, x => x.cast("double")),
          array(coeffs.map(lit(_)): _*), (x, c) => x * c),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, lit(1L << b)).otherwise(lit(0L))
    }
    bitCols.reduce((a, b) => a + b)
  }
}
