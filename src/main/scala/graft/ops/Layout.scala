package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Storage-layout operators for multi-dimensional data skipping — the
  * piece of a 100 TB deployment that lives BELOW the queries: how rows
  * are assigned to files decides how many files a predicate can prune
  * via parquet min/max footer stats. A single-column sort gives perfect
  * pruning on that column and none on any other; a Z-order (Morton)
  * layout interleaves the bits of two columns so every file covers a
  * small RECTANGLE of the key space — predicates on EITHER column prune
  * most files (the layout Delta's OPTIMIZE ZORDER BY and ClickHouse's
  * space-filling-curve indexes deploy).
  *
  * The z-value is pure integer arithmetic (mask/shift/or — the classic
  * 4-step bit-spread), so it is portable to any engine bit-for-bit and
  * stays inside whole-stage codegen on the Spark side: no UDF, no join,
  * evaluated at the scan.
  */
object Layout {

  /** Spread the low 16 bits of `c` so bit i lands at position 2i
    * (0 elsewhere) — the standard mask-doubling Morton step sequence. */
  def spreadBits(c: Column): Column = {
    var x = c.bitwiseAND(lit(65535L))
    x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FFL))
    x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x33333333L))
    x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton z-value of two 16-bit keys: x's bit i at position
    * 2i+1, y's at 2i. Columns are masked to 16 bits first, so any
    * integer input is safe (the caller chooses which 16 bits matter —
    * typically `pmod` or a bucket id). */
  def zValue(xc: Column, yc: Column): Column =
    shiftleft(spreadBits(xc), 1).bitwiseOR(spreadBits(yc))

  /** Driver-side reference of [[zValue]] for specs: naive bit loop. */
  private[graft] def zValueRef(x: Long, y: Long): Long = {
    var z = 0L
    var b = 0
    while (b < 16) {
      z |= ((x >> b) & 1L) << (2 * b + 1)
      z |= ((y >> b) & 1L) << (2 * b)
      b += 1
    }
    z
  }

  /** The layout writer's shape: z-value appended, range-partitioned on it
    * (each output partition = one contiguous z-range = one small (x, y)
    * rectangle), rows inside a partition sorted by z so row-group-level
    * stats stay tight too. Write the result with any parquet sink and the
    * file footers carry tight min/max on BOTH dimensions. */
  def zOrderRepartition(df: DataFrame, xc: Column, yc: Column,
      numPartitions: Int): DataFrame =
    df.withColumn("zval", zValue(xc, yc))
      .repartitionByRange(numPartitions, col("zval"))
      .sortWithinPartitions(col("zval"))

  /** Per-z-bucket bounding-box stats — the queryable form of the layout's
    * pruning promise, and the oracle-gated query surface: keys are masked
    * to `maskBits` bits per dimension (match it to the columns' actual
    * range, or the high z bits are constant and every row lands in one
    * bucket), bucket = z >> (2·maskBits − bucketBits) models "file" (a
    * contiguous z-range); for each, the row count and the min/max
    * rectangle of both dimensions. Tight rectangles on BOTH columns are
    * exactly what makes footer-stat pruning work for predicates on either
    * column. All-integer output. */
  def zOrderStats(df: DataFrame, xc: Column, yc: Column,
      bucketBits: Int = 8, maskBits: Int = 16): DataFrame = {
    require(maskBits >= 1 && maskBits <= 16 && bucketBits >= 1 &&
      bucketBits <= 2 * maskBits, "need 1 <= bucketBits <= 2*maskBits <= 32")
    val mask = (1L << maskBits) - 1L
    val x = xc.bitwiseAND(lit(mask))
    val y = yc.bitwiseAND(lit(mask))
    df.select(x.as("x"), y.as("y"))
      .where(col("x").isNotNull && col("y").isNotNull)
      .withColumn("bucket", shiftright(zValue(col("x"), col("y")),
        2 * maskBits - bucketBits))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("x")).as("x_min"), max(col("x")).as("x_max"),
        min(col("y")).as("y_min"), max(col("y")).as("y_max"))
  }
}
