package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expressions for the vector hot path.
  *
  * A Scala UDF over `array<float>` boxes every element into a Seq per call
  * (~24 us/pair measured); these expressions read the underlying ArrayData
  * directly and generate a tight primitive loop under whole-stage codegen.
  * Preference order (b) from the build guide: custom Expression before UDF.
  */
object VecElemType {
  /** "getFloat" or "getDouble" for an array expression's element type —
    * the float/double-agnostic read the vector expressions share (float
    * widens to double exactly, so both input types sum identically). */
  def getter(e: Expression): String = e.dataType match {
    case org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.FloatType, _) => "getFloat"
    case _ => "getDouble"
  }
}

case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private lazy val (getL, getR) =
    (VecElemType.getter(left), VecElemType.getter(right))

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (fx, fy) = (getL == "getFloat", getR == "getFloat")
    var s = 0.0
    var i = 0
    val n = math.min(x.numElements(), y.numElements())
    while (i < n) {
      val xv = if (fx) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (fy) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |double $s = 0.0;
         |int $n = Math.min($x.numElements(), $y.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ((double) $x.$getL($i)) * ((double) $y.$getR($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Squared L2 distance between two vector columns (float or double
  * arrays, mixed ok) — the pairwise form of [[NearestCentroid]]'s inner
  * loop, for the two-level assignment's fine stage where the centroid is
  * a JOINED COLUMN (a frame-resident model) rather than a codegen
  * literal. Ascending-dim summation, only dims present in BOTH arrays
  * contribute — identical accumulation order and bounds to
  * NearestCentroid, so the two paths rank cells consistently. */
case class FloatVecSqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private lazy val (getL, getR) =
    (VecElemType.getter(left), VecElemType.getter(right))

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (fx, fy) = (getL == "getFloat", getR == "getFloat")
    var s = 0.0
    var i = 0
    val n = math.min(x.numElements(), y.numElements())
    while (i < n) {
      val xv = if (fx) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (fy) y.getFloat(i).toDouble else y.getDouble(i)
      val d = xv - yv
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |double $s = 0.0;
         |int $n = Math.min($x.numElements(), $y.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = ((double) $x.$getL($i)) - ((double) $y.$getR($i));
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Euclidean norm of an array<float> (or array<double>) column. */
case class FloatVecNorm(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  private lazy val get = VecElemType.getter(child)

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val f = get == "getFloat"
    var s = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) {
      val v = if (f) x.getFloat(i).toDouble else x.getDouble(i)
      s += v * v
      i += 1
    }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      s"""
         |double $s = 0.0;
         |int $n = $x.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = (double) $x.$get($i);
         |  $s += $v * $v;
         |}
         |${ev.value} = Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Argmin centroid id for an `array<double>` point against a bounded
  * centroid table — the Lloyd/IVF assignment step as ONE codegen loop.
  *
  * The explode-join formulation materializes n·k·dims ROWS per assign
  * pass (the sf1 bench point measured it: corpus-scaled k turned the
  * shuffle into the dominant cost); this expression keeps the same
  * n·k·dims FLOPS but touches each input row once — centroids ride
  * along as a flat codegen reference array (k·dims doubles, bounded by
  * config: ~50 MB even at k=100k·64 dims). Per-centroid distance sums
  * run in ascending-dim order (the oracle's `list_sum` order), and ties
  * keep the SMALLEST cid — exactly `min(struct(d, cid))`, the contract
  * every kmeans-family oracle pins. `cids` carries the (possibly
  * non-contiguous after an emptied cluster) cluster labels positionally
  * parallel to `flat`'s k rows. */
case class NearestCentroid(child: Expression, flat: Array[Double],
    cids: Array[Int], dims: Int) extends UnaryExpression {
  require(dims > 0 && flat.length == cids.length * dims,
    "flat centroid array must be cids.length x dims")

  override def dataType: DataType =
    org.apache.spark.sql.types.IntegerType

  // array<float> is read natively (float->double widening is exact, so
  // distances equal the transform(cast)-to-double formulation bit for
  // bit) — routing the cast through a higher-order `transform` lambda
  // would kick the WHOLE projection out of whole-stage codegen (HOFs are
  // interpreted-only), which the PlanSpec one-pass test pins
  private lazy val isFloat = child.dataType match {
    case org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    // a vector shorter than the centroid dimensionality contributes only
    // its present dims (UnsafeArrayData getters past numElements are NOT
    // bounds-checked — reading them would be silent garbage, and the old
    // explode-join form summed only joined dims, i.e. this same min)
    val lim = math.min(dims, x.numElements())
    var best = -1
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < cids.length) {
      var d = 0.0
      var i = 0
      val off = c * dims
      while (i < lim) {
        val xi = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
        val diff = xi - flat(off + i)
        d += diff * diff
        i += 1
      }
      if (d < bestD) { bestD = d; best = cids(c) }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val fRef = ctx.addReferenceObj("cents", flat, "double[]")
    val cRef = ctx.addReferenceObj("cids", cids, "int[]")
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, x => {
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val diff = ctx.freshName("diff")
      val off = ctx.freshName("off")
      val bestD = ctx.freshName("bestD")
      val best = ctx.freshName("best")
      val lim = ctx.freshName("lim")
      s"""
         |int $best = -1;
         |double $bestD = Double.POSITIVE_INFINITY;
         |int $lim = Math.min($dims, $x.numElements());
         |for (int $c = 0; $c < $cRef.length; $c++) {
         |  double $d = 0.0;
         |  int $off = $c * $dims;
         |  for (int $i = 0; $i < $lim; $i++) {
         |    double $diff = ((double) $x.$get($i)) - $fRef[$off + $i];
         |    $d += $diff * $diff;
         |  }
         |  if ($d < $bestD) { $bestD = $d; $best = $cRef[$c]; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Random-hyperplane sign signatures for ALL hash tables in one pass —
  * the codegen replacement for `Vectors.sigsUdf`, the last per-row Scala
  * UDF on an ANN hot path (d5/sim2/sim7 signature computation). Element t
  * of the `array<long>` result packs `bits` sign bits of pseudo-random
  * ±1 hyperplane projections for table t; planes derive deterministically
  * from (tableId, bit, dim) via the same splitmix index mix as the UDF
  * (parity is spec-pinned), but here they are PRE-EVALUATED into a flat
  * ±1 sign table riding along as a codegen reference array
  * (tables·bits·dims doubles — config-bounded: 8 tables × 24 bits × 64
  * dims ≈ 98 KB), so each row is one tight primitive loop with no
  * boxing, no Seq materialization, and no codegen fence. A vector
  * shorter than `dims` contributes only its present elements, exactly
  * like the UDF's min(dims, a.length) bound. */
case class SignBitsPack(child: Expression, dims: Int, bits: Int,
    tables: Int) extends UnaryExpression {
  require(dims > 0 && bits > 0 && bits <= 63 && tables > 0,
    "need dims > 0, 0 < bits <= 63, tables > 0")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)

  private lazy val isFloat = child.dataType match {
    case org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.FloatType, _) => true
    case _ => false
  }

  // signs(((t*bits)+b)*dims + i) = the ±1 hyperplane component the UDF
  // derives per element — evaluated once at plan construction
  private lazy val signs: Array[Double] = {
    val a = new Array[Double](tables * bits * dims)
    var t = 0
    while (t < tables) {
      var b = 0
      while (b < bits) {
        var i = 0
        while (i < dims) {
          a((t * bits + b) * dims + i) =
            if (Vectors.mix(t.toLong * 1000003L + b * 1009L + i) >= 0) 1.0
            else -1.0
          i += 1
        }
        b += 1
      }
      t += 1
    }
    a
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val lim = math.min(dims, x.numElements())
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var sig = 0L
      var b = 0
      while (b < bits) {
        var proj = 0.0
        var i = 0
        val off = (t * bits + b) * dims
        while (i < lim) {
          val xi = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
          proj += xi * signs(off + i)
          i += 1
        }
        if (proj >= 0) sig |= (1L << b)
        b += 1
      }
      out(t) = sig
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val sRef = ctx.addReferenceObj("signs", signs, "double[]")
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, x => {
      val t = ctx.freshName("t")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val off = ctx.freshName("off")
      val lim = ctx.freshName("lim")
      val proj = ctx.freshName("proj")
      val sig = ctx.freshName("sig")
      val out = ctx.freshName("out")
      s"""
         |long[] $out = new long[$tables];
         |int $lim = Math.min($dims, $x.numElements());
         |for (int $t = 0; $t < $tables; $t++) {
         |  long $sig = 0L;
         |  for (int $b = 0; $b < $bits; $b++) {
         |    double $proj = 0.0;
         |    int $off = ($t * $bits + $b) * $dims;
         |    for (int $i = 0; $i < $lim; $i++) {
         |      $proj += ((double) $x.$get($i)) * $sRef[$off + $i];
         |    }
         |    if ($proj >= 0) $sig |= (1L << $b);
         |  }
         |  $out[$t] = $sig;
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VecExpressions {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}
  def vecDot(a: Column, b: Column): Column =
    column(FloatVecDot(expression(a), expression(b)))
  def vecNorm(a: Column): Column = column(FloatVecNorm(expression(a)))

  /** Squared L2 between two vector columns (see [[FloatVecSqDist]]). */
  def vecSqDist(a: Column, b: Column): Column =
    column(FloatVecSqDist(expression(a), expression(b)))

  /** All-tables hyperplane signatures (see [[SignBitsPack]]). */
  def signBits(v: Column, dims: Int, bits: Int, tables: Int): Column =
    column(SignBitsPack(expression(v), dims, bits, tables))

  /** Nearest-centroid assignment (see [[NearestCentroid]]): `cents` as
    * (cid, coordinates) pairs; coordinate seqs must share one length. */
  def nearestCentroid(v: Column, cents: Seq[(Int, Seq[Double])]): Column = {
    require(cents.nonEmpty, "centroid table must be non-empty")
    val dims = cents.head._2.length
    require(cents.forall(_._2.length == dims),
      "all centroids must share one dimensionality")
    val flat = cents.flatMap(_._2).toArray
    val cids = cents.map(_._1).toArray
    column(NearestCentroid(expression(v), flat, cids, dims))
  }
}

/** The Morton z-value as a catalyst expression tree, so `zvalue(x, y)`
  * registers as a SQL function (the `graft.ops.Layout.zValue` Column
  * form built from the same mask-doubling steps — pure BitwiseAnd/Or +
  * Shift nodes, fully inside whole-stage codegen; analyzer type coercion
  * handles integer inputs). */
object ZValueExpr {
  import org.apache.spark.sql.catalyst.expressions._
  private def spread(c: Expression): Expression = {
    var x: Expression = BitwiseAnd(c, Literal(65535L))
    Seq((8, 0x00FF00FFL), (4, 0x0F0F0F0FL), (2, 0x33333333L),
      (1, 0x55555555L)).foreach { case (sh, m) =>
      x = BitwiseAnd(BitwiseOr(x, ShiftLeft(x, Literal(sh))), Literal(m))
    }
    x
  }
  def apply(x: Expression, y: Expression): Expression =
    BitwiseOr(ShiftLeft(spread(x), Literal(1)), spread(y))
}
