package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType}

/** Native Catalyst expression for the vector hot path.
  *
  * The similarity operators originally used `zip_with` + `aggregate`
  * higher-order functions; those allocate a lambda frame per element and
  * dominated the benchmark (50s of a 74s total at sf0.1). This expression
  * generates a tight primitive loop inside whole-stage codegen — no
  * per-element allocation, no virtual dispatch — and keeps the same
  * left-to-right accumulation order as the fold it replaces, so results
  * are bit-identical to the previous implementation (and to the DuckDB
  * oracle's `list_dot_product`).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs are array<double> by construction (VectorFunctions.dot callers
  // cast explicitly); no ExpectsInputTypes — that trait is private[sql]
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Exact integer dot product over two array<long> columns — the int8
  * quantized-similarity hot path. Same rationale as [[DotProduct]]: the
  * `zip_with` + `aggregate` higher-order form allocates a lambda frame
  * per element; this is a primitive loop inside whole-stage codegen.
  * Integer addition is associative, so there is no accumulation-order
  * caveat at all — results are exact on any engine.
  */
case class IntDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_int_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Nearest-centroid cell id for a vector, against a centroid matrix that
  * rides along as a REFERENCE OBJECT — not as literal child expressions.
  *
  * This is what lets IVF assignment stay inside whole-stage codegen at ANY
  * cell count: embedding nCells×dim literals into the plan breaks Janino's
  * 64 KB method limit somewhere past ~10k literals (measured: flat and
  * chunked `array_min(array(struct...))` projections both throw "Code grows
  * beyond 64 KB" at 4096×8 and fall back to interpreted eval at ~370 ns per
  * vector-cell — and a crossJoin(broadcast)+min(struct) aggregate is no
  * faster, dominated by per-pair ObjectHashAggregate lookups). Here the
  * generated code is a fixed ~20-line nested loop over `double[]` arrays
  * regardless of nCells: no join, no shuffle, no codegen ceiling.
  *
  * Semantics are BIT-IDENTICAL to the literal-projection path (and so to
  * the q64 DuckDB oracle): d² = v·v − 2·(Σ vᵢcᵢ, folded left-to-right)
  * + ‖c‖² (norms pre-folded left-to-right), argmin by strict `<` scan in
  * cell order = ties to the lowest cell.
  */
case class NearestCentroid(child: Expression, flat: Array[Double],
                           norms: Array[Double], dim: Int)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_nearest_centroid"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val d = math.min(v.numElements(), dim)
    var vv = 0.0
    var i = 0
    while (i < d) { val x = v.getDouble(i); vv += x * x; i += 1 }
    var best = 0
    var bestD2 = Double.PositiveInfinity
    var c = 0
    while (c < norms.length) {
      var s = 0.0
      var j = 0
      val off = c * dim
      while (j < d) { s += v.getDouble(j) * flat(off + j); j += 1 }
      val d2 = vv - 2.0 * s + norms(c)
      if (d2 < bestD2) { bestD2 = d2; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val flatRef = ctx.addReferenceObj("flatCentroids", flat, "double[]")
      val normsRef = ctx.addReferenceObj("centroidNorms", norms, "double[]")
      val d = ctx.freshName("d")
      val vv = ctx.freshName("vv")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val off = ctx.freshName("off")
      val s = ctx.freshName("s")
      val d2 = ctx.freshName("d2")
      val best = ctx.freshName("best")
      val bestD2 = ctx.freshName("bestD2")
      s"""
         |int $d = java.lang.Math.min($v.numElements(), $dim);
         |double $vv = 0.0;
         |for (int $i = 0; $i < $d; $i++) {
         |  double x = $v.getDouble($i); $vv += x * x;
         |}
         |int $best = 0;
         |double $bestD2 = Double.POSITIVE_INFINITY;
         |for (int $c = 0; $c < $normsRef.length; $c++) {
         |  double $s = 0.0;
         |  int $off = $c * $dim;
         |  for (int $j = 0; $j < $d; $j++) {
         |    $s += $v.getDouble($j) * $flatRef[$off + $j];
         |  }
         |  double $d2 = $vv - 2.0 * $s + $normsRef[$c];
         |  if ($d2 < $bestD2) { $bestD2 = $d2; $best = $c; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

object VectorFunctions {
  /** Dot product of two array<double> columns (codegen'd primitive loop). */
  def dot(a: Column, b: Column): Column =
    GraftShim.column(DotProduct(
      GraftShim.expression(a), GraftShim.expression(b)))

  /** Exact dot product of two array<long> columns (codegen'd loop). */
  def intDot(a: Column, b: Column): Column =
    GraftShim.column(IntDotProduct(
      GraftShim.expression(a), GraftShim.expression(b)))

  /** Nearest-centroid cell for an array<double> vector column; centroids
    * travel as a broadcast-like reference object inside codegen.
    */
  def nearestCentroid(v: Column, centroids: Seq[Seq[Double]]): Column = {
    val dim = centroids.head.size
    require(centroids.forall(_.size == dim), "ragged centroid matrix")
    val flat = new Array[Double](centroids.size * dim)
    centroids.zipWithIndex.foreach { case (c, i) =>
      c.copyToArray(flat, i * dim)
    }
    // same left-to-right fold as the literal path's cvN2
    val norms = centroids.map(_.foldLeft(0.0)((s, x) => s + x * x)).toArray
    GraftShim.column(NearestCentroid(GraftShim.expression(v), flat, norms, dim))
  }
}
