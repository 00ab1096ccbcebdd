package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expressions for FULL-DIMENSION product quantization.
  *
  * The literal-folded PQ path ([[graft.ext.Pq.encode]]/adcKnn) embeds
  * m×k codebook centroids as plan literals — ideal at m=2/k=16 (q315's
  * plan-time constant folding), but past ~2k literals Catalyst analysis
  * and Janino's 64 KB method ceiling make it unusable (the
  * [[NearestCentroid]] lesson, measured again here: m=16/k=64 on 64-dim
  * embeddings stalls plan compilation for minutes). These expressions
  * carry the codebooks as REFERENCE OBJECTS — the generated code is a
  * fixed nested loop over `double[]` regardless of (m, k), so encode and
  * ADC stay inside whole-stage codegen at any codebook size.
  *
  * Operation order is BIT-IDENTICAL to the literal path and the DuckDB
  * oracle: per subspace d² = v·v − 2·(Σ vⱼcⱼ left-to-right) + ‖c‖²
  * (norms pre-folded left-to-right), argmin by strict `<` scan in code
  * order (ties to the lowest code), micro grid = ⌊d²·10⁶ + ½⌋ as long.
  */
object PqMatrix {
  /** Flattened codebooks: flat((s·k + c)·subDim + j) = books(s)(c)(j);
    * norms(s·k + c) = ‖books(s)(c)‖² folded left-to-right. Requires all
    * m books to share one code count k (the packed-layout contract).
    */
  def pack(books: Seq[Seq[Seq[Double]]]): (Array[Double], Array[Double], Int, Int) = {
    require(books.nonEmpty && books.head.nonEmpty, "empty codebooks")
    val k = books.head.size
    require(books.forall(_.size == k),
      s"packed PQ needs uniform code counts; got ${books.map(_.size)}")
    val subDim = books.head.head.size
    require(books.forall(_.forall(_.size == subDim)), "ragged codebooks")
    val m = books.size
    val flat = new Array[Double](m * k * subDim)
    val norms = new Array[Double](m * k)
    for (s <- 0 until m; c <- 0 until k) {
      books(s)(c).copyToArray(flat, (s * k + c) * subDim)
      norms(s * k + c) = books(s)(c).foldLeft(0.0)((a, x) => a + x * x)
    }
    (flat, norms, k, subDim)
  }
}

/** Per-subspace nearest-code assignment for all m subspaces in ONE
  * codegen'd pass: array<double> vector → array<long> of m codes.
  */
case class PqEncodePacked(child: Expression, flat: Array[Double],
                          norms: Array[Double], m: Int, k: Int,
                          subDim: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_pq_encode"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val codes = new Array[Long](m)
    var s = 0
    while (s < m) {
      val base = s * subDim
      var vv = 0.0
      var j = 0
      while (j < subDim && base + j < n) {
        val x = v.getDouble(base + j); vv += x * x; j += 1
      }
      var best = 0
      var bestD2 = Double.PositiveInfinity
      var c = 0
      while (c < k) {
        val off = (s * k + c) * subDim
        var dot = 0.0
        var i = 0
        while (i < subDim && base + i < n) {
          dot += v.getDouble(base + i) * flat(off + i); i += 1
        }
        val d2 = vv - 2.0 * dot + norms(s * k + c)
        if (d2 < bestD2) { bestD2 = d2; best = c }
        c += 1
      }
      codes(s) = best.toLong
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val flatRef = ctx.addReferenceObj("pqFlat", flat, "double[]")
      val normsRef = ctx.addReferenceObj("pqNorms", norms, "double[]")
      val codes = ctx.freshName("codes")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val base = ctx.freshName("base")
      val vv = ctx.freshName("vv")
      val j = ctx.freshName("j")
      val best = ctx.freshName("best")
      val bestD2 = ctx.freshName("bestD2")
      val c = ctx.freshName("c")
      val off = ctx.freshName("off")
      val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      val d2 = ctx.freshName("d2")
      s"""
         |int $n = $v.numElements();
         |long[] $codes = new long[$m];
         |for (int $s = 0; $s < $m; $s++) {
         |  int $base = $s * $subDim;
         |  double $vv = 0.0;
         |  for (int $j = 0; $j < $subDim && $base + $j < $n; $j++) {
         |    double x = $v.getDouble($base + $j); $vv += x * x;
         |  }
         |  int $best = 0;
         |  double $bestD2 = Double.POSITIVE_INFINITY;
         |  for (int $c = 0; $c < $k; $c++) {
         |    int $off = ($s * $k + $c) * $subDim;
         |    double $dot = 0.0;
         |    for (int $i = 0; $i < $subDim && $base + $i < $n; $i++) {
         |      $dot += $v.getDouble($base + $i) * $flatRef[$off + $i];
         |    }
         |    double $d2 = $vv - 2.0 * $dot + $normsRef[$s * $k + $c];
         |    if ($d2 < $bestD2) { $bestD2 = $d2; $best = $c; }
         |  }
         |  $codes[$s] = (long) $best;
         |}
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray($codes);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqEncodePacked =
    copy(child = newChild)
}

/** Per-query ADC lookup table as ONE flattened array<long>:
  * lut[s·k + c] = ⌊d²(q_s, books(s)(c))·10⁶ + ½⌋. The broadcast payload
  * of the packed ADC scan — m·k longs per query, vectors never leave
  * the query side.
  */
case class PqAdcLutMicro(child: Expression, flat: Array[Double],
                         norms: Array[Double], m: Int, k: Int,
                         subDim: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_pq_adc_lut"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val lut = new Array[Long](m * k)
    var s = 0
    while (s < m) {
      val base = s * subDim
      var vv = 0.0
      var j = 0
      while (j < subDim && base + j < n) {
        val x = v.getDouble(base + j); vv += x * x; j += 1
      }
      var c = 0
      while (c < k) {
        val off = (s * k + c) * subDim
        var dot = 0.0
        var i = 0
        while (i < subDim && base + i < n) {
          dot += v.getDouble(base + i) * flat(off + i); i += 1
        }
        val d2 = vv - 2.0 * dot + norms(s * k + c)
        lut(s * k + c) = math.floor(d2 * 1e6 + 0.5).toLong
        c += 1
      }
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(lut)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val flatRef = ctx.addReferenceObj("pqFlat", flat, "double[]")
      val normsRef = ctx.addReferenceObj("pqNorms", norms, "double[]")
      val lut = ctx.freshName("lut")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val base = ctx.freshName("base")
      val vv = ctx.freshName("vv")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val off = ctx.freshName("off")
      val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      val d2 = ctx.freshName("d2")
      s"""
         |int $n = $v.numElements();
         |long[] $lut = new long[$m * $k];
         |for (int $s = 0; $s < $m; $s++) {
         |  int $base = $s * $subDim;
         |  double $vv = 0.0;
         |  for (int $j = 0; $j < $subDim && $base + $j < $n; $j++) {
         |    double x = $v.getDouble($base + $j); $vv += x * x;
         |  }
         |  for (int $c = 0; $c < $k; $c++) {
         |    int $off = ($s * $k + $c) * $subDim;
         |    double $dot = 0.0;
         |    for (int $i = 0; $i < $subDim && $base + $i < $n; $i++) {
         |      $dot += $v.getDouble($base + $i) * $flatRef[$off + $i];
         |    }
         |    double $d2 = $vv - 2.0 * $dot + $normsRef[$s * $k + $c];
         |    $lut[$s * $k + $c] = (long) java.lang.Math.floor($d2 * 1.0E6 + 0.5);
         |  }
         |}
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray($lut);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqAdcLutMicro =
    copy(child = newChild)
}

/** ADC distance: Σ_s lut[s·k + codes[s]] — exact long sum of the
  * per-subspace micro partials. `left` = codes (array<long>, m entries),
  * `right` = the query's flattened LUT (array<long>, m·k entries).
  */
case class PqAdcDistMicro(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_pq_adc_dist"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val lut = b.asInstanceOf[ArrayData]
    val m = codes.numElements()
    var s = 0
    var d = 0L
    while (s < m) {
      d += lut.getLong(s * k + codes.getLong(s).toInt)
      s += 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val m = ctx.freshName("m")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |int $m = $a.numElements();
         |long $d = 0L;
         |for (int $s = 0; $s < $m; $s++) {
         |  $d += $b.getLong($s * $k + (int) $a.getLong($s));
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcDistMicro =
    copy(left = newLeft, right = newRight)
}

/** Coordinate permutation of an array<double> vector in ONE pass with
  * the permutation as a reference object. The Column phrasing —
  * `array(perm.map(j => element_at(v, j + 1)))` — re-evaluates the
  * child (typically `cast(embedding AS array<double>)`) once PER
  * ELEMENT: 64 whole-array casts + 64 intermediate allocations per
  * row (the round-18 q338 finding: 0.5 ms/row on a 4096-flop encode).
  * Here the child evaluates once and the permute is a d-step copy.
  */
case class VecPermute(child: Expression, perm: Array[Int])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_vec_permute"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val out = new Array[Double](perm.length)
    var i = 0
    while (i < perm.length) {
      val j = perm(i)
      if (j >= n) throw new ArrayIndexOutOfBoundsException(
        s"permutation index $j out of bounds for vector of $n")
      out(i) = v.getDouble(j)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val permRef = ctx.addReferenceObj("vecPerm", perm, "int[]")
      val out = ctx.freshName("out")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      s"""
         |int $n = $v.numElements();
         |double[] $out = new double[$permRef.length];
         |for (int $i = 0; $i < $permRef.length; $i++) {
         |  int $j = $permRef[$i];
         |  if ($j >= $n) throw new ArrayIndexOutOfBoundsException(
         |    "permutation index " + $j + " out of bounds for vector of " + $n);
         |  $out[$i] = $v.getDouble($j);
         |}
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VecPermute =
    copy(child = newChild)
}

/** ADC distance of one corpus row's codes against query `qi` of a
  * DRIVER-COLLECTED batch LUT (flat layout: luts[qi·m·k + s·k + code]).
  * The batch LUT rides as ONE reference object, so the per-query
  * distance fan-out is `explode(sequence(0, B−1))` over the codes row —
  * NO broadcast join, and the encode feeding `codes` is evaluated once
  * per corpus row (the round-18 q338 finding: whole-stage codegen
  * re-evaluated the stream-side encode once per broadcast row, a
  * per-row cost that grew with the query batch).
  */
case class PqAdcDistBatch(left: Expression, right: Expression,
                          luts: Array[Long], m: Int, k: Int)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_pq_adc_dist_batch"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val qi = b.asInstanceOf[Number].intValue()
    val base = qi * m * k
    var s = 0
    var d = 0L
    while (s < m) {
      d += luts(base + s * k + codes.getLong(s).toInt)
      s += 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val lutsRef = ctx.addReferenceObj("adcLuts", luts, "long[]")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val base = ctx.freshName("base")
      s"""
         |int $base = ((int) $b) * $m * $k;
         |long $d = 0L;
         |for (int $s = 0; $s < $m; $s++) {
         |  $d += $lutsRef[$base + $s * $k + (int) $a.getLong($s)];
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcDistBatch =
    copy(left = newLeft, right = newRight)
}

object PqKernel {
  /** The [[PqAdcLutMicro]] arithmetic as a driver-callable kernel —
    * SAME loop, SAME order, so a LUT built driver-side for the batch
    * path is bit-identical to the expression-built one (the oracle
    * reproduces both from the rendered codebooks).
    */
  def lut(flat: Array[Double], norms: Array[Double], m: Int, k: Int,
          subDim: Int, v: Array[Double]): Array[Long] = {
    val n = v.length
    val out = new Array[Long](m * k)
    var s = 0
    while (s < m) {
      val base = s * subDim
      var vv = 0.0
      var j = 0
      while (j < subDim && base + j < n) {
        val x = v(base + j); vv += x * x; j += 1
      }
      var c = 0
      while (c < k) {
        val off = (s * k + c) * subDim
        var dot = 0.0
        var i = 0
        while (i < subDim && base + i < n) {
          dot += v(base + i) * flat(off + i); i += 1
        }
        val d2 = vv - 2.0 * dot + norms(s * k + c)
        out(s * k + c) = math.floor(d2 * 1e6 + 0.5).toLong
        c += 1
      }
      s += 1
    }
    out
  }
}

object PqFunctions {
  /** One-pass coordinate permutation (see [[VecPermute]]). */
  def vecPermute(v: Column, perm: Seq[Int]): Column =
    GraftShim.column(VecPermute(GraftShim.expression(v), perm.toArray))

  /** Batch ADC distance against a driver-collected flat LUT (see
    * [[PqAdcDistBatch]]).
    */
  def pqAdcDistBatch(codes: Column, qi: Column, luts: Array[Long],
                     m: Int, k: Int): Column =
    GraftShim.column(PqAdcDistBatch(GraftShim.expression(codes),
      GraftShim.expression(qi), luts, m, k))

  /** Codes for all m subspaces as array<long> (codegen'd, matrix rides
    * as a reference object).
    */
  def pqCodes(v: Column, books: Seq[Seq[Seq[Double]]]): Column = {
    val (flat, norms, k, subDim) = PqMatrix.pack(books)
    GraftShim.column(PqEncodePacked(GraftShim.expression(v), flat, norms,
      books.size, k, subDim))
  }

  /** Flattened per-query ADC lookup table as array<long> (m·k micro
    * partial distances).
    */
  def pqAdcLut(q: Column, books: Seq[Seq[Seq[Double]]]): Column = {
    val (flat, norms, k, subDim) = PqMatrix.pack(books)
    GraftShim.column(PqAdcLutMicro(GraftShim.expression(q), flat, norms,
      books.size, k, subDim))
  }

  /** Exact integer ADC distance from packed codes + a flattened LUT. */
  def pqAdcDist(codes: Column, lut: Column, k: Int): Column =
    GraftShim.column(PqAdcDistMicro(GraftShim.expression(codes),
      GraftShim.expression(lut), k))
}
