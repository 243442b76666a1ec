package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Achlioptas ±1 random projection of a float vector to `outDims`
  * integer micro-coordinates, as ONE native codegen'd pass.
  *
  * Semantics (bit-for-bit the composed-builtin spelling it replaced —
  * `graft.operators.Similarity.rpProject`'s original
  * quantize-then-signed-sum column tree, and the DuckDB oracle that
  * re-derives the matrix in SQL):
  *
  *   q_i  = (long) floor((double) x_i · 10⁶ + ½)        (micro-units)
  *   p_j  = Σ_{i < inDims} sign(i, j) · q_i             (exact longs)
  *
  * with a NULL element or a missing element (vector shorter than
  * `inDims`) contributing exactly 0, and elements past `inDims`
  * ignored. Quantization happens BEFORE the sum so the arithmetic is
  * all-integer — summation order, engine, and partitioning cannot
  * move the result.
  *
  * Why custom: the column-tree spelling was 16 × 64 `try_element_at +
  * coalesce + negate` nodes — ~4k expression nodes that Catalyst
  * re-optimizes on EVERY occurrence of the projection subtree
  * (measured ~1 s of pure plan time per occurrence at any data size,
  * ×2–3 occurrences in the projected-ANN query). One opaque node
  * plans in microseconds, and the emitted code is a 2-deep loop the
  * JIT vectorizes instead of a 1,024-term straight-line expression.
  *
  * The ±1 matrix is the pure function md5("rp:i:j") — see [[RpProject
  * .sign]] — materialized once per JVM as a flat byte array and
  * shipped to generated code via `addReferenceObj`; the oracle
  * recomputes every sign from md5 in SQL, so cross-engine hash
  * equality certifies the bake rather than trusting a shared literal.
  */
case class RpProject(child: Expression, inDims: Int, outDims: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rp_project"

  @transient private lazy val signs: Array[Byte] =
    RpProject.signMatrix(inDims, outDims)

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val out = new Array[Long](outDims)
    val lim = math.min(a.numElements(), inDims)
    var i = 0
    while (i < lim) {
      if (!a.isNullAt(i)) {
        val q = math.floor(a.getFloat(i).toDouble * 1000000d + 0.5d).toLong
        var j = 0
        while (j < outDims) { out(j) += signs(j * inDims + i) * q; j += 1 }
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val m = ctx.addReferenceObj("rpSigns", signs, "byte[]")
      val out = ctx.freshName("out"); val lim = ctx.freshName("lim")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val q = ctx.freshName("q")
      s"""
         |long[] $out = new long[$outDims];
         |int $lim = java.lang.Math.min($a.numElements(), $inDims);
         |for (int $i = 0; $i < $lim; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    long $q = (long) java.lang.Math.floor(
         |      (double) $a.getFloat($i) * 1000000.0d + 0.5d);
         |    for (int $j = 0; $j < $outDims; $j++) {
         |      $out[$j] += $m[$j * $inDims + $i] * $q;
         |    }
         |  }
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RpProject =
    copy(child = newChild)
}

object RpProject {

  /** Deterministic ±1 projection-matrix entry for (input dim i, output
    * dim j): +1 iff the first hex nibble of md5("rp:i:j") is < 8 —
    * Achlioptas's database-friendly J-L sampler (distance preservation
    * matches Gaussian projections in expectation; the multiply is a
    * sign flip). A pure function of (i, j), so both engines and the
    * plan-time bake re-derive the identical matrix. */
  def sign(i: Int, j: Int): Int = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"rp:$i:$j".getBytes("UTF-8"))
    if (((h(0) >> 4) & 0x8) == 0) 1 else -1
  }

  /** The full matrix, flat `[j · inDims + i]`, cached per (in, out)
    * shape — one MD5 sweep per JVM, not per task. */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Byte]]()

  def signMatrix(inDims: Int, outDims: Int): Array[Byte] =
    cache.computeIfAbsent((inDims, outDims), { case (in, out) =>
      val m = new Array[Byte](in * out)
      var j = 0
      while (j < out) {
        var i = 0
        while (i < in) { m(j * in + i) = sign(i, j).toByte; i += 1 }
        j += 1
      }
      m
    })
}
