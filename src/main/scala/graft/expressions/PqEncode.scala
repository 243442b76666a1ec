package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization encode against a BAKED codebook: one pass per
  * vector computing all `m` codeword ids (exact micro-int L2² argmin,
  * ties → smallest j) — `array<long>` of length `m`.
  *
  * Why custom: the composed spelling (subspace explode → broadcast
  * codebook join → `Window.partitionBy(vec_id, m)` argmin → doc-keyed
  * re-assemble) pushes N·M·K rows through a corpus-scale hash exchange
  * for the window and a second for the assemble — at 10¹⁰ vectors
  * that is two shuffles of ~10¹² intermediate rows to compute a value
  * that depends only on the ROW and a ≤M·K-entry constant. This
  * expression makes the encode MAP-ONLY: the codebook (bounded —
  * [[graft.operators.Similarity.PqM]]·[[graft.operators.Similarity.PqK]]
  * entries, collected once per call under the driver-scalar ledger)
  * bakes into the plan as a flat literal, and each vector's M argmins
  * run as ~M·K·subdim integer ops in one tight JVM loop. The same
  * bake-the-bounded-constant move as [[RpProject]], with data-derived
  * constants instead of md5-derived ones. Per-row interpreted eval
  * (CodegenFallback) is amortized over the whole vector, the
  * [[TrigramCounts]] reasoning.
  *
  * Parity contract with the composed form (spec pins bit-equality,
  * and the DuckDB oracle replays the composed chain): components
  * micro-quantize as floor(x·10⁶ + ½); `zip_with` null-pads the
  * SHORTER side, so a candidate codeword scores iff its stored length
  * EQUALS the subspace's available component count (`lens` carries
  * each codeword's true length; −1 for null arrays / null components
  * — never valid); a NULL element among the available x components
  * nullifies every candidate; when no candidate is valid (or the
  * whole embedding is null) the subspace falls to code 0 — the
  * composed NULLS LAST + j-asc tie. Inputs are assumed finite (the
  * `vectorAudit` hygiene contract — a non-finite float would throw in
  * the composed ANSI chain too). */
case class PqEncode(child: Expression, flat: Array[Long],
                    lens: Array[Int], m: Int, k: Int, subDim: Int)
    extends UnaryExpression with CodegenFallback {

  require(m > 0 && k > 0 && subDim > 0 && flat.length == m * k * subDim
      && lens.length == m * k,
    s"pq_encode: flat codebook must carry m*k*subDim entries and m*k " +
      s"lengths, got ${flat.length}/${lens.length} for ($m, $k, $subDim)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    // array<double> admits RESIDUAL vectors (x − centroid reconstructed
    // as exact micro-int differences scaled back by 1e-6 — see
    // Similarity.ivfPqResidualTopK); micro-quantization below recovers
    // the integer difference exactly (|err| ≪ 0.5 for any |diff| < 2⁵²)
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double>, " +
        s"got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "pq_encode"

  // a NULL embedding still encodes — to all-zero codes, the composed
  // form's answer (its subspace rows exist with a null sub-vector, so
  // every distance is NULL and each argmin falls to j = 0)
  private lazy val zeroCodes =
    new GenericArrayData(Array.fill[Any](m)(0L))

  private lazy val elementIsDouble: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) zeroCodes else nullSafeEval(v)
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val codes = new Array[Any](m)
    var mi = 0
    while (mi < m) {
      // micro-quantize the AVAILABLE components of this subspace (a
      // short vector has fewer than subDim — the composed zip_with
      // still scores it against equal-length codewords); a NULL
      // element anywhere in it nullifies every candidate → code 0
      val avail = math.max(0, math.min(n - mi * subDim, subDim))
      val xq = new Array[Long](avail)
      var ok = true
      var d = 0
      while (ok && d < avail) {
        val idx = mi * subDim + d
        if (arr.isNullAt(idx)) ok = false
        else xq(d) = math.floor((if (elementIsDouble) arr.getDouble(idx)
          else arr.getFloat(idx).toDouble) * 1e6 + 0.5).toLong
        d += 1
      }
      var best = 0L
      if (ok) {
        var bestDist = Long.MaxValue
        var found = false
        var j = 0
        while (j < k) {
          // composed validity: zip_with null-pads the shorter side, so
          // a candidate scores iff its stored length EQUALS the
          // available x length (lens carries −1 for null arrays or
          // null components — never valid)
          if (lens(mi * k + j) == avail) {
            val base = (mi * k + j) * subDim
            var dist = 0L
            var dd = 0
            while (dd < avail) {
              val diff = xq(dd) - flat(base + dd); dist += diff * diff
              dd += 1
            }
            if (!found || dist < bestDist) {
              found = true; bestDist = dist; best = j.toLong
            }
          }
          j += 1
        }
      }
      codes(mi) = best
      mi += 1
    }
    new GenericArrayData(codes)
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

object PqEncode {
  /** Flat-bake filler for slots `lens` marks unused/invalid — never
    * read by eval (validity is decided by `lens` alone), kept
    * recognizable for debugging. */
  val NullSentinel: Long = Long.MinValue
}
