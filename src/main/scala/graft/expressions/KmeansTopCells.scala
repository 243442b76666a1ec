package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Top-`n` k-means cells for one vector against a centroid table that
  * arrives as DATA — `array<struct<cid:long, cm:array<long>>>` from a
  * one-row broadcast — ordered by (exact micro-int L2², cid asc):
  * `n = 1` is the Lloyd/IVF assignment argmin, `n = nprobe` the
  * query-side probe list.
  *
  * Why custom: the composed spelling (a `transform` scoring every
  * centroid with a `zip_with`+`aggregate` distance, then
  * `array_min`/`array_sort`) is interpreted per element — each of the
  * K·dims integer ops pays lambda-variable binding and boxing, and the
  * micro-quantization of the VECTOR re-runs once per centroid. That
  * held the K=8 workload partition but dominates the √N-sized learned
  * partition (K grows with the corpus: ~3·10⁴ at 10⁹ vectors). Here
  * the vector micro-quantizes ONCE into a primitive array and the
  * K·dims loop is unboxed long arithmetic. The centroids stay a
  * broadcast COLUMN — never expression literals — so plan/codegen size
  * is O(1) in K, the [[graft.operators.Similarity.kmeansAssignInt]]
  * scale contract. Per-row interpreted eval (CodegenFallback) is
  * amortized over the K·dims loop, the [[PqEncode]] reasoning.
  *
  * Parity contract with the composed form (the DuckDB oracle replays
  * the unrolled cross-join argmin): components micro-quantize as
  * floor(x·10⁶ + ½) on the double-widened value; distance is the full
  * Σ(xqᵢ − cmᵢ)² over equal-length arrays; ordering is lexicographic
  * (d, cid) ascending. Defensive cases (never produced by the engine's
  * vectorAudit-clean tables): a NULL vector, NULL centroid array, or
  * NULL vector component → NULL result; a centroid row with a NULL or
  * length-mismatched `cm` is skipped; n larger than K truncates to K. */
case class KmeansTopCells(vec: Expression, cents: Expression, n: Int)
    extends Expression with CodegenFallback {

  require(n > 0, s"kmeans_top_cells: n must be positive, got $n")

  override def children: Seq[Expression] = Seq(vec, cents)

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = vec.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    val centsOk = cents.dataType match {
      case ArrayType(StructType(Array(a, b)), _) =>
        a.dataType == LongType && b.dataType.isInstanceOf[ArrayType] &&
          b.dataType.asInstanceOf[ArrayType].elementType == LongType
      case _ => false
    }
    if (vecOk && centsOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float|double>, " +
        "array<struct<cid:bigint, cm:array<bigint>>>), got " +
        s"${vec.dataType.catalogString} / ${cents.dataType.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "kmeans_top_cells"

  private lazy val vecIsDouble: Boolean = vec.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def eval(input: InternalRow): Any = {
    val v = vec.eval(input)
    if (v == null) return null
    val cs = cents.eval(input)
    if (cs == null) return null
    val va = v.asInstanceOf[ArrayData]
    val ca = cs.asInstanceOf[ArrayData]
    val dims = va.numElements()
    // micro-quantize the vector ONCE — floor(x·10⁶ + ½) on the
    // double-widened component, exactly Similarity.microQ
    val xq = new Array[Long](dims)
    var d = 0
    while (d < dims) {
      if (va.isNullAt(d)) return null
      val x = if (vecIsDouble) va.getDouble(d) else va.getFloat(d).toDouble
      xq(d) = math.floor(x * 1e6 + 0.5).toLong
      d += 1
    }
    val k = ca.numElements()
    // (dist, cid) per valid centroid; Long.MinValue cid marks skipped
    val ds = new Array[Long](k)
    val ids = new Array[Long](k)
    var valid = 0
    var i = 0
    while (i < k) {
      if (!ca.isNullAt(i)) {
        val s = ca.getStruct(i, 2)
        if (!s.isNullAt(0) && !s.isNullAt(1)) {
          val cm = s.getArray(1)
          if (cm.numElements() == dims) {
            var dist = 0L
            var j = 0
            while (j < dims) {
              val diff = xq(j) - cm.getLong(j)
              dist += diff * diff
              j += 1
            }
            ds(valid) = dist
            ids(valid) = s.getLong(0)
            valid += 1
          }
        }
      }
      i += 1
    }
    if (valid == 0) return null
    val take = math.min(n, valid)
    val out = new Array[Any](take)
    if (take == 1) {
      // assignment argmin: one unboxed linear scan
      var bd = ds(0); var bc = ids(0)
      var t = 1
      while (t < valid) {
        if (ds(t) < bd || (ds(t) == bd && ids(t) < bc)) {
          bd = ds(t); bc = ids(t)
        }
        t += 1
      }
      out(0) = bc
    } else {
      // probe list: partial selection sort of the n smallest (d, cid)
      // — n is nprobe (single digits), so O(n·K) beats a full sort
      var s = 0
      while (s < take) {
        var bi = s
        var t = s + 1
        while (t < valid) {
          if (ds(t) < ds(bi) || (ds(t) == ds(bi) && ids(t) < ids(bi))) bi = t
          t += 1
        }
        val td = ds(s); ds(s) = ds(bi); ds(bi) = td
        val ti = ids(s); ids(s) = ids(bi); ids(bi) = ti
        out(s) = ids(s)
        s += 1
      }
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmeansTopCells =
    copy(vec = newChildren(0), cents = newChildren(1))
}
