package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** All K minhashes of an int base-hash set in one pass:
  * out(k) = min over h of (a_k·h + b_k) mod 65521, with the same
  * coefficient family as [[graft.operators.TextDedup.permA]]/`permB`.
  *
  * Why custom: expressed with built-ins this is K separate
  * `array_min(transform(...))` columns; higher-order functions evaluate
  * interpreted (boxed lambda call per element), so the signature cost
  * K·|hs| interpreted evals per row per consumer — measured as the
  * dominant cost of the LSH index at bench scale. Here it is one virtual
  * call per row and a tight primitive loop (K·|hs| int multiplies).
  * CodegenFallback is deliberate: the per-row call amortizes over the
  * whole loop, so codegen would buy nothing measurable.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<int>, got ${t.catalogString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = true)
  override def prettyName: String = "minhash_signature"

  // Same coefficient family as the oracle generator — sourced from the
  // one shared definition so they cannot desynchronize.
  private lazy val as: Array[Int] =
    Array.tabulate(numHashes)(graft.operators.TextDedup.permA)
  private lazy val bs: Array[Int] =
    Array.tabulate(numHashes)(graft.operators.TextDedup.permB)

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    if (n == 0) {
      // empty set → all-null signature, matching array_min(empty) = null
      // (and the oracle's list_min) so empties collapse into one bucket
      return new GenericArrayData(Array.fill[Any](numHashes)(null))
    }
    val out = new Array[Int](numHashes)
    java.util.Arrays.fill(out, Int.MaxValue)
    var i = 0
    while (i < n) {
      val h = hs.getInt(i)
      var k = 0
      while (k < numHashes) {
        val v = (h * as(k) + bs(k)) % graft.operators.TextDedup.MinhashMod
        if (v < out(k)) out(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}
