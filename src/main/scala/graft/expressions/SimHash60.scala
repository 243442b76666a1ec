package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types.{DataType, LongType, StringType}

/** 60-bit SimHash of a text's token multiset in one native pass — the
  * WIDE fingerprint that makes banded hamming near-dup scale: 4 bands
  * of 15 bits give 32768 signature values per band (vs 16 per band on
  * the 16-bit fingerprint), so band buckets stay small and the
  * candidate join's output grows with true collisions, not with
  * N²/constant. [[SimHash16]] remains the oracle-exhaustive
  * small-width twin; the banding mechanics are width-agnostic.
  *
  * Per token the hash is [[TextKernel.hash60]] (first 15 md5 hex
  * nibbles big-endian — Spark twin `conv(substring(md5(t), 1, 15),
  * 16, 10)`, DuckDB twin 15-nibble hex arithmetic); bit j of the
  * fingerprint is set iff the signed sum of token bit-j values is
  * strictly positive — exactly [[SimHash16]]'s rule at triple the
  * width.
  */
case class SimHash60(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${t.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val sums = new Array[Int](60)
    val toks = TextKernel.tokenize(text)
    var i = 0
    while (i < toks.length) {
      if (toks(i).nonEmpty) {
        val h = TextKernel.hash60(toks(i))
        var j = 0
        while (j < 60) {
          sums(j) += (if (((h >> j) & 1L) == 1L) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 60) {
      if (sums(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}
