package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types.{DataType, LongType, StringType}

/** 16-bit SimHash of a text's token multiset in one native pass:
  * tokenize (split on whitespace runs, drop empties) → per-token md5
  * top 16 bits → signed bit-sum per position → assemble (bit j set iff
  * its sum is strictly positive).
  *
  * Semantics are bit-identical to the built-in spelling in
  * `TextDedup.simhashFromHashes` over `transform(tokens(text),
  * md5Bits16)`: the hash value is the digest's first two bytes
  * big-endian, and `h % 2^(j+1) >= 2^j` on a non-negative 16-bit value
  * is exactly `(h >> j) & 1`. The DuckDB oracle reproduces the same
  * arithmetic hex-char-wise.
  *
  * Why custom: the built-in spelling is 16 interpreted `aggregate`
  * lambdas over a `transform` whose own lambda (md5 + instr parsing)
  * also evaluates interpreted — 17 boxed per-element passes per row.
  * Here the tokenizer and digest run once per token, and the 16 bit
  * sums accumulate in one loop.
  */
case class SimHash16(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${t.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash16"

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val sums = new Array[Int](16)
    val toks = TextKernel.tokenize(text)
    var i = 0
    while (i < toks.length) {
      if (toks(i).nonEmpty) {
        val h = TextKernel.hash16(toks(i))
        var j = 0
        while (j < 16) {
          sums(j) += (if (((h >> j) & 1) == 1) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 16) {
      if (sums(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash16 =
    copy(child = newChild)
}
