package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** POSITIONAL 60-bit hashes of a text's word n-gram shingles, one per
  * shingle in token order (no distinct, no sort — position i hashes the
  * shingle starting at token i). The positional twin of
  * [[HashedShingleSet]], built for inverted-index operators
  * ([[graft.operators.TextDedup.repeatedSpans]]) where the shuffle key
  * must be small (8 bytes, not a multi-token string) and position
  * matters.
  *
  * Value = the md5 digest's first 15 hex nibbles as an integer (60
  * bits — bytes 0..6 plus the high nibble of byte 7, big-endian), the
  * widest md5 prefix that fits a signed 64-bit int without sign games.
  * The built-in spelling both engines share:
  * Spark `conv(substring(md5(s), 1, 15), 16, 10)` / DuckDB hex-nibble
  * arithmetic — ExpressionsSpec pins this expression to the Spark
  * spelling bit-for-bit.
  *
  * Collision note: 60 bits ⇒ expected collisions ≈ m²/2^61 for m
  * distinct shingles — ~5e-5 at m = 10M (bench corpus), and even at
  * 10^12 shingles (100 TB) a collision only merges two shingles'
  * occurrence lists (a false "repeated" mark on a handful of spans),
  * never a correctness failure of the hash-compare: the oracle computes
  * the identical hash and makes the identical decision.
  */
case class ShinglePosHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, "shingle size must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${t.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_pos_hashes"

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    // TextKernel.tokenize, not String.split: the pattern is compiled
    // once, and tokenization semantics stay centralized with every
    // other native expression's parity guarantee
    val toks = TextKernel.tokenize(text).filter(_.nonEmpty)
    val count = toks.length - (n - 1)
    if (count <= 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](count)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < count) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = TextKernel.hash60(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): ShinglePosHashes =
    copy(child = newChild)
}
