package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** Per-document token profile in one native pass: tokenize (split on
  * whitespace runs, drop empties) and emit
  * `struct(n_tokens, sum_len, hits)` where `sum_len` is the summed
  * per-token character (code point) count and `hits` is the multiset
  * count of tokens equal to any word in the second (array) argument.
  *
  * Semantics are bit-identical to the built-in spellings used across
  * TextStats: `size(tokens(text))`,
  * `aggregate(tokens(text), 0, (acc, t) => acc + length(t))`, and
  * `size(filter(tokens(text), t => words.map(t === _).reduce(_ || _)))`
  * — all integer arithmetic, so engine parity is structural. (`sum_len`
  * stays INT to match the built-in accumulator; a 100-TB deployment
  * with multi-GB single documents would widen both spellings to LONG
  * together.)
  *
  * Why custom: the three built-in spellings are interpreted
  * higher-order lambdas that each re-tokenize the text — the dominant
  * per-row cost of quality scoring and language ID. Here the tokenizer
  * runs once and all three statistics accumulate in the same loop.
  */
case class TokenProfile(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StringType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, array<string>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("sum_len", IntegerType, nullable = false),
    StructField("hits", IntegerType, nullable = false)))
  override def prettyName: String = "token_profile"

  /** Word set as a hash set; null list elements never match (the
    * built-in equality is null there), so they are simply dropped. */
  private def buildSet(arr: ArrayData): java.util.HashSet[String] = {
    val set = new java.util.HashSet[String](arr.numElements() * 2)
    var w = 0
    while (w < arr.numElements()) {
      if (!arr.isNullAt(w)) set.add(arr.getUTF8String(w).toString)
      w += 1
    }
    set
  }

  /** The words argument is a foldable literal at every call site —
    * build its set once per task instead of per row. (Re-derived
    * lazily per executor after serialization.) */
  @transient private lazy val constWords: Option[java.util.HashSet[String]] =
    if (right.foldable) {
      val v = right.eval(null)
      if (v == null) None else Some(buildSet(v.asInstanceOf[ArrayData]))
    } else None

  override def nullSafeEval(textAny: Any, wordsAny: Any): Any = {
    val text = textAny.asInstanceOf[UTF8String].toString
    val words = constWords.getOrElse(buildSet(wordsAny.asInstanceOf[ArrayData]))
    val toks = TextKernel.tokenize(text)
    var n = 0; var sumLen = 0; var hits = 0
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (t.nonEmpty) {
        n += 1
        sumLen += t.codePointCount(0, t.length)
        if (words.contains(t)) hits += 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](n, sumLen, hits))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TokenProfile =
    copy(left = newLeft, right = newRight)
}
