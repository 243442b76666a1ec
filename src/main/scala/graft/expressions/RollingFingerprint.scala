package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types.{DataType, LongType, StringType}

/** Order-sensitive rolling document fingerprint in one native pass:
  * tokenize (split on whitespace runs, drop empties) → per-token md5
  * top 16 bits → h = fold(h·31 + tokenHash) mod 2^31.
  *
  * Bit-identical to the built-in spelling in `TextStats.fingerprint`
  * (`aggregate(tokens(text), 0L, (acc, t) => pmod(acc*31 +
  * md5Bits16(t), 2^31))`): every intermediate stays well inside Long,
  * and pmod of a non-negative value equals `%`. The DuckDB oracle
  * reproduces the same fold hex-char-wise.
  *
  * Why custom: same shape as [[SimHash16]] — the built-in fold is an
  * interpreted lambda whose body (md5 + instr parsing) is itself
  * interpreted per element.
  */
case class RollingFingerprint(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${t.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_fingerprint"

  private val Mod = 2147483648L // 2^31

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val toks = TextKernel.tokenize(text)
    var acc = 0L
    var i = 0
    while (i < toks.length) {
      if (toks(i).nonEmpty) {
        acc = (acc * 31L + TextKernel.hash16(toks(i))) % Mod
      }
      i += 1
    }
    acc
  }

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprint =
    copy(child = newChild)
}
