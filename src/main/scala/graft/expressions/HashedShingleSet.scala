package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Sorted distinct 16-bit hash set of a text's word n-gram shingles, in
  * one native pass: tokenize (split on whitespace runs, drop empties) →
  * n-grams joined with single spaces → md5, top 16 bits → distinct →
  * sort ascending.
  *
  * Semantics are bit-identical to the built-in spelling
  * `array_sort(array_distinct(transform(shingles(text, n), md5Bits16)))`
  * (see `graft.functions`): md5 over the shingle's UTF-8 bytes, value =
  * first two digest bytes big-endian = first four hex nibbles. The
  * DuckDB oracle reproduces the same value via hex-char arithmetic.
  *
  * Why custom: the built-in spelling is a higher-order-function tree
  * that (a) evaluates interpreted and (b) re-evaluates the tokenizer for
  * every `element_at` reference inside the shingle lambda — measured at
  * ~2 ms/document (the whole dedup suite's dominant cost). Here the
  * tokenizer runs once per row; the per-shingle work is one md5 over a
  * short string.
  */
case class HashedShingleSet(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, "shingle size must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${t.catalogString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "hashed_shingle_set"

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val toks = text.split("\\s+").filter(_.nonEmpty)
    val count = toks.length - (n - 1)
    if (count <= 0) return new GenericArrayData(Array.emptyIntArray)
    val md = HashedShingleSet.digest.get()
    val seen = new java.util.TreeSet[Integer]()
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
      md.reset()
      val d = md.digest(sb.toString.getBytes("UTF-8"))
      seen.add(((d(0) & 0xff) << 8) | (d(1) & 0xff))
      i += 1
    }
    val out = new Array[Int](seen.size)
    val it = seen.iterator(); var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): HashedShingleSet =
    copy(child = newChild)
}

object HashedShingleSet {
  private val digest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))
}
