package graft.expressions

import java.util.zip.Deflater

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}

/** Deflate compression ratio of a document's UTF-8 bytes:
  * compressed_len / raw_len ∈ (0, ~1.03]. The CCNet/Gopher-family
  * quality signal — boilerplate and template spam compress far below
  * natural prose, and the ratio needs no language model to compute.
  * Empty text yields 1.0 (nothing to compress, nothing saved).
  *
  * Determinism: `Deflater` with a PINNED level (6) and strategy
  * (DEFAULT) is a pure function of the input bytes for a given zlib,
  * and the RATIO of two lengths is insensitive to the library version
  * in practice; the operator gates on thresholds, not exact bytes.
  * There is no DuckDB-side zlib, so the corpus query is rows-only by
  * documented design (the same class as the t-digest and HLL twins) —
  * the expression itself is pinned by spec instead: monotone ordering
  * (repetitive < prose < hex noise), bounds, and empty/null handling.
  *
  * Why custom: compression needs byte-level state no built-in
  * combination expresses; a native expression keeps the zero-UDF
  * property (one eval per row inside the scan projection, no
  * serialization detour through a Scala closure).
  */
case class DeflateRatio(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${t.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "deflate_ratio"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    if (bytes.isEmpty) 1.0
    else {
      val d = new Deflater(6, /* nowrap = */ true)
      try {
        d.setInput(bytes)
        d.finish()
        val buf = new Array[Byte](8192)
        var compressed = 0L
        while (!d.finished()) compressed += d.deflate(buf)
        compressed.toDouble / bytes.length.toDouble
      } finally d.end()
    }
  }

  override protected def withNewChildInternal(newChild: Expression): DeflateRatio =
    copy(child = newChild)
}
