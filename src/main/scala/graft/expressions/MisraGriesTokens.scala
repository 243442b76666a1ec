package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** Misra–Gries frequent-items summary over per-row token ARRAYS — the
  * candidate pass of the two-pass guaranteed-heavy-hitters operator
  * ([[graft.operators.CorpusAnalytics.heavyHitters]]).
  *
  * Semantics: a bounded map of at most `capacity` (token → lower-bound
  * count) entries. Per-partition update is the classic counter
  * algorithm (new token on a full map decrements every counter — the
  * batched equivalent of k repeated single decrements); partial-buffer
  * merge is the mergeable-summaries rule of Agarwal, Cormode, Huang,
  * Phillips, Wei, Yi, "Mergeable Summaries" (PODS'12 §3): add counts
  * pointwise, then subtract the (capacity+1)-st largest count from all
  * and drop the non-positive. The merged guarantee is the same as the
  * sequential one: ANY token whose true corpus frequency exceeds
  * N/(capacity+1) is present in the final summary, where N is the
  * total token count. The emitted value is therefore a SUPERSET of the
  * true heavy hitters for every threshold ≥ N/(capacity+1); callers
  * re-count the ≤`capacity` survivors exactly and filter — making the
  * two-pass composite EXACT while the full-vocabulary shuffle (the
  * thing that doesn't scale: shuffling every distinct token of a
  * 100 TB corpus to count it) never happens.
  *
  * Determinism: Spark merges partial buffers in partition order within
  * one stage, but the SET of surviving candidates can in principle
  * differ across partitionings (the guarantee — heavy tokens survive —
  * is partitioning-stable; the tail of light survivors is not). The
  * composite operator's OUTPUT is exact counts above the threshold,
  * which is partitioning-invariant as long as `capacity + 1 ≥ k` (the
  * spec pins both the invariance and the boundary). eval emits tokens
  * sorted lexicographically so the candidate array itself is
  * deterministic given the summary contents.
  *
  * Why a native TypedImperativeAggregate: the summary is an
  * accumulating bounded map — not expressible with built-in
  * aggregates without first exploding + fully shuffling the token
  * stream, which is exactly the cost this operator exists to avoid.
  * Runs under ObjectHashAggregate with map-side partial aggregation:
  * each scan task summarizes its rows locally and only ≤capacity
  * entries per task cross the wire.
  */
case class MisraGriesTokens(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(capacity > 0, s"misra_gries: capacity must be positive, got $capacity")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long](capacity * 2)

  /** One token into the summary: increment if tracked, insert if there
    * is room, otherwise decrement EVERY counter by 1 (dropping zeros) —
    * the arriving token is its own implicit decrement, so it is not
    * inserted. O(capacity) only on the overflow branch. */
  private def offer(buf: java.util.HashMap[String, Long], t: String): Unit = {
    val cur = buf.get(t)
    if (cur != 0L) buf.put(t, cur + 1L)
    else if (buf.size < capacity) buf.put(t, 1L)
    else {
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }
  }

  override def update(buf: java.util.HashMap[String, Long],
                      input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        if (!arr.isNullAt(i)) offer(buf, arr.getUTF8String(i).toString)
        i += 1
      }
    }
    buf
  }

  /** Mergeable-summaries COMBINE: pointwise sum, then if over capacity
    * subtract the (capacity+1)-st largest count from every entry and
    * drop the non-positive — at most `capacity` entries survive and
    * each token's undercount grows by at most that subtracted value
    * (the PODS'12 bound telescopes to N/(capacity+1) overall). */
  override def merge(buf: java.util.HashMap[String, Long],
                     other: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = buf.get(e.getKey)
      buf.put(e.getKey, cur + e.getValue)
    }
    if (buf.size > capacity) {
      val counts = new Array[Long](buf.size)
      var i = 0
      val cit = buf.values().iterator()
      while (cit.hasNext) { counts(i) = cit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      // (capacity+1)-st largest = index (size-1) - capacity ascending
      val sub = counts(counts.length - 1 - capacity)
      val eit = buf.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        if (e.getValue <= sub) eit.remove() else e.setValue(e.getValue - sub)
      }
    }
    buf
  }

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    val toks = new Array[String](buf.size)
    var i = 0
    val it = buf.keySet().iterator()
    while (it.hasNext) { toks(i) = it.next(); i += 1 }
    java.util.Arrays.sort(toks, java.util.Comparator.naturalOrder[String]())
    new GenericArrayData(toks.map(t => UTF8String.fromString(t): Any))
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val b = e.getKey.getBytes(StandardCharsets.UTF_8)
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.HashMap[String, Long](capacity * 2)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.put(new String(b, StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesTokens =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesTokens =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesTokens =
    copy(child = newChild)
}
