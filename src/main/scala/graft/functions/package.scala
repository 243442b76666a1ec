package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Column-level helpers shared by all operators.
  *
  * == Floating-point parity with the DuckDB oracle ==
  *
  * The source tables store money/rate values as `double` (nearest double to
  * a 2-decimal value). Summing doubles is order-dependent, so a Spark sum
  * and a DuckDB sum of the same column can differ in the last ULP and fail
  * a hash compare. The parity recipe used throughout:
  *
  *   1. cast each operand to a narrow decimal (`DECIMAL(12,2)` for money,
  *      `DECIMAL(4,2)` for rates) — double→decimal rounding is
  *      shortest-representation based and identical in both engines;
  *   2. do all arithmetic in decimal (exact; operand precisions are kept
  *      small enough that products never exceed precision 38, which would
  *      trigger Spark's lossy precision-adjustment);
  *   3. `round(sum, 2)` — both engines round decimals half-away-from-zero;
  *   4. cast to double — exact for |value| < 2^53/100, so bitwise equal.
  *
  * Verified empirically against DuckDB 1.0 (decimal→decimal CAST in DuckDB
  * *truncates*, so step 3 must be `round`, never a bare cast).
  */
package object functions {
  /** Money / quantity operand: exact cents, small enough to keep products ≤ p38. */
  def money(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Rate operand (discount/tax ∈ [0,1]). */
  def rate(c: Column): Column = c.cast(DecimalType(4, 2))

  /** Decimal literal 1.00 — avoids int-literal promotion inflating decimal widths. */
  val oneD: Column = lit(1).cast(DecimalType(3, 2))

  /** Exact decimal sum → round(2, half-up) → exact double. See package doc. */
  def moneySum(c: Column): Column = round(sum(c), 2).cast("double")

  /** `extendedprice * (1 - discount)` in exact decimal — DECIMAL(18,4). */
  def discPrice(price: Column, disc: Column): Column =
    money(price) * (oneD - rate(disc))

  /** Word tokens of a text column: split on whitespace runs, drop empties
    * (leading/trailing/consecutive whitespace would otherwise emit ""). */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  /** Integer micro-nats of an INTEGER count: `round(1e6 · ln(c))` as
    * BIGINT. Quantizing each log at the leaf — before any sum — makes
    * log-domain scores exact integer arithmetic, so the engine's
    * summation/association order cannot move an ulp (the portable-
    * oracle discipline behind `lmPerplexity` and `dsirWeights`; DuckDB
    * twin: `CAST(round(ln(c) * 1000000) AS BIGINT)`). */
  def qlnMicro(c: Column): Column =
    round(log(c) * lit(1e6)).cast("long")

  /** Word n-gram shingles of a text column: array of space-joined n-grams.
    * Built from built-ins only (codegen-friendly): transform over an index
    * range. Texts with fewer than `n` tokens yield an empty array — the
    * `when` guard matters because `sequence(0, -1)` in Spark is [0,-1]
    * (negative step inferred), which would index element 0 and throw.
    */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    val cnt = size(toks) - (n - 1)
    when(cnt > 0,
      transform(sequence(lit(0), cnt - 1), i =>
        concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*)))
      .otherwise(array().cast("array<string>"))
  }

  /** Cross-engine 16-bit hash of a string: first 4 hex chars of md5, parsed
    * via `instr` arithmetic (both Spark and DuckDB lack a shared numeric
    * hash; md5 hex is identical in both, and `instr` parses it portably).
    */
  def md5Bits16(c: Column): Column = {
    val h = md5(c)
    def nib(k: Int): Column = instr(lit("0123456789abcdef"), substring(h, k, 1)) - 1
    nib(1) * 4096 + nib(2) * 256 + nib(3) * 16 + nib(4)
  }

  /** Cross-engine 60-bit hash of a string: first 15 hex chars of md5 as
    * a long (`conv` base-16 parse; DuckDB twin is nibble arithmetic —
    * `SparkEntry.md5b60Sql`). Use this — not [[md5Bits16]] — wherever
    * the hash feeds a `% m` bucket gate: 2^16 % 10000 = 5536 makes
    * 16-bit buckets non-uniform by up to 7/6 (a realized keep rate
    * percentage points off the intended fraction), while 2^60 % m
    * leaves a relative bias of ~m/2^60 ≈ 10^-14 — negligible. */
  def md5Bits60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Dot product of two float-array columns, accumulated in index order as
    * doubles — deterministic and engine-portable (same fp op sequence).
    */
  def dotProduct(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** L2 norm (double). */
  def l2Norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x))

  /** Cosine similarity of two float-array columns — the built-in
    * REFERENCE spelling. Hot paths use the native
    * [[graft.expressions.CosineSim]] expression instead (same op
    * sequence, one codegen'd pass); ExpressionsSpec asserts the two are
    * bitwise identical, which is this definition's job now. */
  def cosineSim(a: Column, b: Column): Column =
    dotProduct(a, b) / (l2Norm(a) * l2Norm(b))

  /** Spread the low 16 bits of a long so bit i lands at bit 2i — the
    * Morton-interleave half, as the standard 4-step mask/shift chain.
    * Pure integer `& | <<` on constants: bit-identical in any engine
    * (DuckDB twin: `SparkEntry.spreadSql`). */
  def spread16(c: Column): Column =
    Seq((8, 0x00FF00FFL), (4, 0x0F0F0F0FL), (2, 0x33333333L),
      (1, 0x55555555L))
      .foldLeft(c.cast("long").bitwiseAND(lit(0xFFFFL))) {
        case (acc, (s, m)) =>
          acc.bitwiseOR(shiftleft(acc, s)).bitwiseAND(lit(m))
      }

  /** Morton (Z-order) position of a 16-bit × 16-bit point: x in the even
    * bits, y in the odd. Sorting on this value clusters points so that
    * any axis-aligned box maps to FEW curve ranges — per-file min/max
    * stats then prune multi-dimensional predicates, which a single-column
    * sort can only do for its leading column (see
    * [[graft.operators.LakeLayout.writeZOrdered]]). */
  def mortonZ(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))
}
