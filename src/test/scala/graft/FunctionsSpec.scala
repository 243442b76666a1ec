package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.functions._

/** Column-helper semantics: tokenization, shingles, portable hashing. */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def toks1(s: String): Seq[String] =
    Seq(s).toDF("t").select(tokens(col("t"))).as[Seq[String]].head()

  test("tokens drops empties from leading/trailing/consecutive whitespace") {
    assert(toks1("a  b\t c ") === Seq("a", "b", "c"))
    assert(toks1("  ") === Seq.empty)
    assert(toks1("") === Seq.empty)
  }

  private def sh(s: String, n: Int): Seq[String] =
    Seq(s).toDF("t").select(shingles(col("t"), n)).as[Seq[String]].head()

  test("shingles builds word n-grams") {
    assert(sh("a b c d", 2) === Seq("a b", "b c", "c d"))
    assert(sh("a b c d", 3) === Seq("a b c", "b c d"))
  }

  test("shingles on texts shorter than n yields empty, not an error") {
    assert(sh("a b", 3) === Seq.empty)
    assert(sh("", 3) === Seq.empty)
  }

  test("md5Bits16 equals the top 16 bits of the md5 digest") {
    // md5("abc") = 900150983cd24fb0..., first 4 hex chars = 0x9001
    val got = Seq("abc").toDF("t").select(md5Bits16(col("t"))).as[Int].head()
    assert(got === 0x9001)
  }

  test("md5Bits16 stays within [0, 65535]") {
    val ss = samples(Gen.alphaNumStr)
    val vs = ss.toDF("t").select(md5Bits16(col("t"))).as[Int].collect()
    assert(vs.forall(v => v >= 0 && v <= 0xffff))
  }

  test("moneySum is exact for 2-decimal inputs") {
    val df = Seq(0.1, 0.2, 0.3).toDF("v")
    assert(df.select(moneySum(money(col("v")))).as[Double].head() === 0.6)
  }

  /** Bit-by-bit reference Morton interleave. */
  private def mortonRef(x: Long, y: Long): Long =
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("mortonZ matches the bit-by-bit reference interleave") {
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 0L), (0L, 65535L),
      (65535L, 65535L), (12345L, 54321L), (43690L, 21845L)) // 0xAAAA, 0x5555
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), mortonZ(col("x"), col("y")).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) =>
      assert(z === mortonRef(x, y), s"($x, $y)")
    }
    // the two extremes: x fills even bits, y fills odd bits
    assert(mortonRef(65535L, 0L) === 0x55555555L)
    assert(mortonRef(0L, 65535L) === 0xAAAAAAAAL)
  }

  test("mortonZ equals the reference on random 16-bit points") {
    val xs = samples(Gen.chooseNum(0L, 65535L))
    val ys = samples(Gen.chooseNum(0L, 65535L))
    val got = xs.zip(ys).toDF("x", "y")
      .select(col("x"), col("y"), mortonZ(col("x"), col("y")).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) => assert(z === mortonRef(x, y), s"($x, $y)") }
  }
}
