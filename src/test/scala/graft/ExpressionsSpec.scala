package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.functions._
import graft.operators.TextDedup

/** Native expressions must be bit-identical to their built-in spellings
  * — that equivalence is what keeps the DuckDB oracle honest. */
class ExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val texts = Gen.listOfN(40, Gen.oneOf(
    "the", "a", "cat", "sat", "on", "mat", "dog", "ran", "", " ")).map(_.mkString(" "))

  test("hashed_shingle_set == array_sort(array_distinct(transform(shingles, md5Bits16)))") {
    val df = samples(texts).toDF("t")
    val rows = df.select(
      call_function("hashed_shingle_set", col("t"), lit(3)).as("native"),
      array_sort(array_distinct(transform(shingles(col("t"), 3), x => md5Bits16(x))))
        .as("builtin"))
      .as[(Seq[Int], Seq[Int])].collect()
    rows.foreach { case (native, builtin) => assert(native === builtin) }
  }

  test("sorted_intersect_size == set intersection size on sorted distinct arrays") {
    val gen = Gen.listOf(Gen.choose(0, 50)).map(_.distinct.sorted)
    val pairs = samples(Gen.zip(gen, gen), 50)
    val rows = pairs.toDF("a", "b")
      .select(col("a"), col("b"),
        call_function("sorted_intersect_size", col("a"), col("b")).as("n"))
      .as[(Seq[Int], Seq[Int], Int)].collect()
    rows.foreach { case (a, b, n) => assert(n === a.toSet.intersect(b.toSet).size) }
  }

  test("minhash_signature == K x linear-permutation minimum, empties -> nulls") {
    import TextDedup._
    val gen = Gen.listOf(Gen.choose(0, 0xffff)).map(_.distinct.sorted)
    val rows = samples(gen, 50).toDF("hs")
      .select(col("hs"), call_function("minhash_signature", col("hs")).as("sig"))
      .as[(Seq[Int], Seq[Option[Int]])].collect()
    rows.foreach { case (hs, native) =>
      val expected =
        if (hs.isEmpty) Seq.fill(NumHashes)(None)
        else (0 until NumHashes).map(k =>
          Some(hs.map(h => (h * permA(k) + permB(k)) % MinhashMod).min))
      assert(native === expected)
    }
  }

  test("sorted_intersect_size participates in codegen (no fallback failure)") {
    val df = (1 to 100).map(i => (Seq(i, i + 1, i + 2), Seq(i + 1, i + 2, i + 3)))
      .toDF("a", "b")
    val out = df.select(call_function("sorted_intersect_size", col("a"), col("b")))
      .as[Int].collect()
    assert(out.forall(_ == 2))
  }
}
