package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared test harness: one local session per suite run, configured like
  * the production mains (UTC, ANSI default, nanos-as-long, graft
  * extensions). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  def sf(dir: String): String = s"/root/testdata/$dir"
  val sfSmoke = "/root/testdata/sf0.001"

  /** Deterministic ScalaCheck sampling (no scalatestplus bridge in the
    * offline dependency set): n samples from fixed seeds. */
  def samples[A](gen: org.scalacheck.Gen[A], n: Int = 30): Seq[A] =
    (1 to n).flatMap(i =>
      gen.apply(org.scalacheck.Gen.Parameters.default,
        org.scalacheck.rng.Seed(i.toLong)))
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .appName("graft-test")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.expressions.GraftFunctions.register(s)
    s
  }
}
