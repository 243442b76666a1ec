package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.LegislatorCounts
import graft.sources.LegiScanModel._

/** Pipeline B semantics on hand-computed fixtures — the reference's
  * hardest edges (`legislator_bill_counts_run.R:65-67,114-143`). */
class LegislatorCountsSpec extends SparkSpec {
  import spark.implicits._

  private def person(id: Long, session: String, district: String,
                     role: String = "Rep", committee: Long = 0) =
    (id, s"P$id", role, district, committee, session)

  private val peopleDf = Seq(
    person(1, "2017-2018", "HD-01"),
    person(1, "2019-2020", "HD-02"),          // latest wins
    person(2, "2019-2020", "SD-05", role = "Sen"),
    person(3, "2017-2018", "HD-09"),          // zero bills -> NaN
    person(99, "2019-2020", "", committee = 7) // committee row, dropped
  ).toDF("people_id", "name", "role", "district", "committee_id", "session")

  private def bill(num: String, y0: Int, sponsors: Seq[Sponsor],
                   status: Int = 4, billType: String = "B") =
    BillRec(num.hashCode.toLong, num, billType, status,
      java.sql.Date.valueOf(s"$y0-06-01"), s"title $num", s"desc $num",
      SessionRef(1, s"$y0-${y0 + 1} Regular Session", y0, y0 + 1),
      Seq(BillText(1, s"$y0-01-01", "Introduced", "https://x")), sponsors)

  private val billsDf = Seq(
    // two primary sponsors: BOTH get credit
    bill("AB1", 2019, Seq(Sponsor(1, 1, "P1"), Sponsor(2, 1, "P2"))),
    // no primary: falls back to FIRST listed sponsor only
    bill("AB2", 2019, Seq(Sponsor(2, 2, "P2"), Sponsor(1, 2, "P1"))),
    // no sponsors at all: dropped
    bill("AB3", 2019, Seq.empty),
    // not passed / not a bill: dropped by filters
    bill("AB4", 2019, Seq(Sponsor(1, 1, "P1")), status = 2),
    bill("AB5", 2019, Seq(Sponsor(1, 1, "P1")), billType = "R"),
    // earlier session credit for person 1
    bill("AB6", 2017, Seq(Sponsor(1, 1, "P1"))),
    // all primaries UNKNOWN: falls back to first listed sponsor (P2)
    // even though the bill HAS primaries (legislator_bill_counts_run.R:117-119)
    bill("AB7", 2019, Seq(Sponsor(2, 2, "P2"), Sponsor(50, 1, "P50"))),
    // primary unknown AND first sponsor unknown: dropped entirely
    bill("AB8", 2019, Seq(Sponsor(50, 1, "P50"), Sponsor(1, 2, "P1"))),
    // duplicated primary id: credits P1 once (R's %in% is a per-person bool)
    bill("AB9", 2019, Seq(Sponsor(1, 1, "P1"), Sponsor(1, 1, "P1"))),
    // one known + one unknown primary: known credited, NO fallback
    bill("AB10", 2019, Seq(Sponsor(2, 1, "P2"), Sponsor(50, 1, "P50")))
  ).map(b => Tuple1(b)).toDF("bill").select("bill.*")

  private lazy val out = LegislatorCounts
    .counts(peopleDf, billsDf, allBills = false)
    .collect().map(r => r.getString(0) -> r).toMap

  test("keep-latest dedup: attributes come from the most recent session") {
    assert(out("P1").getString(2) === "AD-02") // HD-02 recoded, not HD-01
  }

  test("multi-primary bills credit every KNOWN primary; fallback when none resolves") {
    // P1: AB1 (co-primary) + AB6 (2017) + AB9 (dup primary, once) = 3;
    // NOT AB2/AB7 (fallbacks go to P2), NOT AB8 (dropped: nothing resolves)
    val p1 = out("P1")
    assert(p1.getLong(3) === 1L && p1.getLong(4) === 2L) // s2017_2018, s2019_2020
    assert(p1.getLong(6) === 3L)                          // total
    // P2: AB1 (co-primary) + AB2 (no-primary fallback) + AB7 (unknown-primary
    // fallback) + AB10 (known primary beside an unknown one) = 4
    assert(out("P2").getLong(6) === 4L)
  }

  test("years in data = 2 x sessions with bills; 0/0 -> NaN") {
    assert(out("P1").getInt(7) === 4)
    assert(out("P2").getInt(7) === 2)
    assert(out("P1").getDouble(8) === 0.75)
    assert(out("P3").getLong(6) === 0L && out("P3").getDouble(8).isNaN)
  }

  test("recodes: Rep->Asm + HD->AD; Sen untouched; committees dropped") {
    assert(out("P1").getString(1) === "Asm")
    assert(out("P2").getString(1) === "Sen")
    assert(out("P2").getString(2) === "SD-05")
    assert(!out.contains("P99"))
  }

  test("side branch lists exactly the credited bills of one person") {
    val credits = LegislatorCounts.sponsorCredits(billsDf, peopleDf, allBills = false)
    val p2Bills = credits.filter(col("people_id") === 2)
      .select("bill_number").as[String].collect().sorted
    assert(p2Bills === Array("AB1", "AB10", "AB2", "AB7"))
  }

  test("allBills flag admits resolutions") {
    val credits = LegislatorCounts.sponsorCredits(billsDf, peopleDf, allBills = true)
    assert(credits.filter(col("bill_number") === "AB5").count() === 1)
  }
}
