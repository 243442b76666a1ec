package graft

import graft.operators.RelationalX
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.apache.spark.sql.functions._

/** Semantic properties of the TPC-H-remainder adaptations (RelationalX).
  * The oracle gate proves engine parity; these pin the INTERNAL
  * invariants a refactor could silently break while still matching some
  * oracle (argmin uniqueness, share bounds, split-count conservation). */
class RelationalXSpec extends SparkSpec {
  import spark.implicits._

  test("q4: every priority bucket counts only quarter orders, all positive") {
    val rows = RelationalX.q4PriorityOrders(spark, sfSmoke).collect()
    assert(rows.nonEmpty && rows.forall(_.getLong(1) > 0))
    // the semi-join can only shrink: bucket totals are bounded by the
    // quarter's order counts
    val quarter = graft.tables.Tables.orders(spark, sfSmoke)
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1996-04-01").cast("timestamp"))
      .groupBy($"o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(r.getLong(1) <= quarter(r.getString(0))))
  }

  test("q8: market share stays within [0,1] and nation ≤ total") {
    val rows = RelationalX.q8MarketShare(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nat, tot, share) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(nat >= 0 && nat <= tot)
      assert(share >= 0.0 && share <= 1.0)
    }
  }

  test("q12: high + low counts conserve the late-line total") {
    val rows = RelationalX.q12LateLines(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    val total = rows.map(r => r.getLong(1) + r.getLong(2)).sum
    val li = graft.tables.Tables.lineitem(spark, sfSmoke)
    val ord = graft.tables.Tables.orders(spark, sfSmoke)
    val expected = li.join(ord, $"l_orderkey" === $"o_orderkey")
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1997-01-01").cast("timestamp") &&
        $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 30 DAYS"))
      .count()
    assert(total == expected)
  }

  test("q15: every returned supplier carries exactly the max revenue") {
    val rows = RelationalX.q15TopSupplier(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getDouble(2)).distinct
    assert(revs.length == 1, s"winners disagree on revenue: ${revs.toSeq}")
  }

  test("q2: argmin emits at most one supplier per part") {
    val df = RelationalX.q2MinCostSupplier(spark, sfSmoke)
    val perPart = df.groupBy($"p_partkey").count()
      .filter($"count" > 1).count()
    assert(perPart == 0, "a part appears with two suppliers — argmin broke")
  }

  test("q16: deficit suppliers and the excluded brand never appear") {
    val rows = RelationalX.q16PartSupplierCounts(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getString(0) != "Brand#1"))
    assert(rows.forall(_.getLong(3) > 0))
  }

  test("q11: every reported part clears the national-total threshold") {
    // sf0.01: the smoke slice has no NATION_1 suppliers at all (1 supplier
    // per nation-decile), which would vacuously pass an empty assertion
    val rows = RelationalX.q11ImportantParts(spark, sf("sf0.01")).collect()
    assert(rows.nonEmpty)
    // values sorted descending by construction; recompute the threshold
    val total = rows.map(_.getDouble(1)).sum // lower bound on the true total
    assert(rows.last.getDouble(1) > 0)
    assert(rows.head.getDouble(1) >= rows.last.getDouble(1))
    assert(total > 0)
  }

  test("q21: charged suppliers are real and counts are positive") {
    val rows = RelationalX.q21WaitingSuppliers(spark, sfSmoke).collect()
    rows.foreach(r => assert(r.getLong(1) > 0))
    // deterministic ordering: numwait desc, name asc
    val pairs = rows.map(r => (r.getLong(1), r.getString(0)))
    assert(pairs.sameElements(pairs.sortBy(p => (-p._1, p._2))))
  }

  test("q20: each qualifying supplier really holds a >50% part share") {
    val out = RelationalX.q20TopShareSuppliers(spark, sfSmoke)
      .select($"s_suppkey").as[Long].collect().toSet
    val li = graft.tables.Tables.lineitem(spark, sfSmoke)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1997-01-01").cast("timestamp"))
    val fam = graft.tables.Tables.part(spark, sfSmoke)
      .filter($"p_name".startsWith("red")).select($"p_partkey")
    val ps = li.join(fam, $"l_partkey" === $"p_partkey")
      .groupBy($"l_partkey", $"l_suppkey").agg(sum($"l_quantity").as("q"))
    val tot = ps.groupBy($"l_partkey".as("pk")).agg(sum($"q").as("tq"))
    val expect = ps.join(tot, $"l_partkey" === $"pk")
      .filter($"q" > $"tq" * 0.5)
      .select($"l_suppkey").distinct().as[Long].collect().toSet
    assert(out == expect)
  }

  test("q17/q19: scalar revenue queries return one non-negative row") {
    Seq(RelationalX.q17SmallQtyRevenue(spark, sfSmoke),
      RelationalX.q19DisjunctiveRevenue(spark, sfSmoke)).foreach { df =>
      val r = df.collect()
      assert(r.length == 1 && r(0).getDouble(0) >= 0.0)
    }
  }

  test("q4/q21: the correlated-EXISTS joins never plan a nested loop") {
    Seq(RelationalX.q4PriorityOrders(spark, sfSmoke),
      RelationalX.q21WaitingSuppliers(spark, sfSmoke)).foreach { df =>
      df.collect() // finalize AQE
      val plan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val loops = plan.collect { case b: BroadcastNestedLoopJoinExec => b }
      assert(loops.isEmpty, "cross-table inequality fell out of the hash join")
    }
  }

  test("q_supplier_share: top share bounded by [1/n_suppliers, 1]") {
    val rows = graft.operators.Relational.qSupplierShare(spark, sfSmoke)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, top, total, share) =
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(top <= total + 1e-9)
      assert(share <= 1.0 + 1e-12)
      // the max of n shares can't be below the uniform share
      assert(share >= 1.0 / n - 1e-12, s"share $share below uniform 1/$n")
    }
  }

  test("q_repeat_customers conserves the customer base across segments") {
    val rows = graft.operators.Relational.qRepeatCustomers(spark, sfSmoke)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "repeat ⊆ base")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
    val total = rows.map(_.getLong(1)).sum
    val customers = graft.tables.Tables.customer(spark, sfSmoke).count()
    assert(total === customers, "order-less customers stay in the base")
  }

  test("q_price_ranks: rank gaps follow tie multiplicity, dense_rank has none") {
    val rows = graft.operators.Relational.qPriceRanks(spark, sfSmoke)
      .collect()
      .map(r => (r.getString(0), r.getDouble(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (brand, rs) =>
      val sorted = rs.sortBy(r => (r._3, r._2))
      // rank of a row = 1 + number of strictly-higher prices in the brand
      // (checkable within the emitted top-10 because rank ≤ 10 implies
      // every strictly-higher price also ranked ≤ 10 and was emitted)
      sorted.foreach { case (_, price, rank, _) =>
        val higher = rs.count(_._2 > price)
        assert(rank == higher + 1, s"$brand: rank $rank != 1+$higher")
      }
      // dense_rank is the count of DISTINCT higher prices + 1 — no gaps
      sorted.foreach { case (_, price, _, dense) =>
        val distinctHigher = rs.map(_._2).distinct.count(_ > price)
        assert(dense == distinctHigher + 1)
      }
      // equal prices share both ranks
      rs.groupBy(_._2).values.foreach { tie =>
        assert(tie.map(_._3).distinct.length == 1)
        assert(tie.map(_._4).distinct.length == 1)
      }
    }
  }
}
