package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions._
import graft.tables.Tables

/** The rest of the TPC-H-shaped relational surface, adapted to the trimmed
  * driver schema (no `partsupp`, no commit/receipt dates, no ship mode).
  *
  * Where the canonical query needs a missing column, the adaptation keeps
  * the OPERATOR SHAPE — correlated EXISTS with a non-equi conjunct (Q4),
  * argmin-per-group (Q2), scalar-subquery threshold (Q11), nested
  * double-aggregate semi-join (Q20), group-wise anti-condition (Q21) —
  * and substitutes an available predicate:
  *   - "late" := `l_shipdate > o_orderdate + 30 days` (for the missing
  *     receipt/commit comparison);
  *   - "supply cost" := per-(part,supplier) aggregates derived from
  *     `lineitem` (for the missing `partsupp`);
  *   - ship-mode group := `l_linestatus` (Q12's two-value group-by).
  *
  * Scale stance is the same as [[Relational]]: bounded dims
  * (`nation`/`region`) may be broadcast-hinted; `part`/`supplier`/
  * `customer` are scale-proportional and never hinted (AQE decides);
  * every aggregate is a partial-agg hash aggregate; top-k compiles to
  * TakeOrderedAndProject.
  */
object RelationalX {

  private val lateLine: org.apache.spark.sql.Column =
    col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS")

  /** TPC-H Q4-style priority check: orders in one quarter with at least
    * one late line, counted per priority. The EXISTS compiles to a
    * left-semi join whose condition carries the cross-table inequality —
    * the equi half (`l_orderkey = o_orderkey`) still drives a hash
    * shuffle join; the inequality rides along as a post-probe filter, so
    * there is no nested-loop anywhere. */
  def q4PriorityOrders(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ord = Tables.orders(spark, dir)
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1996-04-01").cast("timestamp"))
      .select($"o_orderkey", $"o_orderdate", $"o_orderpriority")
    val li = Tables.lineitem(spark, dir).select($"l_orderkey", $"l_shipdate")
    ord.join(li, $"l_orderkey" === $"o_orderkey" && lateLine, "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy($"o_orderpriority")
  }

  /** TPC-H Q8-style national market share: one nation's slice of regional
    * revenue for a part type, per order year. The two `nation` roles
    * (customer-side region membership, supplier-side attribution) are
    * separate broadcast joins of the same bounded dim; the conditional/
    * total sum pair computes the share in one aggregate pass. */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val custNations = Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir).filter($"r_name" === "ASIA")),
        $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey".as("cn_key"))
    val cust = Tables.customer(spark, dir).select($"c_custkey", $"c_nationkey")
      .join(broadcast(custNations), $"c_nationkey" === $"cn_key")
      .select($"c_custkey")
    val suppNation = Tables.nation(spark, dir)
      .select($"n_nationkey".as("sn_key"), $"n_name".as("supp_nation"))
    val supp = Tables.supplier(spark, dir).select($"s_suppkey", $"s_nationkey")
      .join(broadcast(suppNation), $"s_nationkey" === $"sn_key")
      .select($"s_suppkey", $"supp_nation")
    val ord = Tables.orders(spark, dir)
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1998-01-01").cast("timestamp"))
      .select($"o_orderkey", $"o_custkey", year($"o_orderdate").as("o_year"))
    val prt = Tables.part(spark, dir)
      .filter($"p_type" === "PROMO").select($"p_partkey")
    val li = Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_partkey", $"l_suppkey",
        $"l_extendedprice", $"l_discount")
    li.join(prt, $"l_partkey" === $"p_partkey")
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .join(cust, $"o_custkey" === $"c_custkey")
      .join(supp, $"l_suppkey" === $"s_suppkey")
      .groupBy($"o_year")
      .agg(
        moneySum(when($"supp_nation" === "NATION_7",
            discPrice($"l_extendedprice", $"l_discount"))
          .otherwise(lit(0).cast("decimal(18,4)"))).as("nation_revenue"),
        moneySum(discPrice($"l_extendedprice", $"l_discount")).as("total_revenue"))
      .select($"o_year", $"nation_revenue", $"total_revenue",
        when($"total_revenue" === 0.0, 0.0)
          .otherwise($"nation_revenue" / $"total_revenue").as("mkt_share"))
      .orderBy($"o_year")
  }

  /** TPC-H Q12-style late-shipment priority split, grouped by
    * `l_linestatus` (the schema's two-valued stand-in for ship mode):
    * for lines shipped late within one year, how many carried
    * high-priority orders vs not. One fact-fact equi-join, one
    * conditional-aggregate pass. */
  def q12LateLines(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hi = Seq("1-URGENT", "2-HIGH")
    val ord = Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_orderdate", $"o_orderpriority")
    val li = Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1997-01-01").cast("timestamp"))
      .select($"l_orderkey", $"l_shipdate", $"l_linestatus")
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .filter(lateLine)
      .groupBy($"l_linestatus")
      .agg(
        sum(when($"o_orderpriority".isin(hi: _*), 1).otherwise(0))
          .as("high_line_count"),
        sum(when($"o_orderpriority".isin(hi: _*), 0).otherwise(1))
          .as("low_line_count"))
      .orderBy($"l_linestatus")
  }

  /** TPC-H Q15-style top supplier: quarterly revenue per supplier, then
    * the supplier(s) achieving the max. The scalar max is a one-row
    * broadcast (`crossJoin(broadcast(...))`) — the canonical view+
    * subquery decorrelates to exactly this plan. Revenue is the exact
    * decimal→double spelling, so the equality join on the max is safe
    * (bit-identical values both engines). */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rev = Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1996-04-01").cast("timestamp"))
      .groupBy($"l_suppkey")
      .agg(moneySum(discPrice($"l_extendedprice", $"l_discount"))
        .as("total_revenue"))
    val mx = rev.agg(max($"total_revenue").as("mx"))
    Tables.supplier(spark, dir).select($"s_suppkey", $"s_name")
      .join(rev, $"s_suppkey" === $"l_suppkey")
      .crossJoin(broadcast(mx))
      .filter($"total_revenue" === $"mx")
      .select($"s_suppkey", $"s_name", $"total_revenue")
      .orderBy($"s_suppkey")
  }

  /** TPC-H Q17-style small-quantity revenue: average yearly revenue lost
    * if small-quantity lines of one brand were not filled. The
    * correlated per-part average decorrelates to a partial-agg groupBy
    * on `l_partkey` joined back to the fact — both sides share the same
    * shuffle key. The threshold compare runs in double on both engines
    * (identical IEEE multiply), the final sum in exact decimal. */
  def q17SmallQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val brand = Tables.part(spark, dir)
      .filter($"p_brand" === "Brand#3").select($"p_partkey")
    // brand is part-granular, so the per-part average over the
    // brand-filtered slice equals the average over the full table for
    // every surviving part — push the semi-join below BOTH uses of
    // lineitem (aggregate input and probe side alike)
    val li = Tables.lineitem(spark, dir)
      .select($"l_partkey", $"l_quantity", $"l_extendedprice")
      .join(brand, $"l_partkey" === $"p_partkey", "left_semi")
    val partAvg = li
      .groupBy($"l_partkey".as("pa_key"))
      .agg((sum(money($"l_quantity")).cast("double") /
        count(lit(1)).cast("double")).as("avg_qty"))
    li.join(partAvg, $"l_partkey" === $"pa_key")
      .filter($"l_quantity" < $"avg_qty" * 0.2)
      .agg(coalesce(moneySum(money($"l_extendedprice")), lit(0.0))
        .as("total_small_rev"))
      .select(($"total_small_rev" / 7.0).as("avg_yearly"))
  }

  /** TPC-H Q19-style disjunctive revenue: three OR'd brand/size/quantity
    * conjunct groups over `lineitem ⋈ part`. The equi key joins first;
    * the disjunction stays a single post-join filter — Catalyst pushes
    * the per-side implied predicates (`p_size >= 1`, quantity bounds)
    * into the scans while keeping the cross-table OR intact. */
  def q19DisjunctiveRevenue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val prt = Tables.part(spark, dir).select($"p_partkey", $"p_brand", $"p_size")
    val li = Tables.lineitem(spark, dir)
      .select($"l_partkey", $"l_quantity", $"l_extendedprice", $"l_discount")
    li.join(prt, $"l_partkey" === $"p_partkey")
      .filter(
        ($"p_brand" === "Brand#1" && $"p_size".between(1, 15) &&
          $"l_quantity".between(1, 11)) ||
        ($"p_brand" === "Brand#2" && $"p_size".between(1, 25) &&
          $"l_quantity".between(10, 20)) ||
        ($"p_brand" === "Brand#3" && $"p_size".between(1, 35) &&
          $"l_quantity".between(20, 30)))
      .agg(coalesce(moneySum(discPrice($"l_extendedprice", $"l_discount")),
        lit(0.0)).as("revenue"))
  }

  /** TPC-H Q21-style waiting suppliers: on finished multi-supplier
    * orders where EXACTLY ONE supplier shipped late, charge that
    * supplier. The canonical EXISTS/NOT-EXISTS pair over self-joined
    * lineitem decorrelates to ONE per-order aggregate — distinct
    * suppliers, distinct late suppliers, and (safe when n_late=1) the
    * late supplier's key — turning two correlated scans into a single
    * partial-agg shuffle on `l_orderkey`. */
  def q21WaitingSuppliers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ord = Tables.orders(spark, dir)
      .filter($"o_orderstatus" === "F")
      .select($"o_orderkey", $"o_orderdate")
    val li = Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_suppkey", $"l_shipdate")
    val perOrder = li.join(ord, $"l_orderkey" === $"o_orderkey")
      .withColumn("late_supp", when(lateLine, $"l_suppkey"))
      .groupBy($"l_orderkey")
      .agg(
        countDistinct($"l_suppkey").as("n_supp"),
        countDistinct($"late_supp").as("n_late"),
        max($"late_supp").as("the_late_supp"))
      .filter($"n_supp" > 1 && $"n_late" === 1)
    perOrder
      .join(Tables.supplier(spark, dir), $"the_late_supp" === $"s_suppkey")
      .groupBy($"s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy($"numwait".desc, $"s_name")
      .limit(20)
  }

  /** Per-(part, supplier) supply facts derived from `lineitem` — the
    * schema's stand-in for `partsupp` (min observed unit context as
    * "cost", summed quantity as "supplied"). One partial-agg shuffle on
    * the compound key. Callers pass the PRE-FILTERED lineitem slice:
    * the part/supplier predicates in Q2/Q20 are key-granular, so
    * semi-joining them below this aggregate leaves the surviving
    * groups' values untouched while shrinking the shuffle by the
    * filters' full selectivity (Catalyst won't push a join below an
    * aggregate on its own — this hand-pushdown is the scale lever). */
  private def supplyFactsFrom(li: DataFrame): DataFrame =
    li.groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(
        min(money(col("l_extendedprice"))).as("cost"),
        sum(money(col("l_quantity"))).as("qty"))

  /** TPC-H Q2-style min-cost supplier: for each sized part, the
    * EUROPE-region supplier with the cheapest derived supply cost.
    * The correlated MIN subquery is an argmin-per-group: one
    * `row_number` window over the (part, cost, suppkey) frame — a
    * single shuffle on `l_partkey`, ties broken by suppkey so the
    * answer is deterministic. */
  def q2MinCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val eu = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
        .join(broadcast(Tables.region(spark, dir)
          .filter($"r_name" === "EUROPE")), $"n_regionkey" === $"r_regionkey")
        .select($"n_nationkey", $"n_name")),
        $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"s_name", $"s_acctbal", $"n_name")
    val prt = Tables.part(spark, dir)
      .filter($"p_size" === 15).select($"p_partkey", $"p_type")
    // both predicates are key-granular: semi-join them below the
    // supply aggregate (~50× fewer groups shuffled at this p_size
    // selectivity; the same trick partsupp-based Q2 plans rely on)
    val li = Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1995-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("2002-01-01").cast("timestamp"))
      .select($"l_partkey", $"l_suppkey", $"l_extendedprice", $"l_quantity")
      .join(prt.select($"p_partkey"), $"l_partkey" === $"p_partkey", "left_semi")
      .join(eu.select($"s_suppkey"), $"l_suppkey" === $"s_suppkey", "left_semi")
    val ps = supplyFactsFrom(li)
    val rk = row_number().over(
      Window.partitionBy($"p_partkey").orderBy($"cost", $"s_suppkey"))
    ps.join(eu, $"l_suppkey" === $"s_suppkey")
      .join(prt, $"l_partkey" === $"p_partkey")
      .withColumn("rk", rk)
      .filter($"rk" === 1)
      .select(money($"s_acctbal").cast("double").as("s_acctbal"),
        $"s_name", $"n_name", $"p_partkey", $"p_type",
        $"cost".cast("double").as("supplycost"))
      .orderBy($"s_acctbal".desc, $"s_name", $"p_partkey")
      .limit(100)
  }

  /** TPC-H Q9-style profit by nation and year: revenue minus a derived
    * 10%-of-retail supply cost, for parts matching a name word,
    * attributed to the supplier's nation. All arithmetic stays in exact
    * decimal through the sum (widths bounded well under precision 38),
    * so the grouped profit is bit-identical cross-engine. */
  def q9ProfitByNation(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val prt = Tables.part(spark, dir)
      .filter($"p_name".contains("widget"))
      .select($"p_partkey", $"p_retailprice")
    val supp = Tables.supplier(spark, dir).select($"s_suppkey", $"s_nationkey")
    val nat = Tables.nation(spark, dir).select($"n_nationkey", $"n_name")
    val ord = Tables.orders(spark, dir)
      .select($"o_orderkey", year($"o_orderdate").as("o_year"))
    val li = Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_partkey", $"l_suppkey",
        $"l_quantity", $"l_extendedprice", $"l_discount")
    val amount = discPrice($"l_extendedprice", $"l_discount") -
      money($"p_retailprice") * rate(lit(0.10)) * money($"l_quantity")
    li.join(prt, $"l_partkey" === $"p_partkey")
      .join(supp, $"l_suppkey" === $"s_suppkey")
      .join(broadcast(nat), $"s_nationkey" === $"n_nationkey")
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .groupBy($"n_name".as("nation"), $"o_year")
      .agg(moneySum(amount).as("sum_profit"))
      .orderBy($"nation", $"o_year".desc)
  }

  /** TPC-H Q11-style important parts: parts whose derived supply value
    * within one nation exceeds a fixed fraction of that nation's total.
    * The scalar total is a one-row broadcast; the threshold compare
    * runs in double (identical IEEE op) while the reported value is the
    * exact decimal rounding. */
  def q11ImportantParts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val suppN = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
        .filter($"n_name" === "NATION_1")), $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey")
    val value = Tables.lineitem(spark, dir)
      .join(suppN, $"l_suppkey" === $"s_suppkey")
      .groupBy($"l_partkey".as("partkey"))
      .agg(sum(discPrice($"l_extendedprice", $"l_discount")).as("value_d"))
    val total = value.agg(sum($"value_d").cast("double").as("total_d"))
    value.crossJoin(broadcast(total))
      .filter($"value_d".cast("double") > $"total_d" * 0.001)
      .select($"partkey", round($"value_d", 2).cast("double").as("value"))
      .orderBy($"value".desc, $"partkey")
  }

  /** TPC-H Q16-style supplier counts per part attribute: distinct
    * suppliers per (brand, type, size) bucket, excluding one brand and
    * any supplier in deficit. The NOT-IN exclusion is a left-anti join
    * against the (tiny, but unhinted) deficit list; the distinct count
    * is a two-phase partial aggregate. */
  def q16PartSupplierCounts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val deficit = Tables.supplier(spark, dir)
      .filter($"s_acctbal" < 0).select($"s_suppkey")
    val prt = Tables.part(spark, dir)
      .filter($"p_brand" =!= "Brand#1" && $"p_size".isin(1, 5, 10, 15, 20))
      .select($"p_partkey", $"p_brand", $"p_type", $"p_size")
    // selectivity-first: the ~10% part filter shrinks the fact before
    // the anti-join probes it (Catalyst keeps anti/inner order as
    // written; both sides AQE-broadcast at small SF)
    Tables.lineitem(spark, dir).select($"l_partkey", $"l_suppkey")
      .join(prt, $"l_partkey" === $"p_partkey")
      .join(deficit, $"l_suppkey" === $"s_suppkey", "left_anti")
      .groupBy($"p_brand", $"p_type", $"p_size")
      .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
      .orderBy($"supplier_cnt".desc, $"p_brand", $"p_type", $"p_size")
  }

  /** TPC-H Q20-style dominant-share suppliers: suppliers of a named
    * part family whose single-supplier share of a part's yearly shipped
    * quantity exceeds half. Nested aggregates — per-(part,supplier)
    * quantity, then per-part total — share the first shuffle key; the
    * qualifying supplier set semi-joins back to `supplier`, preserving
    * EXISTS semantics (no duplicate suppliers, no row explosion). */
  def q20TopShareSuppliers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fam = Tables.part(spark, dir)
      .filter($"p_name".startsWith("red")).select($"p_partkey")
    // the family filter is part-granular: semi-join it below the
    // (part, supplier) aggregate so only family lines ever shuffle
    val perPart = supplyFactsFrom(
      Tables.lineitem(spark, dir)
        .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
          $"l_shipdate" < lit("1997-01-01").cast("timestamp"))
        .select($"l_partkey", $"l_suppkey", $"l_extendedprice", $"l_quantity")
        .join(fam, $"l_partkey" === $"p_partkey", "left_semi"))
    val totals = perPart.groupBy($"l_partkey".as("t_partkey"))
      .agg(sum($"qty").cast("double").as("total_qty"))
    val qualifying = perPart
      .join(totals, $"l_partkey" === $"t_partkey")
      .filter($"qty".cast("double") > $"total_qty" * 0.5)
      .select($"l_suppkey")
    Tables.supplier(spark, dir)
      .join(qualifying, $"s_suppkey" === $"l_suppkey", "left_semi")
      .select($"s_suppkey", $"s_name")
      .orderBy($"s_suppkey")
  }
}
