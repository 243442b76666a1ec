package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions._
import graft.tables.Tables

/** Core relational surface over the star schema.
  *
  * The reference's pipelines are scan→project→filter→join→aggregate chains
  * (SURVEY §3); these queries exercise the same operator classes on the
  * driver-provided TPC-H-ish testdata, expressed declaratively so Catalyst
  * does pruning/pushdown/join-selection (SURVEY §4).
  *
  * Scale notes (100 TB):
  *  - every query starts from a column-pruned, filter-pushed scan;
  *  - only genuinely bounded dimensions (`region`, `nation` — fixed-size
  *    lookup tables) are ever `broadcast`-hinted. `customer` / `supplier` /
  *    `part` grow linearly with scale factor, so they are never hinted:
  *    AQE picks broadcast at small SF and shuffle/sort-merge at cluster
  *    scale from actual runtime sizes;
  *  - aggregations are partial (map-side combine) by construction since
  *    they use hash aggregates over groupBy keys;
  *  - sort-before-limit is a TakeOrderedAndProject (no global sort).
  */
object Relational {

  /** TPC-H Q1-style pricing summary over `lineitem`.
    * Decimal-exact arithmetic for oracle parity (see graft.functions doc).
    */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" <= lit("1998-09-01").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        moneySum(money($"l_quantity")).as("sum_qty"),
        moneySum(money($"l_extendedprice")).as("sum_base_price"),
        moneySum(discPrice($"l_extendedprice", $"l_discount")).as("sum_disc_price"),
        moneySum(discPrice($"l_extendedprice", $"l_discount") * (oneD + rate($"l_tax"))).as("sum_charge"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** TPC-H Q3-style shipping priority: customer ⋈ orders ⋈ lineitem,
    * revenue per order, top 10.
    *
    * Join order matters (the DataFrame API executes joins as written — no
    * CBO reorder by default): the selective customer-segment filter join
    * runs FIRST, shrinking orders ~5× before the expensive lineitem
    * shuffle. No broadcast hint on `customer` — it is scale-proportional
    * (a forced broadcast OOMs at 100 TB); AQE broadcasts it at small SF
    * on its own from runtime stats.
    */
  def q3ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, dir)
      .filter($"c_mktsegment" === "BUILDING")
      .select($"c_custkey")
    val ord = Tables.orders(spark, dir)
      .filter($"o_orderdate" < lit("1998-03-15").cast("timestamp"))
      .select($"o_orderkey", $"o_custkey", $"o_orderdate", $"o_orderpriority")
    val li = Tables.lineitem(spark, dir)
      .filter($"l_shipdate" > lit("1995-03-15").cast("timestamp"))
      .select($"l_orderkey", $"l_extendedprice", $"l_discount")
    ord.join(cust, $"o_custkey" === $"c_custkey")
      .join(li, $"l_orderkey" === $"o_orderkey")
      .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
      .agg(moneySum(discPrice($"l_extendedprice", $"l_discount")).as("revenue"))
      .select($"l_orderkey", $"revenue",
        date_format($"o_orderdate", "yyyy-MM-dd").as("orderdate"),
        $"o_orderpriority")
      .orderBy($"revenue".desc, $"l_orderkey")
      .limit(10)
  }

  /** TPC-H Q5-style volume by nation: full dimension chain
    * region→nation→customer/supplier with the co-located-nation condition.
    * Only the bounded `nation⋈region` dim is broadcast-hinted;
    * `customer`/`supplier` are scale-proportional, so their join strategy
    * is left to AQE (broadcast at test SF, shuffle join at cluster scale).
    */
  def q5RegionVolume(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val nation = Tables.nation(spark, dir)
    val region = Tables.region(spark, dir).filter($"r_name" === "ASIA")
    val nr = nation.join(broadcast(region), $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey", $"n_name")
    val cust = Tables.customer(spark, dir).select($"c_custkey", $"c_nationkey")
    val supp = Tables.supplier(spark, dir).select($"s_suppkey", $"s_nationkey")
    val ord = Tables.orders(spark, dir)
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
              $"o_orderdate" < lit("1998-01-01").cast("timestamp"))
      .select($"o_orderkey", $"o_custkey")
    val li = Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_suppkey", $"l_extendedprice", $"l_discount")
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(cust, $"o_custkey" === $"c_custkey")
      .join(supp, $"l_suppkey" === $"s_suppkey" &&
                  $"c_nationkey" === $"s_nationkey")
      .join(broadcast(nr), $"s_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(moneySum(discPrice($"l_extendedprice", $"l_discount")).as("revenue"))
      .orderBy($"revenue".desc, $"n_name")
  }

  /** Top-3 orders per customer by total price — ranking window (the
    * reference's only window op is keep-first dedup, SURVEY §2.6 O2; this is
    * its ranking generalization). Partition-local after one shuffle on
    * o_custkey; ties broken by orderkey for determinism.
    */
  def topOrdersPerCustomer(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    Tables.orders(spark, dir)
      .select($"o_custkey", $"o_orderkey", money($"o_totalprice").as("price_d"))
      .withColumn("rk", row_number().over(
        Window.partitionBy($"o_custkey").orderBy($"price_d".desc, $"o_orderkey")))
      .filter($"rk" <= 3)
      .select($"o_custkey", $"o_orderkey", $"price_d".cast("double").as("o_totalprice"),
        $"rk".cast("long").as("rk")) // row_number is int32 in Spark, int64 in DuckDB
      .orderBy($"o_custkey", $"rk")
  }

  /** Left-semi join (SURVEY §2.4 J1 shape): orders having at least one
    * high-quantity line. Semi-join keeps the probe side narrow and
    * deduplicates for free.
    */
  def semiJoinOrders(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bigLines = Tables.lineitem(spark, dir)
      .filter($"l_quantity" >= 48).select($"l_orderkey")
    Tables.orders(spark, dir)
      .join(bigLines, $"o_orderkey" === $"l_orderkey", "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy($"o_orderpriority")
  }

  /** Left-anti join: customers with no urgent orders. */
  def antiJoinCustomers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ord = Tables.orders(spark, dir)
      .filter($"o_orderpriority" === "1-URGENT").select($"o_custkey")
    Tables.customer(spark, dir)
      .join(ord, $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy($"c_mktsegment")
  }

  /** Union-all of two filtered branches then re-aggregate (SURVEY §2.6 O3:
    * per-session frames rbind'd). Single scan per branch; Catalyst merges
    * the union into one exchange before the aggregate.
    */
  def unionBranches(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ord = Tables.orders(spark, dir)
    val hi = ord.filter($"o_orderpriority" === "1-URGENT")
      .select($"o_custkey", lit("urgent").as("bucket"))
    val lo = ord.filter($"o_orderpriority" === "5-LOW")
      .select($"o_custkey", lit("low").as("bucket"))
    hi.unionByName(lo)
      .groupBy($"bucket")
      .agg(countDistinct($"o_custkey").as("n_cust"), count(lit(1)).as("n_orders"))
      .orderBy($"bucket")
  }

  /** TPC-H Q7-style volume shipping: revenue between a nation pair, in
    * both directions, per ship year.
    *
    * Scale shape: the bounded `nation` dim is broadcast and joined into
    * `supplier`/`customer` FIRST, so both sf-proportional tables shrink
    * to the two relevant nations before any fact-table shuffle (classic
    * semi-reduction — the disjunctive pair predicate itself can only be
    * applied after both sides are known, but the `isin` prefilter is
    * implied by it). No hints on supplier/customer/orders/lineitem.
    */
  def q7VolumeShipping(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val nations = Seq("NATION_1", "NATION_2")
    val n1 = broadcast(Tables.nation(spark, dir)
      .filter($"n_name".isin(nations: _*))
      .select($"n_nationkey".as("s_nkey"), $"n_name".as("supp_nation")))
    val n2 = broadcast(Tables.nation(spark, dir)
      .filter($"n_name".isin(nations: _*))
      .select($"n_nationkey".as("c_nkey"), $"n_name".as("cust_nation")))
    val supp = Tables.supplier(spark, dir).select($"s_suppkey", $"s_nationkey")
      .join(n1, $"s_nationkey" === $"s_nkey").select($"s_suppkey", $"supp_nation")
    val cust = Tables.customer(spark, dir).select($"c_custkey", $"c_nationkey")
      .join(n2, $"c_nationkey" === $"c_nkey").select($"c_custkey", $"cust_nation")
    val ord = Tables.orders(spark, dir).select($"o_orderkey", $"o_custkey")
    val li = Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1995-01-01").cast("timestamp") &&
        $"l_shipdate" <= lit("1996-12-31").cast("timestamp"))
      .select($"l_orderkey", $"l_suppkey", $"l_shipdate",
        $"l_extendedprice", $"l_discount")
    li.join(supp, $"l_suppkey" === $"s_suppkey")
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .join(cust, $"o_custkey" === $"c_custkey")
      .filter(($"supp_nation" === "NATION_1" && $"cust_nation" === "NATION_2") ||
        ($"supp_nation" === "NATION_2" && $"cust_nation" === "NATION_1"))
      .groupBy($"supp_nation", $"cust_nation",
        year($"l_shipdate").as("l_year"))
      .agg(moneySum(discPrice($"l_extendedprice", $"l_discount")).as("revenue"))
      .orderBy($"supp_nation", $"cust_nation", $"l_year")
  }

  /** TPC-H Q18-style large orders: orders whose total line quantity
    * exceeds a threshold, with customer attribution.
    *
    * Scale shape: the quantity rollup is a partial-agg groupBy on the
    * fact table's own key (map-side combine does most of the work), and
    * the HAVING filter shrinks it to a sliver — AQE then broadcasts that
    * sliver into the orders/customer joins at runtime; nothing is
    * hinted. */
  def q18LargeOrders(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val big = Tables.lineitem(spark, dir)
      .groupBy($"l_orderkey")
      .agg(sum(money($"l_quantity")).as("qty"))
      .filter($"qty" > 300)
    Tables.orders(spark, dir)
      .join(big, $"o_orderkey" === $"l_orderkey")
      .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
      .select($"c_name", $"c_custkey", $"o_orderkey",
        date_format($"o_orderdate", "yyyy-MM-dd").as("orderdate"),
        money($"o_totalprice").cast("double").as("o_totalprice"),
        round($"qty", 2).cast("double").as("total_qty"))
      .orderBy($"total_qty".desc, $"o_orderkey")
  }

  /** TPC-H Q14-style promo revenue share: lineitem ⋈ part with a
    * one-month date window, ratio of promo-part revenue to total.
    * `part` is scale-proportional — no broadcast hint; the pushed
    * shipdate filter shrinks lineitem before the join. The 100·x/y
    * ratio divides two decimal-exact sums as doubles (identical IEEE op
    * both engines), guarded for the empty-window case.
    */
  def q14PromoRevenue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1997-06-01").cast("timestamp") &&
              $"l_shipdate" < lit("1997-07-01").cast("timestamp"))
      .select($"l_partkey", $"l_extendedprice", $"l_discount")
    val part = Tables.part(spark, dir).select($"p_partkey", $"p_type")
    li.join(part, $"l_partkey" === $"p_partkey")
      .agg(
        moneySum(when($"p_type".startsWith("PROMO"),
            discPrice($"l_extendedprice", $"l_discount"))
          .otherwise(lit(0).cast("decimal(18,4)"))).as("promo_revenue"),
        moneySum(discPrice($"l_extendedprice", $"l_discount")).as("total_revenue"))
      .select(
        $"promo_revenue", $"total_revenue",
        when($"total_revenue" === 0.0, 0.0)
          .otherwise($"promo_revenue" * 100.0 / $"total_revenue")
          .as("promo_pct"))
  }

  /** TPC-H Q6-style forecast revenue: one pruned scan, every predicate
    * pushed to parquet, single partial-agg reduce — the cheapest shape a
    * fact-table query can take; exists to pin that the scan layer keeps
    * it that way (PlanSpec asserts the pushed filters). */
  def q6ForecastRevenue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1997-01-01").cast("timestamp") &&
        $"l_discount" >= 0.05 && $"l_discount" <= 0.07 && $"l_quantity" < 24)
      .agg(moneySum(money($"l_extendedprice") * rate($"l_discount"))
        .as("revenue"))
  }

  /** TPC-H Q10-style returned items: customers ranked by revenue lost to
    * returns in one quarter.
    *
    * Scale shape: the quarter filter shrinks orders first, the
    * returnflag filter shrinks lineitem, and their join runs before the
    * scale-proportional customer join (no hints — AQE decides); only
    * the bounded `nation` dim is broadcast. Final top-20 compiles to
    * TakeOrderedAndProject. */
  def q10ReturnedItems(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ord = Tables.orders(spark, dir)
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1996-04-01").cast("timestamp"))
      .select($"o_orderkey", $"o_custkey")
    val li = Tables.lineitem(spark, dir)
      .filter($"l_returnflag" === "R")
      .select($"l_orderkey", $"l_extendedprice", $"l_discount")
    val cust = Tables.customer(spark, dir)
      .select($"c_custkey", $"c_name", $"c_acctbal", $"c_nationkey")
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(cust, $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.nation(spark, dir)
        .select($"n_nationkey", $"n_name")), $"c_nationkey" === $"n_nationkey")
      .groupBy($"c_custkey", $"c_name", $"c_acctbal", $"n_name")
      .agg(moneySum(discPrice($"l_extendedprice", $"l_discount")).as("revenue"))
      .select($"c_custkey", $"c_name", $"revenue",
        money($"c_acctbal").cast("double").as("c_acctbal"), $"n_name")
      .orderBy($"revenue".desc, $"c_custkey")
      .limit(20)
  }

  /** TPC-H Q13-style order-count distribution: how many customers placed
    * k orders, INCLUDING k=0 — the left outer join is the point (an
    * inner join would silently drop order-less customers). The priority
    * exclusion rides on the join's right side, not a post-join WHERE,
    * which would turn the outer join inner. Two partial-agg shuffles,
    * the second over a tiny (customer, count) frame. */
  def q13OrderDistribution(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ord = Tables.orders(spark, dir)
      .filter($"o_orderpriority" =!= "1-URGENT")
      .select($"o_orderkey", $"o_custkey")
    Tables.customer(spark, dir).select($"c_custkey")
      .join(ord, $"c_custkey" === $"o_custkey", "left")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("c_count")) // count(col) skips nulls
      .groupBy($"c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy($"custdist".desc, $"c_count".desc)
  }

  /** TPC-H Q22-style idle high-balance customers: per market segment,
    * customers with an above-average account balance and no orders at
    * all — the "capital sitting idle" readout.
    *
    * Shape: a scalar aggregate (global average over positive balances)
    * broadcast into the filter, then a left-anti join against orders.
    * The average is computed as CAST(sum)/CAST(count) doubles so both
    * engines perform the identical IEEE divide (`avg(DECIMAL)` types
    * differ between them). */
  def q22IdleCustomers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, dir)
      .select($"c_custkey", $"c_mktsegment", money($"c_acctbal").as("bal"))
    val threshold = cust.filter($"bal" > 0)
      .agg((sum($"bal").cast("double") / count(lit(1)).cast("double"))
        .as("avg_bal"))
    val ord = Tables.orders(spark, dir).select($"o_custkey")
    cust.crossJoin(broadcast(threshold))
      .filter($"bal".cast("double") > $"avg_bal")
      .join(ord, $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_customers"),
        moneySum($"bal").as("total_acctbal"))
      .orderBy($"c_mktsegment")
  }

  /** Set operations beyond union: INTERSECT / EXCEPT (both DISTINCT
    * semantics — Spark's `intersect`/`except` and SQL's operators
    * agree). Each compiles to a hash semi/anti join on the full row, so
    * the shuffle story is the same as J1's; the two branches share the
    * scans. */
  def qSetOps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val building = Tables.customer(spark, dir)
      .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
    val urgent = Tables.orders(spark, dir)
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_custkey".as("c_custkey"))
    val both = building.intersect(urgent)
      .agg(count(lit(1)).as("n_custkeys")).select(lit("both").as("op"), $"n_custkeys")
    val onlySeg = building.except(urgent)
      .agg(count(lit(1)).as("n_custkeys")).select(lit("segment_only").as("op"), $"n_custkeys")
    both.unionByName(onlySeg).orderBy($"op")
  }

  /** Supplier concentration per part brand: the TOP supplier's share
    * of the brand's discounted revenue — the procurement-risk readout
    * (a brand at share ≈ 1 has a single point of failure). Both
    * numerator and denominator are decimal-exact `moneySum`s computed
    * from the SAME joined frame in separate aggregates — the brand
    * total is never re-derived by summing per-supplier doubles (order-
    * dependent); the one double op is the final share division. */
  def qSupplierShare(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val joined = Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir), $"l_partkey" === $"p_partkey")
      .select($"p_brand", $"l_suppkey",
        discPrice($"l_extendedprice", $"l_discount").as("rev_d"))
    val bySupp = joined.groupBy($"p_brand", $"l_suppkey")
      .agg(round(sum($"rev_d"), 2).cast("double").as("rev"))
    val top = bySupp.groupBy($"p_brand")
      .agg(count(lit(1)).as("n_suppliers"), max($"rev").as("top_rev"))
    val total = joined.groupBy($"p_brand")
      .agg(round(sum($"rev_d"), 2).cast("double").as("total_rev"))
    top.join(total, "p_brand")
      .withColumn("top_share", $"top_rev" / $"total_rev")
      .orderBy($"p_brand")
  }

  /** Repeat-customer rate per market segment: customers with ≥ 2
    * orders over ALL customers of the segment (zero-order customers
    * count in the base — the retention denominator a marketer means).
    * One per-customer count (left join keeps order-less customers as
    * 0), one |segments|-row aggregate, a rational rate. */
  def qRepeatCustomers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val perCust = Tables.orders(spark, dir)
      .groupBy($"o_custkey").agg(count(lit(1)).as("n_orders"))
    Tables.customer(spark, dir)
      .select($"c_custkey", $"c_mktsegment")
      .join(perCust, $"c_custkey" === $"o_custkey", "left")
      .groupBy($"c_mktsegment")
      .agg(
        count(lit(1)).as("n_customers"),
        sum(when($"n_orders" >= 2L, 1L).otherwise(0L)).as("n_repeat"))
      .withColumn("repeat_rate",
        $"n_repeat".cast("double") / $"n_customers".cast("double"))
      .orderBy($"c_mktsegment")
  }

  /** Gap-aware ranking: `rank` (ties share a rank, gaps follow) and
    * `dense_rank` (no gaps) over retail price within brand, kept to
    * the top 10 ranks — the two tie semantics `row_number` (used
    * throughout for determinism) deliberately does NOT have. Both
    * rank values are functions of the VALUE, not the row order, so
    * ties cost no cross-engine ambiguity; the rank filter compiles
    * to WindowGroupLimit like every other top-k here. */
  def qPriceRanks(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"p_brand").orderBy($"p_retailprice".desc)
    Tables.part(spark, dir)
      .select($"p_brand", $"p_partkey", $"p_retailprice")
      .withColumn("price_rank", rank().over(w).cast("long"))
      .withColumn("price_dense", dense_rank().over(w).cast("long"))
      .filter($"price_rank" <= 10)
      .orderBy($"p_brand", $"price_rank", $"p_partkey")
  }

  /** The SQL-text surface: the same library serves `spark.sql` over
    * registered views — Catalyst plans text and DataFrame calls
    * identically, so every scale property (pushdown, AQE strategy
    * choice) carries over. The decimal-parity recipe is spelled in SQL
    * here, proving it is expressible from both APIs. */
  def qSqlSurface(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders_v")
    Tables.customer(spark, dir).createOrReplaceTempView("customer_v")
    spark.sql(
      """SELECT c_mktsegment,
         count(*) AS n_orders,
         CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_value
         FROM orders_v JOIN customer_v ON o_custkey = c_custkey
         GROUP BY c_mktsegment
         ORDER BY c_mktsegment""")
  }

  val PivotYears: Seq[Int] = 1995 to 2001

  /** UNPIVOT — the inverse of the status×year pivot: melt the static
    * year columns back to (status, year, n) long form with
    * `Dataset.unpivot` (one narrow Expand pass, no shuffle beyond the
    * upstream aggregate). The wide frame it inverts is
    * [[pivotStatusYear]]'s. */
  def qUnpivotStatusYear(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    pivotStatusYear(spark, dir)
      .unpivot(Array($"o_orderstatus"),
        PivotYears.map(y => col(s"y$y")).toArray, "year_col", "n_orders")
      .select($"o_orderstatus",
        substring($"year_col", 2, 4).cast("int").as("year"), $"n_orders")
      .orderBy($"o_orderstatus", $"year")
  }

  /** Grouped pivot (SURVEY §2.5 A1): order counts per status × year, as
    * explicit conditional aggregates so the output schema is static (a
    * dynamic `.pivot()` would need a values scan first; at 100 TB the
    * two-pass inference is the wrong default).
    */
  def pivotStatusYear(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val years = PivotYears
    val yr = year($"o_orderdate")
    Tables.orders(spark, dir)
      .groupBy($"o_orderstatus")
      .agg(
        count(lit(1)).as("total"),
        years.map(y => sum(when(yr === y, 1).otherwise(0)).as(s"y$y")): _*)
      .orderBy($"o_orderstatus")
  }
}
