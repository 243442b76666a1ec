package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one operator from SURVEY §2 (or a §7
  * north-star addition) expressed over the driver testdata; [[oracleSql]]
  * holds the DuckDB-equivalent SQL the driver hash-compares against.
  * Column names/aliases are kept identical on both sides (the compare
  * sorts columns by name), and every query is deterministically ordered.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary"   -> (Relational.q1PricingSummary _),
    "q3_shipping_priority" -> (Relational.q3ShippingPriority _),
    "q5_region_volume"     -> (Relational.q5RegionVolume _),
    "q_top_orders_per_cust" -> (Relational.topOrdersPerCustomer _),
    "q_semi_join"          -> (Relational.semiJoinOrders _),
    "q_anti_join"          -> (Relational.antiJoinCustomers _),
    "q_union_branches"     -> (Relational.unionBranches _),
    "q_pivot_status_year"  -> (Relational.pivotStatusYear _),
  )

  /** DuckDB-runnable ANSI SQL equivalents, same parquet tables, same
    * column aliases, same ORDER BY. Table names resolve because Verify's
    * driver-side DuckDB maps `<name>` → `<sfDir>/<name>.parquet`.
    */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(round(sum(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty,
         CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_base_price,
         CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS sum_disc_price,
         CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))), 2) AS DOUBLE) AS sum_charge,
         count(*) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1998-09-01'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q3_shipping_priority" ->
      """SELECT l_orderkey,
         CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue,
         strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
         o_orderpriority
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1998-03-15'
           AND l_shipdate > TIMESTAMP '1995-03-15'
         GROUP BY l_orderkey, o_orderdate, o_orderpriority
         ORDER BY revenue DESC, l_orderkey
         LIMIT 10""",
    "q5_region_volume" ->
      """SELECT n_name,
         CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1998-01-01'
         GROUP BY n_name
         ORDER BY revenue DESC, n_name""",
    "q_top_orders_per_cust" ->
      """SELECT o_custkey, o_orderkey,
         CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS o_totalprice, rk
         FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
                  row_number() OVER (PARTITION BY o_custkey
                    ORDER BY CAST(o_totalprice AS DECIMAL(12,2)) DESC, o_orderkey) AS rk
           FROM orders)
         WHERE rk <= 3
         ORDER BY o_custkey, rk""",
    "q_semi_join" ->
      """SELECT o_orderpriority, count(*) AS n_orders
         FROM orders
         WHERE EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
         GROUP BY o_orderpriority
         ORDER BY o_orderpriority""",
    "q_anti_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers
         FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey
                             AND o_orderpriority = '1-URGENT')
         GROUP BY c_mktsegment
         ORDER BY c_mktsegment""",
    "q_union_branches" ->
      """SELECT bucket, count(DISTINCT o_custkey) AS n_cust, count(*) AS n_orders
         FROM (
           SELECT o_custkey, 'urgent' AS bucket FROM orders WHERE o_orderpriority = '1-URGENT'
           UNION ALL
           SELECT o_custkey, 'low' AS bucket FROM orders WHERE o_orderpriority = '5-LOW')
         GROUP BY bucket
         ORDER BY bucket""",
    // NB each sum is CAST AS BIGINT: DuckDB types sum(CASE..) as HUGEINT
    // (decimal128) while Spark's sum(when(..)) is BIGINT — identical values,
    // different typed hash. Same trick as the CAST-to-DOUBLE money sums.
    "q_pivot_status_year" ->
      """SELECT o_orderstatus, count(*) AS total,
         CAST(sum(CASE WHEN year(o_orderdate) = 1995 THEN 1 ELSE 0 END) AS BIGINT) AS y1995,
         CAST(sum(CASE WHEN year(o_orderdate) = 1996 THEN 1 ELSE 0 END) AS BIGINT) AS y1996,
         CAST(sum(CASE WHEN year(o_orderdate) = 1997 THEN 1 ELSE 0 END) AS BIGINT) AS y1997,
         CAST(sum(CASE WHEN year(o_orderdate) = 1998 THEN 1 ELSE 0 END) AS BIGINT) AS y1998,
         CAST(sum(CASE WHEN year(o_orderdate) = 1999 THEN 1 ELSE 0 END) AS BIGINT) AS y1999,
         CAST(sum(CASE WHEN year(o_orderdate) = 2000 THEN 1 ELSE 0 END) AS BIGINT) AS y2000,
         CAST(sum(CASE WHEN year(o_orderdate) = 2001 THEN 1 ELSE 0 END) AS BIGINT) AS y2001
         FROM orders
         GROUP BY o_orderstatus
         ORDER BY o_orderstatus""",
  )
}
