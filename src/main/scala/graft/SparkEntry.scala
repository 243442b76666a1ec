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
    // LegiScan reference pipelines (SURVEY §3) over the committed fixtures
    "q_bill_search"        -> (BillSearch.qBillSearch _),
    "q_legislator_counts"  -> (LegislatorCounts.qLegislatorCounts _),
    "q_dodd_side_branch"   -> (LegislatorCounts.qDoddSideBranch _),
    "q_fulltext_search"    -> (FullText.qFullTextSearch _),
    "q_budget_bills"       -> (FullText.qBudgetBills _),
    "q_budget_semi_join"   -> (FullText.qBudgetSemiJoin _),
    "q_chaptered_texts"    -> (FullText.qChapteredTexts _),
    "q_decode_payloads"    -> (FullText.qDecodePayloads _),
  )

  /** Absolute fixture paths for the DuckDB oracle (the driver's DuckDB
    * only creates views for the testdata tables; fixture tables are read
    * by absolute parquet path, same bytes both engines). */
  private val FX = "/root/repo/fixtures/legiscan"
  private def fx(name: String): String = s"read_parquet('$FX/$name.parquet/*.parquet')"

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
    "q_bill_search" ->
      s"""SELECT bill_number, session.session_name AS session, status,
         regexp_replace(texts[1].state_link, '#.+$$', '') AS link,
         title, description
         FROM ${fx("bills")}
         WHERE contains(title, 'affordab') OR contains(description, 'affordab')
            OR contains(title, 'cost') OR contains(description, 'cost')
         ORDER BY session, bill_number""",
    "q_legislator_counts" ->
      s"""WITH latest AS (
           SELECT people_id, name, role, district, committee_id FROM (
             SELECT *, row_number() OVER (PARTITION BY people_id ORDER BY session DESC) AS rk
             FROM ${fx("people")}) WHERE rk = 1),
         credits AS (
           SELECT CAST(session.year_start AS VARCHAR) || '-' || CAST(session.year_end AS VARCHAR) AS sess,
                  unnest(CASE WHEN len(list_filter(sponsors, s -> s.sponsor_type_id = 1)) > 0
                         THEN list_transform(list_filter(sponsors, s -> s.sponsor_type_id = 1), s -> s.people_id)
                         ELSE list_transform(sponsors[1:1], s -> s.people_id) END) AS people_id
           FROM ${fx("bills")} WHERE bill_type = 'B' AND status = 4),
         counts AS (
           SELECT people_id,
             CAST(sum(CASE WHEN sess = '2017-2018' THEN 1 ELSE 0 END) AS BIGINT) AS s2017_2018,
             CAST(sum(CASE WHEN sess = '2019-2020' THEN 1 ELSE 0 END) AS BIGINT) AS s2019_2020,
             CAST(sum(CASE WHEN sess = '2021-2022' THEN 1 ELSE 0 END) AS BIGINT) AS s2021_2022
           FROM credits GROUP BY people_id)
         SELECT name,
           CASE WHEN role = 'Rep' THEN 'Asm' ELSE role END AS chamber,
           regexp_replace(district, '^HD-', 'AD-') AS district,
           COALESCE(s2017_2018, CAST(0 AS BIGINT)) AS s2017_2018,
           COALESCE(s2019_2020, CAST(0 AS BIGINT)) AS s2019_2020,
           COALESCE(s2021_2022, CAST(0 AS BIGINT)) AS s2021_2022,
           -- NB: spelled out (not via the aliases above) — DuckDB binds a
           -- name to the base table column (NULL for unmatched) before a
           -- same-named lateral alias.
           COALESCE(s2017_2018, CAST(0 AS BIGINT)) + COALESCE(s2019_2020, CAST(0 AS BIGINT))
             + COALESCE(s2021_2022, CAST(0 AS BIGINT)) AS total,
           ((CASE WHEN COALESCE(s2017_2018, 0) > 0 THEN 1 ELSE 0 END) +
            (CASE WHEN COALESCE(s2019_2020, 0) > 0 THEN 1 ELSE 0 END) +
            (CASE WHEN COALESCE(s2021_2022, 0) > 0 THEN 1 ELSE 0 END)) * 2 AS years_in_data,
           CASE WHEN years_in_data = 0 THEN 'NaN'::DOUBLE
                ELSE CAST(total AS DOUBLE) / years_in_data END AS bills_per_year
         FROM latest LEFT JOIN counts USING (people_id)
         WHERE committee_id = 0
         ORDER BY name, district, chamber, total""",
    "q_dodd_side_branch" ->
      s"""WITH credits AS (
           SELECT CAST(session.year_start AS VARCHAR) || '-' || CAST(session.year_end AS VARCHAR) AS session,
                  bill_number, status_date, title, description,
                  CASE WHEN len(list_filter(sponsors, s -> s.sponsor_type_id = 1)) > 0
                       THEN list_transform(list_filter(sponsors, s -> s.sponsor_type_id = 1), s -> s.people_id)
                       ELSE list_transform(sponsors[1:1], s -> s.people_id) END AS ids
           FROM ${fx("bills")} WHERE bill_type = 'B' AND status = 4)
         SELECT session, bill_number, status_date, title, description
         FROM credits WHERE list_contains(ids, 9007)
         ORDER BY session, bill_number""",
    "q_fulltext_search" ->
      s"""WITH corpus AS (
           SELECT file, trim(regexp_replace(regexp_replace(regexp_replace(
             regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
               html, '<[^>]+>', ' ', 'g'),
               '&amp;', '&', 'g'), '&lt;', '<', 'g'), '&gt;', '>', 'g'),
               '&nbsp;', ' ', 'g'), '&quot;', '"', 'g'), '&#39;', chr(39), 'g'),
             '\\s+', ' ', 'g')) AS text
           FROM ${fx("bill_texts")}),
         matched AS (
           SELECT t.term, c.file FROM corpus c
           CROSS JOIN (VALUES ('appropriation'), ('education'), ('water')) t(term)
           WHERE contains(lower(c.text), lower(t.term)))
         SELECT term, file,
           regexp_replace(file, '^20[0-9]{2}_([A-Z]+)([0-9]+)\\.html$$', '\\1 \\2') AS bill,
           CASE WHEN CAST(regexp_extract(file, '^(20[0-9]{2})_', 1) AS INTEGER) % 2 = 1
                THEN regexp_extract(file, '^(20[0-9]{2})_', 1) || '-' ||
                     CAST(CAST(regexp_extract(file, '^(20[0-9]{2})_', 1) AS INTEGER) + 1 AS VARCHAR)
                ELSE CAST(CAST(regexp_extract(file, '^(20[0-9]{2})_', 1) AS INTEGER) - 1 AS VARCHAR)
                     || '-' || regexp_extract(file, '^(20[0-9]{2})_', 1) END AS fiscal_year,
           'https://leginfo.legislature.ca.gov/faces/billNavClient.xhtml?bill_id=' ||
             replace(fiscal_year, '-', '') || '0' || replace(bill, ' ', '') AS link
         FROM matched
         ORDER BY term, file""",
    "q_budget_bills" ->
      s"""WITH raw_lines AS (
           SELECT year, unnest(string_split(text, chr(10))) AS line FROM ${fx("sbud")}),
         lines AS (SELECT year, ltrim(line) AS line FROM raw_lines)
         SELECT year,
           replace(regexp_replace(line, '^([AS][BC]A? [0-9]+).*$$', '\\1'), ' ', '') AS bill_number
         FROM lines WHERE regexp_matches(line, '^[AS][BC]A? [0-9]')
         ORDER BY year, bill_number""",
    "q_budget_semi_join" ->
      s"""WITH raw_lines AS (
           SELECT year, unnest(string_split(text, chr(10))) AS line FROM ${fx("sbud")}),
         budget AS (
           SELECT year,
             replace(regexp_replace(ltrim(line), '^([AS][BC]A? [0-9]+).*$$', '\\1'), ' ', '') AS bill_number
           FROM raw_lines WHERE regexp_matches(ltrim(line), '^[AS][BC]A? [0-9]')),
         b2 AS (
           SELECT CASE WHEN year % 2 = 1
                       THEN CAST(year AS VARCHAR) || '-' || CAST(year + 1 AS VARCHAR)
                       ELSE CAST(year - 1 AS VARCHAR) || '-' || CAST(year AS VARCHAR) END AS sess,
                  bill_number
           FROM budget)
         SELECT CAST(b.session.year_start AS VARCHAR) || '-' || CAST(b.session.year_end AS VARCHAR) AS session,
                b.bill_number, b.status
         FROM ${fx("bills")} b
         WHERE EXISTS (SELECT 1 FROM b2
                       WHERE b2.sess = CAST(b.session.year_start AS VARCHAR) || '-' || CAST(b.session.year_end AS VARCHAR)
                         AND b2.bill_number = b.bill_number)
         ORDER BY session, bill_number""",
    "q_chaptered_texts" ->
      s"""SELECT CAST(session.year_start AS VARCHAR) || '-' || CAST(session.year_end AS VARCHAR) AS session,
           bill_number, texts[-1].doc_id AS last_doc_id,
           CAST(len(texts) AS INTEGER) AS n_texts
         FROM ${fx("bills")}
         WHERE list_contains([x.type for x in texts], 'Chaptered')
         ORDER BY session, bill_number""",
    "q_decode_payloads" ->
      s"""WITH d AS (
           SELECT doc_id, file, decode(from_base64(payload_b64)) AS html FROM ${fx("doc_payloads")})
         SELECT doc_id, file, CAST(length(html) AS INTEGER) AS n_chars,
                contains(html, 'appropriated') AS has_appropriation
         FROM d ORDER BY file""",
  )
}
