package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import graft.sources.Tables

/** The relational query suite: one named query per capability category of
  * SURVEY.md §2b, each paired with an ANSI-SQL oracle executed by DuckDB over
  * the same parquet (the driver's t2 gate).
  *
  * The reference framework has no relational operators — projection/filter are
  * expressible only inside its pickled map fn (`/root/reference/Worker.fs:20`),
  * aggregation only as the per-key fold (`/root/reference/Worker.fs:89-96`),
  * and joins/windows/sorts/set-ops are ABSENT. This suite is the capability
  * surface those slots imply, declared as Column expressions (never closures)
  * so Catalyst can push filters to the parquet scan, prune columns, reorder
  * joins, and plan partial aggregation — all things the reference's opaque
  * pickled functions made impossible (SURVEY.md §4).
  *
  * Oracle-parity conventions (see also `Verify.scala`):
  *   - Double sums are order-sensitive, and Spark sums in parallel while DuckDB
  *     sums serially. Every aggregate over a double column therefore routes
  *     through exact DECIMAL arithmetic and casts the final value back to
  *     DOUBLE — bit-identical on both engines.
  *   - Every query ends in a total ORDER BY (all key columns) so row order is
  *     deterministic on both sides.
  *   - Output column names are aliased identically in the Spark plan and the
  *     oracle SQL.
  */
object Relational {

  // ---- decimal-exact arithmetic helpers (Spark side) ----------------------
  /** money column → exact decimal; 8 integer digits is ample for this schema */
  private def dec(c: Column): Column = c.cast(DecimalType(12, 4))
  /** (1 - x) / (1 + x) factors, renarrowed so products stay within p<=38 */
  private def oneMinus(c: Column): Column =
    (lit(1) - c.cast(DecimalType(6, 4))).cast(DecimalType(7, 4))
  private def onePlus(c: Column): Column =
    (lit(1) + c.cast(DecimalType(6, 4))).cast(DecimalType(7, 4))
  /** exact decimal sum, surfaced as double. The sum is renarrowed to scale 4
    * first so its unscaled value fits in 2^53: the decimal→double conversion
    * is then a single exact-operand division on both engines. (A scale-12
    * sum's unscaled value exceeds 2^53, and DuckDB's int128→double→divide
    * path double-rounds where Java's BigDecimal parse rounds once — observed
    * as 1-ulp q01 mismatches at sf0.001.) */
  private def toDouble(sumCol: Column): Column =
    sumCol.cast(DecimalType(28, 4)).cast(DoubleType)
  private def dsum(c: Column): Column = toDouble(sum(dec(c)))
  private def dsumExpr(c: Column): Column = toDouble(sum(c))
  private def davg(c: Column): Column = toDouble(sum(dec(c))) / count(lit(1))

  // ---- same helpers, oracle (DuckDB SQL) side -----------------------------
  private def sqlDec(c: String) = s"CAST($c AS DECIMAL(12,4))"
  private def sqlOneMinus(c: String) =
    s"CAST(1 - CAST($c AS DECIMAL(6,4)) AS DECIMAL(7,4))"
  private def sqlOnePlus(c: String) =
    s"CAST(1 + CAST($c AS DECIMAL(6,4)) AS DECIMAL(7,4))"
  // ROUND (half away from zero) == Spark's HALF_UP decimal cast for the
  // all-positive sums here; DuckDB's own decimal downscale cast TRUNCATES.
  private def sqlToDouble(sumExpr: String) =
    s"CAST(ROUND($sumExpr, 4) AS DOUBLE)"
  private def sqlDsum(c: String) = sqlToDouble(s"SUM(${sqlDec(c)})")
  private def sqlDavg(c: String) =
    s"${sqlToDouble(s"SUM(${sqlDec(c)})")} / COUNT(*)"

  private val revenueExpr: Column =
    dec(col("l_extendedprice")) * oneMinus(col("l_discount"))
  private val sqlRevenue =
    s"${sqlDec("l_extendedprice")} * ${sqlOneMinus("l_discount")}"

  // =========================================================================
  // q01 — pricing summary (flagship): scan → pushed filter → hash aggregation
  // (partial+final) over two low-cardinality keys. This is the reference's
  // frequency-count shape (`/root/reference/Example-Job.fs:52-61`) upgraded to
  // a full multi-aggregate. TPC-H Q1 silhouette.
  // =========================================================================
  def q01PricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsumExpr(revenueExpr).as("sum_disc_price"),
        dsumExpr(revenueExpr * onePlus(col("l_tax"))).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val q01Sql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${sqlDsum("l_quantity")} AS sum_qty,
       |  ${sqlDsum("l_extendedprice")} AS sum_base_price,
       |  CAST(ROUND(SUM($sqlRevenue), 4) AS DOUBLE) AS sum_disc_price,
       |  CAST(ROUND(SUM($sqlRevenue * ${sqlOnePlus("l_tax")}), 4) AS DOUBLE) AS sum_charge,
       |  ${sqlDavg("l_quantity")} AS avg_qty,
       |  ${sqlDavg("l_extendedprice")} AS avg_price,
       |  ${sqlDavg("l_discount")} AS avg_disc,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // =========================================================================
  // q02 — projection + predicate pushdown: row-level filter & computed column.
  // The reference expresses filters by emitting zero pairs from the map fn
  // (SURVEY.md §2b); here the predicate reaches the parquet reader.
  // =========================================================================
  def q02FilterProject(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(
        col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
        col("l_shipdate") <  lit("1997-01-01").cast(TimestampType) &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        (dec(col("l_extendedprice")) * dec(col("l_discount")))
          .cast(DoubleType).as("disc_amount"))
      .orderBy("l_orderkey", "l_linenumber")

  val q02Sql: String =
    s"""SELECT l_orderkey, l_linenumber,
       |  CAST(${sqlDec("l_extendedprice")} * ${sqlDec("l_discount")} AS DOUBLE) AS disc_amount
       |FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
       |  AND l_discount BETWEEN 0.05 AND 0.07
       |  AND l_quantity < 24
       |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // =========================================================================
  // q03 — multi-way equi join (5 tables) + aggregation. ABSENT in the
  // reference (SURVEY.md §2b "joins"). Dimension tables (region, nation) are
  // broadcast; the orders⋈lineitem join shuffles on the order key. TPC-H Q5
  // silhouette.
  // =========================================================================
  def q03JoinRevenueByNation(spark: SparkSession, dir: String): DataFrame = {
    val region = broadcast(Tables.region(spark, dir)
      .filter(col("r_name") === "ASIA"))
    val nation = broadcast(Tables.nation(spark, dir))
    val customer = Tables.customer(spark, dir)
    val orders = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast(TimestampType) &&
              col("o_orderdate") <  lit("1998-01-01").cast(TimestampType))
    val lineitem = Tables.lineitem(spark, dir)
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(nation, col("c_nationkey") === col("n_nationkey"))
      .join(region, col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(dsumExpr(revenueExpr).as("revenue"),
           count(lit(1)).as("n_lines"))
      .orderBy("n_name")
  }

  val q03Sql: String =
    s"""SELECT n_name,
       |  CAST(ROUND(SUM($sqlRevenue), 4) AS DOUBLE) AS revenue,
       |  COUNT(*) AS n_lines
       |FROM lineitem
       |JOIN orders   ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation   ON c_nationkey = n_nationkey
       |JOIN region   ON n_regionkey = r_regionkey
       |WHERE r_name = 'ASIA'
       |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
       |  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
       |GROUP BY n_name
       |ORDER BY n_name""".stripMargin

  // =========================================================================
  // q04 — explicit broadcast join on a fact⋈dim pair: no shuffle of the big
  // side at all. At 100 TB `part` fits in memory per executor; lineitem never
  // moves. (Left to AQE this would usually broadcast anyway — made explicit
  // here as the scale-posture idiom.)
  // =========================================================================
  def q04BroadcastJoinBrand(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(dsum(col("l_quantity")).as("sum_qty"),
           dsumExpr(revenueExpr).as("revenue"),
           count(lit(1)).as("n_lines"))
      .orderBy("p_brand")

  val q04Sql: String =
    s"""SELECT p_brand,
       |  ${sqlDsum("l_quantity")} AS sum_qty,
       |  CAST(ROUND(SUM($sqlRevenue), 4) AS DOUBLE) AS revenue,
       |  COUNT(*) AS n_lines
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |GROUP BY p_brand
       |ORDER BY p_brand""".stripMargin

  // =========================================================================
  // q05 — left semi join (EXISTS): customers having at least one open order.
  // =========================================================================
  def q05SemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val openOrders = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "O")
    Tables.customer(spark, dir)
      .join(openOrders, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
           davg(col("c_acctbal")).as("avg_bal"))
      .orderBy("c_mktsegment")
  }

  val q05Sql: String =
    s"""SELECT c_mktsegment,
       |  COUNT(*) AS n_customers,
       |  ${sqlDavg("c_acctbal")} AS avg_bal
       |FROM customer
       |WHERE EXISTS (SELECT 1 FROM orders
       |              WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
       |GROUP BY c_mktsegment
       |ORDER BY c_mktsegment""".stripMargin

  // =========================================================================
  // q06 — left anti join (NOT EXISTS): customers who never placed a large
  // order, rolled up by nation.
  // =========================================================================
  def q06AntiJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir).filter(col("o_totalprice") > 300000.0),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("n_name")

  val q06Sql: String =
    """SELECT n_name, COUNT(*) AS n_customers
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  // =========================================================================
  // q07 — window functions: ranking + analytic (lag) with a deterministic
  // tie-break; scalable top-k-per-group (ABSENT in the reference). At scale
  // this shuffles once on the partition key — no driver-side sort.
  // =========================================================================
  def q07WindowTopOrders(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w))
      .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"),
              col("o_totalprice"), col("prev_price"))
      .orderBy("o_custkey", "rn")
  }

  val q07Sql: String =
    """SELECT o_custkey, rn, o_orderkey, o_totalprice, prev_price
      |FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn,
      |    LAG(o_totalprice, 1) OVER (PARTITION BY o_custkey
      |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS prev_price
      |  FROM orders) t
      |WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin

  // =========================================================================
  // q08 — global sort + limit (top-k). Spark plans TakeOrderedAndProject:
  // per-partition top-k then a k-sized driver merge — no full sort at scale.
  // =========================================================================
  def q08TopOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(100)

  val q08Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey ASC
      |LIMIT 100""".stripMargin

  // =========================================================================
  // q09 — set operations: UNION / INTERSECT / EXCEPT (all distinct-semantics,
  // matching SQL). ABSENT in the reference — its dict merge is a *disjoint*
  // union (`/root/reference/Orchestrator.fs:166-168`), not a relational one.
  // =========================================================================
  private def buyersOfYear(spark: SparkSession, dir: String, y: Int): DataFrame =
    Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit(f"$y-01-01").cast(TimestampType) &&
              col("o_orderdate") <  lit(f"${y + 1}-01-01").cast(TimestampType))
      .select(col("o_custkey").as("custkey"))

  def q09SetOps(spark: SparkSession, dir: String): DataFrame = {
    val b95 = buyersOfYear(spark, dir, 1995)
    val b96 = buyersOfYear(spark, dir, 1996)
    val b97 = buyersOfYear(spark, dir, 1997)
    val b98 = buyersOfYear(spark, dir, 1998)
    b95.union(b96).intersect(b97).except(b98).orderBy("custkey")
  }

  // NOTE: INTERSECT binds tighter than UNION/EXCEPT in SQL, so the chain is
  // nested explicitly to mirror the DataFrame call order ((A∪B)∩C)∖D.
  val q09Sql: String =
    """SELECT custkey FROM (
      |  SELECT custkey FROM (
      |    SELECT custkey FROM (
      |      SELECT o_custkey AS custkey FROM orders
      |        WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
      |      UNION
      |      SELECT o_custkey FROM orders
      |        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |    )
      |    INTERSECT
      |    SELECT o_custkey FROM orders
      |      WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  )
      |  EXCEPT
      |  SELECT o_custkey FROM orders
      |    WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
      |) ORDER BY custkey""".stripMargin

  // =========================================================================
  // q10 — distinct aggregation (exact). Spark plans the expand+two-phase
  // distinct aggregate; at scale prefer approx_count_distinct (see
  // Pipeline.approxDistinct for the HLL variant, oracle-exempt).
  // =========================================================================
  def q10DistinctAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
           countDistinct(col("o_custkey")).as("n_customers"),
           countDistinct(col("o_orderstatus")).as("n_statuses"),
           dsum(col("o_totalprice")).as("total_price"))
      .orderBy("o_orderpriority")

  val q10Sql: String =
    s"""SELECT o_orderpriority,
       |  COUNT(*) AS n_orders,
       |  COUNT(DISTINCT o_custkey) AS n_customers,
       |  COUNT(DISTINCT o_orderstatus) AS n_statuses,
       |  ${sqlDsum("o_totalprice")} AS total_price
       |FROM orders
       |GROUP BY o_orderpriority
       |ORDER BY o_orderpriority""".stripMargin

  // =========================================================================
  // q11 — ROLLUP (hierarchical grouping sets). NULL group keys are coalesced
  // to 'ALL' so ordering semantics match across engines.
  // =========================================================================
  def q11Rollup(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
              coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
              col("n"), col("sum_qty"))
      .orderBy("rf", "ls")

  val q11Sql: String =
    s"""SELECT COALESCE(l_returnflag, 'ALL') AS rf,
       |  COALESCE(l_linestatus, 'ALL') AS ls,
       |  COUNT(*) AS n,
       |  ${sqlDsum("l_quantity")} AS sum_qty
       |FROM lineitem
       |GROUP BY ROLLUP(l_returnflag, l_linestatus)
       |ORDER BY rf, ls""".stripMargin

  // =========================================================================
  // q12 — CUBE (all grouping sets).
  // =========================================================================
  def q12Cube(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
              coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
              col("n"), col("total"))
      .orderBy("status", "priority")

  val q12Sql: String =
    s"""SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       |  COALESCE(o_orderpriority, 'ALL') AS priority,
       |  COUNT(*) AS n,
       |  ${sqlDsum("o_totalprice")} AS total
       |FROM orders
       |GROUP BY CUBE(o_orderstatus, o_orderpriority)
       |ORDER BY status, priority""".stripMargin

  // =========================================================================
  // q13 — scalar string/math functions (codegen'd Column expressions; the
  // reference had only host-language arithmetic inside its pickled fns).
  // =========================================================================
  def q13StringMath(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(
        col("p_partkey"),
        lower(col("p_name")).as("name_lower"),
        length(col("p_name")).as("name_len"),
        substring(col("p_type"), 1, 5).as("type_prefix"),
        concat_ws(":", col("p_brand"), col("p_type")).as("brand_type"),
        (col("p_size") * 2 + 1).as("size2"),
        floor(col("p_retailprice")).as("price_floor"),
        (dec(col("p_retailprice")) * dec(lit(1.1)))
          .cast(DoubleType).as("price_up"))
      .orderBy("p_partkey")

  val q13Sql: String =
    s"""SELECT p_partkey,
       |  LOWER(p_name) AS name_lower,
       |  LENGTH(p_name) AS name_len,
       |  SUBSTRING(p_type, 1, 5) AS type_prefix,
       |  CONCAT_WS(':', p_brand, p_type) AS brand_type,
       |  p_size * 2 + 1 AS size2,
       |  CAST(FLOOR(p_retailprice) AS BIGINT) AS price_floor,
       |  CAST(${sqlDec("p_retailprice")} * ${sqlDec("1.1")} AS DOUBLE) AS price_up
       |FROM part
       |ORDER BY p_partkey""".stripMargin

  // =========================================================================
  // q14 — date/time functions: extraction, truncation, day arithmetic.
  // =========================================================================
  def q14DateMath(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("o_year"),
        quarter(col("o_orderdate")).as("o_quarter"),
        month(col("o_orderdate")).as("o_month"),
        dayofmonth(col("o_orderdate")).as("o_day"),
        datediff(col("o_orderdate").cast(DateType),
                 lit("1995-01-01").cast(DateType)).as("days_since_epoch"),
        date_trunc("month", col("o_orderdate"))
          .cast(DateType).as("order_month"))
      .orderBy("o_orderkey")

  val q14Sql: String =
    """SELECT o_orderkey,
      |  CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
      |  CAST(EXTRACT(quarter FROM o_orderdate) AS INT) AS o_quarter,
      |  CAST(EXTRACT(month FROM o_orderdate) AS INT) AS o_month,
      |  CAST(EXTRACT(day FROM o_orderdate) AS INT) AS o_day,
      |  CAST(DATE_DIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since_epoch,
      |  CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS order_month
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin

  // =========================================================================
  // q15 — semi-structured JSON extraction over events.props.
  // =========================================================================
  def q15Json(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast(LongType).as("k"),
        col("value"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(col("k")).as("sum_k"),
           davg(col("value")).as("avg_value"))
      .orderBy("event_type")

  val q15Sql: String =
    s"""SELECT event_type,
       |  COUNT(*) AS n,
       |  CAST(SUM(CAST(json_extract_string(props, '$$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       |  ${sqlDavg("value")} AS avg_value
       |FROM events
       |GROUP BY event_type
       |ORDER BY event_type""".stripMargin

  // =========================================================================
  // q16 — the SQL entry point: the same engine surface via spark.sql over
  // registered views (TPC-H Q3 silhouette: join + agg + top-k by revenue).
  // =========================================================================
  def q16SqlShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir, "customer", "orders", "lineitem")
    spark.sql(
      s"""SELECT l_orderkey,
         |  CAST(ROUND(SUM($sqlRevenue), 4) AS DOUBLE) AS revenue,
         |  CAST(o_orderdate AS DATE) AS order_date
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY l_orderkey, o_orderdate
         |ORDER BY revenue DESC, l_orderkey ASC
         |LIMIT 20""".stripMargin)
  }

  val q16Sql: String =
    s"""SELECT l_orderkey,
       |  CAST(ROUND(SUM($sqlRevenue), 4) AS DOUBLE) AS revenue,
       |  CAST(o_orderdate AS DATE) AS order_date
       |FROM customer
       |JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
       |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
       |GROUP BY l_orderkey, o_orderdate
       |ORDER BY revenue DESC, l_orderkey ASC
       |LIMIT 20""".stripMargin

  // =========================================================================
  // q19 — sessionization: gap-based session assignment per user (lag +
  // running conditional sum), then per-session stats. The batch twin of the
  // stateful-streaming path (graft.streaming); at scale this is one shuffle
  // on user_id and two window passes over it.
  // =========================================================================
  def q19Sessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts").asc,
      col("event_id").asc)
    Tables.events(spark, dir)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > 30L * 60 * 1000000, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_session"))
        .over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
           (max(unix_micros(col("ts"))) - min(unix_micros(col("ts"))))
             .as("duration_us"))
      .orderBy("user_id", "session_id")
  }

  val q19Sql: String =
    """WITH t AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS us,
      |    LAG(epoch_us(ts), 1) OVER (PARTITION BY user_id
      |                               ORDER BY ts ASC, event_id ASC) AS prev_us
      |  FROM events),
      |s AS (
      |  SELECT user_id, event_id, us,
      |    CASE WHEN prev_us IS NULL OR us - prev_us > 30*60*1000000
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM t),
      |g AS (
      |  SELECT user_id, us,
      |    CAST(SUM(new_session) OVER (PARTITION BY user_id
      |      ORDER BY us ASC, event_id ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM s)
      |SELECT user_id, session_id, COUNT(*) AS n_events,
      |  CAST(MAX(us) - MIN(us) AS BIGINT) AS duration_us
      |FROM g
      |GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  // =========================================================================
  // q20 — full outer join with null-handling: order counts per customer
  // including customers without orders and (synthetic) orders without
  // customers.
  // =========================================================================
  def q20OuterJoin(spark: SparkSession, dir: String): DataFrame = {
    val bigOrders = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > 250000.0)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_big"))
    Tables.customer(spark, dir)
      .join(bigOrders, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(
        coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        coalesce(col("c_mktsegment"), lit("UNKNOWN")).as("segment"),
        coalesce(col("n_big"), lit(0)).as("n_big"))
      .orderBy("custkey")
  }

  val q20Sql: String =
    """WITH big AS (
      |  SELECT o_custkey, COUNT(*) AS n_big FROM orders
      |  WHERE o_totalprice > 250000.0 GROUP BY o_custkey)
      |SELECT COALESCE(c_custkey, o_custkey) AS custkey,
      |  COALESCE(c_mktsegment, 'UNKNOWN') AS segment,
      |  CAST(COALESCE(n_big, 0) AS BIGINT) AS n_big
      |FROM customer FULL OUTER JOIN big ON c_custkey = o_custkey
      |ORDER BY custkey""".stripMargin

  // =========================================================================
  // q21 — array aggregation + array scalar functions, made deterministic
  // (sorted before joining) so the oracle can reproduce it.
  // =========================================================================
  def q21ArrayAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") <= 1000)
      .groupBy(col("l_orderkey"))
      .agg(
        count(lit(1)).as("n_lines"),
        array_join(sort_array(collect_list(col("l_linenumber"))), ",")
          .as("line_numbers"),
        array_max(collect_list(col("l_quantity"))).as("max_qty"),
        array_min(collect_list(col("l_quantity"))).as("min_qty"))
      .orderBy("l_orderkey")

  val q21Sql: String =
    """SELECT l_orderkey,
      |  COUNT(*) AS n_lines,
      |  array_to_string(list_sort(list(l_linenumber)), ',') AS line_numbers,
      |  list_max(list(l_quantity)) AS max_qty,
      |  list_min(list(l_quantity)) AS min_qty
      |FROM lineitem
      |WHERE l_orderkey <= 1000
      |GROUP BY l_orderkey
      |ORDER BY l_orderkey""".stripMargin

  // =========================================================================
  // q22 — salted two-phase aggregation over the reference's worst-case skew
  // shape (few hot keys). Result provably equals a direct groupBy (the merge
  // is associative; sums are decimal-exact) — the oracle is the plain GROUP
  // BY, which is the point.
  // =========================================================================
  def q22SaltedAgg(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Skew.saltedCountSum(
        Tables.lineitem(spark, dir),
        keys = Seq("l_returnflag"),
        sumCols = Map(
          "sum_qty" -> dec(col("l_quantity")),
          "sum_price" -> dec(col("l_extendedprice"))),
        salts = 16)
      .select(col("l_returnflag"), col("n"),
        col("sum_qty").cast(DoubleType).as("sum_qty"),
        col("sum_price").cast(DoubleType).as("sum_price"))
      .orderBy("l_returnflag")

  val q22Sql: String =
    s"""SELECT l_returnflag, COUNT(*) AS n,
       |  ${sqlDsum("l_quantity")} AS sum_qty,
       |  ${sqlDsum("l_extendedprice")} AS sum_price
       |FROM lineitem
       |GROUP BY l_returnflag
       |ORDER BY l_returnflag""".stripMargin

  // =========================================================================
  // q23 — approximate distinct (HyperLogLog++): the 100 TB stand-in for
  // q10's exact countDistinct. No oracle (sketch implementations differ);
  // the exact/approx relative error is asserted in scalatest instead.
  // =========================================================================
  def q23ApproxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_orderkey")).as("approx_orders"),
           approx_count_distinct(col("l_partkey")).as("approx_parts"))
      .orderBy("l_returnflag")

  // =========================================================================
  // q24 — explicit GROUPING SETS (the general form behind rollup/cube),
  // via the SQL surface.
  // =========================================================================
  def q24GroupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir, "lineitem")
    spark.sql(
      s"""SELECT COALESCE(l_returnflag, 'ALL') AS rf,
         |  COALESCE(l_linestatus, 'ALL') AS ls,
         |  COUNT(*) AS n,
         |  ${sqlDsum("l_quantity")} AS sum_qty
         |FROM lineitem
         |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
         |                        (l_returnflag, l_linestatus))
         |ORDER BY rf, ls""".stripMargin)
  }

  val q24Sql: String =
    s"""SELECT COALESCE(l_returnflag, 'ALL') AS rf,
       |  COALESCE(l_linestatus, 'ALL') AS ls,
       |  COUNT(*) AS n,
       |  ${sqlDsum("l_quantity")} AS sum_qty
       |FROM lineitem
       |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
       |                        (l_returnflag, l_linestatus))
       |ORDER BY rf, ls""".stripMargin

  // =========================================================================
  // q25 — pivot (orderstatus → columns). Oracle spelled as conditional
  // aggregation, which is also exactly how Catalyst lowers pivot.
  // =========================================================================
  def q25Pivot(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("o_orderpriority")

  val q25Sql: String =
    """SELECT o_orderpriority,
      |  COUNT(*) FILTER (o_orderstatus = 'F') AS "F",
      |  COUNT(*) FILTER (o_orderstatus = 'O') AS "O",
      |  COUNT(*) FILTER (o_orderstatus = 'P') AS "P"
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // =========================================================================
  // q26 — regex + string-function breadth (extract/replace/trim/pad/split).
  // =========================================================================
  def q26RegexString(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(
        col("p_partkey"),
        regexp_extract(col("p_brand"), "Brand#(\\d+)", 1)
          .cast(IntegerType).as("brand_num"),
        regexp_replace(col("p_type"), "[AEIOU]", "_").as("type_devoweled"),
        trim(lit(" x ")).as("trimmed"),
        lpad(col("p_size").cast(StringType), 4, "0").as("size_padded"),
        size(split(col("p_type"), " ")).as("type_words"))
      .orderBy("p_partkey")

  val q26Sql: String =
    """SELECT p_partkey,
      |  CAST(regexp_extract(p_brand, 'Brand#(\d+)', 1) AS INT) AS brand_num,
      |  regexp_replace(p_type, '[AEIOU]', '_', 'g') AS type_devoweled,
      |  trim(' x ') AS trimmed,
      |  lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
      |  CAST(len(string_split(p_type, ' ')) AS INT) AS type_words
      |FROM part
      |ORDER BY p_partkey""".stripMargin

  // =========================================================================
  // q27 — exact percentiles (interpolating): median + p90 of quantity per
  // return flag. Both engines interpolate linearly over the sorted values.
  // =========================================================================
  def q27Percentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.5)").as("median_qty"),
        expr("percentile(l_quantity, 0.9)").as("p90_qty"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  val q27Sql: String =
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.5) AS median_qty,
      |  quantile_cont(l_quantity, 0.9) AS p90_qty,
      |  COUNT(*) AS n
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // =========================================================================
  // q28 — equi join with a range predicate (ship within 90 days of order):
  // the equi key drives the exchange, the range conjunct filters post-match.
  // =========================================================================
  def q28RangePredicateJoin(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    Tables.lineitem(spark, dir)
      .join(o, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") >= col("o_orderdate") &&
        col("l_shipdate") < date_add(col("o_orderdate").cast(DateType), 90)
          .cast(TimestampType))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_fast_lines"),
           dsumExpr(revenueExpr).as("revenue"))
      .orderBy("o_orderpriority")
  }

  val q28Sql: String =
    s"""SELECT o_orderpriority,
       |  COUNT(*) AS n_fast_lines,
       |  CAST(ROUND(SUM($sqlRevenue), 4) AS DOUBLE) AS revenue
       |FROM lineitem JOIN orders
       |  ON l_orderkey = o_orderkey
       | AND l_shipdate >= o_orderdate
       | AND l_shipdate < CAST(CAST(o_orderdate AS DATE) + INTERVAL 90 DAY AS TIMESTAMP)
       |GROUP BY o_orderpriority
       |ORDER BY o_orderpriority""".stripMargin

  // =========================================================================
  // q29 — left outer join + map-type scalar functions: per-segment status→
  // count map built with map_from_entries, probed with element_at (missing
  // key → null → 0). Customers without orders survive the left join.
  // =========================================================================
  def q29LeftJoinMap(spark: SparkSession, dir: String): DataFrame = {
    val perCustStatus = Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_mktsegment"), col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"))
    perCustStatus
      .groupBy(col("c_mktsegment"))
      .agg(map_from_entries(sort_array(collect_list(
        struct(coalesce(col("o_orderstatus"), lit("NONE")).as("k"),
               col("cnt").as("v"))))).as("status_map"))
      .select(col("c_mktsegment"),
        coalesce(element_at(col("status_map"), "O"), lit(0L)).as("n_open"),
        coalesce(element_at(col("status_map"), "F"), lit(0L)).as("n_filled"),
        coalesce(element_at(col("status_map"), "NONE"), lit(0L)).as("n_no_orders"),
        size(map_keys(col("status_map"))).as("n_statuses"))
      .orderBy("c_mktsegment")
  }

  val q29Sql: String =
    """SELECT c_mktsegment,
      |  COUNT(*) FILTER (o_orderstatus = 'O') AS n_open,
      |  COUNT(*) FILTER (o_orderstatus = 'F') AS n_filled,
      |  COUNT(*) FILTER (o_orderstatus IS NULL) AS n_no_orders,
      |  CAST(COUNT(DISTINCT COALESCE(o_orderstatus, 'NONE')) AS INT) AS n_statuses
      |FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  // =========================================================================
  // q30 — as-of join (composed: tagged union + window; see operators.Joins):
  // each purchase event picks up the user's latest click at or before it.
  // DuckDB's native ASOF JOIN is the oracle.
  // =========================================================================
  def q30AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .withColumn("ts_us", unix_micros(col("ts")))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    // right side unique per (user, time): keep the max click value
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts_us"))
      .agg(max(col("value")).as("click_value"))
    graft.operators.Joins.asOf(purchases, clicks,
        keyCol = "user_id", timeCol = "ts_us",
        asofCols = Seq("click_value"))
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("asof_click_value"))
      .orderBy("event_id")
  }

  val q30Sql: String =
    """WITH p AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
      |  WHERE event_type = 'purchase'),
      |c AS (
      |  SELECT user_id, epoch_us(ts) AS ts_us, MAX(value) AS click_value
      |  FROM events WHERE event_type = 'click' GROUP BY user_id, epoch_us(ts))
      |SELECT p.event_id, p.user_id, p.ts_us, c.click_value AS asof_click_value
      |FROM p ASOF LEFT JOIN c
      |  ON p.user_id = c.user_id AND p.ts_us >= c.ts_us
      |ORDER BY event_id""".stripMargin

  // =========================================================================
  // q31 — bag-semantics set ops (INTERSECT ALL / EXCEPT ALL preserve
  // multiplicity, unlike q09's distinct forms).
  // =========================================================================
  def q31BagSetOps(spark: SparkSession, dir: String): DataFrame = {
    val a = Tables.lineitem(spark, dir)
      .filter(col("l_quantity") <= 25).select(col("l_orderkey").as("k"))
    val b = Tables.lineitem(spark, dir)
      .filter(col("l_quantity") >= 20).select(col("l_orderkey").as("k"))
    a.intersectAll(b)
      .groupBy(col("k")).agg(count(lit(1)).as("multiplicity"))
      .orderBy("k")
  }

  val q31Sql: String =
    """SELECT k, COUNT(*) AS multiplicity FROM (
      |  SELECT l_orderkey AS k FROM lineitem WHERE l_quantity <= 25
      |  INTERSECT ALL
      |  SELECT l_orderkey FROM lineitem WHERE l_quantity >= 20
      |)
      |GROUP BY k
      |ORDER BY k""".stripMargin

  // =========================================================================
  // q32 — generator/UDTF role: explode a per-row array into rows (the
  // reference's flatMap fan-out as a relational operator).
  // =========================================================================
  def q32Explode(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(explode(split(col("p_type"), " ")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .orderBy("word")

  val q32Sql: String =
    """SELECT word, COUNT(*) AS n
      |FROM part, unnest(string_split(p_type, ' ')) AS u(word)
      |GROUP BY word
      |ORDER BY word""".stripMargin

  // =========================================================================
  // q33 — correlated scalar subquery (TPC-H Q17 silhouette): parts whose
  // order quantity falls below 20% of that part's own average. Exercises
  // Catalyst's subquery decorrelation — the correlated aggregate rewrites to
  // a join against a per-partkey aggregate, not a per-row re-scan. AVG of
  // integer-valued doubles is exact, so both engines agree bit-for-bit; the
  // price sum stages through DECIMAL per the parity convention.
  // =========================================================================
  def q33CorrelatedSubquery(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir, "lineitem", "part")
    spark.sql(
      """SELECT p_brand,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) / 7.0, 4)
        |    AS DOUBLE) AS avg_yearly,
        |  COUNT(*) AS n_small
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE l_quantity < (
        |    SELECT 0.2 * AVG(l2.l_quantity)
        |    FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin)
  }

  val q33Sql: String =
    """SELECT p_brand,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) / 7.0, 4)
      |    AS DOUBLE) AS avg_yearly,
      |  COUNT(*) AS n_small
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE l_quantity < (
      |    SELECT 0.2 * AVG(l2.l_quantity)
      |    FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin

  // =========================================================================
  // q34 — global total-order sort. Unlike q08's TakeOrderedAndProject (top-k
  // never sorts globally), a full ordered result is the one case that needs
  // a RangePartitioning exchange: Spark samples the sort keys, computes
  // balanced range bounds, and each partition sorts independently — the
  // scalable total sort (no single-node merge; output stays partitioned in
  // key ranges). The NTZ timestamp leaves as tz-free epoch days.
  // =========================================================================
  def q34GlobalSort(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("2001-06-01").cast(TimestampType))
      .select(col("l_orderkey"), col("l_linenumber"),
        datediff(col("l_shipdate").cast(DateType),
          lit("1970-01-01").cast(DateType)).as("ship_day"),
        col("l_quantity"))
      .orderBy(col("ship_day"), col("l_orderkey"), col("l_linenumber"))

  val q34Sql: String =
    """SELECT l_orderkey, l_linenumber,
      |  CAST(DATE_DIFF('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
      |    AS INT) AS ship_day,
      |  l_quantity
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '2001-06-01'
      |ORDER BY ship_day, l_orderkey, l_linenumber""".stripMargin

  // =========================================================================
  // q35 — salted repartition join (the join-side analogue of q22's salted
  // aggregation): lineitem×part on partkey through Skew.saltedJoin, which
  // spreads each (possibly hot) partkey over 8 reducers and replicates the
  // projected part side 8× through one exchange. Row-identical to a plain
  // join — the oracle IS the plain join. Broadcast would beat this at
  // part's test size; the operator targets the 100 MB–10 GB dimension band
  // where broadcast stops being an option but AQE skew splitting hasn't
  // kicked in (documented on the operator).
  // =========================================================================
  def q35SaltedJoin(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Skew.saltedJoin(
        Tables.lineitem(spark, dir)
          .select(col("l_partkey"), col("l_quantity")),
        Tables.part(spark, dir)
          .select(col("p_partkey").as("l_partkey"), col("p_type")),
        keys = Seq("l_partkey"), salts = 8)
      .groupBy(col("p_type"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("l_quantity"))).cast(DoubleType).as("sum_qty"))
      .orderBy("p_type")

  val q35Sql: String =
    s"""SELECT p_type, COUNT(*) AS n, ${sqlDsum("l_quantity")} AS sum_qty
       |FROM lineitem JOIN part ON p_partkey = l_partkey
       |GROUP BY p_type
       |ORDER BY p_type""".stripMargin

  // =========================================================================
  // q36 — correlated LATERAL subquery with per-group limit: each customer's
  // two highest-value orders. Catalyst decorrelates the lateral into
  // Window + WindowGroupLimit (rank ≤ k pushed below the window — only k
  // rows per group survive the sort) + one join: the per-key top-k never
  // materializes any group's full order list. The in-lateral ORDER BY
  // carries the o_orderkey tiebreak so LIMIT 2 is deterministic.
  // =========================================================================
  def q36LateralTopk(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir, "customer", "orders")
    spark.sql(
      """SELECT c_custkey, o_orderkey, o_totalprice
        |FROM customer,
        |LATERAL (SELECT o_orderkey, o_totalprice FROM orders
        |         WHERE o_custkey = c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2)
        |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""".stripMargin)
  }

  val q36Sql: String =
    """SELECT c_custkey, o_orderkey, o_totalprice
      |FROM customer,
      |LATERAL (SELECT o_orderkey, o_totalprice FROM orders
      |         WHERE o_custkey = c_custkey
      |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2)
      |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""".stripMargin

  // =========================================================================
  // q37 — RANGE-framed moving aggregate: per customer, each order's trailing
  // 7-day order volume. Unlike q07's ROWS frames, a RANGE frame bounds by
  // the ORDER BY *value* (all orders within 6 days before this one), so
  // same-day orders share one frame regardless of row order — the
  // deterministic form of a moving window. One exchange on o_custkey; the
  // sum stays decimal-staged through the frame per the parity convention.
  // =========================================================================
  def q37MovingSum(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("day"))
      .rangeBetween(-6, 0)
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        datediff(col("o_orderdate").cast(DateType),
          lit("1995-01-01").cast(DateType)).as("day"),
        col("o_totalprice"))
      .select(col("o_orderkey"), col("o_custkey"), col("day"),
        toDouble(sum(dec(col("o_totalprice"))).over(w)).as("mov_sum"),
        count(lit(1)).over(w).as("n_in_window"))
      .orderBy("o_custkey", "day", "o_orderkey")
  }

  val q37Sql: String =
    s"""WITH t AS (
       |  SELECT o_orderkey, o_custkey,
       |    CAST(DATE_DIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
       |      AS INT) AS day,
       |    o_totalprice
       |  FROM orders)
       |SELECT o_orderkey, o_custkey, day,
       |  ${sqlToDouble(s"SUM(${sqlDec("o_totalprice")}) OVER w")} AS mov_sum,
       |  COUNT(*) OVER w AS n_in_window
       |FROM t
       |WINDOW w AS (PARTITION BY o_custkey ORDER BY day
       |             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
       |ORDER BY o_custkey, day, o_orderkey""".stripMargin

  // =========================================================================
  // q38 — forward as-of join with a tolerance bound: each purchase matched
  // to the user's EARLIEST click at-or-after it, kept only within 1 day
  // (pandas merge_asof(direction='forward', tolerance=...) semantics; q30
  // is the backward direction). Same single-exchange tagged-union window
  // plan — the match's own time is carried so the bound applies inside the
  // window pass. Oracle: DuckDB's native ASOF JOIN with the inequality
  // reversed, tolerance as a post-join CASE on the matched time.
  // =========================================================================
  def q38AsofForward(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .withColumn("ts_us", unix_micros(col("ts")))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts_us"))
      .agg(max(col("value")).as("click_value"))
    graft.operators.Joins.asOf(purchases, clicks,
        keyCol = "user_id", timeCol = "ts_us",
        asofCols = Seq("click_value"), direction = "forward",
        tolerance = Some(86400000000L))
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("asof_click_value"))
      .orderBy("event_id")
  }

  val q38Sql: String =
    """WITH p AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
      |  WHERE event_type = 'purchase'),
      |c AS (
      |  SELECT user_id, epoch_us(ts) AS ts_us, MAX(value) AS click_value
      |  FROM events WHERE event_type = 'click' GROUP BY user_id, epoch_us(ts))
      |SELECT p.event_id, p.user_id, p.ts_us,
      |  CASE WHEN c.ts_us - p.ts_us <= 86400000000
      |       THEN c.click_value END AS asof_click_value
      |FROM p ASOF LEFT JOIN c
      |  ON p.user_id = c.user_id AND p.ts_us <= c.ts_us
      |ORDER BY event_id""".stripMargin

  // =========================================================================
  // q39 — gap-filling imputation (forward fill): every event carries the
  // user's most recent purchase value at-or-before it — the canonical
  // time-series imputation shape, `last_value(... IGNORE NULLS)` over a
  // running per-user window. One exchange (hash by user_id); the window
  // buffer is spillable, so a 100 TB event log fills per-user state without
  // any driver involvement. Oracle: DuckDB's identical IGNORE NULLS window.
  // =========================================================================
  def q39ForwardFill(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    Tables.events(spark, dir)
      .withColumn("filled_value",
        last(when(col("event_type") === "purchase", col("value")),
          ignoreNulls = true).over(byUser))
      .select(col("event_id"), col("user_id"), col("filled_value"))
      .orderBy("event_id")
  }

  val q39Sql: String =
    """SELECT event_id, user_id,
      |  last_value(CASE WHEN event_type = 'purchase' THEN value END
      |             IGNORE NULLS)
      |    OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    AS filled_value
      |FROM events
      |ORDER BY event_id""".stripMargin

  // =========================================================================
  // q40 — recursive CTE calendar spine: generate every day of 1996 Q1 with
  // WITH RECURSIVE (Spark 4's UnionLoop operator) and LEFT JOIN daily order
  // counts so zero-order days appear explicitly — the canonical gap-filled
  // time series. The recursion generates only the driver-tiny spine (90
  // rows); the order side stays a pushed-filter scan + partial aggregate.
  // =========================================================================
  def q40RecursiveSpine(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders_q40")
    spark.sql(
      """WITH RECURSIVE days(d) AS (
        |  SELECT 0
        |  UNION ALL SELECT d + 1 FROM days WHERE d < 89)
        |SELECT CAST(days.d AS INT) AS day_off,
        |  COALESCE(c.n, 0) AS n_orders
        |FROM days LEFT JOIN (
        |  SELECT datediff(CAST(o_orderdate AS DATE), DATE '1996-01-01')
        |           AS day_off,
        |         COUNT(*) AS n
        |  FROM orders_q40
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |    AND o_orderdate < TIMESTAMP '1996-03-31'
        |  GROUP BY 1) c ON c.day_off = days.d
        |ORDER BY day_off""".stripMargin)
  }

  val q40Sql: String =
    """WITH RECURSIVE days(d) AS (
      |  SELECT 0
      |  UNION ALL SELECT d + 1 FROM days WHERE d < 89)
      |SELECT CAST(days.d AS INT) AS day_off,
      |  COALESCE(c.n, 0) AS n_orders
      |FROM days LEFT JOIN (
      |  SELECT CAST(DATE_DIFF('day', DATE '1996-01-01',
      |                        CAST(o_orderdate AS DATE)) AS INT) AS day_off,
      |         COUNT(*) AS n
      |  FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |    AND o_orderdate < TIMESTAMP '1996-03-31'
      |  GROUP BY 1) c ON c.day_off = days.d
      |ORDER BY day_off""".stripMargin

  // =========================================================================
  // q42 — ranking/navigation window breadth: ntile, percent_rank, cume_dist,
  // lag and lead over ONE shared window spec, so Catalyst plans a single
  // exchange + single sort for all five (one Window node). Partitioned by
  // o_custkey — cardinality that GROWS with the data (15k keys at sf0.01,
  // billions at 100 TB), so no per-partition straggler; the few-key variant
  // of this shape is served by Curation.percentRankByDomain instead.
  // percent_rank/cume_dist are exact integer ratios; lag/lead move the raw
  // double — every output is bit-reproducible in the oracle.
  // =========================================================================
  def q42WindowFunctions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    Tables.orders(spark, dir).select(
      col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
      ntile(4).over(w).as("quartile"),
      percent_rank().over(w).as("pr"),
      cume_dist().over(w).as("cd"),
      lag(col("o_totalprice"), 1).over(w).as("prev_price"),
      lead(col("o_totalprice"), 1).over(w).as("next_price"))
      .orderBy("o_orderkey")
  }

  val q42Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice,
      |  CAST(ntile(4) OVER w AS INT) AS quartile,
      |  percent_rank() OVER w AS pr,
      |  cume_dist() OVER w AS cd,
      |  lag(o_totalprice, 1) OVER w AS prev_price,
      |  lead(o_totalprice, 1) OVER w AS next_price
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey
      |             ORDER BY epoch_us(o_orderdate), o_orderkey)
      |ORDER BY o_orderkey""".stripMargin

  // =========================================================================
  // q43 — statistical moments (variance / stddev / covariance / correlation)
  // WITHOUT the built-in aggregates: Spark's stddev/corr stream IEEE doubles
  // in partition order, so their results change run to run — unacceptable
  // against a bit-exact oracle. Instead the five raw moments are exact
  // DECIMAL sums (order-independent), each renarrowed once so its unscaled
  // value stays under 2^53 (second moments to scale 0 — sum(y²) ≈ 3e15 at
  // sf0.1; scale 4 would overflow the exact-double window), then the
  // variance/corr formulas run on those doubles in one fixed expression
  // order on both engines. Still one partial+final hash aggregation.
  // =========================================================================
  def q43StatsMoments(spark: SparkSession, dir: String): DataFrame = {
    val x = dec(col("l_quantity"))
    val y = dec(col("l_extendedprice"))
    def m0(c: Column): Column = // second-moment sums: renarrow to scale 0
      sum(c).cast(DecimalType(38, 0)).cast(DoubleType)
    val n = col("n")
    val (sx, sy, sx2, sy2, sxy) =
      (col("sx"), col("sy"), col("sx2"), col("sy2"), col("sxy"))
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        dsum(col("l_quantity")).as("sx"),
        dsum(col("l_extendedprice")).as("sy"),
        m0(x * x).as("sx2"), m0(y * y).as("sy2"), m0(x * y).as("sxy"))
      .select(col("l_returnflag"), n,
        ((sx2 - ((sx * sx) / n)) / (n - 1)).as("var_qty"),
        sqrt((sx2 - ((sx * sx) / n)) / (n - 1)).as("stddev_qty"),
        ((sxy - ((sx * sy) / n)) / (n - 1)).as("covar_qp"),
        (((n * sxy) - (sx * sy)) /
          (sqrt((n * sx2) - (sx * sx)) * sqrt((n * sy2) - (sy * sy))))
          .as("corr_qp"))
      .orderBy("l_returnflag")
  }

  val q43Sql: String = {
    def m0(prod: String) =
      s"CAST(CAST(ROUND(SUM($prod), 0) AS DECIMAL(30,0)) AS DOUBLE)"
    // DECIMAL(19,4), not (12,4): DuckDB executes a (p<=18)×(p<=18) decimal
    // multiply in int64 and overflows on price×price; 19 digits forces the
    // int128 kernel. The VALUES are identical — only the width changes.
    val (x, y) = ("CAST(l_quantity AS DECIMAL(19,4))",
      "CAST(l_extendedprice AS DECIMAL(19,4))")
    s"""WITH m43 AS (SELECT l_returnflag,
       |    COUNT(*) AS n,
       |    ${sqlDsum("l_quantity")} AS sx,
       |    ${sqlDsum("l_extendedprice")} AS sy,
       |    ${m0(s"$x * $x")} AS sx2,
       |    ${m0(s"$y * $y")} AS sy2,
       |    ${m0(s"$x * $y")} AS sxy
       |  FROM lineitem GROUP BY l_returnflag)
       |SELECT l_returnflag, n,
       |  ((sx2 - ((sx * sx) / n)) / (n - 1)) AS var_qty,
       |  sqrt((sx2 - ((sx * sx) / n)) / (n - 1)) AS stddev_qty,
       |  ((sxy - ((sx * sy) / n)) / (n - 1)) AS covar_qp,
       |  (((n * sxy) - (sx * sy)) /
       |    (sqrt((n * sx2) - (sx * sx)) * sqrt((n * sy2) - (sy * sy))))
       |    AS corr_qp
       |FROM m43
       |ORDER BY l_returnflag""".stripMargin
  }

  // =========================================================================
  // q44 — OHLC time-series resample: purchase events downsampled to 15-min
  // buckets with open/high/low/close/volume — the canonical market-data
  // shape. open/close are min_by/max_by under a (ts, event_id) composite
  // order (event_id breaks ties, so the pick is deterministic under any
  // partitioning); volume stages through DECIMAL. Buckets are integer
  // µs-epoch divisions, identical on both engines. min_by/max_by partially
  // aggregate map-side like any other agg, so bucket count (time span) can
  // be small without creating a pre-shuffle hot spot.
  // =========================================================================
  def q44OhlcResample(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .withColumn("bucket", expr("unix_micros(ts) div 900000000"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_trades"),
        min_by(col("value"), struct(expr("unix_micros(ts)"), col("event_id")))
          .as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), struct(expr("unix_micros(ts)"), col("event_id")))
          .as("close"),
        toDouble(sum(dec(col("value")))).as("volume"))
      .orderBy("bucket")

  val q44Sql: String = {
    // DuckDB's min_by/max_by take a scalar ordering key, so the composite
    // (ts, event_id) order is packed into one HUGEINT: epoch_us·2^32 + id —
    // the same total order as Spark's lexicographic struct (ids < 2^32)
    val ord = "CAST(epoch_us(ts) AS HUGEINT) * 4294967296 + event_id"
    s"""SELECT epoch_us(ts) // 900000000 AS bucket,
       |  COUNT(*) AS n_trades,
       |  min_by("value", $ord) AS open,
       |  MAX("value") AS high,
       |  MIN("value") AS low,
       |  max_by("value", $ord) AS close,
       |  ${sqlToDouble(s"SUM(${sqlDec("\"value\"")})")} AS volume
       |FROM events
       |WHERE event_type = 'purchase'
       |GROUP BY 1
       |ORDER BY bucket""".stripMargin
  }

  // =========================================================================
  // q45 — fuzzy join (approximate string match): part-name pairs within edit
  // distance 2, BLOCKED on p_brand — the join is an ordinary equi-join on
  // the blocking key and the quadratic levenshtein only runs inside a
  // block, never corpus × corpus (the same candidate-bounding discipline as
  // the dedup operators; pick blocking keys so max block size is bounded at
  // 100 TB). levenshtein is exact integer edit distance on both engines.
  // =========================================================================
  def q45FuzzyJoin(spark: SparkSession, dir: String): DataFrame = {
    val parts = Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_name"), col("p_brand"))
    // compute the expensive scalar on DISTINCT (brand, name) values — real
    // catalogs repeat names heavily (64 distinct over 20k parts here), so
    // the quadratic runs on distinct-pairs-within-block, then id pairs
    // materialize by equi-joins. A first formulation ran levenshtein on
    // every row pair: 16.3 s at sf0.1; this one is ~40x cheaper. The
    // thresholded levenshtein (banded DP, early exit; returns -1 beyond
    // the bound) replaces the full DP since only dist <= 2 survives.
    val names = parts.select(col("p_brand"), col("p_name")).distinct()
    val nameMatch = names.select(col("p_brand"), col("p_name").as("name_a"))
      .join(names.select(col("p_brand"), col("p_name").as("name_b")),
        Seq("p_brand"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b"), 2))
      .filter(col("dist") >= 0)
    parts.select(col("p_partkey").as("id_a"), col("p_name").as("name_a"),
        col("p_brand"))
      .join(nameMatch, Seq("p_brand", "name_a"))
      .join(parts.select(col("p_partkey").as("id_b"),
        col("p_name").as("name_b"), col("p_brand")),
        Seq("p_brand", "name_b"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("name_a"), col("name_b"),
        col("dist"))
      .orderBy("id_a", "id_b")
  }

  val q45Sql: String =
    """SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
      |  a.p_name AS name_a, b.p_name AS name_b,
      |  CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
      |FROM part a JOIN part b
      |  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
      |WHERE levenshtein(a.p_name, b.p_name) <= 2
      |ORDER BY id_a, id_b""".stripMargin

  // =========================================================================
  // q46 — cohort retention: users bucketed by first-seen week; for each
  // (cohort, weeks-since-first) cell, how many of the cohort's users were
  // active. Two partial+final aggregations plus one co-partitioned join on
  // user_id; the final (cohort, age) grid is tiny. Week buckets are integer
  // µs-epoch divisions — everything stays exact integers.
  // =========================================================================
  def q46CohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val weekly = Tables.events(spark, dir)
      .select(col("user_id"),
        expr("unix_micros(ts) div 604800000000").as("week"))
      .distinct()
    val cohorts = weekly.groupBy(col("user_id"))
      .agg(min(col("week")).as("cohort"))
    weekly.join(cohorts, "user_id")
      .groupBy(col("cohort"), (col("week") - col("cohort")).as("age"))
      .agg(count(lit(1)).as("n_active"))
      .orderBy("cohort", "age")
  }

  val q46Sql: String =
    """WITH weekly AS (
      |  SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS week
      |  FROM events),
      |cohorts AS (
      |  SELECT user_id, MIN(week) AS cohort FROM weekly GROUP BY user_id)
      |SELECT cohort, week - cohort AS age, COUNT(*) AS n_active
      |FROM weekly JOIN cohorts USING (user_id)
      |GROUP BY cohort, age
      |ORDER BY cohort, age""".stripMargin

  // ---- registry -----------------------------------------------------------
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (q01PricingSummary _),
    "q02_filter_project" -> (q02FilterProject _),
    "q03_join_revenue_by_nation" -> (q03JoinRevenueByNation _),
    "q04_broadcast_join_brand" -> (q04BroadcastJoinBrand _),
    "q05_semi_join" -> (q05SemiJoin _),
    "q06_anti_join" -> (q06AntiJoin _),
    "q07_window_top_orders" -> (q07WindowTopOrders _),
    "q08_top_orders" -> (q08TopOrders _),
    "q09_set_ops" -> (q09SetOps _),
    "q10_distinct_agg" -> (q10DistinctAgg _),
    "q11_rollup" -> (q11Rollup _),
    "q12_cube" -> (q12Cube _),
    "q13_string_math" -> (q13StringMath _),
    "q14_date_math" -> (q14DateMath _),
    "q15_json" -> (q15Json _),
    "q16_sql_shipping_priority" -> (q16SqlShippingPriority _),
    "q19_sessionize" -> (q19Sessionize _),
    "q20_outer_join" -> (q20OuterJoin _),
    "q21_array_agg" -> (q21ArrayAgg _),
    "q22_salted_agg" -> (q22SaltedAgg _),
    "q23_approx_distinct" -> (q23ApproxDistinct _),
    "q24_grouping_sets" -> (q24GroupingSets _),
    "q25_pivot" -> (q25Pivot _),
    "q26_regex_string" -> (q26RegexString _),
    "q27_percentiles" -> (q27Percentiles _),
    "q28_range_predicate_join" -> (q28RangePredicateJoin _),
    "q29_left_join_map" -> (q29LeftJoinMap _),
    "q30_asof_join" -> (q30AsofJoin _),
    "q31_bag_set_ops" -> (q31BagSetOps _),
    "q32_explode" -> (q32Explode _),
    "q33_correlated_subquery" -> (q33CorrelatedSubquery _),
    "q34_global_sort" -> (q34GlobalSort _),
    "q35_salted_join" -> (q35SaltedJoin _),
    "q36_lateral_topk" -> (q36LateralTopk _),
    "q37_moving_sum" -> (q37MovingSum _),
    "q38_asof_forward" -> (q38AsofForward _),
    "q39_forward_fill" -> (q39ForwardFill _),
    "q40_recursive_spine" -> (q40RecursiveSpine _),
    "q42_window_functions" -> (q42WindowFunctions _),
    "q43_stats_moments" -> (q43StatsMoments _),
    "q44_ohlc_resample" -> (q44OhlcResample _),
    "q45_fuzzy_join" -> (q45FuzzyJoin _),
    "q46_cohort_retention" -> (q46CohortRetention _))

  val oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" -> q01Sql,
    "q02_filter_project" -> q02Sql,
    "q03_join_revenue_by_nation" -> q03Sql,
    "q04_broadcast_join_brand" -> q04Sql,
    "q05_semi_join" -> q05Sql,
    "q06_anti_join" -> q06Sql,
    "q07_window_top_orders" -> q07Sql,
    "q08_top_orders" -> q08Sql,
    "q09_set_ops" -> q09Sql,
    "q10_distinct_agg" -> q10Sql,
    "q11_rollup" -> q11Sql,
    "q12_cube" -> q12Sql,
    "q13_string_math" -> q13Sql,
    "q14_date_math" -> q14Sql,
    "q15_json" -> q15Sql,
    "q16_sql_shipping_priority" -> q16Sql,
    "q19_sessionize" -> q19Sql,
    "q20_outer_join" -> q20Sql,
    "q21_array_agg" -> q21Sql,
    "q22_salted_agg" -> q22Sql,
    "q24_grouping_sets" -> q24Sql,
    "q25_pivot" -> q25Sql,
    "q26_regex_string" -> q26Sql,
    "q27_percentiles" -> q27Sql,
    "q28_range_predicate_join" -> q28Sql,
    "q29_left_join_map" -> q29Sql,
    "q30_asof_join" -> q30Sql,
    "q31_bag_set_ops" -> q31Sql,
    "q32_explode" -> q32Sql,
    "q33_correlated_subquery" -> q33Sql,
    "q34_global_sort" -> q34Sql,
    "q35_salted_join" -> q35Sql,
    "q36_lateral_topk" -> q36Sql,
    "q37_moving_sum" -> q37Sql,
    "q38_asof_forward" -> q38Sql,
    "q39_forward_fill" -> q39Sql,
    "q40_recursive_spine" -> q40Sql,
    "q42_window_functions" -> q42Sql,
    "q43_stats_moments" -> q43Sql,
    "q44_ohlc_resample" -> q44Sql,
    "q45_fuzzy_join" -> q45Sql,
    "q46_cohort_retention" -> q46Sql)
}
