package graft.queries

import graft.Tables
import graft.ops.{HierarchyRollup, PivotFixed, Reconcile}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The SURVEY §2 operator inventory, one named query per operator
  * family, each runnable on a testdata scale-factor dir and paired with
  * a DuckDB oracle (see `oracle`). Numeric discipline: aggregate doubles
  * as DECIMAL so results are order-independent and hash-stable across
  * engines (double summation order differs between Spark partitions and
  * DuckDB).
  */
object Inventory {

  private def dec(c: String, p: Int = 18, s: Int = 2) =
    col(c).cast(DecimalType(p, s))

  // ---------------------------------------------------------------- G1-G5
  /** Grouped aggregation: sum/avg/max/count + post-agg HAVING
    * (reference: src/nass.sql:78-101,147-151,224-230; src/swap.sql:99-118).
    */
  def qAggGroup(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec("l_quantity")).as("sum_qty"),
        sum(dec("l_extendedprice")).as("sum_price"),
        max(dec("l_discount")).as("max_disc"),
        count(lit(1)).as("n"))
      .filter(col("n") > 0)

  val qAggGroupSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  sum(cast(l_quantity as decimal(18,2))) AS sum_qty,
      |  sum(cast(l_extendedprice as decimal(18,2))) AS sum_price,
      |  max(cast(l_discount as decimal(18,2))) AS max_disc,
      |  count(*) AS n
      |FROM lineitem GROUP BY 1,2 HAVING count(*) > 0""".stripMargin

  // ------------------------------------------------------------------- J3
  /** Multi-way inner join + group (TPC-H Q5 shape): revenue by nation.
    * Small dims (region/nation) broadcast automatically; the orders join
    * shuffles on the key. (reference join inventory: src/nass.sql:470,
    * src/swap.sql:93,126,159-161.)
    */
  def qJoinMulti(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        sum((dec("l_extendedprice", 18, 4) * (lit(1) - dec("l_discount", 18, 4)))
          .cast(DecimalType(24, 4))).as("revenue"),
        count(lit(1)).as("n_items"))

  val qJoinMultiSql: String =
    """SELECT r_name, n_name,
      |  sum(cast(cast(l_extendedprice as decimal(18,4)) *
      |      (1 - cast(l_discount as decimal(18,4))) as decimal(24,4))) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |GROUP BY 1,2""".stripMargin

  // ----------------------------------------------------------------- §2.6
  /** Iterative hierarchy rollup (the reference's recursive-CTE crown
    * jewel, src/nass.sql:198-230) over a path built from part attributes.
    */
  def qRollupHier(s: SparkSession, d: String): DataFrame = {
    val leaves = Tables.part(s, d).select(
      array(col("p_type"), col("p_brand"), col("p_name")).as("path"),
      dec("p_retailprice", 12, 2).as("price"))
    HierarchyRollup.rollup(
      leaves, Seq.empty, "path", Seq("price"), HierarchyRollup.SumMode)
      .select(array_join(col("path"), ", ").as("node"),
        col("price").cast(DecimalType(24, 2)).as("total"))
  }

  val qRollupHierSql: String =
    """WITH RECURSIVE b(path, price) AS (
      |  SELECT DISTINCT [p_type, p_brand, p_name],
      |         cast(p_retailprice as decimal(12,2))
      |  FROM part
      |  UNION
      |  SELECT path[1:len(path)-1],
      |         sum(price) OVER (PARTITION BY path[1:len(path)-1])
      |  FROM b WHERE len(path) > 0
      |)
      |SELECT array_to_string(path, ', ') AS node,
      |       cast(sum(price) as decimal(24,2)) AS total
      |FROM b GROUP BY 1""".stripMargin

  // ----------------------------------------------------------------- §2.8
  /** Fixed-column-list pivot (reference crosstab, src/swap.sql:215-259).
    * Cell = exact decimal sum so the pivot is deterministic.
    */
  def qPivotStatus(s: SparkSession, d: String): DataFrame =
    PivotFixed.crosstabSum(
      Tables.orders(s, d).withColumn("price", dec("o_totalprice")),
      Seq("o_orderpriority"), "o_orderstatus", "price", Seq("F", "O", "P"))

  val qPivotStatusSql: String =
    """SELECT o_orderpriority,
      |  sum(CASE WHEN o_orderstatus = 'F' THEN cast(o_totalprice as decimal(18,2)) END) AS "F",
      |  sum(CASE WHEN o_orderstatus = 'O' THEN cast(o_totalprice as decimal(18,2)) END) AS "O",
      |  sum(CASE WHEN o_orderstatus = 'P' THEN cast(o_totalprice as decimal(18,2)) END) AS "P"
      |FROM orders GROUP BY 1""".stripMargin

  // ------------------------------------------------------------- J1 + P10
  /** Reported-vs-synthesized reconciliation: full-outer USING join +
    * greatest (reference: src/nass.sql:236-249). "Reported" = high-value
    * items, "synthesized" = order totals.
    */
  def qReconcileGreatest(s: SparkSession, d: String): DataFrame = {
    val reported = Tables.lineitem(s, d)
      .filter(col("l_linenumber") === 1)
      .groupBy(col("l_orderkey").as("okey"))
      .agg(sum(dec("l_extendedprice")).cast(DecimalType(24, 2)).as("value"))
    val synthesized = Tables.orders(s, d)
      .filter(col("o_orderstatus") =!= "P")
      .groupBy(col("o_orderkey").as("okey"))
      .agg(sum(dec("o_totalprice")).cast(DecimalType(24, 2)).as("value"))
    Reconcile.reconcile(reported, synthesized, Seq("okey"), Seq("value"),
      Reconcile.Greatest)
  }

  val qReconcileGreatestSql: String =
    """WITH t AS (
      |  SELECT l_orderkey AS okey,
      |         cast(sum(cast(l_extendedprice as decimal(18,2))) as decimal(24,2)) AS value
      |  FROM lineitem WHERE l_linenumber = 1 GROUP BY 1),
      |s AS (
      |  SELECT o_orderkey AS okey,
      |         cast(sum(cast(o_totalprice as decimal(18,2))) as decimal(24,2)) AS value
      |  FROM orders WHERE o_orderstatus <> 'P' GROUP BY 1)
      |SELECT coalesce(t.okey, s.okey) AS okey,
      |       (t.okey IS NOT NULL) AS reported,
      |       t.value AS t_value, s.value AS s_value,
      |       greatest(t.value, s.value) AS value
      |FROM t FULL OUTER JOIN s ON t.okey = s.okey""".stripMargin

  /** name → (query, Some(oracleSql)) */
  val entries: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q_agg_group", qAggGroup _, Some(qAggGroupSql)),
    ("q_join_multi", qJoinMulti _, Some(qJoinMultiSql)),
    ("q_rollup_hier", qRollupHier _, Some(qRollupHierSql)),
    ("q_pivot_status", qPivotStatus _, Some(qPivotStatusSql)),
    ("q_reconcile_greatest", qReconcileGreatest _, Some(qReconcileGreatestSql)))
}
