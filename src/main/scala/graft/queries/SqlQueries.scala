package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** SQL-string entry surface: the same engine answers Spark SQL text over
  * registered views (SURVEY §7.5 — "Spark SQL strings work for free").
  * Each query here goes through the full parser → analyzer → Catalyst path,
  * proving SQL parity with the DataFrame surface.
  */
object SqlQueries {

  private def registerViews(s: SparkSession, d: String): Unit =
    Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "documents", "embeddings")
      .foreach(t => Tables.load(s, d, t).createOrReplaceTempView(t))

  /** TPC-H Q6 shape (selective scan + agg) as SQL text. */
  def sqlQ6(s: SparkSession, d: String): DataFrame = {
    registerViews(s, d)
    s.sql(
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |       count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin)
  }
  val sqlQ6Sql: String =
    """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |       count(*) AS n
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  /** INTERSECT set op (completing the union/except/intersect family). */
  def sqlIntersect(s: SparkSession, d: String): DataFrame = {
    registerViews(s, d)
    s.sql(
      """SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_custkey""".stripMargin)
  }
  val sqlIntersectSql: String =
    """SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      |INTERSECT
      |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |ORDER BY o_custkey""".stripMargin

  /** Correlated EXISTS subquery (decorrelated by Catalyst into a semi-join). */
  def sqlExists(s: SparkSession, d: String): DataFrame = {
    registerViews(s, d)
    s.sql(
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_suppkey = s_suppkey AND l_quantity > 49)
        |ORDER BY s_suppkey""".stripMargin)
  }
  val sqlExistsSql: String =
    """SELECT s_suppkey, s_name FROM supplier
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_suppkey = s_suppkey AND l_quantity > 49)
      |ORDER BY s_suppkey""".stripMargin

  /** Scalar subquery + HAVING (aggregate-over-aggregate shape). */
  def sqlHaving(s: SparkSession, d: String): DataFrame = {
    registerViews(s, d)
    s.sql(
      """SELECT o_custkey, count(*) AS n_orders
        |FROM orders
        |GROUP BY o_custkey
        |HAVING count(*) > (SELECT count(*) FROM orders) / (SELECT count(*) FROM customer)
        |ORDER BY o_custkey""".stripMargin)
  }
  val sqlHavingSql: String =
    """SELECT o_custkey, count(*) AS n_orders
      |FROM orders
      |GROUP BY o_custkey
      |HAVING count(*) > (SELECT count(*) FROM orders) / (SELECT count(*) FROM customer)
      |ORDER BY o_custkey""".stripMargin

  /** LATERAL correlated subquery with ORDER BY + LIMIT — the "top-N per
    * outer row" idiom stated in SQL. Catalyst decorrelates the lateral
    * into a ranked join (the same plan family as the native grouped
    * top-k); the text is dialect-shared with DuckDB verbatim.
    */
  private val lateralText =
    """SELECT p.o_orderpriority, t.o_orderkey, t.cents
      |FROM (SELECT DISTINCT o_orderpriority FROM orders) p,
      |LATERAL (SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |         FROM orders o
      |         WHERE o.o_orderpriority = p.o_orderpriority
      |         ORDER BY cents DESC, o_orderkey LIMIT 2) t
      |ORDER BY p.o_orderpriority, t.cents DESC, t.o_orderkey""".stripMargin

  def sqlLateral(s: SparkSession, d: String): DataFrame = {
    registerViews(s, d)
    s.sql(lateralText)
  }
  val sqlLateralSql: String = lateralText

  /** Recursive CTE through the SQL-text path (Spark 4's WITH RECURSIVE):
    * a 60-day calendar SPINE anchored at the first order date, left-joined
    * back so zero-order days survive — the gap-fill-by-spine idiom BI
    * queries use, and the parser feature a reference-engine user migrating
    * SQL will reach for. Recursion depth is the spine length (60), well
    * under `spark.sql.cteRecursionLevelLimit` (100 default); the rowset at
    * every level is ONE row, so the recursion is driver-trivial and the
    * only data-scale work is the final date-keyed left join + count.
    */
  def sqlRecursive(s: SparkSession, d: String): DataFrame = {
    registerViews(s, d)
    s.sql(
      """WITH RECURSIVE i(k) AS (
        |  SELECT 0 AS k UNION ALL SELECT k + 1 FROM i WHERE k < 59
        |),
        |lo AS (SELECT CAST(min(o_orderdate) AS DATE) AS d0 FROM orders),
        |cal AS (SELECT date_add(d0, k) AS d FROM lo CROSS JOIN i)
        |SELECT d AS order_date, CAST(count(o.o_orderkey) AS BIGINT) AS n_orders
        |FROM cal LEFT JOIN orders o ON CAST(o.o_orderdate AS DATE) = cal.d
        |GROUP BY d ORDER BY d""".stripMargin)
  }
  /** DuckDB replays the identical recursion (its own date arithmetic). */
  val sqlRecursiveSql: String =
    """WITH RECURSIVE i(k) AS (
      |  SELECT 0 AS k UNION ALL SELECT k + 1 FROM i WHERE k < 59
      |),
      |lo AS (SELECT CAST(min(o_orderdate) AS DATE) AS d0 FROM orders),
      |cal AS (SELECT CAST(d0 + to_days(k) AS DATE) AS d FROM lo CROSS JOIN i)
      |SELECT d AS order_date, CAST(count(o.o_orderkey) AS BIGINT) AS n_orders
      |FROM cal LEFT JOIN orders o ON CAST(o.o_orderdate AS DATE) = cal.d
      |GROUP BY d ORDER BY d""".stripMargin
}
