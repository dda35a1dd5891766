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
}
