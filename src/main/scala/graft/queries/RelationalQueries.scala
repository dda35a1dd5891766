package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Plane-A relational query shapes from SURVEY.md §2.1 (the 11 SQL shapes the
  * reference ships to ClickHouse — `/root/reference/MainService/src/main/java/com/crypto/service/dao/ClickHouseDAO.java:31-202`)
  * and Plane-B dataflow operators (§2.2) that are relationally expressible,
  * each re-stated over the harness tables so a DuckDB oracle can check them.
  *
  * Scale notes (100 TB design intent), per query, in the Scaladoc of each.
  * Every aggregate / computed column is aliased identically in the Spark code
  * and the oracle SQL (the driver's hash compare sorts columns by name).
  */
object RelationalQueries {

  /** A1 — semi-join via IN-list (`ClickHouseDAO.java:31-48`): probe side of the
    * discovery dedup. At scale: the probe set is small → Catalyst broadcasts
    * the semi-join build side; no shuffle of the big table.
    */
  def a1SemiJoin(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d).select("o_custkey")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }
  val a1SemiJoinSql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE c_custkey IN (SELECT o_custkey FROM orders)
      |ORDER BY c_custkey""".stripMargin

  /** A2 — date-equality filter + full projection (`ClickHouseDAO.java:50-72`).
    * At scale: equality on the partition column → partition pruning; here it
    * compiles to a pushed parquet predicate on the min/max stats.
    */
  def a2DateFilter(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(to_date(col("o_orderdate")) === lit("1995-06-15"))
      .orderBy("o_orderkey")
  val a2DateFilterSql: String =
    """SELECT * FROM orders
      |WHERE CAST(o_orderdate AS DATE) = DATE '1995-06-15'
      |ORDER BY o_orderkey""".stripMargin

  /** A3 — point lookup on a unique key (`ClickHouseDAO.java:74-89`).
    * At scale: parquet row-group stats + (if sorted/bucketed on the key) file
    * pruning make this near-O(1); never a full scan of non-key columns.
    */
  def a3PointLookup(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderkey") === lit(42L))
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
  val a3PointLookupSql: String =
    "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderkey = 42"

  /** A4 — multi-value enum IN filter (`ClickHouseDAO.java:91-119`). */
  def a4InFilter(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
      .orderBy("o_orderkey")
  val a4InFilterSql: String =
    """SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
      |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      |ORDER BY o_orderkey""".stripMargin

  /** A5 — global MAX aggregate (`ClickHouseDAO.java:121-131`): catch-up start
    * point. At scale: answered from parquet footer stats when
    * `spark.sql.parquet.aggregatePushdown` is on; otherwise partial+final agg,
    * one row shuffled per partition.
    */
  def a5MaxAgg(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).agg(max("o_orderdate").as("max_date"))
  val a5MaxAggSql: String =
    "SELECT max(o_orderdate) AS max_date FROM orders"

  /** A6 — filtered MIN/MAX, function-parameterized (`ClickHouseDAO.java:133-144`,
    * used by the cleanup flow with MIN and MAX consts).
    */
  def a6FilteredMinMax(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderstatus") === "F")
      .agg(min("o_orderdate").as("min_date"), max("o_orderdate").as("max_date"))
  val a6FilteredMinMaxSql: String =
    """SELECT min(o_orderdate) AS min_date, max(o_orderdate) AS max_date
      |FROM orders WHERE o_orderstatus = 'F'""".stripMargin

  /** A9 — predicated UPDATE emulated as event-append + latest-wins view
    * (`ClickHouseDAO.java:169-182`; SURVEY §2.1 op 9). Over the `events`
    * journal: latest event per user wins. At scale: one hash shuffle on the
    * key; with many updates per key, pre-aggregate max(ts) per key map-side
    * (Catalyst does this for the window via partial TopK only if rewritten —
    * the max_by formulation below keeps it a plain partial+final agg, which IS
    * map-side combinable, unlike row_number() over a window).
    */
  def a9LatestWins(s: SparkSession, d: String): DataFrame =
    // the map-side-combinable form the scaladoc above describes: max_by
    // over the tie-free (ts, event_id) total order picks the same row as
    // the row_number window did, without the data-scale per-partition sort
    Tables.events(s, d)
      .groupBy("user_id")
      .agg(max_by(
        struct(col("event_id"), col("event_type"), col("value")),
        struct(col("ts"), col("event_id"))).as("m"))
      .select(col("user_id"), col("m.event_id").as("event_id"),
        col("m.event_type").as("event_type"), col("m.value").as("value"))
      .orderBy("user_id")
  val a9LatestWinsSql: String =
    """WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value FROM events)
      |SELECT user_id, event_id, event_type, value FROM (
      |  SELECT user_id, event_id, event_type, value,
      |         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM ev) WHERE rn = 1 ORDER BY user_id""".stripMargin

  /** MERGE INTO semantics as one batch op (the warehouse upsert the
    * reference's in-place UPDATE cannot express): target = customer,
    * updates carry both MATCHED rows (new balance from order totals, every
    * third customer) and NOT-MATCHED rows (fresh keys → inserts). One
    * full-outer join on the key resolves the three-way action —
    * update / insert / keep — via coalesce; at 100 TB both sides shuffle
    * once on the merge key (or not at all when the target is bucketed by
    * it, [[graft.operators.BucketingOps]]), and the output is the next
    * snapshot the way Delta/Iceberg MERGE rewrites it.
    */
  def a9MergeUpsert(s: SparkSession, d: String): DataFrame = {
    val dec2 = DecimalType(18, 2)
    val target = Tables.customer(s, d).select(
      col("c_custkey").as("k"), col("c_name").as("t_name"),
      col("c_acctbal").as("t_bal"))
    val matched = Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast(dec2)).cast("double").as("u_bal"))
      .filter(col("o_custkey") % 3 === 0)
      .select(col("o_custkey").as("k"), lit(null).cast("string").as("u_name"),
        col("u_bal"))
    val inserts = Tables.customer(s, d)
      .filter(col("c_custkey") % 50 === 1)
      .select((col("c_custkey") + 1000000L).as("k"),
        concat(lit("new_"), col("c_custkey")).as("u_name"),
        lit(0.0).as("u_bal"))
    val updates = matched.union(inserts)
    target.join(updates, Seq("k"), "full_outer")
      .select(
        col("k"),
        coalesce(col("t_name"), col("u_name")).as("name"),
        coalesce(col("u_bal"), col("t_bal")).as("acctbal"),
        when(col("t_name").isNotNull && col("u_bal").isNotNull, "update")
          .when(col("t_name").isNull, "insert")
          .otherwise("keep").as("action"))
      .orderBy("k")
  }
  val a9MergeUpsertSql: String =
    """WITH target AS (
      |  SELECT c_custkey AS k, c_name AS t_name, c_acctbal AS t_bal FROM customer),
      |matched AS (
      |  SELECT o_custkey AS k, CAST(NULL AS VARCHAR) AS u_name,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS u_bal
      |  FROM orders GROUP BY o_custkey HAVING o_custkey % 3 = 0),
      |inserts AS (
      |  SELECT c_custkey + 1000000 AS k, 'new_' || c_custkey AS u_name,
      |    0.0::DOUBLE AS u_bal
      |  FROM customer WHERE c_custkey % 50 = 1),
      |updates AS (SELECT * FROM matched UNION ALL SELECT * FROM inserts)
      |SELECT COALESCE(t.k, u.k) AS k,
      |  COALESCE(t.t_name, u.u_name) AS name,
      |  COALESCE(u.u_bal, t.t_bal) AS acctbal,
      |  CASE WHEN t.t_name IS NOT NULL AND u.u_bal IS NOT NULL THEN 'update'
      |       WHEN t.t_name IS NULL THEN 'insert'
      |       ELSE 'keep' END AS action
      |FROM target t FULL OUTER JOIN updates u ON t.k = u.k
      |ORDER BY k""".stripMargin

  /** A11 — COUNT(*) (`ClickHouseDAO.java:193-202`). Parquet metadata-only at
    * scale (no row materialization).
    */
  def a11Count(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).agg(count(lit(1)).as("cnt"))
  val a11CountSql: String = "SELECT count(*) AS cnt FROM lineitem"

  /** B6 — dedup against journal = left ANTI join
    * (`SaveNewFilesToDbFlow.java:216-248`). At scale: broadcast the journal
    * side when small; stream-static anti join in the streaming path.
    */
  def b6AntiJoin(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
      .filter(col("o_totalprice") > 400000).select("o_custkey")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }
  val b6AntiJoinSql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
      |ORDER BY c_custkey""".stripMargin

  /** B7 — conditional status transition as a CASE expression
    * (`ProceedFilesStatusFlow.java:78-90`): pure projection, fully codegen'd,
    * no shuffle at any scale.
    */
  def b7CaseTransition(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn(
        "status",
        when(col("event_type") === "signup", lit("DOWNLOADING"))
          .when(col("value") > 150.0, lit("READY_FOR_PROCESSING"))
          .otherwise(col("event_type")))
      .select("event_id", "event_type", "status")
      .orderBy("event_id")
  val b7CaseTransitionSql: String =
    """SELECT event_id, event_type,
      |  CASE WHEN event_type = 'signup' THEN 'DOWNLOADING'
      |       WHEN value > 150.0 THEN 'READY_FOR_PROCESSING'
      |       ELSE event_type END AS status
      |FROM events ORDER BY event_id""".stripMargin

  /** B8 — group-by with set aggregation
    * (`UploadTickerFilesStatusAndDataFlow.java:108-115`). Emitted as a sorted,
    * comma-joined string so the cross-engine hash is representation-stable.
    * At scale: collect_set is map-side combinable; bounded by per-key
    * cardinality (event_type enum here — safe).
    */
  def b8GroupCollectSet(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("user_id")
      .agg(concat_ws(",", sort_array(collect_set(col("event_type")))).as("types"),
           count(lit(1)).as("n"))
      .orderBy("user_id")
  val b8GroupCollectSetSql: String =
    """SELECT user_id,
      |  array_to_string(array_agg(DISTINCT event_type ORDER BY event_type), ',') AS types,
      |  count(*) AS n
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  /** B10 + LIMIT — deterministic sort + top-k
    * (`UploadTickerFilesStatusAndDataFlow.java:153`, LIMIT 1 at
    * `ClickHouseDAO.java:87`). At scale: Spark plans orderBy+limit as
    * TakeOrderedAndProject — per-partition top-k then a single merge, never a
    * full sort.
    */
  def b10TopK(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(100)
  val b10TopKSql: String =
    """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100""".stripMargin

  /** Set ops — EXCEPT (complement accumulation, SURVEY §2.3 "Set ops"). */
  def setExcept(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    o.filter(col("o_orderstatus") === "F").select("o_custkey")
      .except(o.filter(col("o_orderstatus") === "P").select("o_custkey"))
      .orderBy("o_custkey")
  }
  val setExceptSql: String =
    """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |EXCEPT
      |SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
      |ORDER BY o_custkey""".stripMargin

  /** Set ops — UNION ALL + distinct union. */
  def setUnion(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    o.filter(col("o_totalprice") > 300000).select("o_custkey")
      .union(o.filter(col("o_orderpriority") === "1-URGENT").select("o_custkey"))
      .distinct()
      .orderBy("o_custkey")
  }
  val setUnionSql: String =
    """SELECT DISTINCT o_custkey FROM (
      |  SELECT o_custkey FROM orders WHERE o_totalprice > 300000
      |  UNION ALL
      |  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
      |ORDER BY o_custkey""".stripMargin

  /** Scalar functions — string split / concat / regexp parse, mirroring the
    * filename → (ticker, date) parse (`README.md:7-8` pattern
    * `AVA-USDT_PST_2024-03-14`) re-stated over part.p_type.
    */
  def fStringOps(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(
        col("p_partkey"),
        split(col("p_type"), " ").getItem(0).as("type_head"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_extract(col("p_name"), "^(\\w+)", 1).as("name_head"))
      .orderBy("p_partkey")
  val fStringOpsSql: String =
    """SELECT p_partkey,
      |  split_part(p_type, ' ', 1) AS type_head,
      |  concat_ws('|', p_brand, p_type) AS brand_type,
      |  regexp_extract(p_name, '^(\w+)', 1) AS name_head
      |FROM part ORDER BY p_partkey""".stripMargin

  /** Scalar functions — date parse/format/arithmetic
    * (`SaveNewFilesToDbFlow.java:96,110`, `CleanupUploadedFilesFlow.java:107-134`).
    */
  def fDateOps(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_day"),
        date_add(to_date(col("o_orderdate")), 30).as("due_date"),
        datediff(to_date(lit("1998-12-31")), to_date(col("o_orderdate"))).as("age_days"))
      .orderBy("o_orderkey")
  val fDateOpsSql: String =
    """SELECT o_orderkey,
      |  strftime(o_orderdate, '%Y-%m-%d') AS order_day,
      |  CAST(o_orderdate AS DATE) + 30 AS due_date,
      |  datediff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS age_days
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** Scalar functions — JSON field extraction (log-sink analog, B16:
    * `LogMsgLayout.json` round-trip). `props` holds `{"k": <int>}`.
    */
  def fJsonExtract(s: SparkSession, d: String): DataFrame =
    // fan out (single-row-group scan = one task) and parse AFTER the sort:
    // the range partitioner samples the sort's child, so a projection below
    // the sort would run the JSON parse twice
    Tables.fanOut(Tables.events(s, d).select("event_id", "props"))
      .orderBy("event_id")
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").as("k_value"))
  val fJsonExtractSql: String =
    """SELECT event_id, json_extract_string(props, '$.k') AS k_value
      |FROM events ORDER BY event_id""".stripMargin

  /** Scalar functions — numeric formatting (`DecimalFormat("0.00")`,
    * `CompressionHandler.java:114`).
    */
  def fNumericFormat(s: SparkSession, d: String): DataFrame = {
    // Exact integer-cents arithmetic: the scale-4 decimal product is exact,
    // +0.5/100-cent then floor = HALF_UP — identical in both engines, unlike
    // printf/format_string (Java HALF_UP vs C half-even) or decimal downcasts
    // (Spark HALF_UP vs DuckDB truncation).
    val dec2 = DecimalType(18, 2)
    val net = col("l_extendedprice").cast(dec2) *
      (lit(BigDecimal(1)).cast(dec2) - col("l_discount").cast(dec2))
    val cents = floor(net * 100 + lit(BigDecimal(0.5))).cast("long")
    // Sort BEFORE the string projection: the range partitioner samples the
    // sort's child, so formatting above the sort runs the expensive
    // format_string once (post-shuffle) instead of twice, and the exchange
    // moves 8-byte longs instead of strings.
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), cents.as("_cents"))
      .orderBy("l_orderkey", "l_linenumber")
      .select(
        col("l_orderkey"),
        col("l_linenumber"),
        format_string("%d.%02d", (col("_cents") / 100).cast("long"),
          pmod(col("_cents"), lit(100L))).as("net_price"))
  }
  val fNumericFormatSql: String =
    """SELECT l_orderkey, l_linenumber,
      |  printf('%d.%02d',
      |    CAST(floor(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * 100 + 0.5) AS BIGINT) // 100,
      |    CAST(floor(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * 100 + 0.5) AS BIGINT) % 100) AS net_price
      |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** Outer-join family completion: customers FULL OUTER their big-order
    * counts (left-only rows = customers without a 400k+ order; the operator
    * exercises both null sides even where referential integrity empties one).
    */
  def jFullOuter(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).select(col("c_custkey"), col("c_name"))
    val big = Tables.orders(s, d).filter(col("o_totalprice") > 400000)
      .groupBy("o_custkey").agg(count(lit(1)).as("n_big"))
    c.join(big, c("c_custkey") === big("o_custkey"), "full_outer")
      .select(col("c_custkey"), col("c_name"), col("n_big"))
      .orderBy(col("c_custkey").asc_nulls_first)
  }
  val jFullOuterSql: String =
    """SELECT c_custkey, c_name, n_big FROM customer
      |FULL OUTER JOIN (SELECT o_custkey, count(*) AS n_big FROM orders
      |                 WHERE o_totalprice > 400000 GROUP BY o_custkey) b
      |ON c_custkey = b.o_custkey
      |ORDER BY c_custkey ASC NULLS FIRST""".stripMargin
}
