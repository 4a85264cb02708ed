package graft

import graft.core.{EntityGraph, Tpch}
import graft.jobs.{MultiSource, Transforms}
import graft.ops.ChangeLog
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Conventions shared by every query/oracle pair (SURVEY.md §5):
  * deterministic ORDER BY on both sides, identical column aliases,
  * doubles either passed through untouched or round(…, 2) after
  * aggregation, event timestamps handled as exact nanosecond longs
  * (Spark: nanosAsLong read; DuckDB: epoch_ns).
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** events.parquet carries TIMESTAMP(NANOS); Spark reads it as an exact
    * nanosecond long (legacy nanosAsLong), which keeps temporal
    * comparisons integer-exact against the DuckDB oracle's epoch_ns. */
  private def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(s"$dir/events.parquet")
  }

  private val tpchBase = Tpch.base

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ===== analytics =====================================================
    "q1_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))), 2).as("sum_charge"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // ===== entity graph ==================================================
    "g1_lookup" -> ((s, dir) => {
      val g = Tpch.graph(s, dir)
      val d = g("customer")
      g.lookup("customer", 42)
        .select(d.uri.as("id"), col("c_name").as("name"), col("c_acctbal").as("acctbal"))
    }),

    "g2_outgoing" -> ((s, dir) => {
      val g = Tpch.graph(s, dir)
      g.out("customer", Tpch.pNation, col("c_mktsegment") === "BUILDING")
        .select(col("start"), col("predicate"), col("related"), col("n_name").as("name"))
        .orderBy("start")
    }),

    "g3_incoming" -> ((s, dir) => {
      val g = Tpch.graph(s, dir)
      g.in("nation", Tpch.pNation, col("n_name") === "NATION_7", Seq("customer", "supplier"))
        .orderBy("dataset", "related_key")
    }),

    "g4_two_hop" -> ((s, dir) => {
      val g = Tpch.graph(s, dir)
      g.out2("customer", Tpch.pNation, Tpch.pRegion, col("c_custkey") < 50)
        .select(col("start"), col("related"), col("r_name").as("region_name"))
        .orderBy("start")
    }),

    "g5_star_predicate" -> ((s, dir) => {
      val g = Tpch.graph(s, dir)
      g.outStar("lineitem", col("l_orderkey") <= 32)
        .orderBy("start", "predicate", "related")
    }),

    "g6_dataset_scope" -> ((s, dir) => {
      val g = Tpch.graph(s, dir)
      g.in("nation", Tpch.pNation, col("n_name") === "NATION_3", Seq("supplier"))
        .orderBy("dataset", "related_key")
    }),

    "g7_namespaces" -> ((s, dir) => {
      val g = Tpch.graph(s, dir)
      val d = g("supplier")
      d.df.select(d.uri.as("id"))
        .select(col("id"), g.ns.contract(col("id")).as("curie"))
        .select(col("id"), col("curie"), g.ns.expand(col("curie")).as("expanded"))
        .orderBy("id")
    }),

    "g8_details_lookup" -> ((s, dir) => {
      val g = Tpch.graph(s, dir)
      g.detailsLookup("part", 7, Seq("p_name", "p_brand", "p_type", "p_size"))
        .orderBy("property")
    }),

    // ===== change log / temporal ========================================
    "c1_changes_since" -> ((s, dir) => {
      ChangeLog.changesSince(events(s, dir), "event_id", 500)
        .select(col("event_id"), expr("ts div 1000").as("ts_us"), col("user_id"), col("event_type"), col("value"))
    }),

    "c2_latest_only" -> ((s, dir) => {
      ChangeLog.latestOnly(events(s, dir), "user_id", "event_id")
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("event_type").as("last_type"), col("value").as("last_value"))
        .orderBy("user_id")
    }),

    "c3_asof_snapshot" -> ((s, dir) => {
      ChangeLog.asOf(events(s, dir), "user_id", "event_id", 700)
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("event_type").as("last_type"), col("value").as("last_value"))
        .orderBy("user_id")
    }),

    "c4_deleted_tombstones" -> ((s, dir) => {
      ChangeLog.snapshot(events(s, dir), "user_id", "event_id", col("event_type") === "error")
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("event_type").as("last_type"))
        .orderBy("user_id")
    }),

    "c5_compaction_dedup" -> ((s, dir) => {
      ChangeLog.compactDedup(events(s, dir), "user_id", "event_id", Seq("event_type"))
        .select("user_id", "event_id", "event_type")
        .orderBy("user_id", "event_id")
    }),

    "c6_changes_count" -> ((s, dir) => {
      ChangeLog.changesSince(events(s, dir), "event_id", 200)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .orderBy("event_type")
    }),

    // ===== jobs ==========================================================
    "j1_union_source" -> ((s, dir) => {
      val g = Tpch.graph(s, dir)
      val cust = g("customer").df.select(
        g("customer").uri.as("id"), col("c_name").as("name"), col("c_acctbal").as("acctbal"))
      val supp = g("supplier").df.select(
        g("supplier").uri.as("id"), col("s_name").as("name"), col("s_acctbal").as("acctbal"))
      jobs.UnionDatasetSource(Seq("customer" -> cust, "supplier" -> supp)).read(s)
        .orderBy("dataset", "id")
    }),

    "j2_multisource_affected" -> ((s, dir) => {
      val g = Tpch.graph(s, dir)
      MultiSource.affected(g, "nation", col("n_name").isin("NATION_1", "NATION_2"), Seq(
          MultiSource.Hop("customer", Tpch.pNation, inverse = true),
          MultiSource.Hop("orders", Tpch.pCustomer, inverse = true)))
        .select(g("orders").uri.as("id"), col("o_orderkey"))
        .orderBy("o_orderkey")
    }),

    "j3_transform_pipeline" -> ((s, dir) => {
      val g = Tpch.graph(s, dir)
      val pipe = Transforms.pipeline(
        Transforms.renameProperty("p_type", "category"),
        Transforms.setProperty("margin", round(col("p_retailprice") * 0.1, 2)),
        Transforms.removeProperty("p_brand"),
        Transforms.addReference("size_class", Tpch.schemaNs + "size/", col("p_size")),
        Transforms.newEntityFrom("p_partkey", Tpch.base + "part/",
          Seq("p_name", "category", "margin", "size_class")))
      pipe(g("part").df).orderBy("id")
    }),

    "j6_stats" -> ((s, dir) => {
      val g = Tpch.graph(s, dir)
      g.datasets.keys.toSeq.sorted
        .map(n => g(n).df.agg(count(lit(1)).as("n_rows")).select(lit(n).as("dataset"), col("n_rows")))
        .reduce(_ unionByName _)
        .orderBy("dataset")
    })
  )

  // ------------------------------------------------------------ oracle SQL

  private val custUri = s"'${tpchBase}customer/' || c_custkey"
  private val suppUri = s"'${tpchBase}supplier/' || s_suppkey"
  private val natUri = s"'${tpchBase}nation/' || n_nationkey"

  def oracleSql: Map[String, String] = Map(

    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),2) AS sum_qty,
        | round(sum(l_extendedprice),2) AS sum_base_price,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
        | round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)),2) AS sum_charge,
        | count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "g1_lookup" ->
      s"SELECT $custUri AS id, c_name AS name, c_acctbal AS acctbal FROM customer WHERE c_custkey = 42",

    "g2_outgoing" ->
      s"""SELECT $custUri AS start, '${Tpch.pNation}' AS predicate,
         | $natUri AS related, n_name AS name
         |FROM customer JOIN nation ON c_nationkey = n_nationkey
         |WHERE c_mktsegment = 'BUILDING' ORDER BY start""".stripMargin,

    "g3_incoming" ->
      s"""SELECT * FROM (
         | SELECT $natUri AS start, '${Tpch.pNation}' AS predicate, 'customer' AS dataset,
         |   $custUri AS related, CAST(c_custkey AS BIGINT) AS related_key
         | FROM customer JOIN nation ON c_nationkey = n_nationkey WHERE n_name = 'NATION_7'
         | UNION ALL
         | SELECT $natUri, '${Tpch.pNation}', 'supplier',
         |   $suppUri, CAST(s_suppkey AS BIGINT)
         | FROM supplier JOIN nation ON s_nationkey = n_nationkey WHERE n_name = 'NATION_7'
         |) ORDER BY dataset, related_key""".stripMargin,

    "g4_two_hop" ->
      s"""SELECT $custUri AS start, '${tpchBase}region/' || r_regionkey AS related, r_name AS region_name
         |FROM customer JOIN nation ON c_nationkey = n_nationkey
         | JOIN region ON n_regionkey = r_regionkey
         |WHERE c_custkey < 50 ORDER BY start""".stripMargin,

    "g5_star_predicate" ->
      s"""SELECT * FROM (
         | SELECT '${tpchBase}lineitem/' || l_orderkey || '-' || l_linenumber AS start,
         |   '${Tpch.pOrder}' AS predicate, '${tpchBase}orders/' || o_orderkey AS related
         | FROM lineitem JOIN orders ON l_orderkey = o_orderkey WHERE l_orderkey <= 32
         | UNION ALL
         | SELECT '${tpchBase}lineitem/' || l_orderkey || '-' || l_linenumber,
         |   '${Tpch.pPart}', '${tpchBase}part/' || p_partkey
         | FROM lineitem JOIN part ON l_partkey = p_partkey WHERE l_orderkey <= 32
         | UNION ALL
         | SELECT '${tpchBase}lineitem/' || l_orderkey || '-' || l_linenumber,
         |   '${Tpch.pSupplier}', '${tpchBase}supplier/' || s_suppkey
         | FROM lineitem JOIN supplier ON l_suppkey = s_suppkey WHERE l_orderkey <= 32
         |) ORDER BY start, predicate, related""".stripMargin,

    "g6_dataset_scope" ->
      s"""SELECT $natUri AS start, '${Tpch.pNation}' AS predicate, 'supplier' AS dataset,
         | $suppUri AS related, CAST(s_suppkey AS BIGINT) AS related_key
         |FROM supplier JOIN nation ON s_nationkey = n_nationkey WHERE n_name = 'NATION_3'
         |ORDER BY dataset, related_key""".stripMargin,

    "g7_namespaces" ->
      s"""SELECT $suppUri AS id, 'supp:' || s_suppkey AS curie, $suppUri AS expanded
         |FROM supplier ORDER BY id""".stripMargin,

    "g8_details_lookup" ->
      s"""SELECT * FROM (
         | SELECT '${tpchBase}part/' || p_partkey AS id, '${Tpch.schemaNs}part/p_brand' AS property,
         |   p_brand AS value, 'part' AS dataset FROM part WHERE p_partkey = 7
         | UNION ALL
         | SELECT '${tpchBase}part/' || p_partkey, '${Tpch.schemaNs}part/p_name', p_name, 'part'
         | FROM part WHERE p_partkey = 7
         | UNION ALL
         | SELECT '${tpchBase}part/' || p_partkey, '${Tpch.schemaNs}part/p_size', CAST(p_size AS VARCHAR), 'part'
         | FROM part WHERE p_partkey = 7
         | UNION ALL
         | SELECT '${tpchBase}part/' || p_partkey, '${Tpch.schemaNs}part/p_type', p_type, 'part'
         | FROM part WHERE p_partkey = 7
         |) ORDER BY property""".stripMargin,

    "c1_changes_since" ->
      """SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value
        |FROM events WHERE event_id > 500 ORDER BY event_id""".stripMargin,

    "c2_latest_only" ->
      """SELECT user_id, event_id AS last_event_id, event_type AS last_type, value AS last_value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "c3_asof_snapshot" ->
      """SELECT user_id, event_id AS last_event_id, event_type AS last_type, value AS last_value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |      FROM events WHERE event_id <= 700)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "c4_deleted_tombstones" ->
      """SELECT user_id, event_id AS last_event_id, event_type AS last_type
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn FROM events)
        |WHERE rn = 1 AND event_type <> 'error' ORDER BY user_id""".stripMargin,

    "c5_compaction_dedup" ->
      """SELECT user_id, event_id, event_type
        |FROM (SELECT user_id, event_id, event_type,
        |        lag(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_type
        |      FROM events)
        |WHERE prev_type IS NULL OR prev_type <> event_type
        |ORDER BY user_id, event_id""".stripMargin,

    "c6_changes_count" ->
      """SELECT event_type, count(*) AS n, round(sum(value),2) AS sum_value
        |FROM events WHERE event_id > 200 GROUP BY event_type ORDER BY event_type""".stripMargin,

    "j1_union_source" ->
      s"""SELECT * FROM (
         | SELECT $custUri AS id, c_name AS name, c_acctbal AS acctbal, 'customer' AS dataset FROM customer
         | UNION ALL
         | SELECT $suppUri, s_name, s_acctbal, 'supplier' FROM supplier
         |) ORDER BY dataset, id""".stripMargin,

    "j2_multisource_affected" ->
      s"""SELECT '${tpchBase}orders/' || o_orderkey AS id, o_orderkey
         |FROM orders WHERE o_custkey IN (
         |  SELECT c_custkey FROM customer WHERE c_nationkey IN (
         |    SELECT n_nationkey FROM nation WHERE n_name IN ('NATION_1','NATION_2')))
         |ORDER BY o_orderkey""".stripMargin,

    "j3_transform_pipeline" ->
      s"""SELECT '${tpchBase}part/' || p_partkey AS id, p_name, p_type AS category,
         | round(p_retailprice * 0.1, 2) AS margin,
         | '${Tpch.schemaNs}size/' || p_size AS size_class
         |FROM part ORDER BY id""".stripMargin,

    "j6_stats" ->
      """SELECT * FROM (
        | SELECT 'customer' AS dataset, count(*) AS n_rows FROM customer
        | UNION ALL SELECT 'lineitem', count(*) FROM lineitem
        | UNION ALL SELECT 'nation', count(*) FROM nation
        | UNION ALL SELECT 'orders', count(*) FROM orders
        | UNION ALL SELECT 'part', count(*) FROM part
        | UNION ALL SELECT 'region', count(*) FROM region
        | UNION ALL SELECT 'supplier', count(*) FROM supplier
        |) ORDER BY dataset""".stripMargin
  )
}
