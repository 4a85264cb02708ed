package graft.core

import graft.model.{EntityDataset, Namespaces, Ref}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Maps the test-data star schema onto the entity-graph model.
  *
  * Every table becomes an entity dataset: rows are entities, the natural
  * key becomes the entity URI, foreign keys become `refs` labelled with
  * predicate URIs — exactly how the reference ingests relational data
  * through UDA layers into its graph (mimiro-io/datahub DOCUMENTATION.md
  * "Data Layers"). The `events` table doubles as a change log: event_id
  * is the monotone `recorded` token, user_id the entity id, and
  * event_type = 'error' is treated as the tombstone marker.
  */
object Tpch {

  val base = "http://graft.io/tpch/"
  val schemaNs = "http://graft.io/schema/"

  // predicate URIs
  val pNation   = schemaNs + "nation"
  val pRegion   = schemaNs + "region"
  val pCustomer = schemaNs + "customer"
  val pOrder    = schemaNs + "order"
  val pPart     = schemaNs + "part"
  val pSupplier = schemaNs + "supplier"

  val namespaces: Namespaces = Namespaces(Map(
    "cust" -> (base + "customer/"),
    "nat"  -> (base + "nation/"),
    "reg"  -> (base + "region/"),
    "supp" -> (base + "supplier/"),
    "part" -> (base + "part/"),
    "ord"  -> (base + "orders/"),
    "li"   -> (base + "lineitem/"),
    "gs"   -> schemaNs
  ))

  def read(spark: SparkSession, dir: String, table: String): DataFrame =
    spark.read.parquet(s"$dir/$table.parquet")

  /** Build the full entity graph over a scale-factor directory. */
  def graph(spark: SparkSession, dir: String): EntityGraph = {
    def t(n: String) = read(spark, dir, n)

    // lineitem's entity identity is composite (orderkey, linenumber);
    // expose it as a single derived key column.
    val lineitem = t("lineitem")
      .withColumn("l_id", concat(col("l_orderkey"), lit("-"), col("l_linenumber")))

    val ds = Seq(
      EntityDataset("region", t("region"), "r_regionkey", base + "region/",
        propCols = Seq("r_name"), propNs = schemaNs + "region/", small = true),
      EntityDataset("nation", t("nation"), "n_nationkey", base + "nation/",
        refs = Seq(Ref(pRegion, "n_regionkey", "region")),
        propCols = Seq("n_name"), propNs = schemaNs + "nation/", small = true),
      EntityDataset("customer", t("customer"), "c_custkey", base + "customer/",
        refs = Seq(Ref(pNation, "c_nationkey", "nation")),
        propCols = Seq("c_name", "c_acctbal", "c_mktsegment"), propNs = schemaNs + "customer/"),
      EntityDataset("supplier", t("supplier"), "s_suppkey", base + "supplier/",
        refs = Seq(Ref(pNation, "s_nationkey", "nation")),
        propCols = Seq("s_name", "s_acctbal"), propNs = schemaNs + "supplier/", small = true),
      EntityDataset("part", t("part"), "p_partkey", base + "part/",
        propCols = Seq("p_name", "p_brand", "p_type", "p_size", "p_retailprice"),
        propNs = schemaNs + "part/", small = true),
      EntityDataset("orders", t("orders"), "o_orderkey", base + "orders/",
        refs = Seq(Ref(pCustomer, "o_custkey", "customer")),
        propCols = Seq("o_orderstatus", "o_totalprice", "o_orderpriority"),
        propNs = schemaNs + "orders/"),
      EntityDataset("lineitem", lineitem, "l_id", base + "lineitem/",
        refs = Seq(
          Ref(pOrder, "l_orderkey", "orders"),
          Ref(pPart, "l_partkey", "part"),
          Ref(pSupplier, "l_suppkey", "supplier")),
        propCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_returnflag"),
        propNs = schemaNs + "lineitem/")
    )
    EntityGraph(ds.map(d => d.name -> d).toMap, namespaces)
  }

  /** The events table viewed as an entity change log (user = entity). */
  def eventsLog(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "events")
}
