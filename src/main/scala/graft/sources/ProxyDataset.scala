package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Proxy dataset — reference internal/server/proxydataset.go: a dataset
  * whose entities live behind a REMOTE datahub but answer the same
  * dataset API (entities, changes-since, lookup). The reference forwards
  * HTTP calls; here the remote surface is any location serving the
  * entity-JSON wire shape (see WireDatasetSource — network transports
  * would slot in behind the same read). Everything stays declarative:
  * the proxy hands the planner a relation, so proxied entities compose
  * with local datasets in one Catalyst plan — at 100 TB the JSON decode
  * is a map-only scan and predicate pushdown still applies to whatever
  * the location's format supports.
  */
final case class ProxyDataset(name: String, location: String) {

  /** The remote dataset's entity rows (wire shape). */
  def entities(spark: SparkSession): DataFrame =
    graft.jobs.WireDatasetSource(location).read(spark)

  /** GET /datasets/{name}/changes?since=t against the proxied log. */
  def changesSince(spark: SparkSession, since: Long): DataFrame =
    entities(spark).filter(col("recorded") > since)

  /** Single-entity lookup by URI (FindById through the proxy). */
  def lookup(spark: SparkSession, uri: String): DataFrame =
    entities(spark).filter(col("id") === uri)

  /** The proxied entities as native columns, ready to register in an
    * EntityGraph next to local datasets: the natural key is recovered
    * from the URI's last path segment into `keyCol`, and `propUris`
    * maps property URIs back to column names. */
  def flattened(spark: SparkSession, propUris: Seq[(String, String)],
                keyCol: String = "key"): DataFrame =
    EntityJson.flatten(entities(spark), propUris)
      .withColumn(keyCol, regexp_extract(col("id"), "([^/]+)$", 1))
}
