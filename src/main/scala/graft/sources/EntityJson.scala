package graft.sources

import graft.core.EntityGraph
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The reference's entity interchange shape (UDA entity JSON:
  * `{id, recorded, deleted, props: {uri: value}, refs: {uri: uri}}` —
  * mimiro-io/datahub DOCUMENTATION.md "Data Structures"; this is what
  * HttpDatasetSource/Sink exchange over the wire).
  *
  * Spark translation: `toEntityRows` projects a native-column dataset
  * into that nested shape (maps keyed by property/predicate URI);
  * `toJsonLines`/`fromJsonLines` are the wire encoding; `flatten` is
  * the import path back to native columns. All pure projections — a
  * 100 TB export is a map-only scan, no shuffle.
  */
object EntityJson {

  /** Wire refs are normalized to URI ARRAYS: the reference's data model
    * is `refs: {URI → URI | [URI]}` (internal/server/entity.go), and
    * emitting the array form for both keeps the schema closed while
    * round-tripping multi-valued refs losslessly. */
  val WireSchema: StructType = StructType.fromDDL(
    "id string, recorded bigint, deleted boolean, props map<string,string>, refs map<string,array<string>>")

  /** Project a registered dataset into the entity interchange shape. */
  def toEntityRows(g: EntityGraph, dataset: String): DataFrame = {
    val d = g(dataset)
    val props = map(
      d.propCols.flatMap(p => Seq(lit(d.propNs + p), col(p).cast("string"))): _*)
    val refs =
      if (d.refs.isEmpty) lit(null).cast("map<string,array<string>>")
      else map(d.refs.flatMap { r =>
        val tgt = g(r.target)
        val uris =
          if (r.array) transform(col(r.fkCol), fk => concat(lit(tgt.ns), fk.cast("string")))
          else array(concat(lit(tgt.ns), col(r.fkCol).cast("string")))
        Seq(lit(r.predicate), uris)
      }: _*)
    d.df.select(
      d.uri.as("id"),
      lit(0L).as("recorded"),
      lit(false).as("deleted"),
      props.as("props"),
      refs.as("refs"))
  }

  /** Entity rows → JSON lines (the wire format itself). */
  def toJsonLines(entities: DataFrame): DataFrame =
    entities.select(to_json(struct(entities.columns.map(col): _*)).as("json"))

  /** The reference's payloads open with a context pseudo-entity
    * (`{"id": "@context", "namespaces": {prefix: expansion}}` —
    * DOCUMENTATION.md "Data Structures" / "Setting public namespaces
    * for a Dataset"): emit it as the first wire line. `publicOnly`
    * restricts the advertised map to a dataset's public namespaces. */
  def contextLine(spark: SparkSession, ns: graft.model.Namespaces,
                  publicOnly: Seq[String] = Seq.empty): DataFrame = {
    val prefixes = ns.prefixes
      .filter { case (_, exp) => publicOnly.isEmpty || publicOnly.contains(exp) }
    val kv = prefixes.toSeq.sortBy(_._1)
      .map { case (p, e) => s""""$p":"$e"""" }.mkString(",")
    import spark.implicits._
    Seq(s"""{"id":"@context","namespaces":{$kv}}""").toDF("json")
  }

  /** Entity rows + leading @context → JSON lines, the full payload a
    * reference dataset endpoint serves. */
  def toJsonLinesWithContext(g: EntityGraph, dataset: String): DataFrame = {
    val d = g(dataset)
    contextLine(d.df.sparkSession, g.ns, d.publicNamespaces)
      .unionByName(toJsonLines(toEntityRows(g, dataset)))
  }

  /** Parse JSON lines back into entity rows; a @context line is NOT an
    * entity and is dropped (read it with `readContext`). The strip keys
    * on the PARSED id, not a raw-string prefix, so pretty-printed or
    * key-reordered payloads from other producers (the wire format does
    * not forbid either) can't leak a garbage context row into the
    * entity stream. Null-safe: a malformed line (null id) stays, as
    * before, an entity row for the error channel to catch. */
  def fromJsonLines(spark: SparkSession, jsonDf: DataFrame): DataFrame =
    jsonDf
      .select(from_json(col("json"), WireSchema).as("e")).select("e.*")
      .filter(!(col("id") <=> "@context"))

  /** The namespace map advertised by a wire payload's @context line:
    * (prefix, expansion) rows. Symmetric with `fromJsonLines`: selects
    * on the parsed id. */
  def readContext(spark: SparkSession, jsonDf: DataFrame): DataFrame = {
    val ctx = from_json(col("json"),
      StructType.fromDDL("id string, namespaces map<string,string>"))
    jsonDf
      .filter(ctx.getField("id") === "@context")
      .select(explode(ctx.getField("namespaces")).as(Seq("prefix", "namespace")))
  }

  /** Flatten entity rows back to native columns (import path): each
    * (propertyUri, columnName) becomes a column again. */
  def flatten(entities: DataFrame, propUris: Seq[(String, String)]): DataFrame =
    entities.select(
      col("id") +: propUris.map { case (uri, name) => col("props").getItem(uri).as(name) }: _*)
}
