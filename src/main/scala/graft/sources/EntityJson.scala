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
      // null FKs carry no edge: a null element would otherwise concat
      // to a null URI and export as "refs":{"p":[null]} — a phantom
      // reference on the wire (allEdges filters the same way)
      else map_filter(map(d.refs.flatMap { r =>
        val tgt = g(r.target)
        val uris =
          if (r.array) filter(
            transform(col(r.fkCol), fk => concat(lit(tgt.ns), fk.cast("string"))),
            u => u.isNotNull)
          else when(col(r.fkCol).isNotNull,
            array(concat(lit(tgt.ns), col(r.fkCol).cast("string"))))
            .otherwise(array().cast("array<string>"))
        Seq(lit(r.predicate), uris)
      }: _*), (_, v) => size(v) > 0)
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
    // to_json, not string interpolation: a quote/backslash in a prefix
    // or expansion must be escaped or the wire line is invalid JSON
    val m =
      if (prefixes.isEmpty) typedLit(Map.empty[String, String])
      else map(prefixes.toSeq.sortBy(_._1)
        .flatMap { case (p, e) => Seq(lit(p), lit(e)) }: _*)
    spark.range(1).select(
      to_json(struct(lit("@context").as("id"), m.as("namespaces"))).as("json"))
  }

  /** Entity rows + leading @context → JSON lines, the full payload a
    * reference dataset endpoint serves. */
  def toJsonLinesWithContext(g: EntityGraph, dataset: String): DataFrame = {
    val d = g(dataset)
    contextLine(d.df.sparkSession, g.ns, d.publicNamespaces)
      .unionByName(toJsonLines(toEntityRows(g, dataset)))
  }

  /** The reference's other legal ref form: `refs: {URI → URI}` (scalar,
    * internal/server/entity.go `URI | [URI]`). */
  private val ScalarRefSchema: StructType = StructType.fromDDL(
    "id string, recorded bigint, deleted boolean, props map<string,string>, refs map<string,string>")

  /** Parse JSON lines back into entity rows; a @context line is NOT an
    * entity and is dropped (read it with `readContext`). The strip keys
    * on the PARSED id, not a raw-string prefix, so pretty-printed or
    * key-reordered payloads from other producers (the wire format does
    * not forbid either) can't leak a garbage context row into the
    * entity stream.
    *
    * Both legal wire ref forms parse: the array form (what graft
    * emits) and the reference's scalar form — PERMISSIVE parsing nulls
    * the mismatched `refs` field under the array schema, and the
    * scalar schema's parse fills it back in, normalized to one-element
    * arrays. (A line MIXING scalar and array ref values loses refs;
    * the reference emits homogeneous payloads.) Null-safe: a line
    * malformed under both schemas stays, as before, a null-id entity
    * row for the error channel to catch. */
  def fromJsonLines(spark: SparkSession, jsonDf: DataFrame): DataFrame = {
    val a = from_json(col("json"), WireSchema)
    val scalarRefs = from_json(col("json"), ScalarRefSchema).getField("refs")
    jsonDf
      .select(struct(
        a.getField("id").as("id"),
        a.getField("recorded").as("recorded"),
        a.getField("deleted").as("deleted"),
        a.getField("props").as("props"),
        coalesce(a.getField("refs"),
          transform_values(scalarRefs, (_, v) => array(v))).as("refs")).as("e"))
      .select("e.*")
      .filter(!(col("id") <=> "@context"))
  }

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
