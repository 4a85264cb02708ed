package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A reference (edge) declaration: a foreign-key column on the source
  * dataset that points at the id of a target dataset, labelled with a
  * predicate URI — the relational encoding of the reference's `refs` map
  * (mimiro-io/datahub DOCUMENTATION.md "Data Structures").
  *
  * @param array the reference model allows multi-valued refs
  *              (`refs: {URI → URI | [URI]}`, internal/server/entity.go):
  *              an array-valued FK column explodes to one edge per
  *              element in every traversal (map-side, before any join
  *              shuffle); a null/empty array means no edges.
  */
final case class Ref(predicate: String, fkCol: String, target: String, array: Boolean = false)

/** One registered dataset of entities.
  *
  * Spark-first design decision: instead of storing entities as opaque
  * `{props: map, refs: map}` blobs (the reference's BadgerDB encoding,
  * internal/server/entity.go), properties and references stay NATIVE
  * parquet columns. That keeps column pruning, predicate pushdown and
  * whole-stage codegen intact — the entity semantics (URIs, predicates,
  * CURIEs) are recovered declaratively via expressions.
  *
  * @param name     dataset name (reference: dataset name in the store)
  * @param df       backing relation, native columns
  * @param idCol    natural-key column; entity URI = ns + idCol
  * @param ns       URI namespace expansion for this dataset's entity ids
  * @param refs     outgoing reference declarations
  * @param propCols property columns exposed as `props` (URI = propNs + col)
  * @param propNs   URI namespace expansion for property names
  * @param small    hint: dimension-sized at any scale factor -> broadcast
  * @param publicNamespaces reference "Setting public namespaces for a
  *                 Dataset" (DOCUMENTATION.md, the
  *                 core/dataset/publicNamespaces meta-property): when
  *                 non-empty, only these namespace expansions appear in
  *                 the dataset's wire @context; empty = all registered.
  */
final case class EntityDataset(
    name: String,
    df: DataFrame,
    idCol: String,
    ns: String,
    refs: Seq[Ref] = Seq.empty,
    propCols: Seq[String] = Seq.empty,
    propNs: String = "",
    small: Boolean = false,
    publicNamespaces: Seq[String] = Seq.empty
) {

  /** Entity URI column for a row of this dataset. */
  def uri: Column = EntityModel.uri(ns, col(idCol))

  def uriOf(c: Column): Column = EntityModel.uri(ns, c)

  /** The relation, broadcast-hinted when dimension-sized. */
  def rel: DataFrame = if (small) broadcast(df) else df
}

object EntityModel {

  /** Compose an entity/property URI from a namespace expansion and key. */
  def uri(ns: String, key: Column): Column = concat(lit(ns), key.cast("string"))
}
