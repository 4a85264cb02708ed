package graft.jobs

import graft.model.EntityModel
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's transform vocabulary (mimiro-io/datahub
  * DOCUMENTATION.md "Transforms": RenameProperty, SetProperty,
  * RemoveProperty, AddReference, SetDeleted, NewEntityFrom, ...)
  * re-expressed as whole-DataFrame column operations.
  *
  * The reference applies these per-entity inside a javascript sandbox;
  * here each op is a Catalyst projection, so an entire transform pipeline
  * fuses into one whole-stage-codegen'd projection over the scan — the
  * per-row interpreter disappears.
  */
object Transforms {

  type Transform = DataFrame => DataFrame

  /** The identity transform. A stable reference — `Job` classifies a
    * leg as "copy" vs "transform" by eq-comparison against this value
    * (an eta-expanded `identity _` would never compare equal). */
  val noop: Transform = df => df

  /** Reference: RenameProperty(e, fromNs, from, toNs, to). */
  def renameProperty(from: String, to: String): Transform =
    _.withColumnRenamed(from, to)

  /** Reference: SetProperty(e, ns, name, value) — value may be computed. */
  def setProperty(name: String, value: Column): Transform =
    _.withColumn(name, value)

  /** Reference: RemoveProperty(e, ns, name). */
  def removeProperty(name: String): Transform = _.drop(name)

  /** Reference: AddReference(e, ns, name, curie) — stored as a URI col. */
  def addReference(predicate: String, targetNs: String, key: Column): Transform =
    _.withColumn(predicate, EntityModel.uri(targetNs, key))

  /** Reference: SetDeleted(e, flag). */
  def setDeleted(flag: Column): Transform = _.withColumn("deleted", flag)

  /** Reference: NewEntityFrom(e, addType, copyProps, copyRefs) — project a
    * fresh entity frame keeping id (+ deleted) and the requested columns.
    */
  def newEntityFrom(idCol: String, ns: String, keep: Seq[String]): Transform =
    df => df.select(EntityModel.uri(ns, col(idCol)).as("id") +: keep.map(col): _*)

  /** Reference: GetId/SetId — the entity id is a first-class column. */
  def setId(ns: String, key: Column): Transform =
    _.withColumn("id", EntityModel.uri(ns, key))

  /** Reference: AsEntity(ref) — promote a reference URI column to an
    * entity-shaped frame (id + carried columns), e.g. before FindById
    * joins. */
  def asEntity(refCol: String, keep: Seq[String]): Transform =
    df => df.select(col(refCol).as("id") +: keep.map(col): _*)

  /** Reference: NewEntity() — an empty entity frame with an id column,
    * to be populated by subsequent Set ops. */
  def newEntity(ns: String, key: Column): Transform =
    df => df.select(EntityModel.uri(ns, key).as("id"))

  /** Compose a pipeline of transforms (applied left to right). */
  def pipeline(ts: Transform*): Transform = ts.reduceLeft(_ andThen _)
}
