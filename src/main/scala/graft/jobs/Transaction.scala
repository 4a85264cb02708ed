package graft.jobs

import org.apache.spark.sql.DataFrame

/** Atomic multi-dataset write — the reference's transform `transactions`
  * (mimiro-io/datahub internal/jobs/transform.go:250 NewTransaction /
  * ExecuteTransaction; internal/server/dataset.go:265
  * StoreEntitiesWithTransaction: all writes land or none).
  *
  * Spark translation: every leg is materialized (validated) BEFORE any
  * leg becomes visible in the registry — a failing leg aborts the whole
  * transaction with the registry untouched. On a cluster the same
  * staging discipline maps to writing each leg to a staging path and
  * committing via atomic rename/metastore swap.
  */
final case class Transaction(writes: Seq[(String, DataFrame)]) {

  /** Validate-then-publish. Returns per-dataset row counts. */
  def commit(registry: DatasetRegistry): Seq[(String, Long)] = {
    // stage: force full evaluation of every leg first (any error here
    // leaves the registry exactly as it was)
    val staged = writes.map { case (name, df) =>
      val cached = df.cache()
      val n = cached.count()
      (name, cached, n)
    }
    // publish: metadata-only, cannot fail partially
    staged.foreach { case (name, df, _) => registry.put(name, df) }
    staged.map { case (name, _, n) => name -> n }
  }
}

/** A virtual dataset — the reference's proxy/virtual datasets
  * (DOCUMENTATION.md "Virtual Datasets"): a dataset whose entities are
  * produced by a function instead of stored rows. In Spark the generator
  * returns a DataFrame (typically from `spark.range` or an external
  * call), so virtual datasets compose with every operator exactly like
  * stored ones. */
final case class VirtualDataset(name: String, gen: org.apache.spark.sql.SparkSession => DataFrame) {
  def read(spark: org.apache.spark.sql.SparkSession): DataFrame = gen(spark)
}
