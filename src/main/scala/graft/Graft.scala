package graft

import graft.core.{EntityGraph, Tpch}
import org.apache.spark.sql.SparkSession

/** Single entry point for library users (the graft analog of pointing a
  * datahub client at a server):
  *
  * {{{
  * val spark = Graft.session()              // tuned SparkSession
  * val g = Graft.graph(spark, "/data/sf1")  // entity graph over parquet
  * g.out("customer", Tpch.pNation)          // traverse
  * }}}
  *
  * Operator families live in their packages: `graft.ops` (change log,
  * events, skew), `graft.dedup`, `graft.ann`, `graft.text`,
  * `graft.multimodal`, `graft.jobs` (sources/sinks/transforms/
  * transactions/scheduler/backup), `graft.streaming`,
  * `graft.functions` (custom expressions + SQL registration).
  */
object Graft {

  /** A SparkSession with graft's defaults: sensible shuffle
    * parallelism, AQE on (runtime coalescing + skew-join handling),
    * UTC, nanosecond-parquet tolerance, and graft's SQL functions
    * registered. */
  def session(master: String = "local[*]", shufflePartitions: Int = 0): SparkSession = {
    val builder = SparkSession.builder()
      .master(master)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", classOf[functions.GraftExtensions].getName)
    val withShuffle =
      if (shufflePartitions > 0) builder.config("spark.sql.shuffle.partitions", shufflePartitions)
      else builder
    val spark = withShuffle.getOrCreate()
    functions.GraftExtensions.register(spark)
    spark
  }

  /** The entity graph over a scale-factor directory of parquet tables. */
  def graph(spark: SparkSession, dir: String): EntityGraph = Tpch.graph(spark, dir)
}
