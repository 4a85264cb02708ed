package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-loop scale proof for BFS traversal (PERF.md): g15/g11 shuffle
  * on (root, uri) pairs, so the claim is that cost grows ~linearly
  * with the start-set size and never concentrates on a hot key. This
  * runner times `reachableFrom` at 1×/10×/100× roots over the same
  * graph — the growth row that turns the argued shuffle-key-cardinality
  * claim into a measured one.
  *
  * `runMain graft.TraversalScale [sfDir] [multipliers...]` */
object TraversalScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mults = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(1, 10, 100)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val g = graft.core.Tpch.graph(spark, sfDir)
    val li = g("lineitem")
    mults.foreach { x =>
      val start = li.df.filter(col("l_orderkey") < 100L * x).select(li.uri.as("uri"))
      val nRoots = start.count()
      val t0 = System.nanoTime()
      val reached = g.reachableFrom(start, maxHops = 2).count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[traversal] x$x%-4d roots=$nRoots%8d  reached=$reached%9d  time=$s%6.2f s")
    }
    spark.stop()
  }
}
