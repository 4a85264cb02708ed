package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Events
import graft.streaming.OnChange

/** The r17 state-store bound, measured (the r16 verdict's one scale
  * defect was e8's unbounded state): drain a LONG time-ordered event
  * stream through the evicting session/funnel loops and report the
  * state rows left standing vs what an unbounded design would hold.
  *
  * What must hold at 100×: session state is bounded by users ACTIVE
  * within one gap of the watermark (not by distinct users ever seen —
  * the unbounded design's floor); funnel state is bounded by one
  * compact tombstone per user that ever locked step 0 plus live-horizon
  * tails (the anchored-semantics floor — re-entry blocking REQUIRES
  * remembering converted/expired users), and drops to live tails alone
  * under the episode-TTL opt-in.
  *
  * `runMain graft.StreamStateScale [eventsParquet] [sizes...]` */
object StreamStateScale {
  def main(args: Array[String]): Unit = {
    val eventsPath = args.headOption.getOrElse("/tmp/sf100ev/events.parquet")
    val sizes = if (args.length > 1) args.drop(1).map(_.toLong).toSeq
                else Seq(100000L, 1000000L, 10000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_sss_wh_").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val all = spark.read.parquet(eventsPath)
    val chunks = 8
    sizes.foreach { n =>
      val ev = all.filter(col("event_id") < n)
      val tus = Events.tsMicros(ev, "ts")
      val mm = ev.agg(min(tus).as("mn"), max(tus).as("mx")).head
      val (mn, mx) = (mm.getLong(0), mm.getLong(1))
      // time-ordered micro-batches (the change-log arrival contract)
      val bounds = (0 to chunks).map(i => mn + (mx - mn + 1) * i / chunks)
      val preds = (0 until chunks).map(i =>
        tus >= bounds(i) && (if (i == chunks - 1) lit(true) else tus < bounds(i + 1)))
      val users = ev.select(col("user_id")).distinct().count()
      val gapUs = 7200000000L // 2 h sessions
      val dirS = SparkEntry.stagePredChunks(ev, preds, s"sss_s$n")
      val t0 = System.nanoTime()
      val sess = OnChange.streamingSessionizeDrain(spark, dirS, gapUs)
      val sessN = sess.out.count()
      val tSess = (System.nanoTime() - t0) / 1e9
      val horizon = 86400000000L // 24 h funnel
      val steps = Seq("view", "click", "purchase")
      val dirF = SparkEntry.stagePredChunks(ev, preds, s"sss_f$n")
      val t1 = System.nanoTime()
      val fun = OnChange.streamingFunnelDrain(spark, dirF, steps, horizon)
      val funN = fun.out.count()
      val tFun = (System.nanoTime() - t1) / 1e9
      val dirT = SparkEntry.stagePredChunks(ev, preds, s"sss_t$n")
      val funTtl = OnChange.streamingFunnelDrain(spark, dirT, steps, horizon,
        tombstoneTtlUs = Some(horizon))
      println(f"n=$n%9d  users=$users%7d  " +
        f"sessions: emitted=$sessN%8d state=${sess.stateRows}%7d (${tSess}%5.1f s)  " +
        f"funnel: emitted=$funN%6d state=${fun.stateRows}%7d  " +
        f"funnel+ttl: state=${funTtl.stateRows}%7d")
      // CHURN slice — the population the bound exists for: the source
      // stream has every user active across the whole log (state =
      // users is the true floor there); here each user is active on ONE
      // day only (user_id % 30 picks their day), so an unbounded design
      // still holds every user ever seen while the evicting loops hold
      // only the recent tail the watermark hasn't closed
      val day = ((tus - lit(mn)) / lit(86400000000L)).cast("long")
      val churn = ev.filter(col("user_id") % 30 === day % 30)
      val cUsers = churn.select("user_id").distinct().count()
      val dirC = SparkEntry.stagePredChunks(churn, preds, s"sss_c$n")
      val csess = OnChange.streamingSessionizeDrain(spark, dirC, gapUs)
      val cse = csess.out.count()
      val dirD = SparkEntry.stagePredChunks(churn, preds, s"sss_d$n")
      val cfun = OnChange.streamingFunnelDrain(spark, dirD, steps, horizon,
        tombstoneTtlUs = Some(horizon))
      val cfe = cfun.out.count()
      println(f"   churn: users=$cUsers%7d  sessions: emitted=$cse%8d " +
        f"state=${csess.stateRows}%7d  funnel+ttl: emitted=$cfe%6d " +
        f"state=${cfun.stateRows}%7d  (unbounded designs hold all $cUsers)")
    }
    spark.stop()
  }
}
