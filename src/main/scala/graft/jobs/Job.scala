package graft.jobs

import graft.core.EntityGraph
import graft.ops.ChangeLog
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.concurrent.TrieMap

/** Job engine: source -> optional transform -> sink, the reference's
  * integration core (mimiro-io/datahub internal/jobs/; DOCUMENTATION.md
  * "Jobs"). Cron/onchange scheduling maps to batch runs / Structured
  * Streaming; incremental vs fullsync maps to a `since` token.
  */
sealed trait Source { def read(spark: SparkSession): DataFrame }

/** Reference: DatasetSource {Name, LatestOnly}
  * (internal/jobs/source/dataset_source.go:27, LatestOnly at :32). */
final case class DatasetSource(
    df: DataFrame,
    idCol: String,
    recordedCol: String,
    latestOnly: Boolean = false,
    since: Option[Long] = None
) extends Source {
  def read(spark: SparkSession): DataFrame = {
    val incr = since.map(t => df.filter(col(recordedCol) > t)).getOrElse(df)
    if (latestOnly) ChangeLog.latestOnly(incr, idCol, recordedCol) else incr
  }
}

/** A source that reads a named dataset from the registry AT RUN TIME —
  * how chained jobs see their upstream job's sink (the reference wires
  * this through the store; here the registry is the store). */
final case class RegistrySource(registry: DatasetRegistry, name: String) extends Source {
  def read(spark: SparkSession): DataFrame = registry.get(name)
}

/** A source computed by a function (test doubles, virtual feeds). */
final case class FunctionSource(fn: SparkSession => DataFrame) extends Source {
  def read(spark: SparkSession): DataFrame = fn(spark)
}

/** Reference: SampleSource (internal/jobs/source/sample_source.go:25) —
  * generates `numberOfEntities` synthetic entities under the
  * `http://data.samplesource.org/` namespace, resuming from the
  * incremental `since` offset token (the reference's continuation is
  * the end index). `spark.range` partitions the generation, so a
  * billion sample entities is a map-only distributed job, not a
  * driver loop. */
final case class SampleSource(numberOfEntities: Long, since: Option[Long] = None) extends Source {
  def read(spark: SparkSession): DataFrame = {
    val start = math.min(since.getOrElse(0L), numberOfEntities)
    spark.range(start, numberOfEntities)
      .select(concat(lit(s"${SampleSource.Namespace}e-"), col("id")).as("id"),
        col("id").as("recorded"), lit(false).as("deleted"))
  }
  /** The continuation token a completed read advances to. */
  def nextToken: Long = numberOfEntities
}

object SampleSource { val Namespace = "http://data.samplesource.org/" }

/** Reference: SlowSource (internal/jobs/source/slow_source.go:25) — a
  * paced dev/test source for backpressure experiments: each read
  * yields `batchSize` synthetic `test:e-<i>` entities only after
  * `sleepMs` has elapsed. The pace is paid INSIDE the scan (once per
  * partition, at iterator-open time), so a downstream consumer
  * genuinely observes a source that takes `sleepMs` to produce a
  * batch — pacing at plan-build time would throttle the driver, not
  * the read. The reference's continuation is the empty token (every
  * sync restarts); `nextToken` mirrors that. */
final case class SlowSource(batchSize: Int, sleepMs: Long) extends Source {
  def read(spark: SparkSession): DataFrame = {
    val ms = sleepMs
    import spark.implicits._
    spark.range(batchSize).coalesce(1)
      .mapPartitions { it => Thread.sleep(ms); it }
      .select(concat(lit("test:e-"), col("value")).as("id"),
        lit(0L).as("recorded"), lit(false).as("deleted"))
  }
  def nextToken: String = ""
}

/** Reference: UnionDatasetSource — ordered concatenation of dataset
  * sources; the `dataset` tag keeps provenance (and makes the union
  * restartable per-leg, mirroring the reference's continuation-token
  * scheme across sub-sources).
  */
final case class UnionDatasetSource(legs: Seq[(String, DataFrame)]) extends Source {
  def read(spark: SparkSession): DataFrame =
    legs.map { case (name, df) => df.withColumn("dataset", lit(name)) }
      .reduce(_ unionByName _)
}

/** Reference: HttpDatasetSource (internal/jobs/source/httpDatasetSource.go)
  * — the reference's main integration transport: entity JSON pulled from
  * a remote dataset endpoint. Network IO is out of scope in this build
  * (and would hide behind this same API); the wire FORMAT and the job
  * plumbing are real — any location Spark reads as text lines (file://,
  * hdfs://, s3://) acts as the endpoint. A 100 TB sync is a map-only
  * scan: the JSON codec is a pure projection, nothing shuffles. */
final case class WireDatasetSource(path: String) extends Source {
  def read(spark: SparkSession): DataFrame =
    graft.sources.EntityJson.fromJsonLines(spark,
      spark.read.text(path).select(col("value").as("json")))
}

sealed trait Sink { def write(df: DataFrame): Unit }

/** Reference: HttpDatasetSink (internal/jobs/sink.go) — entity JSON
  * pushed to a dataset endpoint; see WireDatasetSource for the
  * no-network rationale. */
final case class WireDatasetSink(path: String) extends Sink {
  def write(df: DataFrame): Unit =
    graft.sources.EntityJson.toJsonLines(df).write.mode("overwrite").text(path)
}

/** Reference: DatasetSink — writes into a named dataset of the in-session
  * registry (the Spark-world analog of writing a dataset back to the
  * store; production deployments would point this at a table path).
  */
final case class DatasetSink(registry: DatasetRegistry, name: String) extends Sink {
  def write(df: DataFrame): Unit = registry.put(name, df)
}

/** Parquet sink for materialized outputs. */
final case class ParquetSink(path: String) extends Sink {
  def write(df: DataFrame): Unit = df.write.mode("overwrite").parquet(path)
}

/** Appends to a named registry dataset, creating it on first write —
  * the emission-log discipline of incremental jobs (each firing's
  * output lands AFTER the previous firings', like the reference's
  * dataset writes under continuation tokens). Callers append PINNED
  * frames (the job engine materializes before the write), so the
  * accumulated union is a union of checkpoints, not a growing lazy
  * plan. */
final case class AppendSink(registry: DatasetRegistry, name: String) extends Sink {
  def write(df: DataFrame): Unit =
    if (registry.names.contains(name))
      registry.put(name, SinkPin.pin(registry.get(name).unionByName(df)))
    else registry.put(name, df)
}

/** Bounded-plan guard for the accumulating sinks: each firing layers a
  * union (and for upserts an anti-join) over the previous accumulated
  * value, so over a long-running schedule the lazy plan grows linearly
  * with firings and eventually hits driver analysis/optimization
  * blowup even though each firing's input is pinned. Once the
  * accumulated plan exceeds a node budget it is truncated
  * (localCheckpoint, or the reliable dir via `graft.checkpointDir`) —
  * amortized O(1) pins per firing, plan depth bounded forever. */
private[jobs] object SinkPin {
  val MaxPlanNodes = 96
  def pin(df: DataFrame): DataFrame = {
    val nodes = df.queryExecution.logical.collect { case n => n }.size
    if (nodes > MaxPlanNodes) graft.core.Checkpoints.truncate(df) else df
  }
}

/** [[AppendSink]] with SUPERSEDE on `keyCol`: existing rows of the
  * incoming keys are replaced, not duplicated — the sink discipline
  * for at-least-once schedulers (a row redelivered across two firings
  * lands once; a genuinely re-ingested key's old output is replaced,
  * the same compact-then-append every graft index runs). */
final case class UpsertSink(registry: DatasetRegistry, name: String, keyCol: String) extends Sink {
  import org.apache.spark.sql.functions.{broadcast, col}
  def write(df: DataFrame): Unit =
    if (registry.names.contains(name)) {
      val keys = broadcast(df.select(col(keyCol)).distinct())
      registry.put(name, SinkPin.pin(
        registry.get(name).join(keys, Seq(keyCol), "left_anti").unionByName(df)))
    } else registry.put(name, df)
}

/** [[UpsertSink]] with explicit RETRACTION markers: an incoming row
  * whose boolean `markerCol` is true supersedes its key like any other
  * row but is NOT itself written — so a key the producing job
  * processed but now emits NOTHING for is deleted instead of left
  * stale (the reference's deleted-tombstone dataset semantics,
  * internal/jobs fullsync deletes, applied to an accumulating sink).
  * Without this, a downstream consumer of the dataset reads a
  * superseded key's old rows forever — the same staleness class the
  * streaming pack emission fix closed. Idempotent under redelivery
  * like [[UpsertSink]]. */
final case class TombstoneUpsertSink(registry: DatasetRegistry, name: String,
                                     keyCol: String, markerCol: String) extends Sink {
  import org.apache.spark.sql.functions.{broadcast, col, not}
  def write(df: DataFrame): Unit = {
    val keys = broadcast(df.select(col(keyCol)).distinct())
    val live = df.filter(not(col(markerCol))).drop(markerCol)
    if (registry.names.contains(name))
      registry.put(name, SinkPin.pin(
        registry.get(name).join(keys, Seq(keyCol), "left_anti").unionByName(live)))
    else registry.put(name, live)
  }
}

/** Reference: DevNullSink — used with transforms that only emit
  * transactions. */
case object DevNullSink extends Sink { def write(df: DataFrame): Unit = () }

/** In-session dataset registry; also records lineage edges like the
  * reference's lineage API (DOCUMENTATION.md "Lineage").
  */
final class DatasetRegistry {
  private val tables = TrieMap.empty[String, DataFrame]
  private val edges = TrieMap.empty[(String, String, String), Unit]

  def put(name: String, df: DataFrame): Unit = tables.put(name, df)
  def get(name: String): DataFrame = tables(name)
  def names: Seq[String] = tables.keys.toSeq.sorted

  /** Reference: AssertDataset (DOCUMENTATION.md "Transforms") — ensure a
    * sink dataset exists before a transaction writes to it; an existing
    * dataset is left untouched. */
  def assertDataset(name: String, empty: => DataFrame): Unit =
    if (!tables.contains(name)) tables.put(name, empty)

  def recordEdge(from: String, to: String, kind: String): Unit =
    edges.put((from, to, kind), ())

  /** Lineage edges: (From, To, Type) with Type in
    * {copy, transform, transform-hop} — reference lineage response shape. */
  def lineage: Seq[(String, String, String)] =
    edges.keys.toSeq.sortBy(e => (e._1, e._2, e._3))
}

/** A job definition: the reference's {source, transform, sink} triple.
  * `sourceName`/`sinkName` feed the lineage graph; `hops` lists datasets
  * queried inside the transform (reference: transform-hop edges).
  *
  * Per-entity error handling (reference internal/jobs/error_handler.go:
  * `LogFailingEntityHandler` logs-and-continues,
  * `ReQueueFailingEntityHandler` diverts failing entities to a re-queue
  * dataset that the next run retries — internal/jobs/reQueue.go): the
  * `validate` predicate splits the ONE transformed relation into sink
  * rows and `requeueTo` rows — two filtered writes of the same plan, no
  * row-at-a-time error path, so at 100 TB the error channel costs one
  * extra filtered scan, not a per-row handler. A retry is simply a job
  * whose source reads the re-queue dataset.
  */
final case class Job(
    id: String,
    source: Source,
    transform: Transforms.Transform = Transforms.noop,
    sink: Sink,
    sourceName: String = "",
    sinkName: String = "",
    hops: Seq[String] = Seq.empty,
    validate: Column = lit(true),
    requeueTo: Option[Sink] = None
) {
  def run(spark: SparkSession, registry: Option[DatasetRegistry] = None): Unit = {
    Metrics.timing(s"job.$id")
    try { runInner(spark, registry, counted = false); () }
    finally Metrics.timing(s"job.$id", send = true)
  }

  /** `run`, returning the number of rows written to the sink — the
    * reference's per-run `processed` count (internal/jobs/job.go:40
    * `jobResult.Processed`). The sink input is pinned first so the
    * count and the write observe the same rows. */
  def runCounted(spark: SparkSession, registry: Option[DatasetRegistry] = None): Long = {
    Metrics.timing(s"job.$id")
    try runInner(spark, registry, counted = true)
    finally Metrics.timing(s"job.$id", send = true)
  }

  private def runInner(spark: SparkSession, registry: Option[DatasetRegistry],
                       counted: Boolean): Long = {
    val out0 = transform(source.read(spark))
    // with a re-queue configured the relation is written TWICE (fail
    // side + pass side): pin it first, or a nondeterministic transform
    // / a source mutating between the two actions re-evaluates per
    // write and rows can land in both outputs or neither
    val out = if (requeueTo.isDefined) graft.core.Checkpoints.truncate(out0) else out0
    // NULL counts as FAILING: an entity whose validation predicate can't
    // even evaluate (e.g. a JSON extract on malformed props) must land in
    // the re-queue, not vanish — sink ∪ requeue always equals the
    // transformed relation (reference ReQueueFailingEntityHandler exists
    // precisely to capture such entities)
    val fail = !coalesce(validate, lit(false))
    requeueTo.foreach(_.write(out.filter(fail)))
    val pass0 = requeueTo.map(_ => out.filter(!fail)).getOrElse(out)
    val pass = if (counted) graft.core.Checkpoints.truncate(pass0) else pass0
    sink.write(pass)
    registry.foreach { r =>
      if (sourceName.nonEmpty && sinkName.nonEmpty) {
        val kind = if (transform eq Transforms.noop) "copy" else "transform"
        r.recordEdge(sourceName, sinkName, kind)
        hops.foreach(h => r.recordEdge(h, sinkName, "transform-hop"))
      }
    }
    if (counted) pass.count() else 0L
  }
}

/** Reference: MultiSource — a main dataset plus dependency datasets; when
  * a dependency changes, the affected main entities are re-emitted by
  * walking a declared join chain back to the main dataset
  * (internal/jobs/source/multi_source.go:47 `MultiSource{DatasetName,
  * Dependencies}`; DOCUMENTATION.md "Multi Source", hop/iHop).
  */
object MultiSource {

  /** One step of the dependency chain: land in `dataset`, linked via
    * `predicate`; `inverse` means the NEXT dataset's entities point at
    * the current set (reference `"inverse": true`).
    */
  final case class Hop(dataset: String, predicate: String, inverse: Boolean)

  /** Entities of the final hop's dataset affected by changed entities of
    * `start`. Each hop is a distinct-key semi-join: only keys travel
    * between stages, so the chain stays cheap even when the datasets are
    * fact-sized; Catalyst broadcasts the key sets when they are small.
    * Array-valued refs (`Ref(array = true)`, the reference's
    * `refs: URI | [URI]`) explode MAP-SIDE to scalar keys before the
    * semi-join, same as every traversal (EntityGraph.refPairs) — the
    * join itself stays a plain equi-join either way. */
  def affected(g: EntityGraph, start: String, changed: Column, hops: Seq[Hop]): DataFrame = {
    var curName = start
    var cur = g(start).df.filter(changed)
    hops.foreach { h =>
      val next = g(h.dataset)
      cur = if (h.inverse) {
        val ref = next.refs.find(r => r.predicate == h.predicate && r.target == curName)
          .getOrElse(sys.error(s"${h.dataset} has no ${h.predicate} ref to $curName"))
        val keys = cur.select(col(g(curName).idCol).as("__k")).distinct()
        if (ref.array) {
          // exploded (entity, fk) pairs semi-join the changed keys; the
          // surviving ENTITY keys (deduped — one match suffices) then
          // semi-join the dataset, so row multiplicity never leaks
          val matched = next.df
            .select(next.df(next.idCol).as("__m"), explode(next.df(ref.fkCol)).as("__fk"))
            .join(keys, col("__fk") === col("__k"), "leftsemi")
            .select("__m").distinct()
          next.df.join(matched, next.df(next.idCol) === col("__m"), "leftsemi")
        } else
          next.df.join(keys, next.df(ref.fkCol) === col("__k"), "leftsemi")
      } else {
        val ref = g(curName).refs.find(r => r.predicate == h.predicate && r.target == h.dataset)
          .getOrElse(sys.error(s"$curName has no ${h.predicate} ref to ${h.dataset}"))
        val keys =
          if (ref.array) cur.select(explode(col(ref.fkCol)).as("__k")).distinct()
          else cur.select(col(ref.fkCol).as("__k")).distinct()
        next.df.join(keys, next.df(next.idCol) === col("__k"), "leftsemi")
      }
      curName = h.dataset
    }
    cur
  }
}
