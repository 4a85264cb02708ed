package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** STANDING corpus-statistics state — the x16/x17 one-shot statistics
  * given the same operational discipline every graft index family has
  * (build / absorb / compact, marker-guarded replay, supersede on
  * re-ingest). The reference maintains its dataset statistics as a
  * persisted artifact refreshed by a scheduled job rather than
  * recomputing them per read (internal/service/scheduler/
  * statistics_update.go:43, scheduler.go — the cadence discipline
  * `jobs.Maintenance` mirrors); at 100 TB the corpus-health numbers a
  * data team watches weekly must likewise cost O(batch) per refresh,
  * not a corpus pass.
  *
  * State, for prefix `table`:
  *  - `{table}_freq`  (id, group, token, c): per-doc token
  *    contributions, an APPEND-ONLY log — supersede appends NEGATION
  *    rows, compaction nets them out (the reference's
  *    rewrite-not-delete log compaction). Bucketed by `token`, so the
  *    read-out's (group, token) aggregate rides the buckets
  *    (hash-on-token co-locates every (group, token) cell) and absorbs
  *    append under the same spec.
  *  - `{table}_kmv`   (group, minima array<long>): the mergeable KMV
  *    sketch state — one row per group per absorb; merging = k
  *    smallest distinct over the union ([[graft.functions.KmvMinima]]
  *    over the exploded rows, ≤ batches·k values per group).
  *  - `{table}_docs`  (id): ingested-doc roster — the cheap overlap
  *    probe that lets the common all-new-ids absorb skip the
  *    supersede scan entirely (the OnChange `_sizes` overlap idiom).
  *  - `{table}_batches` (batch_id): replay markers — re-running an
  *    absorb with a seen batch_id is a no-op, so at-least-once
  *    delivery cannot double-count (the streaming families' guard).
  *
  * Exactness contract (the d8 delta identity, oracle-pinned by x18):
  * `tokenStatsReadout` ≡ one-shot [[TextAnalysis.tokenFrequencyStats]]
  * over the EFFECTIVE corpus (latest version of every ingested doc) —
  * unconditionally: supersede is exact per-(id, group, token) algebra,
  * including docs whose GROUP changed. `kmvReadout` ≡ one-shot
  * [[TextAnalysis.ngramKmv]]'s estimate over the effective corpus
  * whenever re-ingested text only GROWS its gram set (append-style
  * edits — and trivially for all-new-id batches); a re-ingest that
  * REMOVES grams leaves the sketch an over-approximation (distinct
  * union is not invertible — no sketch is under deletion) until
  * [[refreshKmvState]] rebuilds it from the effective corpus: the
  * scheduled-refresh valve, exactly the reference's statistics
  * updater shape. */
object StatsState {

  /** (id, group, token, c) per-doc token contributions — the log row
    * unit. NULL groups drop (the family convention). */
  private def docContrib(docs: DataFrame, textCol: String, groupCol: String,
                         idCol: String): DataFrame =
    docs.filter(col(groupCol).isNotNull)
      .select(col(idCol).as("id"), col(groupCol).as("group"),
        explode(TextAnalysis.words(col(textCol))).as("token"))
      .groupBy(col("id"), col("group"), col("token"))
      .agg(count(lit(1)).cast("long").as("c"))

  /** Build the standing state from a corpus snapshot (one corpus pass;
    * drops any prior state including replay markers — the
    * buildSimhashIndex discipline). Callers pass the SAME n/k to
    * absorb/compact/read-out (the shingle index's `n` contract). */
  def buildStatsState(docs: DataFrame, textCol: String, groupCol: String,
                      idCol: String, table: String, n: Int = 3, k: Int = 256,
                      buckets: Int = 32): String = {
    val spark = docs.sparkSession
    Seq(s"${table}_freq", s"${table}_kmv", s"${table}_docs", s"${table}_batches")
      .foreach(graft.core.Tables.drop(spark, _))
    docContrib(docs, textCol, groupCol, idCol)
      .write.mode("overwrite").bucketBy(buckets, "token").sortBy("token")
      .saveAsTable(s"${table}_freq")
    TextAnalysis.ngramKmvSketch(docs, textCol, groupCol, n, k)
      .withColumnRenamed(groupCol, "group")
      .write.mode("overwrite").saveAsTable(s"${table}_kmv")
    docs.select(col(idCol).as("id")).distinct()
      .write.mode("overwrite").saveAsTable(s"${table}_docs")
    table
  }

  /** Absorb a batch: O(batch) marginal. Appends the batch's per-doc
    * contributions + its KMV minima row per group + its ids; ids
    * already in the roster are superseded FIRST by appending the
    * negation of their standing net contribution (computed only when
    * the cheap roster probe finds overlap — the all-new-ids fast path
    * never scans the log). Marker-guarded: a seen `batchId` is a
    * no-op. Returns whether the batch was absorbed (false = replay). */
  def absorbIntoStatsState(spark: SparkSession, batch: DataFrame, textCol: String,
                           groupCol: String, idCol: String, table: String,
                           batchId: Long, n: Int = 3, k: Int = 256): Boolean = {
    import spark.implicits._
    val markers = s"${table}_batches"
    if (spark.catalog.tableExists(markers) &&
        !spark.table(markers).filter(col("batch_id") === batchId).isEmpty) return false
    val batchIds = graft.core.Checkpoints.truncate(
      batch.select(col(idCol).as("id")).distinct())
    // appends into the bucketed log must repeat its bucket spec (the
    // absorbIntoShingleIndex discipline — read from the catalog)
    val buckets = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(s"${table}_freq"))
      .bucketSpec.map(_.numBuckets).getOrElse(32)
    // supersede: roster probe first (doc-count-sized), log scan only on overlap
    val overlap = spark.table(s"${table}_docs")
      .join(broadcast(batchIds), Seq("id"), "leftsemi")
    if (!overlap.isEmpty) {
      spark.table(s"${table}_freq")
        .join(broadcast(batchIds), Seq("id"), "leftsemi")
        .groupBy(col("id"), col("group"), col("token"))
        .agg(sum(col("c")).cast("long").as("__net"))
        .filter(col("__net") =!= 0L)
        .select(col("id"), col("group"), col("token"), (-col("__net")).as("c"))
        .write.mode("append").bucketBy(buckets, "token").sortBy("token")
        .saveAsTable(s"${table}_freq")
    }
    docContrib(batch, textCol, groupCol, idCol)
      .write.mode("append").bucketBy(buckets, "token").sortBy("token")
      .saveAsTable(s"${table}_freq")
    TextAnalysis.ngramKmvSketch(batch, textCol, groupCol, n, k)
      .withColumnRenamed(groupCol, "group")
      .write.mode("append").saveAsTable(s"${table}_kmv")
    batchIds.join(overlap, Seq("id"), "left_anti")
      .write.mode("append").saveAsTable(s"${table}_docs")
    Seq(batchId).toDF("batch_id").write.mode("append").saveAsTable(markers)
    Seq(s"${table}_freq", s"${table}_kmv", s"${table}_docs", markers)
      .foreach(spark.catalog.refreshTable)
    true
  }

  /** Net the log: frequency rows sum per (id, group, token) with zero
    * nets dropped (superseded-away cells leave the state), KMV rows
    * merge to ONE minima row per group, the roster dedups. Read-outs
    * are unchanged by construction; the log stops growing with batch
    * count. Markers stay — compaction must not re-open replay. */
  def compactStatsState(spark: SparkSession, table: String, k: Int = 256): Unit = {
    val freq = s"${table}_freq"
    val netted = spark.table(freq)
      .groupBy(col("id"), col("group"), col("token"))
      .agg(sum(col("c")).cast("long").as("c"))
      .filter(col("c") =!= 0L)
    swapInto(spark, freq, netted)
    val merged = spark.table(s"${table}_kmv")
      .select(col("group"), explode(col("minima")).as("__h"))
      .groupBy(col("group"))
      .agg(graft.functions.KmvMinima.kmvMinima(col("__h"), k).as("minima"))
    swapInto(spark, s"${table}_kmv", merged)
    swapInto(spark, s"${table}_docs", spark.table(s"${table}_docs").distinct())
  }

  /** Rebuild the KMV companion from the EFFECTIVE corpus — the
    * scheduled-refresh valve that restores sketch ≡ one-shot after
    * gram-removing re-ingests (see the class doc; distinct union is
    * not invertible, so this is the only exact answer — one corpus
    * pass on the cadence the reference runs its statistics updater). */
  def refreshKmvState(docs: DataFrame, textCol: String, groupCol: String,
                      table: String, n: Int = 3, k: Int = 256): Unit = {
    val spark = docs.sparkSession
    swapInto(spark, s"${table}_kmv",
      TextAnalysis.ngramKmvSketch(docs, textCol, groupCol, n, k)
        .withColumnRenamed(groupCol, "group"))
  }

  /** x17-shaped distribution statistics from the standing state: net
    * the log per (group, token) — riding the token buckets, no
    * corpus pass — then the SAME tail as the one-shot
    * ([[TextAnalysis.freqStatsTail]]). Output keyed by `group`. */
  def tokenStatsReadout(spark: SparkSession, table: String, topK: Int = 10): DataFrame =
    TextAnalysis.freqStatsTail(
      spark.table(s"${table}_freq")
        .groupBy(col("group"), col("token").as("__t"))
        .agg(sum(col("c")).cast("long").as("__c"))
        .filter(col("__c") > 0L)
        .select(col("group"), col("__t"), col("__c")),
      "group", topK)

  /** (group, kmv_est) from the standing sketch rows: merge = the same
    * bounded aggregate over the exploded minima (≤ rows·k values per
    * group — metadata-sized), then the shared estimator. */
  def kmvReadout(spark: SparkSession, table: String, k: Int = 256): DataFrame =
    spark.table(s"${table}_kmv")
      .select(col("group"), explode(col("minima")).as("__h"))
      .groupBy(col("group"))
      .agg(graft.functions.KmvMinima.kmvMinima(col("__h"), k).as("minima"))
      .select(col("group"), TextAnalysis.kmvEstimate("minima", k).as("kmv_est"))

  /** Atomically replace `table` with `df` under the table's OWN
    * catalog bucket/sort spec (swap table + rename — the
    * Tables.compactByKey rewrite discipline). */
  private def swapInto(spark: SparkSession, table: String, df: DataFrame): Unit = {
    val spec = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
      .bucketSpec
    val tmp = s"${table}__swap"
    graft.core.Tables.drop(spark, tmp)
    val w = df.write
    spec match {
      case Some(bs) =>
        val b = w.bucketBy(bs.numBuckets,
          bs.bucketColumnNames.head, bs.bucketColumnNames.tail: _*)
        (if (bs.sortColumnNames.nonEmpty)
           b.sortBy(bs.sortColumnNames.head, bs.sortColumnNames.tail: _*)
         else b).saveAsTable(tmp)
      case None => w.saveAsTable(tmp)
    }
    graft.core.Tables.drop(spark, table)
    spark.sql(s"ALTER TABLE `$tmp` RENAME TO `$table`")
    spark.catalog.refreshTable(table)
  }
}
