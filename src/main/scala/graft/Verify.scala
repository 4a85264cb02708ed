package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Failure visibility: a query that throws must surface as a RED row in
  * the driver's correctness file, never as silent absence (the r8
  * postmortem: six broken queries read as "100/100 pass" because their
  * rows were simply missing). So on failure this writes (a) a one-row
  * `__graft_error` parquet in the query's slot — guaranteed schema/hash
  * mismatch against any oracle — and (b) an `errors.json` +
  * `expected_queries.json` sidecar so consumers can also detect absence
  * structurally. Extra CLI args beyond (sfDir, outDir) filter to a
  * query-name subset for local iteration. */
object Verify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val only: Set[String] = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // run-scoped warehouse: standing tables (already uniquely named
      // via Tables.scoped) additionally live in a per-run directory, so
      // no concurrent or stale process's warehouse state can ever feed
      // this gate (the r16 m10 hash-mismatch hazard, closed twice over)
      .config("spark.sql.warehouse.dir",
        Files.createTempDirectory("graft_verify_wh_").toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAXPART", "134217728"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val failed = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val selected = SparkEntry.queries.filter { case (n, _) => only.isEmpty || only(n) }
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
        System.err.println(s"[verify] $name failed: $msg")
        failed(name) = msg
        // poison row: hash/schema-mismatches every oracle → red, not absent
        try {
          import spark.implicits._
          Seq(s"QUERY THREW: ${msg.take(500)}").toDF("__graft_error")
            .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        } catch { case _: Throwable => () }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSqlFor(sfDir)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // float-ranking audits (SparkEntry.auditSql): oracle-side tie/gap
    // probes run by tools/oracleaudit.py — the m10-class detector
    Files.writeString(Paths.get(s"$outDir/audit_sql.json"),
      SparkEntry.auditSql.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    Files.writeString(Paths.get(s"$outDir/expected_queries.json"),
      selected.keys.map(q).mkString("[", ",", "]"))
    Files.writeString(Paths.get(s"$outDir/errors.json"),
      failed.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    if (failed.nonEmpty)
      System.err.println(s"[verify] ${failed.size}/${selected.size} queries FAILED: ${failed.keys.mkString(", ")}")
    spark.stop()
  }
}
