package graft.jobs

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession

import scala.jdk.CollectionConverters._

/** Dataset statistics beyond row counts — the reference's /statistics
  * API reports per-dataset storage breakdowns
  * (mimiro-io/datahub internal/server/statistics.go:14 GetStatistics,
  * :23 GetStatisticsForDs). */
object Statistics {

  /** Compressed data bytes of a parquet dataset (single file or a
    * directory of part files): the sum of column-chunk compressed sizes
    * over all row groups. FOOTER metadata only — no data pages are
    * read — and byte-identical to DuckDB's
    * `sum(total_compressed_size) FROM parquet_metadata(...)`, which
    * keeps the statistic oracle-checkable across engines.
    *
    * Runs driver-side over the file listing: O(#files) footer reads,
    * the same metadata walk the reference does over Badger keyspace
    * sizes. For object stores with very large file counts, wrap the
    * path list in `spark.parallelize(paths).map(...)` — the per-file
    * computation below is already self-contained. */
  def parquetDataBytes(spark: SparkSession, path: String): Long = {
    val conf = spark.sessionState.newHadoopConf()
    listParquetFiles(conf, path).map(f => footerDataBytes(conf, new Path(f))).sum
  }

  /** All part files under `path` (or `path` itself when it is a file).
    * Recursive: partitioned layouts (writePartitionedLog's __rbucket=N
    * dirs) keep their part files in subdirectories. */
  private[jobs] def listParquetFiles(conf: org.apache.hadoop.conf.Configuration,
                                     path: String): Seq[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    if (fs.getFileStatus(p).isDirectory) {
      val it = fs.listFiles(p, true)
      val buf = Seq.newBuilder[String]
      while (it.hasNext) {
        val f = it.next()
        if (f.isFile && f.getPath.getName.endsWith(".parquet")) buf += f.getPath.toString
      }
      buf.result()
    } else Seq(path)
  }

  /** Footer-only compressed data bytes of ONE parquet file —
    * self-contained per-file work, so callers with very large file
    * counts distribute it over executors (`Export.manifest` does). */
  private[jobs] def footerDataBytes(conf: org.apache.hadoop.conf.Configuration,
                                    f: Path): Long = {
    val r = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
    try r.getFooter.getBlocks.asScala.iterator
      .flatMap(_.getColumns.asScala).map(_.getTotalSize).sum
    finally r.close()
  }
}
