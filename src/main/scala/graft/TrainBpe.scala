package graft
import org.apache.spark.sql.SparkSession

/** Merge-table generators for the checked-in vocabularies:
  *  - no args: the 64-merge `DefaultMerges` literal (x8's vocab),
  *    printed as Scala source;
  *  - `deep [n]`: `trainFast` to n (default 4096) merges on the
  *    deterministic deep corpus, written to
  *    src/main/resources/graft/bpe_merges_deep.tsv (x13's vocab). */
object TrainBpe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.headOption.contains("deep")) {
      val n = args.lift(1).map(_.toInt).getOrElse(4096)
      val t0 = System.nanoTime()
      val merges = graft.text.Bpe.trainFast(
        graft.text.Bpe.deepCorpus(spark), "text", n)
      println(f"trainFast: ${merges.size} merges in ${(System.nanoTime() - t0) / 1e9}%.1f s")
      require(merges.size == n, s"deep corpus exhausted at ${merges.size} < $n merges")
      val out = java.nio.file.Paths.get("src/main/resources/graft/bpe_merges_deep.tsv")
      java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.write(out,
        merges.map { case (a, b) => s"$a\t$b" }.mkString("", "\n", "\n")
          .getBytes("UTF-8"))
      println(s"wrote ${merges.size} merges to $out")
    } else {
      val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      val merges = graft.text.Bpe.train(docs, "text", 64)
      merges.foreach { case (a, b) => println(s"""MERGE ("$a", "$b"),""") }
    }
    spark.stop()
  }
}
