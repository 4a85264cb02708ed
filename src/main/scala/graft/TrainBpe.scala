package graft
import org.apache.spark.sql.SparkSession
object TrainBpe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val merges = graft.text.Bpe.train(docs, "text", 64)
    merges.foreach { case (a, b) => println(s"""MERGE ("$a", "$b"),""") }
    spark.stop()
  }
}
