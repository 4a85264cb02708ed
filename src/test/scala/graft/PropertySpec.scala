package graft

import graft.ops.ChangeLog
import graft.text.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants over generated inputs (raw ScalaCheck
  * generators, fixed seeds — scalatestplus bridge is not in the
  * offline cache). */
class PropertySpec extends SparkSpec {

  /** Deterministically sample `gen` across `trials` seeds. */
  private def forAllSeeded[A](gen: Gen[A], trials: Int = 6)(body: A => Unit): Unit =
    (1 to trials).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  private val asciiText: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar, 2 -> Gen.const(' '), 1 -> Gen.oneOf('.', ',', '!'))).map(_.mkString)

  test("rolling hash matches the reference model on arbitrary ASCII text") {
    val s = spark
    import s.implicits._
    forAllSeeded(Gen.listOfN(8, asciiText)) { texts =>
      {
        val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
        val got = TextAnalysis.fingerprints(df, "text", "doc_id")
          .orderBy("doc_id").collect().map(_.getLong(2)).toSeq
        val expect = texts.map(_.getBytes("UTF-8").foldLeft(0L)((a, b) => (a * 31 + b) % 1000000007L))
        assert(got == expect)
      }
    }
  }

  test("namespace contract∘expand is identity for registered URIs") {
    val s = spark
    import s.implicits._
    val ns = graft.core.Tpch.namespaces
    val keyGen = Gen.chooseNum(0L, 999999L)
    forAllSeeded(Gen.listOfN(12, Gen.zip(Gen.oneOf(ns.prefixes.values.toSeq), keyGen))) { pairs =>
      {
        val uris = pairs.map { case (exp, k) => exp + k }
        val got = uris.toDF("uri")
          .select(ns.expand(ns.contract(col("uri"))).as("rt"))
          .collect().map(_.getString(0)).toSeq
        assert(got == uris)
      }
    }
  }

  test("compactDedup is idempotent and preserves latestOnly") {
    val s = spark
    import s.implicits._
    val versionGen = for {
      id <- Gen.oneOf("a", "b", "c")
      payload <- Gen.oneOf("p", "q")
    } yield (id, payload)
    forAllSeeded(Gen.listOfN(20, versionGen)) { versions =>
      {
        val log = versions.zipWithIndex
          .map { case ((id, p), i) => (id, i.toLong, p) }.toDF("id", "recorded", "payload")
        val once = ChangeLog.compactDedup(log, "id", "recorded", Seq("payload"))
        val twice = ChangeLog.compactDedup(once, "id", "recorded", Seq("payload"))
        val rows = (df: org.apache.spark.sql.DataFrame) =>
          df.select("id", "recorded", "payload").collect()
            .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
        assert(rows(once) == rows(twice)) // idempotent
        val latest = (df: org.apache.spark.sql.DataFrame) =>
          ChangeLog.latestOnly(df, "id", "recorded").select("id", "payload")
            .collect().map(r => (r.getString(0), r.getString(1))).toSet
        assert(latest(once) == latest(log)) // timeline-correct
      }
    }
  }
}
