package graft

import graft.ann.Ann
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

/** Engine-build-determinism pins for the float-ranking families — the
  * r17 m10 postmortem (VERDICT r17 "What's missing #2"): the driver's
  * DuckDB build resolved exactly-tied routing cosines in the opposite
  * order from the local build, so every ordering-deciding similarity
  * must either (a) consume the integer-exact fixed-point projection
  * (ties then break identically on any build) or (b) be demonstrably
  * tie-free on the fixtures. (a) is pinned here engine-side; (b) is
  * pinned oracle-side by `tools/oracleaudit.py` over
  * `SparkEntry.auditSql` in the round gates.
  */
class ExactRankingSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").cache()

  /** m10's segment-head population — the tie-rich vector set that
    * tripped the driver twice (zero-padded window-sum heads). */
  private lazy val segEmb = {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") % 20 === 0)
    graft.multimodal.Multimodal.segmentEmbed(
      graft.multimodal.Multimodal.mediaFromDocs(docs), threshold = 150L).toDF().cache()
  }

  test("fixedUnit: integer-valued, |f| <= 2^20, max coordinate hits ±2^20 exactly") {
    val checked = emb.select(VectorFunctions.fixedUnit(col("embedding")).as("fu"))
      .select(
        max(expr("aggregate(fu, 0, (acc, x) -> CASE WHEN x <> floor(x) THEN acc + 1 ELSE acc END)")).as("frac"),
        max(expr("aggregate(fu, 0.0D, (acc, x) -> greatest(acc, abs(x)))")).as("mx"),
        // every nonzero vector's extreme coordinate must land exactly on ±2^20
        min(expr("aggregate(fu, 0.0D, (acc, x) -> greatest(acc, abs(x)))")).as("mn"))
      .head()
    assert(checked.getInt(0) == 0, "non-integer fixed-point values")
    assert(checked.getDouble(1) == 1048576.0, s"max |f| = ${checked.getDouble(1)}")
    assert(checked.getDouble(2) == 1048576.0, "a nonzero vector missed the ±2^20 anchor")
  }

  test("fixedUnit dot: accumulation-order invariant (forward == reversed, bit-exact)") {
    // the property the raw-float cosine lacks and the whole fix rests
    // on: every partial sum is an exact integer < 2^53, so ANY
    // summation order gives the identical double. Reversing both
    // operand arrays reverses the accumulation order exactly.
    import VectorFunctions.{dot, fixedUnit}
    val pairs = emb.select(col("vec_id").as("a"), fixedUnit(col("embedding")).as("fa"))
      .crossJoin(broadcast(
        emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("b"), fixedUnit(col("embedding")).as("fb"))))
    val diverging = pairs.select(
        (dot(col("fa"), col("fb")) =!= dot(reverse(col("fa")), reverse(col("fb")))).as("bad"))
      .filter(col("bad")).count()
    assert(diverging == 0, s"$diverging pairs diverge under reversed accumulation")
  }

  test("m10 segment population: routing ties EXIST and resolve order-invariantly") {
    import VectorFunctions.{dot, fixedUnit}
    val table = graft.core.Tables.scoped("exact_rank_m10")
    Ann.buildIvfIndex(segEmb, "embedding", "seg_id", table)
    val cent = spark.table(s"${table}_cent")
      .select(explode(col("cents")).as("c"))
      .select(col("c.cid").as("cid"), col("c.cv").as("cv"))
    val fu = segEmb.select(col("seg_id").as("id"), fixedUnit(col("embedding")).as("fu"))
    val sims = fu.crossJoin(broadcast(cent))
      .select(col("id"), col("cid"),
        (dot(col("fu"), col("cv")) /
          (sqrt(dot(col("fu"), col("fu"))) * sqrt(dot(col("cv"), col("cv"))))).as("csim"),
        (dot(reverse(col("fu")), reverse(col("cv"))) /
          (sqrt(dot(reverse(col("fu")), reverse(col("fu")))) *
            sqrt(dot(reverse(col("cv")), reverse(col("cv")))))).as("csim_rev"))
      .cache()
    // (a) bit-exact under reversed accumulation — csim is a single
    // IEEE division/multiplication over exact-integer-derived operands
    assert(sims.filter(col("csim") =!= col("csim_rev")).count() == 0,
      "routing cosine diverges under reversed accumulation")
    // (b) the tie-rich structure the driver tripped on is REAL in this
    // population (zero-padded heads): best and second-best centroid
    // cosines collide exactly for some rows. This is the regression
    // canary — if the fixture loses its ties, the spec stops testing
    // the failure mode and must move to a constructed population.
    import org.apache.spark.sql.expressions.Window
    val ranked = sims.withColumn("rn",
      row_number().over(Window.partitionBy(col("id")).orderBy(col("csim").desc, col("cid"))))
    val gaps = ranked.filter(col("rn") <= 2)
      .groupBy("id").agg((max(when(col("rn") === 1, col("csim")))
        - max(when(col("rn") === 2, col("csim")))).as("g"))
    val ties = gaps.filter(col("g") === 0.0).count()
    assert(ties > 0, "m10 fixture population lost its routing ties — spec no longer " +
      "exercises the r17 driver-divergence class; plant a tied population instead")
  }

  test("auditSql covers every ANN-family query surfaced in queries()") {
    val annFamily = Set(
      "s1_ann_bruteforce", "s2_ann_lsh", "s3_ann_ivf", "s4_ann_indexed",
      "s5_ivf_indexed", "s7_ann_pq", "s8_ann_pq_indexed", "s9_ivfpq_indexed",
      "s10_filtered_ann", "s11_filtered_ivfpq",
      "m3_multimodal_ann", "m4_multimodal_ann_indexed", "m9_audio_ann_indexed",
      "m10_segment_ann_indexed",
      "d5_embedding_neardup", "d7_embedding_simjoin", "d11_stream_embed_dedup",
      "d12_semantic_dedup", "d14_semantic_delta", "d15_semantic_indexed",
      "d17_stream_semantic", "d26_semantic_decon", "d30_media_neardup")
    assert(SparkEntry.auditSql.keySet == annFamily,
      s"audit coverage drifted: missing=${annFamily -- SparkEntry.auditSql.keySet} " +
        s"extra=${SparkEntry.auditSql.keySet -- annFamily}")
    assert(annFamily.subsetOf(SparkEntry.queries.keySet))
  }
}
