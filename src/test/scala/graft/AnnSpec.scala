package graft

import graft.ann.Ann
import org.apache.spark.sql.functions._

/** ANN: brute-force equals a driver-side exact top-k; the LSH variant
  * reaches useful recall against it. */
class AnnSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").cache()

  private def topkLocal(k: Int, nq: Int): Map[Long, Seq[Long]] = {
    val local = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    val norms = local.map { case (id, v) => id -> math.sqrt(v.map(x => x * x).sum) }.toMap
    val byId = local.toMap
    (0L until nq.toLong).map { q =>
      val qv = byId(q)
      val scored = local.filter(_._1 != q).map { case (id, v) =>
        val dot = qv.zip(v).map { case (x, y) => x * y }.sum
        (id, dot / (norms(q) * norms(id)))
      }
      q -> scored.sortBy { case (id, s) => (-s, id) }.take(k).map(_._1).toSeq
    }.toMap
  }

  test("bruteForceTopK matches the exact local top-5") {
    val got = Ann.bruteForceTopK(emb, "embedding", "vec_id", col("id") < 5, 5)
      .orderBy("query_id", "rnk")
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(_.getInt(3)).map(_.getLong(1)).toSeq).toMap
    assert(got == topkLocal(5, 5))
  }

  test("lshTopK recall@5 vs brute force is well above chance") {
    val exact = topkLocal(5, 10)
    val lsh = Ann.lshTopK(emb, "embedding", "vec_id", 64, col("id") < 10, 5)
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    val hits = exact.map { case (q, nbrs) => (lsh.getOrElse(q, Set.empty) & nbrs.toSet).size }.sum
    val recall = hits.toDouble / (5 * exact.size)
    // 500 vectors, 5/499 random chance ≈ 0.01; LSH should be far above
    assert(recall >= 0.3, s"LSH recall@5 too low: $recall")
  }

  test("ivfTopK recall@5 vs brute force is well above chance") {
    val exact = topkLocal(5, 10)
    val ivf = Ann.ivfTopK(emb, "embedding", "vec_id", col("id") < 10, 5)
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    val hits = exact.map { case (q, nbrs) => (ivf.getOrElse(q, Set.empty) & nbrs.toSet).size }.sum
    val recall = hits.toDouble / (5 * exact.size)
    assert(recall >= 0.3, s"IVF recall@5 too low: $recall")
  }

  test("brute force broadcasts the query side (no corpus shuffle)") {
    val plan = planOf(Ann.bruteForceTopK(emb, "embedding", "vec_id", col("id") < 5, 5))
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("indexed ANN = recompute ANN; the bucket join rides the index buckets") {
    val table = "ann_idx_spec"
    Ann.buildAnnIndex(emb, "embedding", "vec_id", dims = 64, table, buckets = 8)
    val indexed = Ann.lshTopKIndexed(spark, table, col("id") < 10, 5)
    val got = indexed.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val recomputed = Ann.lshTopK(emb, "embedding", "vec_id", 64, col("id") < 10, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(got == recomputed)
    // with broadcast off, the self-join must ride the (t, sk) buckets —
    // no Exchange keyed by the bucket columns
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = planOf(Ann.lshTopKIndexed(spark, table, col("id") < 10, 5))
      assert(!plan.contains("hashpartitioning(t#"), plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }

  test("indexed IVF = recompute IVF (inverted file reused, corpus not re-assigned)") {
    val table = "ivf_idx_spec"
    Ann.buildIvfIndex(emb, "embedding", "vec_id", table, buckets = 8)
    val got = Ann.ivfTopKIndexed(spark, table, col("id") < 10, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val recomputed = Ann.ivfTopK(emb, "embedding", "vec_id", col("id") < 10, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(got == recomputed)
  }

  test("k-means-trained centroids beat the md5 sample at equal nprobe on a clustered corpus") {
    val s = spark
    import s.implicits._
    // deterministic clustered fixture: 8 tight gaussian clusters — the
    // regime where a static sampled quantizer splits clusters across
    // sample-cells (losing neighbors at small nprobe) while Lloyd rounds
    // pull one centroid onto each cluster mean
    val rnd = new scala.util.Random(42)
    val dims = 16
    val centers = Array.fill(8)(Array.fill(dims)(rnd.nextGaussian()))
    val rows = (0 until 320).map { i =>
      val c = centers(i % 8)
      (i.toLong, c.toSeq.map(x => (x + 0.15 * rnd.nextGaussian()).toFloat))
    }
    val emb = rows.toDF("vec_id", "embedding")
    val truth = Ann.bruteForceTopK(emb, "embedding", "vec_id", col("id") < 10, 5)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(rounds: Int): Double = {
      val got = Ann.ivfTopK(emb, "embedding", "vec_id", col("id") < 10, 5,
          nlist = 8, nprobe = 1, rounds = rounds)
        .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (truth & got).size.toDouble / truth.size
    }
    val sampled = recallOf(0)
    val trained = recallOf(3)
    assert(trained > sampled, s"trained=$trained sampled=$sampled")
    assert(trained >= 0.8, s"trained recall too low: $trained")
  }

  test("indexed IVF probe reads the centroid companion, never rescans the inverted file") {
    val table = "ivf_idx_plan_spec"
    Ann.buildIvfIndex(emb, "embedding", "vec_id", table, buckets = 8)
    val plan = planOf(Ann.ivfTopKIndexed(spark, table, col("id") < 10, 5))
    def scans(t: String) = plan.sliding(s"Scan parquet spark_catalog.default.$t\n".length)
      .count(_ == s"Scan parquet spark_catalog.default.$t\n")
    // exactly two inverted-file scans (cell candidates + the probe rows)
    // plus the constant-sized centroid companion; the build-time centroid
    // choice is NOT re-derived with a full-index TakeOrdered per batch
    assert(scans(table) == 2, s"inverted file scanned ${scans(table)}×:\n$plan")
    assert(scans(s"${table}_cent") >= 1, s"centroids must come from the companion table:\n$plan")
    assert(!plan.contains("TakeOrdered"), s"probe plan re-derives centroids:\n$plan")
  }

  test("PQ training raises on indivisible vector dims instead of truncating subspaces") {
    import graft.ann.Pq
    val s = spark
    import s.implicits._
    // 60 dims do not split into 8 subspaces; the derived-width (dims=0)
    // path must fail loudly — floor(60/8)=7 would silently drop the
    // last 4 dims of every vector from every codebook
    val odd = (0 until 32).map(i => (i.toLong, Seq.fill(60)(((i * 31 + 7) % 13).toFloat)))
      .toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      Pq.trainCodebooks(odd, "embedding", "vec_id", m = 8, ksub = 4, rounds = 1).count()
    }
    // the assert fires inside a Spark job — the message may sit anywhere
    // in the cause chain
    val msgs = Iterator.iterate[Throwable](ex)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("subspaces"), s"unexpected error: $msgs")
  }

  test("PQ: codes compress to m small ints; reconstruction top-k recall is well above chance") {
    import graft.ann.Pq
    val books = Pq.trainCodebooks(emb, "embedding", "vec_id", m = 8, ksub = 16, rounds = 1)
    val codes = Pq.encode(emb, "embedding", "vec_id", books, m = 8)
    val sample = codes.limit(50).collect()
    assert(sample.nonEmpty)
    sample.foreach { r =>
      val cs = r.getSeq[Long](1)
      assert(cs.length == 8, s"expected 8 sub-codes, got ${cs.length}")
      assert(cs.forall(c => c >= 0 && c < 16), s"codes out of range: $cs")
    }
    // recall on a CLUSTERED corpus, where top-k membership is signal,
    // not noise — PQ approximates the scores themselves, so on
    // near-uniform random similarities top-5 membership is inherently
    // unstable (measured ~0.22 on the random fixture at any codebook
    // size, vs ~0.01 chance); on clustered data reconstruction must
    // retrieve cluster-mates
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(8)(Array.fill(64)(rnd.nextGaussian()))
    val clustered = (0 until 320).map { i =>
      val c = centers(i % 8)
      (i.toLong, c.toSeq.map(x => (x + 0.15 * rnd.nextGaussian()).toFloat))
    }.toDF("vec_id", "embedding")
    val truth = Ann.bruteForceTopK(clustered, "embedding", "vec_id", col("id") < 10, 5)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Pq.pqTopK(clustered, "embedding", "vec_id", col("id") < 10, 5)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (truth & pq).size.toDouble / truth.size
    assert(recall >= 0.5, s"PQ recall@5 too low on clustered corpus: $recall")
  }

  test("sketch index compact + absorb ≡ rebuild (vector re-ingest loop)") {
    val table = "ann_idx_absorb_spec"
    def probe(t: String) = Ann.lshTopKIndexed(spark, t, col("id") < 10, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    // build on the corpus MINUS a batch, then absorb the batch: sketches
    // are deterministic, so the result must equal the full build exactly
    val batch = emb.filter(col("vec_id") >= 480)
    Ann.buildAnnIndex(emb.filter(col("vec_id") < 480), "embedding", "vec_id", 64, table, buckets = 8)
    Ann.absorbIntoAnnIndex(spark, batch, "embedding", "vec_id", table)
    val full = "ann_idx_absorb_full"
    Ann.buildAnnIndex(emb, "embedding", "vec_id", 64, full, buckets = 8)
    assert(probe(table) == probe(full), "absorb must reproduce the full build")
    // supersede loop: compact the batch back out — probes now equal the
    // pre-absorb index
    Ann.compactAnnIndex(spark, table, batch.select(col("vec_id").as("id")))
    val minus = "ann_idx_absorb_minus"
    Ann.buildAnnIndex(emb.filter(col("vec_id") < 480), "embedding", "vec_id", 64, minus, buckets = 8)
    assert(probe(table) == probe(minus), "compact must remove exactly the batch")
  }

  test("inverted file compact + absorb under the frozen quantizer ≡ the original build") {
    val table = "ivf_idx_absorb_spec"
    def probe() = Ann.ivfTopKIndexed(spark, table, col("id") < 10, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    Ann.buildIvfIndex(emb, "embedding", "vec_id", table, buckets = 8)
    val before = probe()
    def rows() = spark.table(table).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toSet // (id, cid)
    val beforeRows = rows()
    // re-ingest round trip: compact a slice out, absorb the same vectors
    // back — cell routing under the frozen _cent is deterministic, so
    // the inverted file (and every probe) must come back identical
    val slice = emb.filter(col("vec_id") % 5 === 0)
    Ann.compactIvfIndex(spark, table, slice.select(col("vec_id").as("id")))
    assert(rows() != beforeRows, "compact must actually remove the slice")
    Ann.absorbIntoIvfIndex(spark, slice, "embedding", "vec_id", table)
    assert(rows() == beforeRows)
    assert(probe() == before)
  }

  test("standing PQ index: probe ADC-scans stored codes only — no re-train, no re-encode") {
    import graft.ann.Pq
    val table = "pq_idx_spec"
    Pq.buildPqIndex(emb, "embedding", "vec_id", table, dims = 64)
    def keys(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val got = keys(Pq.pqTopKIndexed(spark, table, emb, "embedding", "vec_id", col("id") < 10, 5))
    val inline = keys(Pq.pqTopK(emb, "embedding", "vec_id", col("id") < 10, 5, dims = 64))
    assert(got == inline, "indexed probe must equal the inline train+encode path")
    val plan = planOf(Pq.pqTopKIndexed(spark, table, emb, "embedding", "vec_id", col("id") < 10, 5))
    def scans(t: String) = plan.sliding(s"Scan parquet spark_catalog.default.$t\n".length)
      .count(_ == s"Scan parquet spark_catalog.default.$t\n")
    // ONE codes scan (the ADC stage) + the codebook companion; training
    // (per-(id,sub) min_by winner picks) and encoding (subspace
    // posexplode) must be absent from the probe plan entirely
    assert(scans(table) == 1, s"codes scanned ${scans(table)}×:\n$plan")
    assert(scans(s"${table}_books") >= 1, s"codebooks must come from the companion:\n$plan")
    assert(!plan.contains("min_by"), s"probe plan re-encodes the corpus:\n$plan")
    assert(!plan.contains("posexplode"), s"probe plan re-derives subspace rows:\n$plan")
  }

  test("IVF×PQ: routed ADC recall vs brute force; probe decodes probed cells only") {
    import graft.ann.IvfPq
    val s = spark
    import s.implicits._
    // clustered corpus (the regime where cell routing + coarse codes
    // must retrieve cluster-mates; see the PQ recall spec)
    val rnd = new scala.util.Random(11)
    val centers = Array.fill(8)(Array.fill(64)(rnd.nextGaussian()))
    val clustered = (0 until 320).map { i =>
      val c = centers(i % 8)
      (i.toLong, c.toSeq.map(x => (x + 0.15 * rnd.nextGaussian()).toFloat))
    }.toDF("vec_id", "embedding")
    val truth = Ann.bruteForceTopK(clustered, "embedding", "vec_id", col("id") < 10, 5)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val table = "ivfpq_idx_spec"
    IvfPq.buildIvfPqIndex(clustered, "embedding", "vec_id", table, dims = 64)
    val got = IvfPq.ivfPqTopKIndexed(spark, table, clustered, "embedding", "vec_id",
        col("id") < 10, 5)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (truth & got).size.toDouble / truth.size
    assert(recall >= 0.5, s"IVF×PQ recall@5 too low on clustered corpus: $recall")
    // probe plan: one inverted-file scan, decode off the codebook
    // companion, route off the centroid companion — no re-train
    // (min_by) and no re-encode (posexplode) anywhere
    val plan = planOf(IvfPq.ivfPqTopKIndexed(spark, table, clustered, "embedding", "vec_id",
      col("id") < 10, 5))
    def scans(t: String) = plan.sliding(s"Scan parquet spark_catalog.default.$t\n".length)
      .count(_ == s"Scan parquet spark_catalog.default.$t\n")
    assert(scans(table) == 1, s"inverted file scanned ${scans(table)}×:\n$plan")
    assert(scans(s"${table}_books") >= 1 && scans(s"${table}_cent") >= 1, plan)
    assert(!plan.contains("min_by") && !plan.contains("posexplode"), plan)
  }

  test("IVF×PQ compact + absorb under frozen quantizer/codebooks round-trips the index") {
    import graft.ann.IvfPq
    val table = "ivfpq_idx_absorb_spec"
    IvfPq.buildIvfPqIndex(emb, "embedding", "vec_id", table)
    def rows() = spark.table(table).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2))).toSet
    def probe() = IvfPq.ivfPqTopKIndexed(spark, table, emb, "embedding", "vec_id", col("id") < 10, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val (beforeRows, beforeProbe) = (rows(), probe())
    val slice = emb.filter(col("vec_id") % 7 === 0)
    IvfPq.compactIvfPqIndex(spark, table, slice.select(col("vec_id").as("id")))
    assert(rows() != beforeRows, "compact must actually remove the slice")
    IvfPq.absorbIntoIvfPqIndex(spark, slice, "embedding", "vec_id", table)
    assert(rows() == beforeRows, "frozen-artifact re-encode + re-route must restore every row")
    assert(probe() == beforeProbe)
  }

  test("filtered IVF×PQ: only qualifying neighbors; keep-metadata survives compact+absorb") {
    import graft.ann.IvfPq
    val table = "ivfpq_idx_filter_spec"
    IvfPq.buildIvfPqIndex(emb, "embedding", "vec_id", table, keep = Seq("label"))
    val labels = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val got = IvfPq.ivfPqTopKIndexed(spark, table, emb, "embedding", "vec_id",
      col("id") < 10, 5, neighborPred = col("label") === 1).collect()
    assert(got.nonEmpty && got.forall(r => labels(r.getLong(1)) == 1),
      "every returned neighbor must satisfy the predicate")
    // the metadata column must ride compact + absorb unchanged (absorb
    // derives the keep columns from the table's own schema)
    def rows() = spark.table(table).select("id", "cid", "label", "codes").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getSeq[Long](3))).toSet
    val before = rows()
    val slice = emb.filter(col("vec_id") % 5 === 0)
    IvfPq.compactIvfPqIndex(spark, table, slice.select(col("vec_id").as("id")))
    assert(rows() != before)
    IvfPq.absorbIntoIvfPqIndex(spark, slice, "embedding", "vec_id", table)
    assert(rows() == before, "metadata-carrying absorb must restore every row")
  }

  test("ivf cell assignment is map-only (no corpus shuffle before scoring)") {
    val plan = planOf(Ann.ivfTopK(emb, "embedding", "vec_id", col("id") < 10, 5))
    // the round-2 shape amplified the corpus nlist× through a
    // `row_number over (partition by id)` window — that shuffle keyed by
    // the corpus id must be gone; the only remaining exchanges belong to
    // the two-phase top-k (keyed by query_id) and the 1-row centroid agg
    assert(!plan.contains("hashpartitioning(id#"), plan)
  }

  test("keep-metadata IVF index survives compact + absorb (schema-derived columns)") {
    val table = "ivf_idx_meta_absorb_spec"
    Ann.buildIvfIndex(emb, "embedding", "vec_id", table, keep = Seq("label"))
    def rows() = spark.table(table).select("id", "cid", "label").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val before = rows()
    val slice = emb.filter(col("vec_id") % 5 === 0)
    Ann.compactIvfIndex(spark, table, slice.select(col("vec_id").as("id")))
    assert(rows() != before, "compact must actually remove the slice")
    Ann.absorbIntoIvfIndex(spark, slice, "embedding", "vec_id", table)
    assert(rows() == before, "metadata-carrying absorb must restore every row")
  }

  test("sample-trained centroids are deterministic and keep indexed recall above chance") {
    val c1 = Ann.trainCentroids(emb, "embedding", "vec_id", sampleFrac = 0.5).collect()
    val c2 = Ann.trainCentroids(emb, "embedding", "vec_id", sampleFrac = 0.5).collect()
    assert(c1.map(_.toString).toSeq == c2.map(_.toString).toSeq,
      "md5-thresholded training sample must be reproducible")
    val table = "ivf_idx_sampletrain_spec"
    Ann.buildIvfIndex(emb, "embedding", "vec_id", table, trainFrac = 0.5)
    val exact = topkLocal(5, 10)
    val ivf = Ann.ivfTopKIndexed(spark, table, col("id") < 10, 5)
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    val hits = exact.map { case (q, nbrs) => (ivf.getOrElse(q, Set.empty) & nbrs.toSet).size }.sum
    val recall = hits.toDouble / (5 * exact.size)
    assert(recall >= 0.3, s"sample-trained IVF recall@5 too low: $recall")
  }

  test("filtered ANN: only qualifying neighbors, ranking = post-filtered unfiltered ranking") {
    val table = "ivf_idx_filter_spec"
    Ann.buildIvfIndex(emb, "embedding", "vec_id", table, keep = Seq("label"))
    val got = Ann.ivfTopKIndexed(spark, table, col("id") < 10, k = 5,
      neighborPred = col("label") === 1)
    val labels = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = got.collect()
    assert(rows.nonEmpty && rows.forall(r => labels(r.getLong(1)) == 1),
      "every returned neighbor must satisfy the predicate")
    // pre-filtering ≡ exhaustive-k unfiltered ranking post-filtered to
    // the predicate then cut to k (no candidate starvation)
    val all = Ann.ivfTopKIndexed(spark, table, col("id") < 10, k = 100000).collect()
    val expect = all.groupBy(_.getLong(0)).view.mapValues(
      _.sortBy(_.getInt(3)).filter(r => labels(r.getLong(1)) == 1).take(5)
        .map(_.getLong(1)).toSeq).toMap
    val gotBy = rows.groupBy(_.getLong(0)).view.mapValues(
      _.sortBy(_.getInt(3)).map(_.getLong(1)).toSeq).toMap
    assert(gotBy == expect)
    // the predicate is a map-side filter on the bucketed scan — it must
    // not add an Exchange over the unfiltered probe plan (fresh plans
    // on both sides: an executed DataFrame prints the AQE-final plan,
    // which double-counts)
    val exch = "Exchange".r
    val base = exch.findAllIn(planOf(Ann.ivfTopKIndexed(spark, table, col("id") < 10, 5))).size
    val filtPlan = planOf(Ann.ivfTopKIndexed(spark, table, col("id") < 10, 5,
      neighborPred = col("label") === 1))
    val filt = exch.findAllIn(filtPlan).size
    assert(filt <= base, s"filtered probe added shuffles: $filt vs $base")
    // ...and the predicate reaches the parquet scan itself
    assert(filtPlan.contains("EqualTo(label,1)"), filtPlan)
  }

  test("semantic dedup drops the planted duplicate, keeps the min-id representative") {
    import graft.ann.SemDedup
    // an exact copy of vector 0 under a larger id must land in the same
    // cell (identical argmax, same tie-break) and be the dropped side
    val dup = emb.filter(col("vec_id") === 0).withColumn("vec_id", lit(10000L))
    val out = SemDedup.semanticDedup(emb.unionByName(dup), "embedding", "vec_id",
        threshold = 0.99)
      .select("id", "keep").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out(10000L) == 0, "planted duplicate must be dropped")
    assert(out(0L) == 1, "the min-id representative must be kept")
  }

  test("semantic dedup delta ≡ cell-local pairs of the absorbed index (frozen quantizer)") {
    import graft.ann.SemDedup
    import graft.functions.VectorFunctions.dot
    val table = "ivf_idx_semdelta_spec"
    val corpus = emb.filter(col("vec_id") >= 50)
    val batch = emb.filter(col("vec_id") < 50)
    Ann.buildIvfIndex(corpus, "embedding", "vec_id", table)
    val delta = SemDedup.semanticDedupDelta(spark, batch, "embedding", "vec_id", table, 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(delta.nonEmpty, "threshold 0.3 must surface natural pairs")
    // ground truth: absorb the batch under the SAME frozen quantizer,
    // then every cell-local >= 0.3 pair of the combined index that
    // touches a batch id — the delta must equal it exactly
    Ann.absorbIntoIvfIndex(spark, batch, "embedding", "vec_id", table)
    val idx = spark.table(table)
    val sim = dot(col("x.v"), col("y.v")) / (col("x.norm") * col("y.norm"))
    val expect = idx.as("x").join(idx.as("y"),
        col("x.cid") === col("y.cid") && col("x.id") < col("y.id"))
      .filter(sim >= 0.3 && (col("x.id") < 50 || col("y.id") < 50))
      .select(col("x.id"), col("y.id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(delta == expect,
      s"missing=${expect -- delta} extra=${delta -- expect}")
  }

  test("semantic decontamination: sound witnesses, identical-copy hits, n_hits counts, composable scrub") {
    import graft.ann.SemDedup
    import graft.functions.VectorFunctions.dot
    val table = "ivf_idx_decon_spec"
    Ann.buildIvfIndex(emb, "embedding", "vec_id", table)
    // eval = perturbed near-copies of train ids < 30 (the rephrase
    // analog) + TWO exact copies of train id 7 under fresh ids — the
    // identical leak must flag id 7 with max_sim 1.0 and n_hits
    // counting BOTH copies (+ the perturbed copy of 7 if co-celled)
    val eval = SemDedup.perturbedBatch(emb, "embedding", "vec_id", n = 30)
      .unionByName(emb.filter(col("vec_id") === 7L)
        .select((col("vec_id") + 20000L).as("vec_id"), col("embedding")))
      .unionByName(emb.filter(col("vec_id") === 7L)
        .select((col("vec_id") + 30000L).as("vec_id"), col("embedding")))
    val got = SemDedup.semanticDecontaminate(spark, eval, "embedding", "vec_id", table, 0.9)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // flagged ids are TRAIN ids only
    val trainIds = emb.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got.keySet.subsetOf(trainIds), s"flagged non-train ids: ${got.keySet -- trainIds}")
    // soundness: every flagged id has an exact ≥-threshold eval witness
    // (all-pairs ground truth, no cell routing)
    def normed(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("v"))
        .withColumn("norm", sqrt(dot(col("v"), col("v"))))
    val nc = normed(emb)
    val ne = normed(eval)
    val witness = nc.as("x").join(ne.as("y"),
        dot(col("x.v"), col("y.v")) / (col("x.norm") * col("y.norm")) >= 0.9)
      .select(col("x.id")).distinct().collect().map(_.getLong(0)).toSet
    assert(got.keySet.subsetOf(witness), s"unsound flags: ${got.keySet -- witness}")
    // the identical copies: flagged at exactly 1.0 with both counted
    assert(got.contains(7L), "identical leak must be flagged")
    assert(got(7L)._2 == 1.0d, s"identical copy rounds to 1.0, got ${got(7L)}")
    assert(got(7L)._1 >= 2L, s"both exact copies count, got ${got(7L)}")
    // composition: the anti-join scrub removes exactly the flagged docs
    val clean = emb.join(
      SemDedup.semanticDecontaminate(spark, eval, "embedding", "vec_id", table, 0.9),
      col("vec_id") === col("id"), "left_anti")
    assert(clean.count() == trainIds.size - got.size)
    // probing more cells only ADDS flags (recall is monotone in nprobe)
    // and stays sound (subset of the exact all-pairs witnesses)
    val wide = SemDedup.semanticDecontaminate(spark, eval, "embedding", "vec_id", table, 0.9,
        nprobe = 3)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got.keySet.subsetOf(wide), s"nprobe=3 lost flags: ${got.keySet -- wide}")
    assert(wide.subsetOf(witness), s"nprobe=3 unsound: ${wide -- witness}")
  }

  test("indexed semantic dedup ≡ recompute; the cell self-join rides the index buckets") {
    import graft.ann.SemDedup
    val table = "ivf_idx_semidx_spec"
    Ann.buildIvfIndex(emb, "embedding", "vec_id", table)
    val get = (d: org.apache.spark.sql.DataFrame) =>
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(get(SemDedup.semanticDedupIndexed(spark, table, 0.4)) ==
      get(SemDedup.semanticDedup(emb, "embedding", "vec_id", threshold = 0.4)))
    // the at-scale condition: with broadcast off, the cid self-join
    // must ride the index buckets — sort-merge with NO Exchange
    // partitioned by cid
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = planOf(SemDedup.semanticDedupIndexed(spark, table, 0.4))
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("hashpartitioning(cid#"), plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }

  test("semantic dedup is sound (every drop has a smaller-id exact witness) and cluster-local") {
    import graft.ann.SemDedup
    val out = SemDedup.semanticDedup(emb, "embedding", "vec_id", threshold = 0.4)
    val dropped = out.filter(col("keep") === 0).select("id").collect().map(_.getLong(0)).toSet
    // exact all-pairs ground truth at the same threshold: a dropped id
    // must be the larger side of SOME >= 0.4 pair (cluster-local
    // candidates are a subset of the exact pair set)
    val witnesses = graft.dedup.Dedup.embeddingSimJoin(emb, "embedding", "vec_id", 0.4)
      .select("b").collect().map(_.getLong(0)).toSet
    assert(dropped.subsetOf(witnesses), s"unsound drops: ${dropped -- witnesses}")
    // the pair pass must be a cid-keyed equi-join, never an all-pairs
    // product: the only conditionless joins allowed are the 1-row
    // centroid-array attaches (BNLJ by construction — the map-side
    // projection shape ivfTopK uses), one per roster branch (pair-join
    // sides + output roster), each printed twice by the formatted plan
    val plan = planOf(out)
    assert(!plan.contains("CartesianProduct"), plan)
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).size <= 6, plan)
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
      || plan.contains("BroadcastHashJoin"), plan)
  }
}
