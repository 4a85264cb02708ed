package graft

import graft.dedup.Dedup
import org.apache.spark.sql.functions._

/** Dedup family: exact semantics on constructed dups; MinHash-LSH and
  * SimHash validated against exact n-gram Jaccard on real documents. */
class DedupSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("exact dedup collapses identical content, keeps smallest id") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "same text"), (2L, "same text"), (3L, "other")).toDF("doc_id", "text")
    val got = Dedup.exact(df, "text", "doc_id")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L), (3L, 1L))) // (kept_id, n_copies)
  }

  test("url canonicalization: transport noise collapses, semantics survive; keep-first dedup; map-only plan") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "HTTP://WWW.News.Example.COM:80/A/b/?utm_source=x&b=2&a=1#top"),
      (2L, "http://news.example.com/A/b?a=1&b=2"),        // = 1 after canon
      (3L, "https://news.example.com/A/b?a=1&b=2"),       // scheme differs: distinct
      (4L, "http://news.example.com/A/B?a=1&b=2"),        // path case is semantic: distinct
      (5L, "http://news.example.com/A/b?a=1&b=2&fbclid=xyz&gclid=q"), // = 1
      (6L, "https://shop.example.com:443/"),              // default port + root slash
      (7L, "https://shop.example.com"),                   // = 6
      // r17 ADVICE edges: a BARE fbclid (no '=') must drop like
      // fbclid=..., and a userinfo authority must not defeat the
      // www-strip (host lowers/strips; userinfo stays case-sensitive)
      (8L, "http://news.example.com/A/b?a=1&b=2&fbclid"), // = 1
      (9L, "http://" + "User@WWW.News.Example.com/A/b?a=1&b=2")
    ).toDF("doc_id", "url")
    val canon = Dedup.withCanonicalUrl(df, "url")
      .collect().map(r => (r.getLong(0), r.getString(2))).toMap
    assert(canon(1L) == "http://news.example.com/A/b?a=1&b=2", canon(1L))
    assert(canon(2L) == canon(1L) && canon(5L) == canon(1L))
    assert(canon(3L) == "https://news.example.com/A/b?a=1&b=2")
    assert(canon(4L) != canon(1L))
    assert(canon(6L) == "https://shop.example.com" && canon(7L) == canon(6L))
    assert(canon(8L) == canon(1L), s"bare fbclid survived: ${canon(8L)}")
    assert(canon(9L) == "http://" + "User@news.example.com/A/b?a=1&b=2", canon(9L))
    val kept = Dedup.urlDedup(df, "url", "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(kept == Set(
      ("http://news.example.com/A/b?a=1&b=2", 1L, 4L),
      ("https://news.example.com/A/b?a=1&b=2", 3L, 1L),
      ("http://news.example.com/A/B?a=1&b=2", 4L, 1L),
      ("https://shop.example.com", 6L, 2L),
      ("http://" + "User@news.example.com/A/b?a=1&b=2", 9L, 1L)), kept.toString)
    // normalization is map-only: the only exchange is the final hash-agg
    // ("Exchange (" counts tree nodes; the detail section repeats the
    // word in "(n) Exchange" form)
    val plan = planOf(Dedup.urlDedup(df, "url", "doc_id"))
    assert(plan.split("Exchange \\(").length - 1 == 1, plan)
    // idempotence: a canonical URL is a fixed point of canonicalization
    // (nothing left to strip, lower, or re-sort)
    val once = Dedup.withCanonicalUrl(df, "url")
      .select(col("doc_id"), col("canonical_url").as("url"))
    val twice = Dedup.withCanonicalUrl(once, "url")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    twice.foreach { case (id, u, c) => assert(u == c, s"doc $id: $u re-canonicalized to $c") }
  }

  test("phash delta: batch probes the standing fingerprint index ≡ one-shot restricted; absorb chains batches") {
    val s = spark
    import s.implicits._
    val M = graft.multimodal.Multimodal
    def fps(df: org.apache.spark.sql.DataFrame) =
      M.dHash(M.mediaFromDocs(df)).toDF()
    val corpus = docs.limit(100)
    val table = "phash_idx_spec"
    Dedup.buildFingerprintIndex(fps(corpus), "doc_id", "phash", maxDist = 6, table)
    // batch 1 = brightness twins of every 10th doc (ids offset)
    val from = (32 to 126).map(_.toChar).mkString
    val to = (33 to 127).map(_.toChar).mkString
    val b1 = corpus.filter(col("doc_id") % 10 === 0)
      .withColumn("doc_id", col("doc_id") + 10000000L)
      .withColumn("text", translate(col("text"), from, to))
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val delta1 = pairs(Dedup.fingerprintPairsDelta(s, fps(b1), "doc_id", "phash", 6, table))
    // ≡ the one-shot hammingPairs over (corpus ∪ batch), batch-touching only
    val oneShot1 = pairs(Dedup.hammingPairs(fps(corpus.unionByName(b1)),
        "doc_id", "phash", 6))
      .filter { case (_, b, _) => b >= 10000000L }
    assert(delta1 == oneShot1 && delta1.nonEmpty,
      s"missed=${oneShot1 -- delta1} extra=${delta1 -- oneShot1}")
    // every twin surfaces against its original at Hamming 0
    val twins = b1.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(twins.forall(t => delta1.contains((t - 10000000L, t, 0))), delta1.toString)
    // absorb, then batch 2 (twins of every 10th+5 doc) sees batch 1
    // through the standing index alone
    Dedup.absorbIntoFingerprintIndex(s, fps(b1), "doc_id", "phash", 6, table)
    val b2 = corpus.filter(col("doc_id") % 10 === 5)
      .withColumn("doc_id", col("doc_id") + 20000000L)
      .withColumn("text", translate(col("text"), from, to))
    val delta2 = pairs(Dedup.fingerprintPairsDelta(s, fps(b2), "doc_id", "phash", 6, table))
    val oneShot2 = pairs(Dedup.hammingPairs(
        fps(corpus.unionByName(b1).unionByName(b2)), "doc_id", "phash", 6))
      .filter { case (_, b, _) => b >= 20000000L }
    assert(delta2 == oneShot2, s"missed=${oneShot2 -- delta2} extra=${delta2 -- oneShot2}")
  }

  test("minhash-LSH finds the same pairs as exact jaccard at threshold 0.8 (recall 1 here)") {
    val exact = Dedup.ngramJaccard(docs, "text", "doc_id", 3, 0.8)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLsh(docs, "text", "doc_id", 3, 128, 4, 0.8)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture should contain near-duplicate documents")
    assert(lsh == exact, s"LSH candidates+verify must equal exact pairs; missed=${exact -- lsh} extra=${lsh -- exact}")
  }

  test("containment catches the partial-copy class symmetric Jaccard misses") {
    val s = spark
    import s.implicits._
    // doc 1 (5 words, 3 shingles) is wholly quoted inside doc 2
    // (14 words, 12 shingles): jac = 3/12 = 0.25 — invisible at any
    // dedup-grade Jaccard threshold — but c(1→2) = 1.0
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "intro words here alpha beta gamma delta epsilon and a long closing tail follows"),
      (3L, "totally unrelated content with nothing shared at all")
    ).toDF("doc_id", "text")
    val jac = Dedup.ngramJaccard(df, "text", "doc_id", 3, 0.8).collect()
    assert(jac.isEmpty, s"Jaccard at 0.8 must miss the quote: ${jac.mkString(";")}")
    val got = Dedup.ngramContainment(df, "text", "doc_id", 3, 0.9).collect()
    assert(got.length == 1, s"${got.mkString(";")}")
    val r = got(0)
    assert(r.getLong(0) == 1 && r.getLong(1) == 2 && r.getLong(2) == 3)
    assert(r.getDouble(3) == 1.0, s"c(1->2) = ${r.getDouble(3)}") // a fully inside b
    assert(r.getDouble(4) == 0.25, s"c(2->1) = ${r.getDouble(4)}")
    // direction carries the asymmetry: the short doc is the contained one
    assert(r.getDouble(3) > r.getDouble(4))
    // mutual containment = the classic near-dup case still surfaces
    val twins = Seq(
      (1L, "one two three four five six"),
      (2L, "one two three four five six")
    ).toDF("doc_id", "text")
    val tw = Dedup.ngramContainment(twins, "text", "doc_id", 3, 0.9).collect()
    assert(tw.length == 1 && tw(0).getDouble(3) == 1.0 && tw(0).getDouble(4) == 1.0)
  }

  test("simhash pairs cover the planted near-duplicates") {
    val planted = Dedup.ngramJaccard(docs, "text", "doc_id", 3, 0.95)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = Dedup.simhashPairs(docs, "text", "doc_id", 10)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // SimHash proximity is probabilistic, not a theorem: on these fixtures
    // the planted jaccard>=0.95 pairs reach Hamming 9 (sf0.001: pair
    // (45,487) sits at 8), so the operator's radius must be >= that.
    // maxDist 10 covers the planted set with margin at both SFs.
    assert(planted.subsetOf(sim), s"simhash missed near-identical pairs: ${planted -- sim}")
  }

  test("simhash certificate: deterministic sample commutes with the pair machinery") {
    val s = spark
    import s.implicits._
    // d21's soundness rests on two facts: (1) the integer threshold
    // saturates at n <= target, so small corpora certify WHOLE; (2)
    // running the pair machinery on the sample equals the full pair
    // set restricted to sampled ids (the certificate checks the same
    // pairs the full run would report for those docs — sampling and
    // pairing commute because fingerprints are per-doc).
    assert(math.min(4294967296L, 400L * 4294967296L / 300L) == 4294967296L)
    assert(math.min(4294967296L, 400L * 4294967296L / 1000L) == 1717986918L)
    val thr = math.min(4294967296L, 400L * 4294967296L / docs.count())
    val samp = docs.filter(graft.text.TextAnalysis.sampleHash(col("doc_id"), "cert") < lit(thr))
    val ids = samp.select("doc_id").collect().map(_.getLong(0)).toSet
    val sampled = Dedup.simhashPairs(samp, "text", "doc_id", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Dedup.simhashPairs(docs, "text", "doc_id", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      .filter(p => ids(p._1) && ids(p._2))
    assert(sampled == full,
      s"sample-run pairs diverge: missing=${full -- sampled} extra=${sampled -- full}")
  }

  test("simhash chunk-pair candidates are lossless within the radius and far sparser than single-chunk buckets") {
    val s = spark
    import s.implicits._
    // skewed fixture: boilerplate-heavy docs (shared template, small
    // variations) — the regime where fingerprints cluster and coarse
    // buckets flood with candidates
    val base = "the quick brown fox jumps over the lazy dog while rain falls on the plain and"
    val fixture = (0 until 200).map { i =>
      (i.toLong, s"$base variant$i token${i % 7} extra${i % 3} tail${i % 13} run${i % 29}")
    }.toDF("doc_id", "text")
    val maxDist = 10
    // ground truth: exact all-pairs Hamming over the fingerprints
    val fps = Dedup.simhash(fixture, "text", "doc_id")
    val local = fps.collect().map(r => (r.getLong(0), r.getLong(1)))
    val truth = (for {
      (a, fa) <- local; (b, fb) <- local if a < b
      if java.lang.Long.bitCount(fa ^ fb) <= maxDist
    } yield (a, b)).toSet
    val got = Dedup.simhashPairs(fixture, "text", "doc_id", maxDist)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == truth, s"missed=${truth -- got} extra=${got -- truth}")
    // candidate volume on a DIVERSE corpus (no true near-dups — the
    // regime that dominates at 100 TB): unrelated docs collide in
    // ~5.8-bit single-chunk buckets linearly with corpus size, while
    // ~11-bit pair keys keep occupancy flat — the pair-key generator
    // must produce far fewer spurious candidate rows
    val diverse = (0 until 400).map { i =>
      (i.toLong, (0 until 30).map(j => s"w${i}_$j").mkString(" "))
    }.toDF("doc_id", "text")
    val dfps = Dedup.simhash(diverse, "text", "doc_id")
    val pairCand = Dedup.simhashCandidates(dfps, maxDist).count()
    val nC = maxDist + 1
    val singleChunks = dfps.select(col("id"), explode(array((0 until nC).map { c =>
      val start = c * 64 / nC
      val len = (c + 1) * 64 / nC - start
      val mask = if (len == 64) -1L else (1L << len) - 1L
      struct(lit(c).as("c"),
        shiftrightunsigned(col("simhash"), start).bitwiseAND(lit(mask)).as("ck"))
    }: _*)).as("ch")).select(col("id"), col("ch.c").as("c"), col("ch.ck").as("ck"))
    val singleCand = singleChunks.as("x").join(singleChunks.as("y"),
      col("x.c") === col("y.c") && col("x.ck") === col("y.ck") && col("x.id") < col("y.id")).count()
    assert(pairCand < singleCand,
      s"pair-key candidates ($pairCand) should undercut single-chunk ($singleCand)")
  }

  test("simhash fingerprint is insensitive to word order, sensitive to content") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "delta gamma beta alpha"), // permutation -> same bag of words
      (3L, "epsilon zeta eta theta iota kappa")
    ).toDF("doc_id", "text")
    val fp = Dedup.simhash(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
  }

  test("hot-list refresh caps boilerplate introduced by absorbed batches; refreshed index ≡ rebuild") {
    val s = spark
    import s.implicits._
    // build-time corpus: diverse docs, nothing hot at maxDf=3
    val corpus = (0L until 6L).map(i => (i, s"c${i}a c${i}b c${i}c c${i}d c${i}e")).toDF("doc_id", "text")
    val table = "shingle_idx_hotdrift"
    Dedup.buildShingleIndex(corpus, "text", "doc_id", 3, table, buckets = 4, maxDf = 3)
    assert(s.table(s"${table}_hot").isEmpty)
    // absorbed batches share a boilerplate phrase — its shingles cross
    // maxDf only across the absorbed stream, so the as-of-build hot
    // list never caps them
    val batches = (10L until 16L).map(i => (i, s"spam ham eggs x$i y$i")).toDF("doc_id", "text")
    (10L until 16L).foreach { i =>
      Dedup.absorbIntoShingleIndex(s, batches.filter(col("doc_id") === i), "text", "doc_id", 3, table)
    }
    val hotShingle = "spam ham eggs" // df = 6 > maxDf = 3 across the absorbed stream
    assert(s.table(table).filter(col("s") === hotShingle).count() == 6,
      "pre-refresh: the drifted boilerplate sits uncapped in the index")
    // threshold not reached -> no refresh; reached -> refresh runs
    assert(!Dedup.maybeRefreshHotList(s, table, maxDf = 3, refreshRows = 1000000L))
    assert(Dedup.maybeRefreshHotList(s, table, maxDf = 3, refreshRows = 1L))
    assert(s.table(table).filter(col("s") === hotShingle).count() == 0)
    assert(s.table(s"${table}_hot").filter(col("s") === hotShingle).count() == 1)
    // the refreshed artifacts equal a from-scratch rebuild at the same cap
    val rebuilt = "shingle_idx_hotdrift_rebuilt"
    Dedup.buildShingleIndex(corpus.unionByName(batches), "text", "doc_id", 3, rebuilt,
      buckets = 4, maxDf = 3)
    def rows(t: String) = s.table(t)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("s"))).toSet
    def sizes(t: String) = s.table(s"${t}_sizes")
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("sz"))).toSet
    def hot(t: String) = s.table(s"${t}_hot").collect().map(_.getString(0)).toSet
    assert(rows(table) == rows(rebuilt))
    assert(sizes(table) == sizes(rebuilt))
    assert(hot(table) == hot(rebuilt))
    // and a later delta sees identical scores through either index
    val next = Seq((20L, "spam ham eggs x10 y10")).toDF("doc_id", "text")
    def delta(t: String) = Dedup.ngramJaccardDelta(s, next, "text", "doc_id", 3, 0.1, t, maxDf = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(delta(table) == delta(rebuilt))
    // the ledger reset: another immediate refresh is a no-op
    assert(!Dedup.maybeRefreshHotList(s, table, maxDf = 3, refreshRows = 1L))
  }

  test("keepCanonical keeps one doc per cluster plus all unpaired docs") {
    val s = spark
    import s.implicits._
    val allDocs = Seq(1L, 2L, 3L, 7L, 9L, 100L).toDF("doc_id").withColumn("payload", col("doc_id") * 10)
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("a", "b")
    val kept = Dedup.keepCanonical(allDocs, "doc_id", pairs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 7L, 100L)) // cluster canonicals + untouched doc
  }

  test("keepBest keeps the highest-scoring member per cluster; ties break on id") {
    val s = spark
    import s.implicits._
    // clusters {1,2,3} and {7,9}; 2 scores best in the first; 7/9 tie
    val assign = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L), (9L, 7L))
      .toDF("id", "cluster_id")
    val scores = Seq((1L, 0.3), (2L, 0.9), (3L, 0.9 - 1e-9), (7L, 0.5), (9L, 0.5))
      .toDF("doc_id", "quality")
    val got = Dedup.keepBest(assign, scores, "doc_id", "quality")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(got == Set((1L, 2L, 0.9, 3L), (7L, 7L, 0.5, 2L)),
      s"best-member selection wrong: $got")
  }

  test("clusters honors graft.checkpointDir (reliable checkpoints for cluster runs)") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_").toString
    spark.conf.set(graft.core.Checkpoints.ConfKey, dir)
    try {
      val pairs = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
      val got = Dedup.clusters(pairs).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
      // the reliable-checkpoint artifacts actually landed on the path
      assert(java.nio.file.Files.list(java.nio.file.Paths.get(dir)).count() > 0)
    } finally spark.conf.unset(graft.core.Checkpoints.ConfKey)
  }

  test("clusters assigns min-reachable id across chained pairs") {
    val s = spark
    import s.implicits._
    // components: {1,2,3} chained, {7,9}, singleton edges only
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("a", "b")
    val got = Dedup.clusters(pairs).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  test("incremental dedup delta = full recompute restricted to new-batch pairs") {
    val table = "shingle_idx_delta_spec"
    val corpus = docs.filter(col("doc_id") < 350)
    val batch = docs.filter(col("doc_id") >= 350)
    Dedup.buildShingleIndex(corpus, "text", "doc_id", 3, table, buckets = 8)
    val delta = Dedup.ngramJaccardDelta(spark, batch, "text", "doc_id", 3, 0.8, table)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Dedup.ngramJaccard(docs, "text", "doc_id", 3, 0.8, maxDf = Int.MaxValue)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => a >= 350 || b >= 350 }.toSet
    assert(delta == full, s"missed=${full -- delta} extra=${delta -- full}")
    assert(delta.nonEmpty, "fixture should have near-dups touching the batch")
  }

  test("dedup delta never rescans the standing index: sizes come from the companion table") {
    val table = "shingle_idx_delta_plan_spec"
    Dedup.buildShingleIndex(docs.filter(col("doc_id") < 350), "text", "doc_id", 3, table, buckets = 8)
    val plan = planOf(Dedup.ngramJaccardDelta(
      spark, docs.filter(col("doc_id") >= 350), "text", "doc_id", 3, 0.8, table))
    def scans(t: String) = plan.sliding(s"Scan parquet spark_catalog.default.$t\n".length)
      .count(_ == s"Scan parquet spark_catalog.default.$t\n")
    // the ONLY index read is the bucket-riding pair join; per-doc sizes
    // ride the build-time companion — no per-batch full-index aggregate
    assert(scans(table) == 1, s"index scanned ${scans(table)}× (pairs leg only expected):\n$plan")
    // (the metadata-sized companion is read once per size-join leg)
    assert(scans(s"${table}_sizes") >= 1, s"corpus sizes must come from the companion table:\n$plan")
  }

  test("dedup delta re-ingest: a batch id already in the index is superseded, not doubled") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (1L, "aa bb cc dd ee ff"),
      (2L, "xx yy zz ww vv uu tt"), // old version of doc 2 — 5 shingles, unrelated content
      (3L, "mm nn oo pp qq rr")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (2L, "aa bb cc dd ee gg"), // re-ingest: new version is a near-dup of doc 1
      (10L, "mm nn oo pp qq ss")
    ).toDF("doc_id", "text")
    val table = "shingle_idx_reingest_spec"
    Dedup.buildShingleIndex(corpus, "text", "doc_id", 3, table, buckets = 4)
    val got = Dedup.ngramJaccardDelta(spark, batch, "text", "doc_id", 3, 0.5, table)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // the batch version wins everywhere: pair (1,2) scores with the NEW
    // doc-2 size (4 shingles, jac 3/5) — a duplicated size row from the
    // standing version (5 shingles) would emit a second (1,2) at 0.5
    assert(got == Set((1L, 2L, 0.6), (3L, 10L, 0.6)), got.toString)
  }

  test("dedup delta applies the persisted corpus stop list and a batch-local df cap") {
    val s = spark
    import s.implicits._
    // corpus: 30 docs sharing one boilerplate opener (df=30 > maxDf=10)
    val corpus = (1 to 30).map(i =>
      (i.toLong, s"terms of service apply unique$i word$i token$i")).toDF("doc_id", "text")
    val table = "shingle_idx_cap_spec"
    Dedup.buildShingleIndex(corpus, "text", "doc_id", 3, table, buckets = 4, maxDf = 10)
    // batch: 25 docs with their own boilerplate (batch-local df=25 > 10)
    // + one true near-dup pair (101, 102)
    val batch = ((101 to 125).map { i =>
      val body = if (i <= 102) "alpha beta gamma delta epsilon zeta"
      else s"only$i this$i doc$i has$i these$i words$i"
      (i.toLong, s"all rights reserved $body")
    }).toDF("doc_id", "text")
    val got = Dedup.ngramJaccardDelta(spark, batch, "text", "doc_id", 3, 0.3, table, maxDf = 10)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // both boilerplate phrases are capped out (corpus one via the
    // persisted stop list, batch one via the batch-local cap), so only
    // the genuine near-dup pair survives
    assert(got == Set((101L, 102L)), got.toString)
  }

  test("containment delta = one-shot recompute on batch-touching pairs; never rescans the standing index") {
    val table = "shingle_idx_cont_delta_spec"
    val corpus = docs.filter(col("doc_id") < 350)
    val batch = docs.filter(col("doc_id") >= 350)
    Dedup.buildShingleIndex(corpus, "text", "doc_id", 3, table, buckets = 8)
    val delta = Dedup.containmentDelta(spark, batch, "text", "doc_id", 3, 0.9, table)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toSet
    val full = Dedup.ngramContainment(docs, "text", "doc_id", 3, 0.9, maxDf = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .filter { case (a, b, _, _, _) => a >= 350 || b >= 350 }.toSet
    assert(delta == full, s"missed=${full -- delta} extra=${delta -- full}")
    assert(delta.nonEmpty, "fixture should have containment pairs touching the batch")
    // deployment shape (the d8 plan pin): the ONLY standing-index read
    // is the bucket-riding pair join; |S| denominators come from the
    // `_sizes` companion, never a per-batch full-index aggregate
    val plan = planOf(Dedup.containmentDelta(spark, batch, "text", "doc_id", 3, 0.9, table))
    def scans(t: String) = plan.sliding(s"Scan parquet spark_catalog.default.$t\n".length)
      .count(_ == s"Scan parquet spark_catalog.default.$t\n")
    assert(scans(table) == 1, s"index scanned ${scans(table)}× (pairs leg only expected):\n$plan")
    assert(scans(s"${table}_sizes") >= 1, s"corpus sizes must come from the companion table:\n$plan")
  }

  test("containment delta: asymmetric directions; absorb chains batches; re-emitted ids supersede") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (1L, "aa bb cc dd ee ff gg hh ii jj kk ll mm nn oo pp"), // 14 shingles
      (2L, "zz yy xx ww vv uu ts sr rq qp")                    // unrelated
    ).toDF("doc_id", "text")
    val table = "shingle_idx_cont_absorb_spec"
    Dedup.buildShingleIndex(corpus, "text", "doc_id", 3, table, buckets = 4)
    // batch 1: a 4-word excerpt of doc 1 — c(10→1) = 1.0 while
    // jac = 2/14 is invisible to any resemblance screen; the delta
    // must carry the DIRECTION (the short new doc is the contained one)
    val batch1 = Seq((10L, "cc dd ee ff")).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3), r.getDouble(4))).toSet
    assert(rows(Dedup.containmentDelta(s, batch1, "text", "doc_id", 3, 0.9, table)) ==
      Set((1L, 10L, 0.143, 1.0)))
    // absorb batch 1: batch 2 (a copy of doc 10) must pair against it
    // through the index ALONE, alongside the standing corpus pair
    Dedup.absorbIntoShingleIndex(s, batch1, "text", "doc_id", 3, table)
    val batch2 = Seq((20L, "cc dd ee ff")).toDF("doc_id", "text")
    assert(rows(Dedup.containmentDelta(s, batch2, "text", "doc_id", 3, 0.9, table)) ==
      Set((1L, 20L, 0.143, 1.0), (10L, 20L, 1.0, 1.0)))
    Dedup.absorbIntoShingleIndex(s, batch2, "text", "doc_id", 3, table)
    // supersede: doc 10 re-emits as a LONGER excerpt (3 shingles) — its
    // standing rows and size leave the join, so (1,10) re-scores at
    // 3/14 and (10,20) at 2-of-3; stale doc-10 rows would inflate both
    val reemit = Seq((10L, "cc dd ee ff gg")).toDF("doc_id", "text")
    assert(rows(Dedup.containmentDelta(s, reemit, "text", "doc_id", 3, 0.9, table)) ==
      Set((1L, 10L, 0.214, 1.0), (10L, 20L, 0.667, 1.0)))
    // the indexed one-shot over the standing corpus matches the
    // recompute — containmentIndexed is the verifier-grade read
    val allDocs = corpus.unionByName(batch1).unionByName(batch2)
    assert(rows(Dedup.containmentIndexed(s, table, 0.9)) ==
      rows(Dedup.ngramContainment(allDocs, "text", "doc_id", 3, 0.9)))
  }

  test("contamination: exact copy scores 1.0, disjoint scores 0.0, partial in between") {
    val s = spark
    import s.implicits._
    val train = Seq(
      (1L, "aa bb cc dd ee"),
      (2L, "ff gg hh ii jj")
    ).toDF("doc_id", "text")
    val eval_ = Seq(
      (10L, "aa bb cc dd ee"),  // verbatim leak: all 3 trigrams in train
      (11L, "aa bb cc zz yy"),  // 1 of 3 trigrams in train
      (12L, "mm nn oo pp qq")   // clean
    ).toDF("doc_id", "text")
    val got = Dedup.contamination(train, eval_, "text", "doc_id", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == Set((10L, 3L, 3L, 1.0), (11L, 3L, 1L, 0.333), (12L, 3L, 0L, 0.0)), got.toString)
    // indexed variant rides the standing shingle index — same numbers
    val table = "shingle_idx_contam_spec"
    Dedup.buildShingleIndex(train, "text", "doc_id", 3, table, buckets = 4)
    val idx = Dedup.contaminationIndexed(spark, table, eval_, "text", "doc_id", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(idx == got)
    // 100 TB shape: the training index is scanned ONCE, map-only, into a
    // broadcast semi-join against the (tiny) eval shingle set — never
    // shuffled, never the build side of a hash join
    val plan = planOf(Dedup.contaminationIndexed(spark, table, eval_, "text", "doc_id", 3))
    def scans(t: String) = plan.sliding(s"Scan parquet spark_catalog.default.$t\n".length)
      .count(_ == s"Scan parquet spark_catalog.default.$t\n")
    assert(scans(table) == 1, s"train index scanned ${scans(table)}×:\n$plan")
    assert(plan.contains("BroadcastHashJoin LeftSemi"), plan)
    assert(!plan.contains("hashpartitioning(s#") || !plan.contains("SortMergeJoin"), plan)
  }

  test("re-ingest = compact + absorb: the index equals a from-scratch rebuild") {
    val s = spark
    import s.implicits._
    val v1 = Seq((1L, "aa bb cc dd ee"), (2L, "ff gg hh ii jj"), (3L, "kk ll mm nn oo")).toDF("doc_id", "text")
    val doc2v2 = Seq((2L, "pp qq rr ss tt")).toDF("doc_id", "text")
    val table = "shingle_idx_compact_spec"
    Dedup.buildShingleIndex(v1, "text", "doc_id", 3, table, buckets = 4)
    // supersede doc 2's standing rows, then absorb its new version
    Dedup.compactShingleIndex(spark, table, Seq(2L).toDF("id"))
    Dedup.absorbIntoShingleIndex(spark, doc2v2, "text", "doc_id", 3, table)
    val rebuilt = "shingle_idx_compact_rebuilt"
    Dedup.buildShingleIndex(
      v1.filter(col("doc_id") =!= 2L).unionByName(doc2v2), "text", "doc_id", 3, rebuilt, buckets = 4)
    def rows(t: String) = s.table(t)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("s"))).toSet
    def sizes(t: String) = s.table(s"${t}_sizes")
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("sz"))).toSet
    assert(rows(table) == rows(rebuilt))
    assert(sizes(table) == sizes(rebuilt))
    // and the compacted index still answers queries with its bucket spec
    val delta = Dedup.ngramJaccardDelta(spark,
        Seq((20L, "pp qq rr ss uu")).toDF("doc_id", "text"), "text", "doc_id", 3, 0.4, table)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(delta == Set((2L, 20L)), delta.toString) // pairs with the NEW doc-2 content
  }

  test("bucketed shingle index: same pairs, shuffle-free self-join") {
    val table = "shingle_idx_spec"
    Dedup.buildShingleIndex(docs, "text", "doc_id", 3, table, buckets = 8)
    val indexed = Dedup.ngramJaccardIndexed(spark, table, 0.8)
    val direct = Dedup.ngramJaccard(docs, "text", "doc_id", 3, 0.8)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = indexed.select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == direct)
    // the at-scale condition: the index is too big to broadcast — the
    // s=s self-join must then ride the buckets (sort-merge, NO Exchange
    // partitioned by the shingle column)
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = planOf(Dedup.ngramJaccardIndexed(spark, table, 0.8))
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("hashpartitioning(s#"), plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }

  test("hot-shingle df cap kills boilerplate-driven quadratic pairing, keeps real dups") {
    val s = spark
    import s.implicits._
    // 60 docs all opening with the same boilerplate phrase (one shared
    // 3-gram, df=60) + unique filler; docs 1 and 2 are true near-dups
    val docs = (1 to 60).map { i =>
      val filler = if (i == 2) "alpha beta gamma delta epsilon zeta" // clone of doc 1
      else s"unique$i word$i token$i item$i thing$i part$i"
      val body = if (i == 1) "alpha beta gamma delta epsilon zeta" else filler
      (i.toLong, s"terms of service apply $body")
    }.toDF("doc_id", "text")
    val uncapped = Dedup.ngramJaccard(docs, "text", "doc_id", 3, 0.01, maxDf = Int.MaxValue)
    val capped = Dedup.ngramJaccard(docs, "text", "doc_id", 3, 0.01, maxDf = 10)
    // without the cap the shared boilerplate pairs ~every doc with every other
    assert(uncapped.count() > 1000, s"skew fixture should pair up quadratically, got ${uncapped.count()}")
    val cappedPairs = capped.select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cappedPairs == Set((1L, 2L)), s"cap should keep only the true near-dup pair: $cappedPairs")
  }

  test("ngram jaccard join never plans a cartesian product") {
    val plan = planOf(Dedup.ngramJaccard(docs, "text", "doc_id", 3, 0.8))
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("embedding near-dup LSH default path = exact path on planted near-dups, no all-pairs join") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet").select("vec_id", "embedding")
    val perturbed = e.select((col("vec_id") + 10000).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        when(i === 0, (x.cast("double") + lit(0.1d)).cast("float")).otherwise(x)).as("embedding"))
    val u = e.unionByName(perturbed).cache()
    val lsh = Dedup.embeddingNearDup(u, "embedding", "vec_id", 0.9, dims = 64)
    val exact = Dedup.embeddingNearDupExact(u, "embedding", "vec_id", 0.9)
    val gotLsh = lsh.select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val gotExact = exact.select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotExact.size >= 500, "fixture construction should plant 500 near-dup pairs")
    assert(gotLsh == gotExact,
      s"LSH candidates must have recall 1 here; missed=${gotExact -- gotLsh} extra=${gotLsh -- gotExact}")
    // the scale condition: the shipped default must pair bucket-mates
    // only — never an all-pairs BroadcastNestedLoopJoin over the corpus
    val plan = planOf(lsh)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    u.unpersist()
  }

  test("blocked similarity join = broadcast exact kernel, without broadcasting the corpus") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").cache()
    val blocked = Dedup.embeddingSimJoin(emb, "embedding", "vec_id", 0.3, blocks = 5)
    val gotBlocked = blocked.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val gotExact = Dedup.embeddingNearDupExact(emb, "embedding", "vec_id", 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotBlocked == gotExact,
      s"missed=${gotExact -- gotBlocked} extra=${gotBlocked -- gotExact}")
    assert(gotBlocked.nonEmpty)
    val plan = planOf(blocked)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("exact embedding near-dup kernel agrees with a driver-side exact computation") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(80).cache()
    val got = Dedup.embeddingNearDupExact(emb, "embedding", "vec_id", 0.3)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val local = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    val expect = (for {
      (ia, va) <- local; (ib, vb) <- local if ia < ib
      dot = va.zip(vb).map { case (x, y) => x * y }.sum
      na = math.sqrt(va.map(x => x * x).sum); nb = math.sqrt(vb.map(x => x * x).sum)
      if dot / (na * nb) >= 0.3
    } yield (ia, ib)).toSet
    assert(got == expect)
  }

  test("boilerplate: shared spans counted per doc, unique content scores zero") {
    import spark.implicits._
    // "x y z" lives in 3 docs (boilerplate at minDocs=3); everything
    // else is unique to its doc
    val docs = Seq(
      (1L, "x y z a b c"),  // 4 trigrams, 1 boiler
      (2L, "x y z d e f"),
      (3L, "p x y z q r"),
      (4L, "u v w m n o")   // nothing shared
    ).toDF("doc_id", "text")
    val out = Dedup.boilerplate(docs, "text", "doc_id", 3, 3)
      .orderBy("id").collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(1L, 1L, 1L, 0L), out.mkString(","))
    assert(out(0).getLong(1) == 4 && out(0).getDouble(3) == 0.25)
    assert(out(3).getDouble(3) == 0.0)
  }

  test("substring dedup: planted spans found, maximal merge, scrub excises exactly them") {
    import spark.implicits._
    // shared span S = 6 tokens; k = 4, so S contributes 3 overlapping
    // duplicated 4-grams per occurrence that must merge to ONE maximal
    // span of length 6
    val S = "aa bb cc dd ee ff"
    val docs = Seq(
      (1L, s"one two three $S four five six seven"), // S at tokens 3..8
      (2L, s"$S eight nine ten eleven twelve"),      // S at tokens 0..5
      (3L, "unique words only nothing shared here at all ok"),
      (4L, s"start $S middle gap gap gap gap $S end") // intra-doc repeat: 1..6 and 12..17
    ).toDF("doc_id", "text")
    val spans = Dedup.substringSpans(docs, "text", "doc_id", 4)
    val got = spans.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 3L, 6L), (2L, 0L, 6L), (4L, 1L, 6L), (4L, 12L, 6L)),
      s"got $got")
    // scrub: every span occurrence leaves; untouched docs pass through
    val scrubbed = Dedup.scrubSpans(docs, spans, "text", "doc_id")
      .orderBy("id").collect()
    assert(scrubbed.map(r => (r.getLong(1), r.getLong(2))).toSeq ==
      Seq((13L, 7L), (11L, 5L), (9L, 9L), (19L, 7L)))
    assert(scrubbed(0).getString(3) == "one two three four five six seven")
    assert(scrubbed(2).getString(3) == "unique words only nothing shared here at all ok")
    assert(scrubbed(3).getString(3) == "start middle gap gap gap gap end")
  }

  test("substring dedup: adjacent duplicated windows chain into one span, distinct spans stay apart") {
    import spark.implicits._
    // 8 duplicated tokens = two exactly-adjacent 4-gram windows (pos 0
    // and pos 4 both duplicated, gap 4 = k → one island of length 8);
    // doc 3 shares a DIFFERENT 4-token run far away from it
    val long = "a1 a2 a3 a4 a5 a6 a7 a8"
    val docs = Seq(
      (1L, s"$long x1 x2 x3 b1 b2 b3 b4"),
      (2L, s"y1 $long y2 y3"),
      (3L, s"z1 z2 z3 z4 z5 z6 z7 z8 z9 b1 b2 b3 b4")
    ).toDF("doc_id", "text")
    val got = Dedup.substringSpans(docs, "text", "doc_id", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 0L, 8L), (1L, 11L, 4L), (2L, 1L, 8L), (3L, 9L, 4L)),
      s"got $got")
  }

  test("span decontamination: one eval occurrence marks, train-internal repeats don't, scrub composes") {
    import spark.implicits._
    val S = "aa bb cc dd ee ff" // 6 tokens, k=4 → one maximal span
    val train = Seq(
      (1L, s"one two three $S four five"),      // S at 3..8 — leaked into eval
      (2L, "t1 t2 t3 t4 mid t1 t2 t3 t4 end"),  // train-INTERNAL repeat: not contamination
      (3L, "clean words only nothing shared")
    ).toDF("doc_id", "text")
    val eval_ = Seq(
      (100L, s"eval holds $S exactly once"),
      (101L, "other eval text entirely fresh")
    ).toDF("doc_id", "text")
    val spans = Dedup.decontaminateSpans(train, eval_, "text", "doc_id", 4)
    val got = spans.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // doc 1's S marked (single eval occurrence suffices); doc 2's
    // internal repeat is NOT eval overlap; doc 3 clean
    assert(got == Set((1L, 3L, 6L)), s"got $got")
    // scrub composition: the leaked span leaves, everything else stays
    val scrubbed = Dedup.scrubSpans(train, spans, "text", "doc_id")
      .orderBy("id").collect()
    assert(scrubbed(0).getString(3) == "one two three four five")
    assert(scrubbed(1).getLong(2) == scrubbed(1).getLong(1), "untouched doc must keep all tokens")
  }

  test("bloom decontamination: result-identical to the exact path, probe stays map-side codegen") {
    import spark.implicits._
    // the sf0.001 documents table: a real corpus slice with genuine
    // shared grams, so both the prefilter hit and miss paths are live
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val train = docs.filter(col("doc_id") < 400)
    val eval_ = docs.filter(col("doc_id") >= 400)
    val exact = Dedup.decontaminateSpans(train, eval_, "text", "doc_id", 15)
    val bloom = Dedup.bloomDecontaminateSpans(train, eval_, "text", "doc_id", 15, fpp = 0.01)
    assert(exact.exceptAll(bloom).isEmpty && bloom.exceptAll(exact).isEmpty,
      "bloom path must be result-identical to the exact path")
    assert(bloom.count() > 0, "fixture must exercise real overlap")
    // an absurdly tight sketch (high fpp) still cannot lose a span:
    // false positives are killed by the exact join, false negatives
    // cannot exist at any fpp
    val sloppy = Dedup.bloomDecontaminateSpans(train, eval_, "text", "doc_id", 15, fpp = 0.5)
    assert(exact.exceptAll(sloppy).isEmpty && sloppy.exceptAll(exact).isEmpty,
      "fpp changes cost, never results")
    // plan shape: the sketch probe is a map-side Filter BELOW the exact
    // semi-join (an AQE formatted plan hides codegen spans pre-exec, so
    // assert structure: the Filter node index is deeper than the join's)
    val plan = planOf(bloom)
    assert(plan.contains("bloom_might_contain_eval_grams"),
      s"probe expression missing from plan:\n$plan")
    val probeSection = plan.linesIterator
      .find(l => l.contains("Condition") && l.contains("bloom_might_contain")).getOrElse("")
    assert(probeSection.nonEmpty, s"probe must be a Filter condition:\n$plan")
    val tree = plan.linesIterator.takeWhile(!_.trim.startsWith("(1)")).toSeq
    val joinDepth = tree.indexWhere(_.contains("Join LeftSemi"))
    val filterBelowJoin = tree.drop(joinDepth + 1).exists(_.contains("Filter"))
    assert(joinDepth > 0 && filterBelowJoin,
      s"probe Filter must sit below (before) the exact semi-join:\n${tree.mkString("\n")}")
  }

  test("simhash delta: batch pairs vs standing index = full recompute; absorb chains; supersede; compact+absorb = rebuild") {
    import spark.implicits._
    // near-dups differ in one token of thirty — Hamming well inside 10;
    // unrelated texts use disjoint vocabularies — far outside
    def textA(v: String) = s"alpha bravo charlie delta echo foxtrot golf hotel india juliet " +
      s"kilo lima mike november oscar papa quebec romeo sierra tango $v " +
      "uniform victor whiskey xray yankee zulu one two three"
    def textB(v: String) = s"apple banana cherry date elder fig grape honey iris jasmine " +
      s"kiwi lemon mango nutmeg olive peach quince rose sage thyme $v " +
      "umber violet walnut xenia yarrow zest red green blue"
    val corpus = Seq(
      (1L, textA("v1")),
      (2L, "completely different standalone words nobody else shares " +
        "entirely disjoint vocabulary tokens forever unmatched")
    ).toDF("doc_id", "text")
    val table = "simhash_idx_spec"
    Dedup.buildSimhashIndex(corpus, "text", "doc_id", 10, table, buckets = 4)

    // doc 10 ≈ corpus doc 1 (cross), docs 11/12 ≈ each other
    // (batch-internal), doc 13 unrelated to everything
    val batch1 = Seq(
      (10L, textA("v2")), (11L, textB("w1")), (12L, textB("w2")),
      (13L, "orthogonal nonsense phrases carrying zero shared signal " +
        "whatsoever qqq www eee rrr ttt yyy uuu")
    ).toDF("doc_id", "text")
    def pairsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val d1 = pairsOf(Dedup.simhashPairsDelta(spark, batch1, "text", "doc_id", 10, table))
    assert(d1.contains((1L, 10L)) && d1.contains((11L, 12L)), s"got $d1")
    // identity: full recompute over corpus ∪ batch, pairs touching batch
    val full = pairsOf(Dedup.simhashPairs(corpus.unionByName(batch1), "text", "doc_id", 10)
      .filter(col("a") >= 10L || col("b") >= 10L))
    assert(d1 == full, s"delta $d1 != recompute $full")

    // absorb; batch 2 pairs against batch 1 through the index alone
    Dedup.absorbIntoSimhashIndex(spark, batch1, "text", "doc_id", 10, table)
    val d2 = pairsOf(Dedup.simhashPairsDelta(spark,
      Seq((20L, textB("w3"))).toDF("doc_id", "text"), "text", "doc_id", 10, table))
    assert(d2 == Set((11L, 20L), (12L, 20L)), s"got $d2")

    // supersede: doc 2 re-emits as a near-dup of textA — its OLD
    // standing rows leave the probe, the new version pairs with 1 & 10
    val reemit = Seq((2L, textA("v3"))).toDF("doc_id", "text")
    val d3 = pairsOf(Dedup.simhashPairsDelta(spark, reemit, "text", "doc_id", 10, table))
    assert(d3 == Set((1L, 2L), (2L, 10L)), s"got $d3")
    // compact-then-absorb ≡ rebuild with the new version
    Dedup.compactSimhashIndex(spark, table, Seq(2L).toDF("id"))
    Dedup.absorbIntoSimhashIndex(spark, reemit, "text", "doc_id", 10, table)
    val rebuilt = "simhash_idx_spec_rebuild"
    Dedup.buildSimhashIndex(
      corpus.filter(col("doc_id") =!= 2L).unionByName(batch1).unionByName(reemit),
      "text", "doc_id", 10, rebuilt, buckets = 4)
    val probe = Seq((30L, textA("v4"))).toDF("doc_id", "text")
    def vs(t: String) =
      pairsOf(Dedup.simhashPairsDelta(spark, probe, "text", "doc_id", 10, t))
    assert(vs(table) == vs(rebuilt), s"absorbed ${vs(table)} != rebuilt ${vs(rebuilt)}")
  }

  test("substring delta: batch spans vs standing index = full recompute; absorb chains batches; supersede drops re-emitted rows") {
    import spark.implicits._
    val S = "aa bb cc dd ee ff"   // 6 tokens, k=4 → one maximal span
    val corpus = Seq(
      (1L, s"one two three $S four five six"),   // S at 3..8
      (2L, "plain standing words nothing shared whatsoever here"),
      (3L, "r1 r2 r3 r4 r5 r6 r7")               // re-emitted below
    ).toDF("doc_id", "text")
    val table = "gram_idx_spec"
    Dedup.buildGramIndex(corpus, "text", "doc_id", 4, table, buckets = 4)

    // batch 1: doc 10 shares S with corpus doc 1 (cross); doc 11
    // repeats its own run twice (batch-internal); doc 12 is clean;
    // doc 13 is SHORTER than k (no grams — must stay off the roster)
    val batch1 = Seq(
      (10L, s"zero $S tail words here"),          // S at 1..6
      (11L, "q1 q2 q3 q4 mid mid2 mid3 q1 q2 q3 q4"), // runs at 0 and 7
      (12L, "totally fresh unshared text tokens"),
      (13L, "too short")
    ).toDF("doc_id", "text")
    val d1 = Dedup.substringSpansDelta(spark, batch1, "text", "doc_id", 4, table)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(d1 == Set((10L, 1L, 6L), (11L, 0L, 4L), (11L, 7L, 4L)), s"got $d1")
    // identity: full recompute over corpus ∪ batch, restricted to batch
    val full = Dedup.substringSpans(corpus.unionByName(batch1), "text", "doc_id", 4)
      .filter(col("id") >= 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(full == d1, s"delta $d1 != recompute $full")

    // absorb batch 1; batch 2 must pair against batch 1 through the
    // index alone (doc 20 shares doc 11's run, which corpus never had)
    Dedup.absorbIntoGramIndex(spark, batch1, "text", "doc_id", 4, table)
    // the roster holds ids WITH index rows: the gram-less doc 13 is
    // absent (same derivation as build — absorb ≡ rebuild, and its
    // re-emit must never trigger a pointless full-index compact)
    val roster = spark.table(s"${table}_ids").collect().map(_.getLong(0)).toSet
    assert(!roster.contains(13L) && roster.contains(10L), roster.toString)
    val batch2 = Seq((20L, "pre q1 q2 q3 q4 post fin")).toDF("doc_id", "text")
    val d2 = Dedup.substringSpansDelta(spark, batch2, "text", "doc_id", 4, table)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(d2 == Set((20L, 1L, 4L)), s"got $d2")

    // supersede: doc 3 re-emits carrying S — its STANDING rows leave the
    // count, so S still pairs (vs doc 1) but its old r1..r7 run does
    // not self-pair with the new version
    val reemit = Seq((3L, s"r1 r2 r3 r4 new new2 $S")).toDF("doc_id", "text")
    val d3 = Dedup.substringSpansDelta(spark, reemit, "text", "doc_id", 4, table)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(d3 == Set((3L, 6L, 6L)), s"got $d3")
    // compact-then-absorb ≡ rebuild with the new version
    Dedup.compactGramIndex(spark, table, Seq(3L).toDF("id"))
    Dedup.absorbIntoGramIndex(spark, reemit, "text", "doc_id", 4, table)
    val rebuilt = "gram_idx_spec_rebuild"
    Dedup.buildGramIndex(
      corpus.filter(col("doc_id") =!= 3L).unionByName(batch1).unionByName(reemit),
      "text", "doc_id", 4, rebuilt, buckets = 4)
    val probe = Seq((30L, s"probe $S q1 q2 q3 q4 r1 r2 r3 r4 done")).toDF("doc_id", "text")
    def spansVs(t: String) =
      Dedup.substringSpansDelta(spark, probe, "text", "doc_id", 4, t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(spansVs(table) == spansVs(rebuilt),
      s"absorbed ${spansVs(table)} != rebuilt ${spansVs(rebuilt)}")
  }

  test("leak-proof split: clusters are atomic, singletons self-represent, no pair ever crosses") {
    val s = spark
    import s.implicits._
    val corpus = s.range(20L).select(col("id").as("doc_id"))
    // a 3-chain and a 2-pair; everything else singleton. The chain's
    // members have DIFFERENT per-doc uniforms (a per-doc decision at
    // some fraction would split them) — the per-cluster decision
    // cannot, at ANY fraction
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 9L)).toDF("a", "b")
    for (bp <- Seq(1000, 2000, 5000, 9000)) {
      val out = Dedup.leakProofSplit(corpus, "doc_id", pairs, bp)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      assert(out.length == 20, "split partitions the corpus")
      val byId = out.map(r => r._1 -> r).toMap
      // min-label reps
      assert(Seq(1L, 2L, 3L).forall(byId(_)._2 == 1L))
      assert(Seq(5L, 9L).forall(byId(_)._2 == 5L))
      assert(byId(7L)._2 == 7L, "singletons self-represent")
      // the leak-proof property: every pair lands on one side
      Seq((1L, 2L), (2L, 3L), (5L, 9L), (1L, 3L)).foreach { case (a, b) =>
        assert(byId(a)._3 == byId(b)._3, s"pair ($a,$b) crossed at bp=$bp")
      }
    }
    // the property is not vacuous: at 5000bp the per-doc uniforms of
    // the chain {1,2,3} genuinely disagree (a doc-granular split WOULD
    // leak) while the cluster decision keeps them together
    val thr = 5000L * 4294967296L / 10000L
    val perDoc = corpus.filter(col("doc_id").isin(1L, 2L, 3L))
      .select(graft.text.TextAnalysis.sampleHash(col("doc_id"), "lsplit") < thr)
      .collect().map(_.getBoolean(0)).toSet
    assert(perDoc.size == 2, "fixture must make the per-doc decision disagree")
    // determinism under re-partitioning
    val a = Dedup.leakProofSplit(corpus.repartition(7), "doc_id", pairs, 2000)
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    val b = Dedup.leakProofSplit(corpus, "doc_id", pairs, 2000)
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    assert(a == b)
  }

  test("split drift probe: bridging pairs classify as crossed / same-side / unknown; non-bridges drop") {
    val s = spark
    import s.implicits._
    // standing assignment: cluster {1,2} (rep 1) and {3,4} (rep 3);
    // persisted verdicts: rep 1 → train, rep 3 → holdout, singleton 5 → train
    val assign = Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 3L)).toDF("id", "cluster_id")
    val splits = Seq((1L, "train"), (3L, "holdout"), (5L, "train")).toDF("cluster_id", "split")
    // planted batch pairs: (2,4) BRIDGES train-cluster 1 to holdout-
    // cluster 3 → crossed (re-split due); (2,5) bridges two train-side
    // clusters → same-side growth; (4,9) bridges to a NEW singleton the
    // standing split never saw → unknown side; (1,2) is intra-cluster →
    // not a bridge, must drop
    val pairs = Seq((2L, 4L), (2L, 5L), (4L, 9L), (1L, 2L)).toDF("a", "b")
    val got = Dedup.splitDriftProbe(pairs, assign, splits)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.getString(4)).orNull, Option(r.getString(5)).orNull,
        if (r.isNullAt(6)) null else java.lang.Boolean.valueOf(r.getBoolean(6)))).toSet
    assert(got == Set(
      (2L, 4L, 1L, 3L, "train", "holdout", java.lang.Boolean.TRUE),
      (2L, 5L, 1L, 5L, "train", "train", java.lang.Boolean.FALSE),
      (4L, 9L, 3L, 9L, "holdout", null, null)), s"$got")
    // the monitoring rule: re-split exactly when crossed rows exist
    assert(Dedup.splitDriftProbe(pairs, assign, splits)
      .filter(col("crosses_split_boundary") === true).count() == 1L)
  }

  test("truncateCounted: the leg-pick count rides the checkpoint job — no extra driver action") {
    import spark.implicits._
    def jobsDuring(body: => Unit): Int = {
      val n = new java.util.concurrent.atomic.AtomicInteger(0)
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          n.incrementAndGet(); ()
        }
      }
      spark.sparkContext.addSparkListener(l)
      try {
        // drain pre-registration async events, then zero (the
        // RecipeSpec bounded-actions discipline)
        org.apache.spark.graft.ListenerBridge.drain(spark.sparkContext)
        n.set(0)
        body
        org.apache.spark.graft.ListenerBridge.drain(spark.sparkContext)
        n.get()
      } finally spark.sparkContext.removeSparkListener(l)
    }
    val mk = () => (0L until 257L).map(i => (i, s"w$i a b")).toDF("doc_id", "text")
    // counted pin: same number of Spark jobs as the plain pin, count exact
    var counted: (org.apache.spark.sql.DataFrame, Long) = null
    val jCounted = jobsDuring { counted = graft.core.Checkpoints.truncateCounted(mk()) }
    val jPlain = jobsDuring { graft.core.Checkpoints.truncate(mk()) }
    assert(counted._2 == 257L, s"observed count ${counted._2}")
    assert(counted._1.count() == 257L)
    assert(jCounted == jPlain,
      s"truncateCounted ran $jCounted jobs vs plain truncate's $jPlain — the count must ride the checkpoint job")
    // and simhashPairsDelta (plan construction, pre-action) pays exactly
    // the batch-pin jobs — the leg pick no longer adds an action
    val table = "simhash_onejob_spec"
    Dedup.buildSimhashIndex(mk().limit(3), "text", "doc_id", 10, table, buckets = 4)
    val jDelta = jobsDuring {
      Dedup.simhashPairsDelta(spark, mk().limit(5), "text", "doc_id", 10, table)
    }
    val jPin = jobsDuring {
      graft.core.Checkpoints.truncateCounted(Dedup.simhash(mk().limit(5), "text", "doc_id"))
    }
    assert(jDelta == jPin,
      s"simhashPairsDelta ran $jDelta jobs vs the bare batch pin's $jPin — it must not add driver actions")
  }

  test("clusters: the convergence count rides each round's checkpoint — one action per round") {
    val s = spark
    import s.implicits._
    def jobsDuring(body: => Unit): Int = {
      val n = new java.util.concurrent.atomic.AtomicInteger(0)
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          n.incrementAndGet(); ()
        }
      }
      spark.sparkContext.addSparkListener(l)
      try {
        org.apache.spark.graft.ListenerBridge.drain(spark.sparkContext)
        n.set(0)
        body
        org.apache.spark.graft.ListenerBridge.drain(spark.sparkContext)
        n.get()
      } finally spark.sparkContext.removeSparkListener(l)
    }
    // the pre-r14 shape: pin, then a SEPARATE join-and-count per round
    def clustersTwoAction(pairs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val edges = pairs.select(col("a"), col("b"))
        .unionByName(pairs.select(col("b").as("a"), col("a").as("b")))
        .transform(graft.core.Checkpoints.truncate)
      var labels = edges.select(col("a").as("id")).distinct().withColumn("label", col("id"))
      var changed = 1L
      while (changed > 0) {
        val prop = edges.join(labels, edges("b") === labels("id"))
          .groupBy(edges("a").as("id")).agg(min("label").as("nl"))
        val next = labels.as("l").join(prop.as("p"), Seq("id"), "left")
          .select(col("id"), least(col("label"), coalesce(col("nl"), col("label"))).as("label"))
          .transform(graft.core.Checkpoints.truncate)
        changed = next.as("n").join(labels.as("o"), Seq("id"))
          .filter(col("n.label") =!= col("o.label")).count()
        labels = next
      }
      labels.select(col("id"), col("label").as("cluster_id"))
    }
    // a chain forces several propagation rounds
    val mk = () => Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L)).toDF("a", "b")
    val want = clustersTwoAction(mk()).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Dedup.clusters(mk()).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want && got.filter(_._1 <= 5L).forall(_._2 == 1L) &&
      got.filter(_._1 >= 10L).forall(_._2 == 10L), s"labels: $got")
    val jOld = jobsDuring { clustersTwoAction(mk()) }
    val jNew = jobsDuring { Dedup.clusters(mk()) }
    assert(jNew < jOld,
      s"fused clusters ran $jNew jobs vs the two-action shape's $jOld — the count must ride the pin")
    // and the summed-metric pin itself costs no extra action vs a plain pin
    var summed: (org.apache.spark.sql.DataFrame, Long) = null
    val df = () => (0L until 100L).map(i => (i, i % 3)).toDF("id", "f")
    val jSum = jobsDuring { summed = graft.core.Checkpoints.truncateSummed(df(), "f") }
    val jPlain = jobsDuring { graft.core.Checkpoints.truncate(df()) }
    assert(summed._2 == (0L until 100L).map(_ % 3).sum && jSum == jPlain,
      s"truncateSummed: sum ${summed._2}, $jSum jobs vs plain $jPlain")
    // empty input sums to 0, not NULL
    assert(graft.core.Checkpoints.truncateSummed(df().filter(col("id") < 0L), "f")._2 == 0L)
  }

  test("leakProofSplit: an unrelated `id` column survives, and idCol == `id` works") {
    val s = spark
    import s.implicits._
    val pairs = Seq((1L, 2L)).toDF("a", "b")
    val docs = Seq((1L, 100L, "t"), (2L, 200L, "t"), (3L, 300L, "t"))
      .toDF("doc_id", "id", "text")
    val out = Dedup.leakProofSplit(docs, "doc_id", pairs, 2000)
    assert(out.columns.contains("id"), s"unrelated id column lost: ${out.columns.mkString(",")}")
    assert(out.select("id").collect().map(_.getLong(0)).toSet == Set(100L, 200L, 300L))
    // paired docs still land on one side
    val sides = out.filter(col("doc_id") <= 2L).select("split").collect().map(_.getString(0)).toSet
    assert(sides.size == 1, s"pair split across sides: $sides")
    val out2 = Dedup.leakProofSplit(Seq((1L, "t"), (2L, "t"), (3L, "t")).toDF("id", "text"),
      "id", pairs, 2000)
    assert(out2.count() == 3L && out2.columns.count(_ == "id") == 1)
  }
}
