package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic (embedding-space) deduplication, SemDeDup-style: cluster
  * the corpus with the trained k-means quantizer, then look for
  * near-duplicate pairs ONLY inside each cluster — the cluster routing
  * turns the O(n²) all-pairs problem into Σ sᵢ² cluster-local work,
  * the same cost shape the IVF probe path exploits for search
  * (Abbas et al., "SemDeDup", arXiv:2303.09540 — public paper; no code
  * consulted).
  *
  * Semantics: a member is DROPPED when its cluster contains a
  * ≥ `threshold`-cosine neighbor with a smaller id (min-id canonical
  * representative, the d1/d6 convention). Output is the full corpus
  * roster `(id, cid, keep)` — the caller semi-joins `keep = 1` against
  * the document table.
  *
  * Scale shape: training reuses `Ann.trainCentroids` (map-only argmax
  * rounds + tiny integer aggregates, sample-trainable at extreme n);
  * assignment is one broadcast projection over the corpus (zero
  * Exchange); the pair pass shuffles the corpus ONCE on `cid` and
  * compares within cells only. Grow `nlist` ~ n/E[cell] to hold cell
  * sizes flat; a skewed cell degrades to that cell's s² — AQE skew
  * join splits it across executors.
  *
  * Engine-exactness for the oracle: training is integer fixed-point
  * (deterministic across engines — Ann.scala FixedScale notes), and
  * the assignment argmax AND the pair threshold both consume the
  * ∞-normalized fixed-point projection (|f_i| ≤ 2²⁰ → dots exact in
  * double under any accumulation order), so the similarity doubles are
  * BIT-IDENTICAL across engine builds — not merely "the same operands
  * sequentially", the assumption the r17 m10 driver red row falsified.
  * `oracleSql` re-derives the whole thing from scratch in DuckDB.
  */
object SemDedup {

  /** `(id, cid, keep)` for every corpus vector — `keep` is int 1/0
    * (bool hashes differently across engines in the verify harness). */
  def semanticDedup(emb: DataFrame, vecCol: String, idCol: String,
                    nlist: Int = 16, rounds: Int = 2,
                    threshold: Double = 0.9): DataFrame = {
    val e = Ann.normed(emb, vecCol, idCol)
    // one-row centroid array: truncate so the two consumers below don't
    // each re-run the Lloyd rounds
    val cent = graft.core.Checkpoints.truncate(
      Ann.trainCentroids(emb, vecCol, idCol, nlist, rounds))
    // the assignment is consumed three times (both pair-join sides +
    // the output roster) — truncate it too, or the corpus scan and the
    // O(n·nlist·dims) argmax projection run 3× per job
    val assign = graft.core.Checkpoints.truncate(
      e.join(broadcast(cent)) // map-side: nearest cell per row
        .withColumn("cid", Ann.sortedCells.getItem(0).getField("cid"))
        .select(col("id"), col("fu"), col("fnorm"), col("cid")))
    val dropped = assign.as("a").join(assign.as("b"), // cluster-local pairs only
        col("a.cid") === col("b.cid") && col("a.id") > col("b.id"))
      .filter(Ann.cosine(col("a.fu"), col("b.fu"), col("a.fnorm"), col("b.fnorm")) >= threshold)
      .select(col("a.id").as("id")).distinct()
    assign.join(dropped.withColumn("__d", lit(1)), Seq("id"), "left")
      .select(col("id"), col("cid"),
        when(col("__d").isNull, lit(1)).otherwise(lit(0)).as("keep"))
  }

  /** DuckDB SQL re-deriving `semanticDedup` end-to-end: the full
    * k-means chain (`Ann.kmeansAssignCtes` — seed, Lloyd rounds, final
    * argmax), then the intra-cluster pair scan and min-id keep rule. */
  def oracleSql(nlist: Int = 16, rounds: Int = 2, threshold: Double = 0.9): String =
    s"""WITH ${Ann.kmeansAssignCtes(nlist, rounds)},
       |drp AS (
       |  SELECT DISTINCT a.id
       |  FROM assign a JOIN assign b ON a.cid = b.cid AND a.id > b.id
       |  WHERE list_inner_product(a.v, b.v) / (a.nrm * b.nrm) >= $threshold)
       |SELECT a.id, a.cid, CASE WHEN d.id IS NULL THEN 1 ELSE 0 END AS keep
       |FROM assign a LEFT JOIN drp d ON a.id = d.id ORDER BY a.id""".stripMargin

  /** `semanticDedup` against the STANDING inverted file
    * (`Ann.buildIvfIndex` — same trained quantizer, so the output is
    * identical to the recompute path at equal build parameters): no
    * re-training, no re-assignment, and because the index is BUCKETED
    * by cid the intra-cell self-join is co-partitioned and co-sorted —
    * Spark plans it with ZERO Exchange under the pair join. This is
    * the deployment shape: build once per corpus snapshot, run the
    * dedup roster (and d14 deltas) against it. */
  def semanticDedupIndexed(spark: org.apache.spark.sql.SparkSession,
                           indexTable: String, threshold: Double): DataFrame = {
    val assign = Ann.withFixedUnit(spark.table(indexTable))
    val dropped = assign.as("a").join(assign.as("b"),
        col("a.cid") === col("b.cid") && col("a.id") > col("b.id"))
      .filter(Ann.cosine(col("a.fu"), col("b.fu"), col("a.fnorm"), col("b.fnorm")) >= threshold)
      .select(col("a.id").as("id")).distinct()
    assign.join(dropped.withColumn("__d", lit(1)), Seq("id"), "left")
      .select(col("id"), col("cid"),
        when(col("__d").isNull, lit(1)).otherwise(lit(0)).as("keep"))
  }

  /** INCREMENTAL semantic dedup — d8/d11's ingest discipline for the
    * k-means-cell family: a new batch routes to cells under the
    * STANDING inverted file's FROZEN `_cent` quantizer
    * (`Ann.buildIvfIndex`; the coarse structure is as-of-build, same
    * contract as `absorbIntoIvfIndex`) and pairs only against the
    * members of its own cells (batch × corpus rides the bucketed cid
    * join) plus the batch itself. Corpus × corpus never runs; no
    * re-training, no corpus re-assignment. Supersede semantics: ids
    * the batch re-emits leave the corpus side before pairing. Output
    * is `(a, b, sim)` pairs ≥ threshold, a < b — feed `clusters`/
    * `keepCanonical`, then `absorbIntoIvfIndex` the survivors. */
  def semanticDedupDelta(spark: org.apache.spark.sql.SparkSession, batch: DataFrame,
                         vecCol: String, idCol: String, indexTable: String,
                         threshold: Double): DataFrame = {
    val cent = spark.table(s"${indexTable}_cent")
    val nb = Ann.normed(batch, vecCol, idCol).join(broadcast(cent))
      .withColumn("cid", Ann.sortedCells.getItem(0).getField("cid"))
      .select(col("id"), col("fu"), col("fnorm"), col("cid"))
    val batchIds = batch.select(col(idCol).as("id")).distinct()
    val corpus = Ann.withFixedUnit(
        spark.table(indexTable).join(broadcast(batchIds), Seq("id"), "left_anti"))
      .select(col("id"), col("fu"), col("fnorm"), col("cid"))
    val sim = Ann.cosine(col("x.fu"), col("y.fu"), col("x.fnorm"), col("y.fnorm"))
    val newPairs = nb.as("x").join(nb.as("y"),
        col("x.cid") === col("y.cid") && col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"), sim.as("simraw"))
    val crossPairs = nb.as("x").join(corpus.as("y"),
        col("x.cid") === col("y.cid") && col("x.id") =!= col("y.id"))
      .select(least(col("x.id"), col("y.id")).as("a"),
        greatest(col("x.id"), col("y.id")).as("b"), sim.as("simraw"))
    newPairs.unionByName(crossPairs)
      .filter(col("simraw") >= threshold)
      .select(col("a"), col("b"), round(col("simraw"), 4).as("sim"))
  }

  /** Embedding-level train/eval DECONTAMINATION — the semantic member
    * of the decon triad: d9 reports doc-level n-gram containment, d20
    * excises span-level exact overlaps; this catches the REPHRASED
    * leak neither can see (public: Yang et al., "Rethinking Benchmark
    * and Contamination for Language Models with Rephrased Samples",
    * arXiv:2311.04850, proposes exactly embedding-similarity
    * screening after showing n-gram decon misses paraphrases).
    *
    * Eval vectors route to their `nprobe` NEAREST cells under the
    * standing TRAIN index's FROZEN `_cent` quantizer (the s3/s5 probe
    * discipline — nprobe > 1 catches a rephrasing that drifted across
    * a cell boundary, the recall knob a decon run should turn up
    * since a missed leak costs more than a missed dup) and compare
    * only against those cells' members — the train corpus never
    * reshuffles, re-trains, re-assigns, or self-joins; work =
    * nprobe · Σ |eval∩cell|·|train∩cell|, linear in the train corpus
    * at a bounded eval set. A train doc lives in exactly one cell, so
    * multi-cell probing never double-counts an (eval, train) pair.
    *
    * Output: one row per CONTAMINATED train id — how many eval
    * neighbors sit at ≥ `threshold` cosine and the max similarity —
    * the caller anti-joins it against the training corpus (the d20
    * `scrubSpans` analog at doc granularity). */
  def semanticDecontaminate(spark: org.apache.spark.sql.SparkSession, eval: DataFrame,
                            vecCol: String, idCol: String, indexTable: String,
                            threshold: Double, nprobe: Int = 1): DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    val cent = spark.table(s"${indexTable}_cent")
    val ev = Ann.normed(eval, vecCol, idCol).join(broadcast(cent))
      .select(col("id"), col("fu"), col("fnorm"),
        explode(slice(Ann.sortedCells, 1, nprobe)).as("__c"))
      .withColumn("cid", col("__c").getField("cid"))
      .select(col("id"), col("fu"), col("fnorm"), col("cid"))
    val corpus = Ann.withFixedUnit(spark.table(indexTable))
    val sim = Ann.cosine(col("x.fu"), col("y.fu"), col("x.fnorm"), col("y.fnorm"))
    ev.as("x").join(corpus.as("y"), col("x.cid") === col("y.cid"))
      .select(col("y.id").as("id"), sim.as("simraw"))
      .filter(col("simraw") >= threshold)
      .groupBy(col("id"))
      .agg(count(lit(1)).cast("long").as("n_hits"),
        round(max(col("simraw")), 4).as("max_sim"))
  }

  /** The planted delta batch used by the d14 query, `SteadyState` and
    * `deltaOracleSql`'s `bat0` CTE — perturbed copies of the first `n`
    * corpus vectors under fresh ids (+`offset`), component 0 shifted
    * by +0.1 (double add, one IEEE round back to float: engine-exact,
    * the d5 construction). One definition so the measured workload can
    * never drift from the verified one. */
  def perturbedBatch(emb: DataFrame, vecCol: String, idCol: String,
                     n: Int = 100, offset: Long = 10000L,
                     eps: Double = 0.1d): DataFrame =
    emb.filter(col(idCol) < n).select(
      (col(idCol) + offset).as(idCol),
      transform(col(vecCol), (x, i) =>
        when(i === 0, (x.cast("double") + lit(eps)).cast("float")).otherwise(x)).as(vecCol))

  /** DuckDB SQL re-deriving `semanticDedupDelta` under the d5/d11
    * planted-batch construction: k-means trained on the standing
    * corpus (the full embeddings table — the batch is NEW ids), the
    * batch (perturbed copies of `vec_id < batchN`, ids +10000) routed
    * through the FINAL centroids (`cdnF`), then batch × batch and
    * batch × corpus cell-local pairs. */
  /** The `bat0`→`basg` CTE block shared by [[deltaOracleSql]] and
    * [[deconOracleSql]]: the planted batch ([[perturbedBatch]]'s exact
    * construction in SQL) routed through the trained FINAL centroids
    * (`cdnF`, from `Ann.kmeansAssignCtes`). */
  private def batchRouteCtes(batchN: Int, nprobe: Int = 1): String =
    s"""bat0 AS (
       |  SELECT vec_id + 10000 AS id,
       |    [CASE WHEN i = 1 THEN ((embedding[i]::DOUBLE + 0.1)::FLOAT) ELSE embedding[i] END
       |     for i in range(1, len(embedding)+1)] AS fv
       |  FROM embeddings WHERE vec_id < $batchN),
       |batm AS (SELECT id, fv, list_max([abs(x::DOUBLE) FOR x IN fv]) AS mx FROM bat0),
       |batf AS (SELECT id, CASE WHEN mx = 0 THEN [0::BIGINT FOR x IN fv]
       |                    ELSE [floor(x::DOUBLE / mx * ${Ann.FixedScale})::BIGINT FOR x IN fv] END AS f
       |         FROM batm),
       |bat AS (SELECT id, v, sqrt(list_inner_product(v, v)) AS nrm
       |        FROM (SELECT id, [x::DOUBLE FOR x IN f] AS v FROM batf)),
       |basgs AS (
       |  SELECT b.id, b.v, b.nrm, c.cid,
       |         list_inner_product(b.v, c.cfd) / (b.nrm * c.cfn) AS csim
       |  FROM bat b, cdnF c),
       |basgr AS (
       |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY csim DESC, cid) AS rn
       |  FROM basgs),
       |basg AS (SELECT id, v, nrm, cid FROM basgr WHERE rn <= $nprobe)""".stripMargin

  /** The k-means + batch-routing + cell-local pair CTE block shared by
    * [[deltaOracleSql]] and [[deltaAuditSql]] — ends in `u` (all
    * candidate pairs with raw sim `s`). */
  private def deltaPairCtes(nlist: Int, rounds: Int, batchN: Int): String =
    s"""${Ann.kmeansAssignCtes(nlist, rounds)},
       |${batchRouteCtes(batchN)},
       |bb AS (
       |  SELECT x.id AS a, y.id AS b,
       |         list_inner_product(x.v, y.v) / (x.nrm * y.nrm) AS s
       |  FROM basg x JOIN basg y ON x.cid = y.cid AND x.id < y.id),
       |bc AS (
       |  SELECT least(x.id, y.id) AS a, greatest(x.id, y.id) AS b,
       |         list_inner_product(x.v, y.v) / (x.nrm * y.nrm) AS s
       |  FROM basg x JOIN assign y ON x.cid = y.cid AND x.id <> y.id),
       |u AS (SELECT * FROM bb UNION ALL SELECT * FROM bc)""".stripMargin

  def deltaOracleSql(nlist: Int = 16, rounds: Int = 2, threshold: Double = 0.9,
                     batchN: Int = 100): String =
    s"""WITH ${deltaPairCtes(nlist, rounds, batchN)}
       |SELECT a, b, round(s, 4) AS sim FROM u WHERE s >= $threshold ORDER BY a, b""".stripMargin

  /** The routing-argmax tie census over corpus (`rankedF`) and batch
    * (`basgr`) chains plus the threshold margin — the audit columns
    * every `tools/oracleaudit.py` verdict consumes (see
    * [[Ann.ivfAuditSql]] for the class being policed). */
  private def pairAuditSelect(threshold: Double, pairRel: String,
                              exactRels: Seq[(String, String)],
                              withBatch: Boolean = true): String = {
    val exact = exactRels.map { case (rel, c) => Ann.integerExactCheck(rel, c) }
      .mkString("LEAST(", ",\n        ", ")")
    val bgapCte = if (withBatch)
      s"""bgap AS (
         |  SELECT id, max(CASE WHEN rn = 1 THEN csim END)
         |           - max(CASE WHEN rn = 2 THEN csim END) AS g
         |  FROM basgr WHERE rn <= 2 GROUP BY id HAVING count(*) = 2),
         |""".stripMargin
    else "bgap AS (SELECT 0 AS id, 1.0 AS g WHERE FALSE),\n"
    s"""agap AS (
       |  SELECT id, max(CASE WHEN crn = 1 THEN csim END)
       |           - max(CASE WHEN crn = 2 THEN csim END) AS g
       |  FROM rankedF WHERE crn <= 2 GROUP BY id HAVING count(*) = 2),
       |${bgapCte}xc AS (SELECT $exact::INTEGER AS ok)
       |SELECT 'routing' AS stage,
       |       ((SELECT count(*) FROM agap WHERE g = 0)
       |        + (SELECT count(*) FROM bgap WHERE g = 0))::BIGINT AS n_ties,
       |       LEAST(coalesce((SELECT min(g) FROM agap), 1.0),
       |             coalesce((SELECT min(g) FROM bgap), 1.0)) AS min_gap,
       |       (SELECT ok FROM xc) AS integer_exact
       |UNION ALL
       |SELECT 'threshold',
       |       (SELECT count(*) FROM $pairRel WHERE s = $threshold)::BIGINT,
       |       coalesce((SELECT min(abs(s - $threshold)) FROM $pairRel), 1.0),
       |       (SELECT ok FROM xc)""".stripMargin
  }

  /** Audit for [[oracleSql]]'s chain (d12/d15): routing ties plus the
    * intra-cell pair-threshold margin. */
  def auditSql(nlist: Int = 16, rounds: Int = 2, threshold: Double = 0.9): String =
    s"""WITH ${Ann.kmeansAssignCtes(nlist, rounds)},
       |prs AS (
       |  SELECT list_inner_product(a.v, b.v) / (a.nrm * b.nrm) AS s
       |  FROM assign a JOIN assign b ON a.cid = b.cid AND a.id > b.id),
       |${pairAuditSelect(threshold, "prs", Seq("pn" -> "v", "cdnF" -> "cfd"),
            withBatch = false)}""".stripMargin

  /** Audit for [[deconOracleSql]]'s chain (d26): both routing argmaxes
    * plus the hit-threshold margin. */
  def deconAuditSql(nlist: Int = 16, rounds: Int = 2, threshold: Double = 0.9,
                    batchN: Int = 100, nprobe: Int = 1): String =
    s"""WITH ${Ann.kmeansAssignCtes(nlist, rounds)},
       |${batchRouteCtes(batchN, nprobe)},
       |hit AS (
       |  SELECT y.id, list_inner_product(x.v, y.v) / (x.nrm * y.nrm) AS s
       |  FROM basg x JOIN assign y ON x.cid = y.cid),
       |${pairAuditSelect(threshold, "hit", Seq("pn" -> "v", "cdnF" -> "cfd", "bat" -> "v"))}""".stripMargin

  /** Audit for [[deltaOracleSql]]'s chain (d14/d17): routing ties on
    * both the corpus and batch argmaxes, the pair-threshold margin,
    * and the operand exactness class. */
  def deltaAuditSql(nlist: Int = 16, rounds: Int = 2, threshold: Double = 0.9,
                    batchN: Int = 100): String =
    s"""WITH ${deltaPairCtes(nlist, rounds, batchN)},
       |${pairAuditSelect(threshold, "u",
            Seq("pn" -> "v", "cdnF" -> "cfd", "bat" -> "v"))}""".stripMargin

  /** DuckDB SQL re-deriving the d30 media-neardup composition: the
    * [[deltaOracleSql]] batch×cell construction over an arbitrary
    * vector `source` (the m4 media derivation), its surviving pairs
    * clustered by the d6 recursive component closure, each cluster
    * keeping its best member by the first-dim media stat (the d25
    * keep-best policy — the perturbed re-ingest scores fractionally
    * higher, so the decision is real, not a tie-break). */
  /** The media-batch routing + cell-local pair CTE block shared by
    * [[mediaNeardupOracleSql]] and [[mediaNeardupAuditSql]] — ends in
    * `u` (all candidate pairs with raw sim `s`). */
  private def mediaPairCtes(nlist: Int, rounds: Int, batchN: Int,
                            offset: Long, source: String): String =
    s"""${Ann.kmeansAssignCtes(nlist, rounds, source)},
       |bat0m AS (
       |  SELECT id + $offset AS id, bv, list_max([abs(x) FOR x IN bv]) AS mx
       |  FROM (SELECT id, [CASE WHEN i = 1 THEN ((v[i] + 0.1)::FLOAT)::DOUBLE ELSE v[i] END
       |         for i in range(1, len(v)+1)] AS bv FROM e WHERE id < $batchN)),
       |batf AS (SELECT id, bv, CASE WHEN mx = 0 THEN [0::BIGINT FOR x IN bv]
       |                        ELSE [floor(x / mx * ${Ann.FixedScale})::BIGINT FOR x IN bv] END AS f
       |         FROM bat0m),
       |bat AS (SELECT id, v, sqrt(list_inner_product(v, v)) AS nrm, bv
       |        FROM (SELECT id, [x::DOUBLE FOR x IN f] AS v, bv FROM batf)),
       |basgs AS (
       |  SELECT b.id, b.v, b.nrm, c.cid,
       |         list_inner_product(b.v, c.cfd) / (b.nrm * c.cfn) AS csim
       |  FROM bat b, cdnF c),
       |basgr AS (
       |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY csim DESC, cid) AS rn
       |  FROM basgs),
       |basg AS (SELECT id, v, nrm, cid FROM basgr WHERE rn <= 1),
       |bb AS (
       |  SELECT x.id AS a, y.id AS b, list_inner_product(x.v, y.v) / (x.nrm * y.nrm) AS s
       |  FROM basg x JOIN basg y ON x.cid = y.cid AND x.id < y.id),
       |bc AS (
       |  SELECT least(x.id, y.id) AS a, greatest(x.id, y.id) AS b,
       |         list_inner_product(x.v, y.v) / (x.nrm * y.nrm) AS s
       |  FROM basg x JOIN assign y ON x.cid = y.cid AND x.id <> y.id),
       |u AS (SELECT * FROM bb UNION ALL SELECT * FROM bc)""".stripMargin

  /** Audit for [[mediaNeardupOracleSql]]'s chain (d30). */
  def mediaNeardupAuditSql(nlist: Int = 16, rounds: Int = 2,
                           threshold: Double, batchN: Int = 100,
                           offset: Long = 10000000L,
                           source: String): String =
    s"""WITH ${mediaPairCtes(nlist, rounds, batchN, offset, source)},
       |${pairAuditSelect(threshold, "u",
            Seq("pn" -> "v", "cdnF" -> "cfd", "bat" -> "v"))}""".stripMargin

  def mediaNeardupOracleSql(nlist: Int = 16, rounds: Int = 2,
                            threshold: Double, batchN: Int = 100,
                            offset: Long = 10000000L,
                            source: String): String =
    s"""WITH RECURSIVE ${mediaPairCtes(nlist, rounds, batchN, offset, source)},
       |prs AS (SELECT a, b FROM u WHERE s >= $threshold),
       |edges AS (SELECT a, b FROM prs UNION SELECT b, a FROM prs),
       |reach(src, dst) AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT reach.src, e2.b FROM reach JOIN edges e2 ON reach.dst = e2.a),
       |cl AS (SELECT src AS id, least(src, min(dst)) AS cluster_id FROM reach GROUP BY src),
       |q AS (SELECT id, round(v[1], 4) AS quality FROM n
       |      UNION ALL SELECT id, round(bv[1], 4) AS quality FROM bat),
       |j AS (SELECT cl.cluster_id, cl.id, q.quality FROM cl JOIN q USING (id)),
       |rk AS (SELECT cluster_id, id, quality,
       |       row_number() OVER (PARTITION BY cluster_id ORDER BY quality DESC, id) AS rk,
       |       count(*) OVER (PARTITION BY cluster_id) AS n_members FROM j)
       |SELECT cluster_id, id AS kept_id, quality AS kept_score, n_members
       |FROM rk WHERE rk = 1 ORDER BY cluster_id""".stripMargin

  /** DuckDB SQL re-deriving [[semanticDecontaminate]] under the
    * planted-eval construction (the rephrase analog: eval = perturbed
    * copies of train vectors): k-means trained on the train corpus,
    * the eval batch routed through the FINAL centroids, cell-local
    * eval×train hits ≥ threshold aggregated per TRAIN id. */
  def deconOracleSql(nlist: Int = 16, rounds: Int = 2, threshold: Double = 0.9,
                     batchN: Int = 100, nprobe: Int = 1): String =
    s"""WITH ${Ann.kmeansAssignCtes(nlist, rounds)},
       |${batchRouteCtes(batchN, nprobe)},
       |hit AS (
       |  SELECT y.id, list_inner_product(x.v, y.v) / (x.nrm * y.nrm) AS s
       |  FROM basg x JOIN assign y ON x.cid = y.cid)
       |SELECT id, count(*)::BIGINT AS n_hits, round(max(s), 4) AS max_sim
       |FROM hit WHERE s >= $threshold GROUP BY id ORDER BY id""".stripMargin
}
