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
  * both the assignment argmax and the pair threshold compare identical
  * sequentially-computed doubles, so `oracleSql` re-derives the whole
  * thing from scratch in DuckDB.
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
    val assign = e.join(broadcast(cent)) // map-side: nearest cell per row
      .withColumn("cid", Ann.sortedCells.getItem(0).getField("cid"))
      .select(col("id"), col("v"), col("norm"), col("cid"))
    val dropped = assign.as("a").join(assign.as("b"), // cluster-local pairs only
        col("a.cid") === col("b.cid") && col("a.id") > col("b.id"))
      .filter(Ann.cosine(col("a.v"), col("b.v"), col("a.norm"), col("b.norm")) >= threshold)
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
}
