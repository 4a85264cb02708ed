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

  import graft.functions.VectorFunctions.{dot, l2norm}

  private[ann] def normed(emb: DataFrame, vecCol: String, idCol: String): DataFrame =
    emb.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("norm", l2norm(col("v")))

  private def cosine(xv: Column, yv: Column, xn: Column, yn: Column): Column =
    dot(xv, yv) / (xn * yn)

  /** Exact cosine top-k for each query vector (queries = `queryFilter`
    * rows of the corpus, self excluded). Deterministic tie-break on
    * neighbor id. */
  def bruteForceTopK(emb: DataFrame, vecCol: String, idCol: String,
                     queryFilter: Column, k: Int, salts: Int = 32): DataFrame = {
    val e = normed(emb, vecCol, idCol)
    val q = e.filter(queryFilter)
    val scored = e.as("x").join(broadcast(q.as("y")), col("x.id") =!= col("y.id"))
      .select(col("y.id").as("query_id"), col("x.id").as("neighbor_id"),
        cosine(col("x.v"), col("y.v"), col("x.norm"), col("y.norm")).as("sim"))
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
  private def planeSign(t: Int, p: Int, d: Int): Double = {
    var h = t * 1000003 + p * 7919 + d * 104729 + 0x9e3779b9
    h ^= h >>> 16; h *= 0x85ebca6b; h ^= h >>> 13; h *= 0xc2b2ae35; h ^= h >>> 16
    if ((h & 1) == 0) 1.0 else -1.0
  }

  /** Sketch column: for table `t`, an integer whose bit p is
    * sign(v · plane_{t,p}). Built as a literal-signs fold — pure codegen. */
  private def sketch(v: Column, dims: Int, t: Int, bits: Int): Column =
    (0 until bits).map { p =>
      val signs = array((0 until dims).map(d => lit(planeSign(t, p, d))): _*)
      val proj = aggregate(zip_with(v, signs, (x, s) => x * s), lit(0.0), (a, x) => a + x)
      when(proj > 0, lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _)

  /** IVF (inverted-file) ANN: a coarse quantizer partitions the corpus
    * into nlist cells; a query scores only the vectors of its nprobe
    * nearest cells. Centroids here are a deterministic hash-ranked
    * sample of the corpus (a production build would train k-means and
    * broadcast the centroid table the same way — the operator shape is
    * identical). Corpus-side assignment is one broadcast-join +
    * per-id argmax; probing is a cell-keyed equi-join, so the scored
    * candidate volume is ~corpus·nprobe/nlist — the sub-linear scale
    * path next to `lshTopK`. */
  def ivfTopK(emb: DataFrame, vecCol: String, idCol: String,
              queryFilter: Column, k: Int, nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = normed(emb, vecCol, idCol)
    val cent = broadcast(
      e.orderBy(xxhash64(col("id")), col("id")).limit(nlist)
        .select(col("id").as("cid"), col("v").as("cv"), col("norm").as("cnorm")))
    val simToCent = cosine(col("v"), col("cv"), col("norm"), col("cnorm"))
    val ranked = e.join(cent)
      .withColumn("csim", simToCent)
      .withColumn("crn", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("csim").desc, col("cid"))))
    val assign = ranked.filter(col("crn") === 1) // corpus: nearest cell only
      .select(col("id"), col("v"), col("norm"), col("cid"))
    val probes = ranked.filter(queryFilter && col("crn") <= nprobe) // queries: nprobe cells
      .select(col("id").as("query_id"), col("v").as("qv"), col("norm").as("qnorm"), col("cid"))
    val scored = assign.join(broadcast(probes),
        assign("cid") === probes("cid") && col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        cosine(col("v"), col("qv"), col("norm"), col("qnorm")).as("sim"))
      .distinct()
    topKPerQuery(scored, k, salts = 32)
  }

  /** LSH-bucketed ANN: candidates = same (table, sketch) bucket in any of
    * the L tables; exact cosine only on candidates; two-phase top-k. */
  def lshTopK(emb: DataFrame, vecCol: String, idCol: String, dims: Int,
              queryFilter: Column, k: Int, tables: Int = 8, bits: Int = 4): DataFrame = {
    val e = normed(emb, vecCol, idCol)
    val buckets = e.select(col("id"), col("v"), col("norm"),
      explode(array((0 until tables).map(t =>
        struct(lit(t).as("t"), sketch(col("v"), dims, t, bits).as("sk"))): _*)).as("b"))
      .select(col("id"), col("v"), col("norm"), col("b.t").as("t"), col("b.sk").as("sk"))
    val qb = buckets.filter(queryFilter)
    val cand = buckets.as("x").join(broadcast(qb.as("y")),
        col("x.t") === col("y.t") && col("x.sk") === col("y.sk") && col("x.id") =!= col("y.id"))
      .select(col("y.id").as("query_id"), col("x.id").as("neighbor_id"),
        cosine(col("x.v"), col("y.v"), col("x.norm"), col("y.norm")).as("sim"))
      .distinct()
    topKPerQuery(cand, k, salts = 32)
  }
}
