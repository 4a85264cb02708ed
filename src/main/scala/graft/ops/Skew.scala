package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resilient join helper for the 100 TB path.
  *
  * AQE's skew-join split handles sort-merge skew at runtime (enabled in
  * graft sessions); `saltedJoin` is the explicit fallback for the case
  * AQE cannot fix — a shuffled join where one hot key dominates a
  * partition: the big side gets a random-ish salt derived
  * deterministically from row identity, the small side is exploded
  * `salts`× so every (key, salt) bucket can meet its match. Result is
  * row-identical to the plain join, but the hot key's rows spread over
  * `salts` reducers. */
object Skew {

  /** Equi-join `big ⨝ small ON big(key) = small(key)` with the big
    * side's hot keys spread across `salts` buckets. `bigId` must be a
    * deterministic per-row expression (e.g. the entity key) — it seeds
    * the salt so the join stays reproducible. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, bigId: Column, salts: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt", pmod(xxhash64(bigId), lit(salts)))
    val saltedSmall = small
      .withColumn("__salt", explode(array((0 until salts).map(lit): _*)))
    saltedBig.join(saltedSmall,
        saltedBig(key) === saltedSmall(key) && saltedBig("__salt") === saltedSmall("__salt"))
      .drop(saltedSmall(key)).drop(saltedBig("__salt")).drop(saltedSmall("__salt"))
  }
}
