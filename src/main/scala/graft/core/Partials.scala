package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Partial-entity merging (reference: mimiro-io/datahub
  * internal/server/store.go:999 `GetManyRelatedEntitiesAtTime(...,
  * mergePartials)` — the same entity id may live in several datasets,
  * each contributing a subset of its properties; queries can return the
  * merged view).
  *
  * Spark translation: one full-outer join per partial keyed on the
  * entity key, properties coalesced left-to-right (earlier datasets
  * take precedence — the reference merges in dataset registration
  * order). Shuffles on the entity key only; with co-partitioned
  * (bucketed) datasets the join is shuffle-free at cluster scale. */
object Partials {

  /** Merge dataset fragments sharing `keyCol`. Column collisions are
    * resolved by precedence (first frame wins via coalesce). */
  def merge(parts: Seq[DataFrame], keyCol: String): DataFrame = {
    require(parts.nonEmpty, "need at least one partial")
    parts.reduce { (acc, next) =>
      val shared = next.columns.toSet.intersect(acc.columns.toSet) - keyCol
      val joined = acc.as("l").join(next.as("r"), Seq(keyCol), "full_outer")
      val accCols = acc.columns.filterNot(_ == keyCol).map { c =>
        if (shared(c)) coalesce(col(s"l.$c"), col(s"r.$c")).as(c) else col(s"l.$c")
      }
      val rightOnly = next.columns
        .filterNot(c => c == keyCol || acc.columns.contains(c))
        .map(c => col(s"r.$c"))
      joined.select((col(keyCol) +: (accCols ++ rightOnly)).toIndexedSeq: _*)
    }
  }
}
