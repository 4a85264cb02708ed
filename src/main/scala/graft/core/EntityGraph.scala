package graft.core

import graft.model.{EntityDataset, Namespaces}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The entity graph: a registry of datasets plus the traversal planner.
  *
  * Re-expresses the reference's query API (mimiro-io/datahub
  * DOCUMENTATION.md "Query"; internal/server/store.go:870
  * `GetManyRelatedEntities`, store.go:1079 `GetRelatedAtTime` paging;
  * internal/server/get_related_test.go):
  * single-entity lookup, outgoing traversal, inverse (incoming)
  * traversal, predicate `*`, and dataset scoping.
  *
  * Every traversal is a declarative join so Catalyst gets to reorder,
  * push filters into the scans and pick broadcast-hash for
  * dimension-sized sides — nothing is materialized driver-side, which is
  * what keeps these operators valid on a 1000-executor / 100 TB cluster.
  */
final case class EntityGraph(datasets: Map[String, EntityDataset], ns: Namespaces) {

  def apply(name: String): EntityDataset =
    datasets.getOrElse(name, sys.error(s"unknown dataset: $name"))

  /** Reference: FindById / `{"entityId": ...}` — single-entity lookup.
    * The predicate on the natural key pushes down to the parquet scan.
    */
  def lookup(dataset: String, key: Any): DataFrame = {
    val d = apply(dataset)
    d.df.filter(col(d.idCol) === lit(key))
  }

  /** (entity key, single ref value) pairs for one declared ref of `df`.
    * Array-valued refs (reference: `refs: URI | [URI]`,
    * internal/server/entity.go) explode to one row per element —
    * map-side, BEFORE any join shuffle, so the downstream equi-join sees
    * plain scalar keys either way; scalar refs pass through untouched
    * (no Generate node in the plan). */
  private def refPairs(df: DataFrame, idCol: String, r: graft.model.Ref,
                       idAs: String, fkAs: String): DataFrame =
    if (r.array) df.select(col(idCol).as(idAs), explode(col(r.fkCol)).as(fkAs))
    else df.select(col(idCol).as(idAs), col(r.fkCol).as(fkAs))

  /** Outgoing traversal: from entities of `dataset` (optionally filtered)
    * via `predicate` to related entities, carrying the target's columns.
    */
  def out(dataset: String, predicate: String, startFilter: Column = lit(true)): DataFrame = {
    val src = apply(dataset)
    val r = src.refs.find(_.predicate == predicate)
      .getOrElse(sys.error(s"dataset ${src.name} has no predicate $predicate"))
    val tgt = apply(r.target)
    val pairs = refPairs(src.df.filter(startFilter), src.idCol, r, "__sid", "__fk")
    pairs
      .join(tgt.rel, pairs("__fk") === tgt.df(tgt.idCol))
      .select(Seq(
        src.uriOf(col("__sid")).as("start"),
        lit(predicate).as("predicate"),
        tgt.uri.as("related")) ++ tgt.df.columns.map(tgt.df(_)): _*
      )
  }

  /** Incoming (inverse) traversal: entities in `scope` datasets whose
    * `predicate` ref points AT entities of `target` (optionally
    * filtered). Reference: `{"inverse": true, "datasets": [...]}` — the
    * `scope` list doubles as the dataset filter; an empty scope means
    * "all datasets that declare the predicate".
    */
  def in(
      target: String,
      predicate: String,
      targetFilter: Column = lit(true),
      scope: Seq[String] = Seq.empty
  ): DataFrame = {
    val tgt = apply(target)
    val sources = datasets.values.toSeq
      .filter(d => d.refs.exists(r => r.predicate == predicate && r.target == target))
      .filter(d => scope.isEmpty || scope.contains(d.name))
      .sortBy(_.name)
    require(sources.nonEmpty, s"no dataset references $target via $predicate in scope $scope")
    val start = tgt.rel.filter(targetFilter)
    val legs = sources.map { src =>
      val ref = src.refs.find(r => r.predicate == predicate && r.target == target).get
      val pairs = refPairs(src.df, src.idCol, ref, "__sid", "__fk")
      pairs
        .join(start, pairs("__fk") === start(tgt.idCol))
        .select(
          tgt.uriOf(start(tgt.idCol)).as("start"),
          lit(predicate).as("predicate"),
          lit(src.name).as("dataset"),
          src.uriOf(col("__sid")).as("related"),
          col("__sid").cast("long").as("related_key")
        )
    }
    legs.reduce(_ unionByName _)
  }

  /** Predicate `*`: follow ALL outgoing refs of a dataset — a union of
    * one join per declared predicate (reference: `"predicate": "*"`).
    */
  def outStar(dataset: String, startFilter: Column = lit(true)): DataFrame = {
    val src = apply(dataset)
    require(src.refs.nonEmpty, s"dataset $dataset declares no refs")
    val legs = src.refs.sortBy(_.predicate).map { r =>
      val tgt = apply(r.target)
      val pairs = refPairs(src.df.filter(startFilter), src.idCol, r, "__sid", "__fk")
      pairs
        .join(tgt.rel, pairs("__fk") === tgt.df(tgt.idCol))
        .select(
          src.uriOf(col("__sid")).as("start"),
          lit(r.predicate).as("predicate"),
          tgt.uri.as("related")
        )
    }
    legs.reduce(_ unionByName _)
  }

  /** Two-hop outgoing traversal, composed joins (reference transform
    * idiom: Query(...) then Query(...) on the result — see
    * DOCUMENTATION.md MultiSource example).
    */
  def out2(dataset: String, p1: String, p2: String, startFilter: Column = lit(true)): DataFrame = {
    val src = apply(dataset)
    val r1 = src.refs.find(_.predicate == p1).getOrElse(sys.error(s"no $p1 on $dataset"))
    val mid = apply(r1.target)
    val r2 = mid.refs.find(_.predicate == p2).getOrElse(sys.error(s"no $p2 on ${mid.name}"))
    val tgt = apply(r2.target)
    val hop1 = refPairs(src.df.filter(startFilter), src.idCol, r1, "__sid", "__fk1")
    val hop2raw = refPairs(mid.df, mid.idCol, r2, "__mid", "__fk2")
    val hop2 = if (mid.small) broadcast(hop2raw) else hop2raw
    hop1
      .join(hop2, hop1("__fk1") === hop2("__mid"))
      .join(tgt.rel, hop2("__fk2") === tgt.df(tgt.idCol))
      .select(Seq(
        src.uriOf(col("__sid")).as("start"),
        tgt.uri.as("related")) ++ tgt.df.columns.map(tgt.df(_)): _*
      )
  }

  /** Paged outgoing traversal with a continuation token (reference:
    * Query `limit` + `continuations` — every query result can be resumed
    * from an opaque token). The token is keyset-based: "start strictly
    * after entity key K", so resuming is a pushed-down range predicate +
    * top-N — Spark plans TakeOrderedAndProject (per-partition top-N,
    * merged on the driver), NOT a global sort, and the `> K` predicate
    * prunes parquet row groups. O(page) per page at any corpus size.
    *
    * Keyset contract (also `inPaged`): entity keys must be NUMERIC —
    * under ANSI mode a string key (e.g. lineitem's composite
    * "orderkey-linenumber") fails the cast loudly at execution; give
    * such datasets a numeric surrogate column for paged traversal.
    */
  def outPaged(
      dataset: String,
      predicate: String,
      afterKey: Option[Long],
      pageSize: Int
  ): DataFrame = {
    val src = apply(dataset)
    val r = src.refs.find(_.predicate == predicate)
      .getOrElse(sys.error(s"dataset ${src.name} has no predicate $predicate"))
    val tgt = apply(r.target)
    val keyFilter = afterKey.map(k => col(src.idCol) > k).getOrElse(lit(true))
    // page the START set first (pushed range predicate + per-partition
    // top-N), then traverse only the page — never the whole corpus
    val page = src.df.filter(keyFilter).orderBy(col(src.idCol)).limit(pageSize)
    val pairs = refPairs(page, src.idCol, r, "__sid", "__fk")
    pairs
      .join(tgt.rel, pairs("__fk") === tgt.df(tgt.idCol))
      .select(
        col("__sid").cast("long").as("start_key"),
        src.uriOf(col("__sid")).as("start"),
        lit(predicate).as("predicate"),
        tgt.uri.as("related"))
  }

  /** Paged INCOMING traversal with a keyset continuation — the
    * reference pages both directions through the same continuation
    * scheme (store.go:1079 `GetRelatedAtTime` + `RelatedFrom`); round 2
    * only paged outgoing. The token is the (dataset, related_key) pair
    * of the last row served: resuming filters strictly past it (struct
    * comparison pushes to the scan) and takes the next page via
    * per-partition top-N (TakeOrderedAndProject — no global sort). */
  def inPaged(
      target: String,
      predicate: String,
      targetFilter: Column = lit(true),
      scope: Seq[String] = Seq.empty,
      after: Option[(String, Long)] = None,
      pageSize: Int = 100
  ): DataFrame = {
    val full = in(target, predicate, targetFilter, scope)
    val keyF = after
      .map { case (ds, k) => struct(col("dataset"), col("related_key")) > struct(lit(ds), lit(k)) }
      .getOrElse(lit(true))
    full.filter(keyF).orderBy(col("dataset"), col("related_key")).limit(pageSize)
  }

  /** The full entity-to-entity edge list: one (src, dst) URI pair per
    * declared ref of every dataset — the materialized adjacency view
    * BFS-style operators run over. */
  def allEdges: DataFrame =
    datasets.values.toSeq.sortBy(_.name).flatMap { d =>
      d.refs.sortBy(_.predicate).map { r =>
        val tgt = apply(r.target)
        refPairs(d.df, d.idCol, r, "__sid", "__fk")
          // a null FK concat()s to a null dst URI, and null keys never
          // anti-join away — without this filter `reachable` would
          // re-emit a spurious null node at every hop
          .filter(col("__fk").isNotNull)
          .select(d.uriOf(col("__sid")).as("src"), tgt.uriOf(col("__fk")).as("dst"))
      }
    }.reduce(_ unionByName _)

  /** Variable-depth reachability: all entities within `maxHops` of the
    * start set following ANY outgoing ref, with their minimum depth —
    * the unbounded-traversal companion to the fixed-predicate queries.
    * Frontier expansion: each hop is one equi-join + anti-join against
    * the visited set, lineage truncated per hop (Checkpoints.truncate: localCheckpoint,
    * or reliable checkpoints via the graft.checkpointDir conf), only
    * NEW nodes join the next frontier — so the work per hop is
    * O(frontier edges), not O(total reached), and the driver never sees
    * row data. */
  def reachable(startUris: DataFrame, maxHops: Int): DataFrame = {
    val edges = allEdges
    // only FRONTIERS are checkpointed; the visited set stays a union of
    // already-checkpointed frontiers, so its lineage is one union node
    // per hop — checkpointing it again would double the materialization
    // work per hop for no lineage benefit
    var frontier = startUris.select(col("uri"), lit(0).as("depth")).transform(Checkpoints.truncate)
    var reached = frontier
    for (k <- 1 to maxHops) {
      val next = edges.join(frontier, edges("src") === frontier("uri"))
        .select(col("dst").as("uri"), lit(k).as("depth"))
        .distinct()
        .join(reached.select("uri"), Seq("uri"), "left_anti")
        .transform(Checkpoints.truncate)
      reached = reached.unionByName(next)
      frontier = next
    }
    reached
  }

  /** Per-ROOT variable-depth reachability — the traversal-aggregation
    * primitive behind the reference's "javascript query" pattern
    * (aggregate over everything reachable from each start entity):
    * multi-source BFS where every frontier row carries its ORIGIN, so
    * one pass answers "per start node, what is within k hops" for the
    * whole start set. Output (root, uri, depth) with the MINIMUM depth
    * per (root, uri).
    *
    * Scale shape: identical to `reachable` — each hop is one edge
    * equi-join + anti-join against the per-root visited set, frontier
    * lineage truncated per hop — except keys are (root, uri) pairs, so
    * work per hop is O(Σ per-root frontier edges) and the shuffle key
    * cardinality GROWS with the start set (no hot single key). The
    * driver never sees row data. */
  def reachableFrom(startUris: DataFrame, maxHops: Int): DataFrame = {
    val edges = allEdges
    var frontier = startUris
      .select(col("uri").as("root"), col("uri"), lit(0).as("depth"))
      .transform(Checkpoints.truncate)
    var reached = frontier
    for (k <- 1 to maxHops) {
      val next = edges.join(frontier, edges("src") === frontier("uri"))
        .select(col("root"), col("dst").as("uri"), lit(k).as("depth"))
        .distinct()
        .join(reached.select("root", "uri"), Seq("root", "uri"), "left_anti")
        .transform(Checkpoints.truncate)
      reached = reached.unionByName(next)
      frontier = next
    }
    reached
  }

  /** Reference: `details: true` lookup — entity augmented with per-value
    * provenance. Emits one row per (entity, property) with the owning
    * dataset, value rendered as string.
    */
  def detailsLookup(dataset: String, key: Any, props: Seq[String] = Seq.empty): DataFrame = {
    val d = apply(dataset)
    val base = d.df.filter(col(d.idCol) === lit(key))
    val chosen = if (props.nonEmpty) props else d.propCols
    val legs = chosen.sorted.map { p =>
      base.select(
        d.uri.as("id"),
        lit(d.propNs + p).as("property"),
        col(p).cast("string").as("value"),
        lit(d.name).as("dataset")
      )
    }
    legs.reduce(_ unionByName _)
  }
}
