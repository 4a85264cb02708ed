package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Namespace registry with CURIE expansion/contraction as pure Column ops.
  *
  * Mirrors the reference's namespace/CURIE handling (mimiro-io/datahub
  * DOCUMENTATION.md "Data Structures" `@context namespaces`;
  * internal/server/uriconstants.go) but compiled to chained `when`
  * expressions so the whole thing stays inside whole-stage codegen — no
  * UDF, no driver round-trip.
  */
final case class Namespaces(prefixes: Map[String, String]) {

  def expansion(prefix: String): String =
    prefixes.getOrElse(prefix, sys.error(s"unknown namespace prefix: $prefix"))

  /** Reference: GetNamespacePrefix — URI expansion -> prefix. */
  def prefixOf(expansion: String): Option[String] =
    prefixes.collectFirst { case (p, e) if e == expansion => p }

  /** Reference: AssertNamespacePrefix — returns a registry that knows the
    * expansion (immutable: Spark plans are built once per query). */
  def assertPrefix(expansion: String): (String, Namespaces) =
    prefixOf(expansion) match {
      case Some(p) => (p, this)
      case None =>
        // skip generated names a user already registered — ns<size>
        // could collide and silently rebind their prefix
        val p = Iterator.from(prefixes.size).map(i => s"ns$i")
          .find(!prefixes.contains(_)).get
        (p, Namespaces(prefixes + (p -> expansion)))
    }

  /** CURIE -> full URI as a Column op. Unknown prefixes pass through. */
  def expand(c: Column): Column =
    prefixes.foldLeft(c) { case (acc, (p, exp)) =>
      when(c.startsWith(p + ":"), concat(lit(exp), c.substr(lit(p.length + 2), length(c))))
        .otherwise(acc)
    }

  /** Full URI -> CURIE as a Column op; longest expansion wins. */
  def contract(c: Column): Column = {
    val byLen = prefixes.toSeq.sortBy { case (_, exp) => -exp.length }
    byLen.foldRight(c) { case ((p, exp), acc) =>
      when(c.startsWith(exp), concat(lit(p + ":"), c.substr(lit(exp.length + 1), length(c))))
        .otherwise(acc)
    }
  }
}

object Namespaces {
  val empty: Namespaces = Namespaces(Map.empty)
}
