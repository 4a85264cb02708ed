package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native tokenizer for the shared `TextAnalysis.words` normalization —
  * THE hottest kernel in the repo: every text operator (langid,
  * quality, dedup shingles, BPE feeds, the KMV/frequency stats) runs
  * it once per document, and the r14 component probe showed the
  * regex formulation (`filter(split(regexp_replace(lower(text),
  * "[^a-z0-9 ]", " "), " "), _ =!= "")`) IS the corpus pass's floor —
  * three full string rewrites plus a regex engine per document.
  *
  * This expression computes the IDENTICAL result in one byte scan:
  * lowercase via `UTF8String.toLowerCase` (the exact function Spark's
  * `Lower` applies, so case mapping cannot diverge), then maximal runs
  * of ASCII `[a-z0-9]` BYTES become the words. Byte-run splitting
  * equals the regex's code-point splitting because UTF-8 multi-byte
  * code points contain no byte < 0x80 — every byte of a non-ASCII
  * char is a separator byte exactly as the char itself is a separator
  * code point under `[^a-z0-9 ]` → ' '. Empty tokens never arise
  * (runs are maximal by construction), matching the `filter`.
  * Equivalence is property-spec-pinned against the regex formulation
  * on arbitrary strings including multi-byte text. */
case class AlnumWords(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "alnum_words"

  private def isAlnum(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')

  /** codegen + interpreted entry point */
  def evalUtf8(s: UTF8String): ArrayData = {
    val lower = s.toLowerCase
    val bytes = lower.getBytes
    val n = bytes.length
    // count runs first: one exact-sized array, no growable buffer churn
    var runs = 0
    var i = 0
    while (i < n) {
      if (isAlnum(bytes(i))) {
        runs += 1
        while (i < n && isAlnum(bytes(i))) i += 1
      } else i += 1
    }
    val out = new Array[AnyRef](runs)
    var r = 0
    i = 0
    while (i < n) {
      if (isAlnum(bytes(i))) {
        val start = i
        while (i < n && isAlnum(bytes(i))) i += 1
        out(r) = UTF8String.fromBytes(bytes, start, i - start)
        r += 1
      } else i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = evalUtf8(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("alnumWords", this, classOf[AlnumWords].getName)
    nullSafeCodeGen(ctx, ev,
      v => s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.evalUtf8($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native word-n-gram builder — the second half of the tokenize floor
  * (after [[AlnumWords]] removed the regex, the declarative
  * `transform(sequence(…), i => concat_ws(" ", slice(ws, …)))` was
  * what remained of the corpus pass: a lambda frame, a slice array,
  * and a concat per GRAM). One pass over the word array,
  * space-joining each window with `UTF8String.concatWs` — the exact
  * join `concat_ws(" ", …)` performs, so gram strings (and therefore
  * every shingle/hash downstream) are bit-identical; arrays shorter
  * than n yield the empty array, matching the declarative guard.
  * Property-spec-pinned against the declarative formulation. */
case class NgramsJoin(child: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(n >= 1, s"ngrams_join needs n >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ngrams_join"

  @transient private lazy val space = UTF8String.fromString(" ")

  /** codegen + interpreted entry point */
  def evalArr(a: ArrayData): ArrayData = {
    val m = a.numElements()
    if (m < n) return new GenericArrayData(new Array[AnyRef](0))
    val words = new Array[UTF8String](m)
    var i = 0
    while (i < m) { words(i) = a.getUTF8String(i); i += 1 }
    val out = new Array[AnyRef](m - n + 1)
    val window = new Array[UTF8String](n)
    i = 0
    while (i <= m - n) {
      var j = 0
      while (j < n) { window(j) = words(i + j); j += 1 }
      out(i) = UTF8String.concatWs(space, window: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = evalArr(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("ngramsJoin", this, classOf[NgramsJoin].getName)
    nullSafeCodeGen(ctx, ev,
      v => s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.evalArr($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native whitespace tokenizer ≡ `regexp_extract_all(text, '\S+')` —
  * the other per-document regex in the hot paths (byte-level BPE
  * feeds, packers, source caps). Java's `\s` without
  * UNICODE_CHARACTER_CLASS is exactly { ' ', \t, \n, \x0B, \f, \r } —
  * all single ASCII bytes — so maximal runs of every OTHER byte
  * reproduce the regex's maximal `\S+` code-point runs: multi-byte
  * code points are `\S` and their bytes are all ≥ 0x80, never a
  * separator. Property-spec-pinned against the regex formulation. */
case class WsWords(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ws_words"

  private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** codegen + interpreted entry point */
  def evalUtf8(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    var runs = 0
    var i = 0
    while (i < n) {
      if (!isSpace(bytes(i))) {
        runs += 1
        while (i < n && !isSpace(bytes(i))) i += 1
      } else i += 1
    }
    val out = new Array[AnyRef](runs)
    var r = 0
    i = 0
    while (i < n) {
      if (!isSpace(bytes(i))) {
        val start = i
        while (i < n && !isSpace(bytes(i))) i += 1
        out(r) = UTF8String.fromBytes(bytes, start, i - start)
        r += 1
      } else i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = evalUtf8(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("wsWords", this, classOf[WsWords].getName)
    nullSafeCodeGen(ctx, ev,
      v => s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.evalUtf8($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native hashed BIGRAM-bucket pair builder — the bigram-LM family's
  * hot loop (x20/x22: train + both scorers walk every (prev, cur)
  * token pair of the corpus). The declarative route paid, per pair
  * position, a struct-building lambda transform PLUS two full
  * `tokenBucket` chains — md5 → 32-char HEX STRING → substring → conv
  * → mod — hashing every token TWICE (once as `cur`, once as the next
  * position's `prev`). This expression hashes each token ONCE
  * (binary digest head, no hex round-trip — the Md5Head32 lesson) and
  * carries the previous bucket forward in a register, emitting the
  * same array<struct<pb, cb>> the explode consumes.
  *
  * Bit-exact equivalence (property-spec-pinned): `tokenBucket` =
  * `conv(substring(md5(tok), 1, 8), 16, 10) % buckets` — the first 8
  * hex chars ARE the digest's first 4 bytes as an unsigned 32-bit
  * value, exactly [[Md5Head32]]'s packing; both sides are
  * non-negative so `%` agrees. Position 0 gets pb = −1, the BOS
  * context `coalesce(tokenBucket(NULL), −1)` produced. */
case class BigramBuckets(child: Expression, buckets: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(buckets >= 1, s"bigram_buckets needs buckets >= 1, got $buckets")

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("pb", org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("cb", org.apache.spark.sql.types.LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "bigram_buckets"

  @transient private lazy val digests =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** codegen + interpreted entry point */
  def evalArr(a: ArrayData): ArrayData = {
    val m = a.numElements()
    val md = digests.get()
    val out = new Array[AnyRef](m)
    var prev = -1L
    var i = 0
    while (i < m) {
      // non-null-element contract, LOUD: the feeds are words()/wsWords
      // arrays (containsNull = false); the declarative twin maps a null
      // token to a NULL bucket, a semantics nothing downstream wants —
      // silently diverging here would break the spec-pinned equivalence
      require(!a.isNullAt(i),
        s"bigram_buckets requires a null-free token array (null at $i)")
      md.reset()
      val d = md.digest(a.getUTF8String(i).getBytes)
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      val cb = h % buckets
      out(i) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](prev, cb))
      prev = cb
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = evalArr(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bigramBuckets", this, classOf[BigramBuckets].getName)
    nullSafeCodeGen(ctx, ev,
      v => s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.evalArr($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextKernels {

  /** Whitespace-token array ≡ `regexp_extract_all(text, '\S+')`, one
    * byte scan (see [[WsWords]]). */
  def wsWords(text: Column): Column =
    ColumnBridge.column(WsWords(ColumnBridge.expr(text)))

  /** Lower-cased alnum word array ≡ the regex formulation, one byte
    * scan (see [[AlnumWords]]). */
  def alnumWords(text: Column): Column =
    ColumnBridge.column(AlnumWords(ColumnBridge.expr(text)))

  /** Space-joined word n-grams ≡ the transform/slice/concat_ws
    * formulation, one pass (see [[NgramsJoin]]). */
  def ngramsJoin(ws: Column, n: Int): Column =
    ColumnBridge.column(NgramsJoin(ColumnBridge.expr(ws), n))

  /** Hashed (prev, cur) bigram-bucket pairs ≡ the declarative
    * transform + double-tokenBucket formulation, one hash per token
    * (see [[BigramBuckets]]). */
  def bigramBuckets(ws: Column, buckets: Int): Column =
    ColumnBridge.column(BigramBuckets(ColumnBridge.expr(ws), buckets))
}
