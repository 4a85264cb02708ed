package graft.functions

/** The classic lowest-rank-first BPE apply loop, shared by the
  * counting ([[BpeCount]]) and encoding ([[BpeEncodeIds]]) kernels so
  * the two can never disagree on segmentation. Semantics and the
  * equivalence to rank-order sweeps (the SQL oracle's shape) are
  * documented on [[BpeCount]]. */
object BpeRuntime {

  /** Trained-table well-formedness: each merge's components must be a
    * base character or an EARLIER merge's merged symbol — exactly the
    * property a real BPE training run guarantees, and the property
    * that makes the classic lowest-rank-first loop equivalent to the
    * rank-order sweep (the SQL oracle's semantics). A hand-written
    * table violating it — a merge consuming a symbol only a LATER
    * rank creates, e.g. ((a,bc),(b,c)) — would make the two loops
    * silently disagree, so it is rejected at expression construction. */
  def requireTrainedShape(merges: Array[Array[String]]): Unit = {
    val known = scala.collection.mutable.HashSet.empty[String]
    var r = 0
    while (r < merges.length) {
      val m = merges(r)
      Seq(m(0), m(1)).foreach { s =>
        require(s.length == 1 || known.contains(s),
          s"merge $r (${m(0)}, ${m(1)}): component '$s' is neither a single character " +
            "nor an earlier merge's symbol — not a trained-table shape, and the classic " +
            "loop would diverge from the rank-order sweep the SQL oracle runs")
      }
      // distinct merged STRINGS, for BOTH kernels: two merges producing
      // the same string (e.g. (a,bc) and (ab,c) → "abc") would break
      // string-keyed symbol identity — the property the classic-loop ≡
      // rank-sweep equivalence argument (and BpeEncodeIds's id map)
      // rests on. A real training run can't emit such a table (a pair
      // that already merged has count 0), so reject it here.
      require(!known.contains(m(2)),
        s"merge $r (${m(0)}, ${m(1)}): merged symbol '${m(2)}' duplicates an earlier " +
          "merge's — string-keyed symbol identity would be ambiguous")
      known += m(2)
      r += 1
    }
  }

  /** Word → its UTF-8 bytes as a char-per-byte string — the BYTE-BASE
    * symbol alphabet shared by the counting and encoding kernels (so
    * `size(bpe_encode_bytes(ws)) == bpe_count_bytes(ws)` holds for ANY
    * text, not just single-byte). ASCII — the overwhelming case — maps
    * to itself, zero-copy. */
  def toByteChars(w: String): String = {
    var i = 0
    var ascii = true
    while (i < w.length && ascii) { if (w.charAt(i) >= 0x80) ascii = false; i += 1 }
    if (ascii) w
    else {
      val bs = w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val sb = new java.lang.StringBuilder(bs.length)
      var j = 0
      while (j < bs.length) { sb.append((bs(j) & 0xff).toChar); j += 1 }
      sb.toString
    }
  }

  /** Byte-base table well-formedness: every symbol is a byte string —
    * a char above 0xFF could never match any input symbol (inputs are
    * UTF-8 bytes via [[toByteChars]]), so reject it loudly up front. */
  def requireByteSymbols(merges: Array[Array[String]]): Unit =
    merges.zipWithIndex.foreach { case (m, r) =>
      m.foreach { s =>
        require(s.forall(_ <= 'ÿ'),
          s"merge $r: symbol '$s' carries a char above 0xFF — byte-level symbols " +
            "are byte strings (train on byte-mapped text, or use byteBase = false)")
      }
    }

  /** pair → rank lookup keyed by the (a, b) PAIR itself, not a joined
    * string: the byte-level base admits every single-byte char —
    * including any would-be separator — as a symbol, so no join
    * character is collision-free. putIfAbsent keeps the LOWEST rank
    * should a table ever repeat a pair. */
  def rankMap(merges: Array[Array[String]]): java.util.HashMap[(String, String), Integer] = {
    val m = new java.util.HashMap[(String, String), Integer](merges.length * 2)
    var i = 0
    while (i < merges.length) {
      m.putIfAbsent((merges(i)(0), merges(i)(1)), Integer.valueOf(i))
      i += 1
    }
    m
  }

  /** One word → its final symbol sequence under the merges table:
    * repeatedly find the lowest-rank adjacent pair present and apply
    * one left-to-right non-overlapping sweep of it. O(len²) hash
    * lookups per word — independent of the table size. */
  def encodeWord(w: String, merges: Array[Array[String]],
                 rank: java.util.HashMap[(String, String), Integer]): java.util.ArrayList[String] = {
    var cur = new java.util.ArrayList[String](w.length)
    var i = 0
    while (i < w.length) { cur.add(String.valueOf(w.charAt(i))); i += 1 }
    while (cur.size > 1) {
      var best = Integer.MAX_VALUE
      var j = 0
      while (j < cur.size - 1) {
        val r = rank.get((cur.get(j), cur.get(j + 1)))
        if (r != null && r.intValue() < best) best = r.intValue()
        j += 1
      }
      if (best == Integer.MAX_VALUE) return cur
      val a = merges(best)(0); val b = merges(best)(1); val ab = merges(best)(2)
      val out = new java.util.ArrayList[String](cur.size)
      j = 0
      while (j < cur.size) {
        val s = cur.get(j)
        if (!out.isEmpty && out.get(out.size - 1) == a && s == b)
          out.set(out.size - 1, ab) // merged symbol can't re-match: ab != a
        else out.add(s)
        j += 1
      }
      cur = out
    }
    cur
  }
}
