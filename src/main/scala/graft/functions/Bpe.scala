package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Merge-rule BYTE-level byte-pair encoding (x19) — the REAL BPE the
  * x17 greedy longest-match stood in for, in the GPT-2/tiktoken lineage:
  * merges operate on UTF-8 BYTES with byte fallback, so no out-of-
  * vocabulary input exists — ANY byte string tokenizes and round-trips.
  * Two halves, both against the public algorithm (Sennrich et al. 2016;
  * Radford et al. 2019 for the byte-level alphabet; the encoder uses
  * the rank-priority merge order modern BPE tokenizers apply):
  *
  *  - [[BpeTrainer]]: learn merge rules from a word-frequency table —
  *    count adjacent byte-symbol pairs weighted by word frequency,
  *    merge the most frequent pair everywhere (ties broken
  *    lexicographically so training is deterministic on any engine),
  *    repeat.
  *  - [[BpeVocab]]: apply the SHIPPED rules
  *    (`resources/graft/bpe_merges.txt`, trained once on a bounded
  *    sample — see BpeTrain's scaladoc for the exact invocation) by
  *    rank priority: repeatedly merge the LOWEST-ranked adjacent pair,
  *    leftmost on ties, one merge per step, until no rule applies.
  *
  * In the JVM a symbol is a latin-1 string (one char per byte, 0-255 —
  * concatenation and hashing stay native); in the resource and in the
  * oracle SQL a symbol is its lowercase-hex byte form, so the DuckDB
  * replay slices `lower(hex(encode(w)))` into 2-char units and the two
  * engines agree on EVERY byte sequence (no code-point-indexing
  * divergence is possible).
  *
  * The rank-priority encoder is deliberately chosen over "replay the
  * training merges in order" because it is per-word deterministic, O(L²)
  * bounded, and expressible in plain SQL: the x19 oracle replays it in a
  * DuckDB recursive CTE (rank list → `list_min` → leftmost
  * `list_position` → slice-merge) per DISTINCT word, so the gate
  * hash-checks real BPE token accounting end to end. Whitespace
  * separates (the RE2 `\s` class every text gate uses) and is free;
  * any BYTE is a base symbol — the byte-fallback property that makes
  * BPE total.
  */
object BpeVocab {

  /** A word's UTF-8 bytes as a latin-1 string: one char per byte. */
  @inline private[graft] def byteString(word: String): String =
    new String(word.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      java.nio.charset.StandardCharsets.ISO_8859_1)

  /** Lowercase-hex form of a byte-symbol — the resource and oracle-SQL
    * representation of the latin-1 JVM form.
    */
  private[graft] def hexOf(sym: String): String = {
    val sb = new java.lang.StringBuilder(sym.length * 2)
    var i = 0
    while (i < sym.length) {
      val b = sym.charAt(i).toInt
      require(b < 256, s"not a byte symbol: '$sym'")
      sb.append(Character.forDigit(b >> 4, 16))
      sb.append(Character.forDigit(b & 15, 16))
      i += 1
    }
    sb.toString
  }

  private def unhex(h: String): String = {
    require(h.length >= 2 && h.length % 2 == 0 &&
      h.forall(c => (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f')),
      s"malformed hex symbol: '$h'")
    val sb = new java.lang.StringBuilder(h.length / 2)
    var i = 0
    while (i < h.length) {
      sb.append(Integer.parseInt(h.substring(i, i + 2), 16).toChar)
      i += 2
    }
    sb.toString
  }

  /** Merge rules in rank order, from the shipped resource: one
    * `left right` pair of lowercase-hex byte symbols per line,
    * comments/blanks dropped; decoded to the latin-1 JVM form.
    */
  lazy val merges: IndexedSeq[(String, String)] = {
    val in = getClass.getResourceAsStream("/graft/bpe_merges.txt")
    require(in != null, "shipped BPE merges resource missing")
    try {
      scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
        .map { l =>
          val i = l.indexOf(' ')
          require(i > 0 && i < l.length - 1, s"malformed merge rule: '$l'")
          (unhex(l.substring(0, i)), unhex(l.substring(i + 1)))
        }.toIndexedSeq
    } finally in.close()
  }

  lazy val rank: Map[(String, String), Int] =
    merges.zipWithIndex.toMap

  /** ASCII whitespace = RE2 `\s` (the [[SubwordVocab]] contract: space,
    * tab, LF, FF, CR — never VT, which Java's `\s` would include but
    * the oracle's RE2 `\s` does not).
    */
  @inline private def isAsciiWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r'

  /** The merge loop is O(L²) in word length: a word longer than this
    * (UTF-8 BYTES) is charged one token per byte instead — crawl text
    * carries multi-megabyte unbroken tokens (base64 blobs, minified JS)
    * that would otherwise stall an executor, and no natural-language
    * word is 256 bytes. The oracle replays the identical cap
    * (`octet_length(w) > 256` in DuckDB counts UTF-8 bytes too).
    */
  final val MaxWordLen = 256

  /** BPE token count of one word (no whitespace inside): start from
    * single UTF-8 bytes, repeatedly merge the lowest-ranked adjacent
    * pair (leftmost on ties) until none has a rank.
    */
  def encodeCount(word: String): Int = encodeCount(word, rank)

  /** Same, under an explicit rank table (spec injection point). */
  def encodeCount(word: String, rank: Map[(String, String), Int]): Int = {
    val bs = byteString(word)
    val n = bs.length
    if (n <= 1 || n > MaxWordLen) return n
    val syms = new Array[String](n)
    var k = 0
    while (k < n) { syms(k) = String.valueOf(bs.charAt(k)); k += 1 }
    var len = n
    var continue = true
    while (continue && len > 1) {
      var best = Int.MaxValue
      var bestPos = -1
      var j = 0
      while (j < len - 1) {
        val r = rank.getOrElse((syms(j), syms(j + 1)), Int.MaxValue)
        if (r < best) { best = r; bestPos = j }
        j += 1
      }
      if (bestPos < 0) continue = false
      else {
        syms(bestPos) = syms(bestPos) + syms(bestPos + 1)
        var m = bestPos + 1
        while (m < len - 1) { syms(m) = syms(m + 1); m += 1 }
        len -= 1
      }
    }
    len
  }

  /** Final SYMBOLS of one word under the rank-priority merge order —
    * the same loop as [[encodeCount]] but keeping the strings, for
    * consumers that materialize tokens (p06's id stream). Words over
    * [[MaxWordLen]] bytes return their bytes unmerged (the same cap,
    * same both-engines contract as the count path).
    */
  def encodeSyms(word: String): Array[String] = {
    val bs = byteString(word)
    val syms = Array.tabulate(bs.length)(i => String.valueOf(bs.charAt(i)))
    if (syms.length <= 1 || syms.length > MaxWordLen) return syms
    var len = syms.length
    var continue = true
    while (continue && len > 1) {
      var best = Int.MaxValue
      var bestPos = -1
      var j = 0
      while (j < len - 1) {
        val r = rank.getOrElse((syms(j), syms(j + 1)), Int.MaxValue)
        if (r < best) { best = r; bestPos = j }
        j += 1
      }
      if (bestPos < 0) continue = false
      else {
        syms(bestPos) = syms(bestPos) + syms(bestPos + 1)
        var m = bestPos + 1
        while (m < len - 1) { syms(m) = syms(m + 1); m += 1 }
        len -= 1
      }
    }
    java.util.Arrays.copyOf(syms, len)
  }

  /** Token → id, pure arithmetic so any engine replays it: a
    * single-byte token's id IS its byte value (0-255 — the
    * byte-fallback alphabet needs no shipped table, GPT-2-style); a
    * merge product's id is 256 + its first rank in the shipped rules
    * (disjoint from bytes; "first" because two rules can in principle
    * produce the same byte string). Every multi-byte token the encoder
    * emits is a merge product by construction, so the lookup is total
    * — no OOV exists.
    */
  lazy val productId: Map[String, Int] = {
    val m = scala.collection.mutable.HashMap[String, Int]()
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      val p = l + r
      if (!m.contains(p)) m(p) = i
    }
    m.toMap
  }

  /** One id past every assignable token id: the end-of-document
    * sentinel training pipelines append between concatenated docs.
    */
  lazy val EosId: Long = 256L + merges.length

  def idOf(token: String): Long =
    if (token.length == 1) token.charAt(0).toLong
    else productId.get(token) match {
      case Some(r) => 256L + r
      case None => throw new IllegalArgumentException(
        s"graft: token '${hexOf(token)}' is neither a byte nor a merge product")
    }

  // words repeat massively in a corpus: memoize per-word counts. The
  // cache is cleared (not LRU-evicted) at the cap — bounded memory on
  // any executor, amortized O(1) on real text.
  private val memo = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  private val idMemo = new java.util.concurrent.ConcurrentHashMap[String, Array[Long]]()
  private val MemoCap = 1 << 16

  private def idsOfWord(w: String): Array[Long] = {
    if (w.length > MaxWordLen * 2) return encodeSyms(w).map(idOf)
    var ids = idMemo.get(w)
    if (ids == null) {
      if (idMemo.size() >= MemoCap) idMemo.clear()
      ids = encodeSyms(w).map(idOf)
      idMemo.put(w, ids)
    }
    ids
  }

  /** Whole-text BPE token IDS (lowercased, whitespace-separated — the
    * [[count]] contract); called from codegen. One flat array per
    * document, NO end-of-document sentinel (the query appends
    * [[EosId]] so the packing boundary stays visible in the plan).
    */
  def tokenIds(s: UTF8String): GenericArrayData = {
    val str = s.toString.toLowerCase(java.util.Locale.ROOT)
    val out = new scala.collection.mutable.ArrayBuffer[Long](str.length / 4 + 4)
    var pos = 0
    val len = str.length
    while (pos < len) {
      if (isAsciiWs(str.charAt(pos))) pos += 1
      else {
        var end = pos
        while (end < len && !isAsciiWs(str.charAt(end))) end += 1
        out ++= idsOfWord(str.substring(pos, end))
        pos = end
      }
    }
    new GenericArrayData(out.toArray)
  }

  /** Whole-text BPE token count; called from codegen. */
  def count(s: UTF8String): Long = {
    val str = s.toString.toLowerCase(java.util.Locale.ROOT)
    var total = 0L
    var pos = 0
    val len = str.length
    while (pos < len) {
      if (isAsciiWs(str.charAt(pos))) pos += 1
      else {
        var end = pos
        while (end < len && !isAsciiWs(str.charAt(end))) end += 1
        val w = str.substring(pos, end)
        // capped-length words bypass the memo: their count is O(1) to
        // recompute and their keys would dominate cache memory
        if (w.length > MaxWordLen * 2) total += encodeCount(w)
        else {
          var c = memo.get(w)
          if (c == null) {
            if (memo.size() >= MemoCap) memo.clear()
            c = Integer.valueOf(encodeCount(w))
            memo.put(w, c)
          }
          total += c.intValue()
        }
        pos = end
      }
    }
    total
  }
}

/** Learn BPE merge rules from a word-frequency table — the classic
  * algorithm: count adjacent symbol pairs across all words (weighted by
  * word frequency), merge the most frequent pair in every word
  * (left-to-right, non-overlapping), repeat. Deterministic by
  * construction: ties break on the lexicographically smallest (left,
  * right) pair, independent of hash-map iteration order; training stops
  * at `numMerges` rules or when no pair occurs at least twice.
  */
object BpeTrainer {

  def train(wordFreq: Seq[(String, Long)], numMerges: Int): IndexedSeq[(String, String)] = {
    // words as symbol arrays (UTF-8 bytes in the latin-1 JVM form),
    // paired with their frequency
    var words: Array[(Array[String], Long)] = wordFreq.iterator.map { case (w, f) =>
      val bs = BpeVocab.byteString(w)
      (Array.tabulate(bs.length)(i => String.valueOf(bs.charAt(i))), f)
    }.toArray
    val out = IndexedSeq.newBuilder[(String, String)]
    var made = 0
    var continue = true
    while (continue && made < numMerges) {
      val counts = new scala.collection.mutable.HashMap[(String, String), Long]()
      words.foreach { case (syms, f) =>
        var j = 0
        while (j < syms.length - 1) {
          val p = (syms(j), syms(j + 1))
          counts.update(p, counts.getOrElse(p, 0L) + f)
          j += 1
        }
      }
      if (counts.isEmpty) continue = false
      else {
        // deterministic argmax: max frequency, then smallest (l, r)
        var best: (String, String) = null
        var bestF = 0L
        counts.foreach { case (p, f) =>
          if (f > bestF || (f == bestF && best != null &&
              (p._1 < best._1 || (p._1 == best._1 && p._2 < best._2)))) {
            best = p; bestF = f
          }
        }
        if (bestF < 2L) continue = false
        else {
          out += best
          made += 1
          words = words.map { case (syms, f) =>
            if (syms.length < 2) (syms, f)
            else {
              val b = IndexedSeq.newBuilder[String]
              var j = 0
              while (j < syms.length) {
                if (j < syms.length - 1 && syms(j) == best._1 && syms(j + 1) == best._2) {
                  b += syms(j) + syms(j + 1); j += 2
                } else { b += syms(j); j += 1 }
              }
              (b.result().toArray, f)
            }
          }
        }
      }
    }
    out.result()
  }
}

/** BPE token count of a string under the shipped merge rules —
  * rank-priority merge, codegen'd (a static JVM call inside whole-stage
  * codegen, no UDF boxing).
  */
case class BpeTokenCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_bpe_tokens"
  override def nullSafeEval(input: Any): Any =
    BpeVocab.count(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val bv = classOf[BpeVocab.type].getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $bv.count($s);"
    })
  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

/** BPE token IDS of a string under the shipped merge rules — the
  * materializing sibling of [[BpeTokenCount]] (same tokenizer contract:
  * lowercase, ASCII-whitespace words, rank-priority merges, the
  * [[BpeVocab.MaxWordLen]] cap): one flat long array of ids per
  * document, byte ids below 256 and merge-product ids above (see
  * [[BpeVocab.idOf]]). Codegen'd, per-row, per-word memoized.
  */
case class BpeTokenIds(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_bpe_ids"
  override def nullSafeEval(input: Any): Any =
    BpeVocab.tokenIds(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val bv = classOf[BpeVocab.type].getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $bv.tokenIds($s);"
    })
  override protected def withNewChildInternal(newChild: Expression): BpeTokenIds =
    copy(child = newChild)
}
