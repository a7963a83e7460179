package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared md5-derived hashing used by the native text kernels.
  *
  * Exactly mirrors the portable convention of [[graft.functions.Hashing]]:
  * `h60(s)` = first 15 hex chars of md5(utf8(s)) as a 60-bit long — i.e.
  * the top 60 bits of the digest — and `h60p = h60 mod 1000000007`. Both
  * Spark's `conv(substring(md5(x),1,15),16,10)` and DuckDB's
  * `('0x'||substr(md5(x),1,15))::BIGINT` compute the same value, so
  * operators built on these kernels stay oracle-checkable.
  */
object TextHash {
  val P: Long = graft.functions.Hashing.P

  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5 of the exact bytes. */
  def h60Bytes(bytes: Array[Byte], offset: Int, len: Int): Long = {
    val d = md.get()
    d.reset()
    d.update(bytes, offset, len)
    val out = d.digest()
    // first 15 hex chars = top 7.5 bytes = big-endian first-8-bytes >>> 4
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (out(i) & 0xffL); i += 1 }
    v >>> 4
  }

  def h60(s: UTF8String): Long = {
    val b = s.getBytes
    h60Bytes(b, 0, b.length)
  }

  /** Sorted distinct `h60p` hashes of the word-2-gram shingles of `text`.
    * Tokenization: split on single space, drop empties (Text.tokens);
    * shingle string = tok(i) + " " + tok(i+1). Fewer than 2 tokens →
    * empty array. One narrow pass per document: no explode, no shuffle. */
  def shingleHashes(text: UTF8String): Array[Long] = {
    val toks = tokenize(text)
    if (toks.length < 2) return Array.emptyLongArray
    val n = toks.length - 1
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      val sh = toks(i) + " " + toks(i + 1)
      val b = sh.getBytes("UTF-8")
      hs(i) = h60Bytes(b, 0, b.length) % P
      i += 1
    }
    java.util.Arrays.sort(hs)
    // in-place dedup of the sorted array
    var w = 1
    var r = 1
    while (r < n) {
      if (hs(r) != hs(w - 1)) { hs(w) = hs(r); w += 1 }
      r += 1
    }
    if (w == n) hs else java.util.Arrays.copyOf(hs, w)
  }

  /** 32-bit SimHash over md5 token hashes: every token OCCURRENCE votes
    * ±1 per bit (bit j of h60 set → +1), bit set iff vote sum > 0.
    * Exactly the fused form of explode(tokens) → h60 → 32 sign-sums. */
  def simhash32(text: UTF8String): Long = {
    val toks = tokenize(text)
    val votes = new Array[Int](32)
    var i = 0
    while (i < toks.length) {
      val b = toks(i).getBytes("UTF-8")
      val h = h60Bytes(b, 0, b.length)
      var j = 0
      while (j < 32) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var sim = 0L
    var j = 0
    while (j < 32) {
      if (votes(j) > 0) sim |= 1L << j
      j += 1
    }
    sim
  }

  /** Hashing-trick embedder weights: every token OCCURRENCE votes ±1 into
    * slot `h60(token) % dim` with sign from bit 5 of the hash — the fused
    * form of explode(tokens) → (slot, sign) → two groupBy shuffles.
    * Returns the dense int64 weight vector; Σw² (the squared norm) stays
    * exact int64 downstream. */
  def hashEmbed(text: UTF8String, dim: Int): Array[Long] = {
    val toks = tokenize(text)
    val w = new Array[Long](dim)
    var i = 0
    while (i < toks.length) {
      val b = toks(i).getBytes("UTF-8")
      val h = h60Bytes(b, 0, b.length)
      val slot = (h % dim).toInt
      w(slot) += ((h >>> 5) & 1L) * 2L - 1L
      i += 1
    }
    w
  }

  /** Sorted distinct winnowing fingerprints (Schleimer et al. 2003):
    * h60p hashes of the word-`k`-grams in positional order, then the
    * minimum hash of every sliding window of `w` grams, deduplicated.
    * The window minima run through a monotonic deque — O(n) total, one
    * narrow pass per document, vs the interpreted HOF chain's O(n·w)
    * array slicing with per-gram expression-tree md5 (measured 154 s →
    * sub-second at sf0.1). Same gram string ("a b c") and same
    * md5-mod-P math as the SQL oracle. */
  def winnow(text: UTF8String, k: Int, w: Int): Array[Long] = {
    val toks = tokenize(text)
    if (toks.length < k + w - 1) return Array.emptyLongArray
    val nGrams = toks.length - k + 1
    val gh = new Array[Long](nGrams)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < nGrams) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val b = sb.toString.getBytes("UTF-8")
      gh(i) = h60Bytes(b, 0, b.length) % P
      i += 1
    }
    val nWin = nGrams - w + 1
    val mins = new Array[Long](nWin)
    // monotonic deque of gram indices with increasing hash values
    val dq = new Array[Int](nGrams)
    var head = 0
    var tail = 0 // exclusive
    i = 0
    while (i < nGrams) {
      while (tail > head && gh(dq(tail - 1)) >= gh(i)) tail -= 1
      dq(tail) = i; tail += 1
      if (dq(head) <= i - w) head += 1
      if (i >= w - 1) mins(i - w + 1) = gh(dq(head))
      i += 1
    }
    java.util.Arrays.sort(mins)
    var wr = 1
    var r = 1
    while (r < nWin) {
      if (mins(r) != mins(wr - 1)) { mins(wr) = mins(r); wr += 1 }
      r += 1
    }
    if (wr == nWin) mins else java.util.Arrays.copyOf(mins, wr)
  }

  /** Positional `h60p` hashes of the word-k-grams of `text`, in document
    * order (index i = gram starting at token i; NOT deduplicated — the
    * position is the payload). Same gram string ("a b c") and md5-mod-P
    * math as [[winnow]]'s first stage and the SQL oracle. Fewer than k
    * tokens → empty array. One narrow pass per document. */
  def posGrams(text: UTF8String, k: Int): Array[Long] = {
    val toks = tokenize(text)
    if (toks.length < k) return Array.emptyLongArray
    val nGrams = toks.length - k + 1
    val gh = new Array[Long](nGrams)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < nGrams) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val b = sb.toString.getBytes("UTF-8")
      gh(i) = h60Bytes(b, 0, b.length) % P
      i += 1
    }
    gh
  }

  /** Token-window chunks of `text` (TextProcessor.py:34-48 semantics):
    * tokenize (split on single space, drop empties), slide a `size`-token
    * window advancing by `step` tokens, emit every window whose start is
    * inside the token array, each re-joined with single spaces. One pass
    * per row with a single StringBuilder — the transform(sequence, slice,
    * array_join) chain computing the same thing is CodegenFallback and
    * re-materializes a sliced token array per window. Empty text → empty
    * array, matching the reference while-loop that never enters. */
  def chunks(text: UTF8String, size: Int, step: Int): Array[UTF8String] = {
    val toks = tokenize(text)
    if (toks.length == 0) return Array.empty
    val n = (toks.length + step - 1) / step
    val out = new Array[UTF8String](n)
    val sb = new java.lang.StringBuilder
    var w = 0
    var start = 0
    while (start < toks.length) {
      sb.setLength(0)
      val end = math.min(start + size, toks.length)
      var j = start
      while (j < end) {
        if (j > start) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      out(w) = UTF8String.fromString(sb.toString)
      w += 1
      start += step
    }
    out
  }

  /** Rolling document fingerprint: fold `acc ← (acc·31 + h60p(token))
    * mod P` over the space-separated tokens, acc₀ = 0 — the exact
    * `aggregate(transform(tokens, h60p), …)` chain of D4, fused into one
    * per-row pass (the interpreted fold ran an md5 expression tree per
    * token). No overflow: acc < P ≈ 10⁹ so acc·31 + h < 3.2·10¹⁰. */
  def rollingFp(text: UTF8String): Long = {
    val toks = tokenize(text)
    var acc = 0L
    var i = 0
    while (i < toks.length) {
      val b = toks(i).getBytes("UTF-8")
      acc = (acc * 31L + h60Bytes(b, 0, b.length) % P) % P
      i += 1
    }
    acc
  }

  private val markerSets =
    new java.util.concurrent.ConcurrentHashMap[String, Array[java.util.HashSet[String]]]()

  /** Parsed form of a marker-set spec "a,b;c,d" — cached per distinct
    * spec string, shared by every task in the JVM. */
  def parseMarkerSets(spec: String): Array[java.util.HashSet[String]] =
    markerSets.computeIfAbsent(spec, { sp =>
      sp.split(";", -1).map { group =>
        val set = new java.util.HashSet[String]()
        group.split(",", -1).foreach(m => if (m.nonEmpty) set.add(m))
        set
      }
    })

  /** Per-set token hit counts: `out(i)` = number of token OCCURRENCES of
    * `text` that belong to marker set i of `spec`. One tokenize pass per
    * row shared by every set — the `size(filter(tokens, isInCollection))`
    * column this fuses re-tokenized the text once PER LANGUAGE. */
  def tokenSetHits(text: UTF8String, spec: String): Array[Long] = {
    val sets = parseMarkerSets(spec)
    val toks = tokenize(text)
    val out = new Array[Long](sets.length)
    var i = 0
    while (i < toks.length) {
      var j = 0
      while (j < sets.length) {
        if (sets(j).contains(toks(i))) out(j) += 1
        j += 1
      }
      i += 1
    }
    out
  }

  /** Gopher quality-rule statistics (Rae et al. 2021, A1.1 MassiveWeb
    * filtering) in ONE pass over the text:
    * [n_words, sum_word_chars, n_alpha_words, n_symbol_words,
    *  n_lines, n_bullet_lines, n_ellipsis_lines, n_stop_types].
    * Words = space tokens (same tokenizer as every text kernel);
    * alpha word = contains an ASCII letter; symbol word = contains '#'
    * or "..."; lines split on '\n' (empty lines kept — they are lines);
    * bullet line starts with "- " or "* "; ellipsis line ends with
    * "..."; stop types = how many DISTINCT Gopher stop words
    * {the,be,to,of,and,that,have,with} occur as tokens. */
  def gopherStats(text: UTF8String): Array[Long] = {
    val s = text.toString
    val out = new Array[Long](8)
    val toks = tokenize(text)
    out(0) = toks.length
    var stopMask = 0
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      out(1) += t.codePointCount(0, t.length)
      var alpha = false
      var j = 0
      while (j < t.length && !alpha) {
        val c = t.charAt(j)
        if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')) alpha = true
        j += 1
      }
      if (alpha) out(2) += 1
      if (t.indexOf('#') >= 0 || t.contains("...")) out(3) += 1
      val si = GopherStops.indexOf(t)
      if (si >= 0) stopMask |= 1 << si
      i += 1
    }
    out(7) = java.lang.Integer.bitCount(stopMask)
    val lines = s.split("\n", -1)
    out(4) = lines.length
    i = 0
    while (i < lines.length) {
      val l = lines(i)
      if (l.startsWith("- ") || l.startsWith("* ")) out(5) += 1
      if (l.endsWith("...")) out(6) += 1
      i += 1
    }
    out
  }

  val GopherStops: Array[String] =
    Array("the", "be", "to", "of", "and", "that", "have", "with")

  /** Positional word bigrams ("tok(i) tok(i+1)") of `text`, in order —
    * one pass with a shared StringBuilder. The zip_with(slice, slice)
    * chain computing the same array is CodegenFallback and materializes
    * both sliced token arrays per row. */
  def wordBigrams(text: UTF8String): Array[UTF8String] = {
    val toks = tokenize(text)
    val n = toks.length - 1
    if (n <= 0) return Array.empty
    val out = new Array[UTF8String](n)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < n) {
      sb.setLength(0)
      sb.append(toks(i)).append(' ').append(toks(i + 1))
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    out
  }

  /** Word-trigram repetition stats: `[n_trigrams, n_unique]` over the
    * space-tokenized word 3-grams of `text` (trigram string = three
    * tokens joined with single spaces — Text.tokens semantics, matching
    * the SQL oracle's `toks[i]||' '||toks[i+1]||' '||toks[i+2]`). One
    * pass per row with a shared StringBuilder and an open hash set — the
    * transform(sequence, concat_ws(element_at…)) + array_distinct chain
    * computing the same two counts is CodegenFallback, and D9's rule
    * expression inlined it three times per row (measured 15 s at sf0.1
    * for the quality gate alone, vs sub-second fused). */
  def wordTriStats(text: UTF8String): Array[Long] = {
    val toks = tokenize(text)
    val n = toks.length - 2
    if (n <= 0) return Array(0L, 0L)
    val set = new java.util.HashSet[String](n * 2)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < n) {
      sb.setLength(0)
      sb.append(toks(i)).append(' ').append(toks(i + 1))
        .append(' ').append(toks(i + 2))
      set.add(sb.toString)
      i += 1
    }
    Array(n.toLong, set.size.toLong)
  }

  /** Character trigrams of `text` in order (`distinct` = true dedups and
    * sorts). One pass per row — the transform(sequence, substr) chain
    * computing the same thing is CodegenFallback and allocates one
    * expression-tree evaluation per character. */
  def charTrigrams(text: UTF8String, distinct: Boolean): Array[UTF8String] = {
    // CODEPOINT windows, not UTF-16 units — Spark's substr counts
    // characters, and a surrogate pair split in half is mojibake
    val cps = text.toString.codePoints().toArray
    val n = cps.length - 2
    if (n <= 0) return Array.empty
    if (!distinct) {
      val out = new Array[UTF8String](n)
      var i = 0
      while (i < n) {
        out(i) = UTF8String.fromString(new String(cps, i, 3)); i += 1
      }
      out
    } else {
      val set = new java.util.TreeSet[String]()
      var i = 0
      while (i < n) { set.add(new String(cps, i, 3)); i += 1 }
      val out = new Array[UTF8String](set.size)
      val it = set.iterator()
      var w = 0
      while (it.hasNext) { out(w) = UTF8String.fromString(it.next()); w += 1 }
      out
    }
  }

  /** Within-token character bigrams of `text` in document order: for each
    * space token, its two-codepoint substrings at positions 1..len−1
    * (Spark substr semantics). The fused form of explode(tokens) →
    * explode(transform(sequence, substr(i, 2))) — two Generates plus an
    * interpreted per-character HOF chain collapse into one compiled pass
    * (r14; feeds D18 textBpeMerge and, through it, D18e's merge-table
    * subquery). */
  def tokenCharBigrams(text: UTF8String): Array[UTF8String] = {
    val toks = tokenize(text)
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String]()
    var t = 0
    while (t < toks.length) {
      val tok = toks(t)
      var i = 0
      var prevStart = -1
      while (i < tok.length) {
        val cc = Character.charCount(tok.codePointAt(i))
        if (prevStart >= 0)
          out += UTF8String.fromString(tok.substring(prevStart, i + cc))
        prevStart = i
        i += cc
      }
      t += 1
    }
    out.toArray
  }

  /** D18e BPE-encode statistics over the whole document in ONE pass:
    * [n_tokens, n_chars, n_symbols, symsum]. Per token: characters are
    * codepoints (Spark `length`/`substr` semantics); the all-singles
    * checksum adds h60(char) mod 1e6 per character; the greedy
    * left-to-right merge scan starts a merge at bigram position i iff
    * the 2-codepoint substring is in the merge set and position i−1 did
    * not start one (≡ odd in-run ranks of the run decomposition); each
    * merge start counts once and shifts the checksum by
    * h60(pair) − h60(char_i) − h60(char_i+1), all mod 1e6. n_symbols =
    * n_chars − n_merges. Exactly the fused form of the old
    * explode-bigrams → join(merges) → two windows → re-join pipeline —
    * and of the interpreted fold that briefly replaced it (r14): same
    * integer arithmetic, compiled instead of per-element lambdas. */
  // h60-mod-1e6 memo for single codepoints and codepoint bigrams: the
  // checksum hash depends only on the (1- or 2-codepoint) string value,
  // and a corpus has at most |charset| + |charset bigrams| distinct keys
  // — memoizing turns one MessageDigest round-trip PER CHARACTER into a
  // map hit (measured: the md5-per-char pass dominated the whole encode
  // kernel). Key packing: (cp1 << 32) | cp2, with cp2 = 0xffffffff
  // marking a single codepoint (codepoints are ≤ 0x10FFFF, no
  // collision). Values are pure functions of the key; the size cap only
  // bounds memory on adversarial charsets (past it we just compute).
  private val hmodMemo =
    new java.util.concurrent.ConcurrentHashMap[java.lang.Long, java.lang.Long]()
  private val HmodMemoCap = 1 << 20

  private def hmodString(s: String): Long = {
    val b = s.getBytes("UTF-8")
    h60Bytes(b, 0, b.length) % 1000000L
  }

  private def hmodCp(cp: Int): Long = {
    val key = java.lang.Long.valueOf((cp.toLong << 32) | 0xffffffffL)
    val c = hmodMemo.get(key)
    if (c != null) return c.longValue()
    val v = hmodString(new String(Array(cp), 0, 1))
    if (hmodMemo.size < HmodMemoCap) hmodMemo.put(key, java.lang.Long.valueOf(v))
    v
  }

  private def hmodBigram(cp1: Int, cp2: Int): Long = {
    val key = java.lang.Long.valueOf((cp1.toLong << 32) | (cp2.toLong & 0xffffffffL))
    val c = hmodMemo.get(key)
    if (c != null) return c.longValue()
    val v = hmodString(new String(Array(cp1, cp2), 0, 2))
    if (hmodMemo.size < HmodMemoCap) hmodMemo.put(key, java.lang.Long.valueOf(v))
    v
  }

  private val mergeKeySets =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.HashSet[java.lang.Long]]()

  /** Merge pairs as packed codepoint-bigram keys (a merge pair is always
    * a 2-codepoint token substring; anything else could never match a
    * bigram and is skipped). Cached per distinct spec string. */
  def parseMergeKeys(spec: String): java.util.HashSet[java.lang.Long] =
    mergeKeySets.computeIfAbsent(spec, { sp =>
      val set = new java.util.HashSet[java.lang.Long]()
      sp.split(" ", -1).foreach { m =>
        if (m.nonEmpty) {
          val cps = m.codePoints().toArray
          if (cps.length == 2)
            set.add(java.lang.Long.valueOf(
              (cps(0).toLong << 32) | (cps(1).toLong & 0xffffffffL)))
        }
      }
      set
    })

  def bpeEncodeStats(text: UTF8String, spec: String): Array[Long] = {
    val merges = parseMergeKeys(spec)
    val toks = tokenize(text)
    var nTokens = 0L
    var nChars = 0L
    var nMerges = 0L
    var sym = 0L
    var t = 0
    while (t < toks.length) {
      val tok = toks(t)
      nTokens += 1
      // single pass over the token's codepoints: per-char checksum plus
      // the greedy merge scan against the PREVIOUS codepoint
      var prev = false // previous bigram position started a merge
      var prevCp = -1
      var i = 0
      while (i < tok.length) {
        val cp = tok.codePointAt(i)
        i += Character.charCount(cp)
        nChars += 1
        sym += hmodCp(cp)
        if (prevCp >= 0) {
          val key = (prevCp.toLong << 32) | (cp.toLong & 0xffffffffL)
          val start = !prev && merges.contains(java.lang.Long.valueOf(key))
          if (start) {
            nMerges += 1
            sym += hmodBigram(prevCp, cp) - hmodCp(prevCp) - hmodCp(cp)
          }
          prev = start
        }
        prevCp = cp
      }
      t += 1
    }
    Array(nTokens, nChars, nChars - nMerges, sym)
  }

  /** Split on single space, drop empties — Text.tokens semantics. */
  private def tokenize(text: UTF8String): Array[String] = {
    val s = text.toString
    if (s.isEmpty) return Array.empty
    val parts = s.split(" ", -1)
    var cnt = 0
    var i = 0
    while (i < parts.length) { if (parts(i).nonEmpty) cnt += 1; i += 1 }
    if (cnt == parts.length) return parts
    val out = new Array[String](cnt)
    var w = 0
    i = 0
    while (i < parts.length) {
      if (parts(i).nonEmpty) { out(w) = parts(i); w += 1 }
      i += 1
    }
    out
  }
}

trait TextKernelTyping extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.sql}")
  }
}

/** Native codegen expression: text → sorted distinct h60p word-2-gram
  * shingle hashes, fusing tokenize + shingle + md5 + distinct + sort into
  * one per-row kernel. Replaces the interpreted higher-order-function
  * chain (array build + per-shingle md5/conv expressions) AND the
  * explode→groupBy(collect_set) shuffle some callers used to build the
  * same sets — at cluster scale this turns shingle-set construction into
  * a shuffle-free narrow map. */
case class ShingleHash60P(child: Expression) extends TextKernelTyping {
  override def prettyName: String = "graft_shingle_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(TextHash.shingleHashes(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.plans.TextHash.shingleHashes($c));")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native codegen expression: text → dense int64 hashing-trick embedder
  * weights (`dim` slots, ±1 token votes), fusing the explode(tokens) →
  * slot/sign → two-groupBy pipeline into one shuffle-free per-row
  * kernel. */
case class HashEmbed(child: Expression, dim: Int) extends TextKernelTyping {
  override def prettyName: String = "graft_hash_embed"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(TextHash.hashEmbed(input.asInstanceOf[UTF8String], dim))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.plans.TextHash.hashEmbed($c, $dim));")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native codegen expression: text → sorted distinct winnowing
  * fingerprints (k-gram h60p hashes → sliding-window minima → dedup),
  * fusing the whole Schleimer-et-al. pipeline into one O(n) per-row
  * kernel — the interpreted transform/slice/array_min chain it replaces
  * was O(n·w) with per-gram expression-tree md5. */
case class Winnow(child: Expression, k: Int, w: Int) extends TextKernelTyping {
  override def prettyName: String = "graft_winnow"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(TextHash.winnow(input.asInstanceOf[UTF8String], k, w))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.plans.TextHash.winnow($c, $k, $w));")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native codegen expression: text → the 8 Gopher quality-rule counters
  * in one per-row pass (see [[TextHash.gopherStats]]). */
case class GopherStats(child: Expression) extends TextKernelTyping {
  override def prettyName: String = "graft_gopher_stats"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(TextHash.gopherStats(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.plans.TextHash.gopherStats($c));")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native codegen expression: text → positional word-k-gram h60p hashes
  * in document order (posexplode-ready; index = starting token). The
  * position-carrying sibling of `graft_winnow`'s first stage, for
  * operators that must report WHERE an overlap sits, not just that one
  * exists. */
case class PosGrams(child: Expression, k: Int) extends TextKernelTyping {
  override def prettyName: String = "graft_pos_grams"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(TextHash.posGrams(input.asInstanceOf[UTF8String], k))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.plans.TextHash.posGrams($c, $k));")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native codegen expression: text → character trigrams (positional, or
  * distinct-sorted with `distinct = true`) in one per-row pass. */
case class CharTrigrams(child: Expression, distinct: Boolean)
    extends TextKernelTyping {
  override def prettyName: String = "graft_char_trigrams"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(TextHash.charTrigrams(
      input.asInstanceOf[UTF8String], distinct).asInstanceOf[Array[Any]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"(Object[]) graft.plans.TextHash.charTrigrams($c, $distinct));")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native codegen expression: text → rolling h60p token fingerprint
  * (D4's fold, one pass per row). */
case class RollingFp(child: Expression) extends TextKernelTyping {
  override def prettyName: String = "graft_fingerprint"
  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    TextHash.rollingFp(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.TextHash.rollingFp($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native codegen expression: text → per-marker-set token hit counts.
  * `spec` is a constant "a,b;c,d" marker-set list, parsed once per JVM.
  * One tokenize pass serves every set — D1's per-language
  * size(filter(tokens, …)) columns each re-tokenized the text. */
case class TokenSetHits(child: Expression, spec: String)
    extends TextKernelTyping {
  override def prettyName: String = "graft_token_set_hits"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      TextHash.tokenSetHits(input.asInstanceOf[UTF8String], spec))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val specRef = ctx.addReferenceObj("markerSpec", spec, "java.lang.String")
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.plans.TextHash.tokenSetHits($c, $specRef));"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native codegen expression: text → positional word-bigram strings in
  * one per-row pass (feeds the D10/D14 explode paths). */
case class WordBigrams(child: Expression) extends TextKernelTyping {
  override def prettyName: String = "graft_word_bigrams"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(TextHash.wordBigrams(
      input.asInstanceOf[UTF8String]).asInstanceOf[Array[Any]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"(Object[]) graft.plans.TextHash.wordBigrams($c));")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native codegen expression: text → `[n_trigrams, n_unique]` word-3-gram
  * repetition stats in one per-row pass — the hot column of the D8
  * repetition scorer and D9 quality gate (and through D9, the corpus
  * build's first stage). */
case class WordTriStats(child: Expression) extends TextKernelTyping {
  override def prettyName: String = "graft_word_tri_stats"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(TextHash.wordTriStats(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.plans.TextHash.wordTriStats($c));")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native codegen expression: text → token-window chunk strings (window
  * `size` tokens, stride `step`), fusing tokenize + window-slice +
  * re-join into one per-row kernel. Replaces the interpreted
  * transform(sequence, slice, array_join) chain — the reference's core
  * chunking loop (TextProcessor.py:34-48) and the hottest path in the
  * ingest pipeline (A10/A11/G5/G6/G19). */
case class Chunks(child: Expression, size: Int, step: Int)
    extends TextKernelTyping {
  require(size > 0 && step > 0, "chunk size and step must be positive")
  override def prettyName: String = "graft_chunks"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(TextHash.chunks(
      input.asInstanceOf[UTF8String], size, step).asInstanceOf[Array[Any]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"(Object[]) graft.plans.TextHash.chunks($c, $size, $step));")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native codegen expression: text → within-token character bigrams in
  * document order (see [[TextHash.tokenCharBigrams]]). */
case class TokenCharBigrams(child: Expression) extends TextKernelTyping {
  override def prettyName: String = "graft_token_bigrams"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(TextHash.tokenCharBigrams(
      input.asInstanceOf[UTF8String]).asInstanceOf[Array[Any]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"(Object[]) graft.plans.TextHash.tokenCharBigrams($c));")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native codegen expression: text → D18e BPE-encode statistics
  * [n_tokens, n_chars, n_symbols, symsum] in one per-row pass (see
  * [[TextHash.bpeEncodeStats]]). `spec` is the space-separated learned
  * merge inventory — a bounded 20-entry sidecar inlined at plan time —
  * parsed once per JVM. */
case class BpeEncodeStats(child: Expression, spec: String)
    extends TextKernelTyping {
  override def prettyName: String = "graft_bpe_encode"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      TextHash.bpeEncodeStats(input.asInstanceOf[UTF8String], spec))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val specRef = ctx.addReferenceObj("mergeSpec", spec, "java.lang.String")
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.plans.TextHash.bpeEncodeStats($c, $specRef));"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native codegen expression: text → 32-bit SimHash (md5 sign-vote),
  * fusing the explode(tokens) → h60 → 32 per-bit sign-sums aggregation
  * into one per-row kernel (no explode, no shuffle). */
case class SimHash32(child: Expression) extends TextKernelTyping {
  override def prettyName: String = "graft_simhash32"
  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    TextHash.simhash32(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.TextHash.simhash32($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
