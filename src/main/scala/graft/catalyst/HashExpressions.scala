package graft.catalyst

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared md5-hex helper for the hash expressions (thread-confined digest —
  * Spark evaluates expressions single-threaded per task).
  */
object HashUtil {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val hex = "0123456789abcdef".toCharArray

  def md5Hex(bytes: Array[Byte]): String = {
    val d = digest.get()
    d.reset()
    val out = d.digest(bytes)
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < out.length) {
      sb.append(hex((out(i) >> 4) & 0xf)); sb.append(hex(out(i) & 0xf)); i += 1
    }
    sb.toString
  }

  def hexVal(c: Char): Int =
    if (c <= '9') c - '0' else c - 'a' + 10

  /** 32-bit SimHash of a token multiset: each token votes ±1 per bit of
    * md5(token)[0:8] (hex-char p/4, bit p%4 — identical to the SQL oracle
    * formulation in [[graft.operators.DedupOps.simhashSql]]).
    */
  def simhash32(tokens: ArrayData): Long = {
    val votes = new Array[Int](32)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val h8 = md5Hex(tokens.getUTF8String(i).getBytes)
      var p = 0
      while (p < 32) {
        val v = hexVal(h8.charAt(p / 4))
        votes(p) += (((v >> (p % 4)) & 1) * 2) - 1
        p += 1
      }
      i += 1
    }
    var acc = 0L
    var p = 0
    while (p < 32) { if (votes(p) > 0) acc |= (1L << p); p += 1 }
    acc
  }

  /** k-component MinHash signature with digest slicing: one md5 yields FOUR
    * independent 32-bit components (8 hex chars each), so k components cost
    * ⌈k/4⌉ digests per shingle instead of k. Component j = min over shingles
    * of `substr(md5((j/4) + "|" + shingle), (j%4)*8+1, 8)` — lexicographic
    * min over identical hex strings in Spark and DuckDB
    * ([[graft.operators.DedupOps.minhashLshSql]] computes the exact same
    * slices), so the oracle agrees byte-for-byte. k ≤ 40 (single-digit
    * digest tag).
    */
  def minhashSig(shingles: ArrayData, k: Int): ArrayData = {
    require(k <= 40, s"minhash_signature supports k <= 40, got $k")
    val nDig = (k + 3) / 4
    val mins = new Array[UTF8String](k)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      val sBytes = shingles.getUTF8String(i).getBytes
      var d = 0
      while (d < nDig) {
        val buf = new Array[Byte](sBytes.length + 2)
        buf(0) = ('0' + d).toByte
        buf(1) = '|'
        System.arraycopy(sBytes, 0, buf, 2, sBytes.length)
        val hexStr = md5Hex(buf)
        var c = 0
        while (c < 4 && d * 4 + c < k) {
          val j = d * 4 + c
          val h = UTF8String.fromString(hexStr.substring(c * 8, c * 8 + 8))
          if (mins(j) == null || h.compareTo(mins(j)) < 0) mins(j) = h
          c += 1
        }
        d += 1
      }
      i += 1
    }
    new GenericArrayData(mins.asInstanceOf[Array[Any]])
  }

  /** Shannon entropy (nats) of a token array's word distribution in one
    * compiled pass — the complement of [[repetitionStats]]'s top-fractions:
    * entropy collapses toward 0 for boilerplate and approaches ln(n) for
    * fully diverse text. Computed ORDER-INDEPENDENTLY as
    * `ln(n) − (Σ c·ln c)/n`, with each count's `c·ln c` term rounded to
    * integer MICRO-nats and accumulated as a long — a plain double fold
    * over hash-map iteration order would make the value depend on bucket
    * layout, breaking cross-engine and cross-run reproducibility. Terms
    * with c = 1 contribute exactly 0 on both engines. Empty array → 0.
    */
  def tokenEntropy(toks: ArrayData): Double = {
    val n = toks.numElements()
    if (n == 0) return 0.0
    val wc = new java.util.HashMap[UTF8String, Integer](n * 2)
    var i = 0
    while (i < n) { wc.merge(toks.getUTF8String(i), 1, Integer.sum(_, _)); i += 1 }
    var micro = 0L
    val it = wc.values().iterator()
    while (it.hasNext) {
      val c = it.next().intValue()
      if (c > 1) micro += Math.round(c * Math.log(c) * 1e6)
    }
    Math.log(n) - micro.toDouble / 1e6 / n
  }

  /** Gopher-style repetition statistics of a token array in one compiled
    * pass: fraction of tokens taken by the most frequent word, fraction of
    * bigrams taken by the most frequent bigram, and type-token ratio
    * (distinct/total words). High top-fractions or a low TTR flag the
    * degenerate repeated-boilerplate documents a training-data filter drops.
    */
  def repetitionStats(toks: ArrayData): InternalRow = {
    val n = toks.numElements()
    if (n == 0) return InternalRow(0.0, 0.0, 0.0)
    val wc = new java.util.HashMap[UTF8String, Integer](n * 2)
    var topW = 0
    var i = 0
    while (i < n) {
      val c = wc.merge(toks.getUTF8String(i), 1, Integer.sum(_, _))
      if (c > topW) topW = c
      i += 1
    }
    var topB = 0
    if (n >= 2) {
      val bc = new java.util.HashMap[UTF8String, Integer](n * 2)
      val sp = UTF8String.fromString(" ")
      i = 0
      while (i < n - 1) {
        val b = UTF8String.concatWs(sp, toks.getUTF8String(i), toks.getUTF8String(i + 1))
        val c = bc.merge(b, 1, Integer.sum(_, _))
        if (c > topB) topB = c
        i += 1
      }
    }
    InternalRow(
      topW.toDouble / n,
      if (n >= 2) topB.toDouble / (n - 1) else 0.0,
      wc.size.toDouble / n)
  }

  /** Compiled 3-word shingling of a token array. */
  def shingles3(toks: ArrayData, distinct: Boolean): ArrayData = {
    val n = toks.numElements()
    if (n < 3) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[UTF8String](n - 2)
    val seen = if (distinct) new java.util.HashSet[UTF8String]() else null
    var i = 0
    while (i < n - 2) {
      val s = UTF8String.concatWs(UTF8String.fromString(" "),
        toks.getUTF8String(i), toks.getUTF8String(i + 1), toks.getUTF8String(i + 2))
      if (seen == null || seen.add(s)) out.add(s)
      i += 1
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  private def mix64(z0: Long): Long = { // splitmix64 finalizer
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Distinct 3-word shingles as 64-bit hashes WITHOUT materializing the
    * shingle strings: each token's bytes are hashed once, then triples are
    * combined with a splitmix64 chain. The hash is an INTERNAL posting-list
    * key (the oracle groups by the shingle string): distinct-by-hash equals
    * distinct-by-string barring a 64-bit collision within one corpus
    * (P ≈ n²/2⁶⁵), identical to the xxhash64(shingle) contract this
    * replaces — minus one string allocation + re-hash per shingle.
    */
  def shingleHashes3(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    if (n < 3) return new GenericArrayData(Array.empty[Any])
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = toks.getUTF8String(i)
      // token-level 64-bit: splitmix over the utf8 bytes
      var h = 0x9e3779b97f4a7c15L
      val bytes = s.getBytes
      var j = 0
      while (j < bytes.length) { h = mix64(h ^ (bytes(j) & 0xffL)); j += 1 }
      th(i) = mix64(h ^ bytes.length)
      i += 1
    }
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new java.util.ArrayList[Any](n - 2)
    i = 0
    while (i < n - 2) {
      val h = mix64(mix64(mix64(th(i)) ^ th(i + 1)) ^ th(i + 2))
      if (seen.add(h)) out.add(h)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Compiled i<j pair enumeration of a (doc_id: long, n: int) posting list,
    * sorted by doc_id so a_id < b_id canonically. The two shingle counts ride
    * along packed into ONE long (na<<32 | nb — counts are positive ints), so
    * a pair row shuffles as three 8-byte words instead of 2 longs + 2 ints
    * with padding; the downstream aggregation unpacks after grouping.
    */
  def pairCombos(ds: ArrayData): ArrayData = {
    val k = ds.numElements()
    val ids = new Array[Long](k)
    val ns = new Array[Int](k)
    var i = 0
    while (i < k) {
      val st = ds.getStruct(i, 2)
      ids(i) = st.getLong(0); ns(i) = st.getInt(1); i += 1
    }
    // insertion sort by id (posting lists are capped and small)
    i = 1
    while (i < k) {
      val idv = ids(i); val nv = ns(i); var j = i - 1
      while (j >= 0 && ids(j) > idv) { ids(j + 1) = ids(j); ns(j + 1) = ns(j); j -= 1 }
      ids(j + 1) = idv; ns(j + 1) = nv; i += 1
    }
    val out = new Array[Any](k * (k - 1) / 2)
    var idx = 0
    var a = 0
    while (a < k) {
      var b = a + 1
      while (b < k) {
        out(idx) = InternalRow(ids(a), ids(b),
          (ns(a).toLong << 32) | (ns(b).toLong & 0xffffffffL))
        idx += 1; b += 1
      }
      a += 1
    }
    new GenericArrayData(out)
  }

  /** Left-to-right Σ a[i]·b[i] with per-element double widening of float
    * inputs — bit-identical to the interpreted
    * `aggregate(zip_with(a, b, (x,y) => double(x)*double(y)), 0.0, _+_)`
    * fold and to the DuckDB `list_sum(list_transform(...))` oracle, but one
    * compiled loop instead of per-element lambda interpretation.
    */
  def dotF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    acc
  }

  def dotD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  /** Count of array elements x with lo <= x <= hi (null elements skipped).
    * One compiled loop replacing the interpreted
    * `size(filter(arr, v -> lo <= v AND v <= hi))` HOF pyramid.
    */
  def countBetween(a: ArrayData, lo: Double, hi: Double): Long = {
    val n = a.numElements()
    var c = 0L
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val x = a.getDouble(i)
        if (x >= lo && x <= hi) c += 1L
      }
      i += 1
    }
    c
  }

  /** Positions where two string arrays agree (MinHash signature overlap). */
  def eqCount(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0
    var i = 0
    while (i < n) {
      if (a.getUTF8String(i).compareTo(b.getUTF8String(i)) == 0) acc += 1
      i += 1
    }
    acc
  }

  /** Mixed float-left / double-right operands (e.g. embedding · centroid). */
  def dotFD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getFloat(i).toDouble * b.getDouble(i); i += 1 }
    acc
  }

  def dotDF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getFloat(i).toDouble; i += 1 }
    acc
  }

  // Null-skipping twins, selected at plan time only when the input schema
  // admits null elements (containsNull) — the common containsNull=false
  // path keeps the branch-free loops above. A null position contributes
  // nothing to the dot product / never matches in eqCount.
  def dotFSafe(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i))
        acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  def dotDSafe(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  def dotFDSafe(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) acc += a.getFloat(i).toDouble * b.getDouble(i)
      i += 1
    }
    acc
  }

  def dotDFSafe(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) acc += a.getDouble(i) * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  def eqCountSafe(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) &&
        a.getUTF8String(i).compareTo(b.getUTF8String(i)) == 0) acc += 1
      i += 1
    }
    acc
  }

  /** NFC-normalize a UTF8String. Pure-ASCII input (every byte < 0x80) IS
    * already NFC — returned untouched, no String materialization.
    */
  def nfcNormalize(s: UTF8String): UTF8String = {
    // getByte over numBytes, NOT getBytes: row-backed UTF8Strings would
    // copy their whole buffer just to be scanned for a high bit
    val n = s.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < n) { if (s.getByte(i) < 0) ascii = false; i += 1 }
    if (ascii) s
    else {
      val str = s.toString
      val norm = java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC)
      if (norm.equals(str)) s else UTF8String.fromString(norm)
    }
  }

  /** One BPE merge application: greedy LEFT-TO-RIGHT, non-overlapping
    * replacement of adjacent symbols (l, r) by their concatenation — the
    * exact application order every standard BPE implementation uses
    * ("a a a a" + merge(a,a) → "aa aa", NOT "aa a a").
    */
  def mergePair(a: ArrayData, l: UTF8String, r: UTF8String): ArrayData = {
    val n = a.numElements()
    val out = new java.util.ArrayList[UTF8String](n)
    var i = 0
    while (i < n) {
      val cur = a.getUTF8String(i) // null elements pass through unmerged
      if (cur != null && i < n - 1 && cur.equals(l) && l != null && r != null &&
          r.equals(a.getUTF8String(i + 1))) {
        out.add(UTF8String.concat(l, r)); i += 2
      } else { out.add(cur); i += 1 }
    }
    new GenericArrayData(out.toArray)
  }

  /** Jaro–Winkler similarity over the UTF-8 BYTES of the two strings —
    * standard parameters (prefix weight 0.1 over at most 4 units, boost
    * only when the Jaro base exceeds 0.7), and DuckDB's empty-string
    * convention (either side empty → 0.0, including both empty). Byte-level
    * comparison is bit-identical to `jaro_winkler_similarity` for ASCII
    * (verified over 5 000 random cases); multi-byte codepoints compare per
    * byte. The double arithmetic is written in the exact association order
    * of the oracle — `(m/l1 + m/l2 + (m−t)/m) / 3`, then
    * `j + pl·0.1·(1−j)` — so a 6-decimal rounding on either engine agrees.
    */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.getBytes; val s2 = b.getBytes
    val l1 = s1.length; val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val md = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1); val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val hi = math.min(l2 - 1, i + md)
      var j = math.max(0, i - md)
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && s1(i) == s2(j)) { m1(i) = true; m2(j) = true; m += 1; found = true }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0; var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) t += 1
        k += 1
      }
      i += 1
    }
    val tr = t / 2
    val mD = m.toDouble
    val jaro = (mD / l1 + mD / l2 + (mD - tr) / mD) / 3.0
    if (jaro > 0.7) {
      val pmax = math.min(4, math.min(l1, l2))
      var pl = 0
      while (pl < pmax && s1(pl) == s2(pl)) pl += 1
      jaro + pl * 0.1 * (1.0 - jaro)
    } else jaro
  }

  /** Viterbi unigram-LM segmentation DP for [[UnigramSeg]]. Costs live in
    * exact integer micro-nats; the DP value packs `(total_cost_micro,
    * n_pieces)` into one long (`cost*100 + np`, np < 100 structurally — a
    * word of ≤ [[graft.operators.TokenizerOps.UniMaxWordLen]] code points
    * yields ≤ that many pieces), so the min is the lexicographic
    * (cost asc, pieces asc) order both engines replay exactly — no float
    * compares anywhere. Code-point indexed to match Spark `substring` and
    * DuckDB `substr` semantics. Returns null only if some position is
    * unreachable, which full single-character coverage of the vocab rules
    * out by construction.
    */
  def unigramSeg(word: UTF8String,
      vocab: java.util.HashMap[String, java.lang.Long], maxPiece: Int): InternalRow = {
    val cps = word.toString.codePoints().toArray
    val n = cps.length
    if (n == 0) return InternalRow(0, 0L)
    val dp = new Array[Long](n + 1)
    java.util.Arrays.fill(dp, 1, n + 1, Long.MaxValue)
    var j = 1
    while (j <= n) {
      val maxI = math.min(maxPiece, j)
      var i = 1
      while (i <= maxI) {
        if (dp(j - i) != Long.MaxValue) {
          val cu = vocab.get(new String(cps, j - i, i))
          if (cu != null) {
            val cand = dp(j - i) + cu.longValue() * 100L + 1L
            if (cand < dp(j)) dp(j) = cand
          }
        }
        i += 1
      }
      j += 1
    }
    if (dp(n) == Long.MaxValue) null
    else InternalRow((dp(n) % 100L).toInt, dp(n) / 100L)
  }

  /** Greedy longest-match-first WordPiece segmentation (Schuster &
    * Nakajima 2012; BERT's inference rule) for [[WordPieceSeg]]: at each
    * position take the LONGEST vocabulary piece that matches, preferring
    * word-initial pieces at position 0 and continuation pieces elsewhere.
    * Returns the piece count, or -1 if some position has no match (full
    * single-character coverage per role rules that out by construction —
    * kept as a defensive UNK signal rather than an exception). Code-point
    * indexed like [[unigramSeg]]. No floats anywhere: greedy max-length is
    * pure string matching, so cross-engine determinism is structural.
    */
  def wordpieceSeg(word: UTF8String, initPieces: java.util.HashSet[String],
      contPieces: java.util.HashSet[String], maxPiece: Int): Int = {
    val cps = word.toString.codePoints().toArray
    val n = cps.length
    var pos = 0
    var np = 0
    while (pos < n) {
      val set = if (pos == 0) initPieces else contPieces
      var len = math.min(maxPiece, n - pos)
      var hit = 0
      while (len >= 1 && hit == 0) {
        if (set.contains(new String(cps, pos, len))) hit = len
        len -= 1
      }
      if (hit == 0) return -1
      pos += hit
      np += 1
    }
    np
  }
}

/** Native 32-bit SimHash over an array<string> token column. One projection
  * replaces the explode(tokens)×explode(32)→2×groupBy plan — no shuffle at
  * all. Codegen calls straight into [[HashUtil.simhash32]], keeping the
  * expression inside the whole-stage-codegen span.
  */
case class SimHash32(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(tokens: Any): Any =
    HashUtil.simhash32(tokens.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.catalyst.HashUtil.simhash32($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

/** Native k-wide MinHash signature over an array<string> shingle column. */
case class MinHashSignature(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullSafeEval(shingles: Any): Any =
    HashUtil.minhashSig(shingles.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.catalyst.HashUtil.minhashSig($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** Native per-document repetition statistics over an array<string> token
  * column: struct(top_word_frac, top_bigram_frac, ttr) in ONE compiled pass
  * with two local hash maps — the built-in formulation explodes words AND
  * bigrams through two groupBy shuffles; this is a per-row projection, so
  * repetition filtering scales linearly with the corpus.
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("top_word_frac", DoubleType, nullable = false),
    StructField("top_bigram_frac", DoubleType, nullable = false),
    StructField("ttr", DoubleType, nullable = false)))
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, false) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"repetition_stats requires array<string> with non-null elements, got ${t.sql}")
  }
  override def nullSafeEval(tokens: Any): Any =
    HashUtil.repetitionStats(tokens.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.catalyst.HashUtil.repetitionStats($c)")
  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

/** Native Shannon token entropy over an array<string> token column — one
  * compiled per-row pass via [[HashUtil.tokenEntropy]] (see there for the
  * order-independent micro-nat accumulation that makes the double exact
  * across engines). The explode→groupBy formulation shuffles every token
  * occurrence; this shuffles nothing — measured 21× faster at sf0.1
  * (ExprBench: 0.023 s vs 0.482 s).
  */
case class TokenEntropy(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, false) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"token_entropy requires array<string> with non-null elements, got ${t.sql}")
  }
  override def nullSafeEval(tokens: Any): Any =
    HashUtil.tokenEntropy(tokens.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.catalyst.HashUtil.tokenEntropy($c)")
  override protected def withNewChildInternal(newChild: Expression): TokenEntropy =
    copy(child = newChild)
}

/** Native dot product over two array<float>/array<double> columns; same
  * left-to-right double-widened fold as the lambda formulation (identical
  * IEEE result), kept inside whole-stage codegen — the hot inner loop of
  * every similarity/ANN query.
  *
  * Null ELEMENTS are skipped (contribute 0) when the input schema admits
  * them — a documented divergence from the `aggregate(zip_with(...))`
  * lambda, which nulls the whole sum. Schemas with containsNull=false keep
  * the branch-free loop.
  */
/** `count_between(arr, lo, hi)` — count of elements in the closed interval.
  * The inner loop of the bucketed range-frame rewrite
  * ([[graft.queries.PipelineQueries.windowRangeScaled]]): per probe row it
  * scans the joined bucket's value array, so the interpreted HOF form pays
  * per-element lambda dispatch on the hottest path of the query (measured:
  * the r8 bench had the HOF form at 8.1 s vs sub-second with this
  * expression). Codegen'd via [[HashUtil.countBetween]].
  */
case class CountInRange(arr: Expression, lo: Expression, hi: Expression)
    extends TernaryExpression {
  override def first: Expression = arr
  override def second: Expression = lo
  override def third: Expression = hi
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    (arr.dataType, lo.dataType, hi.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType, DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, l, h) => TypeCheckResult.TypeCheckFailure(
        s"count_between requires (array<double>, double, double), got ${a.sql}, ${l.sql}, ${h.sql}")
    }
  override def nullSafeEval(a: Any, l: Any, h: Any): Any =
    HashUtil.countBetween(a.asInstanceOf[ArrayData],
      l.asInstanceOf[Double], h.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, l, h) => s"graft.catalyst.HashUtil.countBetween($a, $l, $h)")
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): CountInRange =
    copy(arr = newFirst, lo = newSecond, hi = newThird)
}

case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"dot_product requires array<float>/array<double> inputs, got ${l.sql} and ${r.sql}")
  }
  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }
  private def anyNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, cn) => cn
    case _                => true
  })
  private def fn: String = {
    val base = (isFloat(left), isFloat(right)) match {
      case (true, true)   => "dotF"
      case (true, false)  => "dotFD"
      case (false, true)  => "dotDF"
      case (false, false) => "dotD"
    }
    if (anyNullable) base + "Safe" else base
  }
  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    fn match {
      case "dotF"      => HashUtil.dotF(x, y)
      case "dotFD"     => HashUtil.dotFD(x, y)
      case "dotDF"     => HashUtil.dotDF(x, y)
      case "dotD"      => HashUtil.dotD(x, y)
      case "dotFSafe"  => HashUtil.dotFSafe(x, y)
      case "dotFDSafe" => HashUtil.dotFDSafe(x, y)
      case "dotDFSafe" => HashUtil.dotDFSafe(x, y)
      case _           => HashUtil.dotDSafe(x, y)
    }
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.catalyst.HashUtil.$fn($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Broadcast count-min sketch probe (Cormode & Muthukrishnan 2005, "An
  * improved data stream summary: the count-min sketch and its
  * applications") — the map-side replacement for a vocabulary-sized count
  * join: the sketch rides to every task as a codegen reference object
  * (like a broadcast variable, serialized once per executor), and each row
  * pays one O(depth) probe instead of shuffling on the token key. CMS
  * never under-estimates, so `estimate ≥ exact` always; width/depth come
  * from the (eps, confidence) the sketch was built with.
  *
  * The probe stringifies through UTF-8 exactly as Spark's
  * `count_min_sketch` aggregate inserts string keys (both hash the UTF-8
  * bytes), so build and probe agree on every key.
  */
case class CmsEstimate(child: Expression, sketchBytes: Array[Byte])
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"cms_estimate requires a string key, got ${t.sql}")
  }
  @transient private lazy val cms =
    org.apache.spark.util.sketch.CountMinSketch.readFrom(sketchBytes)
  override def nullSafeEval(v: Any): Any =
    cms.estimateCount(v.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cms", cms,
      "org.apache.spark.util.sketch.CountMinSketch")
    defineCodeGen(ctx, ev, c => s"$ref.estimateCount($c.toString())")
  }
  override protected def withNewChildInternal(newChild: Expression): CmsEstimate =
    copy(child = newChild)
}

/** Native Viterbi unigram-LM segmentation (the SentencePiece inference
  * step, Kudo 2018) over a word column: given a broadcast-style vocabulary
  * of (piece, cost-in-micro-nats), emits `struct(np, cost_u)` — the
  * min-cost segmentation's piece count and total cost, both exact
  * integers. The DP is O(len × maxPiece) per word with zero allocation
  * beyond the code-point array; the vocab rides along as one reference
  * object shared across the whole-stage-codegen span, so applying a
  * 10k-piece tokenizer model to a distinct-word table is a map-only
  * projection. See [[HashUtil.unigramSeg]] for the packed-long
  * determinism argument.
  */
case class UnigramSeg(child: Expression, pieces: Array[String],
    costsU: Array[Long], maxPiece: Int) extends UnaryExpression {
  require(pieces.length == costsU.length, "pieces/costs arity mismatch")
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("np", IntegerType, nullable = false),
    StructField("cost_u", LongType, nullable = false)))
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"unigram_seg requires a string word, got ${t.sql}")
  }
  @transient private lazy val vocab = {
    val m = new java.util.HashMap[String, java.lang.Long](pieces.length * 2)
    var i = 0
    while (i < pieces.length) { m.put(pieces(i), costsU(i)); i += 1 }
    m
  }
  override def nullSafeEval(w: Any): Any =
    HashUtil.unigramSeg(w.asInstanceOf[UTF8String], vocab, maxPiece)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramVocab", vocab, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.catalyst.HashUtil.unigramSeg($c, $ref, $maxPiece);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")
  }
  override protected def withNewChildInternal(newChild: Expression): UnigramSeg =
    copy(child = newChild)
}

/** Native greedy longest-match WordPiece segmentation over a word column:
  * the two role-split vocabularies (word-initial / continuation) ride along
  * as reference HashSets shared across the whole-stage-codegen span, so
  * applying the tokenizer is a map-only projection — same scale posture as
  * [[UnigramSeg]], with [[HashUtil.wordpieceSeg]]'s greedy rule instead of
  * the Viterbi DP. Emits the piece count (-1 = unmatchable/UNK, impossible
  * under full per-role single-character coverage).
  */
case class WordPieceSeg(child: Expression, initPieces: Array[String],
    contPieces: Array[String], maxPiece: Int) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"wordpiece_seg requires a string word, got ${t.sql}")
  }
  @transient private lazy val initSet = {
    val s = new java.util.HashSet[String](initPieces.length * 2)
    initPieces.foreach(s.add); s
  }
  @transient private lazy val contSet = {
    val s = new java.util.HashSet[String](contPieces.length * 2)
    contPieces.foreach(s.add); s
  }
  override def nullSafeEval(w: Any): Any =
    HashUtil.wordpieceSeg(w.asInstanceOf[UTF8String], initSet, contSet, maxPiece)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ri = ctx.addReferenceObj("wpInit", initSet, "java.util.HashSet")
    val rc = ctx.addReferenceObj("wpCont", contSet, "java.util.HashSet")
    defineCodeGen(ctx, ev,
      c => s"graft.catalyst.HashUtil.wordpieceSeg($c, $ri, $rc, $maxPiece)")
  }
  override protected def withNewChildInternal(newChild: Expression): WordPieceSeg =
    copy(child = newChild)
}

object HashFunctions {
  import org.apache.spark.sql.GraftColumnBridge
  def simhash32(c: Column): Column =
    GraftColumnBridge.column(SimHash32(GraftColumnBridge.expression(c)))
  def minhash_signature(c: Column, k: Int): Column =
    GraftColumnBridge.column(MinHashSignature(GraftColumnBridge.expression(c), k))
  def shingles3(c: Column, distinct: Boolean = false): Column =
    GraftColumnBridge.column(Shingles3(GraftColumnBridge.expression(c), distinct))
  def pair_combos(c: Column): Column =
    GraftColumnBridge.column(PairCombos(GraftColumnBridge.expression(c)))
  def dot_product(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      DotProduct(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  def count_between(arr: Column, lo: Column, hi: Column): Column =
    GraftColumnBridge.column(
      CountInRange(GraftColumnBridge.expression(arr),
        GraftColumnBridge.expression(lo), GraftColumnBridge.expression(hi)))
  def eq_count(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      EqCount(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  def repetition_stats(c: Column): Column =
    GraftColumnBridge.column(RepetitionStats(GraftColumnBridge.expression(c)))
  def token_entropy(c: Column): Column =
    GraftColumnBridge.column(TokenEntropy(GraftColumnBridge.expression(c)))
  def shingle_hashes3(c: Column): Column =
    GraftColumnBridge.column(ShingleHashes3(GraftColumnBridge.expression(c)))
  def nfc_normalize(c: Column): Column =
    GraftColumnBridge.column(NfcNormalize(GraftColumnBridge.expression(c)))
  def jaro_winkler(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      JaroWinkler(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  def merge_pair(arr: Column, l: Column, r: Column): Column =
    GraftColumnBridge.column(
      MergePair(GraftColumnBridge.expression(arr),
        GraftColumnBridge.expression(l), GraftColumnBridge.expression(r)))
  def cms_estimate(key: Column, sketchBytes: Array[Byte]): Column =
    GraftColumnBridge.column(
      CmsEstimate(GraftColumnBridge.expression(key), sketchBytes))
  def unigram_seg(word: Column, pieces: Array[String], costsU: Array[Long],
      maxPiece: Int): Column =
    GraftColumnBridge.column(
      UnigramSeg(GraftColumnBridge.expression(word), pieces, costsU, maxPiece))
  def wordpiece_seg(word: Column, initPieces: Array[String],
      contPieces: Array[String], maxPiece: Int): Column =
    GraftColumnBridge.column(
      WordPieceSeg(GraftColumnBridge.expression(word), initPieces, contPieces, maxPiece))
}

/** Native positional-equality count over two array<string> columns — the
  * MinHash signature-agreement inner loop (the
  * `size(filter(zip_with(...)))` formulation interprets two lambdas per
  * candidate pair).
  */
case class EqCount(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"eq_count requires array<string> inputs, got ${l.sql} and ${r.sql}")
  }
  private def fn: String = {
    val nullable = Seq(left, right).exists(_.dataType match {
      case ArrayType(_, cn) => cn
      case _                => true
    })
    if (nullable) "eqCountSafe" else "eqCount"
  }
  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (fn == "eqCountSafe") HashUtil.eqCountSafe(x, y) else HashUtil.eqCount(x, y)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.catalyst.HashUtil.$fn($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): EqCount =
    copy(left = newLeft, right = newRight)
}

/** Native 3-word shingle expression over an array<string> token column:
  * one compiled pass (vs `transform(sequence…element_at…)`, which evaluates
  * interpreted lambdas per element and is re-inlined by filter pushdown).
  * `distinct = true` keeps first occurrences (order feeds only min/groupBy).
  */
case class Shingles3(child: Expression, distinct: Boolean) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(toks: Any): Any =
    HashUtil.shingles3(toks.asInstanceOf[ArrayData], distinct)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.catalyst.HashUtil.shingles3($c, $distinct)")
  override protected def withNewChildInternal(newChild: Expression): Shingles3 =
    copy(child = newChild)
}

/** Native distinct-3-word-shingle hashing (no shingle string ever built) —
  * the posting-list key generator of the n-gram dedup pipeline.
  */
case class ShingleHashes3(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, false) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes3 requires array<string> with non-null elements, got ${t.sql}")
  }
  override def nullSafeEval(toks: Any): Any =
    HashUtil.shingleHashes3(toks.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.catalyst.HashUtil.shingleHashes3($c)")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashes3 =
    copy(child = newChild)
}

/** Native i<j pair enumeration of an array<struct<doc_id:long,n:int>>
  * posting list (sorted by doc_id internally): emits
  * array<struct<a_id,b_id,nn>> in one compiled pass (nn = the two shingle
  * counts packed into one long) — the interpreted nested-transform/slice
  * formulation costs O(k²) array copies in lambda interpreters.
  */
case class PairCombos(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("a_id", LongType), StructField("b_id", LongType),
    StructField("nn", LongType))),
    containsNull = false)
  override def nullSafeEval(ds: Any): Any =
    HashUtil.pairCombos(ds.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.catalyst.HashUtil.pairCombos($c)")
  override protected def withNewChildInternal(newChild: Expression): PairCombos =
    copy(child = newChild)
}

/** Unicode NFC normalization — Spark has no built-in; DuckDB's
  * `nfc_normalize` is the oracle twin. Codegen'd with an ASCII fast path
  * (ASCII is NFC by definition — the common web-corpus case returns the
  * input UTF8String untouched, no JVM String round-trip).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires string, got ${t.sql}")
  }
  override def nullSafeEval(s: Any): Any =
    HashUtil.nfcNormalize(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.catalyst.HashUtil.nfcNormalize($c)")
  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** One BPE merge pass over an array<string> symbol column — greedy
  * left-to-right non-overlapping, the order BPE training AND inference
  * both require (a lambda/`replace` formulation gets overlap runs wrong).
  * Codegen'd: the tokenizer-training inner loop runs compiled over the
  * distinct-word table each merge iteration.
  */
case class MergePair(arr: Expression, l: Expression, r: Expression)
    extends TernaryExpression {
  override def first: Expression = arr
  override def second: Expression = l
  override def third: Expression = r
  override def dataType: DataType = arr.dataType // containsNull preserved
  override def checkInputDataTypes(): TypeCheckResult =
    (arr.dataType, l.dataType, r.dataType) match {
      case (ArrayType(StringType, _), StringType, StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"merge_pair requires (array<string>, string, string), " +
          s"got ${a.sql}, ${b.sql}, ${c.sql}")
    }
  override def nullSafeEval(a: Any, lv: Any, rv: Any): Any =
    HashUtil.mergePair(a.asInstanceOf[ArrayData],
      lv.asInstanceOf[UTF8String], rv.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c) => s"graft.catalyst.HashUtil.mergePair($a, $b, $c)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): MergePair =
    copy(arr = f, l = s, r = t)
}

/** Native Jaro–Winkler similarity — Spark ships `levenshtein` but no Jaro
  * family; DuckDB's `jaro_winkler_similarity` is the oracle twin
  * (bit-identical for ASCII, see [[HashUtil.jaroWinkler]]). Codegen'd: the
  * O(|a|·|b|) matching loop runs as one static call inside whole-stage
  * codegen, so a blocked fuzzy-join scores millions of candidate pairs
  * without leaving the compiled pipeline.
  */
case class JaroWinkler(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler requires string inputs, got ${l.sql} and ${r.sql}")
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    HashUtil.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.catalyst.HashUtil.jaroWinkler($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}
