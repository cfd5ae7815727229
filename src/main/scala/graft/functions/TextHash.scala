package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels for the text-hashing expressions below. Each is a
  * single fused JVM loop invoked from generated code (codegen emits one
  * static call, so the expression stays inside whole-stage codegen) —
  * replacing interpreted `aggregate`/`zip_with`/`transform` chains,
  * which never participate in codegen and allocate per element.
  *
  * Numeric/semantic contract: BIT-IDENTICAL to the composable SQL forms
  * they replace (DedupSpec pins parity):
  * - tokens: `split(trim(text), '\s+')` — UTF8String.trim (spaces only,
  *   NOT Java String#trim) then Java regex split with limit -1;
  * - hashes: Spark's xxhash64 (XxHash64Function, seed 42);
  * - minhash: h folded to 32 bits, min over (a_i*h + b_i) mod p with the
  *   same coefficients as the SQL formulation.
  */
object TextHashUtil {

  val MersennePrime: Long = (1L << 61) - 1

  /** Exact `levenshtein(a, b) <= 1` as a single two-pointer scan:
    * longest common prefix p + longest disjoint common suffix s, then
    * d<=1  ⟺  p+s >= n-1 (equal lengths, one substitution window)
    *       or p+s >= min(n,m) (lengths differ by 1, pure deletion).
    * O(len) with zero allocation on the ASCII fast path (byte-wise is
    * char-wise when every byte is single-byte UTF-8); multi-byte input
    * falls back to the same scan over code points. The generic banded
    * DP costs ~7µs/pair at this length; this runs at memcmp speed —
    * the per-candidate verify of the d=1 FastSS join is the hot loop
    * of the fuzzy self-join at scale. */
  /** Exact `levenshtein(a, b) <= 2`: strip the common prefix and
    * suffix (distance-preserving), then a width-5 banded DP (Ukkonen
    * band k=2) over the residual code points with per-row early exit.
    * The verify of the d=2 FastSS join runs at candidate-pair
    * cardinality, and near-pairs trim to a residual of ≤ ~4 code
    * points, so the DP is a handful of cells — far pairs die on the
    * length gate or the first band-exceeded row. */
  def editWithin2(a: UTF8String, b: UTF8String): Boolean = {
    val nb = a.numBytes(); val mb = b.numBytes()
    if (math.abs(nb - mb) > 8) return false // 2 chars ≤ 8B
    if (nb == a.numChars() && mb == b.numChars()) {
      // ASCII fast path: bytes ARE code points — trim and run the DP
      // straight off getByte, zero allocation beyond the two ≤len+1
      // int rows (the hot loop verifies tens of millions of candidate
      // pairs; the codepoint decode dominated it before this path)
      if (math.abs(nb - mb) > 2) return false
      var n = nb; var m = mb
      var p = 0
      val minNm = math.min(n, m)
      while (p < minNm && a.getByte(p) == b.getByte(p)) p += 1
      var s = 0
      while (s < minNm - p && a.getByte(n - 1 - s) == b.getByte(m - 1 - s)) s += 1
      n -= p + s; m -= p + s
      if (n == 0 || m == 0) return math.max(n, m) <= 2
      bandedWithin2(n, m,
        (i, j) => a.getByte(p + i) == b.getByte(p + j))
    } else {
      val ac = a.toString.codePoints().toArray
      val bc = b.toString.codePoints().toArray
      var n = ac.length; var m = bc.length
      if (math.abs(n - m) > 2) return false
      var p = 0
      val minNm = math.min(n, m)
      while (p < minNm && ac(p) == bc(p)) p += 1
      var s = 0
      while (s < minNm - p && ac(n - 1 - s) == bc(m - 1 - s)) s += 1
      n -= p + s; m -= p + s
      if (n == 0 || m == 0) return math.max(n, m) <= 2
      bandedWithin2(n, m, (i, j) => ac(p + i) == bc(p + j))
    }
  }

  /** Width-5 banded Levenshtein (k=2) over residual lengths n×m with
    * an equality accessor on 0-based residual indices; early-exits the
    * moment a whole row exceeds the band. */
  private def bandedWithin2(n: Int, m: Int,
      eq: (Int, Int) => Boolean): Boolean = {
    val K = 2; val INF = K + 1
    val prev = new Array[Int](m + 1)
    val cur = new Array[Int](m + 1)
    var j = 0
    while (j <= m) { prev(j) = if (j <= K) j else INF; j += 1 }
    var i = 1
    while (i <= n) {
      java.util.Arrays.fill(cur, INF)
      cur(0) = if (i <= K) i else INF
      var rowMin = cur(0)
      val from = math.max(1, i - K); val to = math.min(m, i + K)
      j = from
      while (j <= to) {
        val cost = if (eq(i - 1, j - 1)) 0 else 1
        var v = prev(j - 1) + cost
        if (prev(j) + 1 < v) v = prev(j) + 1
        if (cur(j - 1) + 1 < v) v = cur(j - 1) + 1
        if (v > INF) v = INF
        cur(j) = v
        if (v < rowMin) rowMin = v
        j += 1
      }
      if (rowMin >= INF) return false
      System.arraycopy(cur, 0, prev, 0, m + 1)
      i += 1
    }
    prev(m) <= K
  }

  def editWithin1(a: UTF8String, b: UTF8String): Boolean = {
    val n = a.numBytes(); val m = b.numBytes()
    if (math.abs(n - m) > 4) return false // one UTF-8 char is ≤ 4 bytes
    if (n == a.numChars() && m == b.numChars()) { // ASCII fast path
      if (math.abs(n - m) > 1) return false
      val min = math.min(n, m)
      var p = 0
      while (p < min && a.getByte(p) == b.getByte(p)) p += 1
      var s = 0
      while (s < min - p && a.getByte(n - 1 - s) == b.getByte(m - 1 - s)) s += 1
      if (n == m) p + s >= n - 1 else p + s >= min
    } else {
      val ac = a.toString.codePoints().toArray
      val bc = b.toString.codePoints().toArray
      val cn = ac.length; val cm = bc.length
      if (math.abs(cn - cm) > 1) return false
      val min = math.min(cn, cm)
      var p = 0
      while (p < min && ac(p) == bc(p)) p += 1
      var s = 0
      while (s < min - p && ac(cn - 1 - s) == bc(cm - 1 - s)) s += 1
      if (cn == cm) p + s >= cn - 1 else p + s >= min
    }
  }

  private def tokenize(text: UTF8String): Array[String] =
    text.trim().toString.split("\\s+", -1)

  /** Distinct word n-gram shingles, first-occurrence order (matches
    * `array_distinct(transform(sequence(...), i -> concat_ws(' ',
    * slice(toks, i+1, n))))`, including the short-document case where
    * the single shingle is the whole token list). */
  def shingles(text: UTF8String, n: Int): ArrayData = {
    val toks = tokenize(text)
    val last = math.max(toks.length - n, 0)
    val seen = new java.util.LinkedHashSet[String](math.max(16, last + 1))
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= last) {
      sb.setLength(0)
      val end = math.min(i + n, toks.length)
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  /** Distinct xxhash64 values of the word n-gram shingles — the
    * narrow (8-byte) shingle identity used for candidate generation in
    * the Jaccard join. Distinctness is BY HASH: candidate recall is
    * exact unless two distinct shingles inside a true pair's
    * INTERSECTION collide in 64 bits (P ≈ n²/2^65 over the corpus
    * shingle count — ~1e-9 at 260k shingles), the standard trade every
    * production MinHash pipeline makes to avoid shuffling full strings.
    * Jaccard VERIFICATION also runs on these ids (DedupOps
    * .shingleTables): a cross-document collision inflates one pair's
    * intersection count by 1-in-|doc| — in expectation single-digit
    * colliding pairs corpus-wide even at 10¹⁰ distinct shingles. */
  def hashStringArray(sh: ArrayData): ArrayData = {
    val m = sh.numElements()
    val seen = new java.util.LinkedHashSet[java.lang.Long](math.max(16, m))
    var i = 0
    while (i < m) {
      seen.add(XxHash64Function.hash(sh.getUTF8String(i), StringType, 42L))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  private val md5Digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** ENGINE-NEUTRAL 60-bit hash: the first 15 hex chars of md5(s) as a
    * long — any SQL engine reproduces it verbatim
    * (`CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)` in DuckDB,
    * `CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT)` in Spark
    * SQL), which is what makes the md5-mode simhash/minhash queries
    * hash-checkable against an external oracle. 15 chars (not 16) keeps
    * the value inside a signed 64-bit long on every engine. ~10× slower
    * than xxhash64 per token — the xxhash64 mode remains the at-scale
    * default. */
  def md5_60(s: UTF8String): Long = {
    val md = md5Digest.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    (h << 4) | ((d(7) & 0xffL) >>> 4)
  }

  /** SimHash-64 over distinct tokens: per-token hash (xxhash64 seed 42,
    * or engine-neutral md5-60), bitwise majority vote -> 64-bit
    * fingerprint (top 4 bits are always 0 in md5 mode — a 60-bit
    * fingerprint, same Hamming semantics). */
  def simhash64(text: UTF8String, md5Mode: Boolean): Long = {
    val toks = tokenize(text)
    val seen = new java.util.HashSet[String](math.max(16, toks.length))
    val votes = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      if (seen.add(toks(i))) {
        val u = UTF8String.fromString(toks(i))
        val h = if (md5Mode) md5_60(u) else XxHash64Function.hash(u, StringType, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) fp |= 1L << b
      b += 1
    }
    fp
  }

  /** Binary-compat face for the xxhash64 default. */
  def simhash64(text: UTF8String): Long = simhash64(text, md5Mode = false)

  /** MinHash signature: k running minima of h_i(x) = (a_i*x + b_i) mod p
    * over the 32-bit-folded base hash (xxhash64 seed 42, or
    * engine-neutral md5-60) of each shingle — each shingle is hashed
    * exactly once. */
  def minhashSig(shingleArr: ArrayData, k: Int, md5Mode: Boolean): ArrayData = {
    val p = MersennePrime
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, p)
    val n = shingleArr.numElements()
    var i = 0
    while (i < n) {
      val s = shingleArr.getUTF8String(i)
      val raw = if (md5Mode) md5_60(s) else XxHash64Function.hash(s, StringType, 42L)
      val h = java.lang.Math.floorMod(raw, 4294967296L) // fold to [0, 2^32)
      var j = 0
      while (j < k) {
        // a_j = 2j+1, b_j = 982451653*(j+1) mod p — mirrors the SQL form;
        // h*a+b < 2^32 * (2k+1) + 2^61 stays inside a positive long
        val v = (h * (2L * j + 1L) + (982451653L * (j + 1) % p)) % p
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Binary-compat face for the xxhash64 default. */
  def minhashSig(shingleArr: ArrayData, k: Int): ArrayData =
    minhashSig(shingleArr, k, md5Mode = false)

  /** Token statistics in ONE tokenize pass: (n_tokens, n_distinct,
    * n_stop). Matches `size(split(trim(t),'\s+'))`,
    * `size(array_distinct(...))` and `size(filter(..., isin(stop)))`
    * exactly — including the empty-string edge where split yields [""]
    * (n_tokens = 1). The interpreted HOF forms it replaces evaluate the
    * split per consumer and never enter whole-stage codegen. */
  def tokenStats(text: UTF8String,
                 stop: java.util.HashSet[String]): org.apache.spark.sql.catalyst.InternalRow = {
    val toks = tokenize(text)
    val seen = new java.util.HashSet[String](math.max(16, toks.length))
    var nStop = 0L
    var i = 0
    while (i < toks.length) {
      seen.add(toks(i))
      if (stop.contains(toks(i))) nStop += 1
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](toks.length.toLong, seen.size.toLong, nStop))
  }

  /** Per-marker-set token hit counts in ONE tokenize pass: element i is
    * the number of tokens (with repetition) contained in `sets(i)` —
    * the language-ID scoring loop fused into a single traversal. */
  def tokenHits(text: UTF8String,
                sets: Array[java.util.HashSet[String]]): ArrayData = {
    val toks = tokenize(text)
    val hits = new Array[Long](sets.length)
    var i = 0
    while (i < toks.length) {
      var j = 0
      while (j < sets.length) {
        if (sets(j).contains(toks(i))) hits(j) += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(hits)
  }
}

/** `word_shingles(text, n)`: distinct word n-gram shingles. */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, "shingle size must be >= 1")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(input: Any): Any =
    TextHashUtil.shingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashUtil.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** `hash_string_array(arr)`: distinct xxhash64 ids of a string array —
  * applied to an already-materialized shingle column so the shingling
  * pass runs once, not once per consumer. */
case class HashStringArray(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hash_string_array"

  override protected def nullSafeEval(input: Any): Any =
    TextHashUtil.hashStringArray(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashUtil.hashStringArray($c)")

  override protected def withNewChildInternal(newChild: Expression): HashStringArray =
    copy(child = newChild)
}

/** `simhash64(text)`: 64-bit SimHash fingerprint of the token set.
  * `md5Mode = true` switches the per-token hash to the engine-neutral
  * md5-60 (oracle-replicable; see TextHashUtil.md5_60). */
case class Simhash64(child: Expression, md5Mode: Boolean = false)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = if (md5Mode) "simhash64_md5" else "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    TextHashUtil.simhash64(input.asInstanceOf[UTF8String], md5Mode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashUtil.simhash64($c, $md5Mode)")

  override protected def withNewChildInternal(newChild: Expression): Simhash64 =
    copy(child = newChild)
}

/** `minhash_sig(shingles, k)`: k-element MinHash signature of a string
  * array. `md5Mode = true` switches the base hash to the engine-neutral
  * md5-60 (oracle-replicable). */
case class MinhashSignature(child: Expression, k: Int, md5Mode: Boolean = false)
    extends UnaryExpression with ExpectsInputTypes {
  require(k >= 1, "signature length must be >= 1")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = if (md5Mode) "minhash_sig_md5" else "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    TextHashUtil.minhashSig(input.asInstanceOf[ArrayData], k, md5Mode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashUtil.minhashSig($c, $k, $md5Mode)")

  override protected def withNewChildInternal(newChild: Expression): MinhashSignature =
    copy(child = newChild)
}

/** `token_stats(text)`: (n_tokens, n_distinct, n_stop) in one tokenize
  * pass — the fused form of the three HOF aggregates the quality score
  * reads. The stopword set rides along as a codegen reference object. */
case class TokenStats(child: Expression, stopwords: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("n_tokens", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("n_distinct", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("n_stop", LongType, nullable = false)))
  override def prettyName: String = "token_stats"

  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    stopwords.foreach(s.add)
    s
  }

  override protected def nullSafeEval(input: Any): Any =
    TextHashUtil.tokenStats(input.asInstanceOf[UTF8String], stopSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stopSet", stopSet, "java.util.HashSet")
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashUtil.tokenStats($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenStats =
    copy(child = newChild)
}

/** `token_hits(text)`: per-marker-set token hit counts in one tokenize
  * pass — the language-ID scoring loop as a single traversal. Element i
  * counts tokens contained in `markerSets(i)`. */
case class TokenHits(child: Expression, markerSets: Seq[Seq[String]])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_hits"

  @transient private lazy val sets: Array[java.util.HashSet[String]] =
    markerSets.map { ms =>
      val s = new java.util.HashSet[String]()
      ms.foreach(s.add)
      s
    }.toArray

  override protected def nullSafeEval(input: Any): Any =
    TextHashUtil.tokenHits(input.asInstanceOf[UTF8String], sets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("markerSets", sets, "java.util.HashSet[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashUtil.tokenHits($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenHits =
    copy(child = newChild)
}

/** `edit_within2(a, b)`: exact `levenshtein(a, b) <= 2` — trimmed
  * banded DP ([[TextHashUtil.editWithin2]]), the codegen'd candidate
  * verify of the FastSS d=2 fuzzy join. */
case class EditWithin2(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "edit_within2"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    TextHashUtil.editWithin2(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (l, r) => s"graft.functions.TextHashUtil.editWithin2($l, $r)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): EditWithin2 =
    copy(left = newLeft, right = newRight)
}

/** `edit_within1(a, b)`: exact `levenshtein(a, b) <= 1` as one fused
  * prefix/suffix scan ([[TextHashUtil.editWithin1]]) — the codegen'd
  * candidate verify of the FastSS d=1 fuzzy join, ~50× cheaper than
  * the banded-DP general levenshtein at short-string lengths. */
case class EditWithin1(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "edit_within1"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    TextHashUtil.editWithin1(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (l, r) => s"graft.functions.TextHashUtil.editWithin1($l, $r)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): EditWithin1 =
    copy(left = newLeft, right = newRight)
}
