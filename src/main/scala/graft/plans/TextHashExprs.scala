package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native kernels for the text-hashing hot path (dedup family).
  *
  * The SQL formulation — `transform(toks, t -> conv(substring(md5(t),1,15),
  * 16,10))` and the nested minhash / simhash lambda folds — is correct but
  * interpreted: Catalyst higher-order functions evaluate their lambda per
  * element through the interpreter, so a 16-permutation minhash over a
  * ~250-shingle set pays ~4000 interpreted dispatches per document. These
  * kernels do the same math as one static-call-per-row inside
  * WholeStageCodegen: codegen emits `TextHash.minhash16(arr)` and the JVM
  * JITs the tight loop. At 100 TB this is the difference between a
  * CPU-bound interpreter and a memory-bandwidth-bound scan.
  *
  * Numeric contract (bit-for-bit with the DuckDB oracle):
  *   hash60(s)  = first 15 hex chars of md5(s) as a 60-bit unsigned int,
  *                i.e. big-endian(md5 bytes[0..7]) >>> 4
  *   minhash16  = min over hv=h%P of (A(j)*hv + B(j)) % P, j = 0..15
  *   simhash60  = bit j set iff Σ_tokens (bit_j(h) ? +1 : -1) > 0
  */
object TextHash {
  val P = 1000000007L
  final val NumHashes = 16
  // deterministic coefficients — MUST stay in lockstep with the literal
  // arrays inlined in the DuckDB oracle (graft.operators.Dedup)
  val A: Array[Long] = Array.tabulate(NumHashes)(j => ((2L * j + 1) * 2654435761L) % P)
  val B: Array[Long] = Array.tabulate(NumHashes)(j => ((j + 1) * 40503L * 65537L) % P)

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }


  /** FastSS deletion-neighborhood hashes: index 0 = a 64-bit
    * polynomial hash of the whole string (the depth-0 member), index
    * k+1 = the hash of the string with UTF-16 unit k removed (its
    * depth-1 deletion variants). Prefix/suffix rolling hashes make
    * the whole array O(len) — the variant STRINGS are never
    * materialized, vs the O(len²) chars and len allocations the
    * `transform(sequence(...), p -> concat(substring...))` SQL form
    * pays. Spark-side bucketing only (no oracle twin needed): a hash
    * is a pure function of the string, so equal variants collide by
    * construction, and the exact levenshtein verify downstream makes
    * the rare 64-bit false collision harmless.
    */
  def delHashes(s: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val str = s.toString
    val n = str.length
    val B = 1000003L
    val pow = new Array[Long](n + 1)
    pow(0) = 1L
    var i = 1
    while (i <= n) { pow(i) = pow(i - 1) * B; i += 1 }
    // suf(i) = Σ_{j≥i} c_j · B^(n-1-j)
    val suf = new Array[Long](n + 1)
    i = n - 1
    while (i >= 0) { suf(i) = suf(i + 1) + str.charAt(i) * pow(n - 1 - i); i -= 1 }
    val out = new Array[Long](n + 1)
    out(0) = suf(0)
    // variant without char k (len n-1): prefix scaled to its tail + suffix,
    // whose weights B^(n-1-j) already sit one slot lower than in the
    // full string — exactly the variant's alignment
    var pre = 0L
    var k = 0
    while (k < n) {
      out(k + 1) = pre * pow(n - 1 - k) + suf(k + 1)
      pre = pre * B + str.charAt(k)
      k += 1
    }
    new GenericArrayData(out)
  }

  /** Unicode NFC; the fast path (already-normalized) allocates nothing
    * beyond the String decode.
    */
  def nfc(s: org.apache.spark.unsafe.types.UTF8String): org.apache.spark.unsafe.types.UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else org.apache.spark.unsafe.types.UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Top 60 bits of md5 == conv(substring(md5(s),1,15),16,10). */
  def hash60(bytes: Array[Byte]): Long = {
    val m = md5.get()
    m.reset()
    val d = m.digest(bytes)
    val hi = ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
      ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    hi >>> 4
  }

  /** Per-token hash60 (multiset — no dedup; simhash needs tf weights). */
  def hashTokens(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = hash60(arr.getUTF8String(i).getBytes)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Distinct hash60 of word n-grams joined by single spaces; for
    * < n tokens the single shingle is the whole space-joined text
    * (matches the SQL `CASE WHEN size(toks) < n THEN array(tc)` guard,
    * since the cleaned text IS its tokens joined by ' ').
    */
  def wordShingles(arr: ArrayData, n: Int): ArrayData = {
    val m = arr.numElements()
    val toks = new Array[Array[Byte]](m)
    var i = 0
    while (i < m) {
      toks(i) = arr.getUTF8String(i).getBytes
      i += 1
    }
    def joined(start: Int, len: Int): Array[Byte] = {
      var sz = if (len > 0) len - 1 else 0
      var k = start
      while (k < start + len) { sz += toks(k).length; k += 1 }
      val out = new Array[Byte](sz)
      var pos = 0
      k = start
      while (k < start + len) {
        if (k > start) { out(pos) = ' '.toByte; pos += 1 }
        System.arraycopy(toks(k), 0, out, pos, toks(k).length)
        pos += toks(k).length
        k += 1
      }
      out
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    if (m < n) seen.add(hash60(joined(0, m)))
    else {
      i = 0
      while (i + n <= m) {
        seen.add(hash60(joined(i, n)))
        i += 1
      }
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  /** POSITIONAL hash60 of every word n-gram in order — one entry per
    * window start, NO dedup (unlike [[wordShingles]], whose set form
    * serves document-frequency counting where positions are noise).
    * ExactSubstr-style span dedup needs the positions back: index i of
    * the result is the window starting at token i, so a flagged hash
    * maps straight to the token span [i, i+n-1] it covers. Fewer than
    * n tokens → empty array (a short doc cannot contain an n-token
    * repeated span). Cost: O(tokens · n) bytes hashed per doc, one
    * static call per row inside WholeStageCodegen.
    */
  def shingleHashPositions(arr: ArrayData, n: Int): ArrayData = {
    val m = arr.numElements()
    if (m < n) return new GenericArrayData(Array.emptyLongArray)
    val toks = new Array[Array[Byte]](m)
    var i = 0
    while (i < m) {
      toks(i) = arr.getUTF8String(i).getBytes
      i += 1
    }
    val out = new Array[Long](m - n + 1)
    i = 0
    while (i + n <= m) {
      var sz = n - 1
      var k = i
      while (k < i + n) { sz += toks(k).length; k += 1 }
      val joined = new Array[Byte](sz)
      var pos = 0
      k = i
      while (k < i + n) {
        if (k > i) { joined(pos) = ' '.toByte; pos += 1 }
        System.arraycopy(toks(k), 0, joined, pos, toks(k).length)
        pos += toks(k).length
        k += 1
      }
      out(i) = hash60(joined)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** All 16 minhash permutations in one pass over the shingle set. */
  def minhash16(arr: ArrayData): ArrayData = {
    val m = arr.numElements()
    val out = Array.fill(NumHashes)(Long.MaxValue)
    var i = 0
    while (i < m) {
      val hv = arr.getLong(i) % P
      var j = 0
      while (j < NumHashes) {
        val v = (A(j) * hv + B(j)) % P
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** 60-bit simhash over tf-weighted token hashes. */
  def simhash60(arr: ArrayData): Long = {
    val m = arr.numElements()
    val counts = new Array[Long](60)
    var i = 0
    while (i < m) {
      val h = arr.getLong(i)
      var j = 0
      while (j < 60) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var acc = 0L
    var j = 0
    while (j < 60) {
      if (counts(j) > 0) acc |= (1L << j)
      j += 1
    }
    acc
  }

  /** HLL rank of the low 52 bits: 53 − bitlength(h % 2^52), with
    * bitlength(0) = 0 (so rank 53). Integer-identical to the SQL form
    * `53 - length(regexp_replace(bin(rem), '^0+', ''))` the DuckDB
    * oracles keep — bin() of 0 is "0", stripped to '' (length 0), and
    * for rem > 0 the stripped length IS the bit length. Replaces a
    * 52-char string build + regex scan per shingle with two integer
    * ops.
    */
  def rank52(h: Long): Long = {
    val rem = h % 4503599627370496L // 2^52 (hash60 is non-negative)
    if (rem == 0L) 53L else 53L - (64L - java.lang.Long.numberOfLeadingZeros(rem))
  }

  /** V1 hashed-token embedding: 64 bucket counts (hash60 % 64) →
    * L2-normalize. Bit-identical to BOTH prior formulations and the
    * DuckDB oracle: counts are exact small integers; the norm is the
    * left-to-right double fold Σ c·c over buckets 0..63 starting at
    * 0.0 (the same IEEE sequence as `aggregate(transform(counts,
    * x -> x*x), 0D, +)`); the division is per-element; the zero-norm
    * guard returns the raw zero counts. Replaces a 64-pass interpreted
    * `size(filter(...))` per document (embedText) / a two-shuffle
    * explode-groupBy-pivot (embedDocs) with ONE JIT'd loop per row.
    */
  def embed64(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val counts = new Array[Double](64)
    var i = 0
    while (i < n) {
      val h = hash60(arr.getUTF8String(i).getBytes)
      counts((h % 64L).toInt) += 1.0
      i += 1
    }
    var ss = 0.0
    var b = 0
    while (b < 64) { ss += counts(b) * counts(b); b += 1 }
    val nrm = math.sqrt(ss)
    if (nrm != 0.0) {
      b = 0
      while (b < 64) { counts(b) /= nrm; b += 1 }
    }
    new GenericArrayData(counts)
  }

  /** Content-defined chunking over per-token hashes in ONE fused pass
    * (the dd_cdc_chunks kernel): `hs` = raw hash60 per token, `gh` =
    * positional 2-gram hash60 (gh(i) covers tokens i,i+1 — the gap
    * after 1-based position i+1). A chunk closes after token i when
    * gh(i) ≡ 0 (mod 16) or the document ends; its fingerprint is the
    * ta_fingerprint polynomial fold of hs%P seeded with the first
    * element. Returns array<struct<chunk_no, start_pos, len, fp>>.
    * This kernel exists for the same reason as dct8: the HOF
    * formulation (a bounds projection consumed by a per-chunk
    * transform lambda) triggers CollapseProject inlining — the O(n)
    * bounds filter re-evaluates per reference, and the fold form
    * re-ships the n-long hash array once per chunk.
    */
  def cdcChunks(hs: ArrayData, gh: ArrayData): ArrayData = {
    val n = hs.numElements()
    val out = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.catalyst.InternalRow]
    var start = 0
    var acc = 0L
    var cn = 0L
    var i = 0
    while (i < n) {
      val h = hs.getLong(i) % P
      acc = if (i == start) h else (acc * 31 + h) % P
      if (i == n - 1 || gh.getLong(i) % 16 == 0) {
        cn += 1
        out += org.apache.spark.sql.catalyst.InternalRow(
          cn, (start + 1).toLong, (i - start + 1).toLong, acc)
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

private[plans] trait TextHashInputCheck { self: Expression =>
  protected def requireType(e: Expression, ok: DataType => Boolean, what: String)
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (ok(e.dataType)) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects $what, got ${e.dataType.catalogString}")

  protected val isStringArray: DataType => Boolean = {
    case ArrayType(StringType, _) => true
    case _ => false
  }
  protected val isLongArray: DataType => Boolean = {
    case ArrayType(LongType, _) => true
    case _ => false
  }
}

/** hash_tokens(array<string>) → array<bigint> — per-token hash60. */
case class HashTokens(child: Expression) extends UnaryExpression with TextHashInputCheck {
  override def prettyName: String = "hash_tokens"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    requireType(child, isStringArray, "array<string>")
  override protected def nullSafeEval(v: Any): Any =
    TextHash.hashTokens(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextHash.hashTokens($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** rank52(bigint) → bigint — HLL rank of the low 52 hash bits. */
case class Rank52(child: Expression) extends UnaryExpression with TextHashInputCheck {
  override def prettyName: String = "rank52"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    requireType(child, _ == LongType, "bigint")
  override protected def nullSafeEval(v: Any): Any =
    TextHash.rank52(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextHash.rank52($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** embed64(array<string>) → array<double> — hashed-token V1 embedding. */
case class Embed64(child: Expression) extends UnaryExpression with TextHashInputCheck {
  override def prettyName: String = "embed64"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    requireType(child, isStringArray, "array<string>")
  override protected def nullSafeEval(v: Any): Any =
    TextHash.embed64(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextHash.embed64($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** word_shingles(array<string>, n) → array<bigint> — distinct n-gram hash60. */
case class WordShingles(left: Expression, right: Expression)
    extends BinaryExpression with TextHashInputCheck {
  override def prettyName: String = "word_shingles"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val l = requireType(left, isStringArray, "array<string>")
    if (l != org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess) l
    else requireType(right, _ == IntegerType, "int n")
  }
  override protected def nullSafeEval(a: Any, n: Any): Any =
    TextHash.wordShingles(a.asInstanceOf[ArrayData], n.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, n) => s"graft.plans.TextHash.wordShingles($a, $n)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** shingle_hashes(array<string>, n) → array<bigint> — positional n-gram
  * hash60, entry i = window starting at token i (no dedup; empty when
  * fewer than n tokens).
  */
case class ShingleHashes(left: Expression, right: Expression)
    extends BinaryExpression with TextHashInputCheck {
  override def prettyName: String = "shingle_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val l = requireType(left, isStringArray, "array<string>")
    if (l != org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess) l
    else requireType(right, _ == IntegerType, "int n")
  }
  override protected def nullSafeEval(a: Any, n: Any): Any =
    TextHash.shingleHashPositions(a.asInstanceOf[ArrayData], n.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, n) => s"graft.plans.TextHash.shingleHashPositions($a, $n)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** cdc_chunks(hs, gh) → array<struct<chunk_no, start_pos, len, fp>> —
  * see [[TextHash.cdcChunks]].
  */
case class CdcChunks(left: Expression, right: Expression)
    extends BinaryExpression with TextHashInputCheck {
  override def prettyName: String = "cdc_chunks"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("chunk_no", LongType, nullable = false),
    StructField("start_pos", LongType, nullable = false),
    StructField("len", LongType, nullable = false),
    StructField("fp", LongType, nullable = false))), containsNull = false)
  private def isLongArray(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val l = requireType(left, isLongArray, "array<bigint>")
    if (l != org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess) l
    else requireType(right, isLongArray, "array<bigint>")
  }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextHash.cdcChunks(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.TextHash.cdcChunks($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** del_hashes(string) → array<bigint> — FastSS deletion-neighborhood
  * polynomial hashes: [whole string, minus char 0, minus char 1, ...].
  */
case class DelHashes(child: Expression) extends UnaryExpression with TextHashInputCheck {
  override def prettyName: String = "del_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    requireType(child, _ == StringType, "string")
  override protected def nullSafeEval(v: Any): Any =
    TextHash.delHashes(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextHash.delHashes($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** minhash16(array<bigint>) → array<bigint> — 16 permutation minima. */
case class MinHash16(child: Expression) extends UnaryExpression with TextHashInputCheck {
  override def prettyName: String = "minhash16"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    requireType(child, isLongArray, "array<bigint>")
  override protected def nullSafeEval(v: Any): Any =
    TextHash.minhash16(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextHash.minhash16($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** simhash60(array<bigint>) → bigint. */
case class SimHash60(child: Expression) extends UnaryExpression with TextHashInputCheck {
  override def prettyName: String = "simhash60"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    requireType(child, isLongArray, "array<bigint>")
  override protected def nullSafeEval(v: Any): Any =
    TextHash.simhash60(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextHash.simhash60($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** nfc_normalize(string) → string — Unicode NFC canonical composition
  * (java.text.Normalizer), named after the DuckDB function it mirrors.
  * The normalization step every text pipeline needs BEFORE hashing:
  * "café" composed and decomposed are different byte strings (different
  * md5, different shingles, different dedup verdicts) until both
  * normalize to the same NFC form. One static call per row inside
  * WholeStageCodegen; already-NFC ASCII passes through unchanged (the
  * common fast path — Normalizer.isNormalized short-circuits).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def prettyName: String = "nfc_normalize"
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nfc_normalize expects string, got ${t.catalogString}")
    }
  override protected def nullSafeEval(v: Any): Any =
    TextHash.nfc(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextHash.nfc($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
