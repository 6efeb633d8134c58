package graft.functions

import java.security.MessageDigest

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/**
 * Byte-level primitives shared by the fused hash kernels below
 * ([[MinhashKernel]], [[FingerprintKernel]], [[WinnowKernel]]). These
 * are LOAD-BEARING for the cross-engine hash contract — one definition
 * each so a future fix (e.g. malformed-lead-byte handling in
 * [[charWidth]]) cannot silently miss a kernel:
 *
 *   - lowercase-hex encoding is ORDER-PRESERVING, so comparing raw
 *     digests with [[cmpUnsigned]] is equivalent to comparing their hex
 *     strings lexicographically (FIXTURES.md §1 digest ordering) — what
 *     lets every kernel keep 16-byte digests and hex-encode only
 *     winners;
 *   - [[charWidth]] mirrors UTF8String's leading-byte widths, so
 *     codepoint walks agree with Spark's `length`/`substring` units.
 */
private[functions] object HashKernels {
  val mdLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  def cmpUnsigned(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x - y
      i += 1
    }
    0
  }

  def lessUnsigned(a: Array[Byte], b: Array[Byte]): Boolean =
    cmpUnsigned(a, b) < 0

  /** UTF-8 char width from the leading byte — DELEGATES to Spark's own
    * table so the mirror is exact by construction, including malformed
    * input: stray continuation bytes (0x80–0xBF) and the UTF-8-disallowed
    * leads (0xF8–0xFF) advance by 1, exactly as `substring`/`length` walk
    * them, so the fused kernels and the composed substr-based baselines
    * agree byte-for-byte even on invalid UTF-8. */
  def charWidth(b: Byte): Int = UTF8String.numBytesForFirstByte(b)

  private val HexDigits = "0123456789abcdef".toCharArray

  /** Lowercase-hex a 16-byte digest into `out` at `off` (32 bytes). */
  def hex32Into(d: Array[Byte], out: Array[Byte], off: Int): Unit = {
    var i = 0
    while (i < 16) {
      out(off + 2 * i) = HexDigits((d(i) >> 4) & 0xf).toByte
      out(off + 2 * i + 1) = HexDigits(d(i) & 0xf).toByte
      i += 1
    }
  }

  def hex32(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    hex32Into(d, out, 0)
    UTF8String.fromBytes(out)
  }

  /** Codepoint start offsets of a UTF-8 byte array: `n + 1` entries with
    * `offs(n) == bytes.length`, or null when the text has fewer than
    * `minChars` codepoints. */
  def charOffsets(bytes: Array[Byte], minChars: Int): Array[Int] = {
    var n = 0
    var off = 0
    while (off < bytes.length) { off += charWidth(bytes(off)); n += 1 }
    if (n < minChars) return null
    val offs = new Array[Int](n + 1)
    off = 0
    var ci = 0
    while (off < bytes.length) { offs(ci) = off; off += charWidth(bytes(off)); ci += 1 }
    offs(n) = bytes.length
    offs
  }
}

/**
 * Fused MinHash signature kernel — the [[DotProduct]] escape-hatch
 * pattern applied to the LSH hot path.
 *
 * CONTRACT-IDENTICAL to the composed form it replaces
 * ([[graft.operators.TextDedup.minhashSignature]]'s
 * `array((0 until k).map(i => array_min(transform(sh, s =>
 * md5(concat(lit(s"$i:"), s))))))`) and therefore to the DuckDB oracle:
 * element i of the signature is the lexicographic minimum over shingles
 * of `md5("<i>:" ++ shingle)` as lowercase hex. NULL shingle elements
 * are skipped, exactly like the composed form (a null shingle hashes to
 * null, which `array_min` ignores). DedupSpec asserts the byte-equality;
 * the t3/t19/p1 differential gates then hold unchanged.
 *
 * Why it is faster (measured ~2.7 s → well under 1 s for the signature
 * stage at sf0.1): the composed form walks k lambda transforms per row —
 * k×|shingles| trips through Concat/Md5/Cast each allocating
 * UTF8Strings, then k string `array_min` folds over 32-char hex strings.
 * The kernel loops shingle-major with ONE thread-local MessageDigest,
 * keeps the running minimum as raw 16-byte digests, and hex-encodes only
 * the k winners at the end.
 *
 * Empty (or all-null) shingle arrays yield k NULL elements, exactly like
 * `array_min` over an empty transform result — and so does a NULL
 * shingle array: the composed form's outer `array(...)` is non-null even
 * when every `transform` under it is (array_min(transform(NULL)) = NULL
 * per element, but array(...) itself never is), so the expression as a
 * whole is NOT nullable.
 */
object MinhashKernel {
  /** `"<i>:"` prefixes, cached per kernel instance (k is a literal). */
  def prefixes(k: Int): Array[Array[Byte]] =
    Array.tabulate(k)(i => (i.toString + ":").getBytes("UTF-8"))

  /** The k-NULLs signature a NULL or empty shingle array maps to. */
  def nullSignature(k: Int): ArrayData = new GenericArrayData(new Array[Any](k))

  def signature(sh: ArrayData, pfx: Array[Array[Byte]]): ArrayData = {
    val k = pfx.length
    val n = sh.numElements()
    val mins = new Array[Array[Byte]](k)
    val digest = HashKernels.mdLocal.get()
    var j = 0
    while (j < n) {
      val u = sh.getUTF8String(j)
      if (u != null) {
        val s = u.getBytes
        var i = 0
        while (i < k) {
          digest.reset()
          digest.update(pfx(i))
          digest.update(s)
          val d = digest.digest()
          if (mins(i) == null || HashKernels.lessUnsigned(d, mins(i))) mins(i) = d
          i += 1
        }
      }
      j += 1
    }
    val out = new Array[Any](k)
    var i = 0
    while (i < k) {
      out(i) = if (mins(i) == null) null else HashKernels.hex32(mins(i))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** k-element MinHash signature over an `array<string>` shingle column as
  * one fused expression node (codegen emits a single static call). */
case class MinhashSignature(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "graft_minhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string> and k > 0, got " +
        s"${child.dataType.simpleString}, k=$k")
  }

  @transient private lazy val pfx = MinhashKernel.prefixes(k)

  /** Never NULL: a NULL child yields k NULL elements, matching the
    * composed `array(array_min(transform(...)), ...)` whose outer
    * `array(...)` is non-null regardless of the input (ADVICE r7). */
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) MinhashKernel.nullSignature(k)
    else MinhashKernel.signature(v.asInstanceOf[ArrayData], pfx)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pfxRef = ctx.addReferenceObj("pfx", pfx, "byte[][]")
    val childGen = child.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code = code"""
      |${childGen.code}
      |$javaType ${ev.value} = ${childGen.isNull}
      |  ? graft.functions.MinhashKernel.nullSignature($k)
      |  : graft.functions.MinhashKernel.signature(${childGen.value}, $pfxRef);
      |""".stripMargin, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSignature =
    copy(child = newChild)
}

object MinhashSignature {
  /** Column-API entry: `graft_minhash(shingles, k)`. */
  def apply(sh: Column, k: Int): Column =
    bridge.column(MinhashSignature(bridge.expression(sh), k))
}

/**
 * Fused min-k character-gram fingerprint kernel — same escape-hatch
 * rationale as [[MinhashKernel]], applied to the t11 path.
 *
 * CONTRACT-IDENTICAL to the composed form
 * ([[graft.operators.TextAnalysis.fingerprintFromNormComposed]]): the k
 * lexicographically smallest md5s (MULTISET — duplicate grams keep their
 * duplicate hashes, exactly like `array_sort` + `slice`) of the
 * codepoint-based `gram`-char substrings, hex-concatenated ascending;
 * NULL when the text has fewer than `gram` codepoints. Gram windows walk
 * a precomputed codepoint→byte-offset table, so each md5 reads the
 * window's bytes directly — no per-position UTF8String substring
 * allocation, no O(L)-element array materialization, no string sort.
 */
object FingerprintKernel {
  def fingerprint(s: UTF8String, gram: Int, k: Int): UTF8String = {
    val bytes = s.getBytes
    val offs = HashKernels.charOffsets(bytes, gram)
    if (offs == null) return null
    val n = offs.length - 1
    // min-k multiset of digests via bounded insertion
    val mins = new Array[Array[Byte]](k)
    var filled = 0
    val digest = HashKernels.mdLocal.get()
    var i = 0
    while (i <= n - gram) {
      digest.reset()
      digest.update(bytes, offs(i), offs(i + gram) - offs(i))
      val d = digest.digest()
      if (filled < k) {
        var j = filled
        while (j > 0 && HashKernels.lessUnsigned(d, mins(j - 1))) {
          mins(j) = mins(j - 1); j -= 1
        }
        mins(j) = d
        filled += 1
      } else if (HashKernels.lessUnsigned(d, mins(k - 1))) {
        var j = k - 1
        while (j > 0 && HashKernels.lessUnsigned(d, mins(j - 1))) {
          mins(j) = mins(j - 1); j -= 1
        }
        mins(j) = d
      }
      i += 1
    }
    val out = new Array[Byte](32 * filled)
    i = 0
    while (i < filled) { HashKernels.hex32Into(mins(i), out, 32 * i); i += 1 }
    UTF8String.fromBytes(out)
  }
}

/** Min-k gram fingerprint as one fused expression node. */
case class GramFingerprint(child: Expression, gram: Int, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_fingerprint"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if gram > 0 && k > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument and gram, k > 0, got " +
        s"${child.dataType.simpleString}, gram=$gram, k=$k")
  }

  override def nullSafeEval(v: Any): Any =
    FingerprintKernel.fingerprint(v.asInstanceOf[UTF8String], gram, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.FingerprintKernel.fingerprint($c, $gram, $k);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): GramFingerprint =
    copy(child = newChild)
}

object GramFingerprint {
  /** Column-API entry: `graft_fingerprint(norm, gram, k)`. */
  def apply(norm: Column, gram: Int, k: Int): Column =
    bridge.column(GramFingerprint(bridge.expression(norm), gram, k))
}

/**
 * Winnowing fingerprint kernel (Schleimer, Wilkerson, Aiken: "Winnowing:
 * Local Algorithms for Document Fingerprinting", SIGMOD'03 — the MOSS
 * scheme). Where [[FingerprintKernel]] keeps the k GLOBAL minima (a
 * whole-doc signature), winnowing keeps one gram hash per sliding WINDOW
 * of `w` consecutive gram hashes — a POSITIONAL fingerprint set with the
 * paper's guarantee: any shared substring of at least `w + gram − 1`
 * characters contributes at least one common fingerprint, so matching
 * fingerprints localize WHERE two documents overlap, not just that they
 * do.
 *
 * Selection rule (deterministic, the oracle's spelling): in each window
 * take the minimum hash, ties broken by the RIGHTMOST position; the
 * per-window picks are then deduplicated globally as (pos, hash) pairs
 * (overlapping windows re-pick the same gram — picks are provably
 * position-monotonic, so consecutive dedup equals global distinct).
 * Output is the pick list ordered by position: array<struct<pos int,
 * h string>>; NULL when the doc has fewer than `gram + w − 1` codepoints
 * (no full window).
 */
object WinnowKernel {
  def fingerprints(s: UTF8String, gram: Int, w: Int): GenericArrayData = {
    val bytes = s.getBytes
    val offs = HashKernels.charOffsets(bytes, gram + w - 1)
    if (offs == null) return null
    val n = offs.length - 1
    val nGrams = n - gram + 1
    val nWins = nGrams - w + 1
    // all gram digests
    val digest = HashKernels.mdLocal.get()
    val hs = new Array[Array[Byte]](nGrams)
    var i = 0
    while (i < nGrams) {
      digest.reset()
      digest.update(bytes, offs(i), offs(i + gram) - offs(i))
      hs(i) = digest.digest()
      i += 1
    }
    // sliding rightmost-min via a MONOTONIC DEQUE — O(nGrams) total, not
    // O(nGrams·w): each gram index is pushed and popped at most once.
    // Pop-back on `>=` keeps the RIGHTMOST index among tied minima at the
    // front (the selection rule the oracle spells); pop-front evicts
    // indices that left the window. Consecutive dedup as before.
    val picks = new mutable.ArrayBuffer[Int](nWins)
    val deque = new Array[Int](nGrams)
    var head = 0
    var tail = 0
    var last = -1
    var p = 0
    while (p < nGrams) {
      while (tail > head &&
          HashKernels.cmpUnsigned(hs(deque(tail - 1)), hs(p)) >= 0) tail -= 1
      deque(tail) = p; tail += 1
      if (p >= w - 1) {
        while (deque(head) < p - w + 1) head += 1
        val m = deque(head)
        if (m != last) { picks += m; last = m }
      }
      p += 1
    }
    new GenericArrayData(picks.map(p =>
      InternalRow(p, HashKernels.hex32(hs(p)))).toArray[Any])
  }
}

/** Winnowing fingerprint set as one fused expression node. */
case class WinnowFingerprints(child: Expression, gram: Int, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", IntegerType), StructField("h", StringType))),
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_winnow"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if gram > 0 && w > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument and gram, w > 0, got " +
        s"${child.dataType.simpleString}, gram=$gram, w=$w")
  }

  override def nullSafeEval(v: Any): Any =
    WinnowKernel.fingerprints(v.asInstanceOf[UTF8String], gram, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.WinnowKernel.fingerprints($c, $gram, $w);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object WinnowFingerprints {
  /** Column-API entry: `graft_winnow(norm, gram, w)`. */
  def apply(norm: Column, gram: Int, w: Int): Column =
    bridge.column(WinnowFingerprints(bridge.expression(norm), gram, w))
}

object GramMd5Kernel {
  /** md5 hex of each token n-gram, streamed: gram i digests
    * `tok(i) ' ' tok(i+1) ' ' … tok(i+n-1)` byte-for-byte as
    * `md5(concat_ws(" ", …))` renders it — UTF-8 token bytes with
    * single-space separators — without building the gram string.
    * Tokens are non-null by the tokenizer contract; a null element
    * would be SKIPPED by concat_ws (separator and all), so the kernel
    * mirrors exactly that. Arrays shorter than `n` — and a NULL array,
    * whose composed `when(size(t) >= n, …)` guard also falls through
    * (size(NULL) is NULL) — yield an empty array, matching the composed
    * `otherwise([])` (KernelPropertySpec caught the NULL case). */
  def digests(toks: ArrayData, n: Int): ArrayData = {
    val len = if (toks == null) 0 else toks.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val digest = HashKernels.mdLocal.get()
    val out = new Array[Any](len - n + 1)
    var i = 0
    while (i <= len - n) {
      digest.reset()
      var j = 0
      var first = true
      while (j < n) {
        val u = toks.getUTF8String(i + j)
        if (u != null) { // concat_ws skips nulls AND their separator
          if (!first) digest.update(' '.toByte)
          digest.update(u.getBytes)
          first = false
        }
        j += 1
      }
      out(i) = HashKernels.hex32(digest.digest())
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Fused md5-per-token-n-gram kernel — the t27 (span duplication) hot
  * path: replaces `transform(gramOccurrences(t, n), g -> md5(g))`,
  * which materializes every gram as a string before hashing, with one
  * static call that streams each gram's bytes through a thread-local
  * digest. Output order and bytes are CONTRACT-IDENTICAL to the
  * composed form (DedupSpec byte-equality, incl. unicode and
  * empty-token edges). */
case class GramMd5s(child: Expression, gram: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_gram_md5s"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if gram > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string> and gram > 0, got " +
        s"${child.dataType.simpleString}, gram=$gram")
  }

  /** Never NULL: a NULL token array yields an empty array — the composed
    * `when(size(t) >= n, …).otherwise(array())` fall-through. */
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any =
    GramMd5Kernel.digests(child.eval(input).asInstanceOf[ArrayData], gram)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code = code"""
      |${childGen.code}
      |$javaType ${ev.value} = graft.functions.GramMd5Kernel.digests(
      |  ${childGen.isNull} ? null : ${childGen.value}, $gram);
      |""".stripMargin, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): GramMd5s =
    copy(child = newChild)
}

object GramMd5s {
  /** Column-API entry: md5 hex per token n-gram. */
  def apply(toks: Column, gram: Int): Column =
    bridge.column(GramMd5s(bridge.expression(toks), gram))
}

/**
 * Fused shingle-stage kernel — the whole dedup-family front end
 * (tokens → n-gram shingles → distinct → xxhash64 ids [→ MinHash
 * signature → LSH band digests]) in ONE walk over the token array.
 *
 * CONTRACT-IDENTICAL to the composed pipeline it replaces:
 *
 *   ids   = `transform(array_distinct(gramOccurrences(t, n)), xxhash64)`
 *   bands = `bandHashes(minhashSignature(shingles(t, n), k), bandSize,
 *           numBands)`
 *
 * byte-for-byte (DedupSpec asserts both), so the t2/t3/t17/t19/t38/p1
 * DuckDB differential gates hold unchanged. The mirrored edges:
 *
 *   - gram bytes are streamed exactly as `concat_ws(" ", …)` renders
 *     them — UTF-8 token bytes, single-space separators, NULL tokens
 *     skipped WITH their separator ([[GramMd5Kernel]]'s rule);
 *   - distinctness is EXACT on gram bytes (an arena-backed probe table
 *     keyed by full byte equality, xxhash64 only as the bucket hash), in
 *     first-occurrence order — `array_distinct` semantics, immune to the
 *     64-bit birthday collision a dedup-by-hash shortcut would add: two
 *     distinct grams with colliding xxhash64 emit their id twice,
 *     exactly like the composed transform;
 *   - the xxhash64 seed is 42 — Spark's `xxhash64` — via the same
 *     `XXH64.hashUnsafeBytes` the built-in evaluates;
 *   - MinHash minima are updated per DISTINCT gram (min over a set
 *     equals min over the multiset, so this matches the composed
 *     `minhashSignature(shingles(…))` which also folds the distinct
 *     array);
 *   - band digests follow `md5(concat_ws(",", slice(sig, …)))`: hex
 *     minima joined by ',', all-NULL signatures (no grams) digest the
 *     empty string;
 *   - fewer than `n` tokens — or a NULL token array, whose composed
 *     `when(size(t) >= n, …)` guard also falls through — yield an empty
 *     id array and the empty-string band digests.
 *
 * Why it is faster (the round-7 kernel rationale, applied to the LAST
 * composed hot path): the composed form allocates a UTF8String per gram
 * via `concat_ws` (after n `element_at` trips), hashes the array into
 * `array_distinct`'s set, walks it again for xxhash64, and — on the LSH
 * path — builds every gram a SECOND time for the signature consumer.
 * The kernel gathers token bytes once, builds each gram in a reusable
 * thread-local scratch buffer, and feeds id dedup and signature minima
 * from the same bytes.
 */
object ShingleKernel {
  private val scratchLocal = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](1 << 10)
  }

  private def regionEquals(a: Array[Byte], aOff: Int, b: Array[Byte],
      len: Int): Boolean = {
    var i = 0
    while (i < len) {
      if (a(aOff + i) != b(i)) return false
      i += 1
    }
    true
  }

  /** Core walk. Returns (distinct-gram xxhash64 ids — the first `count`
    * slots — , count, k running md5 minima or null when pfx is null).
    * `toks == null` behaves as zero grams (the composed guard's
    * fall-through). */
  private def scan(toks: ArrayData, n: Int, pfx: Array[Array[Byte]])
      : (Array[Long], Int, Array[Array[Byte]]) = {
    val k = if (pfx == null) 0 else pfx.length
    val mins = if (k > 0) new Array[Array[Byte]](k) else null
    val len = if (toks == null) 0 else toks.numElements()
    if (len < n) return (Array.emptyLongArray, 0, mins)
    val nGrams = len - n + 1
    // token bytes gathered once (the composed element_at walk re-reads
    // each token n times)
    val tb = new Array[Array[Byte]](len)
    var i = 0
    while (i < len) {
      val u = toks.getUTF8String(i)
      tb(i) = if (u == null) null else u.getBytes
      i += 1
    }
    var scratch = scratchLocal.get()
    // open-addressing probe table over entry indices; capacity ≥ 2×grams
    var cap = 4
    while (cap < nGrams * 2) cap <<= 1
    val mask = cap - 1
    val table = new Array[Int](cap)
    java.util.Arrays.fill(table, -1)
    val ids = new Array[Long](nGrams)
    val offs = new Array[Int](nGrams)
    val lens = new Array[Int](nGrams)
    var arena = new Array[Byte](256)
    var arenaPos = 0
    var count = 0
    val digest = HashKernels.mdLocal.get()
    var g = 0
    while (g < nGrams) {
      // gram bytes into scratch: concat_ws(" ") — nulls skipped with
      // their separator
      var glen = 0
      var first = true
      var j = 0
      while (j < n) {
        val b = tb(g + j)
        if (b != null) {
          val need = glen + b.length + 1
          if (need > scratch.length) {
            scratch = java.util.Arrays.copyOf(scratch,
              math.max(need, scratch.length * 2))
            scratchLocal.set(scratch)
          }
          if (!first) { scratch(glen) = ' '; glen += 1 }
          System.arraycopy(b, 0, scratch, glen, b.length)
          glen += b.length
          first = false
        }
        j += 1
      }
      val h = XXH64.hashUnsafeBytes(scratch, Platform.BYTE_ARRAY_OFFSET,
        glen, 42L)
      var slot = (h & mask).toInt
      var dup = false
      var e = table(slot)
      while (e != -1 && !dup) {
        if (ids(e) == h && lens(e) == glen &&
            regionEquals(arena, offs(e), scratch, glen)) dup = true
        else { slot = (slot + 1) & mask; e = table(slot) }
      }
      if (!dup) {
        table(slot) = count
        ids(count) = h
        offs(count) = arenaPos
        lens(count) = glen
        if (arenaPos + glen > arena.length) {
          arena = java.util.Arrays.copyOf(arena,
            math.max(arenaPos + glen, arena.length * 2))
        }
        System.arraycopy(scratch, 0, arena, arenaPos, glen)
        arenaPos += glen
        count += 1
        var ki = 0
        while (ki < k) {
          digest.reset()
          digest.update(pfx(ki))
          digest.update(scratch, 0, glen)
          val d = digest.digest()
          if (mins(ki) == null || HashKernels.lessUnsigned(d, mins(ki))) {
            mins(ki) = d
          }
          ki += 1
        }
      }
      g += 1
    }
    (ids, count, mins)
  }

  /** Distinct-gram xxhash64 ids, first-occurrence order. */
  def ids(toks: ArrayData, n: Int): ArrayData = {
    val (raw, count, _) = scan(toks, n, null)
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(raw, count))
  }

  private def bandDigests(mins: Array[Array[Byte]], bandSize: Int,
      numBands: Int): GenericArrayData = {
    val k = mins.length
    val digest = HashKernels.mdLocal.get()
    val hx = new Array[Byte](32)
    val bands = new Array[Any](numBands)
    var b = 0
    while (b < numBands) {
      digest.reset()
      var first = true
      var i = b * bandSize
      val end = math.min(i + bandSize, k)
      while (i < end) {
        if (mins(i) != null) { // concat_ws skips nulls and separators
          if (!first) digest.update(','.toByte)
          HashKernels.hex32Into(mins(i), hx, 0)
          digest.update(hx)
          first = false
        }
        i += 1
      }
      bands(b) = HashKernels.hex32(digest.digest())
      b += 1
    }
    new GenericArrayData(bands)
  }

  /** struct(s: ids, bands: LSH band digests) in one walk. */
  def lsh(toks: ArrayData, n: Int, pfx: Array[Array[Byte]], bandSize: Int,
      numBands: Int): InternalRow = {
    val (raw, count, mins) = scan(toks, n, pfx)
    InternalRow(
      UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(raw, count)),
      bandDigests(mins, bandSize, numBands))
  }

  /** Band digests ONLY — the streaming near-dup path, which never
    * consumes the shingle ids. The MinHash minimum over the gram
    * MULTISET equals the minimum over the distinct set, so this walk
    * needs no dedup table, no arena, and no id array at all: each gram
    * is built in scratch and folded straight into the k minima. */
  def bands(toks: ArrayData, n: Int, pfx: Array[Array[Byte]],
      bandSize: Int, numBands: Int): GenericArrayData = {
    val k = pfx.length
    val mins = new Array[Array[Byte]](k)
    val len = if (toks == null) 0 else toks.numElements()
    if (len >= n) {
      val nGrams = len - n + 1
      val tb = new Array[Array[Byte]](len)
      var i = 0
      while (i < len) {
        val u = toks.getUTF8String(i)
        tb(i) = if (u == null) null else u.getBytes
        i += 1
      }
      var scratch = scratchLocal.get()
      val digest = HashKernels.mdLocal.get()
      var g = 0
      while (g < nGrams) {
        var glen = 0
        var first = true
        var j = 0
        while (j < n) {
          val b = tb(g + j)
          if (b != null) {
            val need = glen + b.length + 1
            if (need > scratch.length) {
              scratch = java.util.Arrays.copyOf(scratch,
                math.max(need, scratch.length * 2))
              scratchLocal.set(scratch)
            }
            if (!first) { scratch(glen) = ' '; glen += 1 }
            System.arraycopy(b, 0, scratch, glen, b.length)
            glen += b.length
            first = false
          }
          j += 1
        }
        var ki = 0
        while (ki < k) {
          digest.reset()
          digest.update(pfx(ki))
          digest.update(scratch, 0, glen)
          val d = digest.digest()
          if (mins(ki) == null || HashKernels.lessUnsigned(d, mins(ki))) {
            mins(ki) = d
          }
          ki += 1
        }
        g += 1
      }
    }
    bandDigests(mins, bandSize, numBands)
  }
}

/**
 * Fused whitespace tokenizer — the [[graft.operators.TextDedup.tokens]]
 * front end (`filter(split(lower(trim(text)), "\\s+"), x != "")`) as one
 * expression node.
 *
 * CONTRACT-IDENTICAL to the composed form (DedupSpec byte-equality):
 *
 *   - lowercasing IS Spark's — the kernel calls the same
 *     `UTF8String.toLowerCase` the `lower` expression evaluates (ASCII
 *     fast path, JDK fallback for multi-byte case mappings), so ß/İ/Σ
 *     edge mappings cannot diverge;
 *   - the split walk mirrors Java regex `\s+` exactly: separators are
 *     maximal runs of the ASCII class `[ \t\n\x0B\f\r]` (Java's `\s`
 *     without UNICODE_CHARACTER_CLASS — unicode spaces like U+00A0 are
 *     TOKEN bytes, as in the composed form), and all separator bytes
 *     are < 0x80, so the byte walk cannot split a multi-byte codepoint;
 *   - `trim` in the composed form only strips leading/trailing ' ',
 *     which the split + empty-filter already discards — the kernel
 *     needs no trim step for byte-identical output;
 *   - empty-token filtering is structural: a maximal non-separator run
 *     is non-empty by construction, exactly the composed filter's
 *     result (regex split only yields "" at the edges).
 *
 * Why it is faster: `UTF8String.split` round-trips through
 * `String` — a full UTF-8 decode, a compiled-regex scan, a `String[]`,
 * and a re-encode back to UTF8String per token — then the filter lambda
 * walks the array again. The kernel lowercases once and emits tokens as
 * zero-copy slices of the lowered byte array.
 */
object TokenizeKernel {
  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** `useICU` mirrors the `Lower` expression's own flag
    * (`spark.sql.icu.caseMappings.enabled`): ICU and the JDK disagree on
    * Greek final-sigma context (ICU requires a PRECEDING cased letter —
    * "aσ0Σ" lowers to `…0σ`, the JDK yields `…0ς`), so the kernel must
    * route through the same `CollationSupport.Lower` entry the built-in
    * evaluates, with the same flag — caught by KernelPropertySpec, which
    * generates exactly these contexts. */
  def tokens(text: UTF8String, useICU: Boolean): GenericArrayData = {
    val bytes = org.apache.spark.sql.catalyst.util.CollationSupport.Lower
      .exec(text, 0, useICU).getBytes
    val n = bytes.length
    val out = new mutable.ArrayBuffer[Any](8)
    var i = 0
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      val start = i
      while (i < n && !isWs(bytes(i))) i += 1
      if (i > start) out += UTF8String.fromBytes(bytes, start, i - start)
    }
    new GenericArrayData(out.toArray)
  }
}

/** Whitespace tokens of lowercased text as one fused expression node. */
case class GraftTokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_tokens"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${child.dataType.simpleString}")
  }

  /** Same capture discipline as the built-in `Lower`: a lazy read of the
    * session flag at first use. */
  @transient private lazy val useICU: Boolean =
    org.apache.spark.sql.internal.SQLConf.get
      .getConf(org.apache.spark.sql.internal.SQLConf.ICU_CASE_MAPPINGS_ENABLED)

  override def nullSafeEval(v: Any): Any =
    TokenizeKernel.tokens(v.asInstanceOf[UTF8String], useICU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.functions.TokenizeKernel.tokens($c, $useICU);"
    })

  override protected def withNewChildInternal(newChild: Expression): GraftTokens =
    copy(child = newChild)
}

object GraftTokens {
  /** Column-API entry: fused whitespace tokenizer. */
  def apply(text: Column): Column =
    bridge.column(GraftTokens(bridge.expression(text)))
}

/** Distinct-shingle xxhash64 ids as one fused expression node — the
  * [[graft.operators.TextDedup.hashedShingles]] projection. */
case class ShingleIds(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_ids"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string> and n > 0, got " +
        s"${child.dataType.simpleString}, n=$n")
  }

  /** Never NULL: a NULL token array yields an empty id array — the
    * composed `when(size(t) >= n, …).otherwise(array())` fall-through. */
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any =
    ShingleKernel.ids(child.eval(input).asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code = code"""
      |${childGen.code}
      |$javaType ${ev.value} = graft.functions.ShingleKernel.ids(
      |  ${childGen.isNull} ? null : ${childGen.value}, $n);
      |""".stripMargin, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleIds =
    copy(child = newChild)
}

object ShingleIds {
  /** Column-API entry: distinct n-gram shingle ids over a token array. */
  def apply(toks: Column, n: Int): Column =
    bridge.column(ShingleIds(bridge.expression(toks), n))
}

/** The full LSH front end — struct(s: shingle ids, bands: band digests)
  * — as one fused expression node; the
  * [[graft.operators.TextDedup.shingleLshFrame]] projection. */
case class ShingleLshBands(child: Expression, n: Int, k: Int,
    bandSize: Int, numBands: Int) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("s", ArrayType(LongType, containsNull = false)),
    StructField("bands", ArrayType(StringType, containsNull = false))))
  override def prettyName: String = "graft_shingle_lsh"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _)
        if n > 0 && k > 0 && bandSize > 0 && numBands > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string> and n, k, bandSize, numBands " +
        s"> 0, got ${child.dataType.simpleString}, n=$n, k=$k, " +
        s"bandSize=$bandSize, numBands=$numBands")
  }

  @transient private lazy val pfx = MinhashKernel.prefixes(k)

  /** Never NULL: a NULL token array yields (empty ids, empty-string band
    * digests), matching the composed guard's fall-through. */
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any =
    ShingleKernel.lsh(child.eval(input).asInstanceOf[ArrayData], n, pfx,
      bandSize, numBands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pfxRef = ctx.addReferenceObj("pfx", pfx, "byte[][]")
    val childGen = child.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code = code"""
      |${childGen.code}
      |$javaType ${ev.value} = graft.functions.ShingleKernel.lsh(
      |  ${childGen.isNull} ? null : ${childGen.value}, $n, $pfxRef,
      |  $bandSize, $numBands);
      |""".stripMargin, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleLshBands =
    copy(child = newChild)
}

object ShingleLshBands {
  /** Column-API entry: struct(s, bands) over a token array. */
  def apply(toks: Column, n: Int, k: Int, bandSize: Int,
      numBands: Int): Column =
    bridge.column(ShingleLshBands(bridge.expression(toks), n, k, bandSize,
      numBands))
}

/** LSH band digests ONLY (no shingle-id output) — the streaming
  * near-dup projection, where materializing the unused id array per row
  * would be waste. Byte-identical to
  * `ShingleLshBands(…).getField("bands")` (DedupSpec asserts it). */
case class ShingleBands(child: Expression, n: Int, k: Int,
    bandSize: Int, numBands: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingle_bands"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _)
        if n > 0 && k > 0 && bandSize > 0 && numBands > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string> and n, k, bandSize, numBands " +
        s"> 0, got ${child.dataType.simpleString}, n=$n, k=$k, " +
        s"bandSize=$bandSize, numBands=$numBands")
  }

  @transient private lazy val pfx = MinhashKernel.prefixes(k)

  /** Never NULL: a NULL token array yields the empty-string band
    * digests, matching the composed guard's fall-through. */
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any =
    ShingleKernel.bands(child.eval(input).asInstanceOf[ArrayData], n, pfx,
      bandSize, numBands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pfxRef = ctx.addReferenceObj("pfx", pfx, "byte[][]")
    val childGen = child.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code = code"""
      |${childGen.code}
      |$javaType ${ev.value} = graft.functions.ShingleKernel.bands(
      |  ${childGen.isNull} ? null : ${childGen.value}, $n, $pfxRef,
      |  $bandSize, $numBands);
      |""".stripMargin, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleBands =
    copy(child = newChild)
}

object ShingleBands {
  /** Column-API entry: band digests over a token array. */
  def apply(toks: Column, n: Int, k: Int, bandSize: Int,
      numBands: Int): Column =
    bridge.column(ShingleBands(bridge.expression(toks), n, k, bandSize,
      numBands))
}
