package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Imperative kernels behind the text-hashing expressions. Static
  * methods so whole-stage codegen can call them directly (the emitted
  * Java references `graft.functions.TextHash.…`), with a thread-local
  * MessageDigest — Spark's own `md5()` builds a fresh MessageDigest per
  * call, which dominates when hashing millions of short shingles.
  */
object TextHash {
  private val mdLocal: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  private val prefixCache =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Array[Byte]]]()

  private def seedPrefixes(k: Int): Array[Array[Byte]] =
    prefixCache.computeIfAbsent(k, k2 => Array.tabulate(k2)(s => s"$s|".getBytes("UTF-8")))

  private val HEX = "0123456789abcdef".getBytes("US-ASCII")

  private def hex(digest: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HEX((digest(i) >> 4) & 0xf)
      out(2 * i + 1) = HEX(digest(i) & 0xf)
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Single-pass equivalent of
    * `md5(trim(regexp_replace(regexp_replace(lower(s), "[^a-z0-9 ]", ""), " +", " ")))`:
    * lowercase, keep only `[a-z0-9 ]`, collapse space runs, trim, md5-hex.
    * Byte-level filtering after `UTF8String.toLowerCase` is safe because
    * every UTF-8 byte of a multi-byte code point is ≥ 0x80 and therefore
    * dropped exactly as the regex drops the code point. */
  def fingerprint(s: UTF8String): UTF8String = {
    val lower = s.toLowerCase.getBytes
    val buf = new Array[Byte](lower.length)
    var n = 0
    var pendingSpace = false
    var i = 0
    while (i < lower.length) {
      val b = lower(i)
      if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) {
        if (pendingSpace && n > 0) { buf(n) = ' '; n += 1 }
        pendingSpace = false
        buf(n) = b
        n += 1
      } else if (b == ' ') {
        pendingSpace = true
      }
      i += 1
    }
    val md = mdLocal.get()
    md.update(buf, 0, n)
    hex(md.digest())
  }

  /** Single-pass equivalent of the reference cleaning chain
    * (ref: bronze_to_silver_on_minio.py:27-33):
    *   1. `regexp_replace(s, "^u?'|'?$", "")` — strip a leading `u'`
    *      or `'` and one trailing `'`;
    *   2. substring-replace True→true / False→false (non-overlapping,
    *      left-to-right, like two replaceAll passes — the patterns
    *      share no characters so interleaving is equivalent);
    *   3. case-insensitive "none" → null (ASCII compare is exact: no
    *      Unicode char lowercases into n/o/n/e, and ASCII lowering
    *      preserves length).
    * Returns null for the "none" case. */
  def cleanString(s: UTF8String): UTF8String = {
    val b = s.getBytes
    var start = 0
    var end = b.length
    if (end - start >= 2 && b(0) == 'u' && b(1) == '\'') start += 2
    else if (end - start >= 1 && b(0) == '\'') start += 1
    if (end > start && b(end - 1) == '\'') end -= 1
    val out = java.util.Arrays.copyOfRange(b, start, end)
    var i = 0
    while (i < out.length) {
      if (i + 4 <= out.length && out(i) == 'T' && out(i + 1) == 'r' &&
        out(i + 2) == 'u' && out(i + 3) == 'e') { out(i) = 't'; i += 4 }
      else if (i + 5 <= out.length && out(i) == 'F' && out(i + 1) == 'a' &&
        out(i + 2) == 'l' && out(i + 3) == 's' && out(i + 4) == 'e') { out(i) = 'f'; i += 5 }
      else i += 1
    }
    if (out.length == 4 &&
      (out(0) | 0x20) == 'n' && (out(1) | 0x20) == 'o' &&
      (out(2) | 0x20) == 'n' && (out(3) | 0x20) == 'e') null
    else UTF8String.fromBytes(out)
  }

  // Packed 2×31-bit polynomial rolling hash (Rabin-Karp): two
  // independent (base, prime) pairs keep the per-window collision
  // probability ~2⁻⁶², and both residues pack into one non-negative
  // long — an 8-byte shuffle key where a hex md5 digest is 32 bytes.
  private val P1 = 2147483647L // 2^31 − 1 (Mersenne prime)
  private val B1 = 1000003L
  private val P2 = 2147483629L // largest prime < 2^31 − 1
  private val B2 = 999983L

  /** All k-token-window hashes of a token array in ONE O(n) pass —
    * the Rabin-Karp replacement for hashing each window's joined text
    * (O(n·k) bytes through md5). Each token is md5'd ONCE to a 32-bit
    * value (the first 4 digest bytes, big-endian — what
    * `conv(substring(md5(t),1,8),16,10)` computes); window hashes then
    * roll in O(1) per position: drop the leading token's term,
    * multiply by the base, add the entering token.
    *
    * Equality semantics match the joined-text form: tokens come from a
    * whitespace split, so they cannot contain the join character, and
    * per-token hashing cannot merge adjacent tokens. Null tokens hash
    * like empty strings. Arrays shorter than k yield an empty array.
    * Returns array<long>, element i = packed hash of the window
    * starting at 0-based position i. */
  def windowHashes(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    val nOut = n - k + 1
    if (nOut <= 0)
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(Array.emptyLongArray)
    val md = mdLocal.get()
    val v = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) md.update(toks.getUTF8String(i).getBytes)
      val dg = md.digest()
      v(i) = ((dg(0) & 0xffL) << 24) | ((dg(1) & 0xffL) << 16) |
        ((dg(2) & 0xffL) << 8) | (dg(3) & 0xffL)
      i += 1
    }
    // B^(k−1) mod P — the leading-term weight the roll subtracts
    var bk1 = 1L; var bk2 = 1L
    var j = 1
    while (j < k) { bk1 = bk1 * B1 % P1; bk2 = bk2 * B2 % P2; j += 1 }
    val out = new Array[Long](nOut)
    // every intermediate stays under 2^62: residues < 2^31 and the
    // bases < 2^20, so products < 2^51 and residue×residue < 2^62
    var h1 = 0L; var h2 = 0L
    j = 0
    while (j < k) { h1 = (h1 * B1 + v(j) % P1) % P1; h2 = (h2 * B2 + v(j) % P2) % P2; j += 1 }
    out(0) = (h1 << 31) | h2
    var s = 1
    while (s < nOut) {
      h1 -= v(s - 1) % P1 * bk1 % P1; if (h1 < 0) h1 += P1
      h1 = (h1 * B1 + v(s + k - 1) % P1) % P1
      h2 -= v(s - 1) % P2 * bk2 % P2; if (h2 < 0) h2 += P2
      h2 = (h2 * B2 + v(s + k - 1) % P2) % P2
      out(s) = (h1 << 31) | h2
      s += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Checked-in byte-pair merge table — 1100 rules trained over the
    * repo's own documentation by tools/bpe_train_table.py (the
    * public-knowledge BPE shape of Sennrich et al., 2016, with this
    * engine's exact merge conventions; a deployment substitutes its
    * model's merge list, same format). A four-digit table exercises
    * the bounded word cache and makes the token-denominated budgets
    * (q55/q67/q79) meaningful, unlike a toy demo vocabulary.
    * Invariant (spec-asserted): each side of a rule is a single
    * character or the OUTPUT of an earlier rule. That ordering makes
    * sequential rule-at-a-time application exact BPE inference: a
    * merge's output can only ever pair under LATER rules, so applying
    * rule r greedily can never create a match for a rule < r. */
  val bpeMergeTable: Array[(String, String)] = BpeMergeTable1k.rules

  // Per-word results memoized across rows: natural-language vocabularies
  // are Zipfian, so the same words recur millions of times at 100 TB.
  // The cache is bounded (never a memory hazard on adversarial inputs —
  // past the bound, words just re-encode) and value-deterministic, so
  // hit-or-miss never changes results. UTF8String values are immutable;
  // sharing them across output rows is safe.
  private val bpeCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[UTF8String]]()
  private val BpeCacheMax = 1 << 16

  private def bpeWord(w: String): Array[UTF8String] = {
    val cached = bpeCache.get(w)
    if (cached != null) return cached
    var syms = new Array[String](w.length)
    var i = 0
    while (i < w.length) { syms(i) = String.valueOf(w.charAt(i)); i += 1 }
    var ri = 0
    while (ri < bpeMergeTable.length) {
      val (a, b) = bpeMergeTable(ri)
      // greedy left-to-right non-overlapping merge of ONE rule — the
      // same result as repeatedly merging the leftmost (a,b) pair:
      // the merged symbol a+b can re-match neither as the rule's left
      // (a+b = a needs b empty) nor right (a+b = b needs a empty) side
      if (w.contains(a + b)) {
        val out = new Array[String](syms.length)
        var n = 0
        var j = 0
        while (j < syms.length) {
          if (j + 1 < syms.length && syms(j) == a && syms(j + 1) == b) {
            out(n) = a + b; n += 1; j += 2
          } else { out(n) = syms(j); n += 1; j += 1 }
        }
        syms = java.util.Arrays.copyOf(out, n)
      }
      ri += 1
    }
    val res = syms.map(UTF8String.fromString)
    if (bpeCache.size < BpeCacheMax) bpeCache.put(w, res)
    res
  }

  /** BPE-encode a pre-tokenized word array: each word splits to
    * characters and the merge table applies in order (see
    * [[bpeMergeTable]]); outputs flatten in word order. Null words
    * contribute nothing. The built-in-only twin (identical output,
    * asserted in ExtSpec) is [[graft.ext.TextStats.bpeTokensHof]];
    * the DuckDB oracle states the same algorithm as a recursive
    * leftmost-merge CTE. */
  def bpeEncode(words: ArrayData): ArrayData = {
    val n = words.numElements()
    val parts = new Array[Array[UTF8String]](n)
    var total = 0
    var i = 0
    while (i < n) {
      if (!words.isNullAt(i)) {
        val p = bpeWord(words.getUTF8String(i).toString)
        parts(i) = p
        total += p.length
      }
      i += 1
    }
    val out = new Array[Any](total)
    var pos = 0
    i = 0
    while (i < n) {
      val p = parts(i)
      if (p != null) { var j = 0; while (j < p.length) { out(pos) = p(j); pos += 1; j += 1 } }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** k MinHash signatures over w-token shingles of a token array, in
    * one pass per row — semantically identical to exploding shingles
    * and taking `min(md5(concat(s + "|", shingle)))` per seed s:
    *
    *   - shingling matches `Dedup.shinglesFromTokens`: arrays shorter
    *     than w yield one shingle joining all tokens; otherwise every
    *     w-window joined with single spaces (null tokens skipped, as
    *     `concat_ws` does);
    *   - the min is taken over raw 16-byte digests with unsigned
    *     comparison — hex encoding is monotonic for equal-length
    *     arrays, so this equals the lexicographic min over hex strings;
    *   - output = the k minima, hex-encoded, as array<string>.
    */
  def minhash(toks: ArrayData, w: Int, k: Int): ArrayData = {
    val n = toks.numElements()
    val tokBytes = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      tokBytes(i) = if (toks.isNullAt(i)) null else toks.getUTF8String(i).getBytes
      i += 1
    }

    def shingleBytes(from: Int, until: Int): Array[Byte] = {
      var len = 0
      var cnt = 0
      var j = from
      while (j < until) {
        val tb = tokBytes(j)
        if (tb != null) { len += tb.length; cnt += 1 }
        j += 1
      }
      if (cnt > 1) len += cnt - 1
      val out = new Array[Byte](len)
      var pos = 0
      var first = true
      j = from
      while (j < until) {
        val tb = tokBytes(j)
        if (tb != null) {
          if (!first) { out(pos) = ' '; pos += 1 }
          System.arraycopy(tb, 0, out, pos, tb.length)
          pos += tb.length
          first = false
        }
        j += 1
      }
      out
    }

    val md = mdLocal.get()
    val prefixes = seedPrefixes(k)
    val mins = new Array[Array[Byte]](k)

    def absorb(sh: Array[Byte]): Unit = {
      var s = 0
      while (s < k) {
        md.update(prefixes(s))
        md.update(sh)
        val dg = md.digest()
        if (mins(s) == null || java.util.Arrays.compareUnsigned(dg, mins(s)) < 0)
          mins(s) = dg
        s += 1
      }
    }

    if (n < w) {
      absorb(shingleBytes(0, n))
    } else {
      var st = 0
      while (st <= n - w) {
        absorb(shingleBytes(st, st + w))
        st += 1
      }
    }

    new GenericArrayData(mins.map(hex(_): Any))
  }
}

/** `norm_fingerprint(text)`: fused normalize-and-md5 (see
  * [[TextHash.fingerprint]]). Replaces a lower → two regexp_replace →
  * trim → md5 chain (two full regex passes over every document) with
  * one linear scan; results are byte-identical, so the DuckDB oracle
  * keeps the regex formulation. */
/** Imperative kernel behind `langid_scores` — the trained trigram
  * language-ID table applied in ONE pass per row. The declarative twin
  * (normalize → trigram explode → broadcast-join the 1.4k-row model →
  * per-doc aggregation, kept as [[graft.ext.TextStats.langIdNgramJoined]]
  * for the ExtSpec differential) fans every document out to one row
  * per character and pays an aggregation shuffle; this computes the
  * same exact integer sums row-locally — no explode, no join, no
  * shuffle.
  *
  * The trigram alphabet after normalization is exactly {a..z, space},
  * so a trigram packs into 15 bits (27 < 32 values per char) and the
  * model lives in a direct-indexed 32768-slot array — O(1) lookup,
  * zero allocation per trigram.
  *
  * Normalization replicates `' ' || regexp_replace(lower(s), '[^a-z]+', ' ') || ' '`
  * byte-exactly: lowering first (UTF8String.toLowerCase — the same
  * call Spark's `lower()` makes), then every maximal run of non-[a-z]
  * BYTES collapses to one space. Byte-level is exact because every
  * byte of a multi-byte UTF-8 code point is ≥ 0x80 — non-letter — so
  * a code-point run and its byte run collapse identically. */
object LangIdKernel {
  val languages: Seq[String] = LangIdTrigramTable.languages
  private val nLangs = languages.length

  private val table: Array[Array[Long]] = {
    val t = new Array[Array[Long]](32 * 32 * 32)
    val idx = languages.zipWithIndex.toMap
    def code(c: Char): Int = if (c == ' ') 26 else c - 'a'
    LangIdTrigramTable.entries.foreach { case (lang, gram, w) =>
      val slot = (code(gram(0)) << 10) | (code(gram(1)) << 5) | code(gram(2))
      if (t(slot) == null) t(slot) = new Array[Long](nLangs)
      t(slot)(idx(lang)) = w
    }
    t
  }

  def scores(s: UTF8String): ArrayData = {
    val lower = s.toLowerCase.getBytes
    // normalized buffer: leading pad + collapsed text + trailing pad
    val buf = new Array[Byte](lower.length + 2)
    buf(0) = ' '
    var n = 1
    var pendingGap = false
    var i = 0
    while (i < lower.length) {
      val b = lower(i)
      if (b >= 'a' && b <= 'z') {
        if (pendingGap) { buf(n) = ' '; n += 1; pendingGap = false }
        buf(n) = b
        n += 1
      } else pendingGap = true
      i += 1
    }
    if (pendingGap) { buf(n) = ' '; n += 1 }
    buf(n) = ' '
    n += 1
    val acc = new Array[Long](nLangs)
    // rolling 15-bit pack: shift in one char code per step
    if (n >= 3) {
      def code(b: Byte): Int = if (b == ' ') 26 else b - 'a'
      var packed = (code(buf(0)) << 5) | code(buf(1))
      i = 2
      while (i < n) {
        packed = ((packed << 5) | code(buf(i))) & 0x7fff
        val w = table(packed)
        if (w != null) {
          var j = 0
          while (j < nLangs) { acc(j) += w(j); j += 1 }
        }
        i += 1
      }
    }
    new GenericArrayData(acc)
  }
}

/** `langid_scores(text)`: exact per-language trigram scores as
  * `array<long>` in [[LangIdKernel]]'s language order — one fused
  * pass, shuffle-free (see the kernel doc for the declarative twin
  * it replaces). */
case class LangIdScores(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"langid_scores requires a string input, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    LangIdKernel.scores(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LangIdKernel.scores($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class NormalizedFingerprint(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"norm_fingerprint requires a string input, got ${dt.simpleString}")
  }

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    TextHash.fingerprint(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.fingerprint($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `clean_string(text)`: the fused Bronze→Silver cleaning chain (see
  * [[TextHash.cleanString]]) — replaces three regexp_replace passes +
  * lower + when per value with one linear scan. Returns NULL for
  * "none"-valued inputs, hence the nullable override. */
case class CleanedString(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"clean_string requires a string input, got ${dt.simpleString}")
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    TextHash.cleanString(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("cleaned")
      s"""
         |UTF8String $r = graft.functions.TextHash.cleanString($c);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `minhash_sigs(tokens, w, k)`: all k MinHash signatures of a token
  * array in one pass (see [[TextHash.minhash]]). The declarative
  * formulation (explode shingles → groupBy doc → k × min(md5)) shuffles
  * every shingle row and hash-aggregates k string minima; this computes
  * the same k minima row-locally — no explode, no shuffle, one
  * MessageDigest reused across all shingles. */
case class MinHashSignature(child: Expression, w: Int, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if w >= 1 && k >= 1 => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"minhash_sigs requires array<string> input and positive w/k, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TextHash.minhash(input.asInstanceOf[ArrayData], w, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.minhash($c, $w, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `token_window_hashes(tokens, k)`: packed 64-bit rolling hashes of
  * every k-token window (see [[TextHash.windowHashes]]). Replaces
  * per-window `md5(array_join(slice(...)))` — O(n·k) bytes hashed per
  * document and a 32-char string key — with one O(n) pass and an
  * 8-byte long key. The built-in-only twin (bit-identical; asserted in
  * ExtSpec) is [[graft.ext.Dedup.windowHashesHof]]. */
case class TokenWindowHashes(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k >= 1 => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"token_window_hashes requires array<string> input and positive k, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TextHash.windowHashes(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.windowHashes($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `bpe_encode(words)`: BPE-encode a pre-tokenized word array with the
  * checked-in merge table (see [[TextHash.bpeMergeTable]]) — subword
  * tokens flattened in word order. The imperative kernel is O(rules ×
  * word length) per word with a bounded cross-row word cache; the
  * equivalent nested-fold HOF twin re-allocates an array per symbol
  * per rule, which this replaces in the hot path. */
case class BpeEncode(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode requires array<string> input, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TextHash.bpeEncode(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.bpeEncode($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextFunctions {
  /** Register the text-hash expressions in the session's function
    * registry (Column API goes through `call_function`). Idempotent,
    * and guarded per function — a session where one name already
    * exists still gets the others. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def ifAbsent(name: String)(builder: Seq[Expression] => Expression): Unit =
      if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(name)))
        reg.createOrReplaceTempFunction(name, builder, "built-in")
    ifAbsent("norm_fingerprint")(exprs => NormalizedFingerprint(exprs(0)))
    ifAbsent("clean_string")(exprs => CleanedString(exprs(0)))
    ifAbsent("minhash_sigs")(exprs => MinHashSignature(
      exprs(0),
      requireIntLiteral(exprs, 1, "minhash_sigs", "w"),
      requireIntLiteral(exprs, 2, "minhash_sigs", "k")))
    ifAbsent("token_window_hashes")(exprs => TokenWindowHashes(
      exprs(0),
      requireIntLiteral(exprs, 1, "token_window_hashes", "k")))
    ifAbsent("bpe_encode")(exprs => BpeEncode(exprs(0)))
    ifAbsent("langid_scores")(exprs => LangIdScores(exprs(0)))
  }

  /** w/k are structural parameters (they shape the produced expression
    * tree), so SQL callers must pass integer LITERALS — anything else
    * gets a clear error instead of an opaque cast/NPE at eval. */
  private def requireIntLiteral(exprs: Seq[Expression], pos: Int,
                                fn: String, param: String): Int = {
    if (exprs.length <= pos) throw new IllegalArgumentException(
      s"$fn: missing argument $param at position ${pos + 1}")
    exprs(pos) match {
      case Literal(v: Number, ByteType | ShortType | IntegerType | LongType) if v != null =>
        v.intValue()
      case other => throw new IllegalArgumentException(
        s"$fn: $param must be an integer literal, got ${other.sql}")
    }
  }

  // Column API builds the expressions directly (no registry needed, so
  // library callers work in any session); `register` exists for SQL text.
  import org.apache.spark.sql.graftshim.ColumnShim.{column, expression}

  def normFingerprint(text: Column): Column =
    column(NormalizedFingerprint(expression(text)))

  def cleanString(text: Column): Column =
    column(CleanedString(expression(text)))

  def minhashSigs(tokens: Column, w: Int, k: Int): Column =
    column(MinHashSignature(expression(tokens), w, k))

  def tokenWindowHashes(tokens: Column, k: Int): Column =
    column(TokenWindowHashes(expression(tokens), k))

  def bpeEncode(words: Column): Column =
    column(BpeEncode(expression(words)))

  def langIdScores(text: Column): Column =
    column(LangIdScores(expression(text)))
}
