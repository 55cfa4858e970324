package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Text-pipeline kernels as native codegen'd expressions.
  *
  * The word-shingle / hash / fingerprint / simhash steps are per-row loops
  * over tokens; composing them from `transform`/`aggregate` lambdas leaves
  * the hot path on the interpreted higher-order evaluator (~1 ms/row
  * measured). Each kernel here is one static JVM call per row inside
  * whole-stage codegen.
  *
  * Semantics are locked to the DuckDB oracle definitions in
  * [[graft.pipeline.PipelineQueries]]:
  *   - tokenization = split on single space, KEEPING empty tokens
  *     (Java `split(" ", -1)` / DuckDB `string_split`),
  *   - portable hash = first 12 hex chars of md5, a-f mapped to 1-6,
  *     parsed as a decimal long,
  *   - fingerprint = ordered fold (acc*131 + h) mod 1e9+7 over token hashes,
  *   - simhash16 = sign-sum over DISTINCT token hashes for bits 0..15.
  */
object TextOps {

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val HexDigits = "0123456789123456".toCharArray // a-f → 1-6

  /** md5 → first 12 hex chars with a-f→1-6 → decimal long. Equals
    * `CAST(translate(substr(md5(s),1,12),'abcdef','123456') AS BIGINT)`.
    */
  def portableHash(s: UTF8String): Long = {
    val digest = md.get()
    digest.reset()
    val h = digest.digest(s.getBytes)
    // first 12 hex chars = first 6 bytes, high nibble first
    var acc = 0L
    var i = 0
    while (i < 6) {
      val b = h(i) & 0xff
      acc = acc * 10 + (HexDigits(b >> 4) - '0')
      acc = acc * 10 + (HexDigits(b & 0xf) - '0')
      i += 1
    }
    acc
  }

  private val Space = UTF8String.fromString(" ")

  private def tokens(s: UTF8String): Array[UTF8String] =
    s.split(Space, -1)

  /** Join tokens t(i..i+n-1) with single spaces — THE shingle definition,
    * shared by the ordered and distinct builders so it cannot drift.
    */
  private def joinShingle(t: Array[UTF8String], i: Int, n: Int): UTF8String = {
    var sh = t(i)
    var j = 1
    while (j < n) {
      sh = UTF8String.concat(sh, Space, t(i + j))
      j += 1
    }
    sh
  }

  /** Consecutive n-word shingles joined by single spaces; empty when fewer
    * than n tokens.
    */
  def shingles(s: UTF8String, n: Int): ArrayData = {
    val t = tokens(s)
    if (t.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](t.length - n + 1)
    var i = 0
    while (i < out.length) {
      out(i) = joinShingle(t, i, n)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Ordered polynomial fold over token hashes: (acc*131 + h) mod 1e9+7. */
  def fingerprint(s: UTF8String): Long = {
    val t = tokens(s)
    var acc = 0L
    var i = 0
    while (i < t.length) {
      acc = (acc * 131L + portableHash(t(i))) % 1000000007L
      i += 1
    }
    acc
  }

  /** n-bit simhash: per bit, sign-sum of distinct token hashes. */
  private def simhashN(s: UTF8String, bits: Int): Long = {
    val t = tokens(s)
    val seen = new java.util.HashSet[UTF8String]()
    val sums = new Array[Int](bits)
    var i = 0
    while (i < t.length) {
      if (seen.add(t(i))) {
        val h = portableHash(t(i))
        var j = 0
        while (j < bits) {
          sums(j) += (if (((h >> j) & 1L) == 1L) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < bits) {
      if (sums(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  def simhash16(s: UTF8String): Long = simhashN(s, 16)

  /** 32-bit variant for near-dup banding: two 16-bit bands give 65536-way
    * buckets — the 8-bit bands of a 16-bit signature collapse on
    * low-entropy corpora (measured ~90% of all pairs as candidates).
    */
  def simhash32(s: UTF8String): Long = simhashN(s, 32)

  /** MinHash family (i, a, b) for h_i = (a*h + b) mod [[MinhashP]] — the
    * single source of truth shared by the kernel below and the DuckDB
    * oracle literals in [[graft.pipeline.PipelineQueries]].
    */
  val MinhashFamily: Seq[(Int, Long, Long)] = Seq(
    (1, 131L, 7L), (2, 137L, 11L), (3, 139L, 13L), (4, 149L, 17L),
    (5, 151L, 19L), (6, 157L, 23L), (7, 163L, 29L), (8, 167L, 31L),
    (9, 173L, 37L), (10, 179L, 41L), (11, 181L, 43L), (12, 191L, 47L))
  val MinhashP = 2147483647L
  private val MinhashA = MinhashFamily.map(_._2).toArray
  private val MinhashB = MinhashFamily.map(_._3).toArray

  private def distinctShingles(s: UTF8String, n: Int): java.util.HashSet[UTF8String] = {
    val t = tokens(s)
    val set = new java.util.HashSet[UTF8String]()
    if (t.length >= n) {
      var i = 0
      while (i <= t.length - n) {
        set.add(joinShingle(t, i, n))
        i += 1
      }
    }
    set
  }

  /** All 12 family minhashes over the doc's DISTINCT n-word shingles in one
    * row-level pass — the kernel twin of `min((a*h+b) % P) GROUP BY doc`
    * over exploded shingles, with the explode/distinct/groupBy shuffles
    * deleted. Empty array when the doc has fewer than n tokens (such docs
    * have no signature and never band — matching the grouped formulation,
    * where they simply produce no rows).
    */
  def minhashSig(s: UTF8String, n: Int): ArrayData = {
    val set = distinctShingles(s, n)
    if (set.isEmpty) return new GenericArrayData(Array.empty[Any])
    val mins = Array.fill[Long](MinhashA.length)(Long.MaxValue)
    val it = set.iterator()
    while (it.hasNext) {
      val h = portableHash(it.next())
      var k = 0
      while (k < mins.length) {
        val v = (MinhashA(k) * h + MinhashB(k)) % MinhashP
        if (v < mins(k)) mins(k) = v
        k += 1
      }
    }
    new GenericArrayData(mins.map(v => v: Any))
  }

  /** Number of distinct n-word shingles. */
  def shingleCount(s: UTF8String, n: Int): Long =
    distinctShingles(s, n).size.toLong

  /** The doc's distinct n-word shingle HASHES ([[portableHash]]), sorted
    * ascending — the long-domain twin of the exploded `DISTINCT (doc_id,
    * md5-hash(s))` posting build, one row-level pass. Sorted so that
    * pairwise intersection ([[sortedLongCommon]]) is a merge scan instead
    * of a per-pair hash-set build. Empty when the doc has < n tokens.
    */
  def shingleHashesSorted(s: UTF8String, n: Int): ArrayData = {
    val set = distinctShingles(s, n)
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var i = 0
    while (it.hasNext) { out(i) = portableHash(it.next()); i += 1 }
    java.util.Arrays.sort(out)
    // hash collisions inside one doc would leave duplicates; count them out
    // so the array is a set (the SQL twin is SELECT DISTINCT on the hash)
    var dups = 0
    i = 1
    while (i < out.length) { if (out(i) == out(i - 1)) dups += 1; i += 1 }
    if (dups == 0) new GenericArrayData(out.map(v => v: Any))
    else {
      val ded = new Array[Any](out.length - dups)
      var j = 0
      i = 0
      while (i < out.length) {
        if (i == 0 || out(i) != out(i - 1)) { ded(j) = out(i); j += 1 }
        i += 1
      }
      new GenericArrayData(ded)
    }
  }

  /** Count of common elements of two SORTED long arrays — one merge scan,
    * the verify-join kernel for prefix-filtered Jaccard (q81).
    */
  def sortedLongCommon(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var common = 0L
    while (i < na && j < nb) {
      // null slots unbox to 0L and would count as matches — reachable via
      // the SQL-registered graft_sorted_common; reject them
      if (a.isNullAt(i) || b.isNullAt(j))
        throw new IllegalArgumentException(
          "sorted_long_common: null element (hash sets must be dense)")
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { common += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    common
  }

  /** Size of the distinct-shingle intersection of two docs — the kernel twin
    * of the exploded-shingle equi-join + count in the Jaccard verify.
    */
  def shingleCommon(a: UTF8String, b: UTF8String, n: Int): Long = {
    val sa = distinctShingles(a, n)
    val sb = distinctShingles(b, n)
    val (small, big) = if (sa.size <= sb.size) (sa, sb) else (sb, sa)
    var common = 0L
    val it = small.iterator()
    while (it.hasNext) if (big.contains(it.next())) common += 1
    common
  }

  /** Deterministic checksum over payload bytes — the STUB feature extractor
    * for opaque multimodal payloads (this container has no image/audio
    * codecs; a real deployment swaps the body for actual decode while the
    * Spark-side plumbing — binary column, typed metadata, per-row kernel —
    * stays identical). sum of unsignedByte * ((1-based idx % 7) + 1),
    * mod 1e9+7.
    */
  def binaryChecksum(bytes: Array[Byte]): Long = {
    var acc = 0L
    var i = 0
    while (i < bytes.length) {
      acc += (bytes(i) & 0xff).toLong * (((i + 1) % 7) + 1)
      i += 1
    }
    acc % 1000000007L
  }

  /** Per-doc repetition stats (Gopher-style quality-filter inputs) in one
    * row-level pass: `[total_words, distinct_words, top_word_count,
    * total_2grams, distinct_2grams]`. All counts are over the space-split
    * token stream KEEPING empty tokens (the shared tokenization contract),
    * so the SQL twin is `string_split` + `list_distinct` + a grouped
    * unigram max. Integer outputs only — the fraction arithmetic stays in
    * the query so both engines divide identical longs.
    */
  def repStats(s: UTF8String): ArrayData = {
    val t = tokens(s)
    val counts = new java.util.HashMap[UTF8String, Integer]()
    var top = 0
    var i = 0
    while (i < t.length) {
      val c = counts.merge(t(i), Integer.valueOf(1),
        (a: Integer, b: Integer) => Integer.valueOf(a.intValue + b.intValue))
      if (c.intValue > top) top = c.intValue
      i += 1
    }
    val n2 = math.max(0, t.length - 1)
    val g2 = new java.util.HashSet[UTF8String]()
    i = 0
    while (i < n2) {
      g2.add(joinShingle(t, i, 2))
      i += 1
    }
    new GenericArrayData(Array[Any](
      t.length.toLong, counts.size.toLong, top.toLong, n2.toLong, g2.size.toLong))
  }

  // ---- Column API --------------------------------------------------------

  def wordShingles(c: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(c), n))
  def portableHashC(c: Column): Column =
    ColumnBridge.column(TextKernel(ColumnBridge.expression(c), "portableHash", LongType))
  def fingerprintC(c: Column): Column =
    ColumnBridge.column(TextKernel(ColumnBridge.expression(c), "fingerprint", LongType))
  def simhash16C(c: Column): Column =
    ColumnBridge.column(TextKernel(ColumnBridge.expression(c), "simhash16", LongType))
  def simhash32C(c: Column): Column =
    ColumnBridge.column(TextKernel(ColumnBridge.expression(c), "simhash32", LongType))
  def binaryChecksumC(c: Column): Column =
    ColumnBridge.column(BinaryChecksum(ColumnBridge.expression(c)))
  def minhashSigC(c: Column, n: Int): Column =
    ColumnBridge.column(MinhashSig(ColumnBridge.expression(c), n))
  def shingleCountC(c: Column, n: Int): Column =
    ColumnBridge.column(ShingleKernel(ColumnBridge.expression(c), n))
  def shingleCommonC(a: Column, b: Column, n: Int): Column =
    ColumnBridge.column(
      ShingleCommon(ColumnBridge.expression(a), ColumnBridge.expression(b), n))
  def shingleHashesC(c: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(c), n))
  def sortedCommonC(a: Column, b: Column): Column =
    ColumnBridge.column(
      SortedLongCommon(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def repStatsC(c: Column): Column =
    ColumnBridge.column(RepStats(ColumnBridge.expression(c)))
}

/** `TextOps.shingleHashesSorted(string, n)` as a codegen'd unary expression. */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {

  require(n > 0, s"shingle width must be positive, got $n")

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes_sorted"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes_sorted expects string, got ${t.catalogString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    TextOps.shingleHashesSorted(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextOps.shingleHashesSorted($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** `TextOps.sortedLongCommon(a, b)` as a codegen'd binary expression. */
case class SortedLongCommon(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_long_common"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_long_common expects (array<long>, array<long>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextOps.sortedLongCommon(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.TextOps.sortedLongCommon($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongCommon =
    copy(left = newLeft, right = newRight)
}

/** `TextOps.binaryChecksum(binary)` as a codegen'd unary expression. */
case class BinaryChecksum(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "binary_checksum"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"binary_checksum expects binary, got ${t.catalogString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    TextOps.binaryChecksum(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextOps.binaryChecksum($c)")

  override protected def withNewChildInternal(newChild: Expression): BinaryChecksum =
    copy(child = newChild)
}

/** `TextOps.<kernel>(string)` as a codegen'd unary expression. */
case class TextKernel(child: Expression, kernel: String, outType: DataType)
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = outType
  override def prettyName: String = s"text_$kernel"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${t.catalogString}")
  }

  override protected def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String]
    kernel match {
      case "portableHash" => TextOps.portableHash(s)
      case "fingerprint" => TextOps.fingerprint(s)
      case "simhash16" => TextOps.simhash16(s)
      case "simhash32" => TextOps.simhash32(s)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextOps.$kernel($c)")

  override protected def withNewChildInternal(newChild: Expression): TextKernel =
    copy(child = newChild)
}

/** `TextOps.minhashSig(string, n)` as a codegen'd unary expression. */
case class MinhashSig(child: Expression, n: Int) extends UnaryExpression {

  require(n > 0, s"shingle width must be positive, got $n")

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects string, got ${t.catalogString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    TextOps.minhashSig(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextOps.minhashSig($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
}

/** `TextOps.shingleCount(string, n)` as a codegen'd unary expression. */
case class ShingleKernel(child: Expression, n: Int) extends UnaryExpression {

  require(n > 0, s"shingle width must be positive, got $n")

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "shingle_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_count expects string, got ${t.catalogString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    TextOps.shingleCount(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextOps.shingleCount($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleKernel =
    copy(child = newChild)
}

/** `TextOps.shingleCommon(a, b, n)` as a codegen'd binary expression. */
case class ShingleCommon(left: Expression, right: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  require(n > 0, s"shingle width must be positive, got $n")

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "shingle_common"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"shingle_common expects (string, string), got (${l.catalogString}, ${r.catalogString})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextOps.shingleCommon(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.TextOps.shingleCommon($a, $b, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ShingleCommon =
    copy(left = newLeft, right = newRight)
}

/** `TextOps.shingles(string, n)` as a codegen'd unary expression. */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  require(n > 0, s"shingle width must be positive, got $n")

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects string, got ${t.catalogString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    TextOps.shingles(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextOps.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** `TextOps.repStats(string)` as a codegen'd unary expression — five long
  * counters per row, see the kernel scaladoc for the layout.
  */
case class RepStats(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rep_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"rep_stats expects string, got ${t.catalogString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    TextOps.repStats(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextOps.repStats($c)")

  override protected def withNewChildInternal(newChild: Expression): RepStats =
    copy(child = newChild)
}
