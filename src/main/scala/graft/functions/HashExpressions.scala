package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native one-pass hash kernels for the dedup pipeline.
  *
  * The HOF formulations (transform/aggregate lambdas) are interpreted
  * per-element; these expressions make ONE call per row and run a tight JVM
  * loop, computing exactly the same md5-derived math the DuckDB oracle
  * reproduces (see Exact.md5Hash60). CodegenFallback costs one virtual call
  * per row — negligible next to the per-element md5 work.
  */
object HashKernels {
  private val md5 = ThreadLocal.withInitial[MessageDigest](() => MessageDigest.getInstance("MD5"))
  private val HexChars = "0123456789abcdef".toCharArray

  private def md5Hex(s: String): Array[Char] = {
    val d = md5.get()
    d.reset()
    val bytes = d.digest(s.getBytes(StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexChars((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = HexChars(bytes(i) & 0xf)
      i += 1
    }
    out
  }

  private def hexPrefixToLong(hex: Array[Char], n: Int): Long = {
    var v = 0L
    var i = 0
    while (i < n) {
      val c = hex(i)
      v = (v << 4) | (if (c <= '9') c - '0' else c - 'a' + 10).toLong
      i += 1
    }
    v
  }

  /** == Exact.md5Hash60: first 15 md5 hex chars as a long. */
  def md5Hash60(s: String): Long = hexPrefixToLong(md5Hex(s), 15)

  /** == Exact.md5Hash32: first 8 md5 hex chars as a long. */
  def md5Hash32(s: String): Long = hexPrefixToLong(md5Hex(s), 8)

  /** 32-bit simhash over a token array (identical math to the HOF form). */
  def simhash32(tokens: Array[String], bits: Int): Long = {
    val votes = new Array[Long](bits)
    var t = 0
    while (t < tokens.length) {
      val h = md5Hash32(tokens(t))
      var i = 0
      while (i < bits) {
        votes(i) += (if (((h >> i) & 1L) == 1L) 1L else -1L)
        i += 1
      }
      t += 1
    }
    var out = 0L
    var i = 0
    while (i < bits) {
      if (votes(i) > 0) out |= (1L << i)
      i += 1
    }
    out
  }

  /** Winnowing selection (Schleimer et al.): the sorted distinct window
    * minima of md5Hash60 over the shingles, one monotonic-deque pass —
    * O(m) total instead of the O(m·w) per-window array_min rescans of the
    * HOF formulation. Short inputs (m < w) winnow as one whole-sequence
    * window, matching the clamped-slice SQL form the oracle runs.
    */
  def winnowFps(shingles: Array[String], w: Int): Array[Long] = {
    require(w >= 1, s"winnowing window must be >= 1, got $w")
    val m = shingles.length
    if (m == 0) return Array.emptyLongArray
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) { hs(i) = md5Hash60(shingles(i)); i += 1 }
    winnowMins(hs, w)
  }

  /** The deque half of [[winnowFps]] over PRE-COMPUTED shingle hashes —
    * lets a caller that already materialized the md5 stream (the shared
    * fingerprinting artifact) winnow without re-hashing. winnowFps(sh, w)
    * == winnowMins(md5Hash60*(sh), w) by construction.
    */
  def winnowMins(hs: Array[Long], w: Int): Array[Long] = {
    require(w >= 1, s"winnowing window must be >= 1, got $w")
    val m = hs.length
    if (m == 0) return Array.emptyLongArray
    val wEff = math.min(w, m)
    val deque = new Array[Int](m) // indices, hs values increasing
    var head = 0
    var tail = 0 // exclusive
    val out = new Array[Long](m - wEff + 1)
    var o = 0
    var i = 0
    while (i < m) {
      while (tail > head && hs(deque(tail - 1)) >= hs(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - wEff) head += 1
      if (i >= wEff - 1) { out(o) = hs(deque(head)); o += 1 }
      i += 1
    }
    java.util.Arrays.sort(out)
    // in-place distinct on the sorted minima
    var n = 0
    i = 0
    while (i < out.length) {
      if (n == 0 || out(i) != out(n - 1)) { out(n) = out(i); n += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(out, n)
  }

  /** MinHash signature: per permutation i, min over shingles of
    * (a_i * (md5Hash60(s) mod p) + b_i) mod p.
    */
  def minhashSignature(shingles: Array[String], as: Array[Long], bs: Array[Long],
                       p: Long): Array[Long] = {
    val mins = Array.fill(as.length)(Long.MaxValue)
    var s = 0
    while (s < shingles.length) {
      val h = md5Hash60(shingles(s)) % p
      var i = 0
      while (i < as.length) {
        val v = (as(i) * h + bs(i)) % p
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      s += 1
    }
    mins
  }
}

/** All close pairs within one LSH bucket: for a doc_id-sorted array of
  * (doc_id, simhash) structs, every pair (i < j) whose signatures differ in
  * at most `maxHamming` bits, as (doc_id_a, doc_id_b, hamming) structs.
  *
  * This is the quadratic inner loop of simhash candidate verification. As an
  * interpreted higher-order-function lambda it costs two expression-tree
  * evaluations per candidate pair; skewed buckets (thousands of docs sharing
  * a band byte) make that the whole query's cost. Here it is one virtual
  * call per BUCKET and a tight long-xor/bitCount loop per pair.
  */
case class SimHashClosePairs(child: Expression, maxHamming: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("doc_id_a", LongType, nullable = false),
    StructField("doc_id_b", LongType, nullable = false),
    StructField("hamming", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "simhash_pairs_kernel"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(s: StructType, _)
        if s.length == 2 && s.forall(_.dataType == LongType) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_pairs_kernel requires array<struct<long,long>>, got ${other.catalogString}")
  }
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val ids = new Array[Long](n)
    val sigs = new Array[Long](n)
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 2)
      ids(i) = row.getLong(0)
      sigs(i) = row.getLong(1)
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val h = java.lang.Long.bitCount(sigs(i) ^ sigs(j))
        if (h <= maxHamming) {
          out += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](ids(i), ids(j), h.toLong))
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** md5h60_arr(array<string>) -> array<long>: Exact.md5Hash60 of every
  * element in one JVM pass — the shingle-hashing hot loop of fingerprints
  * and jaccard sets without per-element interpreted-lambda overhead.
  */
case class Md5H60Array(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "md5h60_arr"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5h60_arr requires array<string>, got ${other.catalogString}")
  }
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val out = new Array[Long](arr.numElements())
    var i = 0
    while (i < out.length) {
      out(i) = HashKernels.md5Hash60(
        if (arr.isNullAt(i)) "" else arr.getUTF8String(i).toString)
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** hashed_weight_sum(array<string>) -> long: Σ over tokens of
  * `(md5Hash60(tok) % buckets % mod) - mod/2` — the sparse dot product of
  * the hashing-trick linear classifier (ext.TextAnalysis.qualityClassifier)
  * as ONE kernel call per document. The HOF formulation interprets a
  * md5→substring→conv expression tree per token; this is the tight-loop
  * form of the same math (HashKernels.md5Hash60 == Exact.md5Hash60, which
  * the DuckDB oracle reproduces). Null token slots hash as "" — the
  * callers' filtered token arrays never contain them.
  */
case class HashedWeightSum(child: Expression, buckets: Int, mod: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "hashed_weight_sum"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hashed_weight_sum requires array<string>, got ${other.catalogString}")
  }
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val half = mod / 2
    var acc = 0L
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val tok = if (arr.isNullAt(i)) "" else arr.getUTF8String(i).toString
      acc += HashKernels.md5Hash60(tok) % buckets % mod - half
      i += 1
    }
    acc
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** winnow_fps(array<string>, w) -> array<bigint>: sorted distinct winnowing
  * fingerprints (see HashKernels.winnowFps). Null slots hash as "".
  */
case class WinnowFps(child: Expression, w: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fps"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _ if w < 1 => TypeCheckResult.TypeCheckFailure(
      s"winnow_fps requires a window of at least 1, got w=$w")
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fps requires array<string>, got ${other.catalogString}")
  }
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val shingles = new Array[String](arr.numElements())
    var i = 0
    while (i < shingles.length) {
      shingles(i) = if (arr.isNullAt(i)) "" else arr.getUTF8String(i).toString
      i += 1
    }
    new GenericArrayData(HashKernels.winnowFps(shingles, w))
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** winnow_mins(array<bigint>, w) -> array<bigint>: the deque half of
  * winnow_fps over pre-computed shingle hashes (see HashKernels.winnowMins)
  * — for consumers of the materialized fingerprinting hash stream. Null
  * slots are impossible in the md5h60_arr output this consumes; a null
  * element hashes as 0 for totality.
  */
case class WinnowMins(child: Expression, w: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_mins"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _ if w < 1 => TypeCheckResult.TypeCheckFailure(
      s"winnow_mins requires a window of at least 1, got w=$w")
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_mins requires array<bigint>, got ${other.catalogString}")
  }
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val hs = new Array[Long](arr.numElements())
    var i = 0
    while (i < hs.length) {
      hs(i) = if (arr.isNullAt(i)) 0L else arr.getLong(i)
      i += 1
    }
    new GenericArrayData(HashKernels.winnowMins(hs, w))
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** simhash32(array<string>) -> long */
case class SimHash32(child: Expression, bits: Int) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash32 requires array<string>, got ${other.catalogString}")
  }
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val tokens = new Array[String](arr.numElements())
    var i = 0
    while (i < tokens.length) {
      tokens(i) = if (arr.isNullAt(i)) "" else arr.getUTF8String(i).toString
      i += 1
    }
    HashKernels.simhash32(tokens, bits)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** minhash_sig(array<string>) -> array<long> (one element per permutation) */
case class MinHashSig(child: Expression, as: Seq[Long], bs: Seq[Long], p: Long)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<string>, got ${other.catalogString}")
  }
  private lazy val aArr = as.toArray
  private lazy val bArr = bs.toArray
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val shingles = new Array[String](arr.numElements())
    var i = 0
    while (i < shingles.length) {
      shingles(i) = if (arr.isNullAt(i)) "" else arr.getUTF8String(i).toString
      i += 1
    }
    new GenericArrayData(HashKernels.minhashSignature(shingles, aArr, bArr, p))
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object HashExpressions {
  /** Registers both SQL kernels — `simhash32(array<string>)` and
    * `minhash_sig(array<string>)` — on the session. The permutation family
    * for minhash_sig is derived from the supplied parameters; idempotent
    * (skips names already registered, so repeat calls don't churn the
    * registry or log replacement warnings). This is the single registration
    * path; Dedup.registerKernels delegates here with the engine defaults.
    */
  def register(spark: SparkSession, simhashBits: Int, numPerms: Int,
               permA: Int => Long, permB: Int => Long, p: Long): Unit = {
    val reg = spark.sessionState.functionRegistry
    def ifAbsent(name: String)(body: => Unit): Unit =
      if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(name))) body
    ifAbsent("simhash32") {
      reg.createOrReplaceTempFunction(
        "simhash32", (e: Seq[Expression]) => SimHash32(e.head, simhashBits), "built-in")
    }
    ifAbsent("minhash_sig") {
      reg.createOrReplaceTempFunction(
        "minhash_sig", (e: Seq[Expression]) => MinHashSig(
          e.head, (0 until numPerms).map(permA), (0 until numPerms).map(permB), p),
        "built-in")
    }
    ifAbsent("md5h60_arr") {
      reg.createOrReplaceTempFunction(
        "md5h60_arr", (e: Seq[Expression]) => Md5H60Array(e.head), "built-in")
    }
    ifAbsent("simhash_pairs_kernel") {
      reg.createOrReplaceTempFunction(
        "simhash_pairs_kernel", (e: Seq[Expression]) => SimHashClosePairs(
          e.head,
          e(1).eval(org.apache.spark.sql.catalyst.expressions.EmptyRow)
            .asInstanceOf[Number].intValue()),
        "built-in")
    }
    ifAbsent("winnow_fps") {
      reg.createOrReplaceTempFunction(
        "winnow_fps", (e: Seq[Expression]) => WinnowFps(
          e.head,
          e(1).eval(org.apache.spark.sql.catalyst.expressions.EmptyRow)
            .asInstanceOf[Number].intValue()),
        "built-in")
    }
    ifAbsent("winnow_mins") {
      reg.createOrReplaceTempFunction(
        "winnow_mins", (e: Seq[Expression]) => WinnowMins(
          e.head,
          e(1).eval(org.apache.spark.sql.catalyst.expressions.EmptyRow)
            .asInstanceOf[Number].intValue()),
        "built-in")
    }
    ifAbsent("hashed_weight_sum") {
      reg.createOrReplaceTempFunction(
        "hashed_weight_sum", (e: Seq[Expression]) => HashedWeightSum(
          e.head,
          e(1).eval(org.apache.spark.sql.catalyst.expressions.EmptyRow)
            .asInstanceOf[Number].intValue(),
          e(2).eval(org.apache.spark.sql.catalyst.expressions.EmptyRow)
            .asInstanceOf[Number].intValue()),
        "built-in")
    }
  }
}
