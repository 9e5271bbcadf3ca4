package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, EmptyRow, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native bucket-local ANN kernels.
  *
  * The scale problem these solve: a bucketed/posting-list ANN search that
  * joins the bucket against itself materializes Θ(bucket²) pair rows into
  * the shuffle before a rank-1 window throws all but one per probe away —
  * quadratic shuffle volume that grows with corpus size for any FIXED
  * bucket count. These kernels run the quadratic loop INSIDE one operator
  * call per bucket (a tight JVM float loop, like SimHashClosePairs) and
  * emit only the winners, so the shuffle carries exactly one row per
  * vector (plus the collect_list'd bucket itself — bounded by the bucket
  * sizing rule, see ext.Similarity). CodegenFallback costs one virtual
  * call per BUCKET — noise next to the O(bucket² · dims) float work.
  *
  * Cosine math is identical to [[CosineSimilarity]] (double accumulation,
  * ascending index, 0.0 on zero norm), so results are bit-equal to the
  * pair-join + window formulation the DuckDB oracle reproduces. Pairs with
  * mismatched vector lengths (null cosine) are skipped — same outcome as
  * the window's nulls-last ordering whenever any valid candidate exists.
  */
object AnnKernels {

  private[functions] def cosine(x: Array[Float], y: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < x.length) {
      val xi = x(i).toDouble
      val yi = y(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** True iff candidate (s, id) beats the current best (bestSim, bestId)
    * under Spark's TOTAL descending-sim ordering: NaN sorts above every
    * non-NaN value (Spark window `desc` puts NaN first), -0.0 == 0.0
    * (primitive compare, matching Spark's normalized float ordering — never
    * Double.compare, which splits the zeros), smaller id wins sim ties.
    * Total ordering keeps the argmax order-insensitive over collect_list's
    * nondeterministic input order even when NaN/Inf embeddings occur.
    */
  private[functions] def beats(s: Double, id: Long,
                               bestSim: Double, bestId: Long): Boolean = {
    val sn = java.lang.Double.isNaN(s)
    val bn = java.lang.Double.isNaN(bestSim)
    if (sn != bn) sn // NaN beats any non-NaN, never the reverse
    else if (sn) id < bestId // both NaN: tie on sim, smaller id wins
    else s > bestSim || (s == bestSim && id < bestId)
  }

  private[functions] val EntryType: DataType => Boolean = {
    case ArrayType(s: StructType, _) if s.length == 2 &&
      s.head.dataType == LongType &&
      s(1).dataType == ArrayType(FloatType, true) => true
    case ArrayType(s: StructType, _) if s.length == 2 &&
      s.head.dataType == LongType &&
      s(1).dataType == ArrayType(FloatType, false) => true
    case _ => false
  }

  private[functions] def parse(a: ArrayData): (Array[Long], Array[Array[Float]]) = {
    val n = a.numElements()
    val ids = new Array[Long](n)
    val embs = new Array[Array[Float]](n)
    var i = 0
    while (i < n) {
      val row = a.getStruct(i, 2)
      ids(i) = row.getLong(0)
      embs(i) = if (row.isNullAt(1)) null else row.getArray(1).toFloatArray()
      i += 1
    }
    (ids, embs)
  }

  /** Integer-vector entry list: array<struct<long, array<long>>> — the
    * [[EntryType]] analog for the exact-L2² kernels (SAX daily-activity
    * vectors, extracted media features).
    */
  private[functions] val EntryTypeL2: DataType => Boolean = {
    case ArrayType(s: StructType, _) if s.length == 2 &&
      s.head.dataType == LongType &&
      (s(1).dataType == ArrayType(LongType, true) ||
        s(1).dataType == ArrayType(LongType, false)) => true
    case _ => false
  }

  private[functions] def parseLong(a: ArrayData): (Array[Long], Array[Array[Long]]) = {
    val n = a.numElements()
    val ids = new Array[Long](n)
    val vecs = new Array[Array[Long]](n)
    var i = 0
    while (i < n) {
      val row = a.getStruct(i, 2)
      ids(i) = row.getLong(0)
      vecs(i) = if (row.isNullAt(1)) null else row.getArray(1).toLongArray()
      i += 1
    }
    (ids, vecs)
  }

  /** Registers `bucket_top1(members, probes)` and
    * `cosine_close_pairs(vectors, threshold)`; idempotent like
    * HashExpressions.register.
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def ifAbsent(name: String)(body: => Unit): Unit =
      if (!reg.functionExists(FunctionIdentifier(name))) body
    ifAbsent("bucket_top1") {
      reg.createOrReplaceTempFunction(
        "bucket_top1", (e: Seq[Expression]) => BucketTop1(e.head, e(1)), "built-in")
    }
    ifAbsent("cosine_close_pairs") {
      reg.createOrReplaceTempFunction(
        "cosine_close_pairs", (e: Seq[Expression]) => CosineClosePairs(
          e.head,
          e(1).eval(EmptyRow).asInstanceOf[Number].doubleValue()), "built-in")
    }
    ifAbsent("cosine_cross_pairs") {
      reg.createOrReplaceTempFunction(
        "cosine_cross_pairs", (e: Seq[Expression]) => CosineCrossPairs(
          e.head, e(1),
          e(2).eval(EmptyRow).asInstanceOf[Number].doubleValue()), "built-in")
    }
    ifAbsent("bucket_topk") {
      reg.createOrReplaceTempFunction(
        "bucket_topk", (e: Seq[Expression]) => BucketTopK(
          e.head, e(1),
          e(2).eval(EmptyRow).asInstanceOf[Number].intValue()), "built-in")
    }
    ifAbsent("pq_encode") {
      reg.createOrReplaceTempFunction(
        "pq_encode", (e: Seq[Expression]) => PqEncode(
          e.head, e(1),
          e(2).eval(EmptyRow).asInstanceOf[Number].intValue(),
          e(3).eval(EmptyRow).asInstanceOf[Number].intValue()), "built-in")
    }
    ifAbsent("nearest_centroids") {
      reg.createOrReplaceTempFunction(
        "nearest_centroids", (e: Seq[Expression]) => NearestCentroids(
          e.head, e(1),
          e(2).eval(EmptyRow).asInstanceOf[Number].intValue()), "built-in")
    }
    ifAbsent("adc_top1") {
      reg.createOrReplaceTempFunction(
        "adc_top1", (e: Seq[Expression]) => AdcTop1(
          e.head, e(1),
          e(2).eval(EmptyRow).asInstanceOf[Number].intValue()), "built-in")
    }
    ifAbsent("bucket_min_l2") {
      reg.createOrReplaceTempFunction(
        "bucket_min_l2", (e: Seq[Expression]) => BucketMinL2(e.head, e(1)), "built-in")
    }
  }
}

/** bucket_min_l2(members, probes): for every probe (id, vec) over INTEGER
  * vectors, its best member by exact L2² — minimal Σ(xᵢ−yᵢ)² in BIGINT,
  * smallest member id on ties, self (same id) excluded — as
  * array<struct<vec_id, neighbor_id, dist>>. The ascending-distance twin of
  * [[BucketTop1]] with the same contract: probes with no valid candidate
  * (alone in the bucket, or no member of matching length) emit nothing;
  * argmin with a total tie-break is order-insensitive over collect_list's
  * nondeterministic input order; winner rows from distinct shard groups
  * compose under min-(dist asc, id asc), so the `maxBucket` hash-sharding
  * machinery applies unchanged. Distances are exact Long sums — identical
  * arithmetic to the SQL `aggregate(zip_with(...))` fold it replaces — so
  * for buckets of NON-NULL, UNIFORM-LENGTH vectors (the contract the SAX
  * word / media-feature producers guarantee and the only shape the oracle
  * queries exercise) results are bit-equal to the pair-join + rank-window
  * formulation the DuckDB oracle reproduces, while only winner rows (never
  * Θ(bucket²) pair rows) ever reach the shuffle. Outside that precondition
  * the kernel is deliberately STRICTER than the SQL fold it replaced: a
  * null or length-mismatched candidate is skipped (same guard as
  * [[BucketTop1]]), where `aggregate(zip_with(...))` produced a null
  * distance that ranked FIRST under ascending-nulls-first ordering —
  * a degenerate vector must not become everyone's nearest neighbor.
  */
case class BucketMinL2(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("vec_id", LongType, nullable = false),
    StructField("neighbor_id", LongType, nullable = false),
    StructField("dist", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "bucket_min_l2"
  override def checkInputDataTypes(): TypeCheckResult =
    if (AnnKernels.EntryTypeL2(left.dataType) && AnnKernels.EntryTypeL2(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<struct<long, array<long>>>, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  override def nullSafeEval(m: Any, p: Any): Any = {
    val (mIds, mVecs) = AnnKernels.parseLong(m.asInstanceOf[ArrayData])
    val (pIds, pVecs) = AnnKernels.parseLong(p.asInstanceOf[ArrayData])
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < pIds.length) {
      val pv = pVecs(i)
      if (pv != null) {
        var best = Long.MaxValue
        var bestId = Long.MaxValue
        var found = false
        var j = 0
        while (j < mIds.length) {
          val mv = mVecs(j)
          if (mIds(j) != pIds(i) && mv != null && mv.length == pv.length) {
            var d = 0L
            var t = 0
            while (t < pv.length) {
              val diff = pv(t) - mv(t)
              d += diff * diff
              t += 1
            }
            if (!found || d < best || (d == best && mIds(j) < bestId)) {
              best = d; bestId = mIds(j); found = true
            }
          }
          j += 1
        }
        if (found) out += new GenericInternalRow(Array[Any](pIds(i), bestId, best))
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** nearest_centroids(embedding, centroids, upTo): the row's `upTo` nearest
  * centroids by cosine — ordered (sim desc, centroid id asc, NaN first, the
  * BucketTop1 total order) — as array<struct<cluster_id, crank>> with crank
  * 1..upTo. The centroids argument is the id-sorted (id, emb) entry array,
  * broadcast once per plan; evaluation is per ROW, so centroid assignment
  * is a fully narrow map-side pass — the row_number-window formulation this
  * replaces shuffled and sorted all N×k scored rows just to rank k≈16
  * candidates per vector. Centroid entries with a null or length-mismatched
  * embedding are skipped (BucketTop1's candidate guard).
  */
case class NearestCentroids(left: Expression, right: Expression, upTo: Int)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("cluster_id", LongType, nullable = false),
    StructField("crank", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "nearest_centroids"
  override def checkInputDataTypes(): TypeCheckResult =
    if (upTo >= 1 && (left.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }) && AnnKernels.EntryType(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, array<struct<long, array<float>>> and upTo >= 1, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}, upTo=$upTo")
  override def nullSafeEval(v: Any, cb: Any): Any = {
    val emb = v.asInstanceOf[ArrayData].toFloatArray()
    val (ids, cents) = AnnKernels.parse(cb.asInstanceOf[ArrayData])
    val topSim = new Array[Double](upTo)
    val topId = new Array[Long](upTo)
    var n = 0
    var c = 0
    while (c < ids.length) {
      val ce = cents(c)
      if (ce != null && ce.length == emb.length) {
        val s = AnnKernels.cosine(emb, ce)
        var slot = n
        while (slot > 0 &&
            AnnKernels.beats(s, ids(c), topSim(slot - 1), topId(slot - 1))) slot -= 1
        if (slot < upTo) {
          val last = math.min(n, upTo - 1)
          var t = last
          while (t > slot) { topSim(t) = topSim(t - 1); topId(t) = topId(t - 1); t -= 1 }
          topSim(slot) = s; topId(slot) = ids(c)
          if (n < upTo) n += 1
        }
      }
      c += 1
    }
    val out = new Array[Any](n)
    var r = 0
    while (r < n) {
      out(r) = new GenericInternalRow(Array[Any](topId(r), (r + 1).toLong))
      r += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** bucket_top1(members, probes): for every probe (id, emb), its best
  * member by cosine — max similarity, smallest member id on ties, self
  * (same id) excluded — as array<struct<vec_id, neighbor_id, sim>>.
  * Probes with no valid candidate (alone in the bucket) emit nothing:
  * approximate-by-design, same as the rank-1 window over an inner
  * self-join. Order-insensitive in both inputs (argmax with a total
  * tie-break), so it is safe over collect_list's nondeterministic order.
  */
case class BucketTop1(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("vec_id", LongType, nullable = false),
    StructField("neighbor_id", LongType, nullable = false),
    StructField("sim", DoubleType, nullable = false))), containsNull = false)
  override def prettyName: String = "bucket_top1"
  override def checkInputDataTypes(): TypeCheckResult =
    if (AnnKernels.EntryType(left.dataType) && AnnKernels.EntryType(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<struct<long, array<float>>>, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  override def nullSafeEval(m: Any, p: Any): Any = {
    val (mIds, mEmbs) = AnnKernels.parse(m.asInstanceOf[ArrayData])
    val (pIds, pEmbs) = AnnKernels.parse(p.asInstanceOf[ArrayData])
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < pIds.length) {
      val pe = pEmbs(i)
      if (pe != null) {
        var best = Double.NegativeInfinity
        var bestId = Long.MaxValue
        var found = false
        var j = 0
        while (j < mIds.length) {
          val me = mEmbs(j)
          if (mIds(j) != pIds(i) && me != null && me.length == pe.length) {
            val s = AnnKernels.cosine(pe, me)
            if (!found || AnnKernels.beats(s, mIds(j), best, bestId)) {
              best = s; bestId = mIds(j); found = true
            }
          }
          j += 1
        }
        if (found) out += new GenericInternalRow(Array[Any](pIds(i), bestId, best))
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** bucket_topk(members, probes, k): for every probe, its top-k members by
  * cosine — ordered (sim desc, member id asc), self excluded — as
  * array<struct<vec_id, neighbor_id, sim, rank>> with rank 1..k. The
  * per-probe state is a k-slot insertion sort (k is small), so per-bucket
  * cost is O(|probes|·|members|·(dims + k)) inside one call, and the
  * output carries at most k rows per probe — the top-k generalization of
  * [[BucketTop1]] with the same ordering semantics as a rank window.
  */
case class BucketTopK(left: Expression, right: Expression, k: Int)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("vec_id", LongType, nullable = false),
    StructField("neighbor_id", LongType, nullable = false),
    StructField("sim", DoubleType, nullable = false),
    StructField("rank", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "bucket_topk"
  override def checkInputDataTypes(): TypeCheckResult =
    if (k >= 1 && AnnKernels.EntryType(left.dataType) && AnnKernels.EntryType(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<struct<long, array<float>>> and k >= 1, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}, k=$k")
  override def nullSafeEval(m: Any, p: Any): Any = {
    val (mIds, mEmbs) = AnnKernels.parse(m.asInstanceOf[ArrayData])
    val (pIds, pEmbs) = AnnKernels.parse(p.asInstanceOf[ArrayData])
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    val topSim = new Array[Double](k)
    val topId = new Array[Long](k)
    var i = 0
    while (i < pIds.length) {
      val pe = pEmbs(i)
      if (pe != null) {
        var n = 0
        var j = 0
        while (j < mIds.length) {
          val me = mEmbs(j)
          if (mIds(j) != pIds(i) && me != null && me.length == pe.length) {
            val s = AnnKernels.cosine(pe, me)
            // find insertion slot: strictly better than slot under the same
            // total ordering as BucketTop1 (NaN first, -0.0 == 0.0)
            var slot = n
            while (slot > 0 &&
                AnnKernels.beats(s, mIds(j), topSim(slot - 1), topId(slot - 1))) slot -= 1
            if (slot < k) {
              val last = math.min(n, k - 1)
              var t = last
              while (t > slot) { topSim(t) = topSim(t - 1); topId(t) = topId(t - 1); t -= 1 }
              topSim(slot) = s; topId(slot) = mIds(j)
              if (n < k) n += 1
            }
          }
          j += 1
        }
        var r = 0
        while (r < n) {
          out += new GenericInternalRow(
            Array[Any](pIds(i), topId(r), topSim(r), (r + 1).toLong))
          r += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** pq_encode(embedding, codebook, subs, subDim): product-quantization
  * encode in one call — per subspace s, the POSITION (in the id-sorted
  * codebook array) of the codebook entry with minimal L2² over dims
  * [s·subDim, (s+1)·subDim) (double accumulation ascending, smallest-
  * position tie-break via ascending iteration with strict `<`), the
  * `subs` codes packed as 4-bit nibbles into one long. Codes are
  * positions, not raw ids: the ADC lookup table is position-indexed in
  * the same id-sorted order, so the pair stays aligned even when
  * centroid ids are not the dense set 0..k-1 (position == id exactly
  * when they are, which is what the oracle reproduces). The codebook
  * argument is the id-sorted (id, emb) entry array; one kernel call
  * replaces an N×k pair expansion + k-way aggregate.
  *
  * Null safety: returns null for an input vector shorter than
  * subs·subDim; codebook entries with a null or short embedding are
  * skipped (mirroring BucketTop1's candidate guard — their position is
  * still counted so encode and LUT stay aligned); a subspace with no
  * valid entry yields null for the whole code.
  */
case class PqEncode(left: Expression, right: Expression, subs: Int, subDim: Int)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true // short input vector / empty-valid codebook → null
  override def prettyName: String = "pq_encode"
  override def checkInputDataTypes(): TypeCheckResult =
    if ((left.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }) && AnnKernels.EntryType(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> and array<struct<long, array<float>>>, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  override def nullSafeEval(v: Any, cb: Any): Any = {
    val emb = v.asInstanceOf[ArrayData].toFloatArray()
    if (emb.length < subs * subDim) return null
    val (_, cents) = AnnKernels.parse(cb.asInstanceOf[ArrayData])
    var packed = 0L
    var s = 0
    while (s < subs) {
      val off = s * subDim
      var bestD = Double.PositiveInfinity
      var bestC = -1L
      var c = 0
      while (c < cents.length) {
        val ce = cents(c)
        if (ce != null && ce.length >= subs * subDim) {
          var d = 0.0
          var i = 0
          while (i < subDim) {
            val diff = emb(off + i).toDouble - ce(off + i).toDouble
            d += diff * diff
            i += 1
          }
          // strict <, positions ascending: first minimum wins = smallest-
          // position tie-break (== smallest-id on a dense codebook)
          if (d < bestD) { bestD = d; bestC = c.toLong }
        }
        c += 1
      }
      if (bestC < 0) return null // no valid codebook entry for this subspace
      packed += bestC << (4 * s)
      s += 1
    }
    packed
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** cosine_close_pairs(vectors, threshold): all unordered pairs within one
  * bucket with cosine STRICTLY above `threshold`, as
  * array<struct<vec_id_a, vec_id_b>> with vec_id_a < vec_id_b — the
  * verified-pairs-only shape of near-duplicate detection (emits only
  * matches, never the candidate pairs).
  */
case class CosineClosePairs(child: Expression, threshold: Double)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("vec_id_a", LongType, nullable = false),
    StructField("vec_id_b", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "cosine_close_pairs"
  override def checkInputDataTypes(): TypeCheckResult =
    if (AnnKernels.EntryType(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<struct<long, array<float>>>, got " +
        s"${child.dataType.catalogString}")
  override def nullSafeEval(input: Any): Any = {
    val (ids, embs) = AnnKernels.parse(input.asInstanceOf[ArrayData])
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < ids.length) {
      var j = i + 1
      while (j < ids.length) {
        val a = embs(i); val b = embs(j)
        if (a != null && b != null && a.length == b.length &&
            AnnKernels.cosine(a, b) > threshold) {
          val lo = math.min(ids(i), ids(j))
          val hi = math.max(ids(i), ids(j))
          out += new GenericInternalRow(Array[Any](lo, hi))
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** cosine_cross_pairs(a, b, threshold): all pairs (x ∈ a, y ∈ b) with
  * distinct ids and cosine STRICTLY above `threshold`, as
  * array<struct<vec_id_a, vec_id_b>> with vec_id_a < vec_id_b — the
  * cross-shard half of sharded near-duplicate detection: when an oversized
  * bucket is hash-split, same-shard pairs come from [[CosineClosePairs]]
  * and each cross-shard pair is covered by exactly one (shard_i, shard_j)
  * group through this kernel, so no pair is ever emitted twice.
  */
case class CosineCrossPairs(left: Expression, right: Expression, threshold: Double)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("vec_id_a", LongType, nullable = false),
    StructField("vec_id_b", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "cosine_cross_pairs"
  override def checkInputDataTypes(): TypeCheckResult =
    if (AnnKernels.EntryType(left.dataType) && AnnKernels.EntryType(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<struct<long, array<float>>>, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  override def nullSafeEval(l: Any, r: Any): Any = {
    val (aIds, aEmbs) = AnnKernels.parse(l.asInstanceOf[ArrayData])
    val (bIds, bEmbs) = AnnKernels.parse(r.asInstanceOf[ArrayData])
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < aIds.length) {
      var j = 0
      while (j < bIds.length) {
        val a = aEmbs(i); val b = bEmbs(j)
        if (aIds(i) != bIds(j) && a != null && b != null && a.length == b.length &&
            AnnKernels.cosine(a, b) > threshold) {
          val lo = math.min(aIds(i), bIds(j))
          val hi = math.max(aIds(i), bIds(j))
          out += new GenericInternalRow(Array[Any](lo, hi))
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** adc_top1(codes, luts, subs): per-query PQ asymmetric-distance argmin
  * over one posting group — `codes` is the group's member array
  * (struct<id, code> with `subs` 4-bit positions packed in the long),
  * `luts` the queries probing it (struct<id, lut> with the flat
  * position-indexed table `pqAdcFromCodes` builds), and the result one
  * struct<query_id, neighbor_id, adc> winner per query that has at least
  * one valid candidate (self excluded).
  *
  * Replaces the codes ⨝ broadcast(lut) cross product + min(struct) tail:
  * min over a struct cannot hash-aggregate, so Spark planned a full
  * Sort + SortAggregate over the Q×N scored rows — ~1 s of one-task CPU
  * per ADC branch in the recall harness at a mere 100×2000. The kernel
  * runs the same Q×N loop as raw long/double arithmetic inside one call
  * per group and emits winners only, so nothing Q×N ever materializes.
  *
  * Semantics are exactly the replaced plan's:
  *  - adc = Σ_s lut[s·stride + nibble_s], stride = |lut| / subs, summed in
  *    ascending-s order (same double rounding as the left-fold `+`).
  *  - Winner = min by (adc asc, member id asc) under Spark's total
  *    ordering: NaN sorts greatest, so any non-NaN adc beats NaN; among
  *    all-NaN candidates the smallest id wins (adc values are sums of
  *    squares — −0.0 cannot arise).
  *  - A candidate whose positions fall outside the LUT is skipped; by
  *    construction (pq_encode positions < stride) this cannot happen —
  *    the guard only prevents a malformed-input crash.
  */
case class AdcTop1(left: Expression, right: Expression, subs: Int)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("query_id", LongType, nullable = false),
    StructField("neighbor_id", LongType, nullable = false),
    StructField("adc", DoubleType, nullable = false))), containsNull = false)
  override def prettyName: String = "adc_top1"
  private def codesType(dt: DataType): Boolean = dt match {
    case ArrayType(s: StructType, _) if s.length == 2 &&
      s.head.dataType == LongType && s(1).dataType == LongType => true
    case _ => false
  }
  private def lutsType(dt: DataType): Boolean = dt match {
    case ArrayType(s: StructType, _) if s.length == 2 &&
      s.head.dataType == LongType &&
      (s(1).dataType == ArrayType(DoubleType, true) ||
        s(1).dataType == ArrayType(DoubleType, false)) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (subs >= 1 && subs <= 16 && codesType(left.dataType) && lutsType(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<struct<long, long>>, " +
        s"array<struct<long, array<double>>> and 1 <= subs <= 16, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}, subs=$subs")
  /** Candidate (d, id) beats (bestD, bestId) under min-(adc asc, id asc)
    * with NaN greatest — the ascending twin of [[AnnKernels.beats]].
    */
  private def beatsMin(d: Double, id: Long, bestD: Double, bestId: Long): Boolean = {
    val dn = java.lang.Double.isNaN(d)
    val bn = java.lang.Double.isNaN(bestD)
    if (dn != bn) bn // non-NaN beats NaN, never the reverse
    else if (dn) id < bestId
    else d < bestD || (d == bestD && id < bestId)
  }
  override def nullSafeEval(c: Any, l: Any): Any = {
    val ca = c.asInstanceOf[ArrayData]
    val nc = ca.numElements()
    val ids = new Array[Long](nc)
    val codes = new Array[Long](nc)
    var i = 0
    while (i < nc) {
      val row = ca.getStruct(i, 2)
      ids(i) = row.getLong(0)
      codes(i) = row.getLong(1)
      i += 1
    }
    val la = l.asInstanceOf[ArrayData]
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var q = 0
    while (q < la.numElements()) {
      val lrow = la.getStruct(q, 2)
      val qid = lrow.getLong(0)
      if (!lrow.isNullAt(1)) {
        val lut = lrow.getArray(1).toDoubleArray()
        val stride = lut.length / subs
        var bestD = 0.0
        var bestId = 0L
        var found = false
        var j = 0
        while (j < nc) {
          if (ids(j) != qid) {
            var d = 0.0
            var ok = true
            var s = 0
            while (s < subs) {
              val idx = s * stride + ((codes(j) >>> (4 * s)) & 15L).toInt
              if (idx < lut.length) d += lut(idx) else { ok = false; s = subs }
              s += 1
            }
            if (ok && (!found || beatsMin(d, ids(j), bestD, bestId))) {
              bestD = d; bestId = ids(j); found = true
            }
          }
          j += 1
        }
        if (found) out += new GenericInternalRow(Array[Any](qid, bestId, bestD))
      }
      q += 1
    }
    new GenericArrayData(out.toArray)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
