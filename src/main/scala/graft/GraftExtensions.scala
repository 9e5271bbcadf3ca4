package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.ext.Dedup
import graft.functions.{BucketTop1, BucketTopK, CosineClosePairs, CosineCrossPairs,
  CosineSimilarity, Md5H60Array, MinHashSig, NearestCentroids, PqEncode, SimHash32,
  SimHashClosePairs}

/** SparkSessionExtensions entry point: registers ALL the engine's native
  * expressions so any session created with
  * `--conf spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`) gets them without manual
  * registration — the deployment path for a shared cluster. MinHash/SimHash
  * kernels are bound to the engine's permutation family and bit widths
  * (Dedup object constants), matching what the oracle SQL reproduces.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs.head, exprs(1))))
    e.injectFunction((
      FunctionIdentifier("simhash32"),
      new ExpressionInfo(classOf[SimHash32].getName, "simhash32"),
      (exprs: Seq[Expression]) => SimHash32(exprs.head, Dedup.SimHashBits)))
    e.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (exprs: Seq[Expression]) => MinHashSig(
        exprs.head,
        (0 until Dedup.NumPerms).map(Dedup.permA),
        (0 until Dedup.NumPerms).map(Dedup.permB),
        Dedup.MinhashP)))
    e.injectFunction((
      FunctionIdentifier("md5h60_arr"),
      new ExpressionInfo(classOf[Md5H60Array].getName, "md5h60_arr"),
      (exprs: Seq[Expression]) => Md5H60Array(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("simhash_pairs_kernel"),
      new ExpressionInfo(classOf[SimHashClosePairs].getName, "simhash_pairs_kernel"),
      (exprs: Seq[Expression]) => SimHashClosePairs(
        exprs.head,
        exprs(1).eval(org.apache.spark.sql.catalyst.expressions.EmptyRow)
          .asInstanceOf[Number].intValue())))
    // the bucket-ANN kernel family (round 7+): same constructors the
    // per-session AnnKernels.register binds, so extension-configured
    // sessions run every Similarity/Dedup operator without manual setup
    def evalInt(x: Expression): Int =
      x.eval(org.apache.spark.sql.catalyst.expressions.EmptyRow)
        .asInstanceOf[Number].intValue()
    def evalDouble(x: Expression): Double =
      x.eval(org.apache.spark.sql.catalyst.expressions.EmptyRow)
        .asInstanceOf[Number].doubleValue()
    e.injectFunction((
      FunctionIdentifier("bucket_top1"),
      new ExpressionInfo(classOf[BucketTop1].getName, "bucket_top1"),
      (exprs: Seq[Expression]) => BucketTop1(exprs.head, exprs(1))))
    e.injectFunction((
      FunctionIdentifier("bucket_topk"),
      new ExpressionInfo(classOf[BucketTopK].getName, "bucket_topk"),
      (exprs: Seq[Expression]) => BucketTopK(exprs.head, exprs(1), evalInt(exprs(2)))))
    e.injectFunction((
      FunctionIdentifier("cosine_close_pairs"),
      new ExpressionInfo(classOf[CosineClosePairs].getName, "cosine_close_pairs"),
      (exprs: Seq[Expression]) => CosineClosePairs(exprs.head, evalDouble(exprs(1)))))
    e.injectFunction((
      FunctionIdentifier("cosine_cross_pairs"),
      new ExpressionInfo(classOf[CosineCrossPairs].getName, "cosine_cross_pairs"),
      (exprs: Seq[Expression]) => CosineCrossPairs(
        exprs.head, exprs(1), evalDouble(exprs(2)))))
    e.injectFunction((
      FunctionIdentifier("nearest_centroids"),
      new ExpressionInfo(classOf[NearestCentroids].getName, "nearest_centroids"),
      (exprs: Seq[Expression]) => NearestCentroids(
        exprs.head, exprs(1), evalInt(exprs(2)))))
    e.injectFunction((
      FunctionIdentifier("pq_encode"),
      new ExpressionInfo(classOf[PqEncode].getName, "pq_encode"),
      (exprs: Seq[Expression]) => PqEncode(
        exprs.head, exprs(1), evalInt(exprs(2)), evalInt(exprs(3)))))
  }
}
