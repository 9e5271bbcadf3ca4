package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.ext.Dedup
import graft.functions.{CosineSimilarity, Md5H60Array, MinHashSig, SimHash32, SimHashClosePairs}

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
  }
}
