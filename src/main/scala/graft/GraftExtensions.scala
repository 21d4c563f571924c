package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotProduct, L2DistanceSq, MinHashSig, SimHashAgg}
import graft.operators.Dedup

/** SQL surface for graft's native expressions, registered through
  * `SparkSessionExtensions` (spark.sql.extensions=graft.GraftExtensions)
  * or imperatively with `GraftExtensions.register(spark)` on a live
  * session. After registration plain SQL can call:
  *
  *   graft_dot(a, b)          codegen'd dot product
  *   graft_l2sq(a, b)         codegen'd squared L2 distance
  *   graft_simhash(hashes)    60-bit SimHash of an array<long>
  *   graft_minhash(hashes)    16-hash MinHash signature (default family)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptors.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {
  private val (defaultAs, defaultBs) = Dedup.minhashConsts(16)

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", name)

  val descriptors: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_dot", info("graft_dot", "dot product"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))),
    ("graft_l2sq", info("graft_l2sq", "squared L2"),
      (args: Seq[Expression]) => L2DistanceSq(args(0), args(1))),
    ("graft_simhash", info("graft_simhash", "simhash"),
      (args: Seq[Expression]) => SimHashAgg(args.head)),
    ("graft_minhash", info("graft_minhash", "minhash signature"),
      (args: Seq[Expression]) => MinHashSig(args.head, defaultAs, defaultBs, Dedup.MINHASH_M)))

  /** Imperative registration on an already-built session. */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (name, i, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), i, builder)
    }
}
