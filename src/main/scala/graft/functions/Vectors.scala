package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector distance/similarity columns built from Spark's codegen'd
  * higher-order functions (`zip_with` / `aggregate` / `transform`) —
  * no UDFs, so plans stay inside WholeStageCodegen and distribute
  * trivially (pure map-side math, no shuffle).
  *
  * Semantics follow the reference engine (syzgydb):
  *  - euclidean distance: collection.go:812-819
  *  - "cosine" distance is angular distance acos(cos)/pi in [0,1]:
  *    collection.go:821-832
  *
  * All accumulation is in double precision with a sequential
  * left-to-right fold — the same order DuckDB folds DOUBLE[] lists,
  * which keeps the correctness oracle bit-stable.
  */
object Vectors {

  private def asD(a: Column): Column = a.cast("array<double>")

  /** Sequential-fold dot product in double precision — a native
    * codegen'd expression (see [[DotProduct]]); identical math to the
    * HOF formulation it replaced, minus interpretation overhead. */
  def dot(a: Column, b: Column): Column = DotProduct.dot(a, b)

  def normSq(a: Column): Column = dot(a, a)

  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity, clamped to [-1, 1] so acos never sees a value
    * pushed out of domain by rounding. */
  def cosineSim(a: Column, b: Column): Column = {
    val c = dot(a, b) / (norm(a) * norm(b))
    least(greatest(c, lit(-1.0)), lit(1.0))
  }

  /** Angular distance in [0, 1] — the reference's "cosine" metric. */
  def angularDist(a: Column, b: Column): Column =
    acos(cosineSim(a, b)) / lit(math.Pi)

  /** L2 distance with double accumulation (codegen'd inner loop). */
  def euclideanDist(a: Column, b: Column): Column =
    sqrt(DotProduct.l2Sq(a, b))

  /** L2-normalize a vector; zero vectors pass through unchanged
    * (reference: lshtree.go:10-28 normalizeVector). Native single-pass
    * expression — the HOF `transform(v, x => x / norm(v))` recomputes
    * the norm per element (inlined lambda), O(d²) per row. */
  def normalize(a: Column): Column = DotProduct.l2normalize(a)
}
