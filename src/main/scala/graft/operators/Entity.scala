package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy record linkage over structured string fields — the tabular
  * twin of the text dedup family: match a dirty catalog against a
  * reference catalog when keys don't line up and names carry typos.
  * The reference engine's metadata filters are exact
  * (`query/`, CONTAINS/STARTS_WITH are substring tests); a curation
  * pipeline ingesting entity-bearing tables needs the approximate
  * form too.
  *
  * Scale design — three rules a 100 TB linkage job lives by:
  *
  *  1. **Match distinct VALUES, not rows.** Both sides collapse to
  *     their distinct strings first (one keyed agg each); the
  *     quadratic-ish fuzzy stage runs on value vocabularies, and rows
  *     re-attach by one equi-join at the end. A billion-row catalog
  *     with a million distinct names does fuzzy work on the million.
  *  2. **Multi-pass blocking, never a cross join.** Candidates come
  *     from a UNION of equi-joins on cheap derived keys (prefix,
  *     suffix, …): a single typo breaks at most the blocks it touches,
  *     so any edit outside one block's window still pairs there — the
  *     multi-pass recall argument from the record-linkage literature
  *     (Hernández & Stolfo's multi-pass sorted neighborhood). Fanout
  *     is bounded by block-bucket size; AQE handles skewed buckets.
  *  3. **Verify only candidates.** `levenshtein` (codegen'd built-in,
  *     integer, engine-exact) runs on blocked pairs only, and the
  *     best-match pick is one keyed min over a (dist, name) struct —
  *     deterministic total order, no window over the candidate set.
  */
object Entity {

  /** Candidate (name_l, name_r) pairs between the DISTINCT string
    * values of two frames via multi-pass blocking: one equi-join per
    * blocker, unioned, deduplicated. */
  def fuzzyCandidates(left: DataFrame, leftStr: String,
                      right: DataFrame, rightStr: String,
                      blockers: Seq[Column => Column]): DataFrame = {
    require(blockers.nonEmpty, "need at least one blocking function")
    val l = left.select(col(leftStr).as("name_l"))
      .filter(col("name_l").isNotNull).distinct()
    val r = right.select(col(rightStr).as("name_r"))
      .filter(col("name_r").isNotNull).distinct()
    blockers.map { bf =>
      l.select(col("name_l"), bf(col("name_l")).as("_k"))
        .join(r.select(col("name_r"), bf(col("name_r")).as("_k")), "_k")
        .select(col("name_l"), col("name_r"))
    }.reduce(_ unionByName _).distinct()
  }

  /** Verified fuzzy matches: blocked candidates with
    * levenshtein(name_l, name_r) <= maxDist. */
  def fuzzyMatch(left: DataFrame, leftStr: String,
                 right: DataFrame, rightStr: String, maxDist: Int,
                 blockers: Seq[Column => Column]): DataFrame =
    fuzzyCandidates(left, leftStr, right, rightStr, blockers)
      .withColumn("dist", levenshtein(col("name_l"), col("name_r")))
      .filter(col("dist") <= maxDist)

  /** The default block pair: 3-char prefix and 3-char suffix. An edit
    * inside one window leaves the other intact, so every single-edit
    * variant of a >=6-char string is guaranteed a candidate. */
  def prefixSuffixBlockers(n: Int = 3): Seq[Column => Column] = Seq(
    (c: Column) => substring(c, 1, n),
    // length-relative start (not the negative-index form) so the
    // oracle's substr arithmetic is literally identical
    (c: Column) => c.substr(length(c) - (n - 1), lit(n)))

  /** Resolve every right-side record to its best left-side match:
    * (entity_id, name, matched_name, dist), dist/matched_name NULL
    * when nothing blocks within maxDist. Best = min (dist, name_l)
    * struct — a deterministic total order, ties to the
    * lexicographically-smallest reference name. */
  def resolve(left: DataFrame, leftStr: String,
              right: DataFrame, rightId: String, rightStr: String,
              maxDist: Int, blockers: Seq[Column => Column]): DataFrame = {
    val m = fuzzyMatch(left, leftStr, right, rightStr, maxDist, blockers)
    val best = m.groupBy(col("name_r"))
      .agg(min(struct(col("dist"), col("name_l"))).as("_b"))
      .select(col("name_r"), col("_b.name_l").as("matched_name"),
        col("_b.dist").as("dist"))
    right.select(col(rightId).as("entity_id"), col(rightStr).as("name_r"))
      .join(best, Seq("name_r"), "left")
      .select(col("entity_id"), col("name_r").as("name"),
        col("matched_name"), col("dist"))
  }
}
