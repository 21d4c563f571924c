package graft

import org.apache.spark.sql.functions._
import graft.operators.Entity

/** Fuzzy record linkage (operators/Entity.scala). Pins the three
  * contracts the 100 TB design rests on: (1) prefix/suffix blocking
  * guarantees recall for any single edit of a >= 2n-char string,
  * (2) best-match resolution is a deterministic total order, and
  * (3) the fuzzy stage runs on DISTINCT values, never rows. */
class EntitySpec extends SparkSpec {
  import spark.implicits._

  private lazy val ref = Seq(
    (1L, "chartreuse metallic widget"),
    (2L, "burnished rose anchovy"),
    (3L, "cornflower azure plate"),
    (4L, "cornflower azure plateau") // near-collision with 3
  ).toDF("rid", "rname")

  test("single-edit recall: every 1-edit variant blocks and resolves") {
    // deletions, substitutions, insertions at EVERY interior position of
    // each reference name — the multi-pass recall argument must hold for
    // all of them (an edit breaks at most one of the two blocks)
    val names = ref.select("rname").as[String].collect()
    val variants = names.flatMap { n =>
      val del = (0 until n.length).map(i => n.substring(0, i) + n.substring(i + 1))
      val sub = (0 until n.length).map(i => n.substring(0, i) + "#" + n.substring(i + 1))
      val ins = (0 to n.length).map(i => n.substring(0, i) + "#" + n.substring(i))
      (del ++ sub ++ ins).map(v => (n, v))
    }.distinct.zipWithIndex.map { case ((orig, v), i) => (i.toLong, orig, v) }
    val dirty = variants.toSeq.toDF("id", "orig", "name")
    val out = Entity.resolve(ref, "rname", dirty, "id", "name",
      maxDist = 1, Entity.prefixSuffixBlockers(3))
    val joined = out.join(dirty.select(col("id").as("entity_id"), col("orig")), "entity_id")
    // every variant finds A match at dist <= 1 (possibly a different
    // reference than its origin when two references are themselves close)
    val misses = joined.filter(col("matched_name").isNull).count()
    assert(misses == 0, s"$misses single-edit variants failed to resolve")
    assert(joined.filter(col("dist") > 1).count() == 0)
  }

  test("best match is the deterministic (dist, name) minimum") {
    // "cornflower azure plate" vs "...plateau": a probe equidistant from
    // two references must pick the lexicographically smaller name
    val dirty = Seq((10L, "cornflower azure platea")).toDF("id", "name")
    // dist to "plate"=1 (del a), dist to "plateau"=1 (del u)
    val out = Entity.resolve(ref, "rname", dirty, "id", "name",
      maxDist = 2, Entity.prefixSuffixBlockers(3)).collect()
    assert(out.length == 1)
    assert(out(0).getAs[String]("matched_name") == "cornflower azure plate")
    assert(out(0).getAs[Int]("dist") == 1)
  }

  test("unmatched rows survive with NULL match; NULL names don't pair") {
    val dirty = Seq((20L, "zzz totally unrelated"), (21L, null))
      .toDF("id", "name")
    val out = Entity.resolve(ref, "rname", dirty, "id", "name",
      maxDist = 1, Entity.prefixSuffixBlockers(3)).collect()
    assert(out.length == 2) // left join keeps every right-side record
    assert(out.forall(r => r.isNullAt(r.fieldIndex("matched_name"))))
  }

  test("fuzzy work is vocabulary-sized: duplicate rows collapse before matching") {
    // 1000 rows, 2 distinct names -> candidate frame has <= 2*4 pairs
    val dirty = (0L until 1000L).map(i => (i, if (i % 2 == 0)
      "chartreuse metallic widgex" else "burnished rose anchovy"))
      .toDF("id", "name")
    val cand = Entity.fuzzyCandidates(ref, "rname", dirty, "name",
      Entity.prefixSuffixBlockers(3))
    assert(cand.count() <= 8)
    // and the plan aggregates (distinct) BOTH inputs before the block join
    val plan = cand.queryExecution.optimizedPlan.toString
    assert(plan.contains("Aggregate"), plan.take(500))
    // row re-attachment still resolves all 1000
    val out = Entity.resolve(ref, "rname", dirty, "id", "name",
      maxDist = 1, Entity.prefixSuffixBlockers(3))
    assert(out.filter(col("matched_name").isNotNull).count() == 1000)
  }

  test("result is independent of input partitioning") {
    val dirty = (0L until 200L).map(i =>
      (i, s"cornflower azure plate${if (i % 3 == 0) "" else "x"}"))
      .toDF("id", "name")
    def run(d: org.apache.spark.sql.DataFrame) =
      Entity.resolve(ref, "rname", d, "id", "name", maxDist = 2,
        Entity.prefixSuffixBlockers(3))
        .select("entity_id", "matched_name", "dist")
        .as[(Long, String, Int)].collect().sortBy(_._1).toSeq
    assert(run(dirty) == run(dirty.repartition(13)))
  }
}
