package graft

import org.apache.spark.sql.SaveMode

/** The model caches' content keying (VERDICT r16 #3): a long-lived
  * session that mutates the corpus under the SAME path — exactly what
  * upsert_crud/compact model — must re-train, not serve a stale model
  * forever. The caches key on `dir@tableToken` where the token folds
  * the parquet directory's (name, length, mtime) listing, re-derived
  * on every access (one FS listing, no Spark job — the Dedup
  * `_config` sidecar convention). */
class ModelCacheSpec extends SparkSpec {

  private def writeDocs(dir: String, rows: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    rows.toDF("doc_id", "text").coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
  }

  test("token is stable on identical content, shifts on rewrite") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tok").toString
    // missing table: a well-defined (empty-listing) token, no throw
    val absent = SparkEntry.tableToken(spark, dir, "documents")
    writeDocs(dir, Seq((1L, "hello world")))
    val t1 = SparkEntry.tableToken(spark, dir, "documents")
    assert(t1 != absent)
    // re-derived, not memoized: same content, same token
    assert(SparkEntry.tableToken(spark, dir, "documents") == t1)
    // a rewrite (fresh part files) is a new snapshot
    writeDocs(dir, Seq((1L, "hello world")))
    assert(SparkEntry.tableToken(spark, dir, "documents") != t1)
  }

  test("a corpus mutated under one path re-trains the gate " +
      "(VERDICT r16 #3)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mc").toString
    // >=30 words with stopwords -> y=1 under the graded label rule
    val good = Seq.fill(5)("the is a and of to in it you that").mkString(" ")
    val bad = "qq ww"
    writeDocs(dir, (1L to 40L).map(i =>
      (i, if (i % 2 == 0) good else bad)))
    val m1 = SparkEntry.boostModel(spark, dir)
    // unchanged corpus: the memo serves the SAME instance (no re-train)
    assert(SparkEntry.boostModel(spark, dir) eq m1)
    // mutate under the same path: the gate must re-train
    writeDocs(dir, (1L to 40L).map(i =>
      (i, if (i % 2 == 0) bad else good)))
    val m2 = SparkEntry.boostModel(spark, dir)
    assert(!(m2 eq m1), "stale model served after a corpus rewrite")
  }
}
