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

  test("token sees a rewrite INSIDE a partition subdir " +
      "(VERDICT r17 what's-wrong #3: recursive listing)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    def writePartitioned(text: String): Unit =
      Seq((1L, text, "en"), (2L, text, "de")).toDF("doc_id", "text", "lang")
        .write.mode(SaveMode.Overwrite).partitionBy("lang")
        .parquet(s"$dir/documents.parquet")
    writePartitioned("hello world")
    val t1 = SparkEntry.tableToken(spark, dir, "documents")
    // same content, re-derived: stable
    assert(SparkEntry.tableToken(spark, dir, "documents") == t1)
    // rewrite ONE partition subdir in place: the lang=en subdir keeps
    // its name (and often its mtime at coarse granularity) — a flat
    // listing missed this; the recursive fold must not
    Seq((1L, "changed body", "en")).toDF("doc_id", "text", "lang")
      .write.mode(SaveMode.Overwrite)
      .parquet(s"$dir/documents.parquet/lang=en")
    assert(SparkEntry.tableToken(spark, dir, "documents") != t1,
      "partition-subdir rewrite produced the same token")
  }

  test("memo maps are LRU-bounded and reclaim superseded entries " +
      "(VERDICT r17 what's-wrong #4 + ADVICE #3)") {
    val replaced = collection.mutable.ArrayBuffer[(String, String)]()
    val m = new SparkEntry.MemoMap[String](2, (k, v) => replaced += (k -> v))
    m.put("a", "t1", "va"); m.put("b", "t1", "vb")
    assert(m.get("a").contains(("t1", "va")))
    // access-ordered: touching "a" makes "b" the eldest. LRU
    // eviction frees the HEAP entry only — it must NOT fire the
    // replace callback ("b" is still the current build for its
    // snapshot; deleting its on-disk resource would yank files from
    // under an in-flight plan — review r18)
    m.put("c", "t1", "vc")
    assert(replaced.isEmpty, s"LRU eviction fired the callback: $replaced")
    assert(m.get("b").isEmpty && m.get("a").nonEmpty && m.get("c").nonEmpty)
    // token-change REPLACE fires it — that value IS superseded (the
    // index-dir reclaim path); same-token put does not
    m.put("a", "t2", "va2")
    assert(replaced.toList == List("a" -> "va"))
    m.put("a", "t2", "va2")
    assert(replaced.size == 1, "same-token replace must not fire")
    // a throwing callback never breaks the put
    val hostile = new SparkEntry.MemoMap[String](1,
      (_, _) => throw new RuntimeException("boom"))
    hostile.put("x", "t1", "v1"); hostile.put("x", "t2", "v2")
    assert(hostile.get("x").contains(("t2", "v2")))
  }
}
