package graft

import org.apache.spark.sql.functions._
import graft.query.FilterCompiler

/** The reference's OWN filter-language test table
  * (query/compiler_test.go TestCreateFilterFunction), evaluated
  * through graft's JSON-mode compiler: each case is one JSON record
  * and one DSL string, and the want-bit must match the Go engine's.
  * The two commented-out ANY/ALL cases in the Go table are included —
  * graft implements them (the reference's compiler supports the nodes
  * even though its own test table has them disabled). */
class ReferenceParitySpec extends SparkSpec {
  import spark.implicits._

  private val cases: Seq[(String, String, String, Boolean)] = Seq(
    ("simple equality", "age == 30", """{"age": 30}""", true),
    ("complex condition",
      "(age >= 18 AND status == 'active') OR role == 'admin'",
      """{"age": 25, "status": "active", "role": "user"}""", true),
    ("nested field and string operation",
      "user.email ENDS_WITH '@example.com'",
      """{"user": {"email": "john@example.com"}}""", true),
    ("IN operator", "status IN ['active', 'pending']",
      """{"status": "pending"}""", true),
    ("NOT IN operator", "status NOT IN ['inactive', 'suspended']",
      """{"status": "active"}""", true),
    ("complex nested condition",
      "(user.age > 25 AND (user.status == 'active' OR user.role == 'admin')) AND company.name STARTS_WITH 'Tech'",
      """{"user": {"age": 30, "status": "inactive", "role": "admin"}, "company": {"name": "TechCorp"}}""",
      true),
    ("array operation with ANY", "ANY(items[*].quantity > 100)",
      """{"items": [{"quantity": 50}, {"quantity": 120}, {"quantity": 80}]}""", true),
    ("array operation with ALL", "ALL(scores[*] >= 60)",
      """{"scores": [75, 80, 90, 65]}""", true),
    ("string operations",
      "name CONTAINS 'John' AND email ENDS_WITH '@example.com' AND id STARTS_WITH 'USER'",
      """{"name": "John Doe", "email": "johndoe@example.com", "id": "USER123"}""", true),
    ("numeric comparisons",
      "price > 100 AND price < 200 AND quantity >= 5 AND discount <= 0.2",
      """{"price": 150, "quantity": 10, "discount": 0.15}""", true),
    ("boolean operations", "is_active == true AND is_deleted == false",
      """{"is_active": true, "is_deleted": false}""", true),
    ("NULL checks", "optional_field == NULL AND required_field != NULL",
      """{"required_field": "value"}""", true),
    ("regular expression match", "username MATCHES '^[a-z0-9_]{3,16}$'",
      """{"username": "john_doe123"}""", true),
    ("complex array and object nesting",
      "users[0].contacts[1].address.city == 'New York' AND users[0].contacts[1].phones[1].type CONTAINS 'work'",
      """{"users": [{"contacts": [{"address": {"city": "Los Angeles"}}, {"address": {"city": "New York"}, "phones": [{"type": "home"}, {"type": "work"}]}]}]}""",
      true),
    ("function usage", "tags.length > 3 AND optional_field EXISTS",
      """{"tags": ["red", "green", "blue", "yellow"], "optional_field": "value"}""", true),
    ("complex logical operations",
      "((a > 10 OR b < 5) AND (c == true OR d != false)) OR (e IN [1, 2, 3] AND f NOT IN ['x', 'y', 'z'])",
      """{"a": 15, "b": 7, "c": false, "d": true, "e": 2, "f": "w"}""", true),
    // negative twins — same queries, records built to fail
    ("simple equality (miss)", "age == 30", """{"age": 31}""", false),
    ("IN operator (miss)", "status IN ['active', 'pending']",
      """{"status": "closed"}""", false),
    ("ANY (miss)", "ANY(items[*].quantity > 100)",
      """{"items": [{"quantity": 50}, {"quantity": 80}]}""", false),
    ("ALL (miss)", "ALL(scores[*] >= 60)", """{"scores": [75, 40]}""", false),
    ("MATCHES (miss)", "username MATCHES '^[a-z0-9_]{3,16}$'",
      """{"username": "John Doe!"}""", false)
  )

  test("the reference's query test table evaluates identically (compiler_test.go)") {
    cases.foreach { case (name, query, json, want) =>
      val df = Seq(Tuple1(json)).toDF("props")
      val kept = df.filter(FilterCompiler.compileJson(query, col("props"))).count() == 1
      assert(kept == want, s"case '$name': query [$query] over $json: got $kept, want $want")
    }
  }

  test("euclidean distance pins the reference's value (collection_test.go:12)") {
    import graft.operators.Knn
    val d = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
      .select(Knn.distCol(Knn.Euclidean, col("a"), col("b"))).as[Double].head()
    assert(d == 5.196152422706632)
  }

  test("exhaustive exact search returns every doc at PercentSearched 100 (collection_test.go:549)") {
    import graft.core.{Collection, CollectionOptions, SearchArgs}
    import graft.operators.Knn
    val dir = java.nio.file.Files.createTempDirectory("graft-refx").toFile
    dir.delete()
    val c = Collection.create(spark,
      CollectionOptions("exhaustive", 3, Knn.Euclidean), dir.getAbsolutePath)
    c.addDocuments(Seq(
      (1L, Seq(1.0, 2.0, 3.0), "doc1"),
      (2L, Seq(4.0, 5.0, 6.0), "doc2"),
      (3L, Seq(7.0, 8.0, 9.0), "doc3")).toDF("id", "vector", "metadata"))
    val res = c.searchWithStats(SearchArgs(
      vector = Some(Seq(1.0, 2.0, 3.0)), k = 3, precision = "exact"))
    assert(res.results.select("id").as[Long].collect().toSet == Set(1L, 2L, 3L))
    assert(res.percentSearched == 100.0)
  }

  test("4-bit quantized collections still search (collection_test.go:614)") {
    import graft.core.{Collection, CollectionOptions, SearchArgs}
    import graft.operators.Knn
    val dir = java.nio.file.Files.createTempDirectory("graft-ref4b").toFile
    dir.delete()
    val c = Collection.create(spark,
      CollectionOptions("4bit", 3, Knn.Euclidean, quantization = 4),
      dir.getAbsolutePath)
    val docs = (0 until 10).map { i =>
      (i.toLong, Seq(math.abs(math.sin(i * 1.3)), math.abs(math.cos(i * 2.1)),
        math.abs(math.sin(i * 0.7))), "metadata")
    }
    c.addDocuments(docs.toDF("id", "vector", "metadata"))
    val res = c.search(SearchArgs(
      vector = Some(Seq(0.5, 0.5, 0.5)), k = 5, precision = "exact"))
    assert(res.count() == 5)
    // stored vectors are on the 4-bit grid (quantize-dequantize applied)
    val stored = c.getDocument(0L).get._1
    stored.foreach { x =>
      val grid = math.round(x * 15.0) / 15.0
      assert(math.abs(x - grid) < 1e-9, s"$x not on the 4-bit grid")
    }
  }

  test("exact vs medium cosine search agree within the reference's bound (collection_test.go:23)") {
    import graft.core.{Collection, CollectionOptions, SearchArgs}
    import graft.operators.Knn
    val dir = java.nio.file.Files.createTempDirectory("graft-refprec").toFile
    dir.delete()
    // the reference builds a Cosine collection of random [0,1) vectors
    // and asserts: same result count, per-rank relative distance gap
    // within its bound, and PercentSearched < 100 for medium. Medium
    // here = the LSH forest (lshTables > 1), its numTrees analogue.
    val c = Collection.create(spark,
      CollectionOptions("precision_cmp", 3, Knn.Cosine,
        lshPlanes = 4, lshTables = 8), dir.getAbsolutePath)
    // the reference draws [0,1) vectors; its ADAPTIVE tree splits
    // through data midpoints, implicitly centering. Graft's fixed
    // origin-hyperplane buckets assume roughly centered data (SURVEY
    // §6), so the parity set spans [-1,1] — same contract, scan-native
    // geometry
    val docs = (0 until 500).map { i =>
      (i.toLong, Seq(math.sin(i * 1.17), math.sin(i * 2.31 + 0.5),
        math.sin(i * 0.59 + 1.1)), s"metadata_$i")
    }
    c.addDocuments(docs.toDF("id", "vector", "metadata"))
    val qv = docs.head._2
    val exact = c.searchWithStats(SearchArgs(
      vector = Some(qv), k = 10, precision = "exact"))
    val medium = c.searchWithStats(SearchArgs(
      vector = Some(qv), k = 10, precision = "medium"))
    val de = exact.results.select("dist").as[Double].collect()
    val dm = medium.results.select("dist").as[Double].collect()
    assert(de.length == dm.length, s"expected same count, got ${de.length}/${dm.length}")
    de.zip(dm).foreach { case (e, m) =>
      // reference bound: |exact - medium| / exact <= 1 per rank
      // (self-match rank divides 0/0 -> NaN, which the Go test's
      // `> 1` comparison also treats as a pass)
      if (e > 0.0) assert(math.abs(e - m) / e <= 1.0, s"rank gap: exact=$e medium=$m")
    }
    assert(exact.percentSearched == 100.0)
    assert(medium.percentSearched < 100.0,
      s"medium should not scan the whole corpus: ${medium.percentSearched}")
  }
}
