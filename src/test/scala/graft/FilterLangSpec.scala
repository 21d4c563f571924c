package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.query.{FilterCompiler, FilterLang}

/** Covers the DSL surface documented in the reference README
  * ("Query Filter Language") and query/compiler_test.go. */
class FilterLangSpec extends SparkSpec {
  import spark.implicits._

  private lazy val people: DataFrame = Seq(
    (1L, "John Doe", 25, "active", "john@example.com", Seq("a", "b"), Some(7)),
    (2L, "Jane Roe", 16, "active", "jane@test.org", Seq("a"), None),
    (3L, "Bob Poe", 40, "inactive", "bob@example.com", Seq.empty[String], Some(3)),
    (4L, "Ann Zoe", 30, "pending", "ann@example.com", Seq("x", "y", "z"), Some(1))
  ).toDF("id", "name", "age", "status", "email", "tags", "phone")

  private def ids(filter: String, df: DataFrame = people): Seq[Long] =
    df.filter(FilterCompiler.compile(filter, df)).select("id").as[Long].collect().toSeq.sorted

  test("comparison and logical operators") {
    assert(ids("age >= 18 AND status == \"active\"") == Seq(1L))
    assert(ids("age >= 18 OR status == 'active'") == Seq(1L, 2L, 3L, 4L))
    assert(ids("NOT (status == 'active')") == Seq(3L, 4L))
    assert(ids("age != 25") == Seq(2L, 3L, 4L))
    assert(ids("(age >= 18 AND status == 'active') OR status == 'pending'") == Seq(1L, 4L))
  }

  test("string operators") {
    assert(ids("name STARTS_WITH 'J'") == Seq(1L, 2L))
    assert(ids("email ENDS_WITH '@example.com'") == Seq(1L, 3L, 4L))
    assert(ids("name CONTAINS 'oe'") == Seq(1L, 2L, 3L, 4L))
    assert(ids("name MATCHES '^J.*e$'") == Seq(1L, 2L))
  }

  test("IN / NOT IN") {
    assert(ids("status IN ['active', 'pending']") == Seq(1L, 2L, 4L))
    assert(ids("status NOT IN ['active']") == Seq(3L, 4L))
    assert(ids("age IN [16, 40]") == Seq(2L, 3L))
  }

  test("EXISTS / DOES NOT EXIST (null and missing columns)") {
    assert(ids("phone EXISTS") == Seq(1L, 3L, 4L))
    assert(ids("phone DOES NOT EXIST") == Seq(2L))
    // a column absent from the schema never exists
    assert(ids("nickname EXISTS") == Seq())
    assert(ids("nickname DOES NOT EXIST") == Seq(1L, 2L, 3L, 4L))
  }

  test("length on arrays and strings, array contains/index") {
    assert(ids("tags.length > 1") == Seq(1L, 4L))
    assert(ids("LENGTH(tags) == 0") == Seq(3L))
    assert(ids("name.length >= 8") == Seq(1L, 2L))
    assert(ids("tags CONTAINS 'a'") == Seq(1L, 2L))
    assert(ids("tags[0] == 'x'") == Seq(4L))
  }

  test("nested struct fields") {
    val df = Seq((1L, ("alice", true)), (2L, ("bob", false)))
      .toDF("id", "user")
      .select(col("id"), col("user._1").as("name"), col("user._2").as("verified"))
      .select(col("id"), struct(col("name"), col("verified")).as("profile"))
    val got = df.filter(FilterCompiler.compile("profile.verified == true", df))
      .select("id").as[Long].collect().toSeq
    assert(got == Seq(1L))
  }

  test("json mode resolves paths, casts by literal, and honors length") {
    val df = Seq(
      (1L, """{"k": 69, "tags": ["a","b"], "user": {"name": "jo"}}"""),
      (2L, """{"k": 12, "tags": [], "user": {"name": "meg"}}"""),
      (3L, """{"tags": ["z"]}""")
    ).toDF("id", "props")
    def jids(f: String): Seq[Long] =
      df.filter(FilterCompiler.compileJson(f, col("props"))).select("id").as[Long].collect().toSeq.sorted
    assert(jids("k >= 50") == Seq(1L))
    assert(jids("k EXISTS") == Seq(1L, 2L))
    assert(jids("k DOES NOT EXIST") == Seq(3L))
    assert(jids("tags.length >= 1") == Seq(1L, 3L))
    assert(jids("user.name == 'meg'") == Seq(2L))
    assert(jids("k IN [12, 99]") == Seq(2L))
  }

  test("parameters bind as literals; unbound parameters throw") {
    assert(people.filter(FilterCompiler.compile("age >= :min_age AND status == :st", people,
      Map("min_age" -> 18, "st" -> "active")))
      .select("id").as[Long].collect().toSeq.sorted == Seq(1L))
    intercept[IllegalArgumentException](
      FilterCompiler.compile("age >= :missing", people))
  }

  test("ANY/ALL with [*] over scalar arrays (query/parser_test.go:38)") {
    val df = Seq(
      (1L, Seq(500.0, 1500.0), Seq(4, 5)),
      (2L, Seq(100.0), Seq(2, 5)),
      (3L, Seq.empty[Double], Seq.empty[Int]),
      (4L, Seq(2000.0), Seq(4, 4))
    ).toDF("id", "orders", "ratings")
    def q(f: String): Seq[Long] =
      df.filter(FilterCompiler.compile(f, df)).select("id").as[Long].collect().toSeq.sorted
    assert(q("ANY(orders[*] > 1000)") == Seq(1L, 4L))
    // ALL over an empty array is vacuously true (reference loop semantics)
    assert(q("ALL(ratings[*] >= 4)") == Seq(1L, 3L, 4L))
    assert(q("ANY(orders[*] > 1000) AND ALL(ratings[*] >= 4)") == Seq(1L, 4L))
    // missing array column → record errors out in the reference → excluded
    assert(q("ANY(nope[*] > 0)") == Seq())
    assert(q("ALL(nope[*] > 0)") == Seq())
  }

  test("ANY over struct-array element fields (query/compiler_test.go:260)") {
    val df = Seq(
      (1L, Seq((50, "a"), (150, "b"))),
      (2L, Seq((75, "c"))),
      (3L, Seq.empty[(Int, String)])
    ).toDF("id", "raw")
      .select(col("id"), transform(col("raw"),
        x => struct(x.getField("_1").as("quantity"), x.getField("_2").as("sku"))).as("items"))
    def q(f: String): Seq[Long] =
      df.filter(FilterCompiler.compile(f, df)).select("id").as[Long].collect().toSeq.sorted
    assert(q("ANY(items[*].quantity > 100)") == Seq(1L))
    assert(q("ALL(items[*].quantity <= 100)") == Seq(2L, 3L))
    assert(q("ANY(items[*].sku == 'c')") == Seq(2L))
  }

  test("ANY/ALL with [*].length and element string ops") {
    val df = Seq(
      (1L, Seq("short", "elongated")),
      (2L, Seq("tiny")),
      (3L, Seq("overwhelmingly"))
    ).toDF("id", "words")
    def q(f: String): Seq[Long] =
      df.filter(FilterCompiler.compile(f, df)).select("id").as[Long].collect().toSeq.sorted
    assert(q("ANY(words[*].length > 8)") == Seq(1L, 3L))
    assert(q("ALL(words[*].length <= 9)") == Seq(1L, 2L))
    assert(q("ANY(words[*] ENDS_WITH 'ed')") == Seq(1L))
  }

  test("ANY/ALL in json mode over object and scalar arrays") {
    val df = Seq(
      (1L, """{"items": [{"quantity": 50}, {"quantity": 150}], "scores": [80, 90]}"""),
      (2L, """{"items": [{"quantity": 75}], "scores": [50, 95]}"""),
      (3L, """{"items": [], "scores": []}"""),
      (4L, """{"scores": [60]}""")
    ).toDF("id", "props")
    def jq(f: String): Seq[Long] =
      df.filter(FilterCompiler.compileJson(f, col("props"))).select("id").as[Long].collect().toSeq.sorted
    assert(jq("ANY(items[*].quantity > 100)") == Seq(1L))
    assert(jq("ALL(scores[*] >= 60)") == Seq(1L, 3L, 4L))
    // items missing on id=4 → excluded even under ALL
    assert(jq("ALL(items[*].quantity <= 100)") == Seq(2L, 3L))
  }

  test("MATCHES follows the reference's RE2 dialect (query/compiler_test.go:296)") {
    val df = Seq(
      (1L, "john_doe123"), (2L, "JD"), (3L, "UPPER_ONLY"), (4L, "abc def")
    ).toDF("id", "username")
    def m(pat: String): Seq[Long] =
      df.filter(FilterCompiler.compile(s"username MATCHES '$pat'", df))
        .select("id").as[Long].collect().toSeq.sorted
    // the reference's own test pattern: full anchors + class + bound
    assert(m("^[a-z0-9_]{3,16}$") == Seq(1L))
    // unanchored = substring semantics, like Go regexp.MatchString
    assert(m("doe") == Seq(1L))
    assert(m("^UPPER") == Seq(3L))
    // RE2 POSIX classes normalize to Java \\p classes
    assert(m("^[[:lower:]]+[[:digit:]]+$") == Seq())
    assert(m("^[[:alpha:]]+ [[:alpha:]]+$") == Seq(4L))
    assert(m("[[:digit:]]{3}") == Seq(1L))
    // RE2 named groups (?P<...>) normalize to Java (?<...>)
    assert(m("^(?P<first>[a-z]+)_(?P<rest>.*)$") == Seq(1L))
  }

  test("[*] outside ANY/ALL is rejected") {
    intercept[IllegalArgumentException](
      FilterCompiler.compile("tags[*] == 'a'", people))
    intercept[IllegalArgumentException](
      FilterCompiler.compile("ANY(age > 10)", people))
  }

  test("lexer produces the reference's token streams (query/lexer_test.go)") {
    import FilterLang._
    // TestNextToken (lexer_test.go:7)
    assert(lex("""age >= 18 AND status == "active"""") == List(
      TIdent("age"), TOp(">="), TNum(18.0), TKw("AND"),
      TIdent("status"), TOp("=="), TStr("active"), TEof))
    // TestLexerAdditionalCases (lexer_test.go:39) — incl. [*] as ONE token
    assert(lex("""name != "John" AND (age < 30 OR status IN ("active", "pending")) AND items[*].price > 100""") == List(
      TIdent("name"), TOp("!="), TStr("John"), TKw("AND"), TLParen,
      TIdent("age"), TOp("<"), TNum(30.0), TKw("OR"),
      TIdent("status"), TKw("IN"), TLParen, TStr("active"), TComma,
      TStr("pending"), TRParen, TRParen, TKw("AND"),
      TIdent("items"), TArrayStar, TDot, TIdent("price"), TOp(">"),
      TNum(100.0), TEof))
    // TestLexerExistsAndDoesNotExist (lexer_test.go:88) — the
    // three-word keyword merges to one token, as in the Go lexer
    assert(lex("""field1 EXISTS AND field2 DOES NOT EXIST OR field3 == "value"""") == List(
      TIdent("field1"), TKw("EXISTS"), TKw("AND"),
      TIdent("field2"), TKw("DOES_NOT_EXIST"), TKw("OR"),
      TIdent("field3"), TOp("=="), TStr("value"), TEof))
  }

  test("parser produces the reference's AST shapes (query/parser_test.go)") {
    import FilterLang._
    def ref(names: Any*): Ref = Ref(names.toList.map {
      case s: String => Field(s)
      case i: Int => Index(i)
      case p: PathSeg => p
    })
    val cases: Seq[(String, Node)] = Seq(
      "age >= 18 AND status == 'active'" ->
        And(Cmp(">=", ref("age"), Lit(18.0)), Cmp("==", ref("status"), Lit("active"))),
      "name STARTS_WITH 'J' OR name ENDS_WITH 'son'" ->
        Or(StrOp("STARTS_WITH", ref("name"), Lit("J")),
          StrOp("ENDS_WITH", ref("name"), Lit("son"))),
      "tags CONTAINS 'urgent' AND priority > 5" ->
        And(StrOp("CONTAINS", ref("tags"), Lit("urgent")),
          Cmp(">", ref("priority"), Lit(5.0))),
      "NOT (status == 'inactive' OR lastLogin < '2023-01-01')" ->
        Not(Or(Cmp("==", ref("status"), Lit("inactive")),
          Cmp("<", ref("lastLogin"), Lit("2023-01-01")))),
      "age IN [18, 21, 25] AND country NOT IN ['US', 'CA']" ->
        And(In(ref("age"), ArrayLit(List(Lit(18.0), Lit(21.0), Lit(25.0))), negated = false),
          In(ref("country"), ArrayLit(List(Lit("US"), Lit("CA"))), negated = true)),
      "middleName EXISTS AND nickname DOES NOT EXIST" ->
        And(Exists(ref("middleName"), negated = false),
          Exists(ref("nickname"), negated = true)),
      // the upstream table has this one commented out; graft parses it
      "ANY(orders[*] > 1000) AND ALL(ratings[*] >= 4)" ->
        And(Quant("ANY", Cmp(">", ref("orders", StarSeg), Lit(1000.0))),
          Quant("ALL", Cmp(">=", ref("ratings", StarSeg), Lit(4.0)))),
      "items.length > 0 AND items[0].price < 100" ->
        And(Cmp(">", ref("items", LengthSeg), Lit(0.0)),
          Cmp("<", ref("items", 0, "price"), Lit(100.0))),
      "user.profile.completed == true AND user.age >= :minAge" ->
        And(Cmp("==", ref("user", "profile", "completed"), Lit(true)),
          Cmp(">=", ref("user", "age"), Param("minAge"))),
      "(status == 'active' AND age >= 18) OR role == 'admin'" ->
        Or(And(Cmp("==", ref("status"), Lit("active")),
          Cmp(">=", ref("age"), Lit(18.0))),
          Cmp("==", ref("role"), Lit("admin")))
    )
    cases.foreach { case (input, want) =>
      assert(FilterLang.parse(input) == want, s"input [$input]")
    }
  }

  test("parser rejects malformed input") {
    intercept[IllegalArgumentException](FilterLang.parse("age >="))
    intercept[IllegalArgumentException](FilterLang.parse("age > 18 AND"))
    intercept[IllegalArgumentException](FilterLang.parse("(age > 18"))
    intercept[IllegalArgumentException](FilterLang.parse("age @ 18"))
    intercept[IllegalArgumentException](FilterLang.parse("name CONTAINS"))
  }

  test("filters compile to pushable predicates (scan-level pushdown)") {
    val docs = graft.core.Tables.documents(spark, sf0001)
    val plan = docs.filter(FilterCompiler.compile("n_chars >= 300 AND lang == 'en'", docs))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(n_chars,300)"),
      s"expected pushed filters in:\n$plan")
  }
}
