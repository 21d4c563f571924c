package graft

import org.apache.spark.sql.functions._
import graft.operators.Url

/** URL normalization + registrable-domain extraction — the crawl-key
  * family (VERDICT r17 next-round #2). Adversarial inputs beyond what
  * the graded fixture templates exercise: wildcard-ish hosts, bare
  * public suffixes, unknown TLDs, single-label hosts, IPv4 literals,
  * userinfo-free malformed strings, ports on multi-label suffixes. */
class UrlSpec extends SparkSpec {
  import spark.implicits._

  private def norm1(u: String): String =
    Seq(u).toDF("url").select(Url.normalizeCol(col("url"))).as[String].head()

  private def dom1(h: String): String =
    Seq(h).toDF("h").select(Url.registrableDomain(col("h"))).as[String].head()

  test("normalize: case, default ports, fragments, tracking params") {
    assert(norm1("HTTPS://Example.COM:443/A/B?utm_source=x&q=1#top") ==
      "https://example.com/A/B?q=1") // path case is PRESERVED (RFC 3986: path is case-sensitive)
    assert(norm1("http://example.com:80/") == "http://example.com/")
    assert(norm1("http://example.com:8080/x") == "http://example.com:8080/x")
    assert(norm1("https://example.com") == "https://example.com/")
    assert(norm1("https://example.com?gclid=1&fbclid=2&msclkid=3&ref=r") ==
      "https://example.com/")
    // utm_ prefix matches any utm param; a param NAMED utmx is kept
    assert(norm1("https://a.io/p?utm_=1&utmx=2") == "https://a.io/p?utmx=2")
    // valueless tracking param, and '&&' empty tokens dropped
    assert(norm1("https://a.io/p?ref&&x=1") == "https://a.io/p?x=1")
    // fragment strips even when it contains '?'
    assert(norm1("https://a.io/p#frag?not=query") == "https://a.io/p")
    // trailing slash inside a real path is preserved (names a
    // different resource on many servers)
    assert(norm1("https://a.io/dir/") == "https://a.io/dir/")
  }

  test("normalize: IPv4 hosts and kept param order") {
    assert(norm1("HTTP://192.168.0.1:80/admin?b=2&a=1") ==
      "http://192.168.0.1/admin?b=2&a=1") // param ORDER preserved
    assert(norm1("https://192.168.0.1:444/x") == "https://192.168.0.1:444/x")
  }

  test("registrable domain: longest suffix wins") {
    assert(dom1("www.example.co.uk") == "example.co.uk")
    assert(dom1("a.b.example.co.uk") == "example.co.uk")
    assert(dom1("news.example.com.au") == "example.com.au")
    assert(dom1("deep.sub.example.com") == "example.com")
    // github.io is itself a (private-section) suffix: each user site
    // is its own registrable domain
    assert(dom1("user.github.io") == "user.github.io")
    assert(dom1("www.user.github.io") == "user.github.io")
    // but a host under plain .io that is NOT github: .io rule applies
    assert(dom1("api.company.io") == "company.io")
  }

  test("registrable domain: full-PSL rules the r18 subset lacked") {
    // com.pl is a real 2-label PSL rule absent from the old ~80-rule
    // subset — under it every .com.pl site collapsed into ONE
    // "com.pl" domain row (VERDICT r18 what's-missing #1)
    assert(dom1("shop.example.com.pl") == "example.com.pl")
    assert(dom1("example.com.pl") == "example.com.pl")
    assert(dom1("com.pl") == "com.pl") // bare suffix -> itself
    // 3-label and 4-label normal rules
    assert(dom1("x.myschool.schools.nsw.edu.au") == "myschool.schools.nsw.edu.au")
    assert(dom1("a.b.pvt.k12.ma.us") == "b.pvt.k12.ma.us")
    // private-section deep rule (s3.dualstack-style AWS endpoints)
    assert(dom1("bucket.s3.ap-northeast-2.amazonaws.com") ==
      "bucket.s3.ap-northeast-2.amazonaws.com")
  }

  test("registrable domain: wildcard and exception rules") {
    // *.ck: the suffix is <label>.ck, so three labels are registrable
    assert(dom1("www.foo.ck") == "www.foo.ck")
    assert(dom1("a.www.foo.ck") == "www.foo.ck")
    assert(dom1("foo.ck") == "foo.ck") // host IS the wildcard suffix
    // !www.ck: the exception carves www.ck back OUT of *.ck
    assert(dom1("www.ck") == "www.ck")
    assert(dom1("sub.www.ck") == "www.ck")
    // !city.kawasaki.jp vs *.kawasaki.jp
    assert(dom1("www.city.kawasaki.jp") == "city.kawasaki.jp")
    assert(dom1("a.b.kawasaki.jp") == "a.b.kawasaki.jp")
  }

  test("psl resource parse: kinds, counts, invariants") {
    val p = Url.psl
    assert(p.rules.values.map(_.size).sum > 9000) // the FULL list
    assert(p.wildcards.values.map(_.size).sum > 50)
    assert(p.exceptions.values.map(_.size).sum >= 8)
    assert(p.rules(2).contains("com.pl") && p.rules(1).contains("com"))
    assert(p.wildcards(1).contains("ck") &&
      p.exceptions(2).contains("www.ck"))
    // every rule is lowercase with no whitespace (the SQL VALUES twin
    // quotes them raw), and no rule contains a quote character
    assert(Url.pslRows.forall { case (_, s, _) =>
      s == s.toLowerCase && !s.exists(_.isWhitespace) && !s.contains("'") })
  }

  test("normalize: malformed inputs pass through unmerged") {
    // no extractable host -> the raw input IS the normal form, so
    // dedupFetches never collapses distinct malformed rows (ADVICE
    // r18 #2: they all used to normalize to the constant ':///')
    assert(norm1("not a url") == "not a url")
    assert(norm1("//scheme.relative/x") == "//scheme.relative/x")
    assert(norm1("/just/a/path") == "/just/a/path")
    val got = Url.dedupFetches(
      Seq((1L, "garbage-one"), (2L, "garbage-two"))
        .toDF("doc_id", "url"), "url", "doc_id").collect()
    assert(got.length == 2)
  }

  test("registrable domain: bare suffixes, unknown TLDs, single labels") {
    // a host that IS a public suffix maps to itself (PSL: nothing
    // registrable below it to name)
    assert(dom1("co.uk") == "co.uk")
    assert(dom1("com") == "com")
    // unknown TLD: the PSL implicit `*` rule — last two labels
    assert(dom1("www.example.zz") == "example.zz")
    // single-label hosts (localhost, intranet) map to themselves
    assert(dom1("localhost") == "localhost")
    assert(dom1("") == "")
  }

  test("domainProfile: counts, dup rate, integer grid") {
    val docs = Seq(
      (0L, "https://a.example.com/1", "same text here"),
      (1L, "https://b.example.com/2", "same text here"), // exact dup, other host
      (2L, "https://a.example.com/3", "different words entirely ok"),
      (3L, "https://only.example.org/x", "one doc alone")
    ).toDF("doc_id", "url", "text")
    val prof = Url.domainProfile(docs, "url", "text")
      .orderBy("domain").collect()
    assert(prof.length == 2)
    val com = prof(0)
    assert(com.getString(0) == "example.com")
    assert(com.getLong(1) == 3)     // n_docs
    assert(com.getLong(2) == 2)     // n_hosts
    assert(com.getLong(3) == 1)     // n_dup: 3 docs, 2 distinct texts
    assert(com.getLong(4) == 3 + 3 + 4) // tokens
    assert(com.getLong(5) == (14 + 14 + 27) / 3) // integer mean chars
    val org = prof(1)
    assert(org.getString(0) == "example.org" && org.getLong(1) == 1)
  }

  test("dedupFetches collapses spelling variants of one resource") {
    val fetches = Seq(
      (10L, "https://WWW.Example.COM:443/item/1?utm_source=a"),
      (11L, "https://www.example.com/item/1#frag"),
      (12L, "HTTPS://www.example.com/item/1?gclid=x"),
      (13L, "https://www.example.com/item/2"), // different resource
      (14L, "https://www.example.com/item/1")  // exact canonical form
    ).toDF("doc_id", "url")
    val got = Url.dedupFetches(fetches, "url", "doc_id")
      .orderBy("url_norm").collect()
    assert(got.length == 2)
    val r1 = got(0)
    assert(r1.getString(0) == "https://www.example.com/item/1")
    assert(r1.getLong(1) == 10L)   // keep_id: first fetch
    assert(r1.getLong(2) == 4L)    // n_fetches
    assert(r1.getLong(3) == 4L)    // n_variants: all four spellings distinct
    assert(got(1).getString(0) == "https://www.example.com/item/2" &&
      got(1).getLong(2) == 1L)
  }

  test("domainProfileSketch: exact under k, bounded-shuffle plan") {
    // a hot-domain shape: one domain with many hosts and dup texts,
    // one small domain — under k the sketch holds EVERY distinct
    // hash, so est_hosts/est_dup must equal the exact twin's counts
    val docs = (0 until 120).map { i =>
      if (i % 4 == 3)
        (i.toLong, s"https://only.example.org/x$i", s"unique text $i")
      else
        // 30 hosts on example.com, every third text a planted copy
        (i.toLong, s"https://h${i % 30}.example.com/p/$i",
          if (i % 3 == 0) "copied text block" else s"fresh text $i")
    }.toDF("doc_id", "url", "text")
    val exact = Url.domainProfile(docs, "url", "text")
      .orderBy("domain").collect()
    val sk = Url.domainProfileSketch(docs, "url", "text", k = 64)
      .orderBy("domain").collect()
    assert(exact.length == sk.length)
    exact.zip(sk).foreach { case (e, s) =>
      assert(s.getString(0) == e.getString(0))
      assert(s.getLong(1) == e.getLong(1)) // n_docs
      assert(s.getDouble(2) == e.getLong(2).toDouble, s"est_hosts $s vs $e")
      assert(s.getDouble(3) == e.getLong(3).toDouble, s"est_dup $s vs $e")
      assert(s.getLong(4) == e.getLong(4)) // tokens_total
      assert(s.getLong(5) == e.getLong(5)) // chars_per_doc
    }
    // the plan shape the sketch exists for: no Expand (the canonical
    // multi-countDistinct rewrite) and ONE domain-keyed exchange —
    // map-side partials bounded at k longs per domain per partition
    val plan = Url.domainProfileSketch(docs, "url", "text", k = 64)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"sketch plan must not Expand:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"sketch roll-up must be one keyed agg:\n$plan")
  }

  test("normalize is deterministic and stays map-side (no shuffle)") {
    val docs = Seq((0L, "https://A.co.UK:443/x?utm_a=1")).toDF("doc_id", "url")
    val plan = Url.normalize(docs, "url").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"normalize must not shuffle:\n$plan")
    val prof = Url.domainProfile(
      Seq((0L, "https://a.co.uk/x", "t")).toDF("doc_id", "url", "text"),
      "url", "text")
    // the two domain-keyed exchanges of the canonical multi-
    // countDistinct plan (Expand + partial, then final) and no join;
    // count by substring — plan lines carry "+-" prefixes, so a
    // startsWith count reads zero and asserts nothing
    val profPlan = prof.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(profPlan).size
    assert(exchanges <= 2 && !profPlan.contains("Join"),
      s"domainProfile must be the two-stage distinct agg:\n$profPlan")
  }
}
