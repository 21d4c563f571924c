package graft

/** Plan-shape guardrails over EVERY declared query: the scale
  * anti-patterns the architecture bans must never reappear, whatever
  * the operator. Runs on sf0.001 so the whole audit is one quick
  * planning pass (no execution needed — `executedPlan` is the
  * pre-execution physical plan).
  */
class PlanAuditSpec extends SparkSpec {

  private lazy val plans: Map[String, String] =
    SparkEntry.queries.map { case (name, fn) =>
      name -> fn(spark, sf0001).queryExecution.executedPlan.toString
    }

  test("no query plans a cartesian product") {
    val offenders = plans.filter { case (name, p) =>
      p.contains("CartesianProduct") &&
        // brute-force kNN variants legitimately cross-join ONE
        // broadcast query row against the corpus
        !Set("knn_cosine", "knn_euclidean", "knn_filtered", "knn_batch",
          "radius_search", "ann_ivf", "collection_stats").contains(name)
    }
    assert(offenders.isEmpty, s"cartesian products in: ${offenders.keys.mkString(", ")}")
  }

  test("no query plans a global (unpartitioned) window") {
    // WindowExec with an empty partition spec prints "Window [..], [..]"
    // with no partition list — detect via the runtime warning's cause:
    // a Window node whose partition expressions are absent
    val offenders = plans.filter { case (_, p) =>
      p.linesIterator.exists { l =>
        val t = l.trim
        t.startsWith("Window [") && !t.dropWhile(_ != ']').contains(", [")
      }
    }
    assert(offenders.isEmpty, s"global windows in: ${offenders.keys.mkString(", ")}")
  }

  test("filter queries push predicates into the parquet scan") {
    for (q <- Seq("filter_dsl", "list_records")) {
      val p = plans(q)
      assert(p.contains("PushedFilters: [") && !p.contains("PushedFilters: []"),
        s"$q lost scan pushdown:\n$p")
    }
  }

  test("dimension-sized join sides broadcast") {
    assert(plans("q3_join").contains("BroadcastHashJoin"), plans("q3_join"))
    assert(plans("ann_batch").contains("BroadcastExchange"), plans("ann_batch"))
  }

  test("bounded sketch/top-k aggregates run with map-side partials") {
    // TypedImperativeAggregates (KmvAgg, TopKAgg) plan as
    // ObjectHashAggregate with a partial pass — the property that
    // caps what the shuffle moves (<= k values per group per
    // partition); losing it would shuffle raw rows
    for (q <- Seq("events_kmv", "bm25_batch")) {
      val p = plans(q)
      assert(p.contains("ObjectHashAggregate") && p.contains("partial_"),
        s"$q lost its partial object-hash aggregation:\n$p")
    }
    // the batch-BM25 vocabulary must reach the scan side broadcast,
    // never shuffle the corpus against it
    assert(plans("bm25_batch").contains("BroadcastHashJoin"), plans("bm25_batch"))
  }

  test("single-query knn executes as TakeOrdered, not a full sort") {
    for (q <- Seq("knn_cosine", "knn_euclidean", "ann_lsh")) {
      assert(plans(q).contains("TakeOrderedAndProject"),
        s"$q should top-k via TakeOrderedAndProject:\n${plans(q)}")
    }
  }
}
