package graft

import org.apache.spark.sql.SparkSession

/** The SparkSessionExtensions injector must make graft functions
  * resolvable in a session configured only via `spark.sql.extensions`
  * (no runtime register call). getOrCreate would return the suite-shared
  * session and skip extension wiring, so the default/active sessions are
  * cleared first and restored after. */
class ExtensionsSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("spark.sql.extensions=graft.plans.GraftExtensions resolves graft_dot") {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s = SparkSession.builder()
        .master("local[2]")
        .config("spark.sql.extensions", "graft.plans.GraftExtensions")
        .config("spark.ui.enabled", "false")
        .appName("ExtensionsSpec")
        .getOrCreate()
      val r = s.sql(
        "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d, " +
          "graft_sorted_intersect(array(1L, 2L, 5L), array(2L, 5L, 9L)) AS c")
        .head
      assert(r.getDouble(0) == 11.0 && r.getInt(1) == 2)
      // the injected optimizer rule is live in an extension session:
      // a JW threshold filter over a real source gains the length
      // prefilter in ITS optimized plan
      val q = Tables.load(s, "/root/testdata/sf0.001", "part")
        .filter(org.apache.spark.sql.functions
          .expr("graft_jaro_winkler(p_name, p_brand) >= 0.95"))
      assert(q.queryExecution.optimizedPlan.toString.contains("least(length("),
        q.queryExecution.optimizedPlan.toString)
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}

/** The JW length-ratio prefilter rule: injected conjunct appears in the
  * optimized plan, never changes results, and is idempotent. Runs on the
  * suite-shared session (GraftSession wires the extension). */
class JwPrefilterSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private def df = {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    Seq(
      (1L, "martha", "marhta"),       // jw 0.9611 — survives
      (2L, "dixon", "dicksonx"),      // jw 0.8133 — cut by >= 0.95
      (3L, "prefix", "prefixextraxx") // short/long: len prefilter prunes
    ).toDF("id", "a", "b")
  }

  test("threshold predicates gain a leading length-ratio conjunct") {
    import graft.plans.JwPrefilterRule
    // parquet-backed (a local Seq would constant-fold to a
    // LocalRelation); the shared spec session has no extensions, so
    // apply the rule directly — the wiring itself is asserted in
    // ExtensionsSpec's extension-session test
    val part = Tables.load(spark, Sf, "part")
    val q = part.filter(expr("graft_jaro_winkler(p_name, p_brand) >= 0.95"))
    val opt = JwPrefilterRule(q.queryExecution.optimizedPlan)
    assert(opt.toString.contains("least(length("),
      "length prefilter not injected:\n" + opt.toString)
    // rounded form fires too, with the threshold relaxed by the round
    val qr = part.filter(
      expr("round(graft_jaro_winkler(p_name, p_brand), 4) >= 0.95"))
    assert(JwPrefilterRule(qr.queryExecution.optimizedPlan)
      .toString.contains("least(length("))
    // idempotent: a second application adds nothing
    assert(JwPrefilterRule(opt).toString == opt.toString)
    assert("least\\(length\\(".r.findAllIn(opt.toString).size == 1)
  }

  test("rule does NOT fire for disjunctive or negated thresholds") {
    import graft.plans.JwPrefilterRule
    val part = Tables.load(spark, Sf, "part")
    // OR: the bound is only implied by ONE branch — injecting it
    // top-level would drop rows satisfied by `p_size > 40`
    val qOr = part.filter(
      expr("graft_jaro_winkler(p_name, p_brand) >= 0.95 OR p_size > 40"))
    assert(!JwPrefilterRule(qOr.queryExecution.optimizedPlan)
      .toString.contains("least(length("),
      "prefilter wrongly injected under OR")
    // NOT: rows with dissimilar names must SURVIVE; the length bound
    // would wrongly cut them
    val qNot = part.filter(
      expr("NOT (graft_jaro_winkler(p_name, p_brand) >= 0.95)"))
    assert(!JwPrefilterRule(qNot.queryExecution.optimizedPlan)
      .toString.contains("least(length("),
      "prefilter wrongly injected under NOT")
    // CASE WHEN guarding the threshold: same non-conjunct position
    val qCase = part.filter(expr(
      "CASE WHEN p_size > 20 THEN graft_jaro_winkler(p_name, p_brand) >= 0.95 ELSE true END"))
    assert(!JwPrefilterRule(qCase.queryExecution.optimizedPlan)
      .toString.contains("least(length("),
      "prefilter wrongly injected under CASE WHEN")
    // ...but a threshold that IS a top-level conjunct of a larger AND
    // still fires
    val qAnd = part.filter(
      expr("graft_jaro_winkler(p_name, p_brand) >= 0.95 AND p_size > 0"))
    assert(JwPrefilterRule(qAnd.queryExecution.optimizedPlan)
      .toString.contains("least(length("))
    // end-to-end: OR semantics preserved (row 3 matches only via id >= 3)
    assert(df.filter(expr(
      "graft_jaro_winkler(a, b) >= 0.95 OR id >= 2"))
      .select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L))
  }

  test("bound math: uninformative thresholds do not fire") {
    import graft.plans.JwPrefilterRule.lengthRatioBound
    assert(lengthRatioBound(0.95).exists(r => r > 0.74 && r < 0.76))
    assert(lengthRatioBound(0.94).exists(r => r > 0.69 && r < 0.71))
    assert(lengthRatioBound(0.6).isEmpty)  // 3·0.6 − 2 < 0 — no info
    val q = Tables.load(spark, Sf, "part")
      .filter(expr("graft_jaro_winkler(p_name, p_brand) >= 0.5"))
    assert(!graft.plans.JwPrefilterRule(q.queryExecution.optimizedPlan)
      .toString.contains("least(length("))
    // the local-df sanity rows: jw semantics unchanged at low thresholds
    assert(df.filter(expr("graft_jaro_winkler(a, b) >= 0.5"))
      .select("id").collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
  }

  test("prefilter never drops a qualifying pair on random words") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val words = for {
      l <- 1 to 12
      k <- 0 to 2
    } yield ("abcdezz" * 2).drop(k).take(l)
    val pairs = words.flatMap(a => words.map(b => (a, b))).toDF("a", "b")
    val kept = pairs.filter(expr("graft_jaro_winkler(a, b) >= 0.85"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val brute = words.flatMap(a => words.collect {
      case b if graft.functions.TextHash.jaroWinkler(
        org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b)) >= 0.85 =>
        (a, b)
    }).toSet
    assert(kept == brute)
  }
}
