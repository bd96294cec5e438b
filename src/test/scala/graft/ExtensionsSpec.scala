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
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
