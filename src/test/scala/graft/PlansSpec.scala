package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.sources.Tables

/** SparkSessionExtensions surface: the injected BroadcastDimsRule must
  * force dimension-table joins to broadcast even when the session's
  * auto-broadcast machinery is disabled (the catalog-knowledge case). */
class PlansSpec extends AnyFunSuite {

  test("injected optimizer rule broadcasts dimension joins with auto-broadcast off") {
    val base = TestSpark.spark // ensure the shared context exists
    val d = "/root/testdata/sf0.001"

    // control: same settings, no extension → sort-merge join
    base.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    base.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val c = Tables(base, d, "customer")
      val n = Tables(base, d, "nation")
      val plain = c.join(n, c("c_nationkey") === n("n_nationkey"))
        .queryExecution.executedPlan.toString
      assert(plain.contains("SortMergeJoin"), plain)
    } finally {
      base.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      base.conf.set("spark.sql.adaptive.enabled", "true")
    }

    // with extensions: new session over the SAME SparkContext
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val ext = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .withExtensions(graft.plans.GraftExtensions)
      .getOrCreate()
    try {
      val c = Tables(ext, d, "customer")
      val n = Tables(ext, d, "nation")
      val hinted = c.join(n, c("c_nationkey") === n("n_nationkey"))
        .queryExecution.executedPlan.toString
      assert(hinted.contains("BroadcastHashJoin"), hinted)
      // fact-to-fact joins must NOT be hinted
      val o = Tables(ext, d, "orders")
      val l = Tables(ext, d, "lineitem")
      val facts = o.join(l, o("o_orderkey") === l("l_orderkey"))
        .queryExecution.executedPlan.toString
      assert(facts.contains("SortMergeJoin"), facts)
    } finally {
      // the session shares the JVM-wide context — never stop() it here;
      // just restore the shared session as active/default
      SparkSession.clearActiveSession()
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
