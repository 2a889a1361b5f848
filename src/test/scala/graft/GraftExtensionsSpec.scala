package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The extensions class must make cosine_sim available to a session
  * built with withExtensions — proven against a FRESH SparkSession
  * (default cleared), with a no-extensions negative control, so a temp
  * registration leaking from another suite can't fake the pass.
  */
class GraftExtensionsSpec extends AnyFunSuite {
  lazy val base = TestSpark.spark // ensure the shared context exists

  private def freshSession(withExt: Boolean): SparkSession = {
    base // touch
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val b = SparkSession.builder()
      .master("local[2]").appName("graft-ext-test")
      .config("spark.ui.enabled", "false")
    val s = (if (withExt) b.withExtensions(new graft.functions.GraftExtensions) else b)
      .getOrCreate()
    s
  }

  private def restore(): Unit = {
    SparkSession.setDefaultSession(base)
    SparkSession.setActiveSession(base)
  }

  test("withExtensions(GraftExtensions) provides cosine_sim in SQL") {
    try {
      val s = freshSession(withExt = true)
      val got = s.sql(
        "SELECT round(cosine_sim(array(1.0F, 0.0F), array(0.6F, 0.8F)), 3) AS s")
        .head.getDouble(0)
      assert(got == 0.6)
    } finally restore()
  }

  test("a fresh session WITHOUT extensions does not see cosine_sim") {
    try {
      val s = freshSession(withExt = false)
      val err = intercept[Exception] {
        s.sql("SELECT cosine_sim(array(1.0F), array(1.0F))").collect()
      }
      assert(err.getMessage.toLowerCase.contains("cosine_sim"))
    } finally restore()
  }
}
