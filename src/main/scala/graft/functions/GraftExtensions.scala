package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftnative.{
  AsOfJoinStrategy, CosineSimilarity, PushFilterThroughAsOfJoin, Shingles}

/** SparkSessionExtensions entry point: registers the engine's native
  * surface permanently for a session built with
  * `.withExtensions(new GraftExtensions)` or via
  * `spark.sql.extensions=graft.functions.GraftExtensions`:
  *
  *   - `cosine_sim` codegen expression (function injection);
  *   - the native as-of join's planner strategy + filter-pushdown
  *     optimizer rule (plan injection) — the full custom-operator
  *     stack (`org.apache.spark.sql.graftnative.AsOfJoin*`).
  *
  * Sessions not built with extensions (the driver's Verify/Bench)
  * get the as-of pieces lazily via `AsOfJoinApi.ensureRegistered`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    ext.injectFunction((
      new FunctionIdentifier("shingles"),
      new ExpressionInfo(classOf[Shingles].getName, "shingles"),
      (exprs: Seq[Expression]) => Shingles(exprs(0), exprs(1))))
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => PushFilterThroughAsOfJoin)
  }
}
