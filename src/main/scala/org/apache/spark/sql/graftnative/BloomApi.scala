package org.apache.spark.sql.graftnative

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Registers Spark's INTERNAL bloom-filter expressions — the exact
  * machinery `InjectRuntimeFilter` builds its runtime bloom joins from
  * (`BloomFilterAggregate` → binary sketch; `BloomFilterMightContain`
  * → codegen'd probe) — as session functions, so a query can build a
  * bloom over one table and gate another table's scan with it. Used by
  * `Dedup.d13BloomDedup` (incremental new-batch-vs-history dedup).
  *
  * Lives in this package for the same reason as ShinglesApi: the
  * function registry hangs off `sessionState`, which is private[sql].
  * No Spark source is copied — these are the shipped classes, only
  * registered under SQL names (`bloom_filter_agg`, `might_contain`)
  * that Spark itself does not expose publicly.
  */
object BloomApi {
  def ensureRegistered(spark: SparkSession): Unit = {
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    reg.createOrReplaceTempFunction("bloom_filter_agg",
      exprs => new BloomFilterAggregate(exprs(0), exprs(1), exprs(2))
        .toAggregateExpression(),
      "built-in")
    reg.createOrReplaceTempFunction("might_contain",
      exprs => BloomFilterMightContain(exprs(0), exprs(1)), "built-in")
  }
}
