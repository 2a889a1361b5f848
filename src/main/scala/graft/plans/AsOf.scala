package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.graftnative.AsOfJoinApi

/** Public facade for the native backward as-of join
  * (`org.apache.spark.sql.graftnative.AsOfJoin*` — logical plan,
  * optimizer rule, strategy, and merge exec). See that file for the
  * scale rationale; this wrapper keeps user code out of the spark
  * package namespace.
  */
object AsOf {
  /** Backward as-of join: each left row paired with the right row
    * sharing its key that has the greatest `rightTimeCol <=
    * leftTimeCol` (ties: greatest `rightTieBreakCols`). `joinType`
    * "inner" drops unmatched left rows; "left_outer" keeps them with
    * a null-padded right side. Output columns: left's then right's
    * (pre-rename for distinct names).
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      leftOn: Seq[String],
      rightOn: Seq[String],
      leftTimeCol: String,
      rightTimeCol: String,
      rightTieBreakCols: Seq[String] = Nil,
      joinType: String = "inner"): DataFrame =
    AsOfJoinApi.join(left, right, leftOn, rightOn, leftTimeCol,
                     rightTimeCol, rightTieBreakCols, joinType)
}
