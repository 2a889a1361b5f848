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
  /** As-of join: each left row paired with the single right row
    * sharing its key that is nearest in time on the chosen side —
    * `direction` "backward" (default): greatest `rightTimeCol <=
    * leftTimeCol`, ties to the greatest `rightTieBreakCols`;
    * "forward": smallest `rightTimeCol >= leftTimeCol`, ties to the
    * smallest tie-break; "nearest": the closer of the two, ties to
    * backward (requires timestamp/long time columns).
    * `joinType` "inner" drops unmatched left
    * rows; "left_outer" keeps them with a null-padded right side.
    * `toleranceMicros >= 0` additionally bounds the time gap (time
    * columns must be timestamp- or long-typed).
    * Output columns: left's then right's (pre-rename for distinct
    * names).
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      leftOn: Seq[String],
      rightOn: Seq[String],
      leftTimeCol: String,
      rightTimeCol: String,
      rightTieBreakCols: Seq[String] = Nil,
      joinType: String = "inner",
      direction: String = "backward",
      toleranceMicros: Long = -1L): DataFrame =
    AsOfJoinApi.join(left, right, leftOn, rightOn, leftTimeCol,
                     rightTimeCol, rightTieBreakCols, joinType, direction,
                     toleranceMicros)
}
