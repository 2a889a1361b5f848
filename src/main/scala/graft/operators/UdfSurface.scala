package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.sources.Tables._

/** User-extensibility exemplars (SURVEY.md §2.9/§2.12): scalar UDF,
  * typed Aggregator (UDAF), and the transformer flatMap is the UDTF
  * exemplar (graft.pipeline). Built-ins always win in the hot path —
  * these exist to prove the surface, and each computes in exact
  * integer/long space so the oracle can replay it.
  */
object UdfSurface {
  type Q = (SparkSession, String) => DataFrame

  /** Scalar UDF: Knuth multiplicative bucket of a key. A UDF on
    * purpose (the exemplar); the same expression is a one-liner with
    * built-ins, which is how the rest of this codebase does it.
    *
    * The key is reduced mod 2^31 BEFORE the multiply: the raw product
    * would exceed int64 for keys ≥ ~3.5e9, where JVM arithmetic wraps
    * silently but DuckDB (and most SQL engines) raise — wrap-dependent
    * arithmetic is not portable across engines, so the shared-dialect
    * contract requires staying in-range (flushed out by the sf1 gate
    * run, where replicated order keys reach ~9e9).
    */
  val u1ScalarUdf: Q = (s, d) => {
    val bucket = udf((k: Long) =>
      (((k % 2147483648L) * 2654435761L) % 1024 + 1024) % 1024)
    orders(s, d)
      .withColumn("bucket", bucket(col("o_orderkey")) % 8)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"))
  }

  /** Typed Aggregator: weighted average price per unit quantity, with
    * long-cents accumulation (order-independent exact arithmetic).
    */
  case class LineW(l_extendedprice: Double, l_quantity: Double, l_returnflag: String)
  case class WBuf(cents: Long, qty: Long)

  object WeightedAvg extends Aggregator[LineW, WBuf, Double] {
    override def zero: WBuf = WBuf(0L, 0L)
    override def reduce(b: WBuf, r: LineW): WBuf =
      WBuf(b.cents + math.round(r.l_extendedprice * 100), b.qty + math.round(r.l_quantity))
    override def merge(a: WBuf, b: WBuf): WBuf = WBuf(a.cents + b.cents, a.qty + b.qty)
    override def finish(b: WBuf): Double =
      if (b.qty == 0) 0.0 else math.floor(b.cents.toDouble / b.qty) / 100.0
    override def bufferEncoder: Encoder[WBuf] = Encoders.product[WBuf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  val u2TypedAgg: Q = (s, d) => {
    import s.implicits._
    lineitem(s, d)
      .select(col("l_extendedprice"), col("l_quantity"), col("l_returnflag"))
      .as[LineW]
      .groupByKey(_.l_returnflag)
      .agg(WeightedAvg.toColumn.name("wavg_price_per_qty"))
      .toDF("l_returnflag", "wavg_price_per_qty")
  }

  val queries: Map[String, Q] = Map(
    "u1_scalar_udf" -> u1ScalarUdf,
    "u2_typed_agg" -> u2TypedAgg,
  )

  val oracles: Map[String, String] = Map(
    "u1_scalar_udf" ->
      """SELECT ((o_orderkey % 2147483648) * 2654435761) % 1024 % 8 AS bucket,
        |       count(1) AS n
        |FROM orders GROUP BY 1""".stripMargin,
    "u2_typed_agg" ->
      """SELECT l_returnflag,
        | floor(sum(round(l_extendedprice * 100)) / sum(round(l_quantity))) / 100.0
        |   AS wavg_price_per_qty
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
  )
}
