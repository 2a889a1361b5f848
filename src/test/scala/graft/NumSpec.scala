package graft

import graft.sources.Num
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The exact-decimal aggregation helpers are the foundation of every
  * oracle hash match: their results must be invariant to row order
  * and partitioning (plain double sums are not — float addition is
  * non-associative), and identical to what DuckDB's decimal engine
  * computes.
  */
class NumSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("moneySum/prodSum/moneyAvg are permutation- and partition-invariant") {
    val rng = new scala.util.Random(31337)
    val values = (0 until 20000).map(_ => rng.nextInt(2000000) / 100.0)
    def aggOf(vs: Seq[Double], parts: Int): (Double, Double, Double) = {
      val df = vs.toDF("v").repartition(parts)
      val r = df.agg(Num.moneySum(col("v")).as("s"),
                     Num.prodSum(col("v") * 0.97).as("p"),
                     Num.moneyAvg(col("v")).as("a")).head
      (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    }
    val base = aggOf(values, 4)
    assert(aggOf(rng.shuffle(values), 4) == base)
    assert(aggOf(values.reverse, 32) == base)
    assert(aggOf(rng.shuffle(values), 1) == base)
    // a plain double sum over the same permutations typically DIFFERS
    // (demonstrating why Num exists); we don't assert inequality since
    // it's not guaranteed, just document the contrast here
  }
}
