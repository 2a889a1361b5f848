package graft

import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native codegen'd MaxSim must be bit-identical to the
  * composable nested-HOF form it replaced in n13 (same left-to-right
  * dot fold, same candidate-token-order max, same qi-ordered sum) —
  * that equivalence is what keeps n13's DuckDB oracle valid.
  */
class MaxSimSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def pairs() = {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.select(col("vec_id").as("qid"), col("embedding").as("qe")).filter(col("qid") < 20)
    val c = e.select(col("vec_id").as("cid"), col("embedding").as("ce")).filter(col("cid") < 50)
    q.crossJoin(c)
  }

  // n13's original nested-HOF MaxSim (8 tokens x 8 dims over the 64-d
  // embedding), kept verbatim as the executable spec of the semantics
  private val hofMaxSim = expr(
    """aggregate(sequence(0, 7), cast(0.0 as double), (acc, qi) ->
      |  acc + array_max(transform(sequence(0, 7), di ->
      |    aggregate(zip_with(slice(qe, qi * 8 + 1, 8),
      |                       slice(ce, di * 8 + 1, 8),
      |                       (x, y) -> cast(x as double) * cast(y as double)),
      |              cast(0.0 as double), (a2, x) -> a2 + x))))""".stripMargin)

  test("native expression == nested-HOF fold, bit-exact over 1000 pairs") {
    val df = pairs()
      .withColumn("native", VectorFunctions.maxSim(col("qe"), col("ce"), 8))
      .withColumn("hof", hofMaxSim)
    val bad = df.filter(col("native") =!= col("hof")).count()
    assert(bad == 0)
    assert(df.count() == 1000)
  }

  test("token geometry: tokDim equal to full length degenerates to a single dot") {
    import spark.implicits._
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b")
      .withColumn("m", VectorFunctions.maxSim(col("a"), col("b"), 3))
    assert(df.select("m").head().getDouble(0) == 32.0)
  }

  test("empty candidate side yields 0.0; trailing partial tokens are ignored") {
    import spark.implicits._
    val df = Seq(
      (Seq(1.0f, 2.0f), Seq.empty[Float]),
      // 3 elements at tokDim=2 -> one candidate token [10, 20]
      (Seq(1.0f, 1.0f), Seq(10.0f, 20.0f, 99.0f))
    ).toDF("a", "b")
      .withColumn("m", VectorFunctions.maxSim(col("a"), col("b"), 2))
    val got = df.select("m").collect().map(_.getDouble(0))
    assert(got(0) == 0.0)
    assert(got(1) == 30.0)
  }
}
