package graft

import graft.functions.VectorFunctions
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftnative.Md5PrefixLong
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** The native md5_prefix kernel must be bit-identical to the composed
  * `cast(conv(substring(md5(x), 1, n), 16, 10) as bigint)` chain it
  * replaced — that equivalence is what keeps the d5/d8/d11/d16 oracles
  * (which replay the composed SQL) valid.
  */
class Md5PrefixSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def composed(n: Int) =
    expr(s"cast(conv(substring(md5(s), 1, $n), 16, 10) as bigint)")

  test("kernel == composed chain on real corpus tokens, widths 1/8/12/15") {
    val toks = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(explode(split(trim(col("text")), "\\s+")).as("s"))
    val df = Seq(1, 8, 12, 15).foldLeft(toks) { (d, n) =>
      d.withColumn(s"native_$n", VectorFunctions.md5Prefix(col("s"), n))
        .withColumn(s"chain_$n", composed(n))
    }
    assert(df.count() > 0)
    Seq(1, 8, 12, 15).foreach { n =>
      assert(df.filter(col(s"native_$n") =!= col(s"chain_$n")).count() == 0,
             s"width $n diverged")
    }
  }

  test("interpreted path matches codegen; unicode and empty string") {
    val samples = Seq("", "a", "hello world", "héllo wörld 你好", "x" * 500)
    import spark.implicits._
    val viaPlan = samples.toDF("s")
      .withColumn("native", VectorFunctions.md5Prefix(col("s"), 15))
      .withColumn("chain", composed(15))
      .collect()
    viaPlan.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"plan mismatch on '${r.get(0)}'")
      val interp = Md5PrefixLong(
        Literal(UTF8String.fromString(r.getString(0)), StringType), 15)
        .eval(InternalRow.empty)
      assert(interp == r.getLong(1), s"interp mismatch on '${r.get(0)}'")
    }
  }

  test("null propagates; value is always non-negative at width 15") {
    assert(Md5PrefixLong(Literal(null, StringType), 15)
      .eval(InternalRow.empty) == null)
    val toks = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(explode(split(trim(col("text")), "\\s+")).as("s"))
      .withColumn("v", VectorFunctions.md5Prefix(col("s"), 15))
    assert(toks.filter(col("v") < 0).count() == 0)
  }
}
