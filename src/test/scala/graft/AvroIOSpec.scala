package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.AvroIO

/** Avro container round-trip on the raw `org.apache.avro` API (the
  * spark-avro DataSource is absent from this classpath — AvroIO is
  * the engine's Avro path): bit-exact value fidelity across the full
  * primitive lattice including nulls, one file per input partition,
  * schema self-description on re-read, and scale-shape checks (the
  * read parallelizes per file; the write streams per partition).
  */
class AvroIOSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("n32", IntegerType, nullable = true),
    StructField("d", DoubleType, nullable = true),
    StructField("f", FloatType, nullable = true),
    StructField("s", StringType, nullable = true),
    StructField("b", BooleanType, nullable = true),
    StructField("raw", BinaryType, nullable = true)))

  private val rows = Seq(
    Row(1L, 7, 3.14159, 2.5f, "alpha", true, Array[Byte](1, 2, 3)),
    Row(2L, null, null, null, null, null, null),
    // IEEE edge values must survive the byte-level round trip
    Row(3L, Int.MinValue, Double.MinPositiveValue, Float.MaxValue,
        "", false, Array.empty[Byte]),
    Row(4L, 42, -0.0, -1.5f, "unicode: héllo wörld ✓", true,
        Array[Byte](-128, 0, 127)))

  test("round-trip is value-exact across the primitive lattice") {
    val dir = Files.createTempDirectory("graft-avro").toString
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    AvroIO.write(df, dir)
    val back = AvroIO.read(spark, dir)
    // self-described schema: names, types and nullability all recovered
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      schema.fields.map(f => (f.name, f.dataType)).toSeq)
    val got = back.collect().sortBy(_.getLong(0))
    val exp = rows.sortBy(_.getLong(0))
    assert(got.length == exp.length)
    got.zip(exp).foreach { case (g, e) =>
      (0 until schema.length).foreach { i =>
        (g.get(i), e.get(i)) match {
          case (a: Array[Byte], b: Array[Byte]) => assert(a.sameElements(b))
          case (a: Double, b: Double) =>
            // -0.0 and exact subnormals: compare raw bits, not ==
            assert(java.lang.Double.doubleToRawLongBits(a) ==
                   java.lang.Double.doubleToRawLongBits(b))
          case (a, b) => assert(a == b, s"col $i: $a != $b")
        }
      }
    }
  }

  test("one container file per non-empty partition; per-file read tasks") {
    val dir = Files.createTempDirectory("graft-avro-parts").toString
    import spark.implicits._
    val df = spark.range(0, 100, 1, 5).map(i => (i, s"v$i"))
      .toDF("id", "v")
    AvroIO.write(df, dir)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".avro"))
    assert(files.length == 5)
    val back = AvroIO.read(spark, dir)
    assert(back.rdd.getNumPartitions == 5) // one task per file
    assert(back.count() == 100)
    assert(back.agg(org.apache.spark.sql.functions.sum("id")).head.getLong(0)
      == (0L until 100L).sum)
  }

  test("empty dataset round-trips to an empty DataFrame with the schema") {
    // write/read must stay symmetric for empty inputs: all-empty
    // partitions still emit one record-less container (the header
    // carries the schema) — a curation pipeline that filters a shard
    // to nothing must not produce an unreadable sink
    val dir = Files.createTempDirectory("graft-avro-empty").toString
    val empty = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq.empty[Row], 2), schema)
    AvroIO.write(empty, dir)
    val back = AvroIO.read(spark, dir)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.count() == 0)
  }

  test("partially consumed read (limit) does not wedge subsequent scans") {
    // the task-completion listener owns the stream close — a limit
    // that abandons the iterator mid-file must not leak the input
    // stream (exhaustion-only close would)
    val dir = Files.createTempDirectory("graft-avro-limit").toString
    import spark.implicits._
    AvroIO.write(spark.range(0, 1000, 1, 2).map(i => (i, s"v$i"))
      .toDF("id", "v"), dir)
    assert(AvroIO.read(spark, dir).limit(3).collect().length == 3)
    assert(AvroIO.read(spark, dir).count() == 1000)
  }

  test("overwrite replaces prior contents") {
    val dir = Files.createTempDirectory("graft-avro-ow").toString
    import spark.implicits._
    AvroIO.write(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir)
    AvroIO.write(Seq((9L, "z")).toDF("id", "v"), dir)
    val back = AvroIO.read(spark, dir).collect()
    assert(back.map(_.getLong(0)).toSeq == Seq(9L))
  }
}
