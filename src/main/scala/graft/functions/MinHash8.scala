// Lives in an org.apache.spark.sql subpackage to reach private[sql]
// extension surfaces — the established pattern for this repo's native
// expressions (see CosineSimilarity, SimHash16, CdcChunkHashes).
package org.apache.spark.sql.graftnative

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}

/** Native 8-permutation MinHash over a shingle array — the minhash
  * family's kernel (d2/d3/d9/d16/d21/wb7 and the streaming near-dup
  * index all band on these values).
  *
  * Semantics are EXACTLY the composed HOF form it replaces (and the
  * DuckDB oracle still replays): per shingle x, the base hash is
  * `cast(conv(substring(md5(x), 1, 8), 16, 10) as bigint)` — the
  * digest's top four bytes read as an unsigned 32-bit value — and
  * mh[j] = `array_min(transform(hs, h -> h ^ seed_j))`. array_min
  * SKIPS null elements and returns NULL on an empty (or all-null)
  * array, so a null shingle contributes to no permutation and an
  * empty input yields eight NULL entries — both mirrored here.
  *
  * Why native (r14, the d4/SimHash16 lesson): the composed form paid
  * one interpreted transform building the 32-bit hash array (md5 hex
  * string + conv parse + substring allocation per shingle) plus EIGHT
  * more interpreted transform+array_min passes per document (one per
  * permutation, each allocating a fresh array). This kernel is one
  * generated call per document: one digest per shingle, eight running
  * minima, zero intermediate arrays — and the stage stays inside
  * whole-stage codegen.
  *
  * Seeds are compile-time constants (Dedup.seedConsts), passed as a
  * constructor argument like MaxSim's tokDim.
  */
case class MinHash8(child: Expression, seeds: Seq[Long])
    extends UnaryExpression with ExpectsInputTypes {
  require(seeds.length == 8, s"MinHash8 wants 8 seeds, got ${seeds.length}")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash8"

  @transient private lazy val seedArr: Array[Long] = seeds.toArray

  override def nullSafeEval(a: Any): Any =
    MinHashOps.minhash8(a.asInstanceOf[ArrayData], seedArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedsRef = ctx.addReferenceObj("mh8seeds", seedArr, "long[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graftnative.MinHashOps" +
        s".minhash8($a, $seedsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Shared kernel: ONE implementation feeds both the interpreted eval
  * and the generated code, so the two paths cannot drift.
  */
object MinHashOps {
  def minhash8(sh: ArrayData, seeds: Array[Long]): ArrayData = {
    val n = sh.numElements()
    val mins = new Array[Long](8)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var any = false
    var i = 0
    val md = MessageDigest.getInstance("MD5")
    while (i < n) {
      // array_min skips NULL elements (an all-null/empty array is the
      // NULL-entries case below)
      if (!sh.isNullAt(i)) {
        any = true
        md.update(sh.getUTF8String(i).getBytes)
        val d = md.digest() // digest() resets the instance
        val h = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
                ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
        var j = 0
        while (j < 8) {
          val v = h ^ seeds(j)
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (!any) new GenericArrayData(Array.fill[Any](8)(null))
    else new GenericArrayData(mins)
  }
}
