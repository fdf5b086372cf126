package graft.expressions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** GROUP-level MinHash signature as a custom AGGREGATE function (the
  * builder-brief extension axis the scalar expressions don't cover:
  * `TypedImperativeAggregate`).
  *
  * Input: per-row arrays of shingle hashes (the `hs` column the per-doc
  * pipeline already computes). The buffer is the running element-wise
  * minimum of the k affine permutations over EVERY hash seen in the group —
  * so the result is the MinHash signature of the UNION of the group's
  * shingle sets. That is the defining property that makes this a
  * sketch: signatures of partitions merge by element-wise min into the
  * signature of the whole, which is exactly how a 1000-executor job
  * computes a corpus-level (or per-source) signature with a fixed-size,
  * mergeable buffer — no shuffle of shingle sets.
  *
  * Null rows/elements are skipped; a group with no hashes yields null
  * (matching `min` aggregate semantics per signature).
  */
case class MinHashAgg(
    child: Expression, aCoeffs: Seq[Long], bCoeffs: Seq[Long], prime: Long,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {
  require(aCoeffs.length == bCoeffs.length && aCoeffs.nonEmpty)

  private val k = aCoeffs.length

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_agg"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> input, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): Array[Long] = Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val h = arr.getLong(i)
          var j = 0
          while (j < k) {
            val p = (aCoeffs(j) * h + bCoeffs(j)) % prime
            if (p < buf(j)) buf(j) = p
            j += 1
          }
        }
        i += 1
      }
    }
    buf
  }

  /** Element-wise min — the merge that makes partition signatures compose
    * into the group signature. */
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < k) { if (b(j) < a(j)) a(j) = b(j); j += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any =
    if (buf.forall(_ == Long.MaxValue)) null else new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * k)
    buf.foreach(bb.putLong)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(n: Int): MinHashAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): MinHashAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MinHashAgg {
  /** Column-API surface: aggregate a shingle-hash array column into the
    * group's k-element MinHash signature. */
  def apply(hashes: Column, aCoeffs: Seq[Long], bCoeffs: Seq[Long], prime: Long): Column =
    Bridge.column(
      MinHashAgg(Bridge.expression(hashes), aCoeffs, bCoeffs, prime)
        .toAggregateExpression())
}
