package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Catalyst-native MinHash sketch (the §2.3 `TypedImperativeAggregate`
  * surface): one aggregation buffer of k slots, updated in a single pass —
  * replacing k independent `min(...)` aggregates, whose buffers and
  * update paths Catalyst manages separately.
  *
  * The hash family is the engine's md5-derived affine family
  * (`DedupOps.minhashA/B` over a pre-reduced 60-bit hash mod M), so sketches
  * from this aggregate are bit-identical to the k-column formulation — the
  * oracle-checked minhash query runs through this operator.
  *
  * Buffer is a primitive Array[Long]: partial aggregation (map-side combine)
  * ships k longs per group, merge is elementwise min — associative,
  * commutative, and tiny, exactly what a 100 TB shuffle wants.
  */
case class MinHashSketch(child: Expression, k: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  private val M = 1000000007L
  private def a(i: Int): Long = 7919L * i + 17L
  private def b(i: Int): Long = 104729L * i + 31L

  override def createAggregationBuffer(): Array[Long] = Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < k) {
        val hi = (a(i) * h + b(i)) % M
        if (hi < buf(i)) buf(i) = hi
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * k)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong())
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "minhash_sketch"

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashSketch =
    copy(child = newChild)
}

object MinHashSketch {
  /** Aggregate Column over a pre-reduced hash column (hash60 mod M). */
  def minhash_sketch(hashed: Column, k: Int): Column =
    shim.column(MinHashSketch(shim.expression(hashed), k).toAggregateExpression())
}
