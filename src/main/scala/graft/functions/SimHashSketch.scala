package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types.{DataType, LongType}

/** Catalyst-native SimHash accumulator: one pass over 60-bit token hashes,
  * maintaining the 60 per-bit counters in a single primitive buffer and
  * emitting the folded signature directly — replacing 60 separate
  * sum-aggregates plus a 60-term reassembly projection.
  *
  * Bit j of the result is set when more input hashes had bit j set than not
  * (ties -> 0), identical to the column formulation in
  * `DedupOps.simhashSignaturesCols`.
  */
case class SimHashSketch(child: Expression,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Int]] with UnaryLike[Expression] {

  private val Bits = 60

  override def createAggregationBuffer(): Array[Int] = new Array[Int](Bits)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var j = 0
      while (j < Bits) {
        if (((h >>> j) & 1L) == 1L) buf(j) += 1 else buf(j) -= 1
        j += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Int], b2: Array[Int]): Array[Int] = {
    var j = 0
    while (j < Bits) { b1(j) += b2(j); j += 1 }
    b1
  }

  override def eval(buf: Array[Int]): Any = {
    var sig = 0L
    var j = 0
    while (j < Bits) { if (buf(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 * Bits)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(Bits)(bb.getInt())
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "simhash_sketch"

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SimHashSketch =
    copy(child = newChild)
}

object SimHashSketch {
  /** Aggregate Column over 60-bit token hashes (TextOps.hash60). */
  def simhash_sketch(hashed: Column): Column =
    shim.column(SimHashSketch(shim.expression(hashed)).toAggregateExpression())
}
