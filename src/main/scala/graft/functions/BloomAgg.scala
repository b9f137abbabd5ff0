package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BinaryType, DataType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Bloom filter over a string column as a mergeable Catalyst aggregate
  * — the per-file POINT-LOOKUP index commit-time stats collection
  * builds for declared high-cardinality columns
  * (`graft.bloom.columns`; [[graft.sinks.ManifestTable]]). Wraps
  * Spark's own `org.apache.spark.util.sketch.BloomFilter` (the
  * runtime-filter sketch), so the bit layout, hashing and merge are
  * the engine's production ones; values are inserted as their CANONICAL
  * STRING rendering (`cast(col AS STRING)`), and the pruning side
  * ([[graft.sinks.ManifestTable.readWhere]]) tests literals rendered
  * the same way — one encoding on both sides, no type drift.
  *
  * Mergeability is the scale property: each task inserts its partition's
  * values into a partial filter, only the fixed-size bit arrays shuffle
  * (never values), and `mightContain` on the merged filter has NO false
  * negatives — a "definitely absent" verdict is a sound file prune,
  * exactly the one-sided contract data skipping requires. False
  * positives only cost a wasted read (bounded by `fpp`).
  */
case class BloomAgg(
    child: Expression,
    expectedItems: Long,
    fpp: Double,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] {

  require(expectedItems > 0 && fpp > 0 && fpp < 1,
    s"bad bloom parameters: items=$expectedItems fpp=$fpp")

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(b: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) b.putString(v.asInstanceOf[UTF8String].toString): Unit
    b
  }

  override def merge(b: BloomFilter, o: BloomFilter): BloomFilter = {
    b.mergeInPlace(o): Unit
    b
  }

  override def eval(b: BloomFilter): Any = serialize(b)

  override def serialize(b: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    b.writeTo(bos)
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_bloom"

  override def withNewMutableAggBufferOffset(o: Int): BloomAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomAgg =
    copy(child = newChildren.head)
}

object BloomAgg {

  /** `mightContain` on a serialized filter — the pruning-side test. */
  def mightContain(serialized: Array[Byte], value: String): Boolean =
    BloomFilter.readFrom(new ByteArrayInputStream(serialized))
      .mightContainString(value)
}
