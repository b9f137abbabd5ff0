package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters sketch as a mergeable Catalyst aggregate —
  * the 100 TB vocabulary census without a vocabulary-sized shuffle: each
  * partition keeps at most `capacity` counters, partial buffers are the
  * only thing exchanged, and the merge (Agarwal et al., "Mergeable
  * Summaries", PODS 2012) preserves the deterministic error contract:
  *
  *   est(t) ≤ true(t) ≤ est(t) + err,   err = (N − Σ est) / (capacity+1)
  *
  * and every term with true(t) > err is GUARANTEED to be retained.
  * The retained set and the estimates may vary with partitioning (any
  * Misra-Gries does); the BOUND above holds for every partitioning,
  * which is what HeavyHitterSpec pins — the same contract class as the
  * HLL/percentile sketches (q14/q52: no SQL oracle, property-gated).
  *
  * Update path: classic MG — increment a held counter, else occupy a
  * free slot, else decrement all (amortized O(1) per row). Merge path:
  * counter-wise sum, then subtract the (capacity+1)-largest count and
  * drop non-positives, restoring the size bound without breaking the
  * error accounting.
  */
case class MisraGriesAgg(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MisraGriesAgg.Buffer] {

  import MisraGriesAgg.Buffer

  override def createAggregationBuffer(): Buffer =
    new Buffer(0L, mutable.HashMap.empty[String, Long])

  override def update(b: Buffer, input: InternalRow): Buffer = {
    val v = child.eval(input)
    if (v != null) {
      val term = v.asInstanceOf[UTF8String].toString
      b.n += 1L
      b.m.get(term) match {
        case Some(c) => b.m.update(term, c + 1L)
        case None if b.m.size < capacity => b.m.update(term, 1L)
        case None =>
          // decrement-all round: every held counter gives up one unit
          val dead = mutable.ArrayBuffer.empty[String]
          b.m.foreach { case (t, c) =>
            if (c == 1L) dead += t else b.m.update(t, c - 1L)
          }
          dead.foreach(b.m.remove)
      }
    }
    b
  }

  override def merge(b: Buffer, o: Buffer): Buffer = {
    b.n += o.n
    o.m.foreach { case (t, c) => b.m.update(t, b.m.getOrElse(t, 0L) + c) }
    if (b.m.size > capacity) {
      // subtract the (capacity+1)-th largest count from everyone and
      // drop the non-positive — the mergeable-summaries shrink
      val counts = b.m.values.toArray
      java.util.Arrays.sort(counts)
      val sub = counts(counts.length - (capacity + 1))
      val dead = mutable.ArrayBuffer.empty[String]
      b.m.foreach { case (t, c) =>
        if (c - sub <= 0L) dead += t else b.m.update(t, c - sub)
      }
      dead.foreach(b.m.remove)
    }
    b
  }

  override def eval(b: Buffer): Any = {
    val retained = b.m.toArray.sortBy { case (t, c) => (-c, t) }
    val err = (b.n - retained.iterator.map(_._2).sum) / (capacity + 1L)
    val items = new GenericArrayData(retained.map { case (t, c) =>
      InternalRow(UTF8String.fromString(t), c)
    })
    InternalRow(b.n, err, items)
  }

  override def serialize(b: Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(b.n)
    out.writeInt(b.m.size)
    b.m.foreach { case (t, c) => out.writeUTF(t); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readLong()
    val sz = in.readInt()
    val m = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < sz) { m.update(in.readUTF(), in.readLong()); i += 1 }
    new Buffer(n, m)
  }

  override def dataType: DataType = MisraGriesAgg.OutType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_heavy_hitters"

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): MisraGriesAgg = copy(child = c.head)
}

object MisraGriesAgg {
  final class Buffer(var n: Long, val m: mutable.HashMap[String, Long])

  val OutType: StructType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("err", LongType, nullable = false),
    StructField("items", ArrayType(StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("est", LongType, nullable = false))), containsNull = false),
      nullable = false)))
}
