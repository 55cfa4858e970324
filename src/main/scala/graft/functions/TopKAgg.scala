package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: keeps the k best `(score, id)` pairs per group
  * under the total order (score DESC, id ASC), as a
  * [[TypedImperativeAggregate]] so the bound applies in the PARTIAL
  * (map-side) aggregation too. This is the scale shape for "top-k per
  * query" ranking: a `row_number() OVER (PARTITION BY qid)` window funnels
  * every scored row into |queries| reducer partitions — at a production
  * corpus size the exchange carries the corpus; with this aggregate each
  * map task ships at most k rows per group, so the exchange carries
  * O(k × partitions × groups) regardless of corpus size.
  *
  * Ties are broken by id ascending (the same total order the window
  * formulation used — required for cross-engine deterministic compares).
  * Output: `array<struct<id, score>>`, best first; the caller derives
  * ranks positionally (`posexplode`).
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[
      scala.collection.mutable.PriorityQueue[(Double, Long)]] {

  require(k >= 1, s"top-k bound must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "top_k_by_score"

  /** Head of the queue = the WORST retained pair (lowest score, then
    * highest id), so a full buffer evicts in O(log k).
    */
  private val worstFirst: Ordering[(Double, Long)] =
    new Ordering[(Double, Long)] {
      override def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val c = java.lang.Double.compare(b._1, a._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    }

  override def createAggregationBuffer()
      : scala.collection.mutable.PriorityQueue[(Double, Long)] =
    scala.collection.mutable.PriorityQueue.empty[(Double, Long)](worstFirst)

  private def insert(
      buf: scala.collection.mutable.PriorityQueue[(Double, Long)],
      pair: (Double, Long)): Unit = {
    if (buf.size < k) buf.enqueue(pair)
    else if (worstFirst.compare(pair, buf.head) < 0) {
      // strictly better than the current worst: evict and keep
      buf.dequeue()
      buf.enqueue(pair)
    }
  }

  override def update(
      buf: scala.collection.mutable.PriorityQueue[(Double, Long)],
      input: InternalRow)
      : scala.collection.mutable.PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      insert(buf, (s.asInstanceOf[Double], i.asInstanceOf[Long]))
    buf
  }

  override def merge(
      buf: scala.collection.mutable.PriorityQueue[(Double, Long)],
      other: scala.collection.mutable.PriorityQueue[(Double, Long)])
      : scala.collection.mutable.PriorityQueue[(Double, Long)] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(
      buf: scala.collection.mutable.PriorityQueue[(Double, Long)]): Any = {
    // ascending under worstFirst = best first (greater = worse)
    val best = buf.toArray.sorted(worstFirst)
    new GenericArrayData(best.map { case (s, i) =>
      new GenericInternalRow(Array[Any](i, s))
    }.toArray[Any])
  }

  override def serialize(
      buf: scala.collection.mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(
      bytes: Array[Byte]): scala.collection.mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var j = 0
    while (j < n) { buf.enqueue((in.readDouble(), in.readLong())); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKByScore {
  /** `top_k_by_score(score, id, k)` as a DataFrame aggregate column.
    * `score` must be DOUBLE and `id` BIGINT (cast at the call site — the
    * buffer is a primitive (Double, Long) heap by design).
    */
  def topK(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopKByScore(ColumnBridge.expression(score),
        ColumnBridge.expression(id), k).toAggregateExpression())
}
