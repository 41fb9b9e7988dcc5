package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters summary as a native Catalyst AGGREGATE
  * expression (`TypedImperativeAggregate`) — the mergeable-sketch
  * shape for corpus-wide top-k at 100 TB: every partition folds its
  * tokens into a bounded `capacity`-counter summary (map-side
  * partial aggregation), partials MERGE associatively (Agarwal et
  * al., "Mergeable Summaries", PODS'12: combine counts, subtract the
  * (capacity+1)-th largest, drop ≤ 0), and only `capacity`-sized
  * summaries ever cross the wire — no word-keyed shuffle of the full
  * vocabulary.
  *
  * Guarantees (spec-pinned):
  *  - estimate ∈ [true − N/(capacity+1), true] for every item
  *    (N = total stream weight);
  *  - every item with true count > N/(capacity+1) is present;
  *  - EXACT counts whenever the observed vocabulary fits `capacity`
  *    (no decrement ever fires) — which makes the declared query
  *    oracle-checkable on a small-vocabulary corpus while the spec
  *    exercises the approximation on an overflowing one.
  *
  * eval() returns the top-`k` survivors as
  * `array<struct<term string, est bigint>>` ordered by
  * (est DESC, term ASC) — deterministic given the summary. */
case class MisraGriesTopK(
    child: Expression, capacity: Int, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(capacity > 0 && k > 0 && k <= capacity)

  // declared input type: a non-string argument is rejected at
  // ANALYSIS time instead of failing update()'s UTF8String cast with
  // a ClassCastException at execution time (AbstractDataType is
  // private[sql] in Spark 4, so checkInputDataTypes stands in for
  // ExpectsInputTypes)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"mg_topk requires a STRING argument, got ${child.dataType.sql}")
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(b1: mutable.HashMap[String, Long],
      b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b2.foreach { case (t, c) => b1.update(t, b1.getOrElse(t, 0L) + c) }
    truncate(b1)
    b1
  }

  private def add(buf: mutable.HashMap[String, Long], t: String,
      w: Long): Unit = {
    buf.update(t, buf.getOrElse(t, 0L) + w)
    if (buf.size > capacity) truncate(buf)
  }

  /** Keep ≤ capacity counters: subtract the (capacity+1)-th largest
    * count from everything and drop the non-positive — the standard
    * mergeable-MG step (each subtraction is charged against N, which
    * yields the N/(capacity+1) error bound). */
  private def truncate(buf: mutable.HashMap[String, Long]): Unit = {
    if (buf.size <= capacity) return
    val sorted = buf.values.toArray.sorted
    val d = sorted(buf.size - capacity - 1)
    val dead = buf.iterator.collect { case (t, c) if c - d <= 0 => t }.toList
    dead.foreach(buf.remove)
    buf.mapValuesInPlace((_, c) => c - d)
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val top = buf.toArray.sortBy { case (t, c) => (-c, t) }.take(k)
    new GenericArrayData(top.map { case (t, c) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(t), c))
    })
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, c) =>
      val b = t.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    (0 until n).foreach { _ =>
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      buf.update(new String(b, "UTF-8"), in.readLong())
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesTopK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesTopK =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesTopK =
    copy(child = newChildren.head)
  override def prettyName: String = "mg_topk"
}

/** K-minimum-values distinct sketch (Bar-Yossef et al., RANDOM'02;
  * Beyer et al., SIGMOD'07) as a native Catalyst aggregate: keep the
  * `k` smallest DISTINCT hash values seen. The fourth portable
  * mergeable sketch (after Misra–Gries, linear-counting bitmap and
  * count-min): partials are ≤ k sorted longs, merge is
  * sorted-union-truncate (associative + commutative), so map-side
  * partial aggregation sends k·8 bytes per group per partition
  * instead of a user-keyed shuffle — the count-distinct shape that
  * holds at 100 TB where exact per-group distinct would shuffle
  * every key.
  *
  * Crucially DETERMINISTIC given a deterministic hash input (unlike
  * HLL register interactions): eval() returns the kept values sorted
  * ascending, and the estimator floor((k−1)·2^48 / kth_min) — or the
  * exact kept count when fewer than k distinct hashes exist — is
  * plain integer arithmetic, so a DuckDB oracle reproduces the
  * sketch bit-for-bit (rel_kmv_distinct) where the HLL twin
  * (x_approx_users) is rows-only. */
case class KmvKMin(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[Long]] {

  require(k > 0 && k <= 65536)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"kmv_kmin requires a BIGINT argument, got ${child.dataType.sql}")
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty[Long]

  override def update(buf: mutable.TreeSet[Long],
      input: InternalRow): mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: mutable.TreeSet[Long],
      b2: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    b2.foreach(add(b1, _))
    b1
  }

  private def add(buf: mutable.TreeSet[Long], v: Long): Unit = {
    if (buf.size < k) buf += v
    else if (v < buf.last && !buf.contains(v)) { buf += v; buf -= buf.last }
  }

  override def eval(buf: mutable.TreeSet[Long]): Any =
    new GenericArrayData(buf.toArray)

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach(out.writeLong)
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.TreeSet.empty[Long]
    (0 until n).foreach(_ => buf += in.readLong())
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvKMin =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvKMin =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvKMin =
    copy(child = newChildren.head)
  override def prettyName: String = "kmv_kmin"
}

object sketchNative {
  /** Heavy-hitters aggregate Column: `mg_topk(term, capacity, k)`. */
  def mg_topk(term: Column, capacity: Int, k: Int): Column =
    ColumnBridge.column(
      MisraGriesTopK(ColumnBridge.expression(term), capacity, k)
        .toAggregateExpression())

  /** KMV distinct-sketch aggregate Column: the k smallest distinct
    * values of a BIGINT hash column, sorted ascending. */
  def kmv_kmin(hash: Column, k: Int): Column =
    ColumnBridge.column(
      KmvKMin(ColumnBridge.expression(hash), k).toAggregateExpression())
}
