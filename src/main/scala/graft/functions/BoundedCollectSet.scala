package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType}

/** `collect_set` with a hard per-group cardinality cap: the buffer stops
  * growing once it holds `cap` distinct values, so a high-cardinality column
  * (ids, free text) can never flood executor memory or the driver row.
  *
  * The use case (CleanData.factorWrangler's category discovery,
  * `/root/reference/src/tasks.py:160–208`) only needs the EXACT distinct set
  * when that set is small enough to become a categorical; beyond the cap it
  * only needs to know "too many". Capping preserves exactly that contract:
  *
  *  - true distinct ≤ cap−1 → no partial buffer ever saturates, merge is an
  *    exact set-union → result is the exact distinct set;
  *  - true distinct ≥ cap  → some merge step necessarily reaches `cap`
  *    elements (every buffered value is a real distinct value, and the
  *    incremental union grows until the cap halts it) → result length == cap,
  *    which callers read as the overflow signal.
  *
  * One aggregate job therefore answers BOTH questions the previous
  * two-job shape (`approx_count_distinct` pre-gate, then `collect_set`)
  * needed — and the decision is exact, not a 5%-error estimate.
  *
  * Nulls are skipped like `collect_set`. Serialization mirrors the public
  * `Collect` aggregate: the buffer round-trips as a single-column UnsafeRow
  * holding an array of the child type.
  */
case class BoundedCollectSet(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashSet[Any]] with UnaryLike[Expression] {

  require(cap > 0, s"cap must be positive, got $cap")

  override def prettyName: String = "bounded_collect_set"
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean  = false

  override def createAggregationBuffer(): mutable.HashSet[Any] = mutable.HashSet.empty

  override def update(buffer: mutable.HashSet[Any], input: InternalRow): mutable.HashSet[Any] = {
    val v = child.eval(input)
    // values are copied out of the (reused) input row before buffering
    if (v != null && buffer.size < cap) buffer += InternalRow.copyValue(v)
    buffer
  }

  override def merge(
      buffer: mutable.HashSet[Any],
      other: mutable.HashSet[Any]): mutable.HashSet[Any] = {
    val it = other.iterator
    while (it.hasNext && buffer.size < cap) buffer += it.next()
    buffer
  }

  override def eval(buffer: mutable.HashSet[Any]): Any =
    new GenericArrayData(buffer.toArray)

  private lazy val projection =
    UnsafeProjection.create(Array[DataType](ArrayType(child.dataType, containsNull = false)))

  override def serialize(buffer: mutable.HashSet[Any]): Array[Byte] =
    projection.apply(InternalRow(new GenericArrayData(buffer.toArray))).getBytes

  override def deserialize(bytes: Array[Byte]): mutable.HashSet[Any] = {
    val buffer = createAggregationBuffer()
    val row    = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    row.getArray(0).foreach(child.dataType, (_, v: Any) => buffer += InternalRow.copyValue(v))
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedCollectSet =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedCollectSet =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedCollectSet =
    copy(child = newChild)
}

object BoundedCollectSet {
  /** Column wrapper: `bounded_collect_set(c, cap)`. Result length == `cap`
    * signals "more than cap−1 distinct values" (overflow); shorter results
    * are the exact distinct set.
    */
  def apply(c: Column, cap: Int): Column =
    GraftSqlBridge.column(
      new BoundedCollectSet(GraftSqlBridge.expression(c), cap).toAggregateExpression())
}
