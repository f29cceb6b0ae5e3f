package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native elementwise-sum AGGREGATE over `array<double>` columns —
  * the custom-Catalyst portfolio's aggregate function (alongside the
  * scalar expressions, the Generator and the plan node).
  *
  * Why it exists: the built-ins-only way to sum vectors per group is
  * `posexplode` + `groupBy(key, dim)` — correct (it IS the oracle for
  * q26), but the shuffle carries one row PER DIMENSION per input row:
  * a 128-dim corpus shuffles 128× its row count, and the aggregation
  * runs 128 independent groups per key. This aggregate keeps the
  * vector intact: partial aggregation (map-side combine) reduces every
  * partition to ONE `Array[Double]` buffer per group before the
  * shuffle, so the exchange carries `groups × dim` doubles total —
  * the minimum possible. At 100 TB with k groups this is the
  * difference between shuffling the corpus ×dim and shuffling k
  * vectors per partition.
  *
  * Semantics (pinned by `VectorSumSpec` against the explode oracle):
  *  - NULL arrays are ignored (like `sum` over NULL scalars);
  *  - groups with no non-null input evaluate to NULL;
  *  - a NULL element or a dimension mismatch between rows raises —
  *    silent coercion would corrupt centroids (the [[DotProduct]]
  *    length-mismatch lesson, applied from the start).
  *
  * Used by [[graft.core.Similarity.labelCentroidsNative]] and the
  * k-means sufficient-statistics pass; registered in SQL as
  * `vector_sum` via `GraftExtensions` / `Tables.registerFunctions`.
  */
case class VectorSum(child: Expression,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]]
    with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vector_sum expects array<double>, got ${other.catalogString} " +
        "(cast the column: col.cast(\"array<double>\"))")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "vector_sum"

  // empty array = "no input yet" marker (a real sum of 0-dim vectors
  // is not representable in the testdata schemas and is rejected below)
  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  private def addInto(buffer: Array[Double], arr: ArrayData): Array[Double] = {
    val n = arr.numElements()
    require(n > 0, "vector_sum: empty vector")
    var i = 0
    while (i < n) {
      require(!arr.isNullAt(i), s"vector_sum: null element at dim $i")
      i += 1
    }
    if (buffer.length == 0) arr.toDoubleArray()
    else {
      require(buffer.length == n,
        s"vector_sum: dimension mismatch (${buffer.length} vs $n)")
      i = 0
      while (i < n) { buffer(i) += arr.getDouble(i); i += 1 }
      buffer
    }
  }

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) buffer
    else addInto(buffer, v.asInstanceOf[ArrayData])
  }

  override def merge(buffer: Array[Double], other: Array[Double]): Array[Double] =
    if (other.length == 0) buffer
    else if (buffer.length == 0) other
    else {
      require(buffer.length == other.length,
        s"vector_sum: dimension mismatch (${buffer.length} vs ${other.length})")
      var i = 0
      while (i < buffer.length) { buffer(i) += other(i); i += 1 }
      buffer
    }

  override def eval(buffer: Array[Double]): Any =
    if (buffer.length == 0) null else new GenericArrayData(buffer)

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buffer.length)
    bb.putInt(buffer.length)
    var i = 0
    while (i < buffer.length) { bb.putDouble(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = bb.getDouble; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSum =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): VectorSum =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): VectorSum =
    copy(child = newChild)
}
