package graft.streaming

import org.apache.spark.sql.types.Decimal
import org.apache.spark.sql.vectorized.{ColumnarArray, ColumnarMap, ColumnVector}
import org.apache.spark.unsafe.types.UTF8String

/** A zero-copy SELECTION view over a vectorized column: out-row `i`
  * reads the base vector's row `sel(i)`. This is what keeps a
  * deletion-vector scan COLUMNAR — instead of degrading every row of a
  * DV'd file to `InternalRow` materialization, the surviving row
  * indexes of each parquet batch are collected once into `sel` and the
  * delegate's own vectors are served through this remap (the Iceberg
  * `ColumnVectorWithFilter` shape; Delta reaches the same plan point
  * with an `_is_row_deleted` metadata column + residual filter).
  *
  * `getStruct`/`getInterval`/`getVariant` are final upstream and read
  * through `getChild` with the TOP-LEVEL row id, so children are
  * wrapped with the SAME selection (lazily — most scans never touch
  * them). `getArray`/`getMap` delegate whole: the returned
  * ColumnarArray/Map carries its own element offsets into the base
  * child data, which needs no remapping.
  *
  * `hasNull`/`numNulls` report the BASE vector's counts — a
  * conservative over-report when the only nulls sat in deleted rows;
  * Spark treats them as hints, the per-row accessors stay
  * authoritative.
  */
final class SelectedColumnVector(base: ColumnVector, sel: Array[Int])
    extends ColumnVector(base.dataType()) {
  override def close(): Unit = base.close()
  override def closeIfFreeable(): Unit = base.closeIfFreeable()
  override def hasNull: Boolean = base.hasNull
  override def numNulls: Int = base.numNulls
  override def isNullAt(i: Int): Boolean = base.isNullAt(sel(i))
  override def getBoolean(i: Int): Boolean = base.getBoolean(sel(i))
  override def getByte(i: Int): Byte = base.getByte(sel(i))
  override def getShort(i: Int): Short = base.getShort(sel(i))
  override def getInt(i: Int): Int = base.getInt(sel(i))
  override def getLong(i: Int): Long = base.getLong(sel(i))
  override def getFloat(i: Int): Float = base.getFloat(sel(i))
  override def getDouble(i: Int): Double = base.getDouble(sel(i))
  override def getArray(i: Int): ColumnarArray = base.getArray(sel(i))
  override def getMap(i: Int): ColumnarMap = base.getMap(sel(i))
  override def getDecimal(i: Int, precision: Int, scale: Int): Decimal =
    base.getDecimal(sel(i), precision, scale)
  override def getUTF8String(i: Int): UTF8String = base.getUTF8String(sel(i))
  override def getBinary(i: Int): Array[Byte] = base.getBinary(sel(i))
  private[this] var children: Array[ColumnVector] = _
  override def getChild(ordinal: Int): ColumnVector = {
    if (children == null) children = new Array[ColumnVector](
      math.max(ordinal + 1, 4))
    else if (children.length <= ordinal)
      children = java.util.Arrays.copyOf(children, ordinal + 1)
    if (children(ordinal) == null)
      children(ordinal) = new SelectedColumnVector(base.getChild(ordinal), sel)
    children(ordinal)
  }
}
