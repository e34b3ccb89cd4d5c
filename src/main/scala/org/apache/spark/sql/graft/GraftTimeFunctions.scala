// Lives in the org.apache.spark.sql package tree like the other native
// kernels (see GraftBucketFunction).
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** The V2 `days(ts)` / `hours(ts)` functions — the FunctionCatalog half
  * of storage-partitioned joins over time-partitioned graft tables,
  * composing with [[GraftBucketFunction]] for the composite
  * `days(ts), bucket(n, id)` fact-table layout.
  *
  * The value is the WRITE side's exact tz-free integer arithmetic
  * ([[graft.medallion.PartitionSpec.column]]): `days` over TIMESTAMP is
  * `floorDiv(epoch MICROS, 86_400_000_000)` (Spark timestamps carry
  * micros internally), over DATE the raw epoch-day count; `hours` is
  * `floorDiv(epoch micros, 3_600_000_000)`. (`months` is
  * deliberately NOT offered: its write-side `year()/month()` arithmetic
  * is session-timezone-dependent, which a timezone-blind V2 scalar
  * function cannot replay faithfully.) Join-side compatibility is by
  * `canonicalName` — a `days(DATE)` table and a `days(TIMESTAMP)` table
  * bind different canonical functions and correctly fall back to a
  * shuffled join. */
private[graft] sealed abstract class GraftTimeFunction(
    fnName: String, unitMicros: Long) extends UnboundFunction {

  override def name(): String = fnName

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 1,
      s"$fnName(ts) takes 1 argument, got ${inputType.simpleString}")
    inputType.fields(0).dataType match {
      case TimestampType => new Bound(TimestampType)
      case DateType if fnName == "days" => new Bound(DateType)
      case other => throw new UnsupportedOperationException(
        s"$fnName: unsupported argument type ${other.simpleString}")
    }
  }

  private final class Bound(argType: DataType) extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] = Array(argType)
    override def resultType(): DataType = IntegerType
    override def name(): String = fnName
    override def canonicalName(): String =
      s"graft.$fnName(${argType.simpleString})"
    override def isResultNullable: Boolean = true

    override def produceResult(input: InternalRow): Integer = {
      if (input.isNullAt(0)) return null
      argType match {
        case DateType => Int.box(input.getInt(0)) // already epoch days
        case _ => // TimestampType carries epoch MICROS
          // toIntExact, not toInt: the write side computes this value
          // in the long domain, so a silent Int wrap here (epoch-hour
          // > 2^31, year ~246k+) would group a scan tuple under the
          // WRONG key — fail loudly instead of mis-joining
          Int.box(Math.toIntExact(Math.floorDiv(input.getLong(0), unitMicros)))
      }
    }
  }
}

object GraftDaysFunction extends GraftTimeFunction("days", 86_400_000_000L) {
  override def description(): String =
    "days(ts) - tz-free epoch-day number of a timestamp/date"
}

object GraftHoursFunction extends GraftTimeFunction("hours", 3_600_000_000L) {
  override def description(): String =
    "hours(ts) - tz-free epoch-hour number of a timestamp"
}
