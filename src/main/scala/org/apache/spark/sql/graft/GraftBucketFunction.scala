// Lives in the org.apache.spark.sql package tree like the other native
// kernels (XXH64 is a catalyst-internal helper).
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** The V2 `bucket(n, key)` function — the FunctionCatalog half of
  * storage-partitioned joins over `bucket(n, col)` hidden partitioning:
  * Spark resolves the scan-reported `KeyGroupedPartitioning`'s bucket
  * transform through the owning catalog's function registry, and two
  * scans whose clustering binds to the SAME canonical function can
  * co-locate their partitions by key — a join between two graft tables
  * bucketed on the join key then plans with ZERO shuffle exchanges.
  *
  * The value is the WRITE side's exact arithmetic
  * ([[graft.medallion.PartitionSpec.column]]: `pmod(xxhash64(c), n)`,
  * seed 42) over the hash-replayable key types (int/long/string) — the
  * same bytes-per-type convention [[graft.medallion.TxLog.bloomHashes]]
  * replays on the pruning side, so the reported partition keys agree
  * with the per-file transform stats the files were written under. */
object GraftBucketFunction extends UnboundFunction {

  override def name(): String = "bucket"

  override def description(): String =
    "bucket(n, key) - the write-side xxhash64 bucket of a key"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket(n, key) takes 2 arguments, got ${inputType.simpleString}")
    require(inputType.fields(0).dataType == IntegerType,
      s"bucket: n must be INT, got ${inputType.fields(0).dataType.simpleString}")
    inputType.fields(1).dataType match {
      case kt @ (IntegerType | LongType | StringType) => new Bound(kt)
      case other => throw new UnsupportedOperationException(
        s"bucket: unsupported key type ${other.simpleString} — " +
          "int/long/string (the hash-replayable set)")
    }
  }

  private final class Bound(keyType: DataType)
      extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] = Array(IntegerType, keyType)
    override def resultType(): DataType = IntegerType
    override def name(): String = "bucket"
    // both join sides must bind to the SAME canonical function for the
    // partitionings to be compatible — keyed by input type
    override def canonicalName(): String =
      s"graft.bucket(int, ${keyType.simpleString})"
    override def isResultNullable: Boolean = true

    override def produceResult(input: InternalRow): Integer = {
      if (input.isNullAt(0) || input.isNullAt(1)) return null
      val n = input.getInt(0)
      if (n <= 0) return null
      val h = keyType match {
        case IntegerType => XXH64.hashInt(input.getInt(1), 42L)
        case LongType => XXH64.hashLong(input.getLong(1), 42L)
        case _ =>
          val s = input.getUTF8String(1)
          XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      }
      Int.box((((h % n) + n) % n).toInt)
    }
  }
}
