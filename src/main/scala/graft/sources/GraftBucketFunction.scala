package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, Reducer, ReducibleFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** The catalog identity of the `bucket(N, col)` partition transform —
  * what lets Spark's storage-partitioned join (SPARK-37375) recognize two
  * bucket-partitioned mergetree tables as co-partitioned. Resolution path:
  * the scan reports `KeyGroupedPartitioning(bucket(N, col))`, Spark's
  * V2ScanPartitioningAndOrdering looks up a function literally named
  * "bucket" in the relation's FunctionCatalog ([[GraftCatalog]]) and binds
  * it; two sides whose bound functions share `canonicalName()` (and N)
  * then join exchange-free — the Iceberg bucket-SPJ pattern.
  *
  * DEFINITION (must equal ColumnarMergeTree.bucketValueColumn, the write
  * side): bucket(n, x) = pmod(xxhash64(x), n) with xxhash64 = Spark's
  * public builtin at its fixed seed 42; bucket(NULL) = NULL. The write
  * side evaluates the builtin; this class evaluates the SAME interpreted
  * function (XxHash64Function.hash), so the stored partition tags and the
  * function's results cannot drift.
  */
object GraftBucketFunction extends UnboundFunction {

  /** Column types the transform accepts — the integral + string family
    * whose canonical string form round-trips the stored partition tag
    * exactly (the set-index eligibility rule, minus Boolean which no one
    * buckets).
    */
  private[sources] def eligible(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | StringType => true
    case _                                                          => false
  }

  /** Bucket of a driver-side JVM value (a pushed filter literal) — the
    * same arithmetic as [[GraftBucketBound.produceResult]], over the
    * external representation. None when the value's runtime type doesn't
    * carry the column's type exactly (never guess-truncate a literal).
    */
  private[sources] def bucketIdOfValue(n: Int, dt: DataType, v: Any): Option[Int] = {
    val cat: Any = (dt, v) match {
      case (StringType, s: String)             => org.apache.spark.unsafe.types.UTF8String.fromString(s)
      case (LongType, x: java.lang.Long)       => x.longValue()
      case (IntegerType, x: java.lang.Integer) => x.intValue()
      case (ShortType, x: java.lang.Short)     => x.shortValue()
      case (ByteType, x: java.lang.Byte)       => x.byteValue()
      case _                                   => return None
    }
    val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
      .hash(cat, dt, 42L)
    Some(java.lang.Math.floorMod(h, n.toLong).toInt)
  }

  override def name(): String = "bucket"

  override def description(): String =
    "bucket(n, col): pmod(xxhash64(col), n), NULL-preserving — the " +
      "mergetree PARTITION BY bucket transform"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length == 2,
      s"bucket takes (numBuckets, column), got ${inputType.length} args")
    require(inputType(0).dataType == IntegerType,
      s"bucket's first argument is the integer bucket count, got " +
        s"${inputType(0).dataType}")
    val dt = inputType(1).dataType
    if (!eligible(dt)) throw new UnsupportedOperationException(
      s"bucket does not support column type $dt (integral or string only)")
    new GraftBucketBound(dt)
  }
}

class GraftBucketBound(dt: DataType) extends ScalarFunction[Integer]
    with ReducibleFunction[Integer, Integer] {

  /** Bucket-count MISMATCH compatibility (Spark's
    * `v2.bucketing.allowCompatibleTransforms` path): bucket(kn, x) reduces
    * to bucket(n, x) exactly — pmod(h, kn) mod n == pmod(h, n) whenever
    * n divides kn — so a bucket(32) table joins a bucket(16) table
    * exchange-free, the finer side folding each of its groups into the
    * coarser grid. Only the FINER side returns a reducer (the coarser
    * side has nothing to fold); any other pairing is incompatible.
    */
  override def reducer(thisNumBuckets: Int,
      otherFunction: ReducibleFunction[_, _],
      otherNumBuckets: Int): Reducer[Integer, Integer] =
    otherFunction match {
      case _: GraftBucketBound if otherNumBuckets > 0 &&
          otherNumBuckets < thisNumBuckets &&
          thisNumBuckets % otherNumBuckets == 0 =>
        new GraftBucketReducer(otherNumBuckets)
      case _ => null
    }

  override def inputTypes(): Array[DataType] = Array(IntegerType, dt)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"

  /** The SPJ identity: KeyGroupedShuffleSpec matches two transform
    * expressions by canonicalName + numBuckets, nothing else. One stable
    * name ⇒ any two graft bucket-partitioned tables with the same N are
    * co-partitioned.
    */
  override def canonicalName(): String = "graft.bucket"

  override def isResultNullable: Boolean = true

  override def produceResult(input: InternalRow): Integer = {
    if (input.isNullAt(1)) return null
    val v: Any = dt match {
      case StringType => input.getUTF8String(1)
      case LongType   => input.getLong(1)
      case IntegerType => input.getInt(1)
      case ShortType  => input.getShort(1)
      case ByteType   => input.getByte(1)
      case _          => throw new IllegalStateException(s"unbindable $dt")
    }
    // The builtin's own interpreted path at the builtin's own seed —
    // definitionally equal to the write side's pmod(xxhash64(col), n).
    val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
      .hash(v, dt, 42L)
    java.lang.Math.floorMod(h, input.getInt(0).toLong).toInt
  }
}

/** Folds a finer bucket id into a coarser grid (`to` divides the finer
  * count): pmod(h, kn) mod n == pmod(h, n). NULL partitions stay NULL.
  */
class GraftBucketReducer(to: Int) extends Reducer[Integer, Integer]
    with Serializable {
  override def reduce(v: Integer): Integer =
    if (v == null) null
    else Integer.valueOf(java.lang.Math.floorMod(v.intValue(), to))
}
