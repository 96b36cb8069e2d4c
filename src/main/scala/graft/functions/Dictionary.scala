package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, ObjectType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** ClickHouse external-dictionary equivalent (`dictGet`,
  * /root/reference has no analog — this is ClickHouse query-surface
  * parity): a small key→value mapping loaded once from any DataFrame and
  * embedded into the plan as an object literal, so each lookup is ONE
  * codegen'd O(1) hash probe — no join, no shuffle, no per-row
  * hash-relation setup, and no UDF serialization boundary.
  *
  * Scale posture: this is the Spark-first answer to dictGet at 100 TB.
  * The fact table never moves; the dictionary rides along inside the
  * serialized plan that Spark already ships to every task (the moral
  * equivalent of a broadcast variable, without a join operator in the
  * plan). The size guard keeps the embedded map within sane broadcast
  * bounds — a dimension past the cap is not a dictionary, it's a join
  * (use `broadcast(dim)` instead).
  */
final class Dictionary private (state: DictState, val size: Int)
    extends Serializable {

  // Lookups compile to StaticInvoke over the embedded map — whole-stage
  // codegen emits a direct `DictionaryProbe.get(map, key)` call (O(1)
  // HashMap probe on UTF8String values, no Scala-UDF row converters).
  // The map is wrapped in DictState for identity equals/hashCode: a plain
  // HashMap literal would make every plan-canonicalization hash O(|dict|).
  private def probe(fn: String, dt: DataType, key: Column): Column =
    ColumnBridge.column(StaticInvoke(
      DictionaryProbe.getClass,
      dt,
      fn,
      Seq(Literal.fromObject(state, ObjectType(classOf[DictState])),
        ColumnBridge.expression(key.cast("long")))))

  /** `dictGet(dict, key)`: the mapped value, or NULL for unknown keys. */
  def get(key: Column): Column = probe("get", StringType, key)

  /** `dictGetOrDefault(dict, key, default)`. */
  def getOrDefault(key: Column, default: Column): Column =
    coalesce(get(key), default)

  /** `dictHas(dict, key)`: key membership — true even when the key maps to
    * a NULL value (get().isNotNull would misreport those as absent).
    * NULL keys probe as false (StaticInvoke null-propagates to NULL,
    * coalesced here — a NULL key is never a member).
    */
  def has(key: Column): Column =
    coalesce(probe("has", BooleanType, key), lit(false))
}

/** Identity-equality wrapper around the dictionary's map: embedded in the
  * plan as an ObjectType literal, so expression canonicalization compares
  * and hashes it by REFERENCE (AnyRef) instead of walking up to 2²⁰
  * entries on every semanticHash.
  */
final class DictState(val map: java.util.HashMap[java.lang.Long, UTF8String])
    extends Serializable

/** The static probe targets StaticInvoke compiles calls to (Scala emits
  * static forwarders for these on the companion class, which both the
  * generated code and the interpreted reflective path resolve).
  */
object DictionaryProbe {
  def get(s: DictState, k: Long): UTF8String =
    s.map.get(java.lang.Long.valueOf(k))
  def has(s: DictState, k: Long): Boolean =
    s.map.containsKey(java.lang.Long.valueOf(k))
}

object Dictionary {

  /** Embedded-map budget. ClickHouse dictionaries are RAM-resident lookup
    * structures by contract; past this, a broadcast hash join is the right
    * operator and the loader refuses loudly rather than bloating the plan.
    */
  val MaxEntries: Int = 1 << 20

  /** Load `keyCol → valueCol` of a (small) DataFrame as a dictionary.
    * The source can be any Spark-readable table — parquet dim tables,
    * JDBC, a MergeTree scan — mirroring ClickHouse's dictionary sources.
    */
  def fromDataFrame(df: DataFrame, keyCol: String, valueCol: String): Dictionary = {
    val rows = df
      .select(col(keyCol).cast("long"), col(valueCol).cast("string"))
      .limit(MaxEntries + 1)
      .collect()
    require(rows.length <= MaxEntries,
      s"dictionary source exceeds $MaxEntries entries - use broadcast(dim) join instead")
    // A NULL key has no slot in a long-keyed dictionary; fail with the
    // actual cause, not a getLong NPE — and never let several NULLs
    // masquerade as the duplicate-keys error below. (A non-numeric string
    // key already fails loudly in the ANSI cast above.)
    val nullKeys = rows.count(_.isNullAt(0))
    require(nullKeys == 0,
      s"dictionary key column '$keyCol' has $nullKeys NULL value(s)")
    val m = new java.util.HashMap[java.lang.Long, UTF8String](rows.length * 2)
    rows.foreach(r => m.put(java.lang.Long.valueOf(r.getLong(0)),
      if (r.isNullAt(1)) null else UTF8String.fromString(r.getString(1))))
    require(m.size == rows.length,
      s"duplicate keys in dictionary source column '$keyCol'")
    new Dictionary(new DictState(m), m.size)
  }
}
