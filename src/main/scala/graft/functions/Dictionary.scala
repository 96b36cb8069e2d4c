package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ClickHouse external-dictionary equivalent (`dictGet`,
  * /root/reference has no analog — this is ClickHouse query-surface
  * parity): a small key→value mapping loaded once from any DataFrame and
  * embedded into the plan as a literal map, so each lookup is
  * `element_at` on a constant — whole-stage-codegen'd, no join, no
  * shuffle, no per-row hash-relation probe setup.
  *
  * Scale posture: this is the Spark-first answer to dictGet at 100 TB.
  * The fact table never moves; the dictionary rides along inside the
  * serialized plan that Spark already ships to every task (the moral
  * equivalent of a broadcast variable, without a join operator in the
  * plan). The size guard keeps the plan literal within sane broadcast
  * bounds — a dimension past the cap is not a dictionary, it's a join
  * (use `broadcast(dim)` instead).
  */
final class Dictionary private (entries: Map[Long, String]) extends Serializable {

  // A plan-literal map (typedLit → element_at/GetMapValue) scans the literal
  // LINEARLY per row — ~1M comparisons per fact row at the size cap. These
  // UDFs close over the immutable HashMap instead (shipped once per task
  // with the closure, the same distribution story), probing in O(1).
  private val lookupUdf = udf((k: java.lang.Long) =>
    if (k == null) null else entries.getOrElse(k.longValue, null))
  private val hasUdf = udf((k: java.lang.Long) =>
    k != null && entries.contains(k.longValue))

  /** `dictGet(dict, key)`: the mapped value, or NULL for unknown keys. */
  def get(key: Column): Column = lookupUdf(key.cast("long"))

  /** `dictGetOrDefault(dict, key, default)`. */
  def getOrDefault(key: Column, default: Column): Column =
    coalesce(get(key), default)

  /** `dictHas(dict, key)`: key membership — true even when the key maps to
    * a NULL value (get().isNotNull would misreport those as absent).
    */
  def has(key: Column): Column = hasUdf(key.cast("long"))

  def size: Int = entries.size
}

object Dictionary {

  /** Plan-literal budget. ClickHouse dictionaries are RAM-resident lookup
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
    val m = rows.iterator.map(r => r.getLong(0) -> r.getString(1)).toMap
    require(m.size == rows.length,
      s"duplicate keys in dictionary source column '$keyCol'")
    new Dictionary(m)
  }
}
