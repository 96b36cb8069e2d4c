package graft.mergetree

import java.nio.charset.StandardCharsets

/** UTF-8 byte-order string comparison for key bounds.
  *
  * Spark compares strings as unsigned UTF-8 bytes (`UTF8String.compareTo`)
  * and parquet footer min/max for binary columns use the same order, but
  * Java's `String.compareTo` orders by UTF-16 code units. The two orders
  * disagree for keys mixing U+E000..U+FFFF with supplementary-plane
  * characters (surrogate pairs sort low in UTF-16, high in UTF-8), so any
  * manifest bound aggregated or compared with Java order can wrongly prune a
  * part that the Spark-side filter would keep. All driver-side key-bound
  * math goes through this object.
  */
object KeyOrder {

  def cmp(a: String, b: String): Int =
    java.util.Arrays.compareUnsigned(
      a.getBytes(StandardCharsets.UTF_8), b.getBytes(StandardCharsets.UTF_8))

  def lt(a: String, b: String): Boolean = cmp(a, b) < 0
  def gt(a: String, b: String): Boolean = cmp(a, b) > 0

  def min(a: String, b: String): String = if (cmp(a, b) <= 0) a else b
  def max(a: String, b: String): String = if (cmp(a, b) >= 0) a else b

  /** For sortBy over part metadata (bin-pack contiguity). Nulls (unbounded
    * parts, see PartStats) sort first — they join the leftmost bin.
    */
  val ordering: Ordering[String] = (a: String, b: String) =>
    if (a == null && b == null) 0
    else if (a == null) -1
    else if (b == null) 1
    else cmp(a, b)
}
