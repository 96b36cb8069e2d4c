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

  /** Allocation-free fast path: for ASCII chars (< 0x80) UTF-16 code-unit
    * order IS UTF-8 byte order, so compare char-wise until the first
    * non-ASCII char on either side and only then pay the byte-accurate
    * encode (getBytes allocated two arrays per call — with ~10⁵
    * comparisons per local scan's sort this dominated the driver fast
    * path's profile).
    */
  def cmp(a: String, b: String): Int = {
    val la = a.length
    val lb = b.length
    val n = math.min(la, lb)
    var i = 0
    while (i < n) {
      val ca = a.charAt(i)
      val cb = b.charAt(i)
      if (ca >= 0x80 || cb >= 0x80) return cmpBytes(a, b)
      if (ca != cb) return ca - cb
      i += 1
    }
    // shared prefix equal and pure ASCII: byte order = length order; a
    // longer string's next char may be non-ASCII but any extension of an
    // equal prefix still sorts after it in both orders
    la - lb
  }

  private def cmpBytes(a: String, b: String): Int =
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
