package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Driver-side id collection with the torn-batch-scrub cap
  * (InvertedIndex.appendStream's discipline, applied uniformly): every
  * index mutation face (`update`/`delete(DataFrame)`) holds the touched
  * ids driver-side to build an `isInCollection` predicate — right for the
  * bounded decontamination / re-clean sets these serve, but a
  * corpus-sized call must become a diagnosable error with rebuild
  * guidance, never a driver OOM. One cap, one message, shared by the
  * text, ANN, and MinHash stores.
  */
private[graft] object BoundedIds {
  /** Max ids any mutation face may hold driver-side (~8 MB of longs).
    * Overridable via `spark.graft.maxMutationIds` (specs exercise the
    * over-cap path with a small bound; production lowers it when the
    * driver is memory-tight).
    */
  val MaxIdsDefault = 1000000
  val MaxIdsConf = "spark.graft.maxMutationIds"

  /** Collect `idCol`'s distinct values, failing loudly past the cap.
    * `face` names the caller ("InvertedIndex.update" …) in the error.
    */
  def collect(df: DataFrame, idCol: String, face: String): Seq[Long] = {
    val max = df.sparkSession.conf
      .get(MaxIdsConf, MaxIdsDefault.toString).toInt
    val ids = df.select(col(idCol)).distinct()
      .limit(max + 1).collect().map(_.getLong(0)).toSeq
    require(ids.size <= max,
      s"$face holds >$max $idCol values driver-side; a corpus-sized " +
        "mutation should rebuild the index from the corpus instead " +
        "(cheaper than rewriting every part)")
    ids
  }
}
