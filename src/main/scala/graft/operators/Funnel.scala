package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ClickHouse `windowFunnel` / `sequenceCount` as reusable operators over
  * any event-shaped DataFrame (no analog in /root/reference — behavioral-
  * analytics surface ClickHouse exposes and Spark lacks natively).
  *
  * Both are linear dynamic programs over each entity's event stream,
  * NOT k-way self-joins: per-entity work is O(events) regardless of the
  * stage count or events-per-entity, the whole computation is ONE shuffle
  * (hash by entity) shared by every window pass and the final aggregate
  * (plan-pinned in PlanAssertionsSpec), and everything stays inside
  * whole-stage codegen. The self-join formulation is O(events^k) on hot
  * entities — the difference between a funnel that survives 100 TB of
  * events and one that does not.
  *
  * Chain semantics (pinned, since ClickHouse's same-timestamp behavior is
  * unspecified): steps strictly increase in (timeCol, tieCol) order; the
  * window constraint is last.time − first.time ≤ windowMicros, anchored
  * at the chain's FIRST matched stage like ClickHouse windowFunnel.
  *
  * Correctness of the DP rests on max-start dominance: among all chains
  * realizing a given stage prefix strictly before the current row, the
  * one with the LATEST start time is always the best to extend (a later
  * start can only loosen the window constraint), so one running-max per
  * prefix length suffices. Pinned by FunnelDictionarySpec's adversarial
  * orderings.
  */
object Funnel {

  /** Deepest funnel prefix per entity: returns (entityCol, level) with
    * level in 0..stageConds.length. `stageConds(i)` is the boolean row
    * predicate for stage i+1 (e.g. `col("event_type") === "view"`).
    * `timeCol` must be epoch-micros (or any monotone long).
    */
  def levels(
      events: DataFrame,
      entityCol: String,
      timeCol: String,
      tieCol: String,
      stageConds: Seq[Column],
      windowMicros: Long): DataFrame = {
    require(stageConds.nonEmpty, "at least one funnel stage")
    val k = stageConds.length
    val prior = Window.partitionBy(entityCol)
      .orderBy(col(timeCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, -1)

    // best_i = latest start time of any i-stage chain ending strictly
    // before this row; built stage by stage (each step is one window pass
    // over the SAME partitioning — no extra shuffle).
    var df = events
    var bestPrev = "__funnel_best_1"
    df = df.withColumn(bestPrev,
      max(when(stageConds.head, col(timeCol))).over(prior))
    for (i <- 2 until k) {
      val best = s"__funnel_best_$i"
      df = df.withColumn(best,
        max(when(stageConds(i - 1), col(bestPrev))).over(prior))
      bestPrev = best
    }

    // reached_i: some i-stage chain satisfies the window constraint at its
    // LAST step (intermediate steps need no check — they end earlier, so
    // their own constraint is implied by the final one when extending).
    val reachedCols = (1 to k).map { i =>
      val flag =
        if (i == 1) when(stageConds.head, 1).otherwise(0)
        else when(stageConds(i - 1) &&
          col(timeCol) - col(s"__funnel_best_${i - 1}") <= windowMicros, 1)
          .otherwise(0)
      max(flag).as(s"__funnel_l$i")
    }
    val perEntity = df.groupBy(entityCol).agg(reachedCols.head, reachedCols.tail: _*)
    val level = (1 to k).foldLeft(lit(0)) { (acc, i) =>
      when(col(s"__funnel_l$i") === 1, i).otherwise(acc)
    }
    perEntity.select(col(entityCol), level.as("level"))
  }

  /** ClickHouse `sequenceCount('(?1)(?2)')`: greedy non-overlapping
    * first→second matches per entity, in (timeCol, tieCol) order.
    *
    * The greedy scan ("open on first, close on second") has a closed form
    * over prefixes: unmatched seconds = the maximum prefix excess of
    * seconds over firsts, so
    *   pairs = total_seconds − max(0, max_prefix(seconds − firsts)).
    * One running-sum window + one aggregate; cross-validated against a
    * step-by-step greedy simulation. Returns (entityCol, n_pairs).
    */
  def sequenceCount(
      events: DataFrame,
      entityCol: String,
      timeCol: String,
      tieCol: String,
      first: Column,
      second: Column): DataFrame = {
    val run = Window.partitionBy(entityCol)
      .orderBy(col(timeCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .filter(first || second)
      .select(col(entityCol), col(timeCol), col(tieCol),
        when(second, 1).otherwise(-1).as("__seq_d"))
      .withColumn("__seq_excess", sum(col("__seq_d")).over(run))
      .groupBy(entityCol)
      .agg((count(when(col("__seq_d") === 1, 1)) -
        greatest(max(col("__seq_excess")), lit(0L))).as("n_pairs"))
  }
}
