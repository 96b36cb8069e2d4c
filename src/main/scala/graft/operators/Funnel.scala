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
    *
    * `strictIncrease = true` is ClickHouse windowFunnel's
    * `'strict_increase'` mode: consecutive stages must have STRICTLY
    * increasing timestamps — two same-timestamp events can never chain,
    * regardless of tie order. Implemented by switching the chain-carry
    * window from a ROWS frame (everything strictly before in (time, tie)
    * order) to a RANGE frame on the integer time column ending at
    * time − 1 (everything strictly earlier in time), so equal-timestamp
    * events are mutually invisible; same one-shuffle DP otherwise.
    */
  def levels(
      events: DataFrame,
      entityCol: String,
      timeCol: String,
      tieCol: String,
      stageConds: Seq[Column],
      windowMicros: Long,
      strictIncrease: Boolean = false): DataFrame = {
    require(stageConds.nonEmpty, "at least one funnel stage")
    val k = stageConds.length
    val prior =
      if (strictIncrease)
        Window.partitionBy(entityCol).orderBy(col(timeCol))
          .rangeBetween(Window.unboundedPreceding, -1)
      else
        Window.partitionBy(entityCol).orderBy(col(timeCol), col(tieCol))
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

  /** ClickHouse `sequenceCount('(?1).*(?2)')`: non-overlapping first→second
    * matches per entity, scanned greedily left-to-right in (timeCol,
    * tieCol) order — after a match completes, the scan resumes AFTER the
    * matched second (ClickHouse's restart rule), so V V C C counts ONE
    * match, not two (the second V precedes the first match's end and is
    * consumed by the scan). This is NOT maximum matching.
    *
    * The scan automaton ("seeking first → armed; armed + second → fire,
    * reset") has a closed form over the filtered stream: it is armed at an
    * event iff the immediately PRECEDING filtered event matched `first`
    * (a first always arms; a second always resets). So
    *   matches = count of seconds whose lag-1 filtered event is a first —
    * one lag window + one aggregate, O(events) per entity, one shuffle;
    * proven by induction and cross-checked against a step-by-step
    * simulation in FunnelDictionarySpec. Returns (entityCol, n_pairs).
    * Events matching neither predicate are skipped (the `.*` in the
    * pattern); `first && second` rows count as firsts.
    */
  def sequenceCount(
      events: DataFrame,
      entityCol: String,
      timeCol: String,
      tieCol: String,
      first: Column,
      second: Column): DataFrame = {
    val order = Window.partitionBy(entityCol)
      .orderBy(col(timeCol), col(tieCol))
    events
      .filter(first || second)
      .select(col(entityCol), col(timeCol), col(tieCol),
        when(first, 1).otherwise(0).as("__seq_f"))
      .withColumn("__seq_armed", lag(col("__seq_f"), 1).over(order))
      .groupBy(entityCol)
      .agg(count(when(col("__seq_f") === 0 && col("__seq_armed") === 1, 1))
        .as("n_pairs"))
  }

  /** ClickHouse `sequenceMatch('(?1)(?2)')`: does at least one
    * first→second chain exist per entity? Equivalent to sequenceCount ≥ 1
    * (a match exists iff the greedy scan fires at least once), so it
    * shares that closed form. Over the FILTERED stream the adjacent
    * pattern `(?1)(?2)` and the gapped `(?1).*(?2)` coincide for 2-stage
    * existence (the first second after any first is preceded by a first);
    * a k>2-stage extension must pick one deliberately. Returns
    * (entityCol, matched: 0/1) — int, not boolean, for engine-portable
    * output.
    */
  def sequenceMatch(
      events: DataFrame,
      entityCol: String,
      timeCol: String,
      tieCol: String,
      first: Column,
      second: Column): DataFrame =
    sequenceCount(events, entityCol, timeCol, tieCol, first, second)
      .select(col(entityCol), (col("n_pairs") > 0).cast("int").as("matched"))
}
