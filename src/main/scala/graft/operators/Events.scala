package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-funnel analytics over an arbitrary ordered stage list.
  *
  * The reference has no event analytics (its `events` are CRUD row
  * mutations); this is a pipeline extension in the [[Temporal]] spirit:
  * a declarative plan whose shuffle structure survives a 100× scale-up.
  * Generalizes the fixed view→click→purchase query shape to any stage
  * sequence.
  */
object Events {

  /** Ordered funnel: for each user, stage k's timestamp is the EARLIEST
    * event of stage k's type at-or-after the user's stage k−1 timestamp.
    * Returns one row per user who reached stage 1 with a `<stage>_ts`
    * column per stage (null once the funnel is abandoned) and `stage`,
    * the number of stages reached (≥ 1; later stages are null whenever
    * an earlier one is, by construction).
    *
    * Plan shape (pinned in PlanShapeSpec for the 3-stage instance): one
    * per-user min-reduction per stage, chained by equi-joins on the user
    * key — each reduction is map-side combinable with O(1) state per
    * user, so a whale user costs a scan, never a per-user
    * `collect_list` buffer or a ranking window.
    */
  def funnel(
      events: DataFrame,
      stages: Seq[String],
      userCol: String = "user_id",
      tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame = {
    require(stages.nonEmpty, "at least one funnel stage required")
    require(stages.distinct.size == stages.size,
      s"duplicate stage names: ${stages.mkString(", ")}")
    val first = events.where(col(typeCol) === stages.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as(s"${stages.head}_ts"))
    val reached = stages.tail
      .scanLeft(first -> s"${stages.head}_ts") { case ((after, afterCol), typ) =>
        events.where(col(typeCol) === typ)
          .join(after, Seq(userCol))
          .where(col(tsCol) >= col(afterCol))
          .groupBy(col(userCol)).agg(min(col(tsCol)).as(s"${typ}_ts")) ->
          s"${typ}_ts"
      }
      .map { case (df, _) => df }
    val joined = reached.tail
      .foldLeft(reached.head)((acc, f) => acc.join(f, Seq(userCol), "left_outer"))
    val stageCount = stages.tail.foldLeft(lit(1)) { (acc, typ) =>
      acc + when(col(s"${typ}_ts").isNotNull, 1).otherwise(0)
    }
    joined.select(
      col(userCol) +: stages.map(t => col(s"${t}_ts")) :+ stageCount.as("stage"): _*)
  }
}
