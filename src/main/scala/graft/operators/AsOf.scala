package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Exprs._

/** Temporal as-of join — for every left row, the most recent right row
  * with the same key and right.time <= left.time (LEFT semantics:
  * unmatched left rows keep nulls). The operator Spark famously lacks
  * and time-series / feature-store pipelines always need.
  *
  * Implementation is the MERGE form, not a range join: tag both sides,
  * union, ONE hash shuffle on the key, ONE per-key sort by (time,
  * side), then carry the last-seen right payload forward with
  * last(ignoreNulls) over a running rows frame. No join operator at
  * all, no candidate-pair explosion — cost is a sort of |A|+|B| rows
  * per key, the same shape a 1000-executor cluster wants (per-key
  * skew = a user's event count, naturally bounded). Right rows sort
  * BEFORE left rows at equal time, so time-equality matches (the >=
  * convention of DuckDB's ASOF JOIN).
  */
object AsOf {

  type Q = (SparkSession, String) => DataFrame

  /** Generic as-of join. `payload` columns of `right` are carried to
    * each left row as `<name>` (caller pre-aliases). `right` must be
    * unique per (key, time) — dedup upstream for determinism. */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      time: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val nullOf: String => Column = c => lit(null).cast(right.schema(c).dataType)
    val taggedRight = right.select(
      col(key) +: col(time) +: lit(0).as("_side") +:
        leftCols.filterNot(Set(key, time)).map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++:
        payload.map(col): _*)
    val taggedLeft = left.select(
      col(key) +: col(time) +: lit(1).as("_side") +:
        leftCols.filterNot(Set(key, time)).map(col) ++:
        payload.map(c => nullOf(c).as(c)): _*)
    val w = Window.partitionBy(key)
      .orderBy(col(time).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = taggedRight.unionAll(taggedLeft)
      .withColumn("_match",
        last(when(col("_side") === 0, struct(payload.map(col): _*)),
          ignoreNulls = true).over(w))
    carried
      .filter(col("_side") === 1)
      .select(leftCols.map(col) ++
        payload.map(c => col(s"_match.$c").as(c)): _*)
  }

  /** For each purchase event: the user's latest click at or before it
    * (clicks deduped to one per (user, second) by max event_id, so the
    * match is deterministic). */
  val qAsofJoin: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), nanosToSec(col("ts")).as("ts_sec"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), nanosToSec(col("ts")).as("ts_sec"), col("event_id"))
      .groupBy("user_id", "ts_sec")
      .agg(max(col("event_id")).as("click_event_id"))
      .withColumn("click_ts_sec", col("ts_sec"))
    asofJoin(
      purchases, clicks, key = "user_id", time = "ts_sec",
      payload = Seq("click_event_id", "click_ts_sec"))
      .orderBy("user_id", "event_id")
  }

  val queries: Map[String, Q] = Map("q_asof_join" -> qAsofJoin)

  val oracle: Map[String, String] = Map(
    "q_asof_join" ->
      """WITH purchases AS (
        |  SELECT user_id, event_id, epoch_ms(ts) // 1000 AS ts_sec
        |  FROM events WHERE event_type = 'purchase'),
        |clicks AS (
        |  SELECT user_id, epoch_ms(ts) // 1000 AS ts_sec,
        |         max(event_id) AS click_event_id,
        |         epoch_ms(ts) // 1000 AS click_ts_sec
        |  FROM events WHERE event_type = 'click'
        |  GROUP BY user_id, epoch_ms(ts) // 1000)
        |SELECT a.user_id, a.event_id, a.ts_sec,
        |       b.click_event_id, b.click_ts_sec
        |FROM purchases a
        |ASOF LEFT JOIN clicks b
        |  ON a.user_id = b.user_id AND a.ts_sec >= b.ts_sec
        |ORDER BY a.user_id, a.event_id""".stripMargin
  )
}
