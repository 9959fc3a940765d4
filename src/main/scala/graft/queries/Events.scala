package graft.queries

import graft.Tables
import graft.operators.TimeWindows
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-time operator inventory over the `events` table — the batch
  * equivalents of the reference's streaming operators (SURVEY §2.1):
  * TumblingWindowAggregate, SlidingWindowAggregate, SessionWindowAggregate,
  * UpdatingAggregate (final state), InstantJoin (windowed join),
  * JoinWithExpiration (interval join), LookupJoin. The same DataFrame
  * programs run in streaming mode with `withWatermark` (covered by the
  * ScalaTest streaming specs); here they run in batch for the DuckDB oracle.
  */
object Events {

  private def ev(s: SparkSession, dir: String): DataFrame = Tables.load(s, dir, "events")

  val all: Seq[Q] = Seq(

    // ── tumbling window aggregate (reference tumbling_aggregating_window.rs)
    Q("q_tumble",
      (s, dir) => TimeWindows.tumbleAgg(ev(s, dir), "ts", "1 hour",
          Seq(col("event_type")),
          Seq(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"),
            davg(col("value"), 4).as("avg_value")))
        .select(col("window_start"), col("window_end"), col("event_type"),
          col("n"), col("sum_value"), col("avg_value")),
      Some(s"""SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS window_start,
              |  time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) + INTERVAL '1 hour' AS window_end,
              |  event_type, COUNT(*) AS n, ${oSum("value")} AS sum_value,
              |  ${oAvg("value", 4)} AS avg_value
              |FROM events GROUP BY 1, 2, 3""".stripMargin)),

    // ── sliding/hopping window aggregate (reference
    //    sliding_aggregating_window.rs; width 1h, slide 15m ⇒ 4 windows per
    //    row; Spark replicates at assignment, aggregation stays partial/final)
    Q("q_hop",
      (s, dir) => TimeWindows.hopAgg(ev(s, dir), "ts", "1 hour", "15 minutes",
          Seq(col("event_type")),
          Seq(count(lit(1)).as("n"), dsum(col("value")).as("sum_value")))
        .select(col("window_start"), col("window_end"), col("event_type"),
          col("n"), col("sum_value")),
      Some(s"""SELECT ws AS window_start, ws + INTERVAL '1 hour' AS window_end, event_type,
              |  COUNT(*) AS n, ${oSum("value")} AS sum_value
              |FROM (
              |  SELECT time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP))
              |           - k * INTERVAL '15 minutes' AS ws, ts, value, event_type
              |  FROM events CROSS JOIN (SELECT unnest(range(4)) AS k)
              |) GROUP BY ws, event_type""".stripMargin)),

    // ── session window aggregate, 10 min inactivity gap per user
    //    (reference session_aggregating_window.rs; oracle = gaps-and-islands)
    Q("q_session",
      (s, dir) => TimeWindows.sessionAgg(ev(s, dir), "ts", "10 minutes",
          Seq(col("user_id")),
          Seq(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value")))
        .select(col("user_id"), col("window_start"), col("window_end"),
          col("n_events"), col("sum_value")),
      Some(s"""WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS t, value FROM events),
              |m AS (SELECT user_id, t, value,
              |        CASE WHEN lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
              |               OR t - lag(t) OVER (PARTITION BY user_id ORDER BY t) >= INTERVAL '10 minutes'
              |             THEN 1 ELSE 0 END AS brk
              |      FROM e),
              |g AS (SELECT user_id, t, value,
              |        SUM(brk) OVER (PARTITION BY user_id ORDER BY t ROWS UNBOUNDED PRECEDING) AS sid
              |      FROM m)
              |SELECT user_id, MIN(t) AS window_start, MAX(t) + INTERVAL '10 minutes' AS window_end,
              |  COUNT(*) AS n_events, ${oSum("value")} AS sum_value
              |FROM g GROUP BY user_id, sid""".stripMargin)),

    // ── non-windowed grouped aggregate = final state of the reference's
    //    UpdatingAggregate (incremental_aggregator.rs); streaming variant
    //    with retractions lives in graft.streaming.UpdatingAggregate
    Q("q_updating_agg",
      (s, dir) => ev(s, dir)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"),
          davg(col("value"), 4).as("avg_value"),
          min(col("value")).as("min_value"), max(col("value")).as("max_value")),
      Some(s"""SELECT event_type, COUNT(*) AS n, ${oSum("value")} AS total,
              |  ${oAvg("value", 4)} AS avg_value,
              |  MIN(value) AS min_value, MAX(value) AS max_value
              |FROM events GROUP BY event_type""".stripMargin)),

    // ── windowed self-join (reference InstantJoin: both sides carry the
    //    same window column; joined per closed bin): signups ⋈ purchases in
    //    the same hour for the same user
    Q("q_windowed_join",
      (s, dir) => {
        val e = ev(s, dir)
        def side(tpe: String, n: String) =
          TimeWindows.tumbleAgg(e.filter(col("event_type") === tpe), "ts", "1 hour",
            Seq(col("user_id")), Seq(count(lit(1)).as(n)))
            .select(col("window_start"), col("user_id"), col(n))
        side("signup", "n_signup")
          .join(side("purchase", "n_purchase"), Seq("window_start", "user_id"))
          .select(col("window_start"), col("user_id"), col("n_signup"), col("n_purchase"))
      },
      Some("""WITH b AS (
             |  SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS window_start,
             |         user_id, event_type FROM events),
             |sg AS (SELECT window_start, user_id, COUNT(*) AS n_signup FROM b
             |       WHERE event_type = 'signup' GROUP BY 1, 2),
             |pu AS (SELECT window_start, user_id, COUNT(*) AS n_purchase FROM b
             |       WHERE event_type = 'purchase' GROUP BY 1, 2)
             |SELECT sg.window_start, sg.user_id, n_signup, n_purchase
             |FROM sg JOIN pu ON sg.window_start = pu.window_start AND sg.user_id = pu.user_id""".stripMargin)),

    // ── interval join = batch analog of JoinWithExpiration (non-windowed
    //    stream-stream join with TTL state): purchase within 30 min after a
    //    signup by the same user. The band predicate is exactly the state
    //    TTL the reference keeps (join_with_expiration.rs:29-230).
    Q("q_interval_join",
      (s, dir) => {
        val e = ev(s, dir)
        val sg = e.filter(col("event_type") === "signup")
          .select(col("user_id"), col("ts").as("sg_ts"))
        val pu = e.filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_user"), col("ts").as("pu_ts"))
        sg.join(pu, col("user_id") === col("p_user") &&
            col("pu_ts") >= col("sg_ts") &&
            col("pu_ts") < col("sg_ts") + expr("INTERVAL 30 MINUTES"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_pairs"), max(col("pu_ts")).as("last_purchase"))
      },
      Some("""SELECT s.user_id, COUNT(*) AS n_pairs,
             |  CAST(MAX(p.ts) AS TIMESTAMP) AS last_purchase
             |FROM (SELECT user_id, ts FROM events WHERE event_type = 'signup') s
             |JOIN (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
             |  ON s.user_id = p.user_id
             | AND CAST(p.ts AS TIMESTAMP) >= CAST(s.ts AS TIMESTAMP)
             | AND CAST(p.ts AS TIMESTAMP) < CAST(s.ts AS TIMESTAMP) + INTERVAL '30 minutes'
             |GROUP BY s.user_id""".stripMargin)),

    // ── lookup join (reference LookupJoin / lookup_join.rs): stream side
    //    enriched against a small keyed table — broadcast, no shuffle of the
    //    event side
    Q("q_lookup_join",
      (s, dir) => ev(s, dir)
        .join(broadcast(Tables.load(s, dir, "nation")),
          pmod(col("user_id"), lit(25)) === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value")),
      Some(s"""SELECT n_name, COUNT(*) AS n, ${oSum("value")} AS sum_value
              |FROM events JOIN nation ON user_id % 25 = n_nationkey
              |GROUP BY n_name""".stripMargin)),

    // ── window function over closed windows (reference WindowFunction
    //    operator, window_fn.rs: OVER() partitioned by a time-window col):
    //    rank event types per hour by event count
    Q("q_window_over_window",
      (s, dir) => {
        val agg = TimeWindows.tumbleAgg(ev(s, dir), "ts", "1 hour",
          Seq(col("event_type")), Seq(count(lit(1)).as("n")))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("window_start")).orderBy(col("n").desc, col("event_type"))
        agg.withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 2)
          .select(col("window_start"), col("event_type"), col("n"), col("rnk"))
      },
      Some("""SELECT window_start, event_type, n, CAST(rnk AS INTEGER) AS rnk FROM (
             |  SELECT window_start, event_type, n,
             |    row_number() OVER (PARTITION BY window_start ORDER BY n DESC, event_type) AS rnk
             |  FROM (
             |    SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS window_start,
             |           event_type, COUNT(*) AS n
             |    FROM events GROUP BY 1, 2)
             |) WHERE rnk <= 2""".stripMargin))
  )
}
