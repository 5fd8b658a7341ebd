package graft.relational

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-analytics breadth: semi-structured JSON extraction and
  * ranked top-k — the everyday shapes around the periodicity core. */
object EventsOps {

  /** Parse the `props` JSON column and aggregate the extracted metric
    * per event type (semi-structured pushdown-friendly projection). */
  def eventsJsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "events")
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("kv"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum("kv").as("sum_k"),
        round(sum("kv").cast("double") / count(lit(1)), 6).as("avg_k"),
        min("kv").as("min_k"), max("kv").as("max_k"))

  val eventsJsonExtractSql: String =
    """SELECT event_type, count(*) AS n,
      |  cast(sum(cast(json_extract_string(props, '$.k') AS BIGINT))
      |       AS BIGINT) AS sum_k,
      |  round(cast(sum(cast(json_extract_string(props, '$.k') AS BIGINT))
      |        AS double) / count(*), 6) AS avg_k,
      |  min(cast(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
      |  max(cast(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      |FROM events GROUP BY 1""".stripMargin

  /** Top-5 users by total value within each event type (rank over an
    * exact-cents sum; user id breaks ties deterministically). */
  def eventsTopkUsers(spark: SparkSession, dir: String): DataFrame = {
    val sums = Tables.table(spark, dir, "events")
      .groupBy("event_type", "user_id")
      .agg((sum(round(col("value") * 100.0, 0).cast("long")).cast("double") /
        100.0).as("total"))
    val w = Window.partitionBy("event_type")
      .orderBy(col("total").desc, col("user_id").asc)
    sums.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("event_type"), col("user_id"),
        round(col("total"), 2).as("total"), col("rank"))
  }

  val eventsTopkUsersSql: String =
    """WITH sums AS (
      |  SELECT event_type, user_id,
      |    cast(sum(cast(round(value*100.0) AS BIGINT)) AS double) / 100.0
      |      AS total
      |  FROM events GROUP BY 1, 2),
      |rk AS (SELECT event_type, user_id, total,
      |  row_number() OVER (PARTITION BY event_type
      |                     ORDER BY total DESC, user_id ASC) AS rank
      |  FROM sums)
      |SELECT event_type, user_id, round(total, 2) AS total,
      |  cast(rank AS BIGINT) AS rank
      |FROM rk WHERE rank <= 5""".stripMargin

  /** Exact interpolated quantiles (percentile_cont semantics) of the
    * value distribution per event type — Spark's `percentile` and
    * DuckDB's `quantile_cont` share the definition exactly, so this
    * sits under the hash gate. Exact quantiles sort within each
    * group; at 100 TB swap in `percentile_approx` (t-digest, one
    * mergeable pass) — the query shape is identical, only the
    * accuracy/cost trade moves. */
  def eventsQuantiles(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "events")
      .groupBy("event_type")
      .agg(
        (round(expr("percentile(value, 0.5)"), 4) + lit(0.0)).as("p50"),
        (round(expr("percentile(value, 0.95)"), 4) + lit(0.0)).as("p95"),
        (round(expr("percentile(value, 0.99)"), 4) + lit(0.0)).as("p99"),
        count(lit(1)).as("n"))

  val eventsQuantilesSql: String =
    """SELECT event_type,
      |  round(quantile_cont(value, 0.5), 4) + 0.0 AS p50,
      |  round(quantile_cont(value, 0.95), 4) + 0.0 AS p95,
      |  round(quantile_cont(value, 0.99), 4) + 0.0 AS p99,
      |  count(*) AS n
      |FROM events GROUP BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_json_extract" -> (eventsJsonExtract _),
    "events_topk_users" -> (eventsTopkUsers _),
    "events_quantiles" -> (eventsQuantiles _))

  val oracles: Map[String, String] = Map(
    "events_json_extract" -> eventsJsonExtractSql,
    "events_topk_users" -> eventsTopkUsersSql,
    "events_quantiles" -> eventsQuantilesSql)
}
