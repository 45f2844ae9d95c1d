package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class EventsSpec extends SparkSpec {
  import spark.implicits._

  test("lastWins agg form equals the row_number window form (U3, q22's 100x shape)") {
    val df = Seq(
      (1L, 1L, 10L, "a"), (1L, 2L, 20L, "b"), (1L, 5L, 20L, "e"), // ts tie -> max event_id
      (2L, 3L, 5L, "c"), (2L, 4L, 5L, "d"),
      (3L, 9L, 1L, "z"))
      .toDF("user_id", "event_id", "ts", "event_type")

    val agg = Events.lastWins(df, Seq("user_id"), Seq("ts", "event_id"))
      .select("user_id", "event_id", "ts", "event_type")
      .as[(Long, Long, Long, String)].collect().toSet

    val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
    val windowed = df.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select("user_id", "event_id", "ts", "event_type")
      .as[(Long, Long, Long, String)].collect().toSet

    assert(agg == windowed)
    assert(agg == Set((1L, 5L, 20L, "e"), (2L, 4L, 5L, "d"), (3L, 9L, 1L, "z")))
  }

  test("firstWins keeps the earliest row per key (exact-dedup agg form)") {
    val df = Seq((1L, 5L, 20L, "late"), (1L, 1L, 10L, "early"), (2L, 3L, 5L, "only"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val out = Events.firstWins(df, Seq("user_id"), Seq("ts", "event_id"))
      .select("user_id", "event_type").as[(Long, String)].collect().toSet
    assert(out == Set((1L, "early"), (2L, "only")))
  }

  test("lastWins plan aggregates, it does not sort partitions") {
    val df = Seq((1L, 1L, 10L, "a")).toDF("user_id", "event_id", "ts", "event_type")
    val plan = Events.lastWins(df, Seq("user_id"), Seq("ts", "event_id"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Aggregate") || plan.contains("HashAggregate") ||
      plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"))
    assert(!plan.contains("Window"), "agg form must not fall back to a window")
  }
}
