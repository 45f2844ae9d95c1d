package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // hot key: 'hot' carries 90% of rows
  private def skewed = (
    (1 to 900).map(i => ("hot", i.toLong, i.toDouble)) ++
    (1 to 100).map(i => (s"k${i % 10}", i.toLong, i.toDouble))
  ).toDF("key", "id", "value")

  test("saltedSumCount equals the direct groupBy on a 90%-hot key") {
    val direct = skewed.groupBy($"key")
      .agg(sum($"value".cast("decimal(12,2)")).as("sum_value"), count(lit(1)).as("cnt"))
      .orderBy("key").as[(String, BigDecimal, Long)].collect().toSeq
    val salted = Skew.saltedSumCount(skewed, "key", "value", "id", buckets = 8)
      .orderBy("key").as[(String, BigDecimal, Long)].collect().toSeq
    assert(salted.map(r => (r._1, r._2.doubleValue, r._3)) ==
      direct.map(r => (r._1, r._2.doubleValue, r._3)))
  }

  test("phase-1 fan-out actually spreads the hot key over salt buckets") {
    val buckets = skewed
      .withColumn("s", Skew.saltCol(8, $"id"))
      .filter($"key" === "hot").select("s").distinct().count()
    assert(buckets > 4) // 900 rows spread over ~8 sub-keys
  }

  test("subBucket caps band-bucket fan-out deterministically") {
    val banded = skewed.withColumn("band",
      Skew.subBucket(lit("band0"), $"id", cap = 4))
    val sizes = banded.filter($"key" === "hot").groupBy("band").count()
      .as[(String, Long)].collect()
    assert(sizes.length == 4)
    assert(sizes.map(_._2).max < 900) // no sub-bucket carries the whole hot key
    // deterministic: same ids land in the same sub-bucket on re-run
    val again = skewed.withColumn("band", Skew.subBucket(lit("band0"), $"id", 4))
      .select("id", "band").as[(Long, String)].collect().toMap
    banded.select("id", "band").as[(Long, String)].collect()
      .foreach { case (id, b) => assert(again(id) == b) }
  }
}
