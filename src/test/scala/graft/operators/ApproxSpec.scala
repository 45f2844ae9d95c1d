package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ApproxSpec extends SparkSpec {
  import spark.implicits._

  private val df = (1 to 10000).map(i => (i % 4, i % 997, i.toDouble))
    .toDF("grp", "key", "v")

  test("approx distinct within rsd of exact; plan has no Expand") {
    val out = Approx.distinctCounts(df, Seq("grp"), Seq("key"), rsd = 0.05)
      .collect().map(r => r.getAs[Int]("grp") -> r.getAs[Long]("approx_key")).toMap
    val exact = df.groupBy("grp").agg(countDistinct("key").as("d"))
      .collect().map(r => r.getAs[Int]("grp") -> r.getAs[Long]("d")).toMap
    exact.foreach { case (g, d) =>
      val a = out(g)
      assert(math.abs(a - d).toDouble / d < 0.15, s"grp $g: approx $a vs exact $d")
    }
    val plan = Approx.distinctCounts(df, Seq("grp"), Seq("key"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), "HLL must not need the distinct-agg Expand")
  }

  test("percentile sketch close to exact quantiles") {
    val out = Approx.percentileSketch(df, Seq("grp"), "v").collect()
    out.foreach { r =>
      val p50 = r.getAs[Double]("p50")
      assert(math.abs(p50 - 5000.0) < 300, s"p50 off: $p50")
      assert(r.getAs[Double]("p25") < p50 && p50 < r.getAs[Double]("p95"))
    }
  }
}
