package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def rows = (1L to 2000L).map(i => (i, s"g${i % 5}")).toDF("id", "grp")

  test("byHash is deterministic and close to the nominal rate") {
    val a = Sampling.byHash(rows, "id", 1000).select("id").as[Long].collect().toSet
    val b = Sampling.byHash(rows, "id", 1000).select("id").as[Long].collect().toSet
    assert(a == b)
    // 10% of 2000 with md5 uniformity: comfortably inside [5%, 15%]
    assert(a.size > 100 && a.size < 300, s"got ${a.size}")
  }

  test("byHash samples NEST across rates (monotone in basisPoints)") {
    val small = Sampling.byHash(rows, "id", 500).select("id").as[Long].collect().toSet
    val large = Sampling.byHash(rows, "id", 2000).select("id").as[Long].collect().toSet
    assert(small.subsetOf(large))
  }

  test("byHash selection is content-addressed: unrelated rows don't flip decisions") {
    val a = Sampling.byHash(rows, "id", 1000).select("id").as[Long].collect().toSet
    val withExtra = rows.union(Seq((99999L, "gx")).toDF("id", "grp"))
    val b = Sampling.byHash(withExtra, "id", 1000)
      .filter($"id" <= 2000).select("id").as[Long].collect().toSet
    assert(a == b)
  }

  test("byHash rate bounds are enforced") {
    intercept[IllegalArgumentException](Sampling.byHash(rows, "id", 10001))
    assert(Sampling.byHash(rows, "id", 0).count() == 0)
    assert(Sampling.byHash(rows, "id", 10000).count() == 2000)
  }

  test("byHashWeighted: rate column drives per-row decisions on the same nested buckets") {
    val rate = when($"grp" === "g0", 10000L).when($"grp" === "g1", 2000L).otherwise(0L)
    val out = Sampling.byHashWeighted(rows, "id", rate)
      .select("id", "grp").as[(Long, String)].collect()
    val byGrp = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byGrp("g0") == 400) // rate 10000 keeps every g0 row
    assert(!byGrp.contains("g2") && !byGrp.contains("g3") && !byGrp.contains("g4"))
    // g1 at 2000 bp is exactly the byHash(2000) selection restricted to g1
    val nested = Sampling.byHash(rows, "id", 2000)
      .filter($"grp" === "g1").select("id").as[Long].collect().toSet
    assert(out.filter(_._2 == "g1").map(_._1).toSet == nested)
  }

  test("byHashWeighted fails fast on out-of-range AND fractional rates") {
    def fails(rate: org.apache.spark.sql.Column): Unit = {
      val e = intercept[Exception](
        Sampling.byHashWeighted(rows, "id", rate).count())
      assert(e.getMessage.contains("basis points") ||
        e.getCause.getMessage.contains("basis points"))
    }
    fails(lit(10001L))
    fails(lit(0.5)) // a fraction column would truncate to 0 bp silently
    fails(lit(-1L))
    // integral-valued doubles are fine (e.g. a computed CASE of constants)
    assert(Sampling.byHashWeighted(rows, "id", lit(2000.0)).count() > 0)
  }

  test("perGroup draws exactly k per stratum, deterministically") {
    val s1 = Sampling.perGroup(rows, "grp", "id", 7)
    val counts = s1.groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(counts.values.toSet == Set(7L) && counts.size == 5)
    val s2 = Sampling.perGroup(rows, "grp", "id", 7)
    assert(s1.orderBy("grp", "id").collect().toSeq ==
      s2.orderBy("grp", "id").collect().toSeq)
    // helper rank column does not leak into the output
    assert(s1.columns.toSeq == Seq("id", "grp"))
  }

  test("perGroup with k >= group size returns the whole group") {
    val tiny = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "grp")
    assert(Sampling.perGroup(tiny, "grp", "id", 10).count() == 3)
  }

  test("perGroup plan uses the bounded-heap operator, not a window sort") {
    val plan = Sampling.perGroup(rows, "grp", "id", 7)
      .queryExecution.executedPlan.toString
    assert(plan.contains("GroupTopK"), plan.take(800))
    assert(!plan.contains("Window"), "must not fall back to a window sort")
  }

  test("temperatureMixture: smallest group keeps everything, larger thin by sqrt(nmin/n)") {
    // groups: a=100 rows, b=400 rows, c=25 rows -> nmin=25;
    // rates: c=10000, a=floor(1e4*sqrt(25)/sqrt(100))=5000, b=2500
    val df = ((1L to 100L).map((_, "a")) ++ (101L to 500L).map((_, "b")) ++
      (501L to 525L).map((_, "c"))).toDF("id", "grp")
    val out = Sampling.temperatureMixture(df, "id", "grp")
      .select("id", "grp", "rate_bp").as[(Long, String, Long)].collect()
    val rates = out.map(r => r._2 -> r._3).distinct.toMap
    assert(rates == Map("a" -> 5000L, "b" -> 2500L, "c" -> 10000L))
    assert(out.count(_._2 == "c") == 25) // rate 10000 keeps every row
    // selection is exactly byHashWeighted at the computed rates (same seed)
    val expected = Sampling.byHashWeighted(df,
      "id", when($"grp" === "a", 5000L).when($"grp" === "b", 2500L).otherwise(10000L))
      .select("id").as[Long].collect().toSet
    assert(out.map(_._1).toSet == expected)
  }

  test("temperatureMixture: alpha=1 keeps the natural distribution; bounds enforced") {
    val df = ((1L to 50L).map((_, "a")) ++ (51L to 60L).map((_, "b"))).toDF("id", "grp")
    assert(Sampling.temperatureMixture(df, "id", "grp", alpha = 1.0).count() == 60)
    intercept[IllegalArgumentException](
      Sampling.temperatureMixture(df, "id", "grp", alpha = 0.0))
    intercept[IllegalArgumentException](
      Sampling.temperatureMixture(df, "id", "grp", alpha = 1.5))
  }
}
