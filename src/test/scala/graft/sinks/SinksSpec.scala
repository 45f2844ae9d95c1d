package graft.sinks

import graft.SparkSpec
import graft.streaming.SelfConsuming

class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("versioned sink: v1 then v2, alias swaps atomically, readCurrent follows alias") {
    val root = tmpDir("vsink")
    val sink = new VersionedTableSink(root, "kb", historyLen = 10)
    assert(sink.versions().isEmpty)
    val v1 = sink.write(Seq((1, "a"), (2, "b")).toDF("id", "t"))
    assert(v1 == 1 && sink.aliasedVersion().contains(1))
    val v2 = sink.write(Seq((3, "c")).toDF("id", "t"))
    assert(v2 == 2 && sink.aliasedVersion().contains(2))
    assert(sink.readCurrent(spark).count() == 1)
    assert(sink.versions() == Seq(1, 2))
  }

  test("versioned sink: empty input never clobbers the alias (reference s3/step.py:71-74 semantics)") {
    val root = tmpDir("vsink2")
    val sink = new VersionedTableSink(root, "kb")
    sink.write(Seq((1, "a")).toDF("id", "t"))
    val v = sink.write(spark.emptyDataFrame.selectExpr("1 as id", "'x' as t").limit(0))
    assert(v == 1 && sink.aliasedVersion().contains(1))
  }

  test("retirement keeps the newest historyLen versions and never the aliased one (retirement.py:19-117)") {
    val root = tmpDir("vsink3")
    val sink = new VersionedTableSink(root, "kb", historyLen = 2)
    (1 to 5).foreach(i => sink.write(Seq((i, s"v$i")).toDF("id", "t")))
    assert(sink.versions() == Seq(4, 5))
    assert(sink.aliasedVersion().contains(5))
    assert(sink.readCurrent(spark).as[(Int, String)].collect().toSeq == Seq((5, "v5")))
  }

  test("snapshot sink: timestamped snapshot + atomic latest pointer; empty input keeps latest") {
    val root = tmpDir("snap")
    val sink = new SnapshotSink(root, "kb")
    sink.write(Seq(("a", 1)).toDF("k", "v"), "run1")
    assert(sink.latest().contains(s"$root/kb-run1"))
    sink.write(Seq(("b", 2)).toDF("k", "v"), "run2")
    assert(sink.latest().contains(s"$root/kb-run2"))
    sink.write(Seq(("c", 3)).toDF("k", "v").limit(0), "run3")
    assert(sink.latest().contains(s"$root/kb-run2"))
  }

  test("self-consuming incremental merge: upsert by key, last version wins (T2, self_consuming_step.py)") {
    val path = tmpDir("selfc") + "/state"
    val r1 = SelfConsuming.merge(spark, path,
      Seq((1, "a", 1L), (2, "b", 1L)).toDF("id", "v", "ver"), "id", "ver")
    assert(r1.count() == 2)
    val r2 = SelfConsuming.merge(spark, path,
      Seq((2, "b2", 2L), (3, "c", 2L)).toDF("id", "v", "ver"), "id", "ver")
    val out = r2.orderBy("id").as[(Int, String, Long)].collect().toSeq
    assert(out == Seq((1, "a", 1L), (2, "b2", 2L), (3, "c", 2L)))
  }
}
