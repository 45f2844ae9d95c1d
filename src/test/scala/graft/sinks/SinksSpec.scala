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

  test("writeVia: empty payload burns its version number (manifest-less debris, alias untouched, GC'd after the next successful swap)") {
    import java.nio.file.{Files, Paths}
    val root = tmpDir("vsink2b")
    val sink = new VersionedTableSink(root, "kb")
    sink.write(Seq((1, "a")).toDF("id", "t"))
    // an empty payload: the writer populates the dir but reports 0 rows
    val v = sink.writeVia { dir =>
      Seq.empty[(Int, String)].toDF("id", "t").write.parquet(s"$dir/part")
      0L
    }
    assert(v == 1 && sink.aliasedVersion().contains(1), "alias must not move")
    // the dir stays as manifest-less debris — invisible to readers, but the
    // number is BURNED: the next writer gets v3, never a reused v2 (whose
    // errorifexists payload write would otherwise collide with the debris)
    assert(Files.exists(Paths.get(sink.versionDir(2))))
    assert(!Files.exists(sink.manifestFile(2)))
    assert(sink.versions() == Seq(1))
    val v3 = sink.writeVia { dir =>
      val df = Seq((3, "c")).toDF("id", "t")
      df.write.mode("errorifexists").parquet(dir)
      df.sparkSession.read.parquet(dir).count()
    }
    assert(v3 == 3 && sink.aliasedVersion().contains(3))
    // the successful swap's GC cleans the pre-alias debris
    assert(!Files.exists(Paths.get(sink.versionDir(2))))
  }

  test("retirement keeps the newest historyLen versions and never the aliased one (retirement.py:19-117)") {
    val root = tmpDir("vsink3")
    val sink = new VersionedTableSink(root, "kb", historyLen = 2)
    (1 to 5).foreach(i => sink.write(Seq((i, s"v$i")).toDF("id", "t")))
    assert(sink.versions() == Seq(4, 5))
    assert(sink.aliasedVersion().contains(5))
    assert(sink.readCurrent(spark).as[(Int, String)].collect().toSeq == Seq((5, "v5")))
  }

  test("retirement: dry-run reports without deleting; malformed/untracked names never touched (retirement cases)") {
    import java.nio.file.{Files, Paths}
    val root = tmpDir("vsink3b")
    // build 4 committed versions with a wide history, then retire with a
    // narrow one — so stale versions exist at retire() time
    val writer = new VersionedTableSink(root, "kb", historyLen = 10)
    (1 to 4).foreach(i => writer.write(Seq((i, s"v$i")).toDF("id", "t")))
    // foreign + malformed version names alongside (reference retains
    // "abc_dummy", "dummy_v", "dummy_v_abc", "dummy_vabc")
    Seq("abc_kb", "kb_v", "kb_v_x", "kb_vabc").foreach(n =>
      Files.createDirectories(Paths.get(root, n)))
    val sink = new VersionedTableSink(root, "kb", historyLen = 2)
    // dry run: v1, v2 stale (v3, v4 kept; v4 aliased) — reported, not deleted
    assert(sink.retire(dryRun = true) == Seq(1, 2))
    assert(sink.versions() == Seq(1, 2, 3, 4), "dry run must not delete")
    // real retirement deletes exactly those, never the untracked names
    assert(sink.retire() == Seq(1, 2))
    assert(sink.versions() == Seq(3, 4))
    Seq("abc_kb", "kb_v", "kb_v_x", "kb_vabc").foreach(n =>
      assert(Files.exists(Paths.get(root, n)), s"untracked $n must survive retirement"))
  }

  test("crash-safe: a mid-write kill leaves the old alias resolving; debris is GC'd after the next swap") {
    import org.apache.spark.sql.functions.{col, udf}
    import java.nio.file.{Files, Paths}
    val root = tmpDir("vsink4")
    val sink = new VersionedTableSink(root, "kb", historyLen = 10)
    sink.write(Seq((1, "a"), (2, "b")).toDF("id", "t"))
    assert(sink.aliasedVersion().contains(1))
    // inject a task failure DURING the v2 data write: count() prunes the
    // udf column so the pre-write count passes, then the parquet write
    // materializes it and dies — the same filesystem state as a kill
    val boom = udf((i: Int) => if (i == 2) throw new RuntimeException("injected kill") else i)
    val bad = Seq((1, "x"), (2, "y")).toDF("id", "t").withColumn("id", boom(col("id")))
    intercept[Exception] { sink.write(bad) }
    // the failed write never committed: alias intact, old data readable,
    // no committed v2 visible
    assert(sink.aliasedVersion().contains(1))
    assert(sink.readCurrent(spark).orderBy("id").as[(Int, String)].collect().toSeq ==
      Seq((1, "a"), (2, "b")))
    assert(sink.versions() == Seq(1))
    assert(!Files.exists(sink.manifestFile(2)))
    // a hard kill (no abort cleanup) leaves a partial data dir with no
    // manifest — plant that state: it must stay invisible, burn its
    // version number, and be GC'd after the next successful swap
    val partial = Paths.get(sink.versionDir(2))
    Files.createDirectories(partial)
    Files.write(partial.resolve("part-00000.parquet"), Array[Byte](1, 2, 3))
    assert(sink.versions() == Seq(1))
    val v = sink.write(Seq((9, "z")).toDF("id", "t"))
    assert(v == 3 && sink.aliasedVersion().contains(3))
    assert(!Files.exists(partial))
    assert(sink.versions() == Seq(1, 3))
    assert(sink.readCurrent(spark).as[(Int, String)].collect().toSeq == Seq((9, "z")))
  }

  test("crash-safe: a committed orphan (kill between manifest and swap) stays readable, never aliased") {
    import java.nio.file.Files
    val root = tmpDir("vsink5")
    val sink = new VersionedTableSink(root, "kb", historyLen = 10)
    sink.write(Seq((1, "a")).toDF("id", "t"))
    // simulate the kill window: v2 data + manifest exist, alias still -> v1
    Seq((2, "b")).toDF("id", "t").write.parquet(sink.versionDir(2))
    Files.write(sink.manifestFile(2), "rows=1\n".getBytes("UTF-8"))
    sink.swapAlias(1) // alias untouched by the crash; make the state explicit
    assert(sink.versions() == Seq(1, 2))
    assert(sink.readCurrent(spark).as[(Int, String)].collect().toSeq == Seq((1, "a")))
    // next write proceeds past the orphan: v3 commits and swaps
    val v = sink.write(Seq((3, "c")).toDF("id", "t"))
    assert(v == 3 && sink.aliasedVersion().contains(3))
    assert(sink.versions() == Seq(1, 2, 3)) // orphan retained (inside historyLen)
  }

  test("legacy pre-manifest roots are grandfathered: no version loss on upgrade") {
    import java.nio.file.{Files, Paths}
    val root = tmpDir("vsink6")
    val sink = new VersionedTableSink(root, "kb", historyLen = 10)
    // old-format root: three data dirs + alias, ZERO manifests; v4 is an
    // old crashed write (above the alias)
    (1 to 3).foreach(v => Seq((v, s"v$v")).toDF("id", "t").write.parquet(sink.versionDir(v)))
    Files.createDirectories(Paths.get(sink.versionDir(4)))
    sink.swapAlias(3)
    // readers see the grandfathered committed set immediately (no mutation)
    assert(sink.versions() == Seq(1, 2, 3))
    assert(sink.readCurrent(spark).as[(Int, String)].collect().toSeq == Seq((3, "v3")))
    // first new-format write adopts v1..v3 and proceeds past the debris
    val v = sink.write(Seq((9, "z")).toDF("id", "t"))
    assert(v == 5 && sink.aliasedVersion().contains(5))
    assert(sink.versions() == Seq(1, 2, 3, 5)) // nothing legacy was deleted
    assert((1 to 3).forall(i => Files.exists(sink.manifestFile(i)))) // adopted
    assert(!Files.exists(Paths.get(sink.versionDir(4)))) // old crash debris GC'd
    assert(sink.readCurrent(spark).as[(Int, String)].collect().toSeq == Seq((9, "z")))
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

  test("merge tiebreak is insensitive to map entry order (canonicalized hash)") {
    // Same-version ties resolve on a content hash; a map column serialized
    // in raw entry order would make the winner depend on HOW the map was
    // built. 20 ids × 2 candidate rows each: the winner set must be
    // identical whether maps were constructed (a,b) or (b,a). With
    // order-sensitive hashing the chance all 20 winners agree is ~2^-20.
    def run(reversed: Boolean): Seq[(Int, String)] = {
      val path = tmpDir(s"selfc_map_$reversed") + "/state"
      val rows = (0 until 20).flatMap { id =>
        val m =
          if (reversed) Map(s"k$id-b" -> "2", s"k$id-a" -> "1")
          else Map(s"k$id-a" -> "1", s"k$id-b" -> "2")
        Seq((id, "x", m, 1L), (id, "y", m, 1L))
      }
      SelfConsuming.merge(spark, path, rows.toDF("id", "v", "m", "ver"), "id", "ver")
        .select("id", "v").as[(Int, String)].collect().toSeq.sorted
    }
    assert(run(reversed = false) == run(reversed = true))
  }
}
