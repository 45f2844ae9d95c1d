package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

case class Ev(ts: Timestamp, event_type: String, value: Double, user_id: Long)

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int, sec: Int = 0) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:$sec%02d")

  private val events = Seq(
    Ev(ts(1), "click", 1.0, 1), Ev(ts(5), "click", 2.0, 1), Ev(ts(20), "view", 3.0, 1),
    Ev(ts(59), "click", 4.0, 2), Ev(ts(2), "view", 5.0, 2))

  private def runStream(build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
                        mode: String): Array[org.apache.spark.sql.Row] = {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(events: _*)
    val name = "out" + System.nanoTime()
    val q = build(mem.toDF()).writeStream.format("memory").queryName(name)
      .outputMode(mode).trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    spark.table(name).collect()
  }

  // NOTE: "complete" output mode — with a single AvailableNow batch the
  // watermark never advances, so "append" would emit nothing.
  test("streaming tumbling window agg matches the batch formulation (T4)") {
    val rows = runStream(df => StreamingOps.tumblingAgg(df, "ts", "1 hour"), "complete")
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n"))).toSet
    assert(rows == Set(("click", 3L), ("view", 2L)))
  }

  test("streaming session windows close on the gap (T4 session)") {
    val rows = runStream(df => StreamingOps.sessionAgg(df, "ts", "user_id", "10 minutes"), "complete")
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"))).toList.sorted
    // user 1: events at 10:01,10:05 (one session) and 10:20 (new session);
    // user 2: 10:02 and 10:59 are separate sessions
    assert(rows == List((1L, 1L), (1L, 2L), (2L, 1L), (2L, 1L)))
  }

  test("stateful streaming dedup: first occurrence wins across micro-batches (T2 via flatMapGroupsWithState)") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[StatefulDedup.Keyed]
    val name = "dedup" + System.nanoTime()
    val q = StatefulDedup.dedupStream(mem.toDS(), ttl = None)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    mem.addData(StatefulDedup.Keyed("h1", "doc-a"), StatefulDedup.Keyed("h2", "doc-b"),
      StatefulDedup.Keyed("h1", "doc-a-dup-same-batch"))
    q.processAllAvailable()
    mem.addData(StatefulDedup.Keyed("h1", "doc-a-dup-later-batch"),
      StatefulDedup.Keyed("h3", "doc-c"))
    q.processAllAvailable()
    val out = spark.table(name).collect().map(r => (r.getString(0), r.getString(1))).toSet
    q.stop()
    assert(out == Set(("h1", "doc-a"), ("h2", "doc-b"), ("h3", "doc-c")))
  }

  test("batch replay of dedupReplay is deterministic: pre-sort satisfies the key-only sort (q67 shape)") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    // AQE query stages are leaf wrappers, so assert on the rendered final
    // plan (its toString includes stage subtrees) rather than collect()
    def finalPlan(df: org.apache.spark.sql.Dataset[_]): String = {
      df.collect() // materialize so AQE settles on the final plan
      (df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }).toString
    }
    // shuffled arrival; replay order is the numeric payload
    val rows = Seq(
      StatefulDedup.Keyed("k1", "3"), StatefulDedup.Keyed("k2", "2"),
      StatefulDedup.Keyed("k1", "1"), StatefulDedup.Keyed("k2", "5"),
      StatefulDedup.Keyed("k1", "2"))
    val pre = rows.toDF()
      .repartition(4, col("key"))
      .sortWithinPartitions(col("key"), col("payload"))
    val out = StatefulDedup.dedupReplay(pre)
    assert(out.collect().map(k => (k.key, k.payload)).sorted.toSeq ==
      Seq(("k1", "1"), ("k2", "2")))
    // the plan must NOT re-shuffle or re-sort: the (key, payload)
    // partition-local sort satisfies the operator's key-only requirement,
    // which is what makes rows.take(1) = first arrival deterministic
    val plan = finalPlan(out)
    assert(planCount(plan, "Sort [") == 1, plan)
    assert(planCount(plan, "Exchange hashpartitioning") == 1, plan)
    // counter-example: typed groupByKey synthesizes its own grouping column
    // (AppendColumns), forcing a second shuffle + key-only re-sort that
    // destroys within-group order — the reason dedupReplay groups by column
    val typedPlan = finalPlan(StatefulDedup.dedupStream(pre.as[StatefulDedup.Keyed], ttl = None))
    assert(planCount(typedPlan, "Exchange hashpartitioning") == 2, typedPlan)
  }

  test("sliding windows double-count each event across overlapping windows") {
    val rows = runStream(df => StreamingOps.slidingAgg(df, "ts", "1 hour", "30 minutes"), "complete")
    assert(rows.map(_.getAs[Long]("n")).sum == events.size * 2)
  }

  test("flagship pipeline runs under Structured Streaming: split -> embed per micro-batch") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[graft.contracts.MarkdownDoc]
    val longBody = (1 to 400).map(i => s"w$i").mkString(" ") // > 288 tokens -> splits
    mem.addData(
      graft.contracts.MarkdownDoc(longBody, "kw", "https://x/a", Map("doc" -> "a")),
      graft.contracts.MarkdownDoc("short doc body here " * 16, "kw", "https://x/b", Map("doc" -> "b")))
    val splitter = new graft.split.SemanticSplitter()
    val chunks = mem.toDS().flatMap(d => splitter.splitDoc(d))
    val rows = graft.operators.Embedding.embedChunks(
      chunks, graft.operators.Embedding.MockEmbeddingClient(dim = 4), batchSize = 8)
    val name = "pipe" + System.nanoTime()
    val q = rows.toDF().writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val out = spark.table(name).collect()
    assert(out.length >= 3, "long doc must split into multiple embedded chunks")
    out.foreach { r =>
      assert(r.getSeq[Float](r.fieldIndex("vector")).length == 4)
      assert(r.getAs[String]("embedding_input_text").startsWith("query: "))
      assert(r.getMap[String, String](r.fieldIndex("metadata")).contains("chunk_index"))
    }
    val urls = out.map(_.getAs[String]("url")).toSet
    assert(urls == Set("https://x/a", "https://x/b"))
  }

  test("dropDuplicatesWithinWatermark: in-horizon duplicates dropped, state bounded (T2)") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    // two duplicate (event_type, value) pairs within the horizon
    mem.addData(
      Ev(ts(1), "click", 1.0, 1), Ev(ts(2), "click", 1.0, 7), // dup of first
      Ev(ts(3), "view", 2.0, 1), Ev(ts(4), "view", 2.0, 9),   // dup
      Ev(ts(5), "buy", 3.0, 1))
    val name = "dd" + System.nanoTime()
    val q = StreamingOps.dedupWithinWatermark(mem.toDF(), "ts", Seq("event_type", "value"),
        watermark = "30 minutes")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val out = spark.table(name).collect().map(r =>
      (r.getAs[String]("event_type"), r.getAs[Double]("value"))).toSet
    assert(out == Set(("click", 1.0), ("view", 2.0), ("buy", 3.0)))
    // first occurrence wins: the surviving click is user 1's
    val users = spark.table(name).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("user_id")).toMap
    assert(users("click") == 1L && users("view") == 1L)
  }

  test("map-side corpus gates stream unchanged: quality gate + PII mask per micro-batch") {
    implicit val sq = spark.sqlContext
    import graft.operators.QualityFilter
    val mem = MemoryStream[(Long, String)]
    val good = "the a and of to in is " + (1 to 35).map(i => s"word$i").mkString(" ")
    mem.addData((1L, good + " mail bob@x.io now"), (2L, "too short"))
    val gated = mem.toDF().toDF("doc_id", "text")
      .filter(QualityFilter.failReason(col("text"),
        QualityFilter.GopherConfig(minTokens = 30)).isNull)
      .withColumn("text", graft.functions.text.maskPii(col("text")))
    val name = "gate" + System.nanoTime()
    val q = gated.writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val out = spark.table(name).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L))
    assert(out.head.getAs[String]("text").endsWith("mail <EMAIL> now"))
  }

  test("LSH index ingest streams: pairs against the versioned index, then index append per micro-batch") {
    implicit val sq = spark.sqlContext
    import graft.operators.Dedup
    // the steady-state ingest loop (Dedup.minhashIndex scaladoc) under
    // Structured Streaming: each micro-batch pairs against the CURRENT
    // versioned index (no corpus re-signaturing), then commits index +=
    // its own signature rows through the transactional sink
    val root = java.nio.file.Files.createTempDirectory("lsh_ingest").toString
    val sink = new graft.sinks.VersionedTableSink(root, "mh_index")
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val nearDup = base.replace("kappa", "lambda")
    val other = "one two three four five six seven eight nine ten"
    // seed the index with doc 1 (arrival 0)
    sink.write(Dedup.minhashIndex(Seq((1L, base)).toDF("doc_id", "text"), "doc_id", "text"))
    val mem = MemoryStream[(Long, String)]
    mem.addData((2L, nearDup), (3L, other))
    val collected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val idx = sink.readCurrent(spark)
        collected ++= Dedup.minhashPairsAgainstIndex(idx, batch, "doc_id", "text",
            threshold = 0.5, validateDisjoint = true)
          .select("id_a", "id_b").as[(Long, Long)].collect()
        sink.write(idx.unionByName(Dedup.minhashIndex(batch, "doc_id", "text"))): Unit
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    assert(collected.toSet == Set((1L, 2L))) // near-dup found, `other` clean
    // a second arrival pairs against the GROWN index (docs 1..3)
    val batch2 = Seq((4L, other + " eleven")).toDF("doc_id", "text")
    val p2 = Dedup.minhashPairsAgainstIndex(sink.readCurrent(spark), batch2,
        "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(p2 == Set((3L, 4L)))
  }

  test("impact champion index stays exact under streaming ingest (shared fixedAvgdl)") {
    implicit val sq = spark.sqlContext
    import graft.operators.Rank
    // the lexical serving index under the minhash-index ingest loop: each
    // arrival indexes ONLY its own docs, merges into the stored index
    // through the transactional sink, and — because every build shares
    // one fixedAvgdl — the merged index must stay bit-identical to a
    // from-scratch build over everything seen so far, arrival by arrival
    val avgdl = 3.5
    val m = 2
    val root = java.nio.file.Files.createTempDirectory("impact_ingest").toString
    val sink = new graft.sinks.VersionedTableSink(root, "impact_index")
    def build(df: org.apache.spark.sql.DataFrame) =
      Rank.championIndexImpact(df, "doc_id", "text", m, fixedAvgdl = Some(avgdl))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7))).toSet
    val seed = Seq((1L, "spark join spark agg"), (2L, "spark scan"))
    sink.write(build(seed.toDF("doc_id", "text")))
    val arrival1 = Seq((3L, "filter scan scan scan"), (4L, "window batch stream stream"))
    val mem = MemoryStream[(Long, String)]
    mem.addData(arrival1: _*)
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val idx = sink.readCurrent(spark)
        sink.write(Rank.mergeChampionIndexesImpact(idx, build(batch), m,
          validateDisjoint = true)): Unit
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    assert(rows(sink.readCurrent(spark)) == rows(build((seed ++ arrival1).toDF("doc_id", "text"))))
    // a second arrival merges into the GROWN index — still exact
    val arrival2 = Seq((5L, "spark stream spark"), (6L, "agg agg scan"))
    sink.write(Rank.mergeChampionIndexesImpact(sink.readCurrent(spark),
      build(arrival2.toDF("doc_id", "text")), m, validateDisjoint = true))
    assert(rows(sink.readCurrent(spark)) ==
      rows(build((seed ++ arrival1 ++ arrival2).toDF("doc_id", "text"))))
  }

  test("PQ codes store stays exact under streaming ingest (frozen codebook)") {
    implicit val sq = spark.sqlContext
    import graft.operators.PqIndex
    // the ANN mirror of the impact-index ingest loop: each arrival
    // PQ-encodes ONLY its own vectors under the FROZEN codebook and
    // appends through the transactional sink; appended must equal a
    // from-scratch encode of everything seen so far, bit for bit
    val seed = Seq(
      (1L, Array(1.0f, 0.1f, 0.0f, 0.2f)),
      (2L, Array(0.9f, 0.2f, 0.1f, 0.1f)))
    val subDim = 2
    val books = (0 until 2).map { j =>
      seed.map(v => graft.functions.Kernels.quantizeVec(v._2))
        .map(qv => java.util.Arrays.copyOfRange(qv, j * subDim, (j + 1) * subDim))
        .toArray
    }.toArray
    val pq = PqIndex.Model(books)
    def enc(df: org.apache.spark.sql.DataFrame) =
      PqIndex.encode(df, "vec_id", "embedding", pq)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1).toList)).toSet
    val root = java.nio.file.Files.createTempDirectory("pq_ingest").toString
    val sink = new graft.sinks.VersionedTableSink(root, "pq_codes")
    sink.write(enc(seed.toDF("vec_id", "embedding")))
    val arrival1 = Seq(
      (3L, Array(0.0f, 1.0f, 0.8f, 0.0f)),
      (4L, Array(0.1f, 0.9f, 1.0f, 0.1f)))
    val mem = MemoryStream[(Long, Array[Float])]
    mem.addData(arrival1: _*)
    val q = mem.toDF().toDF("vec_id", "embedding").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        sink.write(sink.readCurrent(spark).union(enc(batch))): Unit
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    assert(rows(sink.readCurrent(spark)) ==
      rows(enc((seed ++ arrival1).toDF("vec_id", "embedding"))))
    // a second arrival appends to the GROWN store — still exact
    val arrival2 = Seq((5L, Array(0.5f, 0.5f, 0.5f, 0.5f)))
    sink.write(sink.readCurrent(spark)
      .union(enc(arrival2.toDF("vec_id", "embedding"))))
    assert(rows(sink.readCurrent(spark)) ==
      rows(enc((seed ++ arrival1 ++ arrival2).toDF("vec_id", "embedding"))))
  }

  test("LM surprise streams: static reference LM joined per micro-batch (the CCNet serving shape)") {
    implicit val sq = spark.sqlContext
    import graft.operators.LmScore
    // static LM (in production: persisted wiki-LM counts), streamed docs
    val lm = Seq(("the", 90L), ("cat", 9L)).toDF("token", "c")
    val mem = MemoryStream[(Long, String)]
    mem.addData((1L, "the the the"), (2L, "cat rare"))
    val scored = LmScore.surprise(mem.toDF().toDF("doc_id", "text"), "doc_id", "text", lm)
    val name = "lm" + System.nanoTime()
    val q = scored.writeStream.format("memory").queryName(name)
      .outputMode("complete").trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val out = spark.table(name).collect()
      .map(r => r.getAs[Long]("doc_id") -> ((r.getAs[Long]("sum_surprise"), r.getAs[Long]("n_tokens")))).toMap
    def s(c: Long) = -math.floor(math.log(c / 99.0) * 1e6).toLong
    assert(out(1L) == ((3 * s(90), 3L)))
    assert(out(2L) == ((s(9) + s(1), 2L))) // "rare" is OOV -> count 1
  }
}
