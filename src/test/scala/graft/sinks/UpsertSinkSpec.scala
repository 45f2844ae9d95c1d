package graft.sinks

import graft.SparkSpec
import UpsertSink._
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger
import scala.jdk.CollectionConverters._

/** In-JVM mock transport (local-mode executors share the process, like the
  * reference's mocked-service step tests, tests/steps/wonderful). */
object MockKb {
  val store = new ConcurrentHashMap[String, (String, String, String)]() // id -> (tag, name, content)
  val transientFailures = new ConcurrentHashMap[String, AtomicInteger]()
  val readTimeouts = new ConcurrentHashMap[String, AtomicInteger]()
  val createAttempts = new ConcurrentHashMap[String, AtomicInteger]()
  val ids = new AtomicInteger(0)
  def reset(): Unit = {
    store.clear(); transientFailures.clear(); readTimeouts.clear()
    createAttempts.clear(); ids.set(0)
  }
}

class MockTransport extends Transport {
  import MockKb._
  def list(tag: String): Map[String, String] =
    store.asScala.collect { case (id, (t, name, _)) if t == tag => name -> id }.toMap
  def create(tag: String, name: String, content: String): String = {
    createAttempts.computeIfAbsent(name, _ => new AtomicInteger(0)).incrementAndGet()
    maybeFail(name)
    val id = "id" + ids.incrementAndGet()
    store.put(id, (tag, name, content)); id
  }
  def update(id: String, content: String): Unit = {
    val (t, n, _) = store.get(id); maybeFail(n); store.put(id, (t, n, content))
  }
  def delete(id: String): Unit = { store.remove(id); () }
  private def maybeFail(name: String): Unit = {
    val ctr = transientFailures.get(name)
    if (ctr != null && ctr.getAndDecrement() > 0)
      throw new RetryableFailure(s"429 for $name")
    val rt = readTimeouts.get(name)
    if (rt != null && rt.getAndDecrement() > 0)
      throw new ReadTimeoutFailure(s"read timeout for $name")
  }
}

class UpsertSinkSpec extends SparkSpec {
  import spark.implicits._

  private val noSleep = RetryPolicy(sleeper = _ => (), jitter = identity)

  test("create-vs-update by listing, prune-stale scoped by tag (K6/K7, J1/J2)") {
    MockKb.reset()
    val t = new MockTransport
    // pre-existing: 'a' under our tag, 'z' stale, 'other' under another tag
    t.create("run", "a.md", "old-a")
    t.create("run", "z.md", "stale")
    t.create("other", "keepme.md", "other-pipeline")

    val df = Seq(("a.md", "new-a"), ("b.md", "new-b")).toDF("name", "content")
    val res = UpsertSink.upsert(df, "name", "content", "run", t, noSleep)
    assert(res == UpsertResult(created = 1, updated = 1, failed = 0, pruned = 1))
    val byName = MockKb.store.asScala.values.map(v => v._2 -> (v._1, v._3)).toMap
    assert(byName("a.md") == ("run", "new-a"))
    assert(byName("b.md") == ("run", "new-b"))
    assert(!byName.contains("z.md"))
    assert(byName("keepme.md") == ("other", "other-pipeline")) // other tag untouched
  }

  test("prune-stale anti-join is distributed: 10^5-name input, stale set stays exact") {
    MockKb.reset()
    val t = new MockTransport
    // 50 live KB docs under the tag; 10 of them absent from the input -> stale
    (0 until 50).foreach(i => t.create("run", s"doc_$i.md", "old"))
    // 120k input names (covers doc_0..doc_39 plus 119,960 new ones) — the
    // input name column must never be collected; only the ~sink-sized stale
    // result reaches the driver.
    val df = ((0 until 40).map(i => s"doc_$i.md") ++
      (0 until 119960).map(i => s"new_$i.md")).toDF("name")
      .withColumn("content", org.apache.spark.sql.functions.lit("v"))
      .repartition(8)
    val res = UpsertSink.upsert(df, "name", "content", "run", t, noSleep)
    assert(res.pruned == 10)
    assert(res.updated == 40 && res.created == 119960 && res.failed == 0)
    val names = MockKb.store.asScala.values.map(_._2).toSet
    assert((40 until 50).forall(i => !names.contains(s"doc_$i.md")))
    assert((0 until 40).forall(i => names.contains(s"doc_$i.md")))
  }

  test("retryable failures are retried with backoff and succeed (full-jitter policy)") {
    MockKb.reset()
    val t = new MockTransport
    MockKb.transientFailures.put("flaky.md", new AtomicInteger(2)) // fails twice, then ok
    val df = Seq(("flaky.md", "v")).toDF("name", "content")
    val res = UpsertSink.upsert(df, "name", "content", "run", t, noSleep)
    assert(res.created == 1 && res.failed == 0)
  }

  test("read-timeout is retried for updates (idempotent) but NOT for creates (elevenlabs :105-124)") {
    // updates: one ambiguous read timeout, then success -> retried, succeeds
    MockKb.reset()
    val t = new MockTransport
    t.create("run", "a.md", "old")
    MockKb.readTimeouts.put("a.md", new AtomicInteger(1))
    val res = UpsertSink.upsert(Seq(("a.md", "new")).toDF("name", "content"),
      "name", "content", "run", t, noSleep)
    assert(res.updated == 1 && res.failed == 0)
    // creates: the same ambiguous failure must NOT be re-sent -> row fails,
    // and exactly one create attempt reached the transport
    MockKb.reset()
    val t2 = new MockTransport
    t2.create("run", "seed.md", "x") // avoid fail-if-all on the probe row
    MockKb.readTimeouts.put("c.md", new AtomicInteger(1))
    val res2 = UpsertSink.upsert(Seq(("c.md", "v"), ("ok.md", "v")).toDF("name", "content"),
      "name", "content", "run", t2, noSleep)
    assert(res2.failed == 1 && res2.created == 1)
    assert(MockKb.createAttempts.get("c.md").get() == 1) // no duplicate send
  }

  test("retries exhaust -> row counted failed; fail-if-all throws") {
    MockKb.reset()
    val t = new MockTransport
    MockKb.transientFailures.put("dead.md", new AtomicInteger(99))
    val df = Seq(("dead.md", "v")).toDF("name", "content")
    val e = intercept[IllegalStateException] {
      UpsertSink.upsert(df, "name", "content", "run", t, noSleep)
    }
    assert(e.getMessage.contains("all 1 uploads failed"))
    // partial failure does not throw
    MockKb.reset()
    MockKb.transientFailures.put("dead.md", new AtomicInteger(99))
    val df2 = Seq(("dead.md", "v"), ("ok.md", "v")).toDF("name", "content")
    val res = UpsertSink.upsert(df2, "name", "content", "run", new MockTransport, noSleep)
    assert(res.failed == 1 && res.created == 1)
  }
}
