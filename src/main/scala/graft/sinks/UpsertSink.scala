package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Knowledge-base upsert sink family (SURVEY.md §2.12 K5-K7; reference
  * ElevenLabs/Wonderful/Decagon steps wurzel/steps/{elevenlabs,wonderful,
  * decagon}/step.py).
  *
  * Protocol preserved:
  *  - existing docs listed once and probed per row to choose create vs
  *    update (J1 lookup, wonderful/step.py:106-115);
  *  - uploads run distributed via foreachPartition with a per-executor
  *    transport (the reference's thread pool becomes partition parallelism);
  *  - retries use capped full-jitter exponential backoff and only for
  *    retryable failures (wonderful/step.py:247-285, 3 attempts, base 0.5s);
  *  - prune-stale: names present in the KB under this history tag but
  *    absent from the input are deleted (J2 anti-join semantics,
  *    elevenlabs/step.py:284-306 — scoped by tag so other pipelines'
  *    documents survive);
  *  - error containment: failed rows are counted, the step fails only when
  *    every row failed (wonderful/step.py:360-365).
  *
  * Scale note: the listing is sink state (small — one entry per live doc),
  * broadcast to executors; data rows never collect to the driver.
  */
object UpsertSink {

  /** Executor-side transport. Implementations must be idempotent per name
    * (retry may re-send). Throw RetryableFailure for 429/5xx-class errors. */
  trait Transport extends Serializable {
    def list(tag: String): Map[String, String]              // name -> id
    def create(tag: String, name: String, content: String): String
    def update(id: String, content: String): Unit
    def delete(id: String): Unit
  }

  /** Transient failure that provably never reached the server (connect
    * timeout, connection refused) or is server-declared transient (429/5xx)
    * — always safe to retry (elevenlabs/step.py:105-124). */
  final class RetryableFailure(msg: String) extends RuntimeException(msg)

  /** Ambiguous-outcome failure: the request MAY have been processed (read
    * timeout after send). Retried only for idempotent calls — re-sending a
    * create would duplicate the document (elevenlabs/step.py:115-117). */
  final class ReadTimeoutFailure(msg: String) extends RuntimeException(msg)

  /** Capped full-jitter exponential backoff (reference base 0.5s, 3
    * attempts). `sleeper`/`jitter` are injectable for deterministic tests. */
  final case class RetryPolicy(
      attempts: Int = 3,
      baseMillis: Long = 500,
      capMillis: Long = 8000,
      sleeper: Long => Unit = Thread.sleep,
      jitter: Long => Long = max => (math.random() * max).toLong) extends Serializable {
    def run[T](op: () => T): T = run(op, idempotent = true)

    /** `idempotent = false` for calls that must not be re-sent after an
      * ambiguous outcome (creates) — reference `_with_retry(idempotent=)`. */
    def run[T](op: () => T, idempotent: Boolean): T = {
      var tryNo = 0
      while (true) {
        try return op()
        catch {
          case e: Exception if e.isInstanceOf[RetryableFailure] ||
              (idempotent && e.isInstanceOf[ReadTimeoutFailure]) =>
            tryNo += 1
            if (tryNo >= attempts) throw e
            // attempt index starts at 0: the FIRST retry's jitter window is
            // [0, base], matching the documented reference base 0.5s — the
            // pre-increment shift (1 << tryNo) doubled every tier
            sleeper(jitter(math.min(capMillis, baseMillis * (1L << (tryNo - 1)))))
          case e: Exception => throw e // non-retryable or non-idempotent-ambiguous
        }
      }
      throw new IllegalStateException("unreachable")
    }
  }

  final case class UpsertResult(created: Long, updated: Long, failed: Long, pruned: Long)

  /** Upsert df(nameCol, contentCol) into the KB under `tag`, then prune
    * stale names. Returns counts. */
  def upsert(df: DataFrame, nameCol: String, contentCol: String, tag: String,
             transport: Transport, retry: RetryPolicy = RetryPolicy()): UpsertResult = {
    val spark = df.sparkSession
    val existing = transport.list(tag)
    val existingB = spark.sparkContext.broadcast(existing)
    val created = spark.sparkContext.longAccumulator("upsert_created")
    val updated = spark.sparkContext.longAccumulator("upsert_updated")
    val failed = spark.sparkContext.longAccumulator("upsert_failed")
    val total = spark.sparkContext.longAccumulator("upsert_total")

    df.select(col(nameCol).as("name"), col(contentCol).as("content"))
      .foreachPartition { (it: Iterator[Row]) =>
        val ex = existingB.value
        it.foreach { r =>
          total.add(1)
          val name = r.getString(0)
          val content = r.getString(1)
          try {
            ex.get(name) match {
              case Some(id) => retry.run(() => transport.update(id, content)); updated.add(1)
              case None =>
                // create is NOT idempotent: a read timeout may have landed
                // the document, so it must not be re-sent
                retry.run(() => transport.create(tag, name, content), idempotent = false)
                created.add(1)
            }
          } catch { case _: Exception => failed.add(1) }
        }
      }

    if (total.value > 0 && failed.value == total.value)
      throw new IllegalStateException(
        s"all ${total.value} uploads failed (reference fail-if-all, wonderful/step.py:360-365)")

    // prune-stale: KB names under this tag not in the input (J2 anti-join,
    // elevenlabs/step.py:284-306). The anti-join runs distributed — the
    // input's name column is never collected (at corpus scale it is millions
    // of names); only the RESULT comes to the driver, and that is bounded by
    // the sink listing (one entry per live KB doc), not by the input.
    import spark.implicits._
    val existingDf = spark.createDataset(existing.toSeq).toDF("name", "id")
    val staleIds = existingDf
      .join(df.select(col(nameCol).as("name")), Seq("name"), "left_anti")
      .select("id").as[String].collect()
    staleIds.foreach(id => retry.run(() => { transport.delete(id); () }))

    UpsertResult(created.value, updated.value, failed.value, staleIds.length.toLong)
  }
}
