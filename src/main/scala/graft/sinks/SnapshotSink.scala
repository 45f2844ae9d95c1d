package graft.sinks

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.DataFrame

/** Pass-through snapshot sink (SURVEY.md §2.12 K4; reference
  * `S3MarkdownStep` wurzel/steps/s3/step.py:23-101): write the dataset as a
  * timestamped snapshot plus a `latest` pointer, return the input unchanged
  * so downstream steps keep flowing. Guarantees preserved: an EMPTY input
  * never clobbers `latest` (s3/step.py:71-74); the pointer update is atomic.
  */
final class SnapshotSink(root: String, prefix: String = "snapshot") {

  def write(df: DataFrame, runId: String): DataFrame = {
    if (df.isEmpty) return df // never clobber latest on empty input
    val dir = s"$root/$prefix-$runId"
    df.write.mode("errorifexists").json(dir)
    val rootP = Paths.get(root)
    Files.createDirectories(rootP)
    val tmp = rootP.resolve(s".latest.tmp")
    Files.write(tmp, dir.getBytes("UTF-8"))
    Files.move(tmp, rootP.resolve("latest"), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    df
  }

  def latest(): Option[String] = {
    val p = Paths.get(root).resolve("latest")
    if (Files.exists(p)) Some(new String(Files.readAllBytes(p), "UTF-8").trim) else None
  }
}
