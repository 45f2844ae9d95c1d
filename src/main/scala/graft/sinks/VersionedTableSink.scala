package graft.sinks

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.jdk.CollectionConverters._

/** Versioned-collection writer protocol (SURVEY.md §2.12 K1-K3; reference
  * QdrantConnectorStep wurzel/steps/qdrant/step.py:35-283 + retirement.py,
  * MilvusConnectorStep milvus/step.py:26-154).
  *
  * The reference's protocol, re-expressed on tables: write the new dataset
  * as `<name>_v{N+1}` (N = max existing version, qdrant/step.py:238-257),
  * verify the written row count (milvus/step.py:85-88), atomically repoint
  * the `<name>.alias` pointer (qdrant/step.py:224-236), then retire old
  * versions keeping the last `historyLen`, never the aliased one
  * (retirement.py:19-117). Vector-DB specifics (HNSW index build, payload
  * indices) map to table statistics/Z-ordering on a real deployment and are
  * intentionally out of scope; the versioning/alias/retirement lifecycle is
  * the portable part.
  *
  * At scale the data write is a plain distributed parquet write; only the
  * version bookkeeping (a directory listing + one pointer file) is
  * driver-side, O(#versions).
  */
final class VersionedTableSink(root: String, name: String, historyLen: Int = 10) {

  private def rootPath: Path = Paths.get(root)
  private val VersionRe = (java.util.regex.Pattern.quote(name) + "_v(\\d+)$").r

  def versions(): Seq[Int] = {
    if (!Files.isDirectory(rootPath)) return Seq.empty
    Files.list(rootPath).iterator().asScala
      .flatMap(p => VersionRe.findFirstMatchIn(p.getFileName.toString).map(_.group(1).toInt))
      .toSeq.sorted
  }

  def nextVersion(): Int = versions().lastOption.getOrElse(0) + 1

  def versionDir(v: Int): String = s"$root/${name}_v$v"

  def aliasFile: Path = rootPath.resolve(s"$name.alias")

  def aliasedVersion(): Option[Int] =
    if (Files.exists(aliasFile)) Some(new String(Files.readAllBytes(aliasFile), "UTF-8").trim.toInt)
    else None

  /** Write df as the next version; verify count; swap alias; retire. Returns
    * the new version number. Empty input never clobbers the alias
    * (reference skip-empty guard, s3/step.py:71-74). */
  def write(df: DataFrame): Int = {
    val expected = df.count()
    if (expected == 0) return aliasedVersion().getOrElse(0)
    val v = nextVersion()
    df.write.mode("errorifexists").parquet(versionDir(v))
    val written = df.sparkSession.read.parquet(versionDir(v)).count()
    require(written == expected, s"verify failed: wrote $written, expected $expected rows")
    swapAlias(v)
    retire()
    v
  }

  /** Atomic alias swap: temp file + ATOMIC_MOVE (reference
    * update_collection_aliases, qdrant/step.py:224-236). */
  def swapAlias(v: Int): Unit = {
    Files.createDirectories(rootPath)
    val tmp = rootPath.resolve(s".$name.alias.tmp")
    Files.write(tmp, v.toString.getBytes("UTF-8"))
    Files.move(tmp, aliasFile, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Read through the alias. */
  def readCurrent(spark: SparkSession): DataFrame = {
    val v = aliasedVersion().getOrElse(
      throw new IllegalStateException(s"no alias for $name"))
    spark.read.parquet(versionDir(v))
  }

  /** Keep the newest `historyLen` versions; never delete the aliased one
    * (reference retirement.py:44-55 keeps aliased/recently-used). */
  def retire(): Seq[Int] = {
    val alias = aliasedVersion()
    val all = versions()
    val stale = all.dropRight(historyLen).filterNot(alias.contains)
    stale.foreach { v =>
      val dir = Paths.get(versionDir(v))
      Files.walk(dir).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
    stale
  }
}
