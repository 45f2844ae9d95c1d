package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.contracts.MarkdownDoc

/** One remote directory entry: full path + directory bit (the two fields
  * the reference reads off `SFTPAttributes`, sftp_manual_markdown.py:
  * listdir_attr + S_ISDIR). */
final case class RemoteEntry(path: String, isDir: Boolean)

/** Transport seam for remote file listings/reads. An SSH/SFTP client
  * (paramiko `Transport` + `SFTPClient` in the reference) drops in 1:1 —
  * `listdir_attr` -> list, `open().read()` -> read — and is the ONLY piece
  * this container cannot provide (no SSH library offline). */
trait RemoteFs extends java.io.Closeable {
  /** Entries of one directory level. Throws IOException on access failure. */
  def list(dir: String): Seq[RemoteEntry]
  def read(path: String): Array[Byte]
  override def close(): Unit = ()
}

object RemoteFs {
  /** Serializable connection factory: executors open one client per
    * partition (credentials/host config live in the factory instance). */
  trait Factory extends Serializable { def open(): RemoteFs }

  /** Local-filesystem implementation — the test/dev transport, and the
    * degenerate production case (mounted share). */
  final case class Local(root: String) extends Factory {
    def open(): RemoteFs = new RemoteFs {
      def list(dir: String): Seq[RemoteEntry] = {
        val d = new java.io.File(dir)
        val entries = d.listFiles()
        if (entries == null) throw new java.io.IOException(s"cannot list $dir")
        entries.toSeq.sortBy(_.getName)
          .map(f => RemoteEntry(f.getPath, f.isDirectory))
      }
      def read(path: String): Array[Byte] =
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    }
  }
}

/** SFTP markdown source (SURVEY.md §2.1 S2; reference
  * `SFTPManualMarkdownStep`, wurzel/steps/sftp/sftp_manual_markdown.py:
  * 41-227). The step's full algorithm runs against the [[RemoteFs]] seam:
  * recursive `.md` discovery with unreadable directories logged-and-skipped
  * (_find_markdown_files:168-185), per-file fetch + front-matter parse with
  * the keywords/url fallback rules (MarkdownDataContract.from_file,
  * common.py:96-149; url override to "<Step>/<remote path>" :218-221), a
  * load failure failing the step (StepFailed wrap :225-227), and
  * zero-documents failing the step (run :112-114).
  *
  * Scale shape: the DRIVER walks only the listing (paths + dir bits — the
  * reference is likewise listing-driven), while the byte fetches are
  * distributed: paths round-robin over partitions, one transport connection
  * per partition via [[RemoteFs.Factory]]. A large mirror pulls on every
  * executor in parallel instead of through a single channel, and document
  * bytes never pass through the driver. */
object SftpMarkdownSource {

  /** Recursive `.md` discovery. Mirrors the reference: an unreadable
    * directory is skipped (warning semantics -> caller metrics), descent is
    * gated by `recursive`. */
  def findMarkdownFiles(fs: RemoteFs, root: String, recursive: Boolean = true): Seq[String] = {
    val out = Seq.newBuilder[String]
    try {
      fs.list(root).foreach { e =>
        if (e.isDir) { if (recursive) out ++= findMarkdownFiles(fs, e.path, recursive) }
        else if (e.path.endsWith(".md")) out += e.path
      }
    } catch { case _: java.io.IOException => () } // skip unreadable dir
    out.result()
  }

  /** Full step: list driver-side, fetch + parse distributed. */
  def read(spark: SparkSession, factory: RemoteFs.Factory, root: String,
           recursive: Boolean = true,
           stepName: String = "SFTPManualMarkdown"): Dataset[MarkdownDoc] = {
    import spark.implicits._
    val lister = factory.open()
    val files = try findMarkdownFiles(lister, root, recursive) finally lister.close()
    if (files.isEmpty)
      throw new IllegalStateException(
        s"No Markdown files found under $root (reference StepFailed semantics)")
    val parallelism = spark.sparkContext.defaultParallelism
    val raw = spark.createDataset(files)
      .repartition(math.min(parallelism, files.length))
      .mapPartitions { paths =>
        val fs = factory.open()
        // close with the task, not eagerly: the read stays a LAZY iterator
        // so only one document's bytes are in memory per task at a time
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => fs.close()))
        // a failed read propagates and fails the step, as the reference's
        // StepFailed wrap does (sftp_manual_markdown.py:225-227)
        paths.map(p => (p, new String(fs.read(p), java.nio.charset.StandardCharsets.UTF_8)))
      }
      .toDF("path", "raw")
    MarkdownSource.parse(raw, stepName).as[MarkdownDoc]
  }
}
