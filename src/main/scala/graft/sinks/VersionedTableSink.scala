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
  * Crash safety (K1 atomicity): a version COMMITS by the atomic creation of
  * its `<name>_v{N}.manifest` (count-verified, written via temp +
  * ATOMIC_MOVE) — the data directory alone is never trusted. The commit
  * order is data write -> count verify -> manifest -> alias swap (atomic) ->
  * GC, so a kill at ANY point leaves the previous alias resolving to an
  * intact committed version:
  *  - killed mid data write: partial dir, no manifest, alias untouched;
  *    the debris version number is burned (nextVersion counts dirs AND
  *    manifests) and the dir is GC'd after the next successful swap;
  *  - killed after manifest, before swap: a committed orphan — readable,
  *    never aliased, ages out via normal retirement;
  *  - killed mid GC: the manifest is deleted before its data dir, so a
  *    half-deleted version reads as uncommitted debris, cleaned next round;
  *  - the alias swap itself is a single ATOMIC_MOVE.
  *
  * At scale the data write is a plain distributed parquet write; only the
  * version bookkeeping (a directory listing + one pointer file) is
  * driver-side, O(#versions).
  */
final class VersionedTableSink(root: String, name: String, historyLen: Int = 10) {

  private def rootPath: Path = Paths.get(root)
  private val VersionRe = (java.util.regex.Pattern.quote(name) + "_v(\\d+)$").r
  private val ManifestRe = (java.util.regex.Pattern.quote(name) + "_v(\\d+)\\.manifest$").r

  /** Committed versions only — a data dir without its manifest is crash
    * debris and is invisible to readers and retirement ordering.
    *
    * Legacy roots (pre-manifest format: an alias exists but NO manifest
    * does) are grandfathered: every data dir at or below the alias counts
    * as committed — under the old protocol each of those was count-verified
    * at its own write, while a dir ABOVE the alias is an old crashed write.
    * The first write() adopts them physically (synthesizes manifests), so
    * a mixed state never ages into data loss. */
  def versions(): Seq[Int] = {
    if (!Files.isDirectory(rootPath)) return Seq.empty
    val entries = allEntries().toSeq
    if (isLegacyRoot(entries))
      entries.collect { case (v, true, _) if aliasedVersion().exists(v <= _) => v }.sorted
    else entries.collect { case (v, dir, manifest) if dir && manifest => v }.sorted
  }

  /** Pre-manifest layout: an alias pointer but zero manifests. */
  private def isLegacyRoot(entries: Seq[(Int, Boolean, Boolean)]): Boolean =
    entries.nonEmpty && entries.forall(!_._3) && Files.exists(aliasFile)

  /** Synthesize manifests for grandfathered legacy versions so the root is
    * fully on the manifest protocol before new bookkeeping runs. */
  private def adoptLegacy(): Unit = {
    val entries = allEntries().toSeq
    if (isLegacyRoot(entries))
      entries.foreach { case (v, dir, _) =>
        if (dir && aliasedVersion().exists(v <= _)) commitManifest(v, -1L) // rows unknown
      }
  }

  /** (version, hasDataDir, hasManifest) for every version number present. */
  private def allEntries(): Iterator[(Int, Boolean, Boolean)] = {
    if (!Files.isDirectory(rootPath)) return Iterator.empty
    val listing = Files.list(rootPath)
    val names = try listing.iterator().asScala.map(_.getFileName.toString).toSeq
                finally listing.close() // Files.list leaks a dir handle unless closed
    val dirs = names.flatMap(n => VersionRe.findFirstMatchIn(n).map(_.group(1).toInt)).toSet
    val manifests = names.flatMap(n => ManifestRe.findFirstMatchIn(n).map(_.group(1).toInt)).toSet
    (dirs ++ manifests).iterator.map(v => (v, dirs(v), manifests(v)))
  }

  /** Max over data dirs AND manifests + 1: a crashed write burns its
    * version number, so `errorifexists` can never collide with debris. */
  def nextVersion(): Int =
    allEntries().map(_._1).maxOption.getOrElse(0) + 1

  def versionDir(v: Int): String = s"$root/${name}_v$v"

  def manifestFile(v: Int): Path = rootPath.resolve(s"${name}_v$v.manifest")

  def aliasFile: Path = rootPath.resolve(s"$name.alias")

  def aliasedVersion(): Option[Int] =
    if (Files.exists(aliasFile)) Some(new String(Files.readAllBytes(aliasFile), "UTF-8").trim.toInt)
    else None

  /** Write df as the next version; verify count; commit manifest; swap
    * alias; GC. Returns the new version number. Empty input never clobbers
    * the alias (reference skip-empty guard, s3/step.py:71-74). */
  def write(df: DataFrame): Int = {
    adoptLegacy()
    val expected = df.count()
    if (expected == 0) return aliasedVersion().getOrElse(0)
    val v = nextVersion()
    df.write.mode("errorifexists").parquet(versionDir(v))
    val written = df.sparkSession.read.parquet(versionDir(v)).count()
    require(written == expected, s"verify failed: wrote $written, expected $expected rows")
    commitManifest(v, written)
    swapAlias(v)
    retire()
    v
  }

  /** The versioning protocol with a caller-supplied payload writer — for
    * collections whose payload is a SET of stores rather than one
    * DataFrame (graft.operators.HybridServe versions its four serving
    * artifacts as one unit this way). `writePayload` populates the fresh
    * version directory and returns the verified row count; the
    * commit-order guarantees are [[write]]'s exactly (manifest only after
    * the payload verifies, atomic alias swap, GC last). A zero count is
    * the empty-input guard: no manifest is committed and the alias is
    * never clobbered. The written directory is LEFT IN PLACE as ordinary
    * manifest-less crash debris — invisible to readers, GC'd after the
    * next successful swap — so the version number stays burned exactly as
    * the crash-safety contract requires (nextVersion counts dirs AND
    * manifests; deleting the dir here would hand the same number to the
    * next writer, whose payload writer may legitimately use
    * `errorifexists` and collide). */
  def writeVia(writePayload: String => Long): Int = {
    adoptLegacy()
    val v = nextVersion()
    val dir = versionDir(v)
    val rows = writePayload(dir)
    if (rows == 0) return aliasedVersion().getOrElse(0)
    commitManifest(v, rows)
    swapAlias(v)
    retire()
    v
  }

  /** Atomic commit marker: `rows=<n>` written via temp + ATOMIC_MOVE. Until
    * this exists the version is invisible (crash debris). */
  private def commitManifest(v: Int, rows: Long): Unit = {
    val tmp = rootPath.resolve(s".${name}_v$v.manifest.tmp")
    Files.write(tmp, s"rows=$rows\n".getBytes("UTF-8"))
    Files.move(tmp, manifestFile(v), StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
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

  /** GC, only ever called AFTER a successful swap: drop committed versions
    * beyond the newest `historyLen` (never the aliased one — reference
    * retirement.py:44-55 keeps aliased/recently-used) and uncommitted
    * crash debris older than the alias (version numbers only grow, so
    * pre-alias debris can never complete). The manifest is deleted before
    * its data dir so a kill mid-GC degrades a version to debris, never to
    * a committed-but-partial table.
    *
    * `dryRun = true` reports what WOULD retire without deleting (reference
    * retirement DRY_RUN setting — case "dry_run_retains_all"). Directories
    * whose name doesn't match `<name>_v<int>` are untracked and never
    * touched (reference retains malformed/foreign collection names). */
  def retire(dryRun: Boolean = false): Seq[Int] = {
    val alias = aliasedVersion()
    val committed = versions()
    val staleCommitted = committed.dropRight(historyLen).filterNot(alias.contains)
    if (dryRun) return staleCommitted
    val debris = allEntries().collect {
      case (v, _, false) if alias.exists(v < _) => v
    }.toSeq.sorted
    (staleCommitted ++ debris).foreach { v =>
      Files.deleteIfExists(manifestFile(v))
      val dir = Paths.get(versionDir(v))
      if (Files.exists(dir)) {
        val walk = Files.walk(dir)
        val paths = try walk.iterator().asScala.toSeq finally walk.close()
        paths.reverse.foreach(Files.delete)
      }
    }
    staleCommitted
  }
}

/** Payload-hash enrichment (reference `QdrantConnectorStep
  * .get_available_hashes`, qdrant/step.py:259-283: every upserted point's
  * payload carries `text_sha256_hash` plus `text_tlsh_hash` when the TLSH
  * lib is present, step.py:94-101; schema qdrant/data.py:14,22). Attach
  * before `VersionedTableSink.write` to reproduce the reference payload.
  * TLSH is nullable by contract — short/low-variation texts have no digest.
  */
object VersionedTableSink {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{col, lower, sha2}

  /** The reference's available hashes as columns of `textCol`. */
  def withPayloadHashes(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("text_sha256_hash", sha256Of(col(textCol)))
      .withColumn("text_tlsh_hash", graft.functions.Tlsh.hashUdf(col(textCol)))

  /** sha256 hex of the column's UTF-8 bytes (step.py:282 hexdigest —
    * lowercase). Built-in `sha2` keeps this codegen'd. */
  def sha256Of(c: Column): Column = lower(sha2(c, 256))
}
