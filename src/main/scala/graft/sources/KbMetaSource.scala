package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** DataSource V2 reader over a VersionedTableSink's catalog state
  * (SURVEY.md §2.1 S2 maps bespoke sources to "custom DataSource V2
  * reader" — this is the engine's reference implementation of that slot).
  *
  * `spark.read.format("graft.sources.KbMetaSource").option("root", ...)
  * .option("name", ...)` yields one row per stored version:
  * (version INT, path STRING, aliased BOOLEAN, num_files BIGINT) — the
  * sink's operational metadata queryable through the standard scan path
  * (column pruning, SQL, joins against run logs). Data itself stays on the
  * parquet fast path via `VersionedTableSink.readCurrent`.
  */
class KbMetaSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = KbMetaSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new KbMetaTable(properties.get("root"), properties.get("name"))
}

object KbMetaSource {
  val schema: StructType = StructType(Seq(
    StructField("version", IntegerType, nullable = false),
    StructField("path", StringType, nullable = false),
    StructField("aliased", BooleanType, nullable = false),
    StructField("num_files", LongType, nullable = false)))
}

final class KbMetaTable(root: String, kbName: String) extends Table with SupportsRead {
  require(root != null && kbName != null, "options 'root' and 'name' are required")

  override def name(): String = s"kbmeta:$root/$kbName"
  override def schema(): StructType = KbMetaSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = KbMetaSource.schema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] =
        Array(KbMetaPartition(root, kbName))
      override def createReaderFactory(): PartitionReaderFactory = new KbMetaReaderFactory
    }
}

final case class KbMetaPartition(root: String, kbName: String) extends InputPartition

final class KbMetaReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[KbMetaPartition]
    val sink = new graft.sinks.VersionedTableSink(p.root, p.kbName)
    val aliased = sink.aliasedVersion()
    val rows = sink.versions().map { v =>
      val dir = new java.io.File(sink.versionDir(v))
      val nFiles = Option(dir.listFiles()).map(_.count(_.getName.endsWith(".parquet"))).getOrElse(0)
      InternalRow(v, UTF8String.fromString(sink.versionDir(v)), aliased.contains(v), nFiles.toLong)
    }.iterator
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean = { val has = rows.hasNext; if (has) current = rows.next(); has }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
