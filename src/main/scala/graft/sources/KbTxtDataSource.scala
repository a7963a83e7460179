package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, In, IsNotNull, StringContains, StringEndsWith, StringStartsWith}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 provider for the reference's header/body export format
  * (TextProcessor.py:21-31, one `Key: value` header block, a `---`
  * separator, then the body) — the engine-native way to mount an export
  * directory as a table:
  *
  *   spark.read.format("graft-kbtxt").load(dir)
  *
  * Schema: (file string, meta map<string,string>, body string) — the same
  * rows [[KnowledgeFiles.read]] produces with column expressions.
  * V2 surface implemented: schema inference, balanced multi-file input
  * partitions (size-binned, so one huge export can't skew a task),
  * column pruning (`SupportsPushDownRequiredColumns` — a `select(file)`
  * never parses headers or carries bodies), and file-name filter
  * pushdown (`SupportsPushDownFilters` — equality/prefix/suffix/contains
  * predicates on `file` prune the file list at planning time, the
  * export-directory analog of partition pruning). Write path stays
  * [[KnowledgeFiles.write]]: the reference's one-file-per-chunk contract
  * is a row-wise sink, not a table format.
  */
class KbTxtDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-kbtxt"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KbTxtTable.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new KbTxtTable(properties.get("path"))
}

object KbTxtTable {
  val schema: StructType = StructType(Seq(
    StructField("file", StringType),
    StructField("meta", MapType(StringType, StringType)),
    StructField("body", StringType)))
}

class KbTxtTable(dir: String) extends Table with SupportsRead {
  require(dir != null, "path required: .format(\"graft-kbtxt\").load(dir)")
  override def name(): String = s"kbtxt:$dir"
  override def schema(): StructType = KbTxtTable.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new KbTxtScanBuilder(dir)
}

class KbTxtScanBuilder(dir: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = KbTxtTable.schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Filters on the `file` column prune the FILE LIST at planning time —
    * the export-directory analog of partition pruning: a
    * `filter(file = 'x.txt')` opens one file, not the directory. All
    * filters are also returned as residual (Spark re-evaluates them
    * post-scan), so the pruning is a pure optimization and can never
    * change results. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(KbTxtScan.prunesFiles)
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new KbTxtScan(dir, required, pushed)
}

case class KbTxtInputPartition(files: Array[String]) extends InputPartition

object KbTxtScan {
  /** Is this a filter the scan can use to prune file names? */
  def prunesFiles(f: Filter): Boolean = f match {
    case EqualTo("file", _) | In("file", _) | IsNotNull("file") => true
    case StringStartsWith("file", _) | StringEndsWith("file", _)
       | StringContains("file", _) => true
    case _ => false
  }

  /** Evaluate a pushed filter against a file NAME (never reads content). */
  def fileMatches(name: String, f: Filter): Boolean = f match {
    case EqualTo("file", v)          => name == String.valueOf(v)
    case In("file", vs)              => vs.exists(v => name == String.valueOf(v))
    case IsNotNull("file")           => true
    case StringStartsWith("file", p) => name.startsWith(p)
    case StringEndsWith("file", p)   => name.endsWith(p)
    case StringContains("file", p)   => name.contains(p)
    case _ => true
  }
}

class KbTxtScan(dir: String, required: StructType,
    pushed: Array[Filter] = Array.empty) extends Batch with Scan {
  override def readSchema(): StructType = required
  override def description(): String =
    s"KbTxtScan dir=$dir ReadSchema=${required.fieldNames.mkString(",")}" +
      s" PushedFilters=[${pushed.mkString(", ")}]"
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val files = Files.list(Paths.get(dir)).iterator().asScala
      .filter(_.toString.endsWith(".txt")).toSeq
      .filter(p => pushed.forall(f =>
        KbTxtScan.fileMatches(p.getFileName.toString, f)))
      .map(p => (p.toString, Files.size(p))).sortBy(-_._2)
    if (files.isEmpty) return Array.empty
    // size-binned greedy packing into up to 32 balanced splits — one
    // oversized export file cannot skew a task beyond its own size
    val n = math.min(32, files.length)
    val bins = Array.fill(n)((scala.collection.mutable.ArrayBuffer.empty[String], Array(0L)))
    files.foreach { case (f, sz) =>
      val b = bins.minBy(_._2(0)); b._1 += f; b._2(0) += sz
    }
    bins.filter(_._1.nonEmpty).map(b => KbTxtInputPartition(b._1.toArray): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new KbTxtReaderFactory(required)
}

class KbTxtReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new KbTxtReader(partition.asInstanceOf[KbTxtInputPartition].files, required)
}

/** Per-partition reader: same parse semantics as [[KnowledgeFiles.read]]
  * (limit-2 split on `---`, `k: v` header lines, missing separator →
  * null body). Only the projected columns are computed. */
class KbTxtReader(files: Array[String], required: StructType)
    extends PartitionReader[InternalRow] {
  private var ix = -1
  private var row: InternalRow = _

  private val needMeta = required.fieldNames.contains("meta")
  private val needBody = required.fieldNames.contains("body")

  override def next(): Boolean = {
    ix += 1
    if (ix >= files.length) return false
    row = parse(Paths.get(files(ix)))
    true
  }

  private def parse(p: Path): InternalRow = {
    val vals = new Array[Any](required.length)
    lazy val raw = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
    lazy val sepIx = raw.indexOf("---")
    required.fieldNames.zipWithIndex.foreach {
      case ("file", i) => vals(i) = UTF8String.fromString(p.getFileName.toString)
      case ("meta", i) if needMeta =>
        val header = if (sepIx >= 0) raw.substring(0, sepIx) else raw
        val kvs = header.split("\n").toSeq.filter(_.contains(":")).map { l =>
          val Array(k, v) = l.split(":", 2)
          UTF8String.fromString(k.trim) -> UTF8String.fromString(v.trim)
        }
        vals(i) = ArrayBasedMapData(kvs.toMap)
      case ("body", i) if needBody =>
        vals(i) = if (sepIx < 0) null
          else UTF8String.fromString(
            raw.substring(sepIx + 3).replaceAll("^[ \n\r\t]+|[ \n\r\t]+$", ""))
      case _ => ()
    }
    InternalRow.fromSeq(vals.toIndexedSeq)
  }

  override def get(): InternalRow = row
  override def close(): Unit = ()
}
