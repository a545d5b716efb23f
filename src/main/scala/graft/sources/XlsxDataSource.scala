package graft.sources

import java.io.{IOException, ObjectInputStream, ObjectOutputStream}
import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportStatistics}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual, StringEndsWith}
import org.apache.spark.sql.types.{DoubleType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `.xlsx` workbooks as a first-class DataSource V2 table:
  * {{{ spark.read.format("xlsx").load(dir) }}}
  * yields the `(file, row, col, str, num)` cell grid that
  * [[AsylumGrids.asylumFromCells]] (and any other consumer of decoded
  * sheets) operates on — the reference's workbook ingest
  * (`/root/reference/scripts/parse_excel_files.py:16-27`, xlrd) as a
  * declarative scan instead of a helper method.
  *
  * Same decoder, better engine integration than [[Xlsx.cellGrid]]:
  *   - one [[InputPartition]] PER WORKBOOK — a 10,000-file drop plans
  *     10,000 independent tasks with no driver-side decode;
  *   - column pruning pushes into the scan
  *     ([[SupportsPushDownRequiredColumns]]): `select(count(num))` never
  *     allocates the string cells;
  *   - the Hadoop conf travels to executors via Writable serialization,
  *     so any configured filesystem (file://, hdfs://, s3a://) resolves
  *     on the task side exactly as the driver saw it.
  *
  * The decode itself stays [[Xlsx.decodeFirstSheet]] — zip + two StAX
  * passes over public-spec OOXML parts, no external library.
  */
final class XlsxDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "xlsx"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    XlsxDataSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null && path.nonEmpty, "xlsx source requires a load(path)")
    new XlsxTable(path)
  }
}

object XlsxDataSource {
  /** Fixed cell-grid schema: exactly one of (str, num) is set per cell,
    * mirroring the xlrd float-vs-text dichotomy the reference keys on.
    */
  val schema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("row", IntegerType, nullable = false),
    StructField("col", IntegerType, nullable = false),
    StructField("str", StringType, nullable = true),
    StructField("num", DoubleType, nullable = true)))
}

private final class XlsxTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"xlsx:$path"
  override def schema(): StructType = XlsxDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new XlsxScanBuilder(path)
}

private final class XlsxScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var required: StructType = XlsxDataSource.schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Accept `file` equality/membership/suffix filters (they prune WHOLE
    * workbook partitions at planning time — the decode never runs) and
    * `row`/`col` comparisons (applied per cell inside the reader, before
    * row materialization). Everything accepted is also kept as a residual
    * upstairs (we return the full set), so Spark double-checks — the
    * pushdown is a pruning optimization, never a correctness dependency.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(XlsxFilters.supported)
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new XlsxScan(path, required, pushed)
}

/** The simple-predicate subset the xlsx scan understands. */
private object XlsxFilters {
  def supported(f: Filter): Boolean = f match {
    case EqualTo("file", _: String) => true
    case In("file", vs) => vs.forall(_.isInstanceOf[String])
    case StringEndsWith("file", _) => true
    case EqualTo(a, _) if a == "row" || a == "col" => true
    case GreaterThan(a, _) if a == "row" || a == "col" => true
    case GreaterThanOrEqual(a, _) if a == "row" || a == "col" => true
    case LessThan(a, _) if a == "row" || a == "col" => true
    case LessThanOrEqual(a, _) if a == "row" || a == "col" => true
    case _ => false
  }

  /** Does workbook `file` survive the file-level predicates? */
  def keepFile(file: String, filters: Array[Filter]): Boolean = filters.forall {
    case EqualTo("file", v: String) => file == v
    case In("file", vs) => vs.contains(file)
    case StringEndsWith("file", suffix) => file.endsWith(suffix)
    case _ => true // row/col filters don't constrain the file list
  }

  /** Does a decoded cell survive the row/col predicates? */
  def keepCell(c: Xlsx.Cell, filters: Array[Filter]): Boolean = filters.forall {
    case EqualTo("row", v: Int) => c.row == v
    case GreaterThan("row", v: Int) => c.row > v
    case GreaterThanOrEqual("row", v: Int) => c.row >= v
    case LessThan("row", v: Int) => c.row < v
    case LessThanOrEqual("row", v: Int) => c.row <= v
    case EqualTo("col", v: Int) => c.col == v
    case GreaterThan("col", v: Int) => c.col > v
    case GreaterThanOrEqual("col", v: Int) => c.col >= v
    case LessThan("col", v: Int) => c.col < v
    case LessThanOrEqual("col", v: Int) => c.col <= v
    case _ => true
  }
}

private final class XlsxScan(path: String, required: StructType,
                             filters: Array[Filter])
    extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** Report the post-pruning byte size so Catalyst's join planning sees a
    * real estimate (a pruned-to-one-workbook scan should broadcast). The
    * compressed-zip size understates decoded width; workbook XML inflates
    * roughly 5× and the estimate only needs the right order of magnitude.
    */
  override def estimateStatistics(): Statistics = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val pattern = if (fs.isDirectory(p)) new Path(p, "*.xlsx") else p
    val bytes = Option(fs.globStatus(pattern)).getOrElse(Array.empty)
      .filter(st => st.isFile && XlsxFilters.keepFile(st.getPath.toString, filters))
      .map(_.getLen).sum
    new Statistics {
      override def sizeInBytes(): util.OptionalLong = util.OptionalLong.of(bytes * 5)
      override def numRows(): util.OptionalLong = util.OptionalLong.empty()
    }
  }

  /** Driver-side: LIST the workbooks (names only — no decode), then drop
    * every partition the pushed `file` predicates rule out. A directory
    * lists `*.xlsx` inside it; anything else is treated as a file or
    * glob, matching `spark.read` path conventions.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val pattern = if (fs.isDirectory(p)) new Path(p, "*.xlsx") else p
    val statuses = Option(fs.globStatus(pattern)).getOrElse(Array.empty)
    require(statuses.nonEmpty, s"no workbooks match $pattern")
    val serConf = new SerializableHadoopConf(conf)
    statuses.filter(_.isFile).sortBy(_.getPath.toString)
      .filter(st => XlsxFilters.keepFile(st.getPath.toString, filters))
      .map(st => XlsxInputPartition(st.getPath.toString, serConf): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new XlsxReaderFactory(required, filters)

  override def description(): String =
    s"xlsx $path, PushedFilters: ${filters.mkString("[", ", ", "]")}"
}

/** One workbook = one partition = one task. */
private final case class XlsxInputPartition(file: String, conf: SerializableHadoopConf)
  extends InputPartition

private final class XlsxReaderFactory(required: StructType, filters: Array[Filter])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[XlsxInputPartition]
    new XlsxPartitionReader(p.file, p.conf.value, required, filters)
  }
}

/** Executor-side: pull the workbook bytes through the (deserialized)
  * Hadoop conf, decode once lazily on first `next()`, then iterate cells
  * projected to the pruned schema.
  */
private final class XlsxPartitionReader(file: String, conf: Configuration,
                                        required: StructType, filters: Array[Filter])
    extends PartitionReader[InternalRow] {
  private var cells: Iterator[Xlsx.Cell] = _
  private var current: Xlsx.Cell = _
  private val fileUtf8 = UTF8String.fromString(file)

  // the required-schema-position → cell-field mapping is fixed for the
  // partition; resolve the name matches ONCE instead of per row per field
  private val extractors: Array[Xlsx.Cell => Any] =
    required.fields.map[Xlsx.Cell => Any] { f =>
      f.name match {
        case "file" => _ => fileUtf8
        case "row" => c => c.row
        case "col" => c => c.col
        case "str" => c => if (c.str == null) null else UTF8String.fromString(c.str)
        case "num" => c => c.num.map(Double.box).orNull
        case other => throw new IllegalArgumentException(s"unknown column $other")
      }
    }

  override def next(): Boolean = {
    if (cells == null) {
      val path = new Path(file)
      val fs = path.getFileSystem(conf)
      val in = fs.open(path)
      val bytes = try in.readAllBytes() finally in.close()
      cells = Xlsx.decodeFirstSheet(bytes).iterator
        .filter(XlsxFilters.keepCell(_, filters))
    }
    if (cells.hasNext) { current = cells.next(); true } else false
  }

  override def get(): InternalRow = {
    val values = new Array[Any](extractors.length)
    var i = 0
    while (i < extractors.length) {
      values(i) = extractors(i)(current)
      i += 1
    }
    new GenericInternalRow(values)
  }

  override def close(): Unit = { cells = null }
}

/** Hadoop `Configuration` is not `java.io.Serializable`; ship it to tasks
  * via its own Writable representation (the standard wrapper pattern —
  * Spark's internal equivalent is `private[spark]`). Shared by every
  * graft DSv2 source that opens files on executors.
  */
private[sources] final class SerializableHadoopConf(
    @transient private var conf: Configuration) extends Serializable {
  def value: Configuration = conf

  @throws(classOf[IOException])
  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    conf.write(out)
  }

  @throws(classOf[IOException])
  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    conf = new Configuration(false)
    conf.readFields(in)
  }
}
