package graft.sources

import java.nio.file.{Files, Paths}
import java.util
import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.example.data.Group
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{And => SAnd, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, IsNull, LessThan, LessThanOrEqual, Not => SNot, Or => SOr}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.core.TableStore

/** DataSource V2 catalog over [[graft.core.TableStore]]: register with
  *
  *   spark.sql.catalog.graft      = graft.sources.GraftCatalog
  *   spark.sql.catalog.graft.root = /path/to/store
  *
  * and plain SQL DML runs against store tables —
  *   SELECT ... FROM graft.<table>            (snapshot read, col pruning)
  *   INSERT INTO / INSERT OVERWRITE graft.<t> (GraftWrite batch path)
  *   DELETE FROM graft.<table> WHERE ...      (SupportsDelete -> store)
  *   UPDATE / MERGE INTO graft.<table> ...    (row-level operations,
  *                                             copy-on-write ReplaceData)
  *
  * The read path is a self-contained parquet-mr reader (one input
  * partition per live parquet file, as listed by the committed
  * manifest), so SQL reads observe the same atomic snapshot isolation
  * as TableStore.read; the requested projection is pushed into
  * parquet-mr. Flat schemas only (the engine's data model, SURVEY §1.2)
  * and INT64 timestamps (TableStore pins TIMESTAMP_MICROS output; INT96
  * legacy files are not supported).
  */
class GraftCatalog extends TableCatalog {
  private var catalogName: String = _
  private var root: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root")).getOrElse(
      throw new IllegalArgumentException(s"spark.sql.catalog.$name.root is required"))
  }

  override def name(): String = catalogName

  private def store: TableStore = new TableStore(SparkSession.active, root)

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = Paths.get(root)
    if (!Files.isDirectory(dir)) Array.empty
    else Files.list(dir).iterator().asScala
      .filter(p => Files.exists(p.resolve("_LATEST")))
      .map(p => Identifier.of(namespace, p.getFileName.toString))
      .toArray
  }

  override def loadTable(ident: Identifier): Table = {
    val t = ident.name()
    if (!store.exists(t))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        (ident.namespace() :+ ident.name()).toSeq)
    new GraftSqlTable(root, t)
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    store.createEmpty(ident.name(), schema)
    new GraftSqlTable(root, ident.name())
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("ALTER TABLE not supported")

  override def dropTable(ident: Identifier): Boolean = {
    val p = Paths.get(root, ident.name())
    if (!Files.exists(p)) false
    else { graft.core.FsUtil.deleteRecursively(p.toFile); true }
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("RENAME TABLE not supported")
}

/** A TableStore table exposed through DSv2. */
class GraftSqlTable(root: String, tableName: String)
    extends Table with SupportsRead with SupportsWrite with SupportsDelete
    with SupportsRowLevelOperations {

  private def store: TableStore = new TableStore(SparkSession.active, root)

  override def name(): String = tableName
  override def schema(): StructType = store.schemaOf(tableName)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)

  /** INSERT INTO (append) / INSERT OVERWRITE (truncate) via the
    * parquet-mr executor writers + one manifest version bump. */
  override def newWriteBuilder(info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new GraftWriteBuilder(root, tableName, info.schema())

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // resolve the snapshot's live files NOW: the scan stays pinned to
    // this version even if the table is mutated before execution
    val dataRoot = Paths.get(root, tableName, "data")
    val files = store.liveDirs(tableName).flatMap { d =>
      val leaf = dataRoot.resolve(d)
      if (!Files.isDirectory(leaf)) Seq.empty
      else Files.list(leaf).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .map(_.toString).toSeq
    }
    new GraftScanBuilder(schema(), files)
  }

  /** SQL MERGE INTO / UPDATE via group-based (copy-on-write) row-level
    * operations: the operation's scan reads the current snapshot, Spark
    * computes the full replacement rows per the MERGE/UPDATE clauses,
    * and the write commits them as a replace-all version — the same
    * rewrite the library-level TableStore merge performs. */
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder = { () =>
    new org.apache.spark.sql.connector.write.RowLevelOperation {
      override def command: org.apache.spark.sql.connector.write.RowLevelOperation.Command =
        info.command()
      override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
        GraftSqlTable.this.newScanBuilder(options)
      override def newWriteBuilder(
          wInfo: org.apache.spark.sql.connector.write.LogicalWriteInfo)
          : org.apache.spark.sql.connector.write.WriteBuilder =
        new GraftWriteBuilder(root, tableName, wInfo.schema(), replaceAll = true)
    }
  }

  /** DELETE FROM ... WHERE: v1 filters -> a Column predicate -> the
    * store's versioned delete (driver-side commit, full SQL semantics
    * for the supported filter shapes; unsupported shapes are rejected
    * so Spark falls back to an error, never silent wrong results). */
  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    filters.forall(translatable)

  override def deleteWhere(filters: Array[Filter]): Unit = {
    import org.apache.spark.sql.functions.{col => c, lit}
    def t(f: Filter): org.apache.spark.sql.Column = f match {
      case EqualTo(a, v) => c(a) === lit(v)
      case GreaterThan(a, v) => c(a) > lit(v)
      case GreaterThanOrEqual(a, v) => c(a) >= lit(v)
      case LessThan(a, v) => c(a) < lit(v)
      case LessThanOrEqual(a, v) => c(a) <= lit(v)
      case IsNull(a) => c(a).isNull
      case IsNotNull(a) => c(a).isNotNull
      case SAnd(l, r) => t(l) && t(r)
      case SOr(l, r) => t(l) || t(r)
      case SNot(x) => !t(x)
      case other => throw new UnsupportedOperationException(s"filter $other")
    }
    val cond = filters.map(t).reduceOption(_ && _)
      .getOrElse(lit(true)) // DELETE with no predicate = delete all
    store.delete(tableName, cond)
  }

  private def translatable(f: Filter): Boolean = f match {
    case _: EqualTo | _: GreaterThan | _: GreaterThanOrEqual | _: LessThan |
         _: LessThanOrEqual | _: IsNull | _: IsNotNull => true
    case SAnd(l, r) => translatable(l) && translatable(r)
    case SOr(l, r) => translatable(l) && translatable(r)
    case SNot(x) => translatable(x)
    case _ => false
  }
}

class GraftScanBuilder(schema: StructType, files: Seq[String])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new GraftScan(schema, required, files)
}

class GraftScan(fullSchema: StructType, required: StructType, files: Seq[String])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    files.map(f => GraftInputPartition(f): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new GraftReaderFactory(required)
}

case class GraftInputPartition(file: String) extends InputPartition

class GraftReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GraftPartitionReader(partition.asInstanceOf[GraftInputPartition].file, required)
}

/** Column-pruning ReadSupport: projects the FILE's own schema down to
  * the requested names, so field repetition (required vs optional)
  * always matches the file and unrequested columns are never decoded. */
class ProjectingGroupReadSupport(names: Seq[String]) extends GroupReadSupport {
  override def init(context: org.apache.parquet.hadoop.api.InitContext)
      : org.apache.parquet.hadoop.api.ReadSupport.ReadContext = {
    val fileSchema = context.getFileSchema
    val projected = new org.apache.parquet.schema.MessageType(
      fileSchema.getName,
      names.filter(fileSchema.containsField)
        .map(n => fileSchema.getFields.get(fileSchema.getFieldIndex(n))): _*)
    new org.apache.parquet.hadoop.api.ReadSupport.ReadContext(projected)
  }
}

/** parquet-mr Group reader -> InternalRow for the engine's flat types. */
class GraftPartitionReader(file: String, required: StructType)
    extends PartitionReader[InternalRow] {

  private val reader: ParquetReader[Group] =
    ParquetReader.builder(
        new ProjectingGroupReadSupport(required.fieldNames.toSeq),
        new org.apache.hadoop.fs.Path(file))
      .withConf(new Configuration())
      .build()
  private var current: Group = _

  override def next(): Boolean = {
    current = reader.read()
    current != null
  }

  override def get(): InternalRow = {
    val g = current
    val values = required.fields.map { f =>
      val idx = g.getType.getFieldIndex(f.name)
      if (g.getFieldRepetitionCount(idx) == 0) null
      else f.dataType match {
        case LongType => g.getLong(idx, 0)
        case IntegerType => g.getInteger(idx, 0)
        case DoubleType => g.getDouble(idx, 0)
        case FloatType => g.getFloat(idx, 0)
        case BooleanType => g.getBoolean(idx, 0)
        case StringType => UTF8String.fromString(g.getString(idx, 0))
        case TimestampType | TimestampNTZType => g.getLong(idx, 0) // INT64 micros
        case DateType => g.getInteger(idx, 0)
        case other => throw new UnsupportedOperationException(
          s"type $other (flat schemas only — SURVEY §1.2)")
      }
    }
    InternalRow.fromSeq(values.toIndexedSeq)
  }

  override def close(): Unit = reader.close()
}
