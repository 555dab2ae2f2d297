package graft.sources

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import java.util

/** The SQLite read-back source as a proper DataSource V2 `format` — the
  * idiomatic face of [[SqliteSource]]:
  *
  * {{{
  *   spark.read.format("sqlite")
  *     .option("table", "candles")          // default "candles"
  *     .load("/stores/ccxt")                 // file OR directory tree
  * }}}
  *
  * Planning shape (how a file-format source should sit on a cluster):
  *  - the `.sqlite` FILES under the path are the parallelism unit — one
  *    input partition per file (the reference layout is one small file
  *    per (exchange, symbol, timeframe) series, exactly the export
  *    fan-out inverted); file listing is driver-side and dim-scale;
  *  - schema is inferred once from the FIRST file's CREATE TABLE (the
  *    reference layout is schema-homogeneous by construction) via the
  *    sqlite affinity rules;
  *  - COLUMN PRUNING is pushed into the source
  *    (SupportsPushDownRequiredColumns): the reader decodes only the
  *    serial-type prefix it needs per record and materializes only the
  *    requested columns into the InternalRow — a `select(close)` over a
  *    six-column store never builds the other five values.
  *
  * Values map by the declared column affinity (INTEGER → long, REAL →
  * double, TEXT → UTF8String, BLOB → bytes), the INTEGER PRIMARY KEY
  * rowid alias materializes from the rowid, and nulls pass through —
  * the same contract [[SqliteSource.readTable]] round-trips.
  */
class SqliteDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "sqlite"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SqliteDataSource.schemaFor(SqliteDataSource.filesFor(options), tableOf(options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new SqliteTable(schema, SqliteDataSource.filesFor(opts), tableOf(opts))
  }

  private def tableOf(options: CaseInsensitiveStringMap): String =
    options.getOrDefault("table", "candles")
}

private[sources] object SqliteDataSource {
  def filesFor(options: CaseInsensitiveStringMap): Seq[String] = {
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("sqlite source requires a path"))
    val root = new java.io.File(path)
    val files =
      if (root.isFile) Seq(root.getAbsolutePath)
      else SqliteSource.storeFiles(root).map(_.getAbsolutePath)
    if (files.isEmpty) throw new IllegalArgumentException(
      s"no .sqlite/.db files under $path")
    files
  }

  def schemaFor(files: Seq[String], table: String): StructType = {
    val data = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(files.head))
    val info = SqliteSource.tables(data).find(_.name == table).getOrElse(
      throw new IllegalArgumentException(
        s"table '$table' not found in ${files.head}; file has: " +
          SqliteSource.tables(data).map(_.name).mkString(", ")))
    val cols = SqliteSource.parseColumns(info.createSql)
    StructType(cols.map { case (n, d, ipk) =>
      StructField(n, if (ipk) LongType else SqliteSource.affinity(d),
        nullable = !ipk)
    })
  }
}

private[sources] class SqliteTable(schema: StructType, files: Seq[String],
                                   table: String) extends Table with SupportsRead {
  override def name(): String = s"sqlite:$table"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SqliteScanBuilder(schema, files, table)
}

private[sources] class SqliteScanBuilder(full: StructType, files: Seq[String],
                                         table: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  import org.apache.spark.sql.sources._
  private var required: StructType = full
  private var lo: Long = Long.MinValue
  private var hi: Long = Long.MaxValue
  private var pushed: Array[Filter] = Array.empty
  // the rowid-alias column is the ONLY one whose predicates prune the
  // b-tree walk (the tree is keyed by it); derived from the first file
  private lazy val ipk: Option[String] = SqliteSource.ipkColumn(
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(files.head)), table)

  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve the FILE's column order so ordinal decoding stays aligned
    required = StructType(full.fields.filter(f =>
      requiredSchema.fieldNames.contains(f.name)))

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    def long(v: Any): Option[Long] = v match {
      case l: Long => Some(l)
      case i: Int => Some(i.toLong)
      case s: Short => Some(s.toLong)
      case b: Byte => Some(b.toLong)
      case _ => None
    }
    val accepted = filters.filter { f =>
      ipk.exists { pk =>
        f match {
          case EqualTo(`pk`, v) => long(v).exists { l =>
            lo = math.max(lo, l); hi = math.min(hi, l); true }
          case GreaterThan(`pk`, v) => long(v).exists { l =>
            lo = math.max(lo, l + 1); true }
          case GreaterThanOrEqual(`pk`, v) => long(v).exists { l =>
            lo = math.max(lo, l); true }
          case LessThan(`pk`, v) => long(v).exists { l =>
            hi = math.min(hi, l - 1); true }
          case LessThanOrEqual(`pk`, v) => long(v).exists { l =>
            hi = math.min(hi, l); true }
          case _ => false
        }
      }
    }
    pushed = accepted
    // everything is returned as residual: Spark re-applies the rowid
    // predicates post-scan (idempotent) and evaluates the rest itself
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new SqliteScan(full, required, files, table, lo, hi, ipk)
}

private[sources] class SqliteScan(full: StructType, required: StructType,
                                  files: Seq[String], table: String,
                                  lo: Long, hi: Long, ipk: Option[String])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    files.map(f => SqliteInputPartition(f): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new SqliteReaderFactory(full, required, table, lo, hi, ipk)
  override def description(): String = {
    val range =
      if (lo == Long.MinValue && hi == Long.MaxValue) ""
      else s" rowid=[${if (lo == Long.MinValue) "" else lo}..${if (hi == Long.MaxValue) "" else hi}]"
    s"sqlite table=$table files=${files.size} columns=${required.fieldNames.mkString(",")}$range"
  }
}

private[sources] case class SqliteInputPartition(path: String) extends InputPartition

private[sources] class SqliteReaderFactory(full: StructType, required: StructType,
                                           table: String, lo: Long, hi: Long,
                                           ipk: Option[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val path = partition.asInstanceOf[SqliteInputPartition].path
    new SqlitePartitionReader(path, full, required, table, lo, hi, ipk)
  }
}

/** Decodes one file's table b-tree into pruned InternalRows. The whole
  * file parses in the constructor (per-series files are task-sized by
  * the export contract); rows stream to Spark through the iterator.
  */
private[sources] class SqlitePartitionReader(path: String, full: StructType,
                                             required: StructType, table: String,
                                             lo: Long, hi: Long, ipk: Option[String])
    extends PartitionReader[InternalRow] {
  private val rows: Iterator[InternalRow] = {
    val data = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val wanted = required.fieldNames.map(full.fieldIndex).toSet
    // the pushed [lo, hi] range is a ROWID range, valid for THIS file
    // only if its table aliases the rowid to the same column the range
    // was derived from (schema inference reads files.head; a foreign
    // file in the tree may declare the column without the alias, where
    // rowids are unrelated sequence numbers) — otherwise fall back to a
    // full walk and let Spark's residual filter do the work: correct
    // rows always, pruning only where it is sound
    val boundsApply = ipk.isDefined &&
      SqliteSource.ipkColumn(data, table) == ipk
    val (fLo, fHi) =
      if (boundsApply) (lo, hi) else (Long.MinValue, Long.MaxValue)
    val (schema, decoded) =
      SqliteSource.decodeTable(data, table, wanted.contains, fLo, fHi)
    // full StructType equality (names AND types): a name-only check lets
    // a type-divergent file through to an opaque executor-side
    // ClassCastException instead of this message
    require(schema == full,
      s"$path: schema $schema does not match the inferred $full — " +
        "heterogeneous store tree")
    val ords = required.fieldNames.map(full.fieldIndex)
    val types = required.fields.map(_.dataType)
    decoded.iterator.map { r =>
      InternalRow.fromSeq(ords.zip(types).toIndexedSeq.map { case (o, t) =>
        if (r.isNullAt(o)) null
        else t match {
          case LongType => r.getLong(o)
          case DoubleType => r.getDouble(o)
          case StringType => UTF8String.fromString(r.getString(o))
          case BinaryType => r.getAs[Array[Byte]](o)
          case other => throw new IllegalStateException(other.toString)
        }
      })
    }
  }
  private var cur: InternalRow = _
  override def next(): Boolean = {
    if (rows.hasNext) { cur = rows.next(); true } else false
  }
  override def get(): InternalRow = cur
  override def close(): Unit = ()
}
