package graft.sources

import graft.sinks.SqliteFile
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

/** Read-back source for SQLite database files — the migration user's
  * FIRST step (the reference ecosystem's stores are `.sqlite` files in
  * the `gen_db_name` layout, ccxt-ohlcv-fetch.py:134-138): a pure-Scala
  * walker over the public SQLite3 file format
  * (sqlite.org/fileformat2.html), the writer ([[graft.sinks.SqliteFile]])
  * inverted — no JDBC driver, no native library.
  *
  * Format coverage (a strict superset of what the writer emits, enough
  * for stock-sqlite3-written stores):
  *  - any page size (header offset 16; 1 ⇒ 65536) and reserved-byte
  *    count (offset 20) — thresholds derive from the USABLE page size;
  *  - table b-trees of any depth (interior 0x05 / leaf 0x0D), pages in
  *    ANY allocation order (the walker follows child pointers, so
  *    freelist pages, index b-trees, and ptrmap pages are simply never
  *    visited);
  *  - all serial types (NULL, 1..8-byte ints, float64, const 0/1,
  *    TEXT/BLOB) and payload overflow chains;
  *  - UTF-8 text encoding (header offset 56 = 1); UTF-16 files are
  *    rejected with a clear error rather than silently mis-decoded.
  *  - WAL-journaled files read the MAIN file only: run a checkpoint
  *    (any sqlite3 open/close does) before handing stores to the
  *    engine — same contract as every file-copy-based sqlite reader.
  *
  * Scale shape: one `.sqlite` file is a single-reader artifact, but the
  * reference layout is per-(exchange, symbol, timeframe) FILES —
  * [[readCandleTree]] lists the tree driver-side (dim-scale paths) and
  * parses whole files inside `mapPartitions`, one task per file batch:
  * the same per-series parallelism the export fan-out uses, inverted.
  * A single series must fit a task (inherent to the one-file-per-series
  * layout, and exactly how the files were written).
  */
object SqliteSource {

  /** One sqlite_schema row (type='table' only). */
  final case class TableInfo(name: String, rootPage: Int, createSql: String)

  // ---- low-level format parsing -----------------------------------------

  /** SQLite varint at `off`: (value, bytes consumed). 1-9 bytes,
    * big-endian 7-bit groups, 9th byte carries 8 bits.
    */
  private[graft] def varint(b: Array[Byte], off: Int): (Long, Int) = {
    var v = 0L
    var i = 0
    while (i < 8) {
      val x = b(off + i)
      v = (v << 7) | (x & 0x7f)
      if ((x & 0x80) == 0) return (v, i + 1)
      i += 1
    }
    ((v << 8) | (b(off + 8) & 0xff), 9)
  }

  private final class Db(val data: Array[Byte]) {
    require(data.length >= 512 &&
      new String(data, 0, 16, StandardCharsets.US_ASCII)
        .startsWith("SQLite format 3"),
      "not a SQLite 3 database file")
    val pageSize: Int = {
      val raw = ((data(16) & 0xff) << 8) | (data(17) & 0xff)
      if (raw == 1) 65536 else raw
    }
    private val reserved = data(20) & 0xff
    val usable: Int = pageSize - reserved
    require(((data(56) & 0xff) << 24 | (data(57) & 0xff) << 16 |
      (data(58) & 0xff) << 8 | (data(59) & 0xff)) == 1,
      "only UTF-8 SQLite files are supported (header text encoding != 1)")
    // payload-spill thresholds from the USABLE size (format spec §B-tree)
    private val maxLocal = usable - 35
    private val minLocal = (usable - 12) * 32 / 255 - 23
    private def localLen(p: Int): Int =
      if (p <= maxLocal) p
      else {
        val k = minLocal + (p - minLocal) % (usable - 4)
        if (k <= maxLocal) k else minLocal
      }
    private def pageOff(pageNo: Int): Int = (pageNo - 1) * pageSize
    private def u16(off: Int): Int = ((data(off) & 0xff) << 8) | (data(off + 1) & 0xff)
    private def u32(off: Int): Int =
      ((data(off) & 0xff) << 24) | ((data(off + 1) & 0xff) << 16) |
        ((data(off + 2) & 0xff) << 8) | (data(off + 3) & 0xff)

    /** Payload bytes of one cell, following the overflow chain. */
    private def payload(cellOff: Int, p: Long, headLen: Int): Array[Byte] = {
      val local = localLen(p.toInt)
      val out = new Array[Byte](p.toInt)
      System.arraycopy(data, cellOff + headLen, out, 0, local)
      var at = local
      if (local < p) {
        var ovf = u32(cellOff + headLen + local)
        while (ovf != 0 && at < p) {
          val chunk = math.min(usable - 4, p.toInt - at)
          System.arraycopy(data, pageOff(ovf) + 4, out, at, chunk)
          at += chunk
          ovf = u32(pageOff(ovf))
        }
        require(at == p, s"truncated overflow chain: $at of $p bytes")
      }
      out
    }

    /** Depth-first walk of a table b-tree, emitting (rowid, record bytes)
      * in rowid order for rowids within [lo, hi]. The tree is KEYED by
      * rowid, so an interior cell's key (= the max rowid in its child
      * subtree) prunes whole subtrees: children entirely below `lo` are
      * skipped, and the walk stops at the first child whose key reaches
      * `hi` — a bounded range costs a root-to-leaf descent plus the
      * matching leaf run, not a full-file scan (the `resume_since`
      * access pattern: read each store's tail). Returns the number of
      * LEAF pages visited — the pruning proof the spec pins.
      */
    def walkTable(rootPage: Int, lo: Long = Long.MinValue,
                  hi: Long = Long.MaxValue)
                 (emit: (Long, Array[Byte]) => Unit): Long = {
      val base = pageOff(rootPage)
      val hdr = base + (if (rootPage == 1) 100 else 0)
      val pageType = data(hdr) & 0xff
      val nCells = u16(hdr + 3) // [type:1][freeblock:2][ncells:2][content:2][frag:1]
      pageType match {
        case 0x05 => // table interior: children left-to-right + rightmost
          var visited = 0L
          var i = 0
          var done = false
          while (i < nCells && !done) {
            val cellOff = base + u16(hdr + 12 + 2 * i)
            val key = varint(data, cellOff + 4)._1 // max rowid in the child
            if (key >= lo) visited += walkTable(u32(cellOff), lo, hi)(emit)
            if (key >= hi) done = true // later children hold rowids > hi
            i += 1
          }
          if (!done) visited += walkTable(u32(hdr + 8), lo, hi)(emit)
          visited
        case 0x0d => // table leaf
          var i = 0
          var stop = false
          while (i < nCells && !stop) {
            val cellOff = base + u16(hdr + 8 + 2 * i)
            val (p, n1) = varint(data, cellOff)
            val (rowid, n2) = varint(data, cellOff + n1)
            if (rowid > hi) stop = true
            else if (rowid >= lo) emit(rowid, payload(cellOff, p, n1 + n2))
            i += 1
          }
          1L
        case other =>
          throw new IllegalStateException(
            f"page $rootPage is not a table b-tree page (type 0x$other%02x)")
      }
    }
  }

  /** Decode one record into SqlValues (the writer's encoding inverted).
    * `keep(i)` false skips column i WITHOUT materializing its body — the
    * serial header fixes every column's width, so pruning a TEXT/BLOB
    * column costs an offset bump instead of a string/array allocation
    * (the column-pruning contract the DSv2 face pushes down).
    */
  private[graft] def decodeRecord(rec: Array[Byte],
                                  keep: Int => Boolean = _ => true)
      : IndexedSeq[SqliteFile.SqlValue] = {
    import SqliteFile.{SqlBlob, SqlInt, SqlNull, SqlReal, SqlText, SqlValue}
    val (hdrLen, n0) = varint(rec, 0)
    var at = n0
    val serials = Vector.newBuilder[Long]
    while (at < hdrLen) {
      val (s, n) = varint(rec, at)
      serials += s
      at += n
    }
    var body = hdrLen.toInt
    serials.result().zipWithIndex.map { case (s, ix) =>
      def int(n: Int): SqlValue = {
        var v = rec(body).toLong // sign-extends
        var i = 1
        while (i < n) { v = (v << 8) | (rec(body + i) & 0xff); i += 1 }
        body += n
        SqlInt(v)
      }
      def skip(n: Int): SqlValue = { body += n; SqlNull }
      val wanted = keep(ix)
      s match {
        case 0 => SqlNull
        case 1 => if (wanted) int(1) else skip(1)
        case 2 => if (wanted) int(2) else skip(2)
        case 3 => if (wanted) int(3) else skip(3)
        case 4 => if (wanted) int(4) else skip(4)
        case 5 => if (wanted) int(6) else skip(6)
        case 6 => if (wanted) int(8) else skip(8)
        case 7 =>
          if (!wanted) skip(8)
          else {
            val v = ByteBuffer.wrap(rec, body, 8).getDouble; body += 8
            SqlReal(v)
          }
        case 8 => SqlInt(0L)
        case 9 => SqlInt(1L)
        case s if s >= 13 && s % 2 == 1 =>
          val n = ((s - 13) / 2).toInt
          if (!wanted) skip(n)
          else {
            val v = new String(rec, body, n, StandardCharsets.UTF_8); body += n
            SqlText(v)
          }
        case s if s >= 12 =>
          val n = ((s - 12) / 2).toInt
          if (!wanted) skip(n)
          else {
            val v = java.util.Arrays.copyOfRange(rec, body, body + n); body += n
            SqlBlob(v)
          }
        case other =>
          throw new IllegalStateException(s"reserved serial type $other")
      }
    }
  }

  // ---- schema -----------------------------------------------------------

  /** The file's tables from sqlite_schema (page-1 b-tree; indexes/views/
    * triggers skipped — only table roots are walked).
    */
  def tables(data: Array[Byte]): Seq[TableInfo] = {
    val db = new Db(data)
    val out = Seq.newBuilder[TableInfo]
    db.walkTable(1) { (_, rec) =>
      decodeRecord(rec) match {
        case Seq(SqliteFile.SqlText("table"), SqliteFile.SqlText(name), _,
            rootV, SqliteFile.SqlText(sql)) =>
          val root = rootV match {
            case SqliteFile.SqlInt(r) => r.toInt
            case _ => -1
          }
          if (root > 0) out += TableInfo(name, root, sql)
        case _ => () // index / view / trigger rows
      }
    }
    out.result()
  }

  /** Column (name, declared type, isIntegerPrimaryKey) parsed loosely
    * from CREATE TABLE — enough for real-world declarations; quoted
    * identifiers unwrapped, table constraints skipped.
    */
  private[graft] def parseColumns(createSql: String): Seq[(String, String, Boolean)] = {
    val open = createSql.indexOf('(')
    val close = createSql.lastIndexOf(')')
    require(open >= 0 && close > open, s"unparseable CREATE TABLE: $createSql")
    // split on top-level commas only (types like DECIMAL(10,2) nest)
    val defs = Seq.newBuilder[String]
    var depth = 0
    val cur = new StringBuilder
    createSql.substring(open + 1, close).foreach {
      case '(' => depth += 1; cur += '('
      case ')' => depth -= 1; cur += ')'
      case ',' if depth == 0 => defs += cur.result().trim; cur.clear()
      case c => cur += c
    }
    defs += cur.result().trim
    val constraint = Set("PRIMARY", "UNIQUE", "CHECK", "FOREIGN", "CONSTRAINT")
    defs.result().filter(_.nonEmpty).flatMap { d =>
      val toks = d.split("\\s+")
      val rawName = toks.head
      if (constraint.contains(rawName.toUpperCase(java.util.Locale.ROOT))) None
      else {
        val name = rawName.stripPrefix("\"").stripSuffix("\"")
          .stripPrefix("`").stripSuffix("`").stripPrefix("[").stripSuffix("]")
        val upper = d.toUpperCase(java.util.Locale.ROOT)
        val declared = if (toks.length > 1)
          toks.tail.takeWhile(t => !Set("PRIMARY", "NOT", "DEFAULT", "UNIQUE",
            "CHECK", "REFERENCES", "COLLATE")
            .contains(t.toUpperCase(java.util.Locale.ROOT))).mkString(" ")
        else ""
        val ipk = upper.contains("PRIMARY KEY") &&
          declared.toUpperCase(java.util.Locale.ROOT).trim == "INTEGER"
        Some((name, declared, ipk))
      }
    }
  }

  /** SQLite type-affinity rules (format doc §3.1) → Spark type. NUMERIC
    * affinity maps to DoubleType (the closest single static type; the
    * reference schema never uses it).
    */
  private[graft] def affinity(declared: String): DataType = {
    val t = declared.toUpperCase(java.util.Locale.ROOT)
    if (t.contains("INT")) LongType
    else if (t.contains("CHAR") || t.contains("CLOB") || t.contains("TEXT"))
      StringType
    else if (t.isEmpty || t.contains("BLOB")) BinaryType
    else if (t.contains("REAL") || t.contains("FLOA") || t.contains("DOUB"))
      DoubleType
    else DoubleType
  }

  /** Stored value → declared Spark type (SQLite columns are dynamically
    * typed; the writer round-trip is exact, foreign files coerce).
    */
  private def coerce(v: SqliteFile.SqlValue, t: DataType): Any = {
    import SqliteFile._
    (v, t) match {
      case (SqlNull, _) => null
      case (SqlInt(i), LongType) => i
      case (SqlInt(i), DoubleType) => i.toDouble
      case (SqlInt(i), StringType) => i.toString
      case (SqlReal(d), DoubleType) => d
      case (SqlReal(d), LongType) => d.toLong
      case (SqlReal(d), StringType) => d.toString
      case (SqlText(s), StringType) => s
      case (SqlText(s), BinaryType) => s.getBytes(StandardCharsets.UTF_8)
      case (SqlText(s), LongType) => s.toLongOption.orNull
      case (SqlText(s), DoubleType) => s.toDoubleOption.orNull
      case (SqlBlob(b), BinaryType) => b
      case _ => null
    }
  }

  /** Decode a whole table from file bytes: (schema, rows). The INTEGER
    * PRIMARY KEY column (rowid alias) is materialized from the rowid —
    * the record stores NULL there, per the format spec.
    */
  private[graft] def decodeTable(data: Array[Byte], table: String,
                                 keep: Int => Boolean = _ => true,
                                 lo: Long = Long.MinValue,
                                 hi: Long = Long.MaxValue)
      : (StructType, Seq[Row]) =
    decodeTableCounted(data, table, keep, lo, hi)._1

  /** [[decodeTable]] plus the leaf-pages-visited count — the observable
    * that proves rowid-range pushdown prunes the b-tree walk.
    */
  private[graft] def decodeTableCounted(data: Array[Byte], table: String,
                                        keep: Int => Boolean = _ => true,
                                        lo: Long = Long.MinValue,
                                        hi: Long = Long.MaxValue)
      : ((StructType, Seq[Row]), Long) = {
    val db = new Db(data)
    val info = tables(data).find(_.name == table).getOrElse(
      throw new IllegalArgumentException(
        s"table '$table' not found; file has: ${tables(data).map(_.name).mkString(", ")}"))
    val cols = parseColumns(info.createSql)
    val schema = StructType(cols.map { case (n, d, ipk) =>
      StructField(n, if (ipk) LongType else affinity(d), nullable = !ipk)
    })
    val rows = Seq.newBuilder[Row]
    val visited = db.walkTable(info.rootPage, lo, hi) { (rowid, rec) =>
      val vs = decodeRecord(rec, keep)
      rows += Row.fromSeq(cols.zipWithIndex.map { case ((_, d, ipk), i) =>
        if (ipk) rowid
        else if (!keep(i)) null
        else if (i < vs.length) coerce(vs(i), affinity(d))
        else null // columns ADDed after old rows were written
      })
    }
    ((schema, rows.result()), visited)
  }

  /** Name of the INTEGER PRIMARY KEY (rowid alias) column, if any — the
    * only column rowid-range filters can push into the b-tree walk.
    */
  private[graft] def ipkColumn(data: Array[Byte], table: String): Option[String] =
    tables(data).find(_.name == table)
      .flatMap(i => parseColumns(i.createSql).find(_._3).map(_._1))

  /** The ONE store-tree walker both read faces share (a divergent
    * extension set between them would make `format("sqlite")` and
    * [[readCandleTree]] read different file sets from the same tree).
    */
  private[sources] def storeFiles(root: java.io.File,
      exts: Seq[String] = Seq(".sqlite", ".db", ".sqlite3")): Seq[java.io.File] =
    if (root.isDirectory)
      root.listFiles.toSeq.sortBy(_.getName).flatMap(storeFiles(_, exts))
    else if (exts.exists(root.getName.endsWith)) Seq(root)
    else Nil

  // ---- DataFrame faces ---------------------------------------------------

  /** Read one table of one `.sqlite` file into a DataFrame (driver-side
    * parse — model/dim-scale files; for a TREE of per-series files use
    * [[readCandleTree]], which parallelizes per file).
    */
  def readTable(spark: SparkSession, path: String, table: String): DataFrame = {
    val data = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val (schema, rows) = decodeTable(data, table)
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava), schema)
  }

  /** Read an entire reference-layout store tree
    * (`ccxt/<exchange>/<sym>/<tf>/<exchange>_<sym>_<tf>.sqlite`, the
    * `gen_db_name` inverse) into ONE DataFrame: (exchange, symbol,
    * timeframe, timestamp, open, high, low, close, volume) — candle
    * columns in the reference's TEXT-price shape. File paths are listed
    * driver-side (dim-scale), parsing fans out one task per file batch.
    */
  def readCandleTree(spark: SparkSession, rootDir: String,
                     table: String = "candles"): DataFrame = {
    val root = new java.io.File(rootDir)
    val files = storeFiles(root).map(_.getAbsolutePath)
    // fail FAST on trees that are not the gen_db_name layout: deriving
    // series labels from arbitrary paths would either crash in an
    // executor (too-shallow paths) or silently mislabel rows
    files.foreach { path =>
      val parts = path.split("/")
      require(parts.length >= 5 && parts(parts.length - 5) == "ccxt",
        s"$path is not in the reference gen_db_name layout " +
          "(ccxt/<exchange>/<sym>/<tf>/<file>); use readTable or " +
          "spark.read.format(\"sqlite\") for arbitrary trees")
    }
    val schema = StructType(Seq(
      StructField("exchange", StringType), StructField("symbol", StringType),
      StructField("timeframe", StringType), StructField("timestamp", LongType),
      StructField("open", StringType), StructField("high", StringType),
      StructField("low", StringType), StructField("close", StringType),
      StructField("volume", StringType)))
    val rdd = spark.sparkContext.parallelize(files,
      math.max(1, math.min(files.size, spark.sparkContext.defaultParallelism)))
      .flatMap { path =>
        // <root>/ccxt/<exchange>/<sym>/<tf>/<file>.sqlite
        val parts = path.split("/")
        val (tf, sym, exch) =
          (parts(parts.length - 2), parts(parts.length - 3), parts(parts.length - 4))
        val data = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
        val (_, rows) = decodeTable(data, table)
        rows.map { r =>
          Row(exch, sym, tf, r.get(0),
            r.get(1), r.get(2), r.get(3), r.get(4), r.get(5))
        }
      }
    spark.createDataFrame(rdd, schema)
  }
}
