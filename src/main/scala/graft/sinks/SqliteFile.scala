package graft.sinks

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import scala.collection.mutable.ArrayBuffer

/** Minimal writer for the public SQLite3 database file format
  * (sqlite.org/fileformat2.html): 100-byte header + a rowid-keyed table
  * b-tree, bulk-loaded bottom-up from sorted rows. Produces files that
  * stock SQLite tooling (sqlite3 CLI, python `sqlite3`, pandas
  * `read_sql`) opens and queries directly — the storage surface of the
  * reference fetcher (ccxt-ohlcv-fetch.py:263-271 creates
  * `sqlite:///<path>` stores; :35-47 the `candles` table).
  *
  * Format subset (all a single-table OHLCV store needs):
  *  - one table per file; leaf (0x0D) + interior (0x05) table b-tree pages
  *  - serial types NULL / 1..8-byte big-endian ints / float64 / TEXT
  *  - an INTEGER PRIMARY KEY column aliases the rowid and is stored as
  *    NULL in the record, per the format spec
  *  - oversized payloads chain through linked overflow pages (so TEXT/
  *    BLOB columns of any length export correctly)
  *  - no indexes (the rowid key IS the table's index), no freelist
  *
  * The writer is a pure function over an iterator of (rowid, values) —
  * safe to call inside `foreachPartition`/`mapPartitions` on executors.
  */
object SqliteFile {

  sealed trait SqlValue
  case object SqlNull extends SqlValue
  final case class SqlInt(v: Long) extends SqlValue
  final case class SqlReal(v: Double) extends SqlValue
  final case class SqlText(v: String) extends SqlValue
  final case class SqlBlob(v: Array[Byte]) extends SqlValue

  private val PageSize = 4096
  // table-leaf payload thresholds (format spec §B-tree Pages): payloads
  // above MaxLocal keep K = MinLocal + (P - MinLocal) mod (U - 4) bytes
  // in-page (MinLocal if K overshoots) and chain the rest through 4-byte
  // linked overflow pages
  private val MaxLocal = PageSize - 35
  private val MinLocal = (PageSize - 12) * 32 / 255 - 23

  /** In-page byte count for a payload of length `p`. */
  private[graft] def localLen(p: Int): Int =
    if (p <= MaxLocal) p
    else {
      val k = MinLocal + (p - MinLocal) % (PageSize - 4)
      if (k <= MaxLocal) k else MinLocal
    }

  /** SQLite variable-length integer: 1-9 bytes, big-endian 7-bit groups,
    * 9th byte (when present) carries a full 8 bits.
    */
  private[graft] def varint(v: Long): Array[Byte] = {
    if (v >= 0 && v <= 0x7f) Array(v.toByte)
    else if ((v >>> 56) != 0) { // 9-byte form (also all negatives)
      val out = new Array[Byte](9)
      var x = v
      out(8) = (x & 0xff).toByte
      x >>>= 8
      var i = 7
      while (i >= 0) { out(i) = ((x & 0x7f) | 0x80).toByte; x >>>= 7; i -= 1 }
      out
    } else {
      val tmp = new Array[Byte](8)
      var x = v
      var n = 0
      while (x != 0 || n == 0) { tmp(n) = (x & 0x7f).toByte; x >>>= 7; n += 1 }
      val out = new Array[Byte](n)
      var i = 0
      while (i < n) {
        out(i) = (tmp(n - 1 - i) | (if (i < n - 1) 0x80 else 0)).toByte
        i += 1
      }
      out
    }
  }

  /** (serial type, body bytes) for one value. */
  private def encodeValue(v: SqlValue): (Long, Array[Byte]) = v match {
    case SqlNull => (0L, Array.emptyByteArray)
    case SqlInt(0) => (8L, Array.emptyByteArray)
    case SqlInt(1) => (9L, Array.emptyByteArray)
    case SqlInt(i) =>
      val n =
        if (i >= -0x80L && i <= 0x7fL) 1
        else if (i >= -0x8000L && i <= 0x7fffL) 2
        else if (i >= -0x800000L && i <= 0x7fffffL) 3
        else if (i >= -0x80000000L && i <= 0x7fffffffL) 4
        else if (i >= -0x800000000000L && i <= 0x7fffffffffffL) 6
        else 8
      val body = new Array[Byte](n)
      var k = 0
      while (k < n) { body(k) = ((i >> (8 * (n - 1 - k))) & 0xff).toByte; k += 1 }
      val serial = n match { case 1 => 1L; case 2 => 2L; case 3 => 3L
        case 4 => 4L; case 6 => 5L; case 8 => 6L }
      (serial, body)
    case SqlReal(d) =>
      (7L, ByteBuffer.allocate(8).putDouble(d).array())
    case SqlText(s) =>
      val b = s.getBytes(StandardCharsets.UTF_8)
      (13L + 2L * b.length, b)
    case SqlBlob(b) => (12L + 2L * b.length, b)
  }

  /** Record format: [varint header-size incl itself][serial types][body]. */
  private[graft] def record(values: Seq[SqlValue]): Array[Byte] = {
    val encoded = values.map(encodeValue)
    val serials = encoded.map(e => varint(e._1))
    val serialLen = serials.map(_.length).sum
    // header length varint includes itself; one extra byte is enough for
    // any row narrow enough to fit a page
    val hdrLen = if (serialLen + 1 <= 0x7f) serialLen + 1 else serialLen + 2
    val out = ArrayBuffer[Byte]()
    out ++= varint(hdrLen.toLong)
    serials.foreach(out ++= _)
    encoded.foreach(out ++= _._2)
    out.toArray
  }

  /** One leaf entry: serialized size is known before overflow pages are
    * numbered (cell = varints + local bytes [+ 4-byte overflow pointer]).
    */
  private final case class LeafEntry(rowid: Long, rec: Array[Byte]) {
    val local: Int = localLen(rec.length)
    val cellLen: Int = varint(rec.length.toLong).length +
      varint(rowid).length + local + (if (local < rec.length) 4 else 0)
    def overflowBytes: Int = rec.length - local
  }

  /** Table-leaf cell: [varint payload len][varint rowid][local record
    * bytes][4-byte first overflow page, when chained].
    */
  private def leafCell(e: LeafEntry, firstOverflowPage: Int): Array[Byte] = {
    val head = varint(e.rec.length.toLong) ++ varint(e.rowid) ++ e.rec.take(e.local)
    if (e.local < e.rec.length)
      head ++ ByteBuffer.allocate(4).putInt(firstOverflowPage).array()
    else head
  }

  /** One b-tree page image (leaf 0x0D or interior 0x05), cells packed
    * from the page end, pointer array in key order. `headerAt` is 100 on
    * page 1 (database header precedes the b-tree header), 0 elsewhere.
    */
  private def pageImage(pageType: Int, cells: Seq[Array[Byte]],
                        rightmostChild: Int, headerAt: Int): Array[Byte] = {
    val page = new Array[Byte](PageSize)
    val buf = ByteBuffer.wrap(page)
    val btHdrLen = if (pageType == 0x05) 12 else 8
    // pack cells from the page end in reverse so the pointer array reads
    // in key order
    var idx = 0
    val offsets = new Array[Int](cells.length)
    var end = PageSize
    // place cells from the end, first cell nearest the end boundary
    for (c <- cells.reverseIterator) {
      end -= c.length
      System.arraycopy(c, 0, page, end, c.length)
      offsets(cells.length - 1 - idx) = end
      idx += 1
    }
    val content = end
    buf.put(headerAt, pageType.toByte)
    buf.putShort(headerAt + 1, 0.toShort) // first freeblock
    buf.putShort(headerAt + 3, cells.length.toShort)
    buf.putShort(headerAt + 5, (content & 0xffff).toShort)
    buf.put(headerAt + 7, 0.toByte) // fragmented free bytes
    if (pageType == 0x05) buf.putInt(headerAt + 8, rightmostChild)
    var p = headerAt + btHdrLen
    for (off <- offsets) { buf.putShort(p, off.toShort); p += 2 }
    require(p <= content, s"page overflow: pointer array $p > content $content")
    page
  }

  /** How many bytes a page has free given current cells. */
  private def fits(used: Int, nCells: Int, cellLen: Int, headerAt: Int,
                   interior: Boolean): Boolean = {
    val hdr = headerAt + (if (interior) 12 else 8)
    hdr + 2 * (nCells + 1) + used + cellLen <= PageSize
  }

  /** Write a single-table SQLite database. `rows` must be sorted by
    * strictly-ascending rowid (the PK contract of the reference's candles
    * table). Returns the row count.
    */
  def write(path: java.io.File, tableName: String, createSql: String,
            rows: Iterator[(Long, Seq[SqlValue])]): Long = {
    // ---- 1. pack leaf pages ------------------------------------------------
    val leaves = ArrayBuffer[(Seq[LeafEntry], Long)]() // (entries, max rowid)
    var cur = ArrayBuffer[LeafEntry]()
    var curBytes = 0
    var lastRowid = Long.MinValue
    var curMax = 0L
    var count = 0L
    for ((rowid, values) <- rows) {
      require(rowid > lastRowid,
        s"rowids must be strictly ascending: $rowid after $lastRowid")
      lastRowid = rowid
      val entry = LeafEntry(rowid, record(values))
      if (!fits(curBytes, cur.length, entry.cellLen, 0, interior = false) && cur.nonEmpty) {
        leaves += ((cur.toSeq, curMax)); cur = ArrayBuffer(); curBytes = 0
      }
      cur += entry; curBytes += entry.cellLen; curMax = rowid
      count += 1
    }
    if (cur.nonEmpty || leaves.isEmpty) leaves += ((cur.toSeq, curMax))

    // ---- 2. build interior levels bottom-up --------------------------------
    // level 0 = leaves; each node is (cells, maxRowid); page numbers are
    // assigned level by level starting at 2 (page 1 = sqlite_master)
    var levelSizes = ArrayBuffer(leaves.length)
    var levelMaxKeys = ArrayBuffer(leaves.map(_._2).toSeq)
    while (levelSizes.last > 1) {
      val childKeys = levelMaxKeys.last
      val groups = ArrayBuffer[Int]() // children per interior node
      var n = 0
      var used = 0
      for (k <- childKeys) {
        val cellLen = 4 + varint(k).length
        if (n > 0 && !fits(used, n - 1, cellLen, 0, interior = true)) {
          groups += n; n = 0; used = 0
        }
        n += 1; used += cellLen
      }
      groups += n
      val keys = ArrayBuffer[Long]()
      var at = 0
      for (g <- groups) { at += g; keys += childKeys(at - 1) }
      levelSizes += groups.length
      levelMaxKeys += keys.toSeq
    }
    val nLevels = levelSizes.length
    val firstPageOfLevel = new Array[Int](nLevels)
    firstPageOfLevel(0) = 2
    for (l <- 1 until nLevels)
      firstPageOfLevel(l) = firstPageOfLevel(l - 1) + levelSizes(l - 1)
    val rootPage = firstPageOfLevel(nLevels - 1) // single node in last level
    val btreePages = 1 + levelSizes.sum
    // overflow pages live after every b-tree page, allocated in leaf order
    val overflowPageCount = leaves.iterator.flatMap(_._1).map(e =>
      (e.overflowBytes + (PageSize - 4) - 1) / (PageSize - 4)).sum
    val totalPages = btreePages + overflowPageCount

    // ---- 3. serialize ------------------------------------------------------
    val images = new Array[Array[Byte]](totalPages) // index = pageNo - 1
    var nextOverflow = btreePages + 1
    for ((cellsMax, i) <- leaves.zipWithIndex) {
      val cells = cellsMax._1.map { e =>
        if (e.overflowBytes == 0) leafCell(e, 0)
        else {
          val first = nextOverflow
          var off = e.local
          while (off < e.rec.length) {
            val chunk = math.min(PageSize - 4, e.rec.length - off)
            val page = new Array[Byte](PageSize)
            val next = if (off + chunk < e.rec.length) nextOverflow + 1 else 0
            ByteBuffer.wrap(page).putInt(0, next)
            System.arraycopy(e.rec, off, page, 4, chunk)
            images(nextOverflow - 1) = page
            nextOverflow += 1
            off += chunk
          }
          leafCell(e, first)
        }
      }
      images(firstPageOfLevel(0) + i - 1) = pageImage(0x0d, cells, 0, 0)
    }
    // interiors: regroup exactly as in the sizing pass
    var childLevelKeys = leaves.map(_._2).toSeq
    for (l <- 1 until nLevels) {
      val childFirst = firstPageOfLevel(l - 1)
      val nodes = ArrayBuffer[ArrayBuffer[(Int, Long)]](ArrayBuffer())
      var used = 0
      for ((k, ci) <- childLevelKeys.zipWithIndex) {
        val cellLen = 4 + varint(k).length
        if (nodes.last.nonEmpty &&
            !fits(used, nodes.last.length - 1, cellLen, 0, interior = true)) {
          nodes += ArrayBuffer(); used = 0
        }
        nodes.last += ((childFirst + ci, k)); used += cellLen
      }
      for ((node, i) <- nodes.zipWithIndex) {
        val cells = node.init.map { case (child, key) =>
          ByteBuffer.allocate(4).putInt(child).array() ++ varint(key)
        }
        images(firstPageOfLevel(l) + i - 1) =
          pageImage(0x05, cells.toSeq, node.last._1, 0)
      }
      childLevelKeys = nodes.map(_.last._2).toSeq
    }
    // page 1: database header + sqlite_master leaf with the one table row
    val masterRec = record(Seq(SqlText("table"), SqlText(tableName),
      SqlText(tableName), SqlInt(rootPage.toLong), SqlText(createSql)))
    require(masterRec.length <= MaxLocal, "create-table sql too long for page 1")
    val page1 = pageImage(0x0d, Seq(leafCell(LeafEntry(1L, masterRec), 0)), 0, 100)
    val h = ByteBuffer.wrap(page1)
    h.position(0)
    h.put("SQLite format 3\u0000".getBytes(StandardCharsets.US_ASCII))
    h.putShort(16, PageSize.toShort)
    h.put(18, 1.toByte) // write version: legacy journal
    h.put(19, 1.toByte) // read version
    h.put(20, 0.toByte) // reserved bytes per page
    h.put(21, 64.toByte); h.put(22, 32.toByte); h.put(23, 32.toByte)
    h.putInt(24, 1) // file change counter
    h.putInt(28, totalPages)
    h.putInt(32, 0); h.putInt(36, 0) // freelist
    h.putInt(40, 1) // schema cookie
    h.putInt(44, 1) // schema format 1 (most compatible)
    h.putInt(48, 0) // default page cache
    h.putInt(52, 0) // largest root (non-vacuum)
    h.putInt(56, 1) // text encoding: UTF-8
    h.putInt(60, 0); h.putInt(64, 0); h.putInt(68, 0)
    h.putInt(92, 1)       // version-valid-for == change counter
    h.putInt(96, 3045000) // sqlite version number stamp
    images(0) = page1

    Option(path.getParentFile).foreach(_.mkdirs())
    val out = new java.io.BufferedOutputStream(new java.io.FileOutputStream(path))
    try images.foreach(out.write) finally out.close()
    count
  }
}
