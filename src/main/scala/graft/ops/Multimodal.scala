package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media (image/audio/video) travels as an
  * opaque `binary` column with typed metadata, partitioned like any other
  * table. IMAGE decode is REAL ([[decodeImage]] — the JDK's javax.imageio
  * codecs, zero external dependencies); audio/video decode stays stubbed
  * ([[decodeStub]], a deterministic content-derived fake, which also
  * remains the engine-portable oracled query). Both share the same
  * Spark-side contract — binary input column, batched per-partition
  * decode, fixed typed output schema — so a cluster deployment swaps
  * richer codecs into the identical boundary.
  */
object Multimodal {

  /** Typed metadata over the opaque-binary representation used for media.
    * The binary payload itself stays internal (emitted as a hex preview so
    * downstream compares stay engine-portable); `decodeStub` consumes the
    * raw binary column.
    */
  def meta(docs: DataFrame): DataFrame = {
    val payload = col("text").cast("binary")
    docs.select(
      col("doc_id"),
      length(payload).cast("long").as("n_bytes"),
      md5(payload).as("content_md5"),
      substring(hex(payload), 1, 16).as("payload_hex_prefix"),
      lit("text").as("modality"))
  }

  /** Frame-sampling schedule for video-modality rows: one output row per
    * frame to extract — uniform `everyMs` stride, capped at `maxFrames`
    * per clip. This explode IS the real distributed planning step of
    * video processing: it fans a clip corpus into per-frame decode work
    * items that partition/shuffle like any other rows (the decode itself
    * is the stubbed codec boundary, see decodeStub). Duration here
    * derives from the payload length — the testbed stand-in for a real
    * container-parsed duration column.
    */
  def frameSample(docs: DataFrame, everyMs: Long = 100, maxFrames: Int = 8): DataFrame =
    docs.select(col("doc_id"), length(col("text")).cast("long").as("duration_ms"))
      .withColumn("n_frames",
        least(floor(col("duration_ms") / lit(everyMs)).cast("long") + 1L,
          lit(maxFrames.toLong)))
      .select(col("doc_id"), col("duration_ms"),
        explode(sequence(lit(0L), col("n_frames") - 1L)).as("frame_idx"))
      .select(col("doc_id"), col("duration_ms"), col("frame_idx"),
        (col("frame_idx") * everyMs).as("frame_ts_ms"))

  /** REAL image decode via the JDK's built-in javax.imageio readers
    * (PNG/JPEG/GIF/BMP — no external media libraries needed): decoded
    * width/height/band count plus per-channel pixel means in [0, 1],
    * batched per partition exactly like [[decodeStub]] (this is the codec
    * swapped into that boundary). Rows no installed reader accepts come
    * back `ok = false` with null metrics instead of failing the job — a
    * 100 TB media crawl always contains junk bytes.
    *
    * Scale design: pure mapPartitions over the binary column — decode
    * parallelism IS the table's partitioning, no shuffle, executor-local
    * memory bounded by one 64-row batch of images at a time.
    */
  def decodeImage(media: DataFrame, idCol: String = "doc_id",
                  payloadCol: String = "payload"): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    def decode(id: Long, bytes: Array[Byte]): (Long, Boolean, Option[Long],
        Option[Long], Option[Long], Option[Double], Option[Double], Option[Double]) =
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img == null) (id, false, None, None, None, None, None, None)
        else {
          val w = img.getWidth; val h = img.getHeight
          val bands = img.getRaster.getNumBands.toLong
          var r = 0L; var g = 0L; var b = 0L
          // bulk row reads: one getRGB call per ROW into a reused buffer
          // (identical sRGB conversion semantics to the per-pixel call,
          // minus ~w virtual calls + bounds checks per row; full-image
          // bulk would allocate w*h ints — 48 MB for a 12 MP frame)
          val row = new Array[Int](w)
          var y = 0
          while (y < h) {
            img.getRGB(0, y, w, 1, row, 0, w)
            var x = 0
            while (x < w) {
              val px = row(x)
              r += (px >> 16) & 0xFF; g += (px >> 8) & 0xFF; b += px & 0xFF
              x += 1
            }
            y += 1
          }
          val n = w.toLong * h * 255L
          (id, true, Some(w.toLong), Some(h.toLong), Some(bands),
            Some(r.toDouble / n), Some(g.toDouble / n), Some(b.toDouble / n))
        }
      } catch { case _: Exception => (id, false, None, None, None, None, None, None) }
    media.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(64).flatMap(_.map { case (id, bytes) =>
        decode(id, if (bytes == null) Array.emptyByteArray else bytes)
      }))
      .toDF("doc_id", "ok", "width", "height", "channels",
        "mean_r", "mean_g", "mean_b")
  }

  /** REAL audio decode via the JDK's built-in javax.sound.sampled WAV/
    * AIFF/AU readers (no external media libraries): container-parsed
    * sample rate / channel count / frame count / duration plus the RMS
    * amplitude of 16-bit PCM payloads (normalized to [0, 1]; null for
    * other sample sizes — metadata still real). Rows no installed reader
    * accepts come back `ok = false` with null metrics instead of failing
    * the job, exactly the [[decodeImage]] junk-bytes contract — this is
    * the audio codec swapped into the same binary-column boundary.
    *
    * Scale design: pure mapPartitions over the binary column — decode
    * parallelism IS the table's partitioning, no shuffle, one 64-row
    * batch of ENCODED clips in executor memory at a time; the decoded
    * PCM never materializes — RMS accumulates Σx² over a fixed 64 KB
    * read buffer (bit-identical to a whole-array pass, bounded memory
    * for arbitrarily long clips).
    */
  def decodeAudio(media: DataFrame, idCol: String = "doc_id",
                  payloadCol: String = "payload"): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    def decode(id: Long, bytes: Array[Byte]): (Long, Boolean, Option[Double],
        Option[Long], Option[Long], Option[Double], Option[Double]) =
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val fmt = in.getFormat
          val nFrames = in.getFrameLength
          val durMs =
            if (nFrames >= 0 && fmt.getSampleRate > 0)
              Some(nFrames * 1000.0 / fmt.getSampleRate)
            else None
          val rms =
            if (fmt.getSampleSizeInBits == 16 &&
                fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) {
              // Σx² accumulates over a FIXED 64 KB read buffer, in stream
              // order — bit-identical to a whole-array pass (same
              // left-to-right double accumulation) but the decoded PCM is
              // never materialized: an hour of 44.1 kHz stereo is ~600 MB
              // decoded, which times 64 rows per batch would OOM the
              // executor under readAllBytes. A sample straddling two reads
              // is carried as the pending byte.
              val buf = new Array[Byte](65536)
              var acc = 0.0
              var n = 0L
              var pending: Byte = 0
              var havePending = false
              var read = in.read(buf)
              while (read != -1) {
                var i = 0
                if (havePending && read >= 1) {
                  val s =
                    if (fmt.isBigEndian) ((pending << 8) | (buf(0) & 0xFF)).toShort
                    else ((buf(0) << 8) | (pending & 0xFF)).toShort
                  val x = s / 32768.0
                  acc += x * x
                  n += 1
                  havePending = false
                  i = 1
                }
                while (i + 1 < read) {
                  val s =
                    if (fmt.isBigEndian) ((buf(i) << 8) | (buf(i + 1) & 0xFF)).toShort
                    else ((buf(i + 1) << 8) | (buf(i) & 0xFF)).toShort
                  val x = s / 32768.0
                  acc += x * x
                  n += 1
                  i += 2
                }
                if (i < read) { pending = buf(i); havePending = true }
                read = in.read(buf)
              }
              if (n > 0) Some(math.sqrt(acc / n)) else None
            } else None
          (id, true, Some(fmt.getSampleRate.toDouble),
            Some(fmt.getChannels.toLong),
            if (nFrames >= 0) Some(nFrames) else None, durMs, rms)
        } finally in.close()
      } catch { case _: Exception => (id, false, None, None, None, None, None) }
    media.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(64).flatMap(_.map { case (id, bytes) =>
        decode(id, if (bytes == null) Array.emptyByteArray else bytes)
      }))
      .toDF("doc_id", "ok", "sample_rate", "channels", "n_frames",
        "duration_ms", "rms")
  }

  /** Batched decode/feature-extract stub. Batch size 64 mirrors a
    * vectorized decode unit (what a GPU/SIMD codec would consume at once).
    * Replace the body of `fakeDecode` with a real codec in deployment.
    *
    * The stub's outputs are md5-derived scalars (not an opaque float
    * array), so the result is sortable/hashable by any downstream compare
    * harness and replayable in SQL: width/height come from the first
    * 8 md5 hex chars, feature f_i from hex chars [2i, 2i+2) over 255.
    */
  /** 63-bit dHash over a 72-element (8 rows × 9 cols, row-major) luma
    * grid column: bit r·8+c is set when the right neighbor is strictly
    * brighter — luma[r·9+c+1] > luma[r·9+c] — for r ∈ [0,8), c ∈ [0,8),
    * DROPPING bit 63 (r=7,c=7) so the hash lives in [0, 2⁶³): positive
    * in every engine's signed 64-bit integer (the simhash 60-bit
    * precedent — an oracle can parse/compare it without unsigned types).
    * Gradient signs survive brightness/contrast shifts and recompression,
    * which is why dHash is the standard perceptual near-dup key. Pure
    * column expression (codegen'd), shared verbatim by the real-decode
    * and stub faces.
    */
  def dhashFromLuma(luma: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (0 until 63).map { b =>
      val r = b / 8; val c = b % 8
      when(element_at(luma, r * 9 + c + 2) > element_at(luma, r * 9 + c + 1),
        lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)

  /** REAL 8×9 luma grid via the javax.imageio decode boundary (the
    * [[decodeImage]] codecs): average-pool the decoded image into 8 rows
    * × 9 columns of BT.601 integer luma ((299R + 587G + 114B) / 1000,
    * block mean by truncating integer division — no float anywhere, so
    * grids are bit-stable across JVMs), the canonical dHash pre-step.
    * Junk bytes and images smaller than the grid come back ok = false
    * with a null grid (the decodeImage contract). Same mapPartitions
    * shape: decode parallelism IS the table's partitioning, no shuffle,
    * one 64-row batch in memory.
    */
  def lumaGrid(media: DataFrame, idCol: String = "doc_id",
               payloadCol: String = "payload"): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    def grid(id: Long, bytes: Array[Byte]): (Long, Boolean, Option[Seq[Int]]) =
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img == null || img.getWidth < 9 || img.getHeight < 8)
          (id, false, None)
        else {
          val w = img.getWidth; val h = img.getHeight
          val row = new Array[Int](w)
          // per-block sums in one row-major pass (bulk row reads, the
          // decodeImage access pattern); block (r, c) spans pixel rows
          // [r·h/8, (r+1)·h/8) × cols [c·w/9, (c+1)·w/9)
          val sums = new Array[Long](72)
          val cnts = new Array[Long](72)
          var y = 0
          while (y < h) {
            val r = y * 8 / h
            img.getRGB(0, y, w, 1, row, 0, w)
            var x = 0
            while (x < w) {
              val c = x * 9 / w
              val px = row(x)
              val l = (299 * ((px >> 16) & 0xFF) + 587 * ((px >> 8) & 0xFF) +
                114 * (px & 0xFF)) / 1000
              sums(r * 9 + c) += l; cnts(r * 9 + c) += 1
              x += 1
            }
            y += 1
          }
          (id, true, Some(Seq.tabulate(72)(i => (sums(i) / cnts(i)).toInt)))
        }
      } catch { case _: Exception => (id, false, None) }
    media.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(64).flatMap(_.map { case (id, bytes) =>
        grid(id, if (bytes == null) Array.emptyByteArray else bytes)
      }))
      .toDF("doc_id", "ok", "luma")
  }

  /** STUB luma grid over non-image payloads — the oracled face: luma i
    * (i ∈ [0,72)) is the md5-hex byte pair at 1-based position
    * (2i mod 31)+1 of the payload's digest, value ∈ [0,256). Pure
    * content-derived pseudo-luma (the decodeStub convention), replayable
    * in any SQL engine from md5 alone; identical payloads get identical
    * grids, so the downstream dHash machinery exercises for real.
    */
  def lumaGridStub(docs: DataFrame): DataFrame = {
    val hx = md5(col("text").cast("binary"))
    docs.select(col("doc_id"),
      array((0 until 72).map(i =>
        conv(substring(hx, (i * 2) % 31 + 1, 2), 16, 10).cast("int")): _*)
        .as("luma"))
  }

  /** (doc_id, ok, dhash) over REAL image payloads: [[lumaGrid]] decode +
    * [[dhashFromLuma]]; dhash is null when decode fails. */
  def imageDhash(media: DataFrame, idCol: String = "doc_id",
                 payloadCol: String = "payload"): DataFrame =
    lumaGrid(media, idCol, payloadCol)
      .select(col("doc_id"), col("ok"),
        when(col("ok"), dhashFromLuma(col("luma"))).as("dhash"))

  /** Row-major cosine table for the 32-point DCT-II the pHash face
    * reduces with: ct(u)(y) = cos(π·(2y+1)·u / 64). StrictMath so the
    * table — and with it every hash bit — is bit-identical on any JVM.
    */
  private lazy val dctTable: Array[Array[Double]] =
    Array.tabulate(8, 32)((u, y) => StrictMath.cos(Math.PI * (2 * y + 1) * u / 64.0))

  /** 63-bit DCT perceptual hash (pHash — Zauner 2010, "Implementation
    * and Benchmarking of Perceptual Image Hash Functions") over REAL
    * image payloads: average-pool the decode to a 32×32 integer luma
    * grid (the [[lumaGrid]] BT.601 block-mean recipe at 32×32), take the
    * 2-D DCT-II's top-left 8×8 LOW-FREQUENCY block, drop the DC term,
    * and set bit i when AC coefficient i exceeds the median of the 63 —
    * the global-structure hash that stays close under the SMALL
    * rotations and crops that flip dHash's local gradient signs
    * (spec-measured on generated PNGs: ≤ quarter-hash Hamming for
    * 2-3° rotation / 10% crop, near-independent hashes for unrelated
    * content). dHash remains the cheap first-line key; this face is the
    * robustness extension riding the SAME [0, 2⁶³) space, so
    * [[graft.ops.Dedup.dhashNearDup]]'s banding/Hamming/CC machinery
    * serves both unchanged.
    *
    * Determinism: integer luma pooling (no float), then a fixed-order
    * separable DCT in doubles with a StrictMath cosine table — IEEE ops
    * in one fixed association order, bit-identical on any JVM/partitioning.
    * Median threshold = element 31 of the 63 sorted AC coefficients;
    * strict `>` keeps ties stable. Junk bytes / sub-32×32 images come
    * back ok = false with a null hash (the decodeImage contract). Scale
    * shape: pure mapPartitions over the payload scan — decode
    * parallelism IS the table's partitioning, no shuffle.
    */
  def imagePhash(media: DataFrame, idCol: String = "doc_id",
                 payloadCol: String = "payload"): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val ct = dctTable // local copy: the task closure must not drag the object
    def hash(id: Long, bytes: Array[Byte]): (Long, Boolean, Option[Long]) =
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img == null || img.getWidth < 32 || img.getHeight < 32)
          (id, false, None)
        else {
          val w = img.getWidth; val h = img.getHeight
          val sums = new Array[Long](1024)
          val cnts = new Array[Long](1024)
          val row = new Array[Int](w)
          var y = 0
          while (y < h) {
            val r = y * 32 / h
            img.getRGB(0, y, w, 1, row, 0, w)
            var x = 0
            while (x < w) {
              val c = x * 32 / w
              val px = row(x)
              sums(r * 32 + c) += (299 * ((px >> 16) & 0xFF) +
                587 * ((px >> 8) & 0xFF) + 114 * (px & 0xFF)) / 1000
              cnts(r * 32 + c) += 1
              x += 1
            }
            y += 1
          }
          val luma = Array.tabulate(1024)(i => (sums(i) / cnts(i)).toDouble)
          // separable DCT-II: rows → 32×8 partials, then columns → 8×8
          val rowsD = Array.ofDim[Double](32, 8)
          var r = 0
          while (r < 32) {
            var v = 0
            while (v < 8) {
              var s = 0.0; var x = 0
              while (x < 32) { s += luma(r * 32 + x) * ct(v)(x); x += 1 }
              rowsD(r)(v) = s; v += 1
            }
            r += 1
          }
          val coef = new Array[Double](64)
          var u = 0
          while (u < 8) {
            var v = 0
            while (v < 8) {
              var s = 0.0; var yy = 0
              while (yy < 32) { s += rowsD(yy)(v) * ct(u)(yy); yy += 1 }
              coef(u * 8 + v) = s; v += 1
            }
            u += 1
          }
          val ac = java.util.Arrays.copyOfRange(coef, 1, 64)
          val sorted = ac.clone(); java.util.Arrays.sort(sorted)
          val med = sorted(31)
          var bits = 0L; var i = 0
          while (i < 63) { if (ac(i) > med) bits |= (1L << i); i += 1 }
          (id, true, Some(bits))
        }
      } catch { case _: Exception => (id, false, None) }
    media.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(64).flatMap(_.map { case (id, bytes) =>
        hash(id, if (bytes == null) Array.emptyByteArray else bytes)
      }))
      .toDF("doc_id", "ok", "dhash")
  }

  /** AUDIO perceptual fingerprint — the envelope analogue of the image
    * dHash, over the REAL javax.sound WAV/AIFF/AU decode boundary
    * ([[decodeAudio]]'s codecs): the 16-bit PCM stream splits into 64
    * equal frames (interleaved samples — the volume envelope of the mix),
    * each frame's mean energy is the exact integer Σs²/count (s the raw
    * 16-bit sample: s² ≤ 2³⁰, an hour-long frame still fits a Long —
    * no float anywhere, bit-stable), and bit b ∈ [0,63) of the
    * fingerprint is set when frame b+1 carries strictly more mean energy
    * than frame b. Energy-RATIO signs survive uniform volume scaling
    * (gain moves every frame by the same factor) and resampling —
    * the property that makes an envelope hash a near-dup key rather
    * than a checksum. Emitted as `dhash` ∈ [0, 2⁶³) so the SAME
    * banding/Hamming/CC machinery ([[Dedup.dhashNearDup]] /
    * [[Dedup.dhashDedup]]) serves images and audio alike.
    *
    * ok = false (null hash) for undecodable bytes, non-16-bit-PCM
    * encodings, unknown frame counts, or clips shorter than 64 samples
    * — the decodeImage junk-bytes contract. Scale shape: pure
    * mapPartitions, one 64 KB read buffer per clip (the decodeAudio
    * streaming-Σ pattern — decoded PCM never materializes), decode
    * parallelism IS the table's partitioning.
    */
  def audioFingerprint(media: DataFrame, idCol: String = "doc_id",
                       payloadCol: String = "payload"): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    def fp(id: Long, bytes: Array[Byte]): (Long, Boolean, Option[Long]) =
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val fmt = in.getFormat
          val nSamples =
            if (in.getFrameLength >= 0) in.getFrameLength * fmt.getChannels
            else -1L
          if (fmt.getSampleSizeInBits != 16 ||
              fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
              nSamples < 64) (id, false, None)
          else {
            val sums = new Array[Long](64)
            val cnts = new Array[Long](64)
            val buf = new Array[Byte](65536)
            var idx = 0L
            var pending: Byte = 0
            var havePending = false
            var read = in.read(buf)
            while (read != -1) {
              var i = 0
              def add(s: Short): Unit = {
                // frame of sample idx: idx·64/nSamples — monotone, exact
                val f = (idx * 64 / nSamples).toInt
                if (f < 64) { sums(f) += s.toLong * s; cnts(f) += 1 }
                idx += 1
              }
              if (havePending && read >= 1) {
                val s =
                  if (fmt.isBigEndian) ((pending << 8) | (buf(0) & 0xFF)).toShort
                  else ((buf(0) << 8) | (pending & 0xFF)).toShort
                add(s); havePending = false; i = 1
              }
              while (i + 1 < read) {
                val s =
                  if (fmt.isBigEndian) ((buf(i) << 8) | (buf(i + 1) & 0xFF)).toShort
                  else ((buf(i + 1) << 8) | (buf(i) & 0xFF)).toShort
                add(s); i += 2
              }
              if (i < read) { pending = buf(i); havePending = true }
              read = in.read(buf)
            }
            var h = 0L
            var b = 0
            while (b < 63) {
              val e0 = if (cnts(b) > 0) sums(b) / cnts(b) else 0L
              val e1 = if (cnts(b + 1) > 0) sums(b + 1) / cnts(b + 1) else 0L
              if (e1 > e0) h |= 1L << b
              b += 1
            }
            (id, true, Some(h))
          }
        } finally in.close()
      } catch { case _: Exception => (id, false, None) }
    media.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(64).flatMap(_.map { case (id, bytes) =>
        fp(id, if (bytes == null) Array.emptyByteArray else bytes)
      }))
      .toDF("doc_id", "ok", "dhash")
  }

  /** STUB per-frame video dHash — the oracled VIDEO face, completing the
    * modality matrix (image [[imageDhashStub]], audio
    * [[audioFingerprint]], video here): a clip fans into
    * `n_frames = min(1 + length(text) div 256, maxFrames)` frames (the
    * [[frameSample]] planning shape — the explode IS the real
    * distributed step; frame decode is the stubbed codec boundary), and
    * frame f's luma grid derives from `md5(text || '#' || f)` by the
    * [[lumaGridStub]] hex-pair rule — content-derived, codec-free,
    * SQL-replayable, and genuinely DIFFERENT per frame (distinct digest
    * per (clip, frame)), so downstream frame alignment exercises for
    * real: identical clips agree on every frame, different clips on
    * none. Emits (doc_id, n_frames, frame_idx, dhash) with dhash in the
    * shared 63-bit space.
    */
  def videoFrameDhashStub(docs: DataFrame, maxFrames: Int = 4): DataFrame = {
    require(maxFrames >= 1, "maxFrames >= 1")
    val nf = least(lit(1L) + floor(length(col("text")) / lit(256)).cast("long"),
      lit(maxFrames.toLong))
    val hx = md5(concat(col("text"), lit("#"), col("f").cast("string"))
      .cast("binary"))
    docs.select(col("doc_id"), col("text"), nf.as("n_frames"))
      .select(col("doc_id"), col("n_frames"), col("text"),
        explode(sequence(lit(0L), col("n_frames") - 1L)).as("f"))
      // the luma array materializes in its OWN projection so the 126
      // element_at references in dhashFromLuma share one evaluation
      // (inlining it would copy the 72-conv subtree into every
      // reference — a ~70x expression blowup CollapseProject correctly
      // refuses to create but cannot undo)
      .select(col("doc_id"), col("n_frames"), col("f").as("frame_idx"),
        array((0 until 72).map(i =>
          conv(substring(hx, (i * 2) % 31 + 1, 2), 16, 10).cast("int")): _*)
          .as("luma"))
      .select(col("doc_id"), col("n_frames"), col("frame_idx"),
        dhashFromLuma(col("luma")).as("dhash"))
  }

  /** REAL per-frame video dHash over already-extracted frame images —
    * the production boundary a cluster deployment feeds (a container
    * demuxer upstream emits (clip, frame_idx, encoded frame); the JDK
    * carries no video codec, so frame EXTRACTION stays upstream while
    * everything after it — decode, luma pool, hash, dedup — is real):
    * `frames` is (doc_id, frame_idx, payload) with payload a
    * javax.imageio-decodable image. Packs (doc_id, frame_idx) into one
    * BIGINT (doc_id·2²⁰ + idx — the aroon/span_dedup packing idiom,
    * headroom 2⁴³ clips × 2²⁰ frames) so [[lumaGrid]]'s single-id decode
    * boundary serves unchanged, then unpacks. Emits
    * (doc_id, frame_idx, ok, dhash) — ok = false null-hash per FRAME on
    * junk bytes (one broken frame never poisons its clip).
    */
  def frameDhash(frames: DataFrame, idCol: String = "doc_id",
                 frameCol: String = "frame_idx",
                 payloadCol: String = "payload"): DataFrame =
    lumaGrid(
      frames.select(
        // guarded packing: a >2^20 frame_idx (or negative id) raises
        // instead of silently colliding two clips' frames
        Dedup.packKey20(col(idCol).cast("long"),
          col(frameCol).cast("long")).as("doc_id"),
        col(payloadCol).cast("binary").as("payload")))
      .select(expr("doc_id DIV 1048576").as("doc_id"),
        pmod(col("doc_id"), lit(1048576L)).cast("long").as("frame_idx"),
        col("ok"),
        when(col("ok"), dhashFromLuma(col("luma"))).as("dhash"))

  /** (doc_id, dhash) over the stub luma face — the oracled plumbing. */
  def imageDhashStub(docs: DataFrame): DataFrame =
    lumaGridStub(docs)
      .select(col("doc_id"), dhashFromLuma(col("luma")).as("dhash"))

  def decodeStub(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    def fakeDecode(id: Long, bytes: Array[Byte]): (Long, Long, Long, Long, Array[Double]) = {
      // STUB: deterministic content-derived metadata + feature vector.
      val hexD = java.security.MessageDigest.getInstance("MD5").digest(bytes)
        .map("%02x".format(_)).mkString
      val h = java.lang.Long.parseLong(hexD.substring(0, 8), 16)
      val w = 16 + h % 64
      val ht = 16 + (h >> 8) % 64
      val feat = Array.tabulate(8)(i =>
        java.lang.Long.parseLong(hexD.substring(2 * i, 2 * i + 2), 16) / 255.0)
      (id, w, ht, 3L, feat)
    }

    // null payloads (malformed feed rows) drop at the decode boundary —
    // there is nothing to decode, and the digest would NPE
    docs.where(col("text").isNotNull)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(64).flatMap(_.map { case (id, bytes) =>
        val (i, w, h, c, f) = fakeDecode(id, bytes)
        (i, w, h, c, f(0), f(1), f(2), f(3), f(4), f(5), f(6), f(7))
      }))
      .toDF("doc_id", "width", "height", "channels",
        "f0", "f1", "f2", "f3", "f4", "f5", "f6", "f7")
  }
}
