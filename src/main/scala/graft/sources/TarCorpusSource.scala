package graft.sources

import java.io.DataOutputStream
import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** POSIX ustar TAR reader/writer for text corpora (extension — the
  * web-corpus interchange shape: crawl dumps, WET-style shards, and
  * dataset releases ship as directories of tar shards holding one
  * member file per document).
  *
  * Spark rendering: the SHARD is the parallel unit — the writer emits
  * one `.tar` part file per task and the reader fans one task per
  * shard (`binaryFiles`), so a corpus laid out as many tar shards
  * reads with full parallelism even though a single tar stream is
  * inherently sequential (headers chain by content length). That is
  * the production contract: a 100 TB tar corpus is thousands of
  * shards, never one archive. Entry payloads are parsed from exact
  * ustar 512-byte header/block arithmetic — name (NUL-terminated),
  * octal size, verified checksum — so a corrupted shard fails loudly
  * instead of yielding silently truncated documents.
  *
  * TAR has no NULL representation (an absent member and an empty one
  * are the only states), so the writer REJECTS null names/contents
  * rather than silently coining a sentinel — callers filter or encode
  * first (the CSV source's explicit-sentinel lesson, inverted: here
  * the format genuinely cannot carry the distinction).
  */
object TarCorpusSource {

  private val BlockSize = 512

  /** One ustar header block for a regular file `name` of `size` bytes
    * (mode 0644, uid/gid 0, mtime 0 — deterministic archives: the
    * same corpus always byte-identical, so shard-level dedup/caching
    * works on content hashes). */
  private def header(name: String, size: Long): Array[Byte] = {
    val nameBytes = name.getBytes(StandardCharsets.UTF_8)
    require(nameBytes.length > 0 && nameBytes.length <= 100,
      s"tar member name must be 1..100 bytes, got ${nameBytes.length} ('$name')")
    val h = new Array[Byte](BlockSize)
    def put(off: Int, s: String): Unit = {
      val b = s.getBytes(StandardCharsets.US_ASCII)
      System.arraycopy(b, 0, h, off, b.length)
    }
    System.arraycopy(nameBytes, 0, h, 0, nameBytes.length)
    put(100, "0000644\u0000")                       // mode
    put(108, "0000000\u0000")                       // uid
    put(116, "0000000\u0000")                       // gid
    put(124, f"$size%011o\u0000")                   // size, octal
    put(136, "00000000000\u0000")                   // mtime 0
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)  // chksum = spaces while summing
    h(156) = '0'                                    // typeflag: regular file
    put(257, "ustar\u0000")                         // magic
    put(263, "00")                                  // version
    var sum = 0L
    var i = 0
    while (i < BlockSize) { sum += (h(i) & 0xff); i += 1 }
    put(148, f"$sum%06o\u0000 ")
    h
  }

  /** Write `(nameCol, textCol)` rows as `shards` tar part files under
    * `dir` (overwrites). One archive per task; each member is the
    * row's UTF-8 text under the row's name.
    *
    * Tasks resolve their FileSystem from a BROADCAST of the driver's
    * session hadoopConfiguration ([[SerializableHadoopConf]]) — the
    * same credentials/fs-overrides the driver's delete/mkdirs used —
    * and COMMIT via write-to-temp + rename: a speculative duplicate
    * attempt writes its own `.tmp` file (invisible to the reader's
    * `*.tar` glob) and withdraws when it finds the winner's rename
    * already in place, so attempts never interleave bytes in one
    * final file. */
  def write(df: DataFrame, dir: String, shards: Int,
      nameCol: String = "name", textCol: String = "text"): Unit = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    val spark = df.sparkSession
    import spark.implicits._
    val sc = spark.sparkContext
    val fs = FileSystem.get(new java.net.URI(dir), sc.hadoopConfiguration)
    fs.delete(new Path(dir), true)
    fs.mkdirs(new Path(dir))
    val bcConf = sc.broadcast(new SerializableHadoopConf(sc.hadoopConfiguration))
    df.select(
        when(col(nameCol).isNull || col(textCol).isNull,
          raise_error(lit("tar cannot represent NULL names/contents — " +
            "filter or encode before TarCorpusSource.write")))
          .otherwise(col(nameCol).cast("string")).as("n"),
        col(textCol).cast("string").as("t"))
      .as[(String, String)]
      .repartition(shards)
      .rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val pfs = FileSystem.get(new java.net.URI(dir), bcConf.value.conf)
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId()).getOrElse(0L)
        val tmp = new Path(dir, f"part-$pid%05d.tar.$attempt%d.tmp")
        val fin = new Path(dir, f"part-$pid%05d.tar")
        val out = new DataOutputStream(pfs.create(tmp, true))
        var n = 0L
        it.foreach { case (name, text) =>
          val content = text.getBytes(StandardCharsets.UTF_8)
          out.write(header(name, content.length.toLong))
          out.write(content)
          val pad = (BlockSize - content.length % BlockSize) % BlockSize
          if (pad > 0) out.write(new Array[Byte](pad))
          n += 1
        }
        out.write(new Array[Byte](2 * BlockSize)) // end-of-archive
        out.close()
        if (!pfs.rename(tmp, fin)) {
          // rename refuses when the destination exists: a faster
          // attempt already committed this shard — withdraw
          pfs.delete(tmp, false)
          require(pfs.exists(fin), s"tar shard commit failed: $fin")
        }
        Iterator.single(n)
      }
      .count() // force the write
  }

  /** Single-member size bound for [[read]]: a member is a DOCUMENT
    * (it decodes to one java String), so anything approaching the
    * 2 GiB String/array ceiling is a data bug this source refuses
    * loudly instead of OOMing opaquely. */
  val MaxMemberBytes: Long = 1L << 30

  /** Open a directory of tar shards as `(entry_name, text)` — one
    * task per shard, members decoded as UTF-8.
    *
    * The shard streams INCREMENTALLY (`PortableDataStream.open()`,
    * 512-byte header blocks, `Long` offsets): task memory holds one
    * member at a time, never the whole archive, so the many-small-
    * shards contract bounds memory by the largest MEMBER, not the
    * shard size — and an oversized member fails loudly against
    * [[MaxMemberBytes]] instead of OOMing. Truncation mid-member or
    * mid-padding raises the same loud contract error the byte-exact
    * header checksum does. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.binaryFiles(s"$dir/*.tar")
      .flatMap { case (path, stream) =>
        val in = new java.io.DataInputStream(new java.io.BufferedInputStream(stream.open()))
        // close on task end even if a downstream limit stops early
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ =>
            try in.close() catch { case scala.util.control.NonFatal(_) => () }))
        new Iterator[(String, String)] {
          private var off = 0L
          private var done = false
          private var queued: (String, String) = null

          private def fill(b: Array[Byte], what: => String): Unit =
            try { in.readFully(b); off += b.length }
            catch {
              case _: java.io.EOFException =>
                throw new IllegalArgumentException(
                  s"$path: truncated shard at offset $off ($what past EOF)")
            }

          private def advance(): Unit = {
            if (done || queued != null) return
            val h = new Array[Byte](BlockSize)
            // clean EOF at a header boundary ends the archive (some
            // writers omit the trailing zero blocks); EOF anywhere
            // else is loud truncation
            val n = in.read(h, 0, BlockSize)
            if (n < 0) { done = true; return }
            if (n < BlockSize) {
              val m = try { in.read(h, n, BlockSize - n) } catch {
                case _: java.io.EOFException => -1
              }
              if (m < 0 || n + m < BlockSize)
                throw new IllegalArgumentException(
                  s"$path: truncated shard at offset $off (partial header block)")
            }
            off += BlockSize
            if (h.forall(_ == 0)) { done = true; return } // end-of-archive
            var nameEnd = 0
            while (nameEnd < 100 && h(nameEnd) != 0) nameEnd += 1
            val name = new String(h, 0, nameEnd, StandardCharsets.UTF_8)
            val sizeStr = new String(h, 124, 12, StandardCharsets.US_ASCII)
              .takeWhile(c => c >= '0' && c <= '7')
            val size = java.lang.Long.parseLong(sizeStr, 8)
            // verify the header checksum: sum with the chksum field as
            // spaces must equal the recorded octal value
            val recorded = new String(h, 148, 8, StandardCharsets.US_ASCII)
              .takeWhile(c => c >= '0' && c <= '7')
            java.util.Arrays.fill(h, 148, 156, ' '.toByte)
            val sum = h.foldLeft(0L)((a, b) => a + (b & 0xff))
            if (recorded.isEmpty || java.lang.Long.parseLong(recorded, 8) != sum)
              throw new IllegalArgumentException(
                s"$path: corrupt tar header at offset ${off - BlockSize} " +
                  s"(checksum mismatch for '$name')")
            require(size <= MaxMemberBytes,
              s"$path: member '$name' declares $size bytes — past the " +
                s"$MaxMemberBytes single-member bound (members are documents; " +
                "shard the corpus, don't archive blobs)")
            val content = new Array[Byte](size.toInt)
            fill(content, s"member '$name' (declared $size bytes)")
            val pad = ((size + BlockSize - 1) / BlockSize * BlockSize - size).toInt
            if (pad > 0) fill(new Array[Byte](pad), s"padding after '$name'")
            queued = (name, new String(content, StandardCharsets.UTF_8))
          }

          override def hasNext: Boolean = { advance(); queued != null }
          override def next(): (String, String) = {
            advance()
            if (queued == null) throw new NoSuchElementException("tar iterator drained")
            val r = queued; queued = null; r
          }
        }
      }
      .toDF("entry_name", "text")
  }
}
