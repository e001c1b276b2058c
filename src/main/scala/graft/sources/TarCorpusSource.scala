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
    * row's UTF-8 text under the row's name. */
  def write(df: DataFrame, dir: String, shards: Int,
      nameCol: String = "name", textCol: String = "text"): Unit = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    val spark = df.sparkSession
    import spark.implicits._
    val fs = FileSystem.get(new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(dir), true)
    fs.mkdirs(new Path(dir))
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
        val conf = new Configuration()
        val pfs = FileSystem.get(new java.net.URI(dir), conf)
        val out = new DataOutputStream(pfs.create(new Path(dir, f"part-$pid%05d.tar"), true))
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
        Iterator.single(n)
      }
      .count() // force the write
  }

  /** Open a directory of tar shards as `(entry_name, text)` — one
    * task per shard, members decoded as UTF-8. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.binaryFiles(s"$dir/*.tar")
      .flatMap { case (path, stream) =>
        val bytes = stream.toArray()
        val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
        var off = 0
        var done = false
        while (!done && off + BlockSize <= bytes.length) {
          val h = java.util.Arrays.copyOfRange(bytes, off, off + BlockSize)
          if (h.forall(_ == 0)) done = true // end-of-archive zero block
          else {
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
                s"$path: corrupt tar header at offset $off (checksum mismatch for '$name')")
            val start = off + BlockSize
            require(start + size <= bytes.length,
              s"$path: truncated member '$name' (declared $size bytes past EOF)")
            out += ((name, new String(bytes, start, size.toInt, StandardCharsets.UTF_8)))
            val padded = ((size + BlockSize - 1) / BlockSize) * BlockSize
            off = start + padded.toInt
          }
        }
        out.iterator
      }
      .toDF("entry_name", "text")
  }
}
