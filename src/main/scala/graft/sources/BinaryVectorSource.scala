package graft.sources

import java.io.DataOutputStream
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reader/writer for the reference's on-disk vector format: a
  * headerless, packed, row-major little-endian float32 file
  * (`/root/reference/src/disk_store.rs:7-36`; written by
  * `numpy.tofile`, `generate_mock_data.py:18`). Row ids are implicit
  * ordinals — row i lives at byte range [i*dims*4, (i+1)*dims*4).
  *
  * Spark rendering: `sc.binaryRecords` with a fixed record length is
  * the distributed analog of the mmap scan — each partition decodes its
  * byte range; the OS page cache plays the same role it does for the
  * reference. The divisibility check mirrors
  * `MmapVectorStore::open`'s InvalidData error (`disk_store.rs:22-27`).
  *
  * The sink writes one packed part-file per task (lexicographic file
  * order == row order, so a directory of parts is itself a valid
  * dataset); no driver collect at any size.
  */
object BinaryVectorSource {

  /** Open a packed-f32 file or directory of part files as
    * (vec_id, embedding), ids assigned by byte order. */
  def read(spark: SparkSession, path: String, dims: Int): DataFrame = {
    import spark.implicits._
    val recordBytes = dims * 4
    // divisibility check per file (ref disk_store.rs:22-27)
    val fs = FileSystem.get(new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val statuses = {
      val p = new Path(path)
      if (fs.getFileStatus(p).isDirectory) fs.listStatus(p).filter(_.isFile) else Array(fs.getFileStatus(p))
    }
    statuses.foreach { st =>
      if (st.getLen % recordBytes != 0)
        throw new IllegalArgumentException(
          s"${st.getPath}: size ${st.getLen} is not a multiple of dims*4=$recordBytes " +
            "(ref MmapVectorStore::open InvalidData, disk_store.rs:22-27)")
    }
    // Hadoop file listing order is NOT guaranteed; read files in
    // explicit lexicographic order with explicit id offsets so ordinal
    // assignment is stable on any filesystem.
    val ordered = statuses.sortBy(_.getPath.getName)
    val offsets = ordered.map(_.getLen / recordBytes).scanLeft(0L)(_ + _)
    val rdds = ordered.zip(offsets).map { case (st, offset) =>
      spark.sparkContext.binaryRecords(st.getPath.toString, recordBytes)
        .zipWithIndex()
        .map { case (bytes, idx) =>
          val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
          val arr = new Array[Float](dims)
          var i = 0
          while (i < dims) { arr(i) = buf.getFloat(); i += 1 }
          (offset + idx, arr)
        }
    }
    spark.sparkContext.union(rdds.toSeq).toDF("vec_id", "embedding")
  }

  /** Write vectors as packed-f32 part files under `dir` (overwrites).
    * Rows are globally sorted by `idCol` so read-back ordinals equal the
    * original ids when ids are contiguous from 0. */
  def write(df: DataFrame, dir: String, dims: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val fs = FileSystem.get(new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(dir), true)
    fs.mkdirs(new Path(dir))
    df.select(col(idCol).cast("long"), col(vecCol).cast("array<float>"))
      .as[(Long, Array[Float])]
      .orderBy(col(idCol))
      .rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val conf = new Configuration()
        val pfs = FileSystem.get(new java.net.URI(dir), conf)
        val out = new DataOutputStream(pfs.create(new Path(dir, f"part-$pid%05d.bin"), true))
        var n = 0L
        val buf = ByteBuffer.allocate(dims * 4).order(ByteOrder.LITTLE_ENDIAN)
        it.foreach { case (_, vec) =>
          require(vec.length == dims, s"dimension mismatch: ${vec.length} != $dims")
          buf.clear()
          vec.foreach(buf.putFloat)
          out.write(buf.array())
          n += 1
        }
        out.close()
        Iterator.single(n)
      }
      .count() // force the write
  }
}
