package graft.sources

import org.apache.hadoop.conf.Configuration

/** Java-serializable carrier for a Hadoop `Configuration` (which is
  * itself not Serializable): writer tasks must resolve FileSystems
  * with the DRIVER's session configuration — credentials, `fs.*`
  * implementation overrides, endpoints — not a fresh empty one, or on
  * any non-default filesystem (S3, custom schemes) they would fail,
  * or worse, write to a different filesystem than the driver cleaned.
  * Standard Writable round-trip through Java serialization; broadcast
  * once per write job ([[TarCorpusSource.write]],
  * [[WarcCorpusSource.write]]).
  */
final class SerializableHadoopConf(@transient private var c: Configuration)
    extends Serializable {
  def conf: Configuration = c
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    c.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    c = new Configuration(false)
    c.readFields(in)
  }
}
