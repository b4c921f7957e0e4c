package graft.util

import org.apache.hadoop.conf.Configuration

/** Java-serializable wrapper around a Hadoop [[Configuration]] (which is
  * Writable but not Serializable), so executor-side filesystem access uses
  * the SESSION'S Hadoop settings — S3A credentials, fs.* overrides applied
  * via `spark.hadoopConfiguration` — instead of a bare `new Configuration()`
  * that silently drops them. Same shape as Spark's internal
  * SerializableConfiguration (private[spark], so re-stated here).
  */
class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
