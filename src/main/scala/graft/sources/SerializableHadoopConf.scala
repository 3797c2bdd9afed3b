package graft.sources

import java.io.{ObjectInputStream, ObjectOutputStream}
import org.apache.hadoop.conf.Configuration

/** Java-serializable carrier for a Hadoop `Configuration` (which isn't
  * `Serializable` itself — it ships its entries via `Writable`). Spark
  * has the identical wrapper internally but keeps it `private[spark]`;
  * distributed sinks ([[GraftAvro.write]]) broadcast this one so every
  * executor resolves the SAME `FileSystem` the driver would — object-
  * store credentials, defaultFS and all — instead of a bare
  * `new Configuration()` that only sees cluster defaults.
  */
class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {

  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }

  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
