package graft.util

import org.apache.hadoop.conf.Configuration
import java.io.{ObjectInputStream, ObjectOutputStream}

/** Hadoop `Configuration` is not `Serializable`; tasks that touch the
  * filesystem on executors (Arrow reader/writer) must capture it at plan
  * time on the driver and ship it — `SparkSession.active` does NOT exist on
  * executor JVMs in cluster mode.
  */
class SerializableHadoopConf(@transient var value: Configuration) extends Serializable {
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
