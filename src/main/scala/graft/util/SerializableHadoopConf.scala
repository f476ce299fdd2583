package graft.util

/** Ships a Hadoop `Configuration` inside a Spark task closure —
  * `Configuration` implements Hadoop `Writable` but not
  * `java.io.Serializable`, so Java serialization needs this shim
  * (the same pattern Spark uses internally for its own Hadoop-conf
  * broadcasts; re-expressed here because that class is
  * `private[spark]`). */
class SerializableHadoopConf(@transient var value: org.apache.hadoop.conf.Configuration)
    extends Serializable {

  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }

  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new org.apache.hadoop.conf.Configuration(false)
    value.readFields(in)
  }
}
