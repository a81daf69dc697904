package graft.io

/** Serializable carrier for the driver's hadoopConfiguration (Hadoop's
  * `Configuration` class itself is not `Serializable`): broadcast it so
  * executor-side FileSystem resolution keeps the session's defaultFS /
  * credential settings instead of a bare `new Configuration()`.
  */
private[graft] final class HadoopConfCarrier(
    @transient conf: org.apache.hadoop.conf.Configuration) extends Serializable {
  private val entries: Array[(String, String)] = {
    val it = conf.iterator()
    val b = Array.newBuilder[(String, String)]
    while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue) }
    b.result()
  }
  def toConf: org.apache.hadoop.conf.Configuration = {
    val c = new org.apache.hadoop.conf.Configuration(false)
    entries.foreach { case (k, v) => c.set(k, v) }
    c
  }
}
