package graft.sources

import org.apache.hadoop.conf.Configuration

/** Serializable Hadoop-configuration carrier — ships the DRIVER
  * session's resolved `spark.hadoop.*` settings (object-store
  * credentials, custom filesystem bindings) into executor tasks, where
  * `SparkSession.getActiveSession` is absent and a bare
  * `new Configuration()` would silently drop them. Hadoop's own
  * `Configuration` is not `Serializable`; this captures its resolved
  * key/value entries at construction (driver-side) and rebuilds an
  * equivalent conf lazily on first use at the deserialization site —
  * the same shape as Spark's internal `SerializableConfiguration`,
  * re-expressed on the public API only.
  *
  * Scale note: a resolved conf is a few hundred small string pairs —
  * KBs per task closure, dwarfed by the reader factory it rides with. */
final class GraftSerConf(@transient private val src: Configuration)
    extends Serializable {
  private val entries: Array[(String, String)] = {
    val it = src.iterator()
    val buf = Array.newBuilder[(String, String)]
    while (it.hasNext) {
      val e = it.next()
      buf += ((e.getKey, e.getValue))
    }
    buf.result()
  }

  /** The rebuilt conf — cached per JVM deserialization. `loadDefaults =
    * false`: the captured entries already include the driver's resolved
    * defaults, and re-layering the executor's local defaults under them
    * could resurrect exactly the settings the session overrode. */
  @transient lazy val value: Configuration = {
    val c = new Configuration(false)
    entries.foreach { case (k, v) => c.set(k, v) }
    c
  }
}

object GraftSerConf {
  /** Capture the active session's Hadoop conf (driver-side). */
  def session(): GraftSerConf =
    new GraftSerConf(GraftParquetWrite.sessionConf())
}
