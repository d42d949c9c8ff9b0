package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared SILVER-TABLE memoization — the pipeline-checkpoint pattern
  * [[TextPack]]'s pair table established, factored out in r17 when the
  * kNN candidate relation became the second cross-query table: the
  * first query to need a relation materializes it ONCE as parquet
  * (keyed on a caller-built content key per JVM); every later consumer
  * reads the table instead of re-running the build pipeline — the
  * twice-paid cost a real pipeline would never pay. Survives
  * `catalog.clearCache()` because it is a table, not a cached plan;
  * lives under the Spark warehouse dir (executor-visible on a real
  * cluster, unlike a driver-local java.io tempdir); deleted by a JVM
  * shutdown hook.
  */
object SilverTables {

  // Values are LAZY CELLS, not evaluated paths: computeIfAbsent's
  // mapping function must not touch the map (JDK contract — a nested
  // update on the same map can throw "Recursive update" or livelock
  // when two keys share a hash bin), and build thunks here DO nest
  // (the pair-table build materializes the shingle-df table from its
  // own scan). So the mapping function only allocates an unevaluated
  // cell; the pipeline runs via `cell.value` OUTSIDE the bin lock,
  // where a nested memoized() call is just another cheap allocate.
  // `lazy val` gives the evaluate-at-most-once guarantee a racing
  // second caller needs (it blocks on the cell monitor, not the map) —
  // the same reason this was ConcurrentHashMap and not TrieMap's
  // getOrElseUpdate (which may run a racing thunk twice — the
  // zorderDirs fix).
  private final class LazyCell(thunk: () => String) {
    lazy val value: String = thunk()
  }
  private val tableDirs =
    new java.util.concurrent.ConcurrentHashMap[String, LazyCell]()
  private val scratchDirs =
    new java.util.concurrent.ConcurrentLinkedQueue[String]()
  private val cleanupHooked =
    new java.util.concurrent.atomic.AtomicBoolean(false)

  private def registerScratch(s: SparkSession, dir: String): Unit = {
    scratchDirs.add(dir)
    if (cleanupHooked.compareAndSet(false, true)) {
      val conf = s.sparkContext.hadoopConfiguration
      sys.addShutdownHook {
        scratchDirs.forEach { dstr =>
          val p = new org.apache.hadoop.fs.Path(dstr)
          try p.getFileSystem(conf).delete(p, true)
          catch { case _: Throwable => () }
        }
      }
    }
  }

  /** Build-or-read keyed on `tag` + a caller-built `key` (the caller
    * includes the data dir and a CONTENT fingerprint — see
    * [[graft.Tables.fingerprintKeyAny]] — so a rewritten dataset at
    * the same path invalidates instead of silently serving stale
    * rows). `build` must write parquet to the path it is given. */
  def memoized(s: SparkSession, tag: String, key: String)
              (build: String => Unit): DataFrame = {
    val full = tag + ":" + key
    def materialize(): String = {
      // full md5 of the key, not a 32-bit hashCode: two data dirs
      // colliding would silently cross-serve each other's table;
      // the applicationId nonce keeps two JVMs on the same checkout
      // (e.g. sbt test and Bench in CI) from overwriting or
      // shutdown-hook-deleting each other's table mid-run
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(full.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val out = s.conf.get("spark.sql.warehouse.dir").stripSuffix("/") +
        s"/graft_${tag}_" + digest + "_" + s.sparkContext.applicationId
      build(out)
      registerScratch(s, out)
      out
    }
    val cell = tableDirs.computeIfAbsent(full, _ => new LazyCell(() => materialize()))
    val path = cell.value
    // belt-and-braces re-check: if anything outside this JVM removed
    // the memoized table (warehouse wipe, external cleanup), drop the
    // stale memo and re-materialize instead of failing mid-read
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val live = if (fs.exists(p)) path else {
      tableDirs.remove(full, cell)
      tableDirs.computeIfAbsent(full, _ => new LazyCell(() => materialize())).value
    }
    s.read.parquet(live)
  }
}
