package graft

/** JVM-lifetime temp directories for memoized derived layouts (the
  * z-ordered copy, the day-partitioned copy, the CSV round-trip copy,
  * streaming-MERGE snapshots). One shared shutdown hook deletes every
  * registered dir — previously each site re-implemented the
  * createTempDirectory + addShutdownHook + recursive-rm block and the
  * copies had diverged (one missed the null-guard on `listFiles`,
  * which NPEs in the hook on an already-deleted dir). */
object TempDirs {
  private val dirs = new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
  private lazy val hookInstalled: Boolean = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      dirs.forEach(p => deleteRecursively(p))
    }))
    true
  }

  /** Create a temp dir registered for deletion at JVM exit. */
  def create(prefix: String): java.nio.file.Path = {
    require(hookInstalled)
    val p = java.nio.file.Files.createTempDirectory(prefix)
    dirs.add(p)
    p
  }

  /** [[create]] under an explicit parent (e.g. a RAM-backed scratch
    * dir for stream checkpoints); same exit-hook registration. */
  def createUnder(base: String, prefix: String): java.nio.file.Path = {
    require(hookInstalled)
    val parent = java.nio.file.Paths.get(base)
    java.nio.file.Files.createDirectories(parent)
    val p = java.nio.file.Files.createTempDirectory(parent, prefix)
    dirs.add(p)
    p
  }

  /** Best-effort recursive delete (also used to prune superseded
    * snapshot versions before JVM exit). */
  def deleteRecursively(p: java.nio.file.Path): Unit = {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(rm)
      f.delete(); ()
    }
    rm(p.toFile)
  }
}
