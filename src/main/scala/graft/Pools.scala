package graft

/** Sizing for the driver-side concurrency pools (CrossVal fold fits,
  * Reduction candidate scans, TextPack shared-table builds). Each pool
  * runs independent Spark actions concurrently but joins its futures
  * in a FIXED submission order, so the output is byte-identical to the
  * sequential loop at ANY pool size — `ConcurrencySpec` enforces that
  * invariant in-tree by running the same operation at size 1 and at
  * full width and asserting identical results. The `graft.pool.size`
  * system property caps the width (the spec's lever; also an operator
  * escape hatch on a driver with tight thread budgets); unset means
  * full width.
  */
object Pools {
  def size(default: Int): Int =
    sys.props.get("graft.pool.size")
      .flatMap(s => scala.util.Try(s.toInt).toOption)
      .map(n => math.max(1, math.min(n, default)))
      .getOrElse(default)

  def newPool(default: Int): java.util.concurrent.ExecutorService =
    java.util.concurrent.Executors.newFixedThreadPool(size(default))
}
