package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Folds

/** M4 `kfold_dask` (`tuners.py:100-146`): era-grouped k-fold
  * cross-validation of an arbitrary fit/predict pair.
  *
  * The reference scatters fold blocks to pinned workers and gathers
  * scores; here each fold's train/test split is a broadcast-join
  * filter against the fold-assignment relation (the fact table is
  * scanned, never collected), the model fit is whatever Spark jobs the
  * caller's `fit` launches (MLlib estimators distribute themselves),
  * and per-fold scores are unioned into one small result relation.
  *
  * `fit`: train-DataFrame => (test-DataFrame => DataFrame with a
  * `pred` column). Mirrors the reference's "any sklearn estimator"
  * contract (`tuners.py:14`) with MLlib models as the JVM twins.
  */
object CrossVal {

  def kfoldScores(df: DataFrame, eraCol: String, k: Int,
                  fit: DataFrame => (DataFrame => DataFrame),
                  score: DataFrame => DataFrame,
                  seed: Option[Long] = None): DataFrame =
    kfoldScoresFull(df, eraCol, k, fit, (_, _, scored) => score(scored), seed)

  /** [[kfoldScores]] whose score callback also sees the fold's TRAIN
    * and TEST frames — for invariant-emitting consumers (`q_cv_rf`)
    * that report split coverage (row/era counts, id disjointness)
    * alongside the model's score bounds, so the driver oracle can
    * recompute every emitted value without reproducing the model. */
  def kfoldScoresFull(df: DataFrame, eraCol: String, k: Int,
                      fit: DataFrame => (DataFrame => DataFrame),
                      score: (DataFrame, DataFrame, DataFrame) => DataFrame,
                      seed: Option[Long] = None): DataFrame = {
    val folds = seed match {
      case Some(sd) => Folds.eraKFoldRandom(
        df.select(col(eraCol)).distinct(), eraCol, k, sd)
      case None => Folds.foldAssignment(
        df.select(col(eraCol)).distinct(), eraCol, k)
    }
    // persisted: every fold branch re-reads the same fact+fold join
    val withFold = df.join(broadcast(folds), eraCol).persist()
    kfoldCore(withFold, k, fit, score)
  }

  /** The fold-fit/score loop of [[kfoldScores]] over a frame that
    * already carries its `fold` column. Callers that score MANY
    * candidates against the SAME fold split (the reduction-tune k
    * scan) join and persist the fold assignment ONCE and call this
    * per candidate — the per-candidate [[kfoldScores]] form re-built
    * and re-persisted an identical fold-join plan per candidate
    * (CacheManager dedups the storage but warns, and each candidate
    * paid the fold-assignment aggregate again). */
  def kfoldScoresPrejoined(withFold: DataFrame, k: Int,
                           fit: DataFrame => (DataFrame => DataFrame),
                           score: DataFrame => DataFrame): DataFrame =
    kfoldCore(withFold, k, fit, (_, _, scored) => score(scored))

  private def kfoldCore(withFold: DataFrame, k: Int,
                        fit: DataFrame => (DataFrame => DataFrame),
                        score: (DataFrame, DataFrame, DataFrame) => DataFrame): DataFrame = {
    // folds fit CONCURRENTLY: `fit` runs its MLlib jobs eagerly, and
    // the k fits are independent — a thread per fold overlaps their
    // driver-side planning and job gaps (the prepareShared trick).
    // Futures are joined in fold order, so the unioned result and
    // every seeded fit are byte-identical to the sequential loop at
    // any pool width (ConcurrencySpec pins width-1 vs width-k).
    val pool = graft.Pools.newPool(k)
    val perFold =
      try {
        val futs = (0 until k).map { f =>
          pool.submit(new java.util.concurrent.Callable[DataFrame] {
            def call(): DataFrame = {
              val train = withFold.filter(col("fold") =!= f).drop("fold")
              val test = withFold.filter(col("fold") === f).drop("fold")
              val predict = fit(train)
              score(train, test, predict(test)).withColumn("fold", lit(f.toLong))
            }
          })
        }
        futs.map(f =>
          try f.get()
          catch { case e: java.util.concurrent.ExecutionException => throw e.getCause })
      } finally pool.shutdown()
    val all = perFold.reduce(_ unionByName _)
    val metrics = all.columns.filterNot(_ == "fold")
    all.select((col("fold") +: metrics.map(col)): _*).orderBy(col("fold"))
  }

  /** A3/A4 summary over per-fold scores (`tuners.py:144-145`): mean and
    * exact quartiles of a metric column. */
  def summarize(perFold: DataFrame, metric: String): DataFrame =
    perFold.agg(
      round(avg(col(metric)), 6).as(s"mean_$metric"),
      round(expr(s"percentile($metric, 0.25)"), 6).as(s"q25_$metric"),
      round(expr(s"percentile($metric, 0.75)"), 6).as(s"q75_$metric"))
}
