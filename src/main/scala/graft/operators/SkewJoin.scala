package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins (SURVEY §4 / prompt scale rules):
  * AQE's skew-join handles most cases at runtime; explicit salting is
  * the deterministic fallback when one build-side key dominates (e.g.
  * a single hot era or a null-heavy foreign key).
  *
  * Left rows get a pseudo-random salt in [0, n); the (smaller) right
  * side is replicated n times, so the hot key's rows spread over n
  * reducers. Result is row-for-row equal to the plain equi-join.
  */
object SkewJoin {

  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salt: Int, seed: Long = 42L): DataFrame = {
    val sl = left.withColumn("graft_salt",
      floor(rand(seed) * salt).cast("int"))
    val sr = right
      .withColumn("graft_salt", explode(sequence(lit(0), lit(salt - 1))))
      .withColumn("graft_salt", col("graft_salt").cast("int"))
    sl.join(sr, Seq(key, "graft_salt")).drop("graft_salt")
  }
}
