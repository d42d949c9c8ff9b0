package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.ShingleHash.shingle_hash60
import graft.operators.TextOps

/** The fused shingle-hash kernel must equal the
  * hash60(concat_ws(slice(split(...)))) composition element-for-
  * element on adversarial inputs — consecutive spaces (empty words),
  * leading/trailing spaces, short docs, unicode — and on the real
  * corpus.
  */
class ShingleHashSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def viaComposition(c: org.apache.spark.sql.Column) =
    transform(TextOps.shingles(c, 3), sh => TextOps.hash60(sh))

  test("equals the composition on adversarial strings") {
    val docs = Seq(
      "a b c d e",
      "one two",            // fewer than n words -> empty
      "x",
      "",
      "a  b c",             // consecutive spaces: empty word in window
      " a b c",             // leading space
      "a b c ",             // trailing space
      "的 是 了 在 和",       // multi-byte words
      "same same same same")
      .toDF("text")
    val both = docs.select(
      shingle_hash60(col("text"), 3).as("fused"),
      viaComposition(col("text")).as("hof"))
      .as[(Seq[Long], Seq[Long])].collect()
    for ((f, h) <- both) assert(f == h)
  }

  test("equals the composition on every fixture document") {
    val mismatches = Tables.documents(spark, TestSpark.sf)
      .select(shingle_hash60(col("text"), 3).as("fused"),
        viaComposition(col("text")).as("hof"))
      .filter(col("fused") =!= col("hof"))
      .count()
    assert(mismatches == 0)
  }

  test("SQL-callable as shingle_hash60() (the GraftExtensions injectFunction path)") {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "shingle_hash60",
      exprs => graft.functions.ShingleHash(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue), "scala_udf")
    val got = spark.sql("SELECT shingle_hash60('a b c d', 3) AS sh")
      .as[Seq[Long]].head()
    assert(got.length == 2)
  }

  test("GraftExtensions registers every kernel with the REAL builders") {
    import org.apache.spark.unsafe.types.UTF8String
    // install the production GraftExtensions function list into the
    // live session (withExtensions only applies at session creation),
    // so the actual builder lambdas — argument order included — are
    // what SQL resolution exercises, not re-declared test copies
    org.apache.spark.sql.graftshim.ColumnBridge.installFunctions(
      spark, new graft.functions.GraftExtensions)
    val mh = spark.sql("SELECT minhash_sig('a b c d', 3, 16) AS mh")
      .as[Seq[Long]].head()
    val wantMh = graft.functions.MinHashSig
      .compute(UTF8String.fromString("a b c d"), 3, 16)
    assert(mh == wantMh.toLongArray().toSeq)
    val sim = spark.sql("SELECT sim_hash48('a b c d') AS s").as[Long].head()
    assert(sim == graft.functions.SimHash.compute(UTF8String.fromString("a b c d")))
    val sh = spark.sql("SELECT shingle_hash60('a b c d', 3) AS sh")
      .as[Seq[Long]].head()
    assert(sh == graft.functions.ShingleHash
      .compute(UTF8String.fromString("a b c d"), 3).toLongArray().toSeq)
    val rh = spark.sql("SELECT rolling_hash('hello') AS h").as[Long].head()
    assert(rh == graft.functions.RollingHash.hash("hello".getBytes("UTF-8")))
    val dp = spark.sql(
      "SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .as[Double].head()
    assert(dp == 11.0)
    val wp = spark.sql(
      "SELECT winnow_positions(shingle_hash60('a b c d e f g h', 3), 4) AS p")
      .as[Seq[Long]].head()
    val wantWp = graft.functions.WinnowSelect.compute(
      graft.functions.ShingleHash.compute(
        UTF8String.fromString("a b c d e f g h"), 3), 4)
    assert(wp == wantWp.toLongArray().toSeq && wp.nonEmpty)
  }

  test("shingle_strings kernel equals the HOF composition everywhere") {
    import graft.functions.ShingleStrings.shingle_strings
    val docs = Seq(
      "a b c d e", "one two", "x", "", "a  b c", " a b c", "a b c ",
      "的 是 了 在 和", "same same same same")
      .toDF("text")
      .union(Tables.documents(spark, TestSpark.sf).select(col("text")))
    val mismatches = docs.select(
        shingle_strings(col("text"), 3).as("fused"),
        TextOps.shingles(col("text"), 3).as("hof"))
      .filter(col("fused") =!= col("hof"))
      .count()
    assert(mismatches == 0)
  }

  test("all three text kernels stay inside whole-stage codegen") {
    import graft.functions.{MinHashSig, SimHash}
    val df = Tables.documents(spark, TestSpark.sf)
      .select(shingle_hash60(col("text"), 3).as("sh"),
        MinHashSig.minhash_sig(col("text"), 3, 16).as("mh"),
        SimHash.sim_hash48(col("text")).as("sim"))
      .filter(size(col("sh")) >= 0 && col("sim") >= Long.MinValue)
    val p = df.queryExecution.executedPlan.toString
    // the `*(n)` prefix marks operators inside a WholeStageCodegen
    // span; a CodegenFallback expression would strip it
    for (marker <- Seq("shinglehash", "minhashsig", "simhash")) {
      assert(p.linesIterator.exists(l =>
        l.toLowerCase.contains(marker) && l.trim.startsWith("*")),
        s"$marker not in a codegen span:\n${p.take(800)}")
    }
    assert(df.count() > 0)
  }

  test("hash60 value parity: first 15 md5 hex nibbles as a long") {
    val got = Seq("hello world test").toDF("t")
      .select(shingle_hash60(col("t"), 3)).as[Seq[Long]].head().head
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest("hello world test".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 15)
    assert(got == java.lang.Long.parseLong(hex, 16))
  }

  test("minhash_sig kernel equals the explode + 16-min-column composition") {
    import graft.functions.MinHashSig.minhash_sig
    val p = 2147483647L
    val docs = Seq(
      "a b c d e", "one two", "x", "", "a  b c", " a b c",
      "的 是 了 在 和", "same same same same")
      .toDF("text")
      .union(Tables.documents(spark, TestSpark.sf).select(col("text")))
      .withColumn("doc", monotonically_increasing_id())
    val dsh = docs
      .select(col("doc"), explode(array_distinct(
        shingle_hash60(col("text"), 3))).as("sh"))
      .select(col("doc"), (col("sh") % p).as("h"))
    val minCols = (0 until 16).map(j =>
      min((col("h") * (2 * j + 1)) % p).as(s"mh_$j"))
    val composed = dsh.groupBy(col("doc"))
      .agg(minCols.head, minCols.tail: _*)
      .select(col("doc"), array((0 until 16).map(j => col(s"mh_$j")): _*).as("hof"))
    val fused = docs
      .select(col("doc"), minhash_sig(col("text"), 3, 16).as("fused"))
      .filter(size(col("fused")) > 0)
    // same doc set (short docs dropped both ways) and same signatures
    assert(fused.count() == composed.count())
    assert(fused.join(composed, "doc")
      .filter(col("fused") =!= col("hof")).count() == 0)
  }

  test("minhash_from_hashes over shingle_hash60 equals the fused text kernel") {
    // the r18 shared-base build computes the shingle-hash array once
    // and min-reduces it; this pins that split form to the fused
    // text→signature kernel on adversarial + fixture docs
    import graft.functions.MinHashSig.{minhash_from_hashes, minhash_sig}
    val docs = Seq(
      "a b c d e", "one two", "x", "", "a  b c", " a b c",
      "的 是 了 在 和", "same same same same")
      .toDF("text")
      .union(Tables.documents(spark, TestSpark.sf).select(col("text")))
    val mismatches = docs.select(
        minhash_sig(col("text"), 3, 16).as("fused"),
        minhash_from_hashes(shingle_hash60(col("text"), 3), 16).as("split"))
      .filter(col("fused") =!= col("split"))
      .count()
    assert(mismatches == 0)
  }

  test("sim_hash48 kernel equals the explode + 48-vote-column composition") {
    import graft.functions.SimHash.sim_hash48
    val docs = Seq(
      "a b c d e", "x", "", "a  b c", " a b c", "a b c ",
      "的 是 了 在 和", "same same same same")
      .toDF("text")
      .union(Tables.documents(spark, TestSpark.sf).select(col("text")))
    val wdf = docs.withColumn("doc", monotonically_increasing_id())
      .select(col("doc"), col("text"),
        explode(TextOps.words(col("text"))).as("w"))
      .select(col("doc"), col("text"), TextOps.hash60(col("w")).as("hv"))
    val voteCols = (0 until 48).map(j =>
      sum(when(expr(s"shiftright(hv, $j) & 1") === 1, 1).otherwise(-1)).as(s"s_$j"))
    val composed = (0 until 48).map(j =>
      when(col(s"s_$j") > 0, lit(1L << j)).otherwise(lit(0L))).reduce(_ + _)
    val mismatches = wdf.groupBy(col("doc"), col("text"))
      .agg(voteCols.head, voteCols.tail: _*)
      .select(col("text"), composed.as("hof"))
      .withColumn("fused", sim_hash48(col("text")))
      .filter(col("fused") =!= col("hof"))
      .count()
    assert(mismatches == 0)
  }
}
