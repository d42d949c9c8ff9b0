package graft

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ZOrder

/** Z-order layout: Morton key correctness, content preservation, and
  * the actual data-skipping claim — row-group min/max stats prune on
  * BOTH dimensions where a single-column sort only serves its leading
  * column. */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mortonRef(a: Long, b: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | ((a >> i & 1L) << (2 * i)) | ((b >> i & 1L) << (2 * i + 1))
    }

  test("interleaveBits matches the reference Morton code on a grid") {
    val rows = for (a <- 0L until 16L; b <- 0L until 16L) yield (a, b)
    val got = rows.toDF("a", "b")
      .select(col("a"), col("b"),
        ZOrder.interleaveBits(col("a"), col("b"), 4).as("z"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) == mortonRef(r.getLong(0), r.getLong(1), 4),
        s"(${r.getLong(0)},${r.getLong(1)})")
    }
  }

  test("interleaveBitsN(k=3) matches the reference k-ary Morton code") {
    def ref(vs: Seq[Long], bits: Int): Long = {
      val k = vs.size
      vs.zipWithIndex.foldLeft(0L) { case (acc, (v, j)) =>
        (0 until bits).foldLeft(acc) { (a, i) =>
          a | ((v >> i & 1L) << (i * k + j))
        }
      }
    }
    val rows = for (a <- 0L until 8L; b <- 0L until 8L; c <- 0L until 8L)
      yield (a, b, c)
    val got = rows.toDF("a", "b", "c")
      .select(col("a"), col("b"), col("c"),
        ZOrder.interleaveBitsN(Seq(col("a"), col("b"), col("c")), 3).as("z"))
      .collect()
    got.foreach { r =>
      val vs = Seq(r.getLong(0), r.getLong(1), r.getLong(2))
      assert(r.getLong(3) == ref(vs, 3), vs.toString)
    }
  }

  test("bin maps [lo,hi] onto [0,2^bits) monotonically, endpoints included") {
    val vals = (0L to 1000L).toDF("v")
      .select(ZOrder.bin(col("v"), 0L, 1000L, 6).as("b"))
      .orderBy(col("b")).as[Long].collect()
    assert(vals.head == 0L && vals.last == 63L)
    assert(vals.sameElements(vals.sorted))
  }

  /** Per row group: (min, max) of `column` across every parquet file
    * under `dir`, straight from the written footers. */
  private def rowGroupRanges(dir: String, column: String): Seq[(Long, Long)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    fs.listStatus(root).map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).toSeq
      .flatMap { f =>
        val rd = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
        try rd.getFooter.getBlocks.asScala.toSeq.map { b =>
          val cc = b.getColumns.asScala
            .find(_.getPath.toDotString == column)
            .getOrElse(fail(s"column $column not in footer"))
          val st = cc.getStatistics
          (st.genericGetMin.asInstanceOf[Number].longValue,
           st.genericGetMax.asInstanceOf[Number].longValue)
        } finally rd.close()
      }
  }

  private def overlapFrac(ranges: Seq[(Long, Long)], lo: Long, hi: Long): Double =
    ranges.count { case (mn, mx) => mn <= hi && mx >= lo }.toDouble / ranges.size

  test("mortonKey fails with the column name on empty / all-null input, not an NPE") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    val e1 = intercept[IllegalArgumentException](ZOrder.mortonKey(empty, "a", "b", 8))
    assert(e1.getMessage.contains("'a'"))
    val nulls = Seq((Some(1L), Option.empty[Long]), (Some(2L), Option.empty[Long]))
      .toDF("a", "b")
    val e2 = intercept[IllegalArgumentException](ZOrder.mortonKey(nulls, "a", "b", 8))
    assert(e2.getMessage.contains("'b'"))
  }

  test("z-order prunes row groups on both dimensions; a plain sort only on one") {
    // the sf0.01 fixture: enough rows (~60k) for ~70 row groups at a
    // 64 KiB block size — at sf0.001 the layout collapses to ~8 coarse
    // z-rectangles and a 5% band can't demonstrate pruning resolution
    val li = Tables.lineitem(spark, "/root/testdata/sf0.01")
    val zDir = java.nio.file.Files.createTempDirectory("zspec_z_").toString
    val sDir = java.nio.file.Files.createTempDirectory("zspec_s_").toString
    try {
      ZOrder.writeZOrdered(li, "l_partkey", "l_suppkey", zDir,
        bits = 12, partitions = 4, blockSize = 64 * 1024)
      // the contrast layout: globally sorted by partkey alone
      li.repartitionByRange(4, col("l_partkey"))
        .sortWithinPartitions(col("l_partkey"))
        .write.mode("overwrite").option("parquet.block.size", (64 * 1024).toString)
        .parquet(sDir)

      // layout never changes content
      val a = spark.read.parquet(zDir).agg(
        count(lit(1)), sum(col("l_quantity").cast("long"))).head()
      val b = li.agg(count(lit(1)), sum(col("l_quantity").cast("long"))).head()
      assert(a == b)

      // 5%-of-domain band in the middle of each dimension
      def band(c: String): (Long, Long) = {
        val r = li.agg(min(col(c)).cast("long"), max(col(c)).cast("long")).head()
        val (lo, hi) = (r.getLong(0), r.getLong(1))
        val w = math.max(1L, (hi - lo + 1) / 20)
        val start = lo + (hi - lo + 1) / 2
        (start, start + w - 1)
      }
      val (pLo, pHi) = band("l_partkey")
      val (sLo, sHi) = band("l_suppkey")

      val zPart = rowGroupRanges(zDir, "l_partkey")
      val zSupp = rowGroupRanges(zDir, "l_suppkey")
      val sPart = rowGroupRanges(sDir, "l_partkey")
      val sSupp = rowGroupRanges(sDir, "l_suppkey")
      // enough row groups that a fraction is meaningful
      assert(zPart.size >= 8 && sPart.size >= 8,
        s"too few row groups: z=${zPart.size} s=${sPart.size}")

      val zp = overlapFrac(zPart, pLo, pHi)
      val zs = overlapFrac(zSupp, sLo, sHi)
      val sp = overlapFrac(sPart, pLo, pHi)
      val ss = overlapFrac(sSupp, sLo, sHi)

      // the plain sort serves its leading column...
      assert(sp <= 0.5, s"sorted layout should prune partkey, got $sp")
      // ...but leaves the other dimension unprunable
      assert(ss >= 0.8, s"sorted layout should NOT prune suppkey, got $ss")
      // z-order prunes BOTH dimensions
      assert(zp <= 0.6, s"z-order should prune partkey, got $zp")
      assert(zs <= 0.6, s"z-order should prune suppkey, got $zs")
      assert(zs < ss, "z-order must beat the plain sort on the non-leading dim")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(new java.io.File(zDir)); rm(new java.io.File(sDir))
    }
  }
}
