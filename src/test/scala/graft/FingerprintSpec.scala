package graft

import org.scalatest.funsuite.AnyFunSuite

/** r15: the Hadoop-FS fingerprint twin (`Tables.fingerprintKeyHadoop`)
  * and the local/remote dispatcher (`fingerprintKeyAny`) that lets the
  * derived-layout memos (schema peeks, payload fixtures, pair tables)
  * stay valid on the S3/HDFS layouts a production tree lives on. A
  * `file:`-scheme path exercises the Hadoop route end-to-end without a
  * remote filesystem: java.io.File("file:/...") does not exist as a
  * literal local path, so the dispatcher must take the FS-API branch.
  */
class FingerprintSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmpDirWithFile(bytes: Array[Byte]): java.io.File = {
    val dir = java.nio.file.Files.createTempDirectory("graft_fp").toFile
    dir.deleteOnExit()
    val f = new java.io.File(dir, "a.bin")
    java.nio.file.Files.write(f.toPath, bytes)
    f.deleteOnExit()
    dir
  }

  test("hadoop fingerprint is deterministic and invalidates on rewrite") {
    val dir = tmpDirWithFile(Array[Byte](1, 2, 3))
    val uri = "file:" + dir.getAbsolutePath
    val k1 = Tables.fingerprintKeyHadoop(spark, uri)
    assert(k1 == Tables.fingerprintKeyHadoop(spark, uri))
    // a same-path rewrite with a different length must change the
    // digest even when it lands within one mtime tick
    java.nio.file.Files.write(
      new java.io.File(dir, "a.bin").toPath, Array[Byte](1, 2, 3, 4))
    assert(Tables.fingerprintKeyHadoop(spark, uri) != k1)
  }

  test("fingerprintKeyAny dispatches local paths to the java.io walk") {
    val dir = tmpDirWithFile(Array[Byte](9, 9))
    assert(Tables.fingerprintKeyAny(spark, dir.getAbsolutePath)
      == Tables.fingerprintKey(dir.getAbsolutePath))
  }

  test("fingerprintKeyAny dispatches file:-scheme paths to the hadoop twin") {
    val dir = tmpDirWithFile(Array[Byte](7))
    val uri = "file:" + dir.getAbsolutePath
    assert(Tables.fingerprintKeyAny(spark, uri)
      == Tables.fingerprintKeyHadoop(spark, uri))
  }

  test("schemaOf memoizes a file:-scheme hadoop path") {
    val p = "file:" + TestSpark.sf + "/region.parquet"
    val s1 = Tables.schemaOf(spark, p)
    assert(s1.fieldNames.contains("r_regionkey"))
    // reference equality proves the second call was a memo hit, not a
    // second footer read
    assert(Tables.schemaOf(spark, p) eq s1)
  }

  test("schemaOf on a missing path surfaces the parquet reader's error") {
    intercept[org.apache.spark.sql.AnalysisException] {
      Tables.schemaOf(spark, "/nonexistent/graft_fp_missing.parquet")
    }
  }
}
