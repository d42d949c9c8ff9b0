package graft

import org.scalatest.funsuite.AnyFunSuite

/** Repo hygiene: a deleted/renamed suite must not leave its JUnit XML
  * behind in target/test-reports (stale reports read as live coverage
  * to anything consuming the directory). */
class ReportHygieneSpec extends AnyFunSuite {

  test("every checked-in test report names a suite on the classpath") {
    val dir = new java.io.File("target/test-reports")
    if (dir.exists) {
      val stale = dir.listFiles()
        .filter(_.getName.matches("TEST-graft\\..*\\.xml"))
        .map(_.getName.stripPrefix("TEST-").stripSuffix(".xml"))
        .filterNot { cls =>
          try { Class.forName(cls); true }
          catch { case _: ClassNotFoundException => false }
        }
      assert(stale.isEmpty,
        s"stale test reports for deleted suites: ${stale.mkString(", ")} — delete them")
    }
  }
}
