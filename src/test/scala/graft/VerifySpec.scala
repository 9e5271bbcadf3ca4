package graft

/** The round-11 lesson, pinned: a query that throws must leave an EXPLICIT
  * failure trail in the verify output — a sentinel result the driver's
  * compare will flag, plus an errors.json entry — never just a log line and
  * a silently smaller-but-green suite.
  */
class VerifySpec extends SparkSpec {

  test("a throwing query produces a sentinel result and an errors.json entry") {
    val emptySf = managedTempDir("graft-verify-emptysf") // no tables → load throws
    val outDir = managedTempDir("graft-verify-out")
    val failures = Verify.run(spark, emptySf, outDir, Set("q1_pricing"))
    assert(failures.keySet == Set("q1_pricing"), failures)

    val sentinel = spark.read.parquet(s"$outDir/q1_pricing")
    assert(sentinel.columns.toSeq == Seq("_graft_error"))
    val msg = sentinel.collect().head.getString(0)
    assert(msg.startsWith("QUERY FAILED:"), msg)

    val errs = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$outDir/errors.json"))
    assert(errs.contains("\"q1_pricing\""), errs)
  }

  test("a successful run reports no failures and an empty errors.json") {
    val outDir = managedTempDir("graft-verify-ok")
    val failures = Verify.run(spark, sfDir, outDir, Set("q1_pricing"))
    assert(failures.isEmpty, failures)
    assert(spark.read.parquet(s"$outDir/q1_pricing").count() > 0)
    val errs = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$outDir/errors.json"))
    assert(errs.trim == "{}", errs)
  }
}
