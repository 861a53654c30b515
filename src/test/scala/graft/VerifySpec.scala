package graft

/** The gate watchdog: one hung or throwing query must degrade to a
  * per-query miss, never abort the whole correctness dump. */
class VerifySpec extends SparkSpec {

  test("runGuarded: success → None, error → message, hang → timeout") {
    assert(Verify.runGuarded(spark, "ok", 30) { () } .isEmpty)
    val err = Verify.runGuarded(spark, "boom", 30) {
      throw new RuntimeException("exploded")
    }
    assert(err.contains("exploded"))
    // a Spark job that would run ~forever (scanning 2^63 ids; no
    // overflow-prone arithmetic — an ANSI error would END the job and
    // race the watchdog): cancelled + reported, fast
    val t0 = System.nanoTime()
    val to = Verify.runGuarded(spark, "hang", 2) {
      spark.range(Long.MaxValue).filter("id % 7 = 3").count()
      ()
    }
    val sec = (System.nanoTime() - t0) / 1e9
    assert(to.exists(_.contains("timed out")), to)
    assert(sec < 40, s"watchdog took ${sec}s — cancellation not effective")
    // the session is still usable for the NEXT query after a cancel
    assert(spark.range(10).count() == 10)
  }

  test("runGuarded survives a non-Exception Throwable (OutOfMemoryError shape)") {
    val r = Verify.runGuarded(spark, "oom", 30) {
      throw new OutOfMemoryError("synthetic")
    }
    assert(r.contains("synthetic"))
    assert(spark.range(3).count() == 3)
  }
}
