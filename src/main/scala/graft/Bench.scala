package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"errors":{...},"sf":...}.
  *
  * A warmup pass at sf0.001 first exercises Spark's machinery (codegen,
  * parquet readers, shuffle paths) so per-query timings measure the query,
  * not JVM warmup. Timed runs execute `count()` — full computation, no
  * result materialization to the driver.
  *
  * Failures are NOT folded into timings: a query that throws is reported
  * with value -1 under "queries" plus its error class/message under
  * "errors", and the process exits nonzero — a broken query can never
  * masquerade as a fast one.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val warmDir = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, warmDir).count() catch { case _: Throwable => () }
    }
    def jsonEscape(s: String): String =
      s.flatMap {
        case '"'           => "\\\""
        case '\\'          => "\\\\"
        case '\n'          => "\\n"
        case '\r'          => "\\r"
        case '\t'          => "\\t"
        case c if c < ' '  => f"\\u${c.toInt}%04x"
        case c             => c.toString
      }
    // two measured repetitions, min per query: local[32] scheduling noise
    // swings individual queries ±30%; min-of-2 reports steady-state cost.
    // When the two timings disagree by >2× the query gets ONE extra
    // repetition — two driver rounds in a row showed 3-5× contended
    // phantoms (r6: q55-q57, r7: q35-q42) that a fresh run erased, and a
    // >2× spread is exactly that signature; the rerun is bounded (only
    // disagreeing queries pay it) and the min over 3 kills the phantom.
    // Any repetition failing marks the query failed.
    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Either[String, Double] = {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).count()
        Right((System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable =>
          Left(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
      }
    }
    var reruns = 0
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val r = (timeOnce(fn), timeOnce(fn)) match {
        case (Right(a), Right(b)) if math.max(a, b) > 2 * math.min(a, b) =>
          reruns += 1
          timeOnce(fn) match {
            case Right(c) => Right(math.min(math.min(a, b), c))
            // the tiebreak is diagnostic — two valid measurements exist,
            // so a transient failure there must not convert the query to
            // failed; fall back to min of the two real timings
            case Left(_)  => Right(math.min(a, b))
          }
        case (Right(a), Right(b)) => Right(math.min(a, b))
        case (Left(e), _)         => Left(e)
        case (_, Left(e))         => Left(e)
      }
      name -> r
    }
    val qs = results.map {
      case (k, Right(v)) => s"\"" + k + "\":" + v
      case (k, Left(_))  => s"\"" + k + "\":-1"
    }.mkString("{", ",", "}")
    val errors = results.collect { case (k, Left(e)) =>
      s"\"" + k + "\":\"" + jsonEscape(e) + "\""
    }.mkString("{", ",", "}")
    val total = results.collect { case (_, Right(v)) => v }.sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errors,"reruns":$reruns,"sf":"$sfDir"}"""
    println(line)
    // also persist the line to disk: the driver captures stdout with a
    // bounded tail window that has truncated long runs (BENCH_r06 lost
    // q01-q26) — a file survives any capture window
    try {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get("target"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("target", "bench_last.json"), line + "\n")
    } catch { case _: java.io.IOException => () } // stdout already has it
    spark.stop()
    if (results.exists(_._2.isLeft)) sys.exit(1)
  }
}
