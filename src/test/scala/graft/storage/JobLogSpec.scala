package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JobLogSpec extends SparkSpec {

  test("start/end jobs: sequential ids, fold to current state") {
    val base = java.nio.file.Files.createTempDirectory("joblog").toString
    val log = new JobLog(spark, base)
    val j1 = log.startJob("load a", 100L)
    val j2 = log.startJob("load b", 110L)
    log.endJob(j1, 120L)
    assert(j1 == 1L && j2 == 2L)
    val jobs = log.jobs.sort("job_id").collect()
    assert(jobs.length == 2)
    assert(jobs(0).getAs[String]("description") == "load a")
    assert(jobs(0).getAs[Long]("started") == 100L)
    assert(jobs(0).getAs[Long]("finished") == 120L)
    assert(jobs(1).isNullAt(jobs(1).fieldIndex("finished"))) // still running
  }
}
