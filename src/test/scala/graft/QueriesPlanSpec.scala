package graft

/** Plan-shape gates for inventory queries whose scale story depends on
  * the ABSENCE of specific physical operators (the CorpusCleanSpec
  * no-Window convention, applied at the query level): a regression that
  * re-introduces a size-unbounded Window (one partition sorting a whole
  * language/source) would still be hash-green at sf0.01 — only the plan
  * reveals it. */
class QueriesPlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Windows whose partition key bounds the frame to a constant are
    * fine; a SIZE-UNBOUNDED window (partition = a whole language /
    * source / the corpus) is the scale-killer. These queries must plan
    * with NO Window at all. */
  private val noWindowQueries = Seq(
    "q135_perplexity_filter", // tercile cutoffs are a broadcast agg
    "q141_curation_capstone") // same cutoff shape + map-side chunking

  for (q <- noWindowQueries)
    test(s"$q plans with no Window operator") {
      val plan = SparkEntry.queries(q)(spark, dir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Window"), s"unexpected Window in:\n$plan")
    }

  /** Windows that DO exist must be keyed (per-doc / per-entity ordered
    * scans — bounded by one key's row count), never global. */
  private val keyedWindowQueries = Seq(
    "q178_cdc_chunks" -> "doc_id",        // per-doc boundary prefix sum
    "q181_interval_coverage" -> "user_id") // per-user interval merge

  for ((q, key) <- keyedWindowQueries)
    test(s"$q windows are keyed by $key, never global") {
      val plan = SparkEntry.queries(q)(spark, dir)
        .queryExecution.executedPlan.toString
      val windowLines = plan.linesIterator.filter(_.contains("Window")).toSeq
      assert(windowLines.nonEmpty, s"expected a keyed window in:\n$plan")
      assert(windowLines.forall(_.contains(key)),
        s"window not keyed by $key:\n$plan")
    }
}
