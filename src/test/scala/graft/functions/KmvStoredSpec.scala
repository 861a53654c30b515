package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Persisted-KMV invariants: minima-of-union == union-of-minima (any
  * append order yields the one-shot sketch), and hashes falling out of
  * the k smallest really leave the store (rewrite, not upsert). */
class KmvStoredSpec extends SparkSpec {
  private lazy val si = spark.implicits
  import si._

  private def corpus = (0 until 400)
    .map(i => (if (i % 2 == 0) "a" else "b", s"tok$i"))
    .toDF("g", "v")

  private def store(tag: String) = {
    val ps = new graft.storage.PartStore(spark,
      graft.storage.PartStoreConfig(s"target/tmp/kmv_$tag", 64L,
        keyCols = Seq("g", "h")))
    ps.deletePart("kmv")
    ps
  }

  private def sketchRows(ps: graft.storage.PartStore) =
    ps.readPart("kmv").get.select("g", "h")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet

  test("any append split grows the store to the one-shot corpus sketch") {
    val k = 16
    val one = store("oneshot")
    TextAnalysis.kmvIncrementalAppend(one, "kmv", corpus, Seq("g"), "v", k, 1L)
    val split = store("split")
    TextAnalysis.kmvIncrementalAppend(split, "kmv",
      corpus.filter(length(col("v")) % 2 === 0), Seq("g"), "v", k, 1L)
    TextAnalysis.kmvIncrementalAppend(split, "kmv",
      corpus.filter(length(col("v")) % 2 === 1), Seq("g"), "v", k, 2L)
    assert(sketchRows(one) == sketchRows(split))
    // exactly k minima per group once the corpus exceeds k distinct
    assert(sketchRows(split).groupBy(_._1).forall(_._2.size == k))
  }

  test("a hash displaced from the k smallest leaves the store") {
    val k = 4
    val ps = store("evict")
    TextAnalysis.kmvIncrementalAppend(ps, "kmv",
      corpus.limit(8), Seq("g"), "v", k, 1L)
    val before = sketchRows(ps)
    TextAnalysis.kmvIncrementalAppend(ps, "kmv", corpus, Seq("g"), "v", k, 2L)
    val after = sketchRows(ps)
    assert(after.groupBy(_._1).forall(_._2.size == k))
    // the final sketch is the global k-min, so any first-batch hash
    // bigger than the global kth must be gone
    val evicted = before -- after
    assert(evicted.forall { case (g, h) =>
      h > after.filter(_._1 == g).map(_._2).max ||
        after.filter(_._1 == g).size == k
    })
    assert((after -- before).nonEmpty, "new smaller hashes must enter")
  }
}
