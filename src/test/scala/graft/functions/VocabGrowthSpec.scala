package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Incremental vocabulary store: counts, store = distinct types ever
  * seen, replay idempotency. */
class VocabGrowthSpec extends SparkSpec {
  import spark.implicits._

  test("appends admit only unseen types; replay inserts nothing") {
    val base = "target/tmp/vocab_growth"
    val fsys = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fsys.delete(new org.apache.hadoop.fs.Path(base), true)
    val ps = new graft.storage.PartStore(spark,
      graft.storage.PartStoreConfig(base, 64L, keyCols = Seq("tok")))
    val b1 = Seq("a", "b", "a", "c", "").toDF("tok")
    val b2 = Seq("b", "d", "d", "e").toDF("tok")
    val r1 = TextAnalysis.vocabGrowthAppend(ps, "v", b1, "tok", 1L)
    assert(r1 == ((4L, 3L, 3L))) // "" excluded; a,b,c all new
    val r2 = TextAnalysis.vocabGrowthAppend(ps, "v", b2, "tok", 2L)
    assert(r2 == ((4L, 3L, 2L))) // d,e new; b already known
    val stored = ps.readPart("v").get.select("tok")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(stored == Seq("a", "b", "c", "d", "e"))
    // replaying batch 2 is a no-op on the store
    val r3 = TextAnalysis.vocabGrowthAppend(ps, "v", b2, "tok", 3L)
    assert(r3 == ((4L, 3L, 0L)))
    assert(ps.readPart("v").get.count() == 5L)
  }
}
