package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-min sketch: the overestimate-only guarantee, merge ≡ one-shot,
  * layout invariance, and the persisted incremental form. */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  // zipf-ish: token k appears ~300/k times, plus a long unique tail
  private lazy val corpus: DataFrame = {
    val rows = (1 to 30).flatMap(k => Seq.fill(300 / k)(s"tok$k")) ++
      (1 to 500).map(i => s"rare$i")
    rows.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "tok")
  }

  private def exact = corpus.groupBy("tok").agg(count(lit(1)).as("exact_cnt"))

  test("estimates never under-count, and are exact for most heavy keys at d=4,w=512") {
    val sk = CountMin.sketch(corpus, "tok", None)
    val est = CountMin.estimate(exact, sk, "tok").collect()
    assert(est.nonEmpty)
    est.foreach { r =>
      assert(r.getAs[Long]("est") >= r.getAs[Long]("exact_cnt"),
        s"undercount for ${r.getAs[String]("tok")}")
    }
    // with ~530 distinct keys in 4×512 cells, the heavy keys should be
    // estimated exactly far more often than not
    val heavy = est.filter(_.getAs[Long]("exact_cnt") >= 30)
    assert(heavy.count(r => r.getAs[Long]("est") == r.getAs[Long]("exact_cnt"))
      >= heavy.length / 2)
  }

  test("sketch is layout-invariant and merge of any split equals the one-shot grid") {
    val one = CountMin.sketch(corpus, "tok", None)
      .orderBy("r", "bucket").collect().toSeq
    val shuffled = CountMin.sketch(corpus.repartition(7, col("tok")), "tok", None)
      .orderBy("r", "bucket").collect().toSeq
    assert(one == shuffled)
    val merged = CountMin.merge(
        CountMin.sketch(corpus.filter(col("id") % 3 === 0), "tok", None),
        CountMin.sketch(corpus.filter(col("id") % 3 === 1), "tok", None),
        CountMin.sketch(corpus.filter(col("id") % 3 === 2), "tok", None))
      .orderBy("r", "bucket").collect().toSeq
    assert(one == merged)
  }

  test("weighted sketch: pre-aggregated (key, cnt) input equals raw occurrences") {
    val pre = corpus.groupBy("tok").agg(count(lit(1)).as("w"))
    val a = CountMin.sketch(corpus, "tok", None).orderBy("r", "bucket").collect().toSeq
    val b = CountMin.sketch(pre, "tok", Some("w")).orderBy("r", "bucket").collect().toSeq
    assert(a == b)
  }

  test("incremental persisted store equals the fresh one-shot sketch") {
    val base = "target/tmp/cms_inc"
    val fsys = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fsys.delete(new org.apache.hadoop.fs.Path(base), true)
    val ps = new graft.storage.PartStore(spark,
      graft.storage.PartStoreConfig(base, 64L, keyCols = Seq("r", "bucket")))
    CountMin.incrementalAppend(ps, "cms",
      corpus.filter(col("id") % 2 === 0), "tok", modified = 1L)
    CountMin.incrementalAppend(ps, "cms",
      corpus.filter(col("id") % 2 === 1), "tok", modified = 2L)
    val stored = ps.readPart("cms").get.select("r", "bucket", "cnt")
      .orderBy("r", "bucket").collect().toSeq
    val fresh = CountMin.sketch(corpus, "tok", None)
      .orderBy("r", "bucket").collect().toSeq
    assert(stored == fresh)
    val est = CountMin.estimateStored(ps, "cms", exact, "tok").collect()
    est.foreach(r => assert(r.getAs[Long]("est") >= r.getAs[Long]("exact_cnt")))
  }

  test("duplicate query rows each keep their own estimate row") {
    val sk = CountMin.sketch(corpus, "tok", None)
    val dup = Seq("tok1", "tok1", "rare3").toDF("tok")
    val est = CountMin.estimate(dup, sk, "tok").collect()
    assert(est.length == 3)
    assert(est.count(_.getAs[String]("tok") == "tok1") == 2)
  }

  test("reserved query column names are refused loudly") {
    val sk = CountMin.sketch(corpus, "tok", None)
    val bad = Seq(("tok1", 1L)).toDF("tok", "est")
    val e = intercept[IllegalArgumentException] {
      CountMin.estimate(bad, sk, "tok")
    }
    assert(e.getMessage.contains("collide"))
  }

  test("incremental store refuses a mis-keyed PartStore") {
    val base = "target/tmp/cms_badkey"
    val fsys = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fsys.delete(new org.apache.hadoop.fs.Path(base), true)
    val bad = new graft.storage.PartStore(spark,
      graft.storage.PartStoreConfig(base, 64L)) // default (entity_id, timestamp)
    val e = intercept[IllegalArgumentException] {
      CountMin.incrementalAppend(bad, "cms", corpus, "tok", modified = 1L)
    }
    assert(e.getMessage.contains("(r, bucket)"))
    val e2 = intercept[IllegalArgumentException] {
      CountMin.estimateStored(bad, "cms", exact, "tok")
    }
    assert(e2.getMessage.contains("(r, bucket)"))
  }
}
