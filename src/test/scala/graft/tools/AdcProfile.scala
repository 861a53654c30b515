package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.Similarity

/** One-off stage profile of q90_adc_topk64 at sf0.1. */
object AdcProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    val e = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    println(s"corpus rows: ${e.count()}")
    val cbs = t("codebooks (driver)") {
      Similarity.pqCodebooksRefined(e, "vec_id", "embedding", m = 8, k = 256, dim = 64)
    }
    val codes = Similarity.pqEncodeArray(e, "vec_id", "embedding", cbs)
    t("encode (join) count") { codes.count() }
    t("encode (join) count #2") { codes.count() }
    def full() = {
      val cb2 = Similarity.pqCodebooksRefined(e, "vec_id", "embedding", m = 8, k = 256, dim = 64)
      val c2 = Similarity.pqEncodeArray(e, "vec_id", "embedding", cb2)
      Similarity.adcTopKArray(e.filter(col("vec_id") % 100 === 0),
        c2, e, "vec_id", "embedding", cb2, k = 5, shortlist = 50)
        .orderBy("query_id", "rank").count()
    }
    t("q90 end-to-end run 1") { full() }
    t("q90 end-to-end run 2") { full() }

    // stage-by-stage replica of adcTopKUnpacked
    import spark.implicits._
    val sub = 8
    val queries = e.filter(col("vec_id") % 100 === 0)
    val unpacked = codes.select(col("vec_id").as("neighbor_id"),
        posexplode(col("pq_code")).as(Seq("j", "code")))
      .select(col("neighbor_id"), col("j").cast("int").as("j"),
        col("code").cast("int").as("code"))
    val cents = cbs.zipWithIndex.flatMap { case (cb, j) =>
      cb.map { case (code, cvec) =>
        (j, code, cvec, math.sqrt(cvec.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble)))
      }
    }.toDF("j", "code", "__cvec", "__cn")
    val subv = slice(col("__qv"), col("j") * lit(sub) + 1, lit(sub))
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("__qv"))
      .select(col("query_id"), Similarity.norm(col("__qv")).as("qn"), col("__qv"))
      .filter(col("qn") > 0d)
      .crossJoin(broadcast(cents))
      .select(col("query_id"), col("qn"), col("j"), col("code"),
        Similarity.dotHof(subv, col("__cvec")).as("qdot"),
        (col("__cn") * col("__cn")).as("cn2"))
    t("dtable q count") { q.count() }
    val est = unpacked.join(broadcast(q), Seq("j", "code"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(max(col("qn")).as("qn"),
        array_sort(collect_list(struct(col("j"), col("qdot"), col("cn2")))).as("__a"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (aggregate(col("__a"), lit(0.0), (a, x) => a + x.getField("qdot")) /
          (col("qn") * sqrt(aggregate(col("__a"), lit(0.0),
            (a, x) => a + x.getField("cn2"))))).as("est_cos"))
    t("est count") { est.count() }
    t("est count #2") { est.count() }
    // where does the time go inside est?
    val joined = unpacked.join(broadcast(q), Seq("j", "code"))
    t("join only count") { joined.count() }
    val grouped = joined.groupBy(col("query_id"), col("neighbor_id"))
      .agg(max(col("qn")).as("qn"))
    t("join+group count") { grouped.count() }
    est.explain("formatted")
    spark.stop()
  }
}
