package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.Similarity

/** Per-phase wall-clock split of the q99 end-to-end incremental IVF-PQ
  * pipeline (train codebooks / persist sidecars / write 2 index batches /
  * stored retrieval) — the bench ledger reports q99 as ONE number, which
  * reads as a slow query when most of the cost is training + staged IO.
  *
  * Run: `sbt "Test/runMain graft.tools.IndexPhasesProbe [sfDir]"` */
object IndexPhasesProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      println(f"$label%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      a
    }
    val e = graft.Tables.load(spark, sfDir, "embeddings").localCheckpoint()
    val (cents, cbs) = timed("train") {
      (Similarity.ivfCentroidsRefined(e, "vec_id", "embedding", 8),
        Similarity.pqCodebooksRefined(e, "vec_id", "embedding",
          m = 8, k = 256, dim = 64, sampleN = 8192))
    }
    val work = java.nio.file.Files.createTempDirectory("graft_phases_").toString
    timed("persist_sidecars") {
      Similarity.saveCentroids(spark, s"$work/centroids", cents)
      Similarity.savePqCodebooks(spark, s"$work/codebooks", cbs)
    }
    val ps = new graft.storage.PartStore(spark,
      graft.storage.PartStoreConfig(work, 200))
    val hv = conv(substring(md5(concat(lit("batch:"),
      col("vec_id").cast("string"))), 1, 8), 16, 10).cast("long") % 2L
    Seq(0L, 1L).foreach { b =>
      timed(s"write_batch_$b") {
        Similarity.writeIndexBatch(ps, "emb", e.filter(hv === b),
          "vec_id", "embedding",
          Similarity.loadCentroids(spark, s"$work/centroids"),
          Similarity.loadPqCodebooks(spark, s"$work/codebooks"), modified = 1L)
      }
    }
    timed("retrieve_stored") {
      val stored = ps.readPart("emb").get.select(
        col("entity_id").as("vec_id"), col("embedding"),
        col("bucket"), col("pq_code"))
      Similarity.ivfPqTopKStored(e.filter(col("vec_id") % 100 === 0), stored,
        e, "vec_id", "embedding", "bucket", "pq_code", cents, cbs,
        k = 5, nProbe = 2, shortlist = 50).collect()
      ()
    }
    def rm(f: java.io.File): Unit = {
      val cs = f.listFiles(); if (cs != null) cs.foreach(rm); f.delete(); ()
    }
    rm(new java.io.File(work))
    spark.stop()
  }
}
