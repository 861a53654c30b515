package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-phase wall-clock profile of the q264 exact-substring pipeline
  * (`Dedup.suffixDupSpans` — the most expensive gate in the r18a quiet
  * run at 22.9 s): replays the prefix-doubling rank chain phase by phase
  * with identical semantics and times each, then runs the public
  * function as the control (the phased replica + control must agree on
  * the output hash or the profile is measuring the wrong thing).
  *
  * Phases: tokenize/checkpoint, rank0 (distinct+rank+join), each of the
  * 7 doubling rounds, the final total order, the adjacent-pair LCP
  * descent (7 rounds x 2 probes), and the per-doc aggregate.
  * `sbt "Test/runMain graft.tools.SuffixProfile [sfDir]"`. */
object SuffixProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.load(spark, sfDir, "documents")
    docs.count() // warm the parquet read

    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"  $name%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    val rounds = 7
    val cap = 1 << rounds
    val block = 2L << rounds
    for (round <- 1 to 2) {
      println(s"== round $round ==")
      val t0 = System.nanoTime()
      val toks = t("tokenize + checkpoint") {
        docs
          .select(col("doc_id").cast("long").as("__doc"),
            posexplode(split(trim(col("text")), "\\s+")).as(Seq("pos", "tok")))
          .filter(col("tok") =!= "" && col("pos") < cap)
          .select(col("__doc"), (col("__doc") * block + col("pos")).as("gpos"),
            col("tok"))
          .localCheckpoint()
      }
      var rank = t("rank0 (distinct+rank+join)") {
        val r0keys = graft.functions.Ranks.globalDenseRank(
          toks.select(md5(col("tok")).as("k1")).distinct(), Seq("k1"))
        toks.join(r0keys, md5(toks("tok")) === r0keys("k1"))
          .select(col("gpos"), col("__r").as("r"))
          .localCheckpoint()
      }
      val tables = Array.newBuilder[DataFrame]
      for (k <- 0 until rounds) {
        tables += rank
        rank = t(s"doubling round $k") {
          val shift = 1L << k
          val paired = rank.as("a")
            .join(rank.select((col("gpos") - shift).as("gpos"),
              col("r").as("__r2")).as("b"), Seq("gpos"), "left")
            .select(col("gpos"), col("r").as("k1"),
              coalesce(col("__r2"), -(col("gpos") + shift) - 1).as("k2"))
          val rk = graft.functions.Ranks.globalDenseRank(
            paired.select("k1", "k2").distinct(), Seq("k1", "k2"))
          paired.join(rk, Seq("k1", "k2"))
            .select(col("gpos"), col("__r").as("r"))
            .localCheckpoint()
        }
      }
      val ts = tables.result()
      val fin = t("final total order") {
        graft.functions.Ranks.globalDenseRank(
          rank.select(col("r").as("k1"), col("gpos").as("k2")),
          Seq("k1", "k2"))
          .select(col("k2").as("gpos"), col("__r").as("fr"))
          .localCheckpoint()
      }
      var adj = fin.as("x")
        .join(fin.select((col("fr") - 1).as("fr"), col("gpos").as("__b")).as("y"),
          Seq("fr"))
        .select(col("gpos").as("a"), col("__b").as("b"), lit(0L).as("acc"))
      val lcp = t("LCP descent (7 rounds x 2 joins)") {
        for (k <- (rounds - 1) to 0 by -1) {
          val shift = 1L << k
          val tk = ts(k)
          adj = adj
            .join(tk.select(col("gpos").as("__pa"), col("r").as("__ra")),
              col("__pa") === col("a") + col("acc"), "left")
            .join(tk.select(col("gpos").as("__pb"), col("r").as("__rb")),
              col("__pb") === col("b") + col("acc"), "left")
            .select(col("a"), col("b"),
              (col("acc") + when(
                coalesce(col("__ra"), -(col("a") + col("acc")) - 1) ===
                  coalesce(col("__rb"), -(col("b") + col("acc")) - 1),
                lit(shift)).otherwise(lit(0L))).as("acc"))
        }
        adj.localCheckpoint()
      }
      val out = t("per-doc aggregate + collect") {
        val dupLen = lcp.select(col("a").as("gpos"), col("acc"))
          .unionByName(lcp.select(col("b").as("gpos"), col("acc")))
          .groupBy("gpos").agg(max(col("acc")).as("dup"))
        toks.join(dupLen, Seq("gpos"), "left")
          .groupBy(col("__doc").as("doc_id"))
          .agg(count(lit(1)).as("n_tokens"),
            coalesce(max(col("dup")), lit(0L)).as("max_dup"),
            coalesce(sum(when(col("dup") >= 8, 1L).otherwise(0L)), lit(0L))
              .as("n_dup_pos"))
          .orderBy("doc_id").collect()
      }
      println(f"  phased total                       ${(System.nanoTime() - t0) / 1e9}%7.2f s  (${out.length} docs)")
      val ctl = t("control: public suffixDupSpans") {
        graft.functions.Dedup.suffixDupSpans(docs, "doc_id", "text")
          .orderBy("doc_id").collect()
      }
      val same = out.length == ctl.length &&
        out.zip(ctl).forall { case (a, b) => a == b }
      println(s"  phased == control: $same")
    }
    spark.stop()
  }
}
