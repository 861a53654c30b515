package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-level cost breakdown of the exact set-similarity join on the
  * gate corpus — where does the 10x time go: token/freq model, prefix
  * build, candidate join, or verify? */
object SetSimProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val (tauNum, tauDen) = (3, 5)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .filter(pmod(col("doc_id"), lit(7)) === 0)
      .select(col("doc_id"), col("text"))
    val t = time("tokens (distinct, cached)") {
      val x = graft.functions.TextAnalysis.tokens(docs, "doc_id", "text")
        .filter(col("tok") =!= "")
        .select(col("doc_id").cast("long").as("__id"), col("tok")).distinct()
        .localCheckpoint()
      x.count(); x
    }
    val freq = time("freq model") {
      val f = t.groupBy("tok").agg(count(lit(1)).as("__f")).localCheckpoint()
      f.count(); f
    }
    val sz = t.groupBy("__id").agg(count(lit(1)).as("__n"))
    val prefLen = col("__n") -
      ((lit(tauNum) * col("__n") + (tauDen - 1)) / tauDen).cast("long") + 1
    val pref = time("prefix build") {
      val p = t.join(freq, "tok")
        .groupBy("__id")
        .agg(array_sort(collect_list(struct(
          col("__f"), md5(col("tok")).as("__h"), col("tok")))).as("__a"))
        .join(sz, "__id")
        .select(col("__id"), col("__n"), posexplode(slice(col("__a"), lit(1),
          prefLen.cast("int"))).as(Seq("__pos", "__p")))
        .select(col("__id"), col("__p.tok").as("tok"), col("__pos"), col("__n"))
        .localCheckpoint()
      println(s"    prefix entries: ${p.count()}")
      p
    }
    val right = pref.withColumnRenamed("__id", "__id2")
      .withColumnRenamed("__pos", "__pos2").withColumnRenamed("__n", "__n2")
    // candidate join WITHOUT dedup (raw pair stream cost), selfJoin order
    val rawPairs = time("candidate join (pre-distinct)") {
      val logB = math.log(tauDen.toDouble / tauNum.toDouble)
      def bandOf(n: org.apache.spark.sql.Column) =
        floor(log(n.cast("double")) / lit(logB)).cast("long")
      val lo = ((col("__n") * tauNum + (tauDen - 1)) / tauDen).cast("long")
      val hi = ((col("__n") * tauDen) / tauNum).cast("long")
      val probe = pref.withColumn("__band", explode(sequence(bandOf(lo), bandOf(hi))))
      val build = right.withColumn("__band", bandOf(col("__n2")))
      val j = probe.join(build, Seq("tok", "__band")).drop("__band")
        .filter(col("__id") < col("__id2"))
        .filter(col("__n") * tauNum <= col("__n2") * tauDen &&
          col("__n2") * tauNum <= col("__n") * tauDen)
        .filter((lit(1) + least(col("__n") - col("__pos") - 1,
            col("__n2") - col("__pos2") - 1)) * (tauDen + tauNum) >=
          lit(tauNum) * (col("__n") + col("__n2")))
      println(s"    surviving pair stream: ${j.count()}")
      j
    }
    val cand = time("distinct candidates") {
      val c = rawPairs
        .select(least(col("__id"), col("__id2")).as("id1"),
          greatest(col("__id"), col("__id2")).as("id2"))
        .distinct().localCheckpoint()
      println(s"    candidates: ${c.count()}")
      c
    }
    time("verify (array intersect)") {
      val sets = t.groupBy("__id")
        .agg(collect_list(col("tok")).as("__toks"), count(lit(1)).as("__n"))
      val out = cand
        .join(sets.select(col("__id").as("id1"), col("__toks").as("__t1"),
          col("__n").as("n1")), "id1")
        .join(sets.select(col("__id").as("id2"), col("__toks").as("__t2"),
          col("__n").as("n2")), "id2")
        .withColumn("inter",
          size(array_intersect(col("__t1"), col("__t2"))).cast("long"))
        .filter(col("inter") * tauDen >=
          lit(tauNum) * (col("n1") + col("n2") - col("inter")))
      println(s"    verified pairs: ${out.count()}")
    }
    spark.stop()
  }
}
