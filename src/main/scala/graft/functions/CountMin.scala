package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-min sketch for frequency estimation over unbounded key domains
  * (Cormode & Muthukrishnan, "An improved data stream summary: the
  * count-min sketch and its applications", J. Algorithms 2005).
  *
  * Why this shape at 100 TB: exact per-token counts need a shuffle whose
  * cardinality is the VOCABULARY (open-ended on web text — URLs, ids,
  * typos). The CMS is a fixed d×w integer grid: every token occurrence
  * increments one cell per row, estimates read back min over d cells.
  * Overestimates only (never under), bounded by ε·N with ε = e/w at
  * confidence 1 − e^−d. The grid is mergeable by cell ADDITION, which
  * makes it incremental (persist the grid, add each batch's grid — q244)
  * and streamable (the q246 sink) with per-batch cost ∝ batch vocabulary
  * and a store that never exceeds d·w rows.
  *
  * Determinism: the row hashes are the repo's md5-ladder convention —
  * the first 8 md5 hex nibbles of "<salt><row>:<key>" as a 32-bit
  * integer, mod w. Pure integer arithmetic end-to-end: bit-identical on
  * every engine and partitioning, and replayable in the DuckDB oracle.
  */
object CountMin {

  /** Bucket of `keyCol` for sketch row `r`: 32-bit md5 prefix mod w. */
  def bucket(keyCol: org.apache.spark.sql.Column, r: Int, w: Int,
      salt: String): org.apache.spark.sql.Column =
    conv(substring(md5(concat(lit(s"$salt$r:"), keyCol)), 1, 8), 16, 10)
      .cast("long") % w

  /** The mergeable sketch: one row per touched (r, bucket) cell with its
    * summed count — at most d·w rows regardless of input size. Input is
    * pre-aggregated (key, cnt) pairs or raw keys with cnt=1 rows; we
    * aggregate per key FIRST (map-side combined, vocabulary-sized
    * shuffle for the batch — a batch's vocabulary, never the corpus's)
    * so the d-way explode multiplies distinct keys, not occurrences. */
  def sketch(df: DataFrame, keyCol: String, weightCol: Option[String],
      d: Int = 4, w: Int = 512, salt: String = "cms"): DataFrame = {
    val perKey = weightCol match {
      case Some(wc) => df.groupBy(col(keyCol).as("__k"))
        .agg(sum(col(wc)).cast("long").as("__c"))
      case None => df.groupBy(col(keyCol).as("__k"))
        .agg(count(lit(1)).as("__c"))
    }
    perKey
      .select(explode(array((0 until d).map(r =>
          struct(lit(r).as("r"), bucket(col("__k"), r, w, salt).as("bucket"))
        ): _*)).as("__cell"), col("__c"))
      .groupBy(col("__cell.r").as("r"), col("__cell.bucket").as("bucket"))
      .agg(sum(col("__c")).as("cnt"))
  }

  /** Merge sketches by cell addition — same-(d,w,salt) grids only;
    * yesterday's persisted grid + today's batch grid = the corpus grid. */
  def merge(sketches: DataFrame*): DataFrame = {
    require(sketches.nonEmpty, "merge needs at least one sketch")
    sketches.reduce(_.unionByName(_))
      .groupBy(col("r"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Point estimates for the keys in `queries(keyCol)`: min over the d
    * row cells, absent cells counting 0 (nothing ever hashed there).
    * Output: queries' columns + `est`. The grid side is ≤ d·w rows —
    * broadcast it; the probe never shuffles the query side. */
  def estimate(queries: DataFrame, sketchDf: DataFrame, keyCol: String,
      d: Int = 4, w: Int = 512, salt: String = "cms"): DataFrame = {
    // Each input row gets its own estimate — duplicate query rows stay
    // duplicated. The probe explodes per-row under a monotonic id (a
    // narrow per-partition stamp, no shuffle), so the regroup key is the
    // id, never the (possibly non-distinct, possibly internal-colliding)
    // query columns.
    val reserved =
      Seq("est", "r", "bucket", "cnt", "__qid", "__cell", "__r", "__bucket")
    val clash = queries.columns.toSet intersect reserved.toSet
    require(clash.isEmpty,
      s"estimate: query columns collide with internals: ${clash.mkString(", ")}")
    val tagged = queries.withColumn("__qid", monotonically_increasing_id())
    val probes = tagged
      .select(tagged.columns.map(col) :+
        explode(array((0 until d).map(r =>
          struct(lit(r).as("r"), bucket(col(keyCol), r, w, salt).as("bucket"))
        ): _*)).as("__cell"): _*)
      .select(tagged.columns.map(col) :+ col("__cell.r").as("__r") :+
        col("__cell.bucket").as("__bucket"): _*)
    probes
      .join(broadcast(sketchDf),
        probes("__r") === sketchDf("r") &&
          probes("__bucket") === sketchDf("bucket"),
        "left")
      .groupBy(col("__qid"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"),
        queries.columns.map(c => first(col(c)).as(c)): _*)
      .drop("__qid")
      .select((queries.columns.map(col) :+ col("est")): _*)
  }

  /** Incremental persisted form (the q216/q229 store family): the
    * batch's grid merges into the PartStore by cell addition, so the
    * store after any sequence of appends equals the one-shot corpus
    * sketch — the full-corpus oracle applies verbatim. The rewrite
    * touches only grid-sized data (≤ d·w rows), never the corpus. The
    * store must be keyed (r, bucket). */
  def incrementalAppend(ps: graft.storage.PartStore, part: String,
      batch: DataFrame, keyCol: String, weightCol: Option[String] = None,
      d: Int = 4, w: Int = 512, salt: String = "cms",
      modified: Long): Unit = {
    require(ps.config.keyCols == Seq("r", "bucket"),
      s"CMS store must be keyed (r, bucket) so cell upserts address grid " +
        s"cells, got ${ps.config.keyCols.mkString("(", ", ", ")")}")
    val sk = sketch(batch, keyCol, weightCol, d, w, salt)
    val merged = (ps.readPart(part) match {
      case None => sk
      case Some(p) => merge(p.select(col("r"), col("bucket"), col("cnt")), sk)
    }).localCheckpoint() // ≤ d·w rows — store() executes its input twice
    // (pindex collect + staged write); without this pin the batch's full
    // key scan + sketch shuffle would run twice per append
    ps.store(part, merged
      .withColumn("timestamp", col("bucket"))
      .withColumn("modified", lit(modified)))
  }

  /** Point estimates answered from the accumulated store. */
  def estimateStored(ps: graft.storage.PartStore, part: String,
      queries: DataFrame, keyCol: String,
      d: Int = 4, w: Int = 512, salt: String = "cms"): DataFrame = {
    require(ps.config.keyCols == Seq("r", "bucket"),
      s"CMS store must be keyed (r, bucket), got " +
        ps.config.keyCols.mkString("(", ", ", ")"))
    estimate(queries,
      ps.readPart(part).getOrElse(
        throw new graft.core.NoSuchPartException(s"no CMS store at $part"))
        .select(col("r"), col("bucket"), col("cnt")),
      keyCol, d, w, salt)
  }
}
