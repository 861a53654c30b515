package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-shaping operators for training-data pipelines: cross-document
  * boilerplate removal, PII redaction, and sequence packing — the stages
  * that sit between per-document filtering (TextAnalysis / Dedup) and the
  * training dataloader.
  *
  * All expression-only (whole-stage codegen), all integer/string-exact so
  * results are bit-stable across engines and cluster sizes.
  */
object CorpusClean {

  /** Cross-document boilerplate line removal (the RefinedWeb/CCNet line
    * dedup stage): a trimmed non-empty line appearing in >= `minDocs`
    * DISTINCT documents is boilerplate (nav bars, cookie banners, license
    * headers); rebuild each document without those lines, preserving line
    * order.
    *
    * Output: (id, n_lines, n_boilerplate, clean_text) — one row per input
    * document, including empty/NULL-text docs (0 lines, empty clean text).
    *
    * Scale shape: line explode → distinct (id, line) → count per line
    * (map-side combined) → equi-join lines to counts on the line key →
    * re-aggregate by doc id. No window, no all-pairs, no collect; every
    * shuffle is keyed. A corpus-hot line (millions of docs) skews the
    * line-keyed join — AQE skew-join splits it, and the build side is one
    * row per distinct line, so the join itself stays a hash probe.
    */
  def boilerplateLines(df: DataFrame, idCol: String, textCol: String,
      minDocs: Int): DataFrame = {
    val lines = df
      .select(col(idCol),
        posexplode(transform(split(col(textCol), "\n"), l => trim(l)))
          .as(Seq("__pos", "__l")))
      .filter(col("__l") =!= "")
    val counts = lines.select(col(idCol), col("__l")).distinct()
      .groupBy("__l").agg(count(lit(1)).as("__ndocs"))
    val agg = lines.join(counts, "__l")
      .groupBy(col(idCol)).agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("__ndocs") >= minDocs, 1L).otherwise(0L))
          .as("n_boilerplate"),
        array_join(
          transform(
            array_sort(collect_list(when(col("__ndocs") < minDocs,
              struct(col("__pos").as("p"), col("__l").as("l"))))),
            s => s.getField("l")),
          "\n").as("clean_text"))
    df.select(col(idCol)).join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        coalesce(col("n_boilerplate"), lit(0L)).as("n_boilerplate"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Exact cross-document line dedup, FIRST occurrence wins — the CCNet
    * paragraph-hash dedup policy (Wenzek et al. 2020, public): a trimmed
    * non-empty line survives only at its globally first occurrence
    * (smallest (doc, position) lexicographically); every later copy is
    * dropped. Complements [[boilerplateLines]]'s frequency threshold,
    * which removes ALL copies of corpus-hot lines — here even a
    * twice-occurring line keeps exactly one copy, so no content is lost,
    * only repetition.
    *
    * Output: (id, n_lines, n_dropped, clean_text) — one row per input
    * document, empty-text docs included.
    *
    * Scale shape: line explode → per-line arg-min aggregate (a struct
    * `min`, map-side combined — no window over the corpus-wide line
    * groups) → equi-join back on the line key → re-aggregate per doc.
    * Same skew posture as boilerplateLines: a corpus-hot line keys one
    * aggregate row, and AQE splits the re-join. Determinism: the keeper
    * is an order-based min, so any partitioning and either engine picks
    * the same copy. */
  def dedupLinesFirstOccurrence(
      df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val lines = df
      .select(col(idCol),
        posexplode(transform(split(col(textCol), "\n"), l => trim(l)))
          .as(Seq("__pos", "__l")))
      .filter(col("__l") =!= "")
    val firsts = lines.groupBy("__l")
      .agg(min(struct(col(idCol).as("d"), col("__pos").as("p"))).as("__f"))
    val kept = lines.join(firsts, "__l")
      .filter(col("__f.d") === col(idCol) && col("__f.p") === col("__pos"))
    val totals = lines.groupBy(idCol).agg(count(lit(1)).as("n_lines"))
    val agg = kept.groupBy(idCol).agg(
      count(lit(1)).as("__n_kept"),
      array_join(
        transform(
          array_sort(collect_list(struct(col("__pos").as("p"), col("__l").as("l")))),
          s => s.getField("l")),
        "\n").as("clean_text"))
    df.select(col(idCol)).join(totals, Seq(idCol), "left")
      .join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        (coalesce(col("n_lines"), lit(0L)) - coalesce(col("__n_kept"), lit(0L)))
          .as("n_dropped"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** PII patterns shared with the DuckDB oracle: deliberately restricted to
    * the regex subset where Java's leftmost-first-greedy and RE2's
    * leftmost-longest semantics coincide (no alternation, greedy bounded
    * classes), so counts and redactions are engine-identical. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
  val PhonePattern = "\\+?\\d[\\d -]{7,}\\d"

  /** PII detection + redaction: email addresses, IPv4 addresses, and
    * phone-like digit runs, each counted then replaced with a typed marker.
    * Passes run SEQUENTIALLY (emails, then IPs on the email-redacted text,
    * then phones) so a digit run inside an already-redacted email is not
    * double-counted as a phone — counts always describe the text the
    * pattern actually scanned. NULL text yields NULL counts (unknown, not
    * zero).
    *
    * Pure per-row projection — no shuffle at any scale. */
  /** Blocklist filtering (the badwords stage every web-corpus pipeline
    * runs, e.g. the C4 cleanup, public): flag documents containing any
    * blocked TOKEN and count the hits. Word-level exact matching on the
    * whitespace tokenizer — a broadcast join against the ≤|list|-row
    * blocklist, deliberately NOT a regex alternation (regex dialects
    * diverge across engines and a 10k-word alternation defeats codegen);
    * substring/obfuscation matching belongs to a scoring model, not the
    * hard filter. Output: (id, n_tokens, n_blocked, blocked) for every
    * input doc. */
  def blocklistFilter(
      df: DataFrame, idCol: String, textCol: String,
      blocklist: Seq[String]): DataFrame = {
    require(blocklist.nonEmpty, "blocklistFilter: empty blocklist")
    val spark = df.sparkSession
    import spark.implicits._
    // lowercase + distinct the LIST side too: case-insensitivity must be
    // two-sided, and duplicate entries would double-count every hit
    val bl = blocklist.map(_.toLowerCase).distinct.toDF("bl_tok")
    val toks = TextAnalysis.tokens(df, idCol, textCol)
    // one pass: the token explode (the dominant cost) runs once, the
    // broadcast left join marks hits, one aggregate counts both
    toks.join(broadcast(bl), lower(toks("tok")) === col("bl_tok"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), count(col("bl_tok")).as("n_blocked"))
      .withColumn("blocked", col("n_blocked") > 0)
  }

  def piiRedact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t1 = regexp_replace(col(textCol), EmailPattern, "[EMAIL]")
    df.select(col(idCol),
        regexp_count(col(textCol), lit(EmailPattern)).as("n_emails"),
        t1.as("__t1"))
      .select(col(idCol), col("n_emails"),
        regexp_count(col("__t1"), lit(Ipv4Pattern)).as("n_ipv4"),
        regexp_replace(col("__t1"), Ipv4Pattern, "[IP]").as("__t2"))
      .select(col(idCol), col("n_emails"), col("n_ipv4"),
        regexp_count(col("__t2"), lit(PhonePattern)).as("n_phones"),
        regexp_replace(col("__t2"), PhonePattern, "[PHONE]").as("redacted"))
  }

  /** Concat-and-chunk sequence packing: assign every document a position in
    * a fixed-`budget` token stream so the dataloader can cut training
    * sequences without a driver-side pass. Documents are sharded
    * (`id % shards`), ordered by id within the shard, and laid end to end;
    * a document's `seq_index` is the sequence its first token lands in and
    * `seq_offset` the offset inside it (long documents straddle — the
    * standard concat-then-chunk packing).
    *
    * Output: (id, shard, n_tokens, tok_offset, seq_index, seq_offset).
    *
    * Scale shape: ONE window, partitioned by shard — pick `shards` at or
    * above cluster parallelism and each partition streams a running sum
    * (no full-shard buffering for an unbounded-preceding frame). The id
    * modulus is the oracle-portable shard key; production swaps in
    * xxhash64 for non-integer ids, same shape. */
  /** Length-bucket batching (the trainer-side "bucketing by length"
    * that bounds padding waste): docs bucket by token length rounded up
    * to a multiple of `bucketWidth`, order deterministically within the
    * bucket (md5, id), and group into batches of `batchSize`. Per batch:
    * doc count, max/sum length, and padding waste in basis points
    * (pad-to-max inside the batch — the quantity length-bucketing
    * exists to minimize).
    *
    * Scale shape: the within-bucket rank is [[Ranks.rankWithinGroup]]
    * (global rank + broadcast offsets — no per-bucket window; a bucket
    * is a corpus-sized slice); everything after is one grouped
    * aggregate. Buckets are bounded by maxLen / bucketWidth. */
  def lengthBucketBatches(
      df: DataFrame, idCol: String, textCol: String,
      bucketWidth: Int, batchSize: Int): DataFrame = {
    require(bucketWidth >= 1 && batchSize >= 1,
      s"lengthBucketBatches: width/size >= 1, got $bucketWidth/$batchSize")
    val toks = size(filter(split(trim(col(textCol)), "\\s+"), t => t =!= ""))
      .cast("long")
    val base = df.select(col(idCol).cast("long").as("__id"),
        toks.as("__len"))
      .withColumn("bucket",
        expr(s"((__len + ${bucketWidth - 1}) DIV $bucketWidth) * $bucketWidth"))
      .withColumn("__mk", md5(concat(lit("lbb:"), col("__id").cast("string"))))
    Ranks.rankWithinGroup(base, Seq("bucket"), Seq("__mk", "__id"))
      .withColumn("batch_idx", expr(s"(__gr - 1) DIV $batchSize"))
      .groupBy("bucket", "batch_idx")
      .agg(count(lit(1)).as("n_docs"),
        max(col("__len")).as("max_len"),
        sum(col("__len")).as("sum_len"))
      .withColumn("pad_waste_bp",
        when(col("max_len") === 0, 0L).otherwise(
          expr("10000 * (n_docs * max_len - sum_len) DIV (n_docs * max_len)")))
  }

  /** Export the corpus as deterministic JSONL shards plus an EXACT
    * manifest — the "hand the dataset to the trainer" step. Sharding is
    * md5-mod (append-stable, engine-replayable); each line is an
    * explicitly-constructed `{"doc_id":N,"text":"..."}` with backslash
    * and quote escaped (explicit concat, not to_json — the manifest
    * fingerprint must be reproducible outside Spark). The manifest rows
    * per shard: doc/token/char counts and an order-insensitive content
    * fingerprint (sum of each line's 32-bit md5 prefix — BIGINT-safe to
    * ~2^31 lines/shard). The write itself is one partitioned text write;
    * the frame is materialized once and feeds both the files and the
    * manifest. */
  def exportJsonlShards(
      df: DataFrame, idCol: String, textCol: String,
      outDir: String, nShards: Int): DataFrame = {
    require(nShards >= 1, s"exportJsonlShards: nShards >= 1, got $nShards")
    val esc = regexp_replace(
      regexp_replace(col(textCol), "\\\\", "\\\\\\\\"), "\"", "\\\\\"")
    val line = concat(lit("{\"doc_id\":"), col(idCol).cast("string"),
      lit(",\"text\":\""), esc, lit("\"}"))
    val shard = pmod(conv(substring(md5(concat(lit("shard:"),
      col(idCol).cast("string"))), 1, 8), 16, 10).cast("long"), lit(nShards))
    val toks = size(filter(split(trim(col(textCol)), "\\s+"), t => t =!= ""))
      .cast("long")
    val rows = df.select(shard.as("shard"), line.as("line"),
        toks.as("__t"), length(col(textCol)).cast("long").as("__c"))
      .localCheckpoint()
    rows.select(col("shard"), col("line"))
      .write.partitionBy("shard").mode("overwrite").text(outDir)
    rows.groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum(col("__t")).as("n_tokens"),
        sum(col("__c")).as("n_chars"),
        sum(conv(substring(md5(col("line")), 1, 8), 16, 10).cast("long"))
          .as("fp32_sum"))
  }

  def packSequences(df: DataFrame, idCol: String, textCol: String,
      budget: Int, shards: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = size(filter(split(trim(col(textCol)), "\\s+"), t => t =!= ""))
      .cast("long")
    val w = Window.partitionBy("shard").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol), (col(idCol) % shards).as("shard"),
        toks.as("n_tokens"))
      .withColumn("tok_offset", sum("n_tokens").over(w) - col("n_tokens"))
      .select(col(idCol), col("shard"), col("n_tokens"), col("tok_offset"),
        expr(s"tok_offset div $budget").as("seq_index"),
        (col("tok_offset") % budget).as("seq_offset"))
  }
}
