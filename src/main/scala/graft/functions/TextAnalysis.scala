package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: tokenization,
  * quality scoring, language ID, document fingerprinting.
  *
  * All expression-only (no UDFs): whole-stage codegen end to end, and every
  * computation is integer/string-exact so results are bit-stable across
  * engines and cluster sizes. The token explode is the only row-multiplying
  * step; at 100 TB it stays embarrassingly parallel (no shuffle until the
  * per-document reaggregation, which is keyed by doc id — naturally
  * balanced).
  */
object TextAnalysis {
  val StopWords: Seq[String] =
    Seq("the", "a", "an", "of", "to", "and", "in", "is", "it", "for")

  /** (idCol, pos, tok) — whitespace tokenization, the baseline tokenizer
    * (a BPE-ish regex tokenizer is `tokensRegex`). */
  def tokens(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), posexplode(split(trim(col(textCol)), "\\s+")).as(Seq("pos", "tok")))

  /** Sliding-window token chunking (retrieval/RAG corpus prep): documents
    * split into chunks of `chunkSize` tokens starting every `stride`
    * tokens (overlap = chunkSize − stride). Output one row per
    * (doc, chunk): `chunk_id` (0-based start index / stride), `n_tokens`,
    * `chunk_text` (space-rejoined).
    *
    * Scale: NO join and no per-document collection — each token emits the
    * ≤ ⌈chunkSize/stride⌉ chunk ids that contain it (a map-side explode
    * with constant fan-out ≈ 1.33 at 64/48), then one hash aggregation on
    * (doc, chunk) assembles chunks. The alternative — generate chunk-start
    * rows and range-join tokens per doc — is O(n²/stride) per document on
    * long docs; this is O(n · chunkSize/stride) regardless of length.
    * Token pos p belongs to chunk k iff k·stride ≤ p < k·stride+chunkSize,
    * i.e. k ∈ [max(0, ⌈(p−chunkSize+1)/stride⌉), ⌊p/stride⌋] — every
    * emitted chunk therefore has ≥ 1 token (no empty trailing chunks). */
  def chunkTokens(
      df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      s"chunkTokens: need 0 < stride <= chunkSize, got ($chunkSize, $stride)")
    val t = tokens(df, idCol, textCol)
    // ceil((p-C+1)/S) via clamp-then-truncate: the numerator is clamped to
    // ≥ 0 BEFORE dividing so the floor/trunc divergence on negative ints
    // (Spark `div` truncates) can never bite — both engines agree on
    // non-negative truncation.
    val kMin = (greatest(lit(0L), col("pos") - chunkSize + stride) / stride).cast("long")
    val kMax = (col("pos") / stride).cast("long")
    t.select(col(idCol), col("pos"), col("tok"),
        explode(sequence(kMin, kMax)).as("chunk_id"))
      .groupBy(col(idCol), col("chunk_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        array_join(array_sort(collect_list(struct(col("pos"), col("tok"))))
          .getField("tok"), " ").as("chunk_text"))
  }

  /** Hashed bag-of-words document embedding: `dim`-dimensional count vector
    * with token buckets from the first md5 byte (engine-portable). The
    * cheap deterministic stand-in for a model embedding — the cosine
    * near-dup machinery downstream is identical whichever embedder fills
    * the column. Docs with no tokens get the zero vector. */
  /** Engine-portable token→bucket hash (first md5 byte mod `dim`) — the
    * single source for every hashed-feature family here ([[hashEmbedding]],
    * [[dsirWeights]]) and their oracle SQL. */
  private def tokBucket(dim: Int): Column =
    conv(substring(md5(col("tok")), 1, 2), 16, 10).cast("long") % dim

  def hashEmbedding(df: DataFrame, idCol: String, textCol: String, dim: Int): DataFrame = {
    val t = tokens(df, idCol, textCol)
    val bucket = tokBucket(dim)
    val counts = t.groupBy(col(idCol), bucket.as("__b")).agg(count(lit(1)).as("__n"))
    val maps = counts.groupBy(col(idCol))
      .agg(map_from_entries(collect_list(struct(col("__b"), col("__n")))).as("__m"))
    df.select(col(idCol)).join(maps, Seq(idCol), "left")
      .select(col(idCol),
        transform(sequence(lit(0L), lit(dim - 1L)),
          i => coalesce(element_at(col("__m"), i), lit(0L)).cast("float"))
          .as("embedding"))
  }

  /** BPE-ish subword-boundary tokenizer: splits words, digits, and
    * punctuation runs apart (regex analogue of byte-pair pre-tokenization). */
  def tokensRegex(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      posexplode(expr(s"regexp_extract_all($textCol, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\\\s]', 0)"))
        .as(Seq("pos", "tok"))
    )

  /** Per-document quality metrics: token count, stopword count/ratio, mean
    * token length. Ratios are exact-int divisions in double (deterministic). */
  def quality(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = tokens(df, idCol, textCol)
    t.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_tokens"),
      sum(when(col("tok").isin(StopWords: _*), 1L).otherwise(0L)).as("n_stop"),
      (sum(length(col("tok"))).cast("double") / count(lit(1))).as("avg_token_len"),
      (sum(when(col("tok").isin(StopWords: _*), 1L).otherwise(0L)).cast("double") /
        count(lit(1))).as("stopword_ratio")
    )
  }

  /** N-gram/stopword-evidence language ID (heuristic): counts hits against
    * tiny per-language function-word lists, argmax with 'und' fallback. */
  def langId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val en = Seq("the", "a", "of", "and", "to", "in")
    val es = Seq("el", "la", "de", "que", "y", "los")
    val t = tokens(df, idCol, textCol)
    t.groupBy(col(idCol)).agg(
      sum(when(col("tok").isin(en: _*), 1L).otherwise(0L)).as("n_en"),
      sum(when(col("tok").isin(es: _*), 1L).otherwise(0L)).as("n_es")
    ).select(
      col(idCol),
      when(col("n_en") >= col("n_es") && col("n_en") > 0, "en")
        .when(col("n_es") > 0, "es")
        .otherwise("und").as("lang_pred")
    )
  }

  /** Per-language function-word evidence lists (tiny on purpose — this is
    * the classifier-free heuristic tier; a model-based ID slots into the
    * same argmax shape). Declaration order = tie-break priority. */
  val DefaultLangs: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in"),
    "es" -> Seq("el", "la", "de", "que", "y", "los"),
    "fr" -> Seq("le", "la", "les", "et", "des", "une"),
    "de" -> Seq("der", "die", "und", "das", "nicht", "ist"),
    "it" -> Seq("il", "di", "che", "la", "per", "gli"),
    "pt" -> Seq("o", "a", "de", "que", "e", "dos"))

  /** Multi-language ID: per-language evidence counts in ONE aggregation
    * pass, argmax with declaration-order tie-break, 'und' when no evidence.
    * Overlapping function words (la/de/a/que) just contribute to several
    * languages' evidence — the argmax sorts it out. */
  def langIdMulti(
      df: DataFrame, idCol: String, textCol: String,
      langs: Seq[(String, Seq[String])] = DefaultLangs): DataFrame = {
    val t = tokens(df, idCol, textCol)
    val aggs = langs.map { case (name, words) =>
      sum(when(col("tok").isin(words: _*), 1L).otherwise(0L)).as(s"n_$name")
    }
    val counts = t.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
    val mx = greatest(langs.map(l => col(s"n_${l._1}")): _*)
    val chain = langs.foldLeft(when(mx === 0L, "und")) {
      case (w, (name, _)) => w.when(col(s"n_$name") === mx, name)
    }
    // Left-join back to the doc universe: a NULL-text doc has no token rows
    // and would otherwise produce no output at all — the contract is 'und'
    // when there is no evidence (the otherwise-branch catches the NULL
    // counts the left join introduces).
    df.select(col(idCol)).join(counts, Seq(idCol), "left")
      .select(col(idCol), chain.otherwise("und").as("lang_pred"))
  }

  /** Gopher-style quality signals (Rae et al. 2021 §A1.1 heuristics,
    * public): token-level stats, character-class ratios, and a repetition
    * signal (top token frequency share), plus the composite pass flag.
    * Every ratio is an exact-integer division in double — bit-stable. */
  def gopherQuality(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = tokens(df, idCol, textCol)
    val tokStats = t.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_tokens"),
      (sum(length(col("tok"))).cast("double") / count(lit(1))).as("avg_token_len"),
      (sum(when(col("tok").rlike("[A-Za-z]"), 1L).otherwise(0L)).cast("double") /
        count(lit(1))).as("frac_alpha_tokens"))
    val topTok = t.groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("__n"))
      .groupBy(col(idCol)).agg(max(col("__n")).as("__maxn"))
    def classCount(pattern: String) =
      length(col(textCol)) - length(regexp_replace(col(textCol), pattern, ""))
    val charStats = df.select(col(idCol),
      length(col(textCol)).as("__len"),
      classCount("[0-9]").as("__digits"),
      classCount("[^A-Za-z0-9\\s]").as("__symbols"),
      classCount("[A-Z]").as("__upper"))
    // charStats is the doc universe (one row per doc regardless of text);
    // left-join the token-derived stats so a NULL-text doc still gets a row
    // (null token stats, passes_gopher = false) instead of vanishing.
    charStats.join(tokStats, Seq(idCol), "left").join(topTok, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"), col("avg_token_len"),
        col("frac_alpha_tokens"),
        (col("__digits").cast("double") / col("__len")).as("digit_ratio"),
        (col("__symbols").cast("double") / col("__len")).as("symbol_ratio"),
        (col("__upper").cast("double") / col("__len")).as("uppercase_ratio"),
        (col("__maxn").cast("double") / col("n_tokens")).as("top_token_ratio"),
        coalesce(
          col("n_tokens") >= 20 && col("n_tokens") <= 100000 &&
            col("avg_token_len") >= 2.0 && col("avg_token_len") <= 12.0 &&
            col("frac_alpha_tokens") >= 0.7 &&
            (col("__maxn").cast("double") / col("n_tokens")) <= 0.2,
          lit(false)).as("passes_gopher"))
  }

  /** Corpus token histogram (vocabulary/frequency analysis). */
  def tokenHistogram(df: DataFrame, idCol: String, textCol: String): DataFrame =
    tokens(df, idCol, textCol)
      .groupBy("tok").agg(count(lit(1)).as("freq"))

  /** Deterministic rolling document fingerprint: positional weighted sum of
    * cheap token features — engine-portable integer arithmetic (no builtin
    * hash whose algorithm differs across engines). */
  def fingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame =
    tokens(df, idCol, textCol)
      .groupBy(col(idCol))
      .agg(sum((col("pos") + 1) * (ascii(col("tok")) * 31 + length(col("tok"))))
        .cast("long").as("fingerprint"))

  /** (idCol, tri) — character trigrams of the `[a-z ]`-normalized text
    * (lowercase, non-letter runs collapsed to one space). Empty/NULL/short
    * texts yield no rows. */
  def charTrigrams(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val norm = trim(regexp_replace(lower(col(textCol)), "[^a-z]+", " "))
    df.select(col(idCol), norm.as("__s"))
      .select(col(idCol),
        explode(when(length(col("__s")) >= 3,
          transform(sequence(lit(1), length(col("__s")) - 2),
            i => col("__s").substr(i, lit(3))))
          .otherwise(array_repeat(lit(""), 0))).as("tri"))
  }

  /** Character-trigram LM quality score (the CCNet/KenLM perplexity-filter
    * stage, self-trained on the corpus): P(c3 | c1 c2) with add-one
    * smoothing over the 27-symbol alphabet, conditional-prefix counts taken
    * from the same trigram position set.
    *
    * Output per doc: `n_trigrams`, `sum_p` / `mean_p` (mean conditional
    * probability — the bit-exact score), and `avg_logp` / `ppl` (the
    * conventional log-domain form). The rational columns are
    * engine-bit-exact: every probability is one IEEE division of exact
    * integers, and the per-doc sum folds in SORTED trigram order (per-key
    * products, sequential `aggregate`), so no float result depends on
    * partitioning or row order. `avg_logp`/`ppl` add `ln`/`exp`, whose last
    * ULP is libm-specific — they are spec-tested, not oracle-hashed.
    *
    * Scale shape: the model is at most 27^3 distinct trigrams → counted
    * with two map-side-combined aggregates and BROADCAST to the per-doc
    * join; per-doc state is bounded by distinct trigrams per document. No
    * window, no driver collect. */
  def charLmScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tris = charTrigrams(df, idCol, textCol)
    // per-doc counts FIRST; corpus counts derive from them, so the corpus
    // explode + (id, tri) shuffle subtree is computed once and shared
    // between the model build and the scoring join (ReusedExchange)
    val docTri = tris.groupBy(col(idCol), col("tri"))
      .agg(count(lit(1)).as("__c"))
    val c3 = docTri.groupBy("tri").agg(sum("__c").as("__c3"))
    charLmScoreCore(df, idCol, docTri, c3)
  }

  /** Incremental persisted char-trigram counts (the CMS/KMV addition-
    * merge family): trigram counts are a commutative monoid, so the
    * store after any append sequence equals the one-shot corpus counts
    * and the q135 oracle applies verbatim to scoring. The rewrite
    * touches only model-sized data (≤ 27³ trigram rows), never the
    * corpus. Store keyed (tri). */
  def charLmCountsAppend(
      ps: graft.storage.PartStore, part: String,
      batch: DataFrame, idCol: String, textCol: String,
      modified: Long): Unit = {
    require(ps.config.keyCols == Seq("tri"),
      s"char-LM store must be keyed (tri), got ${ps.config.keyCols}")
    val bc = charTrigrams(batch, idCol, textCol)
      .groupBy("tri").agg(count(lit(1)).as("c3"))
    val merged = ps.readPart(part) match {
      case None => bc
      case Some(p) => p.select(col("tri"), col("c3"))
        .unionByName(bc)
        .groupBy("tri").agg(sum("c3").as("c3"))
    }
    // The model is bounded (≤ 27³ trigram rows) at ANY corpus scale, so
    // it lives in ONE partition dir, and the merged frame above IS the
    // part's complete new state — replacePart publishes it through one
    // staged swap. ps.store() here would re-read the part and upsert-
    // merge a second time (an extra read + shuffle per batch for a
    // provable no-op), and a crc-spread timestamp would fan the tiny
    // model across 16 partition dirs of sliver files.
    ps.replacePart(part, merged
      .withColumn("timestamp", lit(0L))
      .withColumn("modified", lit(modified)))
    ()
  }

  /** Score a frame against the ACCUMULATED stored char-LM counts: same
    * scoring fold as [[charLmScore]], model from the store — after the
    * appends cover the corpus, bit-identical to the fresh run (counts
    * are exact integers, the model division and the sorted fold are the
    * same expressions). */
  def charLmScoreStored(
      ps: graft.storage.PartStore, part: String,
      df: DataFrame, idCol: String, textCol: String): DataFrame = {
    require(ps.config.keyCols == Seq("tri"),
      s"char-LM store must be keyed (tri), got ${ps.config.keyCols}")
    val c3 = ps.readPart(part).getOrElse(throw new IllegalArgumentException(
        s"charLmScoreStored: no counts part '$part' — append batches first"))
      .select(col("tri"), col("c3").as("__c3"))
    val docTri = charTrigrams(df, idCol, textCol)
      .groupBy(col(idCol), col("tri"))
      .agg(count(lit(1)).as("__c"))
    charLmScoreCore(df, idCol, docTri, c3)
  }

  /** Min-k% probability membership score against the STORED char-LM
    * (Shi et al. 2023 "Detecting Pretraining Data from Large Language
    * Models", public — the membership-inference signal): per document,
    * the mean probability of its `kBp`/10000 LEAST-probable trigram
    * occurrences under the stored model. Text the model trained on has
    * a fatter low-probability tail trimmed away, so members score
    * higher — the audit for "was this eval document in the training
    * set" when exact/fuzzy matching (q63/q299-family) misses.
    *
    * Exactness: the greedy bottom-quota selection folds over the
    * per-doc trigram list SORTED by (p, tri) with an integer remaining-
    * quota accumulator — take_i = min(c_i, max(quota − Σ_{j<i} c_j, 0))
    * — so every term and the fold order are engine-identical (the
    * charLmScoreCore convention). Coverage-restricted: trigrams absent
    * from the stored model are not scored (unseen-mass auditing is
    * q313/q319's job); quota is over COVERED occurrences.
    *
    * Scale: model ≤ 27³ rows broadcast; per-doc state bounded by
    * distinct covered trigrams per document. */
  def minKProbStored(
      ps: graft.storage.PartStore, part: String,
      df: DataFrame, idCol: String, textCol: String,
      kBp: Int): DataFrame = {
    require(kBp >= 1 && kBp <= 10000, s"minKProbStored: kBp in [1,10000]")
    require(ps.config.keyCols == Seq("tri"),
      s"char-LM store must be keyed (tri), got ${ps.config.keyCols}")
    val c3 = ps.readPart(part).getOrElse(throw new IllegalArgumentException(
        s"minKProbStored: no counts part '$part' — append batches first"))
      .select(col("tri"), col("c3").as("__c3"))
    val c2 = c3.groupBy(substring(col("tri"), 1, 2).as("__pre"))
      .agg(sum("__c3").as("__c2"))
    val model = c3.join(c2, substring(c3("tri"), 1, 2) === c2("__pre"))
      .select(col("tri"),
        ((col("__c3") + 1).cast("double") / (col("__c2").cast("double") + 27))
          .as("__p"))
    val docTri = charTrigrams(df, idCol, textCol)
      .groupBy(col(idCol), col("tri")).agg(count(lit(1)).as("__c"))
    val perDoc = docTri
      .join(broadcast(model), "tri")
      .groupBy(col(idCol)).agg(
        sum("__c").as("n_covered"),
        array_sort(collect_list(struct(col("__p"), col("tri"), col("__c"))))
          .as("__arr"))
      .withColumn("n_scored",
        greatest(lit(1L), expr(s"n_covered * $kBp DIV 10000")))
      .select(col(idCol), col("n_covered"), col("n_scored"),
        aggregate(col("__arr"),
          struct(col("n_scored").as("rem"), lit(0.0).as("s")),
          (acc, x) => {
            val take = least(x.getField("__c"),
              greatest(acc.getField("rem"), lit(0L)))
            struct((acc.getField("rem") - take).as("rem"),
              (acc.getField("s") +
                take.cast("double") * x.getField("__p")).as("s"))
          }).getField("s").as("sum_p_mink"))
    df.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_covered"), lit(0L)).as("n_covered"),
        coalesce(col("n_scored"), lit(0L)).as("n_scored"),
        coalesce(col("sum_p_mink"), lit(0.0)).as("sum_p_mink"),
        when(col("n_scored") > 0, col("sum_p_mink") / col("n_scored"))
          .as("mean_p_mink"))
  }

  private def charLmScoreCore(
      df: DataFrame, idCol: String,
      docTri: DataFrame, c3: DataFrame): DataFrame = {
    val c2 = c3.groupBy(substring(col("tri"), 1, 2).as("__pre"))
      .agg(sum("__c3").as("__c2"))
    val model = c3.join(c2, substring(c3("tri"), 1, 2) === c2("__pre"))
      .select(col("tri"),
        ((col("__c3") + 1).cast("double") / (col("__c2").cast("double") + 27))
          .as("__p"))
    val perDoc = docTri
      .join(broadcast(model), "tri")
      .groupBy(col(idCol)).agg(
        sum("__c").as("n_trigrams"),
        // ONE buffered+sorted struct list; both folds read it
        array_sort(collect_list(struct(col("tri"), col("__c"), col("__p"))))
          .as("__arr"))
      .select(col(idCol), col("n_trigrams"),
        aggregate(col("__arr"), lit(0.0),
          (acc, x) => acc + x.getField("__c") * x.getField("__p"))
          .as("sum_p"),
        aggregate(col("__arr"), lit(0.0),
          (acc, x) => acc + x.getField("__c") * log(x.getField("__p")))
          .as("__sum_logp"))
    df.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        col("sum_p"),
        when(col("n_trigrams") > 0, col("sum_p") / col("n_trigrams"))
          .as("mean_p"),
        when(col("n_trigrams") > 0, col("__sum_logp") / col("n_trigrams"))
          .as("avg_logp"),
        when(col("n_trigrams") > 0,
          exp(-col("__sum_logp") / col("n_trigrams"))).as("ppl"))
  }

  /** Per-source corpus mixture statistics (data mixing, Pile/LLaMA style):
    * doc and token counts, proportional shares, and the unnormalized
    * α=0.5 temperature weight √tokens.
    *
    * Determinism: counts are exact integers; shares are single double
    * divisions of exact integers and √ is correctly rounded — all
    * engine-identical. The α-weight is left UNNORMALIZED because the
    * normalizer Σ√tokens is a float sum whose value depends on summation
    * order; callers normalize over the handful of sources driver-side.
    * One map-side-combined aggregate; the totals join is a 1-row
    * broadcast. */
  def sourceMixture(
      df: DataFrame, idCol: String, textCol: String, sourceCol: String): DataFrame = {
    val nTokens = when(col(textCol).isNull || trim(col(textCol)) === "", 0)
      .otherwise(size(split(trim(col(textCol)), "\\s+"))).cast("long")
    val per = df.groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"), sum(nTokens).as("n_tokens"))
    val tot = per.agg(sum("n_docs").as("__td"), sum("n_tokens").as("__tt"))
    per.join(broadcast(tot))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        (col("n_docs").cast("double") / col("__td")).as("doc_share"),
        (col("n_tokens").cast("double") / col("__tt")).as("token_share"),
        sqrt(col("n_tokens").cast("double")).as("alpha05_weight"))
  }

  /** Gopher-style repetition signals (repetition removal, the second half
    * of the Gopher quality rules next to [[gopherQuality]]'s token/char
    * stats): duplicate-line fractions, most-frequent word-{2,3}-gram
    * coverage, and duplicated 5-gram mass.
    *
    * Definitions (all exact-integer numerators/denominators, so the double
    * divisions are engine-identical):
    *  - `dup_line_frac`    = 1 − distinct_lines / total_lines (non-empty,
    *    trimmed lines).
    *  - `dup_line_char_frac` = chars in repeat occurrences of a line
    *    (count−1 per distinct line) / total line chars.
    *  - `top_bigram_frac` / `top_trigram_frac` = token chars covered by all
    *    occurrences of the most frequent word n-gram / total token chars.
    *    Ties break toward the lexicographically LARGEST gram (single
    *    max(struct) aggregate — no second pass). Overlapping occurrences
    *    are each counted, so the ratio can exceed 1 on degenerate text —
    *    it is a repetition score, not a measure-theoretic char fraction.
    *  - `dup_5gram_frac`   = token chars over all occurrences of 5-grams
    *    seen more than once / total token chars (same overlap caveat).
    *
    * Scale shape: three independent explode→two-level-aggregate pipelines
    * keyed by doc id (map-side combine on (id, gram); no window, no
    * all-pairs), joined back to the doc universe — per-doc work is bounded
    * by document length, so 100 TB parallelizes on docs. */
  def repetitionSignals(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val emptyArr = array_repeat(lit(""), 0)
    val base = df.select(
      col(idCol),
      coalesce(filter(split(trim(col(textCol)), "\\s+"), t => t =!= ""), emptyArr)
        .as("__toks"),
      coalesce(filter(transform(split(col(textCol), "\n"), l => trim(l)),
        l => l =!= ""), emptyArr).as("__lines"))
      .select(col(idCol), col("__toks"), col("__lines"),
        size(col("__toks")).cast("long").as("n_tokens"),
        aggregate(col("__toks"), lit(0L), (a, t) => a + length(t)).as("__tok_chars"))

    // word n-grams joined with single spaces; absent below length n
    def grams(n: Int): Column =
      when(size(col("__toks")) >= n,
        transform(sequence(lit(1), size(col("__toks")) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(j => element_at(col("__toks"), i + j)): _*)))
        .otherwise(emptyArr)
    def gramCounts(n: Int): DataFrame =
      base.select(col(idCol), explode(grams(n)).as("__g"))
        .groupBy(col(idCol), col("__g")).agg(count(lit(1)).as("__c"))

    val lineStats = base.select(col(idCol), explode(col("__lines")).as("__l"))
      .groupBy(col(idCol), col("__l")).agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol)).agg(
        sum("__c").as("n_lines"),
        (lit(1.0) - count(lit(1)).cast("double") / sum("__c")).as("dup_line_frac"),
        when(sum(col("__c") * length(col("__l"))) > 0,
          sum((col("__c") - 1) * length(col("__l"))).cast("double") /
            sum(col("__c") * length(col("__l")))).as("dup_line_char_frac"))
    def top(n: Int, gram: String, frac: String): DataFrame =
      gramCounts(n).groupBy(col(idCol))
        .agg(max(struct(col("__c"), col("__g"))).as("__t"))
        .select(col(idCol), col("__t.__g").as(gram),
          (col("__t.__c") * (length(col("__t.__g")) - (n - 1))).as(frac))
    val five = gramCounts(5).groupBy(col(idCol))
      .agg(sum(when(col("__c") > 1, col("__c") * (length(col("__g")) - 4))
        .otherwise(0L)).as("__dup5"))

    base.join(lineStats, Seq(idCol), "left")
      .join(top(2, "top_bigram", "__bi"), Seq(idCol), "left")
      .join(top(3, "__tg", "__tri"), Seq(idCol), "left")
      .join(five, Seq(idCol), "left")
      .select(col(idCol), col("n_lines"), col("dup_line_frac"),
        col("dup_line_char_frac"), col("n_tokens"), col("top_bigram"),
        when(col("__tok_chars") > 0,
          col("__bi").cast("double") / col("__tok_chars")).as("top_bigram_frac"),
        when(col("__tok_chars") > 0,
          col("__tri").cast("double") / col("__tok_chars")).as("top_trigram_frac"),
        when(col("__tok_chars") > 0,
          coalesce(col("__dup5"), lit(0L)).cast("double") / col("__tok_chars"))
          .as("dup_5gram_frac"))
  }

  /** Engine-portable uniform in [0, 1e6) from a doc id: first 8 md5 hex
    * nibbles of "<salt><id>" — the seedless, reproducible coin every engine
    * can replay (Spark .sample() randomness is partition-layout
    * dependent). */
  private def hashUniform(id: Column, salt: String = "smp:"): Column =
    conv(substring(md5(concat(lit(salt), id.cast("string"))), 1, 8), 16, 10)
      .cast("long") % 1000000L

  /** Deterministic stratified Bernoulli sample: keep a doc iff its hash
    * uniform falls under its source's rate (missing sources use
    * `defaultRate`). Streams with NO shuffle and no RNG state — the
    * scale-correct way to downsample a 100 TB corpus to a target mixture,
    * reproducible across runs, engines and cluster layouts. */
  def stratifiedSample(
      df: DataFrame, idCol: String, sourceCol: String,
      rates: Map[String, Double], defaultRate: Double = 1.0): DataFrame = {
    val rateCol = rates.foldLeft(lit(defaultRate)) { case (acc, (s, r)) =>
      when(col(sourceCol) === s, lit(r)).otherwise(acc)
    }
    df.filter(hashUniform(col(idCol)).cast("double") < rateCol * 1000000.0)
  }

  /** Per-group token-distribution DRIFT vs the whole corpus: Laplace-
    * smoothed per-group and corpus distributions over the hashed
    * `buckets`-bucket token domain (the [[dsirWeights]] feature space),
    * reduced to two divergences per group — χ² = Σ (p−q)²/q (exactly
    * rounded arithmetic only, so oracle-exact cross-engine) and
    * KL(p‖q) = Σ p·(ln p − ln q) (libm ln — spec-tested, not oracle-
    * exposed, the q74 convention). The mixture-monitoring primitive:
    * which source's language shifted this ingest, which shard diverges
    * from the corpus.
    *
    * Scale shape: ONE token pass builds (group, bucket) counts
    * (map-side combined); everything after runs on |groups|·buckets
    * rows with the corpus distribution broadcast; per-group folds run
    * over the ≤`buckets`-entry sorted array, so the sums are partial-
    * aggregation-order-independent. Groups whose documents tokenize to
    * nothing keep n_toks = 0 and score the pure-smoothing divergence
    * (uniform p vs corpus q), not NULL. Output: (groupCol, n_toks,
    * chi2, kl). */
  def distributionDrift(
      df: DataFrame, groupCol: String, textCol: String,
      buckets: Int = 64): DataFrame = {
    require(buckets >= 2 && buckets <= 4096,
      s"distributionDrift: buckets in [2, 4096], got $buckets")
    val t = tokens(df, groupCol, textCol).filter(col("tok") =!= "")
      .select(col(groupCol), tokBucket(buckets).as("__b"))
    val gc = t.groupBy(col(groupCol), col("__b")).agg(count(lit(1)).as("__cg"))
    val cc = t.groupBy(col("__b")).agg(count(lit(1)).as("__cc"))
    val dom = df.sparkSession.range(buckets).select(col("id").as("__b"))
    val gtot = gc.groupBy(col(groupCol)).agg(sum("__cg").as("__ng"))
    val ctot = cc.agg(coalesce(sum("__cc"), lit(0L)).as("__nc"))
    df.select(col(groupCol)).distinct()
      .crossJoin(dom)
      .join(gc, Seq(groupCol, "__b"), "left")
      .join(broadcast(cc), Seq("__b"), "left")
      .join(gtot, Seq(groupCol), "left")
      .crossJoin(broadcast(ctot))
      .select(col(groupCol), col("__b"),
        coalesce(col("__ng"), lit(0L)).as("__n"),
        ((coalesce(col("__cg"), lit(0L)) + 1).cast("double") /
          (coalesce(col("__ng"), lit(0L)).cast("double") + buckets))
          .as("__p"),
        ((coalesce(col("__cc"), lit(0L)) + 1).cast("double") /
          (coalesce(col("__nc"), lit(0L)).cast("double") + buckets))
          .as("__q"))
      .groupBy(col(groupCol)).agg(
        max(col("__n")).as("n_toks"),
        array_sort(collect_list(struct(col("__b"), col("__p"), col("__q"))))
          .as("__arr"))
      .select(col(groupCol), col("n_toks"),
        aggregate(col("__arr"), lit(0.0d), (acc, x) => acc +
          (x.getField("__p") - x.getField("__q")) *
          (x.getField("__p") - x.getField("__q")) / x.getField("__q"))
          .as("chi2"),
        aggregate(col("__arr"), lit(0.0d), (acc, x) => acc +
          x.getField("__p") *
          (log(x.getField("__p")) - log(x.getField("__q")))).as("kl"))
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis & Spirtakis 2006
    * A-ES, public): per group, the `n` items with the LARGEST key
    * ln(u)/w — the log-space form of the classic u^(1/w) priority (u ∈
    * (0,1) the item's uniform coin, w > 0 its weight; ln(u) is negative,
    * so dividing by a larger weight pulls the key toward 0 and heavier
    * items win with exactly the A-ES inclusion law). The coin is the
    * engine-portable md5 ladder ((h + 0.5)/1e6 keeps u strictly inside
    * (0,1)), so every engine replays the same sample; non-positive or
    * NULL weights yield a NULL key, which the aggregate skips — such
    * items are never sampled (documented, not an error).
    *
    * Scale shape: per-group top-n through the native bounded TopKPairs
    * aggregate — map-side partials carry ≤n rows per (group, partition),
    * shuffle volume |groups|·n·|partitions| — NOT a per-group
    * row_number window, which would sort each group's entire corpus on
    * a single task (the q135 ntile lesson). Returns (groupCol, idCol,
    * rank) with rank 1..n in key order (ties broken by id inside the
    * aggregate). */
  def weightedSample(
      df: DataFrame, idCol: String, groupCol: String, weightCol: String,
      n: Int): DataFrame = {
    require(n >= 1, s"weightedSample: n must be >= 1, got $n")
    val u = (hashUniform(col(idCol), "wrs:").cast("double") + 0.5d) /
      1000000.0d
    val w = col(weightCol).cast("double")
    val key = when(w > 0.0d, log(u) / w)
    df.groupBy(col(groupCol))
      .agg(graft.expressions.TopKPairs.topk(
        col(idCol).cast("long"), key, n).as("tops"))
      .select(col(groupCol), posexplode(col("tops")).as(Seq("pos", "t")))
      .select(col(groupCol), col("t._2").as(idCol),
        (col("pos") + 1).cast("int").as("rank"))
  }

  /** Temperature-balanced source mixture (the multilingual p^(1/T)
    * sampling scheme of Conneau & Lample 2019, public): per-source
    * sampling RATES that reshape the corpus toward count^α shares, with
    * α = 1/2^sqrtIters computed by REPEATED IEEE sqrt — sqrt is
    * correctly-rounded on every engine, unlike pow, so the rates are
    * engine-exact (sqrtIters 1 ⇒ T=2, 2 ⇒ T=4, …). rate_s =
    * min(1, (w_s/Σw)·(N/n_s)); compose with [[stratifiedSample]] to
    * materialize the resample.
    *
    * Scale shape: ONE count aggregate touches the corpus; everything
    * after runs on a |sources|-row frame whose Σw folds in source order
    * (bit-stable), joined back as a 1-row broadcast totals frame. */
  def temperatureMixture(
      df: DataFrame, sourceCol: String, sqrtIters: Int = 1): DataFrame = {
    require(sqrtIters >= 1 && sqrtIters <= 6,
      s"sqrtIters must be in [1, 6] (alpha = 1/2^k), got $sqrtIters")
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("n_docs"))
    val w = (1 to sqrtIters).foldLeft(col("n_docs").cast("double"))(
      (c, _) => sqrt(c))
    val weighted = counts.withColumn("weight", w)
    val totals = weighted
      .agg(sort_array(collect_list(struct(
        col(sourceCol).as("s"), col("weight").as("w"),
        col("n_docs").as("n")))).as("xs"))
      .select(
        aggregate(col("xs"), lit(0.0), (a, x) => a + x.getField("w"))
          .as("sum_w"),
        aggregate(col("xs"), lit(0L), (a, x) => a + x.getField("n"))
          .as("n_total"))
    weighted.crossJoin(broadcast(totals)) // 1-row totals frame
      .select(col(sourceCol), col("n_docs"), col("weight"),
        least(lit(1.0), col("weight") / col("sum_w") *
          col("n_total").cast("double") / col("n_docs").cast("double"))
          .as("rate"))
  }

  /** Materialize a temperature-balanced resample end to end:
    * [[temperatureMixture]] → collect the per-source rates →
    * [[stratifiedSample]], in one call. The collect is bounded by
    * |sources| rows (a mixture over more than a few thousand sources is a
    * modeling error long before it is a driver-memory problem), so this
    * stays a control-plane read; the corpus itself is touched exactly
    * twice — one count aggregate for the rates, one shuffle-free filtered
    * pass for the sample. A NULL source is its own mixture group; its
    * rate rides through [[stratifiedSample]]'s `defaultRate` (a string
    * "null" key would never equal a NULL column), which is exact because
    * every non-null source is enumerated. */
  def materializeTemperatureSample(
      df: DataFrame, sourceCol: String, idCol: String,
      sqrtIters: Int = 1): DataFrame = {
    val rows = temperatureMixture(df, sourceCol, sqrtIters)
      .select(col(sourceCol).cast("string"), col("rate"))
      .collect()
    val named = rows.filter(!_.isNullAt(0))
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val nullRate = rows.find(_.isNullAt(0)).map(_.getDouble(1)).getOrElse(1.0)
    stratifiedSample(df, idCol, sourceCol, named, defaultRate = nullRate)
  }

  /** Per-group quantile cutoffs (exact R-7 linear interpolation — the
    * `percentile` both Spark and DuckDB's `quantile_cont` implement
    * bit-identically, so cutoffs are engine-portable): the primitive
    * behind "drop the bottom decile per source" length/quality filters —
    * compute cutoffs once, join them back, filter.
    *
    * Scale switch — `approx = true`: EXACT percentile state is
    * O(distinct values per group) on the aggregating executor — right
    * for per-source length/score distributions (bounded value domains),
    * an OOM for open-ended per-group cardinalities. The approx path uses
    * `approx_percentile` (bounded sketch state, `accuracy` buckets) and
    * gives up cross-engine bit-equality: approx cutoffs are
    * deterministic for a given Spark version but NOT the R-7 value the
    * DuckDB oracle computes — gate exact, scale approx. */
  def groupQuantiles(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      quantiles: Seq[(String, Double)], approx: Boolean = false,
      accuracy: Int = 10000): DataFrame = {
    require(quantiles.nonEmpty, "groupQuantiles needs at least one quantile")
    df.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_docs"),
        quantiles.map { case (name, q) =>
          if (approx)
            expr(s"approx_percentile(`$valueCol`, $q, $accuracy)")
              .cast("double").as(name)
          else expr(s"percentile(`$valueCol`, $q)").as(name)
        }: _*)
  }

  /** Distributed BPE merge training (Sennrich et al. 2016, public):
    * learn the top `nMerges` byte-pair merges from the corpus WORD
    * VOCABULARY — the classic formulation: one corpus pass builds
    * (word, freq), then each merge step runs over the vocab alone
    * (pair-frequency aggregate → argmax → merge application), so
    * training cost is nMerges × O(vocab), never nMerges × O(corpus).
    * Returns one row per step: (step, left, right, pair_freq).
    *
    * Determinism: argmax ties break (freq DESC, left ASC, right ASC);
    * merge application is greedy left-to-right, expressed through
    * per-word windows instead of a sequential fold so ANY engine
    * replays it: for left ≠ right occurrences never overlap (an
    * adjacent occurrence would force left = right), and for
    * left == right a run of k occurrences takes every second one —
    * (pos − runStart) even — which IS the greedy outcome on a
    * character run. No end-of-word marker (merges stay within words;
    * documented simplification of the </w> convention).
    *
    * Scale: vocab = one corpus aggregate (map-side combined); each
    * step is two vocab-sized shuffles (pair counts, merge windows per
    * word — windows bounded by word LENGTH) and one driver-side
    * 1-row argmax collect. */
  def bpeTrain(
      df: DataFrame, idCol: String, textCol: String,
      nMerges: Int): DataFrame =
    bpeCore(df, idCol, textCol, nMerges)._1

  /** The post-training segmented vocabulary: (word, freq, toks) with
    * `toks` = the word's BPE pieces after [[bpeTrain]]'s `nMerges`
    * merges — the lookup an encoder joins corpus tokens against
    * ([[bpeCore]] runs training once for both outputs). */
  def bpeVocab(
      df: DataFrame, idCol: String, textCol: String,
      nMerges: Int): DataFrame =
    bpeCore(df, idCol, textCol, nMerges)._2

  private def bpeCore(
      df: DataFrame, idCol: String, textCol: String,
      nMerges: Int): (DataFrame, DataFrame) = {
    require(nMerges >= 1 && nMerges <= 64,
      s"bpeTrain: nMerges in [1, 64], got $nMerges")
    bpeCoreBatched(df, idCol, textCol, nMerges, batch = 1)
  }

  /** Batched-merge BPE training (the SentencePiece-style round batching
    * that lifts [[bpeTrain]]'s driver-loop bound): each ROUND ranks all
    * pairs once, collects the top `batch` candidates in ONE driver read,
    * and accepts the longest PREFIX of that ranking whose pairs are
    * pairwise SYMBOL-DISJOINT — then applies every accepted merge
    * simultaneously. Driver round-trips are ∝ nMerges / batch instead of
    * nMerges.
    *
    * Equivalence to sequential greedy: symbol-disjoint pairs have
    * non-overlapping occurrences, and merging one leaves every other
    * accepted pair's occurrence set (and count) EXACTLY unchanged — so
    * the simultaneous application equals applying the accepted prefix
    * sequentially in rank order. (Where batched CAN diverge from a
    * strict one-at-a-time argmax: a merge may create a brand-new pair
    * involving its output token whose count overtakes a later accepted
    * candidate — the standard, documented batched-BPE deviation; with
    * batch = 1 the loop IS sequential greedy, which is the spec's
    * equivalence anchor.) The stop-at-first-conflict prefix rule keeps
    * the accepted set an exact prefix of the round's ranking, so the
    * emitted (step, left, right, pair_freq) order is the ranking order.
    *
    * Scale: per round one vocab-sized pair aggregate, a `batch`-row
    * driver collect, and one windowed merge application over the vocab
    * (windows bounded by word length). nMerges up to 4096. */
  def bpeTrainBatched(
      df: DataFrame, idCol: String, textCol: String,
      nMerges: Int, batch: Int = 64): DataFrame =
    bpeCoreBatched(df, idCol, textCol, nMerges, batch)._1

  /** [[bpeVocab]] for the batched trainer (one training run, both
    * outputs). */
  def bpeVocabBatched(
      df: DataFrame, idCol: String, textCol: String,
      nMerges: Int, batch: Int = 64): DataFrame =
    bpeCoreBatched(df, idCol, textCol, nMerges, batch)._2

  private def bpeCoreBatched(
      df: DataFrame, idCol: String, textCol: String,
      nMerges: Int, batch: Int): (DataFrame, DataFrame) = {
    require(nMerges >= 1 && nMerges <= 4096,
      s"bpeTrainBatched: nMerges in [1, 4096], got $nMerges")
    require(batch >= 1 && batch <= 1024,
      s"bpeTrainBatched: batch in [1, 1024], got $batch")
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    var vocab = tokens(df, idCol, textCol).filter(col("tok") =!= "")
      .groupBy(col("tok").as("word")).agg(count(lit(1)).as("freq"))
      .select(col("word"), col("freq"), split(col("word"), "").as("toks"))
      .localCheckpoint()
    val steps = Seq.newBuilder[(Int, String, String, Long)]
    var done = 0
    var exhausted = false
    while (done < nMerges && !exhausted) {
      val w = Window.partitionBy("word").orderBy("pos")
      val occ = vocab
        .select(col("word"), col("freq"), posexplode(col("toks")).as(Seq("pos", "t")))
        .withColumn("nxt", lead(col("t"), 1).over(w))
      val want = math.min(batch, nMerges - done)
      val top = occ.filter(col("nxt").isNotNull)
        .groupBy(col("t").as("l"), col("nxt").as("r"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(want).collect()
      if (top.isEmpty) exhausted = true
      else {
        // accept the longest pairwise-symbol-disjoint PREFIX of the ranking
        val accepted = Seq.newBuilder[(String, String, Long)]
        val used = scala.collection.mutable.Set.empty[String]
        var open = true
        for (row <- top if open) {
          val (l, r, c) = (row.getString(0), row.getString(1), row.getLong(2))
          if (used.contains(l) || used.contains(r)) open = false
          else { accepted += ((l, r, c)); used += l; used += r }
        }
        val acc = accepted.result()
        acc.foreach { case (l, r, c) =>
          done += 1; steps += ((done, l, r, c))
        }
        // simultaneous application: occurrences of distinct accepted
        // pairs can never overlap (overlap implies a shared symbol), and
        // consecutive marked positions always belong to one same-symbol
        // run — so the single-merge run-parity machinery applies verbatim
        // with the multi-pair mark
        vocab = applyMergePass(vocab, acc.map { case (l, r, _) => (l, r) })
      }
    }
    (steps.result().toDF("step", "left", "right", "pair_freq"), vocab)
  }

  /** One greedy merge-application pass over a segmented vocab (word,
    * freq, toks): merge every occurrence of the given symbol-disjoint
    * pair set, greedy left-to-right via the run-parity windows (windows
    * bounded by word length). Shared by the training loop and
    * [[bpeApply]]. */
  private def applyMergePass(
      vocab: DataFrame, pairs: Seq[(String, String)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("word").orderBy("pos")
    val occ = vocab
      .select(col("word"), col("freq"), posexplode(col("toks")).as(Seq("pos", "t")))
      .withColumn("nxt", lead(col("t"), 1).over(w))
    val isAcc = pairs.map { case (l, r) =>
      col("t") === l && col("nxt") === r }.reduce(_ || _)
    val selfPair = pairs.filter { case (l, r) => l == r }
      .map { case (l, _) => col("t") === l }
      .foldLeft(lit(false))(_ || _)
    val marked = occ
      .withColumn("occ", isAcc)
      .withColumn("newRun",
        (col("occ") && !coalesce(lag(col("occ"), 1).over(w), lit(false)))
          .cast("long"))
      .withColumn("runId", sum(col("newRun")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
    val runStarts = marked.filter(col("occ"))
      .groupBy("word", "runId").agg(min("pos").as("runStart"))
    marked.join(runStarts, Seq("word", "runId"), "left")
      .withColumn("taken",
        col("occ") && (!selfPair ||
          pmod(col("pos") - col("runStart"), lit(2)) === 0))
      .withColumn("consumed",
        coalesce(lag(col("taken"), 1).over(w), lit(false)))
      .filter(!col("consumed"))
      .withColumn("out", when(col("taken"), concat(col("t"), col("nxt")))
        .otherwise(col("t")))
      .groupBy("word", "freq")
      .agg(array_sort(collect_list(struct(col("pos"), col("out")))).as("a"))
      .select(col("word"), col("freq"),
        transform(col("a"), x => x("out")).as("toks"))
      .localCheckpoint()
  }

  /** ENCODE a corpus against a stored ordered merge-rule list (the
    * [[bpeTrain]] output): segment every DISTINCT word of `df` by
    * replaying the rules in rank order, one application pass per rule —
    * the same pass the trainer ran, driven by the stored rule instead of
    * the argmax. Two consequences, both by construction:
    * encode(training corpus) is BIT-IDENTICAL to [[bpeVocab]]'s
    * segmentation, and UNSEEN words — the held-out/inference case a
    * memoized word→pieces vocab cannot cover — segment under exactly the
    * rules the trainer learned. (One pass per rule is the trainer's
    * application order; the classic encoder's re-scan for earlier-rank
    * pairs created by later merges is a documented deviation shared with
    * the training loop and its oracle.)
    *
    * Scale: cost ∝ |rules| × |distinct words of df| (windows bounded by
    * word length) — never corpus-sized; the caller joins corpus tokens
    * against the returned (word, freq, toks) with a broadcast. Rules are
    * a bounded driver-side list (≤4096 — the trainer's own cap). */
  def bpeApply(
      df: DataFrame, idCol: String, textCol: String,
      rules: Seq[(String, String)]): DataFrame = {
    require(rules.nonEmpty && rules.size <= 4096,
      s"bpeApply: 1..4096 rules, got ${rules.size}")
    var vocab = tokens(df, idCol, textCol).filter(col("tok") =!= "")
      .groupBy(col("tok").as("word")).agg(count(lit(1)).as("freq"))
      .select(col("word"), col("freq"), split(col("word"), "").as("toks"))
      .localCheckpoint()
    // rules apply one at a time: unlike a training round's accepted set
    // they are not symbol-disjoint, so batching them would let later
    // rules see pre-merge symbols
    rules.foreach { rule => vocab = applyMergePass(vocab, Seq(rule)) }
    vocab
  }

  /** Per-group robust location/scale: median and MAD (median absolute
    * deviation — Hampel's robust scale, public standard) of `valueCol`,
    * via two [[groupQuantiles]] passes (R-7, engine-exact). The
    * outlier-filter primitive mean/stddev gets wrong on heavy-tailed
    * length/quality distributions: one 10 MB document moves a source's
    * mean arbitrarily but its median not at all.
    *
    * Scale: two grouped percentile aggregates + one broadcast-size join
    * of the per-group medians (|groups| rows); same `approx` switch
    * caveats as [[groupQuantiles]] apply if swapped in. Returns
    * (groupCols..., n_docs, med, mad). */
  def groupRobustStats(
      df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame = {
    val med = groupQuantiles(df, groupCols, valueCol, Seq("med" -> 0.5))
      .withColumnRenamed("n_docs", "__n")
    val dev = df.join(broadcast(med), groupCols)
      .withColumn("__dev", abs(col(valueCol).cast("double") - col("med")))
    groupQuantiles(dev, groupCols, "__dev", Seq("mad" -> 0.5))
      .drop("n_docs")
      .join(broadcast(med), groupCols)
      .select(groupCols.map(col) ++
        Seq(col("__n").as("n_docs"), col("med"), col("mad")): _*)
  }

  /** Cap rows per key — the per-domain/per-source document cap every
    * curation pipeline needs (a handful of hosts otherwise dominate a
    * crawl): keep the `n` rows with the smallest salted 52-bit md5(id)
    * hash per key, i.e. a deterministic uniform choice that any engine
    * replays bit-for-bit. Ties (hash collisions) break on the id.
    *
    * Scale shape: a window row_number would SORT every key's full row
    * set; here [[graft.expressions.TopKPairs]] keeps ≤n (hash, id) pairs
    * per key map-side, the shuffle carries |keys|·n·|partitions| pairs at
    * ANY corpus size, and survivors semi-join back equi on (key, id).
    * No Window anywhere in the plan (spec-asserted). */
  def capPerKey(
      df: DataFrame, keyCol: String, idCol: String, n: Int,
      salt: String = "cap:"): DataFrame = {
    require(n >= 1, s"capPerKey needs n >= 1, got $n")
    // ids ride through a LongType aggregate; a non-integral id column
    // would cast to NULL, be skipped by the aggregate, and the semi-join
    // would silently delete the whole corpus
    val integral: Set[org.apache.spark.sql.types.DataType] = Set(
      org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
      org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)
    require(integral.contains(df.schema(idCol).dataType),
      s"capPerKey id column '$idCol' must be integral, got " +
        df.schema(idCol).dataType.simpleString)
    // 13 md5 nibbles = 52 bits: exact in the double score TopKPairs
    // orders on (and mirrors kmvDistinct's engine-portable hash)
    val hv = conv(substring(
      md5(concat(lit(salt), col(idCol).cast("string"))), 1, 13), 16, 10)
      .cast("long")
    // TopKPairs orders (score DESC, id ASC): negate the hash so the n
    // SMALLEST hashes survive
    val survivors = df
      .groupBy(col(keyCol))
      .agg(graft.expressions.TopKPairs.topk(
        col(idCol).cast("long"), -hv.cast("double"), n).as("__keep"))
      .select(col(keyCol).as("__k"), explode(col("__keep")).as("__t"))
      .select(col("__k"), col("__t._2").as("__id"))
    // null-SAFE key equality: a NULL key is its own group and gets capped
    // like any other (the SQL-window oracle partitions NULLs together too);
    // a plain equi-join would silently delete every NULL-key row
    df.join(survivors,
      df(keyCol) <=> survivors("__k") && df(idCol) === survivors("__id"),
      "left_semi")
  }

  /** Deterministic train/val/test split by id hash: a document's split is
    * the first band whose cumulative weight exceeds its hash uniform —
    * stable across runs, engines, cluster layouts, and corpus growth (a
    * document's assignment never depends on other documents). Weights are
    * taken in declaration order and need not sum to 1; the last band
    * absorbs the remainder. Pure per-row projection, no shuffle. */
  def hashSplit(
      df: DataFrame, idCol: String, splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty, "hashSplit needs at least one band")
    require(splits.forall(_._2 >= 0) && splits.map(_._2).sum <= 1.0 + 1e-9,
      s"split weights must be non-negative and sum to <= 1 " +
        s"(got ${splits.map(_._2).sum}) — an over-1 cumulative silently " +
        "starves every later band")
    val hv = hashUniform(col(idCol), "split:").cast("double")
    val chain = splits.init.foldLeft((when(lit(false), ""), 0.0)) {
      case ((w, cum), (name, weight)) =>
        val c = cum + weight
        (w.when(hv < c * 1000000.0, name), c)
    }._1
    df.withColumn("split", chain.otherwise(splits.last._1))
  }

  /** 2⁵²: the KMV hash space (13 md5 nibbles). */
  val KmvHashSpace: Double = 4503599627370496.0

  /** KMV distinct-count estimate per group (vocabulary size, unique users):
    * hash each value to an engine-portable 52-bit md5 uniform (first 13
    * nibbles — 2⁵² ≈ 4.5·10¹⁵ hash space, so birthday-collision bias stays
    * negligible even at ~10¹⁰ distinct values per group, and every hash is
    * exactly representable in a double for the cross-engine estimator
    * division), keep the k smallest distinct hashes
    * ([[graft.expressions.MinKLongs]] — map-side partials carry ≤k longs
    * per group, shuffle |groups|·k at ANY corpus size), estimate
    * distinct ≈ (k−1)·2⁵² / kth-minimum. Exact — up to 52-bit hash
    * collisions, which under-count by one with no signal — when the group
    * has fewer than k distinct values. Fully deterministic — unlike HLL
    * approx_count_distinct, the same input set yields the same estimate on
    * every engine, so it is oracle-checkable and sketches can be
    * persisted/merged across ingest batches.
    *
    * Hash layout v2 (52-bit): sketches persisted under the earlier 32-bit
    * layout must be REBUILT, not merged — their small hashes would
    * dominate the minima and inflate estimates by ~2²⁰. */
  def kmvDistinct(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Int = 1024): DataFrame = {
    val hv = conv(substring(md5(col(valueCol)), 1, 13), 16, 10).cast("long")
    df.groupBy(groupCols.map(col): _*)
      .agg(graft.expressions.MinKLongs.mink(hv, k).as("__minima"))
      .select(groupCols.map(col) ++ Seq(
        size(col("__minima")).cast("long").as("n_minima"),
        when(size(col("__minima")) < k, size(col("__minima")).cast("double"))
          .otherwise(lit((k - 1).toDouble * KmvHashSpace) /
            element_at(col("__minima"), k).cast("double"))
          .as("est_distinct")): _*)
  }

  /** Incremental persisted KMV distinct sketch, append side: per-group
    * k smallest distinct hashes merged with the stored sketch and the
    * part REWRITTEN — legal because the sketch is bounded (k·|groups|
    * rows), so the rewrite cost is sketch-sized, never corpus-sized,
    * while the batch contributes only its own per-group minima. KMV
    * minima-of-union = union-of-minima, so the stored sketch after any
    * append sequence equals the one-shot corpus sketch exactly (the
    * [[HdrQuantiles]] layout-invariance argument, here through min
    * instead of addition). */
  def kmvIncrementalAppend(
      ps: graft.storage.PartStore, part: String,
      batch: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Int, modified: Long): Unit = {
    val hv = conv(substring(md5(col(valueCol)), 1, 13), 16, 10).cast("long")
    val batchMins = batch
      .groupBy(groupCols.map(col): _*)
      .agg(graft.expressions.MinKLongs.mink(hv, k).as("__m"))
      .select(groupCols.map(col) :+ explode(col("__m")).as("h"): _*)
    val existing = ps.readPart(part)
    val merged = existing match {
      case None => batchMins
      case Some(ex) =>
        ex.select(groupCols.map(col) :+ col("h"): _*)
          .unionByName(batchMins)
          .groupBy(groupCols.map(col): _*)
          .agg(graft.expressions.MinKLongs.mink(col("h"), k).as("__m"))
          .select(groupCols.map(col) :+ explode(col("__m")).as("h"): _*)
    }
    val rows = merged
      .withColumn("timestamp", pmod(col("h"), lit(1024L)))
      .withColumn("modified", lit(modified))
      .localCheckpoint() // sketch-sized (k·|groups|); store() executes its
      // input twice — without the pin the batch's full scan + mink
      // aggregation would run twice per append
    if (existing.isEmpty) ps.store(part, rows)
    else {
      // rewrite, not upsert: hashes falling OUT of the k smallest must
      // leave the store; the whole part is sketch-sized so this is cheap
      val psz = ps.config.partitionSizeSeconds
      ps.rewritePart(part, _ => rows.withColumn("pindex",
        ((col("timestamp") - pmod(col("timestamp"), lit(psz))) / psz)
          .cast("long")))
      ()
    }
  }

  /** Estimate side of the stored KMV sketch: the standard (k−1)·H/kth
    * estimator straight off the stored minima — identical arithmetic to
    * [[kmvDistinct]], so a batch sketch and the incrementally grown
    * store answer byte-identically. */
  def kmvEstimateStored(
      ps: graft.storage.PartStore, part: String,
      groupCols: Seq[String], k: Int): DataFrame =
    ps.readPart(part).get
      .groupBy(groupCols.map(col): _*)
      .agg(sort_array(collect_list(col("h"))).as("__minima"))
      .select(groupCols.map(col) ++ Seq(
        size(col("__minima")).cast("long").as("n_minima"),
        when(size(col("__minima")) < k, size(col("__minima")).cast("double"))
          .otherwise(lit((k - 1).toDouble * KmvHashSpace) /
            element_at(col("__minima"), k).cast("double"))
          .as("est_distinct")): _*)

  /** Cross-corpus overlap estimation from two KMV sketches (Bar-Yossef
    * et al. 2002; the Jaccard-from-min-k construction of Beyer et al.
    * 2007, public): X = the k smallest distinct hashes of the sketch
    * UNION, J ≈ |X ∩ A ∩ B| / |X|, |A∩B| ≈ J · |A∪B|_KMV. Returns one
    * row: (n_a, n_b, kx, y, jaccard_est, union_est, inter_est).
    *
    * The planning-time answer to "how contaminated is corpus B with set
    * A?" for TWO ≤k-long sketch scans — never a join of the corpora;
    * sketches can be persisted (they ride PartStore like any column) and
    * compared across snapshots without touching the data again. */
  def kmvOverlapEstimate(
      a: DataFrame, b: DataFrame, valueCol: String, k: Int): DataFrame = {
    require(k >= 2, s"kmvOverlapEstimate: k >= 2, got $k")
    val hv = conv(substring(md5(col(valueCol)), 1, 13), 16, 10).cast("long")
    def sk(df: DataFrame, name: String) =
      df.agg(graft.expressions.MinKLongs.mink(hv, k).as(name))
    val x = slice(array_sort(array_distinct(concat(col("ma"), col("mb")))), 1, k)
    sk(a, "ma").crossJoin(sk(b, "mb"))
      .select(col("ma"), col("mb"), x.as("x"))
      .select(
        size(col("ma")).cast("long").as("n_a"),
        size(col("mb")).cast("long").as("n_b"),
        size(col("x")).cast("long").as("kx"),
        size(array_intersect(array_intersect(col("x"), col("ma")), col("mb")))
          .cast("long").as("y"),
        col("x"))
      // kx = 0 (one side empty → empty union sketch) would give 0/0 =
      // NaN; NULL = "no estimate" instead, matching containmentEstimate
      .withColumn("jaccard_est",
        when(col("kx") > 0, col("y").cast("double") / col("kx").cast("double")))
      .withColumn("union_est",
        when(col("kx") < k, col("kx").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(KmvHashSpace) /
            element_at(col("x"), k).cast("double")))
      .withColumn("inter_est", col("jaccard_est") * col("union_est"))
      .drop("x")
  }

  /** Cross-source vocabulary-overlap matrix: one KMV sketch of distinct
    * token hashes per source (bounded ≤k longs however large the
    * source), then every source PAIR's Jaccard/union/intersection
    * estimates from the sketch union — [[kmvOverlapEstimate]]'s
    * arithmetic lifted from one fixed pair to the full matrix. This is
    * the mixture-QA / decontamination triage primitive: which corpus
    * sources share vocabulary (a high-overlap pair flags duplicated
    * crawls or train/eval leakage) BEFORE paying a doc-level dedup pass.
    *
    * Scale: one token aggregate with ≤k-long bounded state per source
    * (map-side combined), then a |S|²-row self-join of sketch rows —
    * |S| is the mixture's source count (dozens), so the matrix never
    * touches the corpus again. Estimates are exact while a pair's
    * union has < k distinct hashes (sketch == set); NULL sources drop
    * from the matrix (`source_a < source_b` is never true for NULL).
    * Returns (source_a, source_b, n_a, n_b, kx, y, jaccard_est,
    * union_est, inter_est), min-k order-free so engine-exact. */
  def sourceOverlapMatrix(
      df: DataFrame, sourceCol: String, textCol: String, k: Int): DataFrame = {
    require(k >= 2, s"sourceOverlapMatrix: k >= 2, got $k")
    val toks = tokens(df, sourceCol, textCol).filter(col("tok") =!= "")
      .select(col(sourceCol), col("tok"))
    val sk = Dedup.kmvDocSketches(toks, sourceCol, "tok", k)
    def kmvEst(arr: Column): Column =
      when(size(arr) < k, size(arr).cast("double"))
        .otherwise(lit((k - 1).toDouble) * lit(KmvHashSpace) /
          element_at(arr, k).cast("double"))
    val x = slice(array_sort(array_distinct(concat(col("ma"), col("mb")))), 1, k)
    val a = sk.select(col(sourceCol).as("source_a"), col("minima").as("ma"))
    val b = sk.select(col(sourceCol).as("source_b"), col("minima").as("mb"))
    a.crossJoin(b).filter(col("source_a") < col("source_b"))
      .select(col("source_a"), col("source_b"),
        size(col("ma")).cast("long").as("n_a"),
        size(col("mb")).cast("long").as("n_b"),
        col("ma"), col("mb"), x.as("x"))
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
        size(col("x")).cast("long").as("kx"),
        size(array_intersect(array_intersect(col("x"), col("ma")), col("mb")))
          .cast("long").as("y"),
        kmvEst(col("x")).as("union_est"))
      .withColumn("jaccard_est",
        when(col("kx") > 0, col("y").cast("double") / col("kx").cast("double")))
      .withColumn("inter_est", col("jaccard_est") * col("union_est"))
  }

  /** Content-defined chunking (CDC — the Rabin/LBFS boundary idea,
    * Muthitacharoen et al. 2001, public — at WORD granularity): a chunk
    * boundary falls AFTER every token whose salted 32-bit md5 is ≡ 0
    * mod 2^maskBits, so expected chunk length is 2^maskBits tokens and
    * boundaries depend only on CONTENT — an insertion near the start
    * shifts fixed-stride chunk grids everywhere ([[chunkTokens]]'s
    * failure mode for dedup) but leaves every boundary after the next
    * content match untouched, so downstream digests still collide with
    * the unedited copy (spec-asserted). Returns one row per (doc,
    * chunk): (idCol, chunk_id, n_toks, chunk_digest) with the digest
    * over the space-rejoined in-order tokens.
    *
    * Scale: boundary flags are map-side; the running boundary count is
    * one per-DOC window (bounded by document length — the [[graft
    * .functions.Dedup.shingles]] convention, not a corpus-wide sort)
    * and the digest one ordered in-group aggregation. Cross-doc chunk
    * dedup is then an exact groupBy on chunk_digest. */
  def cdcChunks(
      df: DataFrame, idCol: String, textCol: String, maskBits: Int): DataFrame = {
    require(maskBits >= 1 && maskBits <= 20,
      s"cdcChunks: maskBits in [1, 20], got $maskBits")
    import org.apache.spark.sql.expressions.Window
    val t = tokens(df, idCol, textCol).filter(col("tok") =!= "")
    val boundary = (pmod(
      conv(substring(md5(concat(lit("cdc:"), col("tok"))), 1, 8), 16, 10)
        .cast("long"),
      lit(1L << maskBits)) === 0L).cast("long")
    val w = Window.partitionBy(idCol).orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    t.withColumn("__b", boundary)
      .withColumn("chunk_id", coalesce(sum(col("__b")).over(w), lit(0L)))
      .groupBy(col(idCol), col("chunk_id"))
      .agg(count(lit(1)).as("n_toks"),
        md5(array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
            x => x("tok")),
          " ")).as("chunk_digest"))
  }

  /** TF-IDF term weighting (Spärck Jones 1972, public): per-(doc, term)
    * frequency × inverse document frequency `ln(N / df)`. Two map-side
    * aggregates — (doc, tok) counts and distinct-doc counts per tok — and
    * one equi-join on the token key; the N total is a 1-row broadcast
    * cross join. No window, no all-pairs; a corpus-hot token skews the
    * token-keyed join exactly like [[cmsSketch]]'s bucket join and AQE
    * splits it.
    *
    * Gate-exact columns: `tf`, `df`, `n_docs` (pure counts); `tfidf`
    * multiplies `ln`, whose last ULP is libm-specific — spec-tested, not
    * oracle-hashed (the [[charLmScore]]/[[dsirWeights]] convention).
    * Returns (idCol, tok, tf, df, n_docs, tfidf). */
  def tfIdf(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(df, idCol, textCol).filter(col("tok") =!= "")
    val tf = toks.groupBy(col(idCol), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val docFreq = toks.select(col(idCol), col("tok")).distinct()
      .groupBy("tok").agg(count(lit(1)).as("df"))
    val n = df.select(countDistinct(col(idCol)).as("n_docs"))
    tf.join(docFreq, "tok")
      .crossJoin(broadcast(n))
      .select(col(idCol), col("tok"), col("tf"), col("df"), col("n_docs"),
        (col("tf").cast("double") *
          log(col("n_docs").cast("double") / col("df").cast("double")))
          .as("tfidf"))
  }

  /** BM25 per-(doc, term) weights (Robertson et al., Okapi BM25 — public):
    * the tf saturation + length normalization IR engines actually rank
    * with, `tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))`, times the BM25
    * idf `ln((N − df + ½)/(df + ½) + 1)`. Same aggregate shapes as
    * [[tfIdf]] plus a per-doc length count and a 2-value broadcast total
    * (N, avgdl).
    *
    * Gate-exact columns: `tf`, `df`, `dl`, `n_docs`, and `tf_norm` — with
    * rational k1 = 1.2 and b = 0.75 the normalization is plain IEEE
    * double arithmetic, identical on both engines when written in the
    * same op order. `bm25` multiplies the libm `ln` — spec-tested.
    * Returns (idCol, tok, tf, df, dl, n_docs, tf_norm, bm25). */
  def bm25(
      df: DataFrame, idCol: String, textCol: String,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val toks = tokens(df, idCol, textCol).filter(col("tok") =!= "")
    val tf = toks.groupBy(col(idCol), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val dl = toks.groupBy(col(idCol)).agg(count(lit(1)).as("dl"))
    val docFreq = toks.select(col(idCol), col("tok")).distinct()
      .groupBy("tok").agg(count(lit(1)).as("df"))
    val totals = toks.select(col(idCol)).distinct()
      .agg(count(lit(1)).as("n_docs"))
      .crossJoin(toks.agg(count(lit(1)).as("__n_toks")))
    // avgdl as ONE division (n_toks/n_docs) so both engines round once
    val tfNorm = col("tf").cast("double") * lit(k1 + 1.0) /
      (col("tf").cast("double") + lit(k1) * (lit(1.0 - b) +
        lit(b) * col("dl").cast("double") /
          (col("__n_toks").cast("double") / col("n_docs").cast("double"))))
    tf.join(dl, idCol).join(docFreq, "tok").crossJoin(broadcast(totals))
      .select(col(idCol), col("tok"), col("tf"), col("df"), col("dl"),
        col("n_docs"), tfNorm.as("tf_norm"),
        (tfNorm * log((col("n_docs").cast("double") -
          col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5)) + lit(1.0))).as("bm25"))
  }

  /** BM25 retrieval: score every document against a bag of query tokens
    * and keep the top `topN` by score. Scoring uses [[bm25]]'s gate-exact
    * `tf_norm` and the RAW Robertson idf ratio (n−df+0.5)/(df+0.5).
    * NOTE: the ratio is monotone in the usual log idf PER TERM, so
    * rankings agree with standard BM25 only for single-term queries; a
    * multi-term sum of ratio-weighted contributions can order documents
    * differently from the summed-log-idf formulation (the ratio
    * exaggerates rare-term dominance). This variant is chosen for
    * engine-exact fixed-point summation, not BM25 rank equivalence —
    * callers needing textbook multi-term BM25 order use
    * [[bm25SearchLog]] / [[bm25SearchStoredLog]], which rank by the
    * summed fixed-point log-idf contribution.
    * The score is scaled to LONG
    * fixed-point (`floor(·1e9)`) before the per-doc sum, which makes the
    * aggregate order-independent and engine-exact (a double sum over query
    * terms would hash-diverge on summation order; the ln variant is
    * spec-tested via the `bm25` column).
    *
    * Scale: corpus-wide df/dl stats are the same two aggregates every
    * BM25 deployment precomputes (materialize them once and reuse across
    * queries — they do NOT depend on the query); the query-token filter is
    * a broadcast-size `isin` applied before the score join, so the scored
    * frame is |docs containing a query token|, not |corpus × vocab|. */
  def bm25Search(
      df: DataFrame, idCol: String, textCol: String,
      queryToks: Seq[String], topN: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryToks.nonEmpty, "bm25Search: empty query")
    val stats = bm25(df, idCol, textCol, k1, b)
    stats.filter(col("tok").isin(queryToks: _*))
      .withColumn("contrib",
        floor(col("tf_norm") * rawIdf * lit(1e9)).cast("long"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hit_toks"), sum(col("contrib")).as("score_scaled"))
      .orderBy(col("score_scaled").desc, col(idCol))
      .limit(topN)
  }

  /** The raw Robertson idf ratio (n−df+0.5)/(df+0.5) — [[bm25Search]]'s
    * per-term weight, rank-equivalent to log idf per term only. */
  private def rawIdf: org.apache.spark.sql.Column =
    (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5))

  /** TEXTBOOK log idf: ln(1 + (n−df+0.5)/(df+0.5)) (Robertson/Sparck
    * Jones with the +1 smoothing Lucene uses, public). Selection-tier
    * libm per the q74/q195 convention: fine as a ranking KEY, not
    * emitted as an oracle-compared value column. */
  private def logIdf: org.apache.spark.sql.Column = log(lit(1.0) + rawIdf)

  /** Textbook multi-term BM25 retrieval: per-term contribution
    * tf_norm · ln(1 + (n−df+0.5)/(df+0.5)), quantized to LONG
    * fixed-point (`floor(·1e9)`) BEFORE the per-doc sum so the aggregate
    * is order-free, then top `topN` by the summed score — unlike
    * [[bm25Search]]'s raw-ratio weighting this IS the standard BM25
    * document order for multi-term queries (per-term ln is monotone in
    * the ratio, but a SUM of ratios is not rank-equivalent to a sum of
    * logs). The ln is selection-tier (q74/q195 convention): it decides
    * the ranking, while the emitted value columns (`n_hit_toks`,
    * `sum_tf`, `dl`) are exact integers the oracle hash-compares;
    * `score_scaled` rides along for spec use and callers drop it from
    * gate output. Same scale story as [[bm25Search]]. */
  def bm25SearchLog(
      df: DataFrame, idCol: String, textCol: String,
      queryToks: Seq[String], topN: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryToks.nonEmpty, "bm25SearchLog: empty query")
    val stats = bm25(df, idCol, textCol, k1, b)
    stats.filter(col("tok").isin(queryToks: _*))
      .withColumn("contrib",
        floor(col("tf_norm") * logIdf * lit(1e9)).cast("long"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hit_toks"), sum(col("tf")).as("sum_tf"),
        max(col("dl")).as("dl"), sum(col("contrib")).as("score_scaled"))
      .orderBy(col("score_scaled").desc, col(idCol))
      .limit(topN)
  }

  /** Incremental persisted BM25 index, append side: tokenize ONLY the
    * batch and upsert its postings (tok, doc_id, tf) and doc lengths
    * (doc_id, dl) into the two PartStores — per-append cost ∝ batch,
    * never corpus, on the append-only path. Postings partition by
    * crc32(tok) so a query's token set prunes to its partitions at
    * search time.
    *
    * Re-append semantics: a byte-identical replay is idempotent through
    * the (tok, doc_id) upsert alone. A CONTENT UPDATE (same doc_id, new
    * text) additionally needs the old version's postings for dropped
    * tokens removed — an upsert keyed (tok, doc_id) cannot delete them,
    * and stale rows would corrupt df and the doc's term set. This method
    * detects updates (batch ids semi-joined against the doclen store,
    * partition-pruned to the batch's pindexes) and, only when any exist,
    * purges those doc_ids' prior postings via a store rewrite BEFORE the
    * upsert. Cost model, honestly: append-only batches pay one pruned
    * existence probe and never rewrite; a content-update batch pays one
    * postings-store rewrite (the old tokens live in arbitrary crc32
    * partitions, so no pruning is possible without a scan anyway) — the
    * classic token-partitioned-index update cost. Bulk re-indexing
    * should drop the part and rebuild instead.
    * Stores: `psPostings` keyed (tok, doc_id), `psDocLens` keyed
    * (doc_id), both with partitionSizeSeconds = 64 over the 0..1023
    * surrogate timestamp. */
  def bm25IndexAppend(
      psPostings: graft.storage.PartStore,
      psDocLens: graft.storage.PartStore,
      batch: DataFrame, idCol: String, textCol: String,
      modified: Long): Unit = {
    val toks = tokens(batch, idCol, textCol).filter(col("tok") =!= "")
    // ONE tokenize per append: the tf rows are pinned and BOTH stores
    // derive from them (dl = Σ tf per doc — same count(*) over the raw
    // token stream, proven by the sum-of-group-counts identity). Without
    // the pin the batch text was tokenized four times: each store()
    // executes its input twice (pindex collect + staged write), and the
    // two stores each carried their own tokenize+groupBy plan.
    val tfRows = toks.groupBy(col(idCol), col("tok"))
      .agg(count(lit(1)).as("tf")).localCheckpoint()
    // Update detection: which batch ids already have a doc length on
    // store? Prune the doclen read to the batch's own pindexes (pmod
    // 1024 div 64 mirrors the store's layout), so the probe reads only
    // the partitions this batch could collide with. Ids come from the
    // BATCH, not tfRows — a re-appended doc whose new text is empty has
    // no token rows but must still purge its stale postings.
    val batchIds = batch.select(col(idCol).cast("long").as("doc_id")).distinct()
    // ≤16 values by construction: the doclen store has 1024/64 partitions
    val batchPindexes = batchIds
      .select((pmod(col("doc_id"), lit(1024L)) / 64L).cast("long").as("pi"))
      .distinct().collect().map(_.getLong(0)).toIndexedSeq
    val reappended = psDocLens.readPart("doclen") match {
      case None => None
      case Some(dls) =>
        val hit = dls.filter(col("pindex").isin(batchPindexes: _*))
          .select(col("doc_id").cast("long").as("doc_id"))
          .join(batchIds, "doc_id")
        if (hit.isEmpty) None else Some(hit)
    }
    reappended.foreach { stale =>
      val staleIds = stale.select(col("doc_id").as("__stale_id"))
      psPostings.rewritePart("postings",
        df => df.join(staleIds,
            col("doc_id").cast("long") === col("__stale_id"), "left_anti"))
    }
    psPostings.store("postings",
      tfRows
        .select(col("tok"), col(idCol).as("doc_id"), col("tf"))
        .withColumn("timestamp", pmod(crc32(col("tok")), lit(1024L)))
        .withColumn("modified", lit(modified)))
    // the doclen batch's pindexes are exactly the batchPindexes already
    // collected for the update probe above (timestamp = pmod(id, 1024),
    // psize 64 — the same layout the probe mirrored; tfRows' ids ⊆ the
    // batch's, so the list is a safe superset): the hint saves the
    // merge-path pindex collect, one driver action per append (r19)
    psDocLens.store("doclen",
      tfRows.groupBy(col(idCol)).agg(sum(col("tf")).as("dl"))
        .select(col(idCol).as("doc_id"), col("dl"))
        .withColumn("timestamp", pmod(col("doc_id"), lit(1024L)))
        .withColumn("modified", lit(modified)),
      batchIndicesHint = Some(batchPindexes))
  }

  /** Deletion propagation through the stored index — the
    * right-to-be-forgotten purge every training-data deployment needs
    * (a takedown/opt-out list must leave DERIVED artifacts too, not just
    * the document store): physically remove `deleteIds`' rows from both
    * the postings and doclen stores. Because [[bm25SearchStoredLog]]
    * reconstructs ALL corpus statistics (df, n_docs, avgdl) at query
    * time, the purged index is byte-identical to an index freshly built
    * on the surviving corpus — deleted docs stop influencing OTHER
    * documents' scores too, which a lazy tombstone-filter at the hit
    * stage would get wrong (df/avgdl would still count the purged docs).
    *
    * Cost: one staged rewrite per store (O(index), the standard
    * tombstone-compaction shape — batch deletions and purge
    * periodically; the low-latency variant is a tombstone list
    * anti-joined at query time, traded off in the scaladoc precisely
    * because its stats go stale). Returns the number of purged doc ids
    * actually present. */
  def bm25IndexPurge(
      psPostings: graft.storage.PartStore,
      psDocLens: graft.storage.PartStore,
      deleteIds: DataFrame, idCol: String): Long = {
    val ids = deleteIds.select(col(idCol).cast("long").as("__del_id"))
      .distinct().localCheckpoint()
    val present = psDocLens.readPart("doclen") match {
      case None => 0L
      case Some(dls) => dls.join(ids,
        col("doc_id").cast("long") === col("__del_id"), "left_semi").count()
    }
    if (present > 0) {
      psPostings.rewritePart("postings",
        df => df.join(ids,
          col("doc_id").cast("long") === col("__del_id"), "left_anti"))
      psDocLens.rewritePart("doclen",
        df => df.join(ids,
          col("doc_id").cast("long") === col("__del_id"), "left_anti"))
    }
    present
  }

  /** Query side of the stored index: corpus statistics (df per query
    * token, n_docs, total tokens) reconstruct from the stores AT QUERY
    * TIME, so after any append sequence the stored search is
    * byte-identical to [[bm25Search]] over the union corpus — stats
    * never go stale. The postings scan partition-prunes to the query
    * tokens' crc32 cells (a token's postings all share one pindex);
    * scoring is the exact [[bm25Search]] fixed-point arithmetic. */
  /** Shared query side of the stored index: reconstruct corpus stats AT
    * QUERY TIME and return the scored hit rows
    * (doc_id, tok, tf, df, dl, n_docs, tf_norm) — partition-pruned to
    * the query tokens' crc32 cells. */
  private def storedHits(
      psPostings: graft.storage.PartStore,
      psDocLens: graft.storage.PartStore,
      queryToks: Seq[String], k1: Double, b: Double): DataFrame = {
    val crc = new java.util.zip.CRC32()
    val pindexes = queryToks.map { t =>
      crc.reset(); crc.update(t.getBytes("UTF-8"))
      (crc.getValue % 1024L) / 64L
    }.distinct
    val post = psPostings.readPart("postings").get
      .filter(col("pindex").isin(pindexes: _*))
      .select("tok", "doc_id", "tf")
    val dls = psDocLens.readPart("doclen").get.select("doc_id", "dl")
    val totals = dls.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).cast("long").as("__n_toks"))
    val hits = post.filter(col("tok").isin(queryToks: _*))
    val dfq = hits.groupBy("tok").agg(count(lit(1)).as("df"))
    val tfNorm = col("tf").cast("double") * lit(k1 + 1.0) /
      (col("tf").cast("double") + lit(k1) * (lit(1.0 - b) +
        lit(b) * col("dl").cast("double") /
          (col("__n_toks").cast("double") / col("n_docs").cast("double"))))
    hits.join(dfq, "tok").join(dls, "doc_id").crossJoin(broadcast(totals))
      .withColumn("tf_norm", tfNorm)
  }

  def bm25SearchStored(
      psPostings: graft.storage.PartStore,
      psDocLens: graft.storage.PartStore,
      queryToks: Seq[String], topN: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryToks.nonEmpty, "bm25SearchStored: empty query")
    storedHits(psPostings, psDocLens, queryToks, k1, b)
      .withColumn("contrib",
        floor(col("tf_norm") * rawIdf * lit(1e9)).cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hit_toks"), sum(col("contrib")).as("score_scaled"))
      .orderBy(col("score_scaled").desc, col("doc_id"))
      .limit(topN)
  }

  /** [[bm25SearchLog]] over the stored index — textbook multi-term BM25
    * ranking with query-time-reconstructed stats, byte-identical to the
    * fresh [[bm25SearchLog]] over the union corpus after any append
    * sequence. Same column contract as [[bm25SearchLog]]. */
  def bm25SearchStoredLog(
      psPostings: graft.storage.PartStore,
      psDocLens: graft.storage.PartStore,
      queryToks: Seq[String], topN: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryToks.nonEmpty, "bm25SearchStoredLog: empty query")
    storedHits(psPostings, psDocLens, queryToks, k1, b)
      .withColumn("contrib",
        floor(col("tf_norm") * logIdf * lit(1e9)).cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hit_toks"), sum(col("tf")).as("sum_tf"),
        max(col("dl")).as("dl"), sum(col("contrib")).as("score_scaled"))
      .orderBy(col("score_scaled").desc, col("doc_id"))
      .limit(topN)
  }

  /** Per-source token-budget fill: admit documents in deterministic
    * md5-shuffled order until each source's running token count reaches
    * `budget` — the "fill N billion tokens per source" step of mixture
    * construction, token-level where [[temperatureMixture]] is
    * doc-rate-level. The document that crosses the boundary is admitted
    * (budgets are floors), so every non-empty source with a positive
    * budget contributes at least one doc. Returns the admitted rows as
    * (idCol, sourceCol, n_toks, cum_toks).
    *
    * Scale: two-phase stratified cut, NOT one running-sum window per
    * source (which would serialize a source spanning most of the corpus
    * into a single task). The md5 shuffle key is split into 256
    * lexicographic strata (its first two hex chars — a prefix range, so
    * stratum order IS shuffle order); per-(source, stratum) token sums
    * are one tiny aggregate (≤ 256·|sources| rows), their running
    * prefix a ≤256-row bounded window, and only strata whose prefix
    * starts below the budget — the admitted region plus the single
    * boundary stratum — are windowed per doc. Work past the budget cut
    * is one aggregate pass, never a sort; per-source serial chains are
    * one stratum (~1/256 of the source), not the source. cum_toks is
    * exact: stratum prefix + within-stratum running sum equals the
    * global running sum in integer arithmetic. */
  def tokenBudgetFill(
      df: DataFrame, idCol: String, textCol: String, sourceCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, s"tokenBudgetFill: budget must be positive, got $budget")
    import org.apache.spark.sql.expressions.Window
    val base = tokenBudgetBase(df, idCol, textCol, sourceCol)
    // fully renamed join side: live descends from base, so a bare
    // __stratum reference would be ambiguous self-join lineage
    val live = tokenBudgetStrata(base, sourceCol, budget)
      .select(col(sourceCol).as("__src"), col("__stratum").as("__ls"), col("__pre"))
    val wIn = Window.partitionBy(col(sourceCol), col("__stratum"))
      .orderBy(col("__mk"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // null-safe source match: a NULL source is its own mixture group
    // (the window partitionBy of the one-phase form grouped it too)
    base.join(broadcast(live),
        col(sourceCol) <=> col("__src") && col("__stratum") === col("__ls"))
      .drop("__ls", "__src")
      .withColumn("cum_toks", col("__pre") + sum(col("n_toks")).over(wIn))
      .filter(col("cum_toks") - col("n_toks") < budget)
      .select(idCol, sourceCol, "n_toks", "cum_toks")
  }

  /** (id, source, n_toks, __mk, __stratum) working frame for
    * [[tokenBudgetFill]]: md5 admission key plus its 2-hex-char stratum. */
  /** Training-sequence packing, concat-then-chunk (the GPT-style packer:
    * documents concatenate into one global token stream in a fixed
    * deterministic order, the stream splits into fixed `seqLen`-token
    * training sequences, and a document may straddle a boundary). The
    * pipeline question this answers: which sequence(s) does each doc land
    * in, and how many docs cross boundaries — the packing audit run
    * before writing training shards.
    *
    * Output per doc (ordered by the packing order = idCol asc):
    * (id, n_toks, cum_before, start_seq, end_seq, crosses) with
    * start/end = the 0-based sequence indices of the doc's first/last
    * token, crosses = end > start.
    *
    * Scale: the global prefix sum is the two-pass form — range-partition
    * by id + in-partition sort, per-partition totals to the driver (ONE
    * ≤|partitions|-row control read), broadcast offsets back, in-
    * partition running sum under a window PARTITIONED by the physical
    * partition id (bounded partitions, never a global single-partition
    * window). The result is invariant to where the range boundaries land
    * — cum_before is determined by the total order alone. */
  def packSequences(
      df: DataFrame, idCol: String, textCol: String, seqLen: Long): DataFrame = {
    require(seqLen >= 1, s"packSequences: seqLen >= 1, got $seqLen")
    import org.apache.spark.sql.expressions.Window
    val sp = df.sparkSession
    val np = sp.sessionState.conf.numShufflePartitions
    val perDoc = df.select(col(idCol).cast("long").as("__id"),
        size(split(trim(col(textCol)), "\\s+")).cast("long").as("n_toks"))
      .filter(col("n_toks") > 0)
    val parted = perDoc.repartitionByRange(np, col("__id"))
      .sortWithinPartitions("__id")
      .withColumn("__pid", org.apache.spark.sql.functions.spark_partition_id())
      .localCheckpoint() // pin partition ids before the two passes below
    val partTotals = parted.groupBy("__pid").agg(sum("n_toks").as("__t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = partTotals.scanLeft((0, 0L)) { case ((_, acc), (pid, t)) =>
      (pid, acc + t) }.init.zip(partTotals).map { case ((_, off), (pid, _)) =>
      (pid, off) }
    import sp.implicits._
    val offDf = offsets.toSeq.toDF("__pid", "__off")
    val w = Window.partitionBy("__pid").orderBy("__id")
      .rowsBetween(Window.unboundedPreceding, -1)
    parted
      .withColumn("__local", coalesce(sum(col("n_toks")).over(w), lit(0L)))
      .join(broadcast(offDf), Seq("__pid"))
      .withColumn("cum_before", col("__local") + col("__off"))
      // integer div (not float-divide-then-truncate): exact at any stream
      // length, and the engine-invariant form (Spark DIV ≡ DuckDB //)
      .withColumn("start_seq", expr(s"cum_before div ${seqLen}L"))
      .withColumn("end_seq", expr(s"(cum_before + n_toks - 1) div ${seqLen}L"))
      .withColumn("crosses", col("end_seq") > col("start_seq"))
      .select(col("__id").as(idCol), col("n_toks"), col("cum_before"),
        col("start_seq"), col("end_seq"), col("crosses"))
  }

  /** Span-corruption masking audit, T5-style (Raffel et al. 2020 §3.1.4
    * corrupt ~15% of tokens in short contiguous spans), made
    * deterministic and relational by BLOCKED span placement: positions
    * partition into `blockSize`-token blocks, each block masks one
    * `spanLen`-token span starting at its md5-minimal position (clipped
    * at block and document end) — non-overlap is guaranteed by block
    * disjointness instead of a sequential greedy scan, so the mask is a
    * pure function of (id, pos) any engine replays bit-for-bit. With the
    * 3/20 defaults the corruption rate is ~15% away from tails.
    *
    * Returns per doc: (id, n_tokens, n_spans, n_masked, mask_bp) with
    * mask_bp the integer basis-point corruption rate. Scale: one token
    * scan, one (doc, block) aggregate, one equi-join back on the md5 key,
    * a ≤spanLen explode — map-side shapes only, no window. */
  def spanCorruptionStats(
      df: DataFrame, idCol: String, textCol: String,
      blockSize: Int = 20, spanLen: Int = 3): DataFrame = {
    require(blockSize >= 1 && spanLen >= 1 && spanLen <= blockSize,
      s"spanCorruptionStats: need 1 <= spanLen <= blockSize, got $spanLen/$blockSize")
    val toks = tokens(df, idCol, textCol).filter(col("tok") =!= "")
      .select(col(idCol), col("pos"),
        md5(concat(lit("mask:"), col(idCol).cast("string"), lit(":"),
          col("pos").cast("string"))).as("__mk"))
    val sizes = toks.groupBy(col(idCol)).agg(count(lit(1)).as("n_tokens"))
    val withBlock = toks.withColumn("__blk", expr(s"pos div $blockSize"))
    val starts = withBlock.groupBy(col(idCol), col("__blk"))
      .agg(min(col("__mk")).as("__mk"))
      .join(withBlock, Seq(idCol, "__blk", "__mk"))
    val masked = starts
      .join(sizes, Seq(idCol))
      .select(col(idCol), col("__blk"),
        explode(sequence(col("pos"),
          least(col("pos") + (spanLen - 1),
            (col("__blk") + 1) * blockSize - 1,
            col("n_tokens") - 1))).as("__mp"))
    val perDoc = masked.groupBy(col(idCol))
      .agg(countDistinct(col("__blk")).as("n_spans"),
        count(lit(1)).as("n_masked"))
    sizes.join(perDoc, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_masked"), lit(0L)).as("n_masked"))
      .withColumn("mask_bp", expr("(n_masked * 10000) div n_tokens"))
  }

  /** Bigram language-model statistics with Kneser-Ney pieces (Kneser &
    * Ney 1995; Chen & Goodman 1998 §2.7, public): per bigram the raw
    * count, the left/right CONTINUATION counts (|distinct contexts|, the
    * quantity KN backs off to instead of raw unigram frequency), and the
    * absolute-discount numerator max(c − D, 0) with the fixed rational
    * D = 3/4 carried as the integer 4c − 3 (the q74 convention: exact
    * integer pieces in the gate, the float probability assembled
    * downstream). The n-gram LM is the classic data-quality scorer and
    * the KN pieces are what a trainer shards.
    *
    * Scale: per-doc adjacency via a doc-keyed window (bounded by doc
    * length), then three map-side-combined aggregates (bigram counts,
    * left contexts, right contexts) and bounded top-K selection. */
  def bigramKneserNey(
      df: DataFrame, idCol: String, textCol: String, topK: Int = 50): DataFrame = {
    require(topK >= 1, s"bigramKneserNey: topK >= 1, got $topK")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(idCol)).orderBy("pos")
    val bi = tokens(df, idCol, textCol).filter(col("tok") =!= "")
      .withColumn("nxt", lead(col("tok"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .select(col("tok").as("w1"), col("nxt").as("w2"))
    val counts = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val contRight = counts.groupBy("w2")
      .agg(count(lit(1)).as("cont_right")) // |{w1 : c(w1,w2) > 0}|
    val contLeft = counts.groupBy("w1")
      .agg(count(lit(1)).as("cont_left"))  // |{w2 : c(w1,w2) > 0}|
    counts
      .orderBy(col("c").desc, col("w1"), col("w2")).limit(topK)
      .join(contRight, "w2").join(contLeft, "w1")
      .withColumn("disc_num4", greatest(col("c") * 4 - 3, lit(0L)))
      .select(col("w1"), col("w2"), col("c"), col("cont_left"),
        col("cont_right"), col("disc_num4"))
  }

  /** First-occurrence n-gram novelty per document: how much of a doc's
    * n-gram vocabulary is NEW to the corpus (its grams' minimum doc id is
    * this doc) vs recycled from earlier documents — the memorization /
    * boilerplate profile a corpus report keys on. Reports per-doc gram
    * occurrences, novel occurrences, distinct grams, novel distinct
    * grams, and the integer basis-point novelty rate.
    *
    * Scale: grams from a doc-keyed lead window (bounded by doc length),
    * first-occurrence via ONE gram-keyed aggregate (map-side combined),
    * one join back; no all-pairs, no global window. */
  def gramNovelty(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    require(n >= 2, s"gramNovelty: n >= 2, got $n")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val parts = (0 until n).map {
      case 0 => col("tok")
      case i => lead(col("tok"), i).over(w)
    }
    val occ = tokens(df, idCol, textCol).filter(col("tok") =!= "")
      .select(col(idCol), col("pos"), concat_ws(" ", parts: _*).as("g"),
        lead(col("tok"), n - 1).over(w).isNotNull.as("__full"))
      .filter(col("__full")).drop("__full")
    val firstDoc = occ.groupBy("g").agg(min(col(idCol)).as("first_doc"))
    val novel = col("first_doc") === col(idCol)
    val per = occ.join(firstDoc, "g")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(novel, 1L).otherwise(0L)).as("n_novel_occ"),
        countDistinct(col("g")).as("n_distinct"),
        countDistinct(when(novel, col("g"))).as("n_novel"))
    df.select(col(idCol)).distinct()
      .join(per, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_novel_occ"), lit(0L)).as("n_novel_occ"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"))
      .withColumn("novelty_bp",
        when(col("n_distinct") === 0L, 0L)
          .otherwise(expr("10000 * n_novel DIV n_distinct")))
  }

  /** Incremental [[gramNovelty]] against a persisted gram registry: the
    * production shape, where each arriving batch is scored for novelty
    * vs EVERYTHING ingested so far and the registry grows by the batch's
    * new grams. Registry rows are (digest, first_doc) — insert-missing
    * only (a gram's first owner never changes), so the per-batch cost is
    * batch grams + the probed registry partitions, never the corpus.
    * With batches arriving in ascending id order, the union of all
    * batches' outputs equals the one-shot [[gramNovelty]] run (the gate
    * oracle certifies exactly that).
    *
    * Configure the store with `keyCols = Seq("digest")` and
    * partitionSizeSeconds = 64 over the crc32(digest) mod 1024 surrogate
    * timestamp (16 partitions). Evaluate the returned frame (e.g.
    * localCheckpoint) before the next append rewrites the part. */
  def gramNoveltyAppend(
      store: graft.storage.PartStore, part: String,
      batch: DataFrame, idCol: String, textCol: String, n: Int,
      modified: Long): DataFrame = {
    require(store.config.keyCols == Seq("digest"),
      "gramNoveltyAppend: store must be keyed by digest " +
        s"(keyCols = Seq(\"digest\")), got ${store.config.keyCols}")
    // first_doc is stored as LONG; a string/UUID id would hit the ANSI
    // cast deep inside a job — refuse loudly, like exactIncremental
    locally {
      import org.apache.spark.sql.types._
      val t = batch.schema(idCol).dataType
      require(Set[DataType](ByteType, ShortType, IntegerType, LongType)(t),
        s"gramNoveltyAppend: id column '$idCol' must be integral, " +
          s"got ${t.simpleString}")
    }
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val parts = (0 until n).map {
      case 0 => col("tok")
      case i => lead(col("tok"), i).over(w)
    }
    val occ = tokens(batch, idCol, textCol).filter(col("tok") =!= "")
      .select(col(idCol), concat_ws(" ", parts: _*).as("g"),
        lead(col("tok"), n - 1).over(w).isNotNull.as("__full"))
      .filter(col("__full"))
      .select(col(idCol), md5(col("g")).as("digest"))
      .localCheckpoint() // feeds the registry upsert AND the scoring join
    val batchGrams = occ.groupBy("digest")
      .agg(min(col(idCol).cast("long")).as("first_doc"))
      .withColumn("timestamp", pmod(crc32(col("digest")), lit(1024L)))
      .localCheckpoint() // probe-pindex read + anti-join + empty fallback
    // prune both registry reads to the batch's own pindexes (crc32 mod
    // 1024 div psize mirrors the store layout) — ≤ 1024/psize values, the
    // sibling incremental APIs' bounded control read; a batch's digests
    // can only collide inside these partitions
    val psize = store.config.partitionSizeSeconds
    val batchPindexes = batchGrams
      .select((col("timestamp") / psize).cast("long").as("pi"))
      .distinct().collect().map(_.getLong(0)).toIndexedSeq
    def pruned(df: DataFrame): DataFrame =
      df.filter(col("pindex").isin(batchPindexes: _*))
    val fresh = store.readPart(part) match {
      case None => batchGrams
      case Some(ex) =>
        batchGrams.join(pruned(ex).select("digest"), Seq("digest"), "left_anti")
    }
    store.store(part, fresh.withColumn("modified", lit(modified)))
    // score against the post-append registry (empty batch → no partitions
    // yet; novelty of nothing is the empty frame either way)
    val state = store.readPart(part)
      .map(ex => pruned(ex).select(col("digest"), col("first_doc")))
      .getOrElse(batchGrams.select("digest", "first_doc").limit(0))
    val novel = col("first_doc") === col(idCol).cast("long")
    val per = occ.join(state, "digest")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(novel, 1L).otherwise(0L)).as("n_novel_occ"),
        countDistinct(col("digest")).as("n_distinct"),
        countDistinct(when(novel, col("digest"))).as("n_novel"))
    batch.select(col(idCol)).distinct()
      .join(per, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_novel_occ"), lit(0L)).as("n_novel_occ"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"))
      .withColumn("novelty_bp",
        when(col("n_distinct") === 0L, 0L)
          .otherwise(expr("10000 * n_novel DIV n_distinct")))
  }

  /** Bigram language-model scoring (the exact-count core of a CCNet-style
    * perplexity filter): train bigram/unigram tables on `trainDf`, then
    * classify every adjacent pair of a scored doc as SEEN (bigram in the
    * LM), BACKOFF (unseen bigram, successor in the train vocabulary) or
    * OOV (successor unseen) — plus the integer basis-point seen rate.
    * The float log-prob sum stays spec-territory per the ln convention;
    * these counts are the engine-invariant selection signal.
    *
    * Scale: the LM sides are two map-side-combined aggregates; scoring is
    * two key joins (bigram, unigram) — broadcast-able when the LM is
    * small, shuffle joins otherwise. No windows beyond the doc-keyed
    * adjacency lead. */
  def bigramLmScore(
      trainDf: DataFrame, scoreDf: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def bigrams(d: DataFrame): DataFrame = {
      val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      tokens(d, idCol, textCol).filter(col("tok") =!= "")
        .withColumn("w2", lead(col("tok"), 1).over(w))
        .filter(col("w2").isNotNull)
        .select(col(idCol), col("tok").as("w1"), col("w2"))
    }
    val lmBi = bigrams(trainDf).groupBy("w1", "w2").agg(lit(1).as("__in_lm"))
    val lmUni = tokens(trainDf, idCol, textCol).filter(col("tok") =!= "")
      .select(col("tok").as("w2")).distinct().withColumn("__in_vocab", lit(1))
    val per = bigrams(scoreDf)
      .join(lmBi, Seq("w1", "w2"), "left")
      .join(lmUni, Seq("w2"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("__in_lm").isNotNull, 1L).otherwise(0L)).as("n_seen"),
        sum(when(col("__in_lm").isNull && col("__in_vocab").isNotNull, 1L)
          .otherwise(0L)).as("n_backoff"),
        sum(when(col("__in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
    per.withColumn("seen_bp",
      when(col("n_bigrams") === 0L, 0L)
        .otherwise(expr("10000 * n_seen DIV n_bigrams")))
  }

  /** Chat-history truncation (the SFT-pipeline context-window op): each
    * doc's token stream splits into synthetic turns — turn t carries
    * 3 + (id + t) mod 5 tokens (the last turn partial) — every turn
    * costs its tokens + 2 template tokens, and the kept window is the
    * maximal SUFFIX of turns whose total cost fits `budget` (keep the
    * most recent history, drop the oldest). Reports per-doc turn/token
    * counts and what survived.
    *
    * Scale: the turn table is a constant-fanout explode (≤ maxTurns rows
    * per doc) with doc-keyed prefix/suffix windows — bounded state,
    * no global ordering anywhere. */
  def turnTruncate(
      df: DataFrame, idCol: String, textCol: String, budget: Long,
      maxTurns: Int = 64): DataFrame = {
    // turn lengths key off (id + t) mod 5 — a non-numeric id would hit
    // the ANSI cast inside pmod; refuse loudly
    locally {
      import org.apache.spark.sql.types._
      val t = df.schema(idCol).dataType
      require(Set[DataType](ByteType, ShortType, IntegerType, LongType)(t),
        s"turnTruncate: id column '$idCol' must be integral, got ${t.simpleString}")
    }
    import org.apache.spark.sql.expressions.Window
    val nTok = tokens(df, idCol, textCol).filter(col("tok") =!= "")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_tokens"))
      .localCheckpoint() // reused by the coverage probe below
    // a doc needing more than maxTurns turns would silently UNDERCOUNT
    // (turns beyond the explode bound never materialize) — refuse loudly
    // instead; one ≤1-row control read, the repo's bounded-collect shape
    val maxNeed = locally {
      val r = nTok.agg(max(col("n_tokens"))).collect()(0)
      if (r.isNullAt(0)) 0L else r.getLong(0) // empty corpus → no turns
    }
    require(maxNeed <= 3L * maxTurns,
      s"turnTruncate: a ${maxNeed}-token doc can need up to " +
        s"ceil($maxNeed/3) turns > maxTurns = $maxTurns — raise maxTurns")
    val wPre = Window.partitionBy(col(idCol)).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wSuf = Window.partitionBy(col(idCol)).orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    nTok
      .withColumn("t", explode(sequence(lit(0L), lit(maxTurns.toLong - 1))))
      .withColumn("len_t", lit(3L) + pmod(col(idCol) + col("t"), lit(5L)))
      .withColumn("start", coalesce(sum(col("len_t")).over(wPre), lit(0L)))
      .filter(col("start") < col("n_tokens"))
      .withColumn("turn_tokens", least(col("len_t"), col("n_tokens") - col("start")))
      .withColumn("cost", col("turn_tokens") + 2L)
      .withColumn("suffix_cost", sum(col("cost")).over(wSuf))
      .groupBy(col(idCol))
      .agg(max(col("n_tokens")).as("n_tokens"),
        count(lit(1)).as("n_turns"),
        sum(when(col("suffix_cost") <= budget, 1L).otherwise(0L)).as("kept_turns"),
        sum(when(col("suffix_cost") <= budget, col("turn_tokens")).otherwise(0L))
          .as("kept_tokens"),
        sum(when(col("suffix_cost") <= budget, col("cost")).otherwise(0L))
          .as("kept_cost"))
  }

  private def tokenBudgetBase(
      df: DataFrame, idCol: String, textCol: String, sourceCol: String): DataFrame = {
    val nToks = size(split(trim(col(textCol)), "\\s+")).cast("long")
    val mk = md5(concat(lit("budget:"), col(idCol).cast("string")))
    df.select(col(idCol), col(sourceCol), nToks.as("n_toks"), mk.as("__mk"))
      .withColumn("__stratum", substring(col("__mk"), 1, 2))
  }

  /** Per-(source, stratum) token sums with the running prefix BEFORE
    * each stratum, filtered to strata that can admit at least one doc
    * (first doc's cum-before = __pre, so __pre < budget). ≤ 256 rows
    * per source before the filter; the filter is the scale cut — docs
    * in dead strata are never sorted or windowed. Exposed for the spec
    * that bounds the windowed fraction. */
  private[graft] def tokenBudgetStrata(
      base: DataFrame, sourceCol: String, budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wPre = Window.partitionBy(sourceCol).orderBy("__stratum")
      .rowsBetween(Window.unboundedPreceding, -1) // ≤256-row partitions
    base.groupBy(col(sourceCol), col("__stratum"))
      .agg(sum("n_toks").as("__ssum"))
      .withColumn("__pre", coalesce(sum(col("__ssum")).over(wPre), lit(0L)))
      .filter(col("__pre") < budget)
  }

  /** Classifier-based quality filtering plumbing — the fastText-style
    * linear-classifier pass of GPT-3/LLaMA-era pipelines (public
    * practice: score every doc with a trained model, keep positives).
    * score = Σ_b count(doc, b) · weights(b) + bias over the hashed
    * bag-of-words buckets; `keep` = logit > 0. The decision lives in
    * LOGIT space deliberately: no exp()/sigmoid means no libm in the
    * gate. `weights` is any |dim|-bounded vector (a trained model drops
    * in as data; this container has none, so gates use a deterministic
    * synthetic vector — the hashing, broadcast model join, ordered fold,
    * and thresholding are the real, tested plumbing).
    *
    * Scale: one (doc, bucket) count aggregate, a broadcast ≤dim-row model
    * join, and a per-doc bounded ordered fold (≤dim entries) — the same
    * shape as [[dsirWeights]]; corpus touched once. */
  def linearScore(
      df: DataFrame, idCol: String, textCol: String,
      weights: Seq[Double], bias: Double): DataFrame = {
    val dim = weights.length
    require(dim > 0, "linearScore: empty weight vector")
    val t = tokens(df, idCol, textCol).filter(col("tok") =!= "")
      .select(col(idCol), tokBucket(dim).as("__b"))
    val spark = df.sparkSession
    import spark.implicits._
    val model = weights.zipWithIndex.map { case (w, b) => (b.toLong, w) }
      .toDF("__b", "__w")
    t.groupBy(col(idCol), col("__b")).agg(count(lit(1)).as("__c"))
      .join(broadcast(model), "__b")
      .groupBy(col(idCol)).agg(
        sum("__c").as("n_feats"),
        array_sort(collect_list(struct(col("__b"), col("__c"), col("__w"))))
          .as("__arr"))
      .select(col(idCol), col("n_feats"),
        (aggregate(col("__arr"), lit(0.0),
          (acc, x) => acc + x.getField("__c") * x.getField("__w")) + lit(bias))
          .as("logit"))
      .withColumn("keep", col("logit") > 0)
  }

  /** Calibration bins for a scored binary task (the reliability-diagram
    * table behind ECE, Guo et al. 2017 / DeGroot & Fienberg): scores
    * bucket into `nBins` fixed-width bins over [lo, hi) (clamped), each
    * bin reporting exact integers — count, positives, and the
    * fixed-point score sum (floor(score·2²⁴+0.5) BIGINT — the
    * deterministic-sum convention). acc−conf gaps and the ECE weighted
    * sum are one driver-side division away; the exact pieces are the
    * gate surface. */
  def calibrationBins(
      scored: DataFrame, idCol: String, scoreCol: String, labelCol: String,
      nBins: Int, lo: Double, hi: Double): DataFrame = {
    require(nBins >= 1 && hi > lo,
      s"calibrationBins: nBins >= 1 and hi > lo, got $nBins, [$lo, $hi)")
    val width = (hi - lo) / nBins
    val bin = least(greatest(
      floor((col(scoreCol) - lo) / width).cast("long"), lit(0L)),
      lit((nBins - 1).toLong))
    scored.select(col(idCol), col(scoreCol), col(labelCol).cast("long").as("__y"))
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col("__y")).as("n_pos"),
        sum(floor(col(scoreCol) * (1L << 24) + 0.5).cast("long"))
          .as("score_fp_sum"))
  }

  /** TextTiling-style topic-boundary scores (Hearst 1997, the block-
    * comparison form, integerized): each doc splits into fixed
    * `blockSize`-token blocks; the score at boundary b = |distinct-token
    * overlap| between block b and block b+1 — low overlap suggests a
    * topic shift, and a boundary is flagged when its overlap is a
    * STRICT local minimum against both neighbors (interior boundaries
    * only). All exact integers; per-doc keyed windows over ≤ blocks
    * rows. Output: (doc, boundary, overlap, left/right block sizes,
    * is_boundary). */
  def textTileBoundaries(
      df: DataFrame, idCol: String, textCol: String,
      blockSize: Int = 10): DataFrame = {
    require(blockSize >= 1, s"textTileBoundaries: blockSize >= 1")
    import org.apache.spark.sql.expressions.Window
    val blocks = tokens(df, idCol, textCol).filter(col("tok") =!= "")
      .withColumn("blk", expr(s"pos DIV $blockSize"))
      .select(col(idCol).as("doc_id"), col("blk"), col("tok"))
      .distinct() // block-level token SETS
      .localCheckpoint() // both join sides
    val overlaps = blocks.as("a")
      .join(blocks.as("b"),
        col("a.doc_id") === col("b.doc_id") &&
          col("b.blk") === col("a.blk") + 1 &&
          col("a.tok") === col("b.tok"))
      .groupBy(col("a.doc_id").as("doc_id"), col("a.blk").as("boundary"))
      .agg(count(lit(1)).as("overlap"))
    val sizes = blocks.groupBy("doc_id", "blk")
      .agg(count(lit(1)).as("__n"))
    // every adjacent block pair is a boundary, overlap 0 when disjoint
    val all = sizes.as("l")
      .join(sizes.as("r"),
        col("l.doc_id") === col("r.doc_id") &&
          col("r.blk") === col("l.blk") + 1)
      .select(col("l.doc_id").as("doc_id"), col("l.blk").as("boundary"),
        col("l.__n").as("left_toks"), col("r.__n").as("right_toks"))
      .join(overlaps, Seq("doc_id", "boundary"), "left")
      .withColumn("overlap", coalesce(col("overlap"), lit(0L)))
    val w = Window.partitionBy("doc_id").orderBy("boundary")
    all
      .withColumn("__prev", lag(col("overlap"), 1).over(w))
      .withColumn("__next", lead(col("overlap"), 1).over(w))
      .withColumn("is_boundary",
        col("__prev").isNotNull && col("__next").isNotNull &&
          col("overlap") < col("__prev") && col("overlap") < col("__next"))
      .drop("__prev", "__next")
  }

  /** Quota rebalancing: take the md5-first `floor(total · bp / 10000)`
    * docs of each group so the sample matches a TARGET composition
    * (the "make this corpus look like the reference mixture" op —
    * upsampling is [[materializeTemperatureSample]]'s job; this is the
    * exact-quota downsampling face). Admission order inside a group is
    * md5(id) — append-stable and engine-replayable; groups short of
    * quota contribute everything they have. Per-group rank via
    * [[Ranks.rankWithinGroup]] — no per-group window. */
  def quotaSample(
      df: DataFrame, idCol: String, groupCol: String,
      targetBp: Map[String, Long]): DataFrame = {
    require(targetBp.nonEmpty, "quotaSample: empty target")
    val spark = df.sparkSession
    import spark.implicits._
    val total = df.count() // one driver scalar — the quota base
    val quotas = targetBp.toSeq.toDF(groupCol, "__bp")
      .withColumn("__quota", expr(s"($total * __bp) DIV 10000"))
    val base = df.select(col(idCol).cast("long").as("__id"),
        col(groupCol))
      .withColumn("__mk", md5(concat(lit("quota:"), col("__id").cast("string"))))
    Ranks.rankWithinGroup(base, Seq(groupCol), Seq("__mk", "__id"))
      .join(broadcast(quotas), groupCol)
      .filter(col("__gr") <= col("__quota"))
      .select(col("__id").as(idCol), col(groupCol),
        col("__gr").as("rank_in_group"), col("__quota").as("quota"))
  }

  /** Count-Min sketch (Cormode & Muthukrishnan 2005, public): `d`
    * independent hash rows of `w` counters each — the bounded-memory
    * frequency summary behind heavy-hitter stats (vocab counts, hot
    * domains, frequent shingles) when exact counting's state would be the
    * corpus' distinct-key cardinality. The sketch is ONE map-side-combined
    * aggregate with ≤ d·w output rows regardless of corpus size; hashes
    * are the md5-prefix family every oracle-shared operator here uses, so
    * the sketch (and every estimate read from it) is bit-identical on any
    * engine and any partitioning.
    *
    * Returns (row, bucket, cnt) with one row per NON-EMPTY counter. */
  def cmsSketch(
      df: DataFrame, keyCol: String, d: Int = 4, w: Int = 256): DataFrame = {
    require(d >= 1 && d <= 16, s"cmsSketch: d $d outside [1, 16]")
    require(w >= 2, s"cmsSketch: w $w < 2")
    val rows = explode(sequence(lit(0), lit(d - 1))).as("row")
    df.select(col(keyCol).as("__k"))
      .select(col("__k"), rows)
      .select(col("row"),
        pmod(conv(substring(md5(concat(col("row").cast("string"), lit(":"),
          col("__k"))), 1, 13), 16, 10).cast("long"), lit(w.toLong))
          .as("bucket"))
      .groupBy("row", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates from a [[cmsSketch]]: for each candidate key, the
    * MINIMUM of its d counters — an overestimate by at most the collision
    * mass (ε ≈ e/w of the stream length with probability 1 − e^−d; the
    * classic CMS guarantee). `keys` is the candidate frame (e.g. distinct
    * keys of a sample, or a domain whitelist); the sketch side is ≤ d·w
    * rows and broadcast, so estimation is a map-side join at any scale.
    * Missing counters read as 0 (a key hashing only to empty counters was
    * never seen). Returns `keys` + (est_count). */
  def cmsEstimate(
      keys: DataFrame, keyCol: String, sketch: DataFrame, d: Int = 4,
      w: Int = 256): DataFrame = {
    val hashed = keys
      .select(col(keyCol), explode(sequence(lit(0), lit(d - 1))).as("row"))
      .select(col(keyCol), col("row"),
        pmod(conv(substring(md5(concat(col("row").cast("string"), lit(":"),
          col(keyCol))), 1, 13), 16, 10).cast("long"), lit(w.toLong))
          .as("bucket"))
    hashed.join(broadcast(sketch), Seq("row", "bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_count"))
  }

  /** DSIR-style importance weights (Xie et al. 2023 "Data Selection for
    * Language Models via Importance Resampling", public): hashed token
    * features, per-feature probabilities under a TARGET corpus vs the RAW
    * corpus (add-one smoothing over the `buckets`-sized hashed domain), and
    * a per-document importance weight Σ c_f·(ln p_target(f) − ln p_raw(f)).
    * Documents with high weight look like the target distribution —
    * resample the raw corpus by it ([[stratifiedSample]]-style) to shift
    * the mixture.
    *
    * Gate-exact columns: `n_feats`, `sum_pt`, `sum_pr` (sorted-order
    * rational folds — one IEEE division per probability, engine-identical
    * like [[charLmScore]]); `logw` adds `ln`, whose last ULP is
    * libm-specific — spec-tested, not oracle-hashed.
    *
    * Scale shape: both feature-count tables are ≤ `buckets` rows after a
    * map-side-combined aggregate and BROADCAST into the per-doc scoring
    * join; the only corpus-sized shuffle is the (id, bucket) count. The
    * target corpus is typically benchmark-sized, the raw corpus is the
    * 100 TB side — both stream. */
  def dsirWeights(
      raw: DataFrame, target: DataFrame, idCol: String,
      buckets: Int = 64): DataFrame = {
    def bucket(t: DataFrame): DataFrame =
      t.select(col(idCol), tokBucket(buckets).as("__b"))
    val rawF = bucket(raw)
    val tgtCounts = bucket(target).groupBy("__b").agg(count(lit(1)).as("__ct"))
    val rawCounts = rawF.groupBy("__b").agg(count(lit(1)).as("__cr"))
    // complete hashed domain so unseen buckets get the smoothed floor;
    // corpus totals ride in as a broadcast 1-row frame (no driver action)
    val dom = rawF.sparkSession.range(buckets).select(col("id").as("__b"))
    val tots = tgtCounts.agg(coalesce(sum("__ct"), lit(0L)).as("__nt"))
      .crossJoin(rawCounts.agg(coalesce(sum("__cr"), lit(0L)).as("__nr")))
    val model = dom
      .join(tgtCounts, Seq("__b"), "left")
      .join(rawCounts, Seq("__b"), "left")
      .crossJoin(broadcast(tots))
      .select(col("__b"),
        ((coalesce(col("__ct"), lit(0L)) + 1).cast("double") /
          (col("__nt").cast("double") + buckets)).as("__pt"),
        ((coalesce(col("__cr"), lit(0L)) + 1).cast("double") /
          (col("__nr").cast("double") + buckets)).as("__pr"))
    val docCounts = rawF.groupBy(col(idCol), col("__b"))
      .agg(count(lit(1)).as("__c"))
    // every raw token row lands in a model bucket (complete domain), so
    // perDoc's key set IS the raw doc universe — no universe re-join needed
    docCounts
      .join(broadcast(model), "__b")
      .groupBy(col(idCol)).agg(
        sum("__c").as("n_feats"),
        array_sort(collect_list(struct(col("__b"), col("__c"), col("__pt"),
          col("__pr")))).as("__arr"))
      .select(col(idCol), col("n_feats"),
        aggregate(col("__arr"), lit(0.0),
          (acc, x) => acc + x.getField("__c") * x.getField("__pt")).as("sum_pt"),
        aggregate(col("__arr"), lit(0.0),
          (acc, x) => acc + x.getField("__c") * x.getField("__pr")).as("sum_pr"),
        aggregate(col("__arr"), lit(0.0),
          (acc, x) => acc + x.getField("__c") *
            (log(x.getField("__pt")) - log(x.getField("__pr")))).as("logw"))
  }

  /** Incremental vocabulary tracking (Heaps-law monitoring — "is the
    * corpus still contributing new types, or are we scraping
    * duplicates?"): the store holds one row per token TYPE ever seen
    * (keyed tok, crc32-spread partitions like the postings store); each
    * append anti-joins the batch's distinct types against the store,
    * inserts only the NEW ones, and reports the batch's occurrence /
    * type / new-type counts. Per-append cost ∝ batch vocabulary; the
    * store grows with the vocabulary, never the corpus. Replaying the
    * same batch inserts nothing (idempotent, like the digest store). */
  /** nDCG@k over an integer-graded judgment set (Järvelin & Kekäläinen
    * 2002 — the retrieval-eval metric q284's P@10/MRR family lacked):
    * DCG@k = Σ_{i≤k} gain(doc at rank i) / log2(i + 1), normalized by
    * the ideal DCG of the k largest judged gains. Output: one row per
    * rank 1..k with EXACT integer columns (rnk, doc id, gain,
    * ideal_gain) — the gate-compared surface — plus `ndcg_scaled` =
    * floor(nDCG · 1e9), the libm-log quotient, which per the q74/q235
    * fixed-point-ln convention is spec-tested and DROPPED from oracle
    * comparison. `ranked` carries (idCol, rnk) with rnk 1-based and a
    * strict permutation; `judgments` carries (idCol, gain ≥ 0) with
    * unique ids — unjudged retrieved docs gain 0. Ideal ranks come from
    * [[Ranks.globalDenseRank]] over (−gain, id) (a permutation — no
    * global window). */
  def ndcgAtK(
      ranked: DataFrame, judgments: DataFrame, idCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"ndcgAtK: k >= 1, got $k")
    val top = ranked.filter(col("rnk") <= k)
      .join(judgments.select(col(idCol), col("gain")), Seq(idCol), "left")
      .select(col("rnk"), col(idCol),
        coalesce(col("gain"), lit(0L)).as("gain"))
    val ideal = Ranks.globalDenseRank(
        judgments.select((-col("gain")).as("ng"), col(idCol).as("__i")),
        Seq("ng", "__i"))
      .filter(col("__r") <= k)
      .select(col("__r").as("rnk"), (-col("ng")).cast("long").as("ideal_gain"))
    val rows = top.join(ideal, Seq("rnk"), "left")
      .withColumn("ideal_gain", coalesce(col("ideal_gain"), lit(0L)))
      .localCheckpoint() // feeds both the output and the scalar below
    // 1-row broadcast scalar (the repo's bounded-crossJoin pattern)
    val scalar = rows.agg(
        sum(col("gain") / log2(col("rnk") + 1)).as("__dcg"),
        sum(col("ideal_gain") / log2(col("rnk") + 1)).as("__idcg"))
      .select(when(col("__idcg") > 0,
          floor(col("__dcg") / col("__idcg") * lit(1e9)).cast("long"))
        .otherwise(lit(0L)).as("ndcg_scaled"))
    rows.crossJoin(broadcast(scalar))
      .select(col("rnk"), col(idCol), col("gain"), col("ideal_gain"),
        col("ndcg_scaled"))
  }

  /** Zipf rank-frequency diagnostics in power-of-two rank buckets (the
    * corpus-health curve: under Zipf's law each doubling of rank holds
    * roughly constant total mass, so a healthy crawl shows a flat
    * `sum_freq` profile and boilerplate/duplication shows head spikes).
    * Ranks come from [[Ranks.globalDenseRank]] over (freq DESC, token) —
    * never a single-partition window — and the bucket is the EXACT
    * integer ⌊log₂ rank⌋ (bit-length arithmetic, no float log near a
    * boundary). Output per bucket: distinct types, total occurrences,
    * and the bucket's min/max rank — all exact integers at any corpus
    * size. */
  def zipfBuckets(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val freqs = tokens(df, idCol, textCol).filter(col("tok") =!= "")
      .groupBy("tok").agg(count(lit(1)).as("freq"))
    val ranked = graft.functions.Ranks.globalDenseRank(
      freqs.select((-col("freq")).as("nf"), col("tok"), col("freq")),
      Seq("nf", "tok"))
    ranked
      .withColumn("bucket", (length(expr("bin(__r)")) - 1).cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_types"), sum("freq").as("sum_freq"),
        min("__r").as("min_rank"), max("__r").as("max_rank"))
  }

  /** Cohen's κ inter-annotator agreement over two label columns (Cohen
    * 1960, public standard — the label-quality audit a human-annotated
    * or LLM-judged training set needs before its labels are trusted):
    * the confusion matrix plus the EXACT rational
    * κ = (N·Σdiag − Σ_k r_k·c_k) / (N² − Σ_k r_k·c_k), emitted
    * fixed-point ×1e9. All arithmetic is integer: counts, the marginal
    * products, and a sign-split magnitude division (trunc = floor on the
    * nonnegative magnitude, so any engine agrees even for κ < 0). The
    * ×1e9 scaled division runs in DECIMAL(38,0): knum/kden are Θ(N²), so
    * a 64-bit 1e9·knum would wrap (non-ANSI, silently) from N ≈ 1e5 while
    * the DuckDB oracle's HUGEINT stayed exact — decimal keeps both
    * engines exact to N ≈ 3·10⁹ (where N·Σdiag itself leaves 64-bit; a
    * corpus past that audits per stratum, the useful granularity anyway);
    * the confusion cells themselves are exact at any N.
    *
    * Output: one row per confusion cell (a, b, n) with the scalars
    * (n_total, n_agree, kappa_scaled) broadcast onto every row (the
    * bounded-crossJoin scalar pattern — label domains are enumerable, so
    * the matrix is control-plane-sized). Scale shape: ONE map-side-
    * combined aggregate over the corpus; everything after is
    * matrix-sized. */
  def cohenKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cm = df.groupBy(col(aCol).cast("long").as("a"),
        col(bCol).cast("long").as("b"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint() // feeds the cells and all three scalar aggregates
    val rk = cm.groupBy("a").agg(sum("n").as("__r"))
    val ck = cm.groupBy("b").agg(sum("n").as("__c"))
    val pe = rk.join(ck, rk("a") === ck("b"))
      .agg(coalesce(sum(col("__r") * col("__c")), lit(0L)).as("__pe"))
    val scalar = cm
      .agg(sum("n").as("__n"),
        sum(when(col("a") === col("b"), col("n")).otherwise(lit(0L)))
          .as("__agree"))
      .crossJoin(pe)
      .withColumn("__knum", col("__n") * col("__agree") - col("__pe"))
      .withColumn("__kden", col("__n") * col("__n") - col("__pe"))
      .select(col("__n"), col("__agree"),
        when(col("__kden") === 0, lit(0L)) // degenerate: one label only
          .when(col("__knum") >= 0, expr(
            "CAST((CAST(__knum AS DECIMAL(38,0)) * 1000000000)" +
              " DIV CAST(__kden AS DECIMAL(38,0)) AS BIGINT)"))
          .otherwise(-expr(
            "CAST((CAST(-__knum AS DECIMAL(38,0)) * 1000000000)" +
              " DIV CAST(__kden AS DECIMAL(38,0)) AS BIGINT)"))
          .as("kappa_scaled"))
    cm.crossJoin(broadcast(scalar))
      .select(col("a"), col("b"), col("n"),
        col("__n").as("n_total"), col("__agree").as("n_agree"),
        col("kappa_scaled"))
  }

  /** BLEU-style modified n-gram precision per (candidate, reference)
    * pair (Papineni et al. 2002 §2.1): for each n, clipped matches =
    * Σ_g min(count_cand(g), count_ref(g)) over the candidate's n-grams,
    * total = candidate n-gram count. Emits EXACT integers only —
    * lengths (the brevity-penalty inputs), clipped/total per n, and
    * basis-point precisions via integer division; the exp/log BLEU
    * composite is the caller's spec-side business, per the fixed-point
    * convention. One shuffle per n on (pair, gram) — linear in corpus
    * size, no cross-pair state. */
  def ngramPrecision(
      pairs: DataFrame, docs: DataFrame, idCol: String, textCol: String,
      ns: Seq[Int] = Seq(1, 2)): DataFrame = {
    require(ns.nonEmpty && ns.forall(n => n >= 1 && n <= 8),
      s"ngramPrecision: ns in [1,8], got $ns")
    val toks = docs.select(col(idCol).cast("long").as("__d"),
        split(trim(col(textCol)), "\\s+").as("toks"))
      .localCheckpoint() // one tokenize feeds every n
    def counts(n: Int): DataFrame = toks
      .filter(size(col("toks")) >= n)
      .select(col("__d"),
        explode(sequence(lit(0), size(col("toks")) - n)).as("p"),
        col("toks"))
      .withColumn("gram", expr(s"slice(toks, p + 1, $n)"))
      .filter(!array_contains(col("gram"), "")) // the anchorGrams rule
      .select(col("__d"), concat_ws(" ", col("gram")).as("g"))
      .groupBy("__d", "g").agg(count(lit(1)).as("cnt"))
    val base = pairs.select(col("cand_id").cast("long").as("cand_id"),
      col("ref_id").cast("long").as("ref_id"))
    val lens = toks.select(col("__d"),
      size(filter(col("toks"), t => t =!= "")).cast("long").as("__len"))
    val withLens = base
      .join(lens.select(col("__d").as("cand_id"), col("__len").as("len_c")),
        Seq("cand_id"), "left")
      .join(lens.select(col("__d").as("ref_id"), col("__len").as("len_r")),
        Seq("ref_id"), "left")
      .select(col("cand_id"), col("ref_id"),
        coalesce(col("len_c"), lit(0L)).as("len_c"),
        coalesce(col("len_r"), lit(0L)).as("len_r"))
    ns.foldLeft(withLens) { (acc, n) =>
      val c = counts(n)
      val perPair = base
        .join(c.select(col("__d").as("cand_id"), col("g"),
          col("cnt").as("__cc")), Seq("cand_id"))
        .join(c.select(col("__d").as("ref_id"), col("g"),
          col("cnt").as("__rc")), Seq("ref_id", "g"), "left")
        .groupBy("cand_id", "ref_id")
        .agg(sum(least(col("__cc"), coalesce(col("__rc"), lit(0L))))
            .as(s"clip$n"),
          sum(col("__cc")).as(s"tot$n"))
      acc.join(perPair, Seq("cand_id", "ref_id"), "left")
        .withColumn(s"clip$n", coalesce(col(s"clip$n"), lit(0L)))
        .withColumn(s"tot$n", coalesce(col(s"tot$n"), lit(0L)))
        .withColumn(s"p${n}_bp",
          when(col(s"tot$n") === 0, 0L)
            .otherwise(expr(s"10000 * clip$n DIV tot$n")))
    }
  }

  /** Curriculum interleave: order docs by an integer difficulty score
    * WITHIN each source, then round-robin across sources — the standard
    * "anneal difficulty while keeping the mixture balanced per step"
    * training order (curriculum learning à la Bengio et al. 2009,
    * mixture-balanced like every multi-source pretraining schedule).
    *
    * Scale shape: NO per-source window (a source is a corpus-sized
    * partition). rank_in_source falls out of one [[Ranks.globalDenseRank]]
    * over (source, −score, id) minus a broadcast per-source offset
    * (≤ |sources| rows), and the interleave position is a second global
    * rank over (rank_in_source, source) — two O(n log n) shuffles.
    * Output: (id, source, score, rank_in_source, interleave_pos);
    * ties break by id, so the order is a deterministic permutation. */
  def curriculumInterleave(
      df: DataFrame, idCol: String, srcCol: String,
      scoreCol: String): DataFrame = {
    val base = df.select(col(idCol).cast("long").as("__id"),
      col(srcCol).as("__src"), col(scoreCol).cast("long").as("__score"))
    val inSrc = Ranks.rankWithinGroup(
        base.select(col("__src"), (-col("__score")).as("__ns"), col("__id")),
        Seq("__src"), Seq("__ns", "__id"))
      .select(col("__id"), col("__src"), (-col("__ns")).as("__score"),
        col("__gr").as("rank_in_source"))
    Ranks.globalDenseRank(
        inSrc.select(col("rank_in_source"), col("__src"), col("__id"),
          col("__score")),
        Seq("rank_in_source", "__src"))
      .select(col("__id").as(idCol), col("__src").as(srcCol),
        col("__score").as("score"), col("rank_in_source"),
        col("__r").as("interleave_pos"))
  }

  def vocabGrowthAppend(
      ps: graft.storage.PartStore, part: String,
      tokens: DataFrame, tokCol: String, epoch: Long): (Long, Long, Long) = {
    val batchToks = tokens.select(col(tokCol).as("tok"))
      .filter(col("tok") =!= "")
    // ONE pass over the batch token stream: per-type counts pin both
    // scalar counts and the type set (previously three separate passes —
    // occurrence count, distinct count, anti-join — each re-running the
    // caller's tokenize; the groupBy shuffles the same vocabulary-sized
    // set the old distinct did, map-side combined)
    val typeCounts = batchToks.groupBy("tok")
      .agg(count(lit(1)).as("__cnt")).localCheckpoint()
    val nTokens = typeCounts.agg(coalesce(sum(col("__cnt")), lit(0L)))
      .collect()(0).getLong(0) // coalesce: an all-empty batch sums NULL
    val nTypes = typeCounts.count()
    val types = typeCounts.select("tok")
    val fresh = (ps.readPart(part) match {
      case None => types
      case Some(ex) => types.join(ex.select("tok"), Seq("tok"), "left_anti")
    }).localCheckpoint() // one compute: counted AND stored
    val nNew = fresh.count()
    if (nNew > 0)
      ps.store(part, fresh
        .withColumn("timestamp", pmod(crc32(col("tok")), lit(1024L)))
        .withColumn("modified", lit(epoch)))
    (nTokens, nTypes, nNew)
  }
}
