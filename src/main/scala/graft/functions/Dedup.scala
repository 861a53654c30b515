package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.SkewOps

/** Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.
  *
  * Scale design notes (the 100 TB story is the whole point of these):
  *  - Exact dedup is one hash-aggregate on a digest of normalized text —
  *    map-side partials collapse duplicates before the shuffle, so shuffle
  *    volume ≈ |distinct docs|, not |docs|.
  *  - MinHash/LSH: signatures are one aggregate pass over shingles
  *    (k min-aggregates computed simultaneously — NOT k passes); banding
  *    turns all-pairs comparison into an equi-join on (band, bandkey), the
  *    classic shuffle-join formulation. Bucket skew (a degenerate band key
  *    shared by thousands of docs) is the known failure mode — AQE skew-join
  *    handles moderate skew; pathological buckets should be capped.
  *  - Hash functions are md5-based: slower than xxhash64 but *identical
  *    across engines* (verifiable against any SQL oracle). In production
  *    swap `hashExpr` for xxhash64 — the operator shape is unchanged.
  */
object Dedup {

  /** Normalized-text content digest — THE digest for exact dedup. Batch
    * ([[exact]]) and streaming (`StreamingRollup.dedupExact`) share this
    * definition; the streaming-pass-then-batch-compact reconcile depends on
    * both sides hashing identically. */
  def digest(text: Column): Column = md5(lower(trim(text)))

  /** Exact dedup on normalized text: per digest keep min id + copy count. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(digest(col(textCol)).as("digest"))
      .agg(min(col(idCol)).as("keeper"), count(lit(1)).as("copies"))

  /** Aggressive text canonicalization for the "fuzzy-exact" dedup tier
    * (the C4/RefinedWeb practice, public): lowercase, replace every
    * character outside ASCII [a-z0-9] and whitespace with a space,
    * collapse whitespace runs, trim. Two docs differing only in case,
    * punctuation, or spacing canonicalize identically — the tier between
    * [[digest]]-exact (which sees "Hello, world!" ≠ "hello world") and
    * MinHash near-dup (which pays shingling for what is really the same
    * byte content reflowed). ASCII-scoped on purpose: it is engine-exact
    * (Java regex here, RE2 in the oracle, same result), and non-ASCII
    * letters degrade to separators rather than silently merging
    * lookalikes. */
  def canonicalize(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9\\s]", " "), "\\s+", " "))

  /** Unicode-aware [[canonicalize]] variant for multilingual corpora:
    * lowercase, replace every char that is not a Unicode letter, digit,
    * or whitespace with a space, collapse runs, trim — so "Héllo, wörld"
    * and "héllo wörld" fold together instead of degrading accented
    * letters to separators. Spec-verified but NOT oracle-gated by
    * design: the driver corpus is pure ASCII (verified round 18 — a gate
    * would be evidentially identical to q334's), and Unicode lowercase
    * folding is not engine-exact across Java and RE2/ICU (İ→i̇, ß) so a
    * cross-engine hash gate would pin coincidence, not a contract. Same
    * one-shuffle plan shape as the ASCII tier when used with
    * [[canonicalKeepers]]-style windows. */
  def canonicalizeUnicode(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^\\p{L}\\p{N}\\s]", " "), "\\s+", " "))

  /** Canonical exact-dedup fate ledger: one row per doc with its
    * canonical digest, the component keeper (min id among docs sharing
    * the digest), copy count, and fate kept/dup (the q318 drop-ledger
    * convention). Scale shape: ONE shuffle — the digest-partitioned
    * window computes keeper and copies in the same exchange; no join, no
    * second pass, and nothing is corpus-global. */
  def canonicalKeepers(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("canon_digest")
    df.select(col(idCol).cast("long").as("doc_id"),
        md5(canonicalize(col(textCol))).as("canon_digest"))
      .withColumn("keeper", min(col("doc_id")).over(w))
      .withColumn("copies", count(lit(1)).over(w))
      .withColumn("fate",
        when(col("doc_id") === col("keeper"), "kept").otherwise("dup"))
  }

  /** Incremental exact dedup against PERSISTED digest state: the
    * digest→keeper map of all prior batches lives in a [[graft.storage
    * .PartStore]] part (range-partitioned by a 60-bit digest prefix, so
    * each batch's merge and the anti-join base read only the partitions
    * its digests land in — the same bounded-blast-radius contract the
    * incremental ANN index proved), each batch dedups against stored
    * state AND itself, and only genuinely-new digests are appended
    * (first-occurrence-wins across batches, exactly
    * `dropDuplicatesWithinWatermark`'s batch analogue with unbounded
    * retention). Configure the store with `keyCols = Seq("digest")` —
    * the full digest keys the merge, the 60-bit prefix only places rows
    * in partitions, so prefix collisions cannot clobber state.
    *
    * Returns one row per distinct batch digest:
    * (digest, batch_copies, keeper) where keeper is the FIRST id ever
    * seen for the digest (historical, not batch-local). */
  def exactIncremental(
      store: graft.storage.PartStore, part: String,
      batch: DataFrame, idCol: String, textCol: String): DataFrame =
    incrementalByDigest(store, part, batch, idCol,
      digest(col(textCol)), "exactIncremental")

  /** Incremental CANONICAL ("fuzzy-exact") dedup: [[exactIncremental]]'s
    * persisted-digest-store discipline keyed by
    * `md5(`[[canonicalize]]`(text))` — the C4/RefinedWeb folding tier run
    * the way a 100 TB pipeline actually runs it, batch by batch. Two docs
    * differing only in case, punctuation, or spacing share a canonical
    * digest ACROSS batches: the first batch's doc becomes the keeper, a
    * later batch's reflowed copy resolves to it from stored state.
    * Storage contract identical to the exact tier (digest-range-
    * partitioned store, first-occurrence keeper, replay-idempotent,
    * bounded partition blast radius); only the digest definition differs. */
  def canonicalIncremental(
      store: graft.storage.PartStore, part: String,
      batch: DataFrame, idCol: String, textCol: String): DataFrame =
    incrementalByDigest(store, part, batch, idCol,
      md5(canonicalize(col(textCol))), "canonicalIncremental")

  private def incrementalByDigest(
      store: graft.storage.PartStore, part: String,
      batch: DataFrame, idCol: String, digestExpr: Column,
      opName: String): DataFrame = {
    require(store.config.keyCols == Seq("digest"),
      s"$opName: store must be keyed by the digest column " +
        s"(keyCols = Seq(\"digest\")), got ${store.config.keyCols}")
    // a string/UUID id would cast to NULL and persist null keepers into
    // the shared state forever — refuse loudly, like the ANN paths
    locally {
      import org.apache.spark.sql.types._
      val t = batch.schema(idCol).dataType
      require(Set[DataType](ByteType, ShortType, IntegerType, LongType)(t),
        s"$opName: id column '$idCol' must be integral (keepers " +
          s"are stored as LONG), got ${t.simpleString}")
    }
    val psize = store.config.partitionSizeSeconds
    val batchState = batch
      .select(col(idCol).cast("long").as("__id"), digestExpr.as("digest"))
      .groupBy("digest")
      .agg(min(col("__id")).as("keeper"), count(lit(1)).as("batch_copies"))
      .withColumn("entity_id", conv(substring(col("digest"), 1, 15), 16, 10).cast("long"))
      .withColumn("timestamp", col("entity_id"))
      .localCheckpoint() // two uses below; digest hashing runs once
    val pidx = batchState
      .select(((col("timestamp") - pmod(col("timestamp"), lit(psize))) / psize)
        .cast("long").as("p")).distinct()
    def pruned(df: DataFrame): DataFrame =
      df.join(broadcast(pidx), df("pindex") === col("p")).drop("p")
    val fresh = store.readPart(part) match {
      case None => batchState
      case Some(ex) =>
        batchState.join(pruned(ex).select("digest"), Seq("digest"), "left_anti")
    }
    store.store(part, fresh.select(col("digest"), col("entity_id"),
      col("timestamp"), col("keeper"), lit(1L).as("modified")))
    // An EMPTY first batch writes zero partitions, so readPart can still
    // be None here — fall back to an empty state frame instead of
    // throwing (.get); the final join is empty either way because
    // batchState is empty too.
    val state = store.readPart(part) match {
      case Some(ex) => pruned(ex)
      case None     => fresh.limit(0)
    }
    batchState.select(col("digest"), col("batch_copies"))
      .join(state.select(col("digest"), col("keeper")), "digest")
      .select("digest", "batch_copies", "keeper")
  }

  /** Incremental MinHash/LSH near-dup candidates against PERSISTED
    * bucket state — [[exactIncremental]]'s append-only contract lifted to
    * the near-duplicate tier: every prior batch's (band, key, doc) bucket
    * memberships live in a [[graft.storage.PartStore]] part partitioned
    * by a 60-bit prefix of the band key, each new batch APPENDS its own
    * memberships and probes ONLY the partitions its keys land in, and
    * the candidate pairs returned are those involving at least one batch
    * doc — so per-batch cost is O(batch buckets + co-resident members),
    * never O(corpus), and the union of all batches' outputs equals the
    * full-corpus [[lshCandidates]] run (spec-asserted; a batch replayed
    * idempotently re-emits its pairs — dedupe downstream or compare as
    * sets).
    *
    * `maxBucket` caps a bucket at its size AS OF THE PROBE: a bucket
    * that grows past the cap only suppresses pairs from later batches —
    * exactly how a capped streaming system behaves, and mirrored by the
    * oracle (which replays the same batch schedule). A key's members all
    * co-reside in its prefix partition, so the cap sees the bucket's
    * full membership.
    *
    * Configure the store with `keyCols = Seq("band", "key", "entity_id")`
    * (one state row per bucket membership; replays overwrite
    * themselves). */
  def lshIncremental(
      store: graft.storage.PartStore, part: String,
      batch: DataFrame, idCol: String, textCol: String,
      bands: Int, rowsPerBand: Int, shingleK: Int = 3,
      maxBucket: Int = Int.MaxValue,
      shinglesOpt: Option[DataFrame] = None): DataFrame = {
    require(store.config.keyCols == Seq("band", "key", "entity_id"),
      "lshIncremental: store must be keyed by the bucket membership " +
        s"(keyCols = Seq(\"band\", \"key\", \"entity_id\")), got ${store.config.keyCols}")
    locally {
      import org.apache.spark.sql.types._
      val t = batch.schema(idCol).dataType
      require(Set[DataType](ByteType, ShortType, IntegerType, LongType)(t),
        s"lshIncremental: id column '$idCol' must be integral, got ${t.simpleString}")
    }
    val psize = store.config.partitionSizeSeconds
    // shinglesOpt: callers that ALSO sketch the batch (nearDupIncremental)
    // pass the materialized shingle frame so the tokens→shingles pass
    // runs once per batch, not once per consumer
    val sh = shinglesOpt.getOrElse(
      shingles(graft.functions.TextAnalysis.tokens(batch, idCol, textCol),
        idCol, shingleK))
    val sig = minhashSignature(sh, idCol, bands * rowsPerBand)
    val rows = lshBuckets(sig, idCol, bands, rowsPerBand)
      .select(col("band"), col("key"), col(idCol).cast("long").as("entity_id"))
      .withColumn("timestamp", conv(substring(col("key"), 1, 15), 16, 10).cast("long"))
      .withColumn("modified", lit(1L))
      .localCheckpoint() // feeds the write, the probe filter, and newIds
    store.store(part, rows)
    val pidx = rows
      .select(((col("timestamp") - pmod(col("timestamp"), lit(psize))) / psize)
        .cast("long").as("p")).distinct()
    // an all-empty-docs batch writes zero partitions: state may still be
    // absent — probe an empty frame instead of crashing on .get
    val state = store.readPart(part)
      .getOrElse(rows.limit(0).withColumn("pindex", lit(0L)))
    val pruned = state.join(broadcast(pidx), state("pindex") === col("p"))
      .select(col("band"), col("key"), col("entity_id"))
    val capped =
      if (maxBucket == Int.MaxValue) pruned
      else SkewOps.keepSmallKeys(pruned, Seq("band", "key"), maxBucket)
    // BATCH-SIDE probe (r19): the left join side is only the batch's own
    // bucket memberships, not the whole co-resident state. The old shape
    // self-joined capped×capped (all-pairs within every touched bucket —
    // O(Σ bucket²) with the corpus on BOTH sides) and then semi-joined
    // the result down to pairs involving ≥1 batch doc; generating from
    // the batch side directly is O(batch memberships × bucket size) and
    // produces the SAME set: every qualifying pair has a batch member,
    // so it appears as (a = batch member, b = bucket mate), and the
    // least/greatest normalization + distinct collapse orientation and
    // multi-bucket duplicates exactly as the old a<b + distinct did.
    // no broadcast hint: an ingest batch can be millions of ids — let
    // AQE pick broadcast vs shuffle from the measured size
    val newIds = rows.select(col("entity_id").as("nid")).distinct()
    val batchSide = capped
      .join(newIds, capped("entity_id") === col("nid"), "left_semi")
    batchSide.alias("a").join(capped.alias("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.entity_id") =!= col("b.entity_id"))
      .select(least(col("a.entity_id"), col("b.entity_id")).as("id1"),
        greatest(col("a.entity_id"), col("b.entity_id")).as("id2"))
      .distinct()
      // EAGER snapshot: the probe reads the store AS OF THIS CALL — a
      // lazy frame evaluated after a later batch's store() would see the
      // future state (and its caps), silently changing this batch's
      // candidates
      .localCheckpoint()
  }

  /** EXACT set-similarity join with prefix filtering (Bayardo, Ma &
    * Srikant 2007 "Scaling Up All Pairs"; Xiao et al.'s PPJoin prefix,
    * public): ALL document pairs whose token-set Jaccard ≥ num/den —
    * deterministic and complete, the exact complement to the
    * probabilistic MinHash/LSH tier. Each doc's tokens sort by GLOBAL
    * rarity (corpus freq asc, md5(tok), tok — one total order shared by
    * every doc); a pair with J ≥ τ must share a token inside each side's
    * first |d| − ⌈τ·|d|⌉ + 1 tokens (if the prefixes were disjoint, the
    * overlap would be confined to the suffixes, which are too small),
    * so the candidate set is the equi-join on PREFIX tokens only — rare
    * tokens, few docs each, the quadratic never materializes.
    *
    * The threshold is a RATIONAL num/den and every comparison is integer
    * (⌈τn⌉ = (num·n + den − 1) div den; the filter is i·den ≥
    * num·(n₁ + n₂ − i)) — no float rounds anywhere in the logic, so any
    * engine reproduces the exact pair set; the reported `jac` is the
    * single exact division i/(n₁+n₂−i).
    *
    * Scale shape: one distinct-token pass, one corpus-frequency
    * aggregate joined back, per-doc prefix via sorted bounded
    * collect_list (array ≤ doc length — no window), candidate equi-join
    * on prefix tokens with PPJoin's LENGTH filter (τ·max(n₁,n₂) ≤
    * min(n₁,n₂), integer form) and POSITIONAL filter (the first shared
    * token at 0-based sorted positions (p₁, p₂) bounds the overlap by
    * 1 + min(n₁−p₁−1, n₂−p₂−1); a qualifying pair's first common token
    * lies inside both prefixes, so keeping pairs where ANY shared
    * prefix token passes is complete) applied AT the join — both are
    * exact, so they change candidate count only, never the pair set.
    * The verify join is bounded by candidates × doc length. Skew = a
    * frequent token landing in prefixes; rarity ordering makes prefix
    * tokens the RAREST ones, which is the algorithm's own skew defense
    * — and under a degenerate tiny vocabulary where NO token is rare
    * (the scale rung's stress), the length+positional filters are what
    * keep the candidate tier from touching every co-bucketed pair.
    * Output: (id1, id2, n1, n2, inter, jac), id1 < id2. */
  def setSimilarityJoin(
      df: DataFrame, idCol: String, textCol: String,
      tauNum: Int, tauDen: Int): DataFrame = {
    require(tauNum >= 1 && tauDen >= 1 && tauNum <= tauDen,
      s"setSimilarityJoin: need 0 < num/den <= 1, got $tauNum/$tauDen")
    val t = TextAnalysis.tokens(df, idCol, textCol)
      .filter(col("tok") =!= "")
      .select(col(idCol).as("__id"), col("tok")).distinct()
      .localCheckpoint()
    val sz = t.groupBy("__id").agg(count(lit(1)).as("__n"))
    val freq = t.groupBy("tok").agg(count(lit(1)).as("__f"))
    val prefLen = col("__n") -
      ((lit(tauNum) * col("__n") + (tauDen - 1)) / tauDen)
        .cast("long") + 1
    val pref = t.join(freq, "tok")
      .groupBy("__id")
      .agg(array_sort(collect_list(struct(
        col("__f"), md5(col("tok")).as("__h"), col("tok")))).as("__a"))
      .join(sz, "__id")
      .select(col("__id"), col("__n"), posexplode(slice(col("__a"), lit(1),
        prefLen.cast("int"))).as(Seq("__pos", "__p")))
      .select(col("__id"), col("__p.tok").as("tok"), col("__pos"), col("__n"))
    val cand = candidatePairs(pref, pref.withColumnRenamed("__id", "__id2")
        .withColumnRenamed("__pos", "__pos2").withColumnRenamed("__n", "__n2"),
      tauNum, tauDen, directed = true)
    verifyPairs(cand, t, tauNum, tauDen)
  }

  /** Verify tier shared by [[setSimilarityJoin]] and
    * [[setSimJoinIncremental]]: exact intersection per candidate pair via
    * per-doc token ARRAYS and codegen `array_intersect` — two id-keyed
    * joins of the candidate set against a |docs|-row array side, then a
    * pure projection. The alternative (exploding candidate ids back over
    * their token rows and re-grouping) shuffles candidates × doc length
    * rows; on a dense corpus (the 10× rung: 6.6M candidates × ~31
    * tokens ≈ 200M exploded rows) that shuffle dominated the whole
    * join. Arrays are bounded by doc token count — the same bound the
    * prefix scheme already assumes — and the array side is corpus-sized,
    * so AQE broadcasts it when small and the shuffle is ∝ candidates,
    * never candidates × tokens. `toks` input must be distinct (id, tok)
    * rows. */
  private def verifyPairs(
      cand: DataFrame, toks: DataFrame,
      tauNum: Int, tauDen: Int): DataFrame = {
    val sets = toks.groupBy("__id")
      .agg(collect_list(col("tok")).as("__toks"), count(lit(1)).as("__n"))
    cand
      .join(sets.select(col("__id").as("id1"), col("__toks").as("__t1"),
        col("__n").as("n1")), "id1")
      .join(sets.select(col("__id").as("id2"), col("__toks").as("__t2"),
        col("__n").as("n2")), "id2")
      .withColumn("inter",
        size(array_intersect(col("__t1"), col("__t2"))).cast("long"))
      .filter(col("inter") * tauDen >=
        lit(tauNum) * (col("n1") + col("n2") - col("inter")))
      .select(col("id1"), col("id2"), col("n1"), col("n2"), col("inter"),
        (col("inter").cast("double") /
          (col("n1") + col("n2") - col("inter")).cast("double")).as("jac"))
  }

  /** Candidate pairs from two prefix-entry frames — the shared PPJoin
    * candidate tier of [[setSimilarityJoin]] and [[setSimJoinIncremental]].
    * `left` carries (__id, tok, __pos, __n), `right` the same renamed
    * (__id2, __pos2, __n2); equi-join on (tok, LENGTH BAND), then the
    * exact LENGTH filter (τ·max(n₁,n₂) ≤ min(n₁,n₂) in integers) and
    * POSITIONAL filter (overlap ubound 1 + min(n₁−p₁−1, n₂−p₂−1) must
    * still reach ⌈τ/(1+τ)·(n₁+n₂)⌉; a qualifying pair's FIRST common
    * token is in both prefixes and passes, so any-token-passes keeps
    * completeness), normalized to id1 < id2 and deduped. All three
    * filters are exact — they shrink the candidate tier, never the
    * verified pair set.
    *
    * The length band is the PPJoin length filter carried as an EQUI-KEY
    * (Bayardo et al.'s size-window as a join attribute): geometric bands
    * base B = τden/τnum, build side keyed band(n₂) = ⌊log n₂ / log B⌋,
    * probe side exploded to the ≤3 bands intersecting its exact window
    * [⌈n·τ⌉, ⌊n/τ⌋]. On a degenerate low-vocabulary corpus (where every
    * token is common and the prefix filter alone degenerates toward
    * all-pairs) cross-band pairs now prune at the SHUFFLE, not after the
    * join — the candidate tier scales with Σ_band |postings|² instead of
    * |postings|². Completeness needs no float-exactness argument: band()
    * is monotone (log, /const, floor all monotone), so n₂ ∈ [lo, hi]
    * implies band(n₂) ∈ [band(lo), band(hi)] under ANY evaluation of the
    * same expression. Bands derive from n at plan time — stored prefix
    * entries carry only (pos, n), no format change. */
  private def candidatePairs(
      left: DataFrame, right: DataFrame,
      tauNum: Int, tauDen: Int, directed: Boolean = false): DataFrame = {
    val logB = math.log(tauDen.toDouble / tauNum.toDouble)
    val joined =
      if (logB == 0.0) left.join(right, "tok") // τ = 1: one band, exact-equal lengths
      else {
        def bandOf(n: Column): Column =
          floor(log(n.cast("double")) / lit(logB)).cast("long")
        val lo = ((col("__n") * tauNum + (tauDen - 1)) / tauDen).cast("long")
        val hi = ((col("__n") * tauDen) / tauNum).cast("long")
        val probe = left.withColumn("__band",
          explode(sequence(bandOf(lo), bandOf(hi))))
        val build = right.withColumn("__band", bandOf(col("__n2")))
        probe.join(build, Seq("tok", "__band")).drop("__band")
      }
    // directed mode: each unordered pair is generated EXACTLY ONCE, with
    // the (n, id)-larger doc probing and the smaller doc building — which
    // lets the build side keep only its INDEX prefix (PPJoin's midprefix,
    // ⌈2τ/(1+τ)·n⌉ short of n): for a qualifying pair with |y| ≤ |x|, the
    // first common token under the rarity order lies in BOTH x's probing
    // prefix and y's index prefix (if it didn't, overlap ≤ ⌈τ|x|⌉−1 < α
    // resp. ≤ ⌈2τ/(1+τ)|y|⌉−1 < α — both contradict J ≥ τ), so the
    // shortened build postings lose no pair and cut the raw stream ∝
    // index/probe prefix ratio — on top of halving it vs emitting both
    // orders. A self-join is the directed join of a frame with itself; a
    // cross tier (incremental new-vs-stored) is the union of the two
    // directed joins. Undirected mode keeps full prefixes and both
    // orders, normalized below.
    val ordered =
      if (directed) {
        val idxCeil = ((col("__n2") * (2 * tauNum) + (tauNum + tauDen - 1)) /
          (tauNum + tauDen)).cast("long")
        joined
          .filter(col("__pos2") < col("__n2") - idxCeil + 1)
          .filter(col("__n2") < col("__n") ||
            (col("__n2") === col("__n") && col("__id2") < col("__id")))
      } else joined.filter(col("__id") =!= col("__id2"))
    ordered
      .filter(col("__n") * tauNum <= col("__n2") * tauDen &&
        col("__n2") * tauNum <= col("__n") * tauDen)
      .filter((lit(1) + least(col("__n") - col("__pos") - 1,
          col("__n2") - col("__pos2") - 1)) * (tauDen + tauNum) >=
        lit(tauNum) * (col("__n") + col("__n2")))
      .select(least(col("__id"), col("__id2")).as("id1"),
        greatest(col("__id"), col("__id2")).as("id2"))
      .distinct()
  }

  /** Incremental [[setSimilarityJoin]] — the exact tier's append-only
    * path: per batch, new docs' prefixes join the PERSISTED prefix index
    * (plus the batch's own), verify runs against stored token sets
    * pruned to candidate ids, and the batch's tokens + prefix entries
    * append to the stores. Emits each qualifying pair exactly once
    * across the batch schedule (new-new pairs in their batch, new-old
    * pairs when the newer side arrives), so the union over batches ==
    * the one-shot batch join's pair set.
    *
    * The rarity model FREEZES on the first batch (later batches look up
    * stored frequencies; unseen tokens default to freq 0 = rarest).
    * Prefix filtering is complete under ANY total token order shared by
    * all docs — the frozen model only shifts efficiency, never the pair
    * set, which is why this stays oracle-exact against the naive
    * all-pairs answer. Rebuilding the model (and prefix store) is an
    * offline maintenance rewrite, like [[compactParents]].
    *
    * Stores: tokens + prefixes keyed (entity_id, tok), timestamp =
    * doc id (id-range partitioning, appends land in the new ids'
    * partitions); the frequency model keyed (entity_id = tok md5-56,
    * tok). Batch ids must be NEW (append-only, the incremental-family
    * contract). */
  def setSimJoinIncremental(
      tokStore: graft.storage.PartStore, prefStore: graft.storage.PartStore,
      freqStore: graft.storage.PartStore, part: String,
      batch: DataFrame, idCol: String, textCol: String,
      tauNum: Int, tauDen: Int): DataFrame = {
    require(tauNum >= 1 && tauDen >= 1 && tauNum <= tauDen,
      s"setSimJoinIncremental: need 0 < num/den <= 1, got $tauNum/$tauDen")
    for ((st, nm) <- Seq(tokStore -> "token", prefStore -> "prefix",
        freqStore -> "frequency"))
      require(st.config.keyCols == Seq("entity_id", "tok"),
        s"setSimJoinIncremental: $nm store must be keyed (entity_id, tok)")
    val t = TextAnalysis.tokens(batch, idCol, textCol)
      .filter(col("tok") =!= "")
      .select(col(idCol).cast("long").as("__id"), col("tok")).distinct()
      .localCheckpoint()
    val model = freqStore.readPart(part) match {
      case Some(m) => m.select(col("tok"), col("freq"))
      case None =>
        val m = t.groupBy("tok").agg(count(lit(1)).as("freq"))
        val th = conv(substring(md5(col("tok")), 1, 14), 16, 10).cast("long")
        freqStore.store(part, m.select(th.as("entity_id"),
          th.as("timestamp"), col("tok"), col("freq"),
          lit(1L).as("modified")))
        m
    }
    val sz = t.groupBy("__id").agg(count(lit(1)).as("__n"))
    val prefLen = col("__n") -
      ((lit(tauNum) * col("__n") + (tauDen - 1)) / tauDen).cast("long") + 1
    val pref = t.join(model, Seq("tok"), "left")
      .select(col("__id"), col("tok"),
        coalesce(col("freq"), lit(0L)).as("__f"))
      .groupBy("__id")
      .agg(array_sort(collect_list(struct(
        col("__f"), md5(col("tok")).as("__h"), col("tok")))).as("__a"))
      .join(sz, "__id")
      .select(col("__id"), col("__n"), posexplode(slice(col("__a"), lit(1),
        prefLen.cast("int"))).as(Seq("__pos", "__p")))
      .select(col("__id"), col("__p.tok").as("tok"), col("__pos"), col("__n"))
      .localCheckpoint()
    def asRight(p: DataFrame): DataFrame = p
      .withColumnRenamed("__id", "__id2")
      .withColumnRenamed("__pos", "__pos2")
      .withColumnRenamed("__n", "__n2")
    val oldPref = prefStore.readPart(part) match {
      case Some(p) =>
        // v2 prefix stores carry (pos, n) for the length + positional
        // filters; a v1 store (written before that change) lacks them and
        // cannot be read silently — fail loudly rather than throw an
        // opaque AnalysisException mid-plan
        val missing = Seq("pos", "n").filterNot(p.columns.contains)
        require(missing.isEmpty,
          s"setSimJoinIncremental: prefix store at '$part' is an old-format " +
            s"(v1) store missing column(s) ${missing.mkString(", ")}; " +
            "rebuild required — delete the prefix store part and replay " +
            "batches (the token store is unaffected)")
        p.select(col("entity_id").as("__id2"), col("tok"),
          col("pos").as("__pos2"), col("n").as("__n2"))
      case None    => asRight(pref.limit(0))
    }
    val candNew = candidatePairs(pref, asRight(pref), tauNum, tauDen,
      directed = true)
    // cross tier stays ONE undirected join with the BATCH probing: each
    // new-old pair is already generated exactly once (ids disjoint), and
    // the alternative — splitting into two directed joins so the stored
    // side could be index-prefix-shortened — makes the accumulated corpus
    // the probe side of the second join (band-exploded ×3), which costs
    // more than the shortened build saves (measured on the 10× rung)
    val candCross = candidatePairs(pref, oldPref, tauNum, tauDen)
    // new-new and new-old pairs are disjoint under the append-only batch
    // contract (batch ids are NEW), so a plain union stays duplicate-free
    // — no cross-family distinct shuffle
    val cand = candNew.unionByName(candCross).localCheckpoint()
    val oldToks = tokStore.readPart(part) match {
      case Some(tk) => tk.select(col("entity_id").as("__id"), col("tok"))
      case None     => t.limit(0)
    }
    // verify only candidate ids' token rows — the stored corpus never
    // streams through the verify join whole
    val candIds = cand.select(col("id1").as("__id"))
      .unionByName(cand.select(col("id2").as("__id"))).distinct()
    val verifyToks = t.unionByName(oldToks)
      .join(candIds, Seq("__id"), "left_semi").localCheckpoint()
    val out = verifyPairs(cand, verifyToks, tauNum, tauDen).localCheckpoint()
    // ONE bounded driver action replaces BOTH stores' merge-path pindex
    // collects (r19): token and prefix rows are keyed timestamp = __id,
    // and pref's id set ⊆ t's (pref derives from t), so each store's
    // batch pindex set derives from t's ids — collect_set over
    // id-div-psize is bounded by the touched partition count. t's set is
    // a (usually exact, always safe) SUPERSET for the prefix store; the
    // staged-listing guard in store() enforces the superset contract.
    def pidxOf(p: Long) =
      ((col("__id") - pmod(col("__id"), lit(p))) / p).cast("long")
    val pTok = tokStore.config.partitionSizeSeconds
    val pPref = prefStore.config.partitionSizeSeconds
    // first batch: both stores take the collect-free first-append path —
    // the hint would be a pure extra action there, so skip it
    val (tokIdx, prefIdx) =
      if (!tokStore.exists(part)) (None, None)
      else {
        val idxRow = t.agg(
          collect_set(pidxOf(pTok)), collect_set(pidxOf(pPref))).head()
        (Some(idxRow.getSeq[Long](0)), Some(idxRow.getSeq[Long](1)))
      }
    tokStore.store(part, t.select(col("__id").as("entity_id"),
      col("__id").as("timestamp"), col("tok"), lit(1L).as("modified")),
      batchIndicesHint = tokIdx)
    // prefix store v2: entries carry their sorted position and doc size
    // so the cross-batch candidate join can run the length + positional
    // filters without touching the token store
    prefStore.store(part, pref.select(col("__id").as("entity_id"),
      col("__id").as("timestamp"), col("tok"), col("__pos").as("pos"),
      col("__n").as("n"), lit(1L).as("modified")),
      batchIndicesHint = prefIdx)
    out
  }

  /** Cross-split contamination: near-duplicate pairs that STRADDLE the
    * train boundary — a held-out (val/test) document whose near-twin sits
    * in train inflates eval scores without any verbatim overlap, which is
    * exactly what n-gram decontamination ([[contaminationBloom]]) cannot
    * see. Compose any pair tier (`pairs` = (id1, id2, cos) — LSH-bucketed
    * embedding pairs, MinHash-verified pairs…) with a split assignment
    * (`splits` = (idCol, splitCol)) and get one row per leaking pair:
    * (holdout_id, holdout_split, train_id, cos). A holdout doc with
    * several train twins emits one row each (callers dedupe or count as
    * needed); pairs within the same side (train~train, val~val, val~test)
    * are NOT leakage and don't appear.
    *
    * Scale shape: two equi-joins of the bounded pair set against the
    * split frame on id — no new pairwise work; the candidate tier
    * already did the quadratic-avoidance. */
  def splitLeakage(
      pairs: DataFrame, splits: DataFrame, idCol: String, splitCol: String,
      trainSplit: String = "train"): DataFrame = {
    val sp1 = splits.select(col(idCol).as("id1"), col(splitCol).as("__s1"))
    val sp2 = splits.select(col(idCol).as("id2"), col(splitCol).as("__s2"))
    pairs.select("id1", "id2", "cos")
      .join(sp1, "id1").join(sp2, "id2")
      .filter((col("__s1") === trainSplit) =!= (col("__s2") === trainSplit))
      .select(
        when(col("__s1") === trainSplit, col("id2")).otherwise(col("id1"))
          .as("holdout_id"),
        when(col("__s1") === trainSplit, col("__s2")).otherwise(col("__s1"))
          .as("holdout_split"),
        when(col("__s1") === trainSplit, col("id1")).otherwise(col("id2"))
          .as("train_id"),
        col("cos"))
  }

  /** Maintenance pass for [[nearDupIncremental]]'s parent-pointer store:
    * rewrites EVERY stored pointer to its component root by pointer
    * doubling (parent ← parent(parent) per round — depth halves each
    * round, so convergence is O(log maxDepth) full-store joins), then
    * one staged store rewrite. Run it when chains deepen (components
    * merged across many batches whose members never re-appear) — after
    * compaction every find is a single pruned lookup again. Returns the
    * number of pointers that changed. */
  def compactParents(
      parentStore: graft.storage.PartStore, part: String): Long = {
    val st = parentStore.readPart(part) match {
      case Some(df) => df.select(col("entity_id"), col("parent")).localCheckpoint()
      case None     => return 0L
    }
    var cur = st
    var changed = true
    var rounds = 0
    while (changed) {
      rounds += 1
      require(rounds <= 64, "compactParents: no convergence in 64 doubling rounds")
      val p2 = cur.alias("a")
        .join(cur.select(col("entity_id").as("pid"), col("parent").as("pp"))
          .alias("b"), col("a.parent") === col("pid"), "left")
        .select(col("a.entity_id").as("entity_id"),
          coalesce(col("pp"), col("a.parent")).as("parent"),
          col("a.parent").as("__old"))
        .localCheckpoint()
      changed = p2.filter(col("parent") =!= col("__old")).head(1).nonEmpty
      cur = p2.select("entity_id", "parent")
    }
    val diffs = cur.alias("n")
      .join(st.select(col("entity_id"), col("parent").as("__orig")), "entity_id")
      .filter(col("parent") =!= col("__orig"))
      .count()
    parentStore.store(part, cur.select(
      col("entity_id"), col("entity_id").as("timestamp"),
      col("parent"), lit(1L).as("modified")))
    diffs
  }

  /** Fully incremental near-duplicate KEEPER assignment — the composed
    * append-only pipeline: [[lshIncremental]] candidates → KMV-sketch
    * Jaccard verify against PERSISTED per-doc sketches → union-find
    * component state with parent pointers. Each batch touches only its
    * own neighborhood: candidate generation probes the bucket store's
    * key partitions, verification reads only the candidate ids' sketch
    * partitions, and the union-find "find" is an iterative pruned
    * parent-pointer walk (paths compress on every write — after a batch,
    * every touched node points DIRECTLY at its component keeper, so the
    * next find over those nodes terminates in ≤ 2 pruned joins). Keeper
    * labels are component minima (union by min: a root is always its
    * tree's minimum, so the contracted-graph minimum is the true
    * component minimum).
    *
    * Returns one row per batch doc: (doc_id, keeper) AS OF this batch —
    * a doc emitted earlier may acquire a smaller keeper when a later
    * batch merges its component; the state reflects that, the earlier
    * emission (correctly, for an append-only log) does not.
    *
    * Stores: `buckets` keyed (band, key, entity_id) — [[lshIncremental]]
    * contract; `sketches` and `parents` keyed (entity_id), id-range
    * partitioned (timestamp = doc id). */
  def nearDupIncremental(
      bucketStore: graft.storage.PartStore,
      sketchStore: graft.storage.PartStore,
      parentStore: graft.storage.PartStore,
      batch: DataFrame, idCol: String, textCol: String,
      bands: Int, rowsPerBand: Int, shingleK: Int, sketchK: Int,
      threshold: Double, maxBucket: Int = Int.MaxValue): DataFrame = {
    require(sketchStore.config.keyCols == Seq("entity_id") &&
        parentStore.config.keyCols == Seq("entity_id"),
      "nearDupIncremental: sketch/parent stores must be keyed by entity_id")
    require(threshold > 0 && threshold <= 1,
      s"nearDupIncremental: threshold in (0, 1], got $threshold")
    // 0. ONE tokens→shingles pass, shared by the LSH signatures and the
    // KMV sketches (it feeds two full aggregations — materialize it)
    val sh = shingles(
      graft.functions.TextAnalysis.tokens(batch, idCol, textCol),
      idCol, shingleK).localCheckpoint()
    // 1. candidate pairs (>=1 batch side), from persisted bucket state
    val cand = lshIncremental(bucketStore, "buckets", batch, idCol, textCol,
      bands, rowsPerBand, shingleK, maxBucket, shinglesOpt = Some(sh))
    incrementalKeeperTail(sketchStore, parentStore, batch, idCol,
      sh, "shingle", cand, sketchK, threshold)
  }

  /** Steps 2–6 of the incremental keeper pipeline, shared by the LSH
    * ([[nearDupIncremental]]) and winnowing ([[winnowDupIncremental]])
    * candidate tiers: persist this batch's KMV sketches over `unitCol`,
    * verify candidates against STORED sketches pruned to candidate ids,
    * then fold verified pairs into the union-find parent-pointer state
    * with path compression. The tail never cares where candidates came
    * from — only that ≥1 side of each pair is a batch doc. */
  private def incrementalKeeperTail(
      sketchStore: graft.storage.PartStore,
      parentStore: graft.storage.PartStore,
      batch: DataFrame, idCol: String,
      units: DataFrame, unitCol: String,
      cand: DataFrame, sketchK: Int, threshold: Double): DataFrame = {
    // 2. persist this batch's sketches (id-range partitions). Checkpoint
    // the store input: store() executes its batch plan twice (pindex
    // probe + staged write), and this plan is the gate's most expensive —
    // a k-minima agg over the exploded distinct-gram stream (the winnow
    // tier passes units UN-checkpointed, so without this the whole
    // tokenize→explode→distinct ran twice per batch too)
    val sk = kmvDocSketches(units, idCol, unitCol, sketchK)
    sketchStore.store("sk", sk.select(
      col(idCol).cast("long").as("entity_id"),
      col(idCol).cast("long").as("timestamp"),
      col("minima"), lit(1L).as("modified")).localCheckpoint())
    // 3. verify candidates from STORED sketches, pruned to candidate ids
    def prunedByIds(
        store: graft.storage.PartStore, part: String, ids: DataFrame,
        emptyLike: DataFrame): DataFrame = {
      val psz = store.config.partitionSizeSeconds
      val pidx = ids.select(((col("node") - pmod(col("node"), lit(psz))) / psz)
        .cast("long").as("p")).distinct()
      val st = store.readPart(part)
        .getOrElse(emptyLike.withColumn("pindex", lit(0L)))
      st.join(broadcast(pidx), st("pindex") === col("p"))
    }
    // candIds has exactly ONE consumer (the probe's broadcast pidx) and
    // derives from the checkpointed cand — a localCheckpoint here was a
    // whole driver action buying nothing (r19; the distinct computes
    // inside the probe's broadcast build instead)
    val candIds = cand.select(col("id1").as("node"))
      .union(cand.select(col("id2").as("node"))).distinct()
    val skPruned = prunedByIds(sketchStore, "sk", candIds,
        sk.select(col(idCol).cast("long").as("entity_id"), col("minima")).limit(0))
      .select(col("entity_id").as("did"), col("minima"))
    val verified = containmentEstimate(skPruned, "did", cand, sketchK)
      .filter(col("jaccard_est") >= threshold)
      .select("id1", "id2").localCheckpoint()
    // 4. union-find over parent-pointer state
    val nodes0 = verified.select(col("id1").as("node"))
      .union(verified.select(col("id2").as("node")))
      .union(batch.select(col(idCol).cast("long").as("node")))
      .distinct().localCheckpoint()
    val emptyPar = nodes0.select(col("node").as("entity_id"),
      col("node").as("parent")).limit(0)
    // trivial projection of the checkpointed nodes0 — no second checkpoint
    var labels = nodes0.select(col("node"), col("node").as("root"))
    // no parent state yet (every FIRST batch) ⇒ labels are already roots;
    // the loop below would pay a full join + checkpoint + probe round to
    // discover exactly that
    var changed = parentStore.readPart("par").isDefined
    var iters = 0
    // materialize-and-probe FUSED to one action per round (r19): persist +
    // count(changed) computes the round's labels AND the convergence
    // probe in a single job, where localCheckpoint + head(1) paid two
    // (and head over a converged round escalates executeTake scans).
    // persist (not checkpoint) is safe here: the parent state is not
    // mutated until AFTER every consumer of these frames has been
    // materialized (nodeKeeper/upserts localCheckpoints below), so an
    // eviction-driven recompute re-reads identical store state. The
    // InMemoryRelation also bounds plan growth per round the way the
    // checkpoint did. All round caches are unpersisted before the store.
    val roundCaches = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    while (changed) {
      iters += 1
      require(iters <= 64,
        "nearDupIncremental: parent-pointer chains deeper than 64. Paths " +
          "compress only when touched, so a component merged in many " +
          "batches without its old members ever re-appearing can deepen; " +
          "run compactParents (pointer-doubling maintenance pass that " +
          "flattens every chain to its root) or a batch touching the " +
          "affected ids")
      val par = prunedByIds(parentStore, "par",
          labels.select(col("root").as("node")).distinct(), emptyPar)
        .select(col("entity_id"), col("parent"))
      val next = labels.join(par, labels("root") === par("entity_id"), "left")
        .select(col("node"),
          coalesce(col("parent"), col("root")).as("root2"), col("root"))
        .persist()
      roundCaches += next
      changed = next.filter(col("root2") =!= col("root")).count() > 0
      labels = next.select(col("node"), col("root2").as("root"))
    }
    // 5. components of the CONTRACTED graph (bounded by the batch
    // neighborhood, never the corpus)
    val contracted = verified
      .join(labels.select(col("node").as("id1"), col("root").as("r1")), "id1")
      .join(labels.select(col("node").as("id2"), col("root").as("r2")), "id2")
      .select(col("r1").as("id1"), col("r2").as("id2"))
      .filter(col("id1") =!= col("id2"))
    val roots = labels.select(col("root").as("id")).distinct()
    val comp = connectedKeepersStar(roots, "id", contracted)
      .select(col("id").as("root"), col("keeper"))
    // 6. path-compressing upsert: every touched node AND every old root
    // points directly at the new keeper
    val nodeKeeper = labels.join(comp, "root")
      .select(col("node"), col("keeper")).localCheckpoint()
    val upserts = nodeKeeper
      .union(comp.select(col("root").as("node"), col("keeper")))
      .distinct()
      .localCheckpoint() // store() runs its input twice; snapshot once
    // every consumer of the union-find round caches is materialized
    // (nodeKeeper + upserts are checkpointed) — release before the store
    roundCaches.foreach(_.unpersist(false))
    parentStore.store("par", upserts.select(
      col("node").as("entity_id"), col("node").as("timestamp"),
      col("keeper").as("parent"), lit(1L).as("modified")))
    batch.select(col(idCol).cast("long").as("doc_id")).distinct()
      .join(nodeKeeper.withColumnRenamed("node", "doc_id"), "doc_id")
      .localCheckpoint() // snapshot: later batches must not leak in
  }

  /** Distinct word k-shingles per document, built with window `lead` over
    * the token stream (single shuffle by doc id). */
  def shingles(tokens: DataFrame, idCol: String, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val parts = (0 until k).map {
      case 0 => col("tok")
      case i => lead(col("tok"), i).over(w)
    }
    tokens
      .select(col(idCol), concat_ws(" ", parts: _*).as("shingle"),
        lead(col("tok"), k - 1).over(w).isNotNull.as("__full"))
      .filter(col("__full")).drop("__full")
      .distinct()
  }

  /** k engine-portable hash functions of a shingle: md5 seeded by index;
    * the min over shingles is taken on the hex string (lexicographic order
    * is a total order, identical everywhere). */
  private def shingleHash(i: Int): Column = md5(concat(lit(s"$i:"), col("shingle")))

  /** MinHash signature: one aggregation computing all k minima in a single
    * pass over the shingle set. */
  def minhashSignature(sh: DataFrame, idCol: String, k: Int = 8): DataFrame =
    sh.groupBy(col(idCol))
      .agg(min(shingleHash(0)).as("h0"),
        (1 until k).map(i => min(shingleHash(i)).as(s"h$i")): _*)

  /** Production-path MinHash: xxhash64 seeded by index — ~an order of
    * magnitude cheaper per shingle than md5 and 8-byte signatures instead
    * of 32-hex strings (¼ the shuffle bytes). Same operator shape; use the
    * md5 variant when results must be reproducible by a SQL oracle. */
  def minhashSignatureXx(sh: DataFrame, idCol: String, k: Int = 8): DataFrame =
    sh.groupBy(col(idCol))
      .agg(min(xxhash64(lit(0), col("shingle"))).as("h0"),
        (1 until k).map(i => min(xxhash64(lit(i), col("shingle"))).as(s"h$i")): _*)

  /** Per-document KMV sketches over a (id, valueCol) stream — ≤k longs
    * per doc however long the doc is, the bounded-state per-doc summary
    * [[containmentEstimate]] consumes. */
  def kmvDocSketches(
      values: DataFrame, idCol: String, valueCol: String, k: Int): DataFrame = {
    val hv = conv(substring(md5(col(valueCol)), 1, 13), 16, 10).cast("long")
    values.groupBy(col(idCol))
      .agg(graft.expressions.MinKLongs.mink(hv, k).as("minima"))
  }

  /** Asymmetric CONTAINMENT |A∩B| / |A| estimated per candidate pair
    * from per-doc KMV sketches (Broder 1997's containment via the
    * union-X construction, public): the quote/subset signal Jaccard
    * under-scores — a short doc fully quoted inside a long one has tiny
    * Jaccard but containment ≈ 1, which is exactly what curation wants
    * to catch before dropping the "duplicate". Per pair: X = k smallest
    * of the sketch union, J ≈ |X∩A∩B|/|X|, |A∩B| ≈ J·|A∪B|_KMV,
    * containment ≈ |A∩B| / |A|_KMV.
    *
    * `pairs` (id1, id2) comes from any candidate tier (LSH buckets);
    * the join ships two ≤k arrays per pair — never shingle sets. Exact
    * whenever both docs have < k distinct values (sketch == set). */
  def containmentEstimate(
      sketches: DataFrame, idCol: String, pairs: DataFrame, k: Int): DataFrame = {
    require(k >= 2, s"containmentEstimate: k >= 2, got $k")
    val space = graft.functions.TextAnalysis.KmvHashSpace
    def kmvEst(arr: Column): Column =
      when(size(arr) < k, size(arr).cast("double"))
        .otherwise(lit((k - 1).toDouble) * lit(space) /
          element_at(arr, k).cast("double"))
    val x = slice(array_sort(array_distinct(concat(col("ma"), col("mb")))), 1, k)
    pairs
      .join(sketches.select(col(idCol).as("id1"), col("minima").as("ma")), "id1")
      .join(sketches.select(col(idCol).as("id2"), col("minima").as("mb")), "id2")
      .select(col("id1"), col("id2"), col("ma"), col("mb"), x.as("x"))
      .select(col("id1"), col("id2"),
        size(col("ma")).cast("long").as("n_a"),
        size(col("x")).cast("long").as("kx"),
        size(array_intersect(array_intersect(col("x"), col("ma")), col("mb")))
          .cast("long").as("y"),
        kmvEst(col("ma")).as("est_a"),
        kmvEst(col("x")).as("est_union"))
      // Degenerate sketches (a doc with zero values → empty minima, so
      // kx = 0 or est_a = 0) would produce 0/0 = NaN and poison every
      // downstream comparison; emit NULL instead — "no estimate", the
      // SQL-idiomatic value a threshold filter drops naturally.
      .withColumn("jaccard_est",
        when(col("kx") > 0, col("y").cast("double") / col("kx").cast("double")))
      .withColumn("containment_est",
        when(col("est_a") > 0.0,
          col("jaccard_est") * col("est_union") / col("est_a")))
  }

  /** Candidate-pair probability of the banding scheme at Jaccard s:
    * P = 1 − (1 − s^r)^b (the MMDS S-curve, public). */
  def lshCurve(bands: Int, rowsPerBand: Int, s: Double): Double =
    1.0 - math.pow(1.0 - math.pow(s, rowsPerBand), bands)

  /** Pick (bands, rowsPerBand) for a Jaccard `threshold` under a total
    * signature budget of at most `kBudget` components (b·r ≤ kBudget):
    * the standard MMDS tuning — among all exact factorizations, choose
    * the one whose S-curve midpoint (the s where P = 0.5, s = (1/b)^(1/r))
    * sits closest to the threshold. Ties prefer more rows per band
    * (steeper curve ⇒ fewer false-positive candidate pairs, the expensive
    * failure at corpus scale: every FP is a verify-join row).
    * Driver-side pure arithmetic — use before [[minhashSignature]] /
    * [[lshBuckets]] instead of hand-picking (b, r). */
  def lshTune(threshold: Double, kBudget: Int): (Int, Int) = {
    require(threshold > 0 && threshold < 1, s"lshTune: threshold in (0,1), got $threshold")
    require(kBudget >= 2, s"lshTune: budget >= 2, got $kBudget")
    val options = for {
      r <- 1 to kBudget
      b <- 1 to kBudget / r
      if b * r >= 2
    } yield {
      val midpoint = math.pow(1.0 / b, 1.0 / r)
      (math.abs(midpoint - threshold), -r, b, r)
    }
    val best = options.min
    (best._3, best._4)
  }

  /** LSH banding: `bands` bands of `rowsPerBand` signature components; a
    * candidate pair shares at least one full band. Returns (band, key, id). */
  def lshBuckets(sig: DataFrame, idCol: String, bands: Int, rowsPerBand: Int): DataFrame = {
    val bandCols = (0 until bands).map { b =>
      val parts = (0 until rowsPerBand).map(r => col(s"h${b * rowsPerBand + r}"))
      struct(lit(b).as("band"), md5(concat(parts: _*)).as("key"))
    }
    sig.select(col(idCol), explode(array(bandCols: _*)).as("bk"))
      .select(col(idCol), col("bk.band").as("band"), col("bk.key").as("key"))
  }

  /** Candidate pairs from LSH buckets (id1 < id2, distinct).
    *
    * `maxBucket` caps degenerate buckets: a (band, key) shared by m docs
    * emits m² pairs, and a pathological key (empty docs, boilerplate) can
    * have m in the millions at 100 TB while carrying no discriminative
    * signal. The cap is `SkewOps.keepSmallKeys` — a map-side-combined size
    * aggregate joined back on (band, key), skew-immune where a window count
    * would buffer the entire hot bucket on one task; output bounded at
    * |bucket|≤maxBucket ⇒ ≤ maxBucket² pairs/bucket. */
  def lshCandidates(
      buckets: DataFrame, idCol: String, maxBucket: Int = Int.MaxValue): DataFrame = {
    val capped =
      if (maxBucket == Int.MaxValue) buckets
      else SkewOps.keepSmallKeys(buckets, Seq("band", "key"), maxBucket)
    val a = capped.alias("a")
    val b = capped.alias("b")
    a.join(b, col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
        col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id1"), col(s"b.$idCol").as("id2"))
      .distinct()
  }

  /** MinHash Jaccard ESTIMATE for candidate pairs: the fraction of
    * signature components on which the two documents agree — an unbiased
    * estimator of the true Jaccard (each min-hash collides with probability
    * J). This is the cheap verify tier between LSH banding and the exact
    * shingle-join [[jaccardPairs]]: per pair it reads 2k signature values
    * instead of re-joining shingle sets, so a 100 TB pipeline can discard
    * most false-positive candidates before paying the exact join.
    *
    * Scale shape: two hash-joins of the pair list against the signature
    * table (shuffle keyed by doc id, ∝ |pairs| + |docs|), then a pure
    * projection — no explode, no window. */
  def minhashEstimate(
      sig: DataFrame, pairs: DataFrame, idCol: String, k: Int): DataFrame = {
    val a = sig.alias("sa")
    val b = sig.alias("sb")
    val nMatch = (0 until k)
      .map(i => when(col(s"sa.h$i") === col(s"sb.h$i"), 1L).otherwise(0L))
      .reduce(_ + _)
    pairs.select("id1", "id2")
      .join(a, col("id1") === col(s"sa.$idCol"))
      .join(b, col("id2") === col(s"sb.$idCol"))
      .select(col("id1"), col("id2"), nMatch.as("n_match"))
      .withColumn("est_jaccard", col("n_match").cast("double") / k)
  }

  /** Distinct (idCol, __cp) token positions covered by a corpus-duplicated
    * n-gram — the shared core of [[duplicatedSpans]] (detect) and
    * [[removeDuplicatedSpans]] (transform).
    *
    * Scale shape: n-gram construction is one per-doc window (bounded by
    * document length), corpus counts are a map-side-combined aggregate on
    * the gram key, and coverage is an n-wide position explode re-aggregated
    * by (id, pos). The gram-keyed join skews exactly on the grams that ARE
    * duplicated (the signal — they cannot be capped away), and AQE's
    * skew-join rule can NOT help: the dup-gram side finishes its count
    * aggregate between its shuffle and the join, so the join's children
    * are never the bare shuffle stages the rule pattern-matches
    * (empirically confirmed by `tools.SkewDrive`). The salted join is the
    * mechanism that actually holds at scale: occurrence rows carry a
    * deterministic per-row salt and the one-row-per-dup-gram build side
    * is replicated across all `salt` values, spreading a hot gram's
    * occurrences over `salt` reduce tasks. Results are identical for any
    * salt (spec-asserted); the cost is |dup grams|·salt build rows. */
  private def coveredPositions(
      tokens: DataFrame, idCol: String, n: Int, salt: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val parts = (0 until n).map {
      case 0 => col("tok")
      case i => lead(col("tok"), i).over(w)
    }
    val occ = tokens
      .select(col(idCol), col("pos"), concat_ws(" ", parts: _*).as("__g"),
        lead(col("tok"), n - 1).over(w).isNotNull.as("__full"))
      .filter(col("__full")).drop("__full")
    val dupGrams = occ.groupBy("__g").agg(count(lit(1)).as("__c"))
      .filter(col("__c") > 1).select("__g")
    val joined =
      if (salt <= 1) occ.join(dupGrams, "__g")
      else occ
        .withColumn("__s", pmod(xxhash64(col(idCol), col("pos")), lit(salt.toLong)))
        .join(dupGrams.withColumn("__s",
          explode(sequence(lit(0L), lit(salt.toLong - 1)))), Seq("__g", "__s"))
    joined
      .select(col(idCol), explode(sequence(col("pos"), col("pos") + (n - 1))).as("__cp"))
      .distinct()
  }

  /** Duplicated n-gram span coverage (the detection half of exact-substring
    * dedup, Lee et al. 2022 "Deduplicating Training Data Makes Language
    * Models Better", public): a token position is duplicated when it is
    * covered by any word n-gram occurring MORE THAN ONCE in the corpus
    * (across or within documents). Reports per-doc duplicated-token counts
    * and the fraction; `flagAt` sets the drop-threshold flag. */
  def duplicatedSpans(
      tokens: DataFrame, idCol: String, n: Int,
      flagAt: Double = 0.5, salt: Int = 16): DataFrame = {
    val covered = coveredPositions(tokens, idCol, n, salt)
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_dup_tokens"))
    val totals = tokens.groupBy(col(idCol)).agg(count(lit(1)).as("n_tokens"))
    totals.join(covered, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("n_dup_tokens"), lit(0L)).as("n_dup_tokens"))
      .withColumn("dup_frac",
        col("n_dup_tokens").cast("double") / col("n_tokens"))
      .withColumn("flag_dup", col("dup_frac") >= flagAt)
  }

  /** Duplicated-span REMOVAL (the transform half of exact-substring dedup,
    * RefinedWeb/C4-style "drop every occurrence"): rebuild each document
    * from the tokens NOT covered by any corpus-duplicated n-gram,
    * preserving token order. Returns (id, n_tokens, n_kept, clean_text);
    * a fully-duplicated document keeps its row with empty text.
    *
    * Scale shape: [[coveredPositions]]'s pipelines plus one anti-join on
    * (id, pos) and the ordered sorted-struct reassembly [[CorpusClean
    * .boilerplateLines]] already carries — per-doc state bounded by
    * document length. */
  def removeDuplicatedSpans(
      tokens: DataFrame, idCol: String, n: Int, salt: Int = 16): DataFrame = {
    val cov = coveredPositions(tokens, idCol, n, salt)
      .withColumnRenamed(idCol, "__cid")
    val kept = tokens
      .join(cov, tokens(idCol) === cov("__cid") && tokens("pos") === cov("__cp"),
        "left_anti")
    val rebuilt = kept.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_kept"),
      array_join(
        transform(array_sort(collect_list(struct(col("pos").as("p"),
          col("tok").as("t")))), s => s.getField("t")), " ").as("clean_text"))
    val totals = tokens.groupBy(col(idCol)).agg(count(lit(1)).as("n_tokens"))
    totals.join(rebuilt, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Exact Jaccard for pairs: |A∩B| / |A∪B| via a shingle equi-join —
    * deterministic (integer counts, one double division at the end).
    *
    * `maxDocFreq` caps hot shingles: a shingle present in f documents emits
    * f² join rows, and boilerplate shingles ("click here to", license
    * headers) have f ∝ corpus size while carrying no near-dup signal —
    * standard LSH hygiene drops them (cf. stop-word removal). The doc-freq
    * filter is `SkewOps.keepSmallKeys` on shingle — a partial-aggregated
    * frequency table joined back, skew-immune for exactly the hot shingles
    * it drops — applied BEFORE the join, with per-doc counts computed on
    * the filtered universe so the Jaccard estimate stays internally
    * consistent. */
  def jaccardPairs(
      sh0: DataFrame, idCol: String, threshold: Double,
      maxDocFreq: Int = Int.MaxValue): DataFrame = {
    // PRECONDITION: sh0 must be DISTINCT (id, shingle) rows — `shingles`
    // guarantees this; both the set-size counts below AND the doc-freq
    // window count rely on it (a repeated (id, shingle) would inflate
    // both the Jaccard denominator and the frequency cap).
    val sh =
      if (maxDocFreq == Int.MaxValue) sh0
      else SkewOps.keepSmallKeys(sh0, Seq("shingle"), maxDocFreq)
    val counts = sh.groupBy(col(idCol)).agg(count(lit(1)).as("n"))
    val a = sh.alias("a")
    val b = sh.alias("b")
    val inter = a.join(b, col("a.shingle") === col("b.shingle") &&
        col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("id1"), col(s"b.$idCol").as("id2"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(counts.select(col(idCol).as("id1"), col("n").as("n1")), "id1")
      .join(counts.select(col(idCol).as("id2"), col("n").as("n2")), "id2")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("n1") + col("n2") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("id1", "id2", "inter", "jaccard")
  }

  /** Embedding-cosine near-dup: LSH-bucketed candidate pairs at
    * `minCos` over an embedding column, folded to a per-document keeper =
    * the smallest neighbor id (single-pass min-label; iterate to fixpoint
    * for full connected components at scale — each pass is this same
    * aggregate). Docs with no near-dup keep themselves. The embedding can
    * come from any embedder; `TextAnalysis.hashEmbedding` is the
    * deterministic built-in. */
  def embeddingNearDups(
      emb: DataFrame, idCol: String, vecCol: String,
      nBits: Int, minCos: Double, maxBucket: Int = Int.MaxValue): DataFrame = {
    val pairs = Similarity.bucketedNeighbors(emb, idCol, vecCol, nBits, minCos, maxBucket)
    val minNeighbor = pairs.groupBy(col("id2").as(idCol))
      .agg(min(col("id1")).as("__mn"))
    emb.select(col(idCol))
      .join(minNeighbor, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("__mn"), col(idCol)).as("keeper"))
  }

  /** Connected-component keeper selection over duplicate pairs: min-label
    * propagation to fixpoint (the Pregel-style Spark CC loop) — a doc's
    * keeper is the smallest id REACHABLE through the duplicate graph, so
    * chains a~b~c collapse to one keeper where the single-pass
    * `embeddingNearDups` fold would keep two.
    *
    * Each iteration computes the expensive aggregate ONCE: the per-id
    * min-label aggregate carries the previous label alongside (min ignores
    * the nulls on neighbor rows) plus a plain `when`-expression change flag
    * (fully codegen'd — no UDF anywhere in the loop), and `localCheckpoint`
    * materializes it. Convergence then probes the CHECKPOINTED blocks for
    * any changed row (`head(1)` short-circuits at the first hit) — a
    * memory-local scan of already-computed results, never a recompute of
    * the aggregate. `localCheckpoint` truncates lineage per round so the
    * plan doesn't grow with iterations. Iteration count is the component
    * diameter — near-dup clusters are shallow (dozens of rounds would mean
    * a pathological duplicate chain; `maxIter` bounds it). The fixpoint
    * label is order-independent, so any engine computing true components
    * agrees.
    *
    * Ids keep their original type — label propagation needs only a total
    * order, so string doc ids work as well as longs (a cast would null
    * non-numeric ids and silently collapse every row into one group). */
  def connectedKeepers(
      all: DataFrame, idCol: String, pairs: DataFrame,
      maxIter: Int = 20): DataFrame = {
    val edges = pairs.select(col("id1").as("src"), col("id2").as("dst"))
      .unionByName(pairs.select(col("id2").as("src"), col("id1").as("dst")))
    var labels = all.select(col(idCol).as("id"))
      .withColumn("label", col("id"))
    val labelType = labels.schema("label").dataType
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val fromNeighbors = edges.join(labels, edges("src") === labels("id"))
        .select(col("dst").as("id"), col("label"),
          lit(null).cast(labelType).as("prev"))
      val checkpointed = labels
        .select(col("id"), col("label"), col("label").as("prev"))
        .unionByName(fromNeighbors)
        .groupBy("id").agg(min("label").as("label"), min("prev").as("prev"))
        .select(col("id"), col("label"),
          (!(col("label") <=> col("prev"))).as("__changed"))
        .localCheckpoint()
      converged = checkpointed.filter(col("__changed")).head(1).isEmpty
      labels = checkpointed.drop("__changed")
      i += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedKeepers did not converge in $maxIter iterations — " +
          "a duplicate chain deeper than the bound; raise maxIter " +
          "(silently returning partial labels would disagree with any " +
          "exact component computation)")
    labels.select(col("id").as(idCol), col("label").as("keeper"))
  }

  /** Connected components via alternating large-star / small-star
    * (Kiveris et al. 2014, "Connected Components in MapReduce and
    * Beyond" — public): same output contract as [[connectedKeepers]]
    * ((id, keeper = component minimum)), different convergence class.
    * The min-label fixpoint needs O(diameter) rounds — a duplicate CHAIN
    * (doc A ≈ B ≈ C ≈ …, each adjacent pair a near-dup but the ends
    * unrelated) of depth d pays d shuffles. Star contraction converges
    * in O(log n) rounds regardless of diameter, which is the difference
    * between 15 and 50+ iterations on the pathological chains web-scale
    * near-dup graphs actually contain.
    *
    * Each round: large-star hangs every neighbor LARGER than u off
    * min(Γ(u) ∪ {u}); small-star re-hangs the smaller neighbors. Both
    * are one groupBy + one join on the edge frame (edges only shrink
    * toward star form, never multiply past 2|E|), lineage cut per round
    * with localCheckpoint like the fixpoint loop. Convergence = the edge
    * set is round-stable (exact: count + one-sided anti check on
    * distinct sets), then every surviving edge IS (node, component min).
    * Ids need only be orderable — numeric and string both work. */
  /** Edge-count cutoff below which [[connectedKeepersStar]] union-finds on
    * the driver. The honest memory bound at 1M edges is NOT "two longs
    * per edge": the collected Tuple2 array is ~48 MB, the union-find
    * HashMap boxes up to 2M (key, parent) entries (~80 MB), and the label
    * frame embeds up to 2M local rows in the plan before broadcast —
    * a few hundred MB of TRANSIENT driver heap, comfortably inside a
    * multi-GB driver but not the "≲32 MB" the r17 comment claimed. */
  val ConnectedDriverMaxEdges: Long = 1L << 20

  def connectedKeepersStar(
      all: DataFrame, idCol: String, pairs: DataFrame,
      maxIter: Int = 20,
      driverMaxEdges: Long = ConnectedDriverMaxEdges): DataFrame = {
    def largeStar(e: DataFrame): DataFrame = {
      val nbrs = e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
      val m = nbrs.groupBy("u").agg(min("v").as("__mn"))
        .select(col("u"), least(col("__mn"), col("u")).as("m"))
      nbrs.join(m, "u").filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
    }
    def smallStar(e: DataFrame): DataFrame = {
      val directed = e.select(greatest(col("u"), col("v")).as("u"),
          least(col("u"), col("v")).as("v"))
        .filter(col("u") =!= col("v")).distinct()
      val m = directed.groupBy("u").agg(min("v").as("m"))
      directed.join(m, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .unionByName(m.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v"))
        .distinct()
    }
    var edges = pairs
      .select(col("id1").as("u"), col("id2").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct().localCheckpoint()
    val nEdges = edges.count() // checkpointed — a cached-count action
    // shortcut 1: no edges ⇒ everyone keeps themselves; skip the loop's
    // fixed per-round cost (2 star passes + checkpoint + set-equality)
    if (nEdges == 0)
      return all.select(col(idCol), col(idCol).as("keeper"))
    // shortcut 2: a BOUNDED long-id edge set union-finds on the driver in
    // milliseconds — the star loop pays ~4 Spark actions per round, pure
    // fixed cost when the contracted graph is thousands of edges (the
    // incremental keeper gates' every batch). The cutoff is an exact
    // count on checkpointed data, so the collect is provably bounded
    // (a few hundred MB transient at the 1M default — see
    // [[ConnectedDriverMaxEdges]] for the honest accounting); anything
    // larger, or non-long ids (keeper must keep the id's type), takes
    // the distributed loop — the 100 TB path is unchanged. The collect
    // goes through the (Long, Long) encoder, not Row: specialized
    // tuples, no per-field boxing in the collected array.
    val idType = edges.schema("u").dataType
    if (nEdges <= driverMaxEdges &&
        idType == org.apache.spark.sql.types.LongType &&
        edges.schema("v").dataType == org.apache.spark.sql.types.LongType) {
      val es = edges.as[(Long, Long)](
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong)).collect()
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        // union by MIN: the root is always its component's minimum, the
        // same keeper the star loop converges to
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct
      val sp = all.sparkSession
      import sp.implicits._
      val lab = nodes.map(x => (x, find(x))).toSeq.toDF("__id", "keeper")
      return all.select(col(idCol))
        .join(broadcast(lab), all(idCol) === lab("__id"), "left")
        .select(col(idCol), coalesce(col("keeper"), col(idCol)).as("keeper"))
    }
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val next = smallStar(largeStar(edges)).localCheckpoint()
      // both sides are distinct sets: equal counts + empty one-sided
      // difference ⇔ set equality (exact, not a checksum heuristic)
      converged = next.count() == edges.count() &&
        next.join(edges, Seq("u", "v"), "left_anti").head(1).isEmpty
      edges = next
      i += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedKeepersStar did not converge in $maxIter rounds — " +
          "pathological beyond the O(log n) bound; raise maxIter " +
          "(partial star edges would mislabel components)")
    val lab = edges.groupBy("u").agg(min("v").as("keeper"))
      .select(col("u").as("__id"), col("keeper"))
    all.select(col(idCol))
      .join(lab, all(idCol) === lab("__id"), "left")
      .select(col(idCol), coalesce(col("keeper"), col(idCol)).as("keeper"))
  }

  /** Re-choose each duplicate cluster's representative by QUALITY: given
    * component labels ((id, component) — e.g. [[connectedKeepers]]
    * output) and a per-document score, returns (id, component, rep_id)
    * with rep_id = argmax(score, ties → smallest id) within the component
    * — "keep the longest / highest-quality copy", the keep policy real
    * dedup pipelines apply where a min-id keeper would keep an arbitrary
    * one. Two aggregates over |docs| (per-component max score, then min id
    * among rows attaining it) and a |components|-sized join back; no
    * window, no per-cluster sort, and — like [[connectedKeepers]] — ids
    * keep their original type: the tie-break is an order-based `min`, so
    * string doc ids work as well as longs (the obvious one-pass
    * `max(struct(score, -id))` trick would cast a string id to NULL and
    * overflow at Long.MinValue). Both aggregates and the final join hash
    * on `componentCol`, so the exchange is reused across stages. */
  def clusterRepresentatives(
      labels: DataFrame, idCol: String, componentCol: String,
      scored: DataFrame, scoreCol: String): DataFrame = {
    val withScore = labels.join(scored, Seq(idCol))
    val best = withScore.groupBy(col(componentCol))
      .agg(max(col(scoreCol)).as("__best"))
    val reps = withScore.join(best, Seq(componentCol))
      .filter(col(scoreCol) <=> col("__best"))
      .groupBy(col(componentCol))
      .agg(min(col(idCol)).as("rep_id"))
    labels.join(reps, Seq(componentCol))
      .select(col(idCol), col(componentCol), col("rep_id"))
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023, public): cluster
    * the corpus into IVF cells, compare embeddings ONLY within a cell, and
    * where a pair exceeds `minCos` keep the most-outlying copy — the one
    * LEAST similar to its cell centroid (the paper's keep policy: outliers
    * carry more information than cluster-core near-duplicates).
    *
    * Exact semantics (deterministic, engine-reproducible): a document is
    * dropped iff some same-cell neighbor with pair-cosine ≥ `minCos`
    * precedes it in (centroid_cos ASC, id ASC) order. The minimal element
    * of every duplicate neighborhood always survives, and the rule is
    * pairwise — no component computation (compose with
    * [[connectedKeepers]] when transitive-closure semantics are wanted).
    *
    * Scale shape: assignment is one codegen'd argmax pass over the corpus
    * ([[graft.functions.Similarity.ivfAssign]] — centroid cos and cell
    * from ONE array_max); candidate pairs are an equi-join on the cell
    * key, so the all-pairs N² never appears — pair work is Σ|cell|²,
    * bounded by the codebook size k (the SemDeDup knob: k grows with the
    * corpus so cells stay bounded); the dominance filter and the distinct
    * dropped-id set ride the same cell-hashed exchange. PRECONDITION:
    * non-zero vectors (a zero vector's cosine is NaN, which no engine
    * pair compares alike).
    *
    * `maxCell` is the degenerate-cell guard-rail (the [[lshCandidates]]
    * `maxBucket` pattern via [[graft.operators.SkewOps.keepSmallKeys]]):
    * a cell larger than `maxCell` — constant embeddings, or k sized far
    * below the corpus — is EXCLUDED from pair generation, so its docs all
    * keep and pair work stays ≤ Σ min(|cell|, maxCell)². Failing open
    * (keep, don't dedup) is the safe direction for training data; the
    * principled fix for recurring oversized cells is growing k.
    *
    * Output: one row per input doc — (id, cell, centroid_cos, keep). */
  def semanticDedup(
      emb: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[(Int, Seq[Float])], minCos: Double,
      maxCell: Int = Int.MaxValue): DataFrame = {
    val assigned = emb
      .select(col(idCol), col(vecCol).as("__v"),
        Similarity.ivfAssign(col(vecCol), centroids).as("__a"))
      .select(col(idCol), col("__v"),
        col("__a").getField("i").as("cell"),
        col("__a").getField("c").as("centroid_cos"))
    val paired =
      if (maxCell == Int.MaxValue) assigned
      else SkewOps.keepSmallKeys(assigned, Seq("cell"), maxCell)
    val cand = paired.select(col("cell"), col(idCol).as("__did"),
      col("__v").as("__dv"), col("centroid_cos").as("__dcc"))
    val dom = paired.select(col("cell"), col(idCol).as("__nid"),
      col("__v").as("__nv"), col("centroid_cos").as("__ncc"))
    val dropped = cand.join(dom, Seq("cell"))
      .filter(col("__nid") =!= col("__did"))
      .filter(col("__ncc") < col("__dcc") ||
        (col("__ncc") === col("__dcc") && col("__nid") < col("__did")))
      .filter(Similarity.cosine(col("__dv"), col("__nv")) >= minCos)
      .select(col("__did").as(idCol)).distinct()
      .withColumn("__drop", lit(true))
    assigned.join(dropped, Seq(idCol), "left")
      .select(col(idCol), col("cell"), col("centroid_cos"),
        col("__drop").isNull.as("keep"))
  }

  /** Eval-set decontamination (the GPT-3/C4/PaLM-style n-gram overlap
    * check): per training document, count distinct shingles shared with the
    * eval set and flag docs at ≥ `minOverlap` hits.
    *
    * Scale shape: the eval side is benchmark-sized (≤10⁶ shingles) while
    * the training corpus is the 100 TB side — the eval shingle set is
    * BROADCAST, so the corpus-side shingles stream through a broadcast
    * join and the only shuffle is the per-doc count aggregate (map-side
    * combined, ∝ |docs|). PRECONDITION: `docShingles` is distinct
    * (id, shingle) rows — [[shingles]] guarantees this; overlap counts are
    * set-intersection sizes. Docs with no shingles (NULL/short text) have
    * no row, mirroring the shingle universe. */
  def contamination(
      docShingles: DataFrame, evalShingles: DataFrame, idCol: String,
      minOverlap: Long = 1L): DataFrame = {
    val evalSet = broadcast(evalShingles.select(col("shingle")).distinct())
    val total = docShingles.groupBy(col(idCol))
      .agg(count(lit(1)).as("doc_ngrams"))
    val hits = docShingles.join(evalSet, "shingle")
      .groupBy(col(idCol)).agg(count(lit(1)).as("overlap_ngrams"))
    total.join(hits, Seq(idCol), "left")
      .select(col(idCol), col("doc_ngrams"),
        coalesce(col("overlap_ngrams"), lit(0L)).as("overlap_ngrams"),
        (coalesce(col("overlap_ngrams"), lit(0L)) >= minOverlap).as("contaminated"))
  }

  /** [[contamination]] for an eval set too large to broadcast as an exact
    * set: a Bloom filter of the eval shingles is embedded as a literal
    * and prunes the corpus side BEFORE the exact confirm join — the same
    * two-tier shape as LSH-then-Jaccard. The final counts are
    * bloom-independent (false positives die in the confirm join, `fpp`
    * only tunes how much corpus survives the prefilter), so results are
    * deterministic and equal [[contamination]]'s exactly (spec-asserted).
    *
    * Scale shape: tier 1 is Spark's codegen'd `might_contain` expression
    * streaming over corpus shingles (no exchange); tier 2 shuffles ONLY
    * the surviving ≈ (hits + fpp·|corpus shingles|) rows against the eval
    * set — the exchange that [[contamination]] avoids by broadcasting is
    * here paid only by the pruned residue. The sketch is built with an
    * uncapped `treeAggregate` over `xxhash64` values (order-independent
    * bit-set union → deterministic; putLong/mightContainLong
    * byte-parity with the codegen'd probe is probe-verified) — NOT with
    * `BloomFilterAggregate`/`stat.bloomFilter`, which silently clamp to
    * 8 MB (`spark.sql.optimizer.runtime.bloomFilter.maxNumBits`):
    * ~0.07 bits/item at a 10⁹-shingle eval set, i.e. fpp → 1 and a
    * prefilter that prunes nothing. Sketch bytes ride in the task binary:
    * ~0.9 MB per 10⁶ eval shingles at fpp=0.03, so literal shipping is
    * comfortable to ~10⁸ items; beyond that raise `fpp` (prefilter-only
    * correctness lets it trade freely) or split the eval set.
    * `expectedEvalNgrams` sizes the sketch; ≤ 0 derives it with one count
    * over the eval side. */
  def contaminationBloom(
      docShingles: DataFrame, evalShingles: DataFrame, idCol: String,
      minOverlap: Long = 1L, expectedEvalNgrams: Long = -1L,
      fpp: Double = 0.03): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.types.BinaryType
    // one computation of the (possibly expensively derived) eval side
    // feeds the count, the sketch build and the confirm join
    val evalSet = evalShingles.select(col("shingle")).distinct()
      .localCheckpoint()
    val nItems =
      if (expectedEvalNgrams > 0) expectedEvalNgrams
      else math.max(1L, evalSet.count())
    val bloom = evalSet.select(xxhash64(col("shingle")).as("h"))
      .rdd.map(_.getLong(0))
      .treeAggregate(
        org.apache.spark.util.sketch.BloomFilter.create(nItems, fpp))(
        (bf, h) => { bf.putLong(h); bf },
        (a, b) => { a.mergeInPlace(b); a })
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    // the sketch ships as a plan literal serialized into every task
    // binary: past a few hundred MB that fails opaquely (broadcast/plan
    // blowup) — refuse loudly with the actionable knobs instead
    require(bos.size() <= (512 << 20),
      f"contaminationBloom sketch is ${bos.size() / 1048576}%d MB " +
        "(> 512 MB literal-shipping ceiling): raise fpp (the confirm join " +
        "keeps results exact) or split the eval set into multiple passes")
    val mightContain = GraftBridge.column(BloomFilterMightContain(
      Literal(bos.toByteArray, BinaryType),
      GraftBridge.expression(xxhash64(col("shingle")))))
    val hits = docShingles.filter(mightContain)
      .join(evalSet, "shingle")
      .groupBy(col(idCol)).agg(count(lit(1)).as("overlap_ngrams"))
    val total = docShingles.groupBy(col(idCol))
      .agg(count(lit(1)).as("doc_ngrams"))
    total.join(hits, Seq(idCol), "left")
      .select(col(idCol), col("doc_ngrams"),
        coalesce(col("overlap_ngrams"), lit(0L)).as("overlap_ngrams"),
        (coalesce(col("overlap_ngrams"), lit(0L)) >= minOverlap).as("contaminated"))
  }

  /** SimHash near-dup pairs by Hamming ball (Manku et al. 2007's
    * multi-index approach, public): the 16-bit signature splits into 4
    * nibble bands — by pigeonhole, any pair within Hamming distance
    * `maxHam` ≤ 3 agrees on at least one whole band, so banding is EXACT
    * for the ball, not probabilistic. Candidates share a (band, key)
    * bucket; the verify is one codegen'd `bit_count(xor)` per pair.
    *
    * Scale shape: identical to [[lshCandidates]] — a capped equi-join on
    * the band key (`maxBucket` via [[SkewOps.keepSmallKeys]] for degenerate
    * signatures), shuffle ∝ bucket sizes, never all-pairs. */
  def simhashNearDups(
      sig: DataFrame, idCol: String, maxHam: Int = 3,
      maxBucket: Int = Int.MaxValue): DataFrame = {
    require(maxHam <= 3,
      s"4-band pigeonhole covers Hamming <= 3; maxHam=$maxHam needs more bands")
    val bandCols = (0 until 4).map { b =>
      struct(lit(b).as("band"),
        (shiftright(col("simhash"), 4 * b) % 16).as("key"))
    }
    val buckets0 = sig.select(col(idCol), col("simhash"),
        explode(array(bandCols: _*)).as("bk"))
      .select(col(idCol), col("simhash"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    val buckets =
      if (maxBucket == Int.MaxValue) buckets0
      else SkewOps.keepSmallKeys(buckets0, Seq("band", "key"), maxBucket)
    val a = buckets.alias("a")
    val b = buckets.alias("b")
    a.join(b, col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
        col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id1"), col(s"b.$idCol").as("id2"),
        col("a.simhash").as("h1"), col("b.simhash").as("h2"))
      .distinct()
      .withColumn("hamming",
        bit_count(col("h1").bitwiseXOR(col("h2"))).cast("long"))
      .filter(col("hamming") <= maxHam)
      .select("id1", "id2", "hamming")
  }

  // ---- exact-substring dedup via distributed suffix ranks ----

  private def globalDenseRank(
      distinctKeys: DataFrame, keyCols: Seq[String]): DataFrame =
    Ranks.globalDenseRank(distinctKeys, keyCols)

  /** Longest duplicated span per document via DISTRIBUTED PREFIX-DOUBLING
    * suffix ranks — the suffix-array formulation of exact-substring dedup
    * (Lee et al. 2022 §4.1 use a suffix array over the concatenated
    * corpus; [[duplicatedSpans]] is the fixed-n gram approximation, this
    * is the exact longest-match form). Manber & Myers' doubling, batch-
    * reformulated:
    *
    * 1. positions: each doc's first `2^rounds` tokens at global position
    *    gpos = doc_id · 2^(rounds+1) + pos — the per-doc address blocks
    *    are 2× the cap, so no shifted probe (pos + acc < 2·cap) ever
    *    lands in another document: document boundaries need no separator
    *    sentinels, out-of-range probes ARE the sentinels.
    * 2. rank₀ = dense rank of md5(tok) (md5 so the Spark and oracle
    *    orders agree byte-for-byte regardless of collation; ANY shared
    *    total token order yields the same blocks of equal suffixes,
    *    which is all duplication detection needs).
    * 3. rounds k = 0..rounds−1: rank_{k+1} = dense rank of the pair
    *    (rank_k[p], rank_k[p + 2^k]), missing positions → the unique
    *    negative sentinel −(p + 2^k) − 1. Each round is one self-join on
    *    the shifted position + one [[globalDenseRank]] — O(log cap)
    *    linear shuffles, the "sorted rounds" of the public distributed
    *    suffix-array constructions (Flick & Aluru 2015).
    * 4. final total order: (rank_R, gpos) ranked — a strict permutation
    *    (identical truncated docs tie-break by position), so the sorted
    *    neighbor is an equi-join on rank + 1.
    * 5. LCP(adjacent) by descending doubling: for k = rounds−1..0, if
    *    rank_k[a + acc] = rank_k[b + acc] then acc += 2^k — 2·rounds
    *    equi-joins against the kept round tables, no sequential Kasai
    *    scan. A position's longest duplicated prefix is its max LCP with
    *    either sorted neighbor (spans cap at 2^rounds − 1 tokens).
    *
    * Output per doc: (doc_id, n_tokens, max_dup, n_dup_pos) where
    * max_dup = the longest span starting in the doc that occurs ≥ 2
    * times anywhere in the corpus (including within the same doc) and
    * n_dup_pos = positions whose duplicated prefix is ≥ `minLen`.
    * Deterministic integers end to end — oracle-replayable as chained
    * dense_rank CTEs. */
  def suffixDupSpans(
      docs: DataFrame, idCol: String, textCol: String,
      minLen: Int = 8, rounds: Int = 7): DataFrame = {
    require(rounds >= 1 && rounds <= 16, s"suffixDupSpans: rounds in [1,16], got $rounds")
    val cap = 1 << rounds
    val block = 2L << rounds
    val toks = docs
      .select(col(idCol).cast("long").as("__doc"),
        posexplode(split(trim(col(textCol)), "\\s+")).as(Seq("pos", "tok")))
      .filter(col("tok") =!= "" && col("pos") < cap)
      .select(col("__doc"), (col("__doc") * block + col("pos")).as("gpos"),
        col("tok"))
      .localCheckpoint()
    // negative ids would interleave block address ranges and silently
    // merge documents — refuse loudly (one aggregate over the
    // checkpointed positions, noise next to the 14 ranking/LCP rounds);
    // the count rides along for the convergence check below
    val minDoc = toks.agg(min(col("__doc")), count(lit(1))).head()
    require(minDoc.isNullAt(0) || minDoc.getLong(0) >= 0L,
      s"suffixDupSpans: negative $idCol values break the per-doc block " +
        s"addressing (min = ${if (minDoc.isNullAt(0)) 0L else minDoc.getLong(0)})")
    val nPos = minDoc.getLong(1)
    // rank attached in ONE range exchange per round (no distinct → rank →
    // join-back round trip), and the shifted probe rank[p + 2^k] read by
    // a per-doc window lead instead of a self-join: positions are DENSE
    // within a doc (split never emits empty tokens after trim, so pos
    // 0..n−1 all survive the filter), `lead(r, 2^k)` over gpos order IS
    // the probe, and the 2×cap block addressing already guarantees no
    // probe crosses a document. Each doubling round is therefore one
    // bounded window (≤ cap rows per doc group) + one rank exchange.
    val (r0, nd0) = Ranks.globalDenseRankAttach(
      toks.select(col("gpos"), md5(col("tok")).as("k1")), Seq("k1"))
    var rank = r0.select(col("gpos"), col("__r").as("r")).localCheckpoint()
    // converged ⇔ rank is injective over positions: every later round's
    // dense rank of (rank[p], rank[p+2^k]) orders by the injective first
    // component alone, reproducing rank EXACTLY — so the remaining round
    // tables are this table, and LCP equality tests against it behave
    // identically (equal ranks ⇒ same position; sentinels differ for
    // a ≠ b). The distinct count falls out of the rank pass for free.
    var converged = nd0 == nPos
    val winDoc = {
      import org.apache.spark.sql.expressions.Window
      Window.partitionBy(expr(s"gpos div $block")).orderBy(col("gpos"))
    }
    val roundTables = Array.newBuilder[DataFrame]
    for (k <- 0 until rounds) {
      roundTables += rank
      if (!converged) {
        val shift = 1L << k
        val paired = rank.select(col("gpos"), col("r").as("k1"),
          coalesce(lead(col("r"), shift.toInt).over(winDoc),
            -(col("gpos") + shift) - 1).as("k2"))
        val (rk, nd) = Ranks.globalDenseRankAttach(paired, Seq("k1", "k2"))
        rank = rk.select(col("gpos"), col("__r").as("r")).localCheckpoint()
        converged = nd == nPos
      }
    }
    val tables = roundTables.result()
    // strict total order (permutation) for the neighbor equi-join
    val fin = globalDenseRank(
      rank.select(col("r").as("k1"), col("gpos").as("k2")), Seq("k1", "k2"))
      .select(col("k2").as("gpos"), col("__r").as("fr"))
      .localCheckpoint()
    var adj = fin.as("x")
      .join(fin.select((col("fr") - 1).as("fr"), col("gpos").as("__b")).as("y"),
        Seq("fr"))
      .select(col("gpos").as("a"), col("__b").as("b"), lit(0L).as("acc"))
    for (k <- (rounds - 1) to 0 by -1) {
      val shift = 1L << k
      val t = tables(k)
      adj = adj
        .join(t.select(col("gpos").as("__pa"), col("r").as("__ra")),
          col("__pa") === col("a") + col("acc"), "left")
        .join(t.select(col("gpos").as("__pb"), col("r").as("__rb")),
          col("__pb") === col("b") + col("acc"), "left")
        .select(col("a"), col("b"),
          (col("acc") + when(
            coalesce(col("__ra"), -(col("a") + col("acc")) - 1) ===
              coalesce(col("__rb"), -(col("b") + col("acc")) - 1),
            lit(shift)).otherwise(lit(0L))).as("acc"))
    }
    val lcp = adj.localCheckpoint()
    val dupLen = lcp.select(col("a").as("gpos"), col("acc"))
      .unionByName(lcp.select(col("b").as("gpos"), col("acc")))
      .groupBy("gpos").agg(max(col("acc")).as("dup"))
    val perDoc = toks.join(dupLen, Seq("gpos"), "left")
      .groupBy(col("__doc").as(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        coalesce(max(col("dup")), lit(0L)).as("max_dup"),
        coalesce(sum(when(col("dup") >= minLen, 1L).otherwise(0L)), lit(0L))
          .as("n_dup_pos"))
    perDoc
  }

  // ---- incremental exact-substring dedup: anchor-gram digest store ----

  /** The `minLen`-gram ANCHOR positions of each doc under exactly
    * [[suffixDupSpans]]' truncation: one row per position `pos` whose
    * full minLen-gram lies inside the first `2^rounds` tokens and
    * contains no empty token, digest = md5 of the space-joined gram
    * (split on \s+, so tokens are space-free and the join is injective).
    *
    * Why anchors: a position's EXACT duplicated-prefix length is
    * ≥ minLen iff its anchor digest occurs at ≥ 2 positions — so anchor
    * counts reproduce suffixDupSpans' `n_dup_pos` identically (spec-
    * asserted against the rank chain). And unlike suffix ranks, anchor
    * digests are CONTENT-ADDRESSED: they never change as the corpus
    * grows, which is what makes the incremental store append-only. */
  def anchorGrams(docs: DataFrame, idCol: String, textCol: String,
      minLen: Int = 8, rounds: Int = 7): DataFrame = {
    val cap = 1 << rounds
    docs.select(col(idCol).cast("long").as("doc_id"),
        split(trim(col(textCol)), "\\s+").as("toks"))
      .filter(size(col("toks")) >= minLen)
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0),
          least(size(col("toks")), lit(cap)) - minLen)).as("pos"))
      .withColumn("gram", expr(s"slice(toks, pos + 1, $minLen)"))
      .filter(!array_contains(col("gram"), ""))
      .select(col("doc_id"), col("pos"),
        md5(concat_ws(" ", col("gram"))).as("digest"))
  }

  /** Per-doc stats over a duplicated-anchor flag frame (doc_id, pos,
    * dup): `n_dup_pos` = duplicated anchors (≡ suffixDupSpans positions
    * with exact dup prefix ≥ minLen), `max_run` = longest run of
    * CONSECUTIVE duplicated anchors (gaps-and-islands over a per-doc
    * keyed window, ≤ 2^rounds rows per doc). */
  private def anchorDocStats(flags: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val runs = flags.filter(col("dup"))
      .withColumn("grp", col("pos") - row_number().over(w))
      .groupBy("doc_id", "grp").agg(count(lit(1)).as("run"))
      .groupBy("doc_id").agg(max(col("run")).as("max_run"))
    flags.groupBy("doc_id")
      .agg(sum(when(col("dup"), 1L).otherwise(0L)).as("n_dup_pos"))
      .join(runs, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_dup_pos"),
        coalesce(col("max_run"), lit(0L)).as("max_run"))
  }

  /** Incremental exact-substring dedup against a PERSISTED anchor store
    * — [[suffixDupSpans]]' incremental tier (the q142/q175/q202 store
    * pattern). `anchorStore` (keyed (digest, gpos), digest-range
    * partitioned) accumulates every batch's anchor rows; `docStore`
    * (keyed (entity_id), id-range partitioned) accumulates per-doc
    * truncated token counts. Each batch:
    *
    *  1. appends its anchors — write cost ∝ batch + the digest
    *     partitions the batch lands in (PartStore merges only those);
    *  2. returns ITS docs' stats against the accumulated corpus
    *     INCLUDING this batch, probing only the store partitions the
    *     batch's digests land in (the broadcast-pidx prune, exactly
    *     [[exactIncremental]]'s read shape).
    *
    * Old docs' answers update RETROACTIVELY at read time:
    * [[anchorDupStats]] recomputes counts over the accumulated store, so
    * a batch-1 doc whose text only batch 2 duplicates reports its dup —
    * storage is answer-invisible: the read equals the fresh chain over
    * the union (`n_dup_pos` bit-equal to [[suffixDupSpans]] by the
    * anchor identity; `max_run` equal to its own one-shot replay). */
  def anchorDupIncremental(
      anchorStore: graft.storage.PartStore, docStore: graft.storage.PartStore,
      part: String, batch: DataFrame, idCol: String, textCol: String,
      minLen: Int = 8, rounds: Int = 7): DataFrame = {
    require(anchorStore.config.keyCols == Seq("digest", "gpos"),
      "anchorDupIncremental: anchor store must be keyed (digest, gpos)")
    require(docStore.config.keyCols == Seq("entity_id"),
      "anchorDupIncremental: doc store must be keyed (entity_id)")
    locally {
      import org.apache.spark.sql.types._
      val t = batch.schema(idCol).dataType
      require(Set[DataType](ByteType, ShortType, IntegerType, LongType)(t),
        s"anchorDupIncremental: id column '$idCol' must be integral, " +
          s"got ${t.simpleString}")
    }
    val cap = 1 << rounds
    val block = 2L << rounds
    val a = anchorGrams(batch, idCol, textCol, minLen, rounds)
      .select(col("digest"), (col("doc_id") * block + col("pos")).as("gpos"),
        conv(substring(col("digest"), 1, 15), 16, 10).cast("long")
          .as("entity_id"),
        col("doc_id"), col("pos"))
      .withColumn("timestamp", col("entity_id"))
      .withColumn("modified", lit(1L))
      .localCheckpoint()
    // negative ids would interleave gpos blocks — refuse like suffixDupSpans
    val minDoc = a.agg(min(col("doc_id"))).head()
    require(minDoc.isNullAt(0) || minDoc.getLong(0) >= 0L,
      "anchorDupIncremental: negative doc ids break gpos block addressing")
    val docRows = batch
      .select(col(idCol).cast("long").as("entity_id"),
        split(trim(col(textCol)), "\\s+").as("toks"))
      .select(col("entity_id"), col("entity_id").as("timestamp"),
        size(filter(expr(s"slice(toks, 1, least(size(toks), $cap))"),
          t => t =!= "")).cast("long").as("n_tokens"),
        lit(1L).as("modified"))
      .localCheckpoint() // doc-count-sized; feeds the store (which
      // executes it twice) AND the final stats join — without the pin
      // the batch text is re-split three times per append
    val psize = anchorStore.config.partitionSizeSeconds
    val pidx = a.select(((col("timestamp") - pmod(col("timestamp"), lit(psize)))
        / psize).cast("long").as("p")).distinct()
    anchorStore.store(part, a)
    docStore.store(part, docRows)
    // batch stats vs the accumulated corpus: counts probe ONLY the
    // digest partitions the batch touches (broadcast prune — a batch's
    // digests can't be duplicated by rows living in other partitions)
    val stored = anchorStore.readPart(part).get
    val touched = stored.join(broadcast(pidx),
      stored("pindex") === col("p")).drop("p")
    val cnt = touched.groupBy("digest").agg(count(lit(1)).as("__c"))
    val flags = a.select(col("doc_id"), col("pos"), col("digest"))
      .join(cnt, Seq("digest"), "left")
      .select(col("doc_id"), col("pos"),
        (coalesce(col("__c"), lit(1L)) >= 2).as("dup"))
    docRows.select(col("entity_id").as("doc_id"), col("n_tokens"))
      .join(anchorDocStats(flags), Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_dup_pos"), lit(0L)).as("n_dup_pos"),
        coalesce(col("max_run"), lit(0L)).as("max_run"))
  }

  /** Read-time per-doc stats from the accumulated anchor store: the
    * fresh-over-union answer (retroactive — counts see every batch).
    * One corpus-sized read, like any stored-index retrieval. */
  def anchorDupStats(
      anchorStore: graft.storage.PartStore, docStore: graft.storage.PartStore,
      part: String): DataFrame = {
    val docs = docStore.readPart(part).get
      .select(col("entity_id").as("doc_id"), col("n_tokens"))
    anchorStore.readPart(part) match {
      case None =>
        docs.select(col("doc_id"), col("n_tokens"),
          lit(0L).as("n_dup_pos"), lit(0L).as("max_run"))
      case Some(stored) =>
        val cnt = stored.groupBy("digest").agg(count(lit(1)).as("__c"))
        val flags = stored.select(col("doc_id"), col("pos"), col("digest"))
          .join(cnt, Seq("digest"))
          .select(col("doc_id"), col("pos"), (col("__c") >= 2).as("dup"))
        docs.join(anchorDocStats(flags), Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_tokens"),
            coalesce(col("n_dup_pos"), lit(0L)).as("n_dup_pos"),
            coalesce(col("max_run"), lit(0L)).as("max_run"))
    }
  }

  /** Cross-corpus contamination SPANS — the span-level form of
    * decontamination (the q63/q98 tier flags whole docs by exact digest
    * or Bloom; real contamination audits measure n-gram OVERLAP spans,
    * the Lee et al. 2022 / GPT-3-appendix methodology). For each eval
    * doc: how many of its minLen-gram anchors occur anywhere in the
    * train corpus, and the longest run of consecutive contaminated
    * anchors (a run of r anchors = a shared span of r + minLen − 1
    * tokens).
    *
    * Scale shape: the train side collapses to DISTINCT anchor digests
    * before the join (set semantics — one shuffle, no frequency
    * blow-up), the probe is a broadcast-or-shuffle left-semi-style
    * equi-join, and runs are per-doc keyed windows (≤ 2^rounds rows).
    * Output: (doc_id, n_anchors, n_contaminated, max_run, contam_bp). */
  def contaminationSpans(
      train: DataFrame, eval_ : DataFrame, idCol: String, textCol: String,
      minLen: Int = 8, rounds: Int = 7): DataFrame =
    contamProbe(anchorGrams(eval_, idCol, textCol, minLen, rounds),
      anchorGrams(train, idCol, textCol, minLen, rounds)
        .select("digest").distinct())

  /** [[contaminationSpans]] against a PERSISTED train-anchor registry
    * (accrued batch-by-batch with [[anchorDupIncremental]]): the
    * incremental tier of the decontamination family — the training
    * corpus grows over weeks, the eval set probes whatever has landed.
    * Answer-invisible: equals the one-shot [[contaminationSpans]] over
    * the accumulated train union (q302 reuses q299's oracle verbatim). */
  def contaminationSpansStored(
      anchorStore: graft.storage.PartStore, part: String,
      eval_ : DataFrame, idCol: String, textCol: String,
      minLen: Int = 8, rounds: Int = 7): DataFrame = {
    val stored = anchorStore.readPart(part).getOrElse(
      throw new IllegalStateException(
        s"contaminationSpansStored: no anchor part '$part' — append train " +
          "batches with anchorDupIncremental first"))
    contamProbe(anchorGrams(eval_, idCol, textCol, minLen, rounds),
      stored.select("digest").distinct())
  }

  private def contamProbe(
      evalAnchors: DataFrame, trainDigests: DataFrame): DataFrame = {
    val flags = evalAnchors
      .join(trainDigests.withColumn("__hit", lit(1)), Seq("digest"), "left")
      .select(col("doc_id"), col("pos"), col("__hit").isNotNull.as("dup"))
    val stats = anchorDocStats(flags)
    flags.groupBy("doc_id").agg(count(lit(1)).as("n_anchors"))
      .join(stats, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_anchors"),
        coalesce(col("n_dup_pos"), lit(0L)).as("n_contaminated"),
        coalesce(col("max_run"), lit(0L)).as("max_run"))
      .withColumn("contam_bp",
        expr("10000 * n_contaminated DIV n_anchors"))
  }

  /** Winnowing fingerprints (Schleimer, Wilkerson & Aiken 2003 — the
    * MOSS algorithm): k-gram rolling hashes, windows of `w` consecutive
    * hashes, one fingerprint per window = the RIGHTMOST minimal hash —
    * guarantees any shared substring of length ≥ w + k − 1 shares a
    * fingerprint, with expected density 2/(w+1). Completes the
    * fingerprint family (exact digest / MinHash / SimHash) with the
    * position-localized one plagiarism detection uses.
    *
    * Hashes are 32-bit md5 prefixes of the space-joined k-gram (the
    * anchorGrams rules: consecutive positions, no empty tokens).
    * Per-doc windows only (≤ doc length rows — the keyed-window
    * invariant); the window→rightmost-min resolution is a constant
    * w-fanout self-join, not a second window. Output: one row per
    * distinct (doc, fingerprint hash, position). */
  /** The winnowing k-gram tier — (doc_id, pos, h) rows of 32-bit hashed
    * word k-grams (anchorGrams rules: consecutive positions, no empty
    * tokens). Shared by [[winnowFingerprints]] (window mins + resolver)
    * and [[winnowKeepers]] (exact-Jaccard verification against the same
    * gram universe the fingerprints sampled). */
  private def winnowGrams(
      docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        split(trim(col(textCol)), "\\s+").as("toks"))
      .filter(size(col("toks")) >= k)
      .select(col("doc_id"),
        explode(sequence(lit(0), size(col("toks")) - k)).as("pos"),
        col("toks"))
      .withColumn("gram", expr(s"slice(toks, pos + 1, $k)"))
      .filter(!array_contains(col("gram"), ""))
      .select(col("doc_id"), col("pos"),
        conv(substring(md5(concat_ws(" ", col("gram"))), 1, 8), 16, 10)
          .cast("long").as("h"))

  def winnowFingerprints(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int = 4, w: Int = 5): DataFrame = {
    require(k >= 1 && w >= 1, s"winnowFingerprints: k,w >= 1, got $k,$w")
    import org.apache.spark.sql.expressions.Window
    val grams = winnowGrams(docs, idCol, textCol, k)
    val dw = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.currentRow, w - 1)
    // the window min AND its rightmost position in ONE window pass:
    // min(struct(h, -pos)) is lexicographic — smallest h first, then
    // smallest -pos = LARGEST pos among its occurrences. This replaces
    // the r16 explode-into-members + (doc_id, pos) equi-join resolver:
    // same result, zero joins, zero w× fanout — the per-window work is
    // the O(L·w) frame scan Spark's WindowExec already does for the min,
    // and nothing here can degrade to the L²-in-one-task shape the r15
    // resolver had (there is no join to lose its keys). Both windows
    // share one frame spec, so Catalyst computes them in a single
    // WindowExec pass.
    val fp = grams
      .withColumn("__mn", min(struct(col("h"), (-col("pos")).as("np"))).over(dw))
      .withColumn("__last", max(col("pos")).over(dw))
      // only FULL windows fingerprint (the trailing <w stubs are the
      // next doc's problem in a streaming cut; here they just end)
      .filter(col("__last") === col("pos") + (w - 1))
      .select(col("doc_id"), col("__mn.h").as("h"),
        (-col("__mn.np")).cast("long").as("pos"))
    fp.distinct()
  }

  /** Candidate near-dup pairs from SHARED winnowing fingerprints — the
    * MOSS matching step: docs sharing ≥ `minShared` distinct fingerprint
    * hashes pair up, with a doc-frequency cap on hot fingerprints
    * (boilerplate grams — mirrored in the oracle exactly like the LSH
    * bucket caps) so the self-join never goes quadratic on one
    * ubiquitous hash. Bucketed by hash, never all-pairs. */
  def winnowPairs(
      fingerprints: DataFrame, minShared: Int = 2,
      maxDocFreq: Int = 50, probeIds: Option[DataFrame] = None): DataFrame = {
    require(minShared >= 1 && maxDocFreq >= 2,
      s"winnowPairs: minShared >= 1, maxDocFreq >= 2")
    val hs = fingerprints.select("doc_id", "h").distinct().localCheckpoint()
    val dfq = hs.groupBy("h").agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxDocFreq)
      .select("h")
    val kept = hs.join(dfq, "h")
    probeIds match {
      case None =>
        kept.as("a").join(kept.as("b"),
            col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
          .agg(count(lit(1)).as("shared_fp"))
          .filter(col("shared_fp") >= minShared)
      case Some(ids) =>
        // BATCH-SIDE probe (the incremental tier, r19): only pairs with
        // ≥1 probe doc are wanted, so the left join side is the probe
        // docs' kept fingerprints instead of the whole state (the old
        // shape ran the full state×state bucket self-join and semi-
        // filtered afterwards — O(Σ bucket²) with the corpus on both
        // sides). The (a < b OR b not-probe) condition generates each
        // qualifying pair exactly once per shared hash — probe~probe
        // pairs only in a < b orientation, probe~old pairs only from
        // the probe side — so the normalized per-pair count equals the
        // self-join's exactly (spec-pinned against the batch tier).
        val marked = kept.join(
            ids.select(col(ids.columns.head).as("doc_id")).distinct()
              .withColumn("__new", lit(true)),
            Seq("doc_id"), "left")
          .withColumn("__new", coalesce(col("__new"), lit(false)))
        marked.filter(col("__new")).as("a").join(marked.as("b"),
            col("a.h") === col("b.h") &&
              col("a.doc_id") =!= col("b.doc_id") &&
              (col("a.doc_id") < col("b.doc_id") || !col("b.__new")))
          .groupBy(least(col("a.doc_id"), col("b.doc_id")).as("id1"),
            greatest(col("a.doc_id"), col("b.doc_id")).as("id2"))
          .agg(count(lit(1)).as("shared_fp"))
          .filter(col("shared_fp") >= minShared)
    }
  }

  /** Incremental MOSS matching against a PERSISTED fingerprint store
    * (the [[lshIncremental]] discipline applied to winnowing): each batch
    * appends its distinct (h, doc) fingerprints to a store partitioned by
    * HASH RANGE (`timestamp` = h's low 20 bits, so every row of one hash
    * lives in one partition and a probe prunes to the partitions the
    * batch touches), then emits candidate pairs involving ≥1 batch doc —
    * docs sharing ≥ `minShared` fingerprints whose CUMULATIVE doc
    * frequency at probe time is ≤ `maxDocFreq` (the cap is state-as-of-
    * this-call, exactly the LSH bucket-cap replay convention). Per-batch
    * cost ∝ batch fingerprints + touched partitions; the corpus is never
    * rescanned. Eager snapshot: the result is checkpointed so a later
    * batch's append cannot change this batch's candidates. */
  def winnowIncremental(
      store: graft.storage.PartStore, part: String,
      batch: DataFrame, idCol: String, textCol: String,
      k: Int = 4, w: Int = 5, minShared: Int = 2,
      maxDocFreq: Int = 50): DataFrame = {
    require(store.config.keyCols == Seq("h", "entity_id"),
      "winnowIncremental: store must be keyed by fingerprint membership " +
        s"(keyCols = Seq(\"h\", \"entity_id\")), got ${store.config.keyCols}")
    val psize = store.config.partitionSizeSeconds
    val fps = winnowFingerprints(batch, idCol, textCol, k, w)
      .select(col("h"), col("doc_id").as("entity_id"))
      .distinct()
      .withColumn("timestamp", pmod(col("h"), lit(1L << 20)))
      .withColumn("modified", lit(1L))
      .localCheckpoint() // feeds the write, the probe filter, and newIds
    store.store(part, fps)
    val pidx = fps
      .select(((col("timestamp") - pmod(col("timestamp"), lit(psize))) / psize)
        .cast("long").as("p")).distinct()
    // an all-short-docs batch writes zero fingerprints: state may still
    // be absent — probe an empty frame instead of crashing on .get
    val state = store.readPart(part)
      .getOrElse(fps.limit(0).withColumn("pindex", lit(0L)))
    // the probe IS the batch matcher over state-as-of-this-call: the
    // df-cap + minShared count live in ONE code path (winnowPairs), so
    // the plan-shape guard on the batch tier covers the incremental tier
    // too; probeIds switches its candidate join to the batch side (only
    // pairs involving ≥1 batch doc are wanted — same set as the old
    // state self-join + semi-filter, generated without putting the
    // corpus on both join sides)
    val newIds = fps.select(col("entity_id").as("nid")).distinct()
    winnowPairs(
        state.join(broadcast(pidx), state("pindex") === col("p"))
          .select(col("entity_id").as("doc_id"), col("h")),
        minShared, maxDocFreq, probeIds = Some(newIds))
      .select("id1", "id2")
      .localCheckpoint()
  }

  /** Fully incremental MOSS keepers — the winnowing twin of
    * [[nearDupIncremental]]: candidates from the persisted fingerprint
    * store ([[winnowIncremental]]), verified by KMV-sketch Jaccard over
    * the doc's word k-GRAM set (persisted per-doc sketches, pruned to
    * candidate ids), folded into the shared union-find parent-pointer
    * state. Each batch emits its docs' as-of keepers; cross-batch
    * merges flow through all three stores. Per-batch cost ∝ batch +
    * touched partitions — the corpus is never rescanned. */
  def winnowDupIncremental(
      fpStore: graft.storage.PartStore,
      sketchStore: graft.storage.PartStore,
      parentStore: graft.storage.PartStore,
      batch: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int, minShared: Int, maxDocFreq: Int,
      sketchK: Int, threshold: Double): DataFrame = {
    require(sketchStore.config.keyCols == Seq("entity_id") &&
        parentStore.config.keyCols == Seq("entity_id"),
      "winnowDupIncremental: sketch/parent stores must be keyed by entity_id")
    require(threshold > 0 && threshold <= 1,
      s"winnowDupIncremental: threshold in (0, 1], got $threshold")
    val cand = winnowIncremental(fpStore, "fp", batch, idCol, textCol,
      k, w, minShared, maxDocFreq)
    // distinct gram TEXT per doc (not the 32-bit fingerprint hash): the
    // KMV sketch hashes the unit value itself, exactly the shingle tier
    val units = batch
      .select(col(idCol).cast("long").as("doc_id"),
        split(trim(col(textCol)), "\\s+").as("toks"))
      .filter(size(col("toks")) >= k)
      .select(col("doc_id"),
        explode(sequence(lit(0), size(col("toks")) - k)).as("pos"),
        col("toks"))
      .withColumn("gram", expr(s"slice(toks, pos + 1, $k)"))
      .filter(!array_contains(col("gram"), ""))
      .select(col("doc_id"), concat_ws(" ", col("gram")).as("gram"))
      .distinct()
    incrementalKeeperTail(sketchStore, parentStore, batch, idCol,
      units.withColumnRenamed("doc_id", idCol), "gram", cand,
      sketchK, threshold)
  }

  /** The full MOSS pipeline closed to a KEEPER ledger: winnowing
    * fingerprints → df-capped candidate pairs ([[winnowPairs]]) →
    * EXACT k-gram-Jaccard verification of each candidate (distinct gram
    * hashes — the same universe the fingerprints sampled, so verification
    * never re-tokenizes differently) → star-contraction components over
    * the verified pairs → per-doc fate `kept`/`dup` (the q318 drop-ledger
    * convention; keeper = component minimum).
    *
    * Scale shape: the expensive tier is candidate generation, already
    * hash-bucketed and doc-frequency-capped; verification touches ONLY
    * candidate pairs (each a bounded gram-set intersect, ≤ doc length),
    * and the component stage is O(log n) star rounds. Nothing here is
    * all-pairs or per-doc quadratic. Threshold is the exact rational
    * tauNum/tauDen compared in integers — no float enters the keep/drop
    * decision. */
  def winnowKeepers(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int = 4, w: Int = 5, minShared: Int = 2, maxDocFreq: Int = 50,
      tauNum: Int = 1, tauDen: Int = 2): DataFrame = {
    require(tauNum >= 0 && tauDen >= 1,
      s"winnowKeepers: threshold $tauNum/$tauDen invalid")
    val gramSets = winnowGrams(docs, idCol, textCol, k)
      .select(col("doc_id"), col("h")).distinct()
      .localCheckpoint() // feeds both per-doc set sizes and the verify join
    val cand = winnowPairs(
      winnowFingerprints(docs, idCol, textCol, k, w), minShared, maxDocFreq)
    val sets = gramSets.groupBy("doc_id")
      .agg(collect_set(col("h")).as("__hs"), count(lit(1)).as("__n"))
    val verified = cand
      .join(sets.select(col("doc_id").as("id1"), col("__hs").as("__h1"),
        col("__n").as("n1")), "id1")
      .join(sets.select(col("doc_id").as("id2"), col("__hs").as("__h2"),
        col("__n").as("n2")), "id2")
      .withColumn("inter",
        size(array_intersect(col("__h1"), col("__h2"))).cast("long"))
      .filter(col("inter") * tauDen >=
        lit(tauNum) * (col("n1") + col("n2") - col("inter")))
      .select("id1", "id2")
    val ids = docs.select(col(idCol).cast("long").as("doc_id"))
    connectedKeepersStar(ids, "doc_id", verified)
      .select(col("doc_id"), col("keeper").cast("long").as("keeper"),
        when(col("doc_id") === col("keeper"), "kept").otherwise("dup")
          .as("fate"))
  }

  /** 16-bit SimHash from token md5 nibbles: per-bit ±1 votes over tokens,
    * sign → bit. Pure integer arithmetic on the first 4 hex chars (bit
    * width is a parameter in spirit; 16 keeps the oracle SQL tractable and
    * the Hamming-ball candidate join selective). */
  def simhash(tokens: DataFrame, idCol: String): DataFrame = {
    val v = conv(substring(md5(col("tok")), 1, 4), 16, 10).cast("long")
    // One aggregation, 16 conditional-sum columns (one per bit) over the
    // un-exploded token stream: same ±1 votes as a bit-explode formulation
    // with 1/16th the shuffle rows and a single map-side-combined pass.
    val bitSums = (0 until 16).map { b =>
      sum(when(expr(s"shiftright(v, $b) % 2") === 1, 1L).otherwise(-1L)).as(s"__s$b")
    }
    tokens
      .withColumn("v", v)
      .groupBy(col(idCol))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col(idCol),
        (0 until 16).map(b =>
          when(col(s"__s$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }
}
