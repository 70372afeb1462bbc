package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-assembly operators for large-scale training-data pipelines:
  * deterministic sampling, token budgeting, sequence packing, and
  * source interleaving. All pure column expressions / windows — each
  * is one narrow map or one shuffle keyed by the stratum, and every
  * output is integer- or exactly-representable-double-valued so the
  * DuckDB oracle can hash-match it cross-engine.
  */
object Pipeline {

  /** THE oracle-portable hash idiom — first `width` hex digits of
    * md5 of the key's text, as a long. md5 (not xxhash64) so any
    * engine reproduces it: DuckDB mirrors it textually as
    * `('0x'||substr(md5(CAST(k AS VARCHAR)),1,width))::BIGINT`.
    * Every sampling/split/routing op derives from this ONE helper so
    * the Spark side and the oracle SQL can never desynchronize.
    * width ≤ 15 (60 bits) keeps the value positive in a BIGINT. */
  def hashHex(key: Column, width: Int): Column = {
    require(width >= 1 && width <= 15, "width must be in [1,15]")
    conv(substring(md5(key.cast("string")), 1, width), 16, 10).cast("long")
  }

  /** Deterministic hash bucket in [0, buckets): 32-bit [[hashHex]]
    * value → modulo. Used for sampling and train/test splits:
    * membership is a pure function of the key, stable under
    * reshuffling, repartitioning, and reruns — the property that
    * matters when the corpus is rebuilt at 100 TB.
    */
  def hashBucket(key: Column, buckets: Int): Column =
    hashHex(key, 8) % buckets

  /** Train/val/test split: bucket each key into [0,100) and assign a
    * named split by cumulative percentage. Membership is a pure
    * function of the key — a doc never migrates between splits when
    * the corpus is rebuilt, resharded, or appended to. */
  def assignSplit(key: Column, trainPct: Int, valPct: Int): Column = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"invalid split percentages: train=$trainPct val=$valPct")
    val b = hashBucket(key, 100)
    // NULL keys get a NULL split, never a silent 'test' assignment
    when(key.isNotNull,
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Leakage-safe train/val/test split: a test document with a
    * near-copy in train leaks the answer, so near-duplicates must
    * never straddle a split boundary. Documents are split by their
    * near-dup CLUSTER, not their own id: connected components over
    * the `pairs` graph label each clustered doc with its component's
    * min id, every member hashes that shared label (so the whole
    * cluster lands in one split), and unclustered docs — the vast
    * majority — hash their own id, identical to plain
    * [[assignSplit]]. Adding docs to the corpus never moves an
    * existing unclustered doc between splits.
    *
    * Scale shape: components run on the pair graph only (edges exist
    * only between near-duplicates, ≪ corpus); the label join is one
    * keyed equi-join of the corpus against the clustered-id set (the
    * planner broadcasts it when small); the split itself is a narrow
    * map. The corpus is touched by exactly one join, no other
    * shuffle.
    *
    * @param pairs near-duplicate pairs with columns `id_a`, `id_b`
    *              (e.g. [[Dedup.minhashNearDuplicates]] output)
    */
  def leakageSafeSplit(docs: DataFrame, idCol: String, pairs: DataFrame,
                       trainPct: Int, valPct: Int): DataFrame = {
    val comps = Dedup.connectedComponents(pairs)
      .select(col("id").as(idCol), col("comp").as("__split_comp"))
    docs.join(comps, Seq(idCol), "left")
      .withColumn("split",
        assignSplit(coalesce(col("__split_comp"), col(idCol)),
          trainPct, valPct))
      .drop("__split_comp")
  }

  /** Per-stratum token budget: walk docs in `orderCol` order within
    * each stratum, keep while the running token total stays ≤
    * `budget`. One shuffle on the stratum key; the window is a single
    * sort per stratum (the 100 TB shape: strata ≪ corpus, cumsum is
    * linear per partition).
    */
  def tokenBudget(docs: DataFrame, strataCol: String, orderCol: String,
                  textCol: String, budget: Long): DataFrame = {
    val w = Window.partitionBy(col(strataCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("n_tokens", TextAnalysis.tokenCount(col(textCol)).cast("long"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budget)
      .select(col(strataCol), col(orderCol), col("n_tokens"), col("cum_tokens"))
  }

  /** Per-stratum document cap: keep the top `n` rows of each stratum
    * ranked by (`scoreCol` desc, `tieCol` asc) — the per-domain cap a
    * web-scale pipeline applies so no single domain dominates the
    * mix. One shuffle on the stratum key; Spark plans the per-key
    * limit as a partial+final WindowGroupLimit, so each map task
    * keeps only its local top-n before the exchange.
    */
  def capPerStratum(docs: DataFrame, strataCol: String, scoreCol: String,
                    tieCol: String, n: Int): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(col(scoreCol).desc, col(tieCol).asc)
    docs
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= n)
  }

  /** Sequence packing: concatenate docs in `orderCol` order within a
    * stratum and cut the stream into fixed `window`-token context
    * windows (split-allowed packing — a doc may straddle a boundary,
    * like GPT-style pretraining packing). A doc's bin = tokens before
    * it ÷ window. Returns per-(stratum, bin) doc/token counts, the
    * shape a packer needs to emit fixed-length training rows.
    */
  def packSequences(docs: DataFrame, strataCol: String, orderCol: String,
                    textCol: String, window: Int): DataFrame = {
    val w = Window.partitionBy(col(strataCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("n_tokens", TextAnalysis.tokenCount(col(textCol)).cast("long"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("bin", ((col("cum_tokens") - col("n_tokens")) / window)
        .cast("long"))
      .groupBy(col(strataCol), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
  }

  /** Sequence-length bucketing — the padded-batch alternative to
    * [[packSequences]] (T5/BERT-style batching pads every doc in a
    * batch to the batch max, so batches are drawn from power-of-two
    * length buckets; the per-bucket padding waste is the number that
    * decides bucketed-padding vs packed windows for a corpus). Each
    * doc lands in the smallest power-of-two bucket ≥ its token count
    * (floor `minBucket`); per bucket: doc count, real token count,
    * padded slot count (n_docs·bucket), and waste_ppm — the ppm of
    * padded slots that are padding. The bucket is computed with
    * integer bit-length arithmetic (`1 << len(bin(n−1))`, no
    * float log2) and the waste in integer ppm, so every value is
    * bit-exact cross-engine.
    *
    * Scale shape: a narrow per-row map into ≤ ~40 buckets, then one
    * map-side-combinable aggregation — one streaming pass, shuffle
    * bounded by |buckets|.
    */
  def lengthBuckets(docs: DataFrame, textCol: String,
                    minBucket: Int = 16): DataFrame = {
    require(minBucket >= 2 && (minBucket & (minBucket - 1)) == 0,
      s"minBucket=$minBucket must be a power of two ≥ 2")
    docs
      .withColumn("__n", TextAnalysis.tokenCount(col(textCol)).cast("long"))
      // smallest power of two ≥ n via the bit length of n−1; guard
      // n ≤ 1 (bin(-1) is 64 ones) — those docs floor to minBucket
      .withColumn("bucket", greatest(lit(minBucket.toLong),
        when(col("__n") <= 1, lit(2L))
          .otherwise(expr("shiftleft(1L, length(bin(__n - 1)))"))))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__n")).as("n_tokens"))
      .withColumn("n_padded", col("n_docs") * col("bucket"))
      .withColumn("waste_ppm",
        expr("(n_padded - n_tokens) * 1000000 div n_padded"))
  }

  /** Weighted round-robin interleave of strata: doc i (1-based, in
    * `orderCol` order) of a stratum with weight w gets global key
    * (i - 0.5) / w — a stratum with twice the weight appears twice as
    * often in the merged stream. The key is a single IEEE division of
    * small integers, exactly reproducible on any engine. Returns the
    * first `limit` docs of the merged stream with their positions.
    */
  def interleave(docs: DataFrame, strataCol: String, orderCol: String,
                 weights: Map[String, Int], limit: Int): DataFrame = {
    val wRank = Window.partitionBy(col(strataCol)).orderBy(col(orderCol))
    val weight = weights.foldLeft(lit(1.0)) { case (alt, (k, v)) =>
      when(col(strataCol) === k, lit(v.toDouble)).otherwise(alt)
    }
    val keyed = docs
      .withColumn("rn", row_number().over(wRank))
      // a doc at per-stratum rank rn has ≥ rn-1 same-stratum docs
      // ahead of it globally, so rn > limit can never make the cut —
      // prefiltering bounds the single-partition global sort at
      // strata × limit rows instead of the whole corpus
      .filter(col("rn") <= limit)
      .withColumn("ikey", (col("rn").cast("double") - 0.5) / weight)
    val wGlobal = Window.orderBy(col("ikey"), col(strataCol), col(orderCol))
    keyed
      .withColumn("pos", row_number().over(wGlobal))
      .filter(col("pos") <= limit)
      .select(col("pos"), col(strataCol), col(orderCol), col("rn"))
  }

  /** Deterministic epoch shuffle for training export: every epoch
    * gets a different but reproducible global order, laid out as
    * `nShards` hash shards with a dense position within each shard.
    * `shard = md5("epoch<e>:" + id) % nShards`, `pos` = rank of the
    * hash within the shard — a pure function of (epoch, id), so the
    * same epoch re-derives the same order on any engine at any
    * parallelism.
    *
    * Scale shape: ONE shuffle keyed by shard + a per-shard sort —
    * exactly the `repartition(n, shard) + sortWithinPartitions` write
    * layout a 100 TB epoch export wants; no global single-partition
    * ordering anywhere (`pos` is per-shard, a reader consumes shards
    * independently).
    */
  def epochShuffle(docs: DataFrame, idCol: String, epoch: Int,
                   nShards: Int): DataFrame = {
    require(nShards >= 1, "nShards must be positive")
    Seq("__eh", "shard", "pos").foreach { c =>
      require(!docs.columns.contains(c),
        s"input already has a $c column (reserved name)")
    }
    val h = hashHex(
      concat(lit(s"epoch$epoch:"), col(idCol).cast("string")), 15)
    val w = Window.partitionBy(col("shard")).orderBy(col("__eh"), col(idCol))
    docs
      .withColumn("__eh", h)
      .withColumn("shard", (col("__eh") % nShards).cast("int"))
      .withColumn("pos", row_number().over(w))
      .drop("__eh")
  }

  /** Sliding-window chunking for embedding generation: split each doc
    * into `windowTokens`-token chunks every `strideTokens` tokens
    * (stride < window → overlapping context at chunk boundaries, the
    * standard retrieval-embedding prep). One narrow explode per doc —
    * no shuffle anywhere; chunk count per doc is
    * `ceil((n − window)/stride) + 1` (min 1).
    *
    * @return (id, chunk_idx, chunk, n_tokens) — n_tokens is the
    *         chunk's own token count (the tail chunk may be short)
    */
  def chunkForEmbedding(docs: DataFrame, idCol: String, textCol: String,
      windowTokens: Int = 128, strideTokens: Int = 64): DataFrame = {
    require(windowTokens >= 1 && strideTokens >= 1,
      "window and stride must be positive")
    val toks = TextAnalysis.tokens(col(textCol))
    val n = size(toks)
    val nChunks = when(n <= windowTokens, lit(1)).otherwise(
      ceil((n - windowTokens).cast("double") / strideTokens).cast("int") + 1)
    docs
      .select(col(idCol).as("id"), toks.as("__t"), nChunks.as("__nc"))
      .select(col("id"),
        posexplode(transform(
          sequence(lit(0), col("__nc") - 1),
          i => slice(col("__t"), i * strideTokens + 1, lit(windowTokens))))
          .as(Seq("chunk_idx", "__c")))
      .select(col("id"), col("chunk_idx"),
        concat_ws(" ", col("__c")).as("chunk"),
        size(col("__c")).as("n_tokens"))
  }

  /** Materialize an [[epochShuffle]]d epoch as a sharded training
    * export: `outDir/shard=K/` holds shard K's rows in epoch order,
    * in exactly ONE file, so a data loader streams shards
    * independently with no further sorting.
    *
    * Scale shape: [[epochShuffle]]'s window already exchanged by
    * hash(shard) and sorted each partition by (shard, pos), so the
    * write adds NO second shuffle — every shard lives wholly in one
    * partition and `partitionBy` splits it into its own directory.
    * The explicit in-partition sort is a no-cost guard (sorting
    * already-sorted runs) that pins the contract if the window plan
    * ever changes. No global sort, no driver materialization. Pick
    * nShards so shard files land at a sane size (e.g. 100 TB /
    * 1 GiB → ~100k shards).
    */
  def writeEpochShards(docs: DataFrame, idCol: String, epoch: Int,
                       nShards: Int, outDir: String): Unit =
    epochShuffle(docs, idCol, epoch, nShards)
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.partitionBy("shard").mode("overwrite").parquet(outDir)

  /** End-to-end curation FUNNEL — the composition proof: quality
    * floor → exact dedup (canonical = min id per normalized-md5
    * fingerprint, computed AMONG quality survivors) → benchmark
    * decontamination (any shared word n-gram, among canonical
    * survivors), reported per source as stage survivor counts + kept
    * token volume. This is the report a curation run publishes — each
    * stage is individually oracled elsewhere (td_gopher_quality /
    * td_dedup_exact / td_decontam); this op proves they compose into
    * one plan without driver round-trips.
    *
    * Scale shape: one narrow pass computes words + fingerprint; dedup
    * is one shuffle on the md5 key; the benchmark shingle set
    * BROADCASTS (benchmarks are small by definition — if yours isn't,
    * use [[graft.ops.BloomJoin]]); stage counts are per-source
    * map-side-combinable sums, so the funnel report adds one tiny
    * aggregate exchange. The corpus is scanned once (localCheckpoint
    * pins the shared base against multi-branch recompute).
    *
    * @return (source, n_input, n_quality, n_canonical, n_kept,
    *         kept_tokens, kept_ppm) — kept_ppm = n_kept·10⁶ div
    *         n_input, exact integer arithmetic.
    */
  def curationFunnel(train: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, sourceCol: String,
      minWords: Int = 5, shingleN: Int = 3): DataFrame = {
    val base = train.select(col(idCol).as("id"),
        col(sourceCol).as("source"),
        col(textCol).as("text"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_words"),
        TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .localCheckpoint(eager = false)
    val quality = base.filter(col("n_words") >= minWords)
    val canon = quality.groupBy(col("fp"))
      .agg(min(col("id")).as("keep_id"))
    val surv = quality.join(canon, Seq("fp"))
      .filter(col("id") === col("keep_id"))
      .drop("keep_id")
      .localCheckpoint(eager = false) // feeds contamination + counts
    val bsh = benchmark
      .select(explode(Dedup.shingles(col(textCol), shingleN)).as("g"))
      .distinct()
    val contaminated = surv
      .select(col("id"), explode(Dedup.shingles(col("text"), shingleN)).as("g"))
      .join(broadcast(bsh), Seq("g"))
      .select(col("id")).distinct()
    val kept = surv.join(contaminated, Seq("id"), "left_anti")

    def stage(df: DataFrame, cnt: String): DataFrame =
      df.groupBy(col("source")).agg(count(lit(1)).as(cnt))
    base.groupBy(col("source")).agg(count(lit(1)).as("n_input"))
      .join(stage(quality, "n_quality"), Seq("source"), "left")
      .join(stage(surv, "n_canonical"), Seq("source"), "left")
      .join(kept.groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"),
          sum(col("n_words")).as("kept_tokens")), Seq("source"), "left")
      .select(col("source"), col("n_input"),
        coalesce(col("n_quality"), lit(0L)).as("n_quality"),
        coalesce(col("n_canonical"), lit(0L)).as("n_canonical"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"))
      .withColumn("kept_ppm", expr("n_kept * 1000000 div n_input"))
  }
}
