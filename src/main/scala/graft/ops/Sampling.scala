package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines. `rand()`-based
  * sampling is unreproducible across runs/planners and un-oracleable;
  * hashing a stable id gives the same sample on every engine, every
  * run, at every parallelism — and stays a narrow map (no shuffle)
  * for the Bernoulli form.
  */
object Sampling {

  /** Uniform deterministic hash of an id column into [0, 2^60):
    * the shared [[Pipeline.hashHex]] idiom at full 15-hex width. */
  def hash60(id: Column): Column = Pipeline.hashHex(id, 15)

  /** The integer cutoff such that `hash60 < cutoff` keeps ≈`fraction`
    * of rows. Computed in driver code so Spark and any oracle can
    * share the exact literal. */
  def cutoff(fraction: Double): Long =
    (fraction * (1L << 60).toDouble).toLong

  /** Bernoulli sample: keep a row iff its id hashes under the cutoff.
    * Membership depends only on the id — stable under repartitioning,
    * retries, and engine changes; no shuffle. */
  def hashSample(df: DataFrame, idCol: String, fraction: Double): DataFrame =
    df.filter(hash60(col(idCol)) < lit(cutoff(fraction)))

  /** Domain-mixing sample: a different keep-fraction per group value
    * (e.g. up-sample curated sources, down-sample web crawl), with a
    * `default` for unlisted groups. Same hash-membership determinism
    * as [[hashSample]]; still a narrow map, no shuffle. */
  def weightedSample(df: DataFrame, idCol: String, groupCol: String,
                     fractions: Map[String, Double], default: Double): DataFrame = {
    val cut = fractions.foldLeft(lit(cutoff(default))) {
      case (acc, (g, f)) => when(col(groupCol) === g, lit(cutoff(f))).otherwise(acc)
    }
    df.filter(hash60(col(idCol)) < cut)
  }

  /** Target-proportion domain mix: given target shares of the FINAL
    * corpus (ppm, summing to 1,000,000), derive each domain's keep
    * rate from its actual size and Bernoulli-sample to the largest
    * total at which every listed domain can meet its share WITHOUT
    * upsampling: `T = min_d floor(n_d·10^6 / f_d)`, per-domain keep
    * target `k_d = floor(T·f_d / 10^6)`, membership
    * `pmod(hash60(id), 10^6) < floor(k_d·10^6 / n_d)`. All arithmetic
    * is 64-bit integer (the `T·f_d` product is split q/r so nothing
    * overflows at trillion-row domains) — bit-identical cross-engine,
    * like every sampler here.
    *
    * Unlike [[weightedSample]] (caller-fixed fractions), the rates
    * are DERIVED in-engine from the live counts: one
    * map-side-combinable count agg (|domains| rows), a 1-row global
    * min, and a broadcast rate join — the corpus itself sees one
    * narrow filter. Domains absent from `targetsPpm` are dropped.
    */
  /** Temperature-smoothed mixing shares at τ = 1/2 (the mT5/XLM-R
    * multilingual rule p_d ∝ n_d^τ): big domains are damped, small
    * ones boosted, without hand-written targets — [[domainMix]] with
    * the target vector DERIVED from the live counts. τ is fixed at
    * 1/2 because that exponent keeps the whole computation exact
    * cross-engine: `w_d = floor(sqrt(n_d)·10⁶)` uses only correctly-
    * rounded IEEE ops (sqrt, one multiply, floor — bit-identical in
    * any IEEE engine for n < 2⁵³), and everything after is integer
    * arithmetic (`div`, order-independent integer sums). Shares then
    * feed the same feasible-total + hash-membership machinery as
    * [[domainMix]].
    * @return (domain, n_docs, share_ppm, keep_ppm) — |domains| rows
    */
  def temperatureRates(df: DataFrame, domainCol: String): DataFrame = {
    val counts = df.groupBy(col(domainCol).as("__dom"))
      .agg(count(lit(1)).as("__n"))
    val w = counts.selectExpr("__dom", "__n",
      "CAST(floor(sqrt(CAST(__n AS DOUBLE)) * 1000000) AS BIGINT) AS __w")
    val tot = w.selectExpr("sum(__w) AS __tw")
    // greatest(…, 1): under extreme skew (Σ√n > 10⁶·√n_min) a small
    // domain's share would floor to 0 ppm, and the feasible-total
    // division below would null/ANSI-error on it — silently DROPPING
    // the domain temperature boosting exists to protect. Clamping to
    // 1 ppm keeps it sampled (at the floor rate) and keeps the
    // arithmetic total; the oracle SQL carries the same clamp.
    val shares = w.crossJoin(broadcast(tot))
      .selectExpr("__dom", "__n",
        "greatest(__w * 1000000 div __tw, 1) AS __share_ppm")
    val totalRow = shares
      .selectExpr("min(__n * 1000000 div __share_ppm) AS __t")
    shares.crossJoin(broadcast(totalRow))
      .selectExpr("__dom", "__n", "__share_ppm",
        "(__t div 1000000) * __share_ppm + ((__t % 1000000) * __share_ppm) div 1000000 AS __k")
      .selectExpr("__dom AS domain", "__n AS n_docs",
        "__share_ppm AS share_ppm",
        "least(CAST(1000000 AS BIGINT), __k * 1000000 div __n) AS keep_ppm")
  }

  /** Sample `df` at the [[temperatureRates]] keep rates: the same
    * pure-hash membership as [[domainMix]], with temperature-derived
    * shares. One count agg + broadcast rate join + narrow filter. */
  def temperatureMix(df: DataFrame, idCol: String,
      domainCol: String): DataFrame = {
    val rates = temperatureRates(df, domainCol)
      .select(col("domain").as("__dom"), col("keep_ppm").as("__keep_ppm"))
    df.join(broadcast(rates), col(domainCol) === col("__dom"))
      .filter(pmod(hash60(col(idCol)), lit(1000000L)) < col("__keep_ppm"))
      .drop("__dom", "__keep_ppm")
  }

  def domainMix(df: DataFrame, idCol: String, sourceCol: String,
                targetsPpm: Map[String, Long]): DataFrame = {
    require(targetsPpm.values.sum == 1000000L,
      s"targets must sum to 1,000,000 ppm, got ${targetsPpm.values.sum}")
    require(targetsPpm.values.forall(_ > 0), "every target share must be > 0")
    val spark = df.sparkSession
    import spark.implicits._
    val tgt = targetsPpm.toSeq.toDF("__src", "__f_ppm")
    val counts = df.groupBy(col(sourceCol).as("__src"))
      .agg(count(lit(1)).as("__n"))
      .join(broadcast(tgt), "__src")
    // largest feasible total, then per-domain keep rate — tiny frames,
    // exact integer division throughout (`div`, never `/`→double)
    val totalRow = counts
      .selectExpr("min(__n * 1000000 div __f_ppm) AS __t")
    val rates = counts.crossJoin(broadcast(totalRow))
      .selectExpr("__src",
        // k = floor(T·f/10^6), split to dodge the T·f overflow
        "(__t div 1000000) * __f_ppm + ((__t % 1000000) * __f_ppm) div 1000000 AS __k",
        "__n")
      .selectExpr("__src",
        "least(CAST(1000000 AS BIGINT), __k * 1000000 div __n) AS __keep_ppm")
    df.join(broadcast(rates), col(sourceCol) === col("__src"))
      .filter(pmod(hash60(col(idCol)), lit(1000000L)) < col("__keep_ppm"))
      .drop("__src", "__keep_ppm")
  }

  /** Stratified fixed-size sample: the `n` rows of each stratum whose
    * ids hash lowest (ties broken by id). Equivalent to a per-stratum
    * uniform draw, but deterministic; one shuffle on the stratum key.
    * At scale, strata are many and small relative to the corpus —
    * the window never sees a partition bigger than a stratum.
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
                       n: Int): DataFrame = {
    require(!df.columns.contains("__rn"),
      "input already has a __rn column (reserved temp name)")
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(hash60(col(idCol)), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** Discrete quantiles of an integer measure per group: the value at
    * 1-based rank `ceil(p * count)` in (measure, id) order — the
    * percentile-disc definition, integer-exact so any engine agrees
    * bit-for-bit (interpolating quantiles differ by float rounding).
    *
    * CONTRACT: exact per-row ranking requires each group to sort in
    * one task — that is what row_number means — so a giant stratum
    * serializes no matter how the count is computed. The group COUNT,
    * however, does NOT need the sort: it is a map-side-combinable
    * aggregate joined back (one row per group), never a second
    * count-over-window pass buffering the group again. For strata too
    * large to sort in one task, use [[discreteQuantilesByValue]]
    * (exact, windows only |distinct values| rows) or the
    * log-histogram sketch (`td_quantile_sketch`) — those are the
    * 100 TB forms; this one is for many-small-strata shapes.
    */
  def discreteQuantiles(df: DataFrame, groupCol: String, idCol: String,
                        measure: Column, ps: Seq[(String, Double)]): DataFrame = {
    require(ps.nonEmpty, "ps must name at least one quantile")
    ps.foreach { case (name, p) =>
      require(p > 0.0 && p <= 1.0, s"quantile $name: p=$p outside (0, 1]")
    }
    val src = df.select(col(groupCol), col(idCol), measure.as("__m"))
    val cnts = src.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__cnt"))
    val ranked = src
      // NULLS LAST explicitly: Spark's default asc ordering is nulls
      // first while SQL engines (and the oracle) rank nulls last —
      // a null measure must not shift every rank in the stratum
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(groupCol))
          .orderBy(col("__m").asc_nulls_last, col(idCol))))
      .join(cnts, Seq(groupCol))
    // rank = ceil(p * count) computed in EXACT decimal arithmetic
    // (count and p are both exact decimals, so the product and its
    // ceiling are too) — DuckDB's `ceil(cnt * 0.9)` is likewise a
    // decimal multiply, so the two engines agree for ANY count, with
    // no reliance on double-rounding coincidences.
    val aggs = ps.map { case (name, p) =>
      require(BigDecimal(p.toString).scale <= 4,
        s"quantile $p needs more than 4 decimal digits; widen the cast")
      val pDec = lit(new java.math.BigDecimal(p.toString)).cast("decimal(10,4)")
      val rank = ceil(col("__cnt").cast("decimal(20,0)") * pDec)
      max(when(col("__rn") === rank, col("__m"))).as(name)
    }
    ranked.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** [[discreteQuantiles]] by value counting — the 100-TB plan for
    * the same answer. percentile-disc depends only on each group's
    * value MULTISET, so instead of ranking every row (a full sort of
    * the corpus inside each group partition), aggregate exact counts
    * per (group, value) — map-side combinable, output bounded by the
    * measure's distinct values — and walk the cumulative counts of
    * that small table to find the value whose cumulative range
    * contains rank ceil(p·count). The window sees |distinct values|
    * rows per group, never |rows|; null measures keep their
    * rank-last semantics via the null count bucket.
    */
  def discreteQuantilesByValue(df: DataFrame, groupCol: String,
                               measure: Column,
                               ps: Seq[(String, Double)]): DataFrame = {
    require(ps.nonEmpty, "ps must name at least one quantile")
    ps.foreach { case (name, p) =>
      require(p > 0.0 && p <= 1.0, s"quantile $name: p=$p outside (0, 1]")
    }
    val counts = df
      .select(col(groupCol), measure.as("__m"))
      .groupBy(col(groupCol), col("__m"))
      .agg(count(lit(1)).as("__c"))
    val part = Window.partitionBy(col(groupCol))
    val cum = counts
      .withColumn("__cum", sum(col("__c")).over(
        part.orderBy(col("__m").asc_nulls_last)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__tot", sum(col("__c")).over(part))
    val aggs = ps.map { case (name, p) =>
      require(BigDecimal(p.toString).scale <= 4,
        s"quantile $p needs more than 4 decimal digits; widen the cast")
      val pDec = lit(new java.math.BigDecimal(p.toString)).cast("decimal(10,4)")
      val rank = ceil(col("__tot").cast("decimal(20,0)") * pDec)
      // rank falls in this value's cumulative range [cum-c+1, cum];
      // if that range belongs to the null bucket the result is null —
      // max(when) never matches and returns null, same as the oracle
      max(when(rank > col("__cum") - col("__c") && rank <= col("__cum"),
        col("__m"))).as(name)
    }
    cum.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Per-domain quality pruning (the FineWeb/DCLM move: keep each
    * domain's best `keepPct`% by a quality score, so pruning never
    * collapses small domains the way a global cutoff does): rank rows
    * inside each domain by (`score` desc, `idCol` asc) and keep
    * rank ≤ max(1, n·keepPct div 100). Integer score + integer rank
    * arithmetic → bit-exact on any engine.
    *
    * This is the ORACLE form: exact, but the per-domain rank is a
    * full sort of each domain partition — with a handful of domains
    * over 100 TB one domain's rows serialize through one sort. Use
    * [[qualityPruneByValue]] at scale; the two agree except for ties
    * at the cutoff score (spec-pinned superset relation).
    */
  def qualityPruneExact(df: DataFrame, domainCol: String, score: Column,
                        idCol: String, keepPct: Int): DataFrame = {
    require(keepPct >= 1 && keepPct <= 100, s"keepPct=$keepPct outside [1,100]")
    val part = Window.partitionBy(col(domainCol))
    val scored = df.withColumn("score", score)
    scored
      .withColumn("rank", row_number().over(
        part.orderBy(col("score").desc_nulls_last, col(idCol))))
      .withColumn("__cnt", count(lit(1)).over(part))
      .filter(col("rank") <= greatest(
        lit(1L), expr(s"__cnt * $keepPct div 100")))
      .drop("__cnt")
  }

  /** [[qualityPruneExact]] the 100-TB way: derive each domain's score
    * CUTOFF from exact count-by-value aggregation (the
    * [[discreteQuantilesByValue]] plan — map-side-combinable counts
    * bounded by |distinct scores|, never a row sort), broadcast the
    * |domains|-row cutoff table, and keep score ≥ cutoff with a
    * narrow filter. All rows TIED at the cutoff are kept, so the
    * result is a superset of the exact form's (equal when the
    * boundary score is unique); kept count ≥ max(1, n·keepPct/100).
    * Score nulls rank last in both forms, but `score ≥ cutoff` never
    * admits a null — pass a non-null score (coalesce upstream) if a
    * domain could be entirely null-scored.
    */
  def qualityPruneByValue(df: DataFrame, domainCol: String, score: Column,
                          idCol: String, keepPct: Int): DataFrame = {
    require(keepPct >= 1 && keepPct <= 100, s"keepPct=$keepPct outside [1,100]")
    val scored = df.withColumn("score", score)
    val counts = scored
      .groupBy(col(domainCol), col("score"))
      .agg(count(lit(1)).as("__c"))
    val part = Window.partitionBy(col(domainCol))
    // walk cumulative counts in score-DESC order; the cutoff is the
    // score whose cumulative range contains the target rank
    val cutoffs = counts
      .withColumn("__cum", sum(col("__c")).over(
        part.orderBy(col("score").desc_nulls_last)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__tot", sum(col("__c")).over(part))
      .withColumn("__target", greatest(
        lit(1L), expr(s"__tot * $keepPct div 100")))
      .filter(col("__target") > col("__cum") - col("__c") &&
        col("__target") <= col("__cum"))
      .select(col(domainCol), col("score").as("__cutoff"))
    scored
      .join(broadcast(cutoffs), Seq(domainCol))
      .filter(col("score") >= col("__cutoff"))
      .drop("__cutoff")
  }

  /** Hashed unigram+bigram term frequencies per document — the
    * feature map of DSIR-style importance weighting (Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling"
    * §2 uses exactly hashed n-grams). md5 buckets
    * ([[TextAnalysis.md5Bucket]]) keep the relation cross-engine
    * exact; one keyed shuffle with map-side combine, bounded by `dim`
    * buckets per doc. Docs with no tokens produce no rows (callers
    * left-join them back). */
  def hashedNgramTf(docs: DataFrame, idCol: String, textCol: String,
                    dim: Int): DataFrame =
    docs
      .select(col(idCol).as("id"),
        explode(graft.plans.NativeCols.hashedGramBuckets(
          col(textCol), dim, bigrams = true)).as("pos"))
      .groupBy(col("id"), col("pos"))
      .agg(count(lit(1)).as("tf"))

  /** Fold-form twin of [[hashedNgramTf]] — the spec's equivalence
    * reference (the production path is one compiled pass per doc;
    * this form pays an interpreted `transform` lambda per bigram). */
  private[graft] def hashedNgramTfFold(docs: DataFrame, idCol: String,
      textCol: String, dim: Int): DataFrame =
    docs
      .select(col(idCol).as("id"), TextAnalysis.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= 1)
      .select(col("id"), explode(concat(col("toks"),
        coalesce(
          when(size(col("toks")) >= 2,
            transform(sequence(lit(0), size(col("toks")) - 2),
              i => concat_ws(" ", slice(col("toks"), i + 1, lit(2))))),
          array().cast("array<string>")))).as("g"))
      .select(col("id"), TextAnalysis.md5Bucket(col("g"), dim).as("pos"))
      .groupBy(col("id"), col("pos"))
      .agg(count(lit(1)).as("tf"))

  /** DSIR-style importance weights: score each raw document by how
    * target-like its hashed n-gram profile is. Per bucket f, the
    * add-1-smoothed target/raw frequency ratio as a SCALED INTEGER
    * `(tgt_f + 1)·scale div (raw_f + 1)` — the repo's exactness idiom
    * (the paper's log-ratio sums floats, which differ in the last ulp
    * across engines; per-bucket scaled ratios never do). A document's
    * score is Σ tf_f · ratio_f: a linear-space surrogate for the
    * paper's Naive-Bayes log discriminant that prefers the same
    * target-heavy buckets while staying bit-identical cross-engine.
    * (The shared normalizers the paper divides by are constant across
    * buckets, so dropping them rescales every doc equally.)
    *
    * Scale shape: both corpora aggregate to ≤`dim` bucket counts with
    * map-side combine; the dim-row weight table BROADCASTS into the
    * raw-side feature join; the per-doc score is one keyed agg. The
    * raw corpus is touched twice (features + the score-preserving
    * left join), never joined to the target corpus row-wise.
    *
    * Integer-range bound (all arithmetic is exact Long): the ratio
    * `(tgt_f+1)·scale` overflows past 2^63 when a single target bucket
    * holds > 2^63/scale − 1 grams (≈9.2e12 at the default scale=1e6 —
    * a ~10-trillion-gram TARGET set concentrated in one of `dim`
    * buckets; targets are small by construction, raw-corpus size is
    * unbounded). A per-doc score term `tf·ratio` stays exact while
    * `doc_grams · max_ratio < 2^63`. Rather than trust the bound
    * silently, the dim-row weight table carries an `assert_true`
    * guard, so an out-of-range target fails loudly instead of
    * corrupting the ranking; shrink `scale` (any value keeps
    * cross-engine exactness) to extend the range.
    *
    * @return every raw doc: (id, score) — score 0 for token-less docs
    */
  def importanceWeights(raw: DataFrame, target: DataFrame,
                        idCol: String, textCol: String,
                        dim: Int = 64, scale: Long = 1000000L): DataFrame = {
    val rawTf = hashedNgramTf(raw, idCol, textCol, dim)
    val tgtTf = hashedNgramTf(target, idCol, textCol, dim)
    val rawTot = rawTf.groupBy(col("pos")).agg(sum(col("tf")).as("raw_tf"))
    val tgtTot = tgtTf.groupBy(col("pos")).agg(sum(col("tf")).as("tgt_tf"))
    val buckets = raw.sparkSession.range(0, dim)
      .select(col("id").cast("int").as("pos"))
    // overflow guard: woven into the ratio via coalesce(assert_true…)
    // (a separate pruned-away column would be optimized out) —
    // evaluates on the dim-row table only, so it is cost-free, and an
    // out-of-range target fails loudly instead of corrupting the
    // ranking. assert_true returns NULL on success, so coalesce falls
    // through to the ratio.
    val maxTgt = Long.MaxValue / scale - 1L
    val weights = buckets
      .join(tgtTot, Seq("pos"), "left")
      .join(rawTot, Seq("pos"), "left")
      .select(col("pos"), expr(
        s"""coalesce(
           |  cast(assert_true(coalesce(tgt_tf, 0L) <= ${maxTgt}L,
           |    'importanceWeights: target bucket count exceeds 2^63/scale - 1; shrink scale') as bigint),
           |  (coalesce(tgt_tf, 0L) + 1L) * ${scale}L div (coalesce(raw_tf, 0L) + 1L))
           |""".stripMargin)
        .as("ratio"))
    val scored = rawTf
      .join(broadcast(weights), Seq("pos"))
      .groupBy(col("id"))
      .agg(sum(col("tf") * col("ratio")).as("score"))
    raw.select(col(idCol).as("id"))
      .join(scored, Seq("id"), "left")
      .select(col("id"), coalesce(col("score"), lit(0L)).as("score"))
  }

  /** Importance resampling: the top-`k` raw documents by
    * [[importanceWeights]] (ties break on lowest id — deterministic).
    * The deterministic top-k form of the paper's Gumbel-top-k
    * resample (seeded noise is just a tie-spreader; rank-by-weight is
    * the reproducible, oracle-checkable core). orderBy+limit plans as
    * TakeOrdered — per-partition heaps, never a global sort. */
  def importanceSelect(raw: DataFrame, target: DataFrame,
                       idCol: String, textCol: String, k: Int,
                       dim: Int = 64, scale: Long = 1000000L): DataFrame =
    importanceWeights(raw, target, idCol, textCol, dim, scale)
      .orderBy(col("score").desc, col("id"))
      .limit(k)
}
