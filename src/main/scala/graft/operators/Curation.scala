package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset-curation operators for training-data pipelines: deterministic
  * splits, weighted sampling and mixing. Everything derives from a
  * multiplicative hash of the id — NO rng, so the same document lands in
  * the same split/sample on every run, every engine, every retry (the
  * property that makes 100 TB curation reproducible and incremental:
  * re-running over a grown corpus never reshuffles old decisions). */
object Curation {

  /** Knuth multiplicative hash bucket in [0, buckets). Expressible in
    * ANSI SQL (the DuckDB oracles run the identical arithmetic), stable
    * everywhere. The id is masked to 31 bits BEFORE the multiply:
    * (2^31-1) * 2654435761 < 2^63-1, so the product never overflows
    * int64 in any engine — without the mask, ids above ~3.47e9 (well
    * inside a 100 TB corpus) would wrap in Spark but raise in ANSI
    * engines, silently breaking cross-engine reproducibility. */
  def hashBucket(id: Column, buckets: Int = 97): Column =
    pmod(id.bitwiseAND(lit(0x7FFFFFFFL)) * lit(2654435761L), lit(buckets.toLong))

  /** Deterministic train/val/test assignment: bucket < trainPct% of the
    * bucket space -> train, next valPct% -> val, rest -> test. */
  def assignSplits(
      df: DataFrame, idCol: String,
      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct + valPct < 100, "train + val must leave room for test")
    val b = hashBucket(col(idCol), 100)
    df.withColumn("split",
      when(b < trainPct, "train").when(b < trainPct + valPct, "val").otherwise("test"))
  }

  /** Token-budget mixture sampling: given target mixture WEIGHTS per
    * source and a total token budget B, keep each source at rate
    * r_s = min(1, B*w_s / T_s) where T_s is the source's total tokens —
    * the data-mixing step of training-set assembly (downsample
    * overrepresented sources toward the target mixture; sources already
    * under their budget keep everything). Weights need not sum to 1.
    *
    * Two passes at any scale: one tiny per-source aggregate (broadcast
    * back) and one map-side hash filter. The keep decision derives from
    * [[hashBucket]], so samples are reproducible, partition-invariant and
    * nested across growing budgets; thresholds are integer per-mille
    * (floor(r_s*1000)) so the same arithmetic runs in ANSI oracles. */
  def tokenBudgetMix(
      df: DataFrame, idCol: String, keyCol: String, tokenCol: String,
      weights: Map[String, Double], defaultWeight: Double,
      budget: Long): DataFrame = {
    val totals = df.groupBy(col(keyCol))
      .agg(sum(col(tokenCol)).cast("double").as("__total"))
    val w = weights.foldLeft(lit(defaultWeight)) {
      case (acc, (k, v)) => when(col(keyCol) === k, lit(v)).otherwise(acc)
    }
    df.join(broadcast(totals), keyCol)
      .withColumn("__thr",
        // nullif: a source whose tokens sum to 0 has nothing to keep —
        // null threshold filters it out instead of an ANSI divide error
        least(lit(1000L),
          floor(lit(budget.toDouble) * w * lit(1000.0) / nullif(col("__total"), lit(0.0)))))
      .filter(hashBucket(col(idCol), 1000) < col("__thr"))
      .drop("__total", "__thr")
  }

  /** Deterministic per-key downsampling: keep a fraction of rows per value
    * of `keyCol` (e.g. source or lang quotas for data mixing). Rates are
    * in [0,1]; keys absent from the map keep `defaultRate`. Keep-decision
    * is the id's hash bucket, so samples are stable and nested: rate 0.2
    * is a subset of rate 0.5. */
  def weightedSample(
      df: DataFrame, idCol: String, keyCol: String,
      rates: Map[String, Double], defaultRate: Double = 1.0): DataFrame = {
    val buckets = 1000
    val b = hashBucket(col(idCol), buckets)
    val threshold = rates.foldLeft(lit((defaultRate * buckets).toLong)) {
      case (acc, (k, r)) => when(col(keyCol) === k, lit((r * buckets).toLong)).otherwise(acc)
    }
    df.filter(b < threshold)
  }

  /** Per-group thresholds for [[temperatureRebalance]] in units of
    * 1e-6 (keep a row iff hashBucket(id, 1e6) < threshold): the
    * multilingual mixing rule (XLM-R/mT5 `p_g ∝ n_g^alpha`) realized as
    * the LARGEST deterministic sample whose group proportions follow
    * p_g with every per-group rate <= 1 — the most-upsampled group
    * keeps ~everything, head groups downsample toward the temperature.
    * All arithmetic past the weight step is INTEGER (BigInt — no
    * overflow at any corpus size) so an ANSI engine recomputes the
    * thresholds bit-exactly; for alpha = 0.5 the weight itself is
    * IEEE-exact too (sqrt is correctly rounded; Math.pow is not, so
    * other alphas are reproducible within Spark but not pinnable
    * cross-engine). */
  def temperatureThresholds(
      df: DataFrame, keyCol: String, alpha: Double = 0.5): Map[String, Long] = {
    // keys are Spark's OWN cast-to-string rendering (not Java toString):
    // temperatureRebalance joins the thresholds back on the identically
    // cast column, and the two renderings disagree for e.g. timestamps
    // (Timestamp.toString always emits a fractional digit; the SQL cast
    // does not) — a mismatch would silently drop the whole corpus
    val rows = df.groupBy(col(keyCol).cast("string").as("__k"))
      .agg(count(lit(1)).as("n")).collect()
    require(!rows.exists(_.isNullAt(0)),
      s"temperatureRebalance: NULL values in group column '$keyCol' — " +
        "filter them out or fill a sentinel group first")
    val counts = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    require(counts.nonEmpty, "temperatureRebalance needs a non-empty corpus")
    // weight w_g = floor(n_g^alpha * 1000); integer from here on
    val w = counts.map { case (k, n) =>
      val p = if (alpha == 0.5) math.sqrt(n.toDouble) else math.pow(n.toDouble, alpha)
      k -> BigInt(math.floor(p * 1000).toLong).max(1)
    }
    val sumW = w.values.sum
    // sample budget B = max size at proportions p_g with all rates <= 1
    val b = counts.map { case (k, n) => BigInt(n) * sumW / w(k) }.min
    counts.map { case (k, n) =>
      k -> ((BigInt(1000000) * b * w(k)) / (sumW * n)).toLong.min(1000000L)
    }
  }

  /** Temperature-based group rebalancing (language mixing): keep each
    * row of group g iff its id hash falls under g's
    * [[temperatureThresholds]] — deterministic, partition-invariant,
    * incremental (a grown corpus re-decides only via the new counts).
    * One count aggregation (O(groups) on the driver) + one
    * broadcast-hash-joined threshold lookup; the big side never
    * shuffles. The thresholds travel as a broadcast SIDE TABLE, not a
    * nested `when` chain: at domain/host granularity (10⁴–10⁵ groups)
    * an O(groups)-deep expression tree blows codegen and analysis time,
    * while the join stays O(1) depth at any group count. */
  def temperatureRebalance(
      df: DataFrame, idCol: String, keyCol: String,
      alpha: Double = 0.5): DataFrame = {
    val t6 = temperatureThresholds(df, keyCol, alpha)
    val spark = df.sparkSession
    import spark.implicits._
    // every key present in df has a threshold row (same frame computed
    // them), so the inner join drops nothing
    val thrDf = t6.toSeq.sortBy(_._1).toDF("__tk", "__thr")
    df.join(broadcast(thrDf), col(keyCol).cast("string") === col("__tk"))
      .filter(hashBucket(col(idCol), 1000000) < col("__thr"))
      .drop("__tk", "__thr")
  }

  /** Sequence packing: assign every document to a fixed-token-budget
    * training sequence (the pretraining "pack documents into context
    * windows" step). Offset packing: docs are ordered deterministically
    * (id hash), a running token sum places each doc at its start offset,
    * and pack = floor(startOffset / budget) — so every pack holds
    * ~budget tokens (a doc straddling the boundary belongs to the pack
    * where it STARTS; trainers truncate/pad the remainder, and any doc
    * longer than the budget still gets a pack of its own).
    *
    * Scale design: a global running sum would serialize onto one
    * reducer, so packing runs WITHIN `buckets` deterministic hash
    * buckets — one shuffle across plenty of reducers, each pack drawn
    * from one bucket. Packing quality is unaffected (offset packing
    * never compares docs across pack boundaries) and the assignment
    * stays reproducible: same corpus, same buckets, same packs,
    * any partitioning.
    *
    * @return input plus (pack_id, pack_offset) — pack_id is globally
    *         unique (bucket * 2^40 + bucket-local index) */
  def packSequences(
      df: DataFrame, idCol: String, tokenCol: String,
      budget: Long, buckets: Int = 1024): DataFrame = {
    require(budget >= 1, "budget >= 1")
    import org.apache.spark.sql.expressions.Window
    val b = hashBucket(col(idCol), buckets)
    val w = Window.partitionBy(col("__pb"))
      .orderBy(hashBucket(col(idCol), 1000000007).asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__pb", b)
      .withColumn("__cum", sum(col(tokenCol)).over(w))
      .withColumn("pack_offset", col("__cum") - col(tokenCol))
      .withColumn("pack_id",
        col("__pb") * lit(1L << 40) + floor(col("pack_offset") / lit(budget.toDouble)).cast("long"))
      .drop("__pb", "__cum")
  }
}
