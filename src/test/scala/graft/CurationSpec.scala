package graft

import org.apache.spark.sql.functions._
import graft.operators.Curation

/** Oracles for deterministic dataset curation. */
class CurationSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val docs = (0L until 2000L).map(i => (i, s"src${i % 7}")).toDF("doc_id", "source")

  test("splits are deterministic, exhaustive, and roughly proportional") {
    val a = Curation.assignSplits(docs, "doc_id").collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val b = Curation.assignSplits(docs.repartition(13), "doc_id").collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(a == b, "split assignment must not depend on partitioning")
    assert(a.values.toSet == Set("train", "val", "test"))
    val train = a.values.count(_ == "train").toDouble / a.size
    val value = a.values.count(_ == "val").toDouble / a.size
    assert(math.abs(train - 0.8) < 0.05, s"train fraction $train")
    assert(math.abs(value - 0.1) < 0.05, s"val fraction $value")
  }

  test("weighted samples are stable and nested across rates") {
    val small = Curation.weightedSample(docs, "doc_id", "source", Map("src0" -> 0.2), 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val large = Curation.weightedSample(docs, "doc_id", "source", Map("src0" -> 0.6), 0.9)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(large), "lower rates must select subsets of higher rates")
    val again = Curation.weightedSample(docs.repartition(7), "doc_id", "source", Map("src0" -> 0.2), 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == small, "sample must be reproducible")
    // per-key rates actually differ
    val bySrc = Curation.weightedSample(docs, "doc_id", "source", Map("src0" -> 0.1), 0.9)
      .groupBy("source").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("src0") < bySrc("src1") / 2)
  }

  test("tokenBudgetMix: rates track the budget, capped sources keep everything, samples nest") {
    val rnd = new scala.util.Random(3)
    val docs2 = (0L until 3000L)
      .map(i => (i, s"src${i % 3}", 100L + rnd.nextInt(200)))
      .toDF("doc_id", "source", "n_tokens")
    val weights = Map("src0" -> 0.5, "src1" -> 0.1, "src2" -> 5.0)
    def run(budget: Long) =
      Curation.tokenBudgetMix(docs2, "doc_id", "source", "n_tokens", weights, 0.0, budget)
    val out = run(100000L)
    val kept = out.groupBy("source")
      .agg(sum(col("n_tokens")).as("toks"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val totals = docs2.groupBy("source").agg(sum(col("n_tokens")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // src2's oversized weight caps at keep-everything
    assert(kept("src2")._1 == totals("src2"))
    // src0 targets 50k tokens; hash sampling lands within ~15%
    assert(math.abs(kept("src0")._1 - 50000L) < 7500L, s"src0 kept ${kept("src0")._1}")
    // src1 targets 10k
    assert(math.abs(kept("src1")._1 - 10000L) < 3000L, s"src1 kept ${kept("src1")._1}")
    // nested: a smaller budget selects a subset of a larger one
    val small = run(50000L).select("doc_id").collect().map(_.getLong(0)).toSet
    val large = run(100000L).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(large))
    // deterministic under repartitioning
    val again = Curation.tokenBudgetMix(docs2.repartition(7), "doc_id", "source",
      "n_tokens", weights, 0.0, 100000L).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == large)
  }

  test("packSequences: every doc packs once, pack spans stay under budget, partition-invariant") {
    val df = Tables.documents(spark, sfDir).select(col("doc_id"), col("n_chars"))
    val budget = 4096L
    val out = Curation.packSequences(df, "doc_id", "n_chars", budget, buckets = 8)
      .select("doc_id", "n_chars", "pack_id", "pack_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    // exhaustive, exactly once
    assert(out.map(_._1).distinct.length == out.length)
    assert(out.length == df.count())
    // pack_id is consistent with the doc's start offset
    for ((_, _, pid, off) <- out)
      assert(pid % (1L << 40) == off / budget, s"pack $pid offset $off")
    // offsets within one pack span less than the budget (offset packing)
    for ((pid, docs) <- out.groupBy(_._3)) {
      val offs = docs.map(_._4)
      assert(offs.max - offs.min < budget, s"pack $pid spans ${offs.max - offs.min}")
    }
    // multi-doc packs exist at this budget (it actually packs)
    assert(out.groupBy(_._3).values.exists(_.length > 1))

    // reproducible under any input partitioning
    val again = Curation.packSequences(df.repartition(13), "doc_id", "n_chars", budget, buckets = 8)
      .select("doc_id", "pack_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == out.map(t => t._1 -> t._3).toMap)
  }

  test("hash buckets never overflow: huge ids match the masked reference formula") {
    // ids far beyond 2^32 — unmasked, id * 2654435761 would wrap in Spark
    // and raise in ANSI engines, so cross-engine determinism would break
    val huge = Seq(0L, 3L, 3470000000L, 1L << 40, Long.MaxValue - 1)
    val got = huge.toDF("id")
      .select(col("id"), Curation.hashBucket(col("id"), 100).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (id <- huge) {
      val expect = java.lang.Math.floorMod((id & 0x7FFFFFFFL) * 2654435761L, 100L)
      assert(got(id) == expect, s"id $id: got ${got(id)}, expect $expect")
      assert(got(id) >= 0 && got(id) < 100)
    }
  }

  test("temperatureRebalance follows n^alpha proportions; tail group keeps ~all; deterministic") {
    import spark.implicits._
    // 10000 'big' docs vs 100 'small' — with alpha=0.5 the target mix is
    // sqrt(10000):sqrt(100) = 10:1, so big downsamples ~10x, small stays
    val docs = ((0L until 10000L).map(i => (i, "big")) ++
      (100000L until 100100L).map(i => (i, "small"))).toDF("doc_id", "lang")
    val t6 = Curation.temperatureThresholds(docs, "lang")
    assert(t6("small") == 1000000L, "most-upsampled group keeps everything")
    assert(math.abs(t6("big") - 100000L) <= 1000L,
      s"10:1 over 100x rows -> ~10% rate, got ${t6("big")}")
    val kept = Curation.temperatureRebalance(docs, "doc_id", "lang")
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("small") == 100L)
    // hash sampling: expected 1000 +- statistical noise
    assert(kept("big") > 800L && kept("big") < 1200L, s"got ${kept("big")}")
    // proportions now ~10:1 (temperature-flattened from 100:1)
    val ratio = kept("big").toDouble / kept("small")
    assert(ratio > 8.0 && ratio < 12.0, s"ratio $ratio")
    // partition-invariant determinism
    val again = Curation.temperatureRebalance(docs.repartition(13), "doc_id", "lang")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val first = Curation.temperatureRebalance(docs, "doc_id", "lang")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(again.sameElements(first))
  }

  test("temperatureRebalance at domain granularity: 10k groups broadcast-join, bounded time") {
    import spark.implicits._
    // 10k distinct hosts: a nested when-chain would blow codegen /
    // analysis here; the broadcast threshold join must stay flat
    val docs = (0L until 40000L).map(i => (i, s"host${i % 10000}")).toDF("doc_id", "host")
    val t0 = System.nanoTime()
    val out = Curation.temperatureRebalance(docs, "doc_id", "host")
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"thresholds must ride a broadcast join, plan was:\n$plan")
    val n = out.count()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 60.0, s"10k-group rebalance took ${secs}s")
    // 4 docs per host, uniform: thresholds keep everything
    assert(n == 40000L, s"uniform groups keep all rows, kept $n")
  }

  test("temperatureRebalance on a TIMESTAMP group key: thresholds join matches") {
    import spark.implicits._
    // whole-second timestamps: Java Timestamp.toString renders "…:00.0"
    // while Spark's cast renders "…:00" — the threshold join must use one
    // rendering on both sides or every row silently drops
    val docs = (0L until 600L).map(i => (i, new java.sql.Timestamp(
      86400000L * (i % 3)))).toDF("doc_id", "day")
    val kept = Curation.temperatureRebalance(docs, "doc_id", "day")
    assert(kept.count() == 600L,
      "uniform groups keep everything — zero rows means the key join broke")
    val t6 = Curation.temperatureThresholds(docs, "day")
    assert(t6.size == 3 && t6.values.forall(_ == 1000000L), t6.toString)
  }

  test("temperatureRebalance refuses NULL group keys loudly") {
    import spark.implicits._
    val docs = Seq((1L, Some("en")), (2L, None), (3L, Some("fr")))
      .toDF("doc_id", "lang")
    val e = intercept[IllegalArgumentException] {
      Curation.temperatureThresholds(docs, "lang")
    }
    assert(e.getMessage.contains("NULL"), e.getMessage)
  }
}
