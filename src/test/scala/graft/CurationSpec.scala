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
}
