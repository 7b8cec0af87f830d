package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._

/** Dev tool: prints the RAW metrics behind each CheckQueries boolean gate
  * (recall, accuracy, tolerance deltas) at a given sf dir, so the floors
  * in CheckQueries are pinned with measured headroom, not guesses.
  * Run: sbt "Test/runMain graft.CheckCalibrate /root/testdata/sf0.01" */
object CheckCalibrate {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[8]"), shufflePartitions = 8
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val brute = PipelineQueries.simTopkBrute(spark, dir)
      .select(col("query_id"), col("neighbor_id")).cache()
    val ntot = brute.count().toDouble
    def annRecall(name: String, ann: DataFrame): Unit = {
      val ids = ann.select(col("query_id"), col("neighbor_id")).cache()
      val hits = ids.join(brute, Seq("query_id", "neighbor_id")).count()
      val perQ = ids.groupBy("query_id").count()
        .agg(count(lit(1)), min("count"), max("count")).collect().head
      println(f"[ann] $name%-6s recall=${hits / ntot}%.4f nq=${perQ.getLong(0)} " +
        f"minRows=${perQ.getLong(1)} maxRows=${perQ.getLong(2)}")
      ids.unpersist()
    }
    annRecall("lsh", PipelineQueries.simTopkLsh(spark, dir))
    annRecall("ivf", PipelineQueries.simTopkIvf(spark, dir))
    annRecall("ivfq", PipelineQueries.simTopkIvfq(spark, dir))
    annRecall("ivfpq", PipelineQueries.simTopkIvfpq(spark, dir))
    annRecall("pca", PipelineQueries.simTopkPca(spark, dir))
    // param sweeps
    val e = Tables.embeddings(spark, dir)
    val corp = e.filter(col("vec_id") >= 100)
    val qs = e.filter(col("vec_id") < 20)
    for (m <- Seq(8, 16); np <- Seq(24, 32); cf <- Seq(12, 24); ts <- Seq(2048, 4096))
      annRecall(s"ivfpq-m$m-np$np-cf$cf-ts$ts", Similarity.ivfTopKPQ(
        corp, "vec_id", "embedding", qs, "vec_id", "embedding",
        k = 5, centroids = 64, nprobe = np, candidateFactor = cf, ksub = 32,
        trainSample = ts, residual = true, refineSteps = 1))

    // q21 sketch deltas
    val e21 = Relational.q21Percentiles(spark, dir)
      .select(col("event_type"), col("p50").as("e50"), col("p90").as("e90"),
        col("p99").as("e99"), col("n").as("en"))
    val a21 = Relational.q21PercentilesApprox(spark, dir)
      .select(col("event_type"), col("p50").as("a50"), col("p90").as("a90"),
        col("p99").as("a99"), col("n").as("an"))
    e21.join(a21, "event_type").collect().foreach { r =>
      println(f"[q21] ${r.getAs[String]("event_type")}%-10s " +
        f"d50=${math.abs(r.getAs[Double]("e50") - r.getAs[Double]("a50"))}%.4f " +
        f"d90=${math.abs(r.getAs[Double]("e90") - r.getAs[Double]("a90"))}%.4f " +
        f"d99=${math.abs(r.getAs[Double]("e99") - r.getAs[Double]("a99"))}%.4f " +
        f"n=${r.getAs[Long]("en")}/${r.getAs[Long]("an")}")
    }

    // q23 balance
    val a23 = Relational.q23SpendDecilesApprox(spark, dir)
      .agg(count(lit(1)), sum("n_customers"), sum("decile_spend"),
        min("n_customers"), max("n_customers")).collect().head
    val spend = Tables.orders(spark, dir).groupBy(col("o_custkey"))
      .agg(round(sum(col("o_totalprice")), 2).as("spend"))
      .agg(count(lit(1)), sum("spend")).collect().head
    println(s"[q23] deciles=${a23.getLong(0)} custTotal=${a23.getLong(1)}/${spend.getLong(0)} " +
      f"spendDelta=${math.abs(a23.getDouble(2) - spend.getDouble(1))}%.6f " +
      s"minN=${a23.getLong(3)} maxN=${a23.getLong(4)} ideal=${spend.getLong(0) / 10}")

    // langid gate (fixed sample, via the check itself)
    CheckQueries.textCheckLangid(spark, dir).collect().foreach(r =>
      println(s"[langid] $r"))
    val docs = Tables.documents(spark, dir)

    // dedup family recalls
    val p = Dedup.prepare(docs, "doc_id", "text")
    val sub = p.sh.filter(col("__id") < 500)
    val truth = sub.select(col("__id").as("id_a"), col("__sh").as("sh_a"))
      .join(sub.select(col("__id").as("id_b"), col("__sh").as("sh_b")),
        col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double")).as("jac"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          least(size(col("sh_a")), size(col("sh_b"))).cast("double")).as("cont"))
      .cache()
    val subPair = col("id_a") < 500 && col("id_b") < 500
    def pairStats(name: String, t: DataFrame, g: DataFrame): Unit = {
      val tt = t.select("id_a", "id_b").cache()
      val gg = g.select("id_a", "id_b").cache()
      val nt = tt.count(); val hits = gg.join(tt, Seq("id_a", "id_b")).count()
      val extra = gg.join(tt, Seq("id_a", "id_b"), "left_anti").count()
      val rec = if (nt == 0) Double.NaN else hits.toDouble / nt
      println(f"[dedup] $name%-14s nTrue=$nt%4d recall=$rec%.4f extra=$extra")
      tt.unpersist(); gg.unpersist()
    }
    pairStats("jaccard05", truth.filter(col("jac") >= 0.5),
      Dedup.ngramJaccard(p, threshold = 0.5).filter(subPair))
    pairStats("jaccard08", truth.filter(col("jac") >= 0.8),
      Dedup.minhashPairs(p, bands = 16, threshold = 0.8).filter(subPair))
    pairStats("containment09", truth.filter(col("cont") >= 0.9),
      Dedup.containmentPairs(p, bands = 32, threshold = 0.9).filter(subPair))
    import graft.functions.VectorFunctions._
    val sigs = docs.filter(col("doc_id") < 500)
      .select(col("doc_id").as("__id"), simhash64(col("text")).as("__sig")).cache()
    pairStats("simhash3",
      sigs.select(col("__id").as("id_a"), col("__sig").as("sig_a"))
        .join(sigs.select(col("__id").as("id_b"), col("__sig").as("sig_b")),
          col("id_a") < col("id_b"))
        .filter(bit_count(col("sig_a").bitwiseXOR(col("sig_b"))) <= 3),
      Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3).filter(subPair))
    val emb = Tables.embeddings(spark, dir)
    val evv = emb.select(col("vec_id"), col("embedding"))
    val planted = evv.filter(col("vec_id") < 50).select(
      (col("vec_id") + 1000000L).as("vec_id"),
      expr("transform(embedding, (x, i) -> CAST(x + 0.05 * " +
        "element_at(embedding, ((i + 1) % size(embedding)) + 1) AS FLOAT))")
        .as("embedding"))
    val evAll = evv.unionByName(planted)
    pairStats("embedding95",
      evAll.select(col("vec_id").as("id_a"), col("embedding").as("v_a"))
        .join(evAll.select(col("vec_id").as("id_b"), col("embedding").as("v_b")),
          col("id_a") < col("id_b"))
        .filter(cosineSimF(col("v_a"), col("v_b")) >= 0.95),
      Dedup.embeddingPairs(evAll, "vec_id", "embedding", threshold = 0.95))

    spark.stop()
  }
}
