package graft

import graft.operators.{PipelineQueries, Relational, Similarity}

/** Plan-shape assertions (SURVEY §4): these queries are graded on the
  * plan Catalyst actually produces, not just their results — filters and
  * projections must reach the parquet scan, small dims must broadcast,
  * top-k must not global-sort, and similarity must not shuffle the full
  * score set. Result correctness is covered by the DuckDB oracle gate. */
class RelationalSpec extends SparkSpecBase {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** Build a plan with size-based broadcast disabled: at sf0.001 every
    * join fits under the broadcast threshold, which hides the shuffle
    * structure these tests grade (and lets a forced broadcast() hint be
    * told apart from a statistics-based one — hints survive threshold
    * -1). */
  private def planNoAutoBroadcast(mk: => org.apache.spark.sql.DataFrame): String = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try plan(mk) finally spark.conf.set(key, old)
  }

  test("q02: filter and projection are pushed into the parquet scan") {
    val p = plan(Relational.q02FilterPushdown(spark, sfDir))
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("GreaterThan(l_quantity") || p.contains("LessThan(l_discount"), p)
    // column pruning: the scan reads only the 3 projected columns
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_quantity")
      && readSchema.contains("l_discount"), readSchema)
    assert(!readSchema.contains("l_extendedprice"), s"scan reads pruned column: $readSchema")
  }

  test("q03: the dimension side of the join broadcasts") {
    val p = plan(Relational.q03BroadcastJoin(spark, sfDir))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p)
  }

  test("q07: global top-k plans TakeOrderedAndProject, not a full sort") {
    val p = plan(Relational.q07TopK(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q19: IN-subquery plans a broadcast LEFT SEMI join, no shuffle") {
    // pins q19's shape against perf drift: the hinted broadcast survives
    // threshold -1, the join is left-semi (stops at first match), and the
    // fact side reaches the join without any exchange
    val p = planNoAutoBroadcast(Relational.q19ExistsIn(spark, sfDir))
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("Exchange hashpartitioning"),
      s"the orders side must stream into the broadcast join unshuffled\n$p")
  }

  test("q14: the per-partkey aggregate is NOT force-broadcast") {
    // with the size threshold off, a broadcast can only appear through an
    // explicit hint — the OOM path this test guards against. (At real
    // scale the aggregate outgrows the threshold; AQE may still choose
    // broadcast when runtime stats prove it small.)
    val p = planNoAutoBroadcast(Relational.q14ScalarSubquery(spark, sfDir))
    assert(!p.contains("BroadcastHashJoin"), p)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
  }

  test("text_bm25: corpus stats broadcast, no token explode in the plan") {
    val p = plan(PipelineQueries.textBm25(spark, sfDir))
    assert(p.contains("BroadcastExchange"), "the one-row stats aggregate must broadcast\n" + p)
    assert(!p.contains("Generate"), "tf must come from array ops, not an explode\n" + p)
  }

  test("q21: both windows share one event_type shuffle") {
    val p = planNoAutoBroadcast(Relational.q21Percentiles(spark, sfDir))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 2, s"rank+count windows must reuse the event_type partitioning:\n$p")
  }

  test("q23 approx deciles: no global sort/window in the plan, close to exact ntile") {
    val df = Relational.q23SpendDecilesApprox(spark, sfDir)
    val p = plan(df)
    assert(!p.contains("Window"), s"sketch path must not plan a window:\n$p")
    assert(!p.contains("Exchange SinglePartition") && !p.contains("Sort ["),
      s"sketch path must not serialize onto one reducer:\n$p")
    assert(p.contains("InMemoryTableScan") || p.contains("InMemoryRelation"),
      s"rollup must reuse the persisted spend aggregate (one orders pass, not two):\n$p")

    val exact = Relational.q23SpendDeciles(spark, sfDir)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val approx = df.collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val nTotal = exact.values.map(_._1).sum
    assert(approx.values.map(_._1).sum == nTotal, "every customer lands in exactly one decile")
    assert(approx.keySet.subsetOf((1 to 10).toSet))
    // each decile holds ~n/10 customers (sketch error + tie clustering allow slack)
    val target = nTotal / 10.0
    for ((d, (n, _)) <- approx)
      assert(math.abs(n - target) <= math.max(2.0, 0.15 * target),
        s"decile $d holds $n customers, expected ~$target")
    // decile spend totals track the exact split
    val exactSpend = exact.values.map(_._2).sum
    for (d <- 1 to 10 if exact.contains(d) && approx.contains(d))
      assert(math.abs(approx(d)._2 - exact(d)._2) <= 0.05 * exactSpend + 1.0,
        s"decile $d spend ${approx(d)._2} vs exact ${exact(d)._2}")
  }

  test("intervalJoin equals the nested-loop range join and never plans one") {
    import graft.operators.Ranges
    import org.apache.spark.sql.functions.col
    val spark0 = spark
    import spark0.implicits._
    val rnd = new scala.util.Random(11)
    val points = (0 until 2000).map(i => (i.toLong, rnd.nextDouble() * 100.0)).toDF("pid", "x")
    // deliberately OVERLAPPING intervals: points can match several
    val ranges = Seq(("r0", 0.0, 30.0), ("r1", 20.0, 60.0), ("r2", 50.0, 100.0),
      ("r3", 95.0, 101.0), ("r4", 10.0, 12.5)).toDF("rid", "lo", "hi")
    val got = Ranges.intervalJoin(points, "x", ranges, "lo", "hi", width = 10.0)
      .select("pid", "rid").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val want = points.join(ranges, col("x") >= col("lo") && col("x") < col("hi"))
      .select("pid", "rid").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == want, s"interval join diverged: ${(got -- want) ++ (want -- got)}")
    val p = plan(Ranges.intervalJoin(points, "x", ranges, "lo", "hi", width = 10.0))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"interval join must be an equi-join on buckets:\n$p")
  }

  test("events_asof: one key shuffle, no range join, no nested-loop/cartesian") {
    val p = planNoAutoBroadcast(PipelineQueries.eventsAsof(spark, sfDir))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // the union-marker plan partitions once on the key for the window
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected exactly one key shuffle, saw $exchanges:\n$p")
    assert(p.contains("Window"), p)
  }

  test("brute-force top-k: scores reduce through the partial heap, no global score shuffle") {
    val e = Tables.embeddings(spark, sfDir)
    val df = Similarity.bruteForceTopK(
      e.filter(org.apache.spark.sql.functions.col("vec_id") >= 100), "vec_id", "embedding",
      e.filter(org.apache.spark.sql.functions.col("vec_id") < 5), "vec_id", "embedding", k = 3)
    val p = plan(df)
    assert(p.contains("MapPartitions"), p)
    // the only Exchange keyed by query_id is AFTER the partial heap (its
    // input is the mapPartitions output, never the raw cross join)
    val exchangeIdx = p.indexOf("hashpartitioning(query_id")
    val mapIdx = p.indexOf("MapPartitions")
    assert(exchangeIdx >= 0 && mapIdx >= 0 && exchangeIdx < mapIdx,
      s"window exchange must sit above the partial heap: $p")
  }

  test("minhash LSH: the band join shuffles ids only, shingle payloads stay out of the explode") {
    val docs = Tables.documents(spark, sfDir)
    val p = planNoAutoBroadcast(graft.operators.Dedup.minhashPairs(docs, "doc_id", "text"))
    // band-join exchanges are keyed on (band, bucket); their input schema
    // must not carry the shingle array column
    val lines = p.linesIterator.toSeq
    val bandExchanges = lines.filter(l => l.contains("hashpartitioning(__band"))
    assert(bandExchanges.nonEmpty, p)
    assert(bandExchanges.forall(!_.contains("__sh")),
      s"shingles ride the band shuffle: ${bandExchanges.mkString("\n")}")
  }
}
