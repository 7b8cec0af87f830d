package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. Each query materializes its FULL result through
  * the noop datasource sink (count() would let Catalyst prune aggregate
  * columns away for some plans). A query error is recorded per-name and
  * fails the run (exit 1) — a bench where queries silently fail must not
  * print a plausible-looking total.
  *
  * Protocol: each query runs 3 times in one JVM and reports the PER-QUERY
  * MEDIAN ("runs":3 in the output) — single-shot timings produced phantom
  * 15-27% round-over-round swings on sub-second queries. Session-scoped
  * caches (the dedup shingle projection, q23's spend aggregate) are
  * cleared between query FAMILIES, so a family's first run pays its own
  * shared-preparation cost and nothing leaks into later families' memory
  * headroom; within a family that sharing is the operator's design
  * (SURVEY §4 shingle reuse), so medians time the steady-state path.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt.max(1)
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus.toInt
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def clearCaches(): Unit = {
      graft.operators.PipelineQueries.clearPrepared(spark)
      graft.operators.SessionCaches.clear(spark)
    }
    // two-pass bench: run EVERY query shape once at the tiny SF first, so
    // the measured pass times the query rather than first-touch JIT of
    // whatever machinery (regex, codegen, shuffle, parquet reader) that
    // query happens to exercise first — with a single-query warmup, the
    // first alphabetical user of each subsystem absorbed its JIT cost
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    // optional allowlist for scaling studies on partial datasets (e.g. an
    // sf1 replica that carries only the relational tables); the driver
    // never sets it, so driver runs always bench everything
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    selected.foreach { case (_, fn) =>
      try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    clearCaches() // warmup artifacts must not subsidize the timed pass
    def family(name: String): String = name.takeWhile(_ != '_')
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var prevFamily = ""
    val results = selected.map { case (name, fn) =>
      if (family(name) != prevFamily) { clearCaches(); prevFamily = family(name) }
      val times = (1 to runs).flatMap { _ =>
        if (errors.contains(name)) None
        else {
          val t0 = System.nanoTime()
          try {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            Some((System.nanoTime() - t0) / 1e9)
          } catch { case e: Throwable =>
            errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
            Some((System.nanoTime() - t0) / 1e9)
          }
        }
      }
      val sorted = times.sorted
      name -> sorted(sorted.size / 2)
    }
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replaceAll("[\\x00-\\x1f]", " ") + "\""
    val qs = results.map { case (k, v) => s"${q(k)}:$v" }.mkString("{", ",", "}")
    val es = errors.map { case (k, v) => s"${q(k)}:${q(v)}" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","runs":$runs,"queries":$qs,"errors":$es,"sf":"$sfDir"}"""
    println(line)
    // the driver's bench artifact truncates to the stdout tail and loses
    // most per-query timings; ALSO write the full line to a file so every
    // round's complete map is reviewable in-repo (SPARK_GRAFT_BENCH_OUT
    // overrides the default repo-root path; failures are non-fatal — the
    // bench itself has already reported)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_local.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), line + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] could not write $outPath: $e") }
    spark.stop()
    if (errors.nonEmpty) {
      System.err.println(s"[bench] ${errors.size} queries FAILED: ${errors.keys.mkString(", ")}")
      sys.exit(1)
    }
  }
}
