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
  *
  * SELF-ADJUDICATION (r16): after the timed pass, any query whose median
  * exceeds 2x its committed same-SF reference (bench_local.json at
  * process start) re-runs median-of-3 with a fresh mem-sentinel reading;
  * the JSON's "rerun" map carries (rerun, first, ref, mem) per spiked
  * query so a co-tenant roaming spike adjudicates from the artifact
  * alone. Capped at the 12 worst ratios.
  */
object Bench {

  /** Fixed-work single-threaded CPU sentinel: a deterministic FNV-style
    * fold over 3e8 iterations, timed. Run at bench start AND end and
    * written into the JSON, it makes host contention detectable from the
    * artifact alone — two rounds in a row the driver host produced
    * phantom regressions (uniform ~2x inflation across unchanged
    * sub-second queries) that only an isolated re-run could adjudicate.
    * The work is constant, so calib values far above the known-idle
    * figure (~0.25 s) mean the HOST was loaded and the query timings are
    * untrustworthy; stable calib values mean a slowdown is real. */
  private def calibrate(): Double = {
    var h = 0x811c9dc5L
    var i = 0L
    val n = 300000000L
    val t0 = System.nanoTime()
    while (i < n) { h = (h ^ i) * 0x100000001b3L; i += 1 }
    val dt = (System.nanoTime() - t0) / 1e9
    if (h == 42L) System.err.println(h) // defeat dead-code elimination
    dt
  }

  /** Fixed-work ALL-CORES sentinel: the single-threaded calibration above
    * cannot see co-tenant load that steals only SOME cores — r10's driver
    * host reported near-idle single-thread calib (0.43 s) while the
    * 32-way-parallel check queries ran 3-6x slow. This one saturates
    * every core with the same deterministic fold (one unit of
    * [[calibrate]]'s work per core, so the wall-clock is ~the
    * single-thread figure on an idle host and degrades in proportion to
    * whatever share of the machine someone else is using). */
  private def calibrateParallel(): Double = {
    val cores = Runtime.getRuntime.availableProcessors()
    val t0 = System.nanoTime()
    val threads = (0 until cores).map { c =>
      val t = new Thread(() => {
        var h = 0x811c9dc5L ^ c
        var i = 0L
        val n = 300000000L
        while (i < n) { h = (h ^ i) * 0x100000001b3L; i += 1 }
        if (h == 42L) System.err.println(h)
      })
      t.start(); t
    }
    threads.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }

  /** Fixed-work ALL-CORES MEMORY sentinel: each core strides a private
    * 32 MB long array (3 sweeps, sum-folded) — aggregate bandwidth, the
    * resource the ALU sentinels above cannot see. r11 observed uniform
    * 30-60% inflation on every memory-heavy parallel query while BOTH
    * ALU sentinels stayed flat: co-tenant memory-bandwidth/LLC pressure
    * is invisible to compute-bound probes. Arrays allocate once per
    * process (timed region is the sweeps only). */
  private lazy val memArrays: Array[Array[Long]] = {
    val cores = Runtime.getRuntime.availableProcessors()
    Array.fill(cores)(Array.tabulate(4 * 1024 * 1024)(i => i.toLong))
  }
  private def calibrateMemory(): Double = {
    val t0 = System.nanoTime()
    val threads = memArrays.map { arr =>
      val t = new Thread(() => {
        var s = 0L
        var sweep = 0
        while (sweep < 3) {
          var i = 0
          while (i < arr.length) { s += arr(i); i += 16 } // one miss per line
          sweep += 1
        }
        if (s == 42L) System.err.println(s)
      })
      t.start(); t
    }
    threads.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }

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
      // family-boundary GC: over a 100-query run the heap accumulates
      // (unpersisted blocks, codegen classes, catalog metadata) and GC
      // ergonomics then differ per PROCESS — four same-code idle-host
      // runs ranged 62-78 s with the swing concentrated in the
      // largest late-heap queries. A forced collection at each family
      // boundary resets that state deterministically, so per-query
      // medians compare across runs (the boundary cost is untimed).
      System.gc()
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
    calibrate() // untimed: JIT-compile the sentinel loop itself
    calibrateParallel() // untimed: the parallel sentinel's lambda JITs separately
    calibrateMemory() // untimed: allocates the arrays + JITs the sweep
    // min-of-3 for the all-cores sentinels: own-process residue (GC from
    // the warmup pass, thread-pool churn) inflates a single sample by
    // 2-4x, while CO-TENANT pressure persists across all three — the min
    // keeps the signal and drops the self-noise
    def min3(f: () => Double): Double = Seq(f(), f(), f()).min
    val calibStart = calibrate()
    val calibParStart = min3(() => calibrateParallel())
    val calibMemStart = min3(() => calibrateMemory())
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
    val calibEnd = calibrate()
    val calibParEnd = min3(() => calibrateParallel())
    val calibMemEnd = min3(() => calibrateMemory())

    // ---- self-adjudication (r16): the recurring driver-host failure
    // mode is a ROAMING co-tenant spike — one sub-second query lands
    // 3-8x slow while every sentinel reads idle, and a later isolated
    // re-run comes back clean. Instead of leaving that to a human, any
    // query whose median exceeds 2x its COMMITTED reference (the
    // bench_local.json this checkout shipped with — the driver benches a
    // fresh checkout, so at process start the file IS the committed map)
    // re-runs here, after the timed pass, median-of-3 with caches
    // cleared and its own mem-sentinel reading alongside. The artifact
    // then carries both values inline: a clean rerun ~= the reference
    // adjudicates the spike as transient; a rerun matching the slow
    // first pass marks a real regression. Reference rows are only
    // trusted at the same SF, and the pass is capped to the worst 12
    // ratios so a genuinely loaded host cannot double the bench. ----
    val refQueries: Map[String, Double] = {
      try {
        val refPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_REF", "bench_local.json")
        val txt = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(refPath)), "UTF-8")
        import org.json4s._
        val j = org.json4s.jackson.JsonMethods.parse(txt)
        val refSf = j \ "sf" match { case JString(s) => s; case _ => "" }
        if (refSf != sfDir) Map.empty[String, Double]
        else {
          def num(v: JValue): Option[Double] = v match {
            case JDouble(d) => Some(d)
            case JInt(i) => Some(i.toDouble)
            case JDecimal(d) => Some(d.toDouble)
            case _ => None
          }
          val base = j \ "queries" match {
            case JObject(fields) => fields.flatMap { case (k, v) =>
              num(v).map(k -> _) }.toMap
            case _ => Map.empty[String, Double]
          }
          // a reference row that itself carried an inline rerun was a
          // spiked measurement — its ADJUDICATED value is the rerun, so
          // prefer it (the inflated first-pass median would soften this
          // run's 2x threshold exactly where vigilance matters most)
          val adjudicated = j \ "rerun" match {
            case JObject(fields) => fields.flatMap { case (k, v) =>
              num(v \ "rerun").map(k -> _) }.toMap
            case _ => Map.empty[String, Double]
          }
          base ++ adjudicated
        }
      } catch { case _: Throwable => Map.empty[String, Double] }
    }
    val reruns: Seq[(String, (Double, Double, Double, Double))] = results
      .filter { case (n2, v) =>
        !errors.contains(n2) && refQueries.get(n2).exists(r => r > 0 && v > 2.0 * r)
      }
      .sortBy { case (n2, v) => -(v / refQueries(n2)) }
      .take(12)
      .map { case (n2, first) =>
        clearCaches()
        val mem = calibrateMemory()
        val fn = SparkEntry.queries(n2)
        val ts = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          catch { case _: Throwable => () }
          (System.nanoTime() - t0) / 1e9
        }.sorted
        n2 -> ((ts(1), first, refQueries(n2), mem))
      }
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replaceAll("[\\x00-\\x1f]", " ") + "\""
    // ms precision: full-double timings made the line outgrow the
    // driver artifact's 2000-char stdout tail (r8 lost 30 of 94 rows)
    def ms(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v) => s"${q(k)}:${ms(v)}" }.mkString("{", ",", "}")
    val es = errors.map { case (k, v) => s"${q(k)}:${q(v)}" }.mkString("{", ",", "}")
    val rr = reruns.map { case (k, (med, first, ref, mem)) =>
      s"${q(k)}:{" + s""""rerun":${ms(med)},"first":${ms(first)},""" +
        s""""ref":${ms(ref)},"mem":${ms(mem)}}"""
    }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // field order is deliberate: the driver keeps the stdout TAIL, so the
    // per-query map and headline value sit at the END of the line and
    // survive even if boilerplate fields are truncated away
    val line =
      s"""{"metric":"total","unit":"sec","runs":$runs,"sf":"$sfDir","errors":$es,""" +
        s""""calib_start_sec":${ms(calibStart)},"calib_end_sec":${ms(calibEnd)},""" +
        s""""calib_par_start_sec":${ms(calibParStart)},"calib_par_end_sec":${ms(calibParEnd)},""" +
        s""""calib_mem_start_sec":${ms(calibMemStart)},"calib_mem_end_sec":${ms(calibMemEnd)},""" +
        s""""rerun":$rr,"value":${ms(total)},"queries":$qs}"""
    println(line)
    // At ~97 queries the full line outgrows the driver artifact's
    // 2000-char stdout tail no matter the precision, so a SECOND compact
    // line follows with the adjudication-critical fields (headline value
    // + the calibration sentinels). The tail then always carries: the
    // trailing ~85% of the query map (alphabetical — the cheap curate_*
    // rows are what truncates) plus this complete summary; a driver that
    // parses the LAST line gets valid JSON with value + calibration.
    // the compact line carries the FULL rerun map (it is small — at most
    // 12 adjudication rows) so the driver's stdout tail always has it
    println(s"""{"metric":"total","unit":"sec","runs":$runs,""" +
      s""""calib_start_sec":${ms(calibStart)},"calib_end_sec":${ms(calibEnd)},""" +
      s""""calib_par_start_sec":${ms(calibParStart)},"calib_par_end_sec":${ms(calibParEnd)},""" +
      s""""calib_mem_start_sec":${ms(calibMemStart)},"calib_mem_end_sec":${ms(calibMemEnd)},""" +
      s""""rerun":$rr,""" +
      s""""n_queries":${results.size},"n_errors":${errors.size},"value":${ms(total)}}""")
    // the driver's bench artifact truncates to the stdout tail and loses
    // most per-query timings; ALSO write the full line to a file so every
    // round's complete map is reviewable in-repo (SPARK_GRAFT_BENCH_OUT
    // overrides; failures are non-fatal — the bench itself has already
    // reported). r17: the default is per-CORE-COUNT (bench_local_c32.json
    // / bench_local_c8.json) — the driver benches 32c then 8c in one
    // round, and a shared default file meant the scaling run DESTROYED
    // the 32c map (r16's had to be reconstructed from a 2000-char stdout
    // tail). The committed adjudication reference stays bench_local.json
    // (SPARK_GRAFT_BENCH_REF default), which no run clobbers now.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", s"bench_local_c$cpus.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), line + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] could not write $outPath: $e") }
    spark.stop()
    if (errors.nonEmpty) {
      System.err.println(s"[bench] ${errors.size} queries FAILED: ${errors.keys.mkString(", ")}")
      sys.exit(1)
    }
  }
}
