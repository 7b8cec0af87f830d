package graft

/** Scratch profiling tool (r17): runs one declared query in a loop and
  * samples the MAIN thread's stack from a sampler thread, then prints the
  * most frequent collapsed frames — a poor man's async-profiler for the
  * driver gap WapProfile reports but cannot attribute.
  *
  *   sbt "runMain graft.StackSample wap_constraints 5"
  */
object StackSample {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val name = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
    fn(spark, dir).write.format("noop").mode("overwrite").save() // warm sf0.1

    val main = Thread.currentThread()
    val counts = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var run = true
    val sampler = new Thread(() => {
      while (run) {
        val st = main.getStackTrace
        if (st.nonEmpty) {
          // bucket by the deepest INTERESTING frame: first frame in spark/graft
          val key = st.find { f =>
            val c = f.getClassName
            (c.startsWith("org.apache.spark") || c.startsWith("graft")) &&
              !c.contains("StackSample")
          }.map(f => s"${f.getClassName}.${f.getMethodName}").getOrElse("<other>")
          counts.merge(key, 1, (a, b) => a + b)
          // ALSO bucket by a mid-level frame for context
          val mid = st.filter { f =>
            val c = f.getClassName
            c.startsWith("org.apache.spark.sql") || c.startsWith("graft")
          }.takeRight(3).map(f => s"${f.getClassName.split('.').last}.${f.getMethodName}")
            .mkString(" <- ")
          if (mid.nonEmpty) counts.merge("TOP: " + mid, 1, (a, b) => a + b)
        }
        Thread.sleep(2)
      }
    })
    sampler.setDaemon(true)
    sampler.start()
    val t0 = System.nanoTime()
    (1 to reps).foreach { _ =>
      fn(spark, dir).write.format("noop").mode("overwrite").save()
    }
    val wall = (System.nanoTime() - t0) / 1e9
    run = false
    Thread.sleep(50)
    println(f"QUERY=$name reps=$reps wall=$wall%.2f")
    import scala.jdk.CollectionConverters._
    counts.asScala.toSeq.sortBy(-_._2).take(40).foreach { case (k, v) =>
      println(f"$v%6d  $k")
    }
    spark.stop()
  }
}
