package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerTaskEnd}

/** Query profiler (optimization tooling, like [[PlanDump]]): runs one
  * declared query once and reports job count, wall time, summed task time,
  * the driver-side gap (planning/commit/metadata), a tasks-per-stage
  * histogram, and the graft callsites of every >4-task stage — the r16
  * round used it to trace near-empty 32-task stages to cached aggregates
  * that AQE could not re-partition.
  *
  *   sbt "runMain graft.WapProfile wap_mview"
  */
object WapProfile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val name = args(0)
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    // warm (JIT + parquet readers) at tiny scale
    fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()

    @volatile var jobs = 0
    @volatile var jobWallNs = 0L
    @volatile var taskNs = 0L
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val l = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        starts.put(j.jobId, System.nanoTime()); jobs += 1
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val s = starts.remove(j.jobId)
        if (s != 0L) jobWallNs += System.nanoTime() - s
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        if (t.taskInfo != null) taskNs += (t.taskInfo.finishTime - t.taskInfo.launchTime) * 1000000L
      }
    }
    val stageTasks = new java.util.concurrent.ConcurrentHashMap[Int, (String, Int, Long)]()
    val l2 = new SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        stageTasks.put(i.stageId, (i.name.take(60), i.numTasks,
          i.taskMetrics.executorRunTime))
        if (i.numTasks > 4)
          println(s"BIGSTAGE tasks=${i.numTasks} ${i.name.take(60)}\n" +
            i.details.split("\n").filter(_.contains("graft")).take(6)
              .mkString("  ", "\n  ", ""))
      }
    }
    spark.sparkContext.addSparkListener(l)
    spark.sparkContext.addSparkListener(l2)
    graft.wap.BranchCatalog.metaParseNanos.set(0L)
    graft.wap.BranchCatalog.metaParseCount.set(0L)
    val t0 = System.nanoTime()
    fn(spark, dir).write.format("noop").mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500) // let listener drain
    println(f"QUERY=$name wall=$wall%.3f jobs=$jobs jobWall=${jobWallNs / 1e9}%.3f " +
      f"taskSum=${taskNs / 1e9}%.3f driverGap=${wall - jobWallNs / 1e9}%.3f")
    println(f"METAPARSE count=${graft.wap.BranchCatalog.metaParseCount.get()} " +
      f"sec=${graft.wap.BranchCatalog.metaParseNanos.get() / 1e9}%.3f")
    import scala.jdk.CollectionConverters._
    val st = stageTasks.asScala.values.toSeq
    println(s"stages=${st.size} tasksTotal=${st.map(_._2).sum}")
    st.groupBy(_._2).toSeq.sortBy(-_._2.size).take(8).foreach { case (n, ss) =>
      println(f"  $n%4d-task stages: ${ss.size}%4d  runTimeSum=${ss.map(_._3).sum / 1e3}%.2fs")
    }
    st.filter(_._2 > 4).sortBy(-_._3).foreach { case (nm, nt, rt) =>
      println(f"  big stage: tasks=$nt%4d run=${rt / 1e3}%.2fs  $nm")
    }
    spark.stop()
  }
}
