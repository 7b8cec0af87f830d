package graft

/** Optimization-evidence tool: writes `explain("formatted")` of every (or a
  * filtered set of) declared query to one file per query. Lifecycle queries
  * execute their eager catalog work while the returned frame is built, so
  * run this at a SMALL scale factor (the plan shape, not the data, is the
  * point). Usage:
  *
  *   sbt "runMain graft.PlanDump /root/testdata/sf0.001 plans/r16 q03,wap_spj"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <dataDir> <outDir> [q1,q2,...] [suffix]")
    val dir = args(0)
    val out = java.nio.file.Paths.get(args(1))
    java.nio.file.Files.createDirectories(out)
    val only = args.lift(2).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val suffix = args.lift(3).getOrElse("")
    val spark = GraftSession.local(8)
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (n, fn) =>
        try {
          val df = fn(spark, dir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          java.nio.file.Files.writeString(out.resolve(s"$n$suffix.txt"), plan)
          System.err.println(s"[plandump] wrote $n")
        } catch { case e: Throwable =>
          System.err.println(s"[plandump] FAILED $n: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
