package graft

import org.apache.spark.sql.functions._
import graft.operators.Decontamination
import graft.functions.VectorFunctions._

/** Value oracle for benchmark decontamination: both variants must equal a
  * brute-force shingle-set intersection computed in the test. */
class DecontaminationSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val docsDf =
    Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
  private lazy val evalDf = docsDf.filter(col("doc_id") < 5)

  private def shingleSets(df: org.apache.spark.sql.DataFrame, n: Int): Map[Long, Set[Long]] =
    df.select(col("doc_id"), shingleHashes(col("text"), n).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap

  test("broadcast and join variants equal the brute-force shingle intersection") {
    val n = 8
    val docSh = shingleSets(docsDf, n)
    val evalSh = shingleSets(evalDf, n).values.flatten.toSet
    val expected = docSh.filter { case (_, sh) => sh.exists(evalSh.contains) }.keySet
    assert(expected.nonEmpty, "eval members must flag themselves")
    assert((0L until 5L).forall(expected.contains))

    val broadcast = Decontamination.flag(docsDf, "text", evalDf, "text", n)
      .filter(col("contaminated")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(broadcast == expected,
      s"broadcast variant diverged: ${(broadcast -- expected) ++ (expected -- broadcast)}")

    val joined = Decontamination.contaminatedIds(docsDf, "doc_id", "text", evalDf, "text", n)
      .collect().map(_.getLong(0)).toSet
    assert(joined == expected, "join variant must equal the broadcast variant")
  }

  test("quoting 8 consecutive tokens contaminates; unrelated text never does") {
    val eval = Seq((100L, "alpha bravo charlie delta echo foxtrot golf hotel india")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "intro words then alpha bravo charlie delta echo foxtrot golf hotel closing"),
      (2L, "alpha bravo charlie delta echo foxtrot golf different tail"), // only 7 shared
      (3L, "completely unrelated content with no benchmark overlap at all"))
      .toDF("doc_id", "text")
    val flagged = Decontamination.flag(train, "text", eval, "text", n = 8)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(flagged(1L), "an 8-token quote must flag")
    assert(!flagged(2L), "7 shared tokens never form a shared 8-gram")
    assert(!flagged(3L))
  }
}
