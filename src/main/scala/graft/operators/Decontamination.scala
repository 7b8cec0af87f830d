package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Benchmark decontamination: flag training documents that share any
  * word n-gram with an evaluation set (the standard leakage guard before
  * training — eval questions quoted inside crawl pages inflate scores).
  * Matching is on the one-pass native shingle hashes
  * ([[graft.functions.ShingleHashes]]: ascii-alnum tokens, lowercased),
  * so formatting/punctuation differences don't hide contamination.
  */
object Decontamination {

  /** Broadcast variant — the default: eval sets are small (thousands of
    * documents), so their distinct shingle set collects to the driver
    * once and the check is a MAP-SIDE `arrays_overlap` against the
    * broadcast literal. Zero shuffles over the training corpus.
    *
    * @return df + boolean `contaminated` */
  def flag(
      df: DataFrame, textCol: String,
      eval: DataFrame, evalTextCol: String, n: Int = 8): DataFrame = {
    val evalShingles = eval
      .select(explode(shingleHashes(col(evalTextCol), n)).as("__s"))
      .distinct().collect().map(_.getLong(0)).toSeq
    df.withColumn("contaminated",
      arrays_overlap(shingleHashes(col(textCol), n), typedlit(evalShingles)))
  }

  /** Join variant for LARGE eval sets (beyond broadcast): training docs
    * explode to (shingle, id) — ids only, never text — and left-semi
    * join the eval shingle set on the hash. One shuffle keyed by shingle
    * hash (high-cardinality, uniform by construction).
    *
    * @return the contaminated ids (idCol), distinct */
  def contaminatedIds(
      df: DataFrame, idCol: String, textCol: String,
      eval: DataFrame, evalTextCol: String, n: Int = 8): DataFrame = {
    val docShingles = df.select(col(idCol),
      explode(shingleHashes(col(textCol), n)).as("__s"))
    val evalShingles = eval
      .select(explode(shingleHashes(col(evalTextCol), n)).as("__s"))
      .distinct()
    docShingles.join(evalShingles, Seq("__s"), "left_semi")
      .select(col(idCol)).distinct()
  }
}
