package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._
import graft.operators.Skew

/** SQL registration (GraftExtensions/GraftFunctions) and skew-salted join
  * oracles. */
class ExtensionsSpec extends SparkSpecBase {
  import spark.implicits._

  test("every graft function is callable from SQL and matches the Column API") {
    GraftFunctions.register(spark)
    Tables.embeddings(spark, sfDir).createOrReplaceTempView("emb")
    Tables.documents(spark, sfDir).createOrReplaceTempView("docs")

    val sqlDot = spark.sql(
      "SELECT vec_id, dot_f(embedding, embedding) AS d, cosine_sim_f(embedding, embedding) AS c FROM emb")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val colDot = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), dotF(col("embedding"), col("embedding")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(sqlDot.nonEmpty)
    sqlDot.foreach { case (id, (d, c)) =>
      assert(d == colDot(id))
      assert(math.abs(c - 1.0) < 1e-9, s"self-cosine of $id was $c")
    }

    val viaSql = spark.sql(
      """SELECT doc_id, minhash_sig(shingle_hashes(text, 3), 64) AS sig,
                simhash64(split(lower(text), ' ')) AS sh,
                rolling_fp64(split(lower(text), ' ')) AS fp,
                srp_bands(CAST(array(1.0, 2.0, 3.0) AS ARRAY<FLOAT>), 4, 2) AS bands
         FROM docs WHERE text IS NOT NULL LIMIT 5""").collect()
    assert(viaSql.length == 5)
    assert(viaSql.forall(_.getSeq[Long](1).length == 64))
    assert(viaSql.forall(_.getSeq[Long](4).length == 2))

    val textStats = spark.sql(
      """SELECT doc_id, token_counts(text) AS tc,
                text_quality_stats(text, 'the,a,of') AS qs
         FROM docs WHERE text IS NOT NULL LIMIT 5""").collect()
    assert(textStats.length == 5)
    for (r <- textStats) {
      val tc = r.getStruct(1)
      val qs = r.getStruct(2)
      assert(tc.getInt(0) > 0 && tc.getInt(1) > 0, "token counts positive on real docs")
      assert(qs.getInt(0) > 0, "n_chars positive")
      assert(qs.getInt(2) >= 1, "n_toks >= 1")
    }
  }

  test("saltJoin equals the plain join on skewed data, for inner and left joins") {
    // skewed: key 1 owns 90% of left rows
    val left = ((1 to 900).map(i => (1L, i.toLong)) ++ (1 to 100).map(i => (i.toLong % 7 + 2, i.toLong)))
      .toDF("k", "v")
    val right = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (9L, "unmatched-right")).toDF("k", "name")

    val plainInner = left.join(right, Seq("k"), "inner")
      .select("k", "v", "name").collect().map(_.toString).sorted
    val saltedInner = Skew.saltJoin(left, right, "k", salts = 8)
      .select("k", "v", "name").collect().map(_.toString).sorted
    assert(saltedInner.sameElements(plainInner))
    assert(plainInner.nonEmpty)

    val plainLeft = left.join(right, Seq("k"), "left")
      .select("k", "v", "name").collect().map(_.toString).sorted
    val saltedLeft = Skew.saltJoin(left, right, "k", salts = 8, joinType = "left")
      .select("k", "v", "name").collect().map(_.toString).sorted
    assert(saltedLeft.sameElements(plainLeft))
  }

  test("GraftSession.configure appends to caller-set spark.sql.extensions, idempotently") {
    import org.apache.spark.sql.graft.Bridge
    val graftExt = classOf[GraftExtensions].getName
    def ext(b: org.apache.spark.sql.SparkSession.Builder): Option[String] =
      Bridge.builderOption(b, "spark.sql.extensions")

    // no prior value: plain set
    val fresh = GraftSession.configure(org.apache.spark.sql.SparkSession.builder())
    assert(ext(fresh).contains(graftExt))

    // a caller's extension list is APPENDED to, never clobbered
    val other = "com.example.OtherExtensions"
    val merged = GraftSession.configure(
      org.apache.spark.sql.SparkSession.builder().config("spark.sql.extensions", other))
    assert(ext(merged).contains(s"$other,$graftExt"))

    // configuring twice must not duplicate the graft entry
    val twice = GraftSession.configure(GraftSession.configure(
      org.apache.spark.sql.SparkSession.builder().config("spark.sql.extensions", other)))
    assert(ext(twice).contains(s"$other,$graftExt"))
  }
}
