package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.unsafe.types.UTF8String
import graft.operators.TextAnalysis

/** Value oracles for language-ID and fingerprinting — the two text ops
  * with no DuckDB-expressible oracle (SURVEY §6). */
class TextSpec extends SparkSpecBase {
  import spark.implicits._

  test("langId picks the right language on unambiguous text") {
    val samples = Seq(
      (1L, "the cat sat on the mat and it is happy with the sun", "en"),
      (2L, "der hund und die katze sind nicht mit der maus", "de"),
      (3L, "le chat est dans la maison et les oiseaux sont pour toi", "fr"),
      (4L, "el perro y la casa es una maravilla por la noche", "es"),
      (5L, "il gatto non è per la casa e gli amici sono con te", "it"))
    val got = TextAnalysis.langId(samples.map(t => (t._1, t._2)).toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    samples.foreach { case (id, _, lang) =>
      assert(got(id) == lang, s"doc $id: predicted ${got(id)}, expected $lang")
    }
  }

  test("langId ties break deterministically (no stopword hits -> alphabetically first)") {
    val got = TextAnalysis.langId(Seq((1L, "xyzzy plugh 42")).toDF("doc_id", "text"),
      "doc_id", "text").collect().head
    assert(got.getString(1) == "de") // all scores 0 -> highest pri wins; "de" sorts first
    assert(got.getInt(2) == 0)
  }

  test("fingerprint matches the documented rolling-hash formula exactly") {
    def expectedFp(text: String): Long = {
      val toks = text.toLowerCase.replaceAll("[^a-z0-9\\s]", " ").trim.split("\\s+")
      toks.foldLeft(0L)((acc, t) =>
        acc * 1000003L + XxHash64Function.hash(UTF8String.fromString(t), StringType, 42L))
    }
    val texts = Seq((1L, "Hello, World!"), (2L, "a b c"), (3L, "c b a"),
      (4L, "The  quick   brown fox"), (5L, "hello world"))
    val got = TextAnalysis.fingerprint(texts.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    texts.foreach { case (id, t) =>
      assert(got(id) == expectedFp(t), s"doc $id fingerprint mismatch")
    }
    // order sensitivity and normalization
    assert(got(2L) != got(3L), "fingerprint must be order-sensitive")
    assert(got(1L) == expectedFp("hello world"), "punctuation/case must normalize away")
    assert(got(1L) == got(5L))
  }

  test("fingerprint is stable on the real documents table") {
    val a = TextAnalysis.fingerprint(Tables.documents(spark, sfDir), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val b = TextAnalysis.fingerprint(Tables.documents(spark, sfDir), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a == b)
    assert(a.nonEmpty)
  }
}
