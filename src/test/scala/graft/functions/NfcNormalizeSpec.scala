package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.GraftRegistrar
import org.apache.spark.sql.functions._

class NfcNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def nfc(rows: Seq[String]) = {
    GraftRegistrar.register(spark)
    rows.toDF("s").select(expr("graft_nfc(s)").as("n"))
      .collect().map(r => Option(r.getString(0)))
  }

  test("decomposed and precomposed forms converge to identical strings") {
    // e+COMBINING ACUTE vs U+00E9; o+COMBINING DIAERESIS vs U+00F6;
    // Hangul Jamo composition; already-NFC string is untouched
    val out = nfc(Seq("e\u0301", "\u00e9", "o\u0308", "\u00f6",
      "\u1100\u1161", "plain ascii"))
    assert(out(0) == out(1) && out(0).get == "\u00e9")
    assert(out(2) == out(3) && out(2).get == "\u00f6")
    assert(out(4).get == "\uac00", "Jamo sequence composes to GA syllable")
    assert(out(5).get == "plain ascii")
  }

  test("idempotent, null-safe, and matches java.text.Normalizer exactly") {
    GraftRegistrar.register(spark)
    val mixed = "re\u0301sume\u0301 \u00e9 A\u030a \u212b text"
    val once = nfc(Seq(mixed)).head.get
    assert(nfc(Seq(once)).head.get == once, "idempotent")
    assert(once == java.text.Normalizer.normalize(
      mixed, java.text.Normalizer.Form.NFC))
    val withNull = Seq[(java.lang.Long, String)]((1L, null), (2L, "ok"))
      .toDF("id", "s")
      .select(expr("graft_nfc(s)").as("n")).collect()
    assert(withNull.exists(_.isNullAt(0)) &&
      withNull.exists(r => !r.isNullAt(0) && r.getString(0) == "ok"))
  }

  test("survives whole-stage codegen over parquet") {
    GraftRegistrar.register(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft_nfc").toString
    Seq("a\u0301b", "plain", "x\u0308").toDF("s").write
      .mode("overwrite").parquet(dir)
    val out = spark.read.parquet(dir)
      .select(expr("graft_nfc(s)").as("n")).orderBy("n")
      .collect().map(_.getString(0))
    assert(out.toSeq == Seq("plain", "\u00e1b", "\u1e8d").sorted)
  }
}
