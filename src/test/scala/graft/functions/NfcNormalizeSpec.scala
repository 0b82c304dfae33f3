package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NfcNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private val decomposedCafe = "cafe\u0301"  // e + combining acute
  private val composedCafe = "caf\u00e9"     // precomposed \u00e9

  test("NFC composes decomposed sequences; already-normal text passes through unchanged") {
    val df = Seq((1L, decomposedCafe), (2L, composedCafe), (3L, "plain ascii"))
      .toDF("id", "t")
    val out = df.select($"id", GraftFunctions.nfc($"t").as("n"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == composedCafe)
    assert(out(2L) == composedCafe)
    assert(out(3L) == "plain ascii")
    // and the two spellings now fingerprint identically — the reason
    // curation pipelines normalize before hashing
    assert(out(1L) == out(2L))
  }

  test("NFKC folds compatibility forms (ligatures, fullwidth)") {
    val df = Seq((1L, "ﬁle"), (2L, "Ｆｕｌｌ")).toDF("id", "t") // ﬁle, fullwidth
    val out = df.select($"id", GraftFunctions.nfc($"t", "NFKC").as("n"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "file")
    assert(out(2L) == "Full")
  }

  test("null input yields null; unknown form fails analysis") {
    val df = Seq(Tuple1(Option.empty[String])).toDF("t")
    assert(df.select(GraftFunctions.nfc($"t")).collect().head.isNullAt(0))
    val e = intercept[Exception] {
      Seq(Tuple1("x")).toDF("t").select(GraftFunctions.nfc($"t", "NFX")).collect()
    }
    assert(e.getMessage.contains("NFX") || e.getMessage.contains("graft_nfc"))
  }

  test("participates in whole-stage codegen") {
    // a non-local source — a pure literal input would be constant-folded
    // into a LocalTableScan and never reach codegen at all
    val df = spark.range(4)
      .select(concat(lit(decomposedCafe + " "), $"id".cast("string")).as("t"))
    val plan = df.select(GraftFunctions.nfc($"t").as("n"))
    val p = plan.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("graft_nfc"), p)
    assert("(?m)^\\(\\d+\\) Project \\[codegen id : \\d+\\]".r.findFirstIn(p).isDefined, p)
    // and the generated code produces the composed form
    assert(plan.as[String].collect().forall(_.startsWith(composedCafe)))
  }

  test("registered in SQL via GraftExtensions, with the optional form argument") {
    GraftExtensions.register(spark)
    Seq(Tuple1(decomposedCafe)).toDF("t").createOrReplaceTempView("nfc_test")
    assert(spark.sql("SELECT graft_nfc(t) AS n FROM nfc_test").as[String].first()
      == composedCafe)
    assert(spark.sql("SELECT graft_nfc('ﬁ', 'NFKC') AS n").as[String].first()
      == "fi")
  }
}
