package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class GraftExtensionsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  GraftFunctions.register(spark)

  test("vec_cosine / vec_dot are SQL-callable and match the Column API") {
    val r = spark.sql(
      """SELECT vec_cosine(array(1.0D, 0.0D), array(1.0D, 1.0D)) AS c,
        |       vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d""".stripMargin)
      .head()
    assert(math.abs(r.getDouble(0) - 1.0 / math.sqrt(2.0)) < 1e-12)
    assert(r.getDouble(1) === 11.0)
    // parity with the Column-API construction on the same inputs
    val viaColumn = Seq((Array(1.0, 0.0), Array(1.0, 1.0))).toDF("a", "b")
      .select(SimilarityFunctions.cosine(col("a"), col("b"))).head().getDouble(0)
    assert(r.getDouble(0) === viaColumn)
  }

  test("topk_freq aggregates through SQL with literal k/capacity") {
    Seq("a", "a", "a", "b", "b", "c").toDF("w").createOrReplaceTempView("words")
    val out = spark.sql(
      "SELECT topk_freq(w, 2, 10) AS top FROM words")
      .select(explode(col("top")).as("t"))
      .select(col("t.value"), col("t.count"))
      .as[(String, Long)].collect().toSeq
    assert(out === Seq(("a", 3L), ("b", 2L)))
  }

  test("winnow_fingerprints is SQL-callable with literal k/window") {
    val fp = spark.sql(
      "SELECT winnow_fingerprints('the quick brown fox jumps over it', 8, 4) AS fp")
      .head().getSeq[Long](0)
    assert(fp.nonEmpty && fp === fp.sorted && fp.distinct === fp)
  }

  test("topk_freq rejects non-literal k (state size must be plan-time)") {
    Seq(("a", 2)).toDF("w", "n").createOrReplaceTempView("words_n")
    val e = intercept[Exception] {
      spark.sql("SELECT topk_freq(w, n, 10) FROM words_n").collect()
    }
    assert(e.getMessage.contains("INTEGER LITERAL"), e.getMessage)
  }

  test("topk_freq accepts foldable constant expressions for k/capacity") {
    Seq("a", "a", "b").toDF("w").createOrReplaceTempView("words_f")
    // builders run BEFORE constant folding, so CAST(1 AS INT)/1+1 arrive
    // unfolded; any foldable int expression must work
    val out = spark.sql(
      "SELECT topk_freq(w, CAST(1 AS INT), 5 + 5) AS top FROM words_f")
      .select(explode(col("top")).as("t")).select(col("t.value"))
      .as[String].collect().toSeq
    assert(out === Seq("a"))
  }

  test("extensions class injects the same builders at session build") {
    // the injection seq is shared by construction; assert the class is
    // instantiable with the zero-arg constructor spark.sql.extensions uses
    // and exposes every registered function
    val ext = new GraftExtensions()
    assert(ext.isInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit])
    assert(GraftFunctions.all.map(_._1.funcName).sorted ===
      Seq("bpe_encode", "bpe_merge_apply", "jaro_winkler", "nfc_normalize",
        "topk_freq", "vec_cosine", "vec_dot", "winnow_fingerprints"))
  }

  test("jaro_winkler is SQL-callable and runs the native kernel") {
    val viaSql = spark.sql(
      "SELECT jaro_winkler('martha', 'marhta') AS s").head().getDouble(0)
    assert(math.abs(viaSql - 0.9611111111111111) < 1e-15)
    // null-strict both sides
    assert(spark.sql(
      "SELECT jaro_winkler(CAST(NULL AS STRING), 'x') AS s").head().isNullAt(0))
  }

  test("bpe_encode / bpe_merge_apply are SQL-callable; merges via literal") {
    // merges "a+b then ab+c" in the U+001E / U+001F wire form
    val merges = "a\u001Fb\u001Eab\u001Fc"
    val toks = spark.sql(s"SELECT bpe_encode('abcabd', '$merges') AS t")
      .head().getSeq[String](0)
    assert(toks === Seq("abc", "ab", "d"))
    // '' = no merges -> plain code-point split
    assert(spark.sql("SELECT bpe_encode('ab', '') AS t")
      .head().getSeq[String](0) === Seq("a", "b"))
    val merged = spark.sql(
      "SELECT bpe_merge_apply(array('a', 'b', 'b'), 'a', 'b') AS t")
      .head().getSeq[String](0)
    assert(merged === Seq("ab", "b"))
    // parity with the Column API
    val viaColumn = Seq("abcabd").toDF("s")
      .select(BpeEncode(col("s"), Seq(("a", "b"), ("ab", "c"))).as("t"))
      .head().getSeq[String](0)
    assert(toks === viaColumn)
  }

  test("bpe_encode rejects a non-literal merge table") {
    Seq(("ab", "x")).toDF("s", "m").createOrReplaceTempView("bpe_nl")
    val e = intercept[Exception] {
      spark.sql("SELECT bpe_encode(s, m) FROM bpe_nl").collect()
    }
    assert(e.getMessage.contains("STRING LITERAL"), e.getMessage)
  }
}
