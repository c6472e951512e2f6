package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BpeFunctionsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** Reference single-pass merge (the pinned semantics, independently
    * stated): leftmost-first, non-overlapping.
    */
  private def refMerge(toks: Vector[String], l: String, r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < toks.length) {
      if (i + 1 < toks.length && toks(i) == l && toks(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += toks(i); i += 1 }
    }
    out.result()
  }

  private def refEncode(text: String, merges: Seq[(String, String)]): Vector[String] = {
    var toks = text.codePoints().toArray.toVector.map(cp => new String(Character.toChars(cp)))
    merges.foreach { case (l, r) => toks = refMerge(toks, l, r) }
    toks
  }

  private def sparkEncode(text: String, merges: Seq[(String, String)]): Seq[String] =
    Seq(text).toDF("text")
      .select(BpeEncode(col("text"), merges).as("t"))
      .collect()(0).getSeq[String](0)

  test("encode: leftmost-first non-overlapping merge semantics") {
    assert(sparkEncode("aaaa", Seq(("a", "a"))) === Seq("aa", "aa"))
    assert(sparkEncode("aaa", Seq(("a", "a"))) === Seq("aa", "a"))
    assert(sparkEncode("aaaa", Seq(("a", "a"), ("aa", "aa"))) === Seq("aaaa"))
    // merged token does not re-merge within its own pass
    assert(sparkEncode("abab", Seq(("a", "b"))) === Seq("ab", "ab"))
    // boundary safety: pair must match whole tokens (ab+c then b+c)
    assert(sparkEncode("abc", Seq(("a", "b"), ("b", "c"))) === Seq("ab", "c"))
  }

  test("encode: empty text, null text, multibyte code points") {
    assert(sparkEncode("", Seq(("a", "b"))) === Seq.empty[String])
    val nullOut = Seq[Option[String]](None).toDF("text")
      .select(BpeEncode(col("text"), Seq(("a", "b"))).as("t")).collect()(0)
    assert(nullOut.isNullAt(0))
    // U+00E9 (2 bytes) and U+1F600 (4 bytes) each split as ONE token
    assert(sparkEncode("é😀é", Nil) === Seq("é", "😀", "é"))
  }

  test("encode matches the reference on random text and random merges") {
    val rnd = new scala.util.Random(42)
    val alphabet = "ab c"
    for (_ <- 1 to 50) {
      val text = Seq.fill(rnd.nextInt(30))(alphabet(rnd.nextInt(alphabet.length))).mkString
      val merges = Seq.fill(rnd.nextInt(4))(
        (alphabet(rnd.nextInt(alphabet.length)).toString,
         alphabet(rnd.nextInt(alphabet.length)).toString))
      assert(sparkEncode(text, merges) === refEncode(text, merges),
        s"text=${text.replace(' ', '_')} merges=$merges")
    }
  }

  test("train: learns the planted dominant pairs, in frequency order") {
    // "xy" appears 12 times, "zw" 7 times; after merging (x,y) the pair
    // (xy, xy) appears where xyxy runs exist.
    val docsDf = Seq(
      (1L, "xy" * 6),   // 6 xy + 5 overlapping (y,x) pairs
      (2L, "xy" * 6),
      (3L, "zw zw zw zw zw zw zw")).toDF("doc_id", "text")
    val merges = BpeFunctions.train(docsDf, "text", numMerges = 2)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges(0) === ((1, "x", "y", 12L)))
    // after merge 1, the strongest remaining pair is (xy, xy): 2 docs ×
    // 5 overlapping occurrences of adjacent xy-xy
    assert(merges(1)._2 === "xy" && merges(1)._3 === "xy")
  }

  test("train respects the deterministic tie-break (lt, rt ascending)") {
    val docsDf = Seq((1L, "ab"), (2L, "ba")).toDF("doc_id", "text")
    val m = BpeFunctions.train(docsDf, "text", numMerges = 1).collect()(0)
    // (a,b) and (b,a) both occur once; (a,b) wins lexicographically
    assert((m.getString(1), m.getString(2)) === (("a", "b")))
  }

  test("train stops when no pairs remain") {
    val docsDf = Seq((1L, "a"), (2L, "")).toDF("doc_id", "text")
    val out = BpeFunctions.train(docsDf, "text", numMerges = 3)
    assert(out.count() === 0)
  }

  test("train: persisted-encoding fast path equals from-scratch re-encoding") {
    val docsDf = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val fast = BpeFunctions.train(docsDf, "text", numMerges = 6,
        persistEncodings = true)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val scratch = BpeFunctions.train(docsDf, "text", numMerges = 6,
        persistEncodings = false)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(fast === scratch)
    assert(fast.length === 6)
  }

  test("train fast path leaves no persisted blocks behind") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val docsDf = Seq((1L, "ababab"), (2L, "bcbcbc")).toDF("doc_id", "text")
    BpeFunctions.train(docsDf, "text", numMerges = 3).collect()
    val deadline = System.nanoTime() + 5e9.toLong
    while (spark.sparkContext.getPersistentRDDs.keySet.diff(before).nonEmpty
           && System.nanoTime() < deadline) Thread.sleep(50)
    assert(spark.sparkContext.getPersistentRDDs.keySet.diff(before).isEmpty)
  }

  test("BpeMergeApply: one pass over tokenized arrays, boundary-safe") {
    val out = Seq(Seq("a", "b", "a", "b", "b")).toDF("t")
      .select(BpeMergeApply(col("t"), "a", "b").as("m"))
      .collect()(0).getSeq[String](0)
    assert(out === Seq("ab", "ab", "b"))
  }

  test("encode projection stays inside whole-stage codegen") {
    // a file-backed frame — a local relation would be constant-folded
    // into a LocalTableScan with no codegen stage to inspect
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(BpeEncode(col("text"), Seq(("a", "b"))).as("t"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the '*(n)' marker = WholeStageCodegen stage; the static-call
    // expression must not force the projection out of codegen
    assert(plan.contains("*(1)"),
      s"BpeEncode broke whole-stage codegen:\n$plan")
  }

  test("encodedString round-trips token boundaries unambiguously") {
    val out = Seq("aab", "").toDF("text")
      .select(BpeFunctions.encodedString(
        BpeEncode(col("text"), Seq(("a", "a")))).as("e"))
      .orderBy("e").collect().map(_.getString(0))
    val S = BpeFunctions.Sep
    assert(out === Array("", s"${S}aa$S${S}b$S"))
  }

  test("BpePairCounts: overlapping local counts equal the exploded-pair totals") {
    import org.apache.spark.sql.Row
    val df = Seq(
      Tuple1(Seq("a", "a", "a", "b", "a", "a")), // (a,a)x3 overlapping, (a,b), (b,a)
      Tuple1(Seq("x")), // below pair length -> empty
      Tuple1(Seq.empty[String])
    ).toDF("t")
    val got = df.select(BpePairCounts(col("t")).as("p")).collect()
      .map(_.getSeq[Row](0).map(r => (r.getString(0), r.getString(1), r.getLong(2))))
    assert(got(0) === Seq(("a", "a", 3L), ("a", "b", 1L), ("b", "a", 1L)))
    assert(got(1).isEmpty && got(2).isEmpty)
    // totals across rows match the naive per-occurrence explode
    val viaCounts = df.select(explode(BpePairCounts(col("t"))).as("p"))
      .groupBy("p.lt", "p.rt").agg(sum("p.c").as("f"))
      .as[(String, String, Long)].collect().toSet
    val naive = df.where(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(t) - 1), i -> struct(t[i - 1] AS lt, t[i] AS rt))")).as("p"))
      .groupBy("p.lt", "p.rt").agg(count(lit(1)).as("f"))
      .as[(String, String, Long)].collect().toSet
    assert(viaCounts === naive)
  }
}
