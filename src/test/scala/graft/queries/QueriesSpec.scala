package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class QueriesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("registry names are unique and oracles reference registered queries") {
    val names = Queries.registry.map(_.name)
    assert(names.distinct.length === names.length)
    assert(Queries.oracles.keySet.subsetOf(Queries.byName.keySet))
  }

  test("every query has a deterministic shape: runs twice to the same count") {
    for (q <- Seq("a5_ticker_span", "w6_keep_last", "t3_language_id")) {
      val f = Queries.byName(q)
      assert(f(spark, sf).count() === f(spark, sf).count())
    }
  }

  test("w5_features preserves the prices row count (windows never drop rows)") {
    val p = Q.prices(Q.t(spark, sf, "lineitem")).count()
    assert(Queries.byName("w5_features")(spark, sf).count() === p)
  }

  test("j2_flag_enrich keeps every primary row (left join semantics)") {
    val p = Q.prices(Q.t(spark, sf, "lineitem")).count()
    assert(Queries.byName("j2_flag_enrich")(spark, sf).count() === p)
  }

  test("oracle SQL strings contain no tabs (driver JSON safety)") {
    for ((n, sql) <- Queries.oracles)
      assert(!sql.contains("\t"), s"$n oracle contains a tab")
  }
}
