package graft

/** Driver-contract invariants: the round harness reads
  * `SparkEntry.queries` / `oracleSql` / `entry` — breakage here silently
  * zeroes the round's correctness, so it fails the suite instead.
  */
class ContractSpec extends SparkSpec {

  test("every oracle key has a query implementation") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracles without queries: $dangling")
  }

  test("every query runs at smoke scale and entry returns rows") {
    val dir = "/root/testdata/sf0.001"
    val failures = SparkEntry.queries.flatMap { case (name, fn) =>
      try { fn(spark, dir).limit(1).collect(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(100)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
