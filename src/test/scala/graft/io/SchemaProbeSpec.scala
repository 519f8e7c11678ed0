package graft.io

import org.apache.spark.sql.types._

import graft.SparkSpec

/** Testdata-contract probe (round-7 lesson). The driver regenerates
  * `/root/testdata` between rounds, and a silent physical-type drift
  * (TIMESTAMP(NANOS) → TIMESTAMP(MICROS) on `events.ts`) once cost an
  * entire round's record. This spec pins the column names and the
  * engine-visible types of every table AFTER `Tables`' adaptation layer,
  * and prints a readable per-column diff on mismatch — so the next layout
  * drift is a one-line diagnosis, not a 45-query outage.
  */
class SchemaProbeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** expected (name -> type) per table, in engine-facing form. */
  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq(
      "n_nationkey" -> IntegerType, "n_name" -> StringType, "n_regionkey" -> IntegerType),
    "customer" -> Seq(
      "c_custkey" -> LongType, "c_name" -> StringType, "c_nationkey" -> IntegerType,
      "c_acctbal" -> DoubleType, "c_mktsegment" -> StringType),
    "supplier" -> Seq(
      "s_suppkey" -> LongType, "s_name" -> StringType, "s_nationkey" -> IntegerType,
      "s_acctbal" -> DoubleType),
    "part" -> Seq(
      "p_partkey" -> LongType, "p_name" -> StringType, "p_brand" -> StringType,
      "p_type" -> StringType, "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq(
      "o_orderkey" -> LongType, "o_custkey" -> LongType, "o_orderstatus" -> StringType,
      "o_totalprice" -> DoubleType, "o_orderdate" -> TimestampNTZType,
      "o_orderpriority" -> StringType),
    "lineitem" -> Seq(
      "l_orderkey" -> LongType, "l_partkey" -> LongType, "l_suppkey" -> LongType,
      "l_linenumber" -> IntegerType, "l_quantity" -> DoubleType,
      "l_extendedprice" -> DoubleType, "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    // events goes through the adaptive loader: ts MUST surface as a real
    // TIMESTAMP regardless of the on-disk physical type (nanos or micros).
    "events" -> Seq(
      "event_id" -> LongType, "ts" -> TimestampType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq(
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType), "label" -> IntegerType))

  private def load(t: Tables, name: String) = name match {
    case "region"     => t.region
    case "nation"     => t.nation
    case "customer"   => t.customer
    case "supplier"   => t.supplier
    case "part"       => t.part
    case "orders"     => t.orders
    case "lineitem"   => t.lineitem
    case "events"     => t.events
    case "documents"  => t.documents
    case "embeddings" => t.embeddings
  }

  /** Timestamp columns may legitimately surface as TZ or NTZ depending on
    * the writer's isAdjustedToUTC flag; with the session pinned to UTC the
    * two are value-identical, so the probe treats them as equivalent —
    * EXCEPT events.ts, which the adaptive loader must normalize to TZ.
    */
  private def compatible(name: String, col: String, exp: DataType, got: DataType): Boolean =
    if (exp == got) true
    else if (name == "events" && col == "ts") false
    else (exp, got) match {
      case (TimestampNTZType, TimestampType) | (TimestampType, TimestampNTZType) => true
      case _ => false
    }

  test("every testdata table matches the engine's assumed schema") {
    val t = Tables(spark, sfDir)
    val diffs = expected.toSeq.sortBy(_._1).flatMap { case (name, cols) =>
      val got = load(t, name).schema.map(f => f.name -> f.dataType).toMap
      val missing = cols.collect {
        case (c, dt) if !got.contains(c) => s"$name.$c: MISSING (expected $dt)"
      }
      val mismatched = cols.collect {
        case (c, dt) if got.contains(c) && !compatible(name, c, dt, got(c)) =>
          s"$name.$c: expected $dt, got ${got(c)}"
      }
      missing ++ mismatched
    }
    assert(diffs.isEmpty,
      "\nTESTDATA CONTRACT DRIFT — the driver regenerated /root/testdata with a " +
      "different layout; adapt graft.io.Tables:\n  " + diffs.mkString("\n  "))
  }

  test("events.ts adaptive load yields usable event-time (raw physical type agnostic)") {
    val e = Tables(spark, sfDir).events
    // a window() over ts must analyze — this is exactly the expression that
    // broke in round 7 when ts surfaced as the wrong type
    val n = e
      .groupBy(org.apache.spark.sql.functions.window(
        org.apache.spark.sql.functions.col("ts"), "1 hour"))
      .count()
      .count()
    assert(n > 0)
  }
}
