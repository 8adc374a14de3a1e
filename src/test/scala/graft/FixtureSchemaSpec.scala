package graft

import org.scalatest.funsuite.AnyFunSuite

/** Fixture-drift canary. Round 8 lost 27/123 oracle rows and the whole
  * bench to a silent fixture refresh (`events.ts` TIMESTAMP(NANOS) →
  * timestamp[us]); this spec turns the next refresh into a one-line
  * failure that NAMES the drifted column instead of 27 downstream
  * AnalysisExceptions.
  *
  * Columns with a known drift history (events.ts) are pinned to the SET of
  * encodings `Tables.normalizeTs` can dispatch on — the engine is
  * schema-agnostic across that set by construction, so any member is fine;
  * a type outside it must fail here first.
  */
class FixtureSchemaSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  // expected Spark-read types per fixture column (simpleString form)
  private val expected: Map[String, Map[String, Set[String]]] = Map(
    "region"   -> Map("r_regionkey" -> Set("int", "bigint"),
                      "r_name" -> Set("string")),
    "nation"   -> Map("n_nationkey" -> Set("int", "bigint"),
                      "n_name" -> Set("string"),
                      "n_regionkey" -> Set("int", "bigint")),
    "customer" -> Map("c_custkey" -> Set("bigint"), "c_name" -> Set("string"),
                      "c_nationkey" -> Set("int", "bigint"),
                      "c_acctbal" -> Set("double"),
                      "c_mktsegment" -> Set("string")),
    "supplier" -> Map("s_suppkey" -> Set("bigint"), "s_name" -> Set("string"),
                      "s_nationkey" -> Set("int", "bigint"),
                      "s_acctbal" -> Set("double")),
    "part"     -> Map("p_partkey" -> Set("bigint"), "p_name" -> Set("string"),
                      "p_brand" -> Set("string"), "p_type" -> Set("string"),
                      "p_size" -> Set("int", "bigint"),
                      "p_retailprice" -> Set("double")),
    "orders"   -> Map("o_orderkey" -> Set("bigint"), "o_custkey" -> Set("bigint"),
                      "o_orderstatus" -> Set("string"),
                      "o_totalprice" -> Set("double"),
                      "o_orderdate" -> Set("date", "timestamp", "timestamp_ntz"),
                      "o_orderpriority" -> Set("string")),
    "lineitem" -> Map("l_orderkey" -> Set("bigint"), "l_partkey" -> Set("bigint"),
                      "l_suppkey" -> Set("bigint"),
                      "l_linenumber" -> Set("int", "bigint"),
                      "l_quantity" -> Set("double"),
                      "l_extendedprice" -> Set("double"),
                      "l_discount" -> Set("double"), "l_tax" -> Set("double"),
                      "l_returnflag" -> Set("string"),
                      "l_linestatus" -> Set("string"),
                      "l_shipdate" -> Set("date", "timestamp", "timestamp_ntz")),
    "events"   -> Map("event_id" -> Set("bigint"),
                      // full drift-history set; must mirror Tables.normalizeTs
                      "ts" -> Set("bigint", "timestamp", "timestamp_ntz"),
                      "user_id" -> Set("bigint"), "event_type" -> Set("string"),
                      "value" -> Set("double"), "props" -> Set("string")),
    "documents"  -> Map("doc_id" -> Set("bigint"), "text" -> Set("string"),
                        "lang" -> Set("string"), "source" -> Set("string"),
                        "n_chars" -> Set("bigint")),
    "embeddings" -> Map("vec_id" -> Set("bigint"),
                        "embedding" -> Set("array<float>"),
                        "label" -> Set("int", "bigint"))
  )

  test("fixture schemas match the loader's dispatch set (drift canary)") {
    val diffs = expected.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
      // raw read on purpose: the canary watches the PHYSICAL encoding the
      // loaders dispatch on, not the post-normalization view
      val schema = spark.read
        .parquet(s"${TestSpark.Sf0001}/$table.parquet").schema
      val byName = schema.map(f => f.name -> f.dataType.simpleString).toMap
      cols.toSeq.sortBy(_._1).flatMap { case (c, ok) =>
        byName.get(c) match {
          case None => Some(s"$table.$c: MISSING from fixture (refresh dropped it)")
          case Some(t) if !ok(t) =>
            Some(s"$table.$c: fixture drifted to $t (loader handles: ${ok.mkString("/")})")
          case _ => None
        }
      }
    }
    assert(diffs.isEmpty, "\nFIXTURE DRIFT:\n  " + diffs.mkString("\n  "))
  }

  test("events loader normalizes every historical ts encoding to timestamp") {
    import org.apache.spark.sql.types._
    // current fixture, whatever it is today
    assert(Tables.events(spark, TestSpark.Sf0001).schema("ts").dataType ===
      TimestampType)
    // and the dispatch itself covers the canary's full drift set
    Seq(LongType, TimestampType, TimestampNTZType).foreach { dt =>
      Tables.normalizeTs(dt, "ts", "events.ts") // must not throw
    }
    val e = intercept[IllegalStateException] {
      Tables.normalizeTs(StringType, "ts", "events.ts")
    }
    assert(e.getMessage.contains("events.ts"))
  }
}
