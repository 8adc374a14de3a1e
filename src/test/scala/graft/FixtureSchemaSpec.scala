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

  // expected parquet FOOTER types — the ORACLE side of the canary. The
  // Spark-read pin above watches what the engine's loaders dispatch on;
  // DuckDB (the driver's oracle) types its view straight off the footer's
  // physical + logical annotation, so an oracle-side type change (the
  // other half of an r8-style drift: same Spark type, different physical
  // encoding — e.g. TIMESTAMP(NANOS) vs plain int64 both read as
  // acceptable Spark types but produce different DuckDB columns) must
  // fail HERE with a named column. Sets mirror the drift histories.
  private val expectedFooter: Map[String, Map[String, Set[String]]] = {
    val i = Set("int32:-", "int64:-")
    val s = Set("binary:STRING")
    val d = Set("double:-")
    val ts = Set("int64:TIMESTAMP(MICROS,false)", "int64:TIMESTAMP(MICROS,true)",
      "int64:TIMESTAMP(NANOS,false)", "int64:TIMESTAMP(NANOS,true)",
      "int64:-", "int32:DATE")
    Map(
      "region"   -> Map("r_regionkey" -> i, "r_name" -> s),
      "nation"   -> Map("n_nationkey" -> i, "n_name" -> s, "n_regionkey" -> i),
      "customer" -> Map("c_custkey" -> i, "c_name" -> s, "c_nationkey" -> i,
                        "c_acctbal" -> d, "c_mktsegment" -> s),
      "supplier" -> Map("s_suppkey" -> i, "s_name" -> s, "s_nationkey" -> i,
                        "s_acctbal" -> d),
      "part"     -> Map("p_partkey" -> i, "p_name" -> s, "p_brand" -> s,
                        "p_type" -> s, "p_size" -> i, "p_retailprice" -> d),
      "orders"   -> Map("o_orderkey" -> i, "o_custkey" -> i,
                        "o_orderstatus" -> s, "o_totalprice" -> d,
                        "o_orderdate" -> ts, "o_orderpriority" -> s),
      "lineitem" -> Map("l_orderkey" -> i, "l_partkey" -> i, "l_suppkey" -> i,
                        "l_linenumber" -> i, "l_quantity" -> d,
                        "l_extendedprice" -> d, "l_discount" -> d,
                        "l_tax" -> d, "l_returnflag" -> s,
                        "l_linestatus" -> s, "l_shipdate" -> ts),
      "events"   -> Map("event_id" -> i, "ts" -> ts, "user_id" -> i,
                        "event_type" -> s, "value" -> d, "props" -> s),
      "documents"  -> Map("doc_id" -> i, "text" -> s, "lang" -> s,
                          "source" -> s, "n_chars" -> i),
      "embeddings" -> Map("vec_id" -> i,
                          "embedding" -> Set("LIST<float:->", "LIST<double:->"),
                          "label" -> i)
    )
  }

  /** primitiveTypeName:logicalAnnotation per top-level field (groups
    * render as ANNOTATION<leaf>, descending first children). */
  private def footerTypes(path: String): Map[String, String] = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.hadoop.conf.Configuration
    import org.apache.hadoop.fs.Path
    import scala.jdk.CollectionConverters._
    def render(t: org.apache.parquet.schema.Type): String =
      if (t.isPrimitive) {
        val p = t.asPrimitiveType()
        val lt = Option(p.getLogicalTypeAnnotation).map(_.toString).getOrElse("-")
        s"${p.getPrimitiveTypeName.toString.toLowerCase}:$lt"
      } else {
        val g = t.asGroupType()
        val ann = Option(g.getLogicalTypeAnnotation).map(_.toString).getOrElse("group")
        var cur: org.apache.parquet.schema.Type = g
        while (!cur.isPrimitive) cur = cur.asGroupType().getFields.get(0)
        s"$ann<${render(cur)}>"
      }
    val rd = ParquetFileReader.open(HadoopInputFile.fromPath(
      new Path(path), new Configuration()))
    try rd.getFooter.getFileMetaData.getSchema.getFields.asScala
      .map(f => f.getName -> render(f)).toMap
    finally rd.close()
  }

  test("fixture parquet FOOTERS match the oracle's dispatch set (drift canary)") {
    val diffs = expectedFooter.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
      val byName = footerTypes(s"${TestSpark.Sf0001}/$table.parquet")
      cols.toSeq.sortBy(_._1).flatMap { case (c, ok) =>
        byName.get(c) match {
          case None => Some(s"$table.$c: MISSING from footer (refresh dropped it)")
          case Some(t) if !ok(t) =>
            Some(s"$table.$c: footer drifted to $t (oracle handles: ${ok.mkString("/")})")
          case _ => None
        }
      }
    }
    assert(diffs.isEmpty, "\nORACLE-SIDE FIXTURE DRIFT:\n  " + diffs.mkString("\n  "))
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
