package graft

import org.apache.spark.sql.types._

/** Early-warning tripwire for driver testdata drift. The generator has
  * already changed `events.ts`'s parquet flavor between rounds (round 6
  * went red on it); this spec reads every table's schema and fails with
  * an ACTIONABLE message the moment a column appears, disappears, or
  * leaves its tolerated type set — so the next drift is a one-line spec
  * failure naming the column, not two ERROR rows in the driver gate.
  */
class TestdataContractSpec extends SparkSpec {

  private val tolerated: Map[String, Map[String, Set[String]]] = {
    val key = Set("integer", "long")
    val num = Set("double", "float")
    val str = Set("string")
    // every flavor the temporal columns have shipped in (or could):
    // tz-aware/naive micros, nanos-as-long, plain date
    val ts = Set("timestamp", "timestamp_ntz", "long", "date")
    Map(
      "region" -> Map("r_regionkey" -> key, "r_name" -> str),
      "nation" -> Map("n_nationkey" -> key, "n_name" -> str, "n_regionkey" -> key),
      "customer" -> Map("c_custkey" -> key, "c_name" -> str, "c_nationkey" -> key,
        "c_acctbal" -> num, "c_mktsegment" -> str),
      "supplier" -> Map("s_suppkey" -> key, "s_name" -> str, "s_nationkey" -> key,
        "s_acctbal" -> num),
      "part" -> Map("p_partkey" -> key, "p_name" -> str, "p_brand" -> str,
        "p_type" -> str, "p_size" -> key, "p_retailprice" -> num),
      "orders" -> Map("o_orderkey" -> key, "o_custkey" -> key, "o_orderstatus" -> str,
        "o_totalprice" -> num, "o_orderdate" -> ts, "o_orderpriority" -> str),
      "lineitem" -> Map("l_orderkey" -> key, "l_partkey" -> key, "l_suppkey" -> key,
        "l_linenumber" -> key, "l_quantity" -> num, "l_extendedprice" -> num,
        "l_discount" -> num, "l_tax" -> num, "l_returnflag" -> str,
        "l_linestatus" -> str, "l_shipdate" -> ts),
      "events" -> Map("event_id" -> key, "ts" -> ts, "user_id" -> key,
        "event_type" -> str, "value" -> num, "props" -> str),
      "documents" -> Map("doc_id" -> key, "text" -> str, "lang" -> str,
        "source" -> str, "n_chars" -> key),
      "embeddings" -> Map("vec_id" -> key, "embedding" -> Set("array<float>", "array<double>"),
        "label" -> key))
  }

  test("driver tables carry the expected columns in tolerated types (all sf dirs)") {
    val problems = Seq.newBuilder[String]
    for {
      sf <- Seq("sf0.001", "sf0.01", "sf0.1")
      (table, cols) <- tolerated
    } {
      val schema = spark.read.parquet(s"/root/testdata/$sf/$table.parquet").schema
      for ((colName, ok) <- cols) {
        schema.fields.find(_.name == colName) match {
          case None =>
            problems += s"$sf/$table: column $colName MISSING (has ${schema.fieldNames.mkString(",")})"
          case Some(f) =>
            val tn = f.dataType match {
              case ArrayType(el, _) => s"array<${el.typeName}>"
              case dt               => dt.typeName
            }
            if (!ok(tn))
              problems += s"$sf/$table.$colName drifted to $tn (tolerated: ${ok.mkString("/")})" +
                " — extend SparkEntry normalization/tolerances for the new vintage"
        }
      }
    }
    val ps = problems.result()
    assert(ps.isEmpty, s"testdata drift detected:\n${ps.mkString("\n")}")
  }
}
