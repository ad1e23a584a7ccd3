package graft

import org.apache.spark.sql.types._

/** Canary for driver-testdata drift (the round-10 lesson: a regenerated
  * events.parquet silently re-encoded `ts` and crashed 19 queries at the
  * driver, with no local signal until CORRECTNESS came back). This spec
  * pins the SCHEMA CONTRACT each table is read under, so the next
  * regeneration fails HERE with one message naming the drifted column —
  * not as a pile of downstream AnalysisExceptions.
  *
  * Columns with several known-good encodings (events.ts has shipped as
  * TIMESTAMP(NANOS)→long, tz-aware µs, and NTZ µs across rounds — all
  * normalized by RawGen.events, OpsSpec pins value parity) list every
  * acceptable type. Everything else is exact: a drift to, say,
  * array<double> embeddings or a decimal o_totalprice is a REAL contract
  * change that needs an ingest adaptation, and this test is the flag. */
class TestdataContractSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // column -> acceptable Spark types as read with this repo's session
  // config (nanosAsLong=true, UTC)
  private val contract: Map[String, Seq[(String, Set[DataType])]] = Map(
    "region" -> Seq("r_regionkey" -> Set(IntegerType, LongType),
      "r_name" -> Set(StringType)),
    "nation" -> Seq("n_nationkey" -> Set(IntegerType, LongType),
      "n_name" -> Set(StringType),
      "n_regionkey" -> Set(IntegerType, LongType)),
    "customer" -> Seq("c_custkey" -> Set(LongType),
      "c_name" -> Set(StringType),
      "c_nationkey" -> Set(IntegerType, LongType),
      "c_acctbal" -> Set(DoubleType),
      "c_mktsegment" -> Set(StringType)),
    "supplier" -> Seq("s_suppkey" -> Set(LongType),
      "s_name" -> Set(StringType),
      "s_nationkey" -> Set(IntegerType, LongType),
      "s_acctbal" -> Set(DoubleType)),
    "part" -> Seq("p_partkey" -> Set(LongType),
      "p_name" -> Set(StringType), "p_brand" -> Set(StringType),
      "p_type" -> Set(StringType),
      "p_size" -> Set(IntegerType, LongType),
      "p_retailprice" -> Set(DoubleType)),
    "orders" -> Seq("o_orderkey" -> Set(LongType),
      "o_custkey" -> Set(LongType),
      "o_orderstatus" -> Set(StringType),
      "o_totalprice" -> Set(DoubleType),
      "o_orderdate" -> Set[DataType](TimestampType, TimestampNTZType, DateType),
      "o_orderpriority" -> Set(StringType)),
    "lineitem" -> Seq("l_orderkey" -> Set(LongType),
      "l_partkey" -> Set(LongType), "l_suppkey" -> Set(LongType),
      "l_linenumber" -> Set(IntegerType, LongType),
      "l_quantity" -> Set(DoubleType),
      "l_extendedprice" -> Set(DoubleType),
      "l_discount" -> Set(DoubleType), "l_tax" -> Set(DoubleType),
      "l_returnflag" -> Set(StringType),
      "l_linestatus" -> Set(StringType),
      "l_shipdate" -> Set[DataType](TimestampType, TimestampNTZType, DateType)),
    "events" -> Seq("event_id" -> Set(LongType),
      // every encoding RawGen.events normalizes (nanos-long under
      // nanosAsLong, tz-aware, NTZ) — extending this set means ALSO
      // extending RawGen.events and its OpsSpec parity test
      "ts" -> Set[DataType](LongType, TimestampType, TimestampNTZType),
      "user_id" -> Set(LongType),
      "event_type" -> Set(StringType),
      "value" -> Set(DoubleType),
      "props" -> Set(StringType)),
    "documents" -> Seq("doc_id" -> Set(LongType),
      "text" -> Set(StringType), "lang" -> Set(StringType),
      "source" -> Set(StringType), "n_chars" -> Set(LongType)),
    "embeddings" -> Seq("vec_id" -> Set(LongType),
      "embedding" -> Set[DataType](ArrayType(FloatType),
        ArrayType(FloatType, containsNull = false)),
      "label" -> Set(IntegerType, LongType))
  )

  for ((tableName, cols) <- contract.toSeq.sortBy(_._1)) {
    test(s"driver testdata contract: $tableName") {
      val schema = graft.gen.RawGen.table(spark, dir, tableName).schema
      val byName = schema.fields.map(f => f.name -> f.dataType).toMap
      val missing = cols.map(_._1).filterNot(byName.contains)
      assert(missing.isEmpty,
        s"$tableName: driver testdata dropped column(s) $missing — " +
          "queries reading them will crash; adapt the readers")
      for ((name, ok) <- cols) {
        val got = byName(name)
        assert(ok.contains(got),
          s"$tableName.$name drifted to $got (accepted: $ok) — the " +
            "driver regenerated testdata with a new encoding; extend the " +
            "ingest normalization (RawGen) and then this contract")
      }
    }
  }
}
