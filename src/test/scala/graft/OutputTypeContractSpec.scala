package graft

import org.apache.spark.sql.types._

/** The driver's correctness hash is TYPED: it encodes each output
  * column's physical representation, not just its value. The r15 red
  * row proved this the hard way — `events_assortativity` emitted
  * moment columns as Spark DECIMAL(38,0) while the DuckDB oracle
  * computed HUGEINT, and the hash split at EQUAL values for two
  * consecutive rounds. This spec pins the output-type contract so
  * that class of divergence can never silently re-enter:
  *
  *   - every registered query's output columns stay inside the
  *     exact-representable set the whole board already uses —
  *     BIGINT / INT / STRING / BOOLEAN / DATE / TIMESTAMP_NTZ —
  *     where Spark parquet output and DuckDB compute bit-identical
  *     physical values;
  *   - DecimalType is banned outright (DECIMAL(38,0) is Spark's
  *     spelling of the 128-bit integer class that DuckDB spells
  *     HUGEINT — the exact r15 split), except a pinned allowlist
  *     where the ORACLE provably computes the identical decimal
  *     type and the driver has hash-verified it green;
  *   - DoubleType likewise, allowed only where the value is a
  *     source column passed through untouched (no float REDUCTION
  *     ever — a float sum would also break DeterminismSpec).
  *
  * Building each DataFrame forces full analysis (and, for the
  * index-backed queries, their bounded driver-side builds) at
  * sf0.001 — cheap, and exactly what Verify does before writing.
  */
class OutputTypeContractSpec extends SparkSpec {

  /** (query, column) pairs allowed outside the exact-integer set,
    * each justified by a driver-green hash on matching types. */
  private val allowed: Map[(String, String), DataType] = Map(
    // TPC-H Q3 revenue: SUM(extendedprice * (1-discount)) is
    // DECIMAL(38,4) on BOTH engines (Spark's sum-of-products widening
    // matches DuckDB's), hash-green since round 1
    ("q3_topk_join", "revenue") -> DecimalType(38, 4),
    // p_retailprice rides the parquet source column (DOUBLE in the
    // fixture schema) through min_by untouched — no float arithmetic
    ("part_skyline", "price") -> DoubleType)

  private val exactSet: Set[DataType] =
    Set(LongType, IntegerType, StringType, BooleanType, DateType,
      TimestampNTZType)

  test("no registered query emits a decimal/float column outside the pinned allowlist") {
    val dir = "/root/testdata/sf0.001"
    val bad = scala.collection.mutable.ArrayBuffer[String]()
    for (name <- SparkEntry.queries.keys.toSeq.sorted) {
      val df = SparkEntry.queries(name)(spark, dir)
      for (f <- df.schema.fields) {
        val ok = exactSet.contains(f.dataType) ||
          allowed.get((name, f.name)).contains(f.dataType)
        if (!ok) bad += s"$name.${f.name}: ${f.dataType.sql}"
      }
      spark.catalog.clearCache()
      graft.ops.AnnCache.clear()
    }
    assert(bad.isEmpty,
      s"output columns outside the typed-hash contract:\n  ${bad.mkString("\n  ")}")
  }
}
