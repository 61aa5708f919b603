package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector primitives over `array<float>` columns.
  *
  * Everything is integer arithmetic over quantized components
  * (round(x·1000) as bigint): integer dot products are exact and
  * order-independent, so results are bit-identical across engines and
  * across partitionings — float dot products are neither. At a scale of
  * round(·1000), ranking differs from true float cosine only below the
  * ~1e-3 noise floor of the embeddings themselves.
  *
  * Pure higher-order-function expressions (no UDFs) — codegen'd per-row
  * work that fuses into the scan stage at 100 TB.
  */
object Vectors {

  /** Quantize float components to bigints at 3 decimals. */
  def quantize(v: Column): Column =
    transform(v, x => round(x.cast("double") * 1000).cast("long"))

  /** Exact integer dot product of two quantized vectors. */
  def intDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** Exact integer squared norm. */
  def intNorm2(a: Column): Column =
    aggregate(a, lit(0L), (acc, x) => acc + x * x)

  /** Sign-bit LSH bucket over the first `bits` components (1-based
    * element_at, mirroring SQL list indexing). Random-hyperplane LSH
    * with axis-aligned planes: vectors with cos near 1 agree on almost
    * all signs, so true near-dups share a bucket w.h.p.
    */
  def signBucket(v: Column, bits: Int): Column =
    (1 to bits).map { i =>
      when(element_at(v, i) >= 0, lit(1L << (i - 1))).otherwise(lit(0L))
    }.reduce(_ + _)

  /** SQL mirror of [[signBucket]] for the DuckDB oracle. */
  def signBucketSql(vCol: String, bits: Int): String =
    (1 to bits).map { i =>
      s"(CASE WHEN $vCol[$i] >= 0 THEN ${1L << (i - 1)} ELSE 0 END)"
    }.mkString(" + ")

  /** SQL mirrors (DuckDB) of quantize / dot / norm2 over list columns. */
  def quantizeSql(vCol: String): String =
    s"list_transform($vCol, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))"
  def intDotSql(aCol: String, bCol: String, dim: Int): String =
    s"CAST(list_sum(list_transform(generate_series(1, $dim), i -> $aCol[i] * $bCol[i])) AS BIGINT)"
  def intNorm2Sql(aCol: String, dim: Int): String =
    s"CAST(list_sum(list_transform(generate_series(1, $dim), i -> $aCol[i] * $aCol[i])) AS BIGINT)"
}
