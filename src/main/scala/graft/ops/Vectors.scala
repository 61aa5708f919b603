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

  /** Deterministic ±1 hyperplane matrix (planes × dim), fixed seed —
    * shared by the Spark expression and its SQL mirror so buckets are
    * engine-identical. Sign-random projections are a proper LSH family
    * for cosine (Charikar, STOC 2002: P[signs agree] = 1 − θ/π per
    * plane); the previous
    * dimension-prefix variant hashed only the first `bits` components,
    * an arbitrary and weaker family.
    */
  def hyperplanes(planes: Int, dim: Int): Seq[Seq[Long]] = {
    val rnd = new scala.util.Random(0x5eed5L)
    Seq.fill(planes)(Seq.fill(dim)(if (rnd.nextBoolean()) 1L else -1L))
  }

  /** Random-hyperplane LSH bucket of a quantized vector: bit j = sign
    * of the dot product with ±1 plane j. Integer arithmetic end-to-end.
    * Callers should materialize `quantize(v)` into a column first so
    * the quantization runs once per row, not once per plane.
    *
    * Dimension-mismatch safety: `zip_with` null-pads the shorter side,
    * and a null term is coalesced to 0 — a vector shorter or longer
    * than `dim` hashes on the overlapping prefix instead of collapsing
    * every vector into bucket 0 (null projection). The SQL mirror has
    * the same semantics: list_sum skips null terms, and a fully-null
    * projection (empty vector / zero overlap) is coalesced to 0 so both
    * engines put the degenerate vector in the same all-bits bucket.
    */
  def signBucket(v: Column, bits: Int, dim: Int = 64): Column = {
    val hp = hyperplanes(bits, dim)
    (0 until bits).map { j =>
      val w = array(hp(j).map(lit): _*)
      // the OUTER coalesce covers a null vector (zip_with of a null
      // array is null, so the per-element coalesce never runs): the
      // projection degrades to 0, exactly what the SQL mirror's
      // COALESCE(list_sum(...), 0) yields — without it the two engines
      // diverge (null ≥ 0 is null in Spark, so every bit would fall to
      // 0 while DuckDB's 0 ≥ 0 sets every bit)
      val proj = coalesce(aggregate(zip_with(v, w, (x, y) => coalesce(x * y, lit(0L))),
        lit(0L), (acc, x) => acc + x), lit(0L))
      when(proj >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Corpus-scaled LSH width: the smallest b ∈ [minBits, 24] with
    * 2^b · occupancy ≥ n, i.e. mean sign-bucket occupancy pinned at
    * ≤ `occupancy` vectors. A FIXED bucket count makes every
    * bucket-keyed self-join quadratic in the corpus (bucket size
    * ∝ n); scaling the width keeps it linear. Engines stay identical
    * via the PREFIX PROPERTY: [[hyperplanes]] draws planes
    * sequentially from one fixed seed, so signBucket(v, b) ==
    * signBucket(v, 24) % 2^b (pinned in VectorsSpec) and the SQL
    * mirror can mask the full 24-bit bucket with
    * [[scaledLshPow2Sql]]'s scalar instead of re-deriving planes. */
  def scaledLshBits(n: Long, minBits: Int, occupancy: Int): Int =
    (minBits to 24).find(b => (1L << b) * occupancy >= n).getOrElse(24)

  /** DuckDB scalar mirroring `1 << scaledLshBits(count(*), …)` over
    * `table` — exact integer arithmetic, no float log2. */
  def scaledLshPow2Sql(table: String, minBits: Int, occupancy: Int): String =
    s"""coalesce(
       |  (SELECT min(CAST(1 AS BIGINT) << b)
       |   FROM (SELECT unnest(generate_series($minBits, 24)) AS b)
       |   WHERE (CAST(1 AS BIGINT) << b) * $occupancy >=
       |         (SELECT count(*) FROM $table)),
       |  CAST(1 AS BIGINT) << 24)""".stripMargin

  /** SQL mirror of [[signBucket]] for the DuckDB oracle. */
  def signBucketSql(vCol: String, bits: Int, dim: Int = 64): String = {
    val hp = hyperplanes(bits, dim)
    (0 until bits).map { j =>
      val w = hp(j).mkString("[", ", ", "]")
      s"(CASE WHEN COALESCE(list_sum(list_transform(generate_series(1, $dim), i -> $vCol[i] * ($w)[i])), 0) >= 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString(" + ")
  }

  /** Johnson–Lindenstrauss ±1 sign projection (Achlioptas, JCSS 2003:
    * ±1 entries preserve pairwise distances like Gaussian ones):
    * component j of the output = the quantized vector's dot product
    * with hyperplane j — the same planes [[signBucket]] keeps only the
    * SIGNS of. Integer arithmetic end to end, so the projected table
    * is engine/partitioning-exact. Dimensionality falls `dim →
    * planes` (64 → 16 is a 4× cut in ANN memory and per-pair compute);
    * the projection itself is a pure scan-stage expression. Null
    * semantics match signBucket: null-padded TERMS coalesce to 0, and
    * a fully-null VECTOR coalesces to the zero projection — the same
    * answer the SQL mirror's COALESCE(list_sum(...), 0) produces, so
    * a null embedding in a future fixture vintage cannot split the
    * hash compare. */
  def signProject(v: Column, planes: Int, dim: Int = 64): Column = {
    val hp = hyperplanes(planes, dim)
    array(hp.map { p =>
      val w = array(p.map(lit): _*)
      coalesce(aggregate(zip_with(v, w, (x, y) => coalesce(x * y, lit(0L))),
        lit(0L), (acc, x) => acc + x), lit(0L))
    }: _*)
  }

  /** SQL mirror of [[signProject]] (DuckDB list literal). Each
    * component casts to BIGINT: DuckDB's list_sum returns DOUBLE-ish
    * HUGEINT that stringifies with a trailing .0 in the compare. */
  def signProjectSql(vCol: String, planes: Int, dim: Int = 64): String = {
    val hp = hyperplanes(planes, dim)
    hp.map { p =>
      val w = p.mkString("[", ", ", "]")
      s"CAST(COALESCE(list_sum(list_transform(generate_series(1, $dim), i -> $vCol[i] * ($w)[i])), 0) AS BIGINT)"
    }.mkString("[", ", ", "]")
  }

  /** SQL mirrors (DuckDB) of quantize / dot / norm2 over list columns. */
  def quantizeSql(vCol: String): String =
    s"list_transform($vCol, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))"
  def intDotSql(aCol: String, bCol: String, dim: Int): String =
    s"CAST(list_sum(list_transform(generate_series(1, $dim), i -> $aCol[i] * $bCol[i])) AS BIGINT)"
  def intNorm2Sql(aCol: String, dim: Int): String =
    s"CAST(list_sum(list_transform(generate_series(1, $dim), i -> $aCol[i] * $aCol[i])) AS BIGINT)"
}
