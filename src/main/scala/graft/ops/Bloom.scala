package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Integer-exact Bloom filter over a keyed corpus — the broadcastable
  * membership sketch for contamination screens and dedup pre-filters.
  *
  * Why it earns a place next to the exact anti-join: at 100 TB the
  * exact "is this train doc's fingerprint in the test split?" check
  * shuffles every fingerprint of the big side. The Bloom filter is
  * `MBits/8` bytes total (512 bytes here) built from one aggregation
  * over the SMALL side, then broadcast — the probe is a scan-stage
  * expression over the big side with NO shuffle of the corpus, at the
  * price of a bounded, auditable false-positive rate (classic
  * Bloom 1970 bound (1-e^{-kn/m})^k; zero false negatives, so a
  * Bloom "clean" verdict is definitive). The filter frame is
  * mergeable (bit_or word-wise), so per-partition filters roll up
  * exactly like the KMV/CMS sketches in this repo.
  *
  * Everything is 64-bit integer arithmetic mirrored 1:1 in the DuckDB
  * oracles: positions come from Kirsch–Mitzenmacher double hashing
  * (`pos_i = (h1 + i·h2) mod m` — Kirsch & Mitzenmacher, ESA'06: two
  * derived hashes give the full k-hash Bloom guarantee), and words
  * pack 32 bits each so `1 << bit` never touches the sign bit of a
  * BIGINT in either engine.
  */
object Bloom {
  /** Filter width in bits (power of two only for cheap mod). */
  val MBits = 4096
  /** Words of 32 bits each. */
  val Words: Int = MBits / 32
  /** Number of probe positions per key. */
  val Hashes = 3

  /** h1/h2 of Kirsch–Mitzenmacher double hashing from one 64-bit key
    * (the key is already a [[Text.polyHash]]-style mixed value).
    *
    * `divide(...).cast(long)` is a double division truncated back —
    * exact here because keys live in [0, polyHashMod) < 2^53, where
    * IEEE-754 division by 4096 loses nothing; the DuckDB mirror's
    * integer `//` therefore agrees bit-for-bit on this domain. */
  private def h1(h: Column): Column = pmod(h, lit(MBits.toLong))
  private def h2(h: Column): Column =
    lit(1L) + pmod(h.divide(lit(MBits.toLong)).cast("long"), lit((MBits - 1).toLong))

  /** The i-th probed bit position of key `h`, in [0, MBits). */
  def position(h: Column, i: Int): Column =
    pmod(h1(h) + lit(i.toLong) * h2(h), lit(MBits.toLong))

  /** SQL mirror of [[position]] (DuckDB; `hExpr` must be BIGINT). */
  def positionSql(hExpr: String, i: Int): String = {
    val h1 = s"(($hExpr) % $MBits + $MBits) % $MBits"
    val h2 = s"(1 + (($hExpr) // $MBits) % ${MBits - 1})"
    s"(($h1 + $i * $h2) % $MBits + $MBits) % $MBits"
  }

  /** All [[Hashes]] positions as one array column (explode to probe). */
  def positions(h: Column): Column =
    array((0 until Hashes).map(i => position(h, i)): _*)

  /** Build the filter from a key frame: one row per NON-EMPTY 32-bit
    * word, `(word INT, bits BIGINT)`. At most [[Words]] rows — always
    * broadcastable, and mergeable across shards by `bit_or` on word.
    */
  def build(keys: DataFrame, h: Column): DataFrame =
    keys.select(explode(positions(h)).as("pos"))
      .select((col("pos") / 32).cast("int").as("word"),
        call_function("shiftleft", lit(1L), (col("pos") % 32).cast("int")).as("bitval"))
      .groupBy("word").agg(expr("bit_or(bitval)").as("bits"))

  /** SQL mirror of [[build]] as a CTE body over `src(h)` → word/bits. */
  def buildSql(srcCte: String): String = {
    val posUnion = (0 until Hashes)
      .map(i => s"SELECT ${positionSql("h", i)} AS pos FROM $srcCte")
      .mkString(" UNION ALL ")
    s"""SELECT CAST(pos // 32 AS INT) AS word,
       |       bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INT)) AS bits
       |FROM ($posUnion) GROUP BY 1""".stripMargin
  }

  /** Materialize the filter as a dense [[Words]]-long word vector on
    * the driver. This is the operator's ONLY collect and it is bounded
    * by construction (≤ [[Words]] = 128 longs — same bounded-model-
    * metadata policy as the PQ codebooks and k-means centroids): the
    * whole point of the sketch is that it fits in a literal.
    */
  def filterWords(filter: DataFrame): Array[Long] = {
    val dense = Array.fill(Words)(0L)
    filter.select(col("word"), col("bits")).collect().foreach { r =>
      dense(r.getInt(0)) = r.getLong(1)
    }
    dense
  }

  /** Scan-stage probe predicate: true iff ALL [[Hashes]] positions of
    * key `h` are set in `words`. The filter rides the plan as a
    * 128-element array literal, so probing a 100 TB corpus is a pure
    * projection — no join, no shuffle, and the predicate stays inside
    * whole-stage codegen.
    */
  def hitExpr(h: Column, words: Array[Long]): Column = {
    val w = typedLit(words.toSeq)
    (0 until Hashes).map { i =>
      val pos = position(h, i)
      val word = element_at(w, (pos / 32).cast("int") + 1)
      call_function("shiftright", word, (pos % 32).cast("int")) % 2 === 1
    }.reduce(_ && _)
  }
}
