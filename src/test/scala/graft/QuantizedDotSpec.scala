package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.ops.Vectors

/** The fused codegen expression must be bit-identical to the
  * composable quantize+zip_with+aggregate form, interpreted and
  * codegen'd, across sign/magnitude ranges.
  */
class QuantizedDotSpec extends SparkSpec {
  import spark.implicits._

  test("q_dot == compositional intDot on 1000 random vectors") {
    val rnd = new scala.util.Random(99)
    val rows = (0 until 1000).map { i =>
      (i.toLong,
        Array.fill(64)((rnd.nextFloat() - 0.5f) * rnd.nextInt(5).toFloat).toSeq,
        Array.fill(64)((rnd.nextFloat() - 0.5f) * rnd.nextInt(5).toFloat).toSeq)
    }
    val df = rows.toDF("id", "a", "b")
    val qdot = GraftFunctions.registerQDot(spark)
    val cmp = df.select(
      qdot(col("a"), col("b")).as("fused"),
      Vectors.intDot(Vectors.quantize(col("a")), Vectors.quantize(col("b"))).as("composed"))
    assert(cmp.where(col("fused") =!= col("composed")).count() === 0)
  }

  test("q_dot(v, v) is the squared norm; empty and null-element arrays behave") {
    val qdot = GraftFunctions.registerQDot(spark)
    val df = Seq(
      (1L, Seq(1.0f, -2.0f, 0.5f), Seq(1.0f, -2.0f, 0.5f)),
      (2L, Seq.empty[Float], Seq.empty[Float])
    ).toDF("id", "a", "b")
    val out = df.select(col("id"), qdot(col("a"), col("b")).as("d")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // round(1000)^2 + round(-2000)^2 + round(500)^2
    assert(out(1L) === 1000L * 1000 + 2000L * 2000 + 500L * 500)
    assert(out(2L) === 0L)
  }

  test("a_hash == HOF slice/aggregate formulation on random ASCII strings") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abcdefghij klmnop qrstu vwxyz0123456789 ,.!"
    val rows = (0 until 400).map { i =>
      // lengths straddle the 60-segment boundary: empty, sub-segment,
      // and multi-char-per-segment strings all exercised
      val len = rnd.nextInt(300)
      (i.toLong, Array.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    val df = rows.toDF("media_id", "content")
    val fused = graft.ops.Multimodal.aHashed(df, $"content", $"media_id")
      .withColumnRenamed("phash", "fused")
    val composed = graft.ops.Multimodal.aHashedHof(df, $"content", $"media_id")
      .withColumnRenamed("phash", "composed")
    val cmp = fused.join(composed, "media_id")
    assert(cmp.where($"fused" =!= $"composed").count() === 0)
    // planted sanity: the 60-bit space is actually used
    assert(fused.select(countDistinct($"fused")).as[Long].head() > 300L)
  }

  test("adc_sum == HOF aggregate/element_at formulation on random code tables") {
    val rnd = new scala.util.Random(13)
    val m = 8
    val k = 16
    val rows = (0 until 500).map { i =>
      (i.toLong,
        Seq.fill(m)(rnd.nextInt(k)),
        Seq.fill(m * k)(rnd.nextDouble() * 20 - 10))
    }
    val df = rows.toDF("id", "codes", "tbl")
    val adc = GraftFunctions.registerAdcSum(spark)
    val hof = expr(
      s"aggregate(sequence(0, ${m - 1}), 0D, (acc, s) -> acc + element_at(tbl, s * $k + element_at(codes, s + 1) + 1))")
    val cmp = df.select(
      adc(col("codes"), col("tbl"), k).as("fused"), hof.as("composed"))
    // identical lookup order → bit-identical doubles
    assert(cmp.where(col("fused") =!= col("composed")).count() === 0)
    // out-of-range code contributes nothing instead of throwing
    val bad = Seq((1L, Seq(0, k * m + 5), Seq.fill(2 * k)(1.0)))
      .toDF("id", "codes", "tbl")
      .select(adc(col("codes"), col("tbl"), k).as("v")).collect()
    assert(bad.head.getDouble(0) === 1.0)
  }

  test("poly_hash == HOF formulation on random strings incl. unicode and edges") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abc XYZ 0189_.,!?-éüßñ漢字" // ascii + accents + CJK
    val rows = (0 until 500).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(60))(alphabet(rnd.nextInt(alphabet.length))).mkString)
    } ++ Seq((9000L, ""), (9001L, " "), (9002L, "a"))
    val df = rows.toDF("id", "s")
    val cmp = df.select(
      graft.ops.Text.polyHash(col("s")).as("fast"),
      graft.ops.Text.polyHashHof(col("s")).as("hof"))
    assert(cmp.where(col("fast") =!= col("hof")).count() === 0)
  }

  test("seed_argmin == HOF array_min/transform formulation on random seeds") {
    val rnd = new scala.util.Random(41)
    val dim = 16
    val k = 37
    // quantized integer seeds with sorted ascending ids (the kernel's
    // tie-break contract); magnitudes mixed so scores cross zero
    val seeds = (0 until k).map(s =>
      (s.toLong * 3 + 1, Seq.fill(dim)((rnd.nextInt(2001) - 1000).toLong)))
    val ids = seeds.map(_._1).toArray
    val flat = seeds.flatMap(_._2).toArray
    val rows = (0 until 800).map { i =>
      (i.toLong, Seq.fill(dim)((rnd.nextInt(2001) - 1000).toLong))
    }
    val df = rows.toDF("id", "q")
    val sa = GraftFunctions.registerSeedArgmin(spark)
    val seedArr = typedLit(seeds.map { case (id, c) =>
      (id, c, c.map(x => x * x).sum)
    })
    val hof = array_min(transform(seedArr, s =>
      struct(
        (s.getField("_3") - lit(2L) * aggregate(
          zip_with(col("q"), s.getField("_2"), (x, c) => x * c),
          lit(0L), (a, y) => a + y)).as("sc"),
        s.getField("_1").as("id"))))
    val cmp = df.select(
      sa(col("q"), ids, flat, dim).as("fused"), hof.as("composed"))
    assert(cmp.where(col("fused.sc") =!= col("composed.sc") ||
      col("fused.id") =!= col("composed.id")).count() === 0)
    // planted tie: two identical seeds — the LOWEST id must win (the
    // struct-min lexicographic tie-break both forms share)
    val tids = Array(5L, 9L)
    val tflat = Array(100L, 200L, 100L, 200L)
    val tie = Seq((1L, Seq(100L, 200L))).toDF("id", "q")
      .select(sa(col("q"), tids, tflat, 2).as("b")).collect().head
    assert(tie.getStruct(0).getLong(1) === 5L)
  }

  test("SQL surface: q_dot callable from spark.sql") {
    GraftFunctions.registerQDot(spark)
    val r = spark.sql(
      "SELECT q_dot(array(cast(0.1 as float)), array(cast(0.2 as float))) AS d")
      .collect().head.getLong(0)
    assert(r === 100L * 200L)
  }
}
