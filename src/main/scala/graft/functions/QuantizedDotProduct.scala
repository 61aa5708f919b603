package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd fused quantize-and-dot over two `array<float>` columns:
  * Σ round(aᵢ·1000)·round(bᵢ·1000) as a single long accumulator loop.
  *
  * Semantically identical to the composable form
  * `aggregate(zip_with(quantize(a), quantize(b), _*_), 0L, _+_)`
  * ([[graft.ops.Vectors]]), but with no intermediate quantized arrays
  * or lambda dispatch — the hot path of ANN scoring evaluates this
  * once per (query, candidate) pair, so allocation per pair matters.
  * `q_dot(v, v)` doubles as the squared norm.
  *
  * Rounding is half-away-from-zero (explicit floor/ceil formulation),
  * matching both Spark's `round()` and DuckDB's `round()` so the
  * DuckDB oracle stays exact.
  */
case class QuantizedDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "q_dot"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"q_dot requires two array<float> arguments, got ${left.dataType} / ${right.dataType}")
  }

  @inline private def q(x: Float): Long = {
    val v = x.toDouble * 1000.0
    if (v >= 0) math.floor(v + 0.5).toLong else math.ceil(v - 0.5).toLong
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) acc += q(a.getFloat(i)) * q(b.getFloat(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val vx = ctx.freshName("vx")
      val vy = ctx.freshName("vy")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    double $vx = ((double) $a.getFloat($i)) * 1000.0;
         |    double $vy = ((double) $b.getFloat($i)) * 1000.0;
         |    $acc += (long)($vx >= 0 ? Math.floor($vx + 0.5) : Math.ceil($vx - 0.5))
         |          * (long)($vy >= 0 ? Math.floor($vy + 0.5) : Math.ceil($vy - 0.5));
         |  }
         |}
         |${ev.value} = $acc;
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd polynomial character hash:
  * h = fold(codepoints, 0)((h, cp) => (h·31 + cp) mod 1e9+7).
  *
  * Semantically identical to the composable HOF form
  * `aggregate(transform(split(c, ""), ascii), 0, ...)`
  * ([[graft.ops.Text.polyHashHof]], equivalence property-tested), but
  * one tight codepoint loop instead of materializing an array of
  * single-character strings per row — this is the per-shingle inner
  * loop of the whole MinHash family, so the allocation matters.
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"poly_hash requires a string argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31L + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
         |String $s = $in.toString();
         |long $h = 0L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  $h = ($h * 31L + $cp) % 1000000007L;
         |  $i += Character.charCount($cp);
         |}
         |${ev.value} = $h;
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd ADC lookup-sum — the scoring kernel of product
  * quantization ([[graft.ops.Pq]]): given a vector's `codes`
  * (array<int>, one code per subspace) and a query's flat distance
  * table `tbl` (array<double>, laid out sub·k + code), returns
  * Σ_s tbl[s·k + codes[s]].
  *
  * Semantically identical to the composable HOF form
  * `aggregate(sequence(0, m-1), 0D, (acc, s) -> acc +
  * element_at(tbl, s*k + element_at(codes, s+1) + 1))`, but one tight
  * loop with no per-row sequence materialization or lambda dispatch —
  * this evaluates once per (query, candidate) pair on the compressed
  * scan, the hot path the codes exist for. Out-of-range lookups (a
  * malformed code) contribute nothing rather than throwing, matching
  * non-ANSI element_at's null-skip.
  */
case class AdcLookupSum(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "adc_sum"

  override def checkInputDataTypes(): TypeCheckResult = {
    import org.apache.spark.sql.types.{DoubleType, IntegerType}
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) if k > 0 =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"adc_sum requires (array<int>, array<double>, k > 0), got " +
          s"${left.dataType} / ${right.dataType} / k=$k")
    }
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val codes = l.asInstanceOf[ArrayData]
    val tbl = r.asInstanceOf[ArrayData]
    val m = codes.numElements()
    val n = tbl.numElements()
    var acc = 0.0
    var s = 0
    while (s < m) {
      if (!codes.isNullAt(s)) {
        val idx = s * k + codes.getInt(s)
        if (idx >= 0 && idx < n && !tbl.isNullAt(idx)) acc += tbl.getDouble(idx)
      }
      s += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, t) => {
      val s = ctx.freshName("s")
      val m = ctx.freshName("m")
      val n = ctx.freshName("n")
      val idx = ctx.freshName("idx")
      val acc = ctx.freshName("acc")
      s"""
         |int $m = $c.numElements();
         |int $n = $t.numElements();
         |double $acc = 0.0;
         |for (int $s = 0; $s < $m; $s++) {
         |  if (!$c.isNullAt($s)) {
         |    int $idx = $s * $k + $c.getInt($s);
         |    if ($idx >= 0 && $idx < $n && !$t.isNullAt($idx)) {
         |      $acc += $t.getDouble($idx);
         |    }
         |  }
         |}
         |${ev.value} = $acc;
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd 60-bit piecewise-average perceptual hash
  * ([[graft.ops.Multimodal.aHashBits]] semantics): the string's
  * chars split into 60 equal segments ([k·n/60, (k+1)·n/60) bounds,
  * integer division), and bit k is set iff seg_sum_k·n >
  * total·seg_len_k — exact integer cross-multiplied mean thresholds.
  *
  * Semantically identical to the composable HOF form
  * ([[graft.ops.Multimodal.aHashHofExpr]]: transform/slice/aggregate
  * over an ascii-code array), but a single pass over the chars with
  * no code-array materialization, slice copies, or lambda dispatch —
  * this runs once per media row on the ingest scan. Char basis =
  * UTF-16 code units, matching `split(s, '') + ascii()` exactly
  * (the fixture and oracle convention is ASCII content).
  *
  * Overflow bound: the threshold products seg_sum·n and
  * total·seg_len are each ≤ n²·2^16/60, which fits a signed long only
  * for n ≤ [[AHash60.MaxChars]] (~9.1e7 UTF-16 units). Beyond that
  * Spark's long math would wrap silently while the DuckDB oracle
  * errors on BIGINT overflow — a silently-wrong fingerprint — so both
  * the interpreted and codegen branches REJECT longer inputs with an
  * explicit error. (The HOF twin [[graft.ops.Multimodal.aHashedHof]]
  * and the SQL oracle share the same n² bound.)
  */
case class AHash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "a_hash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"a_hash requires a string argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length
    if (n > AHash60.MaxChars) throw AHash60.tooLong(n)
    val seg = new Array[Long](60)
    var total = 0L
    var k = 0
    while (k < 60) {
      val lo = (k.toLong * n / 60).toInt
      val hi = ((k + 1).toLong * n / 60).toInt
      var sum = 0L
      var i = lo
      while (i < hi) { sum += s.charAt(i).toLong; i += 1 }
      seg(k) = sum
      total += sum
      k += 1
    }
    var fp = 0L
    k = 0
    while (k < 60) {
      val lo = (k.toLong * n / 60).toInt
      val hi = ((k + 1).toLong * n / 60).toInt
      if (seg(k) * n > total * (hi - lo)) fp |= 1L << k
      k += 1
    }
    fp
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val s = ctx.freshName("s")
      val n = ctx.freshName("n")
      val seg = ctx.freshName("seg")
      val total = ctx.freshName("total")
      val k = ctx.freshName("k")
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val sum = ctx.freshName("sum")
      val i = ctx.freshName("i")
      val fp = ctx.freshName("fp")
      s"""
         |String $s = $in.toString();
         |int $n = $s.length();
         |if ($n > ${AHash60.MaxChars}) {
         |  throw new IllegalArgumentException(
         |    "a_hash input has " + $n + " UTF-16 units, exceeding the " +
         |    "${AHash60.MaxChars}-unit overflow-safe bound");
         |}
         |long[] $seg = new long[60];
         |long $total = 0L;
         |for (int $k = 0; $k < 60; $k++) {
         |  int $lo = (int) ((long) $k * $n / 60);
         |  int $hi = (int) ((long) ($k + 1) * $n / 60);
         |  long $sum = 0L;
         |  for (int $i = $lo; $i < $hi; $i++) { $sum += (long) $s.charAt($i); }
         |  $seg[$k] = $sum;
         |  $total += $sum;
         |}
         |long $fp = 0L;
         |for (int $k = 0; $k < 60; $k++) {
         |  int $lo = (int) ((long) $k * $n / 60);
         |  int $hi = (int) ((long) ($k + 1) * $n / 60);
         |  if ($seg[$k] * $n > $total * ($hi - $lo)) $fp |= 1L << $k;
         |}
         |${ev.value} = $fp;
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd argmin-over-seed-centroids kernel — the exact k-means
  * assignment loop ([[graft.ops.SemanticCluster.seedAssignments]]):
  * for a quantized row vector `q` (array<long>) and k centroids held
  * as flat driver-side arrays, returns struct(sc, id) where
  * `sc = min_s (‖c_s‖² − 2·q·c_s)` and `id` is the LOWEST seed id
  * attaining it (ids are sorted ascending and the loop keeps the
  * first strict minimum — the same tie-break as the SQL oracle's
  * `ORDER BY sc, cid` row_number pick).
  *
  * Semantically identical to the composable HOF form
  * `array_min(transform(seeds, s -> struct(s.cn2 − 2·Σ q·s.cq, s.id)))`
  * (equivalence property-pinned in QuantizedDotSpec), but higher-order
  * functions are CodegenFallback — evaluated per element through boxed
  * lambda dispatch — and this kernel runs n·k times per assignment
  * pass with k corpus-scaled (SemDeDup's k = n div 500). The r20 sf1
  * sweep measured the difference directly: ~30 s of emb_semdedup's
  * 35 s at n = 200k, k = 400 was interpreted scoring (both the
  * literal-unrolled and HOF forms), against ~2 s for the same
  * n·k·dim multiply-adds in this generated loop. Null elements of `q`
  * contribute nothing (the q_dot convention). The centroid matrix
  * rides into generated code as a referenced long[] — expression-tree
  * size is O(1) in k, where the unrolled form carried k·dim literal
  * nodes and stopped compiling at corpus-scaled k.
  */
case class SeedArgmin(child: Expression, ids: Array[Long],
    flat: Array[Long], dim: Int) extends UnaryExpression {
  import org.apache.spark.sql.types.{StructField, StructType}

  require(ids.nonEmpty, "seed_argmin requires at least one seed")
  require(dim > 0 && flat.length == ids.length * dim,
    s"seed_argmin: flat centroid matrix has ${flat.length} elements, " +
      s"expected ${ids.length} seeds x $dim dims")
  require(ids.zip(ids.tail).forall { case (a, b) => a < b },
    "seed_argmin: seed ids must be strictly ascending (the tie-break " +
      "contract: first strict minimum = lowest id)")

  override def dataType: DataType = StructType(Seq(
    StructField("sc", LongType, nullable = false),
    StructField("id", LongType, nullable = false)))
  override def prettyName: String = "seed_argmin"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"seed_argmin requires an array<long> argument, got $t")
  }

  /** ‖c_s‖² per seed, derived from the matrix once. */
  private lazy val norms: Array[Long] = Array.tabulate(ids.length) { s =>
    var acc = 0L
    var i = s * dim
    val end = i + dim
    while (i < end) { acc += flat(i) * flat(i); i += 1 }
    acc
  }

  override def nullSafeEval(input: Any): Any = {
    val q = input.asInstanceOf[ArrayData]
    val n = math.min(q.numElements(), dim)
    val qa = new Array[Long](n)
    var i = 0
    while (i < n) { qa(i) = if (q.isNullAt(i)) 0L else q.getLong(i); i += 1 }
    var bestSc = Long.MaxValue
    var bestId = -1L
    var s = 0
    while (s < ids.length) {
      var dot = 0L
      val off = s * dim
      i = 0
      while (i < n) { dot += qa(i) * flat(off + i); i += 1 }
      val sc = norms(s) - 2L * dot
      if (sc < bestSc) { bestSc = sc; bestId = ids(s) }
      s += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestSc, bestId))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, qv => {
      val idsRef = ctx.addReferenceObj("seedIds", ids, "long[]")
      val flatRef = ctx.addReferenceObj("seedFlat", flat, "long[]")
      val normsRef = ctx.addReferenceObj("seedNorms", norms, "long[]")
      val n = ctx.freshName("n")
      val qa = ctx.freshName("qa")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val off = ctx.freshName("off")
      val dot = ctx.freshName("dot")
      val sc = ctx.freshName("sc")
      val bestSc = ctx.freshName("bestSc")
      val bestId = ctx.freshName("bestId")
      s"""
         |int $n = java.lang.Math.min($qv.numElements(), $dim);
         |long[] $qa = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $qa[$i] = $qv.isNullAt($i) ? 0L : $qv.getLong($i);
         |}
         |long $bestSc = Long.MAX_VALUE;
         |long $bestId = -1L;
         |for (int $s = 0; $s < $idsRef.length; $s++) {
         |  long $dot = 0L;
         |  int $off = $s * $dim;
         |  for (int $i = 0; $i < $n; $i++) { $dot += $qa[$i] * $flatRef[$off + $i]; }
         |  long $sc = $normsRef[$s] - 2L * $dot;
         |  if ($sc < $bestSc) { $bestSc = $sc; $bestId = $idsRef[$s]; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{ (Object) $bestSc, (Object) $bestId });
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AHash60 {
  /** Largest input length whose threshold products provably fit a
    * signed long: need n·65535·(⌈n/60⌉) < 2^63, i.e. n ≲ 9.19e7;
    * held back to a round 9e7 for margin. */
  val MaxChars: Int = 90000000

  def tooLong(n: Int): IllegalArgumentException =
    new IllegalArgumentException(
      s"a_hash input has $n UTF-16 units, exceeding the $MaxChars-unit " +
        "overflow-safe bound (threshold products would wrap silently)")
}

object GraftFunctions {
  /** Idempotently register the custom expressions with a session and
    * return a Column builder for `q_dot`. */
  def registerQDot(spark: SparkSession): (Column, Column) => Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "q_dot", exprs => QuantizedDotProduct(exprs(0), exprs(1)), "built-in")
    (a: Column, b: Column) => org.apache.spark.sql.functions.call_function("q_dot", a, b)
  }

  /** Idempotently register `poly_hash` on the session (no-op if done). */
  def registerPolyHash(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "poly_hash", exprs => PolyHash(exprs.head), "built-in")

  /** Idempotently register `a_hash` on the session (no-op if done). */
  def registerAHash(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "a_hash", exprs => AHash60(exprs.head), "built-in")

  /** Shared SQL builder for `adc_sum(codes, tbl, k)`: validates arity
    * and that `k` is a foldable integer literal, so a SQL user gets a
    * real error message instead of an IndexOutOfBounds /
    * UnsupportedOperation / ClassCast from deep inside analysis. */
  private[graft] def adcSumBuilder(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    require(exprs.length == 3,
      s"adc_sum requires exactly 3 arguments (codes, tbl, k), got ${exprs.length}")
    val kExpr = exprs(2)
    require(kExpr.foldable && kExpr.dataType ==
      org.apache.spark.sql.types.IntegerType,
      s"adc_sum's third argument must be a foldable INT literal, got $kExpr")
    AdcLookupSum(exprs(0), exprs(1), kExpr.eval().asInstanceOf[Int])
  }

  /** Idempotently register `adc_sum(codes, tbl, k)` (k must be a
    * foldable int literal) and return a Column builder bound to `k`. */
  def registerAdcSum(spark: SparkSession): (Column, Column, Int) => Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "adc_sum", adcSumBuilder, "built-in")
    (codes: Column, tbl: Column, k: Int) =>
      org.apache.spark.sql.functions.call_function("adc_sum", codes, tbl,
        org.apache.spark.sql.functions.lit(k))
  }

  /** Shared SQL builder for `seed_argmin(q, ids, flat, dim)`: the seed
    * arrays and dim must be foldable literals (they become referenced
    * long[]s in the generated kernel, never per-row expressions). */
  private[graft] def seedArgminBuilder(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    require(exprs.length == 4,
      s"seed_argmin requires exactly 4 arguments (q, ids, flat, dim), " +
        s"got ${exprs.length}")
    def longs(e: org.apache.spark.sql.catalyst.expressions.Expression,
              what: String): Array[Long] = {
      require(e.foldable,
        s"seed_argmin's $what argument must be a foldable array<long> literal")
      e.eval().asInstanceOf[ArrayData].toLongArray()
    }
    val dimE = exprs(3)
    require(dimE.foldable &&
      dimE.dataType == org.apache.spark.sql.types.IntegerType,
      s"seed_argmin's dim argument must be a foldable INT literal, got $dimE")
    SeedArgmin(exprs(0), longs(exprs(1), "ids"), longs(exprs(2), "flat"),
      dimE.eval().asInstanceOf[Int])
  }

  /** Idempotently register `seed_argmin(q, ids, flat, dim)` and return
    * a Column builder taking the driver-side seed arrays directly. */
  def registerSeedArgmin(spark: SparkSession)
      : (Column, Array[Long], Array[Long], Int) => Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "seed_argmin", seedArgminBuilder, "built-in")
    (q: Column, ids: Array[Long], flat: Array[Long], dim: Int) =>
      org.apache.spark.sql.functions.call_function("seed_argmin", q,
        org.apache.spark.sql.functions.lit(ids),
        org.apache.spark.sql.functions.lit(flat),
        org.apache.spark.sql.functions.lit(dim))
  }
}
