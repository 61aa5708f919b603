package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (SURVEY §7.4):
  * tokenization, quality scoring, language-ID heuristic, fingerprinting.
  *
  * All pure column expressions (whole-stage-codegen friendly, no UDFs):
  * at 100 TB these run embedded in the scan stage with zero extra
  * shuffles — per-row work only.
  */
object Text {

  /** Whitespace-collapsed lowercase normal form — the canonical text for
    * fingerprints and shingles. */
  def normalized(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Whitespace tokens of the lowercased text. */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** THE DuckDB mirror of [[tokens]] — single source of truth for
    * every oracle that tokenizes (ExtensionQueries.TK aliases it). */
  def tokensSql(textExpr: String = "text"): String =
    s"regexp_split_to_array(lower(trim($textExpr)), '\\s+')"

  /** MD5 fingerprint of the normal form — exact-dup key (content
    * addressing; md5 is fine for dedup, not security). */
  def fingerprint(text: Column): Column = md5(normalized(text))

  /** BPE-ish subword segmentation: letter runs, digit runs, and single
    * punctuation marks — the pre-tokenization regex shape BPE
    * tokenizers apply before merges. Count = size of the match list.
    */
  val bpeTokenPattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"
  // pre-tokenization runs on the whitespace-NORMALIZED form: the
  // pattern's [^a-z0-9 ] class excludes only the literal space, so an
  // un-collapsed tab or newline would count as a phantom punctuation
  // pre-token
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(normalized(text), lit(bpeTokenPattern), lit(0))).cast("long")

  /** Adjacent-pair frequency table over the BPE pre-tokens — the inner
    * step of BPE tokenizer training (Sennrich et al., ACL 2016: each
    * merge round picks the most frequent adjacent symbol pair). One
    * round over raw pre-tokens is the operator; training iterates it
    * on progressively merged symbols.
    *
    * Shape: the pairing is per-row array arithmetic (zip of the token
    * list against itself shifted by one — no self-join, no window), so
    * the explode happens map-side and the only shuffle is the
    * (left, right) group-by, which combines partials map-side. At
    * corpus scale the shuffle volume is the distinct-pair count, not
    * the token count.
    */
  def pairStats(docs: DataFrame, textCol: Column): DataFrame = {
    val toks = regexp_extract_all(lower(trim(textCol)), lit(bpeTokenPattern), lit(0))
    docs.select(toks.as("tk"))
      .where(size(col("tk")) >= 2)
      .select(explode(zip_with(
        slice(col("tk"), lit(1), size(col("tk")) - 1),
        slice(col("tk"), lit(2), size(col("tk")) - 1),
        (a, b) => struct(a.as("left"), b.as("right")))).as("p"))
      .groupBy(col("p.left").as("left"), col("p.right").as("right"))
      .agg(count(lit(1)).cast("long").as("n"))
  }

  /** BPE tokenizer APPLICATION: count each doc's subword tokens after
    * applying a literal merge table in priority order (Sennrich et
    * al., ACL 2016 — [[pairStats]] is the training statistic, this is
    * the serving side). Each pre-token becomes a space-delimited
    * symbol sequence (" t a b l e ") and every merge (a, b) is one
    * `replace(' a b ', ' ab ')` pass — leftmost non-overlapping
    * replacement is exactly BPE's greedy left-to-right merge sweep,
    * and later merges see earlier merges' output, so hierarchical
    * rules like (sc, an) compose. The whole count is ONE codegen'd
    * expression (regexp pre-tokenize → per-token replace chain →
    * symbol count → aggregate sum): a pure scan-stage projection,
    * zero shuffles at any corpus size — the explode-per-token
    * formulation would shuffle 10¹³ tokens for the same number.
    * The merge table is a literal for the same reason the classifier
    * weights are: tokenizers are trained offline; the engine's
    * contract is applying them.
    */
  def bpeMergedCount(merges: Seq[(String, String)], textExpr: String = "text"): Column = {
    // Each symbol is SELF-delimited — "␟a␟␟b␟", not space-joined — so
    // one leftmost non-overlapping replace("␟a␟␟b␟" → "␟ab␟") pass IS
    // the full greedy sweep for that rule: in a run like a a a a a
    // consecutive matches don't share a delimiter char (the
    // space-joined encoding does share it, which silently skips every
    // other pair), and a replacement emits "␟ab␟", never a bare "␟a␟",
    // so a single pass leaves no residual occurrence. ␟ (unit
    // separator, chr 31) is stripped from the text first so it can
    // never masquerade as a symbol. Whitespace collapses to single
    // spaces BEFORE pre-tokenization — the class [^a-z0-9 ] excludes
    // only the literal space, so an un-normalized tab or newline
    // would count as a phantom 1-char symbol that the n_chars
    // denominator strips, inflating the compression ratio.
    val spaced = "concat(char(31), array_join(split(t, ''), concat(char(31), char(31))), char(31))"
    val chain = merges.foldLeft(spaced) { case (acc, (a, b)) =>
      s"replace($acc, concat(char(31), '$a', char(31), char(31), '$b', char(31)), " +
        s"concat(char(31), '$a$b', char(31)))"
    }
    expr("aggregate(regexp_extract_all(" +
      s"replace(regexp_replace(lower(trim($textExpr)), '\\\\s+', ' '), char(31), ''), " +
      s"'$bpeTokenPattern', 0), " +
      s"0L, (acc, t) -> acc + (length($chain) - length(replace($chain, char(31), ''))) div 2)")
  }

  /** DuckDB mirror of [[bpeMergedCount]]. */
  def bpeMergedCountSql(merges: Seq[(String, String)], textExpr: String = "text"): String = {
    val spaced = "(chr(31) || array_to_string(string_split(t, ''), chr(31) || chr(31)) || chr(31))"
    val chain = merges.foldLeft(spaced) { case (acc, (a, b)) =>
      s"replace($acc, chr(31) || '$a' || chr(31) || chr(31) || '$b' || chr(31), " +
        s"chr(31) || '$a$b' || chr(31))"
    }
    s"COALESCE(list_sum(list_transform(" +
      s"regexp_extract_all(replace(regexp_replace(lower(trim($textExpr)), '\\s+', ' ', 'g'), chr(31), ''), " +
      s"'$bpeTokenPattern', 0), " +
      s"t -> (length($chain) - length(replace($chain, chr(31), ''))) // 2)), 0)"
  }

  /** Polynomial hash of a string column's characters
    * (h = (h·31 + codepoint) mod 1e9+7) — pure integer arithmetic,
    * exactly reproducible in SQL, and crucially NOT a crypto digest:
    * Spark's `md5()` calls `MessageDigest.getInstance` per row, whose
    * JDK-17 algorithm-constraint check is a contended lock that
    * serializes 32-thread executors (measured: a 38M-call minhash
    * stage ran one task at 100% for minutes while 31 threads parked).
    */
  val polyHashMod = 1000000007L

  /** Fast path: the codegen'd [[graft.functions.PolyHash]] expression
    * (registered idempotently on the active session). */
  def polyHash(c: Column): Column = {
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(graft.functions.GraftFunctions.registerPolyHash)
    call_function("poly_hash", c)
  }

  /** Reference formulation via built-in higher-order functions —
    * kept for the equivalence property test of [[polyHash]]. */
  def polyHashHof(c: Column): Column =
    aggregate(
      transform(split(c, ""), ch => ascii(ch).cast("long")),
      lit(0L),
      (acc, x) => (acc * 31L + x) % polyHashMod)

  /** DuckDB mirror of [[polyHash]]. */
  def polyHashSql(e: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split($e, ''), c -> CAST(ascii(c) AS BIGINT))), " +
      s"(acc, c) -> (acc * 31 + c) % $polyHashMod)"

  /** Order-sensitive document fingerprint: [[polyHash]] of the normal
    * form. */
  def rollingHash(text: Column): Column = polyHash(normalized(text))

  /** Word n-gram shingles (1-based element_at, so the SQL mirror is
    * index-identical). Empty array when the doc has < n tokens. */
  def shingleExpr(n: Int, toksCol: String = "tk"): Column = {
    val parts = (0 until n).map(o => s"element_at($toksCol, i + $o)").mkString(", ' ', ")
    expr(s"CASE WHEN size($toksCol) >= $n THEN " +
      s"transform(sequence(1, size($toksCol) - ${n - 1}), i -> concat($parts)) " +
      "ELSE array() END")
  }

  /** One row per distinct shingle per doc: (idCol, shingle). Dedup
    * happens PER ROW via array_distinct before the explode — a doc's
    * shingle set always fits one row, so a `.distinct()` (which
    * shuffles the whole exploded table on (doc, shingle)) would pay a
    * full shuffle for work the map side can do alone. Every dedup
    * operator sits on this table, so the saved shuffle compounds
    * across the family. The explode happens map-side; downstream
    * joins shuffle on `shingle`.
    */
  def distinctShingles(docs: DataFrame, textCol: Column, idCol: Column, n: Int): DataFrame =
    docs.select(idCol.as("doc_id"), tokens(textCol).as("tk"))
      .select(col("doc_id"), explode(array_distinct(shingleExpr(n))).as("shingle"))

  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in")

  /** Per-document quality signals (length, stopword ratio, punctuation)
    * in pure integer arithmetic — ratios via cross-multiplication so
    * the result is engine-exact. `is_low_quality` flags docs that are
    * very short or > 60% stopwords.
    *
    * Built entirely from the passed Column (works for any column, not
    * just one literally named `text`). The repeated `tokens(text)`
    * subtree is shared at runtime by Spark's subexpression elimination —
    * the text is tokenized once per row, not once per signal.
    */
  def qualitySignals(text: Column): Seq[Column] = {
    val tk = tokens(text)
    val isStop = (t: Column) => t.isin(stopwords: _*)
    val nStopC = size(filter(tk, isStop))
    val nTokens = size(tk).cast("long").as("n_tokens")
    val nStop = nStopC.cast("long").as("n_stop")
    val nShort = size(filter(tk, t => length(t) <= 2)).cast("long").as("n_short")
    val norm = normalized(text)
    val nPunct = (length(norm) - length(regexp_replace(norm, "[^a-z0-9 ]", ""))).cast("long").as("n_punct")
    Seq(nTokens, nStop, nShort, nPunct, isLowQuality(text).as("is_low_quality"))
  }

  /** The quality-gate predicate on its own — callers filter on THIS,
    * not on a positional column of [[qualitySignals]] (selecting the
    * flag by Seq position would silently rebind if a signal is ever
    * appended). Same expression the signals emit, so the two can't
    * drift. */
  def isLowQuality(text: Column): Column = {
    val tk = tokens(text)
    val nStopC = size(filter(tk, t => t.isin(stopwords: _*)))
    (size(tk) < 10) || (lit(100) * nStopC > lit(60) * size(tk))
  }

  /** Per-doc n-gram repetition signals — the Gopher-style repetition
    * quality filters (Rae et al., "Scaling Language Models: ... Gopher",
    * 2021, §A1.1: duplicate-n-gram and top-n-gram fractions flag
    * machine-generated / boilerplate text). Integer basis points via
    * floor division, so the numbers are engine-exact:
    *  - `dup_gram_bp`: fraction of n-gram occurrences that are repeats
    *    of an earlier one ((total − distinct) / total),
    *  - `top_gram_bp`: share of occurrences held by the single most
    *    frequent n-gram.
    * Docs with fewer than `n` tokens emit all-zero signals (no grams).
    *
    * Shape: one explode + two keyed aggregations with map-side
    * partials; per-group size is bounded by document length, so there
    * is no skew risk at corpus scale.
    */
  def repetitionStats(docs: DataFrame, textCol: Column, idCol: Column,
                      n: Int = 2): DataFrame = {
    val t = docs.select(idCol.as("doc_id"), tokens(textCol).as("tk"))
    val grams = t.select(col("doc_id"), explode(shingleExpr(n)).as("g"))
    val per = grams.groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("cnt"))
    val agg = per.groupBy(col("doc_id")).agg(
      sum(col("cnt")).cast("long").as("n_grams"),
      count(lit(1)).cast("long").as("n_distinct_grams"),
      max(col("cnt")).cast("long").as("top_gram_n"))
    docs.select(idCol.as("doc_id")).join(agg, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_grams", "n_distinct_grams", "top_gram_n"))
      .withColumn("dup_gram_bp",
        when(col("n_grams") > 0,
          expr("(10000 * (n_grams - n_distinct_grams)) div n_grams"))
          .otherwise(0L))
      .withColumn("top_gram_bp",
        when(col("n_grams") > 0, expr("(10000 * top_gram_n) div n_grams"))
          .otherwise(0L))
  }

  /** Smoothed tf-idf weight (Salton/Buckley term weighting; the
    * +1-smoothed idf of scikit-learn): tf · ln((1+N)/(1+df)). Floating
    * point, so it is NOT part of any oracle-hashed query output —
    * oracle queries emit the integer tf/df inputs and the weight is
    * equivalence-tested in ScalaTest instead. */
  def tfIdf(tf: Column, df: Column, nDocs: Column): Column =
    tf.cast("double") *
      log((nDocs.cast("double") + 1) / (df.cast("double") + 1))

  private def tkSql(textCol: String): String =
    s"split(lower(trim($textCol)), '\\\\s+')"

  /** Language-marker token lists for the n-gram-style language-ID
    * heuristic. Deterministic scores with a fixed priority tiebreak.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and"),
    "es" -> Seq("el", "la", "de", "los"),
    "de" -> Seq("der", "die", "und", "das"),
    "fr" -> Seq("le", "les", "des", "une"))

  /** Marker-count score columns (s_en, s_es, ...). */
  def langScores(textCol: String): Seq[Column] =
    langMarkers.map { case (lang, markers) =>
      val list = markers.map(m => s"'$m'").mkString(", ")
      expr(s"CAST(size(filter(${tkSql(textCol)}, t -> t IN ($list))) AS BIGINT)").as(s"s_$lang")
    }

  /** Argmax over the s_* score columns with declaration-order tiebreak
    * (apply after [[langScores]] are in scope). */
  def langGuess: Column =
    langMarkers.foldRight(lit("und")) { case ((lang, _), els) =>
      val others = langMarkers.filter(_._1 != lang)
        .map(o => col(s"s_${o._1}")).reduce((a, b) => greatest(a, b))
      when(col(s"s_$lang") > 0 && col(s"s_$lang") >= others, lang).otherwise(els)
    }

  /** Feature-hashed linear classifier inference (the fastText/CCNet
    * quality-filter serving shape; feature hashing per Weinberger et
    * al., ICML'09): each token hashes into one of `weights.length`
    * buckets and the document score is the sum of its tokens' bucket
    * weights. The WEIGHTS are a parameter — trained offline, shipped
    * as a literal vector — because the serving contract is the part
    * the engine owns: at 100 TB, classifier inference must be a pure
    * scan-stage projection (token explode → groupBy(doc) would pay a
    * corpus-wide shuffle for what one aggregate() HOF computes in
    * place, inside whole-stage codegen, with the weight vector inlined
    * exactly like the Bloom words). All-integer, so Spark and the SQL
    * mirror agree bit-for-bit.
    */
  def hashedLinearScore(text: Column, weights: Seq[Long]): Column = {
    val w = typedLit(weights)
    aggregate(
      transform(tokens(text), t =>
        element_at(w, pmod(polyHash(t), lit(weights.length.toLong)).cast("int") + 1)),
      lit(0L), (acc, x) => acc + x)
  }

  /** DuckDB mirror of [[hashedLinearScore]]; `tkExpr` is the tokens-
    * array SQL (the caller's TK macro — [[tkSql]] is Spark-dialect). */
  def hashedLinearScoreSql(tkExpr: String, weights: Seq[Long]): String = {
    val list = weights.mkString("[", ", ", "]")
    s"COALESCE(list_sum(list_transform($tkExpr, t -> " +
      s"($list)[CAST(${polyHashSql("t")} % ${weights.length} AS INT) + 1])), 0)"
  }
}
