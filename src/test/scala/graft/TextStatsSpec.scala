package graft

import org.apache.spark.sql.functions._
import graft.ops.Text

/** Repetition signals and tf-idf weighting on hand-computed fixtures. */
class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  test("hashedLinearScore matches a driver-side fold of the same arithmetic") {
    val weights: Seq[Long] = (0 until 64).map(b => ((b * 2654435761L) % 1009L) - 504L)
    def polyHash(s: String): Long =
      s.foldLeft(0L)((acc, c) => (acc * 31L + c.toLong) % 1000000007L)
    def score(text: String): Long =
      text.trim.toLowerCase.split("\\s+")
        .map(t => weights((polyHash(t) % 64L).toInt)).sum
    val docs = Seq((1L, "The quick brown fox"), (2L, "foo Bar baz foo foo"),
        (3L, "  padded   whitespace  doc  "))
      .toDF("doc_id", "text")
    val got = docs.select($"doc_id",
        Text.hashedLinearScore($"text", weights).as("s"))
      .as[(Long, Long)].collect().toMap
    val want = Map(
      1L -> score("The quick brown fox"),
      2L -> score("foo Bar baz foo foo"),
      3L -> score("  padded   whitespace  doc  "))
    assert(got === want)
    // repeated tokens count with multiplicity, so doc 2's repeats move
    // the score by exactly 2x the "foo" bucket weight vs one mention
    val oneFoo = score("foo Bar baz")
    assert(want(2L) === oneFoo + 2L * weights((polyHash("foo") % 64L).toInt))
  }

  test("repetitionStats: duplicate and top bigram fractions") {
    // "a b a b a" → bigrams: (a b), (b a), (a b), (b a): 4 total,
    // 2 distinct, top count 2 → dup 5000bp, top 5000bp.
    // "x y z" → 2 bigrams, both unique → 0bp / 5000bp (top is 1 of 2).
    // "w" → no bigrams → all zeros.
    val docs = Seq((1L, "a b a b a"), (2L, "x y z"), (3L, "w"))
      .toDF("doc_id", "text")
    val got = Text.repetitionStats(docs, $"text", $"doc_id")
      .select($"doc_id", $"n_grams", $"n_distinct_grams", $"top_gram_n",
        $"dup_gram_bp", $"top_gram_bp")
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got === Seq(
      (1L, 4L, 2L, 2L, 5000L, 5000L),
      (2L, 2L, 2L, 1L, 0L, 5000L),
      (3L, 0L, 0L, 0L, 0L, 0L)))
  }

  test("pairStats: adjacent BPE pre-token pair counts") {
    // "ab ab cd" → pre-tokens [ab, ab, cd] → pairs (ab,ab), (ab,cd)
    // "ab, cd"  → pre-tokens [ab, ',', cd] → pairs (ab,','), (',',cd)
    // "x"       → 1 pre-token → no pairs (the size>=2 guard)
    val docs = Seq((1L, "ab ab cd"), (2L, "ab, cd"), (3L, "x"))
      .toDF("doc_id", "text")
    val got = Text.pairStats(docs, $"text")
      .as[(String, String, Long)].collect().toSet
    assert(got === Set(
      ("ab", "ab", 1L), ("ab", "cd", 1L),
      ("ab", ",", 1L), (",", "cd", 1L)))
  }

  test("pairStats: total pair mass equals sum over docs of (tokens - 1)") {
    val docs = Seq((1L, "one two three four"), (2L, "a1 b2"), (3L, "solo"))
      .toDF("doc_id", "text")
    val totalPairs = Text.pairStats(docs, $"text")
      .agg(sum($"n")).as[Long].head()
    // doc1: 4 pre-tokens→3, doc2: [a, 1, b, 2]→3, doc3: 1→0
    assert(totalPairs === 6L)
  }

  test("tfIdf matches the smoothed formula") {
    val got = Seq((3L, 2L, 9L)).toDF("tf", "df", "n")
      .select(Text.tfIdf($"tf", $"df", $"n").as("w"))
      .as[Double].head()
    assert(math.abs(got - 3.0 * math.log(10.0 / 3.0)) < 1e-12)
  }

  private val sfDir = "/root/testdata/sf0.001"

  test("text_collocations matches a driver-side fold of the lift arithmetic") {
    val texts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"text").as[String].collect()
    val tk = texts.map(_.trim.toLowerCase.split("\\s+").toSeq)
    val uni = tk.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bi = tk.flatMap(t => t.zip(t.drop(1)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val t = tk.map(_.size.toLong).sum
    val b = tk.map(x => math.max(x.size - 1, 0).toLong).sum
    val want = bi.toSeq.filter(_._2 >= 20L).map { case ((l, r), cab) =>
      val lift = ((BigInt(10000) * cab * t / uni(l)) * t) / (BigInt(b) * uni(r))
      (s"$l $r", cab, lift.toLong)
    }.sortBy { case (bg, _, lift) => (-lift, bg) }.take(20)
    val got = ExtensionQueries.queries("text_collocations")(spark, sfDir)
      .as[(String, Long, Long)].collect().toSeq
    assert(got === want)
  }

  test("corpus_chunk_dedup matches a driver-side first-occurrence fold") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val chunks = docs.flatMap { case (id, text) =>
      text.trim.toLowerCase.split("\\s+").grouped(16).zipWithIndex
        .map { case (c, pos) => (id, pos.toLong, c.mkString(" ")) }
    }
    val winner = chunks.groupBy(_._3).view
      .mapValues(_.map(c => c._1 * 1048576L + c._2).min).toMap
    val want = chunks.groupBy(_._1).map { case (id, cs) =>
      val kept = cs.count(c => c._1 * 1048576L + c._2 == winner(c._3)).toLong
      (id, cs.size.toLong, kept, cs.size - kept)
    }.toSet
    val got = ExtensionQueries.queries("corpus_chunk_dedup")(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === want)
    // the fixture corpus genuinely contains cross-doc duplicate chunks
    // (otherwise the operator is vacuous on it)
    assert(got.exists(_._4 > 0L))
  }

  test("corpus_importance_resample matches a driver-side DSIR fold") {
    def polyHash(s: String): Long =
      s.foldLeft(0L)((acc, c) => (acc * 31L + c.toLong) % 1000000007L)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"lang", $"text").as[(Long, String, String)].collect()
    val toks = docs.map { case (id, lang, t) =>
      (id, lang, t.trim.toLowerCase.split("\\s+").toSeq.map(w => (polyHash(w) % 64L).toInt))
    }
    val rb = Array.fill(64)(0L); val tb = Array.fill(64)(0L)
    toks.foreach { case (_, lang, bs) =>
      bs.foreach { b => rb(b) += 1; if (lang == "en") tb(b) += 1 }
    }
    val tr = rb.sum; val tt = tb.sum
    val w = (0 until 64).map(b =>
      if (tb(b) > 0 && tt > 0) ((BigInt(1000000) * tb(b) * tr) / (BigInt(rb(b)) * tt)).toLong
      else 0L)
    val want = toks.map { case (id, lang, bs) =>
      val score = bs.map(w).sum / bs.size
      (id, lang, bs.size.toLong, score, score >= 1000000L)
    }.toSet
    val got = ExtensionQueries.queries("corpus_importance_resample")(spark, sfDir)
      .as[(Long, String, Long, Long, Boolean)].collect().toSet
    assert(got === want)
    // non-degenerate on the fixture: scores differ across docs and the
    // keep threshold actually separates (some kept, some dropped)
    assert(got.map(_._4).size > 1)
    assert(got.exists(_._5) && got.exists(!_._5))
  }

  test("corpus_datacard: one row, internally consistent, matches direct recounts") {
    val row = ExtensionQueries.queries("corpus_datacard")(spark, sfDir).collect()
    assert(row.length === 1)
    val r = row.head
    def g(n: String): Long = r.getAs[Long](n)
    assert(g("n_train") + g("n_val") + g("n_test") === g("n_docs"))
    assert(g("n_exact_dups") >= 0L && g("n_exact_dups") < g("n_docs"))
    assert(g("mean_tokens") === g("n_tokens") / g("n_docs"))
    // recount two fields independently of the query's expressions
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"text").as[String].collect()
    assert(g("n_docs") === docs.length.toLong)
    assert(g("n_tokens") ===
      docs.map(_.trim.toLowerCase.split("\\s+").length.toLong).sum)
    assert(g("vocab_size") ===
      docs.flatMap(_.trim.toLowerCase.split("\\s+")).distinct.length.toLong)
  }

  test("text_trigram_backoff matches a driver-side stupid-backoff fold") {
    val P = 1000000007L; val A = 2862933555L % P; val B = 1442695040888963L % P
    def split(id: Long): String = {
      val b = (((id % P + P) % P * A + B) % P) % 10000L
      if (b < 9000) "train" else if (b < 9500) "val" else "test"
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, t) => (id, t.trim.toLowerCase.split("\\s+").toSeq) }
    val train = docs.filter(d => split(d._1) == "train").map(_._2)
    val uni = train.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val big = train.flatMap(t => t.zip(t.drop(1)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tri = train.flatMap(t => t.lazyZip(t.drop(1)).lazyZip(t.drop(2)).toSeq)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tot = train.map(_.size.toLong).sum
    val want = docs.filter(d => split(d._1) != "train").filter(_._2.size >= 3)
      .map { case (id, t) =>
        val cs = t.lazyZip(t.drop(1)).lazyZip(t.drop(2)).toSeq.map { case (a, b2, c) =>
          if (tri.contains((a, b2, c))) 1000000L * tri((a, b2, c)) / big((a, b2))
          else if (big.contains((b2, c))) 400000L * big((b2, c)) / uni(b2)
          else if (uni.contains(c)) 160000L * uni(c) / tot
          else 0L
        }
        (id, cs.size.toLong, cs.sum / cs.size)
      }.toSet
    val got = ExtensionQueries.queries("text_trigram_backoff")(spark, sfDir)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === want)
  }

  private def bpeCount(text: String, merges: Seq[(String, String)]): Long =
    Seq((1L, text)).toDF("doc_id", "text")
      .select(Text.bpeMergedCount(merges).cast("long")).as[Long].head()

  test("bpeMergedCount applies merges hierarchically and in priority order") {
    val m = Seq("s" -> "c", "a" -> "n", "t" -> "a", "b" -> "l",
      "e" -> "r", "sc" -> "an", "ta" -> "bl", "tabl" -> "e")
    assert(bpeCount("scan", m) === 1L)        // s c a n → sc an → scan
    assert(bpeCount("table", m) === 1L)       // t a b l e → ta bl e → tabl e → table
    assert(bpeCount("scanner", m) === 3L)     // scan n er — (e,r) fires before (sc,an)
    assert(bpeCount("scan table", m) === 2L)  // per-pre-token, summed
    assert(bpeCount("xyz", m) === 3L)         // no rule applies → chars
    assert(bpeCount("", m) === 0L)            // empty doc → zero symbols
  }

  test("bpeMergedCount merge sweep is greedy left-to-right (BPE semantics)") {
    val m = Seq("a" -> "a")
    assert(bpeCount("aaaa", m) === 2L) // aa | aa
    assert(bpeCount("aaa", m) === 2L)  // aa | a — leftmost pair merges first
    assert(bpeCount("aaaaa", m) === 3L) // aa | aa | a
  }

  test("bpeMergedCount handles digits and punctuation pre-tokens") {
    val m = Seq("1" -> "2")
    // "ab12, x" → pre-tokens [ab, 12, ',', x] → a b | 12 | , | x
    assert(bpeCount("ab12, x", m) === 2L + 1L + 1L + 1L)
  }
}
