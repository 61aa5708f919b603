package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mechanical sweep of every DuckDB oracle for raw (un-normalized) use
  * of the events fixture's `ts` column — the same move
  * OutputTypeContractSpec made for the output-type contract, prompted
  * by the r16 verdict's "make the CAST(ts) sweep mechanical".
  *
  * Why: `events.parquet` carries TIMESTAMP(NANOS). The Spark side
  * always reads it through [[Tables.events]] (nanos → µs), but DuckDB
  * reads the raw file as TIMESTAMP_NS — so an oracle that compares,
  * windows, or emits `ts` without `CAST(ts AS TIMESTAMP)` silently
  * depends on the FIXTURE VINTAGE: with any sub-µs digits present, a
  * window `ORDER BY ts, tiebreak` resolves same-µs pairs by
  * nanoseconds on the DuckDB side while Spark falls through to the
  * tiebreak — the exact class of split that made `events_error_label`
  * a red row in r15.
  *
  * The rule (a tripwire, not a SQL parser): for every oracle that
  * reads the `events` table, after stripping all normalized forms
  * (`CAST(ts AS TIMESTAMP)` / `CAST(ts AS DATE)`), any remaining bare
  * `ts` token is a violation UNLESS the query re-introduces `ts` as
  * its own alias (`... AS ts`) — in which case the bare references
  * resolve to that alias, and a companion assertion checks every such
  * alias definition is itself a normalized expression (contains CAST
  * or TIMESTAMP in the defining fragment). Qualified refs like `e.ts`
  * are treated as alias-scoped (every current oracle that qualifies
  * ts does so against a normalized CTE); the alias-definition
  * assertion is what keeps that exemption honest.
  */
class OracleTsContractSpec extends AnyFunSuite {

  private val readsEvents = "(?i)\\b(FROM|JOIN)\\s+events\\b".r
  private val normalized = "(?i)CAST\\s*\\(\\s*ts\\s+AS\\s+(TIMESTAMP|DATE)\\s*\\)".r
  private val bareTs = "(?<![\\w.])ts(?![\\w])".r
  private val asTs = "(?i)\\bAS\\s+ts\\b".r
  // up to 60 chars of the expression that defines an `AS ts` alias
  private val aliasDef = "(?i)([^,\\n(]{0,60})\\bAS\\s+ts\\b".r

  private lazy val eventsOracles: Map[String, String] =
    SparkEntry.oracleSql.filter { case (_, sql) =>
      readsEvents.findFirstIn(sql).isDefined
    }

  test("every events oracle normalizes ts (no raw TIMESTAMP_NS reaches a comparison or window)") {
    assert(eventsOracles.nonEmpty, "sweep must actually cover the events family")
    val violations = eventsOracles.toSeq.sortBy(_._1).flatMap { case (name, sql) =>
      val stripped = normalized.replaceAllIn(sql, "")
      val defs = asTs.findAllIn(stripped).size
      val bares = bareTs.findAllIn(stripped).size
      // `bares` counts the `ts` inside each `AS ts` definition too —
      // only refs BEYOND the definitions need the alias exemption
      if (bares > defs && defs == 0) Some(s"$name: $bares raw `ts` reference(s), no normalization")
      else None
    }
    assert(violations.isEmpty, violations.mkString("\n"))
  }

  test("every `AS ts` alias in an events oracle is itself a normalized expression") {
    val suspicious = eventsOracles.toSeq.sortBy(_._1).flatMap { case (name, sql) =>
      aliasDef.findAllMatchIn(sql).flatMap { m =>
        val frag = m.group(0)
        val up = frag.toUpperCase
        if (up.contains("CAST") || up.contains("TIMESTAMP")) None
        else Some(s"$name: un-normalized alias definition `${frag.trim}`")
      }
    }
    assert(suspicious.isEmpty, suspicious.mkString("\n"))
  }
}
