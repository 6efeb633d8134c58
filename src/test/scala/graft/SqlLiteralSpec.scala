package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SqlLiteral._
import graft.IngestMain

class SqlLiteralSpec extends AnyFunSuite {

  test("toSqlLiteral: typed rendering (FB:659–689)") {
    assert(toSqlLiteral(null) === "NULL")
    assert(toSqlLiteral(42) === "42")
    assert(toSqlLiteral(42L) === "42")
    assert(toSqlLiteral(3.5) === "3.5")
    assert(toSqlLiteral(new java.math.BigDecimal("12.340")) === "12.340")
    assert(toSqlLiteral(java.sql.Date.valueOf("2024-02-29")) === "DATE '2024-02-29'")
    assert(toSqlLiteral(java.sql.Time.valueOf("12:34:56")) === "TIME '12:34:56'")
    assert(toSqlLiteral(Timestamp.valueOf("2024-02-29 12:34:56.789"))
      === "TIMESTAMP '2024-02-29 12:34:56.789'")
    // ms formatting is fixed 3-digit (FB:681)
    assert(toSqlLiteral(Timestamp.valueOf("2024-02-29 12:34:56"))
      === "TIMESTAMP '2024-02-29 12:34:56.000'")
    assert(toSqlLiteral("it's") === "'it''s'")
    assert(toSqlLiteral(true) === "TRUE")
  }

  test("identifier escaping: engine backticks, source double-quotes") {
    assert(escapeEngineIdentifier("tbl") === "`tbl`")
    assert(escapeEngineIdentifier("we`ird") === "`we``ird`")
    assert(escapeSourceIdentifier("TBL") === "\"TBL\"")
    assert(escapeSourceIdentifier("we\"ird") === "\"we\"\"ird\"")
  }

  test("getArg: positional --key value scan with defaults (FB:1729–1736)") {
    val args = Array("--tables", "a,b", "--mode", "replace")
    assert(IngestMain.getArg(args, "tables") === "a,b")
    assert(IngestMain.getArg(args, "mode") === "replace")
    assert(IngestMain.getArg(args, "missing", "dflt") === "dflt")
    assert(IngestMain.getArg(Array("--flag"), "flag") === null) // dangling key
  }

  test("parseOverrides: table=col list") {
    assert(IngestMain.parseOverrides("a=x,b=y") === Map("a" -> "x", "b" -> "y"))
    assert(IngestMain.parseOverrides("") === Map.empty)
    intercept[IllegalArgumentException](IngestMain.parseOverrides("bad"))
  }
}
