package graft

import org.scalatest.funsuite.AnyFunSuite

class JsonSpec extends AnyFunSuite {

  test("num is locale-proof fixed-point") {
    val prev = java.util.Locale.getDefault
    try {
      // a comma-decimal locale must not leak commas into JSON
      java.util.Locale.setDefault(java.util.Locale.GERMANY)
      assert(util.Json.num(1234.56789) === "1234.5679")
      assert(util.Json.num(0.1, 2) === "0.10")
    } finally java.util.Locale.setDefault(prev)
  }

  test("num renders non-finite doubles as null, not bare NaN/Infinity") {
    assert(util.Json.num(Double.NaN) === "null")
    assert(util.Json.num(Double.PositiveInfinity) === "null")
    assert(util.Json.num(Double.NegativeInfinity) === "null")
  }

  test("str escapes quotes, backslashes, and every control char") {
    assert(util.Json.str("a\"b\\c\nd\te\rf") === "\"a\\\"b\\\\c\\nd\\te\\rf\"")
    assert(util.Json.str("x" + 1.toChar + "y") === "\"x\\u0001y\"")
    // round-trip through a real JSON parser-equivalent check: the output must
    // contain no raw control characters
    val s = util.Json.str((0 until 32).map(_.toChar).mkString)
    assert(!s.exists(c => c < ' '))
  }
}
