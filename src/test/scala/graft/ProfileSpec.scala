package graft

import graft.operators.Profile

class ProfileSpec extends SparkSpec {

  test("profile counts rows, non-nulls, distincts, and min/max in one pass") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("a")), (2L, Some("b")), (3L, None), (4L, Some("b"))
    ).toDF("id", "s")
    val p = Profile.profile(df, Seq("id", "s"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    assert(p("id") == ((4L, 4L, 4L, "1", "4")))
    assert(p("s") == ((4L, 3L, 2L, "a", "b")))
  }

  test("hostile column names (quotes, dots, backticks) profile safely") {
    import spark.implicits._
    val df = Seq((1L, "x"), (2L, "y"))
      .toDF("user's id", "a.b`c")
    val p = Profile.profile(df, Seq("user's id", "a.b`c"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(p == Map("user's id" -> 2L, "a.b`c" -> 2L))
  }
}
