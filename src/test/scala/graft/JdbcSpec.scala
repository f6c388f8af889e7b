package graft

import graft.config.{DatasetConfig, SourceConfig}
import graft.pipeline.IngestionPipeline
import graft.sources.{Jdbc, JdbcHarness, SecretResolver}

import java.nio.file.Files
import java.sql.DriverManager

/** JDBC extraction path — the reference's actual job (SqlServerDataSource.cs /
  * OracleDataSource.cs semantics) against an embedded Derby database. */
class JdbcSpec extends SparkSpec {

  // ---- parameter rendering / substitution ----------------------------------

  test("renderLiteral: typed literals with string escaping") {
    assert(Jdbc.renderLiteral("O'Brien") == "'O''Brien'")
    assert(Jdbc.renderLiteral(42L) == "42")
    assert(Jdbc.renderLiteral(3.5) == "3.5")
    assert(Jdbc.renderLiteral(true) == "TRUE")
    assert(Jdbc.renderLiteral(null) == "NULL")
    assert(Jdbc.renderLiteral(java.sql.Date.valueOf("1996-01-01")) == "DATE '1996-01-01'")
  }

  test("substituteParams: @Name and :Name, longest-first, word boundaries") {
    val sql = "SELECT * FROM t WHERE a = @Start AND b = @StartDate AND c = :Start"
    val out = Jdbc.substituteParams(sql,
      Map("Start" -> 1L, "StartDate" -> "1996-01-01"))
    assert(out == "SELECT * FROM t WHERE a = 1 AND b = '1996-01-01' AND c = 1")
  }

  test("prefix sniff: statement text vs procedure name (SqlServerDataSource.cs:78-91)") {
    // every statement-keyword class routes as text...
    assert(Jdbc.isStatementText("SELECT 1"))
    assert(Jdbc.isStatementText("  with cte as (select 1) select * from cte"))
    assert(Jdbc.isStatementText("EXEC sp_thing"))
    assert(Jdbc.isStatementText("exec dbo.sp_thing @p = 1"))
    assert(Jdbc.isStatementText("INSERT INTO t VALUES (1)"))
    assert(Jdbc.isStatementText("update t set a = 1"))
    assert(Jdbc.isStatementText("Delete From t Where a = 1"))
    // ...tolerating any leading whitespace (spaces, tabs, newlines, CRLF)
    assert(Jdbc.isStatementText("\n\t  SELECT 1"))
    assert(Jdbc.isStatementText("\r\n  WITH x AS (SELECT 1) SELECT * FROM x"))
    // bare names route as procedures
    assert(!Jdbc.isStatementText("dbo.sp_GetDailyTrades"))
    assert(!Jdbc.isStatementText("HR_PKG.GET_EMPLOYEE_DATA"))
    // the keyword must be the whole first token, not a prefix of it
    assert(!Jdbc.isStatementText("SELECTED_ROWS_PROC"))
    assert(!Jdbc.isStatementText("UPDATER"))
    // reference contract: the sniff does NOT strip SQL comments — text led by
    // a comment is treated as a procedure name (and fails at call time), same
    // as the reference's raw StartsWith check. Pinned so a future "helpful"
    // comment-stripper shows up as a contract change.
    assert(!Jdbc.isStatementText("-- daily extract\nSELECT 1"))
    assert(!Jdbc.isStatementText("/* hint */ SELECT 1"))
  }

  test("extract routes every statement-keyword prefix through the text path") {
    val url = JdbcHarness.ensureCustomer(spark, sf0001)
    // leading whitespace/newlines before the keyword still route as text
    val df = Jdbc.extract(spark,
      SourceConfig(`type` = "Jdbc", extractionType = "StoredProcedure",
        procedureName = "\n  SELECT \"c_custkey\" FROM customer"), url)
    assert(df.count() > 0)
    // non-SELECT statement keywords also take the text path: the failure they
    // produce is Spark's query-wrapping SQL error, never a missing-procedure
    // error from the callable path (Derby's would name the procedure).
    val e = intercept[Exception] {
      Jdbc.extract(spark,
        SourceConfig(`type` = "Jdbc", extractionType = "StoredProcedure",
          procedureName = "UPDATE customer SET \"c_name\" = 'x'"), url)
        .count()
    }
    val msg = e.toString + Option(e.getCause).map(_.toString).getOrElse("")
    assert(!msg.toUpperCase.contains("PROCEDURE"), msg)
  }

  // ---- embedded-Derby integration ------------------------------------------

  test("readQuery extracts the harness table with a bound parameter") {
    val url = JdbcHarness.ensureCustomer(spark, sf0001)
    val df = Jdbc.readQuery(spark, url,
      """SELECT "c_custkey", "c_name", "c_acctbal" FROM customer
        |WHERE "c_acctbal" >= :MinBal""".stripMargin,
      Map("MinBal" -> 1000L))
    val expected = spark.read.parquet(s"$sf0001/customer.parquet")
      .filter("c_acctbal >= 1000")
    assert(df.count() == expected.count())
    assert(df.columns.toSeq == Seq("c_custkey", "c_name", "c_acctbal"))
    // values round-trip exactly (keys + balances)
    val viaJdbc = df.select("c_custkey", "c_acctbal").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    val viaLake = expected.select("c_custkey", "c_acctbal").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(viaJdbc == viaLake)
  }

  test("type-mapping contract: decimal scale, char padding, date/timestamp, null") {
    // The dialect edges a live SQL Server / Oracle would stress — as far as
    // an embedded ANSI engine can express them (H2's compatibility modes are
    // not resolvable offline; Derby is the in-container ceiling): DECIMAL
    // precision/scale must survive into Spark's DecimalType exactly (the
    // Oracle NUMBER(p,s) mapping), CHAR(n) comes back padded (extraction is
    // pass-through, no silent trim), and DATE/TIMESTAMP/NULL round-trip.
    val url = JdbcHarness.derbyUrl("graft_typemap")
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute("DROP TABLE typemap") catch { case _: java.sql.SQLException => }
      st.execute(
        """CREATE TABLE typemap (
          |  id BIGINT NOT NULL,
          |  amt DECIMAL(31,8),
          |  tag CHAR(6),
          |  d DATE,
          |  ts TIMESTAMP,
          |  note VARCHAR(20))""".stripMargin)
      st.execute("INSERT INTO typemap VALUES " +
        "(1, 12345678901234567890123.45678901, 'ab', " +
        "DATE('1995-03-15'), TIMESTAMP('1995-03-15 12:34:56.789'), ''), " +
        "(2, 0.00000001, 'padded', NULL, NULL, NULL)")
      st.close()
    } finally conn.close()

    val df = Jdbc.readQuery(spark, url,
      "SELECT id, amt, tag, d, ts, note FROM typemap", Map.empty)
    val sch = df.schema
    assert(sch("AMT").dataType ==
      org.apache.spark.sql.types.DecimalType(31, 8)) // scale survives exactly
    assert(sch("D").dataType == org.apache.spark.sql.types.DateType)
    assert(sch("TS").dataType == org.apache.spark.sql.types.TimestampType)
    val rows = df.orderBy("ID").collect()
    assert(rows(0).getDecimal(1).toPlainString == "12345678901234567890123.45678901")
    assert(rows(1).getDecimal(1).toPlainString == "0.00000001")
    assert(rows(0).getString(2) == "ab    ") // CHAR(6) pad preserved
    assert(rows(0).getDate(3).toString == "1995-03-15")
    assert(rows(0).getTimestamp(4).toString == "1995-03-15 12:34:56.789")
    assert(rows(0).getString(5) == "") // empty string stays empty, not NULL
    assert(rows(1).isNullAt(3) && rows(1).isNullAt(4) && rows(1).isNullAt(5))
  }

  test("ANSI paging idiom (OFFSET/FETCH) flows through the statement path") {
    val url = JdbcHarness.ensureCustomer(spark, sf0001)
    // the portable form of SQL Server TOP / Oracle ROWNUM paging — the shape
    // the reference builds for chunked extraction
    val q = """SELECT "c_custkey" FROM customer ORDER BY "c_custkey"
              |OFFSET 5 ROWS FETCH FIRST 3 ROWS ONLY""".stripMargin
    assert(Jdbc.isStatementText(q))
    val keys = Jdbc.readQuery(spark, url, q, Map.empty)
      .collect().map(_.getLong(0)).toSeq
    val all = spark.read.parquet(s"$sf0001/customer.parquet")
      .select("c_custkey").orderBy("c_custkey")
      .collect().map(_.getLong(0)).toSeq
    assert(keys == all.slice(5, 8))
  }

  test("readTablePartitioned splits the read into range partitions with identical rows") {
    val url = JdbcHarness.ensureCustomer(spark, sf0001)
    val single = Jdbc.readQuery(spark, url,
      """SELECT "c_custkey", "c_acctbal" FROM customer""")
    val parts = Jdbc.readTablePartitioned(spark, url, "customer",
      "\"c_custkey\"", lowerBound = 1L, upperBound = 150L, numPartitions = 4)
      .select("c_custkey", "c_acctbal")
    assert(parts.rdd.getNumPartitions == 4)
    val a = single.collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val b = parts.collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(a == b && a.nonEmpty)
    // loose bounds must not filter: rows outside them land in edge partitions
    val loose = Jdbc.readTablePartitioned(spark, url, "customer",
      "\"c_custkey\"", lowerBound = 40L, upperBound = 60L, numPartitions = 3)
    assert(loose.count() == single.count())
  }

  test("readCallable drains a stored procedure's result set (driver-side DataTable contract)") {
    val url = JdbcHarness.ensureCustomer(spark, sf0001)
    val df = Jdbc.readCallable(spark, url, "TOP_CUSTOMERS", Map("minBal" -> 1000.0))
    val expected = spark.read.parquet(s"$sf0001/customer.parquet")
      .filter("c_acctbal >= 1000").count()
    assert(df.count() == expected)
    assert(df.columns.toSeq == Seq("c_custkey", "c_name", "c_acctbal"))
  }

  test("extract dispatches StoredProcedure through the sniff and the callable path") {
    val url = JdbcHarness.ensureCustomer(spark, sf0001)
    // a "procedure" that is really SQL text runs as text
    val asText = Jdbc.extract(spark,
      SourceConfig(`type` = "Jdbc", extractionType = "StoredProcedure",
        procedureName = """SELECT "c_custkey" FROM customer"""), url)
    // a real procedure name goes through CallableStatement
    val asProc = Jdbc.extract(spark,
      SourceConfig(`type` = "Jdbc", extractionType = "StoredProcedure",
        procedureName = "TOP_CUSTOMERS", parameters = Map("minBal" -> 0.0)), url)
    assert(asText.count() > 0)
    assert(asProc.count() > 0)
  }

  test("full pipeline over a JDBC source with vault-resolved connection string") {
    // stage a standalone Derby db the pipeline will extract from
    val url = "jdbc:derby:memory:pipetest;create=true"
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try {
        try st.execute("DROP TABLE trades") catch { case _: java.sql.SQLException => () }
        st.execute("CREATE TABLE trades (trade_id BIGINT, symbol VARCHAR(10), qty DOUBLE)")
        st.execute("INSERT INTO trades VALUES (1, 'AAPL', 10.5), (2, 'MSFT', 3.0), (3, 'AAPL', 7.25)")
      } finally st.close()
    } finally conn.close()

    val cfg = DatasetConfig(
      datasetId = "jdbc-trades",
      source = SourceConfig(`type` = "Jdbc", extractionType = "Query",
        connectionStringKey = "TradesDb",
        sqlText = "SELECT TRADE_ID, SYMBOL, QTY FROM trades WHERE symbol = @Symbol",
        parameters = Map("Symbol" -> "AAPL")))
    val dest = graft.util.Scratch.dir("graft-jdbc-pipe").toString
    val ctx = IngestionPipeline.run(spark, cfg, sf0001, dest,
      connectionStrings = Map("TradesDb" -> "jdbc:derby:memory:{vault:DB_NAME};create=true"),
      secrets = SecretResolver.FromMap(Map("DB_NAME" -> "pipetest")))
    assert(ctx.errors.isEmpty, ctx.errors.mkString("; "))
    assert(ctx.rowCount.contains(2L))
    val written = spark.read.parquet(new java.io.File(dest, ctx.dataFileName.get).toString)
    assert(written.select("SYMBOL").distinct().collect().map(_.getString(0)).toSeq == Seq("AAPL"))
  }

  test("missing connection-string key fails the extraction stage critically") {
    val cfg = DatasetConfig(
      datasetId = "jdbc-nokey",
      source = SourceConfig(`type` = "SqlServer", extractionType = "Query",
        connectionStringKey = "Nope", sqlText = "SELECT 1"))
    val dest = graft.util.Scratch.dir("graft-jdbc-nokey").toString
    val ctx = IngestionPipeline.run(spark, cfg, sf0001, dest)
    assert(ctx.failed)
    assert(ctx.errors.exists(_.message.contains("Nope")))
  }
}
