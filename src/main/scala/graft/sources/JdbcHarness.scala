package graft.sources

import org.apache.spark.sql.SparkSession

import java.sql.{DriverManager, ResultSet, SQLException}

/** Embedded-Derby stand-in for the reference's live SQL Server / Oracle — the
  * integration seam that lets the JDBC extraction path run, and be
  * oracle-checked, inside this container (Derby ships with Spark's jars; there
  * is no network egress to a real RDBMS here).
  *
  * [[ensureCustomer]] loads the lake's `customer` table into an in-memory Derby
  * database through Spark's own JDBC writer, and registers a stored procedure
  * over it — so a correctness query can round-trip lake → RDBMS → JDBC
  * extraction and be compared against the DuckDB oracle on the original
  * parquet. Idempotent per (JVM, sf dir); Bench runs each query twice and
  * reuses the load.
  *
  * Identifier case: Spark's Derby dialect writes delimited (quoted) column and
  * table names, so they keep their exact lowercase form; queries against the
  * harness database must quote identifiers the same way.
  */
object JdbcHarness {
  private val lock = new Object
  private val loaded = scala.collection.mutable.Set[String]()

  def derbyUrl(db: String): String = s"jdbc:derby:memory:$db;create=true"

  /** Stored procedure over the harness table: the Derby analogue of the
    * reference's `dbo.sp_GetDailyTrades` contract (one IN param, one result
    * set — `README.md:942-971`). */
  val TopCustomersProcDdl: String =
    """CREATE PROCEDURE TOP_CUSTOMERS(IN minBal DOUBLE)
      |PARAMETER STYLE JAVA LANGUAGE JAVA READS SQL DATA DYNAMIC RESULT SETS 1
      |EXTERNAL NAME 'graft.sources.DerbyProcs.topCustomers'""".stripMargin

  /** Load `customer` (keys, name, balance) into in-memory Derby once per
    * JVM + sf dir; returns the JDBC URL. */
  def ensureCustomer(spark: SparkSession, sfDir: String): String = lock.synchronized {
    val url = derbyUrl("graft_" + java.lang.Integer.toHexString(sfDir.hashCode))
    if (!loaded.contains(url)) {
      Lake.table(spark, sfDir, "customer")
        .select("c_custkey", "c_name", "c_acctbal")
        .write.format("jdbc")
        .option("url", url)
        .option("dbtable", "customer")
        .mode("overwrite")
        .save()
      val conn = DriverManager.getConnection(url)
      try {
        val st = conn.createStatement()
        try st.execute(TopCustomersProcDdl)
        catch { case e: SQLException if e.getSQLState == "X0Y68" => () /* exists */ }
        finally st.close()
      } finally conn.close()
      loaded += url
    }
    url
  }
}

/** Java-procedure bodies for the Derby harness. Scala object methods compile to
  * static forwarders, which is exactly what Derby's `EXTERNAL NAME` dispatch
  * needs. The nested `jdbc:default:connection` URL is Derby's server-side
  * connection to the calling session. */
object DerbyProcs {
  def topCustomers(minBal: Double, rs: Array[ResultSet]): Unit = {
    val conn = DriverManager.getConnection("jdbc:default:connection")
    val ps = conn.prepareStatement(
      """SELECT "c_custkey", "c_name", "c_acctbal" FROM customer
        |WHERE "c_acctbal" >= ? ORDER BY "c_custkey"""".stripMargin)
    ps.setDouble(1, minBal)
    rs(0) = ps.executeQuery()
  }
}
