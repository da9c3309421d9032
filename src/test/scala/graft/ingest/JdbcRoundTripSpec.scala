package graft.ingest

import org.apache.spark.sql.functions._

import graft.{GraftTestBase, Tables}
import graft.export.JdbcSink
import graft.ingest.JdbcSource.Conn

/** EXECUTES the JDBC path for real — not just type-checks it. The
  * harness has no live Postgres, but Spark ships Apache Derby on the
  * same unmanaged classpath, so an in-JVM in-memory database stands in
  * as an actual JDBC endpoint: the reference's arbitrary-SQL scan
  * (postgres_to_s3_operator.py:40-44, SURVEY.md S-3) and bulk load +
  * delete-then-reload idempotency (airbnb_postgres_to_s3.py:86-124,
  * K-2/O-3) round-trip through real connections, real DDL, real
  * pushdown.
  *
  * The table is pre-created with VARCHAR columns via plain JDBC —
  * schema owned by the database, exactly as the reference's Postgres
  * DDL owns its schema (Spark's Derby dialect would otherwise map
  * StringType to CLOB, which Derby cannot compare in a WHERE). */
class JdbcRoundTripSpec extends GraftTestBase {

  System.setProperty("derby.system.home", "/tmp/derby")
  private val conn = Conn(
    url = "jdbc:derby:memory:graftjdbc;create=true",
    user = "app", password = "",
    driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver")

  private def exec(sql: String): Unit = {
    val c = java.sql.DriverManager.getConnection(conn.url, conn.user, conn.password)
    try { val st = c.createStatement(); try st.execute(sql) finally st.close() }
    finally c.close()
  }

  private lazy val nationDf = Tables.nation(spark, sf)
    .select(col("n_nationkey").cast("long"), col("n_name"),
      col("n_regionkey").cast("long"))

  behavior of "the JDBC source/sink against a live in-JVM database"

  it should "bulk-load a DataFrame and read it back via whole-query pushdown" in {
    exec("""CREATE TABLE nation_t (
      n_nationkey BIGINT, n_name VARCHAR(64), n_regionkey BIGINT)""")
    JdbcSink.appendBatch(nationDf, conn, "nation_t", batchSize = 10)

    val back = JdbcSource.readQuery(spark, conn,
      "SELECT n_nationkey, n_name, n_regionkey FROM nation_t WHERE n_regionkey = 1")
    val expected = nationDf.filter(col("n_regionkey") === 1)
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    val got = back.collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    got shouldBe expected
    // the WHERE ran in the database: the scan's own output is already
    // filtered, no Spark-side Filter node needed above it
    back.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FilterExec => f
    } shouldBe empty
  }

  it should "shard a partitioned table read across parallel connections" in {
    val sharded = JdbcSource.readTablePartitioned(spark, conn, "nation_t",
      partitionColumn = "n_nationkey", lowerBound = 0, upperBound = 25,
      numPartitions = 4)
    sharded.rdd.getNumPartitions shouldBe 4
    sharded.count() shouldBe 25
  }

  it should "push a DataFrame filter down into the generated JDBC WHERE" in {
    val filtered = JdbcSource.readTablePartitioned(spark, conn, "nation_t",
        partitionColumn = "n_nationkey", lowerBound = 0, upperBound = 25,
        numPartitions = 2)
      .filter(col("n_regionkey") === 1)
    val plan = filtered.queryExecution.executedPlan.toString
    plan should include("PushedFilters")
    plan.toUpperCase should include("N_REGIONKEY")
    filtered.count() shouldBe nationDf.filter(col("n_regionkey") === 1).count()
  }

  it should "make delete-then-reload idempotent (the reference's re-run contract)" in {
    val region1 = nationDf.filter(col("n_regionkey") === 1)
    val n1 = region1.count()
    // re-running the same batch: delete current batch, append again —
    // twice; the count must be stable (dag:86-89 semantics)
    (1 to 2).foreach { _ =>
      val deleted = JdbcSink.deleteBatch(conn, "nation_t", "n_regionkey = 1")
      deleted shouldBe n1
      JdbcSink.appendBatch(region1, conn, "nation_t", batchSize = 10)
    }
    JdbcSource.readQuery(spark, conn,
      "SELECT CAST(count(*) AS BIGINT) AS n FROM nation_t")
      .collect().head.getLong(0) shouldBe 25
  }
}
