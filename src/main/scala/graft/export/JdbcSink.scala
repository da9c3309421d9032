package graft.export

import org.apache.spark.sql.{DataFrame, SaveMode}

import graft.ingest.JdbcSource.Conn

/** JDBC bulk write — the engine-native rendering of the reference's
  * COPY-based load (`cur.copy_expert("COPY listings (...) FROM STDIN")`,
  * dag:94-124 / SURVEY.md K-2).
  *
  * The reference's semantics, re-expressed:
  *  - explicit column projection before the write = the COPY column list
  *    (caller selects exactly the data columns; defaults are stamped as
  *    real columns by [[graft.ingest.BatchLoad]], since datasource writes
  *    have no server-side DEFAULT);
  *  - `batchsize` batches inserts per round trip — the JDBC analogue of
  *    COPY's streamed bulk protocol (row-at-a-time INSERT is the
  *    anti-pattern the reference's README warns about);
  *  - idempotency stays delete-then-load: `deleteCurrentBatch` + append,
  *    the literal reference contract (dag:86-89), for targets without
  *    partition overwrite.
  *
  * Executed for real against an in-JVM Apache Derby database in
  * JdbcRoundTripSpec (bulk append + delete-then-reload idempotency);
  * parquet partition-overwrite ([[graft.ingest.BatchLoad]]) is the
  * lake-side rendering of the same contract.
  */
object JdbcSink {

  /** Delete the current batch before re-loading it — the reference's
    * idempotency contract (DELETE WHERE import_date = ds before COPY,
    * airbnb_postgres_to_s3.py:86-89), executed as ONE set-based DELETE
    * on the database side. This is driver-side by design: the work is
    * the DB's, only the statement travels. Returns the deleted count
    * (the reference logs it for reconciliation, O-5). */
  def deleteBatch(conn: Conn, table: String, predicate: String): Int = {
    Class.forName(conn.driver)
    val c = java.sql.DriverManager.getConnection(conn.url, conn.user, conn.password)
    try {
      val st = c.createStatement()
      try st.executeUpdate(s"DELETE FROM $table WHERE $predicate")
      finally st.close()
    } finally c.close()
  }

  /** Append a batch to a table over numPartitions parallel connections. */
  def appendBatch(df: DataFrame, conn: Conn, table: String,
      batchSize: Int = 10000): Unit =
    df.write.format("jdbc")
      .option("url", conn.url)
      .option("user", conn.user)
      .option("password", conn.password)
      .option("driver", conn.driver)
      .option("dbtable", table)
      .option("batchsize", batchSize)
      .option("isolationLevel", "READ_COMMITTED")
      .mode(SaveMode.Append)
      .save()
}
