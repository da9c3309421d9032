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
  * Not exercised by the harness (zero-egress, no live DB); parquet
  * partition-overwrite ([[graft.ingest.BatchLoad]]) is the verified
  * lake-side rendering of the same contract.
  */
object JdbcSink {

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
