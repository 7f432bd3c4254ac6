package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SaveMode}

/** C1/C6 + P3/P5/P12: the bulk-copy sink with the reference's physical
  * tuning surface, and the error-tolerant fallback writer.
  */
object JdbcSink {

  /** Sink options mirroring the reference's TableOutput tuning
    * (sqlserver2pgsql.pl:3680–3715): write parallelism (-po, default
    * 8), batched inserts (reWriteBatchedInserts), relaxed durability
    * (synchronous_commit=off via sessionInitStatement), truncate-
    * before-load (C1).
    */
  final case class Spec(
      url: String,
      table: String,
      user: String,
      password: String,
      numPartitions: Int = 8,      // -po (pl:166)
      batchSize: Int = 1000,
      truncate: Boolean = true,    // C1 truncate-then-load
      relaxDurability: Boolean = true, // P5 synchronous_commit=off
      rewriteBatchedInserts: Boolean = true)

  /** `createTableColumnTypes` value from the catalog's converted PG
    * types, so a Spark-created target table carries the CONVERTED DDL
    * (citext, uuid, numeric narrowing) instead of Spark's generic JDBC
    * type mapping. Computed columns are excluded (they are plain
    * converted columns on the target; the formula lives in comments,
    * reference parity pl:1576–1616).
    */
  def createTableColumnTypes(table: graft.catalog.TableDef): String =
    table.cols.sortBy(_.pos)
      .map(c => s"${c.name} ${c.pgType}")
      .mkString(", ")

  /** Sink spec from the conf/CLI surface: target endpoint, -po write
    * parallelism, ignore-errors mode (pl:3680–3727).
    */
  def specFromJob(job: graft.convert.ConfFile.Job, table: String): Spec =
    Spec(
      url = job.postgresUrl.getOrElse(sys.error(
        "postgresql connection not configured (-pd/-ph/...)")),
      table = table,
      user = job.postgres.getOrElse("pu", ""),
      password = job.postgres.getOrElse("pw", ""),
      numPartitions = job.config.parallelismOut)

  def jdbcOptions(spec: Spec): Map[String, String] = {
    val url =
      if (spec.rewriteBatchedInserts && spec.url.startsWith("jdbc:postgresql"))
        spec.url + (if (spec.url.contains("?")) "&" else "?") +
          "reWriteBatchedInserts=true"
      else spec.url
    Map(
      "url" -> url,
      "dbtable" -> spec.table,
      "user" -> spec.user,
      "password" -> spec.password,
      "numPartitions" -> spec.numPartitions.toString,
      "batchsize" -> spec.batchSize.toString,
      "truncate" -> spec.truncate.toString
    ) ++ (if (spec.relaxDurability)
      Map("sessionInitStatement" -> "SET synchronous_commit TO off")
    else Map.empty)
  }

  /** Standard fast path: Spark's batched JDBC insert writer with the
    * tuned options (overwrite+truncate keeps the table definition, like
    * the reference's truncate step).
    */
  def write(df: DataFrame, spec: Spec): Unit = {
    // match the reference's -po connection count exactly: coalesce down
    // (no shuffle) when over, repartition UP when under — a 2-partition
    // DataFrame must still open numPartitions writer connections
    val n = df.rdd.getNumPartitions
    val repartitioned =
      if (n > spec.numPartitions) df.coalesce(spec.numPartitions)
      else if (n < spec.numPartitions) df.repartition(spec.numPartitions)
      else df
    repartitioned.write
      .format("jdbc")
      .options(jdbcOptions(spec))
      .mode(if (spec.truncate) SaveMode.Overwrite else SaveMode.Append)
      .save()
  }

  /** P12 (-ignore_errors): per-row fallback writer. The reference
    * disables batching entirely in this mode ("much slower",
    * pl:1031–1035); here each partition still batches optimistically
    * and only degrades to row-at-a-time REPLAY of the failed batch,
    * counting rejects instead of failing the job.
    *
    * `execute` abstracts the actual row insert so the retry logic is
    * testable without a database; production passes a JDBC batch
    * executor.
    */
  def writeIgnoringErrors[T](rows: Iterator[T], batchSize: Int)(
      executeBatch: Seq[T] => Unit)(executeOne: T => Unit): Long = {
    var rejected = 0L
    rows.grouped(batchSize).foreach { batch =>
      try executeBatch(batch)
      catch {
        case _: Exception =>
          batch.foreach { row =>
            try executeOne(row)
            catch { case _: Exception => rejected += 1 }
          }
      }
    }
    rejected
  }

  /** Distributed error-tolerant apply: runs the fallback writer on
    * every partition against a JDBC target, returns total rejects.
    */
  def writeJdbcIgnoringErrors(df: DataFrame, spec: Spec,
      insertSql: String): Long = {
    val schema = df.schema
    df.rdd.mapPartitions { rows =>
      val conn = java.sql.DriverManager.getConnection(
        spec.url, spec.user, spec.password)
      conn.setAutoCommit(false)
      val ps = conn.prepareStatement(insertSql)
      def bind(r: Row): Unit =
        schema.indices.foreach(i => ps.setObject(i + 1, r.get(i)))
      val rejected =
        try writeIgnoringErrors(rows, spec.batchSize) { batch =>
          try {
            batch.foreach { r => bind(r); ps.addBatch() }
            ps.executeBatch(); conn.commit()
          } catch { case e: Throwable =>
            // a failed batch may have partially applied: wipe both the
            // statement queue and the uncommitted rows, else the row
            // replay double-inserts what the batch already wrote
            ps.clearBatch(); conn.rollback(); throw e
          }
        } { r =>
          try { bind(r); ps.executeUpdate(); conn.commit() }
          catch { case e: Throwable => conn.rollback(); throw e }
        }
        finally { ps.close(); conn.close() }
      Iterator.single(rejected)
    }.sum().toLong
  }
}
