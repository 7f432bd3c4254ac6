package graft.tools

import org.apache.spark.sql.SparkSession

/** Smoke check: read every driver parquet table, print schema + count. */
object SchemaSmoke {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings")) {
      try {
        val df = spark.read.parquet(s"$dir/$t.parquet")
        println(s"== $t (${df.count()} rows): " + df.schema.map(f =>
          s"${f.name}:${f.dataType.simpleString}").mkString(", "))
      } catch {
        case e: Exception =>
          println(s"== $t READ FAILED: ${e.getMessage.linesIterator.next()}")
      }
    }
    spark.stop()
  }
}
