package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** SQL-surface registration (SparkSessionExtensions) + the bucketed
  * shuffle-elimination property the 100 TB story rests on.
  */
class GraftExtensionsSpec extends AnyFunSuite
    with org.scalatest.BeforeAndAfterAll {

  // Extensions apply at session CREATION, and getOrCreate() returns any
  // active session unchanged — so clear the shared test session first
  // and build a genuinely new one (same JVM/context is fine).
  private lazy val spark: SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[4]")
      .appName("graft-ext-test")
      // withExtensions (not the static conf): the static conf is read
      // from the SparkContext, which the shared test suite already
      // created without it
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  override def afterAll(): Unit = {
    // hand the shared session back to the other suites
    SparkSession.setDefaultSession(SparkTestBase.session)
    SparkSession.setActiveSession(SparkTestBase.session)
    super.afterAll()
  }

  test("vec_dot / sign_bits / portable hashes callable from SQL") {
    val r = spark.sql(
      """SELECT
        |  vec_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d,
        |  length(sign_bits(array(1.0D, 2.0D, 3.0D), 8, 3)) AS nbits,
        |  size(portable_minhash(array('a b c', 'b c d'), 16)) AS nsig,
        |  portable_simhash(array('hello', 'world')) AS sh
        |""".stripMargin).collect()(0)
    assert(r.getDouble(0) === 32.0)
    assert(r.getInt(1) === 8)
    assert(r.getInt(2) === 16)
    assert(r.getLong(3) >= 0L && r.getLong(3) < (1L << 60))
  }

  test("word_ngrams / wordpiece_tokenize callable from SQL") {
    val r = spark.sql(
      """SELECT
        |  word_ngrams('The quick brown fox', 3) AS g,
        |  wordpiece_tokenize('running', 'runn,run,##ing,##ning') AS p,
        |  wordpiece_tokenize('zzz', 'runn,##ing') AS u
        |""".stripMargin).collect()(0)
    assert(r.getSeq[String](0) ===
      Seq("the quick brown", "quick brown fox"))
    assert(r.getSeq[String](1) === Seq("runn", "##ing"))
    assert(r.getSeq[String](2) === Seq("[UNK]"))
  }

  test("round-12 kernels callable from SQL: entropy, jaro, grams, tokenizer encoders") {
    val r = spark.sql(
      """SELECT
        |  char_entropy('aabb').entropy_nanos AS e,
        |  jaro_winkler('martha', 'marhta') AS jw,
        |  char_grams_pos('abcd', 3) AS g,
        |  bpe_segment_word('abab', 'a b,ab ab') AS bp,
        |  unigram_segment_word('abc', 'ab:-3,a:-4,b:-6,c:-5') AS us
        |""".stripMargin).collect()(0)
    assert(r.getLong(0) === 1000000000L) // 2 symbols × p=.5 → 1 bit
    assert(math.abs(r.getDouble(1) - 0.9611111111) < 1e-9) // classic fixture
    val grams = r.getSeq[org.apache.spark.sql.Row](2)
    assert(grams.map(g => (g.getInt(0), g.getString(1))) ===
      Seq((1, "abc"), (2, "bcd")))
    assert(r.getSeq[String](3) === Seq("abab"))
    assert(r.getSeq[String](4) === Seq("ab", "c"))
  }

  test("zorder_value callable from SQL, equals the Column API") {
    val r = spark.sql(
      "SELECT zorder_value(10, 3L, 5L) AS z, zorder_value(2, 3L, 3L, 3L) AS z3")
      .collect()(0)
    assert(r.getLong(0) === 39L) // x bits→even, y bits→odd: 1+4 + 2+32
    assert(r.getLong(1) === 63L) // three cols × 2 bits, all ones
    val viaApi = spark.range(1).select(graft.operators.Layout.zValue(
      Seq(org.apache.spark.sql.functions.lit(3L),
        org.apache.spark.sql.functions.lit(5L)), 10)).collect()(0).getLong(0)
    assert(r.getLong(0) === viaApi)
  }

  test("SQL portable_simhash equals the Dataset-API kernel") {
    import spark.implicits._
    val df = Seq("the quick brown fox").toDF("text")
    df.createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      "SELECT portable_simhash(split(trim(lower(text)), '\\\\s+')) FROM ext_docs")
      .collect()(0).getLong(0)
    val viaApi = graft.functions.Dedup.simhashGroups(
      df.withColumn("id", org.apache.spark.sql.functions.lit(1L)),
      "id", "text", portable = true).collect()(0).getLong(0)
    assert(viaSql === viaApi)
  }

  test("bucketed PK tables diff WITHOUT a shuffle (C13/C14 at scale)") {
    import spark.implicits._
    val src = (1L to 1000L).map(i => (i, i * 2.0)).toDF("id", "v")
    val tgt = (1L to 900L).map(i => (i, if (i % 7 == 0) 0.0 else i * 2.0))
      .toDF("id", "v")
    spark.sql("DROP TABLE IF EXISTS diff_src_b")
    spark.sql("DROP TABLE IF EXISTS diff_tgt_b")
    src.write.mode("overwrite").bucketBy(8, "id").sortBy("id")
      .saveAsTable("diff_src_b")
    tgt.write.mode("overwrite").bucketBy(8, "id").sortBy("id")
      .saveAsTable("diff_tgt_b")
    val diffed = graft.operators.DiffSync.diff(
      spark.table("diff_src_b"), spark.table("diff_tgt_b"), Seq("id"))
    val plan = diffed.queryExecution.executedPlan.toString
    // the join must consume bucket layout directly: no Exchange at all
    assert(!plan.contains("Exchange"),
      s"bucketed diff still shuffles:\n$plan")
    val byState = diffed.groupBy(graft.operators.DiffSync.FlagCol).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byState("new") === 100)      // 901-1000 absent from target
    assert(byState("changed") === 128)  // multiples of 7 up to 900
    assert(byState.getOrElse("deleted", 0L) === 0)
    assert(byState("identical") === 772)
  }
}
