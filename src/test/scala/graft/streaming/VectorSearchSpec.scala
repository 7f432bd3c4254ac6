package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.functions.Similarity
import java.nio.file.Files

/** VectorSearch = the one-call probe-path composition. The gates
  * (`sim_ivf_probe_read` / `sim_ann_graph_probe`) pin head-search
  * correctness against the brute-force oracle tri-SF; this spec pins
  * the two things gates can't: bit-equality with the full-store-read
  * kernels on BOTH search families, and the pinned `version` path (a
  * search against a retained version returns exactly what that
  * version published, across a store rewrite).
  */
class VectorSearchSpec extends AnyFunSuite with SparkTestBase {

  private def withDir(f: java.io.File => Unit): Unit = {
    val d = Files.createTempDirectory("graft_vsearch").toFile
    try f(d)
    finally {
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles).foreach(_.foreach(rm)); x.delete()
      }
      rm(d)
    }
  }

  private def fixture(n: Int, seed: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val pts = (1 to n).map(i =>
      (i.toLong, Array.fill(8)(rnd.nextDouble() * 2 - 1)))
    val corpus = pts.toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") % 10 === 3)
      .select(col("vec_id").as("query_id"),
        col("embedding").as("qvec"))
    val cents = Similarity.ivfCentroids(corpus, "vec_id", "embedding", 4)
    (corpus, queries, cents)
  }

  private def rows(df: org.apache.spark.sql.DataFrame) = df
    .select(col("query_id").cast("long"), col("rank"),
      col("vec_id").cast("long"))
    .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    .sortBy(x => (x._1, x._2)).toSeq

  test("ivfTopK over the store == ivfTopKIndexed over the full read") {
    withDir { idx =>
      val dir = idx.getAbsolutePath
      val (corpus, queries, cents) = fixture(60, 11)
      (0 until 2).foreach { b =>
        VectorIngest.ingestBatch(
          corpus.filter(pmod(col("vec_id"), lit(2)) === b),
          "vec_id", "embedding", cents, dir, b.toLong)
      }
      val viaStore = VectorSearch.ivfTopK(spark, dir, queries,
        "query_id", "qvec", k = 3, cents, nprobe = 2)
      val viaFull = Similarity.ivfTopKIndexed(
        VectorStore.read(spark, dir), "vec_id", "embedding",
        queries, "query_id", "qvec", k = 3, cents, nprobe = 2)
      assert(rows(viaStore) === rows(viaFull))
    }
  }

  test("graphAnnTopK pinned to a retained version searches exactly that version") {
    import spark.implicits._
    withDir { idx =>
      val dir = idx.getAbsolutePath
      val (corpus, queries, cents) = fixture(50, 23)
      VectorIngest.ingestGraphBatch(corpus, "vec_id", "embedding",
        cents, dir, degree = 4, efConstruction = 32)
      val v1 = VectorStore.version(spark, dir)
      def search(version: Long) = rows(VectorSearch.graphAnnTopK(
        spark, dir, queries, "query_id", "qvec", k = 3, cents,
        nprobe = 4, ef = 1024, version = version))
      val atV1 = search(-1L)
      // parity with the full-read kernel at the head too
      assert(atV1 === rows(Similarity.graphAnnTopKIndexed(
        VectorStore.read(spark, dir), "vec_id", "embedding", queries,
        "query_id", "qvec", k = 3, cents, nprobe = 4, ef = 1024)))
      // delete every rank-1 neighbor, advancing the store
      val top1 = atV1.filter(_._2 == 1).map(_._3).distinct
      VectorIngest.removeGraphBatch(top1.toDF("vec_id"), "vec_id",
        "embedding", dir, degree = 4, efConstruction = 32)
      assert(VectorStore.version(spark, dir) === v1 + 1)
      // the pin still serves the pre-delete ranking; the head does not
      assert(search(v1) === atV1)
      val atHead = search(-1L)
      assert(atHead !== atV1)
      assert(atHead.filter(_._2 == 1).forall(r => !top1.contains(r._3)))
      // a vacuumed pin errors loudly, like readAt
      VectorStore.vacuum(spark, dir, keep = 1)
      intercept[IllegalArgumentException](search(v1))
    }
  }
}
