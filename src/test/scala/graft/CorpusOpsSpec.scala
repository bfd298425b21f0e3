package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Corpus

/** Determinism properties of the corpus ops: outputs are pure
  * functions of the data — partitioning, executor counts, and input
  * row order can never change them. */
class CorpusOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  private def docs(seed: Long) = {
    val rnd = new scala.util.Random(seed)
    (0L until 500L).map(i => (i, rnd.nextInt(300) + 5, s"g${i % 5}"))
      .toDF("id", "tok", "grp")
  }

  test("packSequences is independent of partitioning and input order") {
    val base = docs(1)
    val ref = Corpus.packSequences(base, "id", "tok", 256, nPartitions = 1)
      .collect().map(_.toSeq).toSet
    for (n <- Seq(4, 32)) {
      val got = Corpus.packSequences(base.orderBy(rand(seed = n)), "id", "tok",
          256, nPartitions = n)
        .collect().map(_.toSeq).toSet
      assert(got === ref, s"nPartitions=$n")
    }
    // invariants: stream starts are the exclusive prefix sum in id order;
    // bins are monotone non-decreasing
    val rows = Corpus.packSequences(base, "id", "tok", 256)
      .orderBy("id").collect()
    var cum = 0L
    rows.foreach { r =>
      assert(r.getLong(2) === cum, s"start mismatch at id ${r.getLong(0)}")
      assert(r.getLong(3) === cum / 256)
      cum += r.getLong(1)
    }
  }

  test("sampling is a pure function of the key (repartition-stable)") {
    val base = docs(2)
    val thr = Map("g0" -> "80000000", "g1" -> "40000000")
    val a = Corpus.stratifiedSample(base, col("id"), col("grp"), thr, "20000000")
      .select("id").as[Long].collect().toSet
    val b = Corpus.stratifiedSample(base.repartition(17).orderBy(rand(3)),
        col("id"), col("grp"), thr, "20000000")
      .select("id").as[Long].collect().toSet
    assert(a === b)

    val qa = Corpus.quotaSample(base, col("id"), col("grp"), 10)
    val qb = Corpus.quotaSample(base.repartition(13), col("id"), col("grp"), 10)
    assert(qa.select("id").as[Long].collect().toSet ===
      qb.select("id").as[Long].collect().toSet)
    // exact quota per group
    assert(qa.groupBy("grp").count().collect().forall(_.getLong(1) === 10))
  }
}
