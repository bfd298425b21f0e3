package graft

import java.nio.file.Files

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.TableStore

/** Optimistic concurrency: append-shaped commits that lose the manifest
  * put-if-absent race rebase onto the winner's manifest; metadata
  * conflicts are rejected; true concurrent writers all land. */
class ConcurrencySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  def freshStore(): TableStore =
    new TableStore(spark, Files.createTempDirectory("occstore").toString)

  test("append rebases deterministically over a concurrent append") {
    val ts = freshStore()
    ts.create("t", Seq((1L, "a")).toDF("id", "v"))
    // a second handle plays the concurrent writer exactly once, firing
    // between our manifest read and our commit attempt
    val rival = new TableStore(spark, ts.dataRoot("t").getParent.getParent.toString)
    var fired = false
    ts.onBeforeOptimisticCommit = () =>
      if (!fired) { fired = true; rival.append("t", Seq((2L, "b")).toDF("id", "v")) }
    try ts.append("t", Seq((3L, "c")).toDF("id", "v"))
    finally ts.onBeforeOptimisticCommit = () => ()
    assert(fired)
    assert(ts.read("t").as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (2L, "b"), (3L, "c")))
    assert(ts.currentVersion("t") === 2) // create + rival + rebased ours
  }

  test("append refuses to rebase over a concurrent metadata change") {
    val ts = freshStore()
    ts.create("t", Seq((1L, 5L)).toDF("id", "x"))
    val rival = new TableStore(spark, ts.dataRoot("t").getParent.getParent.toString)
    var fired = false
    ts.onBeforeOptimisticCommit = () =>
      if (!fired) { fired = true; rival.addCheckConstraint("t", "pos", "x > 0") }
    try {
      intercept[java.util.ConcurrentModificationException](
        ts.append("t", Seq((2L, -1L)).toDF("id", "x")))
    } finally ts.onBeforeOptimisticCommit = () => ()
    // the winner's constraint survives; our unvalidated rows never landed
    assert(ts.read("t").count() === 1)
    assert(ts.checkConstraints("t").contains("pos"))
  }

  test("truly concurrent appends from two threads all land") {
    val ts = freshStore()
    ts.create("t", Seq((0L, 0L)).toDF("id", "x"))
    val root = ts.dataRoot("t").getParent.getParent.toString
    def writer(offset: Long): Future[Unit] = Future {
      val mine = new TableStore(spark, root)
      (1L to 5L).foreach(i =>
        mine.append("t", Seq((offset + i, i)).toDF("id", "x")))
    }
    Await.result(Future.sequence(Seq(writer(100L), writer(200L))), 120.seconds)
    assert(ts.read("t").count() === 11)
    assert(ts.currentVersion("t") === 10) // every append got its own version
  }

  test("vacuum racing live writers never breaks a commit") {
    val ts = freshStore()
    ts.create("t", Seq((0L, 0L)).toDF("id", "x"))
    val root = ts.dataRoot("t").getParent.getParent.toString
    def writer(offset: Long): Future[Unit] = Future {
      val mine = new TableStore(spark, root)
      (1L to 6L).foreach(i =>
        mine.append("t", Seq((offset + i, i)).toDF("id", "x")))
    }
    val sweeper: Future[Unit] = Future {
      val mine = new TableStore(spark, root)
      (1 to 8).foreach { _ =>
        Thread.sleep(150)
        mine.vacuum("t", retainVersions = 2)
      }
    }
    Await.result(
      Future.sequence(Seq(writer(100L), writer(200L), writer(300L), sweeper)),
      180.seconds)
    // every append landed and is READABLE: a vacuum that yanked an
    // in-flight batch dir would surface here as a missing-file scan
    val got = ts.read("t").as[(Long, Long)].collect().map(_._1).toSet
    assert(got === (Set(0L) ++ (1L to 6L).flatMap(i =>
      Seq(100L + i, 200L + i, 300L + i))), s"lost rows: $got")
    assert(ts.currentVersion("t") === 18)
    // and a cold store still resolves the (vacuumed) manifest chain
    assert(new TableStore(spark, root).read("t").count() === 19)
  }
}
