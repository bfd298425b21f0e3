package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{BloomIndex, TableStore}

/** Point-predicate bloom skipping: keys written in arrival order give
  * every dir a near-full [min,max] span, so stats pruning keeps all
  * dirs — the bloom index must still narrow a point UPDATE/DELETE or
  * SQL point SELECT to the one dir that truly holds the key. */
class BloomIndexSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  /** Three dirs with INTERLEAVED ids (dir k holds ids ≡ k mod 3): every
    * dir spans almost all of [0, 3000), min/max never prune, and each
    * id lives in exactly one dir. */
  private def seed(ts: TableStore, name: String): Unit = {
    def batch(k: Int) =
      (0L until 1000L).map(i => (i * 3 + k, s"c${i * 3 + k}", "live"))
        .toDF("customer_id", "cust_key", "v").coalesce(1)
    ts.create(name, batch(0))
    ts.append(name, batch(1))
    ts.append(name, batch(2))
  }

  test("point DELETE/UPDATE rewrite only the dir containing the key") {
    val root = Files.createTempDirectory("bloomdel").toString
    val ts = new TableStore(spark, root)
    seed(ts, "t")
    ts.setBloomColumns("t", Seq("customer_id", "cust_key"))
    val before = ts.liveDirs("t")
    assert(before.size === 3)

    // stats alone CANNOT isolate the dir (interleaved ranges) — this
    // delete narrowing to one rewrite is the bloom's work
    ts.delete("t", col("customer_id") === 1502L) // 1502 % 3 == 2: third dir
    val after = ts.liveDirs("t")
    assert(after.size === 3)
    assert(after.count(before.contains) === 2,
      s"expected 2 carried dirs, got $after vs $before")
    assert(ts.read("t").filter(col("customer_id") === 1502L).count() === 0)
    assert(ts.read("t").count() === 2999)

    // string key through the same index
    val preUpd = ts.liveDirs("t")
    ts.update("t", col("cust_key") === "c7", Map("v" -> lit("X")))
    assert(ts.liveDirs("t").count(preUpd.contains) === 2)
    assert(ts.read("t").filter(col("v") === "X").count() === 1)

    // a key absent from EVERY dir: all blooms prove absence, no commit
    val vBefore = ts.currentVersion("t")
    ts.delete("t", col("customer_id") === 99999L)
    assert(ts.currentVersion("t") === vBefore)

    // vacuum sweeps bloom sidecars of superseded dirs
    ts.vacuum("t", retainVersions = 1)
    val liveEnc = ts.liveDirs("t").map(_.replace("/", "__")).toSet
    val bloomFiles = ts.bloomRoot("t").toFile.list().toSeq
    assert(bloomFiles.nonEmpty)
    assert(bloomFiles.forall(f => liveEnc.exists(d => f.startsWith(d + "."))),
      s"orphan bloom files: $bloomFiles")
  }

  test("SQL point SELECT scans only the bloom-positive dir") {
    val root = Files.createTempDirectory("bloomsql").toString
    spark.conf.set("spark.sql.catalog.gbloom", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gbloom.root", root)
    val ts = new TableStore(spark, root)
    seed(ts, "p")
    ts.setBloomColumns("p", Seq("customer_id"))

    val q = spark.sql("SELECT v FROM gbloom.p WHERE customer_id = 1501")
    val desc = q.queryExecution.sparkPlan
      .collect { case b: BatchScanExec => b }.head.scan.description()
    assert(desc.contains("1/3 dirs"), s"expected bloom-pruned scan: $desc")
    assert(q.count() === 1)

    // IN over keys from two dirs keeps exactly those two
    val q2 = spark.sql(
      "SELECT count(*) FROM gbloom.p WHERE customer_id IN (3, 1501)")
    val desc2 = q2.queryExecution.sparkPlan
      .collect { case b: BatchScanExec => b }.head.scan.description()
    assert(desc2.contains("2/3 dirs"), s"expected 2-dir scan: $desc2")
    assert(q2.head().getLong(0) === 2)

    // range predicates don't consult blooms — still 3/3, still exact
    val q3 = spark.sql("SELECT count(*) FROM gbloom.p WHERE customer_id >= 0")
    assert(q3.head().getLong(0) === 3000)
  }

  test("driver-side hashOf matches executor-side xxhash64 for every indexed type") {
    val df = Seq((7, 8L, "abc",
        java.sql.Date.valueOf("2021-03-04"),
        java.sql.Timestamp.valueOf("2021-03-04 05:06:07")))
      .toDF("i", "l", "s", "d", "t")
    val row = df.select(xxhash64(col("i")), xxhash64(col("l")), xxhash64(col("s")),
      xxhash64(col("d")), xxhash64(col("t"))).head()
    val schema = df.schema
    assert(BloomIndex.hashOf(schema, "i", 7).contains(row.getLong(0)))
    assert(BloomIndex.hashOf(schema, "l", 8L).contains(row.getLong(1)))
    assert(BloomIndex.hashOf(schema, "s", "abc").contains(row.getLong(2)))
    assert(BloomIndex.hashOf(schema, "d", java.sql.Date.valueOf("2021-03-04"))
      .contains(row.getLong(3)))
    assert(BloomIndex.hashOf(schema, "t",
      java.sql.Timestamp.valueOf("2021-03-04 05:06:07")).contains(row.getLong(4)))
    // unindexable / unknown shapes refuse (never prune) instead of guessing
    assert(BloomIndex.hashOf(schema, "missing", 1).isEmpty)
    assert(BloomIndex.hashOf(schema, "i", "not-an-int").isEmpty)
  }

  test("unsupported column types are rejected at setBloomColumns") {
    val root = Files.createTempDirectory("bloomtypes").toString
    val ts = new TableStore(spark, root)
    ts.create("u", Seq((1L, 1.5)).toDF("id", "price"))
    intercept[IllegalArgumentException] {
      ts.setBloomColumns("u", Seq("price")) // double: not indexable
    }
    intercept[IllegalArgumentException] {
      ts.setBloomColumns("u", Seq("nope")) // absent column
    }
    ts.setBloomColumns("u", Seq("id")) // long: fine
  }

  test("bloom config follows the schema's spelling: case-insensitive " +
      "set cannot dodge the drop guard, and renames carry it") {
    val ts = new TableStore(spark,
      Files.createTempDirectory("bloomcase").toString)
    ts.create("bc", Seq((1L, "a")).toDF("id", "v"))
    ts.setBloomColumns("bc", Seq("ID")) // caller-cased: canonicalized
    // the drop guard compares exact names — canonicalization means a
    // caller-cased config can no longer slip past it (which left a
    // dangling bloom entry failing every later commit)
    intercept[IllegalArgumentException](ts.dropColumn("bc", "id"))
    // renames remap the canonical entry, so the guard follows the column
    ts.renameColumn("bc", "id", "key")
    intercept[IllegalArgumentException](ts.dropColumn("bc", "key"))
    ts.setBloomColumns("bc", Seq.empty)
    ts.dropColumn("bc", "key") // config cleared: drop is legal now
    assert(ts.schemaOf("bc").fieldNames.toSeq === Seq("v"))
  }
}
