package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.TableStore

/** Write-time CHECK constraints: every write path — library append/
  * overwrite/merge/update, SQL INSERT through the DSv2 catalog — must
  * refuse rows that violate a declared constraint, atomically (the
  * table is unchanged after a refused write). */
class CheckConstraintSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  private def failsWrite(f: => Unit): Unit = {
    val e = intercept[Throwable](f)
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else t.toString +: chain(t.getCause)
    assert(chain(e).exists(_.contains("CHECK constraint")) ||
      chain(e).exists(_.contains("violate CHECK")), s"unexpected error: $e")
  }

  test("generated columns: computed when absent, validated when present") {
    val ts = new graft.core.TableStore(spark,
      java.nio.file.Files.createTempDirectory("genstore").toString)
    ts.create("t", Seq((1L, 10.0, 2L, 20.0)).toDF("id", "price", "qty", "total"))
    ts.setGeneratedColumn("t", "total", "price * qty")
    // absent -> computed
    ts.append("t", Seq((2L, 3.0, 4L)).toDF("id", "price", "qty"))
    val got = ts.read("t").select("id", "total").as[(Long, Double)].collect().toMap
    assert(got(2L) === 12.0)
    // present and consistent -> accepted
    ts.append("t", Seq((3L, 5.0, 2L, 10.0)).toDF("id", "price", "qty", "total"))
    assert(ts.read("t").count() === 3)
    // present and WRONG -> the whole commit refused
    failsWrite(ts.append("t", Seq((4L, 5.0, 2L, 11.0)).toDF("id", "price", "qty", "total")))
    assert(ts.read("t").count() === 3)
    // merges validate too (their sources carry the full schema)
    failsWrite(ts.mergeUpsert("t",
      Seq((3L, 5.0, 2L, 99.0)).toDF("id", "price", "qty", "total"),
      Seq("id"), changeTypeCol = None))
    // rename/drop of referenced columns refused; dropping the generated
    // column itself takes its rule along
    intercept[IllegalArgumentException](ts.renameColumn("t", "price", "p"))
    intercept[IllegalArgumentException](ts.dropColumn("t", "qty"))
    ts.dropColumn("t", "total")
    ts.append("t", Seq((5L, 1.0, 1L)).toDF("id", "price", "qty"))
    assert(ts.read("t").count() === 4)
  }

  test("generated columns enforced on the SQL INSERT path") {
    val root = java.nio.file.Files.createTempDirectory("gensql").toString
    spark.conf.set("spark.sql.catalog.ggen", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.ggen.root", root)
    val ts = new graft.core.TableStore(spark, root)
    ts.create("t", Seq((1L, 10.0, 2L, 20.0)).toDF("id", "price", "qty", "total"))
    ts.setGeneratedColumn("t", "total", "price * qty")
    spark.sql("INSERT INTO ggen.t VALUES (2, 3.0, 4, 12.0)") // consistent
    assert(spark.sql("SELECT count(*) FROM ggen.t").head().getLong(0) === 2L)
    failsWrite(spark.sql("INSERT INTO ggen.t VALUES (3, 3.0, 4, 13.0)"))
    assert(spark.sql("SELECT count(*) FROM ggen.t").head().getLong(0) === 2L)
  }

  test("identity columns: dense ids from a persisted watermark, supply refused") {
    val ts = new graft.core.TableStore(spark,
      java.nio.file.Files.createTempDirectory("idstore").toString)
    ts.createEmpty("t", org.apache.spark.sql.types.StructType.fromDDL(
      "sk BIGINT, name STRING"))
    ts.setIdentityColumn("t", "sk", start = 100L)
    ts.append("t", Seq("a", "b", "c").toDF("name"))
    ts.append("t", Seq("d", "e").toDF("name"))
    val got = ts.read("t").select("sk", "name").as[(Long, String)].collect().toMap
    // dense, unique, continuing across commits from the start value
    assert(got.keySet === (100L to 104L).toSet)
    assert(got.values.toSet === Set("a", "b", "c", "d", "e"))
    // ALWAYS semantics: inputs carrying the column are refused
    intercept[IllegalArgumentException](
      ts.append("t", Seq((999L, "x")).toDF("sk", "name")))
    // the watermark travels IN the manifest: time travel shows the old
    // value; a restore rolls rows back but a fresh append still mints
    // unseen ids (watermark kept current by restore's txn-style carry)
    assert(ts.properties("t")("identity.sk.next") === "105")
    ts.append("t", Seq("f").toDF("name"))
    assert(ts.read("t").filter(col("sk") === 105L).count() === 1)
  }

  test("concurrent identity appends conflict instead of minting duplicates") {
    val root = java.nio.file.Files.createTempDirectory("idrace").toString
    val ts = new graft.core.TableStore(spark, root)
    ts.createEmpty("t", org.apache.spark.sql.types.StructType.fromDDL(
      "sk BIGINT, name STRING"))
    ts.setIdentityColumn("t", "sk")
    ts.append("t", Seq("a").toDF("name"))
    // a second writer lands an identity append between our read and our
    // manifest write: the optimistic rebase must refuse
    var raced = false
    ts.onBeforeOptimisticCommit = () =>
      if (!raced) {
        raced = true
        new graft.core.TableStore(spark, root).append("t", Seq("z").toDF("name"))
      }
    try intercept[java.util.ConcurrentModificationException](
      ts.append("t", Seq("b").toDF("name")))
    finally ts.onBeforeOptimisticCommit = () => ()
    // ids stay unique across what DID commit
    val ids = ts.read("t").select("sk").as[Long].collect().toSeq
    assert(ids.distinct.size === ids.size)
  }

  test("identity watermark advances past values landed by SQL MERGE and library mergeUpsert") {
    // round-4 ADVICE #3: the three non-minting write paths (SQL INSERT is
    // covered in the RENAME/DROP test below) must never let a later
    // library append re-mint an id a caller-supplied row already took.
    // Merges key on the identity column by design (replication carries
    // ids), so the contract there is watermark-advance, not refusal.
    val root = java.nio.file.Files.createTempDirectory("idmerge").toString
    spark.conf.set("spark.sql.catalog.gidm", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gidm.root", root)
    val ts = new graft.core.TableStore(spark, root)
    ts.createEmpty("t", org.apache.spark.sql.types.StructType.fromDDL(
      "sk BIGINT, name STRING"))
    ts.setIdentityColumn("t", "sk", start = 1L)
    ts.append("t", Seq("a").toDF("name")) // mints sk=1
    // library mergeUpsert carrying sk values (the mergeUpsert path)
    ts.mergeUpsert("t", Seq((100L, "m")).toDF("sk", "name"), Seq("sk"),
      changeTypeCol = None)
    assert(ts.properties("t")("identity.sk.next").toLong >= 101L,
      "mergeUpsert did not advance the identity watermark")
    ts.append("t", Seq("b").toDF("name")) // must mint PAST 100
    val ids = ts.read("t").select("sk").as[Long].collect().toSeq
    assert(ids.distinct.size === ids.size, s"duplicate ids after merge: $ids")
    assert(ids.max >= 101L, s"append re-minted under the merged id: $ids")
    // SQL MERGE insert through the DSv2 catalog (the commitDelta path)
    Seq((500L, "x")).toDF("sk", "name").createOrReplaceTempView("idm_src")
    spark.sql("""MERGE INTO gidm.t t USING idm_src s ON t.sk = s.sk
                |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(ts.properties("t")("identity.sk.next").toLong >= 501L,
      "commitDelta did not advance the identity watermark")
    ts.append("t", Seq("c").toDF("name")) // must mint PAST 500
    val ids2 = ts.read("t").select("sk").as[Long].collect().toSeq
    assert(ids2.distinct.size === ids2.size, s"duplicate ids after SQL MERGE: $ids2")
    assert(ids2.max >= 501L, s"append re-minted under the SQL-merged id: $ids2")
  }

  test("identity rules survive RENAME, die with DROP, and track external writes") {
    val root = java.nio.file.Files.createTempDirectory("idalter").toString
    spark.conf.set("spark.sql.catalog.gida", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gida.root", root)
    val ts = new graft.core.TableStore(spark, root)
    ts.createEmpty("t", org.apache.spark.sql.types.StructType.fromDDL(
      "sk BIGINT, name STRING"))
    ts.setIdentityColumn("t", "sk", start = 10L)
    ts.append("t", Seq("a").toDF("name"))
    // RENAME remaps the identity prop: appends keep minting under the
    // NEW name (the old prop would mint a phantom column and fail
    // conform on every later write)
    ts.renameColumn("t", "sk", "row_sk")
    assert(ts.properties("t").contains("identity.row_sk.next"))
    assert(!ts.properties("t").contains("identity.sk.next"))
    ts.append("t", Seq("b").toDF("name"))
    assert(ts.read("t").select("row_sk").as[Long].collect().sorted.toSeq
      === Seq(10L, 11L))
    // an external (SQL INSERT attach) write carrying identity values
    // advances the watermark: the next library append can't re-mint
    spark.sql("INSERT INTO gida.t VALUES (500, 'ext')")
    ts.append("t", Seq("c").toDF("name"))
    val ids = ts.read("t").select("row_sk").as[Long].collect().toSeq
    assert(ids.distinct.size === ids.size)
    assert(ids.contains(501L), s"watermark did not advance past external max: $ids")
    // DROP removes the rule: a later re-ADD of the same name does NOT
    // inherit a stale watermark (user-supplied values accepted again)
    ts.dropColumn("t", "row_sk")
    assert(!ts.properties("t").exists(_._1.startsWith("identity.")))
    ts.addColumns("t", org.apache.spark.sql.types.StructType.fromDDL("row_sk BIGINT"))
    ts.append("t", Seq((999L, "d")).toDF("row_sk", "name")) // not refused
    assert(ts.read("t").filter(col("row_sk") === 999L).count() === 1)
  }

  test("updateVectorized refuses a typo'd SET column") {
    val ts = new graft.core.TableStore(spark,
      java.nio.file.Files.createTempDirectory("uvtypo").toString)
    ts.create("t", Seq((1L, 10.0), (2L, 20.0)).toDF("id", "amount"))
    val e = intercept[IllegalArgumentException](
      ts.updateVectorized("t", col("id") === 1L, Map("amonut" -> lit(99.0))))
    assert(e.getMessage.contains("amonut"))
    // nothing tombstoned or appended by the refused call
    assert(ts.read("t").as[(Long, Double)].collect().toMap ===
      Map(1L -> 10.0, 2L -> 20.0))
  }

  test("generated + identity columns declarable in CREATE TABLE TBLPROPERTIES") {
    val root = java.nio.file.Files.createTempDirectory("genddl").toString
    spark.conf.set("spark.sql.catalog.gddl", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gddl.root", root)
    spark.sql("""CREATE TABLE gddl.t (sk BIGINT, price DOUBLE, qty BIGINT,
                   total DOUBLE)
                 TBLPROPERTIES ('generated.total' = 'price * qty',
                                'identity.sk.next' = '10')""")
    val ts = new graft.core.TableStore(spark, root)
    ts.append("t", Seq((2.0, 3L)).toDF("price", "qty")) // sk + total minted
    val r = ts.read("t").select("sk", "total").as[(Long, Double)].head()
    assert(r === ((10L, 6.0)))
    // a bad generation expression fails the CREATE itself
    intercept[Exception](spark.sql(
      """CREATE TABLE gddl.bad (x BIGINT, y BIGINT)
         TBLPROPERTIES ('generated.y' = 'no_such_col + 1')"""))
    // a non-BIGINT identity column fails the CREATE too
    intercept[Exception](spark.sql(
      """CREATE TABLE gddl.bad2 (x STRING, y BIGINT)
         TBLPROPERTIES ('identity.x.next' = '1')"""))
  }

  test("library writes enforce checks atomically; drop lifts them") {
    val root = Files.createTempDirectory("checks").toString
    val ts = new TableStore(spark, root)
    ts.create("t", Seq((1L, 10.0), (2L, 20.0)).toDF("id", "amount"))
    ts.addCheckConstraint("t", "amount_nonneg", "amount >= 0")
    assert(ts.checkConstraints("t") === Map("amount_nonneg" -> "amount >= 0"))

    ts.append("t", Seq((3L, 30.0)).toDF("id", "amount")) // passes
    val v = ts.currentVersion("t")
    failsWrite(ts.append("t", Seq((4L, -1.0)).toDF("id", "amount")))
    assert(ts.currentVersion("t") === v, "refused write must not commit")
    assert(ts.read("t").count() === 3)

    // UPDATE that would violate fails; a clean one passes
    failsWrite(ts.update("t", col("id") === 1L, Map("amount" -> lit(-5.0))))
    assert(ts.read("t").filter(col("amount") < 0).count() === 0)
    ts.update("t", col("id") === 1L, Map("amount" -> lit(15.0)))
    assert(ts.read("t").filter(col("id") === 1L).head().getDouble(1) === 15.0)

    // merge with a violating source row fails
    failsWrite(ts.mergeUpsert("t", Seq((9L, -3.0)).toDF("id", "amount"),
      Seq("id"), changeTypeCol = None))

    // NULL amount violates (SQL CHECK semantics here: must prove true)
    failsWrite(ts.append("t", Seq((5L, null.asInstanceOf[java.lang.Double]))
      .toDF("id", "amount")))

    ts.dropCheckConstraint("t", "amount_nonneg")
    ts.append("t", Seq((4L, -1.0)).toDF("id", "amount")) // now allowed
    assert(ts.read("t").count() === 4)
  }

  test("a constraint existing data violates is rejected; bad exprs too") {
    val root = Files.createTempDirectory("checks2").toString
    val ts = new TableStore(spark, root)
    ts.create("t", Seq((1L, -1.0)).toDF("id", "amount"))
    intercept[IllegalArgumentException] {
      ts.addCheckConstraint("t", "amount_nonneg", "amount >= 0")
    }
    intercept[IllegalArgumentException] {
      ts.addCheckConstraint("t", "bad", "no_such_col > 0")
    }
  }

  test("SQL INSERT through the catalog enforces declared checks") {
    val root = Files.createTempDirectory("checks3").toString
    spark.conf.set("spark.sql.catalog.gchk", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gchk.root", root)
    spark.sql("""CREATE TABLE gchk.t (id BIGINT, amount DOUBLE)
                |TBLPROPERTIES ('check.amount_nonneg' = 'amount >= 0')""".stripMargin)
    spark.sql("INSERT INTO gchk.t VALUES (1, 5.0)")
    assert(spark.sql("SELECT count(*) FROM gchk.t").head().getLong(0) === 1)
    failsWrite(spark.sql("INSERT INTO gchk.t VALUES (2, -5.0)"))
    assert(spark.sql("SELECT count(*) FROM gchk.t").head().getLong(0) === 1)
  }

  test("restore validates constraints added since the restored version") {
    val ts = new graft.core.TableStore(spark,
      java.nio.file.Files.createTempDirectory("restchk").toString)
    ts.create("t", Seq((1L, -5L), (2L, 3L)).toDF("id", "x"))  // v0: bad row
    ts.delete("t", col("x") < 0L)                             // v1: clean
    ts.addCheckConstraint("t", "pos", "x > 0")                // v2
    // v0 contains a row violating the LATER constraint: refuse — the
    // restored table would advertise a contract its rows break
    intercept[IllegalStateException](ts.restore("t", 0))
    ts.restore("t", 1)
    assert(ts.read("t").count() === 1)
    assert(ts.checkConstraints("t").contains("pos"))
    // a constraint on a column the old schema LACKS refuses the restore
    // (carrying it would break every future write)
    ts.addColumns("t", org.apache.spark.sql.types.StructType.fromDDL("y BIGINT"))
    ts.addCheckConstraint("t", "ypos", "y IS NULL OR y > 0")
    intercept[IllegalArgumentException](ts.restore("t", 1))
  }

  test("restore never re-mints identity ids handed out after the " +
      "restored version") {
    val ts = new graft.core.TableStore(spark,
      java.nio.file.Files.createTempDirectory("restid").toString)
    ts.createEmpty("t", org.apache.spark.sql.types.StructType.fromDDL(
      "sk BIGINT, name STRING"))
    ts.setIdentityColumn("t", "sk", start = 100L)
    ts.append("t", Seq("a", "b").toDF("name"))   // sk 100, 101
    val vAB = ts.currentVersion("t")
    ts.append("t", Seq("c").toDF("name"))        // sk 102
    ts.restore("t", vAB)
    ts.append("t", Seq("d").toDF("name"))
    val got = ts.read("t").select("sk", "name").as[(Long, String)]
      .collect().toMap
    // id 102 was minted (and stays time-travel/CDF visible) — d must
    // NOT reuse it even though the restored rows top out at 101
    assert(got.keySet === Set(100L, 101L, 103L),
      s"identity watermark rewound: $got")
  }
}
