package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.sources._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{ColStats, DirStats, StatsPruning, TableStore}

/** Manifest-stats data skipping: the unit rules (StatsPruning) and the
  * end-to-end behavior through the DSv2 SQL scan — a predicate outside
  * a dir's [min,max] must remove that dir's files from the scan while
  * results stay exact. */
class StatsPruningSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  // ---- unit rules ----

  private val schema = org.apache.spark.sql.types.StructType.fromDDL(
    "id BIGINT, price DOUBLE, name STRING")
  private def ds(lo: Any, hi: Any, nulls: Long = 0, rows: Long = 100,
                 col: String = "id") =
    DirStats(rows, Map(col -> ColStats(Some(lo), Some(hi), Some(nulls))))

  private def pruned(d: DirStats, f: Filter): Boolean =
    StatsPruning.liveDirs(Seq("d"), Map("d" -> d), schema, Seq(f)).isEmpty

  test("range and equality rules prune exactly when no row can match") {
    val d = ds(10L, 20L)
    assert(pruned(d, EqualTo("id", 5L)))
    assert(pruned(d, EqualTo("id", 25L)))
    assert(!pruned(d, EqualTo("id", 15L)))
    assert(pruned(d, GreaterThan("id", 20L)))    // max <= v
    assert(!pruned(d, GreaterThan("id", 19L)))
    assert(pruned(d, GreaterThanOrEqual("id", 21L)))
    assert(pruned(d, LessThan("id", 10L)))       // min >= v
    assert(!pruned(d, LessThan("id", 11L)))
    assert(pruned(d, LessThanOrEqual("id", 9L)))
    assert(pruned(d, In("id", Array(1L, 2L, 30L))))
    assert(!pruned(d, In("id", Array(1L, 15L))))
    // int literal against a bigint column widens
    assert(pruned(d, EqualTo("id", 5)))
    // And prunes if either side prunes; Or only if both do
    assert(pruned(d, And(EqualTo("id", 15L), EqualTo("id", 5L))))
    assert(!pruned(d, Or(EqualTo("id", 15L), EqualTo("id", 5L))))
    assert(pruned(d, Or(EqualTo("id", 4L), EqualTo("id", 5L))))
  }

  test("null-count rules") {
    assert(pruned(ds(10L, 20L, nulls = 0), IsNull("id")))
    assert(!pruned(ds(10L, 20L, nulls = 1), IsNull("id")))
    assert(pruned(DirStats(100, Map("id" -> ColStats(None, None, Some(100L)))),
      IsNotNull("id")))
  }

  test("float/double max is open-ended (hidden NaN) but min still prunes") {
    val d = ds(1.5, 9.5, col = "price")
    // x > 100: a NaN row (absent from footer bounds) WOULD match — no prune
    assert(!pruned(d, GreaterThan("price", 100.0)))
    assert(!pruned(d, GreaterThanOrEqual("price", 100.0)))
    // x < 1.0: NaN never sorts below — min-based pruning stays sound
    assert(pruned(d, LessThan("price", 1.0)))
    assert(pruned(d, LessThanOrEqual("price", 1.0)))
    // equality with a non-NaN literal outside bounds is safe
    assert(pruned(d, EqualTo("price", 100.0)))
    // NaN literal never prunes
    assert(!pruned(d, EqualTo("price", Double.NaN)))
  }

  test("string bounds compare in UTF-8 order; prefix rule") {
    val d = ds("bravo", "delta", col = "name")
    assert(pruned(d, EqualTo("name", "alpha")))
    assert(pruned(d, EqualTo("name", "echo")))
    assert(!pruned(d, EqualTo("name", "charlie")))
    assert(pruned(d, StringStartsWith("name", "zulu"))) // max < prefix
    assert(!pruned(d, StringStartsWith("name", "br")))
  }

  test("TIMESTAMP_NTZ literals prune (v2 LocalDateTime and catalyst micros forms)") {
    val ntzSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "ts TIMESTAMP_NTZ")
    // manifest canonical form: micros since epoch
    val lo = 788918400000000L // 1995-01-01T00:00
    val hi = 851990400000000L // 1996-12-31T00:00
    val d = DirStats(100, Map("ts" -> ColStats(Some(lo), Some(hi), Some(0L))))
    def prunedNtz(f: Filter) =
      StatsPruning.liveDirs(Seq("d"), Map("d" -> d), ntzSchema, Seq(f)).isEmpty
    val above = java.time.LocalDateTime.of(1997, 6, 1, 0, 0)
    val inside = java.time.LocalDateTime.of(1995, 6, 1, 0, 0)
    assert(prunedNtz(GreaterThanOrEqual("ts", above)))
    assert(!prunedNtz(GreaterThanOrEqual("ts", inside)))
    assert(prunedNtz(EqualTo("ts", above)))
    // catalyst-internal Long micros (the library UPDATE/DELETE path)
    assert(prunedNtz(GreaterThanOrEqual("ts", 865123200000000L)))
    assert(!prunedNtz(LessThan("ts", 800000000000000L)))
  }

  test("missing stats never prune") {
    assert(StatsPruning.liveDirs(Seq("a", "b"), Map.empty, schema,
      Seq(EqualTo("id", 5L))) === Seq("a", "b"))
    val noCol = DirStats(10, Map.empty)
    assert(!pruned(noCol, EqualTo("id", 5L)))
  }

  // ---- end-to-end through the SQL scan ----

  test("SQL scan skips dirs whose stats exclude the predicate") {
    val root = Files.createTempDirectory("statsprune").toString
    spark.conf.set("spark.sql.catalog.gprune", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gprune.root", root)
    val ts = new TableStore(spark, root)
    // three appends = three manifest dirs with disjoint id ranges
    ts.create("m", (0L until 100L).map(i => (i, s"r$i")).toDF("id", "v").coalesce(1))
    ts.append("m", (100L until 200L).map(i => (i, s"r$i")).toDF("id", "v").coalesce(1))
    ts.append("m", (200L until 300L).map(i => (i, s"r$i")).toDF("id", "v").coalesce(1))
    assert(ts.liveDirCount("m") === 3)

    val q = spark.sql("SELECT id, v FROM gprune.m WHERE id >= 250")
    val scans = q.queryExecution.sparkPlan.collect { case b: BatchScanExec => b }
    assert(scans.nonEmpty)
    val desc = scans.head.scan.description()
    assert(desc.contains("stats pruning: 1/3 dirs"), s"unexpected scan: $desc")
    // and the result is still exact
    assert(q.count() === 50)
    assert(q.agg(org.apache.spark.sql.functions.min("id")).head().getLong(0) === 250L)

    // an unselective predicate keeps every dir
    val all = spark.sql("SELECT count(*) FROM gprune.m WHERE id >= 0")
    val desc2 = all.queryExecution.sparkPlan.collect { case b: BatchScanExec => b }
      .head.scan.description()
    assert(desc2.contains("stats pruning: 3/3 dirs"), s"unexpected scan: $desc2")
    assert(all.head().getLong(0) === 300)
  }

  test("pushed LIMIT schedules only enough dirs to satisfy it") {
    val root = Files.createTempDirectory("limitpush").toString
    spark.conf.set("spark.sql.catalog.glim", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.glim.root", root)
    val ts = new TableStore(spark, root)
    ts.create("m", (0L until 100L).map(i => (i, s"r$i")).toDF("id", "v").coalesce(1))
    ts.append("m", (100L until 200L).map(i => (i, s"r$i")).toDF("id", "v").coalesce(1))
    ts.append("m", (200L until 300L).map(i => (i, s"r$i")).toDF("id", "v").coalesce(1))
    val q = spark.sql("SELECT id, v FROM glim.m LIMIT 50")
    val desc = q.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b }.head.scan.description()
    assert(desc.contains("PushedLimit: 50 -> 1/3 dirs"), s"unexpected scan: $desc")
    assert(q.count() === 50)
    // DV tombstones subtract from a dir's live contribution: with 80 of
    // the first dir's rows deleted it only provides 20, so LIMIT 110
    // must open TWO dirs (20 + 100 >= 110) where 100 rows would have
    // been one dir before the delete
    ts.deleteVectorized("m", org.apache.spark.sql.functions.col("id") < 80)
    val q2 = spark.sql("SELECT id, v FROM glim.m LIMIT 110")
    val desc2 = q2.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b }.head.scan.description()
    assert(desc2.contains("PushedLimit: 110 -> 2/3 dirs"), s"unexpected scan: $desc2")
    assert(q2.count() === 110)
    // a pushed filter disables limit scheduling (counts no longer bound)
    val q3 = spark.sql("SELECT id, v FROM glim.m WHERE id >= 80 LIMIT 10")
    val desc3 = q3.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b }.head.scan.description()
    assert(!desc3.contains("PushedLimit"), s"unexpected scan: $desc3")
    assert(q3.count() === 10)
  }

  test("pushed TopN opens only the dirs at the edge of the sort order") {
    val root = Files.createTempDirectory("topnpush").toString
    spark.conf.set("spark.sql.catalog.gtop", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gtop.root", root)
    val ts = new TableStore(spark, root)
    // range-clustered layout: three dirs with disjoint id ranges
    ts.create("m", (0L until 100L).map(i => (i, s"r$i")).toDF("id", "v").coalesce(1))
    ts.append("m", (100L until 200L).map(i => (i, s"r$i")).toDF("id", "v").coalesce(1))
    ts.append("m", (200L until 300L).map(i => (i, s"r$i")).toDF("id", "v").coalesce(1))
    def desc(sql: String): String =
      spark.sql(sql).queryExecution.executedPlan.collect {
        case b: BatchScanExec => b }.head.scan.description()
    val asc = "SELECT id, v FROM gtop.m ORDER BY id LIMIT 50"
    assert(desc(asc).contains("PushedTopN: id ASC 50 -> 1/3 dirs"),
      s"unexpected: ${desc(asc)}")
    assert(spark.sql(asc).as[(Long, String)].collect().map(_._1).toSeq ===
      (0L until 50L))
    val dsc = "SELECT id, v FROM gtop.m ORDER BY id DESC LIMIT 150"
    assert(desc(dsc).contains("PushedTopN: id DESC 150 -> 2/3 dirs"),
      s"unexpected: ${desc(dsc)}")
    assert(spark.sql(dsc).as[(Long, String)].collect().map(_._1).toSeq ===
      (299L to 150L by -1L))
    // tie-breaker columns don't block the push: scheduling on the
    // leading column alone is sound for lexicographic order
    val multi = "SELECT id, v FROM gtop.m ORDER BY id, v DESC LIMIT 50"
    assert(desc(multi).contains("PushedTopN: id ASC 50 -> 1/3 dirs"),
      s"unexpected: ${desc(multi)}")
    assert(spark.sql(multi).as[(Long, String)].collect().map(_._1).toSeq ===
      (0L until 50L))
    // a dir carrying nulls always stays (it wins under NULLS FIRST)
    ts.append("m", Seq(Tuple1("n1")).toDF("v")
      .select(org.apache.spark.sql.functions.lit(null).cast("bigint").as("id"),
        org.apache.spark.sql.functions.col("v")).coalesce(1))
    assert(desc(asc).contains("PushedTopN: id ASC 50 -> 2/4 dirs"),
      s"unexpected: ${desc(asc)}")
    assert(spark.sql(asc).filter("id IS NULL").count() === 1) // NULLS FIRST default
    // overlapping ranges keep every overlapped dir (bound test)
    ts.append("m", Seq((40L, "x")).toDF("id", "v").coalesce(1))
    val after = desc(asc)
    assert(after.contains("PushedTopN: id ASC 50 -> 3/5 dirs"),
      s"unexpected: $after")
  }

  test("TopN bounds compare strings in UTF-8 order (supplementary chars)") {
    val root = Files.createTempDirectory("topnutf8").toString
    spark.conf.set("spark.sql.catalog.gutf", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gutf.root", root)
    val ts = new TableStore(spark, root)
    // dir A: high-BMP strings (U+FF41, UTF-8 < U+1F600 but UTF-16 >);
    // dir B: supplementary-plane strings. Java String order sorts B
    // first; UTF-8/code-point order (parquet + Spark ORDER BY) sorts A
    // first — a UTF-16 bound would prune dir A, the true top dir.
    ts.create("u", (0 until 50).map(i => (i.toLong, f"\uFF41$i%03d"))
      .toDF("id", "s").coalesce(1))
    ts.append("u", (0 until 50).map(i => (50L + i, new String(Character.toChars(0x1F600)) + f"$i%03d"))
      .toDF("id", "s").coalesce(1))
    val got = spark.sql("SELECT s FROM gutf.u ORDER BY s LIMIT 50")
      .as[String].collect()
    assert(got.forall(_.startsWith("\uFF41")),
      s"top-50 must be the high-BMP dir, got: ${got.take(3).mkString(",")}")
    assert(got.length === 50)
  }

  test("pushed OFFSET drops whole dirs and skips within the boundary file") {
    val root = Files.createTempDirectory("offpush").toString
    spark.conf.set("spark.sql.catalog.goff", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.goff.root", root)
    val ts = new TableStore(spark, root)
    ts.create("m", (0L until 100L).map(i => (i, s"r$i")).toDF("id", "v").coalesce(1))
    ts.append("m", (100L until 200L).map(i => (i, s"r$i")).toDF("id", "v").coalesce(1))
    ts.append("m", (200L until 300L).map(i => (i, s"r$i")).toDF("id", "v").coalesce(1))
    def desc(sql: String): String =
      spark.sql(sql).queryExecution.executedPlan.collect {
        case b: BatchScanExec => b }.head.scan.description()
    // LIMIT+OFFSET: Spark pushes limit as l+o plus the offset itself
    val q = "SELECT id FROM goff.m LIMIT 30 OFFSET 150"
    assert(desc(q).contains("PushedOffset: 150"), s"unexpected: ${desc(q)}")
    assert(spark.sql(q).as[Long].collect().toSet === (150L until 180L).toSet)
    // standalone OFFSET pushes: dirs 0-1 fully dropped, dir 2's single
    // file skips the remaining 95 rows
    val q2 = "SELECT id FROM goff.m OFFSET 295"
    assert(desc(q2).contains("PushedOffset: 295"), s"unexpected: ${desc(q2)}")
    assert(spark.sql(q2).as[Long].collect().toSet === (295L until 300L).toSet)
    // offset beyond the table: zero rows, zero partitions
    assert(spark.sql("SELECT id FROM goff.m OFFSET 500").count() === 0)
    // deletion vectors shift live counts: delete 10 rows of dir 0, the
    // same OFFSET now reaches 10 rows further into the data
    ts.deleteVectorized("m", org.apache.spark.sql.functions.col("id") < 10)
    assert(spark.sql("SELECT id FROM goff.m OFFSET 285").as[Long]
      .collect().toSet === (295L until 300L).toSet)
    // un-pushable shapes still answer correctly (filter present)
    assert(spark.sql("SELECT id FROM goff.m WHERE id >= 10 OFFSET 285").as[Long]
      .collect().toSet === (295L until 300L).toSet)
  }

  test("manifest column stats feed the cost-based optimizer") {
    val root = Files.createTempDirectory("cbostats").toString
    spark.conf.set("spark.sql.catalog.gcbo", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gcbo.root", root)
    val ts = new TableStore(spark, root)
    ts.create("c", (0L until 100L).map(i => (i, s"r$i")).toDF("id", "v"))
    ts.append("c", Seq((100L, null.asInstanceOf[String]), (199L, "z")).toDF("id", "v"))
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.planStats.enabled", "true")
    try {
      val rel = spark.sql("SELECT id, v FROM gcbo.c").queryExecution.optimizedPlan
        .collect { case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r }
        .head
      val st = rel.stats
      assert(st.rowCount.contains(BigInt(102)))
      val idStat = st.attributeStats.collectFirst {
        case (a, cs) if a.name == "id" => cs }.get
      assert(idStat.min.contains(0L) && idStat.max.contains(199L),
        s"id bounds: ${idStat.min} .. ${idStat.max}")
      assert(idStat.nullCount.contains(BigInt(0)))
      val vStat = st.attributeStats.collectFirst {
        case (a, cs) if a.name == "v" => cs }.get
      assert(vStat.nullCount.contains(BigInt(1)), s"v nulls: ${vStat.nullCount}")
    } finally {
      spark.conf.unset("spark.sql.cbo.enabled")
      spark.conf.unset("spark.sql.cbo.planStats.enabled")
    }
  }

  test("COUNT/MIN/MAX without WHERE are metadata-only (zero files read)") {
    val root = Files.createTempDirectory("statsagg").toString
    spark.conf.set("spark.sql.catalog.gagg", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gagg.root", root)
    val ts = new TableStore(spark, root)
    ts.create("t", Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, null: String, 0.5))
      .toDF("id", "name", "price"))
    ts.append("t", Seq((10L, "z", 9.5)).toDF("id", "name", "price"))

    def planOf(sql: String) = spark.sql(sql).queryExecution.sparkPlan.toString

    val q = spark.sql(
      "SELECT count(*), count(name), min(id), max(id), min(name), max(name) FROM gagg.t")
    val plan = planOf(
      "SELECT count(*), count(name), min(id), max(id), min(name), max(name) FROM gagg.t")
    // the metadata answer plans as a LocalTableScan carrying the
    // synthetic stat columns — no BatchScan, no files
    assert(plan.contains("LocalTableScan") && plan.contains("count_star")
      && !plan.contains("BatchScan"), s"expected metadata-only scan, got:\n$plan")
    val r = q.head()
    assert(r.getLong(0) === 4)    // count(*)
    assert(r.getLong(1) === 3)    // count(name): one null
    assert(r.getLong(2) === 1L && r.getLong(3) === 10L)
    assert(r.getString(4) === "a" && r.getString(5) === "z")

    // MAX over double must NOT be metadata-answered (hidden-NaN rule)…
    val mx = spark.sql("SELECT max(price) FROM gagg.t")
    assert(planOf("SELECT max(price) FROM gagg.t").contains("BatchScan"))
    assert(mx.head().getDouble(0) === 9.5)
    // …but MIN over double is safe
    val mn = spark.sql("SELECT min(price) FROM gagg.t")
    assert(planOf("SELECT min(price) FROM gagg.t").contains("min_price"))
    assert(mn.head().getDouble(0) === 0.5)

    // a WHERE clause forces a real scan
    assert(planOf("SELECT count(*) FROM gagg.t WHERE id > 1").contains("BatchScan"))
    assert(spark.sql("SELECT count(*) FROM gagg.t WHERE id > 1").head().getLong(0) === 3)
    // GROUP BY forces a real scan
    assert(planOf("SELECT name, count(*) FROM gagg.t GROUP BY name").contains("BatchScan"))
  }
}
