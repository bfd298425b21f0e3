package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.TableStore
import graft.ops.{Dedup, Validation}

/** Property-style tests over seeded random inputs (SURVEY §5: the
  * reference only tests merge/dedup idempotence manually). Deterministic
  * seeds keep failures reproducible without a generator framework
  * runner.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  def randomRows(seed: Long, n: Int): Seq[(Long, Long, String)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)((rnd.nextInt(20).toLong, rnd.nextInt(50).toLong,
      "v" + rnd.nextInt(1000)))
  }

  test("latestVersionAgg (scale path) == window row_number (reference shape)") {
    for (seed <- 1L to 5L) {
      val df = randomRows(seed, 300).toDF("id", "ver", "v")
      val aggForm = Dedup.latestVersionAgg(df, Seq("id"),
          struct(col("ver"), col("v"))) // total order incl. tie-break
        .as[(Long, Long, String)].collect().toSet
      val windowForm = Dedup.latestVersion(
          df, Seq("id"), "ver", Seq(col("v").desc))
        .as[(Long, Long, String)].collect().toSet
      assert(aggForm === windowForm, s"seed=$seed")
    }
  }

  test("exact dedup is idempotent and key-unique") {
    for (seed <- 1L to 5L) {
      val df = randomRows(seed, 200).toDF("id", "ver", "v")
      val once = Dedup.exact(df, Seq("id", "ver"))
      val twice = Dedup.exact(once, Seq("id", "ver"))
      assert(once.count() === twice.count(), s"seed=$seed")
      assert(once.groupBy("id", "ver").count().filter(col("count") > 1).count() === 0)
    }
  }

  test("Ivm count/sum, max, and distinct views converge to the direct " +
      "aggregate over random mutation sequences") {
    for (seed <- 1L to 3L) {
      val rnd = new scala.util.Random(seed)
      val ts = new TableStore(spark,
        Files.createTempDirectory(s"prop_ivm_$seed").toString)
      def rows(n: Int, keyBase: Long) = Seq.fill(n)(
        (keyBase + rnd.nextInt(1000), rnd.nextInt(8).toLong,
          rnd.nextInt(30).toLong + 1L))
      ts.create("src", rows(120, 0).distinctBy(_._1).toDF("k", "grp", "qty"))
      ts.setChangeFeed("src", true)
      val v0 = ts.currentVersion("src")
      ts.create("vcs", ts.readVersion("src", v0).groupBy("grp")
        .agg(count(lit(1)).as("n_rows"), sum("qty").as("sum_qty")))
      ts.create("vmx", ts.readVersion("src", v0).groupBy("grp")
        .agg(max("qty").as("mx")))
      ts.create("vdx", ts.readVersion("src", v0).groupBy("grp", "qty")
        .agg(count(lit(1)).as("n_rows"), sum("qty").as("sum_qty")))
      // random backlog: deletes, group-moving + value-moving updates,
      // appends with fresh keys
      for (i <- 1 to 4) rnd.nextInt(3) match {
        case 0 => ts.delete("src", col("k") % 7 === rnd.nextInt(7).toLong)
        case 1 => ts.update("src", col("qty") % 5 === rnd.nextInt(5).toLong,
          Map("grp" -> (col("grp") + 10L), "qty" -> (col("qty") + 3L)))
        case 2 => ts.append("src",
          rows(40, 100000L * i).distinctBy(_._1).toDF("k", "grp", "qty"))
      }
      val vEnd = ts.currentVersion("src")
      val feed = ts.readChangesBetween("src", v0, vEnd).localCheckpoint()
      graft.ops.Ivm.applyCountSumDelta(ts, "vcs", feed, Seq("grp"), "qty")
      graft.ops.Ivm.applyMaxDelta(ts, "vmx", "src", vEnd, feed, Seq("grp"), "qty")
      graft.ops.Ivm.applyCountSumDelta(ts, "vdx", feed, Seq("grp", "qty"), "qty")
      val src = ts.read("src").cache()
      assert(graft.ops.Ivm.readView(ts, "vcs")
        .as[(Long, Long, Long)].collect().toSet ===
        src.groupBy("grp").agg(count(lit(1)).as("n"), sum("qty").as("s"))
          .as[(Long, Long, Long)].collect().toSet, s"seed=$seed count/sum")
      assert(graft.ops.Ivm.readMaxView(ts, "vmx")
        .as[(Long, Long)].collect().toSet ===
        src.groupBy("grp").agg(max("qty").as("mx"))
          .as[(Long, Long)].collect().toSet, s"seed=$seed max")
      assert(graft.ops.Ivm.readView(ts, "vdx").groupBy("grp")
        .agg(count(lit(1)).as("nd")).as[(Long, Long)].collect().toSet ===
        src.groupBy("grp").agg(countDistinct(col("qty")).as("nd"))
          .as[(Long, Long)].collect().toSet, s"seed=$seed distinct")
      src.unpersist()
    }
  }

  test("Ivm join view converges to the direct join over random source + " +
      "dim mutation sequences applied in multiple batches") {
    for (seed <- 1L to 3L) {
      val rnd = new scala.util.Random(seed)
      val ts = new TableStore(spark,
        Files.createTempDirectory(s"prop_jv_$seed").toString)
      def rows(n: Int, keyBase: Long) = Seq.fill(n)(
        (keyBase + rnd.nextInt(1000), rnd.nextInt(20).toLong,
          rnd.nextInt(30).toLong + 1L))
      ts.create("src", rows(100, 0).distinctBy(_._1).toDF("k", "fk", "qty"))
      ts.setChangeFeed("src", true)
      ts.create("dim", (0L until 20L).map(f => (f, s"a$f")).toDF("fk", "attr"))
      ts.setChangeFeed("dim", true)
      def enrich(r: org.apache.spark.sql.DataFrame) = r
        .join(broadcast(ts.read("dim")), Seq("fk"), "left")
        .select(col("k"), col("fk"), col("qty"), col("attr"))
      val v0 = ts.currentVersion("src")
      ts.create("view",
        enrich(ts.readVersion("src", v0)).withColumn("_live", lit(true)))
      var lastV = v0
      for (i <- 1 to 3) {
        // random source backlog: deletes, FK-moving + value-moving
        // updates (a key can be hit by several commits in one batch),
        // fresh-key appends — plus an occasional dim rename
        for (_ <- 1 to 2) rnd.nextInt(3) match {
          case 0 => ts.delete("src", col("k") % 5 === rnd.nextInt(5).toLong)
          case 1 => ts.update("src", col("qty") % 4 === rnd.nextInt(4).toLong,
            Map("fk" -> ((col("fk") + 3L) % 20L), "qty" -> (col("qty") + 5L)))
          case 2 => ts.append("src",
            rows(30, 10000L * i).distinctBy(_._1).toDF("k", "fk", "qty"))
        }
        val dv0 = ts.currentVersion("dim")
        if (rnd.nextBoolean())
          ts.update("dim", col("fk") % 3 === rnd.nextInt(3).toLong,
            Map("attr" -> concat(col("attr"), lit("!"))))
        val vEnd = ts.currentVersion("src")
        val aff = ts.readChangesBetween("dim", dv0, ts.currentVersion("dim"))
          .select("fk")
        graft.ops.Ivm.applyJoinDelta(ts, "view", "src", lastV, vEnd,
          Seq("k"), enrich, dimAffected = Some((aff, Seq("fk"))))
        lastV = vEnd
      }
      graft.ops.Ivm.compactDeadJoin(ts, "view", Seq("k"))
      val got = graft.ops.Ivm.readJoinView(ts, "view")
        .as[(Long, Long, Long, String)].collect().toSet
      val want = enrich(ts.read("src"))
        .as[(Long, Long, Long, String)].collect().toSet
      assert(got === want, s"seed=$seed join view diverged")
    }
  }

  test("Ivm two-sided join view converges over random mutation sequences " +
      "on both sides (join-key moves included), multi-batch") {
    for (seed <- 1L to 3L) {
      val rnd = new scala.util.Random(seed)
      val ts = new TableStore(spark,
        Files.createTempDirectory(s"prop_j2_$seed").toString)
      def aRows(n: Int, base: Long) = Seq.fill(n)(
        (base + rnd.nextInt(500), rnd.nextInt(12).toLong, rnd.nextInt(100).toLong))
      def bRows(n: Int, base: Long) = Seq.fill(n)(
        (base + rnd.nextInt(500), rnd.nextInt(12).toLong, rnd.nextInt(100).toLong))
      ts.create("ta", aRows(60, 0).distinctBy(_._1).toDF("ka", "j", "av"))
      ts.setChangeFeed("ta", true)
      ts.create("tb", bRows(60, 0).distinctBy(_._1).toDF("kb", "j", "bv"))
      ts.setChangeFeed("tb", true)
      def combine(a: org.apache.spark.sql.DataFrame,
                  b: org.apache.spark.sql.DataFrame) =
        a.join(b.select(col("kb"), col("j").as("bj"), col("bv")),
            col("j") === col("bj"))
          .select(col("ka"), col("kb"), col("j"), col("av"), col("bv"))
      var (av, bv) = (ts.currentVersion("ta"), ts.currentVersion("tb"))
      ts.create("pairs",
        combine(ts.readVersion("ta", av), ts.readVersion("tb", bv))
          .withColumn("_live", lit(true)))
      // each append gets a DISJOINT key range: the sides' tables must
      // stay unique on their keys (the view's contract) even when one
      // batch rolls `append` twice
      var fresh = 0
      def base(): Long = { fresh += 1; 10000L * fresh }
      for (_ <- 1 to 3) {
        for (_ <- 1 to 2) rnd.nextInt(3) match {
          case 0 => ts.delete("ta", col("ka") % 6 === rnd.nextInt(6).toLong)
          case 1 => ts.update("ta", col("av") % 4 === rnd.nextInt(4).toLong,
            Map("j" -> ((col("j") + 5L) % 12L))) // join-key move
          case 2 => ts.append("ta",
            aRows(20, base()).distinctBy(_._1).toDF("ka", "j", "av"))
        }
        for (_ <- 1 to 2) rnd.nextInt(3) match {
          case 0 => ts.delete("tb", col("kb") % 6 === rnd.nextInt(6).toLong)
          case 1 => ts.update("tb", col("bv") % 4 === rnd.nextInt(4).toLong,
            Map("j" -> ((col("j") + 7L) % 12L)))
          case 2 => ts.append("tb",
            bRows(20, base()).distinctBy(_._1).toDF("kb", "j", "bv"))
        }
        val (a1, b1) = (ts.currentVersion("ta"), ts.currentVersion("tb"))
        graft.ops.Ivm.applyTwoSidedJoinDelta(ts, "pairs",
          "ta", av, a1, Seq("ka"), "tb", bv, b1, Seq("kb"), combine)
        av = a1; bv = b1
      }
      graft.ops.Ivm.compactDeadJoin(ts, "pairs", Seq("ka", "kb"))
      val got = graft.ops.Ivm.readJoinView(ts, "pairs")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      val want = combine(ts.read("ta"), ts.read("tb"))
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(got === want, s"seed=$seed two-sided join view diverged")
    }
  }

  test("mergeUpsert is idempotent and preserves key-uniqueness") {
    for (seed <- 10L to 12L) {
      val store = new TableStore(spark, Files.createTempDirectory("prop").toString)
      val target = Dedup.exact(randomRows(seed, 100).toDF("id", "ver", "v"), Seq("id"))
      val source = Dedup.exact(randomRows(seed + 100, 100).toDF("id", "ver", "v"), Seq("id"))
      store.create("t", target)
      store.mergeUpsert("t", source, Seq("id"), changeTypeCol = None)
      val once = store.read("t").as[(Long, Long, String)].collect().toSet
      store.mergeUpsert("t", source, Seq("id"), changeTypeCol = None)
      val twice = store.read("t").as[(Long, Long, String)].collect().toSet
      assert(once === twice, s"seed=$seed")
      // post-merge: matched keys carry source content, unmatched target
      // rows survive, and keys stay unique
      val srcMap = source.as[(Long, Long, String)].collect()
        .map(r => r._1 -> r).toMap
      val tgtKeys = target.as[(Long, Long, String)].collect().map(_._1).toSet
      assert(once.map(_._1) === tgtKeys ++ srcMap.keySet)
      once.foreach { case row @ (k, _, _) =>
        srcMap.get(k).foreach(s => assert(row === s, s"seed=$seed key=$k"))
      }
    }
  }

  test("overwriteWhere == survivors UNION replacement, exactly one version, " +
      "for random predicates / multi-dir histories (model-based)") {
    for (seed <- 20L to 24L) {
      val rnd = new scala.util.Random(seed)
      val store = new TableStore(spark, Files.createTempDirectory("propow").toString)
      // multi-dir history: 2-4 appends, some followed by a DV delete, so
      // the replace meets carried dirs, DV'd dirs, and fresh dirs alike
      val chunks = 2 + rnd.nextInt(3)
      store.create("t", randomRows(seed, 80).toDF("id", "ver", "v"))
      (1 until chunks).foreach(i =>
        store.append("t", randomRows(seed * 31 + i, 80).toDF("id", "ver", "v")))
      if (rnd.nextBoolean())
        store.deleteVectorized("t", col("ver") % 7 === rnd.nextInt(7).toLong)
      val before = store.read("t").as[(Long, Long, String)].collect().toSeq
      val vBefore = store.currentVersion("t")
      // random region predicate + a replacement wholly inside it
      val mod = 2L + rnd.nextInt(5)
      val res = rnd.nextInt(mod.toInt).toLong
      val pred = col("id") % mod === res
      val repl = randomRows(seed * 101, 60).map { case (id, ver, v) =>
        (id * mod + res, ver, v) // id' % mod == res by construction
      }
      store.overwriteWhere("t", pred, repl.toDF("id", "ver", "v"))
      assert(store.currentVersion("t") === vBefore + 1, s"seed=$seed")
      val got = store.read("t").as[(Long, Long, String)].collect()
        .groupBy(identity).view.mapValues(_.length).toMap
      val want = (before.filterNot { case (id, _, _) => id % mod == res } ++ repl)
        .groupBy(identity).view.mapValues(_.length).toMap
      assert(got === want, s"seed=$seed mod=$mod res=$res")
    }
  }

  test("classify/errorList/qualityFlag are mutually consistent") {
    for (seed <- 1L to 3L) {
      val rules = Seq(
        Validation.Rule("R1", col("ver") % 3 === 0),
        Validation.Rule("R2", col("v").like("v1%")))
      val df = randomRows(seed, 200).toDF("id", "ver", "v")
        .select(col("*"),
          Validation.classify(rules).as("reason"),
          Validation.errorList(rules).as("errs"),
          Validation.qualityFlag(rules).as("flag"),
          Validation.anyFail(rules).as("fails"))
      // flag FAILED <=> some rule fails <=> classify non-null <=> errs non-empty
      assert(df.filter(col("fails") =!= (col("flag") === "FAILED_VALIDATION")).count() === 0)
      assert(df.filter(col("fails") =!= col("reason").isNotNull).count() === 0)
      assert(df.filter(col("fails") =!= (length(col("errs")) > 0)).count() === 0)
      // classify reports the FIRST failing rule
      assert(df.filter(col("ver") % 3 === 0 && col("reason") =!= "R1").count() === 0)
    }
  }

  /** The prune is sound iff, for ANY predicate, pruned dirs contain no
    * matching row — then update/delete over (touched dirs + carried
    * dirs) equals the same operation over a full rewrite. Seeded random
    * multi-dir tables x a predicate zoo, compared against DataFrame
    * reference semantics computed BEFORE the mutation. */
  private def pruneSoundness(seed: Long, bloom: Boolean): Unit = {
    val ts = new TableStore(spark, Files.createTempDirectory("propprune").toString)
    val rnd = new scala.util.Random(seed)
    def batch(n: Int) = Seq.fill(n)(
      (rnd.nextInt(1000).toLong, rnd.nextInt(100).toLong, "s" + rnd.nextInt(10),
        rnd.nextBoolean())).toDF("id", "ver", "tag", "flag")
    ts.create("t", batch(40))
    (1 to 4).foreach(_ => ts.append("t", batch(40)))
    if (bloom) ts.setBloomColumns("t", Seq("id", "tag"))
    val preds = Seq(
      col("id") < 100L, col("id") >= 900L, col("id") === 512L,
      col("ver") > 50L && col("tag") === "s3",
      col("tag").isin("s1", "s7"), col("flag"),
      col("tag").startsWith("s"), col("id") % 7 === 0, /* untranslatable */
      // point shapes the bloom index handles: present and absent keys
      col("id") === 123456L /* absent everywhere */,
      col("tag") === "s5" && col("id") < 500L)
    for (p <- preds) {
      val expectDel = ts.read("t").filter(!coalesce(p, lit(false)))
        .collect().map(_.toSeq).toSet
      ts.delete("t", p)
      val gotDel = ts.read("t").collect().map(_.toSeq).toSet
      assert(gotDel === expectDel, s"seed=$seed bloom=$bloom predicate=$p (delete)")
      val expectUpd = ts.read("t")
        .withColumn("ver", when(p, lit(-1L)).otherwise(col("ver")))
        .collect().map(_.toSeq).toSet
      ts.update("t", p, Map("ver" -> lit(-1L)))
      assert(ts.read("t").collect().map(_.toSeq).toSet === expectUpd,
        s"seed=$seed bloom=$bloom predicate=$p (update)")
    }
  }

  test("stats-pruned UPDATE/DELETE never lose or miss rows (soundness)") {
    for (seed <- 1L to 3L) pruneSoundness(seed, bloom = false)
  }

  test("bloom-pruned UPDATE/DELETE never lose or miss rows (soundness)") {
    for (seed <- 1L to 3L) pruneSoundness(seed, bloom = true)
  }

  test("random rename chains interleaved with writes/deletes stay consistent") {
    // column mapping under churn: renames (including reuse of a name
    // another column just vacated) interleave with appends and pruned
    // deletes; the table must always equal a plain in-memory model
    for (seed <- 1L to 3L) {
      val ts = new TableStore(spark, Files.createTempDirectory("proprn").toString)
      val rnd = new scala.util.Random(seed)
      var names = Vector("a", "b", "s")
      var model = Vector.empty[(Long, Long, String)]
      var freshId = 0
      def batch(n: Int) = Seq.fill(n)(
        (rnd.nextInt(500).toLong, rnd.nextInt(100).toLong, "s" + rnd.nextInt(5)))
      val first = batch(30)
      model ++= first
      ts.create("t", first.toDF(names: _*))
      for (_ <- 1 to 12) rnd.nextInt(3) match {
        case 0 => // rename a random column to a fresh name
          val i = rnd.nextInt(3)
          freshId += 1
          val to = s"c$freshId"
          ts.renameColumn("t", names(i), to)
          names = names.updated(i, to)
        case 1 =>
          val rows = batch(20)
          model ++= rows
          ts.append("t", rows.toDF(names: _*))
        case 2 => // pruned delete through a CURRENT name
          val cut = rnd.nextInt(500).toLong
          ts.delete("t", col(names(0)) < cut)
          model = model.filterNot(_._1 < cut)
      }
      val got = ts.read("t").select(names.map(col): _*)
        .as[(Long, Long, String)].collect().toSeq.sorted
      assert(got === model.sorted, s"seed=$seed names=$names")
    }
  }

  test("bloom flagged set is a superset of the exact match set (random corpora)") {
    import graft.ops.Corpus
    val mBits = 1L << 15 // small on purpose: real FPs, so the subset
    val k = 4            // property is tested against a non-trivial set
    for (seed <- 1L to 3L) {
      val rnd = new scala.util.Random(seed)
      // reference ~200 keys; probe ~2000 keys with partial overlap
      val ref = Seq.fill(200)("k" + rnd.nextInt(800)).distinct
      val probe = Seq.fill(2000)("k" + rnd.nextInt(3000))
      val bits = Corpus.bloomBuild(ref.toDF("key"), col("key"), mBits, k)
      val flagged = Corpus.bloomMaybeContains(
          probe.toDF("key"), col("key"), bits, mBits, k)
        .as[String].collect().toSet
      val exact = probe.toSet.intersect(ref.toSet)
      assert(exact.subsetOf(flagged), s"seed=$seed: bloom dropped a true match")
      // and the build is insensitive to duplication + partitioning
      val bits2 = Corpus.bloomBuild(
        (ref ++ ref ++ ref).toDF("key").repartition(7), col("key"), mBits, k)
      assert(java.util.Arrays.equals(bits, bits2),
        s"seed=$seed: bitset depends on duplication/partitioning")
    }
  }

  test("packSequences: bins never exceed budget boundaries and cover every doc") {
    import graft.ops.Corpus
    for (seed <- 1L to 3L) {
      val rnd = new scala.util.Random(seed)
      val docs = (0L until 400L).map(i => (i, rnd.nextInt(200).toLong + 1L))
        .toDF("id", "tok")
      val packed = Corpus.packSequences(docs, "id", "tok", budget = 256L)
        .orderBy("id").collect()
      assert(packed.length === 400, s"seed=$seed: docs dropped")
      var cum = 0L
      packed.foreach { r =>
        assert(r.getLong(2) === cum, s"seed=$seed: start is not the prefix sum")
        // the bin is purely start/budget — never influenced by partitioning
        assert(r.getLong(3) === cum / 256, s"seed=$seed: bin != start/budget")
        cum += r.getLong(1)
      }
    }
  }

  test("first-occurrence keeper is unique per distinct segment (random corpora)") {
    // the x14 core invariant on random data: grouping occurrences by
    // segment and keeping min(occ) yields exactly one survivor per
    // distinct segment, and every survivor is a real occurrence
    for (seed <- 1L to 3L) {
      val rnd = new scala.util.Random(seed)
      val occs = Seq.fill(500)((rnd.nextInt(40).toLong, rnd.nextInt(30).toLong))
        .distinct.map { case (d, g) => (d, g, s"seg${rnd.nextInt(60)}", d * 1000000L + g) }
        .toDF("doc_id", "g", "seg", "occ")
      val keep = occs.groupBy("seg").agg(min(col("occ")).as("keeper"))
      val kept = occs.join(keep, Seq("seg"))
        .filter(col("occ") === col("keeper"))
      assert(kept.count() === occs.select("seg").distinct().count(),
        s"seed=$seed: survivors != distinct segments")
      assert(kept.groupBy("seg").count().filter(col("count") > 1).count() === 0L,
        s"seed=$seed: a segment survived twice")
    }
  }

  test("packedOcc: in-range packs losslessly; out-of-range RAISES " +
      "instead of silently colliding") {
    val rnd = new scala.util.Random(8L)
    val pairs = Seq.fill(200)((rnd.nextLong(9000000000000L), rnd.nextInt(1000000).toLong))
    val got = pairs.toDF("doc_id", "g")
      .select(graft.ops.Corpus.packedOcc(col("doc_id"), col("g")).as("occ"))
      .as[Long].collect()
    assert(got.toSeq === pairs.map { case (d, g) => d * 1000000L + g })
    for ((d, g) <- Seq((1L, 1000000L), (-1L, 0L), (Long.MaxValue / 1000000L, 0L))) {
      val e = intercept[Exception](
        Seq((d, g)).toDF("doc_id", "g")
          .select(graft.ops.Corpus.packedOcc(col("doc_id"), col("g")))
          .collect())
      assert(e.getMessage.contains("packedOcc out of range"), s"($d,$g): $e")
    }
  }

  test("audio headers round-trip: encode -> chunk-walk parse recovers " +
      "every field, WAV and AIFF") {
    import graft.functions.Multimodal
    val rnd = new scala.util.Random(11L)
    for (_ <- 1 to 100) {
      val sr = Seq(8000, 11025, 16000, 22050, 32000, 44100, 48000, 96000)(rnd.nextInt(8))
      val ch = rnd.nextInt(8) + 1
      val bits = Seq(8, 16, 24, 32)(rnd.nextInt(4))
      val n = rnd.nextInt(2000000).toLong
      val w = Multimodal.AudioDecoder.audioHeader(
        Multimodal.encodeWavHeader(sr, ch, bits, n))
      assert(w.contains(Multimodal.AudioHeaderFields("wav", sr, ch, bits, n)),
        s"wav sr=$sr ch=$ch bits=$bits n=$n -> $w")
      val a = Multimodal.AudioDecoder.audioHeader(
        Multimodal.encodeAiffHeader(sr, ch, bits, n))
      assert(a.contains(Multimodal.AudioHeaderFields("aiff", sr, ch, bits, n)),
        s"aiff sr=$sr ch=$ch bits=$bits n=$n -> $a")
    }
    // non-audio bytes never parse
    assert(Multimodal.AudioDecoder.audioHeader("not audio at all!!".getBytes).isEmpty)
  }

  test("deriveBandBits: clamped to [4,16], monotone in corpus size, " +
      "4-bit at both fixture scales") {
    val f = graft.QueriesLlm.deriveBandBits _
    assert(f(0L) === 4 && f(500L) === 4 && f(2000L) === 4) // fixtures stay at the gate-green width
    assert(f(Long.MaxValue) === 16)
    val pts = Seq(1L, 100L, 2048L, 32768L, 1000000L, 100000000L).map(f)
    assert(pts === pts.sorted, s"not monotone: $pts")
    assert(pts.forall(b => b >= 4 && b <= 16))
  }

  test("media header parsers survive hostile bytes: overflow-length " +
      "chunks, JPEG fill bytes, top-down BMPs, null payloads") {
    import graft.functions.Multimodal
    // RIFF chunk whose accepted length would overflow an Int index:
    // must parse as None, never crash on a negative array index
    def le32b(v: Long): Array[Byte] =
      Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
        ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    val hostileWav = "RIFF".getBytes ++ le32b(100) ++ "WAVE".getBytes ++
      "LIST".getBytes ++ le32b(0x7FFFFF00L) ++ Array.fill(8)(0.toByte)
    assert(Multimodal.AudioDecoder.audioHeader(hostileWav).isEmpty)
    val hostileAiff = "FORM".getBytes ++ le32b(100) ++ "AIFF".getBytes ++
      "JUNK".getBytes ++ Array(0x7F.toByte, 0xFF.toByte, 0xFF.toByte, 0.toByte) ++
      Array.fill(8)(0.toByte)
    assert(Multimodal.AudioDecoder.audioHeader(hostileAiff).isEmpty)
    // spec-legal 0xFF fill bytes between JPEG markers must not derail
    // the walk to the SOF0 frame header
    val jpegFill: Array[Byte] = Array(0xFF, 0xD8, 0xFF, 0xFF, 0xFF, 0xC0,
      0x00, 0x0B, 0x08, 0x00, 0x10, 0x00, 0x20, 0x03, 0x00, 0x00, 0x00)
      .map(_.toByte)
    assert(Multimodal.MediaDecoder.imageHeader(jpegFill) ===
      Some(("jpeg", 0x20, 0x10, 3)))
    // top-down BMP: biHeight is negative; magnitude is the real height
    val bmp = new Array[Byte](30)
    bmp(0) = 'B'; bmp(1) = 'M'; bmp(14) = 40
    bmp(18) = 64 // width
    val negH = le32b(0xFFFFFE20L) // -480
    Array.copy(negH, 0, bmp, 22, 4)
    bmp(28) = 24 // bpp
    assert(Multimodal.MediaDecoder.imageHeader(bmp) ===
      Some(("bmp", 64, 480, 3)))
    // null payloads: every entry point degrades, none crashes
    assert(Multimodal.MediaDecoder.imageHeader(null).isEmpty)
    assert(Multimodal.AudioDecoder.audioHeader(null).isEmpty)
    val m = Multimodal.MediaDecoder.decode(7L, "image", null)
    assert(m.n_bytes === 0 && m.width === 0)
  }

  /** Random predicate TREES (And/Or/Not nesting over translatable and
    * untranslatable leaves) — the shape class where a partial filter
    * translation is unsound: `(a AND udf(x)) OR b` weakened to
    * `a OR b` once let a metadata-only DELETE drop whole dirs. */
  private def randomPredicate(rnd: scala.util.Random, depth: Int)
      : org.apache.spark.sql.Column = {
    def leaf(): org.apache.spark.sql.Column = rnd.nextInt(8) match {
      case 0 => col("id") < rnd.nextInt(1000).toLong
      case 1 => col("id") >= rnd.nextInt(1000).toLong
      case 2 => col("id") === rnd.nextInt(1200).toLong
      case 3 => col("tag") === ("s" + rnd.nextInt(12))
      case 4 => col("ver") > rnd.nextInt(100).toLong
      case 5 => col("flag")
      case 6 => col("id") % (rnd.nextInt(9) + 2).toLong === 0L // untranslatable
      case _ => length(col("tag")) > rnd.nextInt(3)            // untranslatable
    }
    if (depth == 0) leaf()
    else rnd.nextInt(4) match {
      case 0 => randomPredicate(rnd, depth - 1) && randomPredicate(rnd, depth - 1)
      case 1 => randomPredicate(rnd, depth - 1) || randomPredicate(rnd, depth - 1)
      case 2 => !randomPredicate(rnd, depth - 1)
      case _ => leaf()
    }
  }

  private def treeSoundness(seed: Long, bloom: Boolean): Unit = {
    val ts = new TableStore(spark, Files.createTempDirectory("proptree").toString)
    val rnd = new scala.util.Random(seed)
    def batch(n: Int) = Seq.fill(n)(
      (rnd.nextInt(1000).toLong, rnd.nextInt(100).toLong, "s" + rnd.nextInt(10),
        rnd.nextBoolean())).toDF("id", "ver", "tag", "flag")
    ts.create("t", batch(40))
    (1 to 4).foreach(_ => ts.append("t", batch(40)))
    if (bloom) ts.setBloomColumns("t", Seq("id", "tag"))
    for (i <- 1 to 6) {
      val p = randomPredicate(rnd, 2)
      val expect = ts.read("t").filter(!coalesce(p, lit(false)))
        .collect().map(_.toSeq).toSet
      ts.delete("t", p)
      assert(ts.read("t").collect().map(_.toSeq).toSet === expect,
        s"seed=$seed bloom=$bloom round=$i predicate=$p")
    }
  }

  test("random nested predicate trees: pruned DELETE == reference " +
      "semantics (metadata path can never act on a weakened filter)") {
    for (seed <- 1L to 4L) treeSoundness(seed, bloom = seed % 2 == 0)
  }
}
