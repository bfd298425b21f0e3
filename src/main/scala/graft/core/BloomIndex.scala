package graft.core

import java.nio.file.{Files, Path, StandardCopyOption}
import scala.collection.mutable
import scala.util.Using

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, input_file_name, when, xxhash64}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Per-dir bloom-filter index for point-predicate data skipping — the
  * complement of [[DirStats]] min/max pruning.
  *
  * Min/max stats prune range-clustered data but are useless for a
  * high-cardinality key written in arrival order: every dir's
  * [min,max] spans nearly the whole id space, so a point lookup (the
  * GDPR delete `customer_id = X`,
  * /root/reference/silver/jobs/bronze_mark_deleted_by_customer.py:126-134)
  * still touches every dir. A bloom filter per (dir, column) answers
  * "does this dir possibly contain X" with a ~1% false-positive rate —
  * at 100 TB a point UPDATE/DELETE/SELECT rewrites or scans the one
  * or two dirs that truly contain the key instead of all of them.
  * Delta's bloom-filter index and Iceberg's parquet bloom filters play
  * the same role; here the index lives beside the manifest so pruning
  * happens at PLAN time, before any file is listed.
  *
  * Layout: `<table>/_bloom/<dir with '/'→'__'>.<column>.bloom`, one
  * spark-sketch BloomFilter per file, keyed by the dir name — dirs are
  * immutable, so a bloom never changes once written and carried dirs
  * keep their files across versions with zero work. A missing file
  * means "might match" (soundness default), so the index can be
  * enabled, backfilled, or partially built at any time.
  *
  * Hashing: values are hashed with Spark's `xxhash64(col)` (seed 42)
  * on the build side and the identical Catalyst expression evaluated
  * driver-side on the probe side, so executor and driver can never
  * disagree on a value's hash. Only exact-match-friendly types are
  * indexed (int/long/string/date/timestamp); floats are excluded
  * (NaN/-0.0 equality pitfalls), decimals because their hash depends
  * on precision internals.
  */
object BloomIndex {

  /** False-positive probability per dir — at 0.01, a 1000-dir table
    * falsely rewrites ~10 extra dirs per point mutation, still ~100x
    * better than all of them. */
  private val Fpp = 0.01

  /** Bits are sized from the dir's row count; floor for tiny dirs. */
  private val MinExpected = 64L
  /** Fallback when a dir has no manifest row count (no reliable stats). */
  private val DefaultExpected = 1000000L

  def supportedType(dt: DataType): Boolean = dt match {
    case IntegerType | LongType | StringType | DateType | TimestampType => true
    case _ => false
  }

  private def enc(dirName: String): String = dirName.replace("/", "__")

  def bloomFile(bloomRoot: Path, dirName: String, column: String): Path =
    bloomRoot.resolve(s"${enc(dirName)}.$column.bloom")

  /** Build the missing (dir, column) bloom files in ONE Spark job over
    * all dirs that lack any — a single multi-path scan column-pruned to
    * the indexed columns, partials merged per dir. Idempotent: already-
    * built dirs cost a Files.exists check and nothing else. */
  def ensure(spark: SparkSession, bloomRoot: Path, dataRoot: Path,
             dirs: Seq[String], cols: Seq[String], schema: StructType,
             rowsByDir: Map[String, Long]): Unit = {
    if (cols.isEmpty || dirs.isEmpty) return
    Files.createDirectories(bloomRoot)
    val missing = dirs.filter(d =>
      Files.isDirectory(dataRoot.resolve(d)) &&
        cols.exists(c => !Files.exists(bloomFile(bloomRoot, d, c))))
    if (missing.isEmpty) return
    val expected = missing.map(d =>
      d -> math.max(rowsByDir.getOrElse(d, DefaultExpected), MinExpected)).toMap
    val parentToDir = missing.map(d =>
      dataRoot.resolve(d).toAbsolutePath.normalize.toString -> d).toMap
    val nCols = cols.length
    // null values carry no point-lookup information: mask them BEFORE
    // hashing (xxhash64 of a null input is the seed, not null — an
    // unmasked build would insert the constant seed-42 hash for every
    // null row, inflating the false-positive rate for nothing)
    val hashed = spark.read.schema(schema)
      .parquet(missing.map(d => dataRoot.resolve(d).toString): _*)
      .select(input_file_name().as("__f") +:
        cols.map(c => when(col(c).isNotNull, xxhash64(col(c))).as(c)): _*)
    val bcParent = spark.sparkContext.broadcast(parentToDir)
    val bcExp = spark.sparkContext.broadcast(expected)
    // per-partition partial blooms, merged with fold (empty-safe): same
    // (expected, fpp) per dir -> compatible bit arrays, mergeInPlace
    // works. Each partial also counts the rows it hashed, so a row
    // silently dropped by the parent-path mapping becomes a LOUD
    // build failure below instead of a permanently unsound index.
    val partials = hashed.rdd.mapPartitions { it =>
      val m = mutable.HashMap[String, (Array[BloomFilter], Long)]()
      it.foreach { row =>
        val f = row.getString(0)
        val path = if (f.startsWith("file:")) new java.net.URI(f).getPath else f
        val parent = path.substring(0, path.lastIndexOf('/'))
        bcParent.value.get(parent).foreach { dname =>
          val (arr, n) = m.getOrElseUpdate(dname,
            (Array.fill(nCols)(BloomFilter.create(bcExp.value(dname), Fpp)), 0L))
          var i = 0
          while (i < nCols) {
            if (!row.isNullAt(i + 1)) arr(i).putLong(row.getLong(i + 1))
            i += 1
          }
          m(dname) = (arr, n + 1L)
        }
      }
      Iterator.single(m)
    }
    val merged = partials.fold(
        mutable.HashMap.empty[String, (Array[BloomFilter], Long)]) {
      (a, b) =>
        b.foreach { case (d, (arr, n)) =>
          a.get(d) match {
            case Some((dst, dn)) =>
              var i = 0
              while (i < nCols) { dst(i).mergeInPlace(arr(i)): Unit; i += 1 }
              a(d) = (dst, dn + n)
            case None => a(d) = (arr, n)
          }
        }
        a
    }
    // every row of every dir must have reached SOME partial: a count
    // mismatch means the path mapping dropped rows and the bloom under
    // construction is missing keys — dirs are immutable, so installing
    // it would make point lookups wrong FOREVER. Fail the build instead
    // (a missing bloom file is sound: "might match").
    missing.foreach { d =>
      rowsByDir.get(d).foreach { want =>
        val got = merged.get(d).map(_._2).getOrElse(0L)
        if (got != want)
          throw new IllegalStateException(
            s"bloom build for dir $d hashed $got rows but the manifest " +
              s"records $want — file-to-dir mapping dropped rows; refusing " +
              "to install an index that would miss keys")
      }
    }
    missing.foreach { d =>
      // a dir with no rows gets an empty bloom (prunes every point lookup)
      val arr = merged.get(d).map(_._1).getOrElse(
        Array.fill(nCols)(BloomFilter.create(MinExpected, Fpp)))
      cols.zipWithIndex.foreach { case (c, i) =>
        val target = bloomFile(bloomRoot, d, c)
        if (!Files.exists(target)) {
          // unique tmp per writer: two sessions committing concurrently
          // both run ensure for the same dir — a SHARED tmp would
          // interleave their bytes and atomically install a corrupt bloom
          val tmp = target.resolveSibling(target.getFileName.toString +
            "." + java.util.UUID.randomUUID.toString.take(8) + ".tmp")
          Using.resource(Files.newOutputStream(tmp))(os => arr(i).writeTo(os))
          Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
            StandardCopyOption.REPLACE_EXISTING): Unit
        }
      }
    }
  }

  /** Drop dirs whose blooms PROVE no row can satisfy `filters` (same
    * conjunct semantics as [[StatsPruning.liveDirs]]; missing bloom
    * file, unindexed column, untranslatable value -> "might match").
    * Only point shapes prune: EqualTo / non-null EqualNullSafe / In,
    * composed through And/Or. */
  /** `phys` maps a logical column to its PHYSICAL name (column
    * mapping) — sidecar files are keyed by physical name so they stay
    * valid across RENAME COLUMN; filters and `cols` speak logical. */
  def prune(dirs: Seq[String], filters: Seq[Filter], schema: StructType,
            cols: Seq[String], bloomRoot: Path,
            phys: String => String = identity): Seq[String] = {
    if (cols.isEmpty || filters.isEmpty || dirs.isEmpty) return dirs
    def indexed(a: String): Option[String] = cols.find(_.equalsIgnoreCase(a))
    dirs.filter { d =>
      // blooms cached for THIS dir only and released after its verdict:
      // a point DELETE over thousands of surviving dirs must not pile
      // O(dirs x cols) megabyte bitsets onto the driver at once
      val cache = mutable.HashMap[String, Option[BloomFilter]]()
      def load(c: String): Option[BloomFilter] =
        cache.getOrElseUpdate(c, {
          val p = bloomFile(bloomRoot, d, phys(c))
          // unreadable = "might match": the file may have been swept by
          // a concurrent vacuum between the exists check and the read,
          // or be corrupt — degrading to no-prune is the soundness
          // default; failing the whole plan is not
          try {
            if (!Files.exists(p)) None
            else Using.resource(Files.newInputStream(p))(is =>
              Some(BloomFilter.readFrom(is)))
          } catch { case _: Exception => None }
        })
      def absent(a: String, v: Any): Boolean = (for {
        c <- indexed(a)
        h <- hashOf(schema, c, v)
        bf <- load(c)
      } yield !bf.mightContainLong(h)).getOrElse(false)
      def cannotMatch(f: Filter): Boolean = f match {
        case EqualTo(a, v) => absent(a, v)
        case EqualNullSafe(a, v) if v != null => absent(a, v)
        case In(a, vs) => vs != null && vs.nonEmpty && vs.forall(v => absent(a, v))
        case And(l, r) => cannotMatch(l) || cannotMatch(r)
        case Or(l, r) => cannotMatch(l) && cannotMatch(r)
        case _ => false
      }
      !filters.exists(cannotMatch)
    }
  }

  /** Driver-side hash of a literal — the SAME expression the build side
    * ran on executors (`xxhash64(col)`), evaluated over a one-value
    * Literal, so both sides agree bit-for-bit. Values normalize through
    * [[StatsPruning.canonValue]] (external and catalyst-internal literal
    * forms both arrive here). */
  private[graft] def hashOf(schema: StructType, name: String, v: Any): Option[Long] = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    val dt = schema.fields.collectFirst {
      case f if f.name.equalsIgnoreCase(name) => f.dataType
    }
    dt.flatMap(t => StatsPruning.canonValue(v, t).flatMap { cv =>
      val internal: Option[(Any, DataType)] = (t, cv) match {
        case (StringType, s: String) =>
          Some((org.apache.spark.unsafe.types.UTF8String.fromString(s), StringType))
        case (IntegerType, x: Int) => Some((x, IntegerType))
        case (LongType, x: Long) => Some((x, LongType))
        case (DateType, x: Int) => Some((x, DateType))
        case (TimestampType, x: Long) => Some((x, TimestampType))
        case _ => None
      }
      internal.map { case (iv, idt) =>
        // seed 42 = the default the SQL xxhash64() function uses
        XxHash64(Seq(Literal(iv, idt)), 42L).eval(null).asInstanceOf[Long]
      }
    })
  }

  /** Delete bloom files not belonging to any live dir (vacuum hook). */
  /** Sidecars of dirs outside `liveDirs` are swept — immediately when
    * some on-disk manifest still names the dir (`referencedDirs`:
    * superseded history), but with a >1h age guard when NO manifest
    * does: blooms are written during commitManifest BEFORE the
    * manifest lands, so a young unreferenced sidecar may belong to a
    * commit in flight (the same guard every other write scratch has). */
  def sweep(bloomRoot: Path, liveDirs: Set[String],
            referencedDirs: Set[String] = Set.empty,
            dryRun: Boolean = false): Seq[Path] = {
    if (!Files.isDirectory(bloomRoot)) return Seq.empty
    val livePrefixes = liveDirs.map(d => enc(d) + ".")
    val refPrefixes = referencedDirs.map(d => enc(d) + ".")
    val all = Using.resource(Files.list(bloomRoot))(s =>
      scala.jdk.CollectionConverters.IteratorHasAsScala(s.iterator()).asScala.toSeq)
    def old(p: Path): Boolean =
      (try Files.getLastModifiedTime(p).toMillis
       catch { case _: java.io.IOException => System.currentTimeMillis() }) <
        System.currentTimeMillis() - 3600L * 1000
    val doomed = all.filter { p =>
      val n = p.getFileName.toString
      // crashed builds leave uniquely-named .tmp files behind — age-swept
      (n.endsWith(".tmp") && old(p)) ||
      (n.endsWith(".bloom") && !livePrefixes.exists(n.startsWith) &&
        (refPrefixes.exists(n.startsWith) || old(p)))
    }
    if (!dryRun) doomed.foreach(Files.deleteIfExists(_))
    doomed
  }
}
