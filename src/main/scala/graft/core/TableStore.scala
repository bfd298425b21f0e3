package graft.core

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}
import scala.jdk.CollectionConverters._
import scala.util.Using

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, DataType, DateType, DecimalType, DoubleType, FloatType, IntegerType, LongType, ShortType, StructType, TimestampNTZType}

/** Versioned Parquet tables with atomic commit — the row-level mutation
  * layer (MERGE / UPDATE / DELETE / INSERT OVERWRITE / APPEND) that the
  * reference gets from Delta Lake and vanilla Spark 4 lacks.
  *
  * Reference behavior replicated (citations into /root/reference):
  *  - MERGE upsert on composite key: bronze/jobs/load_bronze.py:66-109
  *  - MERGE upsert on single key:    silver/jobs/load_silver.py:82-127
  *  - MERGE delete (keys-driven):    silver/jobs/silver_propagate_deletes.py:150-155
  *  - MERGE update-only (SCD2 close): Gold/dim/gold_dim_customer_scd2.py:182-191
  *  - UPDATE (soft delete):          silver/jobs/bronze_mark_deleted_by_customer.py:126-134
  *  - INSERT OVERWRITE (schema-preserving): bronze/jobs/validate_bronze.py:172-181
  *  - MERGE source-uniqueness precondition: README.md:213-217
  *
  * Layout (Delta-VLDB-paper-style log WITH checkpointing):
  *   root/<table>/data/b<0-padded n>[/__b=<k>]/  immutable parquet dirs
  *   root/<table>/_v/<n>.json                    commit record: full snapshot,
  *                                               or an O(changed dirs) delta
  *                                               against version n-1
  *   root/<table>/_v/<n>.ckpt.json               full-snapshot checkpoint,
  *                                               every K delta commits
  *   root/<table>/_LATEST                        current version (atomic swap)
  *
  * Readers resolve _LATEST -> manifest -> one multi-path scan of live
  * dirs, so concurrent readers never observe a half-written version;
  * writers commit by writing the next manifest then atomically replacing
  * _LATEST. Old versions stay readable (time travel via readVersion).
  *
  * Scale (100 TB): APPEND is O(new data) — it adds dirs. For tables
  * created with [[createBucketed]], data lives in hash-bucket leaf dirs
  * (`__b=<k>` by pmod(hash(bucketKeys), n)) and key-driven mutations
  * (mergeUpsert / mergeDelete) REWRITE ONLY THE BUCKETS THE SOURCE KEYS
  * TOUCH — a CDC batch hitting 3 of 256 buckets rewrites ~1% of the
  * table, the manifest-level equivalent of Delta's file pruning. The
  * merge itself is a single shuffled full-outer join; no driver-side
  * row handling anywhere (only the source's distinct bucket ids are
  * collected — at most n integers).
  */
object TableStore {

  final case class Bucketing(keys: Seq[String], n: Int) {
    def expr: Column = pmod(hash(keys.map(col): _*), lit(n))
  }

  /** Per-table-path monitor serializing `_LATEST` pointer moves for
    * every same-process writer, whatever TableStore instance they hold
    * (tests and the catalog routinely open several stores on one root).
    * Entries are tiny and tables finite; never evicted. */
  private[core] val latestPtrLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Deletion-vector reference for one dir: `path` names a sidecar
    * parquet dataset under `_dv/` holding (relpath, pos) rows — the
    * file-relative row positions deleted from this dir — and `deleted`
    * counts them (metadata-only COUNT adjustments). Dirs stay
    * immutable; a DV commit changes only the manifest + sidecar. */
  final case class DvRef(path: String, deleted: Long)

  /** A parsed manifest: the complete committed state of one version. */
  /** `txns`: per-writer transaction high-watermarks (streaming query id
    * -> last committed epoch), carried through every commit — the
    * Delta txn-action pattern that makes streaming-sink epoch commits
    * idempotent (exactly-once). */
  /** `cdf`: change-data-feed recording enabled — row-level mutations
    * (merge / update / delete) persist their change rows under
    * `_cdf/<version>/` in the same write pass as the data. */
  /** `colmap`: COLUMN MAPPING (the Delta column-mapping model): logical
    * column name -> the PHYSICAL name carried in parquet files.
    * Identity entries are omitted, so the map is empty until the first
    * RENAME / post-DROP re-ADD. Every manifest field (schema, stats
    * keys, bucketing keys, checks, bloomCols) speaks LOGICAL names;
    * only the parquet file boundary (writers, readers, footer stats,
    * bloom sidecar names) translates through `phys`. */
  /** `droppedPhys`: physical names of DROPPED columns that may still
    * exist in live files — a later ADD COLUMN with a colliding name
    * gets a fresh physical identity so old values can never
    * resurrect. */
  private[core] final case class Manifest(schema: StructType, dirs: Seq[String],
                                          bucketing: Option[Bucketing],
                                          stats: Map[String, DirStats],
                                          txns: Map[String, Long] = Map.empty,
                                          bloomCols: Seq[String] = Nil,
                                          checks: Map[String, String] = Map.empty,
                                          cdf: Boolean = false,
                                          dvs: Map[String, DvRef] = Map.empty,
                                          props: Map[String, String] = Map.empty,
                                          colmap: Map[String, String] = Map.empty,
                                          droppedPhys: Seq[String] = Nil,
                                          rowbase: Map[String, Long] = Map.empty,
                                          // version this snapshot was READ at (stamped by
                                          // readManifest, never serialized): every commit
                                          // derived from it targets baseVersion + 1, so a
                                          // concurrent commit in between fails the manifest
                                          // put-if-absent instead of being silently
                                          // overwritten by the stale copy (lost update)
                                          baseVersion: Long = -1L) {
    /** Physical (in-file) name of a logical column. */
    def phys(logical: String): String = colmap.getOrElse(logical, logical)
    /** The schema as parquet files spell it. */
    def physSchema: StructType =
      if (colmap.isEmpty) schema
      else StructType(schema.map(f => f.copy(name = phys(f.name))))
    /** Projection mapping a physical-named scan back to logical names. */
    def logicalCols: Seq[Column] = schema.map(f => col(phys(f.name)).as(f.name))
    /** CHECK constraints plus the equality checks GENERATED columns
      * imply (`generated.<col>` props): every commit path validates
      * stored values against their generating expression. */
    def allChecks: Map[String, String] = checks ++ props.collect {
      case (k, v) if k.startsWith("generated.") =>
        val c = k.stripPrefix("generated.")
        s"generated_$c" -> s"$c <=> ($v)"
    }
    /** Remap physical-keyed footer stats to logical keys. */
    def statsToLogical(ds: DirStats): DirStats =
      if (colmap.isEmpty) ds
      else {
        val inv = colmap.map(_.swap)
        ds.copy(cols = ds.cols.map { case (k, v) => inv.getOrElse(k, k) -> v })
      }
  }

  final case class Snapshot(version: Long, schema: StructType,
                            dirs: Seq[String], bucketing: Option[Bucketing],
                            stats: Map[String, DirStats] = Map.empty,
                            bloomCols: Seq[String] = Nil,
                            dvs: Map[String, DvRef] = Map.empty,
                            colmap: Map[String, String] = Map.empty,
                            props: Map[String, String] = Map.empty) {
    /** Physical (in-file) name of a logical column (column mapping). */
    def phys(logical: String): String = colmap.getOrElse(logical, logical)
    /** Row tracking enabled (the `_row_id` metadata column exists). */
    def rowTracking: Boolean = props.contains("rowtracking.next")
    /** Absolute paths of the snapshot's live parquet files. */
    def files(store: TableStore, name: String): Seq[String] =
      filesByDir(store, name).flatMap(_._2)

    /** Live parquet files grouped by manifest dir — the granularity at
      * which the manifest's column statistics apply (data skipping). */
    def filesByDir(store: TableStore, name: String): Seq[(String, Seq[String])] = {
      val dataRoot = store.dataRoot(name)
      // independent per-dir listings, parallel across dirs: this runs at
      // SCAN-PLAN time for every catalog read, so on a 10^5-dir table a
      // sequential walk is the whole plan latency (ProbeManifest curve)
      import scala.collection.parallel.CollectionConverters._
      dirs.par.map { d =>
        val leaf = dataRoot.resolve(d)
        val fs =
          if (!Files.isDirectory(leaf)) Seq.empty[String]
          else Using.resource(Files.list(leaf))(
            _.iterator().asScala
              .filter(_.getFileName.toString.endsWith(".parquet"))
              .map(_.toString).toSeq)
        d -> fs
      }.seq
    }

    /** Exact row count from manifest statistics, if every live dir has
      * stats (metadata-only COUNT(*)) — net of deletion-vector
      * tombstones, whose counts the manifest carries. */
    def rowCount: Option[Long] =
      if (dirs.forall(stats.contains))
        Some(dirs.map(stats(_).rows).sum - dvs.values.map(_.deleted).sum)
      else None
  }

}

class TableStore(spark: SparkSession, root: String) {

  import TableStore.{Bucketing, DvRef, Manifest, Snapshot}

  // Spark 4 defaults parquet timestamps to INT96 (legacy); the DSv2 SQL
  // read path (GraftPartitionReader) decodes INT64 micros, so pin the
  // modern representation for everything this store writes
  spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")

  /** Every table path resolves through here: a name is a SINGLE path
    * segment under the store root, so a backtick-quoted SQL identifier
    * like `../otherstore/t` can never escape the root (CREATE writing
    * outside it, DROP recursively deleting another store's table). */
  private def dir(name: String): Path = {
    require(name.nonEmpty && name != "." && name != ".." &&
        !name.contains('/') && !name.contains('\\'),
      s"invalid table name: '$name' (one path segment, no separators)")
    Paths.get(root, name)
  }
  private def latestPtr(name: String): Path = dir(name).resolve("_LATEST")
  private def manifest(name: String, v: Long): Path =
    dir(name).resolve("_v").resolve(s"$v.json")

  def exists(name: String): Boolean = Files.exists(latestPtr(name))

  /** Every table under the store root (dirs carrying a _LATEST
    * pointer), sorted — the admin-surface enumeration (SHOW TABLES,
    * the matview registry's list face). Metadata-only: one directory
    * listing, no manifest reads. */
  def tableNames: Seq[String] = {
    val rootDir = Paths.get(root)
    if (!Files.isDirectory(rootDir)) Nil
    else Using.resource(Files.list(rootDir))(
      _.iterator().asScala
        .filter(p => Files.exists(p.resolve("_LATEST")))
        .map(_.getFileName.toString).toSeq.sorted)
  }

  /** DROP TABLE: remove the table's directory tree (data, manifests,
    * CDF, DVs, bloom sidecars — everything). The name validation in
    * [[dir]] keeps a quoted `../other/t` from deleting outside the
    * root; requires a real table (loud on a typo, like every other
    * admin verb here). */
  def drop(name: String): Unit = {
    require(exists(name), s"table $name does not exist under $root")
    FsUtil.deleteRecursively(dir(name).toFile)
  }

  def currentVersion(name: String): Long = {
    require(exists(name), s"table $name does not exist under $root")
    new String(Files.readAllBytes(latestPtr(name)), StandardCharsets.UTF_8).trim.toLong
  }

  /** Hash bucketing spec: data is split into `n` leaf dirs by
    * pmod(hash(keys), n). */
  // ---- manifest (de)serialization ----
  // FULL snapshot record:
  //   {"schema": <ddl>, "dirs": [..], "bucketkeys": [..], "nbuckets": N,
  //    "stats": {"<dir>": {"rows": N, "cols": {"<col>": {"min": "..",
  //    "max": "..", "nulls": N}}}}}
  // (bucket fields only for bucketed tables; stats only for dirs whose
  //  footers yielded reliable statistics — consumers treat a missing
  //  entry as "might match anything")
  // INCREMENTAL (delta) record — what a commit writes when the schema /
  // bucketing / column-mapping didn't change: the O(columns) fields in
  // full, plus add/remove diffs of the four O(live dirs) maps:
  //   {"base": v-1, "schema": .., "diradd": [..], "dirdel": [..],
  //    "statadd": {..}, "statdel": [..], "dvset": {..}, "dvdel": [..],
  //    "rowbaseset": {..}, "rowbasedel": [..], <small fields>}
  // A 100 TB table has ~10^6 live files; a full manifest is ~100 MB of
  // JSON, so full-per-commit metadata write amplification would dwarf
  // small appends. Delta records make commit metadata O(changed dirs);
  // readers resolve the base chain, bounded by `<v>.ckpt.json` full
  // checkpoints every [[checkpointInterval]] commits (the role Delta's
  // checkpoint.parquet plays for its action log).

  private def jsonArr(xs: Seq[String]): String = s"[${xs.map(jsonStr).mkString(",")}]"
  private def strMapFragment(m: Map[String, String]): String =
    s"{${m.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${jsonStr(k)}: ${jsonStr(v)}" }.mkString(",")}}"
  private def longMapFragment(m: Map[String, Long]): String =
    s"{${m.toSeq.sortBy(_._1)
      .map { case (k, b) => s"${jsonStr(k)}: $b" }.mkString(",")}}"
  private def dvsFragment(dvs: Map[String, DvRef]): String =
    s"{${dvs.toSeq.sortBy(_._1).map { case (d, r) =>
      s"${jsonStr(d)}: {\"path\": ${jsonStr(r.path)}, \"deleted\": ${r.deleted}}"
    }.mkString(",")}}"

  /** The O(columns)-sized manifest fields, shared by full and delta
    * records (a delta always carries them whole — only the O(dirs)
    * maps are worth diffing). */
  /** Protocol gate (Delta's reader-version idea, minimal form): every
    * manifest record states the MINIMUM reader feature level required
    * to interpret it correctly. A future record format that adds a
    * non-ignorable field bumps the written number; an old library
    * refuses the table LOUDLY instead of silently misreading it
    * (dropping an unknown DV-like field would resurrect deleted
    * rows). Current level: 1 (everything this library writes). */
  private[graft] val SupportedReaderVersion = 1L
  private def requireReadable(m: Map[String, Any], where: String): Unit =
    m.get("reqreader").map(_.asInstanceOf[Long]).foreach { need =>
      if (need > SupportedReaderVersion) throw new IllegalStateException(
        s"$where requires manifest reader version $need; this library " +
          s"supports up to $SupportedReaderVersion — upgrade the engine " +
          "before reading this table")
    }

  private def smallParts(m: Manifest): String = {
    val txnsPart =
      if (m.txns.isEmpty) "" else s""", "txns": ${longMapFragment(m.txns)}"""
    val bloomPart =
      if (m.bloomCols.isEmpty) "" else s""", "bloomcols": ${jsonArr(m.bloomCols)}"""
    val checksPart =
      if (m.checks.isEmpty) "" else s""", "checks": ${strMapFragment(m.checks)}"""
    val cdfPart = if (m.cdf) s""", "cdf": true""" else ""
    val propsPart =
      if (m.props.isEmpty) "" else s""", "props": ${strMapFragment(m.props)}"""
    val colmapPart =
      if (m.colmap.isEmpty) "" else s""", "colmap": ${strMapFragment(m.colmap)}"""
    val droppedPart =
      if (m.droppedPhys.isEmpty) "" else s""", "droppedcols": ${jsonArr(m.droppedPhys)}"""
    val bucketPart = m.bucketing.map(b =>
      s""", "bucketkeys": ${jsonArr(b.keys)}, "nbuckets": ${b.n}""").getOrElse("")
    txnsPart + bloomPart + checksPart + cdfPart + propsPart + colmapPart +
      droppedPart + bucketPart +
      s""", "reqreader": $SupportedReaderVersion"""
  }

  private def encodeFull(m: Manifest): String = {
    val base = s""""schema": ${jsonStr(m.schema.toDDL)}, "dirs": ${jsonArr(m.dirs)}"""
    val statsPart =
      if (m.stats.isEmpty) ""
      else s""", "stats": ${DirStats.toJsonFragment(m.stats, jsonStr)}"""
    val dvsPart =
      if (m.dvs.isEmpty) "" else s""", "dvs": ${dvsFragment(m.dvs)}"""
    val rowbasePart =
      if (m.rowbase.isEmpty) "" else s""", "rowbase": ${longMapFragment(m.rowbase)}"""
    s"{$base$statsPart$dvsPart$rowbasePart${smallParts(m)}}"
  }

  /** Delta encoding of `m` against the previous version, or None when a
    * full snapshot is required: a structural change (schema, bucketing,
    * column mapping — under which stats/file decoding could shift), a
    * rewrite touching most dirs (diff wouldn't be smaller), or carried
    * dirs whose ORDER the reconstruction `kept-in-prev-order ++ adds`
    * can't reproduce (dir order is commit semantics: scan scheduling
    * reads it). */
  private def encodeDelta(prevV: Long, prev: Manifest, m: Manifest): Option[String] = {
    if (prev.schema.toDDL != m.schema.toDDL || prev.bucketing != m.bucketing ||
        prev.colmap != m.colmap || prev.droppedPhys != m.droppedPhys) return None
    val prevSet = prev.dirs.toSet
    val newSet = m.dirs.toSet
    val diradd = m.dirs.filterNot(prevSet)
    val dirdel = prev.dirs.filterNot(newSet)
    if (m.dirs.nonEmpty && diradd.size + dirdel.size >= m.dirs.size) return None
    if ((prev.dirs.filter(newSet) ++ diradd) != m.dirs) return None
    val statdel = (prev.stats.keySet -- m.stats.keySet).toSeq.sorted
    val statadd = m.stats.filter { case (d, s) => !prev.stats.get(d).contains(s) }
    val dvdel = (prev.dvs.keySet -- m.dvs.keySet).toSeq.sorted
    val dvset = m.dvs.filter { case (d, r) => !prev.dvs.get(d).contains(r) }
    val rbdel = (prev.rowbase.keySet -- m.rowbase.keySet).toSeq.sorted
    val rbset = m.rowbase.filter { case (k, b) => !prev.rowbase.get(k).contains(b) }
    val parts = Seq(
      if (diradd.isEmpty) "" else s""", "diradd": ${jsonArr(diradd)}""",
      if (dirdel.isEmpty) "" else s""", "dirdel": ${jsonArr(dirdel)}""",
      if (statadd.isEmpty) ""
      else s""", "statadd": ${DirStats.toJsonFragment(statadd, jsonStr)}""",
      if (statdel.isEmpty) "" else s""", "statdel": ${jsonArr(statdel)}""",
      if (dvset.isEmpty) "" else s""", "dvset": ${dvsFragment(dvset)}""",
      if (dvdel.isEmpty) "" else s""", "dvdel": ${jsonArr(dvdel)}""",
      if (rbset.isEmpty) "" else s""", "rowbaseset": ${longMapFragment(rbset)}""",
      if (rbdel.isEmpty) "" else s""", "rowbasedel": ${jsonArr(rbdel)}""").mkString
    Some(s"""{"base": $prevV, "schema": ${jsonStr(m.schema.toDDL)}$parts${smallParts(m)}}""")
  }

  private def writeManifest(name: String, v: Long, m: Manifest): Unit = {
    Files.createDirectories(manifest(name, v).getParent)
    val prev =
      if (v == 0L) None
      else try Some(readManifest(name, v - 1))
      catch { case _: java.nio.file.NoSuchFileException => None }
    val body = prev.flatMap(p => encodeDelta(v - 1, p, m)).getOrElse(encodeFull(m))
    // Atomic put-if-absent publication: write the full body to a tmp
    // file, fsync it, then HARD-LINK it to the version path — link(2)
    // fails with EEXIST when the target exists, so two writers racing
    // to commit the same next version still collide loudly (the role
    // the object-store put-if-absent plays in Delta's log protocol),
    // and the published file is always COMPLETE: the link exposes a
    // finished inode (process crash) whose BYTES are durable before it
    // becomes reachable (the force() covers power/OS crash — without
    // it the linked manifest could still be torn and read as a wedged
    // table). The directory fsync making the link itself durable is
    // best-effort: losing the LINK to a power crash just re-exposes
    // the pre-commit state, which is the normal crash contract.
    // Orphaned tmp files from a crash between write and link are junk
    // under _v/ that vacuum's dot-file age sweep can collect.
    val tmp = dir(name).resolve("_v")
      .resolve(s".m$v-${java.util.UUID.randomUUID().toString.take(8)}")
    Using.resource(java.nio.channels.FileChannel.open(tmp,
      java.nio.file.StandardOpenOption.CREATE_NEW,
      java.nio.file.StandardOpenOption.WRITE)) { ch =>
      ch.write(java.nio.ByteBuffer.wrap(body.getBytes(StandardCharsets.UTF_8))): Unit
      ch.force(true)
    }
    try {
      Files.createLink(manifest(name, v), tmp)
      try Using.resource(java.nio.channels.FileChannel.open(
        tmp.getParent, java.nio.file.StandardOpenOption.READ))(_.force(true))
      catch { case _: java.io.IOException => () } // dir fsync unsupported here
    } finally Files.deleteIfExists(tmp)
    onAfterManifestLink() // deterministic crash/race injection (tests)
    onStep("manifest-linked")
    // only the race WINNER reaches here — safe to cache and checkpoint
    // (re-stamped: the committed snapshot's base is now v itself, so a
    // cache hit never hands a later commit a stale version target)
    cacheManifest(name, v, m.copy(baseVersion = v))
    if (body.startsWith("{\"base\"") && v % checkpointInterval == 0)
      writeCheckpoint(name, v, m)
  }

  private def checkpointInterval: Int =
    spark.conf.getOption("graft.manifest.checkpointInterval")
      .map(_.toInt).getOrElse(8).max(1)

  private def ckptPath(name: String, v: Long): Path =
    dir(name).resolve("_v").resolve(s"$v.ckpt.json")

  /** Full-snapshot sidecar for a delta-record version: temp + atomic
    * move so a concurrent reader never sees a torn checkpoint. Losing a
    * same-version double-write race is harmless (identical content). */
  private def writeCheckpoint(name: String, v: Long, m: Manifest): Unit = {
    val tmp = dir(name).resolve("_v")
      .resolve(s".ckpt$v-${java.util.UUID.randomUUID().toString.take(8)}")
    Files.write(tmp, encodeFull(m).getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, ckptPath(name, v), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING): Unit
  }

  /** Resolved-manifest cache. Committed versions are immutable, but a
    * DROP TABLE + re-CREATE restarts version numbers at 0 — so each
    * entry carries the identity token of the COMMIT RECORD FILE it was
    * parsed from (inode when the filesystem exposes one, else
    * size+mtime), and a hit must match the file currently on disk.
    * One stat per read instead of a full parse-and-resolve; a stale
    * entry from a dropped table's life can never be served. Unbounded
    * growth is capped crudely (manifests are small; tests churn
    * thousands of tiny tables). */
  private val manifestCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), (String, Manifest)]()
  private def recordToken(name: String, v: Long): Option[String] =
    try {
      val attrs = Files.readAttributes(manifest(name, v),
        classOf[java.nio.file.attribute.BasicFileAttributes])
      Some(Option(attrs.fileKey).map(_.toString)
        .getOrElse(s"${attrs.size}:${attrs.lastModifiedTime.toMillis}"))
    } catch { case _: java.io.IOException => None }
  private def cacheManifest(name: String, v: Long, m: Manifest): Unit = {
    if (manifestCache.size > 1024) manifestCache.clear()
    recordToken(name, v).foreach(t => manifestCache.put((name, v), (t, m)))
  }

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""

  /** Driver-memory ENVELOPE of the single-JSON-manifest design: a
    * resolved manifest costs ~0.64 KB of driver heap per data dir
    * (relpath + stats entry — measured, ProbeManifest / PLANS.md), so
    * 10^5 dirs ≈ 64 MB (comfortable), 10^6 ≈ 640 MB (needs a sized
    * driver), 10^7 ≈ 6.4 GB (past any default `--driver-memory`).
    * Rather than degrade silently toward a driver OOM, every manifest
    * read WARNS once per table past `spark.graft.manifest.warnDirs`
    * (default 200,000) and REFUSES past `spark.graft.manifest.maxDirs`
    * (default 2,000,000) with guidance: `compact()` bin-packs small
    * files and collapses the dir count; a table legitimately needing
    * more dirs should raise the conf together with the driver heap.
    * Either conf set to 0 disables its check. */
  private val warnedDirBudget =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private def confLong(key: String, dflt: Long): Long =
    try spark.conf.get(key, dflt.toString).toLong catch { case _: NumberFormatException => dflt }
  private def checkManifestBudget(name: String, m: Manifest): Unit = {
    val n = m.dirs.size
    val maxDirs = confLong("spark.graft.manifest.maxDirs", 2000000L)
    if (maxDirs > 0 && n > maxDirs)
      throw new IllegalStateException(
        s"table $name has $n data dirs — past the manifest driver-memory " +
          s"budget (spark.graft.manifest.maxDirs=$maxDirs, ~0.64 KB of " +
          "driver heap per dir). Raise the conf (and --driver-memory) to " +
          "read it, then run compact(name) to collapse the dir count")
    val warnDirs = confLong("spark.graft.manifest.warnDirs", 200000L)
    if (warnDirs > 0 && n > warnDirs && warnedDirBudget.add(name))
      System.err.println(
        s"[graft] WARNING: table $name has $n data dirs (~${n.toLong * 654 / (1 << 20)} MB " +
          "of driver heap per resolved manifest; warn threshold " +
          s"spark.graft.manifest.warnDirs=$warnDirs) — consider compact(name)")
  }

  private def readManifest(name: String, v: Long): Manifest = {
    val cached = manifestCache.get((name, v))
    if (cached != null && recordToken(name, v).contains(cached._1)) {
      checkManifestBudget(name, cached._2)
      return cached._2
    }
    def fromCkpt(): Manifest =
      parseFull(MiniJson.obj(new String(
        Files.readAllBytes(ckptPath(name, v)), StandardCharsets.UTF_8)))
    val resolved0 =
      if (Files.exists(ckptPath(name, v))) fromCkpt()
      else {
        val m = MiniJson.obj(new String(
          Files.readAllBytes(manifest(name, v)), StandardCharsets.UTF_8))
        m.get("base") match {
          case None => parseFull(m)
          case Some(b) =>
            // a CONCURRENT VACUUM can sweep chain records below its
            // retained head while this walk is already past the head —
            // but it always writes the head's checkpoint FIRST, so a
            // frame whose deeper chain vanished recovers by re-checking
            // its own checkpoint (frames below the head rethrow and the
            // head frame is the one that recovers)
            try applyDelta(readManifest(name, b.asInstanceOf[Long]), m)
            catch {
              case e: java.nio.file.NoSuchFileException =>
                if (Files.exists(ckptPath(name, v))) fromCkpt() else throw e
            }
        }
      }
    val resolved = resolved0.copy(baseVersion = v)
    checkManifestBudget(name, resolved)
    cacheManifest(name, v, resolved)
    resolved
  }

  private def parsedStrs(m: Map[String, Any], k: String): Seq[String] =
    m.getOrElse(k, Seq.empty).asInstanceOf[Seq[Any]].map(_.asInstanceOf[String])
  private def parsedStrMap(m: Map[String, Any], k: String): Map[String, String] =
    m.get(k).map(_.asInstanceOf[Map[String, Any]]
      .map { case (key, v) => key -> v.asInstanceOf[String] })
      .getOrElse(Map.empty[String, String])
  private def parsedLongMap(m: Map[String, Any], k: String): Map[String, Long] =
    m.get(k).map(_.asInstanceOf[Map[String, Any]]
      .map { case (key, v) => key -> v.asInstanceOf[Long] })
      .getOrElse(Map.empty[String, Long])
  private def parsedDvs(m: Map[String, Any], k: String): Map[String, DvRef] =
    m.get(k).map(_.asInstanceOf[Map[String, Any]]
      .map { case (d, v) =>
        val o = v.asInstanceOf[Map[String, Any]]
        d -> DvRef(o("path").asInstanceOf[String], o("deleted").asInstanceOf[Long])
      }).getOrElse(Map.empty[String, DvRef])

  private def parseFull(m: Map[String, Any]): Manifest = {
    requireReadable(m, "manifest")
    val bucketing = m.get("nbuckets").map(n =>
      Bucketing(parsedStrs(m, "bucketkeys"), n.asInstanceOf[Long].toInt))
    val schema = StructType.fromDDL(m("schema").asInstanceOf[String])
    val stats = m.get("stats").map(DirStats.fromParsed(_, schema)).getOrElse(Map.empty)
    Manifest(schema, parsedStrs(m, "dirs"), bucketing, stats,
      parsedLongMap(m, "txns"), parsedStrs(m, "bloomcols"),
      parsedStrMap(m, "checks"), m.get("cdf").exists(_.asInstanceOf[Boolean]),
      parsedDvs(m, "dvs"), parsedStrMap(m, "props"), parsedStrMap(m, "colmap"),
      parsedStrs(m, "droppedcols"), parsedLongMap(m, "rowbase"))
  }

  /** Overlay a delta record on its resolved base. The O(columns)
    * fields come whole from the record; the O(dirs) maps apply their
    * add/remove diffs. Dir order is reproduced exactly as committed:
    * carried dirs in base order, then additions in commit order (the
    * writer refused the delta encoding otherwise). */
  private def applyDelta(base: Manifest, m: Map[String, Any]): Manifest = {
    requireReadable(m, "manifest delta record")
    val bucketing = m.get("nbuckets").map(n =>
      Bucketing(parsedStrs(m, "bucketkeys"), n.asInstanceOf[Long].toInt))
    val schema = StructType.fromDDL(m("schema").asInstanceOf[String])
    val dirdel = parsedStrs(m, "dirdel").toSet
    val dirs = base.dirs.filterNot(dirdel) ++ parsedStrs(m, "diradd")
    val stats = (base.stats -- parsedStrs(m, "statdel")) ++
      m.get("statadd").map(DirStats.fromParsed(_, schema)).getOrElse(Map.empty)
    val dvs = (base.dvs -- parsedStrs(m, "dvdel")) ++ parsedDvs(m, "dvset")
    val rowbase = (base.rowbase -- parsedStrs(m, "rowbasedel")) ++
      parsedLongMap(m, "rowbaseset")
    Manifest(schema, dirs, bucketing, stats,
      parsedLongMap(m, "txns"), parsedStrs(m, "bloomcols"),
      parsedStrMap(m, "checks"), m.get("cdf").exists(_.asInstanceOf[Boolean]),
      dvs, parsedStrMap(m, "props"), parsedStrMap(m, "colmap"),
      parsedStrs(m, "droppedcols"), rowbase)
  }

  private def bucketOf(entry: String): Int =
    entry.split("/__b=", 2)(1).toInt

  /** Write df as version (v+1)'s batch dir(s), commit manifest+pointer.
    * New dirs get footer-derived column statistics in the manifest
    * (data skipping — see [[DirStats]]); carried dirs keep theirs,
    * looked up in `meta.stats` — the manifest the CALLER read, so
    * commit never re-reads (and never silently re-resolves) the prior
    * version. `meta` carries EVERY non-dir manifest field (schema,
    * bucketing, stats, txns, bloom, checks, cdf) into the new version —
    * adding a manifest field means touching only Manifest + the
    * (de)serializers, never each call site. */
  private def commit(name: String, df: Option[DataFrame], meta: Manifest,
                     carryForward: Seq[String],
                     propOverrides: Map[String, String] = Map.empty,
                     extraPhys: Seq[Column] = Nil,
                     appendShaped: Boolean = false): Long = {
    import meta.{schema, bucketing}
    // invariant checked BEFORE any data writes: a violating caller must
    // fail fast, not stream the whole DataFrame and orphan the dir
    require(!appendShaped || carryForward == meta.dirs,
      s"append-shaped commit on $name must carry every base dir")
    val priorStats = meta.stats
    // version pinned from the manifest READ, not re-read here: a rival
    // landing between the caller's readManifest and this commit must
    // fail the put-if-absent, not get silently overwritten
    val v =
      if (!exists(name)) 0L
      else if (meta.baseVersion >= 0L) meta.baseVersion + 1
      else currentVersion(name) + 1 // fresh (unread) manifest on an existing table
    val newDirs = df match {
      case Some(d0) =>
        carryForward ++ writeBatch(name, enforceChecks(d0, meta.allChecks), v, meta,
          extraPhys)
      case None => carryForward
    }
    // stats: keep carried dirs' entries, collect footers for new dirs
    // (footers speak physical names; manifest stats speak logical)
    // footer I/O per dir is independent — collect in parallel (a
    // 32-bucket commit is otherwise 32 serial dir listings + opens).
    // A CARRIED dir with no entry is never re-attempted: dirs are
    // immutable, so a footer pass that yielded nothing at its own
    // commit yields nothing forever — re-collecting would add O(stats-
    // less dirs) filesystem reads to EVERY subsequent commit.
    val carriedSet = carryForward.toSet
    val stats = { import scala.collection.parallel.CollectionConverters._
      newDirs.par.flatMap { d =>
        priorStats.get(d).map(d -> _).orElse(
          if (carriedSet.contains(d)) None
          else DirStats.collect(dir(name).resolve("data").resolve(d), meta.physSchema)
            .map(meta.statsToLogical).map(d -> _))
      }.toMap.seq }
    // APPEND-shaped commits (caller DECLARED append intent and carries
    // every base dir, only additions) take the optimistic-concurrency
    // path: a manifest collision rebases the added dirs onto the
    // winner's manifest instead of failing. The intent is explicit, not
    // inferred from carryForward == meta.dirs: on a ZERO-dir table that
    // inference would classify INSERT OVERWRITE (and all-insert merges)
    // as appends and silently rebase a rival's rows INTO the overwrite.
    if (appendShaped && df.isDefined && exists(name)) {
      // set membership, NOT carryForward.contains: the List scan made
      // this O(dirs^2) — 42 of a 10^5-dir append's 43 s (ProbeAppendHot)
      val added = newDirs.filterNot(carriedSet.contains)
      commitAppendWithRetry(name, meta, added,
        stats.view.filterKeys(added.contains).toMap, propOverrides)
    } else {
      // non-append shape (overwrite / rewrite / compaction): depends on
      // the rows it read, so a lost race is a conflict, never a rebase
      commitExclusive(name, v, meta.copy(dirs = newDirs, stats = stats,
        props = meta.props ++ propOverrides),
        if (df.isDefined) "rewrite commit" else "metadata commit")
      v
    }
  }

  /** Write `d`'s rows as version v's batch dir under data/ and return
    * the new manifest dir entries: the batch dir itself, or its bucket
    * LEAF dirs for bucketed tables. Files are written with PHYSICAL
    * column names (identity unless a column was renamed). The unique
    * suffix means two writers racing to the same version write
    * DIFFERENT data dirs, so the loser (who fails the manifest's
    * CREATE_NEW) can never trample the winner's data. */
  /** Manifest prop holding the next unassigned row id (its presence is
    * what "row tracking enabled" means). */
  private val RowTrackingProp = "rowtracking.next"

  /** Physical file column materializing a rewritten row's stable id
    * (row-tracking postimages); never part of the logical schema. */
  private val RidCol = "__rid"

  private def writeBatch(name: String, d: DataFrame, v: Long,
                         meta: Manifest,
                         extraPhys: Seq[Column] = Nil,
                         uuid: Option[String] = None): Seq[String] = {
    val physCols = meta.schema.map(f => col(f.name).as(meta.phys(f.name)))
    // CDF-staging writers pass their commit-local uuid so the batch dir
    // shares it with the `.v<v>-<uuid>` staging (and any DV sidecar) —
    // completeCdfStaging identifies a crashed writer's staging by that
    // shared uuid (commitDelta/commitCdc already share theirs)
    val batch = f"b$v%09d-" +
      uuid.getOrElse(java.util.UUID.randomUUID.toString.take(8))
    val target = dir(name).resolve("data").resolve(batch)
    val written = meta.bucketing match {
      case Some(b) =>
        // leaf dir per bucket; __b derives from the keys so it is
        // not stored in the files and never needs recovering.
        // repartition on __b first: without it every write task fans
        // out into every leaf dir (tasks x buckets small files)
        // (__b computes from LOGICAL keys, before the physical rename)
        d.withColumn("__b", b.expr)
          .select(physCols ++ extraPhys :+ col("__b"): _*)
          .repartition(b.n, col("__b"))
          .write.mode("overwrite").partitionBy("__b").parquet(target.toString)
        if (!Files.exists(target)) Seq.empty
        else Using.resource(Files.list(target))(
          _.iterator().asScala
            .map(_.getFileName.toString).filter(_.startsWith("__b="))
            .map(l => s"$batch/$l").toSeq.sorted)
      case None =>
        sizedForWrite(d.select(physCols ++ extraPhys: _*))
          .write.mode("overwrite").parquet(target.toString)
        Seq(batch)
    }
    onStep("batch-written")
    written
  }

  /** Optimized write (the Delta `optimizeWrite` idea): when the
    * batch's estimated size says few ~128 MB output files suffice, add
    * an adaptive repartition so a small commit writes THAT many files
    * instead of `shuffle.partitions` tiny ones (per-file open/close +
    * manifest metadata dominates small commits). A repartition — not a
    * coalesce — so the upstream compute keeps its full parallelism;
    * the added shuffle only ever moves a few target-files' worth of
    * rows. A 100 TB append estimates >= the cluster's parallelism and
    * is left untouched; Catalyst's sizeInBytes only OVERestimates
    * under joins, which degrades to the status quo. */
  private def sizedForWrite(d: DataFrame): DataFrame = {
    val targetBytes = spark.conf.getOption("graft.write.targetFileBytes")
      .map(_.toLong).getOrElse(128L * 1024 * 1024)
    val est = d.queryExecution.optimizedPlan.stats.sizeInBytes
    val wanted =
      if (!est.isValidLong || est <= 0L) Long.MaxValue
      else math.max(1L, (est.toLong + targetBytes - 1) / targetBytes)
    if (wanted < spark.sparkContext.defaultParallelism)
      d.repartition(wanted.toInt)
    else d
  }

  /** Test hook: runs immediately before each optimistic manifest-write
    * attempt (deterministic interleaving of a "concurrent" writer). */
  private[graft] var onBeforeOptimisticCommit: () => Unit = () => ()

  /** Test hook: fires between a commit's manifest hard-link and its
    * `_LATEST` pointer move — the ghost window. Lets tests PAUSE a live
    * publisher inside it deterministically and race adoption against
    * it (CrashRecoverySpec), instead of reasoning the interleaving. */
  private[graft] var onAfterManifestLink: () => Unit = () => ()

  /** Test hook: fires AFTER every named durable side-effect step of a
    * commit / adoption / vacuum ("batch-written", "dv-written",
    * "cdf-staged", "manifest-linked", "latest-published",
    * "cdf-published", "cdf-adopted", "vacuum-*"). The crash-enumeration
    * sweep (CrashRecoverySpec) throws a fatal from the k-th firing to
    * simulate writer death after step k — the throw bypasses NonFatal
    * cleanup, so on-disk state is byte-identical to a kill there. */
  private[graft] var onStep: String => Unit = _ => ()

  /** Optimistic concurrency for APPEND-shaped commits, the Delta
    * conflict-resolution model restricted to its safe core: an append
    * depends on no prior ROWS, so losing the manifest race to another
    * writer is resolved by re-reading the winner's manifest and
    * committing base-dirs-of-the-winner + our added dirs. The rebase is
    * refused (ConcurrentModificationException) when the winner changed
    * METADATA our data was written under — schema, bucketing layout, or
    * CHECK constraints (our rows were validated against the old set) —
    * the same conflicts Delta's WriteSerializable level rejects. All
    * other concurrent commits (appends, compaction, DV deletes, other
    * tables' state) compose with an append. The manifest CREATE_NEW
    * put-if-absent is what detects the race — no locks. */
  private def commitAppendWithRetry(name: String, base: Manifest,
                                    added: Seq[String],
                                    addedStats: Map[String, DirStats],
                                    propOverrides: Map[String, String] = Map.empty): Long = {
    var attempts = 0
    while (attempts < 50) {
      onBeforeOptimisticCommit()
      val curV = currentVersion(name)
      val latest = readManifest(name, curV)
      refuseMetadataConflict(name, latest, base, "append")
      // identity watermarks: our rows were minted from base's `next`;
      // a concurrent writer advancing it means overlapping ids — the
      // rebase must refuse (Delta refuses concurrent identity appends
      // for exactly this reason)
      val idKeys = (base.props.keySet ++ latest.props.keySet)
        .filter(_.startsWith("identity."))
      if (idKeys.exists(k => base.props.get(k) != latest.props.get(k)))
        throw new java.util.ConcurrentModificationException(
          s"append to $name conflicts with a concurrent identity-column " +
            "assignment — retry the whole operation")
      try {
        commitManifest(name, curV + 1,
          latest.copy(dirs = latest.dirs ++ added,
            stats = latest.stats ++ addedStats,
            props = latest.props ++ propOverrides))
        return curV + 1
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          attempts += 1
          // live race: the winner moved _LATEST and the next loop pass
          // rebases on it. Ghost (a crashed writer's manifest that
          // never reached _LATEST): adopt it, else every retry collides
          // with the same file forever and the table is wedged
          if (!adoptGhostVersion(name, curV + 1)) Thread.sleep(50)
      }
    }
    throw new java.util.ConcurrentModificationException(
      s"append to $name lost the commit race $attempts times — giving up")
  }

  /** The rebase refusal both optimistic writers share: the rows being
    * attached were written and VALIDATED under `base`'s metadata, so a
    * rival commit that changed the schema, bucketing layout, CHECK
    * constraints, or generated-column rules (props, not checks — part
    * of the validation surface via allChecks) makes the rebase unsound
    * — the same conflicts Delta's WriteSerializable level rejects. */
  private def refuseMetadataConflict(name: String, latest: Manifest,
                                     base: Manifest, what: String): Unit = {
    def generatedRules(m: Manifest): Map[String, String] =
      m.props.view.filterKeys(_.startsWith("generated.")).toMap
    if (latest.schema.toDDL != base.schema.toDDL ||
        latest.bucketing != base.bucketing || latest.checks != base.checks ||
        generatedRules(latest) != generatedRules(base))
      throw new java.util.ConcurrentModificationException(
        s"$what to $name conflicts with a concurrent metadata change " +
          "(schema / bucketing / constraints) — retry the whole operation")
  }

  /** The commit protocol: build any missing bloom-index files for the
    * version's dirs (no-op unless the table has bloom columns — carried
    * dirs keep theirs, so only just-written dirs cost a read pass),
    * write manifest v, then atomically swap the _LATEST pointer. The
    * single place this sequence lives. */
  /** Commit with staged change-feed rows: row-level writers stage their
    * `_cdf` contents under a dot-dir and only a SUCCESSFUL manifest
    * commit moves it to `_cdf/<v>`. A commit that loses the version
    * race (put-if-absent collision) deletes its staging instead of
    * leaving change rows where changeSources would attribute them to
    * the WINNER's version v — poisoning the feed with a failed
    * operation's rows. Crash leftovers (dot-dirs under `_cdf`) are
    * age-swept by vacuum. */
  private def commitWithCdf(name: String, v: Long, m: Manifest,
                            stagedCdf: Option[Path]): Unit =
    try {
      // refresh the staging's mtime NOW: it was set when the CDF rows
      // finished writing, but the commit still runs the (unbounded)
      // stats/bloom/row-tracking phase before the manifest link — a
      // slow LIVE writer's staging could age past ghostStagingGraceMs
      // and get adopted out from under it mid-publish
      stagedCdf.foreach(s => Files.setLastModifiedTime(s,
        java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis())))
      commitExclusive(name, v, m, "row-level mutation")
      stagedCdf.foreach { s =>
        val target = dir(name).resolve("_cdf").resolve(v.toString)
        try Files.move(s, target, StandardCopyOption.ATOMIC_MOVE): Unit
        catch {
          // only v's committer (us — commitExclusive succeeded) or an
          // adopter of v can create _cdf/<v>; the staging vanishing
          // with the target in place means an adopter completed OUR
          // move (we stalled past the grace window). The commit landed
          // — failing here would make the caller retry and double-apply
          case _: java.nio.file.NoSuchFileException
              if Files.isDirectory(target) => ()
        }
        onStep("cdf-published")
      }
    } catch {
      // NonFatal: a fatal throw (VM death, and the crash-sweep's
      // simulated kill) must leave the staging EXACTLY as a real crash
      // would — the recovery paths own it from there
      case scala.util.control.NonFatal(e) =>
        stagedCdf.foreach(s => FsUtil.deleteRecursively(s.toFile))
        throw e
    }

  /** Commit `m` at EXACTLY version `v` (pinned when its base manifest
    * was read — `m.baseVersion + 1` at every call site) and translate a
    * lost put-if-absent race into a clear conflict error. Row-level
    * mutations and metadata changes depend on the manifest state they
    * read, so the only safe resolutions are the append-shaped rebases
    * ([[commitAppendWithRetry]] / [[commitEpochWithRetry]] / the attach
    * retries) or LOUD rejection — never re-pointing the stale snapshot
    * at whatever version is now current, which would silently discard
    * the concurrent winner's dirs, deletion vectors, or metadata (lost
    * update / resurrected tombstones). */
  private def commitExclusive(name: String, v: Long, m: Manifest, op: String): Unit = {
    onBeforeOptimisticCommit() // deterministic race injection (tests)
    try commitManifest(name, v, m)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        // before failing, adopt a crashed writer's unpublished ghost at
        // v (if that's what we collided with) so the advertised
        // "re-run" actually CAN succeed — without adoption every retry
        // recomputes v from the stale _LATEST and collides forever
        if (v > 0L && exists(name)) adoptGhostVersion(name, v): Unit
        else if (v == 0L && !exists(name)) {
          // half-created table: a CREATE crashed between linking
          // manifest 0 and writing the pointer — publish it so the
          // table becomes visible (and this CREATE's retry gets the
          // defined create-on-existing behavior instead of colliding
          // with the ghost forever)
          try readManifest(name, 0L)
          catch {
            case e: Exception => throw new IllegalStateException(
              s"table $name has an unreadable manifest at version 0 " +
                "from a crashed CREATE — delete the table directory " +
                "and re-create", e)
          }
          publishLatest(name, 0L)
        }
        val basis =
          if (v == 0L) "was taken by a concurrent create"
          else s"was taken after this operation read version ${v - 1}"
        throw new java.util.ConcurrentModificationException(
          s"$op on $name conflicts with a concurrent commit: version $v " +
            s"$basis; nothing was committed — re-run the operation against " +
            "the table's new state")
    }
  }

  /** CRASH RECOVERY — adopt a "ghost" version: a manifest that was
    * durably published (the put-if-absent link succeeded) by a writer
    * that died before moving `_LATEST`. Readers never saw it, and every
    * later commit computes next = `_LATEST`+1, collides with the ghost
    * forever, and the table is permanently unwritable. Called from the
    * commit collision handlers when `_LATEST` still names ghostV-1:
    * the ghost's content is COMPLETE by construction (hard-link
    * publication), so rolling `_LATEST` forward publishes the crashed
    * writer's commit exactly as written — the same roll-forward Delta's
    * log readers perform when the last log entry postdates the
    * checkpoint hint.
    *
    * Change-feed completion: row-level writers stage `_cdf` rows under
    * `.v<v>-<uuid>` and move them to `_cdf/<v>` only AFTER the pointer
    * move — a ghost's staging is still a dot-dir. The staging that
    * belongs to the ghost is identified by uuid (the ghost's new data
    * dirs / DV sidecars embed the same uuid) and moved into place, but
    * only when it is older than [[ghostStagingGraceMs]]: a YOUNG
    * staging usually means the "ghost's" writer is alive mid-publish —
    * adoption backs off (returns false) and lets it finish rather than
    * stealing a move the owner is about to make.
    *
    * Returns true when the caller should re-read `_LATEST` and retry
    * (ghost adopted, or someone else already advanced the pointer);
    * false when it should back off briefly first. Unreadable ghost
    * manifests (a pre-hard-link torn write) and ambiguous staging are
    * LOUD errors naming the file — never a silent guess. */
  private[core] val ghostStagingGraceMs: Long = 60000L
  private def adoptGhostVersion(name: String, ghostV: Long): Boolean = {
    if (currentVersion(name) != ghostV - 1) return true // already advanced
    val m =
      try readManifest(name, ghostV)
      catch {
        case e: Exception => throw new IllegalStateException(
          s"table $name has an unreadable manifest at version $ghostV " +
            s"(${manifest(name, ghostV)}) that `_LATEST` never adopted — " +
            "a torn write from a crash predating hard-link publication. " +
            "Every commit will conflict with it until it is repaired: " +
            "verify it is not referenced, delete the file, and retry.", e)
      }
    if (m.cdf &&
        completeCdfStaging(name, ghostV, m, readManifest(name, ghostV - 1)) ==
          CdfStagingYoung)
      return false // owner likely alive mid-publish — back off
    publishLatest(name, ghostV)
    true
  }

  private sealed trait CdfStagingOutcome
  private case object CdfStagingDone extends CdfStagingOutcome
  private case object CdfStagingAbsent extends CdfStagingOutcome
  private case object CdfStagingYoung extends CdfStagingOutcome

  /** Complete a crashed writer's stranded change-feed staging for
    * version `v`: its `_cdf` rows were written to a `.v<v>-<uuid>`
    * dot-dir and the crash happened before the post-commit move to
    * `_cdf/<v>`. The staging that belongs to v is identified by uuid —
    * the writer shares one uuid across its new data dirs
    * (b<v>-<uuid>), DV sidecars (dv-<v>-<uuid>) and the staging — and
    * is only moved when older than [[ghostStagingGraceMs]] (younger
    * usually means the writer is ALIVE mid-publish; stealing its move
    * would make its own move fail a commit that actually landed).
    * Shared by ghost adoption (commit-side recovery) and the change
    * readers (read-side recovery — a version published before the
    * staging move never collides with anything, so only a read would
    * ever heal it). Returns Done (moved, or already in place), Absent
    * (nothing staged — append-shaped commit or swept staging), or
    * Young (back off). Ambiguous staging refuses loudly. */
  private def completeCdfStaging(name: String, v: Long, m: Manifest,
                                 prev: Manifest): CdfStagingOutcome = {
    val cdfV = dir(name).resolve("_cdf").resolve(v.toString)
    if (Files.isDirectory(cdfV)) return CdfStagingDone
    val prevDirSet = prev.dirs.toSet
    val curDirSet = m.dirs.toSet
    val newUuids: Set[String] =
      (m.dirs.filterNot(prevDirSet).map(_.split('/').head) ++
        (m.dvs.values.map(_.path).toSet -- prev.dvs.values.map(_.path)))
        .flatMap(_.split('-').lastOption).toSet
    val cdfRoot = dir(name).resolve("_cdf")
    val stagings: Seq[Path] =
      if (!Files.isDirectory(cdfRoot)) Seq.empty
      else Using.resource(Files.list(cdfRoot))(_.iterator().asScala
        .filter(_.getFileName.toString.startsWith(s".v$v-")).toSeq)
    val matching = stagings.filter(p =>
      newUuids.contains(p.getFileName.toString.stripPrefix(s".v$v-")))
    def adopt(one: Path): CdfStagingOutcome = {
      val age = System.currentTimeMillis() -
        Files.getLastModifiedTime(one).toMillis
      if (age < ghostStagingGraceMs) CdfStagingYoung
      else {
        Files.move(one, cdfV, StandardCopyOption.ATOMIC_MOVE)
        onStep("cdf-adopted")
        CdfStagingDone
      }
    }
    // a rewrite-shaped delta (dirs both dropped AND added) is the one
    // shape the change reader cannot synthesize from the manifest diff
    val rewriteShaped = prev.dirs.exists(d => !curDirSet.contains(d)) &&
      m.dirs.exists(d => !prevDirSet.contains(d))
    matching match {
      case Seq(one) => adopt(one)
      case Seq() if stagings.sizeIs == 1 && rewriteShaped =>
        // uuid match can fail legitimately: a replaceWhere-shaped
        // commit whose manifest delta carries NO artifact sharing the
        // staging's uuid (an externally-staged DSv2 batch dir is named
        // by the executor's own uuid). With exactly ONE `.v<v>-*`
        // candidate it can only be v's writer's — adopt it under the
        // same grace rule, but ONLY for a rewrite-shaped delta: the
        // restriction means a stale crashed-LOSER staging can never be
        // mis-adopted onto an append- or drop-shaped ghost (those
        // synthesize exactly from the manifest diff and must not
        // prefer a stranger's recorded rows — their stranded staging
        // is junk for vacuum's age sweep).
        adopt(stagings.head)
      case Seq() if stagings.sizeIs > 1 && rewriteShaped =>
        // the version NEEDS a recorded feed (rewrite-shaped) but no
        // candidate is identifiable — silent Absent here would publish
        // a permanently feed-less version; refuse instead
        throw new IllegalStateException(
          s"table $name version $v rewrote dirs and has ${stagings.size} " +
            s"change-feed staging candidates, none sharing its manifest " +
            s"uuids (${stagings.map(_.getFileName).mkString(", ")}) — " +
            "cannot tell which belongs to the committed manifest; repair " +
            "manually before retrying")
      case Seq() => CdfStagingAbsent
      case many => throw new IllegalStateException(
        s"table $name version $v has ${stagings.size} change-feed staging " +
          s"dirs of which ${many.size} match its manifest uuids " +
          s"(${many.map(_.getFileName).mkString(", ")}) — cannot tell which " +
          "belongs to the committed manifest; repair manually before retrying")
    }
  }

  /** Dot-dir staging path for a version's change-feed rows. */
  private def cdfStaging(name: String, v: Long, uuid: String): Path =
    dir(name).resolve("_cdf").resolve(s".v$v-$uuid")

  /** Nullable at EVERY nesting level (struct fields, array elements,
    * map values) — forcing only the top level would leave codegen
    * skipping null checks one level down. */
  private def forceNullable(dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.types.DataType = dt match {
    case s: StructType => StructType(s.map(f =>
      f.copy(dataType = forceNullable(f.dataType), nullable = true)))
    case a: org.apache.spark.sql.types.ArrayType =>
      a.copy(elementType = forceNullable(a.elementType), containsNull = true)
    case m: org.apache.spark.sql.types.MapType =>
      m.copy(valueType = forceNullable(m.valueType), valueContainsNull = true)
    case other => other
  }

  private def commitManifest(name: String, v: Long, m0: Manifest): Unit = {
    // the manifest schema is always NULLABLE (same stance as
    // spark.read.parquet): parquet files can't enforce non-nullability,
    // and a later append CAN legally land nulls in a column the
    // creating DataFrame happened to type non-null — a non-null
    // declared schema would make DSv2 codegen skip null checks and
    // silently read such nulls as 0/""
    // deletion vectors attach to specific immutable dirs: entries for
    // dirs this version no longer carries are dropped automatically
    val liveDirs = m0.dirs.toSet // set probe, not a per-DV List scan
    val m1 = m0.copy(
      schema = forceNullable(m0.schema).asInstanceOf[StructType],
      dvs = m0.dvs.filter { case (d, _) => liveDirs.contains(d) })
    // identity watermarks: writers that DON'T mint ids (SQL INSERT
    // attach, merge-on-read inserts, library merges) may still carry
    // values in an identity column; advance each watermark past the
    // committed column max (from the same footer stats the manifest
    // stores) so a later library append can never re-mint a taken id
    val m2 =
      if (!m1.props.keys.exists(_.startsWith("identity."))) m1
      else m1.copy(props = m1.props.map {
        case (k, nextStr) if k.startsWith("identity.") && k.endsWith(".next") =>
          val c = k.stripPrefix("identity.").stripSuffix(".next")
          val maxSeen = m1.stats.values.flatMap(_.cols.get(c))
            .flatMap(_.max).collect { case l: Long => l }
          if (maxSeen.isEmpty) k -> nextStr
          else k -> math.max(nextStr.toLong, maxSeen.max + 1L).toString
        case kv => kv
      })
    // ROW TRACKING (Delta fresh-row-id model): every live data file
    // gets a base row id assigned ONCE, here, whatever write path
    // produced it; a row's stable id is base + its position in the
    // file (or the materialized __rid postimages carry — see
    // readWithRowIds). Bases for files of dropped dirs are pruned so
    // the manifest stays O(live files).
    val m = if (!m2.props.contains(RowTrackingProp)) m2 else {
      // dirs are immutable: a carried dir's files are exactly its
      // rowbase keys from the version it was committed under — only
      // dirs with NO rowbase entry (just written, or live when
      // tracking was enabled) need a filesystem listing. Keeps the
      // commit O(new dirs), matching the delta manifest records.
      val dirsWithBases: Set[String] =
        m2.rowbase.keySet.map(_.split('/').dropRight(1).mkString("/"))
      val liveDirSet = m2.dirs.toSet
      val carried: Set[String] = m2.rowbase.keySet.filter { rel =>
        liveDirSet.contains(rel.split('/').dropRight(1).mkString("/"))
      }
      val listed: Set[String] = m2.dirs.filterNot(dirsWithBases).flatMap { d =>
        val dp = dataRoot(name).resolve(d)
        if (!Files.isDirectory(dp)) Seq.empty
        else Using.resource(Files.list(dp))(_.iterator().asScala
          .map(_.getFileName.toString).filter(_.endsWith(".parquet"))
          .map(f => s"$d/$f").toSeq)
      }.toSet
      val liveFiles: Set[String] = carried ++ listed
      // footer reads only for files that don't have a base yet —
      // O(files just written) per commit, like stats collection
      val missingDirs = liveFiles.filterNot(m2.rowbase.contains)
        .map(_.split('/').dropRight(1).mkString("/")).toSeq.distinct
      val counts: Map[String, Long] = { import scala.collection.parallel.CollectionConverters._
        missingDirs.par.flatMap { d =>
          DirStats.fileRowCounts(dataRoot(name).resolve(d))
            .map { case (f, n) => s"$d/$f" -> n }
        }.toMap.seq }
      var next = m2.props(RowTrackingProp).toLong
      val added = liveFiles.filterNot(m2.rowbase.contains).toSeq.sorted.map { rel =>
        val base = next
        next += counts(rel)
        rel -> base
      }
      m2.copy(
        rowbase = m2.rowbase.view.filterKeys(liveFiles).toMap ++ added,
        props = m2.props + (RowTrackingProp -> next.toString))
    }
    import m.{dirs, stats, bloomCols}
    // blooms read data files and name sidecars by PHYSICAL column —
    // sidecars stay valid across renames
    if (bloomCols.nonEmpty)
      BloomIndex.ensure(spark, bloomRoot(name), dataRoot(name), dirs,
        bloomCols.map(m.phys), m.physSchema, stats.view.mapValues(_.rows).toMap)
    writeManifest(name, v, m)
    publishLatest(name, v)
  }

  /** Atomically point `_LATEST` at `v` — MONOTONIC: a pointer move is
    * skipped when the current value is already >= v, so a straggler
    * (e.g. a ghost adoption racing the ghost's still-alive writer, or
    * that writer's own late publish) can never regress the table below
    * a commit readers have already seen. Read-then-move is TOCTOU racy
    * on its own (a publisher stalled between the read and the move
    * could overwrite a HIGHER pointer landed meanwhile, briefly
    * regressing the version for readers), so same-process publishers —
    * the only writers this single-driver engine has; every store
    * instance on the root shares the monitor — serialize on a
    * per-table-path lock. A hypothetical cross-process publisher
    * outside this JVM would still self-heal at its next commit via
    * ghost adoption. (DROP + re-CREATE restarting at v=0 is fine: drop
    * removes the pointer file, so the guard sees no current value.) */
  private def publishLatest(name: String, v: Long): Unit = {
    val lock = TableStore.latestPtrLocks
      .computeIfAbsent(dir(name).toAbsolutePath.normalize.toString,
        _ => new Object)
    lock.synchronized {
      val cur = try Some(new String(Files.readAllBytes(latestPtr(name)),
        StandardCharsets.UTF_8).trim.toLong)
      catch { case _: java.io.IOException => None }
      if (cur.exists(_ >= v)) return
      // uuid suffix: two publishers of the SAME v (adoption racing the
      // ghost's live writer) must not share a tmp path — the loser's
      // move would throw NoSuchFileException after the winner consumed it
      val tmp = dir(name).resolve(
        s"_LATEST.tmp$v-${java.util.UUID.randomUUID().toString.take(8)}")
      Files.write(tmp, v.toString.getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, latestPtr(name), StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING): Unit
    }
    onStep("latest-published")
  }

  private def scanDirs(dirs: Seq[String], name: String, schema: StructType): DataFrame =
    if (dirs.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else {
      val paths = dirs.map(b => dir(name).resolve("data").resolve(b).toString)
      // one multi-path scan, not a union of scans: keeps it a single
      // FileSourceScanExec so filters/pruning apply once
      spark.read.schema(schema).parquet(paths: _*)
    }

  /** Time travel below the retention window must refuse LOUDLY, not
    * surface a bare NoSuchFileException from the manifest walk — the
    * same contract restore() already states (m21 proves it end-to-end).
    * Shared by the library face (readVersion) and the SQL face
    * (snapshotAt, behind VERSION AS OF / TIMESTAMP AS OF). */
  private def requireVersionReadable(name: String, v: Long): Unit =
    if (!Files.exists(manifest(name, v)) && !Files.exists(ckptPath(name, v)))
      throw new IllegalArgumentException(
        s"cannot time-travel $name to version $v: manifest vacuumed " +
          "(retention GC swept it) or never committed")

  def readVersion(name: String, v: Long): DataFrame = {
    requireVersionReadable(name, v)
    val m = readManifest(name, v)
    scanLive(name, m, m.dirs)
  }

  def read(name: String): DataFrame = readVersion(name, currentVersion(name))

  /** Dir-pruned read for a PROBE JOIN: a SUPERSET of the table's rows
    * whose `cols` values appear in `probe` (callers keep their own
    * semi-join for exactness — this only cuts the dirs the scan
    * reads). The library-face analogue of the DSv2 scan's runtime
    * pruning, for maintenance code that joins `st.read` frames rather
    * than going through the SQL catalog (the IVM probes — r12 VERDICT
    * #3/#4). Three arms, cheapest first:
    *   1. bucket layout, when `cols` covers the bucket keys: the
    *      probe's distinct bucket ids select leaf dirs EXACTLY (the
    *      read-side mirror of [[pruneByKeys]]);
    *   2. manifest stats + bloom, single-col probes up to `cap`
    *      distinct values: an In predicate dir-prunes when the layout
    *      is value-informative (range-clustered creates, or the
    *      per-commit dirs an incrementally-maintained table
    *      accumulates — each commit's dir carries only its batch's
    *      values); a hash layout on an UNRELATED key defeats stats
    *      but a bloom index on the probe column still prunes;
    *   3. full scan (probe too wide, multi-col non-bucket probes).
    * Rows with NULL probe-column values may drop in arm 2 — nulls
    * never match the equi-semi-join this feeds. `version` pins a
    * historical read (the max/min recompute arm). */
  def readProbe(name: String, probe: DataFrame, cols: Seq[String],
                cap: Int = 10000, version: Option[Long] = None): DataFrame = {
    val v = version.getOrElse(currentVersion(name))
    requireVersionReadable(name, v)
    val m = readManifest(name, v)
    scanLive(name, m, probeDirs(name, m, probe, cols, cap))
  }

  /** [[readProbe]]'s dir selection, exposed for measurement: how many
    * dirs would a probe read vs the table's total (the dirs-read
    * evidence behind the FK-index scale story — tools/ProbeFkIndex). */
  def probeDirCount(name: String, probe: DataFrame, cols: Seq[String],
                    cap: Int = 10000): (Int, Int) = {
    val m = readManifest(name, currentVersion(name))
    (probeDirs(name, m, probe, cols, cap).size, m.dirs.size)
  }

  private def probeDirs(name: String, m: Manifest, probe: DataFrame,
                        cols: Seq[String], cap: Int): Seq[String] = {
    // pruning obeys min(|probe|, |dirs|): below a few dozen dirs no
    // realistic probe prunes anything, and the dir-selection itself
    // costs a driver-side collect job — skip straight to the full set
    // (the 100 TB regime this serves has 10^4-10^5 dirs)
    if (m.dirs.size <= 48) return m.dirs
    val bucketArm = m.bucketing.exists(b => b.keys.forall(cols.contains)) &&
      m.dirs.nonEmpty && m.dirs.forall(_.contains("/__b="))
    if (bucketArm) {
      val b = m.bucketing.get
      val srcBuckets = probe.select(b.expr.as("__b")).distinct()
        .collect().map(_.getInt(0)).toSet
      m.dirs.filter(e => srcBuckets.contains(bucketOf(e)))
    } else if (cols.size == 1 && m.dirs.nonEmpty) {
      val c = cols.head
      val vals = probe.select(col(c)).filter(col(c).isNotNull)
        .distinct().limit(cap + 1).collect().map(_.get(0)).toSeq
      if (vals.size > cap) m.dirs
      else if (vals.isEmpty) Seq.empty
      else pruneDirsByCondition(name, m, col(c).isin(vals: _*))._1
    } else m.dirs
  }

  // ---- deletion vectors (merge-on-read DELETE) ----

  /** Root of a table's deletion-vector sidecars. */
  def dvRoot(name: String): Path = dir(name).resolve("_dv")

  /** `<dir>/<filename>` for a scanned row — the key deletion vectors
    * are recorded under (matches the manifest dir entry + base name). */
  private def relpathCol: Column =
    substring_index(col("_metadata.file_path"), "/data/", -1)

  /** Manifest dir entry of a relpath: everything before the last '/'. */
  private def dirOf(c: String): Column =
    expr(s"substring($c, 1, length($c) - " +
      s"length(substring_index($c, '/', -1)) - 1)")

  /** The (relpath, pos) rows of the given dirs' deletion vectors. */
  private def dvRows(name: String, m: Manifest, dvDirs: Seq[String]): DataFrame = {
    val paths = dvDirs.flatMap(d => m.dvs.get(d).map(_.path)).distinct
      .map(p => dvRoot(name).resolve(p).toString)
    spark.read.parquet(paths: _*)
      .filter(col("dir").isin(dvDirs: _*))
      .select(col("relpath").as("__dv_relpath"), col("pos").as("__dv_pos"))
  }

  /** Scan of live dirs with any deletion vectors APPLIED: dirs without
    * DVs take the plain multi-path scan; DV'd dirs anti-join their
    * (file, position) tombstones — the DV side is tiny (deleted rows
    * only) so the anti-join broadcasts; pushdown/pruning on the main
    * scan is unaffected. Every internal reader of live table data goes
    * through here, so merge/update/compact can never resurrect
    * DV-deleted rows. */
  private def scanLive(name: String, m: Manifest, dirs: Seq[String]): DataFrame = {
    val (dvd, clean) = dirs.partition(m.dvs.contains)
    // files carry PHYSICAL names; the select maps back to logical (a
    // no-op Project that Catalyst collapses when no column was renamed)
    val cleanDf = scanDirs(clean, name, m.physSchema).select(m.logicalCols: _*)
    if (dvd.isEmpty) cleanDf
    else {
      val schemaCols = m.schema.map(f => col(f.name))
      val applied = scanDirs(dvd, name, m.physSchema)
        .select(m.logicalCols :+ relpathCol.as("__relpath") :+
          col("_metadata.row_index").as("__pos"): _*)
        .join(broadcast(dvRows(name, m, dvd)),
          col("__relpath") === col("__dv_relpath") && col("__pos") === col("__dv_pos"),
          "left_anti")
        .select(schemaCols: _*)
      if (clean.isEmpty) applied else cleanDf.unionByName(applied)
    }
  }

  /** DELETE ... WHERE cond as a MERGE-ON-READ commit: instead of
    * rewriting the dirs the predicate touches ([[delete]]'s
    * copy-on-write), record the matching rows' (file, position)
    * tombstones in a `_dv/` sidecar and commit only metadata. At
    * 100 TB a point delete writes kilobytes instead of rewriting
    * gigabytes; reads anti-join the (tiny) tombstone set until a
    * rewrite of the dir (merge / update / compact / optimize)
    * materializes the deletion and drops the DV. Stats/bloom pruning
    * bounds stay sound — DVs only remove rows. With the change feed
    * on, the deleted rows land under `_cdf/<v>` in the same pass. */
  def deleteVectorized(name: String, condition: Column): Unit = {
    val m = readManifest(name, currentVersion(name))
    val (touched, _) = pruneDirsByCondition(name, m, condition)
    if (touched.isEmpty) return
    val v = m.baseVersion + 1
    val uuid = java.util.UUID.randomUUID.toString.take(8)
    // one scan of the touched dirs stages the matching rows (the small
    // side, by MoR's premise) with their positions; sidecar + change
    // rows derive from it. Persisted, not written to a temp parquet:
    // the set feeds 2-3 downstream jobs and a disk roundtrip per
    // commit doubles the fixed cost of small mutations; MEMORY_AND_DISK
    // spills if a predicate unexpectedly matches big
    // change rows materialize `__rid` when tracking is on, so a CDF
    // consumer can key deletes on `_row_id` (keyless replication)
    val trackingCdf = m.cdf && m.props.contains(RowTrackingProp)
    val staged0 = scanLiveWithPos(name, m, touched, withRid = trackingCdf)
      .filter(coalesce(condition, lit(false)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // unpersist in finally: a DV/CDF write failure or a lost commit
    // race must not leave the staged blocks pinned in the executors
    try {
    val staged = if (!trackingCdf) staged0 else resolveRid(staged0, m)
    val perDir = staged.select(dirOf("__relpath").as("dir"))
      .groupBy("dir").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    if (perDir.isEmpty) return
    val newDirs = perDir.keySet
    // dirs that already carry a DV merge their old tombstones in, so
    // each dir keeps exactly one sidecar reference
    val dvName = s"dv-$v-$uuid"
    val fresh = staged.select(dirOf("__relpath").as("dir"),
      col("__relpath").as("relpath"), col("__pos").as("pos"))
    val priorDvd = newDirs.filter(m.dvs.contains).toSeq
    val combined =
      if (priorDvd.isEmpty) fresh
      else fresh.unionByName(
        dvRows(name, m, priorDvd)
          .select(col("__dv_relpath").as("relpath"), col("__dv_pos").as("pos"))
          .withColumn("dir", dirOf("relpath"))
          .select("dir", "relpath", "pos"))
    combined.sortWithinPartitions("relpath", "pos")
      .write.mode("overwrite").parquet(dvRoot(name).resolve(dvName).toString)
    onStep("dv-written")
    val stagedCdf = if (!m.cdf) None else {
      val cdfDir = cdfStaging(name, v, uuid)
      Files.createDirectories(cdfDir)
      // _cdf files carry PHYSICAL names, like every parquet this store writes
      val cdfRid = if (trackingCdf) Seq(col(RidCol)) else Nil
      staged.select(m.schema.map(f => col(f.name).as(m.phys(f.name))) ++ cdfRid: _*)
        .write.mode("overwrite")
        .parquet(cdfDir.resolve("__cdc=delete").toString)
      onStep("cdf-staged")
      Some(cdfDir)
    }
    val updated = newDirs.map { d =>
      val prior = m.dvs.get(d).map(_.deleted).getOrElse(0L)
      d -> DvRef(dvName, prior + perDir(d))
    }.toMap
    commitWithCdf(name, v, m.copy(dvs = m.dvs ++ updated), stagedCdf)
    } finally staged0.unpersist()
  }

  /** UPDATE ... SET ... WHERE cond as a MERGE-ON-READ commit: the
    * matched rows' (file, position) tombstones land in a `_dv/`
    * sidecar (exactly like [[deleteVectorized]]) and their post-SET
    * images are APPENDED as a new batch dir — one commit, no touched
    * dir rewritten. A point update on a 100 TB table writes the
    * changed rows plus kilobytes of tombstones instead of rewriting
    * every dir the predicate might touch; the copy-on-write [[update]]
    * stays the right call when most of a dir changes. Stats/bloom
    * bounds on old dirs stay sound (DVs only remove rows); the new dir
    * gets fresh footer stats. With the change feed on, preimage and
    * postimage rows land under `_cdf/<v>` in the same pass. */
  def updateVectorized(name: String, condition: Column,
                       set: Map[String, Column]): Unit = {
    val m = readManifest(name, currentVersion(name))
    // a typo'd SET column would otherwise be silently dropped while the
    // matched rows are still tombstoned and re-appended unchanged
    require(set.keySet.subsetOf(m.schema.fieldNames.toSet),
      s"SET references non-existent column(s): " +
        s"${(set.keySet -- m.schema.fieldNames).mkString(", ")}")
    val (touched, _) = pruneDirsByCondition(name, m, condition)
    if (touched.isEmpty) return
    val v = m.baseVersion + 1
    val uuid = java.util.UUID.randomUUID.toString.take(8)
    // one scan of the touched dirs stages the matching rows (the small
    // side, by MoR's premise) with their positions; tombstones,
    // postimages, and change rows all derive from this single pass.
    // Persisted (spill-safe), not round-tripped through a temp parquet
    // — the write+re-read doubled the fixed cost of small mutations
    val tracking = m.props.contains(RowTrackingProp)
    val schemaCols = m.schema.map(f => col(f.name))
    val staged0 = scanLiveWithPos(name, m, touched, withRid = tracking)
      .filter(coalesce(condition, lit(false)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // unpersist in finally: a postimage/DV/CDF write failure or a lost
    // commit race must not leave the staged blocks pinned
    try {
    // row tracking: resolve each staged row's STABLE id now (carried
    // __rid from a prior rewrite, else the manifest base + position)
    // so the postimage file can materialize it — the id survives the
    // tombstone+re-append
    val staged = if (!tracking) staged0 else resolveRid(staged0, m)
    val perDir = staged.select(dirOf("__relpath").as("dir"))
      .groupBy("dir").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    if (perDir.isEmpty) return
    // post-SET images (every staged row matched, so SET applies
    // unconditionally), conformed + CHECK-enforced like any append
    val out = m.schema.map(f =>
      set.get(f.name).map(_.as(f.name)).getOrElse(col(f.name).as(f.name)))
    val conformCols = m.schema.map(f => col(f.name).cast(f.dataType).as(f.name))
    val outRid = if (tracking) out :+ col(RidCol) else out
    val conformRid = if (tracking) conformCols :+ col(RidCol) else conformCols
    val postimage = enforceChecks(
      staged.select(outRid: _*).select(conformRid: _*), m.allChecks)
    val newDirs = writeBatch(name, postimage, v, m,
      extraPhys = if (tracking) Seq(col(RidCol)) else Nil,
      uuid = Some(uuid))
    // tombstones: fresh positions + the prior DVs of dirs gaining new
    // ones, merged so each dir keeps exactly one sidecar reference
    val dvName = s"dv-$v-$uuid"
    val fresh = staged.select(dirOf("__relpath").as("dir"),
      col("__relpath").as("relpath"), col("__pos").as("pos"))
    val priorDvd = perDir.keySet.filter(m.dvs.contains).toSeq
    val combined =
      if (priorDvd.isEmpty) fresh
      else fresh.unionByName(
        dvRows(name, m, priorDvd)
          .select(col("__dv_relpath").as("relpath"), col("__dv_pos").as("pos"))
          .withColumn("dir", dirOf("relpath"))
          .select("dir", "relpath", "pos"))
    combined.sortWithinPartitions("relpath", "pos")
      .write.mode("overwrite").parquet(dvRoot(name).resolve(dvName).toString)
    onStep("dv-written")
    val stagedCdf = if (!m.cdf) None else {
      val cdfDir = cdfStaging(name, v, uuid)
      Files.createDirectories(cdfDir)
      // with row tracking the change rows MATERIALIZE the stable id, so
      // a change-feed consumer can key on `_row_id` (keyless replication)
      val cdfRid = if (tracking) Seq(col(RidCol)) else Nil
      val toPhys = m.schema.map(f => col(f.name).as(m.phys(f.name))) ++ cdfRid
      // ONE write for both images: partitionBy lays out the same
      // `__cdc=<kind>/` dirs the reader globs, at half the job count
      // (these commits are fixed-cost-dominated at small batch sizes)
      staged.select(schemaCols ++ cdfRid: _*).select(toPhys: _*)
        .withColumn("__cdc", lit("update_preimage"))
        .unionByName(postimage.select(toPhys: _*)
          .withColumn("__cdc", lit("update_postimage")))
        .write.mode("overwrite").partitionBy("__cdc")
        .parquet(cdfDir.toString)
      onStep("cdf-staged")
      Some(cdfDir)
    }
    val updatedDvs = perDir.keySet.map { d =>
      val prior = m.dvs.get(d).map(_.deleted).getOrElse(0L)
      d -> DvRef(dvName, prior + perDir(d))
    }.toMap
    val stats = { import scala.collection.parallel.CollectionConverters._
      m.stats ++ newDirs.par.flatMap(d =>
        DirStats.collect(dataRoot(name).resolve(d), m.physSchema)
          .map(m.statsToLogical).map(d -> _)).seq }
    commitWithCdf(name, v,
      m.copy(dirs = m.dirs ++ newDirs, stats = stats, dvs = m.dvs ++ updatedDvs),
      stagedCdf)
    } finally staged0.unpersist()
  }

  /** Live scan of `dirs` with DVs applied AND position metadata kept
    * (`__relpath`, `__pos`) — the input [[deleteVectorized]] stages.
    * With `withRid` the scan also surfaces the materialized `__rid`
    * column row-tracking postimage files carry (null in files that
    * predate tracking or were never rewritten — their ids derive from
    * the manifest's per-file base instead). */
  private def scanLiveWithPos(name: String, m: Manifest, dirs: Seq[String],
                              withRid: Boolean = false): DataFrame = {
    val schema =
      if (!withRid) m.physSchema
      else StructType(m.physSchema.fields :+
        org.apache.spark.sql.types.StructField(RidCol, org.apache.spark.sql.types.LongType))
    val extra =
      if (!withRid) Seq.empty[Column] else Seq(col(RidCol))
    val base = scanDirs(dirs, name, schema)
      .select(m.logicalCols ++ extra :+ relpathCol.as("__relpath") :+
        col("_metadata.row_index").as("__pos"): _*)
    val dvd = dirs.filter(m.dvs.contains)
    if (dvd.isEmpty) base
    else base.join(broadcast(dvRows(name, m, dvd)),
      col("__relpath") === col("__dv_relpath") && col("__pos") === col("__dv_pos"),
      "left_anti")
  }

  /** Resolve each row's stable id into `__rid`: the materialized
    * `__rid` a row-tracking postimage file carries when present, else
    * the manifest's per-file base + file position. Input must carry
    * `__relpath`/`__pos` (a [[scanLiveWithPos]] frame, or a staged
    * copy of one). The base lookup broadcasts O(live files) rows. */
  private def resolveRid(df: DataFrame, m: Manifest): DataFrame = {
    val bases = spark.createDataFrame(
      m.rowbase.toSeq.map(kv => (kv._1, kv._2)))
      .toDF("__rb_relpath", "__rb_base")
    val in = if (df.columns.contains(RidCol)) df
             else df.withColumn(RidCol, lit(null).cast("long"))
    in.join(broadcast(bases), col("__relpath") === col("__rb_relpath"), "left")
      .withColumn(RidCol, coalesce(col(RidCol), col("__rb_base") + col("__pos")))
      .drop("__rb_relpath", "__rb_base")
  }

  /** Live scan of `dirs` with every row's RESOLVED stable id attached
    * as `__rid` — the input of every id-preserving rewrite (compact /
    * optimize / copy-on-write mutations): the rewrite materializes the
    * resolved ids into the new files, so the rows keep their identity
    * across the physical move. Returns logical columns + `__rid`. */
  private def scanLiveRid(name: String, m: Manifest, dirs: Seq[String]): DataFrame =
    resolveRid(scanLiveWithPos(name, m, dirs, withRid = true), m)
      .drop("__relpath", "__pos")

  /** ROW TRACKING (the Delta row-id model, re-expressed on the
    * manifest): once enabled, every data file is assigned a base row
    * id at commit time (commitManifest — ALL write paths inherit it),
    * and a row's STABLE id is `base + position-in-file`. Merge-on-read
    * mutations preserve ids for free (DV deletes never move surviving
    * rows; [[updateVectorized]] postimages MATERIALIZE their preimage
    * id in a `__rid` file column, which readers prefer over the
    * derived id). Ids are unique across the table's whole history and
    * never reused — the watermark only grows. */
  def enableRowTracking(name: String): Unit =
    setProperties(name, Map(RowTrackingProp -> 0L.toString))

  /** Read the table with its stable `_row_id` column attached.
    * The per-file base lookup is a broadcast of O(live files) manifest
    * metadata; everything else is the ordinary pruned live scan. */
  def readWithRowIds(name: String): DataFrame =
    readWithRowIds(name, currentVersion(name))

  /** Time-travel twin: ids AT `version` — rows read the bases that
    * version's manifest assigned (ids never change once assigned, so a
    * row live in both versions reports the same id). The SQL surface is
    * `SELECT _row_id FROM t VERSION AS OF v`. */
  def readWithRowIds(name: String, version: Long): DataFrame = {
    val m = readManifest(name, version)
    require(m.props.contains(RowTrackingProp),
      s"row tracking is not enabled on $name — call enableRowTracking first")
    resolveRid(scanLiveWithPos(name, m, m.dirs, withRid = true), m)
      .withColumnRenamed(RidCol, "_row_id")
      .drop("__relpath", "__pos")
  }

  /** One consistent view of a table: version + schema + live dirs +
    * bucketing, read from a SINGLE manifest resolution. Callers that
    * need more than one of these fields (e.g. the DSv2 scan pairing a
    * schema with a file list) must use this instead of separate
    * schemaOf/liveDirs calls, which could straddle a concurrent commit. */
  def snapshot(name: String): Snapshot = snapshotAt(name, currentVersion(name))

  /** Pinned snapshot of a historical version (time travel). */
  def snapshotAt(name: String, v: Long): Snapshot = {
    requireVersionReadable(name, v)
    val m = readManifest(name, v)
    Snapshot(v, m.schema, m.dirs, m.bucketing, m.stats, m.bloomCols, m.dvs,
      m.colmap, m.props)
  }

  /** Per-FILE base row ids keyed by absolute path — the planning-time
    * input of the DSv2 `_row_id` metadata column (row tracking). */
  def rowBaseByFile(name: String, version: Long): Map[String, Long] = {
    val m = readManifest(name, version)
    if (m.rowbase.isEmpty) Map.empty
    else m.rowbase.map { case (rel, b) =>
      dataRoot(name).resolve(rel).toString -> b
    }
  }

  /** LAZY deletion-vector delivery: per DV'd live dir, the absolute
    * sidecar parquet files holding its tombstones. Pure manifest + one
    * directory listing per distinct sidecar — NO Spark job, NO position
    * materialized on the driver. Each scan task filters the sidecar to
    * its own file's `relpath` executor-side (GraftDvSidecars), so at
    * 100 TB with heavy churn the driver never holds tombstone rows;
    * sidecar writes sort by (relpath, pos) so that per-file probe
    * prunes row groups. */
  def dvSidecarsByDir(name: String, version: Long): Map[String, Seq[String]] = {
    val m = readManifest(name, version)
    if (m.dvs.isEmpty) return Map.empty
    val filesByName: Map[String, Seq[String]] =
      m.dvs.values.map(_.path).toSet.iterator.map { n: String =>
        val d = dvRoot(name).resolve(n)
        n -> Using.resource(Files.list(d))(_.iterator().asScala
          .map(_.toString).filter(_.endsWith(".parquet")).toSeq.sorted)
      }.toMap
    m.dvs.map { case (d, ref) => d -> filesByName(ref.path) }
  }

  /** Latest version whose manifest was committed at or before `tsMillis`
    * (TIMESTAMP AS OF resolution — commit time approximated by the
    * manifest file's modification time, the same heuristic Delta uses). */
  def versionAsOfTimestamp(name: String, tsMillis: Long): Long = {
    val cur = currentVersion(name)
    val hit = (0L to cur).reverse.find { v =>
      val m = manifest(name, v)
      Files.exists(m) && Files.getLastModifiedTime(m).toMillis <= tsMillis
    }
    hit.getOrElse(throw new IllegalArgumentException(
      s"no version of $name existed at or before timestamp $tsMillis"))
  }

  def schemaOf(name: String): StructType = readManifest(name, currentVersion(name)).schema

  def bucketingOf(name: String): Option[Bucketing] =
    readManifest(name, currentVersion(name)).bucketing

  /** Number of live data dirs (bucketed: leaf dirs) — observability for
    * compaction and prune assertions. */
  def liveDirs(name: String): Seq[String] =
    readManifest(name, currentVersion(name)).dirs
  def liveDirCount(name: String): Int = liveDirs(name).size

  /** (dirs a predicate must scan, total live dirs) under the SAME
    * manifest-stats + bloom prune the DSv2 scan and the pruned
    * mutations use — the driver-visible probe surface for pruning
    * behavior (m22b proves prune survives a type widening; at 100 TB
    * this count is the difference between reading ~1 dir and the
    * table). */
  def pruneCount(name: String, condition: Column): (Int, Int) = {
    val m = readManifest(name, currentVersion(name))
    val (touched, _) = pruneDirsByCondition(name, m, condition)
    (touched.size, m.dirs.size)
  }

  /** CREATE TABLE AS / full replace (new table or schema change allowed). */
  def create(name: String, df: DataFrame): Unit =
    commit(name, Some(df), Manifest(df.schema, Nil, None, Map.empty), Seq.empty)

  /** CREATE TABLE AS with hash bucketing on `keys` into `n` leaf dirs:
    * key-driven mutations then rewrite only affected buckets. */
  def createBucketed(name: String, df: DataFrame, keys: Seq[String], n: Int): Unit =
    commit(name, Some(df), Manifest(df.schema, Nil, Some(Bucketing(keys, n)), Map.empty),
      Seq.empty)

  /** CREATE TABLE with schema, zero rows (S5 empty staging write). */
  def createEmpty(name: String, schema: StructType,
                  bucketing: Option[(Seq[String], Int)] = None): Unit =
    commit(name, None,
      Manifest(schema, Nil, bucketing.map { case (keys, n) => Bucketing(keys, n) },
        Map.empty), Seq.empty)

  /** GENERATED ALWAYS AS (the Delta generated-column model on the
    * store's property surface): register `colName` as computed from
    * `exprSql` over the row's other columns. Library writes (append /
    * overwrite) COMPUTE the column when the input omits it and validate
    * it when present; every other commit path (SQL INSERT, attached
    * dirs, merges, vectorized updates) VALIDATES — a stored value
    * disagreeing with its expression refuses the commit. */
  def setGeneratedColumn(name: String, colName: String, exprSql: String): Unit = {
    val m = readManifest(name, currentVersion(name))
    require(m.schema.fieldNames.contains(colName), s"no such column: $colName")
    val refs = spark.sessionState.sqlParser.parseExpression(exprSql)
      .references.map(_.name).toSet
    require(refs.forall(m.schema.fieldNames.contains),
      s"generation expression references unknown columns: " +
        refs.filterNot(m.schema.fieldNames.contains).mkString(","))
    require(!refs.contains(colName), s"$colName cannot generate from itself")
    setProperties(name, Map(s"generated.$colName" -> exprSql))
  }

  /** Compute absent generated columns from their expressions (library
    * write convenience; present columns pass through and get VALIDATED
    * by the commit's check enforcement). */
  private def applyGenerated(df: DataFrame, m: Manifest): DataFrame =
    m.props.view.filterKeys(_.startsWith("generated."))
      .toSeq.sortBy(_._1)
      .foldLeft(df) { case (d, (k, sql)) =>
        val c = k.stripPrefix("generated.")
        if (d.columns.contains(c)) d else d.withColumn(c, expr(sql))
      }

  /** IDENTITY column (Delta GENERATED ALWAYS AS IDENTITY): appends and
    * overwrites that OMIT the column get dense ids continuing from the
    * manifest's persisted high-watermark (`identity.<col>.next` prop);
    * inputs carrying the column are refused (ALWAYS semantics — the
    * system owns the values). Ids are assigned with zipWithIndex
    * (SurrogateKeys.dense's scale path, no global window sort) and the
    * watermark advances IN THE SAME COMMIT as the rows, so a replayed
    * or crashed write can never double-assign. Two appends racing on
    * the watermark conflict loudly (the optimistic rebase refuses —
    * see commitAppendWithRetry) instead of minting duplicate ids. */
  def setIdentityColumn(name: String, colName: String, start: Long = 1L): Unit = {
    val m = readManifest(name, currentVersion(name))
    require(m.schema.fieldNames.contains(colName), s"no such column: $colName")
    require(m.schema(colName).dataType == org.apache.spark.sql.types.LongType,
      s"identity column $colName must be BIGINT")
    setProperties(name, Map(s"identity.$colName.next" -> start.toString))
  }

  /** Assign ids for absent identity columns; returns the df plus the
    * advanced-watermark props to commit WITH it. Counts each batch once
    * (one extra action per identity column, O(new rows)). */
  private def applyIdentity(df: DataFrame, m: Manifest): (DataFrame, Map[String, String]) = {
    val idCols = m.props.view.filterKeys(_.startsWith("identity."))
      .toSeq.sortBy(_._1)
    idCols.foldLeft((df, Map.empty[String, String])) {
      case ((d, props), (k, nextStr)) =>
        val c = k.stripPrefix("identity.").stripSuffix(".next")
        require(!d.columns.contains(c),
          s"$c is GENERATED ALWAYS AS IDENTITY — writes must not supply it")
        val next = nextStr.toLong
        val n = d.count()
        (graft.ops.SurrogateKeys.dense(d, c, base = next - 1),
          props + (k -> (next + n).toString))
    }
  }

  /** INSERT OVERWRITE semantics: replace contents, PRESERVE the existing
    * table schema (and bucketing) by casting-by-name — the reference
    * chose INSERT OVERWRITE precisely to avoid schema drift
    * (docs/KNOWN_ISSUES.md:77-99). */
  def overwrite(name: String, df: DataFrame): Unit = {
    val m = readManifest(name, currentVersion(name))
    val (withIds, idProps) = applyIdentity(df, m)
    commit(name, Some(conform(applyGenerated(withIds, m), m.schema)),
      m.copy(stats = Map.empty), Seq.empty, idProps): Unit
  }

  /** INSERT OVERWRITE ... WHERE — Delta's `replaceWhere`: atomically
    * replace exactly the rows matching `condition` with `df`'s rows in
    * ONE commit. The deleteVectorized+append pair this supersedes
    * exposes the deleted-but-not-yet-reinserted table between its two
    * versions (and a time traveler to that middle version sees it
    * forever); here no reader at any version ever can.
    *
    * Contract (Delta's): every incoming row must satisfy `condition` —
    * a "replacement" writing outside the region it claims to replace
    * is rejected executor-side before any data lands. An empty `df`
    * is a pure region delete; a predicate matching nothing is a pure
    * insert.
    *
    * Scale shape: stats/bloom pruning bounds the scan to dirs that can
    * hold matching rows. A dir whose live rows ALL match is DROPPED
    * from the manifest (metadata-only — the whole-partition-replace
    * case costs no tombstones and strands no dead rows behind DVs);
    * the full-match test is exact, from footer row counts minus prior
    * tombstones, O(matched dirs) footer reads. Partially-matching dirs
    * tombstone through one merged DV sidecar (merge-on-read — never
    * rewritten). Incoming rows land as a fresh batch dir (bucketed
    * layout preserved) with footer stats; identity / generated /
    * CHECK enforcement all apply as in any write. With the change feed
    * on, delete and insert rows land under `_cdf/<v>` in the same pass
    * (insert rows carry no `__rid`: fresh ids are assigned only at
    * commit — the same NULL-id contract as copy-on-write postimages).
    * Rewrite-shaped commit: a racing writer conflicts loudly, never
    * rebases. */
  def overwriteWhere(name: String, condition: Column, df: DataFrame): Unit = {
    val m = readManifest(name, currentVersion(name))
    val (withIds, idProps) = applyIdentity(df, m)
    val incoming = conform(applyGenerated(withIds, m), m.schema)
      .filter(assert_true(coalesce(condition, lit(false)),
        lit("overwriteWhere: incoming row does not satisfy the replace " +
          s"predicate ($condition)")).isNull)
    replaceRegionCommit(name, m, condition,
      newDirsOf = (v, uuid) => writeBatch(name,
        enforceChecks(incoming, m.allChecks), v, m, uuid = Some(uuid)),
      extraProps = idProps)
  }

  /** DSv2 twin of [[overwriteWhere]] (SQL `INSERT INTO ... REPLACE
    * WHERE` / `DataFrameWriterV2.overwrite(cond)`): the executors
    * already wrote the batch dir, so validate the region contract and
    * CHECK constraints against the staged FILES (one bounded scan
    * each, BEFORE any metadata changes — a violation commits nothing,
    * and the orphan dir stays invisible and GC-able like every aborted
    * DSv2 write), then run the same one-commit region replacement.
    * On a bucketed table the batch dir's `__b=<k>` leaves each become
    * their own manifest dir (layout preserved through the replace). */
  private[graft] def attachDirWhere(name: String, batchDir: String,
                                    condition: Column): Unit = {
    val m = readManifest(name, currentVersion(name))
    val dirs: Seq[String] = m.bucketing match {
      case Some(_) =>
        val batch = dataRoot(name).resolve(batchDir)
        if (!Files.isDirectory(batch)) Seq.empty
        else Using.resource(Files.list(batch))(_.iterator().asScala
          .map(_.getFileName.toString).filter(_.startsWith("__b="))
          .map(l => s"$batchDir/$l").toSeq.sorted)
      case None => Seq(batchDir)
    }
    val stagedView = scanDirs(dirs, name, m.physSchema).select(m.logicalCols: _*)
    if (!stagedView.filter(!coalesce(condition, lit(false))).isEmpty)
      throw new IllegalArgumentException(
        s"REPLACE WHERE on $name: staged rows do not satisfy the replace " +
          s"predicate ($condition) — nothing committed")
    requireChecksPass(name, m, dirs)
    replaceRegionCommit(name, m, condition, newDirsOf = (_, _) => dirs,
      extraProps = Map.empty,
      statsAbsentIsNull = false) // external writer, like attachDir
  }

  /** Shared core of [[overwriteWhere]] / [[attachDirWhere]]: replace
    * `condition`'s region with the new dirs in ONE commit (tombstone /
    * drop decisions, DV sidecar, change rows, stats, manifest).
    * `newDirsOf` is called with the commit version so the library path
    * can materialize its batch dir under the right version number.
    * The recorded change feed's insert rows are read BACK from the
    * written batch files, never by re-executing the caller's plan — a
    * second execution of a non-deterministic source (identity
    * assignment, rand()) could mint change rows that disagree with
    * the rows actually committed, and even a deterministic plan would
    * pay a full second run. */
  private def replaceRegionCommit(name: String, m: Manifest, condition: Column,
                                  newDirsOf: (Long, String) => Seq[String],
                                  extraProps: Map[String, String],
                                  statsAbsentIsNull: Boolean = true): Unit = {
    val v = m.baseVersion + 1
    val uuid = java.util.UUID.randomUUID.toString.take(8)
    val (touched, _) = pruneDirsByCondition(name, m, condition)
    val trackingCdf = m.cdf && m.props.contains(RowTrackingProp)
    // one scan of the touched dirs stages the matching (live) rows with
    // their positions; tombstones, full-drop decisions, and delete
    // change rows all derive from this single pass. None when pruning
    // proves nothing can match (pure insert) — a zero-dir scan has no
    // file metadata to position against.
    val staged0: Option[DataFrame] =
      if (touched.isEmpty) None
      else Some(scanLiveWithPos(name, m, touched, withRid = trackingCdf)
        .filter(coalesce(condition, lit(false)))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    try {
      val staged = staged0.map(s => if (!trackingCdf) s else resolveRid(s, m))
      val perDir = staged.map(_.select(dirOf("__relpath").as("dir"))
        .groupBy("dir").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
        .getOrElse(Map.empty[String, Long])
      // exact live counts decide full drops: footer totals minus prior
      // tombstones, only for dirs that matched at all
      val liveCount: Map[String, Long] = {
        import scala.collection.parallel.CollectionConverters._
        perDir.keySet.toSeq.par.map { d =>
          val total = DirStats.fileRowCounts(dataRoot(name).resolve(d))
            .map(_._2).sum
          d -> (total - m.dvs.get(d).map(_.deleted).getOrElse(0L))
        }.seq.toMap
      }
      val dropped = perDir.keySet.filter(d => perDir(d) == liveCount(d))
      val partial = (perDir.keySet -- dropped).toSeq.sorted
      val newDirs = newDirsOf(v, uuid)
      // DV sidecar only for partially-replaced dirs (+ their prior DVs,
      // merged so each dir keeps exactly one sidecar reference)
      val dvName = s"dv-$v-$uuid"
      val updatedDvs: Map[String, DvRef] =
        if (partial.isEmpty) Map.empty
        else {
          val partialSet = partial.toSet
          val fresh = staged.get
            .withColumn("dir", dirOf("__relpath"))
            .filter(col("dir").isin(partial: _*))
            .select(col("dir"), col("__relpath").as("relpath"),
              col("__pos").as("pos"))
          val priorDvd = partial.filter(m.dvs.contains)
          val combined =
            if (priorDvd.isEmpty) fresh
            else fresh.unionByName(
              dvRows(name, m, priorDvd)
                .select(col("__dv_relpath").as("relpath"), col("__dv_pos").as("pos"))
                .withColumn("dir", dirOf("relpath"))
                .select("dir", "relpath", "pos"))
          combined.sortWithinPartitions("relpath", "pos")
            .write.mode("overwrite").parquet(dvRoot(name).resolve(dvName).toString)
          onStep("dv-written")
          partialSet.map { d =>
            val prior = m.dvs.get(d).map(_.deleted).getOrElse(0L)
            d -> DvRef(dvName, prior + perDir(d))
          }.toMap
        }
      val stagedCdf = if (!m.cdf) None else {
        val cdfDir = cdfStaging(name, v, uuid)
        Files.createDirectories(cdfDir)
        val cdfRid = if (trackingCdf) Seq(col(RidCol)) else Nil
        val toPhys = m.schema.map(f => col(f.name).as(m.phys(f.name))) ++ cdfRid
        // ONE write lays out both `__cdc=<kind>/` dirs; insert rows
        // null-fill __rid (ids only exist after the commit)
        val insertRows = scanDirs(newDirs, name, m.physSchema)
          .select(m.schema.map(f => col(m.phys(f.name))): _*)
          .withColumn("__cdc", lit("insert"))
        staged.map(_.select(m.schema.map(f => col(f.name)) ++ cdfRid: _*)
            .select(toPhys: _*).withColumn("__cdc", lit("delete"))
            .unionByName(insertRows, allowMissingColumns = true))
          .getOrElse(insertRows)
          .write.mode("overwrite").partitionBy("__cdc").parquet(cdfDir.toString)
        onStep("cdf-staged")
        Some(cdfDir)
      }
      val keptDirs = m.dirs.filterNot(dropped.contains)
      val stats = { import scala.collection.parallel.CollectionConverters._
        (m.stats -- dropped) ++ newDirs.par.flatMap(d =>
          DirStats.collect(dataRoot(name).resolve(d), m.physSchema,
              absentIsNull = statsAbsentIsNull)
            .map(m.statsToLogical).map(d -> _)).seq }
      commitWithCdf(name, v,
        m.copy(dirs = keptDirs ++ newDirs, stats = stats,
          dvs = (m.dvs -- dropped) ++ updatedDvs,
          props = m.props ++ extraProps),
        stagedCdf)
    } finally staged0.foreach(_.unpersist())
  }

  /** INSERT INTO append: O(new rows) — adds dirs, keeps the rest (on a
    * bucketed table only the buckets present in the new data get new
    * leaf dirs). */
  def append(name: String, df: DataFrame): Unit = {
    val m = readManifest(name, currentVersion(name))
    val (withIds, idProps) = applyIdentity(df, m)
    commit(name, Some(conform(applyGenerated(withIds, m), m.schema)), m,
      m.dirs, idProps, appendShaped = true): Unit
    maybeAutoCompact(name)
  }

  /** Opt-in auto-compaction (the Delta autoOptimize/autoCompact idea):
    * after an append, fold the accreted small dirs once enough of them
    * pile up — a streaming/CDC ingest keeps itself read-optimized with
    * no scheduled OPTIMIZE job. Off by default; enable with
    * `graft.autoCompact.enabled=true` (threshold tunables below). Runs
    * only from append — compactSmall's own commit can't re-trigger. */
  private def maybeAutoCompact(name: String): Unit =
    if (spark.conf.getOption("graft.autoCompact.enabled").contains("true")) {
      // best-effort maintenance AFTER the caller's append already
      // committed: a failure here (typically compactSmall losing its
      // exclusive commit to a racing writer) must NOT propagate — the
      // caller would read "append failed, nothing committed", retry,
      // and land its rows twice. The skipped compaction just runs on a
      // later append.
      try {
        val maxBytes = spark.conf.getOption("graft.autoCompact.smallFileBytes")
          .map(_.toLong).getOrElse(16L * 1024 * 1024)
        val minDirs = spark.conf.getOption("graft.autoCompact.minSmallDirs")
          .map(_.toInt).getOrElse(8)
        val m = readManifest(name, currentVersion(name))
        val small = m.dirs.count { d =>
          val p = dataRoot(name).resolve(d)
          Files.isDirectory(p) && Using.resource(Files.list(p))(_.iterator().asScala
            .filter(_.getFileName.toString.endsWith(".parquet"))
            .map(f => Files.size(f)).sum) < maxBytes
        }
        if (small >= minDirs) compactSmall(name, maxBytes): Unit
      } catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(
            s"[graft] auto-compaction of $name skipped: ${e.getMessage}")
      }
    }

  /** INSERT INTO with automatic schema evolution (Delta's mergeSchema):
    * nullable columns present in `df` but not in the table are added
    * first (metadata-only — [[addColumns]]), then the rows append.
    * Existing rows read the new columns as NULL; columns the table has
    * but `df` lacks are filled with NULL for the new rows. */
  def appendEvolve(name: String, df: DataFrame): Unit = {
    val src = canonicalizeForEvolve(name, df, "appendEvolve")
    evolveAddColumns(name, src)
    val widened = schemaOf(name)
    val have = src.columns.map(_.toLowerCase).toSet
    val filled = widened.fields.filterNot(f => have.contains(f.name.toLowerCase))
      .foldLeft(src)((d, f) => d.withColumn(f.name, lit(null).cast(f.dataType)))
    append(name, filled)
  }

  /** Shared first step of every schema-evolving write: canonicalize
    * source names to the TABLE's case (the match is case-insensitive —
    * Spark's default resolution — but the downstream conform() is
    * exact-case: without the rename a source column differing only in
    * case would be neither added, nor null-filled, nor accepted), with
    * the collision check BEFORE renaming — a source carrying two
    * columns differing only in case ('Id' and 'id') would otherwise
    * rename one onto the other and fail later resolution with an
    * opaque ambiguity error, or silently pick one (r8 ADVICE). */
  private def canonicalizeForEvolve(name: String, df: DataFrame,
                                    op: String): DataFrame = {
    val cur = schemaOf(name)
    val canonical = cur.fields.map(f => f.name.toLowerCase -> f.name).toMap
    val dupes = df.columns.groupBy(_.toLowerCase).filter(_._2.length > 1)
    require(dupes.isEmpty,
      s"$op: source columns collide case-insensitively: " +
        dupes.values.map(_.mkString("/")).mkString(", "))
    df.columns.foldLeft(df) { (d, c) =>
      canonical.get(c.toLowerCase).filter(_ != c)
        .map(t => d.withColumnRenamed(c, t)).getOrElse(d)
    }
  }

  /** Add `src`'s table-absent columns (nullable, metadata-only — one
    * [[addColumns]] commit; existing rows read them as NULL). */
  private def evolveAddColumns(name: String, src: DataFrame): Unit = {
    val curNames = schemaOf(name).fieldNames.map(_.toLowerCase).toSet
    val added = src.schema.fields.filterNot(f => curNames.contains(f.name.toLowerCase))
      .map(_.copy(nullable = true))
    if (added.nonEmpty) addColumns(name, StructType(added))
  }

  /** OPTIMIZE-style compaction: rewrite the accumulated dirs as one
    * batch sized to `targetPartitions` files (bucketed tables re-split
    * into their buckets). Old versions remain time-travel readable.
    * Row-tracked tables materialize each row's resolved id into the
    * compacted files, so compaction never changes a row's `_row_id`
    * (the Delta OPTIMIZE row-tracking guarantee). */
  def compact(name: String, targetPartitions: Int = 0): Unit = {
    val m = readManifest(name, currentVersion(name))
    // direct commit, not overwrite(): the rows came FROM the table, so
    // identity/generated-column re-derivation would be wrong (identity
    // refuses supplied values) and conform is a no-op
    val df = rewriteSource(name, m, m.dirs)
    val sized = if (targetPartitions > 0) df.coalesce(targetPartitions) else df
    val v = commit(name, Some(sized), m.copy(stats = Map.empty), Seq.empty,
      propOverrides = noChangeStamp(m, m.baseVersion + 1),
      extraPhys = rewriteExtra(m))
    markNoLogicalChange(name, v, m.cdf)
  }

  /** OPTIMIZE ... WHERE (predicate-scoped compaction): fold only the
    * live dirs whose manifest stats might match `condition` into one
    * batch dir; everything else carries untouched with its stats. The
    * Delta pattern for compacting a hot partition of a 100 TB table
    * without touching the cold ones — cost is O(matching dirs). DVs on
    * folded dirs materialize (scanLive applies them); carried dirs
    * keep theirs. */
  def compactWhere(name: String, condition: Column): Unit = {
    val m = readManifest(name, currentVersion(name))
    val (touched, carried) = pruneDirsByCondition(name, m, condition)
    if (touched.size <= 1) return // nothing to fold
    // meta passes through unchanged: bucketed tables re-route the
    // folded rows into __b leaves, keeping their layout
    val v = commit(name, Some(rewriteSource(name, m, touched)), m, carried,
      propOverrides = noChangeStamp(m, m.baseVersion + 1),
      extraPhys = rewriteExtra(m))
    markNoLogicalChange(name, v, m.cdf)
  }

  /** Deletion-vector purge: rewrite ONLY the dirs whose tombstone
    * ratio (DV deleted rows / manifest rows) reached `minDeletedRatio`,
    * folding their DVs away; lightly-tombstoned and clean dirs carry
    * untouched. The merge-on-read lifecycle's third act: point
    * deletes/updates write kilobyte DVs, reads skip positions, and
    * THIS pass reclaims the read amplification once a dir is worth
    * rewriting — each run costs O(heavily-deleted dirs), never a table
    * rewrite. Returns how many dirs were purged. */
  def compactDvHeavy(name: String, minDeletedRatio: Double = 0.1): Int = {
    require(minDeletedRatio > 0.0 && minDeletedRatio <= 1.0,
      s"ratio out of (0,1]: $minDeletedRatio")
    val m = readManifest(name, currentVersion(name))
    val heavy = m.dirs.filter { d =>
      m.dvs.get(d).exists { dv =>
        m.stats.get(d).map(_.rows).exists(r =>
          r > 0L && dv.deleted.toDouble / r >= minDeletedRatio)
      }
    }
    if (heavy.isEmpty) return 0
    val carried = m.dirs.filterNot(heavy.toSet)
    val v = commit(name, Some(rewriteSource(name, m, heavy)), m, carried,
      propOverrides = noChangeStamp(m, m.baseVersion + 1),
      extraPhys = rewriteExtra(m))
    markNoLogicalChange(name, v, m.cdf)
    heavy.size
  }

  /** The id-preserving rewrite inputs: row-tracked tables scan with
    * resolved `__rid` (materialized into the rewritten files via
    * [[rewriteExtra]]); untracked tables scan plain. */
  private def rewriteSource(name: String, m: Manifest, dirs: Seq[String]): DataFrame =
    if (m.props.contains(RowTrackingProp)) scanLiveRid(name, m, dirs)
    else scanLive(name, m, dirs)
  private def rewriteExtra(m: Manifest): Seq[Column] =
    if (m.props.contains(RowTrackingProp)) Seq(col(RidCol)) else Nil

  /** Small-file compaction: fold every live dir whose on-disk size sits
    * under `maxBytes` into one batch dir, carrying the big dirs — the
    * routine maintenance pass for tables accreting many small
    * streaming/CDC increments. Returns how many dirs were folded. */
  def compactSmall(name: String, maxBytes: Long): Int = {
    val m = readManifest(name, currentVersion(name))
    def dirBytes(d: String): Long = {
      val p = dataRoot(name).resolve(d)
      if (!Files.isDirectory(p)) 0L
      else Using.resource(Files.list(p))(_.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .map(f => Files.size(f)).sum)
    }
    val (small, big) = m.dirs.partition(d => dirBytes(d) < maxBytes)
    if (small.size <= 1) return 0
    val v = commit(name, Some(rewriteSource(name, m, small)), m, big,
      propOverrides = noChangeStamp(m, m.baseVersion + 1),
      extraPhys = rewriteExtra(m))
    markNoLogicalChange(name, v, m.cdf)
    small.size
  }

  /** OPTIMIZE-family commits rewrite files but change no rows: with the
    * change feed on, stamp an empty `_cdf/<v>` marker so the CDF reader
    * reports zero changes instead of a spurious full delete+insert.
    * `v` is the version the caller COMMITTED (pinned) and `cdf` the flag
    * it carried into that version — never re-read here: a rival append
    * landing right after the commit must not get ITS version stamped
    * "zero logical changes" (which would erase its rows from the feed). */
  /** Manifest prop stamping a version as PHYSICAL-ONLY (compact /
    * optimize / DV purge): the value is the stamping commit's own
    * version, so the prop carried forward onto later manifests matches
    * nothing but its own version. Crash-atomic with the commit — the
    * post-publish `_cdf/<v>` marker dir alone left a window (writer
    * dies between publish and marker) where a full-rewrite compact
    * read back as phantom delete-all+insert-all (CrashSweepSpec's
    * compact sweep). */
  private[graft] val NoChangeProp = "cdf.nochange"
  private def noChangeStamp(m: Manifest, v: Long): Map[String, String] =
    if (!m.cdf) Map.empty else Map(NoChangeProp -> v.toString)

  private def markNoLogicalChange(name: String, v: Long, cdf: Boolean): Unit =
    if (cdf)
      Files.createDirectories(dir(name).resolve("_cdf").resolve(v.toString)): Unit

  /** OPTIMIZE ... clustered-by-range (ZORDER-lite, single dimension
    * family): rewrite the table range-partitioned on `cols` with ONE
    * MANIFEST DIR PER RANGE, so each dir's [min,max] stats are narrow
    * and disjoint and StatsPruning drops all but the matching dirs for
    * point/range predicates — after clustering on customer_id, a GDPR
    * UPDATE/DELETE for one customer rewrites one dir, not the table.
    * Trades away hash bucketing (key-driven merge pruning) for read/
    * mutation locality: use on read-optimized tables. Old versions stay
    * time-travel readable. */
  def optimizeByRange(name: String, cols: Seq[String], nDirs: Int): Unit = {
    require(nDirs > 0, "nDirs must be positive")
    val m = readManifest(name, currentVersion(name))
    clusterRewrite(name, m,
      rewriteSource(name, m, m.dirs)
        .repartitionByRange(nDirs, cols.map(col): _*)
        .sortWithinPartitions(cols.map(col): _*))
  }

  /** OPTIMIZE ... ZORDER BY: rewrite the table clustered on the
    * INTERLEAVED quantile-bucket bits of several columns, so every
    * clustering column — not just the leading one — gets narrow per-dir
    * [min,max] stats. optimizeByRange on (a, b) orders lexically: dirs
    * are narrow in `a` but each spans all of `b`, so predicates on `b`
    * alone prune nothing. Z-ordering buckets each column into
    * 2^bitsPerCol quantile ranks (one approxQuantile sampling pass, the
    * same approach as Delta's range-id Z-order) and range-partitions on
    * the bit-interleaved rank, giving every column ~equal locality: a
    * point predicate on ANY of the columns prunes ~(1 - 2^-bitsPerCol/
    * ncols-ish) of the dirs. Numeric/date/timestamp columns only
    * (ranks need an order AND a quantile sketch; string locality is a
    * different trade — use optimizeByRange for a single string key). */
  def optimizeByZOrder(name: String, cols: Seq[String], nDirs: Int,
                       bitsPerCol: Int = 4): Unit = {
    require(nDirs > 0, "nDirs must be positive")
    require(cols.size >= 2, "z-order needs >= 2 columns (use optimizeByRange for 1)")
    require(bitsPerCol >= 1 && bitsPerCol * cols.size <= 62, "bits out of range")
    val m = readManifest(name, currentVersion(name))
    val rankable: Seq[Column] = cols.map { c =>
      val f = m.schema.fields.find(_.name.equalsIgnoreCase(c)).getOrElse(
        throw new IllegalArgumentException(s"no such column: $c"))
      f.dataType match {
        case _: org.apache.spark.sql.types.NumericType => col(f.name).cast("double")
        case org.apache.spark.sql.types.DateType => unix_date(col(f.name)).cast("double")
        case org.apache.spark.sql.types.TimestampType => unix_micros(col(f.name)).cast("double")
        case other => throw new IllegalArgumentException(
          s"z-order unsupported for $c: $other")
      }
    }
    val df = rewriteSource(name, m, m.dirs)
    val nBuckets = 1 << bitsPerCol
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    // ONE sampling pass computes every column's quantile boundaries
    // (approxQuantile = Greenwald-Khanna sketch, driver gets ~15 doubles
    // per column — this is the only extra read vs optimizeByRange)
    val qcols = rankable.indices.map(i => s"__zq$i")
    val bounds = df.select(rankable.zip(qcols).map { case (e, n) => e.as(n) }: _*)
      .stat.approxQuantile(qcols.toArray, probs, 0.01)
    // bucket rank = #boundaries <= value (null -> 0: nulls cluster first)
    val buckets: Seq[Column] = rankable.zip(bounds).map { case (e, bs) =>
      bs.distinct.sorted.foldLeft(lit(0))((acc, t) =>
        acc + when(e >= t, 1).otherwise(0))
    }
    // interleave: bit k of column i lands at position k*ncols + i
    val nc = buckets.size
    val z = (0 until bitsPerCol).flatMap { k =>
      buckets.zipWithIndex.map { case (b, i) =>
        shiftright(b, k).bitwiseAND(lit(1)).cast("long") * lit(1L << (k * nc + i))
      }
    }.reduce(_ + _)
    clusterRewrite(name, m,
      df.withColumn("__z", z)
        .repartitionByRange(nDirs, col("__z"))
        .sortWithinPartitions(col("__z")))
  }

  /** Shared tail of the OPTIMIZE rewrites: write the clustered rows with
    * ONE MANIFEST DIR PER POST-SHUFFLE PARTITION (narrow disjoint stats
    * per dir), collect fresh stats, commit. Drops any helper columns the
    * clustering added (only schema columns are written). */
  /** Write one range-clustered batch for version v; returns its leaf
    * dirs + their footer stats (the caller commits). */
  private def writeClusteredBatch(name: String, m: Manifest,
                                  clustered: DataFrame, v: Long)
      : (Seq[String], Map[String, DirStats]) = {
    val batch = f"b$v%09d-" + java.util.UUID.randomUUID.toString.take(8)
    val target = dir(name).resolve("data").resolve(batch)
    // __r = physical range id: constant per post-range-shuffle partition,
    // so each leaf dir holds one contiguous range of the clustering key
    val keepRid = // id-preserving rewrite: materialize resolved ids
      if (clustered.columns.contains(RidCol)) Seq(col(RidCol)) else Nil
    clustered
      .select(m.schema.map(f => col(f.name).as(m.phys(f.name))) ++ keepRid :+
        spark_partition_id().as("__r"): _*)
      .write.mode("overwrite").partitionBy("__r").parquet(target.toString)
    val leaves =
      if (!Files.exists(target)) Seq.empty
      else Using.resource(Files.list(target))(
        _.iterator().asScala
          .map(_.getFileName.toString).filter(_.startsWith("__r="))
          .map(l => s"$batch/$l").toSeq.sorted)
    val stats = { import scala.collection.parallel.CollectionConverters._
      leaves.par.flatMap(l =>
        DirStats.collect(dir(name).resolve("data").resolve(l), m.physSchema)
          .map(m.statsToLogical).map(l -> _)).toMap.seq }
    (leaves, stats)
  }

  private def clusterRewrite(name: String, m: Manifest, clustered: DataFrame): Unit = {
    val v = m.baseVersion + 1
    val (leaves, stats) = writeClusteredBatch(name, m, clustered, v)
    commitExclusive(name, v,
      m.copy(dirs = leaves, bucketing = None, stats = stats,
        props = m.props ++ noChangeStamp(m, v)), "OPTIMIZE rewrite")
    markNoLogicalChange(name, v, m.cdf)
  }

  /** INCREMENTAL re-clustering (the OPTIMIZE cadence a 100 TB table can
    * actually afford): recluster ONLY the dirs whose [min,max] ranges
    * on `c` overlap some other dir's range — after appends to a range-
    * clustered table that is exactly the accreted tail — and carry
    * every already-disjoint dir untouched. Each overlap group rewrites
    * into as many range-sorted dirs as it had (so granularity is
    * stable), groups land in ONE commit, and a fully-clustered table
    * is a no-op. All-null dirs are trivially disjoint and carried;
    * any dir without reliable stats forces the full rewrite (rare —
    * footers always yield stats for supported types). Returns the
    * number of dirs rewritten. */
  def optimizeIncrementalByRange(name: String, c: String): Int = {
    val m = readManifest(name, currentVersion(name))
    require(m.schema.fieldNames.exists(_.equalsIgnoreCase(c)), s"no such column: $c")
    require(m.bucketing.isEmpty,
      "incremental clustering applies to range-clustered (unbucketed) tables")
    final case class B(dir: String, mn: Any, mx: Any)
    val known = Seq.newBuilder[B]
    var unknown = List.empty[String]
    m.dirs.foreach { d =>
      val st = m.stats.get(d)
      val cs = st.flatMap(_.cols.get(c))
      (cs.flatMap(_.min), cs.flatMap(_.max)) match {
        case (Some(mn), Some(mx)) => known += B(d, mn, mx)
        case _ if cs.exists(s => s.nulls.exists(n => st.exists(_.rows == n))) =>
          () // all-null dir: no value range, can't overlap — carried
        case _ => unknown ::= d
      }
    }
    if (unknown.nonEmpty) {
      // unknown ranges could overlap anything: degenerate to the full
      // rewrite (and regain stats for every dir)
      optimizeByRange(name, Seq(c), math.max(1, m.dirs.size))
      return m.dirs.size
    }
    // interval sweep: group dirs whose value ranges overlap
    val sorted = known.result().sortWith((a, b) => DirStats.lt(a.mn, b.mn))
    val groups = Seq.newBuilder[Seq[B]]
    var cur = List.empty[B]
    var curMax: Any = null // running group max — keeps the sweep O(n)
    sorted.foreach { b =>
      if (cur.isEmpty || DirStats.lte(b.mn, curMax)) {
        cur ::= b
        curMax = if (cur.tail.isEmpty || DirStats.lt(curMax, b.mx)) b.mx else curMax
      } else { groups += cur.reverse; cur = List(b); curMax = b.mx }
    }
    if (cur.nonEmpty) groups += cur.reverse
    val (overlap, disjoint) = groups.result().partition(_.size >= 2)
    if (overlap.isEmpty) return 0
    val v = m.baseVersion + 1
    val rewritten = overlap.flatMap(_.map(_.dir))
    val newParts = overlap.map { g =>
      writeClusteredBatch(name, m,
        rewriteSource(name, m, g.map(_.dir))
          .repartitionByRange(g.size, col(c))
          .sortWithinPartitions(col(c)), v)
    }
    val carried = m.dirs.filterNot(rewritten.toSet)
    commitExclusive(name, v, m.copy(
      dirs = carried ++ newParts.flatMap(_._1),
      stats = m.stats.view.filterKeys(carried.toSet).toMap ++
        newParts.flatMap(_._2),
      props = m.props ++ noChangeStamp(m, v)), "OPTIMIZE rewrite")
    markNoLogicalChange(name, v, m.cdf)
    rewritten.size
  }

  /** ALTER TABLE ADD COLUMN (manual schema evolution —
    * /root/reference/docs/Silver_Layer_Developer_Guide.md:140-153):
    * a metadata-only commit — no data rewrite. Existing files simply
    * lack the column; both read paths (multi-path parquet scan with an
    * explicit schema, and the DSv2 parquet-mr reader) surface it as
    * NULL, which matches Delta's ADD COLUMN semantics. New columns must
    * be nullable for exactly that reason. */
  def addColumns(name: String, newCols: StructType): Unit = {
    val m = readManifest(name, currentVersion(name))
    val clash = newCols.fieldNames.filter(m.schema.fieldNames.contains)
    require(clash.isEmpty, s"columns already exist: ${clash.mkString(",")}")
    require(newCols.forall(_.nullable),
      "ADD COLUMN requires nullable columns (existing rows have no value)")
    // a new logical name whose default physical identity collides with
    // a DROPPED column's physical name (still present in live files) or
    // another column's physical gets a FRESH physical identity — old
    // values can never resurrect under the new column
    val taken = m.droppedPhys.toSet ++ m.colmap.values
    val freshMap = newCols.fieldNames.filter(taken.contains).map(n =>
      n -> s"$n-${java.util.UUID.randomUUID.toString.take(8)}").toMap
    commit(name, None,
      m.copy(schema = StructType(m.schema.fields ++ newCols.fields),
        colmap = m.colmap ++ freshMap), m.dirs): Unit
  }

  /** The widenings Spark's parquet readers decode IN PLACE (both scan
    * paths — `spark.read.schema(...)` and the DSv2
    * VectorizedParquetRecordReader — share the machinery): requesting
    * the wider type over an old file needs no rewrite and no per-file
    * conversion shim. This is Delta's type-widening feature re-expressed
    * on the reader Spark already ships; each arm below is empirically
    * probed against the 4.1 reader (int32→int64/double/decimal,
    * float→double, date→timestamp_ntz, decimal rescale). */
  private def parquetWidenable(from: DataType, to: DataType): Boolean = {
    def intDigits(d: DecimalType): Int = d.precision - d.scale
    (from, to) match {
      case (ByteType, ShortType | IntegerType | LongType) => true
      case (ShortType, IntegerType | LongType) => true
      case (IntegerType, LongType | DoubleType) => true
      case (FloatType, DoubleType) => true
      case (DateType, TimestampNTZType) => true
      // decimal targets are capped at the WRITER's layout (unscaled
      // INT32/INT64, precision <= 18 — GraftWrite.messageType): a wider
      // metadata-only commit would be readable but never writable again,
      // and canUpCast forbids narrowing back — a permanently wedged
      // table. The cap also bounds the row-path rescale (fileScale ->
      // d.scale) so the unscaled product always fits a Long. bigint →
      // decimal is gone with it: canUpCast demands intDigits >= 20,
      // i.e. precision >= 20, which no writable target satisfies.
      case (ByteType, d: DecimalType) => d.precision <= 18 && intDigits(d) >= 3
      case (ShortType, d: DecimalType) => d.precision <= 18 && intDigits(d) >= 5
      case (IntegerType, d: DecimalType) => d.precision <= 18 && intDigits(d) >= 10
      case (f: DecimalType, t: DecimalType) =>
        t.precision <= 18 && t.scale >= f.scale && intDigits(t) >= intDigits(f)
      case _ => false
    }
  }

  /** Manifest-stats value conversion for a metadata-only widening: the
    * canonical primitive forms change with the type (Int→Long, date
    * days→NTZ micros...). None = no exact conversion — the entry is
    * DROPPED (no stats = "might match", which is always correct). */
  private def widenStat(v: Any, to: DataType): Option[Any] = (v, to) match {
    case (x: Int, ShortType | IntegerType) => Some(x) // byte/short widen, Int-canonical
    case (x: Int, LongType) => Some(x.toLong)
    case (x: Int, DoubleType) => Some(x.toDouble)
    case (x: Float, DoubleType) => Some(x.toDouble)
    case (x: Int, TimestampNTZType) => Some(x.toLong * 86400000000L) // days → micros
    case _ => None
  }

  /** ALTER TABLE ... ALTER COLUMN <c> TYPE <t> — WIDENING casts only
    * (Spark's canUpCast): a lossy change must be an explicit user
    * SELECT. Refused on bucketing keys (the hash layout is
    * type-dependent) and bloom-indexed columns (sidecar hashes are
    * type-dependent — unset bloom first).
    *
    * Two paths, chosen by what the parquet reader can decode in place:
    *  - [[parquetWidenable]] pairs commit METADATA-ONLY (the Delta
    *    type-widening model): existing files keep their physical type
    *    and every scan — library and DSv2 — requests the widened
    *    logical schema, which Spark's readers upcast at decode. At
    *    100 TB an int→bigint is one manifest commit, not a table
    *    rewrite. Old versions time-travel with their old type; stats
    *    re-canonicalize exactly (or drop to "might match").
    *  - anything else canUpCast allows but the reader can't decode
    *    (e.g. int→string) falls back to the honest copy-on-write
    *    rewrite, id-preserving like compact. */
  def alterColumnType(name: String, colName: String,
                      newType: org.apache.spark.sql.types.DataType): Unit = {
    val m = readManifest(name, currentVersion(name))
    require(m.schema.fieldNames.contains(colName), s"no such column: $colName")
    val old = m.schema(colName).dataType
    if (old == newType) return
    require(org.apache.spark.sql.catalyst.expressions.Cast.canUpCast(old, newType),
      s"cannot change $colName from $old to $newType: only widening casts " +
        "(an explicit SELECT-and-overwrite expresses lossy conversions)")
    // refuse BEFORE any commit OR rewrite: the engine writes decimals
    // unscaled-INT32/INT64 only (precision <= 18, GraftWrite.messageType).
    // A wider target committed metadata-only would poison every later
    // append/merge (writer throws, canUpCast forbids narrowing back);
    // the rewrite path would throw mid-write. Loud and upfront instead.
    newType match {
      case d: DecimalType => require(d.precision <= 18,
        s"cannot change $colName to $newType: decimals above precision 18 " +
          "are outside this engine's INT64-backed layout — an explicit " +
          "SELECT-and-overwrite into a new table expresses the conversion")
      case _ =>
    }
    require(!m.bucketing.exists(_.keys.contains(colName)),
      s"cannot retype bucketing key $colName — the hash layout depends on it")
    require(!m.bloomCols.contains(colName),
      s"cannot retype bloom-indexed column $colName — sidecar hashes are " +
        "type-dependent; unset bloom columns first")
    val newSchema = StructType(m.schema.map(f =>
      if (f.name == colName) f.copy(dataType = newType) else f))
    if (parquetWidenable(old, newType)) {
      // metadata-only: one manifest commit, zero data I/O
      val widened = m.stats.view.mapValues { ds =>
        ds.copy(cols = ds.cols.flatMap {
          case (k, cs) if k == colName =>
            val mn = cs.min.map(widenStat(_, newType))
            val mx = cs.max.map(widenStat(_, newType))
            // drop the entry rather than keep half-converted bounds
            if (mn.exists(_.isEmpty) || mx.exists(_.isEmpty)) None
            else Some(k -> cs.copy(min = mn.flatten, max = mx.flatten))
          case kv => Some(kv)
        })
      }.toMap
      commitExclusive(name, m.baseVersion + 1,
        m.copy(schema = newSchema, stats = widened,
          props = m.props ++ noChangeStamp(m, m.baseVersion + 1)),
        "ALTER COLUMN TYPE (widen)")
      markNoLogicalChange(name, m.baseVersion + 1, m.cdf)
      return
    }
    // id-preserving rewrite (rewriteSource/rewriteExtra, like compact):
    // a row-tracked table must keep every row's `_row_id` through the
    // retype — a plain read-and-rewrite would mint fresh bases for all
    // files while markNoLogicalChange tells CDF consumers nothing
    // changed, silently diverging rid-keyed replicas
    val ridKeep = rewriteExtra(m)
    val recast = conformKeep(rewriteSource(name, m, m.dirs), newSchema, ridKeep)
    val v = commit(name, Some(recast),
      m.copy(schema = newSchema, stats = Map.empty), Seq.empty,
      propOverrides = noChangeStamp(m, m.baseVersion + 1),
      extraPhys = ridKeep)
    markNoLogicalChange(name, v, m.cdf)
  }

  /** ALTER TABLE RENAME COLUMN — metadata-only, the Delta
    * column-mapping model: the column keeps its PHYSICAL name in every
    * existing and future parquet file; only the manifest's logical
    * surface (schema, stats keys, bucketing keys, bloom config) changes.
    * No data rewrite at any scale. Refused while a CHECK constraint
    * references the column (its stored SQL would silently break —
    * the same restriction Delta applies). */
  def renameColumn(name: String, from: String, to: String): Unit = {
    val m = readManifest(name, currentVersion(name))
    require(m.schema.fieldNames.contains(from), s"no such column: $from")
    require(!m.schema.fieldNames.contains(to), s"column already exists: $to")
    val referencing = (m.checks ++ m.props.view.filterKeys(_.startsWith("generated.")))
      .filter { case (_, sql) =>
        spark.sessionState.sqlParser.parseExpression(sql)
          .references.exists(_.name == from) }
    require(referencing.isEmpty && !m.props.contains(s"generated.$from"),
      s"cannot rename $from: referenced by CHECK constraint(s) / generated " +
        s"column(s) ${referencing.keys.mkString(",")} — drop them first")
    val phys = m.phys(from)
    val colmap = (m.colmap - from) ++ (if (phys == to) Map.empty[String, String]
                                       else Map(to -> phys))
    commitExclusive(name, m.baseVersion + 1, m.copy(
      schema = StructType(m.schema.map(f =>
        if (f.name == from) f.copy(name = to) else f)),
      colmap = colmap,
      // an identity rule follows its column: left keyed by the old name
      // it would mint a phantom column and break conform() on every
      // subsequent write
      props = m.props.map {
        case (k, v) if k == s"identity.$from.next" =>
          s"identity.$to.next" -> v
        case kv => kv
      } ++ noChangeStamp(m, m.baseVersion + 1),
      stats = m.stats.view.mapValues(ds => ds.copy(cols =
        ds.cols.map { case (k, v) => (if (k == from) to else k) -> v })).toMap,
      bucketing = m.bucketing.map(b => b.copy(keys =
        b.keys.map(k => if (k == from) to else k))),
      bloomCols = m.bloomCols.map(c => if (c == from) to else c)),
      "RENAME COLUMN")
    markNoLogicalChange(name, m.baseVersion + 1, m.cdf)
  }

  /** ALTER TABLE DROP COLUMN — metadata-only: files keep the column's
    * physical data (readers project it away); its physical name is
    * remembered so a later ADD COLUMN of the same name maps to a fresh
    * physical identity instead of resurrecting old values. Refused on
    * bucketing keys (layout derives from them), bloom columns, and
    * CHECK-referenced columns. */
  def dropColumn(name: String, colName: String): Unit = {
    val m = readManifest(name, currentVersion(name))
    require(m.schema.fieldNames.contains(colName), s"no such column: $colName")
    require(!m.bucketing.exists(_.keys.contains(colName)),
      s"cannot drop bucketing key $colName")
    require(!m.bloomCols.contains(colName),
      s"cannot drop bloom-indexed column $colName — unset bloom columns first")
    val referencing = (m.checks ++ m.props.view.filterKeys(_.startsWith("generated.")))
      .filter { case (_, sql) =>
        spark.sessionState.sqlParser.parseExpression(sql)
          .references.exists(_.name == colName) }
    require(referencing.isEmpty,
      s"cannot drop $colName: referenced by CHECK constraint(s) / generated " +
        s"column(s) ${referencing.keys.mkString(",")} — drop them first")
    // dropping a generated/identity column itself is fine: its rule
    // goes with it (a stale identity prop would otherwise bind to a
    // later re-ADD of the same name)
    commitExclusive(name, m.baseVersion + 1, m.copy(
      schema = StructType(m.schema.filterNot(_.name == colName)),
      colmap = m.colmap - colName,
      props = m.props - s"generated.$colName" - s"identity.$colName.next" ++
        noChangeStamp(m, m.baseVersion + 1),
      stats = m.stats.view.mapValues(ds =>
        ds.copy(cols = ds.cols - colName)).toMap,
      droppedPhys = (m.droppedPhys :+ m.phys(colName)).distinct),
      "DROP COLUMN")
    markNoLogicalChange(name, m.baseVersion + 1, m.cdf)
  }

  /** CLONE (Delta `CREATE TABLE ... CLONE` semantics): a new table
    * whose v0 is `src`'s current snapshot, created WITHOUT copying any
    * data — every live data file, DV sidecar, and bloom sidecar is
    * HARD-LINKED into the clone, so the commit is O(files) metadata
    * operations. The tables then evolve independently: mutations on
    * either side write their own new files, and vacuum on one can
    * never break the other (a hard link keeps the shared bytes alive
    * until BOTH sides drop them — strictly safer than Delta's
    * path-sharing shallow clone, with the same zero-copy cost; on
    * object storage the equivalent is a manifest-only copy with
    * absolute file refs). Schema, stats, bucketing, column mapping,
    * CHECK constraints, properties, and pending DVs all carry; the
    * clone's history and streaming watermarks start fresh. */
  def cloneTable(src: String, dst: String): Unit = {
    require(exists(src), s"table $src does not exist")
    require(!exists(dst), s"table $dst already exists")
    val m = readManifest(src, currentVersion(src))
    def linkAll(from: Path, to: Path): Unit =
      if (Files.isDirectory(from)) {
        Files.createDirectories(to)
        Using.resource(Files.list(from))(_.iterator().asScala.toSeq).foreach { p =>
          if (Files.isDirectory(p)) linkAll(p, to.resolve(p.getFileName.toString))
          else Files.createLink(to.resolve(p.getFileName.toString), p): Unit
        }
      }
    m.dirs.foreach(d =>
      linkAll(dataRoot(src).resolve(d), dataRoot(dst).resolve(d)))
    m.dvs.values.map(_.path).toSeq.distinct.foreach(p =>
      linkAll(dvRoot(src).resolve(p), dvRoot(dst).resolve(p)))
    if (m.bloomCols.nonEmpty) linkAll(bloomRoot(src), bloomRoot(dst))
    commitManifest(dst, 0, m.copy(txns = Map.empty))
  }

  /** mtime for sweep age checks — a file that vanished between list
    * and stat (a concurrent sweep or commit) reads as "now", i.e.
    * young, so nothing gets deleted on a race. */
  private def sweepMtime(p: Path): Long =
    try Files.getLastModifiedTime(p).toMillis
    catch { case _: java.io.IOException => System.currentTimeMillis() }

  /** VACUUM: physically delete data no version within the retained
    * window references — superseded batch dirs/bucket leaves and orphan
    * dirs from aborted DSv2 writes. Keeps the latest `retainVersions`
    * manifests (so that much time travel survives) and deletes older
    * manifests, whose data may be gone. Returns the deleted paths.
    * `dryRun` reports what WOULD delete without touching anything (the
    * Delta VACUUM DRY RUN contract).
    *
    * Scale: pure manifest-diff + directory deletes — O(dirs), no data
    * read. The reference lists VACUUM as future work
    * (/root/reference/README.md:654-659); the manifest design makes it
    * a set subtraction here. */
  /** Test hook: runs right after vacuum resolves `cur` — the window in
    * which a concurrent commit can land a version vacuum's retained-set
    * arithmetic never saw (deterministic race injection, as
    * [[onBeforeOptimisticCommit]]). */
  private[graft] var onVacuumAfterVersionRead: () => Unit = () => ()

  def vacuum(name: String, retainVersions: Int = 1,
             dryRun: Boolean = false): Seq[Path] = {
    require(retainVersions >= 1, "must retain at least the current version")
    val cur = currentVersion(name)
    onVacuumAfterVersionRead()
    val keepVersions = (math.max(0L, cur - retainVersions + 1) to cur)
    // versions on disk, from ONE _v listing (not O(version-count)
    // exists probes). NonFatal guard on each read: hard-link
    // publication means a listed <v>.json is always complete, but a
    // LEGACY torn record (pre-link crash) could still sit on disk —
    // "skip it" is right, its dirs are young and the age guard keeps
    // them.
    val onDiskVersions: Seq[Long] = {
      val vd = dir(name).resolve("_v")
      if (!Files.isDirectory(vd)) Nil
      else Using.resource(Files.list(vd))(_.iterator().asScala
        .map(_.getFileName.toString)
        .flatMap { n =>
          val num = n.takeWhile(_.isDigit)
          if (num.nonEmpty && n == s"$num.json") num.toLongOption else None
        }.toSeq)
    }
    def dirsOf(v: Long): Seq[String] =
      try readManifest(name, v).dirs
      catch { case scala.util.control.NonFatal(_) => Nil }
    // LIVE = the retained window PLUS any version a concurrent writer
    // committed after this vacuum read `cur` — a newer commit's dirs
    // are the FUTURE, not superseded history, and must never sweep
    val live: Set[String] =
      (keepVersions.flatMap(v => readManifest(name, v).dirs) ++
        onDiskVersions.filter(_ > cur).flatMap(dirsOf)).toSet
    // dirs referenced only by manifests BELOW the retained window are
    // superseded history: swept immediately. The complement (no
    // on-disk manifest at all) is crash scratch or a commit in flight,
    // which only age distinguishes.
    val referenced: Set[String] =
      onDiskVersions.filter(_ < keepVersions.head).flatMap(dirsOf).toSet
    // per-top-dir probes below must be O(1), not O(|referenced|+|live|)
    // prefix scans per entry — that made the sweep loop O(dirs^2) on
    // 10^5-dir histories (ProbeManifest/ProbeAppendHot round)
    def topOf(d: String): String = {
      val i = d.indexOf('/'); if (i < 0) d else d.substring(0, i)
    }
    val referencedTops: Set[String] = referenced.map(topOf)
    val liveByTop: Map[String, Set[String]] = live.groupBy(topOf)
    val dataDir = dataRoot(name)
    val deleted = Seq.newBuilder[Path]
    // deleteIfExists / recursive-delete-ignores-missing: a CONCURRENT
    // vacuum may sweep the same path first — deleting already-deleted
    // history is success, not an error, so two racing vacuums both
    // complete and converge on the same end state (ConcurrencySpec)
    def rmTree(p: Path): Unit = { if (!dryRun) FsUtil.deleteRecursively(p.toFile); deleted += p }
    def rmFile(p: Path): Unit = { if (!dryRun) Files.deleteIfExists(p): Unit; deleted += p }
    if (Files.isDirectory(dataDir)) {
      val topDirs = Using.resource(Files.list(dataDir))(_.iterator().asScala.toSeq)
      topDirs.foreach { top =>
        val topName = top.getFileName.toString
        if (topName.startsWith(".")) {
          // dot-dirs are IN-FLIGHT write scratch (.cdc-/.delta- staging):
          // a concurrent vacuum must not yank them from under the writer.
          // Only crash leftovers (older than an hour) get swept.
          if (sweepMtime(top) <
              System.currentTimeMillis() - 3600L * 1000)
            rmTree(top)
        }
        else if (live.contains(topName)) () // whole unbucketed batch still live
        // a batch dir no manifest references is EITHER an aged crash
        // leftover OR an IN-FLIGHT write whose manifest hasn't committed
        // yet (data lands under data/ BEFORE commitManifest) — the same
        // >1h age guard as the dot-dir scratch keeps a concurrent vacuum
        // from yanking a commit-in-progress's files. Dirs some OLD
        // manifest references are superseded history: swept immediately.
        else if (!referencedTops.contains(topName) &&
            sweepMtime(top) >=
              System.currentTimeMillis() - 3600L * 1000) ()
        else {
          val liveLeaves = liveByTop.getOrElse(topName, Set.empty) - topName
          if (liveLeaves.isEmpty) {
            // nothing in the retained window references this batch at all
            rmTree(top)
          } else {
            // bucketed batch: some leaves live, delete only the dead
            // ones. The listing tolerates the dir vanishing under a
            // concurrent vacuum (its leaves are then already swept).
            val leaves =
              try Using.resource(Files.list(top))(_.iterator().asScala.toSeq)
              catch { case _: java.io.IOException => Nil }
            leaves.filter(l => l.getFileName.toString.startsWith("__b=") &&
                !liveLeaves.contains(s"$topName/${l.getFileName}"))
              .foreach(rmTree)
          }
        }
      }
    }
    onStep("vacuum-data-swept")
    // drop manifests older than the retained window (their data may be
    // gone). A retained DELTA record may chain to a base below the
    // sweep line — checkpoint the oldest retained version first (while
    // its chain still resolves) so every retained version reads
    // through manifests the sweep keeps.
    if (!dryRun && keepVersions.head > 0 &&
        !Files.exists(ckptPath(name, keepVersions.head)))
      writeCheckpoint(name, keepVersions.head, readManifest(name, keepVersions.head))
    onStep("vacuum-ckpt-written")
    val vDir = dir(name).resolve("_v")
    if (Files.isDirectory(vDir)) {
      val olds = Using.resource(Files.list(vDir))(_.iterator().asScala.toSeq)
        .filter { p =>
          val n = p.getFileName.toString // "<v>.json" or "<v>.ckpt.json"
          val num = n.takeWhile(_.isDigit)
          (n.endsWith(".json") && num.nonEmpty && num.toLong < keepVersions.head) ||
            // crashed checkpoint temps (.ckpt*) and manifest-publication
            // temps (.m<v>-<uuid>, orphaned by a crash between write and
            // hard-link), past the same in-flight age guard as the
            // other write scratch
            ((n.startsWith(".ckpt") || n.startsWith(".m")) &&
              sweepMtime(p) < System.currentTimeMillis() - 3600L * 1000)
        }
      olds.foreach(rmFile)
      if (!dryRun)
        manifestCache.keySet.removeIf(k => k._1 == name && k._2 < keepVersions.head)
    }
    onStep("vacuum-manifests-swept")
    // pointer-publication temps (_LATEST.tmp<v>-<uuid>) orphaned by a
    // crash between their write and the atomic move — same age guard
    Using.resource(Files.list(dir(name)))(_.iterator().asScala.toSeq)
      .filter(p => p.getFileName.toString.startsWith("_LATEST.tmp") &&
        sweepMtime(p) < System.currentTimeMillis() - 3600L * 1000)
      .foreach(rmFile)
    // bloom sidecars of dirs no retained version references
    deleted ++= BloomIndex.sweep(bloomRoot(name), live, referenced,
      dryRun = dryRun)
    // deletion-vector sidecars no retained manifest references — with
    // the same >1h age guard as the dot-dir scratch above: an
    // unreferenced _dv entry may be tmpdel-/tmpupd- staging of an
    // in-flight row-level write, or a freshly written dv-<v>-<uuid>
    // sidecar in the window between its write and commitManifest;
    // sweeping those makes the concurrent commit reference a deleted
    // file. Crash leftovers age past the guard and are swept next run.
    val liveDvPaths: Set[String] =
      keepVersions.flatMap(v => readManifest(name, v).dvs.values.map(_.path)).toSet
    val dvDir = dvRoot(name)
    if (Files.isDirectory(dvDir)) {
      Using.resource(Files.list(dvDir))(_.iterator().asScala.toSeq)
        .filterNot(p => liveDvPaths.contains(p.getFileName.toString))
        .filter(p => sweepMtime(p) <
          System.currentTimeMillis() - 3600L * 1000)
        .foreach(rmTree)
    }
    onStep("vacuum-dvs-swept")
    // change-feed dirs of versions outside the retained window, plus
    // abandoned commit staging (dot-dirs a lost version race left
    // behind) past the same >1h in-flight guard
    val cdfRoot = dir(name).resolve("_cdf")
    if (Files.isDirectory(cdfRoot)) {
      Using.resource(Files.list(cdfRoot))(_.iterator().asScala.toSeq)
        .filter { p =>
          val n = p.getFileName.toString
          n.toLongOption.exists(_ < keepVersions.head) ||
            (n.startsWith(".") && sweepMtime(p) <
              System.currentTimeMillis() - 3600L * 1000)
        }
        .foreach(rmTree)
    }
    deleted.result()
  }

  /** Write-time CHECK enforcement: force every row through assert_true
    * so a violating row fails the WRITE JOB (single pass, no extra
    * validation scan) — the Delta constraints model. The filter's
    * assert_true(...) is null for passing rows, so the predicate is
    * always true and removes nothing; it exists only to evaluate. */
  private def enforceChecks(df: DataFrame, checks: Map[String, String]): DataFrame =
    checks.foldLeft(df) { case (d, (cname, sql)) =>
      d.filter(assert_true(
        coalesce(expr(sql), lit(false)),
        lit(s"CHECK constraint $cname violated: $sql")).isNull)
    }

  /** ALTER TABLE ADD CONSTRAINT ... CHECK (expr): validates the
    * expression against the schema AND the existing rows (a constraint
    * that current data violates is rejected, like Delta), then commits
    * it as metadata. Every subsequent write — append, overwrite, merge,
    * update, SQL INSERT — fails if any row violates it. */
  def addCheckConstraint(name: String, constraintName: String, exprSql: String): Unit = {
    val m = readManifest(name, currentVersion(name))
    require(!m.checks.contains(constraintName),
      s"constraint $constraintName already exists")
    val cur = scanLive(name, m, m.dirs)
    val violating =
      try !cur.filter(!coalesce(expr(exprSql), lit(false))).isEmpty
      catch { case e: org.apache.spark.sql.AnalysisException =>
        throw new IllegalArgumentException(
          s"CHECK expression does not analyze against the schema: ${e.getMessage}")
      }
    require(!violating,
      s"existing rows violate CHECK $constraintName ($exprSql)")
    commitExclusive(name, m.baseVersion + 1,
      m.copy(checks = m.checks + (constraintName -> exprSql)), "ADD CONSTRAINT")
  }

  /** ALTER TABLE DROP CONSTRAINT. */
  def dropCheckConstraint(name: String, constraintName: String): Unit = {
    val m = readManifest(name, currentVersion(name))
    require(m.checks.contains(constraintName), s"no constraint $constraintName")
    commitExclusive(name, m.baseVersion + 1,
      m.copy(checks = m.checks - constraintName), "DROP CONSTRAINT")
  }

  def checkConstraints(name: String): Map[String, String] =
    readManifest(name, currentVersion(name)).checks

  /** Validate externally written dirs (the DSv2 attach paths) against
    * the table's CHECK constraints: one column-pruned scan of the new
    * dirs only; throws before anything is committed. */
  private def requireChecksPass(name: String, m: Manifest, newDirs: Seq[String]): Unit =
    if (m.allChecks.nonEmpty) {
      val combined = m.allChecks.values.map(e => coalesce(expr(e), lit(false)))
        .reduce(_ && _)
      val bad = !scanDirs(newDirs, name, m.physSchema).select(m.logicalCols: _*)
        .filter(!combined).isEmpty
      if (bad) throw new IllegalStateException(
        s"rows violate CHECK constraints ${m.allChecks.keys.mkString(",")} — commit refused")
    }

  /** [[conform]] that also carries `extras` (e.g. the `__rid` stable-id
    * column an id-preserving rewrite threads through). */
  private def conformKeep(df: DataFrame, schema: StructType,
                          extras: Seq[Column]): DataFrame = {
    val byName = df.columns.toSet
    require(schema.forall(f => byName.contains(f.name)),
      s"missing columns: ${schema.map(_.name).filterNot(byName.contains).mkString(",")}")
    df.select(schema.map(f => col(f.name).cast(f.dataType).as(f.name)) ++ extras: _*)
  }

  private def conform(df: DataFrame, schema: StructType): DataFrame = {
    val byName = df.columns.toSet
    require(schema.forall(f => byName.contains(f.name)),
      s"missing columns: ${schema.map(_.name).filterNot(byName.contains).mkString(",")}")
    df.select(schema.map(f => col(f.name).cast(f.dataType).as(f.name)): _*)
  }

  /** Fingerprint of a table's bucket layout, shared by
    * [[mergeBucketGate]] and [[mergeUpsert]]'s precomputed-bucket path:
    * the precomputed ids are only trusted when the layout they were
    * derived under is byte-identical to the layout the merge commits
    * against (keys AND bucket count — a different n remaps every id). */
  private def bucketingFingerprint(b: Bucketing): String =
    s"${b.keys.mkString(",")}|${b.n}"

  /** The (fingerprint, bucket-id aggregate column) a maintenance caller
    * can RIDE ON ITS OWN pre-merge gate job (r15 optimization, guide
    * §1.2): the IVM applies already run one aggregate collect over the
    * checkpointed delta (emptiness + change-kind gate); appending
    * `collect_set(bucketExpr)` there hands [[mergeUpsert]] its
    * bucket-prune set for free — one driver round-trip instead of two.
    * Defined exactly when the merge's own prune would be (bucket keys
    * covered by `keys`, every dir bucketed); the fingerprint lets the
    * merge verify the layout didn't change in between and fall back to
    * computing its own set (never unsound, only slower). */
  private[graft] def mergeBucketGate(name: String, keys: Seq[String])
      : Option[(String, Column)] = {
    val m = readManifest(name, currentVersion(name))
    m.bucketing
      .filter(bb => bb.keys.forall(keys.contains) &&
        m.dirs.forall(_.contains("/__b=")))
      .map(bb => (bucketingFingerprint(bb), collect_set(bb.expr)))
  }

  /** Bucket-pruned target split: (affected dirs' rows, carried dirs).
    * Prunable when the table is bucketed and the bucket keys are a
    * subset of the operation's keys (so every source row's bucket is
    * known). Falls back to full-table rewrite otherwise. `precomputed`
    * hands in the source's distinct bucket ids when the caller already
    * paid a pass over the source (mergeUpsert's combined gate). */
  private def pruneByKeys(name: String, m: Manifest, source: DataFrame,
                          keys: Seq[String],
                          precomputed: Option[Set[Int]] = None)
      : (DataFrame, Seq[String], Option[Bucketing]) =
    m.bucketing match {
      case Some(b) if b.keys.forall(keys.contains) && m.dirs.forall(_.contains("/__b=")) =>
        val srcBuckets = precomputed.getOrElse(
          source.select(b.expr.as("__b")).distinct()
            .collect().map(_.getInt(0)).toSet)
        val (affected, carried) = m.dirs.partition(e => srcBuckets.contains(bucketOf(e)))
        (rewriteSource(name, m, affected), carried, m.bucketing)
      case other => (rewriteSource(name, m, m.dirs), Seq.empty, other)
    }

  /** MERGE upsert (M1 composite-key / M2 single-key):
    *   WHEN MATCHED THEN UPDATE SET all-source-columns, changeType=matchedChangeType
    *   WHEN NOT MATCHED THEN INSERT all, changeType=insertChangeType
    * One full-outer shuffle join on the keys (bucket-pruned on bucketed
    * tables); broadcast is not applicable to full-outer, but AQE handles
    * skew.
    *
    * `txn`: Delta-parity idempotent writes (`txnAppId`/`txnVersion`).
    * When set, the merge is SKIPPED if the table's txn registry already
    * records a version >= the given one for that app id, and otherwise
    * the registry advances IN THE SAME COMMIT as the data — so a
    * foreachBatch re-delivery (or any at-least-once driver) applies
    * each logical batch exactly once. A lost commit race throws; the
    * caller's retry re-reads the manifest and re-checks the registry,
    * so the skip/stamp pair stays race-safe. */
  def mergeUpsert(name: String, source: DataFrame, keys: Seq[String],
                  matchedChangeType: String = "MERGE",
                  insertChangeType: String = "MERGE",
                  changeTypeCol: Option[String] = Some("delta_change_type"),
                  verifyUniqueSource: Boolean = true,
                  sourceProvided: Option[Set[String]] = None,
                  txn: Option[(String, Long)] = None,
                  extraTxns: Seq[(String, Long)] = Nil,
                  precomputedBuckets: Option[(String, Set[Int])] = None): Unit = {
    val m = readManifest(name, currentVersion(name))
    if (txn.exists { case (app, v) => m.txns.get(app).exists(_ >= v) })
      return // already applied: idempotent re-delivery
    import m.{schema, dirs, bucketing}
    // `sourceProvided` (set by mergeUpsertEvolve): the columns the
    // caller's source ACTUALLY carries. Unprovided columns follow the
    // Delta UPDATE SET * / INSERT * evolution contract — matched rows
    // KEEP their target value, inserted rows get NULL — which the
    // full-outer join's target side already encodes (col(c) is the
    // kept value on a match and NULL on a source-only row).
    sourceProvided.foreach(p => require(keys.forall(p.contains),
      s"merge keys must be source-provided: ${keys.filterNot(p.contains).mkString(",")}"))
    val provided: Set[String] = sourceProvided.getOrElse(schema.fieldNames.toSet)
    val src = conform(source, schema)
    // ONE pass over the source serves BOTH the M6 uniqueness gate and
    // the bucket prune's distinct bucket ids (a bucket is a pure
    // function of the group's keys) — previously two separate jobs,
    // each a full source scan, on every merge
    val prunable = m.bucketing.filter(bb =>
      bb.keys.forall(keys.contains) && m.dirs.forall(_.contains("/__b=")))
    // a caller that rode the bucket-id collect_set on its OWN gate job
    // ([[mergeBucketGate]]) hands the set in; trusted only when the
    // layout fingerprint still matches (else recompute — never unsound)
    val preBuckets: Option[Set[Int]] = for {
      bb <- prunable
      (fp, ids) <- precomputedBuckets
      if fp == bucketingFingerprint(bb)
    } yield ids
    val srcBuckets: Option[Set[Int]] =
      if (!verifyUniqueSource && preBuckets.isDefined) preBuckets
      else if (!verifyUniqueSource && prunable.isEmpty) None
      else if (!verifyUniqueSource) {
        // gate off (caller guarantees key-uniqueness by construction —
        // IVM deltas are groupBy outputs, CDF rows are rid-unique per
        // commit): the bucket ids need NO per-key grouping, so skip the
        // keyed shuffle entirely — collect_set is algebraic and
        // aggregates map-side, shuffling one partial set per partition
        // instead of every distinct key (r14 optimization, guide §2.3:
        // at 100 TB this removes an O(distinct keys) exchange from
        // every gate-off merge; at micro-batch size it halves the gate
        // job's stages)
        prunable.map(bb =>
          src.agg(collect_set(bb.expr).as("__bks")).collect()(0)
            .getSeq[Int](0).toSet)
      } else {
        val aggs = Seq(max(col("__c")).as("__mx")) ++
          prunable.map(bb => collect_set(bb.expr).as("__bks"))
        val row = src.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__c"))
          .select(aggs: _*).collect()(0)
        require(row.isNullAt(0) || row.getLong(0) <= 1L,
          s"MERGE source is not unique on (${keys.mkString(",")})")
        prunable.map(_ => row.getSeq[Int](1).toSet)
      }
    val (target, carried, b) = pruneByKeys(name, m, src, keys, srcBuckets)
    val dataCols = schema.map(_.name).filterNot(keys.contains)
    val s = src.select(
      keys.map(col) ++ dataCols.map(c => col(c).as(s"__s_$c"))
        :+ lit(true).as("__s_present"): _*)
    val t = target.withColumn("__t_present", lit(true))
    val joined = t.join(s, keys, "full_outer")
    val sMatched = col("__s_present").isNotNull
    val both = sMatched && col("__t_present").isNotNull
    val out = schema.map(_.name).map { c =>
      if (keys.contains(c)) col(c).as(c)
      else if (changeTypeCol.contains(c))
        when(both, lit(matchedChangeType))
          .when(sMatched, lit(insertChangeType))
          .otherwise(col(c)).as(c)
      else if (!provided.contains(c)) col(c).as(c) // keep on match, NULL on insert
      else when(sMatched, col(s"__s_$c")).otherwise(col(c)).as(c)
    }
    // row tracking: matched/carried rows keep their resolved id (the
    // target scan attached __rid); source-only inserts carry null and
    // the reader mints base + position from the new file instead
    val ridKeep = rewriteExtra(m)
    // txn stamps ride the SAME manifest commit as the data — that
    // atomicity is the whole idempotency guarantee. `extraTxns` lets a
    // multi-source refresh advance EVERY absorbed-source watermark in
    // this one commit (monotone, like recordTxns)
    val mTxn = m.copy(bucketing = b,
      txns = (txn.toSeq ++ extraTxns).foldLeft(m.txns) { case (t, (a, v)) =>
        if (t.get(a).forall(_ < v)) t + (a -> v) else t
      })
    if (!m.cdf)
      commit(name, Some(joined.select(out ++ ridKeep: _*)), mTxn,
        carried, extraPhys = ridKeep): Unit
    else {
      // change feed: every joined row explodes into its post-state plus
      // its change rows, written in the SAME pass (partitioned by kind)
      val old = schema.map(f => col(f.name).as(f.name))
      val arr = when(both,
          array(kindStruct("current", out ++ ridKeep),
            kindStruct("update_preimage", old ++ ridKeep),
            kindStruct("update_postimage", out ++ ridKeep)))
        .when(sMatched, array(kindStruct("current", out ++ ridKeep),
          kindStruct("insert", out ++ ridKeep)))
        .otherwise(array(kindStruct("current", old ++ ridKeep)))
      commitCdc(name, mTxn,
        explodeKinds(joined, arr, schema, ridNames(m)), carried)
    }
  }

  /** MERGE upsert WITH SCHEMA EVOLUTION (Delta's `WITH SCHEMA
    * EVOLUTION` / `withSchemaEvolution()`) — the merge a migration hits
    * the first time an upstream adds or widens a column mid-merge
    * (reference evolves this by hand: Silver_Layer_Developer_Guide.md:
    * 140-153):
    *   - source columns ABSENT from the target are added first
    *     (nullable, metadata-only; old generations read NULL);
    *   - common columns whose source type is STRICTLY WIDER ride the
    *     [[alterColumnType]] widening path (metadata-only for
    *     parquet-decodable widenings — int→bigint, float→double …;
    *     illegal targets refuse loudly there, e.g. decimals past the
    *     precision-18 layout);
    *   - target columns the source lacks keep their value on MATCHED
    *     rows and land NULL on inserted rows (UPDATE SET * / INSERT *);
    *   - then the ordinary [[mergeUpsert]] runs.
    * The evolution commits are separate metadata-only versions before
    * the merge's data commit — each atomic, so a crash between them
    * leaves only a benign wider schema. At 100 TB: evolution costs
    * manifest commits, never a data rewrite, and the merge itself keeps
    * the bucket-pruned/one-shuffle shape. */
  def mergeUpsertEvolve(name: String, source: DataFrame, keys: Seq[String],
                        matchedChangeType: String = "MERGE",
                        insertChangeType: String = "MERGE",
                        changeTypeCol: Option[String] = Some("delta_change_type"),
                        verifyUniqueSource: Boolean = true): Unit = {
    val src = canonicalizeForEvolve(name, source, "mergeUpsertEvolve")
    // widen BEFORE adding columns: both walk the current schema, and a
    // widening is only attempted for columns that already exist
    val cur = schemaOf(name)
    src.schema.fields.foreach { f =>
      cur.fields.find(_.name == f.name).foreach { tf =>
        if (tf.dataType != f.dataType &&
            org.apache.spark.sql.catalyst.expressions.Cast
              .canUpCast(tf.dataType, f.dataType))
          alterColumnType(name, tf.name, f.dataType)
        // a NARROWER source column just casts up through conform below
        // (Delta's default implicit-cast behavior); a non-up-castable
        // mismatch fails conform's cast contract loudly downstream
      }
    }
    evolveAddColumns(name, src)
    val widened = schemaOf(name)
    val provided = src.columns.toSet
    require(keys.forall(provided.contains),
      s"mergeUpsertEvolve: source lacks merge key(s): " +
        keys.filterNot(provided.contains).mkString(","))
    // null-fill the unprovided columns only to satisfy conform's
    // all-columns contract — mergeUpsert's `sourceProvided` ensures the
    // fills are never written over matched rows' kept values
    val filled = widened.fields.filterNot(f => provided.contains(f.name))
      .foldLeft(src)((d, f) => d.withColumn(f.name, lit(null).cast(f.dataType)))
    mergeUpsert(name, filled, keys, matchedChangeType, insertChangeType,
      changeTypeCol, verifyUniqueSource, sourceProvided = Some(provided))
  }

  /** MERGE delete (M3): delete target rows whose keys appear in keysDf
    * (bucket-pruned on bucketed tables).
    *
    * `expectedVersion`: refuse LOUDLY unless the table is still at that
    * version — the compare-and-delete a maintenance sweep needs when its
    * delete set was computed from a pinned read (Ivm.compactDead): a
    * writer landing between the sweep's read and its delete would
    * otherwise lose rows the sweep never saw (e.g. a resurrected IVM
    * group). The check composes with [[commitExclusive]]'s put-if-absent
    * — a rival landing between this read and the commit still collides
    * at the pinned version and fails loudly, never silently. */
  def mergeDelete(name: String, keysDf: DataFrame, keys: Seq[String],
                  expectedVersion: Option[Long] = None): Unit = {
    val m = readManifest(name, currentVersion(name))
    expectedVersion.foreach(ev => require(m.baseVersion == ev,
      s"mergeDelete($name): table advanced to v${m.baseVersion} since the " +
        s"delete set was computed at v$ev — recompute the set against the " +
        "current version and retry"))
    val keyRows = keysDf.select(keys.map(col): _*).distinct()
    val (target, carried, b) = pruneByKeys(name, m, keyRows, keys)
    val ridKeep = rewriteExtra(m)
    if (!m.cdf)
      commit(name, Some(target.join(keyRows, keys, "left_anti")),
        m.copy(bucketing = b), carried, extraPhys = ridKeep): Unit
    else {
      val joined = target.join(keyRows.withColumn("__kdel", lit(true)), keys, "left_outer")
      val old = m.schema.map(f => col(f.name).as(f.name))
      val arr = when(col("__kdel").isNotNull,
          array(kindStruct("delete", old ++ ridKeep)))
        .otherwise(array(kindStruct("current", old ++ ridKeep)))
      commitCdc(name, m.copy(bucketing = b),
        explodeKinds(joined, arr, m.schema, ridNames(m)), carried)
    }
  }

  /** MERGE update-only (M4, SCD2 close): for target rows matching source
    * keys AND condition, apply the set-map; leave everything else. */
  def mergeUpdate(name: String, sourceKeys: DataFrame, keys: Seq[String],
                  condition: Column, set: Map[String, Column]): Unit = {
    val m = readManifest(name, currentVersion(name))
    val marked = sourceKeys.select(keys.map(col): _*).distinct()
      .withColumn("__s_present", lit(true))
    // direct commit, not overwrite(): the rows came from the table
    // (identity re-derivation would refuse them) and row-tracked
    // tables keep their ids through the rewrite
    val joined = rewriteSource(name, m, m.dirs).join(marked, keys, "left_outer")
    val hit = col("__s_present").isNotNull && condition
    // SET values cast to the declared type up front (no-op when they
    // already match) so both commit paths write conformed values
    val out = m.schema.map { f =>
      set.get(f.name)
        .map(v => when(hit, v.cast(f.dataType)).otherwise(col(f.name)).as(f.name))
        .getOrElse(col(f.name).as(f.name))
    }
    val ridKeep = rewriteExtra(m)
    if (!m.cdf)
      commit(name, Some(conformKeep(joined.select(out ++ ridKeep: _*), m.schema, ridKeep)),
        m.copy(stats = Map.empty), Seq.empty, extraPhys = ridKeep): Unit
    else {
      // change feed: PRECISE per-row changes in the same write pass
      // (like mergeUpsert/mergeDelete) — without this branch the
      // full-table rewrite records nothing and the feed synthesizes a
      // whole-table delete+insert for what was a targeted update
      val old = m.schema.map(f => col(f.name).as(f.name))
      val arr = when(hit,
          array(kindStruct("current", out ++ ridKeep),
            kindStruct("update_preimage", old ++ ridKeep),
            kindStruct("update_postimage", out ++ ridKeep)))
        .otherwise(array(kindStruct("current", old ++ ridKeep)))
      commitCdc(name, m, explodeKinds(joined, arr, m.schema, ridNames(m)), Seq.empty)
    }
  }

  /** Best-effort translation of an UPDATE/DELETE condition into v1
    * filters for manifest-stats dir pruning: analyze the condition
    * against the table schema (resolving names/casts the way the real
    * scan would), split the conjuncts, translate the shapes Spark can.
    * Untranslatable conjuncts are DROPPED, which only weakens the prune
    * (more dirs survive and get rewritten) — never unsound. */
  private def conditionFilters(schema: StructType, condition: Column)
      : Seq[org.apache.spark.sql.sources.Filter] =
    conditionFiltersComplete(schema, condition)._1

  /** Like [[conditionFilters]], plus whether EVERY conjunct translated
    * (a complete conjunction means the filters, together, are exactly
    * the condition — what the metadata-delete full-coverage proof
    * needs; for dir PRUNING, dropped conjuncts only weaken). */
  private def conditionFiltersComplete(schema: StructType, condition: Column)
      : (Seq[org.apache.spark.sql.sources.Filter], Boolean) = {
    import org.apache.spark.sql.catalyst.expressions.{And => CAnd, Expression}
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val analyzed =
      try empty.filter(condition).queryExecution.analyzed
      catch { case _: org.apache.spark.sql.AnalysisException =>
        return (Seq.empty, false) }
    def split(e: Expression): Seq[Expression] = e match {
      case CAnd(l, r) => split(l) ++ split(r)
      case x => Seq(x)
    }
    val conjuncts = analyzed.collect { case f: LFilter => f.condition }
      .flatMap(split)
    val translated = conjuncts.map(CatalystFilters.translate)
    (translated.flatten, conjuncts.nonEmpty && translated.forall(_.isDefined))
  }

  /** Copy-on-write split for an arbitrary predicate: dirs whose manifest
    * stats prove NO row can match are carried untouched (with their
    * stats); only dirs that might contain matching rows are rewritten —
    * the Delta-style file-pruned UPDATE/DELETE
    * (/root/reference/silver/jobs/bronze_mark_deleted_by_customer.py:126-134
    * is exactly this shape: a GDPR predicate over a huge table). At
    * 100 TB this is the difference between rewriting ~1 dir and
    * rewriting the table; dirs without reliable stats always rewrite. */
  private def pruneDirsByCondition(name: String, m: Manifest, condition: Column)
      : (Seq[String], Seq[String]) = {
    val filters = conditionFilters(m.schema, condition)
    val byStats = StatsPruning.liveDirs(m.dirs, m.stats, m.schema, filters)
    // point predicates additionally consult the per-dir bloom index —
    // the prune min/max can't give on high-cardinality unclustered keys
    val touched =
      if (m.bloomCols.isEmpty) byStats
      else BloomIndex.prune(byStats, filters, m.schema, m.bloomCols, bloomRoot(name),
        m.phys)
    (touched, m.dirs.filterNot(touched.toSet))
  }

  private def pruneByCondition(name: String, m: Manifest, condition: Column)
      : (DataFrame, Seq[String]) = {
    val (touched, carried) = pruneDirsByCondition(name, m, condition)
    (rewriteSource(name, m, touched), carried)
  }

  /** UPDATE ... SET ... WHERE cond (M5 soft delete): manifest-stats
    * pruned copy-on-write — only dirs that might match are rewritten. */
  def update(name: String, condition: Column, set: Map[String, Column]): Unit = {
    val m = readManifest(name, currentVersion(name))
    val (target, carried) = pruneByCondition(name, m, condition)
    if (carried.size == m.dirs.size) return // stats prove nothing matches
    val out = m.schema.map(_.name).map { c =>
      set.get(c).map(v => when(condition, v).otherwise(col(c)).as(c)).getOrElse(col(c).as(c))
    }
    val ridKeep = rewriteExtra(m)
    if (!m.cdf)
      commit(name, Some(conformKeep(target.select(out ++ ridKeep: _*), m.schema,
        ridKeep)), m, carried, extraPhys = ridKeep): Unit
    else {
      val hit = coalesce(condition, lit(false))
      val old = m.schema.map(f => col(f.name).as(f.name))
      val arr = when(hit,
          array(kindStruct("current", out ++ ridKeep),
            kindStruct("update_preimage", old ++ ridKeep),
            kindStruct("update_postimage", out ++ ridKeep)))
        .otherwise(array(kindStruct("current", old ++ ridKeep)))
      commitCdc(name, m, explodeKinds(target, arr, m.schema, ridNames(m)), carried)
    }
  }

  /** DELETE ... WHERE cond (pruned copy-on-write like [[update]]).
    * Null condition rows are kept (SQL semantics). */
  def delete(name: String, condition: Column): Unit = {
    val m = readManifest(name, currentVersion(name))
    val (touched0, carried0) = pruneDirsByCondition(name, m, condition)
    if (touched0.isEmpty) return
    // METADATA-ONLY DELETE: when the WHOLE condition translated, a dir
    // whose stats prove every row satisfies it simply DROPS from the
    // manifest — zero data read or written. A retention sweep
    // (`DELETE WHERE d < cutoff`) on a date-clustered 100 TB table is
    // then one manifest commit for the expired dirs plus a rewrite of
    // only the boundary dir. Requires !cdf (the change feed records
    // per-row deletes, which need the rows) — CDF tables rewrite.
    val (filters, complete) = conditionFiltersComplete(m.schema, condition)
    val (dropped, touched) =
      if (m.cdf || !complete || filters.isEmpty) (Seq.empty[String], touched0)
      else touched0.partition(d => m.stats.get(d).exists(ds =>
        filters.forall(f => StatsPruning.mustMatch(ds, m.schema, f))))
    val carried = carried0
    val target = rewriteSource(name, m, touched)
    if (touched.isEmpty) {
      // everything the predicate touches drops whole — commit carries
      commit(name, None, m, carried): Unit
      return
    }
    val ridKeep = rewriteExtra(m)
    if (!m.cdf)
      commit(name, Some(target.filter(!coalesce(condition, lit(false)))),
        m, carried, extraPhys = ridKeep): Unit
    else {
      val old = m.schema.map(f => col(f.name).as(f.name))
      val arr = when(coalesce(condition, lit(false)),
          array(kindStruct("delete", old ++ ridKeep)))
        .otherwise(array(kindStruct("current", old ++ ridKeep)))
      commitCdc(name, m, explodeKinds(target, arr, m.schema, ridNames(m)), carried)
    }
  }

  /** Attach a data dir that an external writer (the DSv2 write path)
    * already placed under data/: append it (or replace everything, for
    * INSERT OVERWRITE) in a new committed version. Attached dirs are
    * unbucketed — on bucketed tables the prune path detects the mixed
    * layout and falls back to full rewrites until compact() re-splits. */
  def attachDir(name: String, dirName: String, replace: Boolean,
                basedOnVersion: Long = -1L): Unit = {
    // row-level replace-all fallback passes the version its SCAN read
    // (basedOnVersion >= 0): the replacement rows were rebuilt from that
    // snapshot, so the commit must pin there — re-reading at commit time
    // would silently fold a rival's intervening DV delete / compaction
    // into a version built from pre-mutation rows
    val m = readManifest(name,
      if (basedOnVersion >= 0L) basedOnVersion else currentVersion(name))
    // absentIsNull=false: this dir came from an external writer, so a
    // missing column chunk can't be assumed to mean ADD-COLUMN all-null
    val dirStats = DirStats.collect(
      dir(name).resolve("data").resolve(dirName), m.physSchema,
      absentIsNull = false).map(m.statsToLogical).map(dirName -> _).toList.toMap
    requireChecksPass(name, m, Seq(dirName))
    if (replace)
      // OVERWRITE depends on the rows it replaced — a lost race is a
      // loud conflict (commitExclusive), never a rebase
      commitExclusive(name, m.baseVersion + 1,
        m.copy(dirs = Seq(dirName), stats = dirStats),
        if (basedOnVersion >= 0L) "row-level rewrite" else "INSERT OVERWRITE")
    else
      // APPEND rebases onto a rival's manifest via the shared bounded
      // retry (metadata conflicts refused, 50-attempt cap, test hook)
      commitAppendWithRetry(name, m, Seq(dirName), dirStats): Unit
  }

  /** Attach a batch the DSv2 write path laid out as hash-bucket LEAF
    * dirs (`<batch>/__b=<k>/`): each leaf becomes its own manifest dir,
    * so the table KEEPS its bucketed layout through SQL INSERTs —
    * key-driven merge pruning and storage-partitioned joins stay
    * available with no compact() step. `replace` = INSERT OVERWRITE. */
  def attachBucketedDirs(name: String, batchDir: String, replace: Boolean): Unit = {
    val m = readManifest(name, currentVersion(name))
    val batch = dataRoot(name).resolve(batchDir)
    val leaves =
      if (!Files.isDirectory(batch)) Seq.empty
      else Using.resource(Files.list(batch))(
        _.iterator().asScala
          .map(_.getFileName.toString).filter(_.startsWith("__b="))
          .map(l => s"$batchDir/$l").toSeq.sorted)
    // footer collects are independent per leaf — parallel across leaves
    // (DirStats parallelizes only WITHIN a dir, and bucket leaves hold
    // one file each: a 10^4-leaf attach measured ~9 ms/leaf SEQUENTIAL
    // driver-side in ProbeManifest, the whole attach wall)
    val leafStats = { import scala.collection.parallel.CollectionConverters._
      leaves.par.map(l =>
        DirStats.collect(dataRoot(name).resolve(l), m.physSchema,
          absentIsNull = false).map(m.statsToLogical).map(l -> _))
        .seq.flatten.toMap }
    requireChecksPass(name, m, leaves)
    if (replace)
      commitExclusive(name, m.baseVersion + 1,
        m.copy(dirs = leaves, stats = leafStats), "INSERT OVERWRITE")
    else
      commitAppendWithRetry(name, m, leaves, leafStats): Unit
  }

  /** Commit a MERGE-ON-READ (delta-based) SQL row-level operation in
    * ONE version: executor DeltaWriters staged tombstones as
    * (relpath, pos) parquet files and inserted/updated rows as loose
    * data files; here the tombstones merge into per-dir DV sidecars
    * (no live dir rewritten) and the inserted files attach as a new
    * batch dir. A SQL MERGE matching 0.1% of a 100 TB table writes
    * that 0.1% plus kilobytes of tombstones — never the table. With
    * the change feed on, deleted preimages are re-read from the
    * touched dirs by position (one bounded extra scan) and inserted
    * rows recorded, both under `_cdf/<v>` (delete+insert is the
    * documented representation of updates on this path). */
  def commitDelta(name: String, deleteFiles: Seq[Path],
                  insertFiles: Seq[Path]): Unit = {
    val m = readManifest(name, currentVersion(name))
    if (deleteFiles.isEmpty && insertFiles.isEmpty) return
    val v = m.baseVersion + 1
    val uuid = java.util.UUID.randomUUID.toString.take(8)
    // inserted rows -> one new batch dir (files carry physical names);
    // bucketed writers staged under __b=<k> leaves — each leaf becomes
    // its own manifest dir, so the table keeps its layout through
    // merge-on-read merges
    val newDirs: Seq[String] =
      if (insertFiles.isEmpty) Seq.empty
      else {
        val batch = f"b$v%09d-$uuid"
        val target = dataRoot(name).resolve(batch)
        val byLeaf = insertFiles.groupBy(f =>
          Option(f.getParent).map(_.getFileName.toString).filter(_.startsWith("__b=")))
        byLeaf.toSeq.sortBy(_._1).flatMap {
          case (Some(leaf), fs) =>
            Files.createDirectories(target.resolve(leaf))
            fs.foreach(f => Files.move(f, target.resolve(leaf).resolve(f.getFileName)))
            Seq(s"$batch/$leaf")
          case (None, fs) =>
            Files.createDirectories(target)
            fs.foreach(f => Files.move(f, target.resolve(f.getFileName)))
            Seq(batch)
        }.distinct
      }
    requireChecksPass(name, m, newDirs)
    // tombstones -> merged DV sidecars on the touched dirs
    var dvsUpdated: Map[String, DvRef] = Map.empty
    var fresh: Option[DataFrame] = None
    if (deleteFiles.nonEmpty) {
      val staged = spark.read.parquet(deleteFiles.map(_.toString): _*)
        .select(dirOf("relpath").as("dir"), col("relpath"), col("pos"))
      fresh = Some(staged)
      val perDir = staged.groupBy("dir").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      if (perDir.nonEmpty) {
        val unknown = perDir.keySet.diff(m.dirs.toSet)
        require(unknown.isEmpty,
          s"delta delete references non-live dirs: ${unknown.take(3).mkString(",")}")
        val dvName = s"dv-$v-$uuid"
        val priorDvd = perDir.keySet.filter(m.dvs.contains).toSeq
        val combined =
          if (priorDvd.isEmpty) staged
          else staged.unionByName(
            dvRows(name, m, priorDvd)
              .select(col("__dv_relpath").as("relpath"), col("__dv_pos").as("pos"))
              .withColumn("dir", dirOf("relpath"))
              .select("dir", "relpath", "pos"))
        combined.sortWithinPartitions("relpath", "pos")
          .write.mode("overwrite")
          .parquet(dvRoot(name).resolve(dvName).toString)
        onStep("dv-written")
        dvsUpdated = perDir.keySet.map { d =>
          val prior = m.dvs.get(d).map(_.deleted).getOrElse(0L)
          d -> DvRef(dvName, prior + perDir(d))
        }.toMap
      }
    }
    val stagedCdf = if (!m.cdf) None else {
      val cdfDir = cdfStaging(name, v, uuid)
      Files.createDirectories(cdfDir)
      val toPhys = m.schema.map(f => col(f.name).as(m.phys(f.name)))
      fresh.foreach { staged =>
        val touched = staged.select("dir").distinct()
          .collect().map(_.getString(0)).toSeq
        if (touched.nonEmpty)
          scanLiveWithPos(name, m, touched)
            .join(staged.select(col("relpath").as("__relpath"),
              col("pos").as("__pos")), Seq("__relpath", "__pos"), "left_semi")
            .select(toPhys: _*)
            .write.mode("overwrite")
            .parquet(cdfDir.resolve("__cdc=delete").toString)
      }
      if (newDirs.nonEmpty)
        scanDirs(newDirs, name, m.physSchema)
          .write.mode("overwrite")
          .parquet(cdfDir.resolve("__cdc=insert").toString)
      onStep("cdf-staged")
      Some(cdfDir)
    }
    deleteFiles.foreach(Files.deleteIfExists(_))
    val stats = m.stats ++ newDirs.flatMap(d =>
      DirStats.collect(dataRoot(name).resolve(d), m.physSchema,
        absentIsNull = false).map(m.statsToLogical).map(d -> _))
    commitWithCdf(name, v,
      m.copy(dirs = m.dirs ++ newDirs, stats = stats, dvs = m.dvs ++ dvsUpdated),
      stagedCdf)
  }

  /** Commit a version that REPLACES the `removed` live dirs with the
    * externally written `dirName`, carrying every other live dir with
    * its stats — the group-based SQL row-level commit
    * ([[graft.sources.GraftSqlTable]]): a MERGE INTO / UPDATE whose
    * runtime group filter touched 1 of N dirs rewrites 1 dir, not the
    * table. */
  def replaceDirs(name: String, removed: Set[String], dirName: String,
                  basedOnVersion: Long = -1L): Unit = {
    // pin to the version the operation's SCAN read (the DSv2 path passes
    // its snapshot version): the replacement dir holds rows rebuilt from
    // THAT snapshot, so a rival committing after it (DV delete,
    // compaction) must turn this commit into a loud conflict — a
    // commit-time re-read would adopt the rival's manifest while writing
    // rows that predate it (resurrected tombstones / duplicated dirs)
    val m = readManifest(name,
      if (basedOnVersion >= 0L) basedOnVersion else currentVersion(name))
    require(removed.subsetOf(m.dirs.toSet),
      s"row-level rewrite on $name replaces dirs not live in the manifest " +
        s"it read: ${(removed -- m.dirs.toSet).mkString(",")}")
    val carry = m.dirs.filterNot(removed.contains)
    val carrySet = carry.toSet // set probe: filterKeys over a List scan is O(dirs^2)
    val carryStats = m.stats.view.filterKeys(carrySet.contains).toMap
    val stats = carryStats ++ DirStats.collect(
      dir(name).resolve("data").resolve(dirName), m.physSchema,
      absentIsNull = false).map(m.statsToLogical).map(dirName -> _)
    requireChecksPass(name, m, Seq(dirName))
    commitExclusive(name, m.baseVersion + 1,
      m.copy(dirs = carry :+ dirName, stats = stats), "row-level rewrite")
  }

  /** The txn registry's high-watermark for a writer app id (Delta's
    * `DeltaTable.txnVersion` lookup) — lets an idempotent writer skip
    * an already-applied batch BEFORE doing any work; the authoritative
    * re-check still happens inside the committing operation. */
  def lastTxnVersion(name: String, appId: String): Option[Long] =
    readManifest(name, currentVersion(name)).txns.get(appId)

  /** The full txn registry at head — every (appId -> high watermark)
    * pair. The matview list/describe faces read the `ivm:*` namespace
    * out of this to surface absorbed-source watermarks. */
  def txnStamps(name: String): Map[String, Long] =
    readManifest(name, currentVersion(name)).txns

  /** Stamp an (appId -> version) txn watermark with NO data change — a
    * metadata-only commit through the same exclusive path as every
    * other manifest mutation. Monotone: a stamp at or below the
    * current watermark is a no-op (the registry's contract is a
    * high-water mark, never a rewind). Seeds a materialized view's
    * absorbed-source watermark at create time (Ivm.createCountSumView)
    * so the FIRST refresh can derive its feed window from the registry
    * alone. */
  def recordTxn(name: String, appId: String, version: Long): Unit =
    recordTxns(name, Seq(appId -> version))

  /** [[recordTxn]] for several app ids in ONE metadata commit (a
    * multi-watermark refresh that absorbed nothing still advances all
    * its watermarks atomically). */
  def recordTxns(name: String, stamps: Seq[(String, Long)]): Unit = {
    val m = readManifest(name, currentVersion(name))
    val next = stamps.foldLeft(m.txns) { case (t, (a, v)) =>
      if (t.get(a).forall(_ < v)) t + (a -> v) else t
    }
    if (next != m.txns)
      commitExclusive(name, m.baseVersion + 1,
        m.copy(txns = next), "recordTxn")
  }

  /** Exactly-once streaming-sink epoch commit: move the epoch's
    * executor-written files into a new batch dir and commit it TOGETHER
    * with the writer's advanced epoch watermark in `txns` — one atomic
    * manifest swap, the Delta txn-action pattern. A re-delivered epoch
    * (failure retry, query restart on an old checkpoint) finds
    * txns(queryId) >= epochId and is dropped, files cleaned up.
    * Bucket-routed epoch files (under `__b=<k>/` parents) become
    * manifest bucket-LEAF dirs, so streaming into a bucketed table
    * keeps its layout. With `replaceAll` (Complete output mode: the
    * sink owns the table) the epoch's dirs REPLACE the live set
    * instead of appending. Returns true when the epoch committed,
    * false when skipped. */
  def attachStreamEpoch(name: String, queryId: String, epochId: Long,
                        files: Seq[Path], replaceAll: Boolean = false): Boolean = {
    val m = readManifest(name, currentVersion(name))
    if (m.txns.get(queryId).exists(_ >= epochId)) {
      files.foreach(Files.deleteIfExists(_))
      return false
    }
    if (files.isEmpty && !replaceAll) {
      // empty append epoch: still advance the watermark (no data dir)
      commitEpochWithRetry(name, queryId, epochId, Seq.empty, Map.empty, m,
        replaceAll = false)
      return true
    }
    val batch = f"st${currentVersion(name) + 1}%09d-" +
      java.util.UUID.randomUUID.toString.take(8)
    val target = dir(name).resolve("data").resolve(batch)
    Files.createDirectories(target)
    // an empty COMPLETE epoch replaces the table with the empty batch
    val newDirs: Seq[String] =
      if (files.isEmpty) Seq(batch)
      else files.map { f =>
        val parent = f.getParent.getFileName.toString
        if (parent.startsWith("__b=")) {
          val leaf = target.resolve(parent)
          Files.createDirectories(leaf)
          Files.move(f, leaf.resolve(f.getFileName))
          s"$batch/$parent"
        } else {
          Files.move(f, target.resolve(f.getFileName))
          batch
        }
      }.distinct
    val batchStats = { import scala.collection.parallel.CollectionConverters._
      newDirs.par.flatMap(d =>
        DirStats.collect(dataRoot(name).resolve(d), m.physSchema,
          absentIsNull = false).map(m.statsToLogical).map(d -> _)).toMap.seq }
    requireChecksPass(name, m, newDirs)
    if (!commitEpochWithRetry(name, queryId, epochId, newDirs, batchStats, m,
        replaceAll)) {
      FsUtil.deleteRecursively(target.toFile) // lost to a re-delivery
      return false
    }
    true
  }

  /** Epoch commit with optimistic retry: losing the manifest race to a
    * concurrent batch append re-reads the winner's manifest, re-checks
    * the exactly-once txn guard, and re-attempts — streaming sink and
    * batch writers compose. Returns false when a concurrent commit
    * already recorded this (queryId, epoch). */
  private def commitEpochWithRetry(name: String, queryId: String, epochId: Long,
                                   added: Seq[String],
                                   addedStats: Map[String, DirStats],
                                   base: Manifest,
                                   replaceAll: Boolean): Boolean = {
    var attempts = 0
    while (attempts < 50) {
      onBeforeOptimisticCommit()
      val curV = currentVersion(name)
      val mm = readManifest(name, curV)
      if (mm.txns.get(queryId).exists(_ >= epochId)) return false
      // the epoch's files were written + CHECK-validated under `base`'s
      // metadata (attachStreamEpoch's read) — a rival schema/bucketing/
      // constraint change means those files no longer belong, exactly
      // like a batch append's rebase
      refuseMetadataConflict(name, mm, base, "stream epoch")
      try {
        // Complete output mode: the sink owns the table — the epoch's
        // recomputed result REPLACES the live dirs (commitManifest
        // prunes the dropped dirs' DV/rowbase entries)
        val (dirs, stats) =
          if (replaceAll) (added, addedStats)
          else (mm.dirs ++ added, mm.stats ++ addedStats)
        commitManifest(name, curV + 1, mm.copy(
          dirs = dirs, stats = stats,
          txns = mm.txns + (queryId -> epochId)))
        return true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          attempts += 1
          // same ghost-adoption as the batch append rebase: a crashed
          // writer's unpublished manifest must not wedge the sink
          if (!adoptGhostVersion(name, curV + 1)) Thread.sleep(50)
      }
    }
    throw new java.util.ConcurrentModificationException(
      s"epoch commit to $name lost the race $attempts times — giving up")
  }

  /** Incremental batch read (change-feed-lite): the rows ADDED between
    * `fromVersion` (exclusive) and `toVersion` (inclusive), valid only
    * when that range is append-only — the batch twin of the streaming
    * table feed's version-keyed micro-batches, and the scale-correct
    * way for a downstream batch consumer to process "what's new since
    * my last run" without timestamps or a full diff. Throws when a
    * version in the range removed or rewrote dirs (the consumer must
    * full-refresh; silently returning partial changes would be wrong). */
  def readAppendsBetween(name: String, fromVersion: Long, toVersion: Long): DataFrame = {
    require(fromVersion <= toVersion, s"bad range ($fromVersion, $toVersion]")
    // every STEP in the range must be append-only — an endpoint-only
    // diff would miss a dir added at v+1 and rewritten at v+2
    var prev = readManifest(name, fromVersion).dirs
    val m0Dirs = prev
    var m1 = readManifest(name, fromVersion)
    var prevDvs = readManifest(name, fromVersion).dvs
    (fromVersion + 1 to toVersion).foreach { v =>
      m1 = readManifest(name, v)
      val curSet = m1.dirs.toSet
      val removed = prev.filterNot(curSet)
      if (removed.nonEmpty)
        throw new IllegalStateException(
          s"$name version $v is not an append: ${removed.size} dirs " +
            "removed/rewritten — full refresh required")
      if (m1.dvs != prevDvs)
        throw new IllegalStateException(
          s"$name version $v applied deletion vectors (rows removed) — " +
            "not an append; full refresh required")
      prev = m1.dirs; prevDvs = m1.dvs
    }
    scanDirs(m1.dirs.filterNot(m0Dirs.toSet), name, m1.physSchema)
      .select(m1.logicalCols: _*)
  }

  // ---- change data feed ----

  /** ALTER TABLE SET TBLPROPERTIES(enableChangeFeed): a metadata commit.
    * Mutations AFTER the enabling version record change rows; appends
    * and full replaces never need recorded rows (the reader derives
    * their changes from the manifest diff — see [[readChangesBetween]]),
    * which is exactly Delta's CDF cost model: blind appends stay
    * CDC-free, only row-level rewrites pay the (same-pass) change
    * write. */
  def setChangeFeed(name: String, enabled: Boolean): Unit = {
    val m = readManifest(name, currentVersion(name))
    if (m.cdf != enabled)
      commitExclusive(name, m.baseVersion + 1, m.copy(cdf = enabled),
        "SET CHANGE FEED")
  }

  def changeFeedEnabled(name: String): Boolean =
    readManifest(name, currentVersion(name)).cdf

  /** ALTER TABLE SET/UNSET TBLPROPERTIES: free-form table properties in
    * the manifest (a null value unsets). `delete.mode=merge-on-read`
    * routes SQL DELETE through [[deleteVectorized]]. */
  def setProperties(name: String, kvs: Map[String, String]): Unit = {
    val m = readManifest(name, currentVersion(name))
    val next = kvs.foldLeft(m.props) { case (ps, (k, v)) =>
      if (v == null) ps - k else ps + (k -> v)
    }
    if (next != m.props)
      commitExclusive(name, m.baseVersion + 1, m.copy(props = next),
        "SET TBLPROPERTIES")
  }

  def properties(name: String): Map[String, String] =
    readManifest(name, currentVersion(name)).props

  private def kindStruct(kind: String, cols: Seq[Column]): Column =
    struct(lit(kind).as("__cdc") +: cols: _*)

  /** Explode each row's array of (kind, row) structs back to columns —
    * the shape [[commitCdc]] writes partitioned by kind. */
  private def explodeKinds(df: DataFrame, arr: Column, schema: StructType,
                           extras: Seq[String] = Nil): DataFrame =
    df.select(explode(arr).as("__e"))
      .select(col("__e.__cdc").as("__cdc") +:
        (schema.map(f => col(s"__e.${f.name}").as(f.name)) ++
          extras.map(e => col(s"__e.$e").as(e))): _*)

  /** Column names [[rewriteExtra]] threads through a rewrite. */
  private def ridNames(m: Manifest): Seq[String] =
    if (m.props.contains(RowTrackingProp)) Seq(RidCol) else Nil

  /** The change-data-feed twin of [[commit]]: ONE write job lands both
    * the post-mutation data (`__cdc=current` rows -> the new batch dir)
    * and the change rows (every other kind -> `_cdf/<v>/__cdc=<kind>/`)
    * — change capture costs zero extra passes over the data, the same
    * property Delta's CDC writer has. An empty `_cdf/<v>` dir is still
    * created: it marks "changes recorded, none occurred", which the
    * reader distinguishes from "not recorded". */
  private def commitCdc(name: String, meta: Manifest, exploded: DataFrame,
                        carried: Seq[String]): Unit = {
    val v = meta.baseVersion + 1
    val uuid = java.util.UUID.randomUUID.toString.take(8)
    val staging = dataRoot(name).resolve(s".cdc-$uuid")
    val (toWrite, parts) = meta.bucketing match {
      case Some(b) =>
        (exploded.withColumn("__b", b.expr).repartition(b.n, col("__b")),
          Seq("__cdc", "__b"))
      case None => (exploded, Seq("__cdc"))
    }
    // data AND _cdf files carry physical names (__cdc/__b are partition
    // cols, never stored); checks run on LOGICAL names first
    val physCols = meta.schema.map(f => col(f.name).as(meta.phys(f.name))) ++
      (if (exploded.columns.contains(RidCol)) Seq(col(RidCol)) else Nil)
    enforceChecks2(toWrite, meta.allChecks)
      .select(col("__cdc") +: physCols ++: parts.drop(1).map(col): _*)
      .write.mode("overwrite").partitionBy(parts: _*).parquet(staging.toString)
    val batch = f"b$v%09d-$uuid"
    val target = dataRoot(name).resolve(batch)
    val curStaged = staging.resolve("__cdc=current")
    val newDirs: Seq[String] =
      if (!Files.isDirectory(curStaged)) Seq.empty
      else meta.bucketing match {
        case Some(_) =>
          Files.createDirectories(target)
          val leaves = Using.resource(Files.list(curStaged))(_.iterator().asScala
            .map(_.getFileName.toString).filter(_.startsWith("__b=")).toSeq.sorted)
          leaves.foreach(l => Files.move(curStaged.resolve(l), target.resolve(l)))
          leaves.map(l => s"$batch/$l")
        case None =>
          Files.move(curStaged, target)
          Seq(batch)
      }
    onStep("batch-written")
    val cdfDir = cdfStaging(name, v, uuid)
    Files.createDirectories(cdfDir)
    Using.resource(Files.list(staging))(_.iterator().asScala.toSeq)
      .filter(_.getFileName.toString.startsWith("__cdc="))
      .foreach(p => Files.move(p, cdfDir.resolve(p.getFileName)))
    FsUtil.deleteRecursively(staging.toFile)
    onStep("cdf-staged")
    val stats = { import scala.collection.parallel.CollectionConverters._
      meta.stats.view.filterKeys(carried.contains).toMap ++
        newDirs.par.flatMap(d =>
          DirStats.collect(dataRoot(name).resolve(d), meta.physSchema)
            .map(meta.statsToLogical).map(d -> _)).seq }
    commitWithCdf(name, v, meta.copy(dirs = carried ++ newDirs, stats = stats),
      Some(cdfDir))
  }

  /** Check enforcement for the CDC write: only `current` rows are table
    * rows — preimage/delete rows are prior data and must not re-fail. */
  private def enforceChecks2(df: DataFrame, checks: Map[String, String]): DataFrame =
    checks.foldLeft(df) { case (d, (cname, sql)) =>
      d.filter(assert_true(
        coalesce(when(col("__cdc") =!= "current", lit(true)).otherwise(expr(sql)), lit(false)),
        lit(s"CHECK constraint $cname violated: $sql")).isNull)
    }

  /** CHANGE DATA FEED read: every row-level change in
    * `(fromVersion, toVersion]` with `_change_type` ∈ {insert, delete,
    * update_preimage, update_postimage} and `_commit_version`. Three
    * sources, cheapest wins per version (the Delta CDF read model):
    *   - a recorded `_cdf/<v>` dir (row-level mutations after
    *     [[setChangeFeed]]) — read as-is, zero derivation;
    *   - a pure append / pure dir-drop step — synthesized from the
    *     added (insert) or removed (delete) dirs; dirs are immutable so
    *     this is exact, and it is why appends never write change rows;
    *   - a full replace (INSERT OVERWRITE / truncate-load / restore) —
    *     delete-of-prior-snapshot + insert-of-new-snapshot.
    * A partial rewrite with no recorded dir throws: the change rows
    * were never captured and cannot be reconstructed from immutable
    * dirs alone. `fromVersion = -1` includes version 0's creation. */
  /** One per-version change source, resolved by the shared decision
    * tree both CDF read surfaces interpret. */
  private[graft] sealed trait ChangeSrc
  /** Recorded `_cdf/<v>/__cdc=<kind>/` dirs (files carry version v's
    * PHYSICAL column names; `mv` is version v's manifest). */
  private[graft] final case class RecordedChanges(cdfDir: Path, kinds: Seq[String],
                                                  v: Long, mv: Manifest)
      extends ChangeSrc
  /** Changes synthesized from a manifest diff: the rows of `dirs` under
    * manifest `m` (whose DVs bound what was live), all of one kind. */
  private[graft] final case class SynthesizedChanges(m: Manifest, dirs: Seq[String],
                                                     kind: String, v: Long)
      extends ChangeSrc

  /** The change-feed decision tree (see [[readChangesBetween]] for the
    * semantics): cheapest valid source per version, or throw when the
    * changes were never captured and can't be reconstructed. */
  /** A vacuum may have swept part of a requested change window
    * (manifests, checkpoints and `_cdf` dirs all sweep below its
    * retained head together) — refuse with the window semantics spelled
    * out instead of leaking a raw missing-manifest read from half-way
    * down the chain. The batch `.changes` scan, the DSv2 change
    * stream's planInputPartitions and a restarted stream's offset
    * replay all funnel through this read, so one guard covers every
    * reader surface (ConcurrencySpec's vacuum×change-reader race). */
  private def manifestForChanges(name: String, v: Long,
                                 fromVersion: Long, toVersion: Long): Manifest =
    try readManifest(name, v)
    catch {
      case e: java.nio.file.NoSuchFileException =>
        throw new IllegalStateException(
          s"$name change window ($fromVersion, $toVersion] overlaps " +
            s"vacuumed history: version $v's manifest was swept — " +
            "restart the change reader from a retained version", e)
    }

  private[graft] def changeSources(name: String, fromVersion: Long,
                                   toVersion: Long): Seq[ChangeSrc] = {
    require(fromVersion >= -1 && fromVersion <= toVersion,
      s"bad range ($fromVersion, $toVersion]")
    require(toVersion <= currentVersion(name),
      s"version $toVersion does not exist")
    (fromVersion + 1 to toVersion).flatMap { v =>
      val cur = manifestForChanges(name, v, fromVersion, toVersion)
      // physical-only version (compact/optimize/purge): zero logical
      // changes, decided from the MANIFEST itself — crash-atomic, no
      // dependence on the post-publish _cdf/<v> marker dir landing
      if (cur.props.get(NoChangeProp).contains(v.toString)) Nil
      else {
      val prev = if (v == 0) cur.copy(dirs = Nil, dvs = Map.empty)
                 else manifestForChanges(name, v - 1, fromVersion, toVersion)
      val prevDirs = prev.dirs
      val cdfDir = dir(name).resolve("_cdf").resolve(v.toString)
      // read-side crash recovery: a writer that died AFTER publishing
      // the manifest but BEFORE moving its `_cdf` staging leaves a
      // VISIBLE version with a stranded feed — no later commit ever
      // collides with it (it's published), so commit-side ghost
      // adoption can't heal it; the first change reader completes the
      // staging instead. Young staging = the writer may still be alive
      // mid-publish: refuse with a retry hint rather than stealing the
      // move out from under it.
      val recorded = Files.isDirectory(cdfDir) || (cur.cdf &&
        (completeCdfStaging(name, v, cur, prev) match {
          case CdfStagingDone => true
          case CdfStagingAbsent => false
          case CdfStagingYoung => throw new IllegalStateException(
            s"$name version $v's recorded change rows are still in a " +
              "freshly-staged dot-dir under _cdf — its writer may be " +
              "mid-publish (or crashed moments ago); retry once the " +
              "staging ages past the recovery grace period")
        }))
      if (recorded) {
        val kinds = Using.resource(Files.list(cdfDir))(_.iterator().asScala
          .map(_.getFileName.toString).filter(_.startsWith("__cdc="))
          .map(_.stripPrefix("__cdc=")).toSeq.sorted)
        if (kinds.isEmpty) Seq.empty // marker: recorded, zero logical changes
        else Seq(RecordedChanges(cdfDir, kinds, v, cur))
      } else {
        val curDirSet = cur.dirs.toSet
        val prevDirSet = prevDirs.toSet
        val removed = prevDirs.filterNot(curDirSet)
        val added = cur.dirs.filterNot(prevDirSet)
        // DV entries vanish WITH their dirs on rewrite (normalization);
        // only a DV change on a dir live in both versions means rows
        // were removed invisibly to the manifest diff
        val carriedSet = curDirSet.intersect(prevDirSet)
        if (carriedSet.exists(d => cur.dvs.get(d) != prev.dvs.get(d)))
          throw new IllegalStateException(
            s"$name version $v applied deletion vectors with no recorded " +
              "change data — enable the change feed (setChangeFeed) first")
        if (removed.isEmpty && added.isEmpty) Seq.empty
        else if (removed.isEmpty)
          Seq(SynthesizedChanges(cur, added, "insert", v))
        else if (added.isEmpty)
          Seq(SynthesizedChanges(prev, removed, "delete", v))
        else if ({ val r = removed.toSet; prevDirs.forall(r.contains) })
          Seq(SynthesizedChanges(prev, removed, "delete", v),
            SynthesizedChanges(cur, added, "insert", v))
        else throw new IllegalStateException(
          s"$name version $v partially rewrote dirs with no recorded " +
            "change data — enable the change feed (setChangeFeed) before " +
            "row-level mutations to read changes across them")
      }
      }
    }
  }

  /** With `withRowIds`, every change row also carries `_row_id` — the
    * row's stable tracking id: recorded MoR change rows read the
    * `__rid` their `_cdf` files materialize; synthesized
    * appends/drops derive base + position from that version's
    * manifest. NULL where the id is unknowable (commits that predate
    * [[enableRowTracking]], or copy-on-write rewrites whose postimage
    * ids are only assigned at commit).
    *
    * CONTRACT — rid-uniqueness per commit: within one `_commit_version`
    * a non-null `_row_id` appears at most once among
    * insert/update_postimage rows and at most once among deletes. This
    * holds for every write path in this store (an append assigns fresh
    * ids; a MoR update records one postimage per touched rid; a merge
    * commits one outcome per target row), which is what lets a rid-keyed
    * replicator apply a version's upserts with the uniqueness gate off
    * (cdc2). A future path that could emit both an insert and a
    * postimage for one rid in one commit would break that gate-skip —
    * cdc2 asserts the contract always-on (upsert-row count vs distinct
    * rids per version, folded into its apply-plan aggregate), so a
    * violation fails the replication loudly instead of corrupting the
    * replica. */
  def readChangesBetween(name: String, fromVersion: Long, toVersion: Long,
                         withRowIds: Boolean = false): DataFrame = {
    val curM = manifestForChanges(name, toVersion, fromVersion, toVersion)
    // physical identity bridges RENAMEs between v and toVersion: each
    // version's columns surface under their CURRENT logical names;
    // columns dropped since v are skipped, columns added since v are
    // null-filled by the final unionByName
    val curByPhys: Map[String, String] =
      curM.schema.map(f => curM.phys(f.name) -> f.name).toMap
    def toCurrent(mv: Manifest): Seq[Column] =
      mv.schema.flatMap(f => curByPhys.get(mv.phys(f.name)).map(cur =>
        col(mv.phys(f.name)).as(cur)))
    val ridField = org.apache.spark.sql.types.StructField(RidCol,
      org.apache.spark.sql.types.LongType)
    val parts: Seq[DataFrame] = changeSources(name, fromVersion, toVersion).map {
      case RecordedChanges(cdfDir, _, v, mv) =>
        // `__rid` null-fills for files that don't materialize it
        val fields = mv.physSchema.fields ++
          (if (withRowIds) Seq(ridField) else Nil) :+
          org.apache.spark.sql.types.StructField("__cdc",
            org.apache.spark.sql.types.StringType)
        val rid = if (withRowIds) Seq(col(RidCol).as("_row_id")) else Nil
        spark.read
          .schema(org.apache.spark.sql.types.StructType(fields))
          .parquet(cdfDir.toString)
          .select(toCurrent(mv) ++ rid :+ col("__cdc").as("_change_type"): _*)
          .withColumn("_commit_version", lit(v))
      case SynthesizedChanges(m, dirs, kind, v) =>
        val mapped = m.schema.flatMap(f => curByPhys.get(m.phys(f.name)).map(cur =>
          col(f.name).as(cur)))
        val base =
          if (!withRowIds) scanLive(name, m, dirs).select(mapped: _*)
          else resolveRid(scanLiveWithPos(name, m, dirs, withRid = true), m)
            .select(mapped :+ col(RidCol).as("_row_id"): _*)
        base
          .withColumn("_change_type", lit(kind))
          .withColumn("_commit_version", lit(v))
    }
    parts.reduceOption((a, b) => a.unionByName(b, allowMissingColumns = true))
      .getOrElse {
        val empty = scanDirs(Seq.empty, name, curM.schema)
        (if (withRowIds) empty.withColumn("_row_id", lit(null).cast("long"))
         else empty)
          .withColumn("_change_type", lit(null).cast("string"))
          .withColumn("_commit_version", lit(null).cast("long"))
      }
  }

  /** Per-FILE change groups for the SQL `<table>.changes` scan: each
    * group is (absolute files, per-file DV sidecar refs, change kind,
    * commit version, per-file row-id bases) — enough for a file-based
    * DSv2 scan to reproduce [[readChangesBetween]] exactly. Rid bases
    * come from the GROUP's version manifest (synthesized groups only;
    * recorded `_cdf` files carry a materialized `__rid` instead).
    *
    * DV delivery is LAZY, like the batch scan's ([[dvSidecarsByDir]]):
    * each DV'd file maps to (manifest relpath, sidecar parquet files)
    * and the scan task probes the sidecar executor-side
    * (GraftDvSidecars) — pure manifest reads + one directory listing
    * per distinct sidecar here, NO Spark job, NO tombstone position
    * ever materialized on the driver. A synthesized `delete` group
    * over a DV-heavy prior version (e.g. a full-replace commit on a
    * table with a large tombstone backlog) stays O(files) driver
    * memory instead of O(tombstones). */
  private[graft] def changeFileGroups(name: String, fromVersion: Long, toVersion: Long)
      : Seq[(Seq[String], Map[String, (String, Seq[String])], String, Long, Map[String, Long])] = {
    def filesUnder(p: Path): Seq[String] =
      if (!Files.isDirectory(p)) Seq.empty
      else Using.resource(Files.list(p))(_.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .map(_.toString).toSeq.sorted)
    // recorded `_cdf` kind dirs nest ONE extra level on bucketed tables
    // (`__cdc=<kind>/__b=<n>/part-*.parquet` — the CDC write partitions
    // by kind AND bucket); a flat listing silently read ZERO change
    // files for every row-level commit on a bucketed CDF table through
    // the SQL/stream `.changes` surface (found by st20, r12)
    def filesUnderRecursive(p: Path): Seq[String] =
      if (!Files.isDirectory(p)) Seq.empty
      else Using.resource(Files.walk(p))(_.iterator().asScala
        .filter(f => f.getFileName.toString.endsWith(".parquet"))
        .map(_.toString).toSeq.sorted)
    changeSources(name, fromVersion, toVersion).flatMap {
      case RecordedChanges(cdfDir, kinds, v, _) =>
        kinds.map(k =>
          (filesUnderRecursive(cdfDir.resolve(s"__cdc=$k")),
            Map.empty[String, (String, Seq[String])], k, v, Map.empty[String, Long]))
      case SynthesizedChanges(m, dirs, kind, v) =>
        val files = dirs.flatMap(d => filesUnder(dataRoot(name).resolve(d)))
        val ridBase: Map[String, Long] =
          if (m.rowbase.isEmpty) Map.empty
          else m.rowbase.map { case (rel, b) =>
            dataRoot(name).resolve(rel).toString -> b
          }
        val dvd = dirs.filter(m.dvs.contains)
        val dv: Map[String, (String, Seq[String])] =
          if (dvd.isEmpty) Map.empty
          else {
            val sidecarsByName: Map[String, Seq[String]] =
              dvd.flatMap(m.dvs.get).map(_.path).distinct.map { n =>
                n -> filesUnder(dvRoot(name).resolve(n))
              }.toMap
            dvd.flatMap { d =>
              val sc = sidecarsByName(m.dvs(d).path)
              filesUnder(dataRoot(name).resolve(d)).map { f =>
                f -> (s"$d/${f.substring(f.lastIndexOf('/') + 1)}", sc)
              }
            }.toMap
          }
        Seq((files, dv, kind, v, ridBase))
    }
  }

  /** RESTORE TABLE ... TO VERSION AS OF (Delta RESTORE): commit a NEW
    * version whose content is version `v`'s — history is preserved and
    * the restore is itself restorable. Metadata-only (no data moves);
    * requires `v`'s dirs to still exist, i.e. within the vacuum
    * retention window. Streaming txn watermarks and the bloom-index
    * config stay CURRENT (exactly-once re-delivery guards must not
    * rewind with the data — the same choice Delta makes). */
  def restore(name: String, v: Long): Unit = {
    val cur = currentVersion(name)
    require(v <= cur, s"version $v does not exist (current: $cur)")
    require(Files.exists(manifest(name, v)),
      s"cannot restore $name to $v: manifest vacuumed")
    val m = readManifest(name, v)
    val missing = m.dirs.filterNot(d => Files.isDirectory(dataRoot(name).resolve(d)))
    require(missing.isEmpty,
      s"cannot restore $name to $v: dirs vacuumed: ${missing.mkString(",")}")
    val missingDv = m.dvs.values.map(_.path).toSeq.distinct
      .filterNot(p => Files.isDirectory(dvRoot(name).resolve(p)))
    require(missingDv.isEmpty,
      s"cannot restore $name to $v: deletion vectors vacuumed: ${missingDv.mkString(",")}")
    val curM = readManifest(name, cur)
    // CHECK constraints stay CURRENT (they are a consumer contract, not
    // data) — which demands two guards the carry alone doesn't give:
    // a constraint referencing a column v's schema lacks would break
    // every future write (refuse — drop it first), and a constraint
    // added after v was never validated against v's rows (validate the
    // restored LIVE rows now, DV-aware, or the table would advertise a
    // contract its data violates)
    val unresolvable = curM.checks.filter { case (_, sql) =>
      spark.sessionState.sqlParser.parseExpression(sql).references
        .exists(r => !m.schema.fieldNames.exists(_.equalsIgnoreCase(r.name)))
    }
    require(unresolvable.isEmpty,
      s"cannot restore $name to $v: CHECK constraint(s) " +
        s"${unresolvable.keys.mkString(",")} reference columns that " +
        "version's schema lacks — drop them first")
    val newChecks = curM.checks.filter { case (k, sql) => !m.checks.get(k).contains(sql) }
    if (newChecks.nonEmpty) {
      val combined = newChecks.values.map(e => coalesce(expr(e), lit(false)))
        .reduce(_ && _)
      if (!scanLive(name, m, m.dirs).filter(!combined).isEmpty)
        throw new IllegalStateException(
          s"cannot restore $name to $v: rows violate CHECK constraint(s) " +
            s"${newChecks.keys.mkString(",")} added since — restore refused")
    }
    // monotone id watermarks NEVER rewind: versions after v minted
    // row/identity ids that stay readable (time travel) and were
    // emitted through the change feed — rewinding `next` would re-mint
    // them for different rows. Row tracking also stays ENABLED if it is
    // now, and already-assigned bases carry (ids never change once
    // assigned), so rows shared by v and the present keep their ids.
    val watermarks = curM.props.view.filterKeys(k =>
      k == RowTrackingProp ||
        (k.startsWith("identity.") && k.endsWith(".next") &&
          m.schema.fieldNames.contains(
            k.stripPrefix("identity.").stripSuffix(".next")))).toMap
    // txn watermarks stay CURRENT — with ONE namespace excepted: the
    // `ivm:*` stamps are a registered materialized view's ABSORBED-
    // SOURCE watermarks (Ivm.createCountSumView et al.), which must
    // track the ROWS. Carrying them forward over restored rows strands
    // the view silently stale forever: every later self-driving refresh
    // derives an empty (head, head] window while the rows sit at v
    // (r12 VERDICT "What's wrong" #1). So `ivm:*` rewinds to v's stamps
    // — the next refresh re-absorbs (stamp_v, head] and converges — and
    // an `ivm:*` stamp minted only AFTER v drops with v's props (the
    // table wasn't a registered view at v). Streaming/writer
    // exactly-once guards (every other app id) never rewind, same as
    // Delta.
    val txns = curM.txns.filterNot(_._1.startsWith("ivm:")) ++
      m.txns.view.filterKeys(_.startsWith("ivm:"))
    commitExclusive(name, cur + 1, m.copy(txns = txns,
      bloomCols = curM.bloomCols, checks = curM.checks, cdf = curM.cdf,
      props = m.props ++ watermarks,
      rowbase = m.rowbase ++ curM.rowbase),
      "RESTORE")
  }

  /** DESCRIBE HISTORY analogue: one row per committed version still on
    * disk (vacuum may have dropped old manifests) — version, commit
    * time (manifest mtime, the TIMESTAMP AS OF clock), live dir count,
    * and the exact row count when every live dir carries stats
    * (metadata-only, no data read). */
  def history(name: String): DataFrame = {
    val rows = (0L to currentVersion(name)).flatMap { v =>
      val p = manifest(name, v)
      if (!Files.exists(p)) None
      else {
        val m = readManifest(name, v)
        val count = Snapshot(v, m.schema, m.dirs, m.bucketing, m.stats,
          dvs = m.dvs).rowCount
        Some((v, new java.sql.Timestamp(Files.getLastModifiedTime(p).toMillis),
          m.dirs.size, count))
      }
    }
    spark.createDataFrame(rows)
      .toDF("version", "committed_at", "n_dirs", "approx_rows")
  }

  /** Absolute path of a table's data root (external writers). */
  def dataRoot(name: String): Path = dir(name).resolve("data")

  /** Root of a table's bloom-index sidecar files. */
  def bloomRoot(name: String): Path = dir(name).resolve("_bloom")

  /** Enable (or change) the point-lookup bloom index: a metadata commit
    * recording the indexed columns, plus a one-off backfill pass that
    * builds the missing per-dir bloom files for the CURRENT live dirs.
    * Subsequent commits index their new dirs automatically; carried
    * dirs never rebuild (dirs are immutable). Indexable types only —
    * see [[BloomIndex.supportedType]]. */
  def setBloomColumns(name: String, cols: Seq[String]): Unit = {
    val m = readManifest(name, currentVersion(name))
    val bad = cols.filterNot(c => m.schema.fields.exists(f =>
      f.name.equalsIgnoreCase(c) && BloomIndex.supportedType(f.dataType)))
    require(bad.isEmpty,
      s"not indexable (missing or unsupported type): ${bad.mkString(",")}")
    // store the SCHEMA's spelling, not the caller's: dropColumn /
    // renameColumn guard and remap bloomCols by exact name — a
    // caller-cased entry would dodge the drop guard (dangling config
    // that fails every later commit) and be left behind by a rename
    val canonical = cols.map(c =>
      m.schema.fields.find(_.name.equalsIgnoreCase(c)).get.name)
    commitExclusive(name, m.baseVersion + 1, m.copy(bloomCols = canonical),
      "SET BLOOM COLUMNS")
  }
}
