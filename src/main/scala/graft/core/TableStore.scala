package graft.core

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

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
  * Layout (Delta-VLDB-paper-style log, minus checkpointing):
  *   root/<table>/data/b<0-padded n>/   immutable parquet batch dirs
  *   root/<table>/_v/<n>.json           manifest: schema + live batch dirs
  *   root/<table>/_LATEST               current version number (atomic swap)
  *
  * Readers resolve _LATEST -> manifest -> union scan of live dirs, so
  * concurrent readers never observe a half-written version; writers
  * commit by writing the next manifest then atomically replacing
  * _LATEST. Old versions stay readable (time travel via readVersion).
  *
  * Scale notes (100 TB): APPEND is O(new data) — it only adds a batch
  * dir. The mutating ops (merge/update/delete/overwrite) rewrite the
  * table, like a partition-less Delta merge rewrites matched files;
  * the manifest's dir-level granularity is the hook for file-pruned
  * rewrites (join source keys against per-dir min/max stats and rewrite
  * only matched dirs) — not needed at fixture scale. Merge itself is a
  * single shuffle (full-outer hash join on the keys); no driver-side
  * row handling anywhere.
  */
class TableStore(spark: SparkSession, root: String) {

  private def dir(name: String): Path = Paths.get(root, name)
  private def latestPtr(name: String): Path = dir(name).resolve("_LATEST")
  private def manifest(name: String, v: Long): Path =
    dir(name).resolve("_v").resolve(s"$v.json")

  def exists(name: String): Boolean = Files.exists(latestPtr(name))

  def currentVersion(name: String): Long = {
    require(exists(name), s"table $name does not exist under $root")
    new String(Files.readAllBytes(latestPtr(name)), StandardCharsets.UTF_8).trim.toLong
  }

  // ---- manifest (de)serialization: {"schema": <ddl>, "dirs": ["b0", ...]} ----
  private def writeManifest(name: String, v: Long, schema: StructType, dirs: Seq[String]): Unit = {
    Files.createDirectories(manifest(name, v).getParent)
    val json = s"""{"schema": ${jsonStr(schema.toDDL)}, "dirs": [${dirs.map(jsonStr).mkString(",")}]}"""
    Files.write(manifest(name, v), json.getBytes(StandardCharsets.UTF_8))
  }

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""

  private def readManifest(name: String, v: Long): (StructType, Seq[String]) = {
    val json = new String(Files.readAllBytes(manifest(name, v)), StandardCharsets.UTF_8)
    // minimal parser for the exact shape we write
    val schemaDdl = unescape(json.split("\"schema\": \"", 2)(1).split("\", \"dirs\"", 2)(0))
    val dirsPart = json.split("\"dirs\": \\[", 2)(1).stripSuffix("]}")
    val dirs = if (dirsPart.trim.isEmpty) Seq.empty[String]
      else dirsPart.split(",").toSeq.map(s => unescape(s.trim.stripPrefix("\"").stripSuffix("\"")))
    (StructType.fromDDL(schemaDdl), dirs)
  }

  private def unescape(s: String): String = {
    val sb = new StringBuilder; var i = 0
    while (i < s.length) {
      if (s(i) == '\\' && i + 1 < s.length) {
        s(i + 1) match {
          case '"' => sb += '"'; i += 2
          case '\\' => sb += '\\'; i += 2
          case 'n' => sb += '\n'; i += 2
          case 'u' => sb += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar; i += 6
          case c => sb += c; i += 2
        }
      } else { sb += s(i); i += 1 }
    }
    sb.toString
  }

  /** Write df as the (v+1) batch dir, then commit manifest+pointer. */
  private def commit(name: String, df: Option[DataFrame], schema: StructType,
                     carryForward: Seq[String]): Long = {
    val v = if (exists(name)) currentVersion(name) + 1 else 0L
    val newDirs = df match {
      case Some(d) =>
        val batch = f"b$v%09d"
        d.write.mode("overwrite").parquet(dir(name).resolve("data").resolve(batch).toString)
        carryForward :+ batch
      case None => carryForward
    }
    writeManifest(name, v, schema, newDirs)
    val tmp = dir(name).resolve(s"_LATEST.tmp$v")
    Files.write(tmp, v.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, latestPtr(name), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    v
  }

  def readVersion(name: String, v: Long): DataFrame = {
    val (schema, dirs) = readManifest(name, v)
    if (dirs.isEmpty) spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else {
      val paths = dirs.map(b => dir(name).resolve("data").resolve(b).toString)
      // one multi-path scan, not a union of scans: keeps it a single
      // FileSourceScanExec so filters/pruning apply once
      spark.read.schema(schema).parquet(paths: _*)
    }
  }

  def read(name: String): DataFrame = readVersion(name, currentVersion(name))

  def schemaOf(name: String): StructType = readManifest(name, currentVersion(name))._1

  /** CREATE TABLE AS / full replace (new table or schema change allowed). */
  def create(name: String, df: DataFrame): Unit =
    commit(name, Some(df), df.schema, Seq.empty)

  /** CREATE TABLE with schema, zero rows (S5 empty staging write). */
  def createEmpty(name: String, schema: StructType): Unit =
    commit(name, None, schema, Seq.empty)

  /** INSERT OVERWRITE semantics: replace contents, PRESERVE the existing
    * table schema by casting positionally-by-name — the reference chose
    * INSERT OVERWRITE precisely to avoid schema drift
    * (docs/KNOWN_ISSUES.md:77-99). */
  def overwrite(name: String, df: DataFrame): Unit = {
    val schema = schemaOf(name)
    commit(name, Some(conform(df, schema)), schema, Seq.empty)
  }

  /** INSERT INTO append: O(new rows) — adds a batch dir, keeps the rest. */
  def append(name: String, df: DataFrame): Unit = {
    val v = currentVersion(name)
    val (schema, dirs) = readManifest(name, v)
    commit(name, Some(conform(df, schema)), schema, dirs)
  }

  private def conform(df: DataFrame, schema: StructType): DataFrame = {
    val byName = df.columns.toSet
    require(schema.forall(f => byName.contains(f.name)),
      s"missing columns: ${schema.map(_.name).filterNot(byName.contains).mkString(",")}")
    df.select(schema.map(f => col(f.name).cast(f.dataType).as(f.name)): _*)
  }

  /** Throw if source has >1 row per key — the reference relies on Delta's
    * DELTA_MULTIPLE_SOURCE_ROW_MATCHING_TARGET_ROW_IN_MERGE (M6). */
  private def requireUniqueSource(source: DataFrame, keys: Seq[String]): Unit = {
    val dups = source.groupBy(keys.map(col): _*).count().filter(col("count") > 1).limit(1).count()
    require(dups == 0, s"MERGE source is not unique on (${keys.mkString(",")})")
  }

  /** MERGE upsert (M1 composite-key / M2 single-key):
    *   WHEN MATCHED THEN UPDATE SET all-source-columns, changeType=matchedChangeType
    *   WHEN NOT MATCHED THEN INSERT all, changeType=insertChangeType
    * One full-outer shuffle join on the keys; broadcast is not applicable
    * to full-outer, but AQE handles skew. */
  def mergeUpsert(name: String, source: DataFrame, keys: Seq[String],
                  matchedChangeType: String = "MERGE",
                  insertChangeType: String = "MERGE",
                  changeTypeCol: Option[String] = Some("delta_change_type"),
                  verifyUniqueSource: Boolean = true): Unit = {
    val schema = schemaOf(name)
    val src = conform(source, schema)
    if (verifyUniqueSource) requireUniqueSource(src, keys)
    val dataCols = schema.map(_.name).filterNot(keys.contains)
    val s = src.select(
      keys.map(col) ++ dataCols.map(c => col(c).as(s"__s_$c"))
        :+ lit(true).as("__s_present"): _*)
    val t = read(name).withColumn("__t_present", lit(true))
    val joined = t.join(s, keys, "full_outer")
    val sMatched = col("__s_present").isNotNull
    val both = sMatched && col("__t_present").isNotNull
    val out = schema.map(_.name).map { c =>
      if (keys.contains(c)) col(c).as(c)
      else if (changeTypeCol.contains(c))
        when(both, lit(matchedChangeType))
          .when(sMatched, lit(insertChangeType))
          .otherwise(col(c)).as(c)
      else when(sMatched, col(s"__s_$c")).otherwise(col(c)).as(c)
    }
    overwrite(name, joined.select(out: _*))
  }

  /** MERGE delete (M3): delete target rows whose keys appear in keysDf. */
  def mergeDelete(name: String, keysDf: DataFrame, keys: Seq[String]): Unit = {
    val t = read(name)
    overwrite(name, t.join(keysDf.select(keys.map(col): _*).distinct(), keys, "left_anti"))
  }

  /** MERGE update-only (M4, SCD2 close): for target rows matching source
    * keys AND condition, apply the set-map; leave everything else. */
  def mergeUpdate(name: String, sourceKeys: DataFrame, keys: Seq[String],
                  condition: Column, set: Map[String, Column]): Unit = {
    val marked = sourceKeys.select(keys.map(col): _*).distinct()
      .withColumn("__s_present", lit(true))
    val joined = read(name).join(marked, keys, "left_outer")
    val hit = col("__s_present").isNotNull && condition
    val out = schemaOf(name).map(_.name).map { c =>
      set.get(c).map(v => when(hit, v).otherwise(col(c)).as(c)).getOrElse(col(c).as(c))
    }
    overwrite(name, joined.select(out: _*))
  }

  /** UPDATE ... SET ... WHERE cond (M5 soft delete). */
  def update(name: String, condition: Column, set: Map[String, Column]): Unit = {
    val out = schemaOf(name).map(_.name).map { c =>
      set.get(c).map(v => when(condition, v).otherwise(col(c)).as(c)).getOrElse(col(c).as(c))
    }
    overwrite(name, read(name).select(out: _*))
  }

  /** DELETE ... WHERE cond. Null condition rows are kept (SQL semantics). */
  def delete(name: String, condition: Column): Unit =
    overwrite(name, read(name).filter(!coalesce(condition, lit(false))))

  /** OPTIMIZE-style compaction: rewrite the accumulated batch dirs as a
    * single dir sized to `targetPartitions` files. Appends are O(new
    * data), so a frequently-appended table accretes small dirs; compact
    * restores big-scan efficiency. Old versions remain readable (time
    * travel is unaffected — the manifest history still points at the
    * original dirs). Reference lists compaction as future work
    * (README.md:654-659); here it falls out of the versioned layout. */
  def compact(name: String, targetPartitions: Int = 0): Unit = {
    val df = read(name)
    val sized = if (targetPartitions > 0) df.coalesce(targetPartitions) else df
    overwrite(name, sized)
  }

  /** Number of live batch dirs (compaction observability). */
  def liveDirCount(name: String): Int =
    readManifest(name, currentVersion(name))._2.size
}
