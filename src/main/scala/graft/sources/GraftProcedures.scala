package graft.sources

import java.util.Collections

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.Scan
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.core.TableStore

/** SQL stored procedures for table maintenance — the DSv2
  * ProcedureCatalog face of the store's OPTIMIZE/VACUUM/RESTORE
  * surface (the same shape Iceberg exposes as `CALL cat.system.x`):
  *
  *   CALL graft.system.vacuum('t', 2)         -- GC to 2 retained versions
  *   CALL graft.system.compact('t', 0)        -- rewrite as one batch
  *   CALL graft.system.restore('t', 3)        -- roll back to version 3
  *   CALL graft.system.optimize_range('t', 'a,b', 16)
  *   CALL graft.system.optimize_zorder('t', 'a,b', 16)
  *   CALL graft.system.set_bloom_columns('t', 'a,b')
  *
  * Each returns one summary row (table, result) via the same LocalScan
  * the metadata aggregates use — no files read for the result itself.
  */
object GraftProcedures {

  val Names: Seq[String] = Seq("vacuum", "vacuum_dry_run", "compact", "restore",
    "optimize_range", "optimize_zorder", "optimize_incremental",
    "compact_dv_heavy",
    "set_bloom_columns", "history",
    "set_change_feed", "delete_vectorized", "update_vectorized", "clone",
    "compact_where", "compact_small", "enable_row_tracking",
    "create_agg_view", "refresh_agg_view", "compact_agg_view",
    "create_join_view", "refresh_join_view",
    "create_join2_view", "refresh_join2_view",
    "drop_view", "list_views", "describe_view",
    "index_view", "compact_fkidx", "create_topk_view", "vacuum_view",
    "create_sketch_rollup", "create_quantile_rollup")

  private def param(n: String, dt: DataType) =
    ProcedureParameter.in(n, dt).build()

  /** "col = expr, col2 = expr2" -> the SET map for updateVectorized.
    * Split on TOP-LEVEL commas only: a tracked paren depth keeps commas
    * inside `coalesce(a, b)` intact, and the string tracker understands
    * everything Spark's expr() lexer does — single- AND double-quoted
    * literals, with backslash escapes — so a comma inside
    * `'can\'t, stop'` or `"x,y"` never splits a clause. Each clause
    * then splits on its first '='. */
  private[sources] def parseAssignments(s: String)
      : Map[String, org.apache.spark.sql.Column] = {
    val clauses = scala.collection.mutable.ListBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    var quote: Char = 0 // 0 = outside any string literal
    var i = 0
    while (i < s.length) {
      val c = s(i)
      if (quote != 0) {
        cur += c
        if (c == '\\' && i + 1 < s.length) { cur += s(i + 1); i += 1 }
        else if (c == quote) quote = 0
      } else c match {
        case '\'' | '"' => quote = c; cur += c
        case '(' => depth += 1; cur += '('
        case ')' => depth -= 1; cur += ')'
        case ',' if depth == 0 => clauses += cur.result(); cur.clear()
        case other => cur += other
      }
      i += 1
    }
    require(quote == 0, s"unterminated string literal in assignments: $s")
    if (cur.nonEmpty) clauses += cur.result()
    clauses.map { cl =>
      val j = cl.indexOf('=')
      require(j > 0, s"assignment '$cl' is not of the form col = expr")
      cl.take(j).trim -> org.apache.spark.sql.functions.expr(cl.drop(j + 1).trim)
    }.toMap
  }

  private val resultSchema = StructType(Seq(
    StructField("table", StringType), StructField("result", LongType)))

  private def result(table: String, value: Long): java.util.Iterator[Scan] =
    Collections.singletonList[Scan](new GraftMetadataScan(resultSchema,
      InternalRow(UTF8String.fromString(table), value),
      s"procedure on $table")).iterator()

  /** One UnboundProcedure per maintenance verb. */
  def load(root: String, name: String): UnboundProcedure = {
    def store = new TableStore(SparkSession.active, root)
    val procName = name // `name` inside the anon class would resolve to
                        // the method being defined (self-recursion)
    def bound(params: Seq[ProcedureParameter])(run: InternalRow => java.util.Iterator[Scan]) =
      new UnboundProcedure {
        override def name(): String = procName
        override def description(): String = s"graft $procName"
        override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
          override def name(): String = procName
          override def description(): String = s"graft $procName"
          override def parameters(): Array[ProcedureParameter] = params.toArray
          override def isDeterministic: Boolean = false
          override def call(input: InternalRow): java.util.Iterator[Scan] = run(input)
        }
      }
    def cols(s: String): Seq[String] = s.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    name match {
      case "vacuum" => bound(Seq(param("table", StringType), param("retain", IntegerType))) { in =>
        val t = in.getUTF8String(0).toString
        result(t, store.vacuum(t, in.getInt(1)).size.toLong)
      }
      case "vacuum_dry_run" => bound(Seq(param("table", StringType),
          param("retain", IntegerType))) { in =>
        val t = in.getUTF8String(0).toString
        // reports what a vacuum WOULD delete; touches nothing
        result(t, store.vacuum(t, in.getInt(1), dryRun = true).size.toLong)
      }
      case "compact" => bound(Seq(param("table", StringType), param("target_partitions", IntegerType))) { in =>
        val t = in.getUTF8String(0).toString
        store.compact(t, in.getInt(1))
        result(t, store.liveDirCount(t).toLong)
      }
      case "restore" => bound(Seq(param("table", StringType), param("version", LongType))) { in =>
        val t = in.getUTF8String(0).toString
        store.restore(t, in.getLong(1))
        result(t, store.currentVersion(t))
      }
      case "optimize_range" => bound(Seq(param("table", StringType),
          param("columns", StringType), param("n_dirs", IntegerType))) { in =>
        val t = in.getUTF8String(0).toString
        store.optimizeByRange(t, cols(in.getUTF8String(1).toString), in.getInt(2))
        result(t, store.liveDirCount(t).toLong)
      }
      case "optimize_zorder" => bound(Seq(param("table", StringType),
          param("columns", StringType), param("n_dirs", IntegerType))) { in =>
        val t = in.getUTF8String(0).toString
        store.optimizeByZOrder(t, cols(in.getUTF8String(1).toString), in.getInt(2))
        result(t, store.liveDirCount(t).toLong)
      }
      case "compact_dv_heavy" => bound(Seq(param("table", StringType),
          param("min_deleted_ratio", DoubleType))) { in =>
        val t = in.getUTF8String(0).toString
        // folds deletion vectors away where tombstones piled up
        result(t, store.compactDvHeavy(t, in.getDouble(1)).toLong)
      }
      case "optimize_incremental" => bound(Seq(param("table", StringType),
          param("column", StringType))) { in =>
        val t = in.getUTF8String(0).toString
        // rewrites only the overlapping tail; 0 = already clustered
        result(t, store.optimizeIncrementalByRange(
          t, in.getUTF8String(1).toString).toLong)
      }
      case "set_bloom_columns" => bound(Seq(param("table", StringType),
          param("columns", StringType))) { in =>
        val t = in.getUTF8String(0).toString
        val cs = cols(in.getUTF8String(1).toString)
        store.setBloomColumns(t, cs)
        result(t, cs.size.toLong)
      }
      // ---- materialized views as first-class SQL objects: the view's
      //      definition lives in its manifest properties and the
      //      absorbed-source watermark in its txn registry, so REFRESH
      //      is self-driving — it derives its own change-feed window
      //      and moves data + bookkeeping in one commit (Ivm) ----
      case "create_agg_view" => bound(Seq(param("view", StringType),
          param("source", StringType), param("group_cols", StringType),
          param("value_col", StringType), param("kind", StringType),
          param("buckets", IntegerType))) { in =>
        val v = in.getUTF8String(0).toString
        // kind: count_sum | max | distinct (distinct registers the
        // two-level multiplicity cascade as one object). Returns the
        // source version the full compute read (the seed watermark
        // refresh will start from)
        result(v, graft.ops.Ivm.createCountSumView(store, v,
          in.getUTF8String(1).toString, cols(in.getUTF8String(2).toString),
          in.getUTF8String(3).toString, in.getInt(5),
          kind = in.getUTF8String(4).toString))
      }
      case "refresh_agg_view" => bound(Seq(param("view", StringType))) { in =>
        val v = in.getUTF8String(0).toString
        // returns the number of source versions absorbed (0 = fresh)
        result(v, graft.ops.Ivm.refreshView(store, v))
      }
      case "compact_agg_view" => bound(Seq(param("view", StringType))) { in =>
        val v = in.getUTF8String(0).toString
        graft.ops.Ivm.compactView(store, v)
        result(v, store.read(v).count())
      }
      case "create_join_view" => bound(Seq(param("view", StringType),
          param("source", StringType), param("keys", StringType),
          param("dims", StringType), param("buckets", IntegerType))) { in =>
        val v = in.getUTF8String(0).toString
        // dims spec: `table:left=right:attr1+attr2|next…` — each entry
        // joins onto the accumulated frame (linear snowflake chains)
        result(v, graft.ops.Ivm.createJoinView(store, v,
          in.getUTF8String(1).toString, cols(in.getUTF8String(2).toString),
          in.getUTF8String(3).toString, in.getInt(4)))
      }
      case "refresh_join_view" => bound(Seq(param("view", StringType))) { in =>
        val v = in.getUTF8String(0).toString
        // absorbs the source's window AND every dim's window in one
        // commit; returns total versions absorbed across all sources
        result(v, graft.ops.Ivm.refreshJoinView(store, v))
      }
      case "create_join2_view" => bound(Seq(param("view", StringType),
          param("a", StringType), param("a_keys", StringType),
          param("b", StringType), param("b_keys", StringType),
          param("join", StringType), param("b_attrs", StringType),
          param("buckets", IntegerType))) { in =>
        val v = in.getUTF8String(0).toString
        // view = A ⋈ B with BOTH sides fact-sized; join = "aCol=bCol";
        // view columns = all of A's ++ B's keys ++ b_attrs
        result(v, graft.ops.Ivm.createJoin2View(store, v,
          in.getUTF8String(1).toString, cols(in.getUTF8String(2).toString),
          in.getUTF8String(3).toString, cols(in.getUTF8String(4).toString),
          in.getUTF8String(5).toString, cols(in.getUTF8String(6).toString),
          in.getInt(7)))
      }
      case "refresh_join2_view" => bound(Seq(param("view", StringType))) { in =>
        val v = in.getUTF8String(0).toString
        // both sides' windows derive from the registry; both
        // watermarks advance in the apply's one commit
        result(v, graft.ops.Ivm.refreshJoin2View(store, v))
      }
      case "create_topk_view" => bound(Seq(param("view", StringType),
          param("source", StringType), param("group_cols", StringType),
          param("value_col", StringType), param("key_col", StringType),
          param("k", IntegerType), param("buckets", IntegerType))) { in =>
        val v = in.getUTF8String(0).toString
        // per-group top-k (value, key) pairs; refresh/compact/drop ride
        // the shared agg-view verbs (the registry dispatches on kind)
        result(v, graft.ops.Ivm.createTopKView(store, v,
          in.getUTF8String(1).toString, cols(in.getUTF8String(2).toString),
          in.getUTF8String(3).toString, in.getUTF8String(4).toString,
          in.getInt(5), in.getInt(6)))
      }
      case "index_view" => bound(Seq(param("view", StringType),
          param("fk_cols", StringType), param("buckets", IntegerType))) { in =>
        val v = in.getUTF8String(0).toString
        // secondary FK clustering for the dim-term / B-key maintenance
        // probes (keys derived from the registry); call while quiesced
        graft.ops.Ivm.enableFkIndexRegistered(store, v,
          cols(in.getUTF8String(1).toString), in.getInt(2))
        result(v, store.currentVersion(graft.ops.Ivm.fkIndexTable(v)))
      }
      case "compact_fkidx" => bound(Seq(param("view", StringType))) { in =>
        val v = in.getUTF8String(0).toString
        graft.ops.Ivm.compactFkIndex(store, v)
        result(v, store.read(graft.ops.Ivm.fkIndexTable(v)).count())
      }
      case "create_sketch_rollup" => bound(Seq(param("view", StringType),
          param("source", StringType), param("group_cols", StringType),
          param("buckets", IntegerType))) { in =>
        val v = in.getUTF8String(0).toString
        // coarser approx-distinct view maintained by register union
        // from a sketch_distinct view's change feed; refresh/compact/
        // drop ride the shared agg-view verbs (kind dispatch)
        result(v, graft.ops.Ivm.createSketchRollup(store, v,
          in.getUTF8String(1).toString, cols(in.getUTF8String(2).toString),
          in.getInt(3)))
      }
      case "create_quantile_rollup" => bound(Seq(param("view", StringType),
          param("source", StringType), param("group_cols", StringType),
          param("buckets", IntegerType))) { in =>
        val v = in.getUTF8String(0).toString
        // coarser quantile view maintained by signed bin-count sums
        // from a quantile view's change feed — pure algebra at BOTH
        // levels; shared verbs for refresh/compact/drop (kind dispatch)
        result(v, graft.ops.Ivm.createQuantileRollup(store, v,
          in.getUTF8String(1).toString, cols(in.getUTF8String(2).toString),
          in.getInt(3)))
      }
      case "vacuum_view" => bound(Seq(param("view", StringType),
          param("retain", IntegerType))) { in =>
        val v = in.getUTF8String(0).toString
        // age-sweeps the view + its __aux/__fkidx twins; retention
        // clamps so every dependent's absorbed change window survives
        result(v, graft.ops.Ivm.vacuumView(store, v, in.getInt(1)))
      }
      case "drop_view" => bound(Seq(param("view", StringType))) { in =>
        val v = in.getUTF8String(0).toString
        // cascade-aware: a distinct view's __aux twin dies with it;
        // refuses while a registered dependent still sources from it.
        // Returns the number of tables dropped (2 for the cascade).
        result(v, graft.ops.Ivm.dropView(store, v).size.toLong)
      }
      case "list_views" => bound(Seq.empty) { _ =>
        val schema = StructType(Seq(
          StructField("view", StringType), StructField("kind", StringType),
          StructField("source", StringType),
          StructField("definition", StringType),
          StructField("absorbed", StringType),
          StructField("version", LongType)))
        val rows = graft.ops.Ivm.listViews(store).map { v =>
          InternalRow(UTF8String.fromString(v.view),
            UTF8String.fromString(v.kind), UTF8String.fromString(v.source),
            UTF8String.fromString(v.definition),
            UTF8String.fromString(v.absorbed), v.version)
        }.toArray
        Collections.singletonList[Scan](
          new GraftMetadataScan(schema, rows, "registered views")).iterator()
      }
      case "describe_view" => bound(Seq(param("view", StringType))) { in =>
        val v = in.getUTF8String(0).toString
        val schema = StructType(Seq(
          StructField("property", StringType), StructField("value", StringType)))
        val rows = graft.ops.Ivm.describeView(store, v).map { case (k, value) =>
          InternalRow(UTF8String.fromString(k), UTF8String.fromString(value))
        }.toArray
        Collections.singletonList[Scan](
          new GraftMetadataScan(schema, rows, s"describe view $v")).iterator()
      }
      case "history" => bound(Seq(param("table", StringType))) { in =>
        val t = in.getUTF8String(0).toString
        // versions, commit times (micros), dir counts, metadata row counts
        val schema = StructType(Seq(
          StructField("version", LongType),
          StructField("committed_at", TimestampType),
          StructField("n_dirs", IntegerType),
          StructField("approx_rows", LongType)))
        val rows = store.history(t).collect().map { r =>
          InternalRow(r.getLong(0), r.getTimestamp(1).getTime * 1000L,
            r.getInt(2), if (r.isNullAt(3)) null else r.getLong(3))
        }
        Collections.singletonList[Scan](
          new GraftMetadataScan(schema, rows, s"history of $t")).iterator()
      }
      case "enable_row_tracking" => bound(Seq(param("table", StringType))) { in =>
        val t = in.getUTF8String(0).toString
        store.enableRowTracking(t)
        result(t, store.currentVersion(t))
      }
      case "set_change_feed" => bound(Seq(param("table", StringType),
          param("enabled", BooleanType))) { in =>
        val t = in.getUTF8String(0).toString
        store.setChangeFeed(t, in.getBoolean(1))
        result(t, store.currentVersion(t))
      }
      case "delete_vectorized" => bound(Seq(param("table", StringType),
          param("condition", StringType))) { in =>
        val t = in.getUTF8String(0).toString
        val before = store.snapshot(t).rowCount
        store.deleteVectorized(t,
          org.apache.spark.sql.functions.expr(in.getUTF8String(1).toString))
        val after = store.snapshot(t).rowCount
        result(t, (for { b <- before; a <- after } yield b - a).getOrElse(-1L))
      }
      case "compact_where" => bound(Seq(param("table", StringType),
          param("condition", StringType))) { in =>
        val t = in.getUTF8String(0).toString
        store.compactWhere(t,
          org.apache.spark.sql.functions.expr(in.getUTF8String(1).toString))
        result(t, store.liveDirCount(t).toLong)
      }
      case "compact_small" => bound(Seq(param("table", StringType),
          param("max_bytes", LongType))) { in =>
        val t = in.getUTF8String(0).toString
        result(t, store.compactSmall(t, in.getLong(1)).toLong)
      }
      case "clone" => bound(Seq(param("table", StringType),
          param("target", StringType))) { in =>
        val src = in.getUTF8String(0).toString
        val dst = in.getUTF8String(1).toString
        store.cloneTable(src, dst)
        result(dst, store.liveDirCount(dst).toLong)
      }
      case "update_vectorized" => bound(Seq(param("table", StringType),
          param("condition", StringType), param("assignments", StringType))) { in =>
        val t = in.getUTF8String(0).toString
        val before = store.currentVersion(t)
        store.updateVectorized(t,
          org.apache.spark.sql.functions.expr(in.getUTF8String(1).toString),
          parseAssignments(in.getUTF8String(2).toString))
        result(t, store.currentVersion(t) - before) // 1 = updated, 0 = no match
      }
      case other =>
        throw new IllegalArgumentException(
          s"no such procedure: system.$other (have: ${Names.mkString(",")})")
    }
  }
}
