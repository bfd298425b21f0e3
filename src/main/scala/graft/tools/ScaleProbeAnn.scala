package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Measured scaling evidence for the ANN family: replicate the sf0.1
  * embeddings 1x/4x/16x (deterministic per-copy perturbation keeps the
  * copies distinct without moving them far) and time e3 (hyperplane
  * LSH), e4 (IVF probe), and e5 (PQ/ADC) against the growing corpus
  * with the SAME 10 queries. Besides wall-clock, recall vs the exact
  * brute-force top-5 is recomputed at every scale — a probe that stays
  * fast by silently probing less would show up as a recall collapse.
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *        sbt "runMain graft.tools.ScaleProbeAnn"
  */
object ScaleProbeAnn {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect() // warm
    graft.functions.VectorFunctions.register(spark)

    val base = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").as("v"))
    val nBase = base.count()

    /** k perturbed copies: copy i scales dim (i % 64) by (1 + 0.03*i)
      * — far enough from the original to not be a duplicate, close
      * enough to keep the corpus distribution; queries (vec_id < 10)
      * exist only in copy 0, so ground truth stays well-defined. */
    def corpus(k: Int): DataFrame =
      (0 until k).map { i =>
        if (i == 0) base
        else base.select(
          (col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"),
          expr(s"transform(v, (x, j) -> IF(j = ${i % 64}, " +
            s"CAST(x * ${1.0 + 0.03 * i} AS FLOAT), x))").as("v"))
      }.reduce(_ unionByName _)

    def t(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }

    def recall(exact: DataFrame, approx: DataFrame): Double = {
      val e = exact.select(col("query_id"), col("cand_id"))
      val hit = e.join(approx.select(col("query_id"), col("cand_id")),
        Seq("query_id", "cand_id"), "left_semi").count()
      hit.toDouble / e.count()
    }

    for (k <- Seq(1, 4, 16)) {
      val n = corpus(k)
        .withColumn("nrm", sqrt(call_function("vec_dot", col("v"), col("v"))))
        .localCheckpoint() // pin: probe timings exclude corpus synthesis
      val exact = graft.QueriesLlm.cosineTopKCore(n).localCheckpoint()
      val (lshSec, _) = t(graft.QueriesLlm.annLshCore(n).count())
      val rLsh = recall(exact, graft.QueriesLlm.annLshCore(n))
      // the SELF-SIZED knob (deriveBandBits): the width the operator
      // itself picks for this corpus count — the production path
      val autoBits = graft.QueriesLlm.deriveBandBits(nBase * k)
      val (lshASec, _) = t(graft.QueriesLlm.annLshCore(n, bandBits = autoBits).count())
      val rLshA = recall(exact, graft.QueriesLlm.annLshCore(n, bandBits = autoBits))
      val (ivfSec, _) = t(graft.QueriesLlm.annIvfCore(n).count())
      val rIvf = recall(exact, graft.QueriesLlm.annIvfCore(n))
      val (pqSec, _) = t(graft.QueriesLlm.annPqCore(n).count())
      val rPq = recall(exact, graft.QueriesLlm.annPqCore(n))
      println(f"""{"k":$k,"vecs":${nBase * k},"lsh_sec":$lshSec%.2f,"lsh_recall":$rLsh%.2f,""" +
        f""""lsh_auto_bits":$autoBits,"lsh_auto_sec":$lshASec%.2f,"lsh_auto_recall":$rLshA%.2f,""" +
        f""""ivf_sec":$ivfSec%.2f,"ivf_recall":$rIvf%.2f,""" +
        f""""pq_sec":$pqSec%.2f,"pq_recall":$rPq%.2f}""")
    }

    // ---- DIVERSE corpus: the other LSH regime. Per-copy dim ROTATION
    // decorrelates replicas from the originals (near-orthogonal in 64-d),
    // so bucket occupancy stays ~uniform as N grows — the self-sized
    // band width should keep join work ~linear here, whereas on the
    // duplication-heavy corpus above bucket DENSITY (copies sharing
    // sign patterns) sets the cost no matter the width. ----
    def diverse(k: Int): DataFrame =
      (0 until k).map { i =>
        if (i == 0) base
        else base.select(
          (col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"),
          expr(s"transform(sequence(0, 63), j -> element_at(v, ((j + ${7 * i}) % 64) + 1))")
            .as("v"))
      }.reduce(_ unionByName _)

    for (k <- Seq(1, 4, 16)) {
      val n = diverse(k)
        .withColumn("nrm", sqrt(call_function("vec_dot", col("v"), col("v"))))
        .localCheckpoint()
      val exact = graft.QueriesLlm.cosineTopKCore(n).localCheckpoint()
      val (lshSec, _) = t(graft.QueriesLlm.annLshCore(n).count())
      val rLsh = recall(exact, graft.QueriesLlm.annLshCore(n))
      val autoBits = graft.QueriesLlm.deriveBandBits(nBase * k)
      val (lshASec, _) = t(graft.QueriesLlm.annLshCore(n, bandBits = autoBits).count())
      val rLshA = recall(exact, graft.QueriesLlm.annLshCore(n, bandBits = autoBits))
      println(f"""{"corpus":"diverse","k":$k,"vecs":${nBase * k},""" +
        f""""lsh_sec":$lshSec%.2f,"lsh_recall":$rLsh%.2f,""" +
        f""""lsh_auto_bits":$autoBits,"lsh_auto_sec":$lshASec%.2f,"lsh_auto_recall":$rLshA%.2f}""")
    }

    // ---- e8 k-means (Lloyd, broadcast centroids) on the diverse
    // corpus: per update the corpus sees ONE assignment map + one
    // K×dim-group aggregate, so wall should track corpus size
    // ~linearly; inertia is printed so a probe that stays fast by
    // mis-assigning would show up as an inertia blow-up. ----
    for (k <- Seq(1, 4, 16)) {
      val q = diverse(k).select(col("vec_id"),
          expr("transform(v, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))")
            .as("qv"))
        .localCheckpoint()
      val t0 = System.nanoTime()
      val asn = graft.QueriesLlm.kmeansAssignments(q, k = 10, updates = 2,
        pin = false) // q is already checkpointed above
      val inertia = asn.agg(sum(col("dist_sq"))).head().getLong(0)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"op":"kmeans","k":$k,"vecs":${nBase * k},"sec":$sec%.2f,""" +
        f""""inertia_per_vec":${inertia / (nBase * k)}}""")
    }
    spark.stop()
  }
}
