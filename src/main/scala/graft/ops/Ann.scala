package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor building blocks: spherical k-means
  * training for IVF coarse quantizers.
  *
  * The reference-free deterministic centroid choice ("first k vectors")
  * that seeds e4/e5 is a valid quantizer but ignores the data's density;
  * Lloyd iterations move the centroids to cluster means, which tightens
  * cells and raises recall at the same probe budget. Scale model: IVF
  * training NEVER runs over the full corpus — train on a sample
  * (faiss-style: ~a few hundred vectors per centroid), then assign the
  * full corpus in one broadcast pass. Everything here is DataFrame
  * code; the element-wise mean is a posexplode + (cell, dim) aggregate,
  * which over a training SAMPLE is trivially small.
  */
object Ann {

  private def dot(a: Column, b: Column): Column =
    call_function("vec_dot", a, b)

  /** Lloyd iterations of spherical k-means over `vecs` (`vec_id` long,
    * `v` array<float>). Deterministic: seeds from the k lowest ids,
    * ties in assignment break toward the lower cell id, empty cells
    * keep their previous centroid. Returns (cent_id int, cv
    * array<float>) with unit-norm centroids. */
  def trainIvfCentroids(vecs: DataFrame, k: Int, iters: Int): DataFrame = {
    require(k > 0 && iters >= 0, "k and iters must be positive")
    val spark = vecs.sparkSession
    graft.functions.VectorFunctions.register(spark)
    val n = vecs
      .select(col("vec_id"), col("v"))
      .withColumn("vn", expr(
        "transform(v, x -> CAST(x / sqrt(aggregate(v, 0.0D, (a, y) -> a + y * y)) AS FLOAT))"))
      .select(col("vec_id"), col("vn"))
    // k rows max: the constant partition key makes the intended
    // single-partition numbering explicit (no WindowExec warning)
    var cents = n.orderBy("vec_id").limit(k)
      .select(row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(lit(0)).orderBy("vec_id")).cast("int").as("cent_id"),
        col("vn").as("cv"))
      .withColumn("cent_id", col("cent_id") - 1)
    cents = cents.localCheckpoint(true)
    (1 to iters).foreach { _ =>
      // assign: cosine == dot on unit vectors; argmax cell per vector
      val assigned = n.crossJoin(broadcast(cents))
        .withColumn("cos", dot(col("vn"), col("cv")))
        .groupBy("vec_id")
        .agg(max_by(struct(col("cent_id"), col("cv")),
          struct(col("cos"), negate(col("cent_id")))).as("best"),
          first(col("vn")).as("vn"))
        .select(col("vec_id"), col("best.cent_id").as("cell"), col("vn"))
      // element-wise mean per cell, then re-normalize (spherical step)
      val means = assigned
        .select(col("cell"), posexplode(col("vn")).as(Seq("dim", "x")))
        .groupBy("cell", "dim").agg(avg("x").as("mx"))
        .groupBy("cell")
        .agg(array_sort(collect_list(struct(col("dim"), col("mx")))).as("ps"))
        .select(col("cell").as("cent_id"), expr(
          "transform(ps, p -> CAST(p.mx / sqrt(aggregate(ps, 0.0D, (a, q) -> a + q.mx * q.mx)) AS FLOAT))")
          .as("cv"))
      // empty cells keep their previous centroid
      cents = cents.select(col("cent_id"), col("cv").as("cv_old"))
        .join(means.select(col("cent_id"), col("cv").as("cv_new")), Seq("cent_id"), "left_outer")
        .select(col("cent_id"), coalesce(col("cv_new"), col("cv_old")).as("cv"))
        .localCheckpoint(true) // truncate the per-iteration lineage
    }
    cents
  }

  /** Mean within-cluster cosine of an assignment — the training
    * objective spherical k-means maximizes; exposed for tests. */
  def assignmentQuality(vecs: DataFrame, cents: DataFrame): Double = {
    // self-sufficient: vec_dot must resolve even when trainIvfCentroids
    // never ran in this session (e.g. evaluating persisted centroids)
    graft.functions.VectorFunctions.register(vecs.sparkSession)
    val n = vecs
      .withColumn("vn", expr(
        "transform(v, x -> CAST(x / sqrt(aggregate(v, 0.0D, (a, y) -> a + y * y)) AS FLOAT))"))
    n.crossJoin(broadcast(cents))
      .withColumn("cos", dot(col("vn"), col("cv")))
      .groupBy("vec_id").agg(max("cos").as("best"))
      .agg(avg("best")).head().getDouble(0)
  }
}
