package graft.llm

import graft.core.Cols
import graft.functions.GraftFunctions.dot
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbours — the coarse-
  * quantizer alternative to the random-hyperplane LSH in [[AnnBuckets]]
  * (SURVEY.md §2B north star names both).
  *
  * Train: k centroids by Lloyd iterations expressed as DataFrame jobs —
  * assignment is a codegen'd argmin over broadcast centroid literals
  * (distance via the [[graft.functions.DotProduct]] expression), the
  * update is one posexplode + (cell, dim) aggregate; only k×dims doubles
  * ever sit on the driver. Deterministic: seeded hash-ordered init, fixed
  * iteration count.
  *
  * Search: each vector probes its `nProbe` nearest cells and meets only the
  * vectors assigned there — at cluster scale the cell id is the shuffle
  * key (inverted lists co-locate), and recall/cost tune via k and nProbe.
  */
object IvfIndex {

  /** Squared-distance column to a constant centroid (‖e‖² term omitted —
    * constant per row, irrelevant to argmin over centroids).
    */
  private def distTo(embCol: Column, c: Array[Double]): Column = {
    val lit2c = typedLit(c.map(_ * 2.0).toSeq)
    val c2    = c.map(x => x * x).sum
    lit(c2) - dot(embCol, lit2c)
  }

  /** Nearest-centroid cell id via array_min over (dist, idx) structs. */
  private def cellExpr(embCol: Column, centroids: Array[Array[Double]]): Column =
    array_min(array(centroids.zipWithIndex.toIndexedSeq.map { case (c, i) =>
      struct(distTo(embCol, c).as("d"), lit(i).as("cell"))
    }: _*)).getField("cell")

  /** Train centroids: deterministic init (k rows in hash-of-id order), then
    * `iters` Lloyd rounds; each round is one assignment projection + one
    * (cell, dim) aggregate.
    */
  def trainCentroids(
      emb: DataFrame,
      idCol: String,
      embCol: String,
      k: Int = 16,
      iters: Int = 3,
      seed: Int = 42): Array[Array[Double]] = {
    val e = emb.select(Cols.q(idCol).as("id"), Cols.q(embCol).cast("array<double>").as("emb"))
    var centroids: Array[Array[Double]] = e
      .orderBy(pmod(hash(col("id"), lit(seed)), lit(1000003)), col("id"))
      .limit(k)
      .select("emb")
      .collect()
      .map(_.getSeq[Double](0).toArray)

    for (_ <- 1 to iters) {
      val assigned = e.withColumn("cell", cellExpr(col("emb"), centroids))
      val updated = assigned
        .select(col("cell"), posexplode(col("emb")).as(Seq("pos", "v")))
        .groupBy("cell", "pos")
        .agg(avg("v").as("cv"))
        .collect()
      val byCell = updated.groupBy(_.getInt(0))
      centroids = centroids.indices.map { cell =>
        byCell.get(cell) match {
          case Some(rows) =>
            val dims = rows.map(r => r.getInt(1) -> r.getDouble(2)).toMap
            Array.tabulate(dims.size)(dims)
          case None => centroids(cell) // empty cell keeps its centroid
        }
      }.toArray
    }
    centroids
  }

  /** Approximate cosine top-k: probe the `nProbe` nearest cells per vector,
    * rank candidates exactly (rounded score + id tie-break).
    */
  def approxTopK(
      emb: DataFrame,
      idCol: String,
      embCol: String,
      k: Int = 5,
      nCells: Int = 16,
      nProbe: Int = 4,
      iters: Int = 3,
      seed: Int = 42): DataFrame = {
    val centroids = trainCentroids(emb, idCol, embCol, nCells, iters, seed)

    // ONE pass computes all centroid distances; the sorted (dist, cell)
    // array yields both the home cell (element 1) and the probe list. The
    // indexed table is materialized (localCheckpoint) because both sides of
    // the candidate self-join derive from it — this IS the inverted index;
    // at cluster scale it would be a persisted bucketed table.
    val distArr = array(centroids.zipWithIndex.toIndexedSeq.map { case (c, i) =>
      struct(distTo(col("emb"), c).as("d"), lit(i).as("cell"))
    }: _*)
    val indexed = emb
      .select(Cols.q(idCol).as("vec_id"), Cols.q(embCol).cast("array<double>").as("emb"))
      .withColumn("nrm", sqrt(dot(col("emb"), col("emb"))))
      .withColumn("dists", array_sort(distArr))
      .withColumn("cell", col("dists").getItem(0).getField("cell"))
      .localCheckpoint(true)

    val probes = indexed
      .withColumn("probe", explode(slice(col("dists"), 1, nProbe)))
      .select(
        col("vec_id").as("a_id"),
        col("emb").as("a_emb"),
        col("nrm").as("a_nrm"),
        col("probe.cell").as("cell"))

    val lists = indexed.select(
      col("cell"),
      col("vec_id").as("b_id"),
      col("emb").as("b_emb"),
      col("nrm").as("b_nrm"))

    val w = Window.partitionBy("a_id").orderBy(col("cos_sim").desc, col("b_id").asc)
    probes
      .join(lists, Seq("cell"))
      .where(col("a_id") =!= col("b_id"))
      .select(
        col("a_id"),
        col("b_id"),
        round(dot(col("a_emb"), col("b_emb")) / (col("a_nrm") * col("b_nrm")), 6).as("cos_sim"))
      .dropDuplicates("a_id", "b_id")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select("a_id", "b_id", "rn", "cos_sim")
  }
}
