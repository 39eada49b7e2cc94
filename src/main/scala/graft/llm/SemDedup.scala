package graft.llm

import graft.core.Cols
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SemDedup — semantic deduplication over an embedding column (Abbas et
  * al. 2023, "SemDedup: Data-efficient learning at web-scale through
  * semantic deduplication"): cluster the corpus, then drop near-identical
  * vectors WITHIN each cluster, so the quadratic cosine scan runs over
  * cluster-sized groups instead of the whole corpus.
  *
  * Clustering here is deterministic SEED-POINT assignment rather than
  * Lloyd iterations: the k seeds are the vectors with the smallest
  * salted-md5 of their id (the [[Sampling]] determinism pattern — a pure
  * function of (salt, id), reproducible across engines and cluster
  * sizes), and every vector joins the seed it is most cosine-similar to.
  * That keeps the whole operator relationally replayable — a SQL oracle
  * can re-pick the seeds, re-assign the cells, and re-derive the drop
  * list, which no sampled-Lloyd clustering allows ([[IvfIndex]]'s
  * centroids are training-order artifacts). For production clustering
  * quality, swap the seed table for [[IvfIndex.trainCentroids]] output —
  * the within-cell scan below is agnostic to where cells came from.
  *
  * Scale shape: seed pick is one TakeOrdered job collecting O(k) rows;
  * assignment is a pure projection (k rounded-cosine expressions per
  * row — codegen'd [[graft.functions.DotProduct]] against literal seed
  * vectors, no join, no shuffle); the within-cell scan is ONE shuffle on
  * the cell key, and each cell packs into the same flat-matrix kernel as
  * [[BruteForce]] (ids sorted, upper-triangle scan, no per-pair array
  * copies). With k ~ √n cells the per-cell work is O(n) total — the
  * SemDedup trade. A hard per-cell row cap fails fast when a cell
  * outgrows what one task should scan, naming the fix (raise k).
  *
  * Decision contract (deterministic, engine-portable): a vector is
  * DROPPED iff some SAME-CELL vector with a smaller id has rounded
  * cosine ≥ tau — the "keep first" greedy at 6-dp rounding, with NaN
  * ranking greatest (both engines' NaN order), so zero-norm vectors
  * cannot diverge.
  */
object SemDedup {

  /** One picked seed: its id, vector, and L2 norm (index-order sum, the
    * same reduction order as [[graft.functions.DotProduct]] and DuckDB's
    * `list_dot_product`, so the driver-computed norm is bit-identical to
    * either engine's).
    */
  final case class Seed(id: Long, vec: Array[Double], nrm: Double)

  /** Cells a task refuses to scan past (2^17 rows ≈ 1.4·10¹⁰ pair scores
    * in one task — far beyond what raising k would cost).
    */
  val DefaultMaxCellRows: Int = 1 << 17

  private def saltedMd5(id: Column, salt: String): Column =
    md5(concat(lit(salt + "|"), id.cast("string")).cast("binary"))

  /** The k seed vectors: smallest salted-md5 of id, id ascending on ties
    * — one TakeOrdered job, O(k) driver memory.
    */
  def pickSeeds(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      salt: String = "semdedup"): Array[Seed] = {
    require(k >= 1, s"need at least one seed, got $k")
    val rows = emb
      .select(
        Cols.q(idCol).cast("long").as("id"),
        Cols.q(vecCol).cast("array<double>").as("emb"),
        saltedMd5(Cols.q(idCol), salt).as("h"))
      .orderBy(col("h").asc, col("id").asc)
      .limit(k)
      .select("id", "emb")
      .collect()
    rows.map { r =>
      val vec = r.getSeq[Double](1).toArray
      var s = 0.0
      var i = 0
      while (i < vec.length) { s += vec(i) * vec(i); i += 1 }
      Seed(r.getLong(0), vec, math.sqrt(s))
    }
  }

  /** Cell assignment as a pure projection: the seed with the greatest
    * ROUNDED cosine (ties → smaller seed id; the fold visits seeds in
    * ascending id order and only a strictly greater score displaces the
    * incumbent). Returns (id, cell, emb) with the caller's column names
    * untouched upstream.
    */
  def assignCells(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      seeds: Array[Seed]): DataFrame = {
    require(seeds.nonEmpty, "no seeds")
    val sorted = seeds.sortBy(_.id)
    val base = emb.select(
      Cols.q(idCol).cast("long").as("vec_id"),
      Cols.q(vecCol).cast("array<double>").as("__emb"))
    val withNrm = base.withColumn(
      "__nrm",
      sqrt(graft.functions.GraftFunctions.dot(col("__emb"), col("__emb"))))
    def cosTo(s: Seed): Column =
      round(
        graft.functions.GraftFunctions.dot(col("__emb"), typedlit(s.vec.toSeq)) /
          (col("__nrm") * lit(s.nrm)),
        6)
    val best = sorted.tail.foldLeft((lit(sorted.head.id), cosTo(sorted.head))) {
      case ((bestId, bestCs), s) =>
        val cs = cosTo(s)
        (when(cs > bestCs, lit(s.id)).otherwise(bestId), greatest(cs, bestCs))
    }
    withNrm.select(col("vec_id"), best._1.as("cell"), col("__emb").as("emb"))
  }

  /** Full SemDedup pass: (vec_id, cell, max_sim_prev, keep), where
    * `max_sim_prev` is the greatest rounded cosine to any SAME-CELL
    * vector with a smaller id (null when the vector is its cell's first)
    * and `keep = !(max_sim_prev ≥ tau)` with NaN passing the threshold.
    */
  def keepFlags(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      tau: Double,
      salt: String = "semdedup",
      maxCellRows: Int = DefaultMaxCellRows): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val seeds = pickSeeds(emb, idCol, vecCol, k, salt)
    assignCells(emb, idCol, vecCol, seeds)
      .as[(Long, Long, Array[Double])]
      .groupByKey(_._2)
      .flatMapGroups { (cell, it) =>
        val rows = it.map(t => (t._1, t._3)).toArray
        if (rows.length > maxCellRows)
          throw new IllegalArgumentException(
            s"cell $cell holds ${rows.length} vectors (> $maxCellRows): the within-cell " +
              "pair scan would be a single-task O(n²) job — raise k (more, smaller cells; " +
              "k ~ sqrt(corpus) is the SemDedup operating point)")
        val (ids, flat, nrm, dims) = BruteForce.pack(rows)
        (0 until ids.length).iterator.map { b =>
          var mx  = 0.0
          var has = false
          var a   = 0
          while (a < b) {
            if (ids(a) != ids(b)) {
              val cs = BruteForce.round6(
                BruteForce.dot(flat, a, flat, b, dims) / (nrm(a) * nrm(b)))
              if (!has || java.lang.Double.compare(cs, mx) > 0) mx = cs
              has = true
            }
            a += 1
          }
          val mxOpt = if (has) Some(mx) else None
          (ids(b), cell, mxOpt, !(has && BruteForce.nanGte(mx, tau)))
        }
      }
      .toDF("vec_id", "cell", "max_sim_prev", "keep")
  }
}
