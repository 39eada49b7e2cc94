package graft.llm

import graft.core.Cols
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Exact all-pairs cosine kernels for the declared brute-force oracles
  * (q19 top-k, q49 threshold pairs).
  *
  * The declarative cross-join formulation pays for itself in row
  * materialization: every joined row copies BOTH embedding arrays
  * (~1 KB/pair at 64 dims — ~4 GB of memcpy for 2 k vectors), which
  * dwarfs the 64 multiply-adds of the dot product itself. Here the
  * vector set is collected once, broadcast as one flat primitive matrix,
  * and each task scans its slice of row indices against the shared
  * matrix — no per-pair array copies, no shuffle until the final tiny
  * ORDER BY. This is the documented mapPartitions last-resort case:
  * a dense numeric kernel Catalyst row plumbing can only slow down.
  *
  * Scale posture: brute force is the SMALL-SF ORACLE next to the
  * bucketed ANN paths (q41/q50/q67) — broadcasting the matrix is
  * inherent to any all-pairs scan and bounds the mode to corpora that
  * fit per executor, exactly the regime where an exact oracle is run.
  *
  * Arithmetic parity with the declarative form and the DuckDB oracle:
  * dots and norms reduce in index order in doubles, and rounding
  * replicates Catalyst's `Round` on DoubleType —
  * `BigDecimal.valueOf(x).setScale(s, HALF_UP)` — so hash-exact results
  * are preserved.
  */
object BruteForce {

  private def round6(x: Double): Double =
    if (java.lang.Double.isFinite(x))
      java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    else x // NaN/Inf pass through, as Catalyst Round leaves them

  /** Collect (sorted by id for determinism) into a flat matrix + norms. */
  private def matrix(
      emb: DataFrame,
      idCol: String,
      embCol: String): (Array[Long], Array[Double], Array[Double], Int) = {
    val rows = emb
      .select(Cols.q(idCol).cast("long").as("id"), Cols.q(embCol).cast("array<double>").as("e"))
      .orderBy("id")
      .collect()
    val n    = rows.length
    val dims = if (n == 0) 0 else rows(0).getSeq[Double](1).size
    val ids  = new Array[Long](n)
    val flat = new Array[Double](n * dims)
    val nrm  = new Array[Double](n)
    var i = 0
    while (i < n) {
      ids(i) = rows(i).getLong(0)
      val e = rows(i).getSeq[Double](1)
      var j = 0
      var s = 0.0
      while (j < dims) {
        val v = e(j)
        flat(i * dims + j) = v
        s += v * v
        j += 1
      }
      nrm(i) = math.sqrt(s)
      i += 1
    }
    (ids, flat, nrm, dims)
  }

  private def dot(flat: Array[Double], a: Int, b: Int, dims: Int): Double = {
    var s = 0.0
    var j = 0
    while (j < dims) {
      s += flat(a * dims + j) * flat(b * dims + j)
      j += 1
    }
    s
  }

  /** Exact cosine top-k per vector: (a_id, b_id, rn, cos_sim), ranked by
    * rounded similarity desc then b_id asc — identical ordering to the
    * `round(...,6)` + row_number window of the declarative form.
    */
  def topK(spark: SparkSession, emb: DataFrame, idCol: String, embCol: String, k: Int): DataFrame = {
    import spark.implicits._
    val (ids, flat, nrm, dims) = matrix(emb, idCol, embCol)
    val bc = spark.sparkContext.broadcast((ids, flat, nrm))
    val n  = ids.length
    spark
      .range(0, n.toLong, 1, math.max(1, math.min(n, spark.sparkContext.defaultParallelism)))
      .as[Long]
      .mapPartitions { it =>
        val (ids, flat, nrm) = bc.value
        it.flatMap { ai =>
          val a = ai.toInt
          val cand = new Array[(Double, Long)](ids.length - 1)
          var w = 0
          var b = 0
          while (b < ids.length) {
            if (b != a) {
              cand(w) = (round6(dot(flat, a, b, dims) / (nrm(a) * nrm(b))), ids(b))
              w += 1
            }
            b += 1
          }
          // rounded score desc, id asc — matches the window's order
          scala.util.Sorting.stableSort(
            cand,
            (x: (Double, Long), y: (Double, Long)) => x._1 > y._1 || (x._1 == y._1 && x._2 < y._2))
          cand.take(k).zipWithIndex.map { case ((cs, bid), r) => (ids(a), bid, r + 1, cs) }
        }
      }
      .toDF("a_id", "b_id", "rn", "cos_sim")
  }

  /** Unordered near-dup pairs (a_id < b_id) with rounded cosine ≥ tau. */
  def neardupPairs(
      spark: SparkSession,
      emb: DataFrame,
      idCol: String,
      embCol: String,
      tau: Double): DataFrame = {
    import spark.implicits._
    val (ids, flat, nrm, dims) = matrix(emb, idCol, embCol)
    val bc = spark.sparkContext.broadcast((ids, flat, nrm))
    val n  = ids.length
    spark
      .range(0, n.toLong, 1, math.max(1, math.min(n, spark.sparkContext.defaultParallelism)))
      .as[Long]
      .mapPartitions { it =>
        val (ids, flat, nrm) = bc.value
        it.flatMap { ai =>
          val a = ai.toInt
          // ids are sorted, so j > a ⇔ id_j > id_a: the a<b halving with
          // no comparison on the pair output
          (a + 1 until ids.length).iterator.flatMap { b =>
            val cs = round6(dot(flat, a, b, dims) / (nrm(a) * nrm(b)))
            if (cs >= tau) Iterator.single((ids(a), ids(b), cs)) else Iterator.empty
          }
        }
      }
      .toDF("a_id", "b_id", "cos_sim")
  }
}
