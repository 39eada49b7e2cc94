package graft.llm

import graft.core.Cols
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IVFADC (Jégou et al. 2011): the composed FAISS-style index — IVF
  * coarse cells for pruning ([[IvfIndex]] centroids) with product
  * quantization of the RESIDUAL `v − centroid(cell)` ([[Pq]] codebooks)
  * for in-cell scoring. This is the architecture a 100 TB embedding
  * corpus actually deploys: the coarse quantizer bounds how much of the
  * corpus a query touches (nProbe cells), and the residual codes bound
  * how much memory each touched row costs (m bytes + a cell id).
  * Residuals quantize better than raw vectors because subtracting the
  * cell centroid removes the coarse structure the codebook would
  * otherwise spend its entries on.
  *
  * Scale shape: build = centroid training (bounded driver sample, the
  * [[IvfIndex.trainCentroids]] recipe) + one assignment projection +
  * m·iters bounded aggregates for the residual codebooks; the encoded
  * corpus is (vec_id, cell, m codes) — nothing else is retained. Search
  * = driver-side probe-cell pick + per-probed-cell ADC tables, then ONE
  * filter + projection + TakeOrdered over the probed cells' rows. At
  * cluster scale `cell` is the partition key, so the probe filter is
  * partition pruning (the [[IvfIndex.writeIndex]] layout).
  */
object IvfPq {

  /** The built index: coarse centroids (cell id = array position) and the
    * residual codebooks.
    */
  final case class IvfPqIndex(
      centroids: Array[Array[Double]],
      cb: Pq.Codebooks)

  private def centroidCase(centroids: Array[Array[Double]], cellCol: Column): Column =
    centroids.zipWithIndex.foldLeft(typedlit(Seq.empty[Double]): Column) {
      case (acc, (c, i)) => when(cellCol === i, typedlit(c.toSeq)).otherwise(acc)
    }

  /** Cell assignment + residual projection for a corpus frame:
    * (vec_id, cell, res). Assignment is the [[KMeans]] argmin contract
    * (rounded distance, smaller cell on ties) over the given centroids.
    */
  private def residuals(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Array[Array[Double]]): DataFrame = {
    val cents = centroids.zipWithIndex.map { case (c, i) => KMeans.Centroid(i.toLong, c) }
    KMeans
      .assign(emb, idCol, vecCol, cents)
      .select(
        col("vec_id"),
        col("cluster").cast("int").as("cell"),
        zip_with(
          col("__emb"),
          centroidCase(centroids, col("cluster").cast("int")),
          (a, b) => a - b).as("res"))
  }

  /** Train the composed index and encode the corpus: returns the index
    * plus the encoded frame (vec_id, cell, code0..codeM-1).
    */
  def build(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      dims: Int,
      nCells: Int = 16,
      m: Int = 4,
      k: Int = 16,
      pqIters: Int = 2,
      seed: Int = 42): (IvfPqIndex, DataFrame) = {
    require(nCells >= 1 && nCells <= 64, s"nCells=$nCells out of the CASE-expression range")
    val centroids = IvfIndex.trainCentroids(emb, idCol, vecCol, nCells, seed = seed)
    // localCheckpoint: the residual is a nCells-branch CASE feeding a
    // zip_with — left lazy, Pq.encode would re-embed that expression into
    // every one of its m·k distance columns and the fused stage blows the
    // JVM's 64 KB method limit (codegen falls back to interpretation).
    // Materializing the (vec_id, cell, res) projection once keeps every
    // downstream stage a plain scan + codegen projection — and the
    // codebook training re-reads it m·iters times anyway.
    val res = residuals(emb, idCol, vecCol, centroids).localCheckpoint()
    val cb  = Pq.train(res, "vec_id", "res", dims, m, k, pqIters)
    val encoded = Pq
      .encode(res, "vec_id", "res", cb)
      .join(res.select("vec_id", "cell"), Seq("vec_id"))
    (IvfPqIndex(centroids, cb), encoded)
  }

  /** ADC search over the probed cells: the query's residual AGAINST EACH
    * probed cell gets its own m×k exact-distance table (coarse centroids
    * differ per cell, so the residual query differs per cell); each
    * encoded row in a probed cell costs m lookups via a per-subspace
    * CASE on its cell. Rounded distance, vec_id tie-break.
    */
  def topK(
      index: IvfPqIndex,
      encoded: DataFrame,
      query: Array[Double],
      k: Int = 5,
      nProbe: Int = 4): DataFrame = {
    val cb = index.cb
    require(query.length == cb.m * cb.subDim, "query dims do not match codebooks")
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0
      var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val probed = index.centroids.zipWithIndex
      .map { case (c, i) => (d2(query, c), i) }
      .sortBy { case (d, i) => (d, i) }
      .take(math.min(nProbe, index.centroids.length))
      .map(_._2)
    // per probed cell: residual query and its m×k table, exact driver math
    val tables: Map[Int, Array[Array[Double]]] = probed.map { cell =>
      val rq = query.indices.map(i => query(i) - index.centroids(cell)(i)).toArray
      cell -> Array.tabulate(cb.m) { s =>
        cb.books(s).map { c =>
          var acc = 0.0
          var i = 0
          while (i < cb.subDim) { val d = rq(s * cb.subDim + i) - c(i); acc += d * d; i += 1 }
          acc
        }
      }
    }.toMap
    val approx = (0 until cb.m)
      .map { s =>
        probed.foldLeft(lit(0.0): Column) { (acc, cell) =>
          when(
            col("cell") === cell,
            element_at(typedlit(tables(cell)(s).toSeq), col(s"code$s") + 1)).otherwise(acc)
        }
      }
      .reduce(_ + _)
    encoded
      .where(col("cell").isin(probed.toSeq: _*))
      .select(col("vec_id"), round(sqrt(greatest(approx, lit(0.0))), 6).as("adc_dist"))
      .orderBy(col("adc_dist").asc, col("vec_id").asc)
      .limit(k)
  }
}
