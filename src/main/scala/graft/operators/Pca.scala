package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Distributed PCA over an embedding column — the whitening /
  * dimensionality-reduction step of an embedding pipeline (dedup
  * preprocessing, index compression, drift monitoring).
  *
  * Design for determinism AND scale (SURVEY §5/§6):
  *  - Two distributed passes, both INTEGER-EXACT: values scale to
  *    x = floor(v·10⁴ + 0.5) longs; pass 1 accumulates per-dim sums
  *    (the integer floor-div mean μ); pass 2 accumulates the
  *    CENTERED second-moment triangle Σ (x−μ)(x−μ)ᵀ. Integer adds
  *    are order-independent, so the matrix is bit-identical under
  *    any partitioning — and replayable in DuckDB (the embed_pca
  *    oracle gates the corner + diagonal of exactly this matrix).
  *    Centering BEFORE the products keeps every entry ≤ N·(2·10⁴)²
  *    — no overflow until N ≈ 2·10¹⁰ rows (the uncentered N·S−mm
  *    form overflows a long at ~3·10⁵).
  *  - Both passes are treeAggregate over mapPartitions-style
  *    closures: O(d²/2) longs of state per task, one driver-sized
  *    result; no shuffle of per-row outer products.
  *  - The eigensolve is DRIVER-side cyclic Jacobi on the d×d
  *    symmetric matrix — metadata-scale (d ≤ a few hundred), the
  *    same driver-state rule as BPE's merge table. Projection is a
  *    broadcast of k·d doubles back through one map pass.
  */
object Pca {

  /** Scale factor: 4 decimal digits — embeddings are unit-scale. */
  val ScaleF: Double = 10000.0

  final case class Model(
      n: Long,
      d: Int,
      /** integer floor-div mean of the scaled vectors */
      mu: Array[Long],
      /** upper triangle (row-major, i ≤ j) of Σ (x−μ)(x−μ)ᵀ */
      covTri: Array[Long],
      /** eigenvalues of covTri/n, descending (scaled-unit variance) */
      eigenvalues: Array[Double],
      /** eigenvectors as ROWS, aligned with eigenvalues, unit norm */
      components: Array[Array[Double]]) {
    def covC(i: Int, j: Int): Long = {
      val (a, b) = if (i <= j) (i, j) else (j, i)
      covTri(a * d - a * (a - 1) / 2 + (b - a))
    }
  }

  private[operators] def scaled(df: DataFrame, colName: String): RDD[Array[Long]] =
    df.select(colName).rdd.map { r =>
      val seq = r.getSeq[Float](0)
      val a = new Array[Long](seq.length)
      var i = 0
      while (i < a.length) {
        a(i) = math.floor(seq(i).toDouble * ScaleF + 0.5).toLong
        i += 1
      }
      a
    }

  /** Fit on `df.colName` (array&lt;float&gt;). `k` top components kept. */
  def fit(df: DataFrame, colName: String, k: Int): Model = {
    val xs = scaled(df, colName).persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val d = xs.first().length
      val (n, sums) = xs.treeAggregate((0L, new Array[Long](d)))(
        seqOp = { case ((c, acc), x) =>
          var i = 0; while (i < d) { acc(i) += x(i); i += 1 }; (c + 1, acc)
        },
        combOp = { case ((c1, a1), (c2, a2)) =>
          var i = 0; while (i < d) { a1(i) += a2(i); i += 1 }; (c1 + c2, a1)
        })
      require(n > 1, s"PCA needs ≥ 2 rows, got $n")
      val mu = sums.map(s => Math.floorDiv(s, n))
      val tri = xs.treeAggregate(new Array[Long](d * (d + 1) / 2))(
        seqOp = { (acc, x) =>
          val c = new Array[Long](d)
          var i = 0; while (i < d) { c(i) = x(i) - mu(i); i += 1 }
          var t = 0; i = 0
          while (i < d) {
            var j = i
            while (j < d) { acc(t) += c(i) * c(j); t += 1; j += 1 }
            i += 1
          }
          acc
        },
        combOp = { (a1, a2) =>
          var i = 0; while (i < a1.length) { a1(i) += a2(i); i += 1 }; a1
        })
      // driver-side eigensolve of the d×d sample covariance (doubles)
      val cov = Array.tabulate(d, d) { (i, j) =>
        val (a, b) = if (i <= j) (i, j) else (j, i)
        tri(a * d - a * (a - 1) / 2 + (b - a)).toDouble / n
      }
      val (evals, evecs) = jacobiEigen(cov)
      val order = evals.indices.sortBy(i => -evals(i)).toArray
      Model(n, d, mu, tri,
        order.take(k).map(evals),
        order.take(k).map(i => evecs.map(_(i))))
    } finally { xs.unpersist(); () }
  }

  /** Project `df` onto the model's components: one map pass with the
    * k·d component matrix in the closure (broadcast-sized). Output
    * columns: the id column + `pc` (array&lt;double&gt;, length k).
    */
  def project(df: DataFrame, idCol: String, colName: String, model: Model): DataFrame = {
    val spark = df.sparkSession
    val comps = model.components
    val mu = model.mu
    val rdd = df.select(idCol, colName).rdd.map { r =>
      val id = r.getLong(0)
      val seq = r.getSeq[Float](1)
      val c = new Array[Double](mu.length)
      var i = 0
      while (i < c.length) {
        c(i) = (math.floor(seq(i).toDouble * ScaleF + 0.5) - mu(i)) / ScaleF
        i += 1
      }
      val pc = comps.map { v =>
        var s = 0.0; var j = 0
        while (j < v.length) { s += v(j) * c(j); j += 1 }
        s
      }
      org.apache.spark.sql.Row(id, pc.toSeq)
    }
    import org.apache.spark.sql.types._
    spark.createDataFrame(rdd, StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("pc", ArrayType(DoubleType, containsNull = false), nullable = false))))
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix.
    * Returns (eigenvalues, eigenvector MATRIX with eigenvectors as
    * COLUMNS — column i pairs with eigenvalue i), unsorted.
    */
  private[operators] def jacobiEigen(m: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = m.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    val MaxSweeps = 100
    var sweep = 0
    var off = offDiag(a)
    val tol = 1e-22 * math.max(1.0, frob(a))
    while (off > tol && sweep < MaxSweeps) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val t = math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            rotate(a, v, p, q, c, s)
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices if i != j) s += a(i)(j) * a(i)(j)
    s
  }

  private def frob(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices) s += a(i)(j) * a(i)(j)
    s
  }

  private def rotate(a: Array[Array[Double]], v: Array[Array[Double]],
      p: Int, q: Int, c: Double, s: Double): Unit = {
    val d = a.length
    var i = 0
    while (i < d) {
      val aip = a(i)(p); val aiq = a(i)(q)
      a(i)(p) = c * aip - s * aiq
      a(i)(q) = s * aip + c * aiq
      i += 1
    }
    i = 0
    while (i < d) {
      val api = a(p)(i); val aqi = a(q)(i)
      a(p)(i) = c * api - s * aqi
      a(q)(i) = s * api + c * aqi
      val vip = v(i)(p); val viq = v(i)(q)
      v(i)(p) = c * vip - s * viq
      v(i)(q) = s * vip + c * viq
      i += 1
    }
  }
}
