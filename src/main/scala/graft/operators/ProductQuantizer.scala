package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization for embedding search at corpus scale (Jégou,
  * Douze, Schmid, "Product Quantization for Nearest Neighbor Search",
  * TPAMI 2011 — the IVFADC design every large ANN deployment descends
  * from): vectors are L2-normalized, chopped into `m` subspaces of
  * `dsub` dims, and each subvector is replaced by the id of its nearest
  * of `k` per-subspace centroids — a 64-dim float vector (256 bytes)
  * becomes `m` small ints (8 bytes at m=8), a 32× memory/scan compression
  * that is what lets a 100 TB corpus keep its whole index hot.
  *
  * Search is ADC (asymmetric distance computation): the UNquantized query
  * precomputes an m×k lookup table of partial inner products against the
  * codebooks — per corpus row the approximate cosine is then m table
  * lookups instead of d multiplies. The ADC pass ranks a shortlist which
  * is re-ranked EXACTLY against the true vectors, so the output carries
  * exact similarities and approximation only costs recall, never garbage
  * scores. Pairs with [[IvfIndex]]: IVF prunes which rows are scanned,
  * PQ shrinks what each scanned row costs; q109 demonstrates the PQ half
  * standalone (recall bounded against exact q23 in ProductQuantizerSpec).
  *
  * Spark shapes: training is `iters` Lloyd rounds over (vec_id, subspace)
  * rows with the centroid set broadcast per round (codebooks are m·k·dsub
  * doubles — KB-sized at any corpus scale; the bounded collect is the same
  * trade IvfIndex documents); encoding is a PURE MAP-SIDE expression
  * against literal codebooks — no join, no shuffle, whole-stage codegen —
  * which is the property that matters when encoding 10¹¹ rows; ADC search
  * is a broadcast join against the (tiny) query set plus one per-query
  * top-s window, the q23 shape with lookups in place of multiplies.
  */
object ProductQuantizer {

  /** Trained codebooks: `cb(mi)(j)` is the dsub-dim centroid `j` of
    * subspace `mi`. Dense: every (mi, j) slot holds a centroid (empty
    * clusters carry their previous round's centroid forward).
    */
  final case class PqCodebooks(m: Int, k: Int, dsub: Int,
      cb: Seq[Seq[Seq[Double]]])

  /** L2-normalize so inner products ARE cosines (norm staged in a real
    * column first — a lambda closing over the norm expression would
    * re-evaluate it per element).
    */
  private def normalized(vectors: DataFrame, vecCol: String): DataFrame =
    vectors
      .withColumn("__nrm",
        sqrt(aggregate(transform(col(vecCol), x => x * x),
          lit(0.0), (acc, x) => acc + x)))
      .withColumn("__u",
        transform(col(vecCol), x => x / col("__nrm")))

  /** Train per-subspace codebooks on (vec_id, v) vectors. Deterministic:
    * seeded from the k lowest vec_ids' subvectors, refined by `iters`
    * Lloyd rounds over the `vec_id % trainMod == 0` sample (training on a
    * deterministic sample is what keeps this affordable at corpus scale —
    * the codebooks are KB-sized regardless), means r6-rounded so partial-
    * aggregation order can't leak into the codebook.
    */
  def train(vectors: DataFrame, m: Int = 8, k: Int = 16, iters: Int = 3,
      trainMod: Int = 2): PqCodebooks = {
    graft.functions.GraftFunctions.register(vectors.sparkSession)
    val r6 = (x: Double) => math.floor(x * 1e6 + 0.5) / 1e6
    val sample = normalized(vectors.filter(col("vec_id") % trainMod === 0), "v")
      .select(col("vec_id"), col("__u").as("u"))
      .persist()
    try {
      // Seed j = 0..k-1 from the k lowest SAMPLED vec_ids' subvectors —
      // a k-row collect (the sample may skip ids, so "vec_id < k" would
      // under-seed). The dimension rides along: no separate head() job.
      val seeds = sample.orderBy(col("vec_id")).limit(k)
        .select(col("u")).collect().map(_.getSeq[Double](0))
      require(seeds.length == k, s"need >= $k training vectors, got ${seeds.length}")
      val dim = seeds.head.length
      require(dim % m == 0, s"dim $dim must split into $m subspaces")
      val dsub = dim / m
      var cb: Seq[Seq[Seq[Double]]] = (0 until m).map(mi =>
        (0 until k).map(j => seeds(j).slice(mi * dsub, (mi + 1) * dsub)
          .map(r6).toIndexedSeq))
      // Each Lloyd round: ONE map-side native-encode pass assigns every
      // (vector, subspace) to its centroid, one small aggregate computes
      // the means (m·k·dsub groups — the codebook itself, a bounded
      // collect), and the driver rebuilds the literal for the next round.
      (1 to iters).foreach { _ =>
        val means = sample
          .select(col("u"), posexplode(
            call_function("pq_encode", col("u"), typedLit(cb))).as(Seq("mi", "j")))
          .select(col("mi"), col("j"),
            posexplode(slice(col("u"), col("mi") * dsub + 1, lit(dsub)))
              .as(Seq("dim", "x")))
          .groupBy(col("mi"), col("j"), col("dim")).agg(avg(col("x")).as("mn"))
          .collect().map(r => ((r.getInt(0), r.getInt(1), r.getInt(2)), r.getDouble(3)))
          .toMap
        // Empty clusters keep last round's centroid: codebooks stay dense,
        // codes stay in [0, k). Means r6-rounded so partial-aggregation
        // order can't leak into the codebook.
        cb = (0 until m).map(mi => (0 until k).map(j =>
          if (means.contains((mi, j, 0)))
            (0 until dsub).map(t => r6(means((mi, j, t)))).toIndexedSeq
          else cb(mi)(j)))
      }
      PqCodebooks(m, k, dsub, cb)
    } finally sample.unpersist()
  }

  /** Encode (vec_id, v) → (vec_id, code array<int>[m]). Pure map-side:
    * codebooks ride into the native PqEncode expression (one fused codegen
    * loop per row — the HOF formulation this replaced was interpreted and
    * three orders of magnitude slower), nothing shuffles — the shape that
    * encodes a petabyte corpus as a scan.
    */
  def encode(vectors: DataFrame, q: PqCodebooks): DataFrame = {
    graft.functions.GraftFunctions.register(vectors.sparkSession)
    vectors.select(col("vec_id"),
      call_function("pq_encode", col("v"), typedLit(q.cb)).as("code"))
  }

  /** ADC top-k: approximate scores over the coded corpus shortlist the
    * top `shortlist` per query, which are re-ranked EXACTLY against the
    * true vectors. Output (qid, rnk, vec_id, sim) — q23's shape, exact
    * sims. Queries stay unquantized (the A in ADC); their m×k lookup
    * tables are computed once on the broadcast side.
    */
  def adcSearch(queries: DataFrame, codes: DataFrame, vectors: DataFrame,
      q: PqCodebooks, k: Int, shortlist: Int,
      excludeSelf: Boolean = true): DataFrame = {
    graft.functions.GraftFunctions.register(vectors.sparkSession)
    val qs = queries.select(col("qid"),
      call_function("pq_lut", col("qv"), typedLit(q.cb)).as("lut"))
    // Per corpus row: m table lookups, no arithmetic on the vector at all.
    val approx = call_function("pq_adc", col("code"), col("lut"))
    val sw = Window.partitionBy(col("qid")).orderBy(col("asim").desc, col("vec_id"))
    // excludeSelf: only meaningful when query ids share the corpus id
    // space (the q23/q109 workload); false = rank every coded row.
    val short = codes.join(broadcast(qs),
      if (excludeSelf) col("vec_id") =!= col("qid") else lit(true))
      .select(col("qid"), col("vec_id"), approx.as("asim"))
      .withColumn("rn", row_number().over(sw)).filter(col("rn") <= shortlist)
      .select(col("qid"), col("vec_id"))
    // Exact re-rank of the shortlist only: |queries|·shortlist rows.
    val exact = short
      .join(vectors.select(col("vec_id"), col("v")), Seq("vec_id"))
      .join(broadcast(queries.select(col("qid"), col("qv"))), Seq("qid"))
      .select(col("qid"), col("vec_id"),
        IvfIndex.r6(IvfIndex.cosine(col("qv"), col("v"))).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    exact.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("vec_id"), col("sim"))
      .orderBy(col("qid"), col("rnk"))
  }
}
