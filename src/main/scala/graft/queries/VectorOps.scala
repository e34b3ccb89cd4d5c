package graft.queries

import graft.core.Lake
import graft.engine.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over the `embeddings` table (`Array[Float]`, dim 64):
  * embedding near-dup pairs, brute-force cosine top-k, and an IVF-style
  * cell-restricted ANN variant — all oracle-matched against DuckDB.
  *
  * Determinism: dot products and norms are strict left-to-right double
  * folds with each float cast to double before multiplying — the native
  * [[graft.expressions.CosineSimilarity]] expression on the Spark side and
  * `list_reduce` (a sequential left fold) on the DuckDB side evaluate the
  * identical operation sequence, so IEEE 754 gives bit-identical doubles
  * in both engines with no rounding anywhere.
  *
  * Scale design: the fused codegen'd cosine walks each pair once. The
  * query side of every op is a bounded set — pair cost
  * is O(|queries| × N), not O(N²). q41 is the 100 TB path: candidate
  * generation restricted to the query's coarse cell (here the `label`
  * column standing in for an IVF centroid assignment), i.e. an equi-join
  * that prunes the scan to one cell instead of a full cross product.
  */
object VectorOps {

  private def lake(s: SparkSession, dir: String) = Lake(s, dir)

  /** Native fused cosine (graft.expressions.CosineSimilarity): one
    * codegen'd loop per pair computing dot + both norms — replaces the
    * three-pass zip_with/aggregate HOF chain with identical bit-level
    * semantics (strict left fold, double math, dot / sqrt(na*nb)). */
  private def cos(s: SparkSession, a: Column, b: Column): Column = {
    GraftFunctions.register(s)
    call_function("cosine_sim", a, b)
  }

  private def vectors(s: SparkSession, dir: String): DataFrame =
    lake(s, dir).embeddings.select(col("vec_id"), col("label"), col("embedding"))

  /** DuckDB fragments mirroring dot/norm exactly (same fold order). */
  private val dDot =
    """list_reduce(list_transform(range(len(a.embedding)),
         i -> CAST(a.embedding[i+1] AS DOUBLE) * CAST(b.embedding[i+1] AS DOUBLE)),
       (x, y) -> x + y)"""
  private val dNorm =
    """list_reduce(list_transform(range(len(embedding)),
         i -> CAST(embedding[i+1] AS DOUBLE) * CAST(embedding[i+1] AS DOUBLE)),
       (x, y) -> x + y)"""

  // --------------------------------------------------------------------
  // q39 — embedding-cosine near-duplicate pairs: a decimated query side
  // (vec_id % 10 = 0) against the full table, cosine > 0.4. The pair
  // stage is O(|queries| × N); the full-table near-dup pass at scale goes
  // through q41's cell restriction instead.
  // --------------------------------------------------------------------
  def q39EmbeddingNearDup(s: SparkSession, dir: String): DataFrame = {
    val v = vectors(s, dir)
    val a = v.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("d1"), col("embedding").as("e1"))
    val b = v.select(col("vec_id").as("d2"), col("embedding").as("e2"))
    a.join(b, col("d1") < col("d2"))
      .select(col("d1"), col("d2"), cos(s, col("e1"), col("e2")).as("cosine"))
      .filter(col("cosine") > 0.4)
      .orderBy(col("d1"), col("d2"))
  }

  private val q39Oracle =
    s"""WITH v AS (SELECT vec_id, label, embedding, $dNorm AS norm_sq FROM embeddings),
       pairs AS (
         SELECT a.vec_id AS d1, b.vec_id AS d2,
                $dDot / sqrt(a.norm_sq * b.norm_sq) AS cosine
         FROM v a JOIN v b ON a.vec_id % 10 = 0 AND a.vec_id < b.vec_id)
       SELECT d1, d2, cosine FROM pairs WHERE cosine > 0.4 ORDER BY d1, d2"""

  // --------------------------------------------------------------------
  // q40 — brute-force cosine top-k (k=5) for a bounded query set
  // (vec_id < 16): the exact-ANN baseline. Ranking is a window
  // PARTITIONED by query id — parallel per query, never a global sort.
  // --------------------------------------------------------------------
  def q40KnnBruteForce(s: SparkSession, dir: String): DataFrame = {
    val v = vectors(s, dir)
    val q = v.filter(col("vec_id") < 16)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
    val n = v.select(col("vec_id").as("n_id"), col("embedding").as("ne"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("n_id"))
    q.join(n, col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"), cos(s, col("qe"), col("ne")).as("cosine"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .orderBy(col("q_id"), col("rnk"))
  }

  private val q40Oracle =
    s"""WITH v AS (SELECT vec_id, embedding, $dNorm AS norm_sq FROM embeddings),
       pairs AS (
         SELECT a.vec_id AS q_id, b.vec_id AS n_id,
                $dDot / sqrt(a.norm_sq * b.norm_sq) AS cosine
         FROM v a JOIN v b ON a.vec_id < 16 AND a.vec_id <> b.vec_id),
       ranked AS (
         SELECT q_id, n_id, cosine,
                CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) AS INTEGER) AS rnk
         FROM pairs)
       SELECT q_id, n_id, cosine, rnk FROM ranked WHERE rnk <= 5
       ORDER BY q_id, rnk"""

  // --------------------------------------------------------------------
  // q41 — IVF-style ANN (the scale path): neighbors restricted to the
  // query's coarse cell (`label` = centroid assignment), so candidate
  // generation is an equi-join on the cell key — at 100 TB with
  // cell-partitioned storage this prunes to ~1/cells of the data and
  // shuffles nothing but the (small) query set.
  // --------------------------------------------------------------------
  def q41IvfAnn(s: SparkSession, dir: String): DataFrame = {
    val v = vectors(s, dir)
    val q = v.filter(col("vec_id") < 32)
      .select(col("vec_id").as("q_id"), col("label").as("cell"),
        col("embedding").as("qe"))
    val n = v.select(col("vec_id").as("n_id"), col("label").as("n_cell"),
      col("embedding").as("ne"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("n_id"))
    q.join(n, col("cell") === col("n_cell") && col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("cell"), col("n_id"),
        cos(s, col("qe"), col("ne")).as("cosine"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .orderBy(col("q_id"), col("rnk"))
  }

  private val q41Oracle =
    s"""WITH v AS (SELECT vec_id, label, embedding, $dNorm AS norm_sq FROM embeddings),
       pairs AS (
         SELECT a.vec_id AS q_id, a.label AS cell, b.vec_id AS n_id,
                $dDot / sqrt(a.norm_sq * b.norm_sq) AS cosine
         FROM v a JOIN v b ON a.vec_id < 32 AND a.label = b.label AND a.vec_id <> b.vec_id),
       ranked AS (
         SELECT q_id, cell, n_id, cosine,
                CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) AS INTEGER) AS rnk
         FROM pairs)
       SELECT q_id, cell, n_id, cosine, rnk FROM ranked WHERE rnk <= 3
       ORDER BY q_id, rnk"""

  // --------------------------------------------------------------------
  // q73 — sign-random-projection (cosine) LSH near-dup pairs: the banded
  // scale path for full-corpus embedding near-dup, where q39 decimates
  // and q41 needs a centroid assignment. Each vector gets a 16-bit
  // signature (bit j = sign of Σ_d ±v[d], the ± from bit j of the
  // portable per-DIMENSION hash — i.e. Charikar hyperplanes with
  // Rademacher components, derivable identically in any engine); pairs
  // collide when ≥1 of 4 4-bit bands matches, then verify by exact
  // cosine. Candidate generation is the banded equi-join — key
  // cardinality vectors × bands, never all-pairs — and each pair is
  // counted once at its FIRST matching band (inline bit test, no
  // distinct shuffle). At production similarity (cos ≥ 0.95, p_bit =
  // 0.90) this config recalls ~99% of true pairs with ~16× candidate
  // pruning; the demo threshold 0.4 matches this synthetic corpus's
  // cosine range.
  // --------------------------------------------------------------------
  private val SRP_BITS = 16
  private val SRP_BANDS = 4
  private val SRP_BAND_BITS = SRP_BITS / SRP_BANDS

  /** Embedding dimensionality the SRP planes are derived for — callers
    * filter `size(embedding) === SRP_DIMS` (an empty or odd-width vector
    * has no signature; `sequence(0, size-1)` on an empty array would
    * generate a DESCENDING [0,-1] range, the same trap
    * `TextFns.wordShingles` documents). */
  private[queries] val SRP_DIMS = 64

  /** Hyperplane signs are ROW-INVARIANT: hash60 of the dimension index
    * depends only on d ∈ [0, 64), so the 64 values are computed ONCE on
    * the driver (same md5 formula the oracle evaluates — bit-identical)
    * and shipped as an array literal. The per-row work is just the ±
    * float sums — no per-row digests. */
  private lazy val dimHashes: Column = array(
    (0 until SRP_DIMS).map(d => lit(graft.functions.TextFns.hash60Jvm(d.toString))): _*)

  /** 16-bit SRP signature of a float-vector column. Bit j of the
    * per-dimension hash is hyperplane j's sign for that dimension; the
    * 16 running sums accumulate in one pass over dims, strict left fold
    * (DuckDB's list_reduce evaluates the identical addition sequence, so
    * the sign compare is bit-deterministic). */
  private def srpSignature(vec: Column): Column = {
    def shr(v: Column, bc: Column) = call_function("shiftright", v, bc)
    def shl(v: Column, bc: Column) = call_function("shiftleft", v, bc)
    val sums = aggregate(
      sequence(lit(0), lit(SRP_DIMS - 1)),
      array_repeat(lit(0.0), SRP_BITS),
      (acc, d) => {
        val h = element_at(dimHashes, d + 1)
        val e = element_at(vec, d + 1).cast(DoubleType)
        zip_with(acc, sequence(lit(0), lit(SRP_BITS - 1)),
          (a, j) => a + when(shr(h, j).bitwiseAND(1) === 1, e).otherwise(-e))
      })
    aggregate(
      zip_with(sums, sequence(lit(0), lit(SRP_BITS - 1)),
        (v2, j) => when(v2 > 0, shl(lit(1L), j)).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
  }

  private def srpBand(sig: Column, b: Int): Column =
    shiftright(sig, SRP_BAND_BITS * b)
      .bitwiseAND(lit((1L << SRP_BAND_BITS) - 1))

  def q73SrpLshPairs(s: SparkSession, dir: String): DataFrame = {
    import graft.core.CacheScope
    // signatures cached: consumed by the banded join AND both verify
    // joins; embeddings stay OUT of the banded explode (fetched by id
    // post-collision — arrays never ride the candidate shuffle)
    val v = CacheScope.cached(vectors(s, dir)
      .filter(size(col("embedding")) === SRP_DIMS)
      .repartition(graft.functions.Scale.par(s), col("vec_id"))
      .select(col("vec_id"), col("embedding"),
        srpSignature(col("embedding")).as("sig")))
    val banded = v.select(col("vec_id"), col("sig"),
      posexplode(array((0 until SRP_BANDS).map(b =>
        srpBand(col("sig"), b)): _*)).as(Seq("band", "bval")))
    val firstMatch = (0 until SRP_BANDS).foldLeft(lit(null).cast(IntegerType)) {
      (acc, b) => coalesce(acc,
        when(srpBand(col("a.sig"), b) === srpBand(col("b.sig"), b), lit(b)))
    }
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bval") === col("b.bval")
          && col("a.vec_id") < col("b.vec_id"))
      .filter(col("a.band") === firstMatch)
      .select(col("a.vec_id").as("d1"), col("b.vec_id").as("d2"))
      .join(v.select(col("vec_id").as("d1"), col("embedding").as("e1")), "d1")
      .join(v.select(col("vec_id").as("d2"), col("embedding").as("e2")), "d2")
      .select(col("d1"), col("d2"), cos(s, col("e1"), col("e2")).as("cosine"))
      .filter(col("cosine") >= 0.4)
      .orderBy(col("d1"), col("d2"))
  }

  private val q73Oracle = {
    def dh(x: String) = s"CAST(concat('0x', substr(md5($x),1,15)) AS BIGINT)"
    // S_j: one ±embedding sum per signature bit, same fold order as the
    // Spark HOF (0.0-init left fold ≡ first-element-init list_reduce —
    // they differ only in the sign of an all-zero sum, and the > 0
    // compare is insensitive to zero sign)
    val bits = (0 until SRP_BITS).map(j =>
      s"""CASE WHEN list_reduce(list_transform(range(len(embedding)),
            d -> CASE WHEN (${dh("CAST(d AS VARCHAR)")} >> $j) & 1 = 1
                 THEN CAST(embedding[d+1] AS DOUBLE)
                 ELSE -CAST(embedding[d+1] AS DOUBLE) END),
            (x, y) -> x + y) > 0
          THEN ${1L << j}::BIGINT ELSE 0::BIGINT END""").mkString(" + ")
    val bandMatch = (0 until SRP_BANDS).map { b =>
      val mask = (1L << SRP_BAND_BITS) - 1
      s"((a.sig >> ${SRP_BAND_BITS * b}) & $mask) = ((b.sig >> ${SRP_BAND_BITS * b}) & $mask)"
    }.mkString(" OR ")
    s"""WITH sig AS (
         SELECT vec_id, embedding, $bits AS sig,
                $dNorm AS norm_sq
         FROM embeddings WHERE len(embedding) = $SRP_DIMS),
       cand AS (
         SELECT a.vec_id AS d1, b.vec_id AS d2,
                $dDot / sqrt(a.norm_sq * b.norm_sq) AS cosine
         FROM sig a JOIN sig b
           ON a.vec_id < b.vec_id AND ($bandMatch))
       SELECT d1, d2, cosine FROM cand WHERE cosine >= 0.4
       ORDER BY d1, d2"""
  }

  // --------------------------------------------------------------------
  // q85 — int8 embedding quantization (the 4× memory/IO cut that makes
  // billion-vector ANN fit storage budgets): symmetric per-vector
  // scheme — scale = 127/amax, q_i = floor(x_i·scale + 0.5) ∈
  // [-127, 127] — with a per-vector reconstruction-error report
  // (max and total |x - dequant(quant(x))|). Narrow per-row transform,
  // scan-parallel, zero shuffles before the output sort. Determinism:
  // float→double casts are exact, floor and max are exact/order-free,
  // and the error total is a strict left fold (Spark aggregate HOF ≡
  // DuckDB list_reduce; the elements are abs() ≥ +0.0, so the 0.0-init
  // vs first-element-init difference vanishes exactly).
  // --------------------------------------------------------------------
  def q85QuantizeInt8(s: SparkSession, dir: String): DataFrame = {
    val scale = lit(127.0) / col("amax")
    vectors(s, dir)
      .filter(size(col("embedding")) === SRP_DIMS)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast(DoubleType)).as("xs"))
      .withColumn("amax", array_max(transform(col("xs"), a => abs(a))))
      // an all-zero vector has no scale; its quantization is exact
      .withColumn("errs",
        when(col("amax") === 0.0, array_repeat(lit(0.0), SRP_DIMS))
          .otherwise(transform(col("xs"), x =>
            abs(x - floor(x * scale + lit(0.5)) / scale))))
      .select(col("vec_id"), col("amax"),
        array_max(col("errs")).as("max_abs_err"),
        aggregate(col("errs"), lit(0.0), (acc, e) => acc + e).as("sum_abs_err"))
      .orderBy(col("vec_id"))
  }

  private val q85Oracle =
    s"""WITH v AS (
         SELECT vec_id,
                list_transform(embedding, x -> CAST(x AS DOUBLE)) AS xs
         FROM embeddings WHERE len(embedding) = $SRP_DIMS),
       a AS (
         SELECT vec_id, xs,
                list_max(list_transform(xs, x -> abs(x))) AS amax
         FROM v),
       e AS (
         SELECT vec_id, amax,
                CASE WHEN amax = 0 THEN list_transform(xs, x -> 0.0)
                     ELSE list_transform(xs, x ->
                       abs(x - floor(x * (127.0 / amax) + 0.5)
                             / (127.0 / amax)))
                END AS errs
         FROM a)
       SELECT vec_id, amax,
              list_max(errs) AS max_abs_err,
              list_reduce(errs, (x, y) -> x + y) AS sum_abs_err
       FROM e ORDER BY vec_id"""

  // --------------------------------------------------------------------
  // q100 — product-quantization encode + distortion report through the
  // REAL ProductQuantizer machinery (assignment expressions, reconstruct,
  // error fold), against a FIXED arithmetic codebook — 8 subspaces of 8
  // dims, 4 constant-vector centroids per subspace at levels
  // −0.3 + 0.2·c — so DuckDB can derive the identical codes and the
  // identical 64-dim error fold with no trained state. (The TRAINED path
  // — same encode/ADC over KMeans-fit codebooks — is property-tested in
  // ProductQuantizerSpec: exactness in the lossless regime, determinism,
  // per-subspace Lloyd descent.) The distance and error folds are strict
  // left-to-right doubles in both engines; the 0.2·c levels are spaced
  // ~10⁶ double-ulps apart at the data's scale, so argmin ties cannot
  // occur and the hash match is exact.
  // --------------------------------------------------------------------
  private val Q100_M = 8
  private val Q100_SUB = 8
  private val Q100_K = 4

  private def q100Model: graft.operators.ProductQuantizer.PQModel =
    graft.operators.ProductQuantizer.PQModel(Q100_M, Q100_SUB,
      Vector.tabulate(Q100_M)(_ => graft.operators.KMeans.Model(
        Vector.tabulate(Q100_K)(c => Vector.fill(Q100_SUB)(-0.3 + 0.2 * c)))))

  def q100PqEncode(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.ProductQuantizer
    val emb = lake(s, dir).embeddings
    val pq = q100Model
    val codes = ProductQuantizer.encode(emb, "vec_id", "embedding", pq)
    val err = ProductQuantizer.reconstructionError(
      emb, codes, "vec_id", "embedding", pq)
    codes.join(err, "vec_id")
      .select(col("vec_id"),
        concat_ws("-", transform(col("codes"), _.cast("string"))).as("code_str"),
        col("sq_err"))
      .orderBy(col("vec_id"))
  }

  private val q100Oracle =
    s"""WITH sub AS (
         SELECT vec_id, j, c,
                list_reduce(list_transform(
                  embedding[j*$Q100_SUB+1 : j*$Q100_SUB+$Q100_SUB],
                  x -> (CAST(x AS DOUBLE) -
                        (CAST(-0.3 AS DOUBLE) + CAST(0.2 AS DOUBLE) * c))
                     * (CAST(x AS DOUBLE) -
                        (CAST(-0.3 AS DOUBLE) + CAST(0.2 AS DOUBLE) * c))),
                  (a, b) -> a + b) AS dist
         FROM embeddings,
              UNNEST(range($Q100_M)) AS uj(j), UNNEST(range($Q100_K)) AS uc(c)),
       pick AS (
         SELECT vec_id, j, c AS code,
                row_number() OVER (PARTITION BY vec_id, j
                                   ORDER BY dist, c) AS rn
         FROM sub),
       codes AS (
         SELECT vec_id, list(code ORDER BY j) AS cs,
                string_agg(code, '-' ORDER BY j) AS code_str
         FROM pick WHERE rn = 1 GROUP BY vec_id),
       err AS (
         SELECT e.vec_id, c.code_str,
                list_reduce(list_transform(range(${Q100_M * Q100_SUB}),
                  d -> (CAST(e.embedding[d+1] AS DOUBLE) -
                        (CAST(-0.3 AS DOUBLE)
                         + CAST(0.2 AS DOUBLE) * c.cs[d // $Q100_SUB + 1]))
                     * (CAST(e.embedding[d+1] AS DOUBLE) -
                        (CAST(-0.3 AS DOUBLE)
                         + CAST(0.2 AS DOUBLE) * c.cs[d // $Q100_SUB + 1]))),
                  (a, b) -> a + b) AS sq_err
         FROM embeddings e JOIN codes c USING (vec_id))
       SELECT vec_id, code_str, sq_err FROM err ORDER BY vec_id"""

  // --------------------------------------------------------------------
  // q108 — SemDeDup (Abbas et al. 2023): cluster-scoped semantic dedup.
  // Every vector flagged kept/removed: removed iff a LOWER-id vector in
  // the same cell (the `label` assignment, standing in for the k-means
  // centroid as in q41) is cosine ≥ 0.5 close. The quadratic compare is
  // confined to cells — the published trick that makes embedding dedup
  // scale: at 100 TB you raise k so cells stay ~10³ vectors, and the
  // whole pass is one cell-keyed equi-join + one anti-join on ids. The
  // kept flag (not just survivors) goes into the hash so the oracle
  // certifies both sides of the cut.
  // --------------------------------------------------------------------
  private val Q108_TAU = 0.5

  def q108SemanticDedup(s: SparkSession, dir: String): DataFrame = {
    val v = vectors(s, dir)
    val kept = graft.operators.SemDedup.semanticDedup(
      v, "vec_id", "embedding", "label", Q108_TAU)
      .select(col("vec_id"), lit(true).as("kept"))
    v.select(col("vec_id"), col("label"))
      .join(kept, Seq("vec_id"), "left")
      .select(col("vec_id"), col("label"),
        coalesce(col("kept"), lit(false)).as("kept"))
      .orderBy(col("vec_id"))
  }

  private val q108Oracle =
    s"""WITH v AS (SELECT vec_id, label, embedding, $dNorm AS norm_sq FROM embeddings),
       removed AS (
         SELECT DISTINCT b.vec_id
         FROM v a JOIN v b
           ON a.label = b.label AND a.vec_id < b.vec_id
          AND $dDot / sqrt(a.norm_sq * b.norm_sq) >= $Q108_TAU)
       SELECT vec_id, label,
              vec_id NOT IN (SELECT vec_id FROM removed) AS kept
       FROM v ORDER BY vec_id"""

  // --------------------------------------------------------------------
  // q126 — IVF-PQ composed ANN (the production billion-vector shape,
  // Jégou et al. TPAMI 2011): candidates come from the query's coarse
  // cell (IVF restriction, as q41) but are represented ONLY by their
  // PQ codes (q100's fixed codebook) — the float vectors never cross
  // the candidate join. Distance is ADC (asymmetric distance
  // computation): the float query against each candidate's
  // reconstructed centroids, Σ_j Σ_d (q[j·8+d] − centroid(code_j))²,
  // folded strictly left-to-right per subspace then across subspaces —
  // the exact sequence the oracle replays, so doubles are
  // bit-identical. Top-5 per query by ADC distance, n_id tiebreak
  // (candidates sharing a code vector tie EXACTLY, and only they can).
  // Scale: at 10⁹ vectors the candidate side of the join carries
  // M=8 bytes of codes instead of 256 bytes of floats — the shuffle
  // shrinks 32×, and the per-pair distance is 64 flops against codes
  // already in cache. PlanChecksSpec asserts the no-floats-in-join
  // property mechanically.
  // --------------------------------------------------------------------
  def q126IvfPq(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.ProductQuantizer
    val emb = lake(s, dir).embeddings
    val codes = ProductQuantizer.encode(emb, "vec_id", "embedding", q100Model)
    // the candidate side: (id, cell, codes) — NO float column
    val n = codes.join(emb.select(col("vec_id"), col("label")), "vec_id")
      .select(col("vec_id").as("n_id"), col("label").as("n_cell"),
        col("codes"))
    val q = emb.filter(col("vec_id") < 32)
      .select(col("vec_id").as("q_id"), col("label").as("cell"),
        col("embedding").as("qe"))
    // ADC: per-subspace LUT fold against the constant-level codebook
    // (level = −0.3 + 0.2·code, identical across the subspace's dims)
    val adc = expr(
      s"""aggregate(sequence(0, ${Q100_M - 1}), cast(0.0 as double),
            (acc, j) -> acc + aggregate(sequence(0, ${Q100_SUB - 1}),
              cast(0.0 as double),
              (a, d) -> a +
                (cast(element_at(qe, j*$Q100_SUB+d+1) as double)
                   - (cast(-0.3 as double)
                      + cast(0.2 as double) * element_at(codes, j+1)))
              * (cast(element_at(qe, j*$Q100_SUB+d+1) as double)
                   - (cast(-0.3 as double)
                      + cast(0.2 as double) * element_at(codes, j+1)))))""")
    val w = Window.partitionBy(col("q_id")).orderBy(col("adc"), col("n_id"))
    q.join(n, col("cell") === col("n_cell") && col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("cell"), col("n_id"), adc.as("adc"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .orderBy(col("q_id"), col("rnk"))
  }

  private val q126Oracle =
    s"""WITH sub AS (
         SELECT vec_id, j, c,
                list_reduce(list_transform(
                  embedding[j*$Q100_SUB+1 : j*$Q100_SUB+$Q100_SUB],
                  x -> (CAST(x AS DOUBLE) -
                        (CAST(-0.3 AS DOUBLE) + CAST(0.2 AS DOUBLE) * c))
                     * (CAST(x AS DOUBLE) -
                        (CAST(-0.3 AS DOUBLE) + CAST(0.2 AS DOUBLE) * c))),
                  (a, b) -> a + b) AS dist
         FROM embeddings,
              UNNEST(range($Q100_M)) AS uj(j), UNNEST(range($Q100_K)) AS uc(c)),
       pick AS (
         SELECT vec_id, j, c AS code,
                row_number() OVER (PARTITION BY vec_id, j
                                   ORDER BY dist, c) AS rn
         FROM sub),
       codes AS (
         SELECT vec_id, list(code ORDER BY j) AS cs
         FROM pick WHERE rn = 1 GROUP BY vec_id),
       pairs AS (
         SELECT a.vec_id AS q_id, a.label AS cell, b.vec_id AS n_id,
                list_reduce(list_transform(range($Q100_M),
                  j -> list_reduce(list_transform(range($Q100_SUB),
                    d -> (CAST(a.embedding[j*$Q100_SUB+d+1] AS DOUBLE) -
                          (CAST(-0.3 AS DOUBLE)
                           + CAST(0.2 AS DOUBLE) * cb.cs[j+1]))
                       * (CAST(a.embedding[j*$Q100_SUB+d+1] AS DOUBLE) -
                          (CAST(-0.3 AS DOUBLE)
                           + CAST(0.2 AS DOUBLE) * cb.cs[j+1]))),
                    (x, y) -> x + y)),
                  (x, y) -> x + y) AS adc
         FROM embeddings a
         JOIN embeddings b ON a.vec_id < 32 AND a.label = b.label
                          AND a.vec_id <> b.vec_id
         JOIN codes cb ON cb.vec_id = b.vec_id),
       ranked AS (
         SELECT q_id, cell, n_id, adc,
                CAST(row_number() OVER (PARTITION BY q_id
                     ORDER BY adc, n_id) AS INTEGER) AS rnk
         FROM pairs)
       SELECT q_id, cell, n_id, adc, rnk FROM ranked WHERE rnk <= 5
       ORDER BY q_id, rnk"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q126_ivf_pq" -> (q126IvfPq _),
    "q108_semantic_dedup" -> (q108SemanticDedup _),
    "q39_embedding_neardup" -> (q39EmbeddingNearDup _),
    "q40_knn_bruteforce" -> (q40KnnBruteForce _),
    "q41_ivf_ann" -> (q41IvfAnn _),
    "q73_srp_lsh_pairs" -> (q73SrpLshPairs _),
    "q85_quantize_int8" -> (q85QuantizeInt8 _),
    "q100_pq_encode" -> (q100PqEncode _))

  val oracle: Map[String, String] = Map(
    "q126_ivf_pq" -> q126Oracle,
    "q108_semantic_dedup" -> q108Oracle,
    "q39_embedding_neardup" -> q39Oracle,
    "q40_knn_bruteforce" -> q40Oracle,
    "q41_ivf_ann" -> q41Oracle,
    "q73_srp_lsh_pairs" -> q73Oracle,
    "q85_quantize_int8" -> q85Oracle,
    "q100_pq_encode" -> q100Oracle)
}
