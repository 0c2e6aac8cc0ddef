package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity-search library surface: brute-force cosine (correctness
  * baseline), and an IVF (inverted-file) index as the 100 TB scale path —
  * complementing the hyperplane-LSH bucketing in LlmOps.
  *
  * IVF: k centroids are chosen deterministically from the data (strided
  * sample), broadcast, and every vector is assigned to its nearest
  * centroid map-side. A query probes only the nProbe nearest cells —
  * candidate set shrinks by ~k/nProbe without any full-corpus pass.
  */
object Similarity {

  private def toDouble(c: Column): Column =
    transform(c, x => x.cast(DoubleType))

  // native codegen dot (graft.functions.DotF64) — ~6× the composed
  // aggregate(zip_with) HOF formulation on candidate-pair scoring
  private def dot(a: Column, b: Column): Column =
    graft.functions.DotF64.dotf64(a, b)

  private def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force top-k against one query vector (map-side score +
    * TakeOrdered; zero shuffle of the corpus).
    */
  def bruteForceTopK(emb: DataFrame, queryVecId: Long, k: Int): DataFrame = {
    val e = emb.select(col("vec_id"), toDouble(col("embedding")).as("e"))
    val q = e.filter(col("vec_id") === queryVecId).select(col("e").as("qe"))
    e.filter(col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), cosine(col("e"), col("qe")).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }

  /** Deterministic IVF centroids: a pseudo-random (hash-ordered, so
    * stable across runs) pick of nCells vectors. Robust to sparse /
    * non-contiguous vec_ids (e.g. a post-dedup corpus); the pick is a
    * TakeOrdered top-k, not a global sort materialization, and the
    * renumbering window runs over the nCells-row result only (bounded
    * dimension, same exemption as dict_encode).
    *
    * The scatter key is a PORTABLE Lehmer-style fold
    * `(vec_id * 48271) % 2147483647` — pure BIGINT arithmetic both
    * engines compute identically (unlike Spark-native `hash()`), so the
    * whole IVF pipeline is replicable in the DuckDB oracle. Safe from
    * BIGINT overflow for vec_id up to ~1.9e14.
    */
  def centroids(emb: DataFrame, nCells: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    emb
      .orderBy(pmod(col("vec_id") * lit(48271L), lit(2147483647L)), col("vec_id"))
      .limit(nCells)
      // Bounded domain (nCells rows): the renumber legitimately runs in
      // one partition. The constant partition key keeps the spec
      // non-empty so WindowExec's single-partition warning stays
      // meaningful for REAL unpartitioned windows elsewhere; vec_id*0
      // (vec_id is non-null) rather than lit(0) because the optimizer
      // prunes foldable partition keys back to an empty spec.
      .withColumn("cell_id",
        (row_number().over(
          Window.partitionBy(col("vec_id") * lit(0)).orderBy(col("vec_id"))) - 1)
          .cast(IntegerType))
      .select(col("cell_id"), toDouble(col("embedding")).as("centroid"))
  }

  /** Assign every vector to its nearest centroid — a TRUE map-side argmax.
    *
    * Centroids are a bounded design dimension (nCells ≪ corpus), so they
    * are collected, unit-normalized driver-side, and shipped as literal
    * array columns. Each row computes one dot product per centroid inside
    * a higher-order `transform` and picks the argmax with
    * `array_position(sims, array_max(sims))` — the plan is a pure
    * Project over the scan: no crossJoin row explosion, no Exchange.
    * (The round-1 formulation shuffled |corpus|×nCells rows through a
    * `row_number` window — a scale-killer at 100 TB.)
    *
    * Unit-normalizing centroids up front makes argmax-over-dot equal to
    * argmax-over-cosine (the row's own norm is a positive constant across
    * cells), so the per-cell work is exactly one fused dot product.
    * Ties resolve to the lowest cell_id (centroids ship sorted;
    * array_position returns the first match).
    */
  /** Collect a bounded centroid set to driver arrays — the shippable
    * dimension [[assignCells]] broadcasts as literals. Deterministic per
    * (dataset, nCells), so callers that rebuild plans repeatedly (bench
    * reps, verify runs) should cache the result via [[graft.DimCache]]
    * instead of paying the collect job per invocation.
    */
  def centroidArrays(cents: DataFrame): IndexedSeq[(Int, Seq[Double])] =
    cents.select(col("cell_id"), col("centroid")).collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1)))
      .sortBy(_._1)
      .toIndexedSeq

  def assignCells(emb: DataFrame, cents: DataFrame): DataFrame =
    assignCells(emb, centroidArrays(cents))

  def assignCells(emb: DataFrame, cRows: IndexedSeq[(Int, Seq[Double])]): DataFrame =
    assignCellsWithSim(emb, cRows).select(col("vec_id"), col("cell_id"), col("e"))

  /** [[assignCells]] plus the winning dot product itself (`top_sim` =
    * e·ĉ of the assigned cell). Because centroids ship unit-normalized,
    * `top_sim / ‖e‖` IS the vector's cosine to its own centroid — the
    * SemDeDup keep-policy rank (`dedup_semantic_keep`) — at zero extra
    * arithmetic: the argmax already computed every dot product.
    */
  def assignCellsWithSim(
      emb: DataFrame, cRows: IndexedSeq[(Int, Seq[Double])]): DataFrame = {
    require(cRows.nonEmpty, "assignCells: empty centroid set")
    val cellIds = array(cRows.map(r => lit(r._1)): _*)
    val unitCents = array(cRows.map { r =>
      val v = r._2
      val n = math.sqrt(v.map(x => x * x).sum)
      array(v.map(x => lit(if (n == 0d) 0d else x / n)): _*)
    }: _*)
    emb
      .select(col("vec_id"), toDouble(col("embedding")).as("e"))
      // sims materialized in its own projection: referencing it twice
      // below must NOT recompute the dot products (multi-referenced
      // aliases survive CollapseProject; a lambda would re-evaluate)
      .withColumn("sims", transform(unitCents, cu => dot(col("e"), cu)))
      .select(col("vec_id"), col("e"),
        element_at(cellIds, array_position(col("sims"), array_max(col("sims")))
          .cast(IntegerType)).as("cell_id"),
        array_max(col("sims")).as("top_sim"))
      .select(col("vec_id"), col("cell_id"), col("e"), col("top_sim"))
  }

  /** SemDeDup cluster-bounded semantic dedup (Abbas et al. 2023,
    * arXiv:2303.09540), parameterized for library use — the gate query
    * `dedup_semantic_keep` pins the (k = 8, τ = 0.35) instance against
    * its DuckDB oracle. Per vector: assign to its nearest centroid
    * ([[assignCellsWithSim]] — map-side broadcast argmax), find
    * within-cell partners at cosine ≥ τ, and drop the vector iff any
    * partner sits strictly farther from the centroid (strictly lower
    * centroid cosine; ties break toward the lower vec_id) — the
    * prototypical member of each near pair is the one dropped, the
    * paper's keep-outliers policy made deterministic as pairwise
    * dominance.
    *
    * Scale contract: k ∝ corpus (the paper runs 50k cells over 5B
    * embeddings) keeps per-cell population — and the per-cell pairwise
    * quadratic — constant; assignment never shuffles, the pair join
    * shuffles once on cell_id. MEASURED (r18, `ScaleProbe` axes
    * `semdedup_k_prop_n` / `semdedup_planted_recall`, factors 1/4/10 at
    * k = 8·f — SCALING.md "Round-18 probe"): max cell population
    * 292→327 (bounded), candidate pairs exactly linear (×10.0 at 10×),
    * wall sublinear, and planted cos≈1 dup recall 99.9% flat across the
    * k ladder — recall is a τ property, cost is the linear k ∝ N law.
    *
    * Output: (vec_id, cell_id, n_near, kept, centroid_cos_6dp).
    */
  def semanticDedupKeep(
      emb: DataFrame,
      cRows: IndexedSeq[(Int, Seq[Double])],
      tau: Double): DataFrame = {
    val m = assignCellsWithSim(emb, cRows)
      .select(col("vec_id"), col("cell_id"), col("e"),
        dot(col("e"), col("e")).as("n2"), col("top_sim"))
      .select(col("vec_id"), col("cell_id"), col("e"), col("n2"),
        (col("top_sim") / sqrt(col("n2"))).as("cc"))
    val a = m.select(col("cell_id"), col("vec_id").as("id_a"),
      col("e").as("ea"), col("n2").as("na2"), col("cc").as("ca"))
    val b = m.select(col("cell_id"), col("vec_id").as("id_b"),
      col("e").as("eb"), col("n2").as("nb2"), col("cc").as("cb"))
    val near = a.join(b, Seq("cell_id"))
      .filter(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("ca"), col("id_b"), col("cb"),
        (dot(col("ea"), col("eb")) / (sqrt(col("na2")) * sqrt(col("nb2"))))
          .as("cos"))
      .filter(col("cos") >= tau)
    val verdict = near
      .groupBy(col("id_a").as("vec_id"))
      .agg(count(lit(1)).as("n_near"),
        max(when(col("cb") < col("ca") ||
          (col("cb") === col("ca") && col("id_b") < col("id_a")), 1)
          .otherwise(0)).as("dropped"))
    m.join(verdict, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell_id"),
        coalesce(col("n_near"), lit(0L)).as("n_near"),
        (coalesce(col("dropped"), lit(0)) === 0).as("kept"),
        round(col("cc"), 6).as("centroid_cos_6dp"))
  }

  // -------------------------------------------------- product quantization

  /** Elementwise squared-L2 between two equal-length double arrays, as
    * the ascending-index fold `acc + (x_i - y_i)²` — one IEEE rounding
    * per subtract/multiply/add, mirrored verbatim by DuckDB's
    * `list_reduce`, so distances are bit-identical cross-engine (the
    * same contract DotF64 gives the dot-product paths). The compact HOF
    * tree beats an unrolled arithmetic chain here: encode runs once per
    * vector at WRITE time, and a 1000-term unrolled projection costs
    * more in per-plan codegen than it saves in evaluation.
    */
  private def l2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)

  /** Deterministic PQ codebooks: the same Lehmer-strided pick as
    * [[centroids]] selects `k` exemplar vectors (renumbered by vec_id),
    * and codeword `(m)(c)` is exemplar c's m-th length-`dsub` subvector.
    * A k-means refinement would tighten the cells but costs determinism
    * (iteration order) — the strided pick keeps the ENTIRE pipeline
    * replicable in ANSI SQL, the property every sketch in this repo
    * trades for. Bounded dimension: collect once per JVM per dataset
    * via [[graft.DimCache]] at the call site.
    */
  def pqCodebooks(emb: DataFrame, m: Int, k: Int, dsub: Int): IndexedSeq[IndexedSeq[IndexedSeq[Double]]] = {
    val picked = emb
      .orderBy(pmod(col("vec_id") * lit(48271L), lit(2147483647L)), col("vec_id"))
      .limit(k)
      .orderBy(col("vec_id"))
      .select(col("e"))
      .collect()
      .map(_.getSeq[Double](0))
      .toIndexedSeq
    require(picked.size == k, s"pqCodebooks: need $k exemplars, got ${picked.size}")
    require(picked.forall(_.length == m * dsub),
      s"pqCodebooks: dims must be uniform ${m}x$dsub")
    (0 until m).map(mm => picked.map(v => v.slice(mm * dsub, (mm + 1) * dsub).toIndexedSeq))
  }

  /** Map-side PQ encode: each vector gains `c0..c{M-1}` — the index of
    * its nearest codeword per subspace (argmin over k literal codewords;
    * ties to the lowest index via array_position-first-match). A pure
    * Project over the scan: no Exchange, no join. At 100 TB this is the
    * similarity family's memory lever — M small ints replace the float
    * vector for candidate generation (64×f32 → 8 codes = 32× smaller),
    * so the ANN working set fits executor memory long after raw
    * embeddings stop fitting anywhere.
    */
  def encodePq(emb: DataFrame, cb: IndexedSeq[IndexedSeq[IndexedSeq[Double]]], dsub: Int): DataFrame = {
    // distance arrays materialized in their own projection so the
    // argmin's two references don't recompute the folds
    val distCols = cb.indices.map { m =>
      val sub = slice(col("e"), m * dsub + 1, dsub)
      array(cb(m).map(w => l2(sub, array(w.map(lit): _*))): _*).as(s"d$m")
    }
    emb.select(Seq(col("vec_id"), col("e")) ++ distCols: _*)
      .select(Seq(col("vec_id"), col("e")) ++ cb.indices.map(m =>
        (array_position(col(s"d$m"), array_min(col(s"d$m"))) - 1)
          .cast(IntegerType).as(s"c$m")): _*)
  }

  /** The query-side ADC lookup table — `T(m)(c)` = squared-L2 between
    * the query's m-th subvector and codeword c, computed driver-side in
    * the same ascending-index IEEE fold the engines use (FAISS practice:
    * the table is always query-local; it is M×K ≪ corpus). Bit-exact
    * with the DuckDB twin's per-(vec, m) `terms` CTE by construction.
    */
  def adcTable(query: IndexedSeq[Double], cb: IndexedSeq[IndexedSeq[IndexedSeq[Double]]],
      dsub: Int): IndexedSeq[IndexedSeq[Double]] =
    cb.indices.map { m =>
      cb(m).map { w =>
        var acc = 0.0
        var j = 0
        while (j < dsub) {
          val d = query(m * dsub + j) - w(j)
          acc += d * d
          j += 1
        }
        acc
      }
    }

  /** ADC (asymmetric distance computation) top-k over PQ codes: every
    * corpus row is scored from its codes alone — M lookups into the
    * literal query table, summed in fixed subspace order (bit-exact
    * cross-engine; the leading `0.0 + t₀ ≡ t₀`). Plan: one codegen'd
    * Project over the encoded relation → TakeOrdered(k). Zero joins,
    * zero shuffles, and per-row work independent of the vector width —
    * the shape that lets a 100 TB corpus be ranked from an 8-byte/row
    * structure.
    */
  def pqTopK(encoded: DataFrame, table: IndexedSeq[IndexedSeq[Double]],
      queryVecId: Long, k: Int): DataFrame = {
    val adc = table.indices.map { m =>
      element_at(array(table(m).map(lit): _*), col(s"c$m") + 1)
    }.reduce(_ + _)
    encoded.filter(col("vec_id") =!= queryVecId)
      .withColumn("adc", adc)
      .orderBy(col("adc").asc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), round(col("adc"), 6).as("adc_dist_6dp"))
  }

  /** Per-dimension [min, max] bounds for SQ8 scalar quantization — the
    * train step (FAISS `ScalarQuantizer` QT_8bit practice: one corpus
    * pass, d pairs of doubles). Bounded collect: d rows, a design
    * dimension like centroids/codebooks — DimCache at call sites.
    */
  def sq8Bounds(emb: DataFrame): (IndexedSeq[Double], IndexedSeq[Double]) = {
    val rows = emb
      .select(posexplode(col("e")).as(Seq("dim", "x")))
      .groupBy(col("dim"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .collect()
      .sortBy(_.getInt(0))
    (rows.map(_.getDouble(1)).toIndexedSeq, rows.map(_.getDouble(2)).toIndexedSeq)
  }

  /** Map-side SQ8 encode: each vector gains `codes` — one SIGNED BYTE
    * per dimension (code −128..127 = the 0..255 bucket of the
    * per-dimension linear [min, max] grid, shifted by −128 to fit
    * TINYINT in both engines). The 4×-vs-f32 memory lever between raw
    * vectors and PQ's 32×: at 100 TB, SQ8 keeps per-dimension fidelity
    * (top-10 recall vs exact: 1.0 on all 8 sf0.01 gate queries — the
    * oracled `sim_sq8_recall` row — and 0.9–1.0 on the sf0.001 spec
    * corpus) while the corpus working set drops 4×,
    * where PQ trades more recall for more compression. A pure Project
    * over the scan — no Exchange, no join; the bounds ship as literal
    * arrays exactly like centroids/codebooks.
    *
    * Quantization arithmetic (mirrored verbatim by the DuckDB oracle,
    * both engines IEEE): code_j = floor((x_j − mn_j)/sc_j·255 + 0.5)
    * − 128 (sc_j = mx_j − mn_j; constant dimensions encode as −128),
    * clamped only by construction (x ∈ [mn, mx] ⇒ code ∈ [−128, 127]).
    */
  def encodeSq8(emb: DataFrame, mn: IndexedSeq[Double],
      mx: IndexedSeq[Double]): DataFrame =
    emb.select(col("vec_id"), col("e"), sq8Codes(mn, mx).as("codes"))

  /** The SQ8 quantizer as a reusable Column over `e` — shared by the
    * flat index ([[encodeSq8]]) and the IVF-composed index
    * ([[encodeIvfSq8]]) so both persist byte-identical codes.
    */
  def sq8Codes(mn: IndexedSeq[Double], mx: IndexedSeq[Double]): Column = {
    val mnArr = array(mn.map(lit): _*)
    val scArr = array(mn.indices.map(j => lit(mx(j) - mn(j))): _*)
    zip_with(col("e"),
      sequence(lit(0), lit(mn.size - 1)),
      (x, j) => {
        val m = element_at(mnArr, j.cast(IntegerType) + 1)
        val sc = element_at(scArr, j.cast(IntegerType) + 1)
        when(sc === 0d, lit(-128))
          .otherwise(floor((x - m) / sc * 255d + 0.5d) - 128L)
          .cast(ByteType)
      })
  }

  // ------------------------------------------------------------- IVF,SQ8

  /** The composed IVF,SQ8 index (FAISS `index_factory("IVF8,SQ8")`
    * practice): every vector carries its nearest-centroid cell AND its
    * byte-per-dimension SQ8 codes — one pure Project over the scan (the
    * cell argmax and the quantizer are both literal-driven map-side
    * expressions; no Exchange, no join). Persisted
    * `partitionBy(cell_id)`, a probe becomes a PartitionFilter: the
    * scan physically skips (nCells − nProbe)/nCells of the index files
    * BEFORE the byte codes are even read — coarse pruning × 4×
    * compression, the multiplicative pair that makes billion-vector
    * corpora searchable from executor memory.
    */
  def encodeIvfSq8(emb: DataFrame, cRows: IndexedSeq[(Int, Seq[Double])],
      mn: IndexedSeq[Double], mx: IndexedSeq[Double]): DataFrame =
    assignCells(emb, cRows)
      .select(col("cell_id"), col("vec_id"), sq8Codes(mn, mx).as("codes"))

  /** Driver-side coarse probe: rank cells by cosine(centroid, query)
    * and return the nProbe nearest cell_ids (ties to the lower id).
    * Query-local work over the bounded centroid set — FAISS keeps this
    * on the caller's thread for the same reason — and the ascending
    * accumulation loops are the IEEE folds of [[cosine]]'s engine tree,
    * so the probed set matches the DuckDB twin's exactly.
    */
  def probeCellIds(query: IndexedSeq[Double],
      cRows: IndexedSeq[(Int, Seq[Double])], nProbe: Int): Seq[Int] = {
    def fold(f: Int => Double, n: Int): Double = {
      var acc = 0.0; var i = 0
      while (i < n) { acc += f(i); i += 1 }
      acc
    }
    val qn = math.sqrt(fold(i => query(i) * query(i), query.size))
    cRows.map { case (id, c) =>
      val d = fold(i => c(i) * query(i), c.size)
      val cn = math.sqrt(fold(i => c(i) * c(i), c.size))
      (id, d / (cn * qn))
    }.sortBy { case (id, sim) => (-sim, id) }.take(nProbe).map(_._1)
  }

  /** IVF,SQ8 top-k: filter the persisted index to the probed cells
    * (partition-pruned at planning time — the cell list is literal),
    * dequantize, and rank by asymmetric cosine exactly like
    * [[sq8TopK]]. Plan: pruned Scan → Project → TakeOrdered; zero
    * joins, zero shuffles, and per-query IO = nProbe/nCells of an
    * already-4×-compressed index.
    */
  def ivfSq8TopK(index: DataFrame, query: IndexedSeq[Double],
      mn: IndexedSeq[Double], mx: IndexedSeq[Double],
      probed: Seq[Int], queryVecId: Long, k: Int): DataFrame = {
    val qArr = array(query.map(lit): _*)
    index.filter(col("cell_id").isin(probed: _*))
      .filter(col("vec_id") =!= queryVecId)
      .withColumn("xhat", sq8Dequantize(mn, mx))
      .select(col("vec_id"),
        (graft.functions.DotF64.dotf64(qArr, col("xhat")) /
          (sqrt(graft.functions.DotF64.dotf64(qArr, qArr)) *
            sqrt(graft.functions.DotF64.dotf64(col("xhat"), col("xhat")))))
          .as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }

  /** SQ8 asymmetric top-k: the corpus is scored from its byte codes
    * alone — each row dequantizes x̂_j = mn_j + (code_j + 128)/255·sc_j
    * and ranks by cosine(query, x̂) with the EXACT query vector (the
    * asymmetric convention: only the corpus side pays quantization
    * error). One codegen'd Project over the encoded relation →
    * TakeOrdered(k); no joins, no shuffles — the PQ/ADC plan shape at
    * 4× compression instead of 32×.
    */
  /** Dequantize a `codes` byte array back to x̂ (x̂_j = mn_j +
    * (code_j + 128)/255·sc_j) — the shared reconstruction of
    * [[sq8TopK]] and the recall-certification query; the bounds ship
    * as literal arrays like centroids/codebooks.
    */
  def sq8Dequantize(mn: IndexedSeq[Double], mx: IndexedSeq[Double]): Column = {
    val mnArr = array(mn.map(lit): _*)
    val scArr = array(mn.indices.map(j => lit(mx(j) - mn(j))): _*)
    zip_with(col("codes"),
      sequence(lit(0), lit(mn.size - 1)),
      (c, j) => element_at(mnArr, j.cast(IntegerType) + 1) +
        (c.cast(DoubleType) + 128d) / 255d *
          element_at(scArr, j.cast(IntegerType) + 1))
  }

  def sq8TopK(encoded: DataFrame, query: IndexedSeq[Double],
      mn: IndexedSeq[Double], mx: IndexedSeq[Double],
      queryVecId: Long, k: Int): DataFrame = {
    val qArr = array(query.map(lit): _*)
    val xhat = sq8Dequantize(mn, mx)
    encoded.filter(col("vec_id") =!= queryVecId)
      .withColumn("xhat", xhat)
      .select(col("vec_id"),
        (graft.functions.DotF64.dotf64(qArr, col("xhat")) /
          (sqrt(graft.functions.DotF64.dotf64(qArr, qArr)) *
            sqrt(graft.functions.DotF64.dotf64(col("xhat"), col("xhat")))))
          .as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), round(col("cosine"), 6).as("sq8_cosine_6dp"))
  }

  // ------------------------------------------------- binary quantization

  /** Per-dimension binary thresholds: the midpoint (mn_j + mx_j)/2 of
    * the SQ8 bounds — one exact IEEE op per dimension over an
    * already-trained bounded dimension, so the binary index shares the
    * SQ8 train pass instead of paying its own corpus scan. (FAISS
    * `index_factory("LSH")`-with-train / modern vector-DB "binary
    * quantization" practice: one sign bit per dimension against a
    * per-dimension center.)
    */
  def binaryThresholds(mn: IndexedSeq[Double],
      mx: IndexedSeq[Double]): IndexedSeq[Double] =
    mn.indices.map(j => (mn(j) + mx(j)) / 2d)

  /** Map-side binary encode for d = 64 corpora: dimensions 1..32 pack
    * into `lo`, 33..64 into `hi` — each an ascending-dim fold
    * `acc·2 + bit` (bit_j = e_j > thr_j), so each half is < 2³², safely
    * inside BIGINT in both engines (packing all 64 bits into one long
    * would put dimension 1 in the sign bit and make the fold
    * engine-dependent). A pure Project over the scan — no Exchange, no
    * join; the thresholds ship as literal arrays like
    * centroids/codebooks. At 100 TB this is the similarity family's
    * deepest memory lever shy of PQ: 16 bytes/row replace 64 floats
    * (16×), and candidate scoring becomes two XOR+popcount integer ops
    * — no float math at all until the rerank stage.
    */
  def encodeBinary(emb: DataFrame, thr: IndexedSeq[Double]): DataFrame = {
    require(thr.size % 2 == 0, s"encodeBinary: need even dims, got ${thr.size}")
    val half = thr.size / 2
    require(half <= 62, s"encodeBinary: half-width $half overflows BIGINT")
    def pack(offset: Int): Column = {
      val thrArr = array((0 until half).map(j => lit(thr(offset + j))): _*)
      aggregate(
        zip_with(slice(col("e"), offset + 1, half), thrArr,
          (x, t) => when(x > t, 1L).otherwise(0L)),
        lit(0L), (acc, b) => acc * 2L + b)
    }
    emb.select(col("vec_id"), pack(0).as("lo"), pack(half).as("hi"))
  }

  /** Driver-side twin of [[encodeBinary]] for query vectors: the same
    * ascending-dim fold in plain Scala (integer arithmetic — exactly
    * the engines' result). NaN dims are UNSUPPORTED and rejected
    * loudly: Scala's `>` packs a NaN component as bit 0 while Spark
    * SQL's NaN-greatest ordering would pack it as bit 1, silently
    * desyncing the query code from the persisted index codes (r19
    * ADVICE).
    */
  def binaryCode(v: IndexedSeq[Double], thr: IndexedSeq[Double]): (Long, Long) = {
    require(!v.exists(_.isNaN),
      "binaryCode: NaN embedding dims are unsupported (Scala > vs Spark " +
        "SQL NaN ordering would desync query and index codes)")
    val half = thr.size / 2
    def pack(offset: Int): Long = {
      var acc = 0L; var j = 0
      while (j < half) {
        acc = acc * 2L + (if (v(offset + j) > thr(offset + j)) 1L else 0L)
        j += 1
      }
      acc
    }
    (pack(0), pack(half))
  }

  /** Binary retrieve-and-refine top-k: stage 1 ranks the PERSISTED
    * 16-byte/row binary index by Hamming distance to the query's code
    * (two XOR+popcount per row — integer-only, the cheapest candidate
    * generator in the family), keeps the nCand best (ties to the lower
    * vec_id), and stage 2 re-scores ONLY those candidates with exact
    * full-precision cosine against the raw vectors (the broadcast side
    * is the nCand-row candidate set, so the corpus never shuffles).
    * Plan: Scan(codes) → Project → TakeOrdered(nCand), then a
    * broadcast-hash join against the raw table → TakeOrdered(k). The
    * standard binary-quantization + rescoring pipeline (Qdrant/Weaviate
    * BQ practice, FAISS IndexBinaryFlat + refine).
    *
    * Recall is a corpus property, measured, not assumed: the oracled
    * `sim_binary_recall` gate row hash-pins the per-query top-10
    * overlap vs exact brute force (0.4–1.0, mean 0.675 on the
    * ISOTROPIC synthetic corpus — the adversarial case for sign bits,
    * which capture anisotropy that random vectors lack; trained
    * embedding models sit far higher in practice). The rerank stage
    * itself is LOSSLESS (spec-pinned): all loss is the Hamming cut.
    */
  def binaryTopK(codes: DataFrame, emb: DataFrame, query: IndexedSeq[Double],
      thr: IndexedSeq[Double], queryVecId: Long, nCand: Int, k: Int): DataFrame = {
    val (qlo, qhi) = binaryCode(query, thr)
    val cand = codes.filter(col("vec_id") =!= queryVecId)
      .select(col("vec_id"),
        (bit_count(col("lo").bitwiseXOR(lit(qlo))) +
          bit_count(col("hi").bitwiseXOR(lit(qhi)))).cast(LongType).as("hamming"))
      .orderBy(col("hamming").asc, col("vec_id"))
      .limit(nCand)
    val qArr = array(query.map(lit): _*)
    emb.join(broadcast(cand), "vec_id")
      .select(col("vec_id"), col("hamming"),
        (dot(qArr, col("e")) / (sqrt(dot(qArr, qArr)) * norm(col("e"))))
          .as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), col("hamming"),
        round(col("cosine"), 6).as("bq_cosine_6dp"))
  }

  // ------------------------------------------------ matryoshka (prefix-dim)

  /** The matryoshka prefix index: only the first dPrefix dimensions of
    * each vector, persisted as their own column (Kusupati et al. 2022,
    * arXiv:2205.13147 — MRL embeddings are trained so prefixes are
    * usable sub-embeddings; OpenAI text-embedding-3 "dimensions"
    * practice). Materializing the prefix as its own stored column is
    * what turns the truncation into an IO lever: a stage-1 scan reads
    * dPrefix/d of the float bytes — at 100 TB and d' = d/4, three
    * quarters of the ANN scan IO disappears before any math runs.
    * (Cosine is scale-invariant, so the conventional renormalization
    * of truncated MRL vectors cannot change stage-1's ranking and is
    * deliberately omitted.)
    */
  def encodePrefix(emb: DataFrame, dPrefix: Int): DataFrame =
    emb.select(col("vec_id"), slice(col("e"), 1, dPrefix).as("ep"))

  /** Matryoshka retrieve-and-refine top-k: stage 1 ranks the persisted
    * prefix index by dPrefix-dim cosine (a quarter-width dot product
    * per row), keeps nCand candidates, and stage 2 re-scores only
    * those with exact full-dimension cosine — the same
    * broadcast-candidates shape as [[binaryTopK]], so the raw corpus
    * never shuffles. Output carries BOTH scores: the stage-1 prefix
    * cosine (what the index saw) and the exact cosine (what the user
    * gets).
    *
    * Recall is measured, not assumed: the oracled
    * `sim_matryoshka_recall` row hash-pins per-query overlap vs exact
    * (0.4–0.6 on the isotropic synthetic corpus, where a d/4 prefix
    * carries exactly 1/4 of the energy by construction — MRL-TRAINED
    * embeddings front-load information into the prefix, which is the
    * regime this index is built for). The rerank is lossless
    * (spec-pinned); all loss is the prefix candidate cut.
    */
  def matryoshkaTopK(prefixIdx: DataFrame, emb: DataFrame,
      query: IndexedSeq[Double], dPrefix: Int, queryVecId: Long,
      nCand: Int, k: Int): DataFrame = {
    val qp = array(query.take(dPrefix).map(lit): _*)
    val cand = prefixIdx.filter(col("vec_id") =!= queryVecId)
      .select(col("vec_id"),
        (dot(qp, col("ep")) / (sqrt(dot(qp, qp)) * norm(col("ep"))))
          .as("pcos"))
      .orderBy(col("pcos").desc, col("vec_id"))
      .limit(nCand)
    val qArr = array(query.map(lit): _*)
    emb.join(broadcast(cand), "vec_id")
      .select(col("vec_id"), col("pcos"),
        (dot(qArr, col("e")) / (sqrt(dot(qArr, qArr)) * norm(col("e"))))
          .as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"),
        round(col("pcos"), 6).as("prefix_cosine_6dp"),
        round(col("cosine"), 6).as("mrl_cosine_6dp"))
  }

  /** IVF query: probe the nProbe cells nearest to the query vector and
    * rank candidates only within them.
    */
  def ivfTopK(
      spark: SparkSession,
      assigned: DataFrame,
      cents: DataFrame,
      queryVecId: Long,
      k: Int,
      nProbe: Int): DataFrame = {
    val q = assigned
      .filter(col("vec_id") === queryVecId)
      .select(col("e").as("qe"))
    val probeCells = cents
      .crossJoin(broadcast(q))
      .select(col("cell_id"), cosine(col("centroid"), col("qe")).as("sim"))
      .orderBy(col("sim").desc, col("cell_id"))
      .limit(nProbe)
      .select(col("cell_id"))
    assigned
      .filter(col("vec_id") =!= queryVecId)
      .join(broadcast(probeCells), "cell_id")
      .crossJoin(broadcast(q))
      .select(col("vec_id"), cosine(col("e"), col("qe")).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }

  // ------------------------------------------------------- k-means (Lloyd)

  /** One Lloyd update step for spherical k-means over the current
    * centroid set: assign every vector map-side ([[assignCells]] —
    * cosine argmax against unit-normalized centroids), then replace
    * each non-empty cell's centroid with the per-dimension mean of its
    * members; empty cells keep their previous centroid. Because
    * [[assignCells]] re-normalizes whatever it is given, the raw mean
    * is the OPTIMAL update for the spherical objective
    * Σᵢ max_c eᵢ·ĉ (for a fixed assignment the unit vector maximizing
    * Σ eᵢ·ĉ is the normalized cell sum), so the objective is
    * nondecreasing across iterations — the Lloyd guarantee.
    *
    * Scale shape per iteration: a pure Project over the scan (no join)
    * + one exchange keyed (cell_id, dim) whose payload is a single
    * double — partial-aggregated map-side, so the shuffle carries at
    * most k×dim rows per map partition regardless of corpus size. The
    * k×dim result is a bounded design dimension, collected like
    * [[centroidArrays]]. Means ride the fixed-point [[graft.Agg.dsum]]
    * path so training is deterministic across partitionings and runs.
    */
  def kmeansStep(emb: DataFrame,
      cRows: IndexedSeq[(Int, Seq[Double])]): IndexedSeq[(Int, Seq[Double])] = {
    val updated = assignCells(emb, cRows)
      .select(col("cell_id"), posexplode(col("e")).as(Seq("dim", "x")))
      .groupBy(col("cell_id"), col("dim"))
      .agg(count(lit(1)).as("n"), graft.Agg.dsum(col("x"), 6).as("sx"))
      .select(col("cell_id"), col("dim"), (col("sx") / col("n")).as("c"))
      .collect()
      .groupBy(_.getInt(0))
      .map { case (cell, rows) =>
        cell -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
      }
    cRows.map { case (cell, old) => (cell, updated.getOrElse(cell, old)) }
  }

  /** Train k centroids: deterministic Lehmer-strided init
    * ([[centroids]]) refined by `iters` Lloyd steps. Centroid quality
    * directly sets IVF probe recall; the strided pick stays the
    * oracle-replicable default while this is the offline refinement a
    * deployment would run once per index build (FAISS `train()`
    * practice). Driver cost: `iters` bounded collects of k×dim rows.
    */
  def kmeansTrain(emb: DataFrame, nCells: Int,
      iters: Int): IndexedSeq[(Int, Seq[Double])] = {
    var c = centroidArrays(centroids(emb, nCells))
    var i = 0
    while (i < iters) { c = kmeansStep(emb, c); i += 1 }
    c
  }

  /** Dominant principal direction of the (uncentered) embedding cloud by
    * `iters` rounds of fixed-point power iteration — the spectral member
    * of the iterative fixed-point family next to label-propagation CC and
    * PageRank (ref: cudf's corpus-analytics role; the algorithm is the
    * classic v ← Xᵀ(Xv) normalized, von Mises iteration). A training-data
    * pipeline uses the top PC for embedding whitening diagnostics
    * (anisotropy checks) without an external linear-algebra system.
    *
    * All arithmetic is 64-bit integer so the result is bit-identical
    * across engines and partitionings:
    *   - xqᵢⱼ = floor(xᵢⱼ·10⁶); v starts at (10⁶, …, 10⁶);
    *   - per row, dotᵢ = Σⱼ xqᵢⱼ·vⱼ, then dsᵢ = dotᵢ div 10⁷ (one fixed
    *     down-shift keeps the next product long-safe);
    *   - uⱼ = Σᵢ xqᵢⱼ·dsᵢ, renormalized to micro-units by the L∞ norm
    *     (v = u div greatest(max|u| div 10⁶, 1)) — L∞ instead of L2
    *     avoids sqrt, which integer arithmetic cannot replicate.
    * Bounds (d = dims, B = max|x|, n = rows): |v| ≤ 2·10⁶, |dot| ≤
    * d·B·2·10¹², |ds| ≤ d·B·2·10⁵, |u| ≤ n·d·B²·2·10¹¹ — long-safe to
    * n ≈ 3·10⁵ at d = 64, B = 1; for larger corpora widen the ds shift.
    *
    * Scale shape: each iteration streams the corpus once — v rides a
    * broadcast 1-row cross join, the dot/ds products are map-side, and
    * the only exchange ships d-row partial sums (map-side combine on the
    * d-group groupBy). The sum order never matters (integer adds
    * commute), so the result is partitioning-independent. The L∞ max
    * folds into the SAME 1-row aggregate that collects the v array, so
    * each iteration references its predecessor exactly once — the
    * lineage is linear (iters + 1 corpus scans), never the 2^iters
    * blowup a separate max subtree would compound to.
    *
    * Output: one row per dimension, `(dim BIGINT, v_micro BIGINT)` with
    * max |v_micro| ≈ 10⁶ — the unnormalized direction (sign follows the
    * all-ones start vector deterministically).
    */
  def pcaPowerTopComponent(emb: DataFrame, iters: Int): DataFrame = {
    val xq = quantized(emb)
    val (d0, n0, mx) = xqStats(xq, "pcaPowerTopComponent")
    requireEnvelope(d0, n0, mx, "pcaPowerTopComponent")
    powerIterate(xq, d0, iters)
  }

  /** floor(x·10⁶) quantization of the embedding column. */
  private def quantized(emb: DataFrame): DataFrame = emb.select(
    expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000D) AS BIGINT))")
      .as("xq"))

  /** One-row scan: (dims, rows, max|xq|) — the same scan that sizes the
    * start vector, so the envelope guard costs no extra corpus pass.
    */
  private def xqStats(xq: DataFrame, who: String): (Int, Long, Long) = {
    val st = xq.agg(
      min(size(col("xq"))).as("d"),
      count(lit(1)).as("n"),
      greatest(max(expr(
        "aggregate(xq, CAST(0 AS BIGINT), (a, x) -> greatest(a, abs(x)))")),
        lit(1L)).as("mx")).head()
    require(st.getLong(1) > 0, s"$who: empty embedding input")
    (st.getInt(0), st.getLong(1), st.getLong(2))
  }

  /** Loud failure past the long-safe fixed-point envelope: beyond it
    * Spark's long sums wrap SILENTLY while DuckDB widens to HUGEINT, so
    * the engines would diverge with a plausible-looking direction.
    * Bounds from the doc comment with mx = max|xq| and |v| ≤ 2·10⁶:
    * |dot| ≤ d·mx·2·10⁶ and |u| ≤ n·d·mx²/5 — both must stay < 2⁶³.
    */
  private def requireEnvelope(d0: Int, n0: Long, mx: Long, who: String): Unit = {
    val lmax = BigInt(Long.MaxValue)
    require(BigInt(d0) * mx * 2000000 < lmax && BigInt(n0) * d0 * mx * mx / 5 < lmax,
      s"$who: rows=$n0 dims=$d0 max|xq|=$mx exceeds the " +
        "long-safe fixed-point envelope (|u| bound n*d*mx^2/5 or |dot| " +
        "bound d*mx*2e6 would overflow 2^63) — widen the ds down-shift")
  }

  /** The von Mises loop proper over a pre-quantized, envelope-checked
    * `xq` frame (see [[pcaPowerTopComponent]] for algorithm and bounds).
    */
  private def powerIterate(xq: DataFrame, d0: Int, iters: Int): DataFrame = {
    // Lineage cut, same as PageRank's edge frame (GraphOps) and Dedup's
    // label loop: the quantized corpus is materialized ONCE and each
    // iteration's 1-row v is checkpointed, so iteration i's plan is one
    // step deep instead of embedding all i-1 predecessors (the analyzer
    // re-resolved the whole compound tree per step — measurable driver
    // overhead even though execution was already linear). Values are
    // unchanged: checkpointing only truncates lineage.
    val xqc = xq.localCheckpoint(false)
    // r21 iteration shape. Two changes, values bit-identical throughout:
    //   1. the projection `ds` is the fused codegen dot (DotI64 — the
    //      same long multiply-add the interpreted zip_with fold
    //      performed) and the mat-vec step u = Σ xq·ds is ONE
    //      element-wise vector aggregate (VecDotSumAgg): each task
    //      folds its rows into a d-long buffer, partials merge
    //      element-wise — the previous shape exploded n·d (dim, x)
    //      rows through Generate + HashAggregate + a d-row exchange
    //      per iteration (long addition is order-free, so the sums are
    //      exactly the grouped sums);
    //   2. the direction vector v lives on the DRIVER between
    //      iterations — a bounded d-long dimension (the class
    //      pcaPowerTwoComponents already collects for its deflation
    //      literals), injected as literals into the next scan. One
    //      aggregate job per iteration replaces the
    //      crossJoin(broadcast(v)) + lazy-checkpoint chain, whose
    //      per-iteration broadcast + checkpoint materialization — not
    //      the 2000-row arithmetic — dominated the wall at bench SF.
    //      The normalization arithmetic (m = max(|u|) ∨ 1;
    //      vⱼ = uⱼ div (m div 10⁶ ∨ 1)) is the same exact long math,
    //      now in plain Scala.
    val vecDotSum = org.apache.spark.sql.functions.udaf(new graft.agg.VecDotSumAgg)
    var v: Array[Long] = Array.fill(d0)(1000000L)
    for (_ <- 1 to iters) {
      // one array Literal, not a d-element CreateArray — a d-ary
      // expression tree costs analyzer/codegen time on every iteration
      val vLit = typedlit[Seq[Long]](v.toIndexedSeq)
      val u = xqc
        .select(col("xq"),
          graft.functions.DotI64.doti64(col("xq"), vLit).as("raw"))
        .select(col("xq"), expr("raw div 10000000").as("ds"))
        .agg(vecDotSum(col("xq"), col("ds")).as("uarr"))
        .head().getSeq[Long](0).toArray
      val m = math.max(u.iterator.map(math.abs).max, 1L)
      val den = math.max(m / 1000000L, 1L)
      v = u.map(_ / den)
    }
    val spark = xq.sparkSession
    import spark.implicits._
    v.toIndexedSeq.zipWithIndex
      .map { case (x, i) => (i.toLong, x) }.toDF("dim", "v_micro")
  }

  /** Top TWO principal directions by deflation: v₁ from the power loop,
    * then every row is projected out of v₁ in fixed point —
    * c = (x·v₁) div 10⁶, x₂ⱼ = xⱼ − (c·v₁ⱼ) div (‖v₁‖² div 10⁶) —
    * and the SAME loop runs on the residual cloud for v₂. v₁ is a
    * bounded dimension (d rows) collected once driver-side and shipped
    * as literals, so deflation is a pure map over the corpus scan; the
    * residual frame re-checks its own envelope (its magnitudes can
    * exceed the input's). Deflation in exact integer arithmetic is what
    * keeps v₂ hash-identical to the DuckDB twin's 10-iteration unrolled
    * CTE. Output: (dim, v1_micro, v2_micro).
    *
    * The integer division makes the projection approximate (≤ 1 unit
    * per coordinate), so v₂ is the dominant direction of an
    * almost-deflated cloud — the standard trade the fixed-point policy
    * makes: bit-exact reproducibility over the last float digit.
    */
  def pcaPowerTwoComponents(emb: DataFrame, iters: Int): DataFrame = {
    val xq = quantized(emb)
    val (d0, n0, mx) = xqStats(xq, "pcaPowerTwoComponents")
    requireEnvelope(d0, n0, mx, "pcaPowerTwoComponents")
    // deflation product bound: |c·v₁ⱼ| ≤ (d·mx·2)·2·10⁶
    require(BigInt(d0) * mx * 4000000 < BigInt(Long.MaxValue),
      s"pcaPowerTwoComponents: dims=$d0 max|xq|=$mx overflows the " +
        "deflation product c*v1 — widen the projection down-shift")
    val v1 = powerIterate(xq, d0, iters)
      .orderBy(col("dim")).collect().map(_.getLong(1))
    val n1sq = v1.map(x => x * x).sum // ≤ d·(2e6)² ≈ 2.6e14, long-safe
    val den = math.max(n1sq / 1000000L, 1L)
    val x2 = xq
      .withColumn("v1a", array(v1.map(lit(_)).toIndexedSeq: _*))
      .withColumn("c",
        graft.functions.DotI64.doti64(col("xq"), col("v1a")))
      .withColumn("c", expr("c div 1000000"))
      .select(expr(
        s"transform(sequence(1, size(xq)), j -> xq[j - 1] - (c * v1a[j - 1]) div ${den}L)")
        .as("xq"))
    val (d2, n2, mx2) = xqStats(x2, "pcaPowerTwoComponents(residual)")
    requireEnvelope(d2, n2, mx2, "pcaPowerTwoComponents(residual)")
    val spark = emb.sparkSession
    import spark.implicits._
    val v1df = v1.toIndexedSeq.zipWithIndex
      .map { case (x, i) => (i.toLong, x) }.toDF("dim", "v1_micro")
    v1df.join(
      powerIterate(x2, d2, iters).withColumnRenamed("v_micro", "v2_micro"),
      "dim")
  }

  /** Spherical k-means objective Σᵢ max_c eᵢ·ĉ (higher is better),
    * fixed-point-summed for cross-run determinism. The monotonicity
    * witness for [[kmeansStep]]'s Lloyd property.
    */
  def kmeansObjective(emb: DataFrame,
      cRows: IndexedSeq[(Int, Seq[Double])]): Double = {
    val unitCents = array(cRows.map { r =>
      val n = math.sqrt(r._2.map(x => x * x).sum)
      array(r._2.map(x => lit(if (n == 0d) 0d else x / n)): _*)
    }: _*)
    emb
      .select(col("vec_id"), toDouble(col("embedding")).as("e"))
      .select(array_max(transform(unitCents, cu => dot(col("e"), cu))).as("m"))
      .agg(graft.Agg.dsum(col("m"), 6).as("j"))
      .head().getDouble(0)
  }
}
