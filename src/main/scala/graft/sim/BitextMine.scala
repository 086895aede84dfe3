package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Margin-based bitext mining (Artetxe & Schwenk, ACL'19 — the
  * LASER/CCMatrix recipe): align two embedding collections (source
  * sentences X, target sentences Y) by scoring candidate pairs with
  * the RATIO MARGIN — cosine normalized by the mean cosine of each
  * side's k nearest neighbors — instead of raw cosine. Raw cosine
  * mis-ranks under hubness (some vectors are near everything); the
  * margin deflates hub scores because a hub's own k-NN average is
  * high. This is the standard operator for mining parallel corpora
  * for translation training data.
  *
  *   margin(x, y) = cos(x, y) / ((avgK(x→Y) + avgK(y→X)) / 2)
  *
  * [[marginFromKnn]] is the real operator: pure bounded-per-key
  * algebra over PRE-BUILT forward/backward k-NN edge lists — at 100 TB
  * those come from the ANN stack ([[Ann.ivfTopK]]-class probes or
  * [[KnnGraph]]), never from a cross join; every aggregate here
  * groups by query id over ≤k rows and the join keys are node ids.
  * [[mine]] is the exact-brute convenience for oracle-sized inputs.
  *
  * Numeric discipline: the k-NN `sim` values arrive 6dp-rounded, so
  * the per-side averages sum DECIMAL(18,6) exactly (partition-order
  * independent) and convert to double once; the margin divides two
  * deterministic doubles. Ties order by (margin desc, tgt asc) — a
  * total order.
  */
object BitextMine {

  /** Accept threshold on the final margin. A margin of 1 means the
    * pair's cosine only matches the average of the two sides' own
    * neighborhoods — indistinguishable from hub noise — so the
    * informative cut sits strictly above 1. (Note a forward-best pair
    * can still score BELOW 1 when the target is a hub whose own
    * neighbor average exceeds the pair's cosine — that deflation is
    * the point of the margin.)
    */
  val AcceptMargin = 1.05

  /** Margin-score candidate pairs given forward and backward k-NN
    * edge lists.
    *
    * @param fwd (query_id, neighbor_id, sim) — for each x ∈ X, its
    *            top-k neighbors in Y; sim = cosine rounded 6dp
    * @param bwd (query_id, neighbor_id, sim) — for each y ∈ Y, its
    *            top-k neighbors in X
    * @return one row per source x that has any candidate: its best
    *         margin pair (src, tgt, sim, margin, accepted)
    */
  def marginFromKnn(fwd: DataFrame, bwd: DataFrame): DataFrame = {
    def avgK(knn: DataFrame, out: String) = knn
      .groupBy(col("query_id"))
      .agg((sum(col("sim").cast(DecimalType(18, 6))).cast(DoubleType) /
        count(lit(1))).as(out))
    val avgF = avgK(fwd, "avg_f") // one row per x, ≤k-row groups
    val avgB = avgK(bwd, "avg_b") // one row per y
    // candidate pool: union of both directions' edges. sim(x,y) is
    // direction-symmetric bit-for-bit (dot products commute termwise,
    // double * is commutative), so distinct collapses mirrored pairs.
    val cand = fwd.select(col("query_id").as("src"),
        col("neighbor_id").as("tgt"), col("sim"))
      .union(bwd.select(col("neighbor_id").as("src"),
        col("query_id").as("tgt"), col("sim")))
      .distinct()
    val w = Window.partitionBy(col("src"))
      .orderBy(col("margin").desc, col("tgt").asc)
    cand
      .join(avgF.select(col("query_id").as("src"), col("avg_f")), Seq("src"))
      .join(avgB.select(col("query_id").as("tgt"), col("avg_b")), Seq("tgt"))
      .withColumn("denom", (col("avg_f") + col("avg_b")) / 2.0d)
      .filter(col("denom") > 0.0d)
      .withColumn("margin", col("sim") / col("denom"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("src"), col("tgt"), col("sim"),
        round(col("margin"), 6).as("margin"),
        (col("margin") >= AcceptMargin).as("accepted"))
  }

  /** Exact-brute mining for small X/Y (both sides broadcastable):
    * forward and backward k-NN via [[Ann.bruteForceTopK]], then the
    * margin algebra. At corpus scale, build the k-NN lists with the
    * ANN stack and call [[marginFromKnn]] directly.
    */
  def mine(xs: DataFrame, ys: DataFrame, idCol: String, vecCol: String,
      k: Int = 4): DataFrame = {
    // excludeSelfId = false: X and Y are DIFFERENT collections with
    // independent id spaces — a shared id value is a coincidence, not
    // a self-match, and filtering it would make x₇'s true partner y₇
    // unreachable
    val fwd = Ann.bruteForceTopK(ys, xs, idCol, vecCol, k,
      excludeSelfId = false)
    val bwd = Ann.bruteForceTopK(xs, ys, idCol, vecCol, k,
      excludeSelfId = false)
    marginFromKnn(fwd.select("query_id", "neighbor_id", "sim"),
      bwd.select("query_id", "neighbor_id", "sim"))
  }
}

/** Embedding-space benchmark decontamination — the semantic
  * complement of graft.text.Decontaminate's n-gram scrub (modern
  * data cards run BOTH: verbatim overlap n-grams miss, paraphrased
  * eval leakage embeddings catch). Every corpus vector is scored by
  * its maximum cosine against the eval set; rows at or above `tau`
  * are contamination candidates.
  *
  * Scale shape: the eval set is eval-suite-bounded (thousands, not
  * corpus-sized), so it BROADCASTS and the corpus makes exactly one
  * narrow pass — a broadcast join plus a per-corpus-row max
  * aggregate over |eval| candidates, no shuffle of the corpus beyond
  * the aggregate's partial combine, no self-join. The same
  * driver-held-model discipline as Decontaminate's literal gram set.
  */
object SemanticDecontam {

  /** Per-corpus-row verdict: (idCol, max_sim, nearest eval id,
    * contaminated). Ties on sim break by eval id DESC — the struct
    * max's natural lexicographic order, which works for ANY orderable
    * id type (an arithmetic negation trick would break string ids and
    * overflow Long.MinValue).
    */
  def report(corpus: DataFrame, evalSet: DataFrame, idCol: String,
      vecCol: String, tau: Double): DataFrame = {
    import org.apache.spark.sql.functions._
    val ev = evalSet.select(col(idCol).as("eval_id"),
      col(vecCol).as("evec"), Ann.norm(col(vecCol)).as("en"))
    val c = graft.ops.Parallelism.widen(corpus)
      .select(col(idCol).as("id"), col(vecCol).as("cvec"),
        Ann.norm(col(vecCol)).as("cn"))
    c.crossJoin(broadcast(ev))
      .select(col("id"),
        Ann.cosinePre(Ann.dot(col("cvec"), col("evec")),
          col("cn"), col("en")).as("sim"),
        col("eval_id"))
      .groupBy(col("id"))
      .agg(max(struct(col("sim"), col("eval_id"))).as("best"))
      .select(col("id"),
        round(col("best.sim"), 6).as("max_sim"),
        col("best.eval_id").as("nearest_eval"),
        (col("best.sim") >= tau).as("contaminated"))
  }
}
