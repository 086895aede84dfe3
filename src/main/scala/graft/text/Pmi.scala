package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** PMI phrase mining — the word2phrase/AutoPhrase collocation signal:
  * a bigram whose observed rate far exceeds the independence
  * prediction of its parts ("new york", "machine learning") is a
  * phrase candidate worth gluing into one token before BPE/vocab
  * training; a frequent-but-unsurprising bigram ("of the") is not.
  * PMI(a,b) = ln( p(ab) / (p(a)·p(b)) ) with p from the corpus's own
  * unigram/bigram counts.
  *
  * Scale shape: the token-array frame is computed ONCE and persisted
  * (two narrow explodes read it — unigram and bigram streams), each
  * count is a partial-aggregated hash shuffle (heavy hitters collapse
  * map-side), the two grand totals are 1-row broadcasts, and the
  * unigram vocabulary joins back onto the (min-count-gated) bigram
  * frame — AQE broadcasts it when it fits, which a natural-language
  * vocabulary does. No pairwise work, no windows, no driver data.
  *
  * Determinism: counts are exact longs; the single ln per surviving
  * bigram is evaluated on the identical double expression tree the
  * oracle uses, and rounded to 6 dp — the established cross-engine
  * libm discipline of UnigramLm/Dsir.
  */
object Pmi {

  /** Phrase candidates: (bigram, n_pair, n_a, n_b, pmi), bigrams with
    * n_pair >= minCount. pmi = round(ln((n_pair/Nb) / ((n_a/Nu)·(n_b/Nu))), 6).
    */
  def phrases(df: DataFrame, textCol: String, minCount: Long): DataFrame = {
    require(minCount >= 1, "need minCount >= 1")
    val toks = graft.CacheRegistry.register(
      graft.ops.Parallelism.widen(df)
        .select(TextAnalysis.tokens(col(textCol)).as("toks"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val uni = toks.select(explode(col("toks")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    // adjacent pairs via the bound-array transform (Dedup.shingleHashes
    // trick): element_at reads hit the lambda-bound array, not a
    // re-evaluated tokenizer
    val pairs = toks.select(explode(element_at(
        transform(array(col("toks")), t =>
          transform(
            when(size(t) >= 2, sequence(lit(1), size(t) - 1))
              .otherwise(array().cast(ArrayType(IntegerType))),
            i => struct(element_at(t, i).as("a"), element_at(t, i + 1).as("b")))),
        1)).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
    val nu = uni.agg(sum(col("c")).as("nu"))
    val nb = toks.select(
        greatest(size(col("toks")) - 1, lit(0)).cast(LongType).as("k"))
      .agg(sum(col("k")).as("nb"))
    val ua = uni.select(col("tok").as("a"), col("c").as("n_a"))
    val ub = uni.select(col("tok").as("b"), col("c").as("n_b"))
    pairs
      .join(ua, Seq("a")).join(ub, Seq("b"))
      .crossJoin(broadcast(nu)).crossJoin(broadcast(nb))
      .select(
        concat_ws(" ", col("a"), col("b")).as("bigram"),
        col("c_ab").as("n_pair"), col("n_a"), col("n_b"),
        round(log(
          (col("c_ab").cast(DoubleType) / col("nb").cast(DoubleType)) /
            ((col("n_a").cast(DoubleType) / col("nu").cast(DoubleType)) *
             (col("n_b").cast(DoubleType) / col("nu").cast(DoubleType)))), 6)
          .as("pmi"))
  }

  /** word2phrase APPLY step: rewrite each document's token stream,
    * gluing adjacent (a, b) occurrences from `phrasePairs` into one
    * "a_b" token, GREEDY left-to-right (after "new york" glues,
    * "york city" cannot — york is consumed). Greedy-ness has a closed
    * form that needs no sequential fold: within each maximal run of
    * consecutive matching positions, exactly the 1st, 3rd, 5th…
    * positions glue — the gaps-and-islands decomposition — so the
    * whole rewrite is window functions over (doc, position), fully
    * declarative and oracle-replayable.
    *
    * Scale shape: positions explode once; the phrase table joins in
    * (broadcast when it fits — phrase vocabularies do); the island
    * windows partition by DOCUMENT (bounded groups, the ParagraphDedup
    * discipline); the rebuild is one ordered per-doc aggregation.
    * Output: (idCol, text_glued, n_glued).
    */
  def gluePhrases(df: DataFrame, idCol: String, textCol: String,
      phrasePairs: DataFrame): DataFrame = {
    require(Set("a", "b").subsetOf(phrasePairs.columns.toSet),
      "phrasePairs needs (a, b) token columns")
    val w = org.apache.spark.sql.expressions.Window
    val base = graft.CacheRegistry.register(
      df.select(col(idCol).as("id"),
          TextAnalysis.tokens(col(textCol)).as("toks"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val toks = base.select(col("id"),
      posexplode(col("toks")).as(Seq("p", "tok")))
    // adjacent pairs as ONE narrow map over the bound array (no
    // positional self-join of the token stream)
    val pairs = base.select(col("id"), explode(element_at(
        transform(array(col("toks")), t =>
          transform(
            when(size(t) >= 2, sequence(lit(1), size(t) - 1))
              .otherwise(array().cast(ArrayType(IntegerType))),
            i => struct((i - 1).as("p"),
              element_at(t, i).as("a"), element_at(t, i + 1).as("b")))),
        1)).as("pr"))
      .select(col("id"), col("pr.p").as("p"), col("pr.a").as("a"),
        col("pr.b").as("b"))
      // distinct: a duplicated (a, b) row in the caller's phrase table
      // would double-match one position, corrupt the islands parity
      // and emit the glued token twice
      .join(phrasePairs.select(col("a"), col("b")).distinct()
        .withColumn("__m", lit(1)), Seq("a", "b"), "left")
    // islands of consecutive matches: grp is constant within a run;
    // the run's 1st, 3rd, … positions glue
    val matched = pairs.filter(col("__m").isNotNull)
      .withColumn("grp", col("p") - row_number().over(
        w.partitionBy(col("id")).orderBy(col("p"))))
      .withColumn("rn", row_number().over(
        w.partitionBy(col("id"), col("grp")).orderBy(col("p"))))
      .filter(col("rn") % 2 === 1)
      .select(col("id"), col("p"), concat(col("a"), lit("_"), col("b")).as("glued"))
    val out = toks
      .join(matched.select(col("id"), col("p"), col("glued")), Seq("id", "p"), "left")
      .join(matched.select(col("id"), (col("p") + 1).as("p"),
        lit(1).as("__consumed")), Seq("id", "p"), "left")
      .filter(col("__consumed").isNull)
      .groupBy(col("id"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("p"),
            coalesce(col("glued"), col("tok")).as("t")))),
          s => s.getField("t")), " ").as("text_glued"),
        sum(when(col("glued").isNotNull, 1L).otherwise(0L)).as("n_glued"))
    df.select(col(idCol).as("id"))
      .join(out, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("text_glued"), lit("")).as("text_glued"),
        coalesce(col("n_glued"), lit(0L)).as("n_glued"))
  }
}
