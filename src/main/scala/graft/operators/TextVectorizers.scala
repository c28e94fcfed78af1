package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis.{hash60, tokens}

/** Hashing + smart text vectorization (reference
  * OPCollectionHashingVectorizer.scala:59-145, OpHashingTF.scala:50,
  * RichVectorFeature.scala:57 (IDF), SmartTextVectorizer.scala:62-135).
  *
  * The hash family is md5-derived (hash60 % dims) instead of MurMur3 so
  * the differential oracle replays buckets bit-identically; term
  * frequencies are produced SPARSE — (id, bucket, cnt) rows — which is
  * the scale-correct form (explode + one groupBy shuffle keyed on
  * (id, bucket); no per-row O(dims) work, no dense arrays until a model
  * actually needs them). `tfVector` assembles the dense form on demand.
  *
  * SmartText: fit computes per-column TextStats (distinct count, length
  * moments) in ONE aggregation pass, then dispatches each column to
  * pivot (low cardinality), hash (free text), or ignore — the decision
  * table the reference's SmartTextVectorizer applies before vectorizing.
  */
object TextVectorizers {

  /** Sparse hashed term frequency: one row per (id, bucket) with the
    * term count; bucket = hash60(token) % dims. */
  def hashedTf(df: DataFrame, id: Column, text: Column, dims: Int): DataFrame =
    df.select(id.as("id"), explode(tokens(text)).as("tok"))
      .where(length(col("tok")) > 0)
      .select(col("id"), pmod(hash60(col("tok")), lit(dims)).cast("int").as("bucket"))
      .groupBy(col("id"), col("bucket")).agg(count(lit(1)).as("cnt"))

  /** Hash-space strategy for multi-column hashing (reference
    * OPCollectionHashingVectorizer.scala:101-145 HashSpaceStrategy):
    * one bucket space shared by every input vs a private sub-space per
    * input. Auto picks Shared once the concatenated width would exceed
    * `maxDims` (the reference's numHashes*numInputs > maxNumOfFeatures
    * rule). */
  sealed trait HashSpace
  object HashSpace {
    case object Shared extends HashSpace
    case object Separate extends HashSpace
    case class Auto(maxDims: Int = 1024) extends HashSpace
  }

  /** Multi-column sparse hashed tf with the shared-vs-separate switch
    * (reference OPCollectionHashingVectorizer.scala:185-265):
    *
    *  - Shared: every column's tokens land in ONE `dims`-wide space;
    *    tokens are prefixed with their column name (the reference's
    *    prependFeatureName) so equal tokens from different columns stay
    *    distinguishable. Output buckets span [0, dims).
    *  - Separate: column i owns buckets [i*dims, (i+1)*dims) — the
    *    sparse equivalent of concatenating per-column vectors.
    *
    * Either way the plan is one union of row-local projections feeding
    * ONE groupBy((id, bucket)) shuffle — cost identical to single-column
    * [[hashedTf]] at any scale. */
  def hashedTfMulti(df: DataFrame, id: Column, cols: Seq[String], dims: Int,
                    strategy: HashSpace = HashSpace.Auto()): DataFrame = {
    require(cols.nonEmpty, "need at least one input column")
    val shared = strategy match {
      case HashSpace.Shared => true
      case HashSpace.Separate => false
      case HashSpace.Auto(maxDims) => dims.toLong * cols.length > maxDims
    }
    val perCol = cols.zipWithIndex.map { case (c, i) =>
      val toks = df.select(id.as("id"), explode(tokens(col(c))).as("tok"))
        .where(length(col("tok")) > 0)
      if (shared)
        toks.select(col("id"),
          pmod(hash60(concat(lit(c), lit(":"), col("tok"))), lit(dims))
            .cast("int").as("bucket"))
      else
        toks.select(col("id"),
          (lit(i * dims) + pmod(hash60(col("tok")), lit(dims)))
            .cast("int").as("bucket"))
    }
    perCol.reduce(_ unionByName _)
      .groupBy(col("id"), col("bucket")).agg(count(lit(1)).as("cnt"))
  }

  /** IDF table over a sparse tf frame: idf(bucket) = ln((m+1)/(df+1)),
    * the spark.ml IDF formula (m = total docs). */
  def idfTable(tf: DataFrame, numDocs: Long): DataFrame =
    tf.groupBy(col("bucket")).agg(countDistinct(col("id")).as("df_b"))
      .select(col("bucket"),
        log(lit(numDocs + 1.0) / (col("df_b") + 1.0)).as("idf"))

  /** Sparse tf-idf as ONE declarative plan — no driver collect, no
    * separate fit jobs: the per-bucket document frequencies (O(dims)
    * rows) and the corpus size (1 row) are broadcast-joined plan
    * branches, so the whole query is a single action. The tf frame
    * feeds two branches (the df_b aggregation and the probe side), so
    * it is persist()ed — the broadcast branch materializes the cache,
    * the probe side scans it, and the corpus aggregation runs exactly
    * once. Lifecycle is the materialize-then-release contract
    * documented on [[Dedup]]: the caller releases with
    * `spark.catalog.clearCache()` (as Bench does per query) or by
    * unpersisting — nothing is meant to outlive the query. */
  def hashedTfIdf(df: DataFrame, id: Column, text: Column, dims: Int): DataFrame = {
    val tf = hashedTf(df, id, text, dims)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dfb = tf.groupBy(col("bucket")).agg(countDistinct(col("id")).as("df_b"))
    val m = df.agg(count(lit(1)).as("m"))
    tf.join(broadcast(dfb), "bucket").crossJoin(broadcast(m))
      .select(col("id"), col("bucket"),
        (col("cnt") * log((col("m") + 1.0) / (col("df_b") + 1.0))).as("tfidf"))
  }

  /** BM25 relevance weights per (doc, bucket) over the hashed term
    * space (Robertson-Sparck-Jones idf with Lucene's +1 floor, the
    * formula spark.ml does not ship):
    *
    *   idf(b)    = ln((m - df_b + 0.5) / (df_b + 0.5) + 1)
    *   score     = idf(b) * cnt*(k1+1) / (cnt + k1*(1 - b + b*dl/avgdl))
    *
    * with dl = the doc's token count and avgdl = total tokens / m
    * (empty docs count in m — a deterministic convention the oracle
    * replays). ONE plan: tf is persisted and feeds three branches —
    * per-doc length via a window over the SAME (id, bucket) rows (no
    * second join), the O(dims) document-frequency table
    * (broadcast), and the two global scalars (broadcast). Lifecycle is
    * the materialize-then-release contract documented on [[Dedup]]. */
  def bm25(df: DataFrame, id: Column, text: Column, dims: Int,
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val tf = hashedTf(df, id, text, dims)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dfb = tf.groupBy(col("bucket")).agg(countDistinct(col("id")).as("df_b"))
    val totals = df.agg(count(lit(1)).as("m"))
      .crossJoin(tf.agg(sum(col("cnt")).as("toks")))
    val dl = sum(col("cnt")).over(
      org.apache.spark.sql.expressions.Window.partitionBy(col("id")))
    tf.withColumn("dl", dl)
      .join(broadcast(dfb), "bucket").crossJoin(broadcast(totals))
      .select(col("id"), col("bucket"),
        (log((col("m") - col("df_b") + 0.5) / (col("df_b") + 0.5) + 1.0) *
          (col("cnt") * (k1 + 1.0)) /
          (col("cnt") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / (col("toks") / col("m"))))
        ).as("bm25"))
  }

  /** BM25 top-k retrieval: score every doc against a literal query
    * string and keep the `k` best (score desc, id asc — deterministic).
    * The query tokenizes driver-side (it is a literal), its buckets
    * become an isin filter ON TOP of the sparse scores — Catalyst
    * pushes it below the scoring join, so only matching (id, bucket)
    * rows flow — and the global top-k is a TakeOrdered, never a
    * single-partition sort. */
  def bm25TopK(df: DataFrame, id: Column, text: Column, query: String,
               dims: Int, k: Int, k1: Double = 1.2, bp: Double = 0.75): DataFrame = {
    val qBuckets = query.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
      .map { tok =>
        val h = java.lang.Long.parseLong(
          org.apache.commons.codec.digest.DigestUtils.md5Hex(tok).take(15), 16)
        (h % dims + dims) % dims
      }.distinct.toSeq
    require(qBuckets.nonEmpty, "query tokenizes to nothing")
    bm25(df, id, text, dims, k1, bp)
      .where(col("bucket").isin(qBuckets: _*))
      .groupBy(col("id")).agg(round(sum(col("bm25")), 6).as("score"))
      .orderBy(col("score").desc, col("id").asc)
      .limit(k)
  }

  /** Dense array<double> tf vector per id (assembled from the sparse
    * form — only materialize when a model needs the dense shape). */
  def tfVector(tf: DataFrame, dims: Int): DataFrame =
    tf.groupBy(col("id"))
      .agg(map_from_arrays(collect_list(col("bucket")), collect_list(col("cnt"))).as("m"))
      .select(col("id"),
        transform(sequence(lit(0), lit(dims - 1)),
          b => coalesce(element_at(col("m"), b), lit(0L)).cast("double")).as("tf"))

  /** CountVectorizer (reference OpCountVectorizer.scala:44): fit a
    * vocabulary of the `vocabSize` most frequent tokens, transform each
    * doc to per-vocab-slot counts as array<double>. */
  def countVectorize(df: DataFrame, id: Column, text: Column, vocabSize: Int,
                     minDf: Long = 1): DataFrame = {
    val prepared = df.select(id.as("id"), tokens(text).as("toks"))
    val cv = new org.apache.spark.ml.feature.CountVectorizer()
      .setInputCol("toks").setOutputCol("__vec")
      .setVocabSize(vocabSize).setMinDF(minDf.toDouble)
      .fit(prepared)
    cv.transform(prepared)
      .select(col("id"),
        org.apache.spark.ml.functions.vector_to_array(col("__vec")).as("counts"))
  }

  /** Word2Vec doc embeddings (reference OpWord2Vec.scala:41): seeded.
    *
    * `numPartitions <= 0` (the default) distributes the fit across the
    * cluster's default parallelism — the scale-correct choice; a 100 TB
    * corpus cannot fit one partition. Distributed skip-gram updates race
    * benignly (Hogwild-style), so embeddings are only run-reproducible
    * per partitioning — pass `numPartitions = 1` when bit-exact
    * determinism matters more than fit throughput (tiny corpora,
    * differential tests). */
  def word2vec(df: DataFrame, id: Column, text: Column, vectorSize: Int,
               minCount: Int = 1, seed: Long = 42L,
               numPartitions: Int = 0): DataFrame = {
    val prepared = df.select(id.as("id"), tokens(text).as("toks"))
    val parts =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sparkContext.defaultParallelism
    val w2v = new org.apache.spark.ml.feature.Word2Vec()
      .setInputCol("toks").setOutputCol("__vec")
      .setVectorSize(vectorSize).setMinCount(minCount)
      .setSeed(seed).setNumPartitions(parts)
      .fit(prepared)
    w2v.transform(prepared)
      .select(col("id"),
        org.apache.spark.ml.functions.vector_to_array(col("__vec")).as("embedding"))
  }

  /** LDA topic mixture per doc (reference OpLDA.scala:41) over a term
    * vector column (e.g. [[countVectorize]] output). */
  def ldaTopics(df: DataFrame, id: Column, counts: Column, numTopics: Int,
                maxIter: Int = 10, seed: Long = 42L): DataFrame = {
    val prepared = df.select(id.as("id"),
      org.apache.spark.ml.functions.array_to_vector(counts).as("__features"))
    val lda = new org.apache.spark.ml.clustering.LDA()
      .setK(numTopics).setMaxIter(maxIter).setSeed(seed)
      .setFeaturesCol("__features").setTopicDistributionCol("__topics")
      .fit(prepared)
    lda.transform(prepared)
      .select(col("id"),
        org.apache.spark.ml.functions.vector_to_array(col("__topics")).as("topics"))
  }

  /** Per-column TextStats + vectorization decision in one aggregation
    * pass: pivot when distinct count <= maxCardinality, hash when the
    * column looks like free text (length variance > 0), ignore
    * otherwise. Exact countDistinct keeps the oracle replayable; swap in
    * MonoidAggregators.hllDistinct for sketch-guarded fits at extreme
    * scale (reference uses HLL the same way, OpOneHotVectorizer.scala:260). */
  def smartDecide(df: DataFrame, cols: Seq[String], maxCardinality: Long): DataFrame = {
    val aggs = cols.flatMap(c => Seq(
      countDistinct(col(c)).as(s"nd_$c"),
      avg(length(col(c))).as(s"al_$c"),
      var_samp(length(col(c)).cast("double")).as(s"lv_$c")))
    val perCol = cols.map(c => struct(lit(c).as("col_name"),
      col(s"nd_$c").as("n_distinct"), col(s"al_$c").as("avg_len"), col(s"lv_$c").as("len_var")))
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(perCol: _*)).as("s"))
      .select(col("s.col_name"), col("s.n_distinct"),
        round(col("s.avg_len"), 6).as("avg_len"),
        round(col("s.len_var"), 6).as("len_var"),
        when(col("s.n_distinct") <= maxCardinality, "pivot")
          .when(col("s.len_var") > 0, "hash")
          .otherwise("ignore").as("decision"))
  }

  /** SmartTextVectorizer end-to-end: decide per column, then pivot
    * (one-hot top-K) or hash (dense tf vector) accordingly; ignored
    * columns contribute nothing. Returns (id, <col>_slot_* ... ,
    * <col>_tf ...) wide frame. */
  def smartTextVectorize(df: DataFrame, id: Column, cols: Seq[String],
                         maxCardinality: Long, topK: Int, dims: Int): DataFrame = {
    val decisions = smartDecide(df, cols, maxCardinality)
      .select(col("col_name"), col("decision")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    cols.foldLeft(df.select(id.as("id"))) { (acc, c) =>
      decisions(c) match {
        case "pivot" =>
          val hot = Vectorizers.oneHotTopK(df, id, col(c), topK, minSupport = 1)
            .select(col("id") +: (1 to topK).map(i => col(s"slot_$i").as(s"${c}_$i")) :+
              col("slot_other").as(s"${c}_other") :+ col("slot_null").as(s"${c}_null"): _*)
          acc.join(hot, "id")
        case "hash" =>
          val tf = tfVector(hashedTf(df, id, col(c), dims), dims)
            .withColumnRenamed("tf", s"${c}_tf")
          // docs whose column tokenizes to nothing have no sparse tf rows;
          // fill the left-join miss with a zero vector so downstream
          // assemblers always see a fixed-width array
          val zeros = array_repeat(lit(0.0), dims)
          acc.join(tf, Seq("id"), "left")
            .withColumn(s"${c}_tf", coalesce(col(s"${c}_tf"), zeros))
        case _ => acc
      }
    }
  }
}
