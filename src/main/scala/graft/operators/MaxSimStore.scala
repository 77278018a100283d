package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED late-interaction (MaxSim) chunk index — the serving form
  * of q178's batch corpus-vs-sample audit: a retrieval deployment
  * serves MaxSim queries against a STORED chunk index instead of
  * re-deriving the corpus relations per batch. The store materializes
  * exactly the three relations q178 derives (one shared code path —
  * [[TextOps.maxSimChunkRels]] / [[TextOps.maxSimRarePrefix]] — so
  * store-serve equality is by construction, and the q182 gate entry
  * hashes the stored serve against q178's own oracle):
  *
  *   - `chunks/`   (cdoc, cc, vb, n2b, m): the scoring side — one
  *     packed 16-long vector + norm + multiplicity per distinct chunk;
  *   - `postings/` bucket=…/ (tok, cdoc, cc): the ROUTING side — each
  *     chunk's 2 rarest tokens, partitioned by a 64-way md5 bucket of
  *     the token, so a serving batch's probe reads only its tokens'
  *     bucket directories (static partition pruning, the IvfIndex
  *     probe-list discipline);
  *   - `df/`       bucket=…/ (tok, tok_df): corpus document frequency,
  *     bucket-partitioned the same way, for query-side rare-term
  *     selection at serve time.
  *
  * Serve recomputes the QUERY side (chunks, vectors, rare-2 prefixes)
  * from the incoming docs — batch-bounded work — and routes: query
  * prefix tokens → bucket-pruned posting read → candidate chunk pairs
  * → the shared scoring tail. Query docs that also live in the corpus
  * serve bit-equal to q178 (the spec pins it). A NOVEL query doc's
  * rare-term selection uses the STORED df with inner-join semantics:
  * tokens the corpus has never seen cannot route anyway, so they are
  * skipped in favor of the rarest stored tokens — a strict recall
  * improvement over q178's rule, documented as the one delta.
  *
  * The store is IMMUTABLE (build-once; rebuild to refresh) — the
  * mutation lifecycle lives on the vector store ([[IvfIndex]]); this
  * index is the lexical-routing sibling a corpus release rebuilds
  * alongside its loader artifacts.
  *
  * Scale: the build is q178's corpus pass plus three partitioned
  * writes (postings/df repartitioned on bucket — one file per bucket
  * directory, the q156 small-files lesson); a serve's corpus-side
  * reads are the probed bucket directories (≤ 64, typically far
  * fewer) and ONE SHUFFLE_HASH pass of the chunks relation at
  * candidate cardinality; nothing driver-sized but the bucket lists.
  */
object MaxSimStore {

  /** Token-routing fan-out: postings/df partition into this many md5
    * buckets. 64 keeps directory counts trivial while a small serving
    * batch prunes to a handful.
    */
  val Buckets = 64L

  private def bucketCol(tok: Column): Column =
    conv(substring(md5(tok), 1, 15), 16, 10).cast("long") % Buckets

  /** Build the store from a doc set (doc_id, toks, …). */
  def build(dset: DataFrame, dir: String): Unit = {
    val s = dset.sparkSession
    import s.implicits._
    val (vec, mRel, tokd) = TextOps.maxSimChunkRels(dset)
    val dfRel = tokd.groupBy($"tok").agg(count(lit(1)).as("tok_df"))
    vec.join(mRel, Seq("doc_id", "h"))
      .select($"doc_id".as("cdoc"), $"h".as("cc"),
        $"v".as("vb"), $"n2".as("n2b"), $"m")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/chunks")
    TextOps.maxSimRarePrefix(tokd, dfRel)
      .select($"doc_id".as("cdoc"), $"h".as("cc"), $"tok",
        bucketCol($"tok").as("bucket"))
      .repartition($"bucket")
      .write.mode(SaveMode.Overwrite).partitionBy("bucket")
      .parquet(s"$dir/postings")
    dfRel.withColumn("bucket", bucketCol($"tok"))
      .repartition($"bucket")
      .write.mode(SaveMode.Overwrite).partitionBy("bucket")
      .parquet(s"$dir/df")
  }

  /** MaxSim top-k from the stored index for a batch of query docs
    * (doc_id, toks, …). Returns (query_doc, rk, cand_doc, score,
    * n_chunks_hit) — q178's shape.
    */
  def serve(s: SparkSession, dir: String, queryDocs: DataFrame,
      k: Int = 5): DataFrame = {
    import s.implicits._
    val (qvec, qmRel, qtokd) = TextOps.maxSimChunkRels(queryDocs)
    // qtokd deliberately stays LAZY like the corpus side: an A/B at
    // sf10 read checkpoint-once as -5% on the 20k-doc audit batch but
    // WORSE on a 100-doc serving batch (the materialization barrier
    // costs more than the recompute saves) — serve cost is dominated
    // by the pair-scoring tail either way (MaxSimStoreBench split).
    // query-side df lookup, pruned to the batch's token buckets
    val qtoks = qtokd.select($"tok").distinct()
      .withColumn("bucket", bucketCol($"tok"))
      .localCheckpoint(true)
    val qbuckets = qtoks.select($"bucket").distinct()
      .as[Long].collect().toSeq
    val qdf = s.read.parquet(s"$dir/df")
      .filter($"bucket".isin(qbuckets: _*))
      .join(broadcast(qtoks.select($"tok")), Seq("tok"), "left_semi")
      .select($"tok", $"tok_df")
    val qpref = TextOps.maxSimRarePrefix(qtokd, qdf)
      .localCheckpoint(true)
    // route: the prefix tokens' buckets become the posting scan's
    // static partition filter
    val pbuckets = qpref.select(bucketCol($"tok").as("b")).distinct()
      .as[Long].collect().toSeq
    val postings = s.read.parquet(s"$dir/postings")
      .filter($"bucket".isin(pbuckets: _*))
    val cand = qpref.select($"doc_id".as("qdoc"), $"h".as("qh"), $"tok")
      .join(postings.select($"cdoc", $"cc", $"tok"), "tok")
      .filter($"qdoc" =!= $"cdoc")
      .select($"qdoc", $"qh", $"cdoc", $"cc").distinct()
    val av = qvec.select($"doc_id".as("qdoc"), $"h".as("qh"),
      $"v".as("va"), $"n2".as("n2a"))
    val bv = s.read.parquet(s"$dir/chunks")
      .select($"cdoc", $"cc", $"vb", $"n2b")
    TextOps.maxSimScore(cand, av, bv, qmRel, k)
  }
}
