package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Persisted IVF index — the missing half of q147's index-BUILD path:
  * q147 relearns its centroids on every query run; a real vector-serving
  * deployment trains ONCE, persists, and serves every query (and every
  * incremental ingest batch) from the stored index. Reference surface:
  * the same coarse-quantized routing the reference's vector path
  * declares; re-expressed here as two parquet relations plus three
  * Spark-first operations.
  *
  * Layout (under one index directory):
  *   - `centroids/` — (cid, cq): the k learned int64 centroids
  *     ([[VectorOps.lloydTrain]] run to convergence, k = 16 here).
  *   - `postings/`  — (vec_id, qv, gen) PARTITIONED BY cid: the
  *     inverted lists. Partitioning by cell id is the scale decision:
  *     a probe touches `nprobe` directories out of `nlists`, so the
  *     serve-path scan is bounded by nprobe/nlists of the corpus
  *     (dynamic partition pruning through the broadcast probe join),
  *     and an incremental batch APPENDS new files into existing cell
  *     directories without rewriting a byte of the base postings.
  *     `gen` stamps which ingest batch wrote each row (0 = the build).
  *
  * Operations:
  *   - [[build]]: train to convergence, write both relations.
  *   - [[serve]]: 2-probe exact-re-rank top-k from the STORED tables —
  *     byte-identical results to q147's in-memory serve (q152 pins
  *     this through the DuckDB oracle, which replays training and
  *     serving without ever seeing the files).
  *   - [[addBatch]]: q88-style incremental ingest — assign new vectors
  *     to the EXISTING cells (no retrain; one broadcast-argmin pass),
  *     append their postings, and report per-cell occupancy with a
  *     `needs_split` flag for cells past 2× the fair share — the
  *     signal that schedules a cell-local re-train, exactly how
  *     billion-vector indexes amortize Lloyd cost across ingests.
  *
  * 100 TB design: centroids are k rows (broadcast everywhere); the only
  * corpus-sized work is the build/ingest argmin (one packed long + one
  * carried vector per row through a map-side-combined aggregate) and
  * the probed-cell candidate join, never an all-pairs relation. Serving
  * reads nprobe cells; ingest appends without rewrite; the split flag
  * keeps cell sizes bounded so neither ever degrades to a full scan.
  */
object IvfIndex {

  type Q = (SparkSession, String) => DataFrame

  private def centDir(dir: String) = s"$dir/centroids"
  private def postDir(dir: String) = s"$dir/postings"
  private def tombDir(dir: String) = s"$dir/tombstones"

  /** Train coarse centroids to convergence on `emb` (vec_id, qv) and
    * persist centroids + cid-partitioned postings (gen = 0).
    */
  def build(emb: DataFrame, dir: String): Unit = {
    val s = emb.sparkSession
    import s.implicits._
    clearTombstones(dir) // a fresh build owes nothing to prior deletes
    val seeds = emb.filter($"vec_id" < 16)
      .select($"vec_id".as("cid"), $"qv".as("cq"))
    val (learned, _) = VectorOps.lloydTrain(
      emb, seeds, VectorOps.LloydMaxIters, VectorOps.LloydMinImprove)
    learned.select($"cid", $"cq").write.mode(SaveMode.Overwrite)
      .parquet(centDir(dir))
    VectorOps.argminPacked(emb, learned, carryQv = true)
      .select($"vec_id", $"qv", lit(0L).as("gen"), $"cid")
      .write.mode(SaveMode.Overwrite).partitionBy("cid")
      .parquet(postDir(dir))
  }

  def centroids(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(centDir(dir))

  def postings(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(postDir(dir))

  /** Tombstone deletes: record the ids in `tombstones/` without touching
    * a posting byte — the LSM discipline every mutable index uses at
    * scale. Serving masks tombstones logically ([[masked]]); [[compact]]
    * later removes them physically. Deletes therefore cost O(batch)
    * regardless of corpus size, and the tombstone set stays bounded by
    * the delete volume between compactions (which is what makes the
    * serve-side broadcast anti-join safe).
    */
  def delete(s: SparkSession, dir: String, ids: DataFrame): Unit =
    ids.select(col("vec_id")).write.mode(SaveMode.Append)
      .parquet(tombDir(dir))

  private def tombstones(s: SparkSession, dir: String): Option[DataFrame] =
    if (new java.io.File(tombDir(dir)).exists)
      Some(s.read.parquet(tombDir(dir))) else None

  /** Postings with the tombstone mask applied — the relation every serve
    * ranks against. Broadcast anti-join: see [[delete]] for the bound.
    */
  private def masked(s: SparkSession, dir: String): DataFrame = {
    val post = postings(s, dir)
    tombstones(s, dir).fold(post)(t =>
      post.join(broadcast(t.select(col("vec_id")).distinct()),
        Seq("vec_id"), "left_anti"))
  }

  /** Top-k exact-re-rank serve from the stored index: probe the
    * `probes` nearest stored cells per query, rank the probed cells'
    * stored vectors by exact int64 distance, and report each hit next
    * to its cell's posting count (the occupancy the router balances).
    * Queries broadcast (a serving batch is bounded); postings are the
    * only corpus-sized relation and only probed cells are read.
    */
  def serve(s: SparkSession, dir: String, queries: DataFrame,
      probes: Int = 2, k: Int = 5): DataFrame = {
    import s.implicits._
    val cents = centroids(s, dir)
    val post = masked(s, dir)
    val probed = queries.crossJoin(broadcast(cents))
      .withColumn("cdist", graft.functions.VectorMath.sqDistLong($"qv", $"cq"))
      .withColumn("crank", row_number().over(
        Window.partitionBy($"vec_id").orderBy($"cdist", $"cid")))
      .filter($"crank" <= probes)
      .select($"vec_id".as("query_id"), $"qv".as("probe_qv"), $"cid")
      .localCheckpoint(true)
    // The router's probe list IS the pruning predicate: collect the
    // distinct probed cell ids (bounded by nlists, not by the batch)
    // and push them as a STATIC partition filter, so the posting scan
    // plans to nprobe directories — DPP would have to rediscover this
    // at runtime and its cost heuristics can decline; a serving path
    // must never fall back to reading every cell.
    val probedCells = probed.select($"cid").distinct()
      .collect().map(_.getLong(0)).toSeq
    // probed cells only — the report column never needs unprobed counts,
    // and an unfiltered count would silently re-scan every cell
    val cellSize = post.filter($"cid".isin(probedCells: _*))
      .groupBy($"cid").agg(count(lit(1)).as("cell_size"))
    val w = Window.partitionBy($"query_id").orderBy($"dist", $"neighbor")
    post.filter($"cid".isin(probedCells: _*))
      .join(broadcast(probed), Seq("cid"))
      .filter($"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("neighbor"), $"cid",
        graft.functions.VectorMath.sqDistLong($"qv", $"probe_qv").as("dist"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= k)
      .join(broadcast(cellSize), Seq("cid"))
      .select($"query_id", $"rank", $"neighbor", $"dist", $"cell_size")
      .orderBy($"query_id", $"rank")
  }

  /** Metadata-filtered index build: the same converged coarse quantizer,
    * but every posting carries its vector's `label` attribute and the
    * posting files are partitioned TWO levels deep — `cid` then `label`.
    * This is how production vector stores make "top-k WHERE tenant = t"
    * cheap: the filter attribute lives in the physical layout, so a
    * filtered probe prunes to (nprobe × |labels in the filter|)
    * directories and the unselected labels' bytes are never opened —
    * pre-filter semantics (candidates are filtered BEFORE ranking, so
    * top-k is exact over the matching subset, never starved by
    * rank-then-filter). The label rides through the build's argmin
    * aggregate as a `min_by` carry — no join-back exchange.
    */
  def buildLabeled(emb: DataFrame, dir: String): Unit = {
    val s = emb.sparkSession
    import s.implicits._
    clearTombstones(dir)
    val seeds = emb.filter($"vec_id" < 16)
      .select($"vec_id".as("cid"), $"qv".as("cq"))
    val (learned, _) = VectorOps.lloydTrain(
      emb.select($"vec_id", $"qv"), seeds,
      VectorOps.LloydMaxIters, VectorOps.LloydMinImprove)
    learned.select($"cid", $"cq").write.mode(SaveMode.Overwrite)
      .parquet(centDir(dir))
    VectorOps.argminPacked(emb, learned, carryQv = true, carry = Seq("label"))
      .select($"vec_id", $"qv", lit(0L).as("gen"), $"cid", $"label")
      .write.mode(SaveMode.Overwrite).partitionBy("cid", "label")
      .parquet(postDir(dir))
  }

  /** Filtered top-k serve: each query (vec_id, qv, label) ranks only
    * same-label vectors in its `probes` nearest cells. Both partition
    * levels get static pruning predicates — the probe list as in
    * [[serve]], plus the batch's distinct label set — so a
    * label-concentrated serving batch (the tenant-scoped reality) reads
    * nprobe × |batch labels| directories; the per-query label equality
    * in the join keeps per-query semantics exact even when the batch
    * spans labels.
    */
  def serveLabeled(s: SparkSession, dir: String, queries: DataFrame,
      probes: Int = 2, k: Int = 5): DataFrame = {
    import s.implicits._
    val cents = centroids(s, dir)
    val post = masked(s, dir)
    val probed = queries.crossJoin(broadcast(cents))
      .withColumn("cdist", graft.functions.VectorMath.sqDistLong($"qv", $"cq"))
      .withColumn("crank", row_number().over(
        Window.partitionBy($"vec_id").orderBy($"cdist", $"cid")))
      .filter($"crank" <= probes)
      .select($"vec_id".as("query_id"), $"qv".as("probe_qv"),
        $"label", $"cid")
      .localCheckpoint(true)
    val probedCells = probed.select($"cid").distinct()
      .collect().map(_.getLong(0)).toSeq
    val probedLabels = probed.select($"label").distinct()
      .collect().map(_.getLong(0)).toSeq
    val w = Window.partitionBy($"query_id").orderBy($"dist", $"neighbor")
    post.filter($"cid".isin(probedCells: _*) &&
        $"label".isin(probedLabels: _*))
      .join(broadcast(probed), Seq("cid", "label"))
      .filter($"vec_id" =!= $"query_id")
      .select($"query_id", $"label", $"vec_id".as("neighbor"),
        graft.functions.VectorMath.sqDistLong($"qv", $"probe_qv").as("dist"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= k)
      .orderBy($"query_id", $"rank")
  }

  /** Incremental ingest: assign `newVecs` (vec_id, qv) to the stored
    * cells, append their postings under generation `gen`, and return
    * the per-cell occupancy report — (cid, n_base, n_added, n_total,
    * needs_split) over ALL stored generations, where needs_split flags
    * cells holding more than 2× the fair 1/16 share (n_total·8 >
    * corpus total, integer-exact). One broadcast-argmin pass over the
    * batch; the base postings are never read row-wise, only counted.
    */
  def addBatch(s: SparkSession, dir: String, newVecs: DataFrame,
      gen: Long = 1L): DataFrame = {
    import s.implicits._
    val cents = centroids(s, dir)
    VectorOps.argminPacked(newVecs, cents, carryQv = true)
      .select($"vec_id", $"qv", lit(gen).as("gen"), $"cid")
      .write.mode(SaveMode.Append).partitionBy("cid")
      .parquet(postDir(dir))
    splitReport(s, dir)
  }

  /** Execute the re-splits [[addBatch]]'s `needs_split` flag schedules:
    * for every flagged cell, train a 2-centroid Lloyd to convergence on
    * THAT CELL'S stored postings only (seeds = the cell's two smallest
    * vec_ids; the same lloydTrain loop as the build, stop rule
    * included), give the two halves fresh cell ids past the current
    * max, rewrite ONLY the flagged cells' posting directories, and
    * replace their centroid rows. Returns the post-split occupancy
    * report.
    *
    * This is how a billion-vector index amortizes Lloyd cost: the full
    * build never re-runs — maintenance touches exactly the hot cells'
    * bytes (read one partition directory, write two), the rest of the
    * postings are untouched files, and the centroid table changes by
    * flagged-cells×2 rows. The driver loop is bounded by nlists, and
    * each per-cell training pass is corpus-work proportional to that
    * cell alone.
    */
  def splitCells(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val flagged = splitReport(s, dir)
      .filter($"needs_split" === 1L).select($"cid")
      .as[Long].collect().toSeq
    if (flagged.nonEmpty) {
      val cents = centroids(s, dir).select($"cid".cast("long").as("cid"), $"cq")
        .localCheckpoint(true)
      var nextCid = cents.agg(max($"cid")).head().getLong(0) + 1
      val keptCents = cents.filter(!$"cid".isin(flagged: _*))
      val newCents = flagged.map { hot =>
        val cell = postings(s, dir).filter($"cid" === hot)
          .select($"vec_id", $"qv", $"gen").localCheckpoint(true)
        val seedIds = cell.select($"vec_id").orderBy($"vec_id").limit(2)
          .as[Long].collect()
        val seeds = cell.filter($"vec_id".isin(seedIds: _*))
          .select(($"vec_id" === seedIds.max).cast("int").cast("long")
            .as("cid"), $"qv".as("cq"))
        val (learned, _) = VectorOps.lloydTrain(cell.select($"vec_id", $"qv"),
          seeds, VectorOps.LloydMaxIters, VectorOps.LloydMinImprove)
        // local cid 0/1 (argminPacked's dist*16+cid packing needs
        // cid < 16) -> fresh global ids only at the storage boundary
        val lo = nextCid; nextCid += 2
        val remapped = learned.select(($"cid" + lo).as("cid"), $"cq")
          .localCheckpoint(true)
        VectorOps.argminPacked(cell.drop("gen"), learned, carryQv = true)
          .join(cell.select($"vec_id", $"gen"), "vec_id")
          .select($"vec_id", $"qv", $"gen", ($"cid" + lo).as("cid"))
          .write.mode(SaveMode.Append).partitionBy("cid")
          .parquet(postDir(dir))
        // the old partition directory is superseded — remove it so the
        // split is a move, not a duplication (local-fs index layout)
        val old = new java.io.File(s"${postDir(dir)}/cid=$hot")
        old.listFiles().foreach(_.delete()); old.delete()
        remapped
      }.reduce(_ unionByName _)
      keptCents.unionByName(newCents)
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/centroids_new")
      // two-phase swap: centroids/ readers must never see a half write
      val cd = new java.io.File(centDir(dir))
      cd.listFiles().foreach(_.delete()); cd.delete()
      new java.io.File(s"$dir/centroids_new").renameTo(cd)
    }
    splitReport(s, dir)
  }

  private def clearTombstones(dir: String): Unit = {
    val td = new java.io.File(tombDir(dir))
    if (td.exists) { td.listFiles().foreach(_.delete()); td.delete() }
  }

  /** Physically apply the accumulated tombstones and fold ingest
    * generations back to gen 0 — the LSM compaction to [[delete]]'s
    * logical mask. Affected cells = those holding a tombstoned vector
    * or more than one generation; their posting directories are
    * rewritten in ONE Spark pass (filter + anti-join, partitionBy cid
    * into a staging dir, per-directory two-phase swap) and every other
    * cell's files are left byte-untouched. The tombstone log is cleared
    * at the end, so serve-side mask cost resets to zero.
    *
    * Returns the per-cell report (cid, n_before, n_removed,
    * n_gens_before, n_after, compacted). Scale: the decision scan reads
    * only (vec_id, gen) + the cid partition column (postings' qv bytes
    * untouched); the rewrite reads and writes exactly the affected
    * cells' bytes — compaction cost tracks delete/ingest volume, not
    * corpus size.
    */
  def compact(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val post = postings(s, dir)
    val tomb = tombstones(s, dir)
      .map(_.select($"vec_id").distinct().localCheckpoint(true))
    val tombCells = tomb.fold(
      post.select($"cid").distinct().withColumn("n_tomb", lit(0L)).limit(0))(
      t => post.join(broadcast(t), "vec_id")
        .groupBy($"cid").agg(count(lit(1)).as("n_tomb")))
    val report = post.groupBy($"cid")
      .agg(count(lit(1)).as("n_before"),
        countDistinct($"gen").as("n_gens_before"))
      .join(tombCells, Seq("cid"), "left")
      .select($"cid", $"n_before",
        coalesce($"n_tomb", lit(0L)).as("n_removed"), $"n_gens_before")
      .withColumn("n_after", $"n_before" - $"n_removed")
      .withColumn("compacted",
        when($"n_removed" > 0 || $"n_gens_before" > 1, 1L).otherwise(0L))
      .select($"cid", $"n_before", $"n_removed", $"n_gens_before",
        $"n_after", $"compacted")
      .orderBy($"cid")
      .localCheckpoint(true)
    val affected = report.filter($"compacted" === 1L)
      .select($"cid").as[Long].collect().toSeq
    if (affected.nonEmpty) {
      val tmp = s"$dir/postings_compact_tmp"
      val rewritten = post.filter($"cid".isin(affected: _*))
      tomb.fold(rewritten)(t =>
          rewritten.join(broadcast(t), Seq("vec_id"), "left_anti"))
        .select($"vec_id", $"qv", lit(0L).as("gen"), $"cid")
        .write.mode(SaveMode.Overwrite).partitionBy("cid").parquet(tmp)
      affected.foreach { c =>
        val old = new java.io.File(s"${postDir(dir)}/cid=$c")
        if (old.exists) { old.listFiles().foreach(_.delete()); old.delete() }
        val fresh = new java.io.File(s"$tmp/cid=$c")
        // a fully-tombstoned cell writes no staging dir: the delete IS
        // its compaction (the centroid row stays; occupancy reads 0)
        if (fresh.exists) fresh.renameTo(old)
      }
      val td = new java.io.File(tmp)
      if (td.exists) { td.listFiles().foreach(_.delete()); td.delete() }
    }
    clearTombstones(dir)
    report
  }

  /** Per-cell occupancy over every stored generation (see [[addBatch]]). */
  def splitReport(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val counts = postings(s, dir).groupBy($"cid")
      .agg(sum(when($"gen" === 0L, 1L).otherwise(0L)).as("n_base"),
        sum(when($"gen" =!= 0L, 1L).otherwise(0L)).as("n_added"),
        count(lit(1)).as("n_total"))
    val total = counts.agg(sum($"n_total").as("total"))
    centroids(s, dir).select($"cid".cast("long").as("cid"))
      .join(counts, Seq("cid"), "left")
      .select($"cid",
        coalesce($"n_base", lit(0L)).as("n_base"),
        coalesce($"n_added", lit(0L)).as("n_added"),
        coalesce($"n_total", lit(0L)).as("n_total"))
      .crossJoin(broadcast(total))
      .select($"cid", $"n_base", $"n_added", $"n_total",
        when($"n_total" * 8 > $"total", 1L).otherwise(0L).as("needs_split"))
      .orderBy($"cid")
  }

  /** Per-entry scratch index dirs: FIXED paths (re-runs overwrite via
    * build's SaveMode.Overwrite — Bench reps and repeated Verify runs
    * must not accumulate appended postings), distinct per entry.
    */
  private def scratch(name: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_ivf_index/$name"

  /** Build → persist → serve, end-to-end through the parquet roundtrip.
    * Result rows are q147's serve joined with each neighbor cell's
    * stored posting count; the oracle replays training + serving
    * relationally, so a hash match proves the store/load cycle is
    * lossless.
    */
  private def q152(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val emb = VectorOps.quantized(s, d)
    val dir = scratch("q152")
    build(emb, dir)
    serve(s, dir, emb.filter($"vec_id" % 100 === 0))
  }

  /** Build on the base corpus (vec_id % 5 != 0), then incrementally
    * ingest the remaining fifth against the STORED index — no retrain —
    * and report per-cell occupancy + re-split flags. The oracle replays
    * the base training, the incremental assignment, and the flag rule.
    */
  private def q153(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val emb = VectorOps.quantized(s, d)
    val dir = scratch("q153")
    build(emb.filter($"vec_id" % 5 =!= 0), dir)
    addBatch(s, dir, emb.filter($"vec_id" % 5 === 0))
  }

  /** Filtered vector search end-to-end: labeled build → (cid, label)-
    * partitioned store → same-label top-5 for every 100th vector as the
    * query batch. Pre-filter semantics: each query ranks ONLY its own
    * label's vectors inside its 2 probed cells. The oracle replays
    * training, labeled assignment, and the filtered serve relationally.
    */
  private def q156(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val emb = VectorOps.quantizedLabeled(s, d)
    val dir = scratch("q156")
    buildLabeled(emb, dir)
    serveLabeled(s, dir, emb.filter($"vec_id" % 100 === 0))
  }

  /** The full mutable-index lifecycle in one entry: build on the base
    * corpus (vec_id % 5 != 0), ingest the held-out fifth as generation
    * 1, tombstone-delete every 7th vector, COMPACT (deletes applied
    * physically, generations folded, only affected cell directories
    * rewritten), then serve from the compacted store. The oracle
    * replays training, the incremental assignment, and the delete set
    * relationally — a hash match proves the stored index survived
    * delete + ingest + compaction with contents exactly equal to "the
    * corpus minus the deletes", cell sizes included.
    */
  private def q157(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val emb = VectorOps.quantized(s, d)
    val dir = scratch("q157")
    build(emb.filter($"vec_id" % 5 =!= 0), dir)
    addBatch(s, dir, emb.filter($"vec_id" % 5 === 0))
    delete(s, dir, emb.filter($"vec_id" % 7 === 0).select($"vec_id"))
    compact(s, dir)
    serve(s, dir, emb.filter($"vec_id" % 100 === 0 && $"vec_id" % 7 =!= 0))
  }

  def defs: Map[String, Q] = Map(
    "q152_ivf_index_serve" -> ((s, d) => q152(s, d)),
    "q153_ivf_incremental" -> ((s, d) => q153(s, d)),
    "q156_filtered_ann" -> ((s, d) => q156(s, d)),
    "q157_ivf_delete_compact" -> ((s, d) => q157(s, d))
  )

  private def q152OracleSql: String =
    s"""WITH ${VectorOps.lloydCtes(
           VectorOps.LloydMaxIters, VectorOps.LloydMinImprove)},
         ${VectorOps.lloydStarCtes(VectorOps.LloydMaxIters)},
         cellsz AS (
           SELECT cid, CAST(count(*) AS BIGINT) AS cell_size
           FROM astar GROUP BY 1),
         qs AS (
           SELECT vec_id AS query_id, qv, cid FROM (
             SELECT q.vec_id, q.qv, c.cid,
               row_number() OVER (PARTITION BY q.vec_id ORDER BY
                 list_sum(list_transform(list_zip(q.qv, c.cq),
                   z -> (z[1] - z[2]) * (z[1] - z[2]))), c.cid) AS rn
             FROM q, cstar c WHERE q.vec_id % 100 = 0) WHERE rn <= 2),
         cand AS (
           SELECT qs.query_id, astar.vec_id AS neighbor, astar.cid,
             CAST(list_sum(list_transform(list_zip(aq.qv, qs.qv),
               z -> (z[1] - z[2]) * (z[1] - z[2]))) AS BIGINT) AS dist
           FROM astar JOIN q aq USING (vec_id) JOIN qs ON astar.cid = qs.cid
           WHERE astar.vec_id <> qs.query_id),
         ranked AS (
           SELECT query_id, neighbor, cid, dist,
             CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY dist, neighbor) AS BIGINT) AS rank
           FROM cand)
         SELECT query_id, rank, neighbor, dist, cell_size
         FROM ranked JOIN cellsz USING (cid)
         WHERE rank <= 5 ORDER BY query_id, rank"""

  private def q153OracleSql: String =
    s"""WITH ${VectorOps.lloydCtes(VectorOps.LloydMaxIters,
           VectorOps.LloydMinImprove, "WHERE vec_id % 5 <> 0")},
         ${VectorOps.lloydStarCtes(VectorOps.LloydMaxIters)},
         nd AS (
           SELECT a.vec_id, c.cid,
             CAST(list_sum(list_transform(list_zip(a.qv, c.cq),
               z -> (z[1] - z[2]) * (z[1] - z[2]))) AS BIGINT) AS dist
           FROM allq a, cstar c WHERE a.vec_id % 5 = 0),
         anew AS (
           SELECT vec_id, cid FROM (
             SELECT *, row_number() OVER (PARTITION BY vec_id
               ORDER BY dist, cid) AS rn FROM nd) WHERE rn = 1),
         basec AS (SELECT cid, CAST(count(*) AS BIGINT) AS n_base
                   FROM astar GROUP BY 1),
         addc AS (SELECT cid, CAST(count(*) AS BIGINT) AS n_added
                  FROM anew GROUP BY 1),
         rep AS (
           SELECT c.cid, coalesce(b.n_base, 0) AS n_base,
             coalesce(a.n_added, 0) AS n_added,
             coalesce(b.n_base, 0) + coalesce(a.n_added, 0) AS n_total
           FROM cstar c LEFT JOIN basec b USING (cid)
             LEFT JOIN addc a USING (cid)),
         tot AS (SELECT CAST(sum(n_total) AS BIGINT) AS total FROM rep)
         SELECT cid, n_base, n_added, n_total,
           CAST(CASE WHEN n_total * 8 > total THEN 1 ELSE 0 END
             AS BIGINT) AS needs_split
         FROM rep, tot ORDER BY cid"""

  private def q156OracleSql: String =
    s"""WITH ${VectorOps.lloydCtes(
           VectorOps.LloydMaxIters, VectorOps.LloydMinImprove)},
         ${VectorOps.lloydStarCtes(VectorOps.LloydMaxIters)},
         lab AS (SELECT vec_id, CAST(label AS BIGINT) AS label
                 FROM embeddings),
         qs AS (
           SELECT vec_id AS query_id, qv, label, cid FROM (
             SELECT q.vec_id, q.qv, l.label, c.cid,
               row_number() OVER (PARTITION BY q.vec_id ORDER BY
                 list_sum(list_transform(list_zip(q.qv, c.cq),
                   z -> (z[1] - z[2]) * (z[1] - z[2]))), c.cid) AS rn
             FROM q JOIN lab l USING (vec_id), cstar c
             WHERE q.vec_id % 100 = 0) WHERE rn <= 2),
         cand AS (
           SELECT qs.query_id, qs.label, astar.vec_id AS neighbor,
             CAST(list_sum(list_transform(list_zip(aq.qv, qs.qv),
               z -> (z[1] - z[2]) * (z[1] - z[2]))) AS BIGINT) AS dist
           FROM astar JOIN q aq USING (vec_id) JOIN lab nl USING (vec_id)
             JOIN qs ON astar.cid = qs.cid AND nl.label = qs.label
           WHERE astar.vec_id <> qs.query_id),
         ranked AS (
           SELECT query_id, label, neighbor, dist,
             CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY dist, neighbor) AS BIGINT) AS rank
           FROM cand)
         SELECT query_id, label, neighbor, dist, rank FROM ranked
         WHERE rank <= 5 ORDER BY query_id, rank"""

  private def q157OracleSql: String =
    s"""WITH ${VectorOps.lloydCtes(VectorOps.LloydMaxIters,
           VectorOps.LloydMinImprove, "WHERE vec_id % 5 <> 0")},
         ${VectorOps.lloydStarCtes(VectorOps.LloydMaxIters)},
         nd AS (
           SELECT a.vec_id, c.cid,
             CAST(list_sum(list_transform(list_zip(a.qv, c.cq),
               z -> (z[1] - z[2]) * (z[1] - z[2]))) AS BIGINT) AS dist
           FROM allq a, cstar c WHERE a.vec_id % 5 = 0),
         anew AS (
           SELECT vec_id, cid FROM (
             SELECT *, row_number() OVER (PARTITION BY vec_id
               ORDER BY dist, cid) AS rn FROM nd) WHERE rn = 1),
         comb AS MATERIALIZED (
           SELECT vec_id, cid FROM astar WHERE vec_id % 7 <> 0
           UNION ALL
           SELECT vec_id, cid FROM anew WHERE vec_id % 7 <> 0),
         cellsz AS (
           SELECT cid, CAST(count(*) AS BIGINT) AS cell_size
           FROM comb GROUP BY 1),
         qs AS (
           SELECT vec_id AS query_id, qv, cid FROM (
             SELECT a.vec_id, a.qv, c.cid,
               row_number() OVER (PARTITION BY a.vec_id ORDER BY
                 list_sum(list_transform(list_zip(a.qv, c.cq),
                   z -> (z[1] - z[2]) * (z[1] - z[2]))), c.cid) AS rn
             FROM allq a, cstar c
             WHERE a.vec_id % 100 = 0 AND a.vec_id % 7 <> 0) WHERE rn <= 2),
         cand AS (
           SELECT qs.query_id, cb.vec_id AS neighbor, cb.cid,
             CAST(list_sum(list_transform(list_zip(aq.qv, qs.qv),
               z -> (z[1] - z[2]) * (z[1] - z[2]))) AS BIGINT) AS dist
           FROM comb cb JOIN allq aq USING (vec_id)
             JOIN qs ON cb.cid = qs.cid
           WHERE cb.vec_id <> qs.query_id),
         ranked AS (
           SELECT query_id, neighbor, cid, dist,
             CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY dist, neighbor) AS BIGINT) AS rank
           FROM cand)
         SELECT query_id, rank, neighbor, dist, cell_size
         FROM ranked JOIN cellsz USING (cid)
         WHERE rank <= 5 ORDER BY query_id, rank"""

  def oracles: Map[String, String] = Map(
    "q152_ivf_index_serve" -> q152OracleSql,
    "q153_ivf_incremental" -> q153OracleSql,
    "q156_filtered_ann" -> q156OracleSql,
    "q157_ivf_delete_compact" -> q157OracleSql
  )
}
