package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.ByteBuffer

/** Multimodal (image/audio/video) columns as opaque binary + typed
  * metadata — the LLM-pipeline extension (BASELINE.json north star).
  *
  * Container constraint: no image/audio codec libraries exist in this
  * environment, so the DECODE step is a deterministic fake (a 16-byte
  * header we synthesize and parse); everything around it — binary columns
  * in DataFrames, schema, mapPartitions batch shape, per-partition
  * amortized "decoder" initialization, feature vectors, frame explosion —
  * is the real Spark plumbing a production decode path would use. Swap
  * `FakeCodec` for a real codec (JavaCV/TwelveMonkeys) without touching
  * the operator shapes.
  *
  * Scale design: decode/features are mapPartitions (no shuffle, codec
  * init amortized per partition, batch-iterator form identical to
  * mapInPandas' batch shape); frame sampling uses explode on a bounded
  * sequence; all outputs carry asset_id so downstream joins co-partition.
  */
object Multimodal {

  case class Asset(asset_id: Long, kind: String, bytes: Array[Byte])
  case class Meta(asset_id: Long, kind: String, width: Int, height: Int,
      n_frames: Int, payload_len: Int)
  case class Feature(asset_id: Long, feature: Array[Float])

  private val Magic: Int = 0x47465442 // "GFTB"

  /** The stand-in codec. A real implementation would decode actual media;
    * this one writes/parses a deterministic 16-byte header:
    * [magic, width, height, n_frames] big-endian + payload bytes.
    */
  object FakeCodec {
    def encode(width: Int, height: Int, nFrames: Int, payload: Array[Byte]): Array[Byte] = {
      val buf = ByteBuffer.allocate(16 + payload.length)
      buf.putInt(Magic).putInt(width).putInt(height).putInt(nFrames).put(payload)
      buf.array()
    }

    /** STUB: real codecs would decode pixels/samples here. */
    def decodeHeader(bytes: Array[Byte]): Option[(Int, Int, Int, Int)] = {
      if (bytes.length < 16) return None
      val buf = ByteBuffer.wrap(bytes)
      if (buf.getInt() != Magic) None
      else Some((buf.getInt(), buf.getInt(), buf.getInt(), bytes.length - 16))
    }

    /** STUB feature extractor: a real model would embed decoded content;
      * this derives a deterministic pseudo-embedding from payload bytes so
      * the plumbing (fixed-dim float vectors per asset) is testable.
      */
    def features(bytes: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var i = 0
      while (i < bytes.length) {
        out(i % dim) += (bytes(i) & 0xff) / 255.0f
        i += 1
      }
      out
    }
  }

  /** Deterministic synthetic asset table (no driver table has binary
    * columns): kinds rotate image/audio/video; sizes vary by id.
    */
  def assets(spark: SparkSession, n: Long): Dataset[Asset] = {
    import spark.implicits._
    // volume-sized generation partitions (see Nexmark.genSlices): the
    // 2k-asset catalog run otherwise fans every downstream stage into
    // defaultParallelism tasks of ~60 rows, all per-task fixed cost
    spark.range(0, n, 1, graft.sources.Nexmark.genSlices(spark, n)).map { id =>
      val rng = new graft.sources.Nexmark.Rng(id)
      val kind = Seq("image", "audio", "video")((id % 3).toInt)
      val (w, h, f) = kind match {
        case "image" => (64 + rng.nextInt(512), 64 + rng.nextInt(512), 1)
        case "audio" => (0, 0, 1 + rng.nextInt(1000))
        case "video" => (320, 240, 1 + rng.nextInt(120))
      }
      val payload = new Array[Byte](64 + rng.nextInt(192))
      var i = 0
      while (i < payload.length) { payload(i) = (rng.nextLong() & 0xff).toByte; i += 1 }
      Asset(id, kind, FakeCodec.encode(w, h, f, payload))
    }
  }

  /** Decode metadata from the binary column — mapPartitions so a real
    * codec would init once per partition, not per row.
    */
  def decodeMeta(assets: Dataset[Asset]): Dataset[Meta] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // (real codec handle would be created here, once per partition)
      it.flatMap { a =>
        FakeCodec.decodeHeader(a.bytes).map { case (w, h, f, len) =>
          Meta(a.asset_id, a.kind, w, h, f, len)
        }
      }
    }
  }

  /** Fixed-dim feature vectors per asset (batch-iterator shape). */
  def extractFeatures(assets: Dataset[Asset], dim: Int): Dataset[Feature] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map(a => Feature(a.asset_id, FakeCodec.features(a.bytes.drop(16), dim)))
    }
  }

  /** Integer feature vectors: per-dim SUMS of payload bytes (exact, so the
    * DuckDB oracle recomputes them from the hex dump bit-for-bit — the
    * float variant above accumulates in float32, which no independent
    * engine reproduces).
    */
  def extractFeaturesInt(assets: Dataset[Asset], dim: Int): DataFrame = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val payload = a.bytes.drop(16)
        val out = new Array[Long](dim)
        var i = 0
        while (i < payload.length) {
          out(i % dim) += (payload(i) & 0xff)
          i += 1
        }
        (a.asset_id, out)
      }
    }.toDF("asset_id", "feature")
  }

  /** Frame sampling: one output row per sampled frame index (video/audio
    * assets), bounded explode — no driver-side loops.
    */
  def sampleFrames(meta: Dataset[Meta], everyN: Int): DataFrame = {
    import meta.sparkSession.implicits._
    meta.toDF()
      .filter($"n_frames" > 1)
      .withColumn("frame_idx",
        explode(sequence(lit(0), $"n_frames" - 1, lit(everyN))))
      .select($"asset_id", $"kind", $"frame_idx")
  }

  /** "Resize": rewrite header dims, payload untouched (STUB for a real
    * pixel resample), preserving binary-column shape.
    */
  def resize(assets: Dataset[Asset], w: Int, h: Int): Dataset[Asset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        FakeCodec.decodeHeader(a.bytes) match {
          case Some((_, _, f, _)) =>
            a.copy(bytes = FakeCodec.encode(w, h, f, a.bytes.drop(16)))
          case None => a
        }
      }
    }
  }

  /** Average-hash (aHash) of the "decoded" content: mean-threshold the
    * first 64 payload bytes (the stub's pixels) into a 64-bit
    * fingerprint. A real pipeline computes this over downsampled
    * grayscale pixels; the thresholding, banding, and Hamming-verify
    * below are exactly that pipeline's shape.
    */
  private[operators] def ahash64(payload: Array[Byte]): Long = {
    var sum = 0L
    var i = 0
    while (i < 64) { sum += (payload(i) & 0xff); i += 1 }
    val avg = sum / 64
    var h = 0L
    i = 0
    while (i < 64) {
      if ((payload(i) & 0xff) > avg) h |= (1L << i)
      i += 1
    }
    h
  }

  /** Re-crawl with visible corruption: every 16th byte of the FIRST 64
    * payload bytes is bumped by 48 (mod 256) — the "same image,
    * re-encoded with loss" scenario whose fingerprints differ by a few
    * bits, not zero (zero bits moved is mm_dedup's exact-payload case;
    * +1 bumps almost never cross the mean threshold). The 64-byte bound
    * keeps this byte-identical to the mm_phash_dedup oracle, which
    * corrupts exactly `generate_series(1, 64)` of the payload — bumping
    * the whole payload was equivalent only because ahash64 reads just
    * those bytes, and would diverge silently under any full-payload hash.
    */
  private def recrawlNoisy(a: Asset): Asset = {
    // Unconditional corrupt+rename (header bytes kept verbatim): the
    // mm_phash_dedup oracle emits a +100000 noisy copy for EVERY sampled
    // asset_id, so an undecodable asset must still rename — a same-id
    // passthrough would silently diverge if corrupt assets ever appear.
    val p = a.bytes.drop(16)
    val q = new Array[Byte](p.length)
    var j = 0
    while (j < p.length) {
      q(j) = if (j % 16 == 0 && j < 64) ((p(j) + 48) & 0xff).toByte else p(j)
      j += 1
    }
    Asset(a.asset_id + 100000L, a.kind, a.bytes.take(16) ++ q)
  }

  /** Catalog entries (synthetic assets — sfDir-independent, rows-only). */
  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_decode_meta" -> ((s, _) =>
      decodeMeta(assets(s, 2000)).toDF()
        .orderBy(col("asset_id"))),
    // resize → re-decode: headers rewritten to 32×24, frame count and
    // payload bytes preserved, corrupt assets passed through untouched
    // (and thus still undecodable). The oracle recomputes the expected
    // post-resize metadata from the dumped pre-resize bytes.
    "mm_resize" -> ((s, _) =>
      decodeMeta(resize(assets(s, 2000), 32, 24)).toDF()
        .orderBy(col("asset_id"))),
    // feature arrays are scalarized (dim + L2 norm + first element) — the
    // driver's compare sorts/hashes output columns, and a raw float array
    // column is unhashable there; the full vector path is exercised in
    // VectorOps and the specs.
    "mm_features" -> ((s, _) =>
      extractFeatures(assets(s, 2000), 32).toDF()
        .select(col("asset_id"),
          size(col("feature")).cast("long").as("dim"),
          round(sqrt(aggregate(transform(col("feature"),
            x => x.cast("double") * x.cast("double")),
            lit(0.0), (acc, x) => acc + x)), 3).as("l2_norm"),
          round(element_at(col("feature"), 1).cast("double"), 3).as("f0"))
        .orderBy(col("asset_id"))),
    "mm_frame_sample" -> ((s, _) =>
      sampleFrames(decodeMeta(assets(s, 2000)), 10)
        .withColumn("frame_idx", col("frame_idx").cast("long"))
        .orderBy(col("asset_id"), col("frame_idx"))),
    "mm_features_int" -> ((s, _) =>
      extractFeaturesInt(assets(s, 2000), 32)
        .select(col("asset_id"),
          element_at(col("feature"), 1).as("f0"),
          element_at(col("feature"), 2).as("f1"),
          element_at(col("feature"), 32).as("f31"),
          aggregate(col("feature"), lit(0L), (acc, x) => acc + x).as("total"))
        .orderBy(col("asset_id"))),
    // perceptual near-dup: the re-crawled copies carry slightly CORRUPTED
    // payloads (exact dedup misses them); aHash fingerprints band into
    // 4×16-bit LSH buckets, candidates verify by Hamming ≤ 8. Only the
    // 8-byte fingerprint ever shuffles — the image near-dup shape at
    // 100 TB. Fully oracled: DuckDB recomputes the hash, the corrupted
    // copies, the banding, and the verify from the dumped hex bytes.
    "mm_phash_dedup" -> ((s, _) => {
      import s.implicits._
      val base = assets(s, 2000)
      val all = base.union(
        base.filter(col("asset_id") % 10 === 0).map(recrawlNoisy))
      val hashed = all.mapPartitions { it =>
        it.map(a => (a.asset_id, ahash64(a.bytes.drop(16))))
      }.toDF("asset_id", "h")
      val banded = hashed.select(col("asset_id"), col("h"),
        explode(expr(
          "transform(sequence(0, 3), k -> struct(k, shiftright(h, CAST(16*k AS INT)) & CAST(65535 AS BIGINT) AS bval))"
        )).as("b"))
        .select(col("asset_id"), col("h"), col("b.k"), col("b.bval"))
      banded.as("a")
        .join(banded.as("b"),
          col("a.k") === col("b.k") && col("a.bval") === col("b.bval") &&
            col("a.asset_id") < col("b.asset_id"))
        .select(col("a.asset_id").as("id1"), col("b.asset_id").as("id2"),
          col("a.h").as("h1"), col("b.h").as("h2"))
        .distinct()
        .withColumn("hamming",
          bit_count(col("h1").bitwiseXOR(col("h2"))).cast("long"))
        .filter(col("hamming") <= 8)
        .select(col("id1"), col("id2"), col("hamming"))
        .orderBy(col("id1"), col("id2"))
    }),
    // binary-content dedup: a 1-in-10 subset is re-ingested under new ids
    // (the re-crawl scenario); grouping on the payload hash finds each
    // duplicate family and keeps the smallest id. Only the 16-byte-ish
    // hash shuffles, never the payload — the binary-column dedup shape
    // at 100 TB.
    "mm_dedup" -> ((s, _) => {
      val base = assets(s, 2000).toDF()
      val recrawled = base.filter(col("asset_id") % 10 === 0)
        .withColumn("asset_id", col("asset_id") + 100000L)
      base.union(recrawled)
        .withColumn("h", md5(hex(col("bytes"))))
        .groupBy(col("h"))
        .agg(min(col("asset_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .groupBy(col("n_copies"))
        .agg(count(lit(1)).as("n_groups"), min(col("keep_id")).as("min_keep"))
        .orderBy(col("n_copies"))
    })
  )

  /** Oracle inputs: decoded metadata (for the frame-sampling recompute)
    * and the raw asset bytes as hex strings — DuckDB re-parses the
    * big-endian header from the hex independently, so the decode path IS
    * cross-checked even without a codec in the container.
    */
  def dumpOracleInputs(s: SparkSession): Unit = {
    decodeMeta(assets(s, 2000)).toDF().coalesce(1).write.mode("overwrite")
      .parquet(s"${NexmarkQueries.DumpDir}/mm_meta.parquet")
    assets(s, 2000).toDF()
      .select(col("asset_id"), col("kind"), hex(col("bytes")).as("hexb"))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${NexmarkQueries.DumpDir}/mm_assets_hex.parquet")
  }

  def oracles: Map[String, String] = Map(
    // float32 replay: DuckDB REAL arithmetic is true fp32 per op
    // (validated against the JVM/numpy), so the stub extractor's
    // sequential `acc += byte/255.0f` fold is reproduced exactly with a
    // list_reduce over each dimension's byte subsequence; the scalarized
    // outputs then agree bit-for-bit before their round(3).
    "mm_features" ->
      s"""WITH b AS (
           SELECT asset_id, substring(hexb, 33) AS ph
           FROM read_parquet('${NexmarkQueries.DumpDir}/mm_assets_hex.parquet/*.parquet')),
         e AS (
           SELECT asset_id, length(ph)//2 AS n,
             list_transform(generate_series(1, length(ph)//2),
               i -> ('0x' || substring(ph, i*2 - 1, 2))::UBIGINT::INTEGER) AS pb
           FROM b),
         fv AS (
           SELECT asset_id, d.d,
             list_reduce(list_prepend(0::REAL,
               list_transform(generate_series(0, (n - d.d - 1)//32),
                 j -> pb[d.d + 32*j + 1])),
               (a, x) -> (a::REAL + (x::REAL / 255::REAL)::REAL)::REAL) AS v
           FROM e CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS d) d),
         vl AS (SELECT asset_id, list(v ORDER BY d) AS feat FROM fv GROUP BY 1)
         SELECT asset_id, CAST(32 AS BIGINT) AS dim,
           round(sqrt(list_reduce(list_prepend(0::DOUBLE,
             list_transform(feat, x -> x::DOUBLE * x::DOUBLE)),
             (a, x) -> a + x)), 3) AS l2_norm,
           round(feat[1]::DOUBLE, 3) AS f0
         FROM vl ORDER BY asset_id""",
    "mm_phash_dedup" ->
      s"""WITH b AS (
           SELECT asset_id, substring(hexb, 33) AS ph
           FROM read_parquet('${NexmarkQueries.DumpDir}/mm_assets_hex.parquet/*.parquet')),
         e AS (
           SELECT asset_id, list_transform(generate_series(1, 64),
             i -> ('0x' || substring(ph, i*2 - 1, 2))::UBIGINT) AS p64
           FROM b),
         allp AS (
           SELECT asset_id, p64 FROM e
           UNION ALL
           SELECT asset_id + 100000,
             list_transform(generate_series(1, 64),
               i -> CASE WHEN (i - 1) % 16 = 0 THEN (p64[i] + 48) % 256
                    ELSE p64[i] END) AS p64
           FROM e WHERE asset_id % 10 = 0),
         hh AS (
           SELECT asset_id, p64, list_sum(p64) // 64 AS avg FROM allp),
         hsh AS (
           SELECT asset_id,
             CAST(list_sum(list_transform(generate_series(1, 64),
               i -> CASE WHEN p64[i] > avg THEN 1::HUGEINT << (i - 1)
                    ELSE 0::HUGEINT END)) AS UBIGINT) AS h
           FROM hh),
         bv AS (
           SELECT asset_id, h, k, (h >> CAST(16*k AS INTEGER)) & 65535 AS bval
           FROM (SELECT asset_id, h, unnest([0, 1, 2, 3]) AS k FROM hsh)),
         cand AS (
           SELECT DISTINCT a.asset_id AS id1, b.asset_id AS id2,
             a.h AS h1, b.h AS h2
           FROM bv a JOIN bv b
             ON a.k = b.k AND a.bval = b.bval AND a.asset_id < b.asset_id)
         SELECT id1, id2, CAST(bit_count(xor(h1, h2)) AS BIGINT) AS hamming
         FROM cand WHERE bit_count(xor(h1, h2)) <= 8
         ORDER BY id1, id2""",
    "mm_dedup" ->
      s"""WITH a AS (
           SELECT asset_id, hexb
           FROM read_parquet('${NexmarkQueries.DumpDir}/mm_assets_hex.parquet/*.parquet')),
         all_a AS (
           SELECT asset_id, hexb FROM a
           UNION ALL
           SELECT asset_id + 100000, hexb FROM a WHERE asset_id % 10 = 0),
         g AS (
           SELECT md5(hexb) AS h, min(asset_id) AS keep_id,
             count(*) AS n_copies
           FROM all_a GROUP BY 1)
         SELECT CAST(n_copies AS BIGINT) AS n_copies,
           CAST(count(*) AS BIGINT) AS n_groups,
           min(keep_id) AS min_keep
         FROM g GROUP BY 1 ORDER BY 1""",
    "mm_decode_meta" ->
      s"""SELECT asset_id, kind,
         CAST(('0x' || substring(hexb, 9, 8))::UBIGINT AS INTEGER) AS width,
         CAST(('0x' || substring(hexb, 17, 8))::UBIGINT AS INTEGER) AS height,
         CAST(('0x' || substring(hexb, 25, 8))::UBIGINT AS INTEGER) AS n_frames,
         CAST((length(hexb) - 32) // 2 AS INTEGER) AS payload_len
         FROM read_parquet('${NexmarkQueries.DumpDir}/mm_assets_hex.parquet/*.parquet')
         WHERE length(hexb) >= 32 AND substring(hexb, 1, 8) = '47465442'
         ORDER BY asset_id""",
    "mm_resize" ->
      s"""SELECT asset_id, kind,
         CAST(32 AS INTEGER) AS width, CAST(24 AS INTEGER) AS height,
         CAST(('0x' || substring(hexb, 25, 8))::UBIGINT AS INTEGER) AS n_frames,
         CAST((length(hexb) - 32) // 2 AS INTEGER) AS payload_len
         FROM read_parquet('${NexmarkQueries.DumpDir}/mm_assets_hex.parquet/*.parquet')
         WHERE length(hexb) >= 32 AND substring(hexb, 1, 8) = '47465442'
         ORDER BY asset_id""",
    "mm_frame_sample" ->
      s"""SELECT asset_id, kind,
         unnest(generate_series(0, CAST(n_frames AS BIGINT) - 1, 10)) AS frame_idx
         FROM read_parquet('${NexmarkQueries.DumpDir}/mm_meta.parquet/*.parquet')
         WHERE n_frames > 1 ORDER BY asset_id, frame_idx""",
    "mm_features_int" ->
      s"""WITH b AS (
           SELECT asset_id, substring(hexb, 33) AS ph
           FROM read_parquet('${NexmarkQueries.DumpDir}/mm_assets_hex.parquet/*.parquet')),
         e AS (
           SELECT asset_id, list_transform(generate_series(1, length(ph) // 2),
             i -> CAST(('0x' || substring(ph, i*2 - 1, 2))::UBIGINT AS BIGINT)) AS bytes
           FROM b)
         SELECT asset_id,
           CAST(list_sum(list_transform(generate_series(1, len(bytes)),
             i -> CASE WHEN (i - 1) % 32 = 0 THEN bytes[i] ELSE 0 END)) AS BIGINT) AS f0,
           CAST(list_sum(list_transform(generate_series(1, len(bytes)),
             i -> CASE WHEN (i - 1) % 32 = 1 THEN bytes[i] ELSE 0 END)) AS BIGINT) AS f1,
           CAST(list_sum(list_transform(generate_series(1, len(bytes)),
             i -> CASE WHEN (i - 1) % 32 = 31 THEN bytes[i] ELSE 0 END)) AS BIGINT) AS f31,
           CAST(list_sum(bytes) AS BIGINT) AS total
         FROM e ORDER BY asset_id"""
  )
}
