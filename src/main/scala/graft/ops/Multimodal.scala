package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._
import QuerySpec.sql

/** An opaque binary media asset with typed metadata — the schema shape
  * a multimodal training pipeline carries image/audio/video in. */
final case class MediaAsset(asset_id: Long, modality: String, bytes: Array[Byte])

/** One feature row emitted by the (stubbed) decoder. */
final case class AssetFeature(asset_id: Long, bucket: Int, cnt: Long)

/** Multimodal-column plumbing: binary payload columns + typed metadata,
  * a `Dataset[MediaAsset]` decode stage over `mapPartitions`, and
  * byte-level sampling — the Spark-side architecture of an image/audio
  * pipeline with the codec itself stubbed (no media libraries in this
  * environment; see [[RealCodecs]]).
  *
  * The fixture: `documents.text` encoded as UTF-8 bytes stands in for
  * the media payload. DuckDB lacks BLOB substring/md5, so the oracles
  * check byte-level results through the payload's hex dump (byte i ==
  * hex chars 2i-1..2i) — exact for ANY text, multibyte included
  * (enforced by the UTF-8 fixture gate, tools/make_utf8_fixture.py).
  * A real deployment swaps the payload source for the binary column of
  * an image/audio table; nothing downstream changes.
  *
  * Scale design: assets stay in their scan partitions end-to-end —
  * decode is `mapPartitions` (no shuffle, codec init amortized per
  * partition, the standard pattern for heavyweight per-record codecs);
  * per-asset stats are pure expressions; only the final histogram
  * explode aggregates (hash-partitioned on asset_id). Payload bytes are
  * never collected, never a join key, and pruned as soon as features
  * are extracted.
  */
object Multimodal {

  /** Real codecs, JDK-only: `javax.imageio` decodes PNG/BMP/GIF/JPEG
    * and `javax.sound.sampled` decodes WAV PCM without any external
    * library, so the image and audio paths are REAL here (exercised by
    * mm_image_dims and MultimodalCodecSpec). Video: no JDK H.264/VP9
    * codec exists and this environment can't add one, so the container
    * is ours ([[RealCodecs.encodeFrameContainer]], length-prefixed PNG
    * frames) — but the frame-sampling pipeline is real end-to-end
    * (container parse, seek past skipped frames, per-frame ImageIO
    * decode; mm_frame_sample + MultimodalCodecSpec). A real demuxer
    * swaps in at the header-arithmetic layer only. */
  object RealCodecs {
    /** Image decode → (width, height, color components). */
    def decodeImage(bytes: Array[Byte]): (Int, Int, Int) = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      require(img != null, "payload is not a decodable image")
      (img.getWidth, img.getHeight, img.getColorModel.getNumComponents)
    }

    /** PNG encode of an RGB pixel-byte stream (cycled to fill w×h) —
      * the synthesis half of the round-trip mm_image_dims verifies. */
    def encodePng(width: Int, height: Int, pixelSource: Array[Byte]): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        width, height, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      val raster = img.getRaster
      var i = 0
      // empty payload ⇒ a black image, not an index-out-of-bounds
      val src = if (pixelSource.isEmpty) Array[Byte](0) else pixelSource
      val n = src.length
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          raster.setSample(x, y, 0, src(i % n) & 0xff); i += 1
          raster.setSample(x, y, 1, src(i % n) & 0xff); i += 1
          raster.setSample(x, y, 2, src(i % n) & 0xff); i += 1
          x += 1
        }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }

    /** WAV (PCM 16-bit) decode → sample array (first channel order as
      * interleaved in the stream). */
    def decodeAudio(bytes: Array[Byte]): Array[Short] = {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        require(fmt.getSampleSizeInBits == 16, s"want 16-bit PCM, got $fmt")
        val raw = in.readAllBytes()
        val bb = java.nio.ByteBuffer.wrap(raw).order(
          if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
          else java.nio.ByteOrder.LITTLE_ENDIAN)
        val out = new Array[Short](raw.length / 2)
        var i = 0
        while (i < out.length) { out(i) = bb.getShort(); i += 1 }
        out
      } finally in.close()
    }

    /** WAV encode of 16-bit mono PCM at `sampleRate` Hz — the synthesis
      * half of the audio round-trip (MultimodalCodecSpec). */
    def encodeWav(samples: Array[Short], sampleRate: Float = 8000f): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1, true, false)
      val bb = java.nio.ByteBuffer.allocate(samples.length * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      samples.foreach(bb.putShort)
      val stream = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(bb.array()), fmt, samples.length.toLong)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        stream, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }

    /** Container for the frame-sampling path: a length-prefixed
      * sequence of PNG frames (`[n_frames: int32][len_i: int32,
      * png_i bytes]*`, big-endian). The JDK has no H.264/VP9 codec and
      * this offline build can't add one, so a REAL video container
      * stays out of reach — but everything around it is real here:
      * container parse, per-frame ImageIO decode, every-k-th frame
      * selection. Swapping in a real demuxer changes only the header
      * arithmetic. */
    def encodeFrameContainer(frames: Seq[Array[Byte]]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      val dos = new java.io.DataOutputStream(out)
      dos.writeInt(frames.length)
      frames.foreach { f => dos.writeInt(f.length); dos.write(f) }
      out.toByteArray
    }

    /** Every k-th frame of a [[encodeFrameContainer]] payload, DECODED
      * with the real ImageIO codec — (frame index, width, height).
      * Frames the sampler skips are never decoded (the point of
      * sampling: seek past them by the length prefix). */
    def sampleFrames(bytes: Array[Byte], everyK: Int): Iterator[(Int, Int, Int)] = {
      val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
      val n = in.readInt()
      (0 until n).iterator.map { i =>
        val len = in.readInt()
        if (i % everyK == 0) {
          val frame = new Array[Byte](len)
          in.readFully(frame)
          val (w, h, _) = decodeImage(frame)
          Some((i, w, h))
        } else { in.skipNBytes(len.toLong); None }
      }.flatten
    }
  }

  /** documents → typed assets: payload bytes + synthetic modality. */
  def assets(s: SparkSession, dir: String): Dataset[MediaAsset] = {
    import s.implicits._
    t(s, dir, "documents")
      .select(col("doc_id").as("asset_id"),
        expr("CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END")
          .as("modality"),
        encode(col("text"), "UTF-8").as("bytes"))
      .as[MediaAsset]
  }

  /** STUB feature extractor (deterministic fake decode): a 16-bucket
    * histogram of the payload's high nibbles. Replace the body with a
    * [[RealCodecs]] call to productionize; the partitioning, schema,
    * and batch shape are the real thing. */
  def nibbleHistogram(ds: Dataset[MediaAsset]): Dataset[AssetFeature] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { assets =>
      // per-partition scope: a real codec would be initialized once here
      assets.flatMap { a =>
        val counts = new Array[Long](16)
        var i = 0
        while (i < a.bytes.length) {
          counts((a.bytes(i) & 0xff) >> 4) += 1
          i += 1
        }
        (0 until 16).iterator
          .filter(counts(_) > 0)
          .map(b => AssetFeature(a.asset_id, b, counts(b)))
      }
    }
  }

  /** Typed UDAF (Aggregator) surface: merges byte-nibble histograms
    * across assets — the partial/merge/finish shape a custom sketch
    * (HLL, MinHash, quantile digest) plugs into. Buffer is a fixed
    * 16-slot long array: constant-size state, map-side combinable.
    */
  object NibbleHistogramAgg
    extends org.apache.spark.sql.expressions.Aggregator[Array[Byte], Array[Long], Seq[Long]] {
    override def zero: Array[Long] = new Array[Long](16)
    override def reduce(buf: Array[Long], bytes: Array[Byte]): Array[Long] = {
      var i = 0
      while (i < bytes.length) { buf((bytes(i) & 0xff) >> 4) += 1; i += 1 }
      buf
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < 16) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(r: Array[Long]): Seq[Long] = r.toSeq
    override def bufferEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  val specs: Seq[QuerySpec] = Seq(

    // ---- corpus-level histogram via the typed UDAF: one partial
    // aggregation per partition, constant-size merge state ----
    sql("mm_modality_histogram",
      // byte-faithful oracle: DuckDB can't slice BLOBs, but byte i's
      // high nibble is hex digit 2i-1 of hex(encode(text)) — exact for
      // ANY text, not just ASCII (proven by the UTF-8 fixture gate)
      """WITH h AS (SELECT doc_id, upper(hex(encode(text))) AS hx FROM documents),
        |nibs AS (
        |  SELECT doc_id,
        |         strpos('0123456789ABCDEF', substring(hx, 2 * i - 1, 1)) - 1 AS bucket
        |  FROM h, UNNEST(range(1, length(hx) // 2 + 1)) AS t(i))
        |SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
        |            WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
        |       CAST(bucket AS INT) AS bucket,
        |       CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM nibs GROUP BY 1, 2
        |ORDER BY modality, bucket""") { (s, dir) =>
      val hist = udaf(NibbleHistogramAgg, org.apache.spark.sql.Encoders.BINARY)
      assets(s, dir).toDF()
        .groupBy(col("modality"))
        .agg(hist(col("bytes")).as("hist"))
        .select(col("modality"), posexplode(col("hist")).as(Seq("bucket", "cnt")))
        .filter(col("cnt") > 0)
        .select(col("modality"), col("bucket").cast("int").as("bucket"),
          col("cnt").cast("long").as("cnt"))
        .orderBy(col("modality"), col("bucket"))
    },

    // ---- per-asset payload stats: byte length + content digest ----
    sql("mm_asset_stats",
      """SELECT doc_id AS asset_id,
        |       CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
        |            WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |       md5(text) AS content_md5
        |FROM documents ORDER BY asset_id""") { (s, dir) =>
      assets(s, dir).toDF()
        .select(col("asset_id"), col("modality"),
          length(col("bytes")).cast("long").as("n_bytes"),
          md5(col("bytes")).as("content_md5"))
        .orderBy(col("asset_id"))
    },

    // ---- frame-sampling shape: an 8-byte probe every 64 bytes ----
    sql("mm_chunk_sample",
      // byte offsets, not character offsets: the 8-byte probe at byte
      // pos i is hex chars [2i-1, 2i+14] of the payload's hex dump
      """WITH a AS (SELECT doc_id, upper(hex(encode(text))) AS hx,
        |                  octet_length(encode(text)) AS n
        |           FROM documents WHERE octet_length(encode(text)) >= 8),
        |probes AS (SELECT doc_id, CAST(i AS INT) AS pos,
        |                  substring(hx, 2 * i - 1, 16) AS chunk_hex
        |           FROM a, UNNEST(range(1, n - 6, 64)) AS t(i))
        |SELECT doc_id AS asset_id, pos, chunk_hex
        |FROM probes ORDER BY asset_id, pos""") { (s, dir) =>
      assets(s, dir).toDF()
        .filter(length(col("bytes")) >= 8)
        .select(col("asset_id"), col("bytes"),
          posexplode(expr("sequence(1, length(bytes) - 7, 64)")).as(Seq("i", "pos")))
        .select(col("asset_id"), col("pos").cast("int").as("pos"),
          upper(hex(expr("substring(bytes, pos, 8)"))).as("chunk_hex"))
        .orderBy(col("asset_id"), col("pos"))
    },

    // ---- duplicate assets by leading-chunk digest: md5 keyed on the
    // first 80 payload bytes — the header/magic-bytes heuristic that
    // catches re-encoded or truncated copies of the same asset (a
    // whole-payload digest finds only bit-exact dups). One hash
    // aggregation; bytes never shuffle, only the digest. ----
    sql("mm_dup_assets",
      // digest := md5 of the UPPERCASE HEX of the first 80 payload
      // bytes (not md5 of the raw bytes): DuckDB's md5 only accepts
      // VARCHAR and an 80-byte prefix can split a multibyte char, so
      // both engines hash the same ASCII hex dump instead — still
      // keyed on exactly the first 80 bytes of content
      """SELECT md5(upper(substring(hex(encode(text)), 1, 160))) AS chunk_md5,
        |       CAST(COUNT(*) AS BIGINT) AS n_assets,
        |       CAST(MIN(doc_id) AS BIGINT) AS canonical_asset
        |FROM documents GROUP BY 1 HAVING COUNT(*) > 1
        |ORDER BY chunk_md5""") { (s, dir) =>
      assets(s, dir).toDF()
        .groupBy(md5(upper(hex(expr("substring(bytes, 1, 80)")))).as("chunk_md5"))
        .agg(count(lit(1)).cast("long").as("n_assets"),
          min(col("asset_id")).cast("long").as("canonical_asset"))
        .filter(col("n_assets") > 1)
        .orderBy(col("chunk_md5"))
    },

    // ---- REAL image decode end-to-end: synthesize a PNG per sampled
    // asset (dims are deterministic functions of doc_id, pixels fed
    // from the payload bytes), then recover the dims with the REAL
    // ImageIO decoder inside mapPartitions. The oracle recomputes the
    // expected dims arithmetically — a wrong decode (or a codec that
    // didn't run) breaks the hash. Sampled 1-in-29 because encode+
    // decode is the genuinely expensive per-record path; at scale this
    // runs where the rows live, zero shuffle before the final sort. ----
    sql("mm_image_dims",
      """SELECT doc_id AS asset_id,
        |       CAST(16 + doc_id % 16 AS INT) AS width,
        |       CAST(8 + doc_id % 8 AS INT) AS height,
        |       CAST(3 AS INT) AS channels
        |FROM documents WHERE doc_id % 29 = 0 ORDER BY asset_id""") { (s, dir) =>
      import s.implicits._
      t(s, dir, "documents")
        .filter(col("doc_id") % 29 === 0)
        // NULL text ⇒ empty payload ⇒ black image with the same dims,
        // matching the oracle (which derives dims from doc_id alone)
        .select(col("doc_id"),
          encode(coalesce(col("text"), lit("")), "UTF-8").as("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions { docs =>
          // per-partition scope: ImageIO plugin lookup warms once here
          docs.map { case (id, payload) =>
            val png = RealCodecs.encodePng(
              (16 + id % 16).toInt, (8 + id % 8).toInt, payload)
            val (w, h, ch) = RealCodecs.decodeImage(png)
            (id, w, h, ch)
          }
        }
        .toDF("asset_id", "width", "height", "channels")
        .orderBy(col("asset_id"))
    },

    // ---- image RESIZE (the thumbnail/feature-extract step of a
    // vision-data pipeline): encode → REAL ImageIO decode →
    // deterministic nearest-neighbor downscale to 8×4 → integer pixel
    // sum of the thumbnail. The oracle replays the sampling lattice
    // arithmetically (sample (x,y,c) reads source byte
    // (3·(⌊y·h0/4⌋·w0 + ⌊x·w0/8⌋) + c) mod n, byte values recovered
    // from the hex dump — the round-4 BLOB discipline). Per-record
    // work stays in the scan partition; only (id, dims, sum) rows
    // move. ----
    sql("mm_image_resize",
      """WITH h AS (
        |  SELECT doc_id, upper(hex(encode(text))) AS hx,
        |         CAST(16 + doc_id % 16 AS BIGINT) AS w0,
        |         CAST(8 + doc_id % 8 AS BIGINT) AS h0,
        |         coalesce(octet_length(encode(text)), 0) AS n
        |  FROM documents WHERE doc_id % 29 = 0),
        |samp AS (
        |  SELECT doc_id, hx, n,
        |         (3 * ((y * h0 // 4) * w0 + (x * w0 // 8)) + c)
        |           % greatest(n, 1) AS idx
        |  FROM h, UNNEST(range(0, 8)) AS tx(x), UNNEST(range(0, 4)) AS ty(y),
        |       UNNEST(range(0, 3)) AS tc(c)),
        |bv AS (
        |  SELECT doc_id,
        |         CASE WHEN n > 0 THEN
        |           (strpos('0123456789ABCDEF',
        |                   substring(hx, CAST(2 * idx + 1 AS INT), 1)) - 1) * 16
        |         + (strpos('0123456789ABCDEF',
        |                   substring(hx, CAST(2 * idx + 2 AS INT), 1)) - 1)
        |         ELSE 0 END AS v
        |  FROM samp)
        |SELECT doc_id AS asset_id, CAST(8 AS INT) AS width,
        |       CAST(4 AS INT) AS height,
        |       CAST(SUM(v) AS BIGINT) AS pix_sum
        |FROM bv GROUP BY doc_id ORDER BY asset_id""") { (s, dir) =>
      import s.implicits._
      t(s, dir, "documents")
        .filter(col("doc_id") % 29 === 0)
        .select(col("doc_id"),
          encode(coalesce(col("text"), lit("")), "UTF-8").as("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions { docs =>
          docs.map { case (id, payload) =>
            val w0 = (16 + id % 16).toInt
            val h0 = (8 + id % 8).toInt
            val png = RealCodecs.encodePng(w0, h0, payload)
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(png))
            var sum = 0L
            var y = 0
            while (y < 4) {
              var x = 0
              while (x < 8) {
                // nearest-neighbor: floor-sample the source lattice
                val rgb = img.getRGB(x * w0 / 8, y * h0 / 4)
                sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
                x += 1
              }
              y += 1
            }
            (id, 8, 4, sum)
          }
        }
        .toDF("asset_id", "width", "height", "pix_sum")
        .orderBy(col("asset_id"))
    },

    // ---- perceptual-hash image NEAR-dup (average hash / aHash — the
    // pHash-family baseline every image-dedup pipeline ships):
    // mm_dup_assets catches byte-identical payloads; this catches
    // VISUALLY-near duplicates. Per asset: REAL ImageIO decode, a
    // nearest-neighbor 8×8 thumbnail lattice (the textbook aHash
    // shape), per-cell luminance g = r+g+b, bit (y·8+x) set iff
    // g > ⌊Σg/64⌋ — a 64-bit signature from real decoded pixels,
    // carried as two non-negative 32-bit halves (lo, hi) so both
    // engines compute identical integers without 1<<63 sign games.
    //
    // Round-11 rework, from a MEASURED failure: the previous 32-bit
    // (8×4) signature at verify radius 6 passed ~2.7e-4 of RANDOM
    // pairs (Σ_{i≤6} C(32,i)/2³² ), so the OUTPUT itself grew
    // quadratically — 71 rows at 500 docs but 604,874 at 50k, almost
    // all noise, and the 4-5-bit band keys (≤ 32 values) made the
    // candidate join ~n²/5 (21 MINUTES at the 10× fixture). At 64
    // bits the same radius passes 4.3e-12 of random pairs — output
    // is only true thumbnail matches at any corpus size.
    //
    // Candidates via MULTI-INDEX HASHING (Norouzi/Punjani/Fleet 2012):
    // 4 exact 16-bit bands (the index), probed by each band key and
    // its 16 single-bit flips. Pigeonhole: ≤ 6 differing bits over 4
    // bands leave some band with ≤ ⌊6/4⌋ = 1 error, and a 1-error
    // band is one flip away — so every pair within the verify radius
    // meets in a probed bucket, EXACT recall (in fact through radius
    // 7). The probe stream is 4 bands × 17 keys = 68 rows/doc against
    // a 4-row/doc index over a 65,536-value key space: candidates
    // ≈ 68·n·(n/65536)·4ish ≈ n²/1000 vs the old n²/5 — and the
    // verify radius guarantee no longer fights the key width (7
    // exact bands over 32 bits forced ≤ 5-bit keys; probe expansion
    // buys the same guarantee with 16-bit keys). Decode cost is
    // per-RECORD in the scan partition (mapPartitions, zero shuffle
    // before the band exchange); the signature table the joins
    // exchange is 20 bytes a row regardless of image size — at
    // 100 TB the payloads never move, only hashes do.
    //
    // Round-11 second rework, again from a measured number (113 s at
    // the 100x fixture): image corpora collapse onto FAR fewer
    // distinct signatures than documents (500k docs -> 114k signatures
    // there — exact-duplicate thumbnails are the norm in a crawl), and
    // the MIH join cost is quadratic in rows-per-bucket, so running it
    // over doc rows pays the (docs/sigs)^2 ≈ 19x blowup for nothing.
    // Now: exact-dedup signatures FIRST (one shuffle; the min-doc_id
    // member represents its group), run MIH over DISTINCT signatures,
    // and expand verified rep pairs back through the two member sets;
    // same-signature pairs (hamming 0) come straight from the groups
    // with no index join at all. Result set PROVABLY identical:
    // members share their rep's bands, so the pigeonhole guarantee
    // transfers — the oracle is unchanged and the EXACT gate is the
    // proof. The residual quadratic lives in distinct-signature
    // space, which is the honest floor for exact radius-6 search
    // over 64-bit keys. ----
    sql("mm_phash_neardups",
      """WITH h AS (
        |  SELECT doc_id, upper(hex(encode(text))) AS hx,
        |         CAST(16 + doc_id % 16 AS BIGINT) AS w0,
        |         CAST(8 + doc_id % 8 AS BIGINT) AS h0,
        |         coalesce(octet_length(encode(text)), 0) AS n
        |  FROM documents),
        |samp AS (
        |  SELECT doc_id, hx, n, x, y,
        |         (3 * ((y * h0 // 8) * w0 + (x * w0 // 8)) + c)
        |           % greatest(n, 1) AS idx
        |  FROM h, UNNEST(range(0, 8)) AS tx(x), UNNEST(range(0, 8)) AS ty(y),
        |       UNNEST(range(0, 3)) AS tc(c)),
        |bv AS (
        |  SELECT doc_id, x, y,
        |         SUM(CASE WHEN n > 0 THEN
        |           (strpos('0123456789ABCDEF',
        |                   substring(hx, CAST(2 * idx + 1 AS INT), 1)) - 1) * 16
        |         + (strpos('0123456789ABCDEF',
        |                   substring(hx, CAST(2 * idx + 2 AS INT), 1)) - 1)
        |         ELSE 0 END) AS g
        |  FROM samp GROUP BY doc_id, x, y),
        |mn AS (SELECT doc_id, SUM(g) // 64 AS mean FROM bv GROUP BY doc_id),
        |ph AS MATERIALIZED (
        |  SELECT b.doc_id,
        |         CAST(SUM(CASE WHEN b.g > m.mean AND y < 4
        |           THEN CAST(1 AS BIGINT) << CAST(y * 8 + x AS INT)
        |           ELSE 0 END) AS BIGINT) AS lo,
        |         CAST(SUM(CASE WHEN b.g > m.mean AND y >= 4
        |           THEN CAST(1 AS BIGINT) << CAST((y - 4) * 8 + x AS INT)
        |           ELSE 0 END) AS BIGINT) AS hi
        |  FROM bv b JOIN mn m USING (doc_id) GROUP BY b.doc_id),
        |bk AS (
        |  SELECT doc_id, b,
        |         CASE b WHEN 0 THEN lo % 65536 WHEN 1 THEN lo // 65536
        |                WHEN 2 THEN hi % 65536 ELSE hi // 65536 END AS k
        |  FROM ph, UNNEST(range(0, 4)) AS tb(b)),
        |probe AS (
        |  SELECT doc_id, b,
        |         CASE WHEN f = 0 THEN k
        |              ELSE xor(k, 1 << CAST(f - 1 AS INT)) END AS k
        |  FROM bk, UNNEST(range(0, 17)) AS tf(f)),
        |cand AS (
        |  SELECT DISTINCT LEAST(p.doc_id, i.doc_id) AS asset_a,
        |                  GREATEST(p.doc_id, i.doc_id) AS asset_b
        |  FROM probe p JOIN bk i ON i.b = p.b AND i.k = p.k
        |    AND i.doc_id <> p.doc_id)
        |SELECT c.asset_a, c.asset_b,
        |       CAST(bit_count(xor(pa.lo, pb.lo))
        |          + bit_count(xor(pa.hi, pb.hi)) AS INT) AS hamming
        |FROM cand c
        |JOIN ph pa ON pa.doc_id = c.asset_a
        |JOIN ph pb ON pb.doc_id = c.asset_b
        |WHERE bit_count(xor(pa.lo, pb.lo)) + bit_count(xor(pa.hi, pb.hi)) <= 6
        |ORDER BY asset_a, asset_b""") { (s, dir) =>
      // memoized + localCheckpoint'd per fixture (TrainMemo): the
      // signature table is the persistable artifact of image dedup —
      // the codec pass is paid once per fixture per JVM, and the
      // index/probe/verify reads all serve from the checkpoint
      val ph = phashFrame(s, dir)
      // exact signature dedup: every doc joins its group's min-id rep
      val mem = ph.withColumn("sid",
        min(col("doc_id")).over(Window.partitionBy(col("lo"), col("hi"))))
        .select(col("sid"), col("doc_id"))
      val sigs = ph.withColumn("sid",
        min(col("doc_id")).over(Window.partitionBy(col("lo"), col("hi"))))
        .filter(col("doc_id") === col("sid"))
        .select(col("sid"), col("lo"), col("hi"))
      // hamming-0 pairs straight from the groups — no index join
      val withinGroup = mem.select(col("sid"), col("doc_id").as("asset_a"))
        .join(mem.select(col("sid"), col("doc_id").as("asset_b")), Seq("sid"))
        .filter(col("asset_a") < col("asset_b"))
        .select(col("asset_a"), col("asset_b"), lit(0).as("hamming"))
      // 4 exact 16-bit band keys per DISTINCT signature — the index
      val bk = sigs.select(col("sid"), posexplode(array(
        expr("lo % 65536"), expr("lo div 65536"),
        expr("hi % 65536"), expr("hi div 65536")).as("ks")).as(Seq("b", "k")))
      // probe side: each band key plus its 16 single-bit flips
      val probe = bk.select(col("sid").as("sa"), col("b"),
        explode(expr("transform(sequence(0, 16), " +
          "f -> CASE WHEN f = 0 THEN k " +
          "ELSE k ^ shiftleft(CAST(1 AS BIGINT), f - 1) END)")).as("k"))
      val cand = probe
        .join(bk.select(col("sid").as("sb"), col("b"), col("k")), Seq("b", "k"))
        .filter(col("sa") =!= col("sb"))
        .select(least(col("sa"), col("sb")).as("sa"),
          greatest(col("sa"), col("sb")).as("sb"))
        .distinct()
      // verify once per signature pair, then expand through members
      val sigPairs = cand
        .join(sigs.select(col("sid").as("sa"),
          col("lo").as("la"), col("hi").as("ha")), Seq("sa"))
        .join(sigs.select(col("sid").as("sb"),
          col("lo").as("lb"), col("hi").as("hb")), Seq("sb"))
        .withColumn("hamming",
          expr("CAST(bit_count(la ^ lb) + bit_count(ha ^ hb) AS INT)"))
        .filter(col("hamming") <= 6)
        .select(col("sa"), col("sb"), col("hamming"))
      val crossGroup = sigPairs
        .join(mem.select(col("sid").as("sa"), col("doc_id").as("da")), Seq("sa"))
        .join(mem.select(col("sid").as("sb"), col("doc_id").as("db")), Seq("sb"))
        .select(least(col("da"), col("db")).as("asset_a"),
          greatest(col("da"), col("db")).as("asset_b"), col("hamming"))
      withinGroup.unionAll(crossGroup)
        .select(col("asset_a"), col("asset_b"), col("hamming"))
        .orderBy(col("asset_a"), col("asset_b"))
    },

    // ---- REAL audio decode end-to-end: synthesize 16-bit mono WAV
    // per sampled asset (one sample per Unicode CODE POINT of the
    // text, (code − 64) · 256 wrapped to Short), decode it back with
    // the REAL javax.sound codec, emit sample count + peak/trough.
    // The oracle recomputes the expected stats arithmetically with
    // the identical wrap ((x+32768) % 65536 − 32768) — a decoder that
    // didn't run or mis-read the PCM stream breaks the hash.
    // Code-point granularity (not UTF-8 bytes, not UTF-16 units)
    // matches DuckDB's length()/ascii() for ANY text incl. astral
    // chars, not just ASCII. ----
    sql("mm_audio_peaks",
      """WITH chars AS (
        |  SELECT doc_id,
        |         ((ascii(substring(text, i, 1)) - 64) * 256 + 32768) % 65536 - 32768 AS s
        |  FROM documents, UNNEST(range(1, length(text) + 1)) AS t(i)
        |  WHERE doc_id % 31 = 0)
        |SELECT doc_id AS asset_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_samples,
        |       CAST(MAX(s) AS INT) AS peak,
        |       CAST(MIN(s) AS INT) AS trough
        |FROM chars GROUP BY doc_id ORDER BY asset_id""") { (s, dir) =>
      import s.implicits._
      t(s, dir, "documents")
        .filter(col("doc_id") % 31 === 0 && length(col("text")) > 0)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .mapPartitions { docs =>
          docs.map { case (id, text) =>
            val samples = text.codePoints().toArray
              .map(cp => ((cp - 64) * 256).toShort)
            val decoded = RealCodecs.decodeAudio(RealCodecs.encodeWav(samples))
            (id, decoded.length.toLong, decoded.max.toInt, decoded.min.toInt)
          }
        }
        .toDF("asset_id", "n_samples", "peak", "trough")
        .orderBy(col("asset_id"))
    },

    // ---- REAL frame-sampling end-to-end: synthesize a length-prefixed
    // container of PNG frames per sampled asset (frame count and dims
    // are deterministic functions of doc_id), then sample every 2nd
    // frame via the REAL container-parse + ImageIO decode path —
    // skipped frames are seeked past, never decoded. The oracle
    // recomputes the sampled (frame_idx, dims) arithmetically, so a
    // sampler that decoded the wrong frames (or none) breaks the hash.
    // The container format is ours (no JDK video codec exists); a real
    // demuxer swaps in at the header-arithmetic layer only. ----
    sql("mm_frame_sample",
      """WITH f AS (
        |  SELECT doc_id, CAST(i AS INT) AS frame_idx
        |  FROM documents, UNNEST(range(0, 2 + doc_id % 4, 2)) AS t(i)
        |  WHERE doc_id % 37 = 0)
        |SELECT doc_id AS asset_id, frame_idx,
        |       CAST(8 + (doc_id + frame_idx) % 8 AS INT) AS width,
        |       CAST(4 + (doc_id + frame_idx) % 4 AS INT) AS height
        |FROM f ORDER BY asset_id, frame_idx""") { (s, dir) =>
      import s.implicits._
      t(s, dir, "documents")
        .filter(col("doc_id") % 37 === 0)
        .select(col("doc_id"),
          encode(coalesce(col("text"), lit("")), "UTF-8").as("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions { docs =>
          docs.flatMap { case (id, payload) =>
            val frames = (0 until (2 + id % 4).toInt).map { j =>
              RealCodecs.encodePng(
                (8 + (id + j) % 8).toInt, (4 + (id + j) % 4).toInt, payload)
            }
            RealCodecs.sampleFrames(RealCodecs.encodeFrameContainer(frames), 2)
              .map { case (idx, w, h) => (id, idx, w, h) }
          }
        }
        .toDF("asset_id", "frame_idx", "width", "height")
        .orderBy(col("asset_id"), col("frame_idx"))
    },

    // ---- the typed decode pipeline end-to-end (mapPartitions stub) ----
    sql("mm_feature_histogram",
      // same hex-digit-per-byte trick as mm_modality_histogram
      """WITH h AS (SELECT doc_id, upper(hex(encode(text))) AS hx FROM documents),
        |nibs AS (
        |  SELECT doc_id,
        |         strpos('0123456789ABCDEF', substring(hx, 2 * i - 1, 1)) - 1 AS bucket
        |  FROM h, UNNEST(range(1, length(hx) // 2 + 1)) AS t(i))
        |SELECT doc_id AS asset_id, CAST(bucket AS INT) AS bucket,
        |       CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM nibs GROUP BY doc_id, bucket
        |ORDER BY asset_id, bucket""") { (s, dir) =>
      nibbleHistogram(assets(s, dir)).toDF()
        .orderBy(col("asset_id"), col("bucket"))
    })

  /** (doc_id, lo, hi): the 64-bit aHash over a REAL-ImageIO-decoded
    * 8×8 nearest-neighbor thumbnail, as two non-negative 32-bit
    * halves (bits 0–31 / 32–63). Package-private so MultimodalCodecSpec
    * can brute-force all-pairs hamming against the op's own
    * signatures — the MIH probe guarantee, pinned on real data. */
  private[ops] def phashFrame(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    TrainMemo.memoKeyOf(docs) match {
      case Some(k) => TrainMemo.getOrTrain(
        s"phash:${TrainMemo.sessionKeyOf(s)}:$k")(
        TrainMemo.checkpointReleasing(phashBuild(s, docs)))
      case None => phashBuild(s, docs)
    }
  }

  private def phashBuild(s: SparkSession, docs: DataFrame): DataFrame = {
    import s.implicits._
    docs
      .select(col("doc_id"),
        encode(coalesce(col("text"), lit("")), "UTF-8").as("payload"))
      // codec work dominates this operator (~0.75 ms/asset: PNG
      // deflate + ImageIO read), so its parallelism must not be
      // capped by the SCAN's split count — a corpus packed into few
      // large files (the shipped fixture: one file ⇒ one split) would
      // decode serially: measured 37.5 s for 50k assets single-split
      // vs ~2 s spread across local[32]. One deterministic hash
      // repartition moves each payload once — strictly cheaper than
      // the decode it unblocks; on a well-split 100 TB corpus it is
      // a rebalance, not a new bottleneck (decode cost ≫ one
      // payload-sized exchange either way).
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .as[(Long, Array[Byte])]
      .mapPartitions { docs =>
        docs.map { case (id, payload) =>
          val w0 = (16 + id % 16).toInt
          val h0 = (8 + id % 8).toInt
          val png = RealCodecs.encodePng(w0, h0, payload)
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(png))
          val g = new Array[Long](64)
          var sum = 0L
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              val rgb = img.getRGB(x * w0 / 8, y * h0 / 8)
              val lum = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff)
                + (rgb & 0xff)).toLong
              g(y * 8 + x) = lum
              sum += lum
              x += 1
            }
            y += 1
          }
          val mean = sum / 64
          var lo = 0L
          var hi = 0L
          var i = 0
          while (i < 32) { if (g(i) > mean) lo |= 1L << i; i += 1 }
          while (i < 64) { if (g(i) > mean) hi |= 1L << (i - 32); i += 1 }
          (id, lo, hi)
        }
      }
      .toDF("doc_id", "lo", "hi")
  }
}
