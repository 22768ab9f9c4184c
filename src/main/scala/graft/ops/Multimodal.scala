package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.QueryDef
import graft.queries.QueryDef._

/** One media asset: opaque binary payload + typed metadata. In a real
  * deployment `media` holds image/audio/video bytes; here it carries the
  * document's UTF-8 bytes so the plumbing is end-to-end testable. */
case class MediaRecord(doc_id: Long, media: Array[Byte], format: String, width: Int, height: Int)

/** Features extracted from one media asset by the (stubbed) decoder. */
case class MediaFeatures(doc_id: Long, byte_len: Long, checksum: Long, histogram: Seq[Long])

/** One sampled frame: position + content fingerprint. */
case class FrameSample(doc_id: Long, frame_idx: Long, frame_off: Long, frame_len: Long, frame_md5: String)

/** One silence-trimmed asset: frame counts trimmed at each edge + the
  * kept slice's length and fingerprint. */
case class MediaTrimmed(doc_id: Long, n_frames: Long, lead_trimmed: Long,
    tail_trimmed: Long, kept_len: Long, kept_md5: String)

/** One VAD speech segment: contiguous above-threshold frame run with its
  * exact byte-sum energy. */
case class MediaSegment(doc_id: Long, seg_idx: Long, start_frame: Long,
    end_frame: Long, n_frames: Long, energy_sum: Long)

/** One resized asset: new dimensions + payload fingerprint. */
case class MediaResized(doc_id: Long, orig_len: Long, new_len: Long,
    width: Int, height: Int, resized_md5: String)

/** One asset's perceptual hash (aHash bit string). */
case class MediaHash(doc_id: Long, ahash: String)

/** One selected keyframe: its shot, frame index, energy, fingerprint. */
case class Keyframe(doc_id: Long, shot: Long, keyframe: Long, energy: Long,
    frame_md5: String)

/** Multimodal columns (★ SURVEY §2c): binary payloads with typed
  * metadata, decoded/feature-extracted in batch over `mapPartitions` —
  * the Scala analog of a Pandas-UDF/`mapInPandas` stage: typed rows in,
  * typed rows out, executed per-partition so a real decoder could reuse
  * per-task native resources (codec contexts etc.).
  *
  * The DECODE step is a STUB: the image/audio codecs are not in this
  * environment, so `decodeStub` computes deterministic fake features
  * (byte histogram + position-weighted checksum) from the raw bytes. The
  * Spark-side plumbing — schema, encoders, partitioning, batch shape — is
  * real and oracle-tested. */
object Multimodal {

  /** Attach a binary media column + metadata to documents. */
  def attachMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      lit("text/plain").as("format"),
      (col("n_chars") % 640).cast("int").as("width"),
      (col("n_chars") % 480).cast("int").as("height"))

  val HistogramBuckets = 16

  /** STUB for the real decoder (`???` equivalent): deterministic features
    * from raw bytes. Replace with an actual codec call in production. */
  def decodeStub(r: MediaRecord): MediaFeatures = {
    val hist = new Array[Long](HistogramBuckets)
    var checksum = 0L
    var i = 0
    while (i < r.media.length) {
      val b = r.media(i) & 0xff
      hist(b >> 4) += 1
      checksum += b.toLong * ((i % 31) + 1)
      i += 1
    }
    MediaFeatures(r.doc_id, r.media.length.toLong, checksum, hist.toSeq)
  }

  /** Batch feature extraction: per-partition iteration, typed in/out. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(decodeStub))
  }

  val FrameBytes = 64
  val FrameStride = 4

  /** Frame sampling: treat the binary payload as fixed-size frames of
    * [[FrameBytes]] and keep every [[FrameStride]]-th one (the video
    * keyframe-sampling shape) — a typed 1→N `mapPartitions` flatMap, the
    * row-multiplying twin of [[extractFeatures]]'s 1→1 decode. The digest
    * instance is per-partition (what a real codec context would be);
    * emitted rows are a pure function of (bytes, position), so the output
    * is deterministic under any partitioning. Zero shuffle. */
  def sampleFrames(media: Dataset[MediaRecord]): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val digest = java.security.MessageDigest.getInstance("MD5")
      it.flatMap { r =>
        val n = r.media.length
        val nFrames = (n + FrameBytes - 1) / FrameBytes
        (0 until nFrames by FrameStride).iterator.map { f =>
          val off = f * FrameBytes
          val len = math.min(FrameBytes, n - off)
          val hex = digest.digest(java.util.Arrays.copyOfRange(r.media, off, off + len))
            .map("%02x".format(_)).mkString
          FrameSample(r.doc_id, f.toLong, off.toLong, len.toLong, hex)
        }
      }
    }
  }

  /** Frames per shot for [[selectKeyframes]]. */
  val ShotFrames = 4

  /** Shot-level keyframe selection (q201): the payload as
    * [[FrameBytes]]-byte frames grouped into shots of [[ShotFrames]],
    * one representative frame emitted per shot — the max-energy frame
    * (byte-sum energy, the stub's deterministic stand-in for decoded
    * luma variance; ties to the EARLIEST frame) with its energy and
    * slice md5. The video "one keyframe per shot" preprocessing step a
    * frame-level captioner or embedder runs on, the 1→shots sibling of
    * [[sampleFrames]]'s fixed-stride pass.
    *
    * Scale shape: 1→N typed mapPartitions, ZERO shuffle — the per-shot
    * argmax runs inside the row's own byte array (a window formulation
    * would shuffle frame rows to rank them; frames of one asset never
    * need to leave their row). The oracle recomputes energies from the
    * ASCII text with a rank window — the engine-side plan stays
    * window-free. */
  def selectKeyframes(media: Dataset[MediaRecord]): Dataset[Keyframe] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val digest = java.security.MessageDigest.getInstance("MD5")
      it.flatMap { r =>
        val n = r.media.length
        val nFrames = (n + FrameBytes - 1) / FrameBytes
        val nShots = (nFrames + ShotFrames - 1) / ShotFrames
        (0 until nShots).iterator.map { s =>
          var bestF = -1; var bestE = -1L
          var f = s * ShotFrames
          val fEnd = math.min(nFrames, (s + 1) * ShotFrames)
          while (f < fEnd) {
            val off = f * FrameBytes
            val len = math.min(FrameBytes, n - off)
            var e = 0L; var i = off
            while (i < off + len) { e += (r.media(i) & 0xff); i += 1 }
            if (e > bestE) { bestE = e; bestF = f }
            f += 1
          }
          val off = bestF * FrameBytes
          val len = math.min(FrameBytes, n - off)
          val hex = digest.digest(java.util.Arrays.copyOfRange(r.media, off, off + len))
            .map("%02x".format(_)).mkString
          Keyframe(r.doc_id, s.toLong, bestF.toLong, bestE, hex)
        }
      }
    }
  }

  /** A frame is "silent" when its mean byte value sits below this —
    * integer form `sum < cut·len`, no float boundary. */
  val SilenceCut = 100

  /** VAD-style silence trim (q173): drop leading and trailing silent
    * [[FrameBytes]] frames of the payload — the audio preprocessing
    * shape (a real pipeline trims low-energy frames before feature
    * extraction; the stub's "energy" is the byte sum, deterministic
    * from the payload, so the oracle recomputes it from the ASCII
    * text). Interior silence survives — only the edges trim, exactly
    * like the standard leading/trailing VAD pass. 1→1 typed
    * mapPartitions, zero shuffle; emits the kept-slice length and md5
    * so fidelity is checkable without moving payloads. */
  def trimSilence(media: Dataset[MediaRecord],
      cut: Int = SilenceCut): Dataset[MediaTrimmed] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val digest = java.security.MessageDigest.getInstance("MD5")
      it.map { r =>
        val n = r.media.length
        val nFrames = (n + FrameBytes - 1) / FrameBytes
        def silent(f: Int): Boolean = {
          val off = f * FrameBytes
          val len = math.min(FrameBytes, n - off)
          var s = 0L; var i = off
          while (i < off + len) { s += (r.media(i) & 0xff); i += 1 }
          s < cut.toLong * len
        }
        var lead = 0
        while (lead < nFrames && silent(lead)) lead += 1
        var tail = 0
        while (tail < nFrames - lead && silent(nFrames - 1 - tail)) tail += 1
        val from = lead * FrameBytes
        val until = math.min(n, (nFrames - tail) * FrameBytes)
        val kept =
          if (from >= until) Array.empty[Byte]
          else java.util.Arrays.copyOfRange(r.media, from, until)
        val hex = digest.digest(kept).map("%02x".format(_)).mkString
        MediaTrimmed(r.doc_id, nFrames.toLong, lead.toLong, tail.toLong,
          kept.length.toLong, hex)
      }
    }
  }

  /** VAD-style speech segmentation (q241): contiguous runs of
    * above-threshold [[FrameBytes]] frames become utterance SEGMENTS —
    * the ASR batching prep above q173's edge trim (trimming keeps one
    * blob; segmentation yields the (media, segment) manifest an ASR
    * pipeline actually feeds, one row per utterance with its frame
    * range and exact energy). Same stubbed decode boundary: energy is
    * the byte sum, so the oracle recomputes segments from the ASCII
    * text with gaps-and-islands SQL. 1→N typed mapPartitions, zero
    * shuffle — the q201 keyframe shape. */
  def speechSegments(media: Dataset[MediaRecord],
      cut: Int = SilenceCut): Dataset[MediaSegment] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        val n = r.media.length
        val nFrames = (n + FrameBytes - 1) / FrameBytes
        val out = Seq.newBuilder[MediaSegment]
        var segStart = -1L; var segEnergy = 0L; var idx = 0L
        var f = 0
        while (f < nFrames) {
          val off = f * FrameBytes
          val len = math.min(FrameBytes, n - off)
          var s = 0L; var i = off
          while (i < off + len) { s += (r.media(i) & 0xff); i += 1 }
          if (s >= cut.toLong * len) {
            if (segStart < 0) { segStart = f; segEnergy = 0L }
            segEnergy += s
          } else if (segStart >= 0) {
            out += MediaSegment(r.doc_id, idx, segStart, f - 1L,
              f - segStart, segEnergy)
            idx += 1; segStart = -1L
          }
          f += 1
        }
        if (segStart >= 0)
          out += MediaSegment(r.doc_id, idx, segStart, nFrames - 1L,
            nFrames - segStart, segEnergy)
        out.result()
      }
    }
  }

  val ResizeFactor = 2

  /** Resize stub: factor-[[ResizeFactor]] nearest-neighbor downsample —
    * keep every k-th byte, halve the metadata dimensions. A real codec
    * would decode → scale → re-encode inside the same typed-mapPartitions
    * boundary; the stub keeps the byte math deterministic so the oracle
    * can recompute it from the (ASCII) text. 1→1, zero shuffle. */
  def resizeStub(media: Dataset[MediaRecord]): Dataset[MediaResized] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val digest = java.security.MessageDigest.getInstance("MD5")
      it.map { r =>
        val out = new Array[Byte]((r.media.length + ResizeFactor - 1) / ResizeFactor)
        var i = 0
        while (i < out.length) { out(i) = r.media(i * ResizeFactor); i += 1 }
        val hex = digest.digest(out).map("%02x".format(_)).mkString
        MediaResized(r.doc_id, r.media.length.toLong, out.length.toLong,
          r.width / ResizeFactor, r.height / ResizeFactor, hex)
      }
    }
  }

  val AHashCells = 64
  // 4 bands × 16 bits: pigeonhole guarantees recall for hamming ≤ 3.
  // Band width is a candidate-volume knob: 8-bit bands (hamming ≤ 7)
  // have only 256 key values per position, and perceptual hashes of a
  // homogeneous corpus cluster — measured 55 s at sf0.1 from bucket
  // blowup; 16-bit bands cut candidates ~256× for a tighter threshold.
  val AHashBands = 4
  val AHashMaxHamming = 3

  /** Average-hash (aHash) of one asset — the published perceptual-hash
    * recipe (downscale to an 8×8 grid, threshold each cell against the
    * global mean) applied at the same stubbed decode boundary as
    * [[decodeStub]]: cells are contiguous byte ranges of the payload
    * standing in for pixel blocks. The threshold is the cross-multiplied
    * integer comparison `cell_sum · n_total > total_sum · cell_n`
    * (strict) — no division, exact in both engines. Emitted as a bit
    * STRING (cells with no bytes in sub-64-byte payloads are simply
    * absent — both engines build from the same cell set).
    *
    * Oracle-parity assumption (documented like the other decode stubs):
    * the stand-in payload bytes are ASCII — the DuckDB oracle walks
    * characters with `ascii()` while this side walks UTF-8 BYTES, so the
    * two index payloads identically only when chars == bytes. Real
    * deployments replace this stub with a pixel decode and the
    * assumption disappears with it. */
  def aHashStub(r: MediaRecord): MediaHash = {
    val n = r.media.length
    val sums = new Array[Long](AHashCells)
    val cnts = new Array[Long](AHashCells)
    var total = 0L
    var i = 0
    while (i < n) {
      val c = (i.toLong * AHashCells / n).toInt
      val v = (r.media(i) & 0xff).toLong
      sums(c) += v; cnts(c) += 1; total += v
      i += 1
    }
    val sb = new StringBuilder
    var c = 0
    while (c < AHashCells) {
      if (cnts(c) > 0) sb.append(if (sums(c) * n > total * cnts(c)) '1' else '0')
      c += 1
    }
    MediaHash(r.doc_id, sb.toString)
  }

  /** Zero-length payloads are filtered out, not hashed: an empty hash
    * string would share every band key with every other empty doc (a
    * hamming-0 "near-dup" clique of blanks), while the oracle's cell CTE
    * inner-joins n=0 docs out entirely — dropping them keeps both
    * engines' pair sets identical and is the right semantic anyway (an
    * empty asset has no perceptual content to match). */
  def imageHashes(media: Dataset[MediaRecord]): Dataset[MediaHash] = {
    import media.sparkSession.implicits._
    media.filter(_.media.length > 0).mapPartitions(_.map(aHashStub))
  }

  /** Perceptual near-dup pairs over media payloads (q121): aHash +
    * pigeonhole banding + exact Hamming verify ≤ [[AHashMaxHamming]] —
    * [[graft.ops.Dedup.simhashPairs]]'s shape applied to the multimodal
    * column (image dedup is a first-class 100 TB training-data stage).
    * Bands are 16-bit substrings; hamming ≤ [[AHashMaxHamming]] = 3 < 4
    * bands forces a band collision, so candidate recall is exact at the
    * shipped threshold. The verify is a codegen'd per-pair bit
    * comparison; candidates only, never all pairs. */
  def imageNearDups(spark: SparkSession, dir: String,
      maxHamming: Int = AHashMaxHamming): DataFrame =
    imageNearDupsOn(t(spark, dir, "documents"), maxHamming)

  val FrameOverlapCap = 50L
  val FrameOverlapMinShared = 2L

  /** Cross-video duplicated-footage pairs: representative videos sharing
    * ≥ `minShared` sampled-frame fingerprints — the multimodal twin of
    * the chunk-containment detector (q130): re-encoded uploads, clips
    * embedded in compilations, and shared intros surface as pairs with
    * high shared-frame counts. Built on the q83 frame-sampling boundary
    * (every FrameStride-th FrameBytes slice, md5'd), so it inherits the
    * honest stand-in decode.
    *
    * The two scale disciplines arrive by construction: exact-duplicate
    * videos collapse to min-id representatives FIRST (lesson 1 — else
    * pair volume is quadratic in duplicate-group size), and frames
    * appearing in > `cap` representatives are dropped as boilerplate
    * (black frames, title cards) BEFORE the self-join (the q49/q130 df
    * cap) — candidate volume is Σ df² over kept frames, cap-bounded. */
  def frameOverlapPairs(spark: SparkSession, dir: String,
      cap: Long = FrameOverlapCap, minShared: Long = FrameOverlapMinShared): DataFrame = {
    import spark.implicits._
    val docs = t(spark, dir, "documents")
    val reps = docs.join(
      graft.ops.Dedup.exact(docs).select(col("keep_id").as("doc_id")), "doc_id")
    val frames = sampleFrames(attachMedia(reps).as[MediaRecord]).toDF()
      .select(col("doc_id"), col("frame_md5")).distinct()
      .localCheckpoint() // feeds the df cap AND both join sides
    val kept = frames.join(
      frames.groupBy("frame_md5").agg(count(lit(1)).as("dfc"))
        .filter(col("dfc") <= cap).select("frame_md5"),
      "frame_md5")
    kept.as("a").join(kept.as("b"),
        col("a.frame_md5") === col("b.frame_md5") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  def frameOverlapPairsSql(cap: Long = FrameOverlapCap,
      minShared: Long = FrameOverlapMinShared): String =
    s"""WITH reps AS (SELECT d.* FROM documents d
          JOIN (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)) r
          USING (doc_id)),
      fr AS (SELECT doc_id, text,
            unnest(generate_series(0, (length(text) + ${FrameBytes - 1}) // $FrameBytes - 1,
              $FrameStride)) AS fidx
          FROM reps),
      fp AS (SELECT DISTINCT doc_id,
            md5(substr(text, CAST(fidx * $FrameBytes + 1 AS INT), $FrameBytes)) AS frame_md5
          FROM fr),
      kept AS (SELECT fp.* FROM fp JOIN (
            SELECT frame_md5 FROM fp GROUP BY frame_md5 HAVING count(*) <= $cap) c
          USING (frame_md5))
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
      FROM kept a JOIN kept b ON a.frame_md5 = b.frame_md5 AND a.doc_id < b.doc_id
      GROUP BY 1, 2 HAVING count(*) >= $minShared"""

  /** Frame-level variant: SCALE.md lesson 1 applies verbatim — byte-
    * identical payloads share an aHash, so a duplicate-heavy corpus must
    * collapse exact dups ([[graft.ops.Dedup.exact]]) BEFORE perceptual
    * pair mining, or the band self-join's output is quadratic in the
    * duplicate-group size (measured: the 10× replicated corpus runs
    * >600 s naive vs seconds on representatives). */
  def imageNearDupsOn(docs: DataFrame,
      maxHamming: Int = AHashMaxHamming): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val w = AHashCells / AHashBands
    val hashes = imageHashes(attachMedia(docs).as[MediaRecord])
      .toDF().localCheckpoint() // feeds bands AND both verify sides
    val bands = hashes.select(col("doc_id"), col("ahash"),
      explode(expr((0 until AHashBands)
        .map(b => s"concat('$b:', substr(ahash, ${b * w + 1}, $w))")
        .mkString("array(", ", ", ")"))).as("bkey"))
    bands.as("a").join(bands.as("b"),
        col("a.bkey") === col("b.bkey") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        col("a.ahash").as("ha"), col("b.ahash").as("hb"))
      .distinct()
      .withColumn("hamming", expr(
        s"""size(filter(sequence(1, least(length(ha), length(hb))),
             i -> substr(ha, i, 1) != substr(hb, i, 1)))""").cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  def imageNearDupsSql(maxHamming: Int = AHashMaxHamming,
      table: String = "documents"): String = {
    val w = AHashCells / AHashBands
    s"""WITH b AS (SELECT doc_id, text, length(text) AS n FROM $table),
      cells AS (SELECT doc_id, (i - 1) * $AHashCells // n AS c,
                  ascii(substr(text, CAST(i AS INT), 1)) AS v
                FROM (SELECT doc_id, text, n, unnest(range(1, n + 1)) AS i FROM b)),
      agg AS (SELECT doc_id, c, SUM(v) AS s, COUNT(*) AS k FROM cells GROUP BY 1, 2),
      tot AS (SELECT doc_id, CAST(SUM(s) AS BIGINT) AS ts,
                CAST(SUM(k) AS BIGINT) AS tn FROM agg GROUP BY 1),
      hash AS (SELECT doc_id,
                 string_agg(CASE WHEN s * tn > ts * k THEN '1' ELSE '0' END,
                   '' ORDER BY c) AS ahash
               FROM agg JOIN tot USING (doc_id) GROUP BY doc_id),
      bands AS (SELECT doc_id, ahash, CAST(bb AS VARCHAR) || ':' ||
                  substr(ahash, CAST(bb * $w + 1 AS INT), $w) AS bkey
                FROM hash, range(0, $AHashBands) t(bb)),
      cand AS (SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b,
                 a.ahash AS ha, b2.ahash AS hb
               FROM bands a JOIN bands b2
                 ON a.bkey = b2.bkey AND a.doc_id < b2.doc_id)
      SELECT id_a, id_b,
        CAST(len(list_filter(range(1, least(length(ha), length(hb)) + 1),
          i -> substr(ha, CAST(i AS INT), 1) != substr(hb, CAST(i AS INT), 1))) AS BIGINT) AS hamming
      FROM cand
      WHERE len(list_filter(range(1, least(length(ha), length(hb)) + 1),
        i -> substr(ha, CAST(i AS INT), 1) != substr(hb, CAST(i AS INT), 1))) <= $maxHamming"""
  }

  /** Full pipeline on documents, histogram exploded to rows so results
    * stay flat for the oracle. */
  def mediaPipeline(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = attachMedia(t(spark, dir, "documents")).as[MediaRecord]
    extractFeatures(media).toDF()
      .select(col("doc_id"), col("byte_len"), col("checksum"),
        posexplode(col("histogram")).as(Seq("bucket", "cnt")))
      .withColumn("bucket", col("bucket").cast("long"))
  }

  val queries: Seq[QueryDef] = Seq(
    // Multimodal join: text metadata + embedding-derived columns together.
    QueryDef("q50_multimodal_join",
      (s, d) => t(s, d, "documents")
        .join(t(s, d, "embeddings"), col("doc_id") === col("vec_id"))
        .select(
          col("doc_id"), col("lang"), col("n_chars"), col("label"),
          length(col("text")).cast("long").as("text_len"),
          sha2(col("text"), 256).as("text_sha"),
          expr(s"aggregate(${Similarity.quantExpr}, 0L, (a, x) -> a + x * x)").as("q_norm")),
      Some(s"""SELECT d.doc_id, d.lang, d.n_chars, e.label,
          CAST(length(d.text) AS BIGINT) AS text_len,
          sha256(d.text) AS text_sha,
          CAST(list_sum(list_transform(${Similarity.quantSql}, x -> x * x)) AS BIGINT) AS q_norm
        FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id""")),

    // Binary decode pipeline through typed mapPartitions; oracle recomputes
    // the stub features from the (ASCII) text characters.
    QueryDef("q51_media_features",
      (s, d) => mediaPipeline(s, d),
      Some(s"""SELECT doc_id, CAST(length(text) AS BIGINT) AS byte_len,
          CAST(list_sum(list_transform(range(1, length(text) + 1),
            i -> ascii(substr(text, i, 1)) * (((i - 1) % 31) + 1))) AS BIGINT) AS checksum,
          bucket,
          CAST(len(list_filter(range(1, length(text) + 1),
            i -> ascii(substr(text, i, 1)) // 16 = bucket)) AS BIGINT) AS cnt
        FROM documents, range(0, ${HistogramBuckets}) t(bucket)""")),

    // Frame sampling through the same typed-mapPartitions boundary; the
    // oracle recomputes frames from the (ASCII) text, where byte slices
    // and substrings coincide.
    QueryDef("q83_frame_sample",
      (s, d) => {
        import s.implicits._
        sampleFrames(attachMedia(t(s, d, "documents")).as[MediaRecord]).toDF()
      },
      Some(s"""WITH fr AS (SELECT doc_id, text,
            unnest(generate_series(0, (length(text) + ${FrameBytes - 1}) // $FrameBytes - 1,
              $FrameStride)) AS fidx
          FROM documents)
        SELECT doc_id, CAST(fidx AS BIGINT) AS frame_idx,
          CAST(fidx * $FrameBytes AS BIGINT) AS frame_off,
          CAST(least($FrameBytes, length(text) - fidx * $FrameBytes) AS BIGINT) AS frame_len,
          md5(substr(text, CAST(fidx * $FrameBytes + 1 AS INT), $FrameBytes)) AS frame_md5
        FROM fr""")),

    // Silence trim through the same typed boundary. The corpus text has
    // no silent edges (letters sit well above the cut), so the query
    // pads deterministic "silence" (spaces — byte 32) around the
    // payload: 2 exact leading frames and a ragged 3-frame tail. The
    // oracle recomputes frame energies from the ASCII text.
    QueryDef("q201_keyframe_select",
      (s, d) => {
        import s.implicits._
        selectKeyframes(attachMedia(t(s, d, "documents")).as[MediaRecord]).toDF()
      },
      Some(s"""WITH f AS (SELECT doc_id, text AS t, length(text) AS n,
              (length(text) + ${FrameBytes - 1}) // $FrameBytes AS nf FROM documents),
        en AS (SELECT doc_id, t, fi, fi // $ShotFrames AS shot,
              CAST(least($FrameBytes, n - fi * $FrameBytes) AS BIGINT) AS flen,
              list_sum(list_transform(
                range(1, CAST(least($FrameBytes, n - fi * $FrameBytes) AS BIGINT) + 1),
                q -> CAST(ascii(substr(t, CAST(fi * $FrameBytes + q AS INT), 1)) AS BIGINT))) AS e
            FROM (SELECT *, unnest(range(0, nf)) AS fi FROM f)),
        r AS (SELECT *, row_number() OVER (PARTITION BY doc_id, shot
              ORDER BY e DESC, fi) AS rn FROM en)
        SELECT doc_id, CAST(shot AS BIGINT) AS shot, CAST(fi AS BIGINT) AS keyframe,
          CAST(e AS BIGINT) AS energy,
          md5(substr(t, CAST(fi * $FrameBytes + 1 AS INT), CAST(flen AS INT))) AS frame_md5
        FROM r WHERE rn = 1""")),

    // interior silence (384 spaces mid-payload) splits the asset into
    // two utterances — the behavior q173's edge trim cannot express
    QueryDef("q241_media_segments",
      (s, d) => {
        import s.implicits._
        val padded = t(s, d, "documents").withColumn("text",
          concat(lit(" " * 128), col("text"), lit(" " * 384), col("text")))
        // cut=90: the synthetic text's frame mean is ~94 bytes (letters
        // ~105, spaces 32), so the library default (100) classifies most
        // TEXT frames silent here — real audio tunes this constant too
        speechSegments(attachMedia(padded).as[MediaRecord], cut = 90).toDF()
      },
      Some(s"""WITH p AS (SELECT doc_id,
              repeat(' ', 128) || text || repeat(' ', 384) || text AS t
            FROM documents),
        f AS (SELECT doc_id, t, length(t) AS n,
              (length(t) + ${FrameBytes - 1}) // $FrameBytes AS nf FROM p),
        en AS (SELECT doc_id, fi,
              CAST(least($FrameBytes, n - fi * $FrameBytes) AS BIGINT) AS flen,
              list_sum(list_transform(
                range(1, CAST(least($FrameBytes, n - fi * $FrameBytes) AS BIGINT) + 1),
                q -> CAST(ascii(substr(t, CAST(fi * $FrameBytes + q AS INT), 1)) AS BIGINT))) AS s
            FROM (SELECT *, unnest(range(0, nf)) AS fi FROM f)),
        sp AS (SELECT doc_id, fi, s FROM en WHERE s >= 90 * flen),
        isl AS (SELECT doc_id, fi, s,
              fi - row_number() OVER (PARTITION BY doc_id ORDER BY fi) AS grp FROM sp),
        seg AS (SELECT doc_id, MIN(fi) AS start_frame, MAX(fi) AS end_frame,
              CAST(count(*) AS BIGINT) AS n_frames, CAST(SUM(s) AS BIGINT) AS energy_sum
            FROM isl GROUP BY doc_id, grp)
        SELECT doc_id,
          row_number() OVER (PARTITION BY doc_id ORDER BY start_frame) - 1 AS seg_idx,
          CAST(start_frame AS BIGINT) AS start_frame,
          CAST(end_frame AS BIGINT) AS end_frame, n_frames, energy_sum
        FROM seg""")),

    QueryDef("q173_media_silence_trim",
      (s, d) => {
        import s.implicits._
        val padded = t(s, d, "documents").withColumn("text",
          concat(lit(" " * 128), col("text"), lit(" " * 192)))
        trimSilence(attachMedia(padded).as[MediaRecord]).toDF()
      },
      Some(s"""WITH p AS (SELECT doc_id, repeat(' ', 128) || text || repeat(' ', 192) AS t
            FROM documents),
        f AS (SELECT doc_id, t, length(t) AS n,
              (length(t) + ${FrameBytes - 1}) // $FrameBytes AS nf FROM p),
        en AS (SELECT doc_id, t, n, nf, fi,
              CAST(least($FrameBytes, n - fi * $FrameBytes) AS BIGINT) AS flen,
              list_sum(list_transform(
                range(1, CAST(least($FrameBytes, n - fi * $FrameBytes) AS BIGINT) + 1),
                q -> CAST(ascii(substr(t, CAST(fi * $FrameBytes + q AS INT), 1)) AS BIGINT))) AS s
            FROM (SELECT *, unnest(range(0, nf)) AS fi FROM f)),
        sil AS (SELECT doc_id, t, n, nf, fi, (s < $SilenceCut * flen) AS silent FROM en),
        agg AS (SELECT doc_id, any_value(t) AS t, any_value(n) AS n, any_value(nf) AS nf,
              COALESCE(MIN(CASE WHEN NOT silent THEN fi END), any_value(nf)) AS lead,
              CASE WHEN COUNT(*) FILTER (NOT silent) = 0 THEN 0
                   ELSE any_value(nf) - 1 - MAX(CASE WHEN NOT silent THEN fi END) END AS tail
            FROM sil GROUP BY doc_id),
        cut AS (SELECT doc_id, nf, lead, tail,
              CAST(lead * $FrameBytes AS BIGINT) AS frm,
              least(n, (nf - tail) * $FrameBytes) AS til, t, n FROM agg)
        SELECT doc_id, CAST(nf AS BIGINT) AS n_frames,
          CAST(lead AS BIGINT) AS lead_trimmed, CAST(tail AS BIGINT) AS tail_trimmed,
          CAST(greatest(til - frm, 0) AS BIGINT) AS kept_len,
          md5(CASE WHEN til <= frm THEN ''
              ELSE substr(t, CAST(frm + 1 AS INT), CAST(til - frm AS INT)) END) AS kept_md5
        FROM cut""")),

    // Resize through the same boundary; the oracle takes every k-th char
    // of the (ASCII) text and halves the attachMedia dimensions.
    QueryDef("q86_media_resize",
      (s, d) => {
        import s.implicits._
        resizeStub(attachMedia(t(s, d, "documents")).as[MediaRecord]).toDF()
      },
      Some(s"""SELECT doc_id, CAST(length(text) AS BIGINT) AS orig_len,
          CAST((length(text) + ${ResizeFactor - 1}) // $ResizeFactor AS BIGINT) AS new_len,
          CAST((n_chars % 640) // $ResizeFactor AS INT) AS width,
          CAST((n_chars % 480) // $ResizeFactor AS INT) AS height,
          md5(array_to_string(list_transform(
            generate_series(1, length(text), $ResizeFactor),
            i -> substr(text, CAST(i AS INT), 1)), '')) AS resized_md5
        FROM documents""")),

    QueryDef("q121_image_near_dups",
      (s, d) => imageNearDups(s, d),
      Some(imageNearDupsSql())),

    // The 100 TB image-dedup path (SCALE.md lesson 1 applied to media):
    // byte-identical payloads share an aHash, so exact dedup MUST run
    // before perceptual pair mining or the band self-join is quadratic
    // in duplicate-group size (the naive q121 DNFs at 10× by design).
    // Same composition discipline as q52/q88: the oracle re-runs the
    // pair SQL over the representative subquery verbatim.
    QueryDef("q124_image_near_dups_reps",
      (s, d) => {
        val docs = t(s, d, "documents")
        val reps = graft.ops.Dedup.exact(docs).select(col("keep_id").as("doc_id"))
        imageNearDupsOn(docs.join(reps, "doc_id"))
      },
      Some(imageNearDupsSql(table =
        """(SELECT d.* FROM documents d
            JOIN (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)) r
            USING (doc_id))"""))),

    QueryDef("q145_frame_overlap",
      (s, d) => frameOverlapPairs(s, d),
      Some(frameOverlapPairsSql()))
  )
}
