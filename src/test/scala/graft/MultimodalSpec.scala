package graft

import graft.multimodal.{MediaCodec, Multimodal}
import graft.sources.Tables
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media =
    Multimodal.fromDocuments(spark, Tables.documents(spark, sfDir))

  test("media table: every doc becomes a payload with typed metadata") {
    val rows = media.collect()
    assert(rows.length === 500)
    assert(rows.forall(r => r.payload.nonEmpty && Multimodal.kinds.contains(r.kind)))
    assert(rows.forall(r => r.meta.width >= 32 && r.meta.height >= 32))
  }

  test("batched decode emits one feature row per record, deterministic") {
    val f1 = Multimodal.extractFeatures(media, batchSize = 7).collect()
      .sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media, batchSize = 64).collect()
      .sortBy(_.media_id)
    assert(f1.length === 500)
    // batch size must not change results (only the decode batch shape)
    assert(f1.map(_.feat_norm).toSeq === f2.map(_.feat_norm).toSeq)
    assert(f1.forall(_.feature.length === 8))
    // features are L1-ish normalized probabilities from the stub
    assert(f1.forall(f => f.feature.forall(x => x >= 0f && x <= 1.01f)))
  }

  test("decode stub derives n_bytes from the payload") {
    val r = media.filter(_.media_id == 0L).head()
    assert(MediaCodec.decodeStub(r).n_bytes === r.payload.length)
  }

  test("image payloads are real PNGs; decode recovers metadata dimensions") {
    val images = media.filter(_.kind == "image").collect()
    assert(images.nonEmpty)
    val pngMagic = Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)
    assert(images.forall(_.payload.take(4).sameElements(pngMagic)),
      "image payloads must be genuine PNG bytes")
    // width/height in the feature rows come from ImageIO's decoded raster —
    // they must agree with the metadata the payload was synthesized from
    val metaDims = images.map(r => r.media_id -> ((r.meta.width, r.meta.height))).toMap
    val feats = Multimodal.extractFeatures(
      media.filter(_.kind == "image")).collect()
    assert(feats.length === images.length)
    assert(feats.forall(f => metaDims(f.media_id) === ((f.width, f.height))),
      "decoded raster dimensions must match payload metadata")
    // luminance histogram bins are pixel-count fractions: sum to 1
    assert(feats.forall(f => math.abs(f.feature.drop(3).map(_.toDouble).sum - 1.0) < 1e-3))
  }

  test("audio payloads are real WAVs; decode recovers rate and duration") {
    val audio = media.filter(_.kind == "audio").collect()
    assert(audio.nonEmpty)
    assert(audio.forall(r => new String(r.payload.take(4), "US-ASCII") == "RIFF"),
      "audio payloads must be genuine RIFF/WAV bytes")
    val meta = audio.map(r =>
      r.media_id -> ((r.meta.sampleRateHz, r.meta.durationMs))).toMap
    val feats = Multimodal.extractFeatures(
      media.filter(_.kind == "audio")).collect()
    assert(feats.length === audio.length)
    // rate/duration in the feature rows come from the parsed WAV container,
    // not the metadata — they must agree with what the payload was built as
    assert(feats.forall(f =>
      meta(f.media_id) === ((f.sample_rate_hz, f.duration_ms))),
      "decoded container rate/duration must match payload metadata")
    // a 0.5-amplitude sine has RMS near 0.35; noise shifts it slightly
    assert(feats.forall(f => f.feature(0) > 0.2f && f.feature(0) < 0.5f),
      "decoded RMS should reflect the synthesized tone")
  }

  test("resize re-encodes pixels: payloads decode to the new dimensions") {
    val resized = Multimodal.resize(media, 48, 40).collect()
    val byKind = resized.groupBy(_.kind)
    // image: the resized payload is a real PNG at exactly the target dims
    byKind("image").foreach { r =>
      assert((r.meta.width, r.meta.height) === ((48, 40)))
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.payload))
      assert(img != null, s"resized image ${r.media_id} not decodable")
      assert((img.getWidth, img.getHeight) === ((48, 40)))
    }
    // video: block structure preserved; every frame decodes at the new dims
    val origFrames = media.filter(_.kind == "video").collect()
      .map(r => r.media_id -> r.payload.length / MediaCodec.videoBlockBytes).toMap
    byKind("video").foreach { r =>
      assert(r.payload.length / MediaCodec.videoBlockBytes === origFrames(r.media_id))
      val frame = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
        java.util.Arrays.copyOfRange(r.payload, 0, MediaCodec.videoBlockBytes)))
      assert(frame != null && (frame.getWidth, frame.getHeight) === ((48, 40)))
    }
    // audio: nothing to resize — payload and metadata pass through untouched
    val origAudio = media.filter(_.kind == "audio").collect()
      .map(r => r.media_id -> r.payload.toSeq).toMap
    byKind("audio").foreach(r => assert(r.payload.toSeq === origAudio(r.media_id)))
  }

  test("default-parameter sampleFrames yields decodable frames") {
    // the default frameBytes must equal the real container's block size —
    // a 256-byte default silently produced undecodable slices (r3 finding)
    val frames = Multimodal.sampleFrames(media.filter(_.kind == "video"))
      .collect()
    assert(frames.nonEmpty)
    frames.foreach { f =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f.frame))
      assert(img != null, s"default-sampled frame of ${f.media_id} not decodable")
    }
  }

  test("video frames are real PNGs; decode recovers frame count and dims") {
    val videos = media.filter(_.kind == "video").collect()
    assert(videos.nonEmpty)
    assert(videos.forall(_.payload.length % MediaCodec.videoBlockBytes == 0))
    // every sampled block is a decodable PNG frame at the metadata dims
    val frames = Multimodal.sampleFrames(media.filter(_.kind == "video"),
        frameBytes = MediaCodec.videoBlockBytes, stride = 1).collect()
    val dims = videos.map(r => r.media_id -> ((r.meta.width, r.meta.height))).toMap
    assert(frames.length === videos.map(_.payload.length / MediaCodec.videoBlockBytes).sum)
    frames.foreach { f =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f.frame))
      assert(img != null, s"frame ${f.frame_idx} of ${f.media_id} not decodable")
      assert(dims(f.media_id) === ((img.getWidth, img.getHeight)))
    }
    // full decode reports the true frame count from the container structure
    val feats = Multimodal.extractFeatures(media.filter(_.kind == "video"))
      .collect()
    assert(feats.forall(f =>
      f.n_frames === (f.media_id % 6 + 2).toInt &&
      dims(f.media_id) === ((f.width, f.height))))
  }

  test("frame sampling strides over video payloads only") {
    val frames = Multimodal.sampleFrames(media, frameBytes = 64, stride = 2)
      .collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame.length === 64))
    val videoIds = media.filter(_.kind == "video").collect().map(_.media_id).toSet
    assert(frames.map(_.media_id).toSet.subsetOf(videoIds))
  }

  test("p14 aggregates per kind") {
    val got = SparkEntry.queries("p14_multimodal")(spark, sfDir).collect()
    assert(got.length === 3)
  }

  test("aHash64 equals the pure pixel-formula hash (the codec loop is " +
      "lossless end to end); plants land within the Hamming-6 guarantee") {
    import graft.multimodal.Multimodal
    import graft.functions.Hash64
    val imgs = Multimodal.fromDocuments(spark,
      sources.Tables.documents(spark, sfDir), onlyKind = Some("image"))
    val got = Multimodal.aHash64(imgs.filter(_.media_id < 60))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // expected: straight from the synthetic raster formula, no PNG anywhere
    def formulaHash(id: Long): Long = {
      val w = (id % 32 + 32).toInt; val h = (id % 24 + 32).toInt
      val g = Array.tabulate(64) { i =>
        val p = (Hash64.mix(id * 7919 +
          (i / 8 * h / 8).toLong * w + (i % 8 * w / 8)) & 0xffffff).toInt
        ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff).toLong
      }
      val s = g.sum
      (0 until 64).foldLeft(0L)((acc, i) =>
        if (g(i) * 64 > s) acc | (1L << i) else acc)
    }
    assert(got.nonEmpty)
    got.foreach { case (id, h) =>
      assert(h === formulaHash(id), s"aHash of image $id diverged from " +
        "the raster formula — the PNG encode/decode loop is not lossless")
    }
    // planted variants: every perturbed copy stays within the chunk-pair
    // band guarantee (Hamming <= 6) of its original here
    val plants = Multimodal.aHash64(Multimodal.plantImageVariants(
        imgs.filter(_.media_id < 30)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    plants.foreach { case (pid, ph) =>
      val d = java.lang.Long.bitCount(ph ^ got(pid - 10000))
      assert(d <= 6, s"plant $pid at Hamming $d from its original")
    }
    // non-image input is out of contract, fail-loud
    val audio = Multimodal.fromDocuments(spark,
      sources.Tables.documents(spark, sfDir), onlyKind = Some("audio"))
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.plantImageVariants(audio).collect()
    }
    assert(e.getMessage != null)
  }

  test("audioProfile equals the pure integer-PCM formula (the WAV codec " +
      "loop is lossless end to end); sine fixture is out of contract only " +
      "for the formula, not the decode") {
    import graft.multimodal.{MediaCodec, Multimodal}
    import graft.functions.Hash64
    import java.lang.Long.remainderUnsigned
    val clips = Multimodal.fromDocuments(spark,
      sources.Tables.documents(spark, sfDir), onlyKind = Some("audio"),
      intAudio = true)
    val got = Multimodal.audioProfile(clips.filter(_.media_id < 120))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.nonEmpty)
    // expected: straight from the integer waveform formula — no WAV, no
    // AudioSystem anywhere
    def formulaProfile(id: Long): (Long, Long, Long, Long) = {
      val ms = id % 200 + 50
      val n = (8000 * ms / 1000).toInt
      val p1 = 32 + remainderUnsigned(Hash64.mix(id), 96L).toInt
      val a1 = 6144 + remainderUnsigned(Hash64.mix(id * 31 + 7), 12288L).toInt
      val p2 = 16 + remainderUnsigned(Hash64.mix(id * 17 + 3), 48L).toInt
      val a2 = 2048 + remainderUnsigned(Hash64.mix(id * 13 + 11), 4096L).toInt
      val samples = Array.tabulate(n) { i =>
        (a1 - (2 * a1 * (i % p1)) / p1) +
          (if (2 * (i % p2) < p2) a2 else -a2)
      }
      val zc = (1 until n).count(i => (samples(i) >= 0) != (samples(i - 1) >= 0))
      val fp = Hash64.mix(Hash64.fnv1a(
        samples.mkString(",").getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      (n.toLong, zc.toLong, samples.map(s => math.abs(s).toLong).sum, fp)
    }
    got.foreach { case (id, prof) =>
      assert(prof === formulaProfile(id), s"audio profile of clip $id " +
        "diverged from the waveform formula — the WAV encode/decode loop " +
        "is not lossless")
    }
    // byte-identical re-ingests fingerprint identically (the p119 plant)
    val replant = Multimodal.audioProfile(clips.filter(_.media_id < 30)
      .map(r => r.copy(media_id = r.media_id + 10000))(
        org.apache.spark.sql.Encoders.product[Multimodal.MediaRecord]))
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    replant.foreach { case (pid, fp) =>
      assert(fp === got(pid - 10000)._4,
        s"byte-identical re-ingest $pid changed fingerprint")
    }
    // the decode itself also handles the sine fixture (same container)
    val sine = Multimodal.fromDocuments(spark,
      sources.Tables.documents(spark, sfDir), onlyKind = Some("audio"))
      .filter(_.media_id < 10)
    assert(Multimodal.audioProfile(sine).count() > 0)
  }

  test("audioAHash64 equals the pure waveform-window formula; planted " +
      "wobbled variants land Hamming-close; non-audio fails loud") {
    import graft.multimodal.Multimodal
    import graft.functions.Hash64
    import java.lang.Long.remainderUnsigned
    val clips = Multimodal.fromDocuments(spark,
      sources.Tables.documents(spark, sfDir), onlyKind = Some("audio"),
      intAudio = true)
    val got = Multimodal.audioAHash64(clips.filter(_.media_id < 120))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty)
    def formulaHash(id: Long): Long = {
      val ms = id % 200 + 50
      val n = (8000 * ms / 1000).toInt
      val p1 = 32 + remainderUnsigned(Hash64.mix(id), 96L).toInt
      val a1 = 6144 + remainderUnsigned(Hash64.mix(id * 31 + 7), 12288L).toInt
      val p2 = 16 + remainderUnsigned(Hash64.mix(id * 17 + 3), 48L).toInt
      val a2 = 2048 + remainderUnsigned(Hash64.mix(id * 13 + 11), 4096L).toInt
      val sw = new Array[Long](64); val nw = new Array[Long](64)
      var i = 0
      while (i < n) {
        val s = (a1 - (2 * a1 * (i % p1)) / p1) +
          (if (2 * (i % p2) < p2) a2 else -a2)
        val w = (i.toLong * 64 / n).toInt
        sw(w) += math.abs(s); nw(w) += 1
        i += 1
      }
      val tot = sw.sum
      (0 until 64).foldLeft(0L)((acc, w) =>
        if (sw(w) * n > tot * nw(w)) acc | (1L << w) else acc)
    }
    got.foreach { case (id, h) =>
      assert(h === formulaHash(id), s"audio aHash of clip $id diverged " +
        "from the waveform formula — the WAV codec loop is not lossless")
    }
    // planted variants: the ±1024 wobble on 1/37 of samples stays within
    // a few bits of the original's windowed-amplitude hash
    val plants = Multimodal.audioAHash64(
        Multimodal.plantAudioVariants(clips.filter(_.media_id < 30)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(plants.nonEmpty)
    plants.foreach { case (pid, ph) =>
      val d = java.lang.Long.bitCount(ph ^ got(pid - 10000))
      assert(d <= 6, s"audio plant $pid at Hamming $d from its original")
    }
    // non-audio input is out of contract, fail-loud
    val images = Multimodal.fromDocuments(spark,
      sources.Tables.documents(spark, sfDir), onlyKind = Some("image"))
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.plantAudioVariants(images).collect()
    }
    assert(e.getMessage != null)
  }

  test("audioWindowHashesOf equals the pure fixed-window formula; " +
      "tail-truncated plants keep a subset of their original's windows") {
    import graft.multimodal.Multimodal
    import graft.functions.Hash64
    import java.lang.Long.remainderUnsigned
    val clips = Multimodal.fromDocuments(spark,
      sources.Tables.documents(spark, sfDir), onlyKind = Some("audio"),
      intAudio = true).filter(_.media_id < 120)
    def formulaWindows(id: Long, n: Int): Array[Long] = {
      val p1 = 32 + remainderUnsigned(Hash64.mix(id), 96L).toInt
      val a1 = 6144 + remainderUnsigned(Hash64.mix(id * 31 + 7), 12288L).toInt
      val p2 = 16 + remainderUnsigned(Hash64.mix(id * 17 + 3), 48L).toInt
      val a2 = 2048 + remainderUnsigned(Hash64.mix(id * 13 + 11), 4096L).toInt
      def sample(i: Int): Int = (a1 - (2 * a1 * (i % p1)) / p1) +
        (if (2 * (i % p2) < p2) a2 else -a2)
      Array.tabulate(n / 256) { w =>
        val abs = Array.tabulate(256)(k => math.abs(sample(w * 256 + k)).toLong)
        val tot = abs.sum
        (0 until 64).foldLeft(0L)((acc, b) =>
          if (abs.slice(b * 4, b * 4 + 4).sum * 64 > tot) acc | (1L << b)
          else acc)
      }
    }
    val recs = clips.collect()
    assert(recs.nonEmpty)
    recs.foreach { r =>
      val n = (8000 * (r.media_id % 200 + 50) / 1000).toInt
      val got = Multimodal.audioWindowHashesOf(r.payload)
      assert(got.length === n / 256, s"clip ${r.media_id} window count")
      assert(got.toSeq === formulaWindows(r.media_id, n).toSeq,
        s"clip ${r.media_id} window hashes diverged from the waveform " +
          "formula — the WAV codec loop is not lossless")
    }
    // tail-truncated plants: the excerpt's window hashes are EXACTLY the
    // original's first nWin−1 — its distinct set is contained (= 1.0)
    val eligible = clips.filter(r => r.media_id % 200 >= 14)
    val origWin = eligible.collect()
      .map(r => r.media_id -> Multimodal.audioWindowHashesOf(r.payload))
      .toMap
    val plants = Multimodal.plantAudioClips(eligible).collect()
    assert(plants.nonEmpty)
    plants.foreach { p =>
      val got = Multimodal.audioWindowHashesOf(p.payload).toSeq
      val orig = origWin(p.media_id - 10000)
      assert(got === orig.take(orig.length - 1).toSeq,
        s"plant ${p.media_id}: excerpt windows must be the original's " +
          "prefix bit-for-bit")
    }
    // under-two-window clips are out of the plant contract, fail-loud
    val tiny = clips.filter(r => r.media_id % 200 < 14)
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.plantAudioClips(tiny).collect()
    }
    assert(e.getMessage != null)
  }

  test("p118 video frame profile: planted byte-identical re-ingests " +
      "collapse onto their originals; frame counts match the container") {
    val rows = SparkEntry.queries("p118_video_frame_profile")(spark, sfDir)
      .collect()
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    // every +10000 plant is flagged a dup with its original as canonical
    val plants = rows.filter(_.getLong(0) >= 10000L)
    assert(plants.nonEmpty)
    plants.foreach { p =>
      assert(p.getBoolean(5), s"plant ${p.getLong(0)} must be is_dup")
      assert(p.getLong(4) === p.getLong(0) - 10000L,
        s"plant ${p.getLong(0)} must collapse onto its original")
      // identical payload -> identical profile
      val orig = byId(p.getLong(0) - 10000L)
      assert(p.getLong(1) === orig.getLong(1) &&
        p.getLong(3) === orig.getLong(3))
    }
    // frame counts equal the container's nFrames formula (id % 6 + 2)
    rows.filter(_.getLong(0) < 10000L).foreach { r =>
      assert(r.getLong(1) === r.getLong(0) % 6 + 2,
        s"video ${r.getLong(0)}: n_frames ${r.getLong(1)}")
      assert(r.getLong(2) >= 1 && r.getLong(2) <= r.getLong(1))
    }
  }

  test("p33 media similarity: k neighbors per image probe, sims in range") {
    val rows = SparkEntry.queries("p33_media_similarity")(spark, sfDir)
      .select(col("query_id"), col("rank"), col("sim")).collect()
    val perQuery = rows.groupBy(_.getLong(0))
    assert(perQuery.nonEmpty && perQuery.values.forall(_.length === 3))
    // channel-mean/histogram features are non-negative -> cosine in [0, 1]
    assert(rows.forall { r =>
      val s = r.getDouble(2); s >= 0.0 && s <= 1.0 + 1e-9
    })
    // deterministic decode -> deterministic retrieval
    val again = SparkEntry.queries("p33_media_similarity")(spark, sfDir)
      .select(col("query_id"), col("rank"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val first = SparkEntry.queries("p33_media_similarity")(spark, sfDir)
      .select(col("query_id"), col("rank"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(again === first)
  }
}
