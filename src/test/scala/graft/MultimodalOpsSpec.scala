package graft

import graft.llmops.MultimodalOps
import graft.llmops.MultimodalOps.{FrameSize, HeaderLen, MediaCodec}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Multimodal plumbing checks: the binary container round-trips, the
  * decode stage is partition-parallel with the right batch shape, and
  * header expressions agree with the codec's view of the same bytes. */
class MultimodalOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder("multimodal-test", cores = 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def media = spark.read.parquet(MultimodalOps.MediaPath)

  test("generated container: magic, sizes, and meta struct consistent") {
    val rows = media.select(col("media_id"), col("media_type"), col("meta"),
      col("content")).collect()
    assert(rows.length == 300)
    rows.foreach { r =>
      val bytes = r.getAs[Array[Byte]]("content")
      assert(new String(bytes.take(4), "US-ASCII") == "GRFT")
      val meta = r.getStruct(2)
      assert(bytes.length == meta.getAs[Long]("n_bytes"))
      assert(bytes.length == HeaderLen + meta.getAs[Int]("n_frames") * FrameSize)
    }
  }

  test("decodeAll: distributed decode matches header expressions row-for-row") {
    val m = media
    val decoded = MultimodalOps.decodeAll(m)
    assert(decoded.count() == 300)
    // codec's parsed header == the meta struct the generator embedded
    val joined = decoded.join(m, decoded("mediaId") === m("media_id"))
    val mismatches = joined.filter(
      col("width") =!= col("meta.width") ||
      col("height") =!= col("meta.height") ||
      col("nFrames") =!= col("meta.n_frames") ||
      col("mediaType") =!= col("media_type") ||
      col("payloadBytes") =!= col("meta.n_bytes") - HeaderLen).count()
    assert(mismatches == 0)
    // payload statistics are real values, not defaults
    val stats = decoded.agg(min("meanByte"), max("meanByte")).head()
    assert(stats.getDouble(0) > 64 && stats.getDouble(1) < 192,
      "md5-derived payload bytes should average near 127.5")
  }

  test("codec rejects non-container bytes") {
    intercept[IllegalArgumentException] {
      MediaCodec.Fake.decode(1L, "not a container".getBytes)
    }
  }

  test("scene cuts: one row per video, frame counts match headers") {
    val rows = MultimodalOps.q66SceneCuts(spark, "").collect()
    val videos = media.filter(col("media_type") === "video")
      .select(col("media_id"), col("meta.n_frames")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rows.length == videos.size, "every video gets a scene-cut profile")
    rows.foreach { r =>
      val id = r.getAs[Long]("media_id")
      assert(r.getAs[Long]("n_frames") == videos(id).toLong,
        s"frame count mismatch for media $id")
      // n-1 adjacent deltas bound the cut count; single-frame videos
      // have none
      assert(r.getAs[Long]("n_cuts") <= r.getAs[Long]("n_frames") - 1)
      assert(r.getAs[Long]("max_delta") >= 0)
    }
    // md5-noise frames: adjacent deltas routinely exceed the threshold
    assert(rows.map(_.getAs[Long]("n_cuts")).sum > 0, "expected some cuts on noise frames")
  }

  test("q85: codegen'd window energy is bit-identical to the per-byte explode twin") {
    val audio = media.filter(col("media_type") === "audio")
      .select("media_id", "content")
    val fast = MultimodalOps.audioEnergyOf(audio).collect().map(_.toSeq).toSeq
    val slow = MultimodalOps.audioEnergyExplodeOf(audio).collect().map(_.toSeq).toSeq
    assert(fast.nonEmpty && fast == slow,
      "ByteWindowEnergy must reproduce the explode formulation bit-for-bit")
  }

  test("q85: a container declaring n_frames = 0 yields zero rows, not phantom windows") {
    // sequence(0, nf-1) DESCENDS when nf = 0 ([0, -1]); the nf > 0 gate
    // must make a corrupt/foreign fixture degrade like the oracle's
    // empty range(0, nf)
    val s = spark
    import s.implicits._
    val hdr: Array[Byte] = "GRFT".getBytes("US-ASCII") ++
      Array[Byte](2, 0x01, 0x00, 0x00, 0x01, 0x00, 0x00) // kind=audio, nf=0
    val corrupt = Seq((1L, hdr)).toDF("media_id", "content")
    assert(MultimodalOps.audioEnergyOf(corrupt).count() == 0)
    assert(MultimodalOps.audioEnergyExplodeOf(corrupt).count() == 0)
  }

  test("frame sampling covers every video with ceil(n/4) frames") {
    val perVideo = MultimodalOps.q46FrameSample(spark, "")
      .groupBy("media_id").count()
    val expected = media.filter(col("media_type") === "video")
      .select(col("media_id"), ((col("meta.n_frames") - 1) / 4 + 1).cast("long").as("expect"))
    val bad = perVideo.join(expected, "media_id")
      .filter(col("count") =!= col("expect")).count()
    assert(bad == 0)
  }

  test("q105 aHash: brightness-invariant, structure-sensitive") {
    val s = spark
    import s.implicits._
    def img(id: Long, grid: Array[Int]): (Long, String, Array[Byte]) = {
      require(grid.length == 64)
      val hdr: Array[Byte] = "GRFT".getBytes("US-ASCII") ++
        Array[Byte](1, 0x00, 0x08, 0x00, 0x08, 0x00, 0x01) // kind=image, 8x8, nf=1
      (id, "image", hdr ++ grid.map(v => (v & 0xff).toByte))
    }
    // a structured gradient, the same grid +20 brightness (no clipping:
    // values stay <= 220), and a transposed variant
    val base = Array.tabulate(64)(p => (p % 8) * 25)
    val brighter = base.map(_ + 20)
    val transposed = Array.tabulate(64)(p => ((p / 8) % 8) * 25)
    val m = Seq(img(1L, base), img(2L, brighter), img(3L, transposed))
      .toDF("media_id", "media_type", "content")
    val r = MultimodalOps.imagePhashOf(MultimodalOps.thumbnailOf(m))
      .collect().map(x => x.getAs[Long]("media_id") ->
        (x.getAs[Long]("phash"), x.getAs[Long]("bits_set"), x.getAs[Long]("v_total"))).toMap
    // brightness shift: identical hash, shifted totals
    assert(r(1L)._1 == r(2L)._1 && r(1L)._2 == r(2L)._2,
      s"aHash must be brightness-invariant: ${r(1L)} vs ${r(2L)}")
    assert(r(2L)._3 == r(1L)._3 + 20L * MultimodalOps.PhashBits)
    // structure change: different hash, same bit count (gradient symmetry)
    assert(r(1L)._1 != r(3L)._1, "transposing the gradient must change the hash")
    // a flat image hashes to all-zero bits (strict > mean)
    val flat = Seq(img(9L, Array.fill(64)(100))).toDF("media_id", "media_type", "content")
    val fr = MultimodalOps.imagePhashOf(MultimodalOps.thumbnailOf(flat)).head()
    assert(fr.getAs[Long]("phash") == 0L && fr.getAs[Long]("bits_set") == 0L)
  }
}
