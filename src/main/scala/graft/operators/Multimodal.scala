package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset}

/** Multimodal binary-column operators with a REAL codec: images travel as
  * opaque `Array[Byte]` cells (the 100 TB layout — media bytes inline or
  * as object-store pointers beside typed metadata), and decode/resize run
  * the JDK's ImageIO PNG codec inside `mapPartitions`, the Scala twin of
  * a `mapInPandas` batch UDF. Undecodable payloads degrade to an
  * `ok = false` row instead of failing the partition — at scale a corrupt
  * object must never kill the job.
  *
  * Grayscale PNG is lossless, so decoded samples equal the encoder input
  * exactly; checksums over the raster are therefore engine-reproducible
  * wherever the pixel source is (as in the driver queries, which generate
  * pixels from `doc_id` with a closed-form rule an oracle can replay). */
object Multimodal {

  private val M = 1000000007L

  /** position-weighted raster checksum: Σ (p+1)·sample_p mod M over
    * row-major pixel positions — order-sensitive, so any decode that
    * permutes, drops, or rescales pixels changes it */
  private def rasterChecksum(img: java.awt.image.BufferedImage): Long = {
    val r = img.getRaster
    var sum = 0L
    var p = 0
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        sum = (sum + (p + 1).toLong * r.getSample(x, y, 0)) % M
        p += 1
        x += 1
      }
      y += 1
    }
    sum
  }

  /** encode a grayscale image from a pixel function (test/query fixture
    * side: a real PNG byte stream for the codec path to decode) */
  def encodeGrayPng(width: Int, height: Int,
      pixel: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val r = img.getRaster
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        r.setSample(x, y, 0, pixel(x, y) & 0xff)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** grayscale checksum via the decoded RGB (palette-safe: indexed
    * formats like GIF map index → gray on read) */
  private def rgbChecksum(img: java.awt.image.BufferedImage): Long = {
    var sum = 0L
    var p = 0
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        sum = (sum + (p + 1).toLong * (img.getRGB(x, y) & 0xff)) % M
        p += 1
        x += 1
      }
      y += 1
    }
    sum
  }

  /** Multi-frame animated GIF from per-frame pixel functions (fixture
    * side: a REAL video-like container — n full frames in one byte
    * stream). 8-bit grayscale fits GIF's 256-color palette exactly, so
    * the round trip is lossless. */
  def encodeGrayGif(width: Int, height: Int, frames: Int,
      pixel: (Int, Int, Int) => Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val ios = ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    // the JDK GIF writer interlaces by default, and its 4-pass row
    // shuffle corrupts frames shorter than the pass strides — write
    // sequential scanlines
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
    var f = 0
    while (f < frames) {
      val img = new java.awt.image.BufferedImage(width, height,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val r = img.getRaster
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          r.setSample(x, y, 0, pixel(f, x, y) & 0xff)
          x += 1
        }
        y += 1
      }
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null),
        param)
      f += 1
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    out.toByteArray
  }

  /** Frame sampling over a multi-frame container (id, gifBytes) → one
    * row per SAMPLED frame (every `stride`-th): frame count from the
    * container, per-frame geometry + pixel checksum from a real decode.
    * The video analog of mapInPandas frame extraction; corrupt payloads
    * yield a single ok=false row. */
  def sampleFrames(ds: Dataset[(Long, Array[Byte])],
      stride: Int): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions(_.flatMap { case (id, bytes) =>
      try {
        val reader = ImageIO.getImageReadersByFormatName("gif").next()
        val iis = ImageIO.createImageInputStream(
          new ByteArrayInputStream(bytes))
        reader.setInput(iis)
        val n = reader.getNumImages(true)
        val rows = (0 until n by stride).map { f =>
          val img = reader.read(f)
          (id, n.toLong, f.toLong, img.getWidth.toLong,
            img.getHeight.toLong, rgbChecksum(img), true)
        }
        reader.dispose()
        rows
      } catch {
        case _: Exception =>
          Seq((id, -1L, -1L, -1L, -1L, -1L, false))
      }
    }).toDF("id", "n_frames", "frame_no", "width", "height",
      "frame_checksum", "ok")
  }

  /** PCM16 mono little-endian WAV from a sample array (fixture side: a
    * real RIFF/WAVE byte stream for the audio codec path). */
  def encodePcmWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val bytes = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      bytes(2 * i) = (samples(i) & 0xff).toByte
      bytes(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(bytes), fmt, samples.length.toLong)
    val out = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Real WAV decode (JDK javax.sound.sampled — the audio twin of the
    * ImageIO path) of (id, wavBytes) → per-clip features:
    * (id, sample_rate, n_samples, duration_ms, peak_abs, energy_mod,
    * sample_checksum, ok). energy = Σ s² mod M and checksum =
    * Σ (i+1)·(sᵢ+32768) mod M are integer-exact, so an oracle that can
    * replay the sample source reproduces them bit-for-bit. Corrupt
    * payloads degrade to ok=false, never fail the partition. */
  def decodeAudio(ds: Dataset[(Long, Array[Byte])]): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions(_.map { case (id, bytes) =>
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new ByteArrayInputStream(bytes))
        val fmt = ais.getFormat
        if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1)
          (id, -1L, -1L, -1L, -1L, -1L, -1L, false)
        else {
          val raw = ais.readAllBytes()
          val n = raw.length / 2
          var peak = 0L
          var energy = 0L
          var checksum = 0L
          var i = 0
          while (i < n) {
            val lo = raw(2 * i) & 0xff
            val hi = raw(2 * i + 1).toInt
            val s =
              if (fmt.isBigEndian) ((raw(2 * i).toInt << 8) | (raw(2 * i + 1) & 0xff)).toShort
              else ((hi << 8) | lo).toShort
            val sl = s.toLong
            if (math.abs(sl) > peak) peak = math.abs(sl)
            energy = (energy + sl * sl) % M
            checksum = (checksum + (i + 1).toLong * (sl + 32768L)) % M
            i += 1
          }
          val rate = fmt.getSampleRate.toLong
          (id, rate, n.toLong, n.toLong * 1000L / rate, peak, energy,
            checksum, true)
        }
      } catch {
        case _: Exception => (id, -1L, -1L, -1L, -1L, -1L, -1L, false)
      }
    }).toDF("id", "sample_rate", "n_samples", "duration_ms", "peak_abs",
      "energy_mod", "sample_checksum", "ok")
  }

  /** ImageIO decode of (id, imageBytes) batches →
    * (id, width, height, pix_checksum, ok) */
  def decodeImages(ds: Dataset[(Long, Array[Byte])]): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions(_.map { case (id, bytes) =>
      try {
        val img = ImageIO.read(new ByteArrayInputStream(bytes))
        if (img == null) (id, -1L, -1L, -1L, false)
        else (id, img.getWidth.toLong, img.getHeight.toLong,
          rasterChecksum(img), true)
      } catch { case _: Exception => (id, -1L, -1L, -1L, false) }
    }).toDF("id", "width", "height", "pix_checksum", "ok")
  }

  /** decode → nearest-neighbor half-scale (target (w/2, h/2), source
    * sample (2x, 2y)) → re-encode PNG → decode again; output carries both
    * geometries, the resized checksum, and the re-encoded byte count.
    * Exercises the full codec round trip on every row. */
  def resizeHalfImages(ds: Dataset[(Long, Array[Byte])]): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions(_.map { case (id, bytes) =>
      try {
        val img = ImageIO.read(new ByteArrayInputStream(bytes))
        if (img == null) (id, -1L, -1L, -1L, -1L, -1L, -1L, false)
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          val (w2, h2) = (math.max(w / 2, 1), math.max(h / 2, 1))
          val small = new java.awt.image.BufferedImage(w2, h2,
            java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val src = img.getRaster
          val dst = small.getRaster
          var y = 0
          while (y < h2) {
            var x = 0
            while (x < w2) {
              dst.setSample(x, y, 0,
                src.getSample(math.min(2 * x, w - 1),
                  math.min(2 * y, h - 1), 0))
              x += 1
            }
            y += 1
          }
          val out = new ByteArrayOutputStream()
          ImageIO.write(small, "png", out)
          val reBytes = out.toByteArray
          val reRead = ImageIO.read(new ByteArrayInputStream(reBytes))
          (id, w.toLong, h.toLong, w2.toLong, h2.toLong,
            rasterChecksum(reRead), reBytes.length.toLong, true)
        }
      } catch {
        case _: Exception => (id, -1L, -1L, -1L, -1L, -1L, -1L, false)
      }
    }).toDF("id", "width", "height", "new_width", "new_height",
      "resized_checksum", "png_bytes", "ok")
  }
}
