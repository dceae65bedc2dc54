package graft.catalog

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import org.roaringbitmap.RoaringBitmap

/** Roaring-bitmap deletion vectors (reference
  * src/storage/ducklake_deletion_vector.cpp + ducklake_puffin.cpp).
  *
  * Two on-disk framings, auto-detected by magic on read:
  *  - legacy: the bare serialized RoaringBitmap (rounds 2-3);
  *  - Iceberg-v3 Puffin (`deletion_vector_format=puffin`): a Puffin file
  *    ("PFA1" magic, JSON footer) holding one `deletion-vector-v1` blob —
  *    big-endian length, D1 D3 39 64 blob magic, the bitmap in the
  *    portable 64-bit Roaring layout, CRC-32 — per the published Iceberg
  *    v3 spec, so other engines' readers can consume our DVs.
  *
  * Row positions within a single parquet file fit in an int (one 32-bit
  * bucket of the 64-bit portable layout). */
object DeletionVectors {

  def serialize(positions: Iterator[Long]): Array[Byte] = {
    val bm = bitmapOf(positions)
    val bos = new ByteArrayOutputStream()
    bm.serialize(new DataOutputStream(bos))
    bos.toByteArray
  }

  private def bitmapOf(positions: Iterator[Long]): RoaringBitmap = {
    val bm = new RoaringBitmap()
    positions.foreach(p => bm.add(p.toInt))
    bm.runOptimize()
    bm
  }

  def deserialize(bytes: Array[Byte]): RoaringBitmap = {
    val bm = new RoaringBitmap()
    bm.deserialize(ByteBuffer.wrap(bytes))
    bm
  }

  def positions(bytes: Array[Byte]): Seq[Long] = {
    val bm =
      if (isPuffin(bytes)) puffinBitmap(bytes)
      else deserialize(bytes)
    val out = new scala.collection.mutable.ArrayBuffer[Long](bm.getCardinality)
    bm.forEach(new org.roaringbitmap.IntConsumer {
      override def accept(v: Int): Unit = out += v.toLong
    })
    out.toSeq
  }

  def cardinality(bytes: Array[Byte]): Long =
    (if (isPuffin(bytes)) puffinBitmap(bytes) else deserialize(bytes))
      .getLongCardinality

  // ------------------------------------------------------ puffin framing

  private val PuffinMagic = "PFA1".getBytes(StandardCharsets.UTF_8)
  private val DvMagic = Array(0xD1, 0xD3, 0x39, 0x64).map(_.toByte)

  def isPuffin(bytes: Array[Byte]): Boolean =
    bytes.length > 8 && bytes.startsWith(PuffinMagic)

  /** 64-bit portable Roaring layout with our single sub-2^32 bucket:
    * 8-byte LE bucket count, 4-byte LE key 0, then the standard 32-bit
    * serialization. */
  private def portable64(bm: RoaringBitmap): Array[Byte] = {
    val inner = {
      val bos = new ByteArrayOutputStream()
      bm.serialize(new DataOutputStream(bos))
      bos.toByteArray
    }
    val bb = ByteBuffer.allocate(12 + inner.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.putLong(1L).putInt(0).put(inner)
    bb.array()
  }

  private def fromPortable64(b: ByteBuffer): RoaringBitmap = {
    b.order(ByteOrder.LITTLE_ENDIAN)
    val buckets = b.getLong
    require(buckets <= 1, s"multi-bucket DV unsupported ($buckets buckets)")
    if (buckets == 0) return new RoaringBitmap()
    val key = b.getInt
    require(key == 0, s"positions beyond 2^32 unsupported (bucket $key)")
    val bm = new RoaringBitmap()
    bm.deserialize(b.slice())
    bm
  }

  /** Serialize one data file's deletion vector as a complete Puffin file
    * holding a single `deletion-vector-v1` blob. */
  def serializePuffin(dataFilePath: String,
      positions: Iterator[Long]): Array[Byte] = {
    val bm = bitmapOf(positions)
    val vector = portable64(bm)
    // blob = len(magic+vector) BE, magic, vector, crc32(magic+vector) BE
    val crc = new java.util.zip.CRC32()
    crc.update(DvMagic); crc.update(vector)
    val blob = ByteBuffer.allocate(4 + 4 + vector.length + 4)
    blob.putInt(4 + vector.length) // big-endian (ByteBuffer default)
    blob.put(DvMagic).put(vector).putInt(crc.getValue.toInt)
    val blobBytes = blob.array()

    val footerJson =
      s"""{"blobs":[{"type":"deletion-vector-v1","fields":[],
         |"snapshot-id":-1,"sequence-number":-1,
         |"offset":${PuffinMagic.length},"length":${blobBytes.length},
         |"properties":{"referenced-data-file":${jsonStr(dataFilePath)},
         |"cardinality":"${bm.getLongCardinality}"}}]}"""
        .stripMargin.replace("\n", "")
    val payload = footerJson.getBytes(StandardCharsets.UTF_8)
    val out = ByteBuffer.allocate(PuffinMagic.length + blobBytes.length +
      PuffinMagic.length + payload.length + 4 + 4 + PuffinMagic.length)
    out.put(PuffinMagic).put(blobBytes)
    out.put(PuffinMagic) // footer starts with magic too
    out.put(payload)
    out.order(ByteOrder.LITTLE_ENDIAN).putInt(payload.length)
    out.putInt(0) // flags: payload uncompressed
    out.put(PuffinMagic)
    out.array()
  }

  /** Extract the (single) deletion-vector blob from a Puffin file. */
  private def puffinBitmap(bytes: Array[Byte]): RoaringBitmap = {
    val bb = ByteBuffer.wrap(bytes)
    val tail = bytes.length
    require(bytes.slice(tail - 4, tail).sameElements(PuffinMagic),
      "corrupt puffin: trailing magic missing")
    val payloadSize = ByteBuffer.wrap(bytes, tail - 12, 4)
      .order(ByteOrder.LITTLE_ENDIAN).getInt
    val payload = new String(bytes,
      tail - 12 - payloadSize, payloadSize, StandardCharsets.UTF_8)
    val offset = """"offset":(\d+)""".r.findFirstMatchIn(payload)
      .map(_.group(1).toInt).getOrElse(PuffinMagic.length)
    bb.position(offset)
    val blobLen = bb.getInt // BE length of magic+vector
    val magic = new Array[Byte](4)
    bb.get(magic)
    require(magic.sameElements(DvMagic), "corrupt puffin: DV magic missing")
    val vector = new Array[Byte](blobLen - 4)
    bb.get(vector)
    val storedCrc = bb.getInt
    val crc = new java.util.zip.CRC32()
    crc.update(DvMagic); crc.update(vector)
    require(storedCrc == crc.getValue.toInt, "corrupt puffin: CRC mismatch")
    fromPortable64(ByteBuffer.wrap(vector))
  }

  private def jsonStr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
}
