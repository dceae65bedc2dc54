package graft.catalog

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.roaringbitmap.RoaringBitmap

/** Roaring-bitmap deletion vectors (reference
  * src/storage/ducklake_deletion_vector.cpp + ducklake_puffin.cpp —
  * Iceberg-v3-style blobs; we store one serialized bitmap per data file,
  * CRC-free since the file lives next to its catalog entry). Row positions
  * within a single parquet file fit in an int. */
object DeletionVectors {

  def serialize(positions: Iterator[Long]): Array[Byte] = {
    val bm = new RoaringBitmap()
    positions.foreach(p => bm.add(p.toInt))
    bm.runOptimize()
    val bos = new ByteArrayOutputStream()
    bm.serialize(new DataOutputStream(bos))
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): RoaringBitmap = {
    val bm = new RoaringBitmap()
    bm.deserialize(ByteBuffer.wrap(bytes))
    bm
  }

  def positions(bytes: Array[Byte]): Seq[Long] = {
    val bm = deserialize(bytes)
    val out = new scala.collection.mutable.ArrayBuffer[Long](bm.getCardinality)
    bm.forEach(new org.roaringbitmap.IntConsumer {
      override def accept(v: Int): Unit = out += v.toLong
    })
    out.toSeq
  }

  def cardinality(bytes: Array[Byte]): Long =
    deserialize(bytes).getLongCardinality
}
