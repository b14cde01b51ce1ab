package graft.lake

import org.roaringbitmap.RoaringBitmap

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Path}

/** Delta deletion-vector codec — the PUBLIC formats only (delta.io
  * PROTOCOL.md, "Deletion Vector Descriptor Schema" + "Deletion Vector
  * Format"; reference stack pins Delta 3.2.0 at
  * analytics/spark/conf/spark-defaults.conf:71, whose DML writes these):
  *
  *  - '''RoaringBitmapArray''', "portable" serialization: a 64-bit
  *    position set stored as `[magic 1681511377 (4B LE)][number of
  *    32-bit bitmaps n (8B LE)][bitmap 0][bitmap 1]…`, where position v
  *    lives in bitmap `v >>> 32` at 32-bit value `v & 0xFFFFFFFF`, and
  *    each bitmap is the standard RoaringFormatSpec portable
  *    little-endian serialization (the org.roaringbitmap wire format).
  *  - '''DV file''': `[version byte 1]` then, at each descriptor's
  *    `offset`: `[dataSize (4B BE)][data (dataSize bytes)][CRC-32 of
  *    data (4B BE)]`.
  *  - '''Z85''' (ZeroMQ spec 32): 4 bytes → 5 chars over the 85-char
  *    alphabet; encodes the UUID in `u`-storage path suffixes and the
  *    whole blob for `i` (inline) storage.
  *
  * Everything here is bitmap-sized driver/executor-local computation;
  * nothing scans data files.
  */
object Dv {

  /** PROTOCOL.md magic for the portable RoaringBitmapArray. */
  private val MagicNumber = 1681511377

  // ------------------------------------------------------------------
  // RoaringBitmapArray (64-bit position set over 32-bit bitmaps)
  // ------------------------------------------------------------------

  /** Immutable 64-bit position set decoded from (or encodable to) the
    * portable format. `bitmaps(i)` holds positions with high word `i`.
    */
  final class PositionSet private[Dv] (val bitmaps: Array[RoaringBitmap])
    extends Serializable {
    def contains(pos: Long): Boolean = {
      require(pos >= 0, s"negative row position $pos")
      val hi = (pos >>> 32).toInt
      hi < bitmaps.length && bitmaps(hi).contains(pos.toInt)
    }
    def cardinality: Long = bitmaps.map(_.getLongCardinality).sum
    def positions: Iterator[Long] =
      bitmaps.iterator.zipWithIndex.flatMap { case (b, hi) =>
        val base = hi.toLong << 32
        val it = b.getIntIterator
        new Iterator[Long] {
          def hasNext: Boolean = it.hasNext
          def next(): Long = base | (it.next().toLong & 0xFFFFFFFFL)
        }
      }
  }

  /** Mutable position accumulator for EXECUTOR-side DV builds — the
    * typed-Aggregator buffer behind [[DeltaLog]]'s DV delete. State is
    * bitmap-sized and java-serializable for the partial-agg shuffle
    * (RoaringBitmap is Externalizable), so the driver receives bitmap
    * BYTES per file, never row positions.
    */
  final class PositionSetBuilder extends Serializable {
    private val bitmaps =
      scala.collection.mutable.ArrayBuffer.empty[RoaringBitmap]
    private def at(hi: Int): RoaringBitmap = {
      while (bitmaps.length <= hi) bitmaps += new RoaringBitmap()
      bitmaps(hi)
    }
    def add(pos: Long): this.type = {
      require(pos >= 0, s"negative row position $pos")
      at((pos >>> 32).toInt).add(pos.toInt)
      this
    }
    def merge(o: PositionSetBuilder): this.type = {
      o.bitmaps.zipWithIndex.foreach { case (b, hi) => at(hi).or(b) }
      this
    }
    def result(): PositionSet = new PositionSet(bitmaps.toArray)
  }

  /** Bitmap OR of two position sets — merging a fresh DV into a file's
    * existing one without materializing positions.
    */
  def union(a: PositionSet, b: PositionSet): PositionSet = {
    val n = math.max(a.bitmaps.length, b.bitmaps.length)
    val out = Array.tabulate(n) { i =>
      val r = new RoaringBitmap()
      if (i < a.bitmaps.length) r.or(a.bitmaps(i))
      if (i < b.bitmaps.length) r.or(b.bitmaps(i))
      r
    }
    new PositionSet(out)
  }

  /** Build a position set from sorted-or-not row positions. */
  def positionSet(positions: Iterable[Long]): PositionSet = {
    require(positions.forall(_ >= 0), "row positions must be >= 0")
    val maxHi =
      if (positions.isEmpty) -1
      else positions.iterator.map(p => (p >>> 32).toInt).max
    val bitmaps = Array.fill(maxHi + 1)(new RoaringBitmap())
    positions.foreach(p => bitmaps((p >>> 32).toInt).add(p.toInt))
    new PositionSet(bitmaps)
  }

  /** Portable RoaringBitmapArray bytes for a position set. */
  def serialize(ps: PositionSet): Array[Byte] = {
    val size = 4 + 8 + ps.bitmaps.map(_.serializedSizeInBytes()).sum
    val buf = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(MagicNumber)
    buf.putLong(ps.bitmaps.length.toLong)
    ps.bitmaps.foreach { b => b.runOptimize(); b.serialize(buf) }
    // runOptimize may shrink the serialized size below the allocation
    java.util.Arrays.copyOf(buf.array(), buf.position())
  }

  /** Decode portable RoaringBitmapArray bytes. */
  def deserialize(bytes: Array[Byte]): PositionSet = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val magic = buf.getInt()
    require(magic == MagicNumber,
      s"Dv: bad RoaringBitmapArray magic $magic (want $MagicNumber)")
    val n = buf.getLong()
    require(n >= 0 && n <= Int.MaxValue, s"Dv: absurd bitmap count $n")
    // each bitmap reads from its own positioned duplicate — robust to
    // whether deserialize(ByteBuffer) advances the buffer or not
    // (duplicate() resets byte order; re-set LITTLE_ENDIAN)
    var pos = buf.position()
    val bitmaps = Array.fill(n.toInt) {
      val slice = buf.duplicate().order(ByteOrder.LITTLE_ENDIAN)
      slice.position(pos)
      val b = new RoaringBitmap()
      b.deserialize(slice)
      pos += b.serializedSizeInBytes()
      b
    }
    new PositionSet(bitmaps)
  }

  // ------------------------------------------------------------------
  // DV file blobs
  // ------------------------------------------------------------------

  /** Append one DV blob (`[size BE][data][crc32 BE]`) to `file`,
    * creating it with the version-1 header byte if absent. Returns the
    * descriptor's (offset, sizeInBytes) for the written blob.
    */
  def appendBlob(file: Path, data: Array[Byte]): (Long, Int) = {
    val header: Array[Byte] = Array(1.toByte)
    val existing =
      if (Files.exists(file)) Files.readAllBytes(file) else header
    require(existing.nonEmpty && existing(0) == 1.toByte,
      s"Dv: ${file.getFileName} is not a version-1 deletion vector file")
    val offset = existing.length.toLong
    val crc = new java.util.zip.CRC32()
    crc.update(data)
    val buf = ByteBuffer.allocate(existing.length + 4 + data.length + 4)
    buf.put(existing)
    buf.putInt(data.length) // BE (ByteBuffer default)
    buf.put(data)
    buf.putInt(crc.getValue.toInt)
    Files.write(file, buf.array())
    (offset, data.length)
  }

  /** Read one DV blob at `offset` (size-prefixed, CRC-verified). */
  def readBlob(file: Path, offset: Long, expectSize: Int): Array[Byte] = {
    val all = Files.readAllBytes(file)
    require(all.nonEmpty && all(0) == 1.toByte,
      s"Dv: ${file.getFileName} is not a version-1 deletion vector file")
    val buf = ByteBuffer.wrap(all)
    buf.position(offset.toInt)
    val size = buf.getInt()
    require(size == expectSize,
      s"Dv: blob size $size at offset $offset != descriptor sizeInBytes " +
        s"$expectSize")
    val data = new Array[Byte](size)
    buf.get(data)
    val stored = buf.getInt()
    val crc = new java.util.zip.CRC32()
    crc.update(data)
    require(stored == crc.getValue.toInt,
      s"Dv: CRC mismatch at offset $offset of ${file.getFileName}")
    data
  }

  // ------------------------------------------------------------------
  // Z85 (ZeroMQ spec 32)
  // ------------------------------------------------------------------

  private val Z85Alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ" +
      ".-:+=^!/*?&<>()[]{}@%$#"
  private val Z85Decode: Array[Int] = {
    val d = Array.fill(128)(-1)
    Z85Alphabet.zipWithIndex.foreach { case (c, i) => d(c.toInt) = i }
    d
  }

  /** Z85-encode bytes (length must be a multiple of 4). */
  def z85Encode(bytes: Array[Byte]): String = {
    require(bytes.length % 4 == 0,
      s"Z85 encodes 4-byte groups; got ${bytes.length} bytes")
    val sb = new StringBuilder(bytes.length / 4 * 5)
    var i = 0
    while (i < bytes.length) {
      var v = 0L
      var j = 0
      while (j < 4) { v = (v << 8) | (bytes(i + j) & 0xFFL); j += 1 }
      var div = 85L * 85L * 85L * 85L
      while (div > 0) {
        sb.append(Z85Alphabet(((v / div) % 85L).toInt))
        div /= 85L
      }
      i += 4
    }
    sb.toString
  }

  /** Z85-decode (length must be a multiple of 5). */
  def z85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0, s"Z85 decodes 5-char groups; got ${s.length}")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    var o = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j).toInt
        val d = if (c < 128) Z85Decode(c) else -1
        require(d >= 0, s"Z85: invalid character '${s.charAt(i + j)}'")
        v = v * 85L + d
        j += 1
      }
      var k = 3
      while (k >= 0) { out(o + k) = (v & 0xFF).toByte; v >>= 8; k -= 1 }
      i += 5
      o += 4
    }
    out
  }

  /** UUID → the 16 bytes Z85 expects (big-endian msb, lsb). */
  def uuidBytes(u: java.util.UUID): Array[Byte] = {
    val b = ByteBuffer.allocate(16)
    b.putLong(u.getMostSignificantBits)
    b.putLong(u.getLeastSignificantBits)
    b.array()
  }

  def uuidFromBytes(bytes: Array[Byte]): java.util.UUID = {
    require(bytes.length == 16, s"UUID needs 16 bytes, got ${bytes.length}")
    val b = ByteBuffer.wrap(bytes)
    new java.util.UUID(b.getLong(), b.getLong())
  }

  /** `u`-storage DV file name for a UUID (PROTOCOL.md:
    * `deletion_vector_<uuid>.bin`).
    */
  def dvFileName(u: java.util.UUID): String = s"deletion_vector_$u.bin"
}
