package graft.lake

import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Deletion-vector codec contracts: Z85 against the PUBLIC ZeroMQ test
  * vector (spec 32), RoaringBitmapArray portable round-trips including
  * >2^32 positions, and the size-prefixed CRC'd DV file blobs.
  */
class DvSpec extends AnyFunSuite {

  test("Z85 matches the ZeroMQ spec-32 test vector both ways") {
    // rfc.zeromq.org/spec/32: 0x86 0x4F 0xD2 0x6F 0xB5 0x59 0xF7 0x5B
    // <-> "HelloWorld"
    val bytes = Array(0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B)
      .map(_.toByte)
    assert(Dv.z85Encode(bytes) == "HelloWorld")
    assert(Dv.z85Decode("HelloWorld").toSeq == bytes.toSeq)
  }

  test("Z85 round-trips UUIDs (16 bytes <-> 20 chars)") {
    val u = new java.util.UUID(0x0123456789ABCDEFL, 0xFEDCBA9876543210L)
    val enc = Dv.z85Encode(Dv.uuidBytes(u))
    assert(enc.length == 20)
    assert(Dv.uuidFromBytes(Dv.z85Decode(enc)) == u)
  }

  test("position set round-trips the portable format, including " +
    "positions above 2^32 and empty sets") {
    val positions = Seq(0L, 1L, 7L, 100000L, (1L << 32) + 5L,
      (3L << 32) + 123456L)
    val ps = Dv.positionSet(positions)
    assert(ps.cardinality == positions.length)
    positions.foreach(p => assert(ps.contains(p), s"missing $p"))
    assert(!ps.contains(2L) && !ps.contains((2L << 32) + 5L))
    val round = Dv.deserialize(Dv.serialize(ps))
    assert(round.positions.toSeq.sorted == positions.sorted)
    val empty = Dv.deserialize(Dv.serialize(Dv.positionSet(Nil)))
    assert(empty.cardinality == 0L && !empty.contains(0L))
  }

  test("DV file blobs: version header, append at offsets, CRC verified") {
    val dir = Files.createTempDirectory("graft-dv")
    val f = dir.resolve("deletion_vector_test.bin")
    val d1 = Dv.serialize(Dv.positionSet(Seq(1L, 2L, 3L)))
    val d2 = Dv.serialize(Dv.positionSet(Seq(10L, 20L)))
    val (o1, s1) = Dv.appendBlob(f, d1)
    val (o2, s2) = Dv.appendBlob(f, d2)
    assert(o1 == 1L, "first blob sits right after the version byte")
    assert(o2 == o1 + 4 + s1 + 4, "second blob follows size+data+crc")
    assert(Dv.readBlob(f, o1, s1).toSeq == d1.toSeq)
    assert(Dv.readBlob(f, o2, s2).toSeq == d2.toSeq)
    assert(Dv.deserialize(Dv.readBlob(f, o2, s2)).positions.toSeq
      == Seq(10L, 20L))
    // corrupt one data byte: CRC must catch it
    val bytes = Files.readAllBytes(f)
    bytes(o1.toInt + 4 + 1) = (bytes(o1.toInt + 4 + 1) ^ 0x40).toByte
    Files.write(f, bytes)
    val e = intercept[IllegalArgumentException](Dv.readBlob(f, o1, s1))
    assert(e.getMessage.contains("CRC"), e.getMessage)
  }
}
