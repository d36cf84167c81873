package graft.enrich

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Builds tiny but fully valid .mmdb files (per the public MaxMind DB spec)
  * in memory, then reads them back with [[Mmdb]] — search tree, data
  * section with pointers, metadata map, 24-bit records, v4 and v6 trees. */
object MmdbTestWriter {

  private class Node {
    var left: Any = null // null = empty | Node | Integer (data-section offset)
    var right: Any = null
  }

  /** Encoded data section + per-country offsets. */
  private def dataSection(countries: Seq[(String, String)]): (Array[Byte], Map[String, Int], Map[String, Int]) = {
    val buf = new java.io.ByteArrayOutputStream()
    def str(s: String): Unit = {
      val b = s.getBytes("UTF-8"); require(b.length < 29)
      buf.write((2 << 5) | b.length); buf.write(b)
    }
    def mapHeader(n: Int): Unit = buf.write((7 << 5) | n)
    var offsets = Map.empty[String, Int]
    var nameOffsets = Map.empty[String, Int]
    countries.foreach { case (code, name) =>
      offsets += (code -> buf.size())
      mapHeader(1); str("country")
      mapHeader(2)
      str("iso_code"); str(code)
      str("names"); nameOffsets += (code -> buf.size()); mapHeader(1); str("en"); str(name)
    }
    (buf.toByteArray, offsets, nameOffsets)
  }

  /** A data-section pointer value (type 1) to `target` (data-section offset). */
  private def pointerBytes(target: Int): Array[Byte] = {
    require(target < 2048)
    Array((((1 << 5) | ((target >> 8) & 0x7)).toByte), (target & 0xFF).toByte)
  }

  private def metaBytes(nodeCount: Int, ipVersion: Int, recordSize: Int): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream()
    def str(s: String): Unit = {
      val b = s.getBytes("UTF-8"); buf.write((2 << 5) | b.length); buf.write(b)
    }
    def uint(typ: Int, v: Long): Unit = {
      var n = 0; var x = v
      while (x != 0) { n += 1; x >>>= 8 }
      if (typ <= 7) buf.write((typ << 5) | n)
      else { buf.write(n); buf.write(typ - 7) } // extended (uint64)
      var i = n - 1
      while (i >= 0) { buf.write(((v >>> (8 * i)) & 0xFF).toInt); i -= 1 }
    }
    buf.write(Array(0xAB.toByte, 0xCD.toByte, 0xEF.toByte))
    buf.write("MaxMind.com".getBytes("US-ASCII"))
    buf.write((7 << 5) | 9) // metadata map, 9 entries
    str("binary_format_major_version"); uint(5, 2)
    str("binary_format_minor_version"); uint(5, 0)
    str("build_epoch"); uint(9, 1700000000L)
    str("database_type"); str("GeoLite2-Country")
    str("description"); buf.write((7 << 5) | 1); str("en"); str("test db")
    str("ip_version"); uint(5, ipVersion)
    str("languages"); buf.write(1); buf.write(11 - 7); str("en") // array, 1 elem
    str("node_count"); uint(6, nodeCount)
    str("record_size"); uint(5, recordSize)
    buf.toByteArray
  }

  /** Build an mmdb holding the given (base, prefixLen, countryCode) v4
    * entries. `viaPointer` country codes get their tree record routed
    * through a data-section pointer (exercises pointer decoding). */
  def build(entries: Seq[(Long, Int, String)], countries: Seq[(String, String)],
      ipVersion: Int = 4, viaPointer: Set[String] = Set.empty,
      recordSize: Int = 24): Array[Byte] = {
    val root = new Node
    entries.foreach { case (base, plen, code) =>
      var n = root
      var bit = 31
      while (bit > 32 - plen) {
        val side = (base >>> bit) & 1L
        val next = (if (side == 0) n.left else n.right) match {
          case c: Node => c
          case null => val c = new Node; if (side == 0) n.left = c else n.right = c; c
          case _ => throw new IllegalStateException("overlapping CIDRs")
        }
        n = next
        bit -= 1
      }
      val side = (base >>> bit) & 1L
      if (side == 0) n.left = code else n.right = code
    }
    // v6 tree: IPv4 space hangs under 96 left branches
    val top = if (ipVersion == 6) {
      val t = new Node
      var n = t
      var i = 1
      while (i < 96) { val c = new Node; n.left = c; n = c; i += 1 }
      n.left = root
      t
    } else root

    // number nodes (preorder), then emit 24-bit records
    val nodes = scala.collection.mutable.ArrayBuffer.empty[Node]
    def collect(n: Node): Unit = {
      nodes += n
      Seq(n.left, n.right).foreach { case c: Node => collect(c); case _ => () }
    }
    collect(top)
    val index = nodes.zipWithIndex.toMap
    val nodeCount = nodes.length

    val (data0, offsets, _) = dataSection(countries)
    // append pointer stubs for the viaPointer countries
    val dataBuf = new java.io.ByteArrayOutputStream()
    dataBuf.write(data0)
    val ptrOffsets = viaPointer.map { code =>
      val at = dataBuf.size()
      dataBuf.write(pointerBytes(offsets(code)))
      code -> at
    }.toMap
    val data = dataBuf.toByteArray

    def recordValue(slot: Any, viaPtrUsed: scala.collection.mutable.Set[String]): Int = slot match {
      case null => nodeCount
      case c: Node => index(c)
      case code: String =>
        // first use of a viaPointer country goes through the pointer stub
        val off = if (viaPointer.contains(code) && viaPtrUsed.add(code))
          ptrOffsets(code) else offsets(code)
        nodeCount + 16 + off
    }
    val used = scala.collection.mutable.Set.empty[String]
    val tree = new java.io.ByteArrayOutputStream()
    nodes.foreach { n =>
      val (l, r) = (recordValue(n.left, used), recordValue(n.right, used))
      recordSize match {
        case 24 =>
          Seq(l, r).foreach { v =>
            tree.write((v >> 16) & 0xFF); tree.write((v >> 8) & 0xFF); tree.write(v & 0xFF)
          }
        case 28 => // l low 24 bits, then [l hi nibble | r hi nibble], r low 24
          tree.write((l >> 16) & 0xFF); tree.write((l >> 8) & 0xFF); tree.write(l & 0xFF)
          tree.write((((l >> 24) & 0xF) << 4) | ((r >> 24) & 0xF))
          tree.write((r >> 16) & 0xFF); tree.write((r >> 8) & 0xFF); tree.write(r & 0xFF)
        case 32 =>
          Seq(l, r).foreach { v =>
            tree.write((v >> 24) & 0xFF); tree.write((v >> 16) & 0xFF)
            tree.write((v >> 8) & 0xFF); tree.write(v & 0xFF)
          }
      }
    }

    val out = new java.io.ByteArrayOutputStream()
    out.write(tree.toByteArray)
    out.write(new Array[Byte](16)) // data-section separator
    out.write(data)
    out.write(metaBytes(nodeCount, ipVersion, recordSize))
    out.toByteArray
  }

  def writeTemp(bytes: Array[Byte]): String = {
    val f = java.io.File.createTempFile("graft-test", ".mmdb")
    f.deleteOnExit()
    java.nio.file.Files.write(f.toPath, bytes)
    f.getAbsolutePath
  }
}

class MmdbSpec extends SparkSpec {

  val countries = Seq("US" -> "United States", "NL" -> "Netherlands", "DE" -> "Germany")
  def ip(s: String): Long =
    s.split('.').foldLeft(0L)((acc, o) => (acc << 8) | o.toLong)

  val entries = Seq(
    (ip("1.0.0.0"), 24, "US"),
    (ip("1.0.1.0"), 24, "US"),
    (ip("10.20.0.0"), 16, "NL"),
    (ip("203.0.113.0"), 24, "DE"))

  val expected = Set(
    (ip("1.0.0.0"), ip("1.0.0.255"), "US", "United States"),
    (ip("1.0.1.0"), ip("1.0.1.255"), "US", "United States"),
    (ip("10.20.0.0"), ip("10.20.255.255"), "NL", "Netherlands"),
    (ip("203.0.113.0"), ip("203.0.113.255"), "DE", "Germany"))

  test("v4 mmdb round-trips to exact ranges (incl. pointer-typed data)") {
    val bytes = MmdbTestWriter.build(entries, countries, ipVersion = 4,
      viaPointer = Set("DE"))
    val got = Mmdb.readRanges(bytes)
      .map(r => (r.startIpNum, r.endIpNum, r.countryCode, r.countryName)).toSet
    assert(got == expected)
  }

  test("28-bit and 32-bit record sizes round-trip identically") {
    for (rs <- Seq(28, 32)) {
      val bytes = MmdbTestWriter.build(entries, countries, recordSize = rs)
      val got = Mmdb.readRanges(bytes)
        .map(r => (r.startIpNum, r.endIpNum, r.countryCode, r.countryName)).toSet
      assert(got == expected, s"record size $rs")
    }
  }

  test("v6 mmdb: IPv4 ranges read from the ::/96 subtree") {
    val bytes = MmdbTestWriter.build(entries, countries, ipVersion = 6)
    val got = Mmdb.readRanges(bytes)
      .map(r => (r.startIpNum, r.endIpNum, r.countryCode, r.countryName)).toSet
    assert(got == expected)
  }

  test("fromMmdb feeds GeoIp.enrich like the CSV source") {
    import spark.implicits._
    val path = MmdbTestWriter.writeTemp(
      MmdbTestWriter.build(entries, countries, ipVersion = 4))
    val geo = Mmdb.fromMmdb(spark, path)
    val events = Seq("1.0.0.7", "1.0.1.200", "10.20.30.40", "203.0.113.9", "8.8.8.8")
      .toDF("address")
    val got = GeoIp.enrich(events, geo)
      .select(col("address"), col("country_code")).collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got == Map(
      "1.0.0.7" -> Some("US"), "1.0.1.200" -> Some("US"),
      "10.20.30.40" -> Some("NL"), "203.0.113.9" -> Some("DE"),
      "8.8.8.8" -> None))
  }

  test("metadata parses") {
    val meta = Mmdb.readMetadata(MmdbTestWriter.build(entries, countries))
    assert(meta.recordSize == 24 && meta.ipVersion == 4 &&
      meta.databaseType == "GeoLite2-Country" && meta.nodeCount > 0)
  }
}
