package graft.sources

import java.nio.charset.StandardCharsets

/** Minimal read-only SQLite 3 file reader — enough of the public file
  * format (sqlite.org/fileformat2.html) to walk table B-trees and decode
  * records, so GeoPackage staging files can be ingested without a JDBC
  * driver (none exists in this zero-egress environment).
  *
  * Supported: table B-tree leaf/interior pages, varints, all record
  * serial types, payload overflow chains, rowid-alias INTEGER PRIMARY
  * KEY columns. Not supported (not needed for reading staged GPKG
  * tables): indexes, WAL journals, freelist reuse, encodings other than
  * UTF-8.
  *
  * Scale model: one staged .gpkg is a single downloaded artifact (like
  * the reference's, gpkg_loader.py:24-115); files parse whole inside an
  * executor task (binaryFile source), so a directory of staged files
  * parallelizes per file while each parse stays a local in-memory walk.
  */
object Sqlite {

  final case class TableInfo(name: String, rootPage: Int, sql: String)

  final class Db(val bytes: Array[Byte]) {
    require(bytes.length >= 100 &&
      new String(bytes, 0, 15, StandardCharsets.US_ASCII) == "SQLite format 3",
      "not an SQLite 3 file")

    private def u8(off: Int): Int  = bytes(off) & 0xff
    private def u16(off: Int): Int = (u8(off) << 8) | u8(off + 1)
    private def u32(off: Int): Long =
      (u8(off).toLong << 24) | (u8(off + 1) << 16) | (u8(off + 2) << 8) | u8(off + 3)

    val pageSize: Int = { val p = u16(16); if (p == 1) 65536 else p }
    /** bytes 20: reserved space at the end of every page. */
    val usableSize: Int = pageSize - u8(20)

    /** Varint: 1-9 bytes, 7 bits each, 9th byte contributes all 8. */
    def varint(off: Int): (Long, Int) = {
      var v = 0L
      var i = 0
      while (i < 8) {
        val b = u8(off + i)
        v = (v << 7) | (b & 0x7f)
        if ((b & 0x80) == 0) return (v, i + 1)
        i += 1
      }
      ((v << 8) | u8(off + 8), 9)
    }

    /** Payload bytes of a cell, following overflow chains when the
      * record spills past its local share (format §1.6 thresholds).
      */
    private def payload(off: Int, total: Long): (Array[Byte], Int) = {
      val x = usableSize - 35
      if (total <= x) {
        val out = java.util.Arrays.copyOfRange(bytes, off, off + total.toInt)
        (out, off + total.toInt)
      } else {
        val m = ((usableSize - 12) * 32) / 255 - 23
        val k = m + ((total - m) % (usableSize - 4)).toInt
        val local = if (k <= x) k else m
        val out = new Array[Byte](total.toInt)
        System.arraycopy(bytes, off, out, 0, local)
        var filled = local
        var page   = u32(off + local)
        while (page != 0 && filled < total) {
          val pOff = ((page - 1) * pageSize).toInt
          val n    = math.min(usableSize - 4, total.toInt - filled)
          System.arraycopy(bytes, pOff + 4, out, filled, n)
          filled += n
          page = u32(pOff)
        }
        (out, off + local + 4)
      }
    }

    /** Decode one record (header of serial types + body). */
    private def record(p: Array[Byte]): Seq[Any] = {
      def vint(off: Int): (Long, Int) = {
        var v = 0L; var i = 0
        while (i < 8) {
          val b = p(off + i) & 0xff
          v = (v << 7) | (b & 0x7f)
          if ((b & 0x80) == 0) return (v, i + 1)
          i += 1
        }
        ((v << 8) | (p(off + 8) & 0xff), 9)
      }
      def beInt(off: Int, n: Int): Long = {
        var v = if ((p(off) & 0x80) != 0) -1L else 0L // sign-extend
        var i = 0
        while (i < n) { v = (v << 8) | (p(off + i) & 0xff); i += 1 }
        v
      }
      val (hlen, h0) = vint(0)
      var hOff = h0
      var bOff = hlen.toInt
      val out  = Seq.newBuilder[Any]
      while (hOff < hlen) {
        val (st, n) = vint(hOff)
        hOff += n
        st match {
          case 0 => out += null
          case 1 => out += beInt(bOff, 1); bOff += 1
          case 2 => out += beInt(bOff, 2); bOff += 2
          case 3 => out += beInt(bOff, 3); bOff += 3
          case 4 => out += beInt(bOff, 4); bOff += 4
          case 5 => out += beInt(bOff, 6); bOff += 6
          case 6 => out += beInt(bOff, 8); bOff += 8
          case 7 =>
            out += java.lang.Double.longBitsToDouble(beInt(bOff, 8)); bOff += 8
          case 8 => out += 0L
          case 9 => out += 1L
          case t if t >= 13 && t % 2 == 1 =>
            val len = ((t - 13) / 2).toInt
            out += new String(p, bOff, len, StandardCharsets.UTF_8); bOff += len
          case t if t >= 12 =>
            val len = ((t - 12) / 2).toInt
            out += java.util.Arrays.copyOfRange(p, bOff, bOff + len); bOff += len
          case t =>
            throw new IllegalStateException(s"reserved serial type $t")
        }
      }
      out.result()
    }

    /** Depth-first walk of a table B-tree in rowid order. */
    def walkTable(rootPage: Int)(cb: (Long, Seq[Any]) => Unit): Unit = {
      val pOff   = (rootPage - 1) * pageSize
      val hdrOff = pOff + (if (rootPage == 1) 100 else 0)
      u8(hdrOff) match {
        case 0x0d => // leaf
          val n = u16(hdrOff + 3)
          var i = 0
          while (i < n) {
            val cell        = pOff + u16(hdrOff + 8 + 2 * i)
            val (plen, a)   = varint(cell)
            val (rowid, b)  = varint(cell + a)
            val (bodyBytes, _) = payload(cell + a + b, plen)
            cb(rowid, record(bodyBytes))
            i += 1
          }
        case 0x05 => // interior
          val n = u16(hdrOff + 3)
          var i = 0
          while (i < n) {
            val cell = pOff + u16(hdrOff + 12 + 2 * i)
            walkTable(u32(cell).toInt)(cb)
            i += 1
          }
          walkTable(u32(hdrOff + 8).toInt)(cb)
        case t =>
          throw new IllegalStateException(s"unexpected page type 0x${t.toHexString}")
      }
    }

    /** sqlite_master (root = page 1): (type, name, tbl_name, rootpage, sql). */
    def tables: Seq[TableInfo] = {
      val out = Seq.newBuilder[TableInfo]
      walkTable(1) { (_, vals) =>
        if (vals.headOption.contains("table"))
          out += TableInfo(
            vals(1).asInstanceOf[String],
            vals(3).asInstanceOf[Long].toInt,
            String.valueOf(vals(4)))
      }
      out.result()
    }

    /** Column names from a CREATE TABLE statement: top-level
      * comma-separated entries, first token each, constraints skipped.
      */
    def columnNames(sql: String): Seq[String] = {
      val body  = sql.substring(sql.indexOf('(') + 1, sql.lastIndexOf(')'))
      val parts = Seq.newBuilder[String]
      var depth = 0; var start = 0; var i = 0
      while (i < body.length) {
        body.charAt(i) match {
          case '(' => depth += 1
          case ')' => depth -= 1
          case ',' if depth == 0 => parts += body.substring(start, i); start = i + 1
          case _ =>
        }
        i += 1
      }
      parts += body.substring(start)
      val constraint = Set("primary", "unique", "check", "foreign", "constraint")
      parts.result().map(_.trim).filter(_.nonEmpty)
        .filterNot(p => constraint.contains(p.split("[\\s(]+")(0).toLowerCase))
        .map(_.split("\\s+")(0).stripPrefix("\"").stripSuffix("\"")
          .stripPrefix("`").stripSuffix("`").stripPrefix("[").stripSuffix("]"))
    }

    /** REAL-affinity columns (format §2.1): SQLite stores losslessly
      * integral REAL values as integers on disk and converts back on
      * read — mirror that, or 4800.0 comes out as 4800L.
      */
    def realAffinity(sql: String): Set[Int] = {
      val body  = sql.substring(sql.indexOf('(') + 1, sql.lastIndexOf(')'))
      val names = columnNames(sql)
      names.zipWithIndex.collect {
        case (n, i) if {
          val decl = body.split(",").map(_.trim)
            .find(_.toLowerCase.startsWith(n.toLowerCase)).getOrElse("")
          val t = decl.toLowerCase
          t.contains("real") || t.contains("floa") || t.contains("doub")
        } => i
      }.toSet
    }

    /** The rowid-alias column (INTEGER PRIMARY KEY), if declared: its
      * stored value is NULL and the rowid substitutes.
      */
    def rowidAlias(sql: String): Option[Int] = {
      val cols = columnNames(sql)
      val lower = sql.toLowerCase
      cols.zipWithIndex.collectFirst {
        case (c, i) if lower.matches(
          s"(?s).*[\\s(\"`\\[]${java.util.regex.Pattern.quote(c.toLowerCase)}[\"`\\]]?\\s+integer\\s+primary\\s+key.*") => i
      }
    }

    /** All rows of `table` as (rowid, column-name → value). */
    def readTable(table: String): (Seq[String], Seq[(Long, Seq[Any])]) = {
      val info = tables.find(_.name.equalsIgnoreCase(table))
        .getOrElse(throw new NoSuchElementException(s"no table '$table'"))
      val names = columnNames(info.sql)
      val alias = rowidAlias(info.sql)
      val reals = realAffinity(info.sql)
      val rows  = Seq.newBuilder[(Long, Seq[Any])]
      walkTable(info.rootPage) { (rowid, vals0) =>
        // short records (ALTER TABLE ADD COLUMN) pad with nulls
        val padded = vals0.padTo(names.length, null)
        val aliased = alias match {
          case Some(i) if padded(i) == null => padded.updated(i, rowid: Any)
          case _                            => padded
        }
        val vals = aliased.zipWithIndex.map {
          case (v: Long, i) if reals.contains(i) => v.toDouble
          case (v, _)                            => v
        }
        rows += ((rowid, vals))
      }
      (names, rows.result())
    }
  }
}
