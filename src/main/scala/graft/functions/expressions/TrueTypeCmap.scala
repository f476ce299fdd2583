package graft.functions.expressions

/** TrueType/OpenType `cmap` reader (public sfnt format — Apple TrueType
  * Reference / Microsoft OpenType spec / ISO 14496-22): the character →
  * glyph table every embedded font carries, INVERTED here to glyph →
  * Unicode so an Identity-H PDF font WITHOUT a /ToUnicode CMap still
  * yields text (CID = GID under /CIDToGIDMap /Identity, so the font's
  * own cmap is the only Unicode evidence left — the same fallback
  * PyMuPDF-class extractors use, reference vector_db.py:247's scope).
  * Subtable formats 4 (segment mapping to delta values — the BMP table
  * every real font ships) and 12 (segmented coverage, full Unicode) are
  * read; anything else fails loudly by format number. Malformed
  * structure fails loudly too — a wrong table here would silently
  * mojibake every CID run it feeds. */
object TrueTypeCmap {

  private def fail(what: String): Nothing =
    throw new IllegalArgumentException(s"PDF parse: embedded font cmap: $what")

  /** glyph id → Unicode string from the font's best Unicode subtable.
    * When several characters map to one glyph, the LOWEST code point
    * wins (deterministic inversion). */
  def glyphToUnicode(font: Array[Byte]): Map[Int, String] = {
    def u8(i: Int): Int = {
      if (i < 0 || i >= font.length) fail(s"offset $i outside ${font.length}-byte font")
      font(i) & 0xFF
    }
    def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def u32(i: Int): Long =
      (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    val sfnt = u32(0)
    if (sfnt != 0x00010000L && sfnt != 0x74727565L /* 'true' */ &&
        sfnt != 0x4F54544FL /* 'OTTO' */ )
      fail(f"unrecognized sfnt version 0x$sfnt%08X")
    val numTables = u16(4)
    var cmapOff = -1L
    var t = 0
    while (t < numTables && cmapOff < 0) {
      val rec = 12 + t * 16
      if (u32(rec) == 0x636D6170L /* 'cmap' */ ) cmapOff = u32(rec + 8)
      t += 1
    }
    if (cmapOff < 0) fail("font has no cmap table")
    val cm = cmapOff.toInt
    val nSub = u16(cm + 2)
    // (platformID, encodingID) → subtable offset, best-Unicode-first:
    // (3,10) full Unicode, then the Unicode platform, then (3,1) BMP
    val subs = (0 until nSub).map { k =>
      val rec = cm + 4 + k * 8
      ((u16(rec), u16(rec + 2)), cm + u32(rec + 4).toInt)
    }
    val pref = Seq((3, 10), (0, 6), (0, 4), (0, 3), (3, 1), (0, 2), (0, 1), (0, 0))
    val sub = pref.iterator.flatMap(w => subs.find(_._1 == w)).map(_._2)
      .nextOption()
      .getOrElse(fail(s"no Unicode cmap subtable among ${
        subs.map(_._1).mkString(", ")}"))
    // invert char→glyph visiting chars ASCENDING so the lowest code
    // point claims a glyph shared by several characters. Work is
    // BUDGETED: a real font maps ≪ 2·64k characters (glyph ids are
    // u16), so a table demanding more is hostile or corrupt — loud,
    // not a million-insert stall repeated per document
    val Budget = 1 << 21
    var visited = 0
    def spend(n: Long): Unit = {
      visited += math.min(n, Int.MaxValue.toLong).toInt
      if (visited > Budget || visited < 0)
        fail(s"cmap maps more than $Budget characters")
    }
    val out = new java.util.TreeMap[Int, Int]() // char → glyph
    u16(sub) match {
      case 4 =>
        val segCount = u16(sub + 6) / 2
        if (segCount == 0) fail("format-4 subtable with zero segments")
        val endBase = sub + 14
        val startBase = endBase + segCount * 2 + 2 // + reservedPad
        val deltaBase = startBase + segCount * 2
        val rangeBase = deltaBase + segCount * 2
        var i = 0
        while (i < segCount) {
          val end = u16(endBase + i * 2)
          val start = u16(startBase + i * 2)
          if (start > end && !(start == 0xFFFF && end == 0xFFFF))
            fail(f"format-4 segment $i start 0x$start%04X > end 0x$end%04X")
          val delta = u16(deltaBase + i * 2)
          val rangeOff = u16(rangeBase + i * 2)
          if (!(start == 0xFFFF && end == 0xFFFF))
            spend(end - start + 1L)
          var c = start
          while (c <= end) {
            if (c != 0xFFFF) { // the required sentinel segment maps nothing
              val gid =
                if (rangeOff == 0) (c + delta) & 0xFFFF
                else {
                  val g = u16(rangeBase + i * 2 + rangeOff + 2 * (c - start))
                  if (g == 0) 0 else (g + delta) & 0xFFFF
                }
              if (gid != 0 && !out.containsKey(c)) out.put(c, gid)
            }
            c += 1
          }
          i += 1
        }
      case 12 =>
        val nGroups = u32(sub + 12)
        if (nGroups > 0x10000L) fail(s"format-12 subtable with $nGroups groups")
        var g = 0
        while (g < nGroups) {
          val rec = sub + 16 + g * 12
          val startChar = u32(rec)
          val endChar = u32(rec + 4)
          val startGid = u32(rec + 8)
          if (endChar < startChar || endChar > 0x10FFFFL)
            fail(f"format-12 group $g range 0x$startChar%X..0x$endChar%X")
          // glyph ids are u16 in a TrueType font: anything past
          // startGid + 0xFFFF can never be referenced, so the walk
          // stops at the last representable gid
          val capEnd = math.min(endChar,
            startChar + math.max(0L, 0xFFFFL - startGid))
          if (startGid <= 0xFFFFL) {
            spend(capEnd - startChar + 1L)
            var c = startChar
            while (c <= capEnd) {
              val gid = (startGid + (c - startChar)).toInt
              if (gid != 0 && !out.containsKey(c.toInt)) out.put(c.toInt, gid)
              c += 1
            }
          }
          g += 1
        }
      case other => fail(s"unsupported cmap subtable format $other")
    }
    val inv = scala.collection.mutable.Map.empty[Int, String]
    out.forEach { (c, gid) =>
      if (!inv.contains(gid)) inv(gid) = new String(Character.toChars(c))
    }
    inv.toMap
  }
}
