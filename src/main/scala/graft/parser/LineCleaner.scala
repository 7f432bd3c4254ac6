package graft.parser

import java.nio.charset.Charset
import java.nio.file.{Files, Path}

/** A1 + A2: encoding sniff + line cleaning.
  *
  * Re-expresses the reference's `Encode::Guess` open (sqlserver2pgsql.pl:
  * 1516–1532 — SSMS dumps are frequently UTF-16LE with BOM) and
  * `read_and_clean` (pl:1354–1402): strip BOM and `\r`, remove `/* */`
  * block comments statefully across lines, unwrap
  * `EXEC sp_executesql N'…'` wrappers.
  */
object LineCleaner {

  /** Sniff encoding from BOM / NUL-byte density, decode to lines. */
  def readFile(path: Path): Vector[String] = {
    val bytes = Files.readAllBytes(path)
    decode(bytes).split("\n", -1).toVector
  }

  def decode(bytes: Array[Byte]): String = {
    val cs: Charset =
      if (bytes.length >= 2 && bytes(0) == -1.toByte && bytes(1) == -2.toByte)
        Charset.forName("UTF-16LE")
      else if (bytes.length >= 2 && bytes(0) == -2.toByte && bytes(1) == -1.toByte)
        Charset.forName("UTF-16BE")
      else {
        // no BOM: UTF-16 dumps are full of NUL bytes; sniff density
        val sample = bytes.take(4096)
        val nuls = sample.count(_ == 0)
        if (sample.nonEmpty && nuls * 3 > sample.length)
          Charset.forName(if (sample.indexOf(0) % 2 == 1) "UTF-16LE" else "UTF-16BE")
        else if (isValidUtf8(bytes)) Charset.forName("UTF-8")
        // Encode::Guess fallback list includes iso8859-15 (pl:1526):
        // a Latin-1/9 SSMS export with high-bit chars is not valid
        // UTF-8 and must not be decoded as it (silent mojibake)
        else Charset.forName("ISO-8859-15")
      }
    stripBom(new String(bytes, cs))
  }

  /** Strict UTF-8 validity check (decode with REPORT, not REPLACE). */
  private def isValidUtf8(bytes: Array[Byte]): Boolean =
    try {
      Charset.forName("UTF-8").newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
        .decode(java.nio.ByteBuffer.wrap(bytes))
      true
    } catch { case _: java.nio.charset.CharacterCodingException => false }

  private def stripBom(s: String): String =
    if (s.nonEmpty && s.charAt(0) == '﻿') s.substring(1) else s

  private val execSqlRe =
    """(?is)^\s*EXEC(?:UTE)?\s+(?:sys\.)?sp_executesql\s+N'(.*)'\s*;?\s*$""".r

  /** Clean a full dump: returns logical lines with comments stripped.
    * Block comments may span lines (stateful), matching read_and_clean.
    */
  def clean(lines: Seq[String]): Vector[String] = {
    val out = Vector.newBuilder[String]
    var inComment = false
    lines.foreach { raw =>
      var line = stripBom(raw).replace("\r", "")
      // stateful /* */ stripping (pl:1372–1395)
      val sb = new StringBuilder
      var i = 0
      while (i < line.length) {
        if (inComment) {
          val end = line.indexOf("*/", i)
          if (end < 0) i = line.length
          else { inComment = false; i = end + 2 }
        } else {
          val start = line.indexOf("/*", i)
          if (start < 0) { sb.append(line.substring(i)); i = line.length }
          else {
            sb.append(line.substring(i, start))
            inComment = true
            i = start + 2
          }
        }
      }
      line = sb.toString
      line match {
        case execSqlRe(inner) => out += inner.replace("''", "'")
        case _ => out += line
      }
    }
    out.result()
  }
}
