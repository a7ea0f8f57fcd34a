package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guard against raw control bytes in source files. A literal NUL inside a
  * string constant (vs the unicode-escape form) makes git treat the file as
  * binary — diffs unreviewable, blame/merge broken — and shipped twice
  * before this spec existed (Kernel's posting-map key, then
  * MultiFieldSearcher's sentinel). Bytes below 0x09 have no business in
  * Scala source; tab/LF/CR stay legal. */
class SourceHygieneSpec extends AnyFunSuite {

  test("no source file contains raw bytes < 0x09") {
    val roots = Seq(new java.io.File("src/main"), new java.io.File("src/test"))
    def walk(f: java.io.File): Iterator[java.io.File] =
      if (f.isDirectory) f.listFiles().iterator.flatMap(walk)
      else Iterator.single(f)
    val offenders = roots.iterator.flatMap(walk)
      .filter(_.getName.endsWith(".scala"))
      .flatMap { f =>
        val bytes = java.nio.file.Files.readAllBytes(f.toPath)
        val i = bytes.indexWhere(b => b >= 0 && b < 0x09)
        if (i >= 0) Some(s"${f.getPath} byte offset $i = 0x${"%02x".format(bytes(i))}")
        else None
      }
      .toSeq
    assert(offenders.isEmpty, s"raw control bytes in: ${offenders.mkString("; ")}")
  }
}
