package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Relapse guard for the r11 codec-cost fix (VERDICT r11 ask #6): the
  * `mm_pixel_neardup` 10.8 s → 0.85 s recovery rests on every ImageIO
  * stream being MEMORY-cached — the default file-cache mode backs each
  * stream with a SecureRandom-named java.nio temp file, and at 450k
  * codec calls per sweep that cost dominated the codec itself (jstack:
  * NativePRNG.implNextBytes + temp-file create/delete).
  *
  * Two pins so a refactor can't silently reintroduce it:
  *  1. class assertions — [[ImageStreams]] returns the MemoryCache
  *     stream classes (behavior is structural, not a JVM-global flag);
  *  2. a source scan — no main-source codec path constructs streams
  *     any other way (`ImageIO.createImage*Stream` consults the global
  *     `setUseCache` flag; `ImageIO.read(InputStream)`/`write(…,
  *     OutputStream)` route through it too), and nothing toggles the
  *     global flag at all (ADVICE r11: a library must not mutate
  *     process-wide state from a static initializer). */
class ImageStreamsSpec extends AnyFunSuite {

  test("ImageStreams constructs memory-cached stream instances") {
    val in = ImageStreams.input(Array[Byte](1, 2, 3))
    try assert(in.getClass ===
      classOf[javax.imageio.stream.MemoryCacheImageInputStream])
    finally in.close()
    val bos = new java.io.ByteArrayOutputStream()
    val out = ImageStreams.output(bos)
    try assert(out.getClass ===
      classOf[javax.imageio.stream.MemoryCacheImageOutputStream])
    finally out.close()
  }

  test("no main source bypasses ImageStreams or toggles the global flag") {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get("src/main/scala")
    assert(java.nio.file.Files.isDirectory(root),
      s"spec must run from the repo root (cwd=${System.getProperty("user.dir")})")
    val walk = java.nio.file.Files.walk(root)
    val offenders =
      try walk.iterator().asScala
        .filter(_.toString.endsWith(".scala"))
        .flatMap { p =>
          val text = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
          val isHub = p.toString.endsWith("functions/ImageOps.scala")
          val hits = Seq(
            "ImageIO.setUseCache",
            "createImageInputStream",
            "createImageOutputStream",
            // the convenience overloads that consult the global flag
            // (the ImageInputStream/ImageOutputStream overloads used via
            // ImageStreams are fine and don't match these patterns)
            "ImageIO.read(new java.io.ByteArrayInputStream",
            "ImageIO.write(img, \"png\", bos")
            .filter(text.contains)
            // ImageOps.scala is the hub: it may NAME the banned calls in
            // comments/docs but must not call them either — strip
            // comment lines before judging it
            .filterNot { pat =>
              isHub && !text.linesIterator.exists(l =>
                l.contains(pat) && !l.trim.startsWith("//") && !l.trim.startsWith("*"))
            }
          hits.map(h => s"$p: $h")
        }.toList
      finally walk.close()
    assert(offenders.isEmpty,
      s"codec stream construction must go through graft.functions.ImageStreams " +
        s"(memory-cached, no global flag); found: ${offenders.mkString("; ")}")
  }
}
