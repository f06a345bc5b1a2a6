package graft.ingest

/**
 * FROZEN html -> text extractor, spec v1 (input_hint invariant: the
 * extracted text must be byte-identical per url across engines, runs,
 * and partitionings — goldens pinned in ExtractorSpec).
 *
 * Spec (pure function of the raw bytes, no locale/charset dependence):
 *  1. decode as UTF-8 (malformed sequences -> U+FFFD, Java standard);
 *  2. drop <script ...>...</script> and <style ...>...</style> blocks
 *     (case-insensitive tag names, non-nested);
 *  3. every other tag is replaced by '\n' if it is a block tag
 *     (html, head, body, div, p, br, h1..h6, li, ul, ol, tr, table,
 *     title), else by '' (inline);
 *  4. decode entities: &amp; &lt; &gt; &quot; &#NN; (decimal only);
 *  5. whitespace-normalize each line (collapse runs to one space, trim),
 *     drop empty lines, join with a single '\n'.
 */
object Extractor {

  private val BlockTags = Set("html", "head", "body", "div", "p", "br",
    "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol", "tr", "table", "title")

  def extract(html: Array[Byte]): String =
    extractStr(new String(html, java.nio.charset.StandardCharsets.UTF_8))

  def extractStr(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        val close = s.indexOf('>', i + 1)
        if (close < 0) { i = n } // truncated tag: drop the rest
        else {
          val inner = s.substring(i + 1, close)
          val name = inner.dropWhile(_ == '/').takeWhile(ch => ch.isLetterOrDigit)
            .toLowerCase
          if ((name == "script" || name == "style") && !inner.startsWith("/")) {
            val end = s.toLowerCase.indexOf(s"</$name", close)
            i = if (end < 0) n else {
              val endClose = s.indexOf('>', end)
              if (endClose < 0) n else endClose + 1
            }
            sb.append('\n')
          } else {
            if (BlockTags.contains(name)) sb.append('\n')
            i = close + 1
          }
        }
      } else {
        sb.append(c)
        i += 1
      }
    }
    val unescaped = decodeEntities(sb.toString)
    unescaped.split('\n').iterator
      .map(line => line.split(Array(' ', '\t', '\r', '\u000B', '\f'))
        .filter(_.nonEmpty).mkString(" "))
      .filter(_.nonEmpty)
      .mkString("\n")
  }

  def decodeEntities(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 8) {
          s.substring(i + 1, semi) match {
            case "amp" => sb.append('&'); i = semi + 1
            case "lt" => sb.append('<'); i = semi + 1
            case "gt" => sb.append('>'); i = semi + 1
            case "quot" => sb.append('"'); i = semi + 1
            case e if e.startsWith("#") && e.drop(1).forall(_.isDigit) && e.length > 1 =>
              sb.append(e.drop(1).toInt.toChar); i = semi + 1
            case _ => sb.append(c); i += 1
          }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
