package graft.sources

import java.util.zip.Inflater
import scala.collection.mutable.ArrayBuffer

/**
 * Dependency-free PDF table extractor — fills the extraction seam in
 * `TableIngest` (the reference delegates this geometry to pdfplumber /
 * tabula / camelot, ref: datafeeds/pdf_table_extractor.py:122-292).
 *
 * Two strategies, tried in the reference's order (lattice first, stream
 * fallback — ref: datafeeds/pdf_table_extractor.py:217-228, :254-267):
 *  - lattice: ruling lines from the content stream's path operators
 *    (m/l/re under the CTM, committed by the painting operators) are
 *    clustered into a cell grid; words land in the cell whose line-bounded
 *    bands contain their position. Handles bordered tables whose cell text
 *    is centered or otherwise not x-aligned.
 *  - stream (word clustering): positioned words → rows by baseline →
 *    columns by x-start alignment — for borderless tables.
 *
 * Supported PDF subset (the output of typical report generators, and
 * documented as such):
 *  - uncompressed or FlateDecode content streams (JDK Inflater);
 *  - text via BT/ET blocks with Tm, Td, TD, TL, T-star positioning and the
 *    Tj, TJ, quote show operators; literal `(..)` strings with escapes and
 *    `<hex>` strings;
 *  - page structure via the PAGE TREE: indirect objects are parsed by a
 *    sequential `N G obj … endobj` walk (no byte-offset xref table needed —
 *    robust to files whose xref is stale or stream-compressed), the
 *    catalog's /Pages tree is walked recursively for DOCUMENT order, and a
 *    page's /Contents may be a single stream or a SPLIT ARRAY of streams
 *    (concatenated, per the PDF spec). Files with no parseable page tree
 *    (truncated, fuzzed, or exotic) fall back to the file-order stream
 *    scan. Still out of subset: objects inside /ObjStm object streams
 *    (their payloads are compressed object containers, not content).
 *
 * Glyph widths are not modeled: each Tj (or whole TJ array) is one word at
 * the current text-matrix origin — i.e. cells must be separately positioned,
 * which is how table generators emit them (one Td/Tm per cell).
 */
object PdfTextExtractor {

  final case class Word(page: Int, x: Double, y: Double, text: String)

  // ------------------------------------------------------------- file layer

  /** Latin-1 view of the bytes: 1 char = 1 byte, so regex offsets are safe. */
  private def latin1(b: Array[Byte]): String =
    new String(b, java.nio.charset.StandardCharsets.ISO_8859_1)

  /** All stream payloads in file order, inflated when FlateDecode. One
    * matcher pass over the file — no per-stream substring copies. */
  private[sources] def contentStreams(pdf: Array[Byte]): Seq[String] = {
    val s = latin1(pdf)
    val out = ArrayBuffer.empty[String]
    val m = java.util.regex.Pattern
      .compile("(?s)<<(.*?)>>\\s*stream\\r?\\n").matcher(s)
    var from = 0
    while (from < s.length && m.find(from)) {
      val dict = m.group(1)
      val start = m.end
      val end = s.indexOf("endstream", start)
      if (end < 0) from = s.length
      else {
        // trim the optional EOL before endstream
        var e = end
        if (e > start && s.charAt(e - 1) == '\n') e -= 1
        if (e > start && s.charAt(e - 1) == '\r') e -= 1
        val raw = java.util.Arrays.copyOfRange(pdf, start, e)
        val payload =
          if (dict.contains("/FlateDecode")) inflate(raw).map(latin1)
          else Some(latin1(raw))
        payload.filter(_.contains("BT")).foreach(out += _)
        from = end + "endstream".length
      }
    }
    out.toSeq
  }

  // --------------------------------------------------- object/page-tree layer

  /** All `N G obj … endobj` indirect objects: number → (dictionary text,
    * raw stream bytes). A sequential walk, not an xref lookup: the xref
    * table is just a byte index over exactly these objects, and scanning
    * tolerates files whose xref is stale, truncated, or an (unsupported)
    * compressed xref stream. Stream payloads are skipped whole so a
    * binary payload containing `obj` cannot desynchronize the walk. */
  private[sources] def indirectObjects(
      pdf: Array[Byte]): Map[Int, (String, Option[Array[Byte]])] = {
    val s = latin1(pdf)
    val out = scala.collection.mutable.Map.empty[Int, (String, Option[Array[Byte]])]
    val m = java.util.regex.Pattern.compile("(\\d+)\\s+\\d+\\s+obj\\b").matcher(s)
    var from = 0
    while (from < s.length && m.find(from)) {
      val num = m.group(1).toInt
      var p = m.end()
      while (p < s.length && s.charAt(p).isWhitespace) p += 1
      // balanced << >> dictionary (nested /Resources etc.)
      var dict = ""
      if (s.startsWith("<<", p)) {
        val dictStart = p
        var depth = 0
        var done = false
        while (!done && p < s.length) {
          if (s.startsWith("<<", p)) { depth += 1; p += 2 }
          else if (s.startsWith(">>", p)) { depth -= 1; p += 2; done = depth == 0 }
          else p += 1
        }
        dict = s.substring(dictStart, p)
      }
      var q = p
      while (q < s.length && s.charAt(q).isWhitespace) q += 1
      if (s.startsWith("stream", q)) {
        var st = q + "stream".length
        if (st < s.length && s.charAt(st) == '\r') st += 1
        if (st < s.length && s.charAt(st) == '\n') st += 1
        val end = s.indexOf("endstream", st)
        if (end < 0) from = s.length // truncated mid-stream: stop the walk
        else {
          var e = end
          if (e > st && s.charAt(e - 1) == '\n') e -= 1
          if (e > st && s.charAt(e - 1) == '\r') e -= 1
          out(num) = (dict, Some(java.util.Arrays.copyOfRange(pdf, st, e)))
          from = end + "endstream".length
        }
      } else {
        out(num) = (dict, None)
        from = q
      }
      if (from < s.length) {
        val eo = s.indexOf("endobj", from)
        from = if (eo < 0) from + 1 else eo + "endobj".length
      }
    }
    out.toMap
  }

  private val RefRe = """(\d+)\s+\d+\s+R""".r

  /** Each page's content payload (split /Contents arrays concatenated, per
    * spec), in PAGE-TREE document order — pages physically out of file
    * order come back in reading order. Empty when no catalog/page tree
    * parses (the caller falls back to the file-order scan). */
  private[sources] def pageContentStreams(pdf: Array[Byte]): Seq[String] = {
    val objs = indirectObjects(pdf)
    def dictOf(n: Int): String = objs.get(n).map(_._1).getOrElse("")
    val typeRe = (t: String) => ("(?s)/Type\\s*/" + t + "\\b").r
    def isCatalog(d: String) = typeRe("Catalog").findFirstIn(d).isDefined
    // the LIVE catalog: the LAST trailer's /Root (incremental updates
    // append a new trailer, and the last one wins per spec — an updated
    // file can hold TWO catalog objects, and picking an arbitrary one
    // would silently serve the superseded page tree). Fallback when no
    // trailer parses: the highest-numbered catalog object (updates assign
    // new, higher object numbers).
    val catalog = """(?s)/Root\s+(\d+)\s+\d+\s+R""".r
      .findAllMatchIn(latin1(pdf)).toSeq.lastOption
      .map(_.group(1).toInt)
      .map(dictOf).filter(isCatalog)
      .orElse(objs.toSeq.filter(o => isCatalog(o._2._1))
        .sortBy(_._1).lastOption.map(_._2._1))
    val rootPages = catalog.flatMap(d =>
      """(?s)/Pages\s+(\d+)\s+\d+\s+R""".r.findFirstMatchIn(d)
        .map(_.group(1).toInt))
    rootPages match {
      case None => Seq.empty
      case Some(root) =>
        val visited = scala.collection.mutable.Set.empty[Int]
        def leaves(n: Int): Seq[Int] =
          if (!visited.add(n)) Seq.empty // cycle guard
          else {
            val d = dictOf(n)
            if (typeRe("Page").findFirstIn(d).isDefined) Seq(n)
            else
              """(?s)/Kids\s*\[(.*?)\]""".r.findFirstMatchIn(d).toSeq
                .flatMap(km => RefRe.findAllMatchIn(km.group(1))
                  .map(_.group(1).toInt).toSeq)
                .flatMap(leaves)
          }
        def payload(n: Int): Option[String] = objs.get(n).flatMap {
          case (d, Some(bytes)) =>
            if (d.contains("/FlateDecode")) inflate(bytes).map(latin1)
            else Some(latin1(bytes))
          case _ => None
        }
        leaves(root).map { page =>
          val d = dictOf(page)
          val refs =
            """(?s)/Contents\s*\[(.*?)\]""".r.findFirstMatchIn(d) match {
              case Some(arr) => RefRe.findAllMatchIn(arr.group(1))
                .map(_.group(1).toInt).toSeq
              case None => """(?s)/Contents\s+(\d+)\s+\d+\s+R""".r
                .findFirstMatchIn(d).map(_.group(1).toInt).toSeq
            }
          // a split array is ONE content stream: the spec says the pieces
          // concatenate with (at least) whitespace between them
          refs.flatMap(payload).mkString("\n")
        }
    }
  }

  private def inflate(data: Array[Byte]): Option[Array[Byte]] = {
    try {
      val inf = new Inflater()
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(data.length * 4)
      val buf = new Array[Byte](8192)
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n)
        else if (inf.needsDictionary()) return None
      }
      inf.end()
      Some(out.toByteArray)
    } catch { case _: Exception => None }
  }

  // ---------------------------------------------------- content-stream layer

  private sealed trait Tok
  private final case class TNum(v: Double) extends Tok
  private final case class TStr(s: String) extends Tok
  private final case class TOp(s: String) extends Tok
  private case object TArrStart extends Tok
  private case object TArrEnd extends Tok

  private def tokenize(cs: String): Iterator[Tok] = new Iterator[Tok] {
    private var i = 0
    private var nextTok: Tok = _
    advance()
    override def hasNext: Boolean = nextTok != null
    override def next(): Tok = { val t = nextTok; advance(); t }

    private def skipWs(): Unit = {
      while (i < cs.length && (cs.charAt(i).isWhitespace || cs.charAt(i) == '%')) {
        if (cs.charAt(i) == '%') while (i < cs.length && cs.charAt(i) != '\n') i += 1
        else i += 1
      }
    }
    private def advance(): Unit = {
      skipWs()
      if (i >= cs.length) { nextTok = null; return }
      cs.charAt(i) match {
        case '[' => i += 1; nextTok = TArrStart
        case ']' => i += 1; nextTok = TArrEnd
        case '(' => nextTok = TStr(literalString())
        case '<' if i + 1 < cs.length && cs.charAt(i + 1) == '<' =>
          // inline dict (e.g. BDC property lists) — skip to the matching >>
          var depth = 0
          while (i < cs.length) {
            if (cs.startsWith("<<", i)) { depth += 1; i += 2 }
            else if (cs.startsWith(">>", i)) { depth -= 1; i += 2; if (depth == 0) { advance(); return } }
            else i += 1
          }
          nextTok = null
        case '<' => nextTok = TStr(hexString())
        case '/' =>
          val j = endOfRegular(i + 1); val name = cs.substring(i, j); i = j
          nextTok = TOp(name) // names only matter as operands we ignore
        case c if c == '+' || c == '-' || c == '.' || c.isDigit =>
          val j = endOfRegular(i + 1)
          val raw = cs.substring(i, j); i = j
          nextTok =
            try TNum(raw.toDouble)
            catch { case _: NumberFormatException => TOp(raw) }
        case _ =>
          val j = endOfRegular(i + 1)
          nextTok = TOp(cs.substring(i, j)); i = j
      }
    }
    private def endOfRegular(from: Int): Int = {
      var j = from
      while (j < cs.length && !cs.charAt(j).isWhitespace &&
        !"()<>[]{}/%".contains(cs.charAt(j))) j += 1
      j
    }
    private def literalString(): String = {
      val sb = new StringBuilder
      var depth = 0
      var done = false
      while (!done && i < cs.length) {
        val c = cs.charAt(i)
        c match {
          case '(' => depth += 1; if (depth > 1) sb.append(c); i += 1
          case ')' =>
            depth -= 1
            if (depth == 0) done = true else sb.append(c)
            i += 1
          case '\\' if i + 1 < cs.length =>
            val e = cs.charAt(i + 1)
            e match {
              case 'n' => sb.append('\n'); i += 2
              case 'r' => sb.append('\r'); i += 2
              case 't' => sb.append('\t'); i += 2
              case 'b' => sb.append('\b'); i += 2
              case 'f' => sb.append('\f'); i += 2
              case '(' | ')' | '\\' => sb.append(e); i += 2
              case '\n' => i += 2 // line continuation
              case '\r' => i += (if (i + 2 < cs.length && cs.charAt(i + 2) == '\n') 3 else 2)
              case d if d >= '0' && d <= '7' =>
                val oct = cs.substring(i + 1, math.min(i + 4, cs.length))
                  .takeWhile(c => c >= '0' && c <= '7').take(3)
                sb.append(Integer.parseInt(oct, 8).toChar); i += 1 + oct.length
              case other => sb.append(other); i += 2
            }
          case c => sb.append(c); i += 1
        }
      }
      sb.toString
    }
    private def hexString(): String = {
      i += 1 // consume <
      val j = cs.indexOf('>', i)
      // non-hex bytes inside <> are malformed — drop them instead of throwing
      val hex = cs.substring(i, if (j < 0) cs.length else j)
        .filter(c => Character.digit(c, 16) >= 0)
      i = (if (j < 0) cs.length else j + 1)
      val padded = if (hex.length % 2 == 1) hex + "0" else hex
      padded.grouped(2).map(h => Integer.parseInt(h, 16).toChar).mkString
    }
  }

  /** 2×3 text matrix (a b c d e f); position of shown text = (e, f). */
  private final case class Mat(a: Double, b: Double, c: Double, d: Double, e: Double, f: Double)
  private val Identity = Mat(1, 0, 0, 1, 0, 0)
  private def translate(tx: Double, ty: Double, m: Mat): Mat =
    Mat(m.a, m.b, m.c, m.d, tx * m.a + ty * m.c + m.e, tx * m.b + ty * m.d + m.f)

  /** Positioned words of one content stream (page index supplied). */
  private[sources] def words(page: Int, cs: String): Seq[Word] = {
    val out = ArrayBuffer.empty[Word]
    var tm = Identity // text matrix
    var tlm = Identity // text line matrix
    var leading = 0.0
    val operands = ArrayBuffer.empty[Tok]
    var inArray = false
    val arrayStrings = new StringBuilder

    def num(k: Int): Double = operands.lift(operands.length - k) match {
      case Some(TNum(v)) => v
      case _ => 0.0
    }
    def show(s: String): Unit =
      if (s.trim.nonEmpty) out += Word(page, tm.e, tm.f, s.trim)
    def nextLine(tx: Double, ty: Double): Unit = {
      tlm = translate(tx, ty, tlm); tm = tlm
    }

    tokenize(cs).foreach {
      case TArrStart => inArray = true; arrayStrings.clear()
      case TArrEnd => inArray = false
      case TStr(s) if inArray => arrayStrings.append(s)
      case t @ (TNum(_) | TStr(_)) if !inArray => operands += t
      case TNum(_) => // kerning adjustment inside TJ array — no width model
      case TOp(op) =>
        op match {
          case "BT" => tm = Identity; tlm = Identity
          case "ET" =>
          case "Tm" =>
            tlm = Mat(num(6), num(5), num(4), num(3), num(2), num(1)); tm = tlm
          case "Td" => nextLine(num(2), num(1))
          case "TD" => leading = -num(1); nextLine(num(2), num(1))
          case "TL" => leading = num(1)
          case "T*" => nextLine(0, -leading)
          case "Tj" => operands.lastOption.foreach { case TStr(s) => show(s); case _ => () }
          case "'" =>
            nextLine(0, -leading)
            operands.lastOption.foreach { case TStr(s) => show(s); case _ => () }
          case "\"" =>
            nextLine(0, -leading)
            operands.lastOption.foreach { case TStr(s) => show(s); case _ => () }
          case "TJ" => show(arrayStrings.toString); arrayStrings.clear()
          case _ => // Tf, Tc, Tw, colors, paths ... — irrelevant to positions
        }
        operands.clear()
      case _ => // stray array tokens outside text context
    }
    out.toSeq
  }

  // ----------------------------------------------------------- lattice layer

  /** A straight path segment in page coordinates (post-CTM). */
  final case class Segment(x1: Double, y1: Double, x2: Double, y2: Double) {
    def isHorizontal(minLen: Double): Boolean =
      math.abs(y1 - y2) <= 0.5 && math.abs(x1 - x2) >= minLen
    def isVertical(minLen: Double): Boolean =
      math.abs(x1 - x2) <= 0.5 && math.abs(y1 - y2) >= minLen
  }

  private def multiply(m1: Mat, m2: Mat): Mat = Mat(
    m1.a * m2.a + m1.b * m2.c,
    m1.a * m2.b + m1.b * m2.d,
    m1.c * m2.a + m1.d * m2.c,
    m1.c * m2.b + m1.d * m2.d,
    m1.e * m2.a + m1.f * m2.c + m2.e,
    m1.e * m2.b + m1.f * m2.d + m2.f)

  /**
   * Painted straight segments of one content stream: `m`/`l` subpaths and
   * `re` rectangle edges, transformed by the CTM (`cm` under `q`/`Q`
   * save/restore), buffered per path and committed only by a painting
   * operator (S s f F f* B B* b b*) — a path consumed by `n` (e.g. a
   * clipping path) draws nothing and contributes no rulings.
   */
  def rulingSegments(cs: String): Seq[Segment] = {
    val out = ArrayBuffer.empty[Segment]
    val path = ArrayBuffer.empty[Segment]
    var ctm = Identity
    val saved = scala.collection.mutable.Stack.empty[Mat]
    var cx, cy = 0.0 // current point (user space)
    var sx, sy = 0.0 // subpath start, for close ops
    val operands = ArrayBuffer.empty[Double]

    def seg(x1: Double, y1: Double, x2: Double, y2: Double): Unit =
      path += Segment(
        x1 * ctm.a + y1 * ctm.c + ctm.e, x1 * ctm.b + y1 * ctm.d + ctm.f,
        x2 * ctm.a + y2 * ctm.c + ctm.e, x2 * ctm.b + y2 * ctm.d + ctm.f)

    tokenize(cs).foreach {
      case TNum(v) => operands += v
      case TOp(op) =>
        def n(k: Int): Double = operands.lift(operands.length - k).getOrElse(0.0)
        op match {
          case "q" => saved.push(ctm)
          case "Q" => if (saved.nonEmpty) ctm = saved.pop()
          case "cm" => ctm = multiply(Mat(n(6), n(5), n(4), n(3), n(2), n(1)), ctm)
          case "m" => cx = n(2); cy = n(1); sx = cx; sy = cy
          case "l" =>
            val (nx, ny) = (n(2), n(1)); seg(cx, cy, nx, ny); cx = nx; cy = ny
          case "re" =>
            val (x, y, w, h) = (n(4), n(3), n(2), n(1))
            seg(x, y, x + w, y); seg(x + w, y, x + w, y + h)
            seg(x + w, y + h, x, y + h); seg(x, y + h, x, y)
            cx = x; cy = y; sx = x; sy = y
          case "c" => cx = n(2); cy = n(1) // curves are not rulings; track point
          case "v" | "y" => cx = n(2); cy = n(1)
          case "h" => seg(cx, cy, sx, sy); cx = sx; cy = sy
          case "s" | "b" | "b*" => // close-then-paint
            seg(cx, cy, sx, sy); out ++= path; path.clear()
          case "S" | "f" | "F" | "f*" | "B" | "B*" =>
            out ++= path; path.clear()
          case "n" => path.clear() // no-op paint (ends a clip path)
          case _ => // text/color/state operators — not path-relevant
        }
        operands.clear()
      case _ => // strings/arrays — irrelevant to geometry
    }
    out.toSeq
  }

  /** Cluster 1-D positions within `tol` into their group means. */
  private def clusterPositions(vals: Seq[Double], tol: Double): IndexedSeq[Double] = {
    val groups = ArrayBuffer.empty[ArrayBuffer[Double]]
    vals.sorted.foreach { v =>
      if (groups.nonEmpty && v - groups.last.last <= tol) groups.last += v
      else groups += ArrayBuffer(v)
    }
    groups.map(g => g.sum / g.size).toIndexedSeq
  }

  /** Band index of `v` in ascending `bounds`: i iff bounds(i) ≤ v ≤ bounds(i+1);
    * -1 outside the grid. */
  private def bandOf(bounds: IndexedSeq[Double], v: Double): Int =
    if (v < bounds.head || v > bounds.last) -1
    else math.min(bounds.lastIndexWhere(_ <= v), bounds.length - 2)

  /** Disjoint ruling groups: segments whose (tol-expanded) bounding boxes
    * touch belong to one candidate table — two bordered tables on a page
    * stay two grids instead of merging into one. Union-find over the (small,
    * tens-per-page) segment set. */
  private def segmentComponents(segs: IndexedSeq[Segment], tol: Double): Seq[IndexedSeq[Segment]] = {
    val n = segs.length
    val parent = Array.tabulate(n)(identity)
    def find(i: Int): Int = {
      var r = i
      while (parent(r) != r) r = parent(r)
      var c = i
      while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    def touch(s1: Segment, s2: Segment): Boolean = {
      math.min(s1.x1, s1.x2) - tol <= math.max(s2.x1, s2.x2) &&
      math.min(s2.x1, s2.x2) - tol <= math.max(s1.x1, s1.x2) &&
      math.min(s1.y1, s1.y2) - tol <= math.max(s2.y1, s2.y2) &&
      math.min(s2.y1, s2.y2) - tol <= math.max(s1.y1, s1.y2)
    }
    for (i <- 0 until n; j <- i + 1 until n)
      if (find(i) != find(j) && touch(segs(i), segs(j))) parent(find(i)) = find(j)
    segs.indices.groupBy(find).values.map(_.map(segs)).toSeq
  }

  /** One grid from one ruling group (shared band-placement logic). */
  private def gridFromRulings(
      pageWords: Seq[Word], rulings: Seq[Segment],
      lineTol: Double, minLineLen: Double): Option[TableIngest.ExtractedTable] = {
    val ys = clusterPositions(
      rulings.filter(_.isHorizontal(minLineLen)).map(s => (s.y1 + s.y2) / 2), lineTol)
    val xs = clusterPositions(
      rulings.filter(_.isVertical(minLineLen)).map(s => (s.x1 + s.x2) / 2), lineTol)
    // a real table grid: ≥ 3 h-rulings (header band + a data band) and
    // ≥ 3 v-rulings (two columns)
    if (ys.length < 3 || xs.length < 3) return None
    val nRows = ys.length - 1
    val nCols = xs.length - 1
    val grid = Array.fill(nRows, nCols)(ArrayBuffer.empty[Word])
    var placed = 0
    pageWords.foreach { w =>
      val rAsc = bandOf(ys, w.y) // ascending-y band
      val c = bandOf(xs, w.x)
      if (rAsc >= 0 && c >= 0) {
        grid(nRows - 1 - rAsc)(c) += w // top row of the PAGE first
        placed += 1
      }
    }
    if (placed == 0) return None
    val rows = grid.map(_.map(cell =>
      cell.sortBy(w => (-w.y, w.x)).map(_.text).mkString(" ")).toSeq).toSeq
    Some(TableIngest.ExtractedTable(pageWords.head.page, rows.head, rows.tail))
  }

  /**
   * EVERY ruling-bounded table on the page (camelot's "lattice" flavor,
   * ref: datafeeds/pdf_table_extractor.py:254-258, which likewise returns a
   * LIST of tables per page — :294-345 then filters detail-vs-summary
   * across them, mirrored by `TableIngest.isDetailTable`): painted segments
   * are grouped into connected components, each component's horizontal
   * ruling ys × vertical ruling xs define cell bands, and each word falls
   * into the band pair containing its position — so cell text needs NO
   * x-alignment across rows, exactly where the word-clustering strategy
   * mis-clusters. Components that don't form a ≥2×2-cell grid with at
   * least one resident word are dropped. Tables come back in reading
   * order: top-to-bottom, then left-to-right.
   */
  def latticeTables(
      pageWords: Seq[Word],
      segments: Seq[Segment],
      lineTol: Double = 2.0,
      minLineLen: Double = 5.0): Seq[TableIngest.ExtractedTable] = {
    if (pageWords.isEmpty) return Seq.empty
    val rulings = segments
      .filter(s => s.isHorizontal(minLineLen) || s.isVertical(minLineLen))
      .toIndexedSeq
    segmentComponents(rulings, lineTol)
      .flatMap { comp =>
        gridFromRulings(pageWords, comp, lineTol, minLineLen)
          .map(t => (t, -comp.map(s => math.max(s.y1, s.y2)).max,
            comp.map(s => math.min(s.x1, s.x2)).min))
      }
      .sortBy { case (_, negTopY, leftX) => (negTopY, leftX) }
      .map(_._1)
  }

  /** The page's first (top-left) lattice table, if any — the single-table
    * convenience over `latticeTables`. */
  def latticeTable(
      pageWords: Seq[Word],
      segments: Seq[Segment],
      lineTol: Double = 2.0,
      minLineLen: Double = 5.0): Option[TableIngest.ExtractedTable] =
    latticeTables(pageWords, segments, lineTol, minLineLen).headOption

  // --------------------------------------------------------- clustering layer

  /**
   * Cluster one page's words into a table: rows by baseline y (descending —
   * PDF y grows upward) within `rowTol`, columns by x-start alignment within
   * `colTol` (cells are left-aligned by the generators this targets; words
   * sharing a row+column cell are joined in x order). First row = header;
   * `TableIngest.stitchContinuations` repairs continuation pages where that
   * first row is really data.
   */
  def clusterTable(
      pageWords: Seq[Word],
      rowTol: Double = 2.0,
      colTol: Double = 3.0): Option[TableIngest.ExtractedTable] = {
    if (pageWords.isEmpty) return None
    val page = pageWords.head.page

    // row clusters, top of page first
    val byY = pageWords.sortBy(w => (-w.y, w.x))
    val rows = ArrayBuffer.empty[ArrayBuffer[Word]]
    byY.foreach { w =>
      if (rows.nonEmpty && math.abs(rows.last.head.y - w.y) <= rowTol) rows.last += w
      else rows += ArrayBuffer(w)
    }

    // column centers from the x-starts of all words (gap-based clustering)
    val xs = pageWords.map(_.x).sorted
    val centers = ArrayBuffer.empty[ArrayBuffer[Double]]
    xs.foreach { x =>
      if (centers.nonEmpty && x - centers.last.last <= colTol) centers.last += x
      else centers += ArrayBuffer(x)
    }
    val colStarts = centers.map(c => c.sum / c.size).toIndexedSeq
    def colOf(x: Double): Int =
      colStarts.zipWithIndex.minBy { case (c, _) => math.abs(c - x) }._2

    val grid = rows.map { rw =>
      val cells = Array.fill(colStarts.length)("")
      rw.sortBy(_.x).foreach { w =>
        val c = colOf(w.x)
        cells(c) = if (cells(c).isEmpty) w.text else cells(c) + " " + w.text
      }
      cells.toSeq
    }
    Some(TableIngest.ExtractedTable(page, grid.head, grid.tail.toSeq))
  }

  /** Whole file → tables per page (a page may yield several ruling-bounded
    * tables), lattice mode first with word-clustering fallback — the
    * reference's library order (lattice, then stream;
    * ref: datafeeds/pdf_table_extractor.py:217-228). Pages come from the
    * PAGE TREE when one parses (document order, split /Contents arrays
    * concatenated), else from the file-order stream scan.
    * Never throws: a stream the tokenizer cannot make sense of yields no
    * table rather than failing the whole document. */
  def extractTables(pdf: Array[Byte]): Seq[TableIngest.ExtractedTable] = {
    val viaTree =
      try pageContentStreams(pdf) catch { case _: Exception => Seq.empty }
    val streams =
      if (viaTree.exists(_.contains("BT"))) viaTree else contentStreams(pdf)
    streams.zipWithIndex.flatMap { case (cs, idx) =>
      try {
        val ws = words(idx + 1, cs)
        val lattice = latticeTables(ws, rulingSegments(cs))
        if (lattice.nonEmpty) lattice else clusterTable(ws).toSeq
      } catch { case _: Exception => Seq.empty }
    }
  }
}
