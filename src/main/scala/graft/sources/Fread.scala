package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, BooleanType, ByteType, DataType, DateType, DecimalType, DoubleType, FloatType, IntegerType, LongType, ShortType, StringType, StructType, TimestampType}

/** fread / fwrite parity surface (SURVEY.md §2.1).
  *
  * The reference's fread (src/fread.c) is a single-node parallel CSV
  * parser with auto-detection; here detection maps to Spark's
  * sampling-based schema inference plus a tiny driver-side sep sniff of
  * the first KB (the distributed parse itself is spark.read.csv —
  * chunk-parallel across the cluster, the 1000-executor analog of
  * fread's per-thread chunks). Type "bumping" (fread.c:126) maps to
  * PERMISSIVE mode + corrupt-record capture, plus a post-parse numeric
  * re-bump pass for the multi-na.strings / dec="," paths.
  */
object Fread {

  final case class FreadOptions(
      sep: String = "auto",             // "auto" → sniff , \t ; |
      header: String = "auto",          // auto|true|false (auto → infer)
      naStrings: Seq[String] = Seq("", "NA"),
      colClasses: Option[StructType] = None,   // explicit schema override
      select: Seq[String] = Nil,        // column projection (pushed down)
      drop: Seq[String] = Nil,
      nrows: Option[Long] = None,
      skip: Int = 0,                    // leading lines to skip
      // fread(skip="string") (R/fread.R skip= character form): start at
      // the FIRST physical line containing this substring (that line
      // becomes the header/first data line). Like the reference — where
      // skip= is ONE argument, int or string — this OVERRIDES `skip`;
      // with yaml=TRUE the search starts after the front-matter block
      skipTo: Option[String] = None,
      fill: Boolean = false,            // ragged rows → nulls
      // fread(fill=N) integer form (man/fread.Rd): DECLARE the column
      // count upper bound instead of estimating it from a bounded head
      // scan — the 100 TB shape (the widest row of a huge file may sit
      // past any scan budget; the reference's fill=Inf whole-file scan
      // is the thing this avoids). Rows wider than N drop the extras
      // (upper-bound contract); narrower rows pad with nulls.
      fillTo: Int = 0,
      quote: String = "\"",
      escape: String = "\"",           // RFC4180 doubled-quote escaping
                                        // (Spark's default is backslash)
      dec: String = "auto",             // "auto" → sniff ',' vs '.' (R/fread.R:38)
      encoding: String = "UTF-8",
      tz: String = "UTC",
      multiLine: Boolean = false,       // quoted fields w/ embedded newlines
      // univocity's recovery mode for quotes inside quoted fields —
      // STOP_AT_CLOSING_QUOTE mirrors fread's quote-rule fallback
      // (src/fread.c quoteRule 1-3) closest for `a,"he said:"hi."",b`
      unescapedQuoteHandling: String = "STOP_AT_CLOSING_QUOTE",
      compression: String = "auto",     // gz/bz2 handled by codec auto-detect
      yaml: Boolean = false,            // csvy front matter (R/fread.R yaml=)
      // schema-inference sample fraction. 1.0 (default) scans all rows —
      // inference cannot be wrong, zero extra cost. < 1.0 enables the
      // out-of-sample type-bump re-read (src/fread.c:126-128): rows that
      // fail the sampled schema trigger ONE full re-read with
      // full-data-determined types.
      samplingRatio: Double = 1.0,
      // fread(strip.white) (R/fread.R:41, default TRUE): leading and
      // trailing whitespace of UNQUOTED fields is stripped before
      // parsing (tests.Rraw 1331-1333); quoted content is preserved.
      // Composes with na.strings="": an all-space unquoted string field
      // strips to "" and reads as null, exactly the reference's
      // documented recipe (R/fread.R:259-267).
      stripWhite: Boolean = true,
      // fread(col.names=) (R/fread.R:41): override the detected/obtained
      // column names positionally, after select/drop like the reference
      colNames: Seq[String] = Nil,
      // fread(check.names=) (R/fread.R:374: make.names(unique=TRUE)):
      // names become syntactically valid and unique — invalid chars to
      // '.', X-prefixed when starting with a digit, reserved words get
      // a trailing '.', duplicates take .1/.2 suffixes (tests.Rraw 134.5)
      checkNames: Boolean = false,
      // fread(logicalYN) (NEWS #4563): string columns whose every
      // non-null value is "Y"/"N" become boolean. Off by default like
      // the reference (datatable.logicalYN=FALSE) — sharded tables can
      // inadvertently read a true string column as logical.
      logicalYN: Boolean = false,
      // fread(verbose=) (R/fread.R): diagnostic chatter (the dec-sniff
      // balance line, fill=N truncation notices). Off by default like
      // the reference so production reads stay quiet.
      verbose: Boolean = false)

  /** First non-empty line after `skip` (driver-side, one small read —
    * shared by separator sniffing and header detection so the file head
    * is fetched once). Reads in 64 KB chunks until the wanted line is
    * COMPLETE (newline-terminated or EOF) — a >64 KB first line (wide
    * header, long quoted field) no longer truncates the sniff. Capped at
    * 64 MB so a binary/garbage file can't buffer unboundedly on the
    * driver.
    */
  def firstLine(spark: SparkSession, path: String, skip: Int = 0): String = {
    headLines(spark, path, skip, 1).headOption.getOrElse("")
  }

  /** Shared chunked head reader: accumulates 64 KB chunks and returns
    * the physical line segments (the final partial segment counts only
    * at EOF). Decoding is INCREMENTAL: each segment's bytes are decoded
    * exactly once as its closing newline arrives ('\n' is never part of
    * a UTF-8 multi-byte sequence, so splitting raw bytes is safe), and
    * `done` re-runs only on chunks that completed at least one new line
    * — the earlier shape re-decoded the whole accumulated buffer per
    * chunk, quadratic in bytes read. Capped at 64 MB so a garbage file
    * can't buffer unboundedly — on cap-hit the truncated prefix
    * (including the partial tail) is still returned for sep sniffing.
    */
  private def headSegments(spark: SparkSession, path: String,
                           minPhysical: Int,
                           done: Seq[String] => Boolean,
                           charset: String = "UTF-8"): Seq[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val target =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
          .head.getPath
      else p
    // compressed files (.gz/.bz2/...) must be decoded before the sep /
    // header sniff — raw codec bytes would sniff garbage (the
    // distributed parse already decompresses via the same codec)
    val rawIn = fs.open(target)
    val codec = new org.apache.hadoop.io.compress.CompressionCodecFactory(conf)
      .getCodec(target)
    val in: java.io.InputStream =
      if (codec != null) codec.createInputStream(rawIn) else rawIn
    val segs = scala.collection.mutable.ArrayBuffer.empty[String]
    val pending = new java.io.ByteArrayOutputStream()  // partial-line bytes
    val buf = new Array[Byte](65536)
    val cap = 64 * 1024 * 1024
    def flushPending(): String = {
      // the \n byte never sits inside a multi-byte sequence of UTF-8 or
      // the JVM's CJK charsets (trail-byte ranges exclude 0x0A), so
      // splitting the raw bytes before decoding stays safe per-charset
      val s = new String(pending.toByteArray, charset).stripSuffix("\r")
      pending.reset()
      s
    }
    try {
      var eof = false
      var total = 0L
      var result: Option[Seq[String]] = None
      while (!eof && result.isEmpty && total < cap) {
        val n = in.read(buf)
        if (n < 0) eof = true
        else {
          total += n
          var start = 0
          var i = 0
          var newLines = false
          while (i < n) {
            if (buf(i) == '\n') {
              pending.write(buf, start, i - start)
              segs += flushPending()
              start = i + 1
              newLines = true
            }
            i += 1
          }
          pending.write(buf, start, n - start)
          if (newLines && segs.length >= minPhysical && done(segs.toSeq))
            result = Some(segs.toSeq)
        }
      }
      // EOF (and cap-hit) keep the final partial segment — "a\nb" must
      // surface "b", and "a\n" its trailing empty segment, matching a
      // split("\n", -1) of the whole file
      result.getOrElse((segs += flushPending()).toSeq)
    } finally in.close()
  }

  /** First `want` non-empty lines after `skip` (driver-side chunked
    * read; see [[firstLine]]). Returns fewer if the file ends first.
    */
  def headLines(spark: SparkSession, path: String, skip: Int, want: Int): Seq[String] =
    headSegments(spark, path, skip + want,
      s => s.drop(skip).count(_.nonEmpty) >= want)
      .drop(skip).filter(_.nonEmpty).take(want)

  /** First `want` PHYSICAL lines (empties kept — needed when the caller
    * must count lines to skip, e.g. the csvy front-matter block).
    */
  def headLinesRaw(spark: SparkSession, path: String, want: Int,
                   charset: String = "UTF-8"): Seq[String] =
    headSegments(spark, path, want, s => s.length >= want, charset).take(want)

  /** Parsed csvy front matter (R/fread.R yaml=TRUE; spec: csvy.org —
    * a `---`-delimited YAML block before the CSV data carrying schema
    * field names/types and dialect options).
    *
    * @param skipLines physical lines the block occupies (incl. both
    *                  `---` fences) — add to `skip` before parsing data
    */
  final case class CsvyHeader(
      schema: Option[StructType],
      sep: Option[String],
      header: Option[Boolean],
      skipLines: Int,
      dec: Option[String] = None,
      quote: Option[String] = None,
      naStrings: Option[Seq[String]] = None)

  /** Minimal driver-side parser for the csvy YAML subset the reference
    * emits/consumes: `schema: fields: [- name/type]` and
    * `dialect: delimiter/header`. No YAML lib in the container — the
    * subset is line-regular enough for a hand parser, and unknown keys
    * are ignored (like the reference, which passes the block to
    * yaml::yaml.load and reads only these keys).
    */
  def csvyHeader(spark: SparkSession, path: String): CsvyHeader = {
    val head0 = headLinesRaw(spark, path, 1000)
    // commented variant: every front-matter line is '#'-prefixed
    // (inst/tests/csvy/test_comment.csvy) — strip the marker first
    val commented = head0.headOption.exists(_.trim == "#---")
    val head = if (commented) head0.map(l => l.stripPrefix("#")) else head0
    if (head.isEmpty || head.head.trim != "---") return CsvyHeader(None, None, None, 0)
    val end = head.indexWhere(l => l.trim == "---" || l.trim == "...", 1)
    if (end < 0)
      throw new IllegalArgumentException(
        s"fread(yaml=TRUE): unterminated csvy front matter in $path " +
        "(no closing '---' in the first 1000 lines)")
    val block = head.slice(1, end)
    def unq(s: String): String = {
      val t = s.trim
      if (t.length >= 2 && ((t.head == '"' && t.last == '"') || (t.head == '\'' && t.last == '\'')))
        t.substring(1, t.length - 1)
      else t
    }
    // field list: "- name: x" lines, each optionally followed by an
    // indented "type: y" before the next "-"
    val names = scala.collection.mutable.ArrayBuffer.empty[String]
    val types = scala.collection.mutable.ArrayBuffer.empty[String]
    var sep: Option[String] = None
    var hdr: Option[Boolean] = None
    var dec: Option[String] = None
    var quo: Option[String] = None
    var na: Option[Seq[String]] = None
    // Field parsing is SCOPED to schema:→fields: — without the scope, a
    // '- name:' item in any other front-matter section (csvy files
    // carry e.g. 'sources:' metadata lists) fabricated a phantom
    // column, and a 'type:' key in a later section re-typed the last
    // real field. Scope closes on the next TOP-LEVEL (indent-0) key;
    // indented keys like a field's 'constraints:' must NOT close it.
    // ('#'-commented front matter keeps relative indentation after the
    // marker strip, so indent-0 detection holds for both variants.)
    var inSchema = false
    var inFields = false
    block.foreach { l =>
      val t = l.trim
      val indent0 = l.nonEmpty && !l.head.isWhitespace
      if (t == "schema:") { inSchema = true; inFields = false }
      else if (t == "fields:") inFields = inSchema
      else if (indent0) { inSchema = false; inFields = false }
      if (t.startsWith("- name:") && inFields) {
        names += unq(t.stripPrefix("- name:"))
        types += "string"                      // csvy default type
      } else if (t.startsWith("type:") && inFields && names.nonEmpty) {
        types(types.length - 1) = unq(t.stripPrefix("type:")).toLowerCase
      } else if (t.startsWith("delimiter:") || t.startsWith("sep:")) {
        sep = Some(unq(t.dropWhile(_ != ':').drop(1)))
      } else if (t.startsWith("header:")) {
        hdr = Some(unq(t.stripPrefix("header:")).toLowerCase == "true")
      } else if (t.startsWith("dec:")) {
        dec = Some(unq(t.stripPrefix("dec:")))
      } else if (t.startsWith("quote:")) {
        quo = Some(unq(t.stripPrefix("quote:")))
      } else if (t.startsWith("na.strings:")) {
        // scalar or YAML inline-list form; the list split is naive on
        // commas (fine for the marker-token subset csvy carries)
        val v = t.stripPrefix("na.strings:").trim
        na = Some(
          if (v.startsWith("[") && v.endsWith("]"))
            v.substring(1, v.length - 1).split(",").toSeq.map(unq)
          else Seq(unq(v)))
      }
    }
    import org.apache.spark.sql.types._
    def toDt(t: String): DataType = t match {
      case "integer" | "int" | "long"       => LongType
      case "number" | "numeric" | "double"  => DoubleType
      case "boolean" | "logical"            => BooleanType
      case "date"                           => DateType
      case "datetime" | "timestamp"         => TimestampType
      case _                                => StringType
    }
    val schema =
      if (names.isEmpty) None
      else Some(StructType(names.zip(types).map { case (n, t) =>
        StructField(n, toDt(t), nullable = true) }.toArray))
    CsvyHeader(schema, sep, hdr, end + 1, dec, quo, na)
  }

  /** Charsets Spark 4's CSV source accepts natively; anything else the
    * JVM knows goes through the transcode tier.
    */
  private val sparkCsvCharsets = Set("us-ascii", "iso-8859-1", "utf-8",
    "utf-16", "utf-16be", "utf-16le", "utf-32")

  /** First bytes → Some(charset) when they carry a byte-order mark the
    * reference's sniffer knows: FF FE (UTF-16LE), FE FF (UTF-16BE), or
    * 84 31 95 33 (U+FEFF encoded in GB18030). The reference ERRORS on
    * UTF-16 ("File is encoded in UTF-16", tests.Rraw 1627.4/.5) and
    * warns-then-decodes GB-18030 (1627.31); this engine routes both to
    * the matching decode tier. UTF-8's EF BB BF is NOT reported — the
    * default path already strips it post-parse. Reads the first file of
    * a directory input, decompressed through the same codec factory as
    * the parse.
    */
  private[graft] def sniffBom(spark: SparkSession, path: String): Option[String] =
  // Best-effort by design: any I/O failure here (unresolvable path, a
  // glob, permission, truncated codec stream) returns None and lets the
  // actual read surface the real error with its own diagnostics — a
  // sniffer must never be the thing that throws first.
  scala.util.Try {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val targetOpt =
      if (fs.getFileStatus(p).isDirectory)
        // listStatus order is filesystem-dependent: sort by name so a
        // multi-file directory sniffs the SAME file on every run/node
        fs.listStatus(p).filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
          .sortBy(_.getPath.getName)
          .headOption.map(_.getPath)
      else Some(p)
    targetOpt.flatMap { target =>
      val rawIn = fs.open(target)
      val codec = new org.apache.hadoop.io.compress.CompressionCodecFactory(conf)
        .getCodec(target)
      val in: java.io.InputStream =
        if (codec != null) codec.createInputStream(rawIn) else rawIn
      try {
        val b = new Array[Byte](4)
        var n = 0
        var r = 0
        while (n < 4 && { r = in.read(b, n, 4 - n); r > 0 }) n += r
        def u(i: Int) = b(i) & 0xFF
        if (n >= 2 && u(0) == 0xFF && u(1) == 0xFE) Some("UTF-16LE")
        else if (n >= 2 && u(0) == 0xFE && u(1) == 0xFF) Some("UTF-16BE")
        else if (n >= 4 && u(0) == 0x84 && u(1) == 0x31 &&
                 u(2) == 0x95 && u(3) == 0x33) Some("GB18030")
        else None
      } finally in.close()
    }
  }.toOption.flatten

  /** Auto separator detection over a pre-fetched first line. */
  def sniffSepFrom(line: String): String =
    Seq("\t", ";", "|", ",").maxBy(s => line.count(_.toString == s))

  def sniffSep(spark: SparkSession, path: String, skip: Int = 0): String =
    sniffSepFrom(firstLine(spark, path, skip))

  /** fread(file): distributed CSV read with data.table-flavored options. */
  def fread(spark: SparkSession, path: String,
            opts0: FreadOptions = FreadOptions()): DataFrame = {
    // csvy: fold the front-matter's schema/dialect into the options
    // (explicit user options win, matching the reference where
    // fread(yaml=TRUE) args override the header block)
    val dflt = FreadOptions()
    val optsY = if (opts0.yaml) {
      val h = csvyHeader(spark, path)
      // explicit (non-default) user args override the yaml block, like
      // the reference's test_override_* fixtures pin down
      opts0.copy(
        skip = opts0.skip + h.skipLines,
        sep = if (opts0.sep == dflt.sep) h.sep.getOrElse(opts0.sep) else opts0.sep,
        header = if (opts0.header == dflt.header) h.header.map(_.toString).getOrElse(opts0.header)
                 else opts0.header,
        colClasses = opts0.colClasses.orElse(h.schema),
        dec = if (opts0.dec == dflt.dec) h.dec.getOrElse(opts0.dec) else opts0.dec,
        quote = if (opts0.quote == dflt.quote) h.quote.getOrElse(opts0.quote) else opts0.quote,
        naStrings = if (opts0.naStrings == dflt.naStrings)
                      h.naStrings.map("" +: _).getOrElse(opts0.naStrings)
                    else opts0.naStrings)
    } else opts0
    // skip="string": resolve the substring to a physical line index on
    // the driver (bounded head read), then fall through to the integer
    // skip machinery. The index must count lines in the SAME convention
    // as the downstream skip consumer — Hadoop LineReader (\n, \r, \r\n
    // all terminate) for the standard tier, split("\r?\n") for the
    // exotic-charset transcode tier — and decode with the real charset
    // (a UTF-8 decode of e.g. GB18030 bytes garbles the needle). csvy
    // front matter is searched PAST (the block could contain the
    // needle); the match overrides any integer skip like the reference,
    // where skip= is one int-or-string argument.
    val optsS = optsY.skipTo match {
      case Some(needle) =>
        val front = optsY.skip - opts0.skip    // csvy front-matter lines
        val exoticSkip = !sparkCsvCharsets.contains(optsY.encoding.toLowerCase)
        val segs = headLinesRaw(spark, path, 100000,
          if (exoticSkip) optsY.encoding else "UTF-8")
        val physical: Seq[String] =
          if (exoticSkip) segs                 // transcode tier: \r?\n only
          else segs.flatMap(s => s.split("\r", -1).toSeq)  // LineReader: bare \r too
        val idx = physical.iterator.drop(front).indexWhere(_.contains(needle))
        require(idx >= 0,
          s"fread: skip=\"$needle\" not found in the first ${physical.length} lines of $path")
        optsY.copy(skip = front + idx, skipTo = None)
      case None => optsY
    }
    // BOM auto-detection (reference src/fread.c UTF-16/GB-18030 BOM
    // checks): an unspecified encoding= upgrades from the first bytes —
    // UTF-16 additionally forces the whole-file parse (the byte-level
    // line splitter would cut the 0x0A bytes inside UTF-16 code units).
    // Explicit encoding= always wins.
    val optsB =
      if (optsS.encoding != dflt.encoding) optsS
      else sniffBom(spark, path) match {
        case Some(cs) =>
          System.err.println(
            if (cs == "GB18030")
              s"[graft] fread: GB-18030 encoding detected (byte-order mark) in $path"
            else s"[graft] fread: $cs encoding detected (byte-order mark) in $path")
          optsS.copy(encoding = cs,
            multiLine = optsS.multiLine || cs.startsWith("UTF-16"))
        case None => optsS
      }
    // dec="," + a yaml number field: the pinned DoubleType can't parse
    // decimal-comma strings — read those fields as string and let the
    // re-bump pass normalize + re-type them from the full data
    val yamlDecDowngrade = opts0.yaml && optsB.dec != "." && optsB.dec != "auto" &&
      optsB.colClasses.isDefined && opts0.colClasses.isEmpty
    val downgradedCols: Seq[String] = if (yamlDecDowngrade) {
      import org.apache.spark.sql.types.DoubleType
      optsB.colClasses.get.fields.filter(_.dataType == DoubleType).map(_.name).toSeq
    } else Nil
    val opts = if (yamlDecDowngrade) {
      import org.apache.spark.sql.types.{DoubleType, StructField}
      optsB.copy(colClasses = Some(StructType(optsB.colClasses.get.fields.map(f =>
        if (f.dataType == DoubleType) StructField(f.name, StringType, nullable = true) else f))))
    } else optsB
    // Spark 4's CSV source validates `encoding` against a fixed charset
    // list (us-ascii/iso-8859-1/utf-8/utf-16*/utf-32). Anything else the
    // JVM knows (GB18030, Big5, Shift_JIS, ...) goes through the
    // transcode tier below: decode the file's bytes with the JVM
    // charset into a lines Dataset, then run the SAME CSV parse over it.
    val exoticCharset = !sparkCsvCharsets.contains(opts.encoding.toLowerCase)
    // Decode tier: binaryFile load, whole-file JVM-charset decode, line
    // split. multiLine (quoted embedded newlines) is unsupported here —
    // the line split would cut through them. The reference's fread
    // reads ONE file per call (R/fread.R:37 `file=` is scalar), and the
    // lines-Dataset CSV parse strips exactly one global header — so the
    // tier requires a single input file rather than silently treating a
    // second file's header row as data.
    def decodedLines(): org.apache.spark.sql.Dataset[String] = {
      require(!opts.multiLine,
        s"fread: multiLine=TRUE is not supported with encoding=${opts.encoding} " +
          "(outside Spark's CSV charset list); transcode the file first")
      val bin = spark.read.format("binaryFile").load(path)
      val files = bin.inputFiles
      require(files.length == 1,
        s"fread: encoding=${opts.encoding} (transcode tier) reads ONE file " +
          s"per call like the reference's fread; got ${files.length}: " +
          files.take(3).mkString(", "))
      bin.select(col("content"))
        .as(org.apache.spark.sql.Encoders.BINARY)
        .flatMap(b => new String(b, opts.encoding).split("\r?\n").iterator.drop(opts.skip))(
          org.apache.spark.sql.Encoders.STRING)
    }
    // First line: sniffing sep/header from a UTF-8 head read would see
    // mojibake for exotic charsets whose trail bytes collide with ASCII
    // sep candidates ('|' sits inside the GBK/Big5 trail-byte range) —
    // decode with the real charset there
    lazy val line1 = {                                   // fetched at most once
      if (exoticCharset) {
        // transcode tier (decodedLines already dropped `skip`): a CR-only
        // file leaves the whole text as one \r?\n segment — the first
        // PHYSICAL line ends at the first CR
        val raw = decodedLines().head(1).headOption.getOrElse("")
        val i = raw.indexOf('\r')
        if (i >= 0) raw.substring(0, i) else raw
      } else {
        // \r-only or \r\r\n EOL files (tests.Rraw 1869 / russellCRCRLF):
        // the head reader splits on \n only, so expand each segment's
        // interior CRs into the physical lines Hadoop's LineReader (the
        // distributed parse + the skip pre-pass) would count — skip=
        // must index the SAME lines on both sides. UTF-16 (native-tier
        // charset, possibly BOM-detected) must decode the head with the
        // real charset — a UTF-8 decode interleaves NULs — and drop the
        // BOM char so sep/header sniffing sees clean fields.
        val hdCs =
          if (opts.encoding.toLowerCase.startsWith("utf-16")) opts.encoding
          else "UTF-8"
        val segs = headSegments(spark, path, opts.skip + 1,
          s => s.iterator.flatMap(_.split("\r", -1)).drop(opts.skip)
            .exists(_.nonEmpty), hdCs)
        segs.iterator.flatMap(_.split("\r", -1)).drop(opts.skip)
          .find(_.nonEmpty).getOrElse("").stripPrefix("\uFEFF")
      }
    }
    val sep = if (opts.sep == "auto") sniffSepFrom(line1) else opts.sep
    val hasHeader = opts.header match {
      case "true"  => true
      case "false" => false
      case _ =>      // auto: header iff NO first-line field parses non-string.
        // logicalYN enables the Y/N bool parser (reference
        // parse_bool_yesno accepts y/n lowercase too, src/fread.c:1261),
        // so a first-line field of Y/y/N/n then counts as data — this is
        // why fread(gb18030.txt, logicalYN=TRUE) autonames V1..V3
        // (tests.Rraw 1627.32: the header 'x,y,z' contains 'y').
        val fields = line1.split(java.util.regex.Pattern.quote(sep), -1)
        def unquote(f: String) =
          f.trim.stripPrefix(opts.quote).stripSuffix(opts.quote).trim
        !fields.exists { f =>
          val v = unquote(f)
          scala.util.Try(v.toDouble).isSuccess ||
            (opts.logicalYN && Set("Y", "y", "N", "n")(v)) ||
            // a decimal-comma numeral is DATA whenever dec could
            // resolve to ',' (headerless European files)
            ((opts.dec == "," || opts.dec == "auto") && sep != "," &&
              v.matches("[+-]?[0-9]+,[0-9]+"))
        }
    }
    // fread(dec="auto") — the reference DEFAULT (R/fread.R:38;
    // man/fread.Rd "Decimal separator"): over the sampled head, count
    // fields numeric ONLY under dec=',' minus fields numeric only under
    // dec='.'; a positive balance selects ',' (the reference's
    // "dec=',' detected based on a balance of N" verbose line). A ','
    // sep forces '.' (they must be distinct); explicit dec= skips the
    // sniff entirely.
    val decSep: String =
      if (opts.dec != "auto") opts.dec
      else if (sep == ",") "."
      else {
        val commaNum = "[+-]?[0-9]+,[0-9]+([eE][+-]?[0-9]+)?"
        val pointNum = "[+-]?[0-9]*\\.[0-9]+([eE][+-]?[0-9]+)?"
        val sample =
          (if (exoticCharset) decodedLines().head(100).toSeq
           else headLines(spark, path, opts.skip, 100))
            .drop(if (hasHeader) 1 else 0)
        var balance = 0
        sample.foreach(_.split(java.util.regex.Pattern.quote(sep), -1)
          .foreach { f =>
            val v = f.trim
            // quoted fields are character data by declaration — counting
            // their contents would let text like "1,5 kg" skew the vote
            if (opts.quote.nonEmpty && v.startsWith(opts.quote)) ()
            else if (v.matches(commaNum)) balance += 1
            else if (v.matches(pointNum)) balance -= 1
          })
        if (balance > 0) {
          // the reference prints this only under verbose=TRUE
          if (opts.verbose) System.err.println(
            s"[graft] fread: dec=',' detected based on a balance of $balance")
          ","
        } else "."
      }
    require(decSep == "." || decSep != sep,
      s"dec='$decSep' cannot equal sep='$sep'")
    // DataFrameReader is MUTABLE (schema()/option() return this) — build
    // a fresh one per parse so the type-bump probe can't pollute the
    // inferring reader
    def mkReader(schema: Option[StructType]) = {
      val r = spark.read
        .option("sep", sep)
        // fread(quote=""): disable quote processing entirely (a quote
        // char is then ordinary data) — Spark's disable convention is
        // the NUL character
        .option("quote", if (opts.quote.isEmpty) "\u0000" else opts.quote)
        .option("escape", opts.escape)
        // Spark CSV supports ONE null token: prefer the first NON-empty
        // na.string ('' parses as null for non-string types regardless);
        // remaining tokens are nulled by the post-parse pass below
        .option("nullValue", opts.naStrings.find(_.nonEmpty).getOrElse(""))
        // lines arriving via the transcode tier are already decoded
        .option("encoding", if (exoticCharset) "UTF-8" else opts.encoding)
        .option("timeZone", opts.tz)
        .option("mode", "PERMISSIVE")
        .option("ignoreLeadingWhiteSpace", opts.stripWhite)
        .option("ignoreTrailingWhiteSpace", opts.stripWhite)
        .option("multiLine", opts.multiLine)
        .option("unescapedQuoteHandling", opts.unescapedQuoteHandling)
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .option("header", hasHeader)
      schema match {
        case Some(s) => r.schema(s)
        case None    => r.option("inferSchema", true)
                         .option("samplingRatio", opts.samplingRatio)
      }
    }
    // skip= has no Spark CSV option: drop the first N physical lines via
    // a text pre-pass (zipWithIndex follows file order), then parse the
    // remaining lines as CSV.
    def runCsv(schema: Option[StructType]): DataFrame =
      if (exoticCharset) mkReader(schema).csv(decodedLines())
      else if (opts.skip > 0) {
        val lines = spark.read.textFile(path).rdd.zipWithIndex()
          .filter(_._2 >= opts.skip).map(_._1)
        mkReader(schema).csv(
          spark.createDataset(lines)(org.apache.spark.sql.Encoders.STRING))
      } else mkReader(schema).csv(path)
    // fill=TRUE (src/fread.c fill, #7463): rows may carry MORE fields
    // than the first line — Spark sizes the schema from the first line
    // and silently drops the extras. A bounded quote-aware head scan
    // takes the max per-record field count; when it exceeds the first
    // line's width, an explicit all-string schema that wide parses the
    // file (PERMISSIVE pads the short rows) and the full-data re-bump
    // re-types. Extra columns autoname V{position} like the reference.
    // When the first line IS the widest (the common shape, all 536
    // fixtures) nothing engages and the plain path runs unchanged.
    val fillSchema: Option[StructType] =
      if ((!opts.fill && opts.fillTo <= 0) || opts.colClasses.isDefined) None
      else if (opts.fillTo > 0) {
        // declared width: no scan at all — trust N like the reference
        val hdrFields = line1.split(java.util.regex.Pattern.quote(sep), -1)
        val maxF = math.max(opts.fillTo, hdrFields.length)
        // visibility over the upper-bound contract (the reference's
        // fill=N errors when exceeded; a partitioned read can't stop, so
        // this warns instead of silently dropping): declared widths below
        // the header width are ignored, and a bounded head sample flags
        // rows already wider than the bound. Rows past the sample that
        // exceed N still truncate — that is the documented trade for
        // avoiding the reference's fill=Inf whole-file scan.
        if (opts.fillTo < hdrFields.length)
          System.err.println(s"[graft] fread: fill=${opts.fillTo} is below " +
            s"the header width ${hdrFields.length}; using the header width " +
            "(the reference errors here)")
        else {
          val sampleW =
            (if (exoticCharset) decodedLines().head(100).toSeq
             else headLines(spark, path, opts.skip, 100))
              .drop(if (hasHeader) 1 else 0)
          val wide = sampleW.count(
            _.split(java.util.regex.Pattern.quote(sep), -1).length > maxF)
          if (wide > 0)
            System.err.println(s"[graft] fread: fill=${opts.fillTo} — $wide " +
              s"of the first ${sampleW.size} data rows exceed the declared " +
              "width; fields beyond it are dropped (fill=N is an " +
              "upper-bound contract)")
        }
        if (maxF <= hdrFields.length && !opts.fill) None
        else {
          def unq(f: String) =
            f.trim.stripPrefix(opts.quote).stripSuffix(opts.quote).trim
          val names = (0 until maxF).map { i =>
            if (hasHeader && i < hdrFields.length && unq(hdrFields(i)).nonEmpty)
              unq(hdrFields(i))
            else if (hasHeader) s"V${i + 1}"
            else s"_c$i"
          }
          Some(StructType(names.map(n =>
            org.apache.spark.sql.types.StructField(n, StringType,
              nullable = true)).toArray))
        }
      }
      else {
        val segs0 = headSegments(spark, path, 100000, s => s.length >= 100000,
          if (exoticCharset) opts.encoding else "UTF-8")
        // skip= counts the same physical lines the parse does (bare-CR
        // expansion for the standard tier, \r?\n for the transcode tier)
        val physical =
          if (exoticCharset) segs0 else segs0.flatMap(_.split("\r", -1))
        val head = physical.drop(opts.skip).mkString("\n")
        val q = if (opts.quote.nonEmpty) opts.quote.head else '\u0000'
        var inQ = false; var fields = 1; var maxF = 0; var i = 0
        while (i < head.length) {
          val c = head.charAt(i)
          if (inQ) {
            if (c == q) {
              if (i + 1 < head.length && head.charAt(i + 1) == q) i += 1
              else inQ = false
            }
          } else if (c == q) inQ = true
          else if (head.startsWith(sep, i)) { fields += 1; i += sep.length - 1 }
          else if (c == '\n' || c == '\r') {
            maxF = math.max(maxF, fields); fields = 1
            if (c == '\r' && i + 1 < head.length && head.charAt(i + 1) == '\n')
              i += 1
          }
          i += 1
        }
        maxF = math.max(maxF, fields)
        val hdrFields = line1.split(java.util.regex.Pattern.quote(sep), -1)
        if (maxF <= hdrFields.length) None
        else {
          def unq(f: String) =
            f.trim.stripPrefix(opts.quote).stripSuffix(opts.quote).trim
          val names = (0 until maxF).map { i =>
            if (hasHeader && i < hdrFields.length && unq(hdrFields(i)).nonEmpty)
              unq(hdrFields(i))
            else if (hasHeader) s"V${i + 1}"    // reference fill autoname
            else s"_c$i"                         // headerless convention
          }
          Some(StructType(names.map(n =>
            org.apache.spark.sql.types.StructField(n, StringType,
              nullable = true)).toArray))
        }
      }
    var df = runCsv(opts.colClasses.orElse(fillSchema))
    var bumped = false
    // types to prefer when the re-bump pass re-types string columns:
    // csvy-declared doubles (dec-downgrade) and, after a type-bump
    // re-read, whatever the sampler correctly inferred (esp. temporal
    // types, which the numeric re-bump alone could never restore)
    var preferredTypes: Map[String, DataType] =
      if (yamlDecDowngrade)
        downgradedCols.map(_ -> (DoubleType: DataType)).toMap
      else Map.empty
    // Out-of-sample type-bump re-read (src/fread.c:126-128): only
    // possible when inference sampled a fraction of rows. Probe for rows
    // the sampled schema can't parse; if any exist, ONE full re-read
    // with all-string schema followed by the full-data numeric/boolean
    // re-bump — the distributed analog of fread's "bump the type,
    // re-read from the top". samplingRatio=1.0 (default) skips the
    // probe entirely, so the common path pays nothing.
    if (opts.colClasses.isEmpty && opts.samplingRatio < 1.0) {
      import org.apache.spark.sql.types.StructField
      val inferred = df.schema
      val probeSchema = StructType(
        inferred.fields :+ StructField("_corrupt_record", StringType, nullable = true))
      val anyCorrupt = runCsv(Some(probeSchema))
        .filter(col("_corrupt_record").isNotNull).head(1).nonEmpty
      if (anyCorrupt) {
        val allString = StructType(inferred.fields
          .filterNot(_.name == "_corrupt_record")
          .map(f => StructField(f.name, StringType, nullable = true)))
        df = runCsv(Some(allString))
        bumped = true
        preferredTypes ++= inferred.fields
          .filter(f => f.dataType != StringType && f.name != "_corrupt_record")
          .map(f => f.name -> f.dataType)
      }
    }
    // headerless reads autoname V1..Vn like the reference (fread.c
    // autonames; tests.Rraw 1627.32 expects V1) instead of leaking
    // Spark's _c0.. convention - positional matches only, so explicit
    // colClasses names pass through untouched
    if (!hasHeader) {
      val renamed = df.columns.zipWithIndex.map { case (c, i) =>
        if (c == s"_c$i") s"V${i + 1}" else c }
      if (renamed.toSeq != df.columns.toSeq) df = df.toDF(renamed.toSeq: _*)
    }
    // a UTF-8 BOM survives as part of the first column name — strip it
    // (fread strips BOMs, src/fread.c:1071)
    if (df.columns.nonEmpty && df.columns.head.startsWith("\uFEFF"))
      df = df.withColumnRenamed(df.columns.head, df.columns.head.substring(1))
    // fread #5124: a literal header cell equal to a na.string stays a
    // column NAME \u2014 Spark nulls it during the header read and autonames
    // the column _cN. Restore the literal text (a genuinely EMPTY header
    // cell keeps the autoname; data rows still parse the token as null).
    if (hasHeader && opts.colClasses.isEmpty && fillSchema.isEmpty &&
        df.columns.zipWithIndex.exists { case (c, i) => c == s"_c$i" }) {
      val hdrFields = line1.split(java.util.regex.Pattern.quote(sep), -1)
        .map(f => f.trim.stripPrefix(opts.quote).stripSuffix(opts.quote).trim)
      val renamed = df.columns.zipWithIndex.map { case (c, i) =>
        if (c == s"_c$i" && i < hdrFields.length && hdrFields(i).nonEmpty)
          hdrFields(i)
        else c
      }
      if (renamed.toSeq != df.columns.toSeq) df = df.toDF(renamed.toSeq: _*)
    }
    df = applyExtraNaAndRebump(df, opts.copy(dec = decSep),
      forceRebump = bumped || yamlDecDowngrade || fillSchema.isDefined,
      extraCandidates = downgradedCols, preferred = preferredTypes)
    // fread(logicalYN): one slim probe over the string columns — a
    // column is logical iff it has values and every non-null one is a
    // Y/N token (the reference's parse_bool_yesno accepts y/n lowercase
    // too, src/fread.c:1261 — but not Yes/No)
    if (opts.logicalYN) {
      val strCols = df.schema.fields.filter(_.dataType == StringType).map(_.name)
      if (strCols.nonEmpty) {
        val probes = strCols.flatMap(c => Seq(
          count(col(c)).as(s"_n_$c"),
          count(when(col(c).isin("Y", "N", "y", "n"), 1)).as(s"_yn_$c")))
        val p = df.agg(probes.head, probes.tail: _*).head()
        strCols.foreach { c =>
          if (p.getAs[Long](s"_n_$c") > 0 &&
              p.getAs[Long](s"_n_$c") == p.getAs[Long](s"_yn_$c"))
            df = df.withColumn(c, col(c).isin("Y", "y"))
        }
      }
    }
    if (opts.select.nonEmpty)
      df = df.select(opts.select.map(df.col): _*)
    if (opts.drop.nonEmpty)
      df = df.drop(opts.drop: _*)
    // col.names= applies AFTER select/drop, positionally, like the
    // reference (R/fread.R col.names handling)
    if (opts.colNames.nonEmpty) {
      require(opts.colNames.length == df.columns.length,
        s"fread: col.names has ${opts.colNames.length} names for " +
          s"${df.columns.length} columns")
      df = df.toDF(opts.colNames: _*)
    }
    // check.names runs over the FINAL names, after col.names like the
    // reference applies make.names to the finished answer. One Spark
    // quirk to undo: the CSV reader itself dedups duplicate header
    // names to a0/a1 before we ever see them — when nothing else has
    // renamed or re-selected columns, make.names must run over the RAW
    // header fields so "a,a" becomes the reference's ("a", "a.1"), not
    // ("a0", "a1").
    if (opts.checkNames) {
      val raw: Option[Seq[String]] =
        if (hasHeader && opts.colNames.isEmpty && opts.select.isEmpty &&
            opts.drop.isEmpty && opts.colClasses.isEmpty && fillSchema.isEmpty) {
          val hdr = line1.split(java.util.regex.Pattern.quote(sep), -1)
            .map(f => f.trim.stripPrefix(opts.quote).stripSuffix(opts.quote).trim)
            .toSeq
          if (hdr.length == df.columns.length) Some(hdr) else None
        } else None
      df = df.toDF(makeNames(raw.getOrElse(df.columns.toSeq)): _*)
    }
    opts.nrows match {
      case Some(n) => df.limit(n.toInt)
      case None    => df
    }
  }

  /** R's make.names(unique=TRUE) (R/fread.R:374 check.names): replace
    * characters outside [A-Za-z0-9._] with '.', prepend 'X' when the
    * name starts with a digit (or '.'+digit, or is empty), append '.'
    * to R reserved words, then make.unique with .1/.2 suffixes —
    * tests.Rraw 134.5 pins "1b"→"X1b" and the "a 1"→"a.1"→"a.1.1"
    * collision cascade.
    */
  private[graft] def makeNames(names: Seq[String]): Seq[String] = {
    val reserved = Set("if", "else", "repeat", "while", "function", "for",
      "next", "break", "TRUE", "FALSE", "NULL", "Inf", "NaN", "NA",
      "NA_integer_", "NA_real_", "NA_character_", "NA_complex_")
    def valid(c: Char): Boolean =
      (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
        (c >= '0' && c <= '9') || c == '.' || c == '_'
    val base = names.map { n0 =>
      var n = n0.map(c => if (valid(c)) c else '.')
      val badStart = n.isEmpty || n.head.isDigit || n.head == '_' ||
        (n.head == '.' && n.length > 1 && n(1).isDigit)
      if (badStart) n = "X" + n
      if (reserved(n)) n = n + "."
      n
    }
    val taken = scala.collection.mutable.Set[String]()
    val nextK = scala.collection.mutable.Map[String, Int]()
    base.map { n =>
      if (!taken(n)) { taken += n; n }
      else {
        var k = nextK.getOrElse(n, 0) + 1
        var cand = s"$n.$k"
        while (taken(cand)) { k += 1; cand = s"$n.$k" }
        nextK(n) = k
        taken += cand
        cand
      }
    }
  }

  /** Post-parse pass for the option combinations Spark CSV can't express
    * natively:
    *  - extra na.strings beyond the single nullValue token → nulled on
    *    string columns (a numeric column polluted by a second NA token
    *    came out as string anyway, so string columns are the only place
    *    they can hide);
    *  - dec="," → decimal-comma strings normalized;
    *  - then any string column whose non-null values ALL parse numeric
    *    is re-bumped to long/double — the distributed analog of fread's
    *    type-bump re-read (src/fread.c:126-128), costing one extra
    *    aggregation pass only when these options are in play.
    */
  private def applyExtraNaAndRebump(df0: DataFrame, opts: FreadOptions,
                                    forceRebump: Boolean = false,
                                    extraCandidates: Seq[String] = Nil,
                                    preferred: Map[String, DataType] = Map.empty): DataFrame = {
    val primary = opts.naStrings.find(_.nonEmpty).getOrElse("")
    val extra = opts.naStrings.filter(t => t.nonEmpty && t != primary).distinct
    val needDec = opts.dec != "."
    if (extra.isEmpty && !needDec && !forceRebump) return df0
    var df = df0
    def strCols = df.schema.fields.filter(_.dataType == StringType).map(_.name).toSeq
    if (extra.nonEmpty)
      df = strCols.foldLeft(df)((d, c) =>
        d.withColumn(c, when(col(c).isin(extra: _*), lit(null)).otherwise(col(c))))
    // an explicit colClasses schema PINS every column's type — the user
    // said StringType on purpose (zip codes, ids with leading zeros), so
    // only infer-schema reads are eligible for the numeric re-bump; the
    // yaml dec-downgrade re-opens exactly its downgraded columns
    val candidates =
      if (opts.colClasses.isDefined) extraCandidates.filter(strCols.contains)
      else strCols
    if (candidates.nonEmpty) {
      def decFixed(c: String): String = {
        val q = s"`$c`"
        if (needDec) s"replace($q, '${opts.dec}', '.')" else q
      }
      val checks = candidates.flatMap(c => Seq(
        expr(s"count(`$c`)").as(s"n_$c"),
        // try_cast, not cast: ANSI mode throws on non-numeric strings
        expr(s"count(try_cast(${decFixed(c)} AS DOUBLE))").as(s"d_$c"),
        expr(s"count(CASE WHEN ${decFixed(c)} RLIKE '^-?[0-9]+$$' THEN 1 END)").as(s"i_$c"),
        expr(s"count(CASE WHEN lower(`$c`) IN ('true','false') THEN 1 END)").as(s"b_$c"),
        // date/timestamp restore after a type-bump re-read: the
        // all-string schema must not permanently demote a column the
        // sampler correctly inferred as temporal
        expr(s"count(try_cast(`$c` AS DATE))").as(s"dt_$c"),
        expr(s"count(try_cast(`$c` AS TIMESTAMP))").as(s"ts_$c")))
      val row = df.agg(checks.head, checks.tail: _*).head()
      candidates.foreach { c =>
        val n = row.getAs[Long](s"n_$c")
        val d = row.getAs[Long](s"d_$c")
        val i = row.getAs[Long](s"i_$c")
        val b = row.getAs[Long](s"b_$c")
        val dt = row.getAs[Long](s"dt_$c")
        val ts = row.getAs[Long](s"ts_$c")
        preferred.get(c) match {
          // a column the sampler typed temporal: restore iff the FULL
          // data still parses; otherwise it stays string (the corrupt
          // rows are the reason the re-read happened)
          case Some(DateType) if n > 0 && dt == n =>
            df = df.withColumn(c, expr(s"try_cast(`$c` AS DATE)"))
          case Some(TimestampType) if n > 0 && ts == n =>
            df = df.withColumn(c, expr(s"try_cast(`$c` AS TIMESTAMP)"))
          // a column DECLARED double (csvy 'number', or inferred double)
          // keeps DoubleType even when every value happens to be
          // integral — the declaration wins over the narrower guess
          case Some(DoubleType) if n > 0 && d == n =>
            df = df.withColumn(c, expr(s"try_cast(${decFixed(c)} AS DOUBLE)"))
          case _ =>
            if (n > 0 && b == n)
              df = df.withColumn(c, expr(s"try_cast(`$c` AS BOOLEAN)"))
            else if (n > 0 && d == n)
              df = df.withColumn(c,
                expr(s"try_cast(${decFixed(c)} AS ${if (i == n) "BIGINT" else "DOUBLE"})"))
        }
      }
    }
    df
  }

  final case class FwriteOptions(
      sep: String = ",",
      quote: String = "\"",
      escape: String = "\"",           // write RFC4180 doubled quotes
      na: String = "",
      header: Boolean = true,
      compress: String = "none",        // none|gzip (reference compress=)
      dateTimeAs: String = "ISO",       // ISO | squash | epoch | write.csv (R/fwrite.R:8)
      sep2: String = "|",               // list/array column joiner (fwrite sep2)
      append: Boolean = false,          // fwrite(append=TRUE)
      bom: Boolean = false,             // fwrite(bom=TRUE)
      logical01: Boolean = false,       // fwrite(logical01): booleans as 1/0 (R/fwrite.R:6)
      yaml: Boolean = false,            // fwrite(yaml=TRUE): csvy front matter (R/fwrite.R:13)
      scipen: Int = 0,                  // fwrite(scipen): width penalty on scientific notation (src/fwrite.h:102)
      dec: String = ".",                // fwrite(dec=','): decimal separator inside numbers (src/fwrite.c:38)
      qmethod: String = "double",       // "double" doubles quotes in-field; "escape" backslash-escapes (R/fwrite.R qmethod)
      quoteMode: String = "auto",       // "auto" quotes only when needed; "all" = fwrite(quote=TRUE): every string field + header
      eol: String = "\n")               // record terminator (R/fwrite.R eol=, "\r\n" on Windows)

  /** fwrite(x, file): distributed CSV write — partitioned output is the
    * cluster analog of the reference's per-thread buffers
    * (src/fwrite.c buffMB).
    */
  def fwrite(df0: DataFrame, path: String,
             opts: FwriteOptions = FwriteOptions()): Unit = {
    // Under append a BOM would re-stamp earlier parts each run (gzip is
    // fine since round 17: prependBytes streams the prefix through the
    // codec, matching the reference where the BOM/front matter is the
    // head of the UNCOMPRESSED stream — src/fwrite.c writes both
    // through the same gzip buffer)
    require(!(opts.bom && opts.append),
      "fwrite: bom=TRUE cannot combine with append=TRUE")
    require(!(opts.yaml && opts.append),
      "fwrite: yaml=TRUE cannot combine with append (csvy is a " +
        "single file with one front-matter block)")
    // R/fwrite.R:47-48: dec is one char, distinct from sep whenever both
    // might be needed — a single-column table never writes sep, so
    // dec==sep is allowed there (#7227, tests.Rraw 2337.1); dec/sep2
    // clash only matters once a list column joins in-field
    require(opts.dec.length == 1, s"fwrite: dec must be a single character, got '${opts.dec}'")
    require(opts.dec != opts.sep || df0.columns.length <= 1,
      "fwrite: dec and sep must be distinct")
    require(opts.dec != opts.sep2 ||
        !df0.schema.fields.exists(_.dataType.isInstanceOf[ArrayType]),
      "fwrite: dec and sep2 must be distinct when list columns are present")
    var df = df0
    df0.schema.fields.foreach { f =>
      val c = col(f.name)
      f.dataType match {
        // list columns: sep2-joined inside the field (R/fwrite.R sep2);
        // double elements take the reference float format, like scalars
        case ArrayType(DoubleType | FloatType, _) =>
          df = df.withColumn(f.name,
            concat_ws(opts.sep2, transform(c, e => DtoaExpr(e, opts.scipen, opts.dec.head))))
        case _: ArrayType =>
          df = df.withColumn(f.name, concat_ws(opts.sep2, transform(c, _.cast("string"))))
        // reference float formatting: 15 s.f., width-chosen decimal vs
        // scientific with the scipen penalty (src/fwrite.c writeFloat64);
        // NaN → null → the na string, matching the reference
        case DoubleType | FloatType =>
          df = df.withColumn(f.name, DtoaExpr(c, opts.scipen, opts.dec.head))
        case TimestampType => opts.dateTimeAs match {
          case "squash"    => df = df.withColumn(f.name, date_format(c, "yyyyMMddHHmmss"))
          case "epoch"     => df = df.withColumn(f.name, unix_seconds(c))
          // write.csv parity (R/fwrite.R:8): as.character's space-
          // separated local form, not ISO's 'T'
          case "write.csv" => df = df.withColumn(f.name, date_format(c, "yyyy-MM-dd HH:mm:ss"))
          // dec=',' reaches sub-second timestamps too (#6446, tests.Rraw
          // 2281): ISO UTC with the fraction written at ms precision when
          // whole-millisecond, else full micros — both behind dec
          case _ if opts.dec != "." =>
            val us = pmod(unix_micros(c), lit(1000000L))
            val frac = when(us === 0, lit(""))
              .when(us % 1000 === 0,
                // Column./ is double division — cast back to long so
                // 1000 µs prints "001", not "1.0"
                concat(lit(opts.dec),
                  lpad((us / 1000).cast("long").cast("string"), 3, "0")))
              .otherwise(concat(lit(opts.dec), lpad(us.cast("string"), 6, "0")))
            df = df.withColumn(f.name,
              concat(date_format(c, "yyyy-MM-dd'T'HH:mm:ss"), frac, lit("Z")))
          case _           => ()
        }
        case DateType => opts.dateTimeAs match {
          case "squash" => df = df.withColumn(f.name, date_format(c, "yyyyMMdd"))
          case "epoch"  => df = df.withColumn(f.name, datediff(c, lit("1970-01-01").cast("date")))
          case _        => ()
        }
        // logical columns: TRUE/FALSE like the reference (Spark's CSV
        // default is lowercase), or 1/0 under logical01; null → na
        case BooleanType =>
          df = df.withColumn(f.name,
            if (opts.logical01) c.cast("int")
            else when(c, lit("TRUE")).when(!c, lit("FALSE")))
        case _ => ()
      }
    }
    // R/fwrite.R eol= (tests.Rraw 1658.10/.62): any byte sequence; ''
    // is an error like the reference. eol= composes with compress=gzip
    // since round 17: the per-part rewrite streams through the codec.
    require(opts.eol.nonEmpty, "fwrite: eol must be 1 or more bytes")
    require(opts.qmethod == "double" || opts.qmethod == "escape",
      s"fwrite: qmethod must be 'double' or 'escape', got '${opts.qmethod}'")
    require(opts.quoteMode == "auto" || opts.quoteMode == "all",
      s"fwrite: quoteMode must be 'auto' or 'all', got '${opts.quoteMode}'")
    // qmethod (R/fwrite.R, tests.Rraw 1658.02-.08): how a quote char
    // inside a quoted field is written — doubled ("") or
    // backslash-escaped (\"). Spark's CSV writer expresses exactly these
    // two via escape= (escape == quote doubles; anything else escapes,
    // also doubling literal escape chars, matching the reference's
    // backslash-bs fixture).
    val effEscape = if (opts.qmethod == "escape") "\\" else opts.escape
    // fwrite(quote=TRUE) = quoteMode="all" (tests.Rraw 1658.16/.17):
    // every ORIGINALLY-character field and every header name is quoted;
    // numeric/logical/temporal fields stay bare (so Spark's quoteAll —
    // which quotes everything — cannot express it). Quote + escape the
    // string cells ourselves, quote the header names, and disable the
    // writer's own quoting; nulls skip the wrap and still print the na
    // string bare, like the reference's `2,` row in 1658.02.
    if (opts.quoteMode == "all" && opts.quote.nonEmpty) {
      val q = opts.quote
      def quoted(c: Column): Column = {
        val esc =
          if (opts.qmethod == "escape")
            regexp_replace(regexp_replace(c, "\\\\", "\\\\\\\\"),
              java.util.regex.Pattern.quote(q), "\\\\" + q)
          else regexp_replace(c, java.util.regex.Pattern.quote(q), q + q)
        concat(lit(q), esc, lit(q))
      }
      df0.schema.fields.foreach { f =>
        // list columns count as character fields under quote=TRUE: by
        // this point the sep2 join has made them strings, and leaving
        // them bare would both diverge from the reference and break the
        // row shape whenever sep2 == sep
        if (f.dataType == StringType || f.dataType.isInstanceOf[ArrayType])
          df = df.withColumn(f.name, quoted(col(f.name)))
      }
      def hdr(n: String): String = {
        val inner =
          if (opts.qmethod == "escape")
            n.replace("\\", "\\\\").replace(q, "\\" + q)
          else n.replace(q, q + q)
        q + inner + q
      }
      df = df.toDF(df.columns.map(hdr).toIndexedSeq: _*)
    }
    // csvy is a one-file format: a single part keeps exactly one
    // front-matter block + one header in the file (also what the
    // reference writes — fwrite is single-file by construction)
    if (opts.yaml) df = df.coalesce(1)
    var w = df.write.mode(if (opts.append) SaveMode.Append else SaveMode.Overwrite)
      .option("sep", opts.sep)
      // fwrite(quote=FALSE) parity: empty quote disables quoting; under
      // quoteMode="all" the cells carry their own quotes already
      .option("quote",
        if (opts.quote.isEmpty || opts.quoteMode == "all") "\u0000"
        else opts.quote)
      .option("escape", effEscape)
      .option("nullValue", opts.na)
      .option("header", opts.header)
    if (opts.compress == "gzip") w = w.option("compression", "gzip")
    // append + eol: snapshot the pre-existing part names so the rewrite
    // touches ONLY the parts this write created — earlier appends were
    // already converted, and re-rewriting them would expand their "\r\n"
    // terminators to "\r\r\n" (the \r passes through as data)
    val preParts: Set[String] =
      if (opts.append && opts.eol != "\n")
        listPartNames(df0.sparkSession, path)
      else Set.empty
    w.csv(path)
    if (opts.eol != "\n")
      rewriteEol(df0.sparkSession, path, opts.eol,
        if (opts.quoteMode == "all") opts.quote else
          (if (opts.quote.isEmpty) "" else opts.quote),
        effEscape, skip = preParts)
    if (opts.yaml)
      prependBytes(df0.sparkSession, path,
        csvyFrontMatter(df0, opts).getBytes("UTF-8"))
    if (opts.bom)
      prependBytes(df0.sparkSession, path,
        Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte))
  }

  /** The `---`-fenced YAML block [[csvyHeader]] reads back: field
    * names + the WRITTEN types (logical01 booleans land as integer,
    * squash datetimes as string, epoch as integer — recording the
    * post-transform type is what makes the round-trip re-typed
    * correctly), plus the dialect keys the writer actually used.
    */
  private def csvyFrontMatter(df0: DataFrame, opts: FwriteOptions): String = {
    def typeName(dt: DataType): String = dt match {
      case ByteType | ShortType | IntegerType | LongType => "integer"
      case FloatType | DoubleType | _: DecimalType       => "number"
      case BooleanType => if (opts.logical01) "integer" else "boolean"
      case DateType => opts.dateTimeAs match {
        case "squash" => "string"
        case "epoch"  => "integer"
        case _        => "date"
      }
      case TimestampType => opts.dateTimeAs match {
        case "squash" => "string"
        case "epoch"  => "integer"
        case _        => "datetime"
      }
      case _ => "string"
    }
    val fields = df0.schema.fields.map(f =>
      s"  - name: ${f.name}\n    type: ${typeName(f.dataType)}").mkString("\n")
    s"""---
       |schema:
       |  fields:
       |$fields
       |dialect:
       |  delimiter: "${opts.sep}"
       |  header: ${opts.header}
       |---
       |""".stripMargin
  }

  /** Hadoop Configuration isn't Serializable; this minimal envelope
    * ships it to executor tasks for the fwrite post-passes (the same
    * shape as Spark's own util.SerializableConfiguration, re-stated here
    * so the library stays off `private[spark]` surfaces).
    */
  private final class SerHadoopConf(
      @transient var value: org.apache.hadoop.conf.Configuration)
      extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject(); value.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      value = new org.apache.hadoop.conf.Configuration(false)
      value.readFields(in)
    }
  }

  /** Names of the current `part-*` files under `path` (empty when the
    * directory doesn't exist yet — first append). Metadata-only driver
    * work; the bytes never flow through the driver.
    */
  private def listPartNames(spark: SparkSession, path: String): Set[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(conf)
    if (!fs.exists(dir)) Set.empty
    else fs.listStatus(dir)
      .filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
      .map(_.getPath.getName).toSet
  }

  /** Run `kernel` over every selected part file ON THE EXECUTORS, one
    * task per part — the post-pass scales with the cluster instead of
    * funneling the whole dataset through one driver core (a 100 TB
    * eol="\r\n" export is embarrassingly parallel per part).
    */
  private def foreachPart(spark: SparkSession, path: String,
                          skip: Set[String])(
      kernel: (org.apache.hadoop.conf.Configuration, String) => Unit): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(conf)
    val parts = fs.listStatus(dir)
      .filter(f => f.isFile && f.getPath.getName.startsWith("part-") &&
        !skip.contains(f.getPath.getName))
      .map(_.getPath.toString).toSeq.sorted
    if (parts.isEmpty) return
    val bconf = spark.sparkContext.broadcast(new SerHadoopConf(conf))
    try spark.sparkContext.parallelize(parts, parts.length)
      .foreach(p => kernel(bconf.value.value, p))
    finally { bconf.unpersist(); () }
  }

  /** Prepend `prefix` to every part file (streamed copy + rename on the
    * executor that owns the task — no driver-side buffering or byte
    * traffic). Serves fwrite(bom=TRUE) and the csvy front-matter stamp
    * (yaml=TRUE writes ONE part). A `.gz` part streams through the
    * codec so the prefix lands at the head of the UNCOMPRESSED stream —
    * the reference writes the BOM/front matter through the same gzip
    * buffer as the rows (src/fwrite.c), so fread sees it first after
    * decompression either way.
    *
    * IDEMPOTENT at BOTH the task and the whole-pass level, via RENAME
    * STATE instead of content sniffing (ADVICE r18 #3: a headerless
    * part whose first string field legitimately begins with U+FEFF
    * serializes to a leading EF BB BF, so a byte-compare guard
    * false-positives and the file silently loses its intended BOM).
    * Two-phase protocol:
    *
    *   phase 1 (one executor task per part): rename the original aside
    *   to `_<part>.orig` (atomic), stream the prefixed copy to
    *   `_<part>.bom`, rename it into place as `<part>` (atomic create —
    *   the destination is vacant), and KEEP the `.orig`. Which files
    *   exist tells a retried task exactly where its predecessor died:
    *   part only → never processed; orig only → died mid-copy, rebuild
    *   from orig; part AND orig → this part is done, skip.
    *
    *   phase 2 (after the job): stamp a dot-named, prefix-keyed marker
    *   in the directory, THEN delete the `.orig` files — so until the
    *   marker exists every part's state is still per-part decidable,
    *   and once it exists a whole-pass re-invocation returns
    *   immediately (cleaning any leftover origs from a crash between
    *   marker and cleanup).
    *
    * Underscore-prefixed names keep the `.orig`/`.bom`/marker files
    * invisible to [[foreachPart]]'s `part-` listing, to every Spark/
    * Hadoop reader (FileInputFormat ignores `_`/`.` files), AND to
    * fread's own sep/header sniffer (which filters only `_`-prefixed
    * names — a dot-prefixed marker broke its first-file pick). Streams close in
    * try/finally and a failed copy deletes its temp file.
    */
  private[graft] def prependBytes(spark: SparkSession, path: String,
                                  prefix: Array[Byte]): Unit = {
    val conf0 = spark.sparkContext.hadoopConfiguration
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs0 = dir.getFileSystem(conf0)
    val markerName =
      "_graft_prepended_" + java.lang.Integer.toHexString(
        java.util.Arrays.hashCode(prefix))
    val marker = new org.apache.hadoop.fs.Path(dir, markerName)
    def sweepOrigs(): Unit = {
      val ls = fs0.listStatus(dir)
      if (ls != null) ls.foreach { st =>
        val n = st.getPath.getName
        // ".bom." catches the attempt-unique tmp names too
        if (n.startsWith("_part-") &&
            (n.endsWith(".orig") || n.endsWith(".bom") ||
             n.contains(".bom.")))
          fs0.delete(st.getPath, false)
      }
    }
    // (bom/yaml never combine with append= — fwrite refuses — so a
    // directory is prefixed at most once per prefix and the marker can
    // safely gate the whole pass.)
    if (fs0.exists(marker)) { sweepOrigs(); return }
    // whole-JOB crash repair: an `.orig` whose part is missing means a
    // previous invocation died mid-copy AFTER renaming the original
    // aside — the part listing below would not see it and the part's
    // rows would vanish. The orig IS the pristine original (renamed
    // before any write), so restore it (and drop the half-written tmp)
    // before enumerating work.
    {
      val ls = fs0.listStatus(dir)
      if (ls != null) ls.foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith("_part-") && n.endsWith(".orig")) {
          val partName = n.stripPrefix("_").stripSuffix(".orig")
          val pp = new org.apache.hadoop.fs.Path(dir, partName)
          if (!fs0.exists(pp)) {
            // drop any half-written tmp(s), attempt-suffixed or not
            fs0.listStatus(dir).foreach { t =>
              if (t.getPath.getName.startsWith(s"_$partName.bom"))
                fs0.delete(t.getPath, false)
            }
            require(fs0.rename(st.getPath, pp),
              s"prependBytes: crash-repair rename ${st.getPath} -> $pp failed")
          }
        }
      }
    }
    foreachPart(spark, path, Set.empty) { (conf, pathStr) =>
      val p = new org.apache.hadoop.fs.Path(pathStr)
      val fs = p.getFileSystem(conf)
      val gz = p.getName.endsWith(".gz")
      val orig =
        new org.apache.hadoop.fs.Path(p.getParent, "_" + p.getName + ".orig")
      val haveOrig = fs.exists(orig)
      if (!(haveOrig && fs.exists(p))) { // part+orig → done, skip
        // CONCURRENT duplicate attempts (Spark speculation) are safe:
        // a lost rename means another live attempt owns that step —
        // both attempts produce byte-identical output from the same
        // orig, so the loser defers rather than require-fails, and the
        // copy tmp is attempt-unique so interleaved writes can never
        // corrupt a shared file (ADVICE r19).
        if (!haveOrig && !fs.rename(p, orig))
          require(fs.exists(orig),
            s"prependBytes: rename $p -> $orig failed")
        val attemptTag = Option(org.apache.spark.TaskContext.get())
          .map(tc => s"${tc.stageAttemptNumber()}-${tc.taskAttemptId()}")
          .getOrElse(s"drv${ProcessHandle.current().pid()}")
        val tmp = new org.apache.hadoop.fs.Path(
          p.getParent, "_" + p.getName + ".bom." + attemptTag)
        var ok = false
        val rawOut: java.io.OutputStream = fs.create(tmp, true)
        try {
          val out: java.io.OutputStream =
            if (gz) new java.util.zip.GZIPOutputStream(rawOut) else rawOut
          out.write(prefix)
          val rawIn: java.io.InputStream = fs.open(orig)
          try {
            val in: java.io.InputStream =
              if (gz) new java.util.zip.GZIPInputStream(rawIn) else rawIn
            val buf = new Array[Byte](1 << 20)
            var n = in.read(buf)
            while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
          } finally rawIn.close()
          out.close()  // flushes the gzip trailer; rawOut closes with it
          ok = true
        } finally {
          if (!ok) { try rawOut.close() catch { case _: Throwable => () }
                     fs.delete(tmp, false); () }
        }
        if (!fs.rename(tmp, p)) {
          // HDFS rename fails when dst exists: a concurrent attempt
          // already installed its (identical) copy — drop ours. (POSIX
          // rename replaces, which is equally fine: same bytes.)
          require(fs.exists(p), s"prependBytes: rename $tmp -> $p failed")
          fs.delete(tmp, false)
          ()
        }
      }
      ()
    }
    val out = fs0.create(marker, true)
    out.close()
    sweepOrigs()
  }

  /** fwrite(eol=) post-pass: Spark's CSV writer only supports a
    * 1-character lineSep, so multi-byte terminators ("\r\n") rewrite
    * each part in a streamed copy — one EXECUTOR task per part file via
    * [[foreachPart]] (round 17: the former driver-side loop funneled
    * every output byte through one core). QUOTE-AWARE: a '\n' inside a
    * quoted field (multiline cells) is data and must survive; the state
    * machine consumes escape pairs — esc==quote covers qmethod=double
    * (a doubled quote toggles twice = stays inside), esc='\\' covers
    * qmethod=escape where univocity escapes every literal backslash, so
    * any esc byte in the file starts a pair by construction. `skip`
    * holds part names that predate this write (append mode) and must
    * not be converted twice.
    */
  private def rewriteEol(spark: SparkSession, path: String, eol: String,
                         quote: String, escape: String,
                         skip: Set[String] = Set.empty): Unit =
    foreachPart(spark, path, skip)(rewriteEolOne(_, _, eol, quote, escape))

  /** The per-part eol-rewrite kernel, run on an executor: the
    * quote-aware state machine over one part file's bytes. A `.gz` part
    * streams through the codec (decompress → rewrite → recompress), so
    * eol= composes with compress="gzip" like the reference
    * (src/fwrite.c gzip path).
    */
  private[sources] def rewriteEolOne(
      conf: org.apache.hadoop.conf.Configuration, pathStr: String,
      eol: String, quote: String, escape: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(pathStr)
    val fs = p.getFileSystem(conf)
    val eolBytes = eol.getBytes("UTF-8")
    val q: Int = if (quote.nonEmpty) quote.head.toInt else -2
    val esc: Int = if (escape.nonEmpty) escape.head.toInt else -2
    val gz = p.getName.endsWith(".gz")
    val tmp = new org.apache.hadoop.fs.Path(p.getParent, p.getName + ".eol")
    val rawOut: java.io.OutputStream = fs.create(tmp, true)
    val out = new java.io.BufferedOutputStream(
      if (gz) new java.util.zip.GZIPOutputStream(rawOut) else rawOut, 1 << 20)
    val rawIn: java.io.InputStream = fs.open(p)
    val in = new java.io.BufferedInputStream(
      if (gz) new java.util.zip.GZIPInputStream(rawIn) else rawIn, 1 << 20)
    var inQ = false
    var c = in.read()
    while (c >= 0) {
      if (inQ) {
        if (c == esc) {
          val nx = in.read()
          if (nx == q && esc != q) { // \" escaped quote: both are data
            out.write(c); out.write(nx); c = in.read()
          } else if (nx == esc && esc != q) { // \\ escaped escape
            out.write(c); out.write(nx); c = in.read()
          } else if (esc == q) {
            // doubling convention: "" stays inside, "x closes
            out.write(c)
            if (nx == q) { out.write(nx); c = in.read() }
            else { inQ = false; c = nx } // reprocess nx outside quotes
          } else { // stray escape before ordinary data: plain bytes
            out.write(c); c = nx
          }
        } else {
          if (c == q) inQ = false
          out.write(c); c = in.read()
        }
      } else if (c == q) {
        inQ = true; out.write(c); c = in.read()
      } else if (c == '\n') {
        out.write(eolBytes); c = in.read()
      } else {
        out.write(c); c = in.read()
      }
    }
    in.close(); out.close()
    fs.delete(p, false)
    fs.rename(tmp, p)
    ()
  }

  /** Parquet is the native fast path for this engine (the reference's
    * in-RAM tables ≈ columnar parquet + tungsten).
    */
  def freadParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
  def fwriteParquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** JSON-lines reader — the de-facto interchange format of LLM training
    * corpora (one JSON object per line; no reference analog, extension
    * surface like freadParquet). Spark's native json source: schema
    * inference is a separate sampling pass over the data, so at 100 TB
    * ALWAYS pass `schema` (or `sampleRatio` < 1 to bound the inference
    * scan); splittable per-line parallelism either way. Corrupt lines
    * land in `_corrupt_record` instead of failing the job (mode
    * PERMISSIVE) unless `failFast`.
    */
  def freadJsonl(spark: SparkSession, path: String,
                 schema: Option[StructType] = None,
                 sampleRatio: Double = 1.0,
                 failFast: Boolean = false): DataFrame = {
    var r = spark.read
      .option("mode", if (failFast) "FAILFAST" else "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
    schema match {
      case Some(s) => r = r.schema(s)
      case None    => r = r.option("samplingRatio", sampleRatio)
    }
    r.json(path)
  }

  /** JSON-lines writer (one object per line, gzip optional — line-split
    * JSONL stays splittable uncompressed; gzip trades that for bytes).
    * `ignoreNulls=false` keeps explicit nulls so round-trips preserve
    * schema on readers that infer from the first lines.
    */
  def fwriteJsonl(df: DataFrame, path: String, compress: String = "none",
                  ignoreNulls: Boolean = false): Unit = {
    var w = df.write.mode(SaveMode.Overwrite)
      .option("ignoreNullFields", ignoreNulls)
    if (compress == "gzip") w = w.option("compression", "gzip")
    w.json(path)
  }
}
