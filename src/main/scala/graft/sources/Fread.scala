package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DateType, StringType, StructType, TimestampType}

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
      fill: Boolean = false,            // ragged rows → nulls
      quote: String = "\"",
      escape: String = "\"",           // RFC4180 doubled-quote escaping
                                        // (Spark's default is backslash)
      dec: String = ".",                // decimal separator (dec="," parity)
      encoding: String = "UTF-8",
      tz: String = "UTC",
      multiLine: Boolean = false,       // quoted fields w/ embedded newlines
      // univocity's recovery mode for quotes inside quoted fields —
      // STOP_AT_CLOSING_QUOTE mirrors fread's quote-rule fallback
      // (src/fread.c quoteRule 1-3) closest for `a,"he said:"hi."",b`
      unescapedQuoteHandling: String = "STOP_AT_CLOSING_QUOTE",
      compression: String = "auto")     // gz/bz2 handled by codec auto-detect

  /** First non-empty line after `skip` (driver-side, one small read —
    * shared by separator sniffing and header detection so the file head
    * is fetched once).
    */
  def firstLine(spark: SparkSession, path: String, skip: Int = 0): String = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val target =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
          .head.getPath
      else p
    val in = fs.open(target)
    val buf = new Array[Byte](65536)
    val n = in.read(buf); in.close()
    val text = new String(buf, 0, math.max(n, 0), "UTF-8")
    text.linesIterator.drop(skip).find(_.nonEmpty).getOrElse("")
  }

  /** Auto separator detection over a pre-fetched first line. */
  def sniffSepFrom(line: String): String =
    Seq("\t", ";", "|", ",").maxBy(s => line.count(_.toString == s))

  def sniffSep(spark: SparkSession, path: String, skip: Int = 0): String =
    sniffSepFrom(firstLine(spark, path, skip))

  /** fread(file): distributed CSV read with data.table-flavored options. */
  def fread(spark: SparkSession, path: String,
            opts: FreadOptions = FreadOptions()): DataFrame = {
    lazy val line1 = firstLine(spark, path, opts.skip)   // fetched at most once
    val sep = if (opts.sep == "auto") sniffSepFrom(line1) else opts.sep
    require(opts.dec == "." || opts.dec != sep,
      s"dec='${opts.dec}' cannot equal sep='$sep'")
    var r = spark.read
      .option("sep", sep)
      .option("quote", opts.quote)
      .option("escape", opts.escape)
      // Spark CSV supports ONE null token: prefer the first NON-empty
      // na.string ('' parses as null for non-string types regardless);
      // remaining tokens are nulled by the post-parse pass below
      .option("nullValue", opts.naStrings.find(_.nonEmpty).getOrElse(""))
      .option("encoding", opts.encoding)
      .option("timeZone", opts.tz)
      .option("mode", "PERMISSIVE")
      .option("multiLine", opts.multiLine)
      .option("unescapedQuoteHandling", opts.unescapedQuoteHandling)
      .option("columnNameOfCorruptRecord", "_corrupt_record")
    val hasHeader = opts.header match {
      case "true"  => true
      case "false" => false
      case _ =>      // auto: header iff NO first-line field parses numeric
        val fields = line1.split(java.util.regex.Pattern.quote(sep), -1)
        def unquote(f: String) =
          f.trim.stripPrefix(opts.quote).stripSuffix(opts.quote).trim
        !fields.exists(f => scala.util.Try(unquote(f).toDouble).isSuccess)
    }
    r = r.option("header", hasHeader)
    r = opts.colClasses match {
      case Some(schema) => r.schema(schema)
      case None         => r.option("inferSchema", true)
    }
    if (opts.fill) r = r.option("mode", "PERMISSIVE")
    // skip= has no Spark CSV option: drop the first N physical lines via
    // a text pre-pass (zipWithIndex follows file order), then parse the
    // remaining lines as CSV.
    var df =
      if (opts.skip > 0) {
        val lines = spark.read.textFile(path).rdd.zipWithIndex()
          .filter(_._2 >= opts.skip).map(_._1)
        r.csv(spark.createDataset(lines)(org.apache.spark.sql.Encoders.STRING))
      } else r.csv(path)
    // a UTF-8 BOM survives as part of the first column name — strip it
    // (fread strips BOMs, src/fread.c:1071)
    if (df.columns.nonEmpty && df.columns.head.startsWith("\uFEFF"))
      df = df.withColumnRenamed(df.columns.head, df.columns.head.substring(1))
    df = applyExtraNaAndRebump(df, opts)
    if (opts.select.nonEmpty)
      df = df.select(opts.select.map(df.col): _*)
    if (opts.drop.nonEmpty)
      df = df.drop(opts.drop: _*)
    opts.nrows match {
      case Some(n) => df.limit(n.toInt)
      case None    => df
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
  private def applyExtraNaAndRebump(df0: DataFrame, opts: FreadOptions): DataFrame = {
    val primary = opts.naStrings.find(_.nonEmpty).getOrElse("")
    val extra = opts.naStrings.filter(t => t.nonEmpty && t != primary).distinct
    val needDec = opts.dec != "."
    if (extra.isEmpty && !needDec) return df0
    var df = df0
    def strCols = df.schema.fields.filter(_.dataType == StringType).map(_.name).toSeq
    if (extra.nonEmpty)
      df = strCols.foldLeft(df)((d, c) =>
        d.withColumn(c, when(col(c).isin(extra: _*), lit(null)).otherwise(col(c))))
    // an explicit colClasses schema PINS every column's type — the user
    // said StringType on purpose (zip codes, ids with leading zeros), so
    // only infer-schema reads are eligible for the numeric re-bump
    val candidates = if (opts.colClasses.isDefined) Seq.empty[String] else strCols
    if (candidates.nonEmpty) {
      def decFixed(c: String): String = {
        val q = s"`$c`"
        if (needDec) s"replace($q, '${opts.dec}', '.')" else q
      }
      val checks = candidates.flatMap(c => Seq(
        expr(s"count(`$c`)").as(s"n_$c"),
        // try_cast, not cast: ANSI mode throws on non-numeric strings
        expr(s"count(try_cast(${decFixed(c)} AS DOUBLE))").as(s"d_$c"),
        expr(s"count(CASE WHEN ${decFixed(c)} RLIKE '^-?[0-9]+$$' THEN 1 END)").as(s"i_$c")))
      val row = df.agg(checks.head, checks.tail: _*).head()
      candidates.foreach { c =>
        val n = row.getAs[Long](s"n_$c")
        val d = row.getAs[Long](s"d_$c")
        val i = row.getAs[Long](s"i_$c")
        if (n > 0 && d == n)
          df = df.withColumn(c,
            expr(s"try_cast(${decFixed(c)} AS ${if (i == n) "BIGINT" else "DOUBLE"})"))
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
      dateTimeAs: String = "ISO",       // ISO | squash | epoch (R/fwrite.R:1-17)
      sep2: String = "|",               // list/array column joiner (fwrite sep2)
      append: Boolean = false,          // fwrite(append=TRUE)
      bom: Boolean = false)             // fwrite(bom=TRUE)

  /** fwrite(x, file): distributed CSV write — partitioned output is the
    * cluster analog of the reference's per-thread buffers
    * (src/fwrite.c buffMB).
    */
  def fwrite(df0: DataFrame, path: String,
             opts: FwriteOptions = FwriteOptions()): Unit = {
    // BOM is a plaintext prefix: inside a gzip stream it corrupts the
    // file, and under append it would re-stamp earlier parts each run
    require(!(opts.bom && opts.compress == "gzip"),
      "fwrite: bom=TRUE cannot combine with compress=gzip")
    require(!(opts.bom && opts.append),
      "fwrite: bom=TRUE cannot combine with append=TRUE")
    var df = df0
    df0.schema.fields.foreach { f =>
      val c = col(f.name)
      f.dataType match {
        // list columns: sep2-joined inside the field (R/fwrite.R sep2)
        case _: ArrayType =>
          df = df.withColumn(f.name, concat_ws(opts.sep2, transform(c, _.cast("string"))))
        case TimestampType => opts.dateTimeAs match {
          case "squash" => df = df.withColumn(f.name, date_format(c, "yyyyMMddHHmmss"))
          case "epoch"  => df = df.withColumn(f.name, unix_seconds(c))
          case _        => ()
        }
        case DateType => opts.dateTimeAs match {
          case "squash" => df = df.withColumn(f.name, date_format(c, "yyyyMMdd"))
          case "epoch"  => df = df.withColumn(f.name, datediff(c, lit("1970-01-01").cast("date")))
          case _        => ()
        }
        case _ => ()
      }
    }
    var w = df.write.mode(if (opts.append) SaveMode.Append else SaveMode.Overwrite)
      .option("sep", opts.sep)
      .option("quote", opts.quote)
      .option("escape", opts.escape)
      .option("nullValue", opts.na)
      .option("header", opts.header)
    if (opts.compress == "gzip") w = w.option("compression", "gzip")
    w.csv(path)
    if (opts.bom) prependBom(df0.sparkSession, path)
  }

  /** fwrite(bom=TRUE): prepend EF BB BF to every part file (streamed
    * copy + rename — no driver-side buffering of file contents).
    */
  private def prependBom(spark: SparkSession, path: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(conf)
    fs.listStatus(dir).filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
      .foreach { f =>
        val tmp = new org.apache.hadoop.fs.Path(f.getPath.getParent, f.getPath.getName + ".bom")
        val out = fs.create(tmp, true)
        out.write(Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte))
        val in = fs.open(f.getPath)
        val buf = new Array[Byte](1 << 20)
        var n = in.read(buf)
        while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
        in.close(); out.close()
        fs.delete(f.getPath, false)
        fs.rename(tmp, f.getPath)
      }
  }

  /** Parquet is the native fast path for this engine (the reference's
    * in-RAM tables ≈ columnar parquet + tungsten).
    */
  def freadParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
  def fwriteParquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)
}
