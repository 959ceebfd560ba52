package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** fread / fwrite parity surface (SURVEY.md §2.1).
  *
  * The reference's fread (src/fread.c) is a single-node parallel CSV
  * parser with auto-detection; here detection maps to Spark's
  * sampling-based schema inference plus a tiny driver-side sep sniff of
  * the first KB (the distributed parse itself is spark.read.csv —
  * chunk-parallel across the cluster, the 1000-executor analog of
  * fread's per-thread chunks). Type "bumping" (fread.c:126) maps to
  * PERMISSIVE mode + corrupt-record capture rather than a re-read.
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
      dec: String = ".",
      encoding: String = "UTF-8",
      tz: String = "UTC",
      multiLine: Boolean = false,       // quoted fields w/ embedded newlines
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
    var r = spark.read
      .option("sep", sep)
      .option("quote", opts.quote)
      // Spark CSV supports ONE null token: prefer the first NON-empty
      // na.string ('' parses as null for non-string types regardless)
      .option("nullValue", opts.naStrings.find(_.nonEmpty).getOrElse(""))
      .option("encoding", opts.encoding)
      .option("timeZone", opts.tz)
      .option("mode", "PERMISSIVE")
      .option("multiLine", opts.multiLine)
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
    if (opts.select.nonEmpty)
      df = df.select(opts.select.map(df.col): _*)
    if (opts.drop.nonEmpty)
      df = df.drop(opts.drop: _*)
    opts.nrows match {
      case Some(n) => df.limit(n.toInt)
      case None    => df
    }
  }

  final case class FwriteOptions(
      sep: String = ",",
      quote: String = "\"",
      na: String = "",
      header: Boolean = true,
      compress: String = "none",        // none|gzip (reference compress=)
      dateTimeAs: String = "ISO")       // ISO is Spark's default format

  /** fwrite(x, file): distributed CSV write — partitioned output is the
    * cluster analog of the reference's per-thread buffers
    * (src/fwrite.c buffMB).
    */
  def fwrite(df: DataFrame, path: String,
             opts: FwriteOptions = FwriteOptions()): Unit = {
    var w = df.write.mode(SaveMode.Overwrite)
      .option("sep", opts.sep)
      .option("quote", opts.quote)
      .option("nullValue", opts.na)
      .option("header", opts.header)
    if (opts.compress == "gzip") w = w.option("compression", "gzip")
    w.csv(path)
  }

  /** Parquet is the native fast path for this engine (the reference's
    * in-RAM tables ≈ columnar parquet + tungsten).
    */
  def freadParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
  def fwriteParquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)
}
