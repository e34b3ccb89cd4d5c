package graft.core

import scala.io.Source

/** Typed view of the reference's deployment config
  * (config_template.yaml): MySQL source, Kafka transport, object store +
  * medallion buckets, Spark master. Everything is optional except the
  * Spark block defaults — a local run needs none of it.
  */
final case class MysqlConfig(
    host: String, port: Int, database: String, user: String, password: String) {
  /** JDBC url for `Sources.jdbc` (driver jar supplied by the deployment). */
  def jdbcUrl: String = s"jdbc:mysql://$host:$port/$database"
}

final case class KafkaConfig(bootstrapServers: Seq[String], topics: Seq[String]) {
  def bootstrap: String = bootstrapServers.mkString(",")
}

/** Medallion layer buckets (config_template.yaml:37-41). A value that
  * carries a scheme (`s3a://…`, `file:/…`) or any `/` (an absolute or
  * relative PATH — bucket names cannot contain slashes) is used
  * verbatim, so a local deployment (or a spec fixture) points the same
  * config keys at directories; only a bare slash-free name is treated
  * as an object store bucket. */
final case class Buckets(bronze: String, silver: String, gold: String) {
  // a URI scheme is `name:` — single-slash forms like `file:/x` are
  // valid and must pass through (matching the doc above), so detect the
  // scheme prefix itself, not the `://` idiom
  private def uri(b: String): String =
    if (b.matches("^[A-Za-z][A-Za-z0-9+.-]*:.*") || b.contains("/")) b
    else s"s3a://$b"
  def bronzeUri: String = uri(bronze)
  def silverUri: String = uri(silver)
  def goldUri: String = uri(gold)
}

final case class GraftConfig(
    mysql: Option[MysqlConfig],
    kafka: Option[KafkaConfig],
    objectStore: Option[ObjectStoreConfig],
    buckets: Option[Buckets],
    sparkMaster: String,
    appName: String)

/** Loader for the reference's YAML layout. Parses the small YAML subset
  * the template actually uses — nested maps by 2-space indentation,
  * scalar values, `- item` lists, `#` comments — with zero dependencies
  * (no YAML jar in this container, and the subset keeps the loader
  * honest about what it supports).
  */
object GraftConfig {

  def fromYaml(path: String): GraftConfig = {
    val src = Source.fromFile(path)
    val text = try src.mkString finally src.close()
    fromYamlString(text)
  }

  def fromYamlString(text: String): GraftConfig = {
    val root = YamlLite.parse(text)
    def section(name: String): Map[String, YamlLite.Y] = root.get(name) match {
      case Some(YamlLite.YMap(m)) => m
      case _ => Map.empty
    }
    def str(m: Map[String, YamlLite.Y], k: String): Option[String] =
      m.get(k).collect { case YamlLite.YStr(s) => s }
    def list(m: Map[String, YamlLite.Y], k: String): Seq[String] =
      m.get(k) match { case Some(YamlLite.YList(xs)) => xs; case _ => Nil }

    val my = section("mysql")
    val mysql = for {
      host <- str(my, "host"); db <- str(my, "database")
      user <- str(my, "user"); pw <- str(my, "password")
    } yield MysqlConfig(host, str(my, "port").map(_.toInt).getOrElse(3306), db, user, pw)

    val kf = section("kafka")
    val kafka =
      if (kf.isEmpty) None
      else Some(KafkaConfig(list(kf, "bootstrap_servers"), list(kf, "topics")))

    val s3 = section("s3")
    val store = for {
      ep <- str(s3, "endpoint_url"); ak <- str(s3, "access_key"); sk <- str(s3, "secret_key")
    } yield ObjectStoreConfig(ep, ak, sk)
    val bkts = s3.get("buckets") match {
      case Some(YamlLite.YMap(b)) =>
        for {
          br <- str(b, "bronze"); si <- str(b, "silver"); go <- str(b, "gold")
        } yield Buckets(br, si, go)
      case _ => None
    }

    val sp = section("spark")
    GraftConfig(
      mysql, kafka, store, bkts,
      sparkMaster = str(sp, "master_url").getOrElse("local[*]"),
      appName = str(sp, "app_name").getOrElse("graft"))
  }
}

/** Indentation-based parser for the YAML subset above. NOT a general YAML
  * parser: no anchors, no multi-line scalars, no nested lists, no flow
  * style — parsing fails loudly rather than guessing.
  */
private[core] object YamlLite {
  sealed trait Y
  final case class YStr(s: String) extends Y
  final case class YMap(m: Map[String, Y]) extends Y
  final case class YList(xs: Seq[String]) extends Y

  def parse(text: String): Map[String, Y] = {
    // drop whole-line comments/blanks; keep (indent, content). Inline
    // comments are handled in `scalar`, where quoting is visible.
    val lines = text.linesIterator
      .filter(l => l.trim.nonEmpty && !l.trim.startsWith("#"))
      .map { l => (l.takeWhile(_ == ' ').length, l.trim) }
      .toVector
    parseMap(lines, 0)._1
  }

  /** Scalar value of a raw `key:` tail: a single- or double-quoted value
    * keeps its content verbatim (the YAML-standard way to carry " #" or
    * leading/trailing spaces — e.g. a password), with the standard
    * escapes — `''` inside single quotes, and the YAML double-quote
    * escapes `\"` `\\` `\/` `\n` `\t` `\r` `\0` (translated, not copied
    * verbatim) — so values CONTAINING quote characters or control
    * characters are expressible. An UNKNOWN escape fails loudly: a
    * password carrying a real `\x` sequence must never be silently
    * corrupted into the letter `x`. An unquoted value ends at the first
    * " #" (inline comment), exactly as real YAML plain scalars do.
    * Malformed quoting fails loudly rather than truncating. */
  private[core] def scalar(raw: String): String = {
    val v = raw.trim
    if (v.nonEmpty && (v.head == '"' || v.head == '\'')) {
      val q = v.head
      val out = new StringBuilder
      var i = 1
      var closed = false
      while (i < v.length && !closed) {
        val c = v.charAt(i)
        if (q == '\'' && c == '\'' && i + 1 < v.length && v.charAt(i + 1) == '\'') {
          out += '\''; i += 2 // YAML '' → literal single quote
        } else if (q == '"' && c == '\\' && i + 1 < v.length) {
          out += (v.charAt(i + 1) match {
            case '"'  => '"'
            case '\\' => '\\'
            case '/'  => '/'
            case 'n'  => '\n'
            case 't'  => '\t'
            case 'r'  => '\r'
            case '0'  => '\u0000'
            case other => throw new IllegalArgumentException(
              s"unsupported escape \\$other in double-quoted value: $raw " +
                "(supported: \\\" \\\\ \\/ \\n \\t \\r \\0)")
          })
          i += 2
        } else if (c == q) { closed = true; i += 1 }
        else { out += c; i += 1 }
      }
      require(closed, s"unterminated quote in value: $raw")
      val tail = v.substring(i).trim
      require(tail.isEmpty || tail.startsWith("#"),
        s"trailing content after closing quote in value: $raw")
      out.toString
    } else v.indexOf(" #") match {
      case -1 => v
      case i  => v.substring(0, i).trim
    }
  }

  /** Parse a map at `indent` starting at lines(0); returns (map, consumed). */
  private def parseMap(lines: Vector[(Int, String)], indent: Int): (Map[String, Y], Int) = {
    var i = 0
    val out = Map.newBuilder[String, Y]
    while (i < lines.length && lines(i)._1 >= indent) {
      val (ind, content) = lines(i)
      require(ind == indent, s"unexpected indent $ind (wanted $indent) at: $content")
      require(content.contains(":"), s"expected 'key: value' at: $content")
      val key = content.takeWhile(_ != ':').trim
      val rawValue = content.dropWhile(_ != ':').drop(1).trim
      // value position holds only a comment (or nothing) → block/empty;
      // otherwise a scalar (possibly quoted — `scalar` handles comments)
      if (rawValue.nonEmpty && !rawValue.startsWith("#")) { // inline scalar
        out += key -> YStr(scalar(rawValue))
        i += 1
      } else { // nested block: list or map
        val rest = lines.drop(i + 1)
        if (rest.headOption.exists { case (ri, rc) => ri > indent && rc.startsWith("- ") }) {
          val childIndent = rest.head._1
          val items = rest.takeWhile { case (ri, rc) => ri == childIndent && rc.startsWith("- ") }
          out += key -> YList(items.map(it => scalar(it._2.drop(2))))
          i += 1 + items.length
        } else if (rest.headOption.exists(_._1 > indent)) {
          val childIndent = rest.head._1
          val child = rest.takeWhile(_._1 >= childIndent)
          val (m, consumed) = parseMap(child, childIndent)
          out += key -> YMap(m)
          i += 1 + consumed
        } else { // empty value
          out += key -> YStr("")
          i += 1
        }
      }
    }
    (out.result(), i)
  }
}
