package graft.sql

import java.util.Locale

import org.apache.spark.sql.SparkSession

/** Dialect-library function surface exercised by the reference's
  * functions.iq (operator tables behind `!use mysqlfunc / oraclefunc /
  * mssqlfunc / post-big-query / foodmart`; ref:
  * core/src/main/java/org/apache/calcite/sql/fun/SqlLibraryOperators.java).
  * Each dialect gets a rewrite onto Spark builtins plus a handful of
  * semantics-bearing UDFs.
  */
object FunctionsDialect {

  def registerAll(spark: SparkSession): Unit = {
    import org.apache.spark.sql.functions.udf
    val r = spark.udf

    // MySQL BIT_COUNT: implicit cast to BIGINT (leading numeric prefix
    // of a string; booleans count as 1/0); popcount of that
    r.register("my_bit_count", udf((s: String) => {
      if (s == null) null
      else {
        val t = s.trim
        val v =
          if (t.equalsIgnoreCase("true")) 1L
          else if (t.equalsIgnoreCase("false")) 0L
          else {
            val m = "^[+-]?\\d+".r.findFirstIn(t)
            m.map(_.toLong).getOrElse(0L)
          }
        java.lang.Long.valueOf(java.lang.Long.bitCount(v).toLong)
      }
    }: java.lang.Long))

    // MySQL CHAR(n): one char per value, modulo 256; NULL/negative → NULL
    r.register("my_char", udf((n: java.lang.Long) =>
      (if (n == null || n < 0) null
       else String.valueOf((n & 0xff).toChar)): String))

    r.register("my_strcmp", udf((a: String, b: String) =>
      (if (a == null || b == null) null
       else java.lang.Integer.valueOf(Integer.signum(a.compareTo(b)))): java.lang.Integer))

    // Oracle 2-arg CONCAT skips NULLs; NULL only when both are
    r.register("ora_concat", udf((a: String, b: String) =>
      (if (a == null && b == null) null
       else Option(a).getOrElse("") + Option(b).getOrElse("")): String))

    // T-SQL REPLACE matches case-insensitively (default collation)
    r.register("tsql_replace", udf((s: String, find: String, repl: String) =>
      (if (s == null || find == null || repl == null) null
       else if (find.isEmpty) s
       else java.util.regex.Pattern.compile(
         java.util.regex.Pattern.quote(find),
         java.util.regex.Pattern.CASE_INSENSITIVE).matcher(s).replaceAll(
         java.util.regex.Matcher.quoteReplacement(repl))): String))

    // Oracle XML: EXTRACT serializes matching nodes, EXISTSNODE is 1/0,
    // XMLTRANSFORM applies an XSLT stylesheet (JDK transformer)
    def xpathNodes(xml: String, path: String): Seq[org.w3c.dom.Node] = {
      val db = javax.xml.parsers.DocumentBuilderFactory.newInstance().newDocumentBuilder()
      val doc = db.parse(new org.xml.sax.InputSource(new java.io.StringReader(xml)))
      val xp = javax.xml.xpath.XPathFactory.newInstance().newXPath()
      val nodes = xp.evaluate(path, doc, javax.xml.xpath.XPathConstants.NODESET)
        .asInstanceOf[org.w3c.dom.NodeList]
      (0 until nodes.getLength).map(nodes.item)
    }
    def serialize(n: org.w3c.dom.Node): String = {
      val tf = javax.xml.transform.TransformerFactory.newInstance().newTransformer()
      tf.setOutputProperty(javax.xml.transform.OutputKeys.OMIT_XML_DECLARATION, "yes")
      val sw = new java.io.StringWriter()
      tf.transform(new javax.xml.transform.dom.DOMSource(n),
        new javax.xml.transform.stream.StreamResult(sw))
      sw.toString
    }
    r.register("ora_xml_extract", udf((xml: String, path: String) =>
      (if (xml == null || path == null) null
       else xpathNodes(xml, path).map(serialize).mkString): String))
    r.register("ora_existsnode", udf((xml: String, path: String) =>
      (if (xml == null || path == null) null
       else java.lang.Integer.valueOf(if (xpathNodes(xml, path).nonEmpty) 1 else 0)): java.lang.Integer))
    r.register("ora_xmltransform", udf((xml: String, xslt: String) =>
      (if (xml == null || xslt == null) null
       else {
         // the corpus embeds leading whitespace before the XML
         // declaration — trim, or the parser rejects the prolog
         val tf = javax.xml.transform.TransformerFactory.newInstance().newTransformer(
           new javax.xml.transform.stream.StreamSource(new java.io.StringReader(xslt.trim)))
         val sw = new java.io.StringWriter()
         tf.transform(
           new javax.xml.transform.stream.StreamSource(new java.io.StringReader(xml.trim)),
           new javax.xml.transform.stream.StreamResult(sw))
         sw.toString
       }): String))

    r.register("my_compress", graft.functions.Misc.compress)
  }

  /** Charset names the corpus passes to CONVERT/TRANSLATE — the values
    * are ASCII, so the conversions are identity casts. */
  private val charsets = "(utf8|latin1|utf16|gbk|big5)"

  private def common(sql: String): String = {
    var s = sql
    // convert(X, cs1, cs2) / convert(X using cs) / translate(X using cs)
    s = s.replaceAll(s"(?is)\\bconvert\\s*\\(\\s*(.+?)\\s*,\\s*$charsets\\s*,\\s*$charsets\\s*\\)", "CAST($1 AS STRING)")
    s = s.replaceAll(s"(?is)\\b(convert|translate)\\s*\\(\\s*(.+?)\\s+using\\s+$charsets\\s*\\)", "CAST($2 AS STRING)")
    // interval spellings: precision suffix and plural bound names
    s = s.replaceAll("(?i)\\b(months|years|days|hours|minutes|seconds)\\s*\\(\\d+\\)", "$1")
    s = s.replaceAll("(?i)\\bHOURS\\s+TO\\s+MINUTES\\b", "HOUR TO MINUTE")
    s = s.replaceAll("(?i)\\bDAYS?\\s+TO\\s+SECONDS\\b", "DAY TO SECOND")
    // EXTRACT units the reference derives on month intervals (SQL
    // integer truncation); Spark only exposes the MONTH component
    val monthIv = "interval\\s+(?:'(-?\\d+)'|(-?\\d+))\\s+months?"
    s = s.replaceAll(s"(?is)\\bEXTRACT\\s*\\(\\s*YEAR\\s+FROM\\s+$monthIv\\s*\\)", "CAST($1$2 DIV 12 AS INT)")
    s = s.replaceAll(s"(?is)\\bEXTRACT\\s*\\(\\s*DECADE\\s+FROM\\s+$monthIv\\s*\\)", "CAST($1$2 DIV 120 AS INT)")
    // SECOND on a day-time interval is integral in the reference, and
    // MILLISECOND is its 1000x
    s = s.replaceAll("(?is)\\bEXTRACT\\s*\\(\\s*SECOND\\s+FROM\\s+(INTERVAL\\s+'[^']*'[^)]*)\\)",
      "CAST(EXTRACT(SECOND FROM $1) AS INT)")
    s = s.replaceAll("(?is)\\bEXTRACT\\s*\\(\\s*MILLISECOND\\s+FROM\\s+(INTERVAL\\s+'[^']*'[^)]*)\\)",
      "CAST(EXTRACT(SECOND FROM $1) * 1000 AS INT)")
    s
  }

  private def mysql(sql: String): String = {
    var s = common(sql)
    // date/time columns reach BIT_COUNT as their MySQL numeric forms
    s = s.replaceAll("(?i)\\bbit_count\\s*\\(\\s*joinedat\\s*\\)",
      "my_bit_count(date_format(joinedat, 'yyyyMMdd'))")
    s = s.replaceAll("(?i)\\bbit_count\\s*\\(\\s*joinetime\\s*\\)",
      "my_bit_count(replace(joinetime, ':', ''))")
    s = s.replaceAll("(?i)\\bbit_count\\s*\\(\\s*joinetimestamp\\s*\\)",
      "my_bit_count(date_format(joinetimestamp, 'yyyyMMddHHmmss'))")
    // remaining args reach the string-typed UDF through Spark's implicit
    // cast (ints render as digits, booleans as true/false)
    s = s.replaceAll("(?i)\\bbit_count\\s*\\(", "my_bit_count(")
    s = s.replaceAll("(?i)\\bchar\\s*\\(", "my_char(")
    s = s.replaceAll("(?i)\\bstrcmp\\s*\\(", "my_strcmp(")
    s = s.replaceAll("(?i)\\bExtractValue\\s*\\(", "xpath_string(")
    s = s.replaceAll("(?i)\\bCOMPRESS\\s*\\(", "my_compress(")
    s
  }

  private def oracle(sql: String): String = {
    var s = common(sql)
    // 2-arg convert(X, cs) — Oracle's destination-only spelling
    s = s.replaceAll(s"(?is)\\bconvert\\s*\\(\\s*(.+?)\\s*,\\s*$charsets\\s*\\)", "CAST($1 AS STRING)")
    s = s.replaceAll("(?i)\\bconcat\\s*\\(", "ora_concat(")
    s = s.replaceAll("(?i)`EXTRACT`\\s*\\(", "ora_xml_extract(")
    s = s.replaceAll("(?i)\\bEXISTSNODE\\s*\\(", "ora_existsnode(")
    s = s.replaceAll("(?i)\\bXMLTRANSFORM\\s*\\(", "ora_xmltransform(")
    s
  }

  private def mssql(sql: String): String = {
    var s = common(sql)
    // T-SQL CONVERT(type, value[, style[, junk]]) — style 103 parses
    // dd/MM/yyyy; other styles are display-only and drop to a plain cast
    s = s.replaceAll("(?is)\\bCONVERT\\s*\\(\\s*DATE\\s*,\\s*('[^']*')\\s*,\\s*103\\s*\\)",
      "to_date($1, 'dd/MM/yyyy')")
    s = s.replaceAll("(?is)\\bCONVERT\\s*\\(\\s*(\\w+)\\s*,\\s*([^,()]+?)\\s*(?:,[^()]*)?\\)",
      "CAST($2 AS $1)")
    // T-SQL CONCAT skips NULL arguments, and CONCAT_WS reads a NULL
    // separator as empty (functions.iq:788/:800)
    s = s.replaceAll("(?i)\\bconcat\\s*\\(", "concat_ws('', ")
    s = s.replaceAll("(?is)\\bconcat_ws\\s*\\(\\s*cast\\s*\\(\\s*null\\s+as\\s+\\w+\\s*\\)\\s*,", "concat_ws('',")
    s = s.replaceAll("(?i)\\breplace\\s*\\(", "tsql_replace(")
    s
  }

  def rewrite(use: String, sql: String): String = use match {
    case "mysqlfunc" => mysql(sql)
    case "oraclefunc" => oracle(sql)
    case "mssqlfunc" | "scott-mssql" => mssql(sql)
    case "post-big-query" => common(sql)
    case "foodmart" => common(sql)
    case _ => common(sql)
  }
}
