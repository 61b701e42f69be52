package graft.sql

import java.sql.DriverManager

import org.apache.spark.sql.{DataFrame, SparkSession}

/** CREATE/DROP FOREIGN SCHEMA (ref: server/src/main/java/org/apache/
  * calcite/sql/ddl/SqlCreateForeignSchema.java + server/src/test/
  * resources/sql/schema.iq:60-170): binds an external store into the
  * catalog. Spark-native mapping: the schema lands as a session-catalog
  * DATABASE and each remote table as a `USING jdbc` table inside it, so
  * ordinary queries (`SELECT ... FROM scott.dept`) read through Spark's
  * JDBC source — with predicate pushdown into the remote store — the
  * reference's JdbcSchema adapter shape re-expressed on DSv1 jdbc.
  *
  *   - TYPE 'jdbc' + OPTIONS (jdbcUrl, jdbcSchema, jdbcUser,
  *     jdbcPassword): remote tables are discovered via JDBC
  *     DatabaseMetaData at create time (the reference resolves names
  *     lazily; eager registration keeps the catalog surface plain
  *     Spark, and a re-CREATE refreshes the listing).
  *   - TYPE 'map' / 'custom': an empty database (the reference's MAP
  *     schema starts empty).
  *   - LIBRARY 'cls': the factory class must exist on the classpath —
  *     the reference's not-found contract — then binds an empty schema
  *     (factory invocation protocols are engine-specific).
  *   - TYPE and LIBRARY are mutually exclusive, and one is required
  *     (SqlCreateForeignSchema's parse contract).
  *
  * At scale the JDBC tables behave like any Spark JDBC source:
  * per-table parallel reads via partitionColumn options are available
  * on the underlying source, and subtree pushdown (sql/Unparser.scala)
  * applies unchanged.
  */
object ForeignSchemaSql {

  private val createRe =
    "(?is)^create\\s+(?:or\\s+replace\\s+)?foreign\\s+schema\\s+(?:if\\s+not\\s+exists\\s+)?([\\w.`\"]+)\\s*(.*)$".r
  private val dropRe =
    "(?is)^drop\\s+foreign\\s+schema\\s+(if\\s+exists\\s+)?([\\w.`\"]+)\\s*$".r
  // option VALUES use the SQL-standard doubled-quote escape ('' = one
  // quote inside the literal) — [^']* alone would mis-split a password
  // like 'o''brien' and resume parsing inside the remainder
  private val typeRe = "(?is)\\btype\\s+'((?:[^']|'')*)'".r
  private val libRe = "(?is)\\blibrary\\s+'((?:[^']|'')*)'".r
  private val optPairRe = "[`\"]?(\\w+)[`\"]?\\s+'((?:[^']|'')*)'".r
  private def unq(v: String) = v.replace("''", "'")

  private def bare(n: String) = n.replaceAll("[`\"]", "").split('.').last

  /** Names created by CREATE FOREIGN SCHEMA this session: DROP FOREIGN
    * SCHEMA may only tear down schemas THIS statement family created —
    * a regular database that merely shares the name (e.g. one holding
    * managed tables) must not be cascade-dropped by the foreign-schema
    * surface. Foreign-ness also persists in the database's properties
    * (DBPROPERTIES), so a foreign schema created before a JVM restart
    * stays droppable through this surface. CREATE refuses a name an
    * ordinary database already holds (the collision is the same
    * data-loss hazard from the other direction). A database dropped
    * out-of-band and recreated as a regular one under a stale marker
    * remains the user's own bypass of this surface. */
  private val created = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private val foreignProp = "graft.foreign"

  private def hasForeignProp(spark: SparkSession, name: String): Boolean =
    try spark.sql(s"DESCRIBE DATABASE EXTENDED $name").collect().exists(r =>
      r.getString(0) == "Properties" && r.getString(1).contains(foreignProp))
    catch { case _: Exception => false }

  private def isForeignSchema(spark: SparkSession, name: String): Boolean = {
    val n = name.toLowerCase(java.util.Locale.ROOT)
    created.contains(n) || hasForeignProp(spark, name)
  }

  /** CREATE DATABASE for a foreign schema: refuses to adopt an existing
    * NON-foreign database, and stamps foreign-ness into DBPROPERTIES. */
  private def createDb(spark: SparkSession, name: String): DataFrame = {
    if (spark.catalog.databaseExists(name) && !isForeignSchema(spark, name))
      throw new IllegalArgumentException(
        s"Schema '${name.toUpperCase(java.util.Locale.ROOT)}' already exists " +
          "and is not a foreign schema")
    spark.sql(
      s"CREATE DATABASE IF NOT EXISTS $name WITH DBPROPERTIES ('$foreignProp'='true')")
  }

  def maybeRun(spark: SparkSession, text0: String): Option[DataFrame] = {
    val text = text0.trim.stripSuffix(";")
    text match {
      case dropRe(ifExists, name0) =>
        val name = bare(name0)
        val isForeign = isForeignSchema(spark, name)
        if (!isForeign && ifExists == null) {
          // distinguish the refusal (the DB exists but is not foreign —
          // e.g. a plain database, or one created before the DBPROPERTIES
          // marker existed; re-stamp via CREATE FOREIGN SCHEMA to migrate)
          // from a genuinely missing name
          if (spark.catalog.databaseExists(name))
            throw new IllegalArgumentException(
              s"Schema '${name.toUpperCase(java.util.Locale.ROOT)}' exists " +
                "but is not a foreign schema (DROP FOREIGN SCHEMA only drops " +
                "schemas created by CREATE FOREIGN SCHEMA)")
          throw new IllegalArgumentException(
            s"Schema '${name.toUpperCase(java.util.Locale.ROOT)}' not found")
        }
        if (isForeign) {
          created.remove(name.toLowerCase(java.util.Locale.ROOT))
          spark.sql(s"DROP DATABASE IF EXISTS $name CASCADE"): Unit
        }
        Some(spark.emptyDataFrame)
      case createRe(name0, body) =>
        Some(runCreate(spark, bare(name0), body.trim))
      case _ => None
    }
  }

  private def runCreate(spark: SparkSession, name: String,
      body: String): DataFrame = {
    val typ = typeRe.findFirstMatchIn(body).map(m => unq(m.group(1)))
    val lib = libRe.findFirstMatchIn(body).map(m => unq(m.group(1)))
    def mark(): Unit = { created.add(name.toLowerCase(java.util.Locale.ROOT)); () }
    (typ, lib) match {
      case (Some(_), Some(_)) =>
        throw new IllegalArgumentException(
          "Encountered \"library\": TYPE and LIBRARY are mutually exclusive")
      case (None, None) =>
        throw new IllegalArgumentException(
          "CREATE FOREIGN SCHEMA requires TYPE or LIBRARY")
      case (None, Some(cls)) =>
        try Class.forName(cls)
        catch {
          case _: ClassNotFoundException | _: NoClassDefFoundError =>
            throw new IllegalArgumentException(
              s"Property '$cls' not valid as '$cls' not found in the classpath")
        }
        val df = createDb(spark, name)
        mark(); df
      case (Some(t), None) => t.toLowerCase(java.util.Locale.ROOT) match {
        case "map" | "custom" =>
          val df = createDb(spark, name)
          mark(); df
        case "jdbc" =>
          val opts = optPairRe.findAllMatchIn(
            // strip the leading "type 'jdbc'" so it is not read as a pair
            typeRe.replaceFirstIn(body, ""))
            .map(m => m.group(1) -> unq(m.group(2))).toMap
          val df = registerJdbc(spark, name, opts)
          mark(); df
        case other =>
          throw new IllegalArgumentException(
            s"Invalid schema type '$other'; valid values: [MAP, JDBC, CUSTOM]")
      }
    }
  }

  /** Discover the remote schema's tables and register each as a Spark
    * `USING jdbc` table under database `name`. */
  private def registerJdbc(spark: SparkSession, name: String,
      opts: Map[String, String]): DataFrame = {
    val url = opts.getOrElse("jdbcUrl",
      throw new IllegalArgumentException("jdbc foreign schema requires jdbcUrl"))
    val schema = opts.get("jdbcSchema")
    val user = opts.get("jdbcUser")
    val password = opts.get("jdbcPassword")
    val props = new java.util.Properties()
    user.foreach(props.setProperty("user", _))
    password.foreach(props.setProperty("password", _))
    val conn = DriverManager.getConnection(url, props)
    val tables =
      try {
        // the schema pattern is passed AS GIVEN: JDBC metadata patterns
        // are case-sensitive, and stores disagree on folding (Derby/
        // HSQLDB fold up, PostgreSQL folds down) — the user writes the
        // store's spelling, as the reference's JdbcSchema options do
        val rs = conn.getMetaData.getTables(null, schema.orNull, "%",
          Array("TABLE"))
        val b = Seq.newBuilder[String]
        while (rs.next()) b += rs.getString("TABLE_NAME")
        rs.close()
        b.result()
      } finally conn.close()
    // option values land inside single-quoted SQL literals: escape
    // quote/backslash so a password like o'brien cannot break out of
    // (or inject into) the OPTIONS list
    def esc(v: String) = v.replace("\\", "\\\\").replace("'", "\\'")
    createDb(spark, name)
    tables.foreach { t =>
      val dbtable = schema.map(s => s"$s.$t").getOrElse(t)
      val optStr = (Seq(s"url '${esc(url)}'", s"dbtable '${esc(dbtable)}'") ++
        user.map(u => s"user '${esc(u)}'") ++
        password.map(p => s"password '${esc(p)}'")).mkString(", ")
      val tbl = s"$name.${t.toLowerCase(java.util.Locale.ROOT)}"
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      spark.sql(s"CREATE TABLE $tbl USING org.apache.spark.sql.jdbc OPTIONS ($optStr)"): Unit
    }
    spark.emptyDataFrame
  }
}
