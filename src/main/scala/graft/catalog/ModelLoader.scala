package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Schema/model loader — the engine's counterpart of Calcite's JSON model
  * (ref: model/JsonRoot.java:1, model/ModelHandler.java:1,
  * model/JsonTable.java / JsonSchema.java / JsonStream.java). A model
  * maps names to sources; loading it registers every table and view into
  * the session catalog, after which plain spark.sql sees the schema —
  * the same role CalciteSchema plays for the reference's JDBC path.
  *
  * Kept dependency-free (no JSON library in the offline build): the
  * model is a Scala structure; a file-based loader parses the same shape
  * from a minimal `name=format:path` properties format.
  */
final case class TableDef(
    name: String,
    format: String, // parquet | csv | json | kafka
    path: String,
    options: Map[String, String] = Map.empty,
    stream: Boolean = false)

final case class ViewDef(name: String, sql: String)

/** A lattice tile declared in the model (ref: model/JsonLattice.java
  * tiles + model/JsonMaterialization.java — the reference's model
  * declares materializations that MaterializationService registers at
  * connect time, so the first query already rewrites). */
final case class TileDef(
    name: String, table: String, keys: Seq[String],
    sums: Seq[String] = Nil, mins: Seq[String] = Nil, maxs: Seq[String] = Nil)

/** A referential constraint declared in the model (ref:
  * schema/Statistic.java getReferentialConstraints — the reference's
  * tables carry FK metadata the planner trusts; column pairs are a
  * LIST, rel/RelReferentialConstraint.java:45, so composite keys are
  * declarable). Positional pairs factCols(i) → dimKeys(i). */
final case class FkDef(
    factTable: String, factCols: Seq[String],
    dimTable: String, dimKeys: Seq[String])

/** A unique key declared in the model (ref: schema/Statistic.java
  * getKeys): `cols` are jointly unique in `table` — fuel for the
  * outer-join and aggregate removal rules. */
final case class UkDef(table: String, cols: Seq[String])

/** Table statistics declared in the model (ref: schema/Statistic.java
  * getRowCount + the NDV metadata of RelMdDistinctRowCount — the cost
  * numbers the reference's planner consults): row count and per-column
  * distinct counts, fuel for the eager-aggregation gate. */
final case class StatsDef(table: String, rows: Long, ndv: Map[String, Long])

final case class Model(
    name: String,
    tables: Seq[TableDef],
    views: Seq[ViewDef] = Seq.empty,
    tiles: Seq[TileDef] = Seq.empty,
    foreignKeys: Seq[FkDef] = Seq.empty,
    uniqueKeys: Seq[UkDef] = Seq.empty,
    stats: Seq[StatsDef] = Seq.empty)

object ModelLoader {

  /** Register every table and view of the model into the session
    * catalog; returns the loaded tables. Streaming tables register the
    * batch view under `name` (the STREAM variant is obtained via
    * graft.streaming.StreamOps.parquetStream — ref:
    * schema/StreamableTable.java's dual batch/stream surface). */
  def load(spark: SparkSession, model: Model): Map[String, DataFrame] = {
    val tables = model.tables.map { t =>
      val df = t.format match {
        case "csv" => spark.read.format("csv").options(t.options)
          .option("header", "true").option("inferSchema", "true").load(t.path)
        case "kafka" =>
          // the reference's kafka adapter consumes a live broker
          // (kafka/KafkaStreamTable.java); this environment has no
          // broker or client jars (offline — terminal deviation,
          // COVERAGE.md §kafka), so `kafka` model tables mount the
          // wire-schema-identical DSv2 log source. path = dir:topic.
          val parts = t.path.split(":", 2)
          if (parts.length != 2)
            throw new IllegalArgumentException(
              s"kafka table '${t.name}': path must be '<dir>:<topic>', got '${t.path}'")
          val Array(dir, topic) = parts
          spark.read.format("graft-kafka")
            .options(t.options).option("path", dir).option("topic", topic).load()
        case _ => spark.read.format(t.format).options(t.options).load(t.path)
      }
      df.createOrReplaceTempView(t.name)
      t.name -> df
    }.toMap
    model.views.foreach(v => spark.sql(v.sql).createOrReplaceTempView(v.name))
    // declared constraints feed the planner before any tile registers
    // (a tile registration may immediately benefit from them)
    val paths = model.tables.map(t => t.name -> t.path).toMap
    model.foreignKeys.foreach { fk =>
      Constraints.declareForeignKey(spark,
        paths.getOrElse(fk.factTable, throw new IllegalArgumentException(
          s"fk: unknown table '${fk.factTable}'")), fk.factCols,
        paths.getOrElse(fk.dimTable, throw new IllegalArgumentException(
          s"fk: unknown table '${fk.dimTable}'")), fk.dimKeys)
    }
    model.uniqueKeys.foreach { uk =>
      Constraints.declareUniqueKey(spark,
        paths.getOrElse(uk.table, throw new IllegalArgumentException(
          s"uk: unknown table '${uk.table}'")), uk.cols)
    }
    model.stats.foreach { st =>
      Statistics.declare(spark,
        paths.getOrElse(st.table, throw new IllegalArgumentException(
          s"stats: unknown table '${st.table}'")), st.rows, st.ndv)
    }
    // model-declared tiles materialize once per definition (the
    // reference's connect-time materialization registration): the first
    // matching rollup after load already answers from the tile
    model.tiles.foreach { t =>
      val src = tables.getOrElse(t.table, throw new IllegalArgumentException(
        s"tile '${t.name}': unknown table '${t.table}'"))
      graft.plans.MaterializedViews.registerOnce(spark, s"model:${t.name}",
        src, t.keys, t.sums, t.mins, t.maxs): Unit
    }
    tables
  }

  /** Parse the minimal properties form:
    * {{{
    *   # comment
    *   lineitem = parquet:/data/lineitem.parquet
    *   rates    = csv:/data/rates.csv
    *   v_top    = view:SELECT ... FROM lineitem ...
    *   day_tile = tile:orders|keys=o_orderstatus;o_orderdate|sums=o_totalprice
    *   fk1      = fk:orders.o_custkey->customer.c_custkey
    *   fk2      = fk:lineitem.l_orderkey;l_linenumber->dim.d_orderkey;d_linenumber
    *   uk1      = uk:customer.c_custkey
    *   st1      = stats:orders|rows=15000|ndv=o_custkey:1500;o_orderstatus:3
    * }}}
    * Composite keys separate columns with ';' (positional pairs). */
  def parse(name: String, text: String): Model = {
    val lines = text.linesIterator.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#")).toSeq
    val entries = lines.map { l =>
      val Array(k, v) = l.split("=", 2).map(_.trim)
      val Array(fmt, rest) = v.split(":", 2)
      (k, fmt, rest)
    }
    def tile(k: String, spec: String): TileDef = {
      val parts = spec.split("\\|").map(_.trim)
      val table = parts.head
      val opts = parts.tail.map { p =>
        val Array(a, b) = p.split("=", 2); a -> b.split(";").map(_.trim).toSeq
      }.toMap
      require(opts.contains("keys"), s"tile '$k' needs keys=...")
      TileDef(k, table, opts("keys"), opts.getOrElse("sums", Nil),
        opts.getOrElse("mins", Nil), opts.getOrElse("maxs", Nil))
    }
    def fk(spec: String): FkDef = {
      val Array(f, d) = spec.split("->", 2).map(_.trim)
      val Array(ft, fc) = f.split("\\.", 2)
      val Array(dt, dk) = d.split("\\.", 2)
      FkDef(ft, fc.split(";").map(_.trim).toSeq,
        dt, dk.split(";").map(_.trim).toSeq)
    }
    def uk(spec: String): UkDef = {
      val Array(t, cs) = spec.split("\\.", 2)
      UkDef(t.trim, cs.split(";").map(_.trim).toSeq)
    }
    def st(k: String, spec: String): StatsDef = {
      val parts = spec.split("\\|").map(_.trim)
      val opts = parts.tail.map { p =>
        val Array(a, b) = p.split("=", 2); a -> b
      }.toMap
      require(opts.contains("rows"), s"stats '$k' needs rows=...")
      StatsDef(parts.head, opts("rows").toLong,
        opts.get("ndv").map(_.split(";").map { e =>
          val Array(c, n) = e.split(":", 2); c.trim -> n.trim.toLong
        }.toMap).getOrElse(Map.empty))
    }
    Model(
      name,
      tables = entries.collect {
        case (k, fmt, p) if !Set("view", "tile", "fk", "uk", "stats").contains(fmt) =>
          TableDef(k, fmt, p)
      },
      views = entries.collect { case (k, "view", sql) => ViewDef(k, sql) },
      tiles = entries.collect { case (k, "tile", spec) => tile(k, spec) },
      foreignKeys = entries.collect { case (_, "fk", spec) => fk(spec) },
      uniqueKeys = entries.collect { case (_, "uk", spec) => uk(spec) },
      stats = entries.collect { case (k, "stats", spec) => st(k, spec) })
  }

  def loadFile(spark: SparkSession, path: String): Map[String, DataFrame] = {
    val text = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8)
    load(spark, parse(java.nio.file.Paths.get(path).getFileName.toString, text))
  }
}
