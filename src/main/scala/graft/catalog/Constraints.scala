package graft.catalog

import org.apache.spark.sql.SparkSession

/** Declared referential constraints (ref: schema/Statistic.java
  * `getReferentialConstraints` + plan/RelOptReferentialConstraint — the
  * reference's planner trusts catalog-declared FK→PK pairs to prove a
  * join LOSSLESS, enabling join elimination and materialized-view
  * unification across differing join sets, rel/rules/materialize/
  * MaterializedViewJoinRule's constraint-based compensation).
  *
  * Declaring `factPath.factCol → dimPath.dimKey` asserts, as the
  * caller's catalog contract (exactly like the reference's — constraints
  * are metadata, never re-verified per query):
  *   - dimKey is UNIQUE in the dim table (a key),
  *   - factCol is non-NULL in the fact table,
  *   - every factCol value appears in dimKey (referential integrity).
  * Under those three, fact ⋈ dim on factCol = dimKey has EXACTLY one
  * row per fact row — so an aggregate over fact columns is identical on
  * the fact and on the star, which is what lets a fact-only rollup be
  * answered from a star tile (MaterializedViews.fkTileRewrite).
  *
  * At 100 TB this is the missing half of the lattice play: ONE wide
  * star tile (fact ⋈ all dimensions, pre-aggregated) answers not just
  * star queries but every fact-only rollup too — without constraints,
  * each join subset would need its own materialization. */
object Constraints {

  final case class ForeignKey(
      factPath: String, factCol: String, dimPath: String, dimKey: String)

  private val fks = java.util.concurrent.ConcurrentHashMap
    .newKeySet[ForeignKey]()

  private def qualify(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sessionState.newHadoopConf()).makeQualified(p).toString
  }

  /** Declare factPath.factCol → dimPath.dimKey (idempotent). */
  def declareForeignKey(spark: SparkSession, factPath: String, factCol: String,
      dimPath: String, dimKey: String): Unit = {
    fks.add(ForeignKey(qualify(spark, factPath), factCol,
      qualify(spark, dimPath), dimKey)): Unit
    // constraint-driven rewrites activate with the first declaration
    graft.plans.FkJoinElimination.ensure(spark)
  }

  def clear(): Unit = fks.clear()

  /** Per-condition verdicts of a foreign-key verification. */
  final case class FkCheck(uniqueKey: Boolean, noNulls: Boolean,
      contained: Boolean) {
    def valid: Boolean = uniqueKey && noNulls && contained
  }

  /** Check the three conditions `declareForeignKey` ASSERTS — dimKey
    * unique, factCol non-null, every factCol value present in dimKey —
    * with real (exact) queries, and declare the constraint only when
    * all hold. The reference trusts declared metadata outright
    * (schema/Statistic.java getReferentialConstraints is never
    * re-verified); at 100 TB a one-off verification — one aggregate on
    * the dim, one null count on the fact, one anti-join — is cheap
    * insurance before the rewrite starts serving every fact-only
    * rollup from a star tile on the strength of the claim. */
  def verifyAndDeclare(spark: SparkSession, factPath: String, factCol: String,
      dimPath: String, dimKey: String): FkCheck = {
    import org.apache.spark.sql.functions._
    val fact = graft.T.normalizeTimestamps(spark.read.parquet(factPath))
    val dim = graft.T.normalizeTimestamps(spark.read.parquet(dimPath))
    val uniqueKey = dim.groupBy(col(dimKey))
      .count().filter(col("count") > 1).isEmpty
    val noNulls = fact.filter(col(factCol).isNull).isEmpty
    val contained = fact.select(col(factCol))
      .join(dim, col(factCol) === col(dimKey), "left_anti").isEmpty
    val check = FkCheck(uniqueKey, noNulls, contained)
    if (check.valid) declareForeignKey(spark, factPath, factCol, dimPath, dimKey)
    check
  }

  /** Declare an ALREADY-QUALIFIED constraint verbatim — the durable-tile
    * adoption path (MaterializedViews.adoptOne): TileMeta serializes the
    * qualified paths `declareForeignKey` produced, so re-declaring them
    * must not re-qualify against a possibly different working FS. */
  private[graft] def declareQualified(fk: ForeignKey): Unit = fks.add(fk): Unit

  /** Declared constraints BOTH of whose sides are leaves of the given
    * tile — the set worth persisting beside it (ref: constraints live ON
    * the table metadata, schema/Statistic.java getReferentialConstraints,
    * so they travel with whatever catalog stores the materialization).
    * Deterministic order, so TileMeta round-trips stably. */
  private[graft] def forLeaves(leaves: Seq[Set[String]]): Seq[ForeignKey] = {
    import scala.jdk.CollectionConverters._
    fks.asScala.toSeq
      .filter(fk => leaves.exists(_.contains(fk.factPath)) &&
        leaves.exists(_.contains(fk.dimPath)))
      .sortBy(fk => (fk.factPath, fk.factCol, fk.dimPath, fk.dimKey))
  }

  /** Is there a declared FK `factPaths.factCol → dimPaths.dimKey` for
    * EXACTLY these tables? Unlike name-based coverage, the caller has
    * resolved each column to its producing leaf — join elimination uses
    * this so a same-named column on another leaf can never borrow the
    * constraint. */
  private[graft] def proves(factCol: String, factPaths: Set[String],
      dimKey: String, dimPaths: Set[String]): Boolean = {
    import scala.jdk.CollectionConverters._
    fks.asScala.exists(fk => fk.factCol == factCol && fk.dimKey == dimKey &&
      factPaths.contains(fk.factPath) && dimPaths.contains(fk.dimPath))
  }

  /** Is joining `extras` onto `base` along `pairs` provably LOSSLESS —
    * exactly one added match per existing row? The extras must form a
    * TREE of declared FK edges DIRECTED AWAY from the base: each pair
    * traverses from its FK's FACT side (an already-reached leaf) to its
    * DIM side (a new extra leaf), consuming both. Anything that cannot
    * traverse refuses the whole extension:
    *   - FAN-OUT — the pair's FK fact side is the FAR leaf (several
    *     fact-like rows per reached row: customer⋈nation⋈SUPPLIER
    *     multiplies customers by their nation's suppliers);
    *   - a SECOND pair between reached leaves (a composite-key join is
    *     not proven by two single-column FKs — the two unique matches
    *     need not be the same row, so the conjunction can drop rows);
    *   - a pair with no declared FK at all.
    * Per-pair coverage without the direction/tree argument admitted the
    * fan-out case — the r14 audit's fix. */
  private[graft] def losslessExtension(base: Seq[Set[String]],
      extras: Seq[Set[String]], pairs: Set[(String, String)]): Boolean = {
    import scala.jdk.CollectionConverters._
    val all = fks.asScala.toSeq
    val reached = scala.collection.mutable.ArrayBuffer(base: _*)
    val unreached = scala.collection.mutable.ArrayBuffer(extras: _*)
    val pending = scala.collection.mutable.Set(pairs.toSeq: _*)
    var progress = true
    while (progress && pending.nonEmpty) {
      progress = false
      pending.find { p =>
        all.exists { fk =>
          Set(p._1, p._2) == Set(fk.factCol, fk.dimKey) &&
            reached.exists(_.contains(fk.factPath)) && {
              val i = unreached.indexWhere(_.contains(fk.dimPath))
              if (i >= 0) { reached += unreached.remove(i); true } else false
            }
        }
      } match {
        case Some(p) => pending -= p; progress = true
        case None => ()
      }
    }
    pending.isEmpty && unreached.isEmpty
  }

  /** Does a declared FK prove the join pair `(a, b)` (name-normalized,
    * as in an MV signature) lossless? BOTH declared tables must be
    * present: the DIM side among `dimLeaves` (the tile's extra leaves —
    * the side whose join must add exactly one match per row), and the
    * FACT side among `allLeaves` (every leaf of the tile — the fact
    * itself, or an inner dim of a snowflake chain). Without the
    * fact-side check, a constraint declared for table A would falsely
    * cover a same-NAMED column pair in a tile over a different table.
    * Within one tile, names are unambiguous (duplicate output names are
    * rejected at register). */
  def coversPair(pair: (String, String), dimLeaves: Seq[Set[String]],
      allLeaves: Seq[Set[String]]): Boolean = {
    import scala.jdk.CollectionConverters._
    fks.asScala.exists { fk =>
      Set(pair._1, pair._2) == Set(fk.factCol, fk.dimKey) &&
        dimLeaves.exists(_.contains(fk.dimPath)) &&
        allLeaves.exists(_.contains(fk.factPath))
    }
  }
}
