package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.apache.spark.sql.functions.{col, when}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** MATCH_RECOGNIZE — SQL:2016 row-pattern matching (ref:
  * rel/core/Match.java:62-98 for the operator surface; the runtime
  * design — pattern compiled to an automaton driven over
  * partition-sorted rows — follows runtime/Automaton.java:1,
  * AutomatonBuilder.java:1 and Matcher.java:1, re-expressed as a
  * backtracking matcher inside mapPartitions; SQL surface
  * sql/SqlMatchRecognize.java, corpus core/src/test/resources/sql/
  * match.iq).
  *
  * Spark-first shape: `repartition(partitionKeys)` +
  * `sortWithinPartitions(partitionKeys, orderKeys)` puts every partition
  * key's rows consecutively and ordered inside one task, then a
  * mapPartitions pass streams the pattern machine one key group at a
  * time — one shuffle total, task memory bounded by the largest single
  * key group (not the whole hash partition), no driver involvement.
  * Output = ALL ROWS PER MATCH: the input columns plus
  * `match_no` (1-based per partition key) and `classifier` (the symbol
  * that matched the row); ONE ROW PER MATCH and measures compose on top
  * as ordinary groupBy(match_no) aggregations.
  *
  * Pattern grammar: symbols, concatenation, alternation `|`, groups
  * `( )`, greedy quantifiers `* + ? {n} {n,} {n,m}` and their reluctant
  * `?`-suffixed forms, `PERMUTE(p1, ..., pn)`, and `{- p -}` exclusion
  * spans. DEFINE predicates: the pair form sees (current, previous);
  * the DefineCtx form (matchRecognizeCtx + nav) supports PREV(n)/
  * NEXT(n)/FIRST/LAST at any depth. AFTER MATCH SKIP PAST LAST ROW or
  * TO NEXT ROW; WITHIN duration pruning; SUBSET + MEASURES/ONE ROW PER
  * MATCH via subset()/sym()/oneRowPerMatch.
  */
object MatchRecognize {

  /** A DEFINE predicate: (currentRow, previousRowInStream) => matches. */
  type Define = (Row, Option[Row]) => Boolean

  /** Full-context DEFINE: sees the partition's ordered rows and the
    * current position — supports PREV(n>1)/NEXT(n)/FIRST/LAST
    * navigation (ref: SqlStdOperatorTable.java:2067-2084 FIRST/LAST/
    * PREV/NEXT; the pair form above covers only PREV depth 1). Use
    * [[nav]] for bounds-checked navigation. */
  type DefineCtx = (IndexedSeq[Row], Int) => Boolean

  /** Bounds-checked navigation for DefineCtx predicates: offset 0 is
    * the current row, negative = PREV(|n|), positive = NEXT(n). */
  def nav(rows: IndexedSeq[Row], pos: Int, offset: Int): Option[Row] = {
    val i = pos + offset
    if (i >= 0 && i < rows.length) Some(rows(i)) else None
  }

  sealed trait Skip
  case object SkipPastLastRow extends Skip
  case object SkipToNextRow extends Skip

  // ---- pattern AST + parser -------------------------------------------
  private sealed trait Pat
  private case class PSym(name: String) extends Pat
  private case class PCat(xs: List[Pat]) extends Pat
  private case class PAlt(xs: List[Pat]) extends Pat
  /** max = Int.MaxValue for unbounded; reluctant = lazy `*?`/`+?`/`??`/
    * `{n,m}?` (SQL:2016 reluctant quantifiers, ref: runtime/Pattern
    * .java:1 RepeatPattern + sql/SqlMatchRecognize.java) — tries the
    * SHORTEST expansion first instead of the longest. */
  private case class PQuant(p: Pat, min: Int, max: Int, reluctant: Boolean = false) extends Pat
  /** `{- p -}` exclusion (SQL:2016): rows match and are consumed but are
    * suppressed from ALL-ROWS output (ref: sql/SqlMatchRecognize.java,
    * Pattern.java EXCLUDE). Marked with a "-" classifier prefix
    * internally; the output loop drops marked rows. */
  private case class PExclude(p: Pat) extends Pat

  private[graft] def parsePattern(s: String): Any = parse(s)

  private def parse(s: String): Pat = {
    val toks = tokenize(s)
    val (p, rest) = parseAlt(toks)
    require(rest.isEmpty, s"trailing tokens in pattern: $rest")
    p
  }

  private def tokenize(s: String): List[String] = {
    val out = mutable.ListBuffer.empty[String]
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if ("()|*+?,".contains(c)) { out += c.toString; i += 1 }
      else if (c == '{' && i + 1 < s.length && s.charAt(i + 1) == '-') {
        out += "{-"; i += 2
      } else if (c == '-' && i + 1 < s.length && s.charAt(i + 1) == '}') {
        out += "-}"; i += 2
      } else if (c == '{') {
        val j = s.indexOf('}', i)
        require(j > 0, s"unclosed {} in pattern: $s")
        out += s.substring(i, j + 1); i = j + 1
      } else {
        val j0 = i
        while (i < s.length && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
        require(i > j0, s"unexpected char '${s.charAt(i)}' in pattern: $s")
        out += s.substring(j0, i)
      }
    }
    out.toList
  }

  private def parseAlt(toks: List[String]): (Pat, List[String]) = {
    val (first, rest) = parseCat(toks)
    rest match {
      case "|" :: tail =>
        val (next, rest2) = parseAlt(tail)
        next match {
          case PAlt(xs) => (PAlt(first :: xs), rest2)
          case other => (PAlt(List(first, other)), rest2)
        }
      case _ => (first, rest)
    }
  }

  private def parseCat(toks: List[String]): (Pat, List[String]) = {
    val parts = mutable.ListBuffer.empty[Pat]
    var rest = toks
    var done = false
    while (!done) rest match {
      case Nil | "|" :: _ | ")" :: _ | "," :: _ | "-}" :: _ => done = true
      case ts =>
        val (p, r) = parseAtom(ts)
        parts += p
        rest = r
    }
    (if (parts.size == 1) parts.head else PCat(parts.toList), rest)
  }

  private def parseAtom(toks: List[String]): (Pat, List[String]) = {
    val (base, rest) = toks match {
      case "(" :: tail =>
        val (p, r) = parseAlt(tail)
        require(r.headOption.contains(")"), s"missing ) in pattern")
        (p, r.tail)
      case "{-" :: tail =>
        val (p, r) = parseAlt(tail)
        require(r.headOption.contains("-}"), s"missing -} in pattern")
        (PExclude(p): Pat, r.tail)
      case permute :: "(" :: tail if permute.equalsIgnoreCase("PERMUTE") =>
        // SQL:2016 PERMUTE(p1, ..., pn) — matches the elements in any
        // order (ref: runtime/Pattern.java PERMUTE, match.iq); expands
        // to the alternation of all n! orderings, lexicographically by
        // element position (the standard's preference order).
        val parts = mutable.ListBuffer.empty[Pat]
        var r = tail
        var done = false
        while (!done) {
          val (p, r2) = parseAlt(r)
          parts += p
          r2 match {
            case "," :: more => r = more
            case ")" :: more => r = more; done = true
            case other => throw new IllegalArgumentException(
              s"PERMUTE: expected ',' or ')', got $other")
          }
        }
        require(parts.size <= 6, s"PERMUTE limited to 6 elements (got ${parts.size})")
        val alts = parts.toList.permutations.map(PCat(_): Pat).toList
        (PAlt(alts): Pat, r)
      case sym :: tail => (PSym(sym): Pat, tail)
      case Nil => throw new IllegalArgumentException("empty pattern atom")
    }
    // a '?' directly after a quantifier flips it to reluctant (lazy)
    def lazyness(t: List[String]): (Boolean, List[String]) = t match {
      case "?" :: rest => (true, rest)
      case _ => (false, t)
    }
    rest match {
      case "*" :: t =>
        val (lzy, t2) = lazyness(t); (PQuant(base, 0, Int.MaxValue, lzy), t2)
      case "+" :: t =>
        val (lzy, t2) = lazyness(t); (PQuant(base, 1, Int.MaxValue, lzy), t2)
      case "?" :: t =>
        val (lzy, t2) = lazyness(t); (PQuant(base, 0, 1, lzy), t2)
      case q :: t if q.startsWith("{") && q != "{-" =>
        val body = q.substring(1, q.length - 1)
        val parts = body.split(",", -1)
        val (mn, mx) = parts match {
          case Array(n) => (n.trim.toInt, n.trim.toInt)
          case Array(n, "") => (n.trim.toInt, Int.MaxValue)
          case Array(n, m) => (n.trim.toInt, m.trim.toInt)
          case _ => throw new IllegalArgumentException(s"bad quantifier $q")
        }
        val (lzy, t2) = lazyness(t)
        (PQuant(base, mn, mx, lzy), t2)
      case _ => (base, rest)
    }
  }

  // ---- backtracking matcher -------------------------------------------
  /** Greedy leftmost match of `pat` starting at rows(start); returns the
    * per-row classifier list of the match, or None. CPS backtracking —
    * quantifiers try the longest expansion first (SQL greedy). */
  private val patternCache =
    new java.util.concurrent.ConcurrentHashMap[String, Pat]()

  /** Generic matcher entry: greedy leftmost match of `pattern` starting
    * at `start` over a row universe of size `length`, where `sym(name,
    * pos)` decides whether symbol `name` matches position `pos`. Shared
    * by the batch operator and the streaming flatMapGroupsWithState
    * variant. */
  def matchSeq(pattern: String, length: Int, start: Int,
      sym: (String, Int) => Boolean): Option[List[String]] = {
    val pat = patternCache.computeIfAbsent(pattern, parse)
    matchGeneric(pat, length, start, sym)
  }

  private def matchAt(
      pat: Pat,
      rows: IndexedSeq[Row],
      start: Int,
      defines: Map[String, DefineCtx],
      posAllowed: (Int, Int) => Boolean): Option[List[String]] = {

    def sym(name: String, pos: Int): Boolean =
      posAllowed(start, pos) &&
        defines.getOrElse(name, (_: IndexedSeq[Row], _: Int) => true)(rows, pos)
    matchGeneric(pat, rows.length, start, sym)
  }

  private def matchGeneric(
      pat: Pat,
      length: Int,
      start: Int,
      symPred: (String, Int) => Boolean): Option[List[String]] = {

    def sym(name: String, pos: Int): Boolean =
      pos < length && symPred(name, pos)

    // k: continuation from position -> classifiers consumed downstream
    def go(p: Pat, pos: Int, k: Int => Option[List[String]]): Option[List[String]] = p match {
      case PSym(n) =>
        if (sym(n, pos)) k(pos + 1).map(n :: _) else None
      case PCat(xs) =>
        xs match {
          case Nil => k(pos)
          case h :: t => go(h, pos, p2 => go(PCat(t), p2, k))
        }
      case PAlt(xs) =>
        xs.iterator.map(x => go(x, pos, k)).collectFirst { case Some(r) => r }
      case PExclude(inner) =>
        // record where the inner pattern ended on the SUCCESSFUL path
        // (backtracking overwrites it; the final assignment before the
        // match unwinds is the winning continuation's position), then
        // mark that span's classifiers with the exclusion prefix.
        var innerEnd = -1
        go(inner, pos, p2 => { innerEnd = p2; k(p2) }) match {
          case Some(classifiers) if innerEnd >= pos =>
            val innerLen = innerEnd - pos
            Some(classifiers.zipWithIndex.map { case (c, idx) =>
              if (idx < innerLen && !c.startsWith("-")) "-" + c else c
            })
          case other => other
        }
      case PQuant(inner, mn, mx, reluctant) =>
        // rep(i, pos): already consumed i repetitions at pos. Greedy
        // tries the longest expansion first; reluctant the shortest.
        def expand(i: Int, pos2: Int): Option[List[String]] =
          if (i < mx)
            go(inner, pos2, p3 =>
              if (p3 == pos2) None // zero-width repetition guard
              else rep(i + 1, p3))
          else None
        def rep(i: Int, pos2: Int): Option[List[String]] =
          if (reluctant) {
            val short = if (i >= mn) k(pos2) else None
            short match {
              case some @ Some(_) => some
              case None => expand(i, pos2)
            }
          } else {
            expand(i, pos2) match {
              case some @ Some(_) => some
              case None => if (i >= mn) k(pos2) else None
            }
          }
        rep(0, pos)
    }
    go(pat, start, pos => Some(Nil)).filter(_.nonEmpty)
  }

  /** Apply MATCH_RECOGNIZE. See object doc for semantics. */
  /** @param within optional `WITHIN` constraint (ref: rel/core/Match
    *               .java:75 interval): (timestamp column, max duration in
    *               millis). Pruned during matching — a pattern must
    *               complete inside the window opened by its first row,
    *               so the matcher never explores rows beyond it. */
  def matchRecognize(
      df: DataFrame,
      partitionKeys: Seq[String],
      orderKeys: Seq[String],
      pattern: String,
      define: Map[String, Define],
      afterMatch: Skip = SkipPastLastRow,
      within: Option[(String, Long)] = None): DataFrame =
    matchRecognizeCtx(df, partitionKeys, orderKeys, pattern,
      define.map { case (k, f) =>
        k -> ((rows: IndexedSeq[Row], pos: Int) =>
          f(rows(pos), if (pos == 0) None else Some(rows(pos - 1)))): (String, DefineCtx)
      },
      afterMatch, within)

  /** matchRecognize with full-context DEFINEs (PREV(n)/NEXT(n)/FIRST/
    * LAST navigation via [[nav]]). */
  def matchRecognizeCtx(
      df: DataFrame,
      partitionKeys: Seq[String],
      orderKeys: Seq[String],
      pattern: String,
      define: Map[String, DefineCtx],
      afterMatch: Skip = SkipPastLastRow,
      within: Option[(String, Long)] = None): DataFrame = {

    val pat = parse(pattern)
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields ++ Seq(
      StructField("match_no", LongType, nullable = false),
      StructField("classifier", StringType, nullable = false)))
    val keyIdx = partitionKeys.map(inSchema.fieldIndex)
    val withinIdx = within.map { case (c, ms) => (inSchema.fieldIndex(c), ms) }

    val sorted = df
      .repartition(partitionKeys.map(col): _*)
      .sortWithinPartitions((partitionKeys ++ orderKeys).map(col): _*)

    // Rows arrive grouped (repartition on key) and sorted, so the
    // partition streams one key group at a time: peak task memory is
    // O(largest single group), not O(partition) — a hot hash partition
    // holding many keys never materializes whole.
    val out = sorted.mapPartitions { it =>
      def epochMs(r: Row, i: Int): Long = r.get(i) match {
        case t: java.sql.Timestamp => t.getTime
        case t: java.time.Instant => t.toEpochMilli
        case t: java.time.LocalDateTime => t.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
        case l: java.lang.Long => l
        case other => throw new IllegalArgumentException(s"WITHIN column type: $other")
      }

      def processGroup(group: IndexedSeq[Row]): Iterator[Row] = {
        val posAllowed: (Int, Int) => Boolean = withinIdx match {
          case None => (_, _) => true
          case Some((ti, maxMs)) => (start, pos) =>
            pos < group.length &&
              epochMs(group(pos), ti) - epochMs(group(start), ti) <= maxMs
        }
        val result = mutable.ArrayBuffer.empty[Row]
        var matchNo = 0L
        var p = 0
        while (p < group.length) {
          matchAt(pat, group, p, define, posAllowed) match {
            case Some(classifiers) =>
              matchNo += 1
              classifiers.zipWithIndex.foreach { case (cls, i) =>
                // rows inside a {- -} exclusion are consumed but not
                // emitted (classifier carries the "-" marker)
                if (!cls.startsWith("-")) {
                  val base = group(p + i)
                  val vals = new Array[Any](outSchema.length)
                  var j = 0
                  while (j < inSchema.length) { vals(j) = base.get(j); j += 1 }
                  vals(inSchema.length) = matchNo
                  vals(inSchema.length + 1) = cls
                  result += new GenericRowWithSchema(vals, outSchema)
                }
              }
              p = afterMatch match {
                case SkipPastLastRow => p + classifiers.length
                case SkipToNextRow => p + 1
              }
            case None => p += 1
          }
        }
        result.iterator
      }

      // NB: the lookahead val must NOT be named `buffered` — inside the
      // anon Iterator that name resolves to the inherited
      // Iterator.buffered method (a fresh BufferedIterator over `this`),
      // which self-recurses hasNext into a StackOverflowError.
      val in = it.buffered
      new Iterator[Row] {
        private var pending: Iterator[Row] = Iterator.empty
        override def hasNext: Boolean = {
          while (!pending.hasNext && in.hasNext) {
            val key = keyIdx.map(in.head.get)
            val group = mutable.ArrayBuffer.empty[Row]
            while (in.hasNext && keyIdx.map(in.head.get) == key)
              group += in.next()
            pending = processGroup(group.toIndexedSeq)
          }
          pending.hasNext
        }
        override def next(): Row = {
          if (!hasNext) throw new NoSuchElementException("empty partition iterator")
          pending.next()
        }
      }
    }(Encoders.row(outSchema))

    out
  }

  // ---- SUBSET + MEASURES / ONE ROW PER MATCH --------------------------

  /** SQL:2016 `SUBSET S = (A, B)` (ref: rel/core/Match.java:83 subsets,
    * sql/SqlMatchRecognize.java): a predicate over the ALL-ROWS output
    * selecting the rows whose classifier is in the subset. Measures over
    * a subset scope their aggregate with it, e.g.
    * `avg(when(MatchRecognize.subset("A", "B"), col("price")))`. */
  def subset(symbols: String*): Column =
    col("classifier").isin(symbols.map(_.asInstanceOf[Any]): _*)

  /** A measure input scoped to one symbol or subset: the value on rows
    * the symbol matched, NULL elsewhere (aggregates skip NULLs, so
    * `max(sym("UP", col("v")))` ≡ `MAX(UP.v)` in MEASURES). */
  def sym(symbol: String, value: Column): Column =
    when(col("classifier") === symbol, value)

  /** ONE ROW PER MATCH with MEASURES (ref: rel/core/Match.java:70
    * measures + rowsPerMatch): collapse the ALL-ROWS output to one row
    * per (partition keys, match_no), computing each named measure as an
    * aggregate over the match's rows. FINAL semantics (the whole match
    * is visible), the reference's default for ONE ROW PER MATCH.
    * Scale: a groupBy on (keys, match_no) — partial-aggregated and
    * co-partitioned with the match shuffle that produced the input. */
  def oneRowPerMatch(
      allRows: DataFrame,
      partitionKeys: Seq[String],
      measures: Seq[Column]): DataFrame = {
    require(measures.nonEmpty, "at least one measure required")
    allRows
      .groupBy((partitionKeys :+ "match_no").map(col): _*)
      .agg(measures.head, measures.tail: _*)
  }
}
