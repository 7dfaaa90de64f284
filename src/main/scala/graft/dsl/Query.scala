package graft.dsl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.windows.XQueryWindows

/** The engine's query surface: a FLWOR-style builder whose clauses are
  * the reference's clause algebra (pythonql `algebra/operators.py:1-225`)
  * re-expressed as immediate DataFrame transformations.
  *
  * Model: the reference pipes a stream of variable-binding tuples
  * through clause generators (`Executor.py:114-139`); here the binding
  * stream IS a DataFrame, and each bound variable is a struct-valued
  * column named after the variable. Catalyst plays the role of the
  * reference's rewriter (`Rewriter.py:185-490`) — and strictly
  * outclasses it:
  *
  *   - `forIn(a, df1).forIn(b, df2).where(a.k === b.k)` compiles to a
  *     crossJoin + filter, which `PushDownPredicates` +
  *     `ExtractEquiJoinKeys` turn into a real equi-join (the
  *     reference's join-synthesis rewrite, `Rewriter.py:376-459`);
  *   - struct field access over `struct(cols*)` is collapsed by
  *     `SimplifyExtractValueOps` back to the underlying scan columns,
  *     so predicate/projection pushdown reach the parquet scan — the
  *     reference's source-pushdown rewrites (`Rewriter.py:224-372`)
  *     come for free;
  *   - group-by auto-nesting (every non-key var → list,
  *     `Executor.py:440-448`) is `collect_list(structVar)`, with
  *     `groupByAgg` as the native-aggregate fast path the reference
  *     never had.
  *
  * Clause → method map (reference cite):
  *   for x in src       → forIn           (Executor.py:165-194)
  *   for x in outer(..) → forInOuter      (helpers.py:12-16)
  *   let x = e          → let             (Executor.py:198-224)
  *   where p            → where           (Executor.py:454-461)
  *   count x            → count           (Executor.py:391-400)
  *   group by k         → groupBy / groupByAgg (Executor.py:403-450)
  *   order by e asc/desc→ orderBy         (Executor.py:464-488)
  *   window ...         → window          (Executor.py:496-638)
  *   select e           → select / selectValue / toDF (Executor.py:143-151)
  *   {select k: v}      → selectKV        (Executor.py:153-161; we keep
  *                        the intuitive {k: v} orientation — the
  *                        reference's (value,key) swap is a documented
  *                        quirk, SURVEY §2.1 #2)
  *   {select …} (set)   → selectDistinct  (Executor.py:136-137)
  *   join hints         → forIn(hint=…)   (Rewriter.py:447-459 →
  *                        Spark broadcast/merge/shuffle_hash hints)
  */
final class Query private (
    private val dfOpt: Option[DataFrame],
    private val vars: Vector[String]) {

  private def df: DataFrame =
    dfOpt.getOrElse(throw new IllegalStateException(
      "empty query: bind a source with forIn first"))

  private def next(d: DataFrame, v: Vector[String]) = new Query(Some(d), v)

  /** Wrap every row of `src` as one struct-valued variable. */
  private def wrap(name: String, src: DataFrame): DataFrame = {
    require(!vars.contains(name), s"variable '$name' already bound")
    src.select(struct(src.columns.map(col).toIndexedSeq: _*).as(name))
  }

  // ---- for x in <table> --------------------------------------------
  /** Iterate a source: the dependent product with the current binding
    * stream. An equi-`where` downstream makes Catalyst synthesize the
    * join; `hint` forwards a Spark join-strategy hint ("broadcast",
    * "merge", "shuffle_hash") — the analog of the reference's
    * `hint('index'|'nl', …)`.
    */
  def forIn(name: String, src: DataFrame, hint: String = ""): Query = {
    val w = if (hint.isEmpty) wrap(name, src) else wrap(name, src).hint(hint)
    next(dfOpt.fold(w)(_.crossJoin(w)), vars :+ name)
  }

  /** Iterate a per-tuple collection expression (lateral flatten):
    * `for y in x.items`. Elements bind as variable `name`.
    */
  def forIn(name: String, seq: Column): Query = {
    require(!vars.contains(name), s"variable '$name' already bound")
    next(df.withColumn(name, explode(seq)), vars :+ name)
  }

  /** Multi-variable unpacking `for (a, b) in seq` (reference
    * `Executor.py:174-186`: tuple targets are unpacked into the
    * binding stream via a synthesized comprehension): explode the
    * per-tuple collection, then bind each name positionally from the
    * element — struct elements by field position (arity enforced,
    * like Python tuple unpack), array elements by index (missing →
    * NULL, SQL semantics).
    */
  def forIn(names: Seq[String], seq: Column): Query = {
    names.foreach(n => require(!vars.contains(n),
      s"variable '$n' already bound"))
    unpackInto(df.withColumn("_unpack", explode(seq)), names)
  }

  /** Multi-variable unpacking over a tabular source: `for (a, b) in
    * pairs` where `pairs` is a 2-column relation — each column binds
    * positionally as its own scalar variable.
    */
  def forIn(names: Seq[String], src: DataFrame): Query = {
    names.foreach(n => require(!vars.contains(n),
      s"variable '$n' already bound"))
    require(names.distinct.length == names.length,
      s"duplicate names in unpack target: ${names.mkString(", ")}")
    require(names.length == src.columns.length,
      s"cannot unpack ${src.columns.length} columns into " +
        s"${names.length} variables")
    val w = src.select(src.columns.zip(names).map { case (c, n) =>
      col(c).as(n) }.toIndexedSeq: _*)
    next(dfOpt.fold(w)(_.crossJoin(w)), vars ++ names)
  }

  /** Positional unpack of `_unpack` (struct or array) into `names`. */
  private def unpackInto(d: DataFrame, names: Seq[String]): Query = {
    import org.apache.spark.sql.GraftSqlBridge
    import org.apache.spark.sql.catalyst.expressions.GetStructField
    import org.apache.spark.sql.types.{ArrayType, StructType}
    require(names.distinct.length == names.length,
      s"duplicate names in unpack target: ${names.mkString(", ")}")
    val cols: Seq[(String, Column)] = d.schema("_unpack").dataType match {
      case st: StructType =>
        require(st.fields.length == names.length,
          s"cannot unpack struct of ${st.fields.length} fields into " +
            s"${names.length} variables")
        // extract by ORDINAL, not name: a struct with duplicate field
        // names (easy via arrays_zip) must still unpack positionally
        names.zipWithIndex.map { case (n, i) =>
          n -> GraftSqlBridge.column(GetStructField(
            GraftSqlBridge.expression(col("_unpack")), i)) }
      case _: ArrayType =>
        // get() (not getItem) so a short array binds NULL under ANSI
        names.zipWithIndex.map { case (n, i) =>
          n -> get(col("_unpack"), lit(i)) }
      case t => throw new IllegalArgumentException(
        s"cannot unpack ${t.simpleString}: need a struct or array")
    }
    next(d.withColumns(cols.toMap).drop("_unpack"), vars ++ names)
  }

  /** `for x in outer(subquery)` — the reference's manual left-outer
    * idiom ([] → [None]): rows with no match bind `name` to NULL.
    */
  def forInOuter(name: String, src: DataFrame)(on: Column): Query =
    next(df.join(wrap(name, src), on, "left_outer"), vars :+ name)

  /** EXISTS / NOT EXISTS over a subquery source (SURVEY §2.3 freebies;
    * left_semi / left_anti — no right-side columns survive).
    */
  def existsIn(name: String, src: DataFrame)(on: Column): Query =
    next(df.join(wrap(name, src), on, "left_semi"), vars)
  def notExistsIn(name: String, src: DataFrame)(on: Column): Query =
    next(df.join(wrap(name, src), on, "left_anti"), vars)

  // ---- let / where -------------------------------------------------
  def let(name: String, e: Column): Query = {
    require(!vars.contains(name), s"variable '$name' already bound")
    next(df.withColumn(name, e), vars :+ name)
  }

  /** Multi-variable `let (x, y) = e` (reference `Executor.py:208-218`):
    * evaluate the tuple expression ONCE, bind each name positionally —
    * struct fields by position (arity enforced), array elements by
    * index.
    */
  def let(names: Seq[String], e: Column): Query = {
    names.foreach(n => require(!vars.contains(n),
      s"variable '$n' already bound"))
    unpackInto(df.withColumn("_unpack", e), names)
  }

  /** Filter; placed after groupBy it is HAVING (the reference's `where`
    * is position-polymorphic the same way, `tutorial_tests.py:22-33`).
    */
  def where(p: Column): Query = next(df.filter(p), vars)

  // ---- count (positional) ------------------------------------------
  /** The reference's `count` clause appends the 0-based stream position
    * (`Executor.py:391-400`). Stream position is only well-defined
    * under an order in a distributed engine, so an explicit `order` is
    * required; `partitionBy` scopes the numbering per group (empty =
    * global, which serializes the numbering — fine for small results,
    * a documented hazard at scale).
    */
  def count(name: String, order: Seq[Column],
      partitionBy: Seq[Column] = Nil): Query = {
    require(order.nonEmpty, "count clause requires an explicit order")
    val w = Window.partitionBy(partitionBy: _*).orderBy(order: _*)
    next(df.withColumn(name, (row_number().over(w) - lit(1)).cast("long")),
      vars :+ name)
  }

  // ---- group by ----------------------------------------------------
  /** Reference semantics: group on key expressions; EVERY non-key
    * variable becomes the list of its values per group
    * (`Executor.py:440-448`). List order is nondeterministic in a
    * distributed engine (document: sort downstream with array_sort when
    * order matters).
    *
    * At 100 TB prefer `groupByAgg`: collecting wide structs per group
    * is a memory bomb unless the group cardinality is bounded.
    */
  def groupBy(keys: (String, Column)*): Query = {
    // a variable promoted to a key keeps its scalar value (the
    // reference nests only NON-key variables, Executor.py:440-448)
    val keyNames = keys.map(_._1).toSet
    val nested = vars.filterNot(keyNames.contains)
    val keyCols = keys.map { case (n, e) => e.as(n) }
    val d =
      if (nested.isEmpty)
        df.groupBy(keyCols: _*)
          .agg(org.apache.spark.sql.functions.count(lit(1)).as("__n"))
          .drop("__n")
      else {
        val aggs = nested.map(v => collect_list(col(v)).as(v))
        df.groupBy(keyCols: _*).agg(aggs.head, aggs.tail: _*)
      }
    next(d, keys.map(_._1).toVector ++ nested)
  }

  /** Native-aggregate group-by — the optimizer rewrite the reference
    * lists as future work (SURVEY §2.1 #7): partial+final aggregation
    * instead of collect-then-reduce.
    */
  def groupByAgg(keys: Seq[(String, Column)],
      aggs: Seq[(String, Column)]): Query = {
    val aggCols = aggs.map { case (n, e) => e.as(n) }
    val d =
      if (keys.isEmpty) df.agg(aggCols.head, aggCols.tail: _*)
      else df.groupBy(keys.map { case (n, e) => e.as(n) }: _*)
        .agg(aggCols.head, aggCols.tail: _*)
    next(d, (keys.map(_._1) ++ aggs.map(_._1)).toVector)
  }

  /** Hierarchical rollup aggregation (SURVEY §2.3: absent in the
    * reference, free in Spark — subtotal rows carry NULL keys).
    */
  def groupByRollup(keys: Seq[(String, Column)],
      aggs: Seq[(String, Column)]): Query = {
    val aggCols = aggs.map { case (n, e) => e.as(n) }
    val d = df.rollup(keys.map { case (n, e) => e.as(n) }: _*)
      .agg(aggCols.head, aggCols.tail: _*)
    next(d, (keys.map(_._1) ++ aggs.map(_._1)).toVector)
  }

  /** Full cube aggregation — all 2^k grouping sets (SURVEY §2.3
    * freebie, same NULL-key convention as rollup).
    */
  def groupByCube(keys: Seq[(String, Column)],
      aggs: Seq[(String, Column)]): Query = {
    val aggCols = aggs.map { case (n, e) => e.as(n) }
    val d = df.cube(keys.map { case (n, e) => e.as(n) }: _*)
      .agg(aggCols.head, aggCols.tail: _*)
    next(d, (keys.map(_._1) ++ aggs.map(_._1)).toVector)
  }

  // ---- order by / limit / distinct ---------------------------------
  /** Multi-key sort. The reference implements this as N successive
    * stable sorts (`Executor.py:464-488`) — equivalent to one
    * lexicographic `orderBy`, which Spark runs as a range-partitioned
    * distributed sort.
    */
  def orderBy(specs: Column*): Query = next(df.orderBy(specs: _*), vars)

  def limit(n: Int): Query = next(df.limit(n), vars)

  def distinct: Query = next(df.distinct(), vars)

  // ---- window (XQuery tumbling/sliding) -----------------------------
  /** The reference's XQuery-3.0 window clause over the current binding
    * stream (`Executor.py:496-638`); see XQueryWindows for the
    * single-pass partition-local implementation. `keyVars`/`orderVars`
    * name current top-level variables (let-bind fields first).
    * Binds: keys, s_idx, e_idx, and `name` = array of row-structs.
    */
  def window(name: String, keyVars: Seq[String], orderVars: Seq[String],
      start: XQueryWindows.Item => Boolean,
      end: (XQueryWindows.Item, XQueryWindows.Item) => Boolean,
      tumbling: Boolean = false, onlyEnd: Boolean = false,
      allowSinglePartition: Boolean = false): Query = {
    val out = XQueryWindows.windows(df, keyVars, orderVars, start, end,
      tumbling, onlyEnd, allowSinglePartition)
      .withColumnRenamed("window", name)
    next(out, keyVars.toVector ++ Vector("s_idx", "e_idx", name))
  }

  // ---- match (nested pattern match) --------------------------------
  /** The reference's `match {pattern} [as z] in seq` clause
    * (`Executor.py:316-388`): explode the per-tuple sequence of JSON
    * objects, keep elements matching the pattern, extend the binding
    * stream with the pattern's `as` variables. Filtering + extraction
    * compile to ONE single-parse Generator — see MatchPattern.
    */
  def matchIn(seq: Column, pattern: MatchPattern.Pat,
      exact: Boolean = false): Query =
    matchImpl(df.withColumn("_match_elem", explode(seq)), pattern, exact)

  /** Match where the stream itself carries one JSON object per row
    * (the common relational embedding of the clause).
    */
  def matchRow(json: Column, pattern: MatchPattern.Pat,
      exact: Boolean = false): Query =
    matchImpl(df.withColumn("_match_elem", json), pattern, exact)

  private def matchImpl(d0: DataFrame, pattern: MatchPattern.Pat,
      exact: Boolean): Query = {
    val (gen, bindNames, wheres) =
      MatchPattern.compile(pattern, col("_match_elem"), exact)
    bindNames.foreach { n =>
      require(!vars.contains(n), s"variable '$n' already bound") }
    // the generator emits 0 rows (no match) or 1 row of bindings:
    // predicate + extraction in one Generate node, one JSON parse/row
    val bound = d0.select(col("*"), gen.as("_match_ok" +: bindNames))
    val filtered = wheres.foldLeft(bound)(_ filter _)
      .drop("_match_elem", "_match_ok")
    next(filtered, vars ++ bindNames)
  }

  // ---- select (terminals) ------------------------------------------
  /** Tuple-constructor select: the projection, applied last like the
    * reference's Select (clause order preserved, select moved to end —
    * `Preprocessor.py:392-404`). Sort order from a preceding orderBy is
    * preserved through the projection.
    */
  def select(cols: (String, Column)*): DataFrame =
    df.select(cols.map { case (n, e) => e.as(n) }: _*)

  /** Raw-value select (single expression → one `value` column). */
  def selectValue(e: Column): DataFrame = df.select(e.as("value"))

  /** Set-container select: `{select …}` → distinct. */
  def selectDistinct(cols: (String, Column)*): DataFrame =
    select(cols: _*).distinct()

  /** Map-container select `{select k : v}` → (key, value) columns,
    * intuitive orientation (deviation from the reference's swapped
    * internals documented in SURVEY §2.1 #2).
    */
  def selectKV(k: Column, v: Column): DataFrame =
    df.select(k.as("key"), v.as("value"))

  /** Materialize `{select k : v}` as a Scala Map (the reference's
    * dict return type, Executor.py:132-139). Driver-side — bounded
    * results only.
    */
  def collectMap[K, V](k: Column, v: Column): Map[K, V] =
    selectKV(k, v).collect()
      .map(r => r.get(0).asInstanceOf[K] -> r.get(1).asInstanceOf[V]).toMap

  /** The current binding stream as-is (all variables as columns). */
  def toDF: DataFrame = df
}

object Query {
  /** Seed: the reference starts every query from one empty tuple
    * (`Executor.py:114-121`); binding the first source replaces it.
    */
  def apply(): Query = new Query(None, Vector.empty)

  def forIn(name: String, src: DataFrame, hint: String = ""): Query =
    apply().forIn(name, src, hint)
}
