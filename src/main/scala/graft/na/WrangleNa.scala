package graft.na

import graft.core.{Cols, GraftFrame}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Missing-value handling — reference `wrangle_na`
  * (`/root/reference/src/tasks.py:313–472`). Strategies:
  *
  *  - `cc` complete-case: drop any row containing a null (tasks.py:381–383).
  *  - `fi` fill-in: float columns ← mean, integer columns ← exact median,
  *    boolean/categorical columns ← deterministic mode where ties break to
  *    the SMALLEST value in sort order — pandas `DataFrame.mode().loc[0]`
  *    (tasks.py:398–421). If the frame has no nulls at all the input is
  *    returned unchanged (tasks.py:372–379).
  *  - `fii` fill-in + indicators: `fi` plus one boolean dummy per observed
  *    null-pattern bitstring over the columns in column order, named
  *    `na_<bits>`, all-zeros pattern omitted (tasks.py:385–396). Indicators
  *    reflect PRE-imputation nulls appended to the imputed frame.
  *  - `gm` grand-model: `fii` plus feature × indicator interaction columns
  *    (tasks.py:423–441); see [[Interactions]].
  *
  * Scale design: all fill statistics for every column come from ONE
  * aggregate job (means + exact percentiles + null counts); modes come from
  * one melted groupBy job over only the mode-typed columns. The fill itself
  * is a pure projection (`coalesce`), so the imputation composes lazily with
  * the surrounding plan. Exact `percentile` is used here (oracle mode);
  * `percentile_approx` is the documented switch for the 100 TB path
  * (SURVEY.md §7.4.5).
  */
object WrangleNa {

  private def isIntegral(dt: DataType) = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _                                             => false
  }
  private def isFloat(dt: DataType) = dt == DoubleType || dt == FloatType

  /** Complete-case drop. Row identity: callers that need pandas-style
    * surviving row labels should carry an explicit `row_id` column from
    * ingest (SURVEY.md §7.4.2) — the drop preserves it like any other column.
    */
  def cc(gf: GraftFrame, cols: Seq[String] = Nil): GraftFrame =
    gf.mapDf(df => if (cols.isEmpty) df.na.drop() else df.na.drop(cols))

  /** Computed fill values for `fi`: one agg job + one melted mode job.
    * `mode` flips the integer-median statistic between exact `percentile`
    * (oracle runs) and `percentile_approx` (the 100 TB path,
    * SURVEY.md §7.4.5).
    */
  private def fillValues(
      gf: GraftFrame,
      mode: graft.core.ScaleMode): (Map[String, Any], Boolean) = {
    val df     = gf.df
    val fields = df.schema.fields.toIndexedSeq

    val floatCols = fields.filter(f => isFloat(f.dataType) && !gf.cats.contains(f.name)).map(_.name)
    val intCols   = fields.filter(f => isIntegral(f.dataType) && !gf.cats.contains(f.name)).map(_.name)
    val modeCols = fields
      .filter(f => f.dataType == BooleanType || gf.cats.contains(f.name))
      .map(_.name)

    val statAggs: Seq[Column] =
      fields.map(f => sum(Cols.q(f.name).isNull.cast(LongType)).as(s"nulls_${f.name}")) ++
        floatCols.map(c => avg(Cols.q(c)).as(s"mean_$c")) ++
        intCols.map(c => graft.core.Stats.percentile(Cols.q(c), 0.5, mode).as(s"med_$c"))

    val row      = graft.core.Jobs.collectFast(df.agg(statAggs.head, statAggs.tail: _*))(0)
    val anyNulls = fields.exists(f => row.getAs[Long](s"nulls_${f.name}") > 0)
    if (!anyNulls) return (Map.empty, false)

    val means = floatCols.flatMap { c =>
      Option(row.getAs[Any](s"mean_$c")).map(v => c -> v)
    }
    val medians = intCols.flatMap { c =>
      Option(row.getAs[Any](s"med_$c")).map(v => c -> v)
    }

    // Deterministic mode per mode-typed column: melt to (col, value) then a
    // single groupBy + per-column argmax with the count-desc, value-asc
    // tie-break (SURVEY.md §2 A12). Only columns that actually have nulls
    // need a mode — skipping the rest saves the melt job entirely when the
    // categorical columns are fully observed.
    val needMode = modeCols.filter(c => row.getAs[Long](s"nulls_$c") > 0)
    val modes: Seq[(String, Any)] =
      if (needMode.isEmpty) Nil
      else {
        val melted = df
          .select(explode(array(needMode.map(c =>
            struct(lit(c).as("c"), Cols.q(c).cast(StringType).as("v"))): _*)).as("kv"))
          .select(col("kv.c").as("c"), col("kv.v").as("v"))
          .where(col("v").isNotNull)
          .groupBy("c", "v")
          .count()
        import org.apache.spark.sql.expressions.Window
        // smallest-VALUE tie-break: numeric-castable values compare
        // numerically (the melt stringifies them, and "10" < "2" as strings
        // would break the pandas mode().loc[0] contract for numeric
        // categoricals); non-numeric values fall through to string order
        val w = Window
          .partitionBy("c")
          .orderBy(
            col("count").desc,
            expr("try_cast(v AS DOUBLE)").asc_nulls_last,
            col("v").asc)
        graft.core.Jobs
          .collectFast(melted
            .withColumn("rn", row_number().over(w))
            .where(col("rn") === 1))
          .map(r => r.getString(0) -> (r.getString(1): Any))
          .toIndexedSeq
      }
    ((means ++ medians ++ modes).toMap, true)
  }

  /** Fill-in imputation. Integer columns whose median is fractional are
    * promoted to double (pandas fills Int64 with a float → Float64,
    * tasks.py:357–360 post-condition).
    */
  def fi(gf: GraftFrame, mode: graft.core.ScaleMode = graft.core.ScaleMode.Exact): GraftFrame = {
    val (fills, anyNulls) = fillValues(gf, mode)
    if (!anyNulls) return gf
    gf.mapDf(applyFill(_, gf, fills))
  }

  private def applyFill(df: DataFrame, gf: GraftFrame, fills: Map[String, Any]): DataFrame =
    df.select(df.schema.fields.toIndexedSeq.map { f =>
      fills.get(f.name) match {
        case None => Cols.q(f.name)
        case Some(v) =>
          val fillLit = (f.dataType, v) match {
            case (BooleanType, s: String) => lit(s.toBoolean)
            case (dt, s: String) if gf.cats.contains(f.name) && !isNumericString(dt) => lit(s)
            case (dt, s: String) => lit(s).cast(dt)
            case (dt, n) if isIntegral(f.dataType) =>
              val d = n.asInstanceOf[Number].doubleValue()
              if (d == math.floor(d)) lit(d.toLong).cast(f.dataType) else lit(d)
            case _ => lit(v)
          }
          coalesce(Cols.q(f.name).cast(promoted(f.dataType, v)), fillLit.cast(promoted(f.dataType, v))).as(f.name)
      }
    }: _*)

  private def isNumericString(dt: DataType) = dt match {
    case _: NumericType => true
    case _              => false
  }

  /** Int column + fractional median ⇒ DoubleType; otherwise keep the type. */
  private def promoted(dt: DataType, fill: Any): DataType = (dt, fill) match {
    case (t, n: Number) if isIntegral(t) && n.doubleValue() != math.floor(n.doubleValue()) => DoubleType
    case (t, _) => t
  }

  /** Null-pattern bitstring over all columns in column order. */
  private def patternCol(df: DataFrame): Column =
    concat(df.columns.toIndexedSeq.map(c => when(Cols.q(c).isNull, lit("1")).otherwise(lit("0"))): _*)

  /** Fill-in + per-pattern indicator dummies (`fii`).
    *
    * The distinct null-pattern set is worst-case 2^cols and each pattern
    * becomes a driver-side plan column, so the collect is CAPPED: at most
    * `maxPatterns + 1` distinct patterns ship to the driver (`limit` runs
    * inside the same job — executors stop early once the limit is hit),
    * and exceeding `maxPatterns` fails fast with a clear message instead of
    * OOMing the driver or building an unplannable million-column select.
    * The reference (tasks.py:385–396) has no cap — pandas materializes the
    * dummies in memory and dies the same way, just later; the default
    * (1024) is far above any real-world missingness structure.
    */
  def fii(gf: GraftFrame, maxPatterns: Int = 1024): GraftFrame = {
    val df       = gf.df
    val pat      = patternCol(df).as("__na_pattern")
    val withPat  = df.withColumn("__na_pattern", pat)
    val zeros    = "0" * df.columns.length
    // all-zeros is dropped BEFORE the limit so the cap counts only patterns
    // that would become columns (otherwise a truncated sample containing
    // zeros could silently under-report the true pattern count)
    val patterns = graft.core.Jobs
      .collectFast(withPat
        .select("__na_pattern").where(col("__na_pattern") =!= zeros)
        .distinct().limit(maxPatterns + 1)).map(_.getString(0))
      .sorted.toIndexedSeq
    if (patterns.length > maxPatterns)
      throw new IllegalArgumentException(
        s"wrangle_na fii: more than $maxPatterns distinct null patterns over " +
          s"${df.columns.length} columns — one indicator column per pattern would not be " +
          "usable as model dummies. Reduce the column set, impute the sparsest columns " +
          "first, or raise maxPatterns explicitly.")
    val imputed = fi(gf.copy(df = withPat)).df
    val withDummies = patterns.foldLeft(imputed) { (d, p) =>
      d.withColumn(s"na_$p", col("__na_pattern") === lit(p))
    }
    gf.copy(df = withDummies.drop("__na_pattern"))
  }

  /** Grand model: `fii` + feature×indicator interactions. Indicator
    * columns are matched by the exact generated shape `na_<bits>` (bit
    * count = input column count) so a pre-existing data column that merely
    * starts with "na_" is treated as a feature, not an indicator.
    */
  def gm(gf: GraftFrame): GraftFrame = {
    val before  = gf.df.columns.toIndexedSeq
    val filled  = fii(gf)
    val indPattern = s"na_[01]{${before.length}}"
    val indCols =
      filled.df.columns.toIndexedSeq.filterNot(before.contains).filter(_.matches(indPattern))
    Interactions.grandModel(filled, before, indCols)
  }

  def apply(gf: GraftFrame, strategy: String, cols: Seq[String] = Nil): GraftFrame =
    strategy match {
      case "cc"  => cc(gf, cols)
      case "fi"  => fi(gf)
      case "fii" => fii(gf)
      case "gm"  => gm(gf)
      case other => throw new IllegalArgumentException(s"unknown na strategy: $other")
    }
}
