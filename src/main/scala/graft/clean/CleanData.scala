package graft.clean

import graft.core.{CategoryInfo, Cols, GraftFrame, Sanitize}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Type-cleaning stage: the Spark-native re-expression of the reference's
  * `clean_data` pipeline (`/root/reference/src/tasks.py:243–272`):
  * convert_dtypes → _replace_na → _column_wrangler → _obj_wrangler →
  * _factor_wrangler → _check_model_assumptions.
  *
  * Unlike the reference (six eager full-frame passes), every step here is a
  * lazy DataFrame transform; only `parseStrings`, `convertDtypes`, and the
  * dummy/category detection in `factorWrangler` run one aggregate job each
  * to learn data-dependent facts (parseability, integer-valuedness,
  * distinct value sets) — a single `agg` per stage, not per column
  * (SURVEY.md §4; the factorWrangler job count is pinned by a
  * ScalePostureSpec test).
  */
object CleanData {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  private val integralTypes: Set[DataType] =
    Set(ByteType, ShortType, IntegerType, LongType)

  private def isNumeric(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _              => false
  }

  /** Parse string columns whose non-null values are all numeric (→ double)
    * or all boolean (→ boolean). pandas gets this for free because
    * `read_csv` recognises NA sentinels at parse time and types the rest;
    * Spark's CSV reader knows only one nullValue, so after frame-wide
    * sentinel replacement ([[replaceNa]]) this pass restores the types the
    * reference's reader would have produced. ONE aggregate job (try_cast
    * counts per column); numeric wins over boolean ("0"/"1" strings stay
    * numeric so the dummy-detect heuristic decides, as in pandas).
    */
  def parseStrings(df: DataFrame): DataFrame = {
    val stringCols = df.schema.fields.collect { case f if f.dataType == StringType => f.name }.toIndexedSeq
    if (stringCols.isEmpty) return df
    val checks = stringCols.flatMap { c =>
      Seq(
        count(Cols.q(c)).as(s"cnt_$c"),
        count(expr(s"try_cast(`$c` AS DOUBLE)")).as(s"dbl_$c"),
        count(when(lower(Cols.q(c)).isin("true", "false"), lit(1))).as(s"bool_$c"))
    }
    val row = graft.core.Jobs.collectFast(df.agg(checks.head, checks.tail: _*))(0)
    val (toDouble, toBool) = stringCols.foldLeft((Set.empty[String], Set.empty[String])) {
      case ((ds, bs), c) =>
        val cnt = row.getAs[Long](s"cnt_$c")
        if (cnt > 0 && row.getAs[Long](s"dbl_$c") == cnt) (ds + c, bs)
        else if (cnt > 0 && row.getAs[Long](s"bool_$c") == cnt) (ds, bs + c)
        else (ds, bs)
    }
    if (toDouble.isEmpty && toBool.isEmpty) df
    else df.select(df.columns.toIndexedSeq.map { c =>
      if (toDouble(c)) Cols.q(c).cast(DoubleType).as(c)
      else if (toBool(c)) Cols.q(c).cast(BooleanType).as(c)
      else Cols.q(c)
    }: _*)
  }

  /** pandas `convert_dtypes` equivalent (tasks.py:261): tighten
    * integer-valued float columns to LongType. Runs ONE aggregate job over
    * all double columns. Columns with any fractional or out-of-long-range
    * value stay double; all-null double columns stay double.
    */
  def convertDtypes(df: DataFrame): DataFrame = {
    val doubleCols = df.schema.fields.collect {
      case f if f.dataType == DoubleType || f.dataType == FloatType => f.name
    }.toIndexedSeq
    if (doubleCols.isEmpty) return df
    // integer-valued & in-range & has at least one value
    val checks = doubleCols.flatMap { c =>
      Seq(
        max(when(Cols.q(c) =!= floor(Cols.q(c)) || abs(Cols.q(c)) > lit(9.007199254740992e15), lit(1)).otherwise(lit(0)))
          .as(s"frac_$c"),
        count(Cols.q(c)).as(s"cnt_$c")
      )
    }
    val row = graft.core.Jobs.collectFast(df.agg(checks.head, checks.tail: _*))(0)
    val toLong = doubleCols.filter { c =>
      val frac = Option(row.getAs[Any](s"frac_$c")).fold(0)(_.toString.toInt)
      val cnt  = row.getAs[Long](s"cnt_$c")
      frac == 0 && cnt > 0
    }.toSet
    if (toLong.isEmpty) df
    else df.select(df.columns.toIndexedSeq.map { c =>
      if (toLong(c)) Cols.q(c).cast(LongType).as(c) else Cols.q(c)
    }: _*)
  }

  /** `_replace_na` (tasks.py:100–108): frame-wide, any cell whose value is in
    * `naValues` becomes null. Each column only compares against
    * TYPE-COMPATIBLE sentinels — under Spark 4's default ANSI mode,
    * `isin("NA")` on a double column would otherwise coerce the literal and
    * throw CAST_INVALID_INPUT (and pandas `replace` never cross-matches a
    * string sentinel against a numeric cell anyway).
    */
  def replaceNa(df: DataFrame, naValues: Seq[Any]): DataFrame =
    if (naValues == null || naValues.isEmpty) df
    else
      df.select(df.columns.toIndexedSeq.map { c =>
        val vals = df.schema(c).dataType match {
          case _: NumericType => naValues.collect { case n: java.lang.Number => n }
          case BooleanType    => naValues.collect { case b: java.lang.Boolean => b }
          case _              => naValues.map(String.valueOf)
        }
        if (vals.isEmpty) Cols.q(c)
        else when(Cols.q(c).isin(vals: _*), lit(null)).otherwise(Cols.q(c)).as(c)
      }: _*)

  /** `_obj_wrangler` (tasks.py:124–131): object→string cast. Spark columns
    * are already typed, so this is an identity stage kept for parity.
    */
  def objWrangler(df: DataFrame): DataFrame = df

  /** `_check_model_assumptions` (tasks.py:235–240): documented identity
    * extension point.
    */
  def checkModelAssumptions(df: DataFrame): DataFrame = df

  /** `_factor_wrangler` (tasks.py:134–232). Categorical typing:
    *  (a) `strToCat`: every string column becomes a categorical whose
    *      default category set is its distinct values in alphanumeric order
    *      (tasks.py:160–163, 188–192);
    *  (b) `dummyToBool`: numeric columns whose distinct non-null values sum
    *      to 1 become boolean (tasks.py:193–208) — the reference heuristic is
    *      sum-based, not set-based: {0,1}, {0.0,1.0}, {1}, and even {2,−1}
    *      all convert; we preserve that quirk;
    *  (c) `catCols` forced categorical; (d) explicit `categories` lists pin
    *      the category set and order, values outside the list become null
    *      (tasks.py:217–223); (e) `orderedCols` marks ordered.
    *
    * Distinct-value discovery for (a)+(b) runs as ONE aggregate job — a
    * [[graft.functions.BoundedCollectSet]] per relevant column, whose buffer
    * stops growing at `maxCategories + 1` elements. The same pass yields
    * both the exact distinct set (when small enough to become categorical)
    * and the cardinality decision (a saturated result means "too many"):
    * a column with more than `maxCategories` distinct values (ids, free
    * text) never ships its full value set to the driver; it simply stays
    * untyped (and cannot be a 0/1 dummy anyway). PARITY NOTE: the reference
    * `_factor_wrangler` applies no cap at all — the generous default
    * (10000) makes divergence unlikely, and gated-out columns are logged so
    * the silent type change is observable.
    */
  def factorWrangler(
      gf: GraftFrame,
      catCols: Seq[String] = Nil,
      orderedCols: Seq[String] = Nil,
      categories: Map[String, Seq[String]] = Map.empty,
      strToCat: Boolean = true,
      dummyToBool: Boolean = true,
      maxCategories: Int = 10000): GraftFrame = {
    val df     = gf.df
    val fields = df.schema.fields.toIndexedSeq

    val numericCols = fields.filter(f => isNumeric(f.dataType)).map(_.name)
    val stringCols  = fields.filter(_.dataType == StringType).map(_.name)

    // Columns whose distinct sets we need: numeric (dummy detect) + the
    // future categorical columns without an explicit category list.
    val wantCat: Seq[String] =
      ((if (strToCat) stringCols else IndexedSeq.empty[String]) ++ catCols).distinct
    val needSets0: Seq[String] =
      ((if (dummyToBool) numericCols else IndexedSeq.empty[String]) ++
        wantCat.filterNot(categories.contains)).distinct

    // ONE aggregate job: bounded collect-set per column. A result of length
    // cap (= maxCategories + 1) is the overflow signal — that column is
    // gated out (its exact set was never fully shipped: the buffer stopped
    // growing at the cap on the executors).
    val cap = maxCategories + 1
    val sets: Map[String, Seq[Any]] =
      if (needSets0.isEmpty) Map.empty
      else {
        val aggs = needSets0.map(c => graft.functions.BoundedCollectSet(Cols.q(c), cap).as(c))
        val row  = graft.core.Jobs.collectFast(df.agg(aggs.head, aggs.tail: _*))(0)
        val all  = needSets0.map(c => c -> row.getSeq[Any](row.fieldIndex(c)).toIndexedSeq).toMap
        val (kept, gatedOut) = all.partition(_._2.size < cap)
        if (gatedOut.nonEmpty)
          log.info(
            s"factorWrangler cardinality gate: column(s) ${gatedOut.keys.toSeq.sorted.mkString(", ")} " +
              s"exceed maxCategories=$maxCategories distinct values and stay untyped " +
              "(the reference applies no cap; raise maxCategories to match it exactly)")
        kept
      }
    val gated: Set[String] = sets.keySet

    // (b) dummy→bool: nansum of distinct values == 1 (tasks.py:195–204)
    val boolCols: Set[String] =
      if (!dummyToBool) Set.empty
      else
        numericCols.filter { c =>
          // np.nansum semantics: NaN values in the distinct set are ignored,
          // not propagated (collect_set keeps NaN, only nulls are dropped)
          val vs = sets
            .getOrElse(c, Nil)
            .map {
              case n: java.lang.Number => n.doubleValue()
              case _                   => Double.NaN
            }
            .filterNot(_.isNaN)
          vs.nonEmpty && vs.sum == 1.0
        }.toSet

    var out = df.select(fields.map { f =>
      if (boolCols(f.name)) Cols.q(f.name).cast(BooleanType).as(f.name)
      else Cols.q(f.name)
    }: _*)

    // (a)+(c)+(d): assemble category metadata; columns rejected by the
    // cardinality gate (no declared list, too many distinct values) stay
    // plain string
    var cats = gf.cats
    wantCat.foreach { c =>
      val declared = categories.get(c)
      if (declared.nonEmpty || gated(c)) {
        val values: Seq[String] = declared.getOrElse {
          sets.getOrElse(c, Nil).map(String.valueOf).sorted // alphanumeric default order
        }
        cats = cats + (c -> CategoryInfo(values, ordered = false))
        declared.foreach { cs =>
          // values outside the declared list become null (tasks.py:217–223)
          out = out.withColumn(c, when(Cols.q(c).isin(cs: _*), Cols.q(c)).otherwise(lit(null).cast(StringType)))
        }
      }
    }
    // (e) ordered
    orderedCols.foreach { c =>
      cats.get(c).foreach(info => cats = cats + (c -> info.copy(ordered = true)))
    }
    GraftFrame(out, cats)
  }

  /** `clean_data` (tasks.py:243–272): the full fixed pipeline. */
  def apply(
      df: DataFrame,
      naValues: Seq[Any] = Nil,
      catCols: Seq[String] = Nil,
      orderedCols: Seq[String] = Nil,
      categories: Map[String, Seq[String]] = Map.empty,
      strToCat: Boolean = true,
      dummyToBool: Boolean = true): GraftFrame = {
    val sanitize = (s: Seq[String]) => Sanitize.sanitizeColNames(s).getOrElse(Nil)
    // NA sentinels must be nulled BEFORE type parsing (pandas' reader does
    // both at parse time; tasks.py:261 then re-infers with convert_dtypes)
    val staged = checkModelAssumptions(
      objWrangler(
        Sanitize.columnWrangler(
          convertDtypes(parseStrings(replaceNa(df, naValues))))))
    factorWrangler(
      GraftFrame(staged),
      sanitize(catCols),
      sanitize(orderedCols),
      categories.map { case (k, v) => Sanitize.cleanText(k) -> v },
      strToCat,
      dummyToBool)
  }
}
