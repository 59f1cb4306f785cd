package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset-shape operators: the reference's virtual-dataset functions
  * (`transpose`, `merge`, `sample` — SURVEY §2.3) and the `melt`
  * procedure (`/root/reference/builtin/melt_procedure.cc:205`),
  * re-expressed as DataFrame→DataFrame combinators.
  */
object Reshape {

  /** Wide → long: keep `idCols`, turn `valueCols` into (column, value)
    * rows. Values are cast to a common type (string by default —
    * MLDB cells are dynamically typed; callers doing numeric work pass
    * castTo="double"). Reference: melt procedure
    * (`builtin/melt_procedure.cc:205`); implemented with `stack`
    * (narrow, no shuffle). */
  def melt(df: DataFrame, idCols: Seq[String], valueCols: Seq[String],
      varName: String = "column", valueName: String = "value",
      castTo: String = "string"): DataFrame = {
    val stackArgs = valueCols
      .map(c => s"'$c', cast(`$c` as $castTo)").mkString(", ")
    df.select((idCols.map(col) :+
      expr(s"stack(${valueCols.size}, $stackArgs) as (`$varName`, `$valueName`)")): _*)
  }

  /** Long → wide: pivot `varCol`'s values (must be enumerated for a
    * deterministic schema — at scale you never want the extra
    * distinct-scan pass Spark otherwise runs) into columns. */
  def widen(df: DataFrame, idCols: Seq[String], varCol: String,
      valueCol: String, values: Seq[String]): DataFrame =
    df.groupBy(idCols.map(col): _*)
      .pivot(varCol, values)
      .agg(first(col(valueCol)))

  /** Transpose: rows ↔ columns, via melt + pivot. `idCol` becomes the
    * column axis; former columns become rows. Only sensible for
    * narrow-ish frames (the output schema is one column per input
    * row) — same practical restriction the reference's lazy
    * `transposed_dataset` has (`builtin/transposed_dataset.cc:393`),
    * where reading a full row of the transpose scans every column.
    * `rowIds` enumerates the new columns (= distinct values of idCol). */
  def transpose(df: DataFrame, idCol: String, rowIds: Seq[String],
      castTo: String = "double"): DataFrame = {
    val valueCols = df.columns.filterNot(_ == idCol).toSeq
    val long = melt(df, Seq(idCol), valueCols, "column", "value", castTo)
    widen(long, Seq("column"), idCol, "value", rowIds)
  }

  /** `COLUMN EXPR (AS … WHERE … ORDER BY … LIMIT …)` — the
    * meta-projection over the COLUMN SET
    * (`/root/reference/sql/sql_expression_operations.h:560`, doc
    * `sql/SelectExpression.md:43-96`). With a static schema this is
    * pure driver-side logic over `df.columns`: filter column names,
    * order them, limit, rename — no data movement at all. */
  def selectColumnsExpr(df: DataFrame,
      where: String => Boolean = _ => true,
      orderBy: Option[Ordering[String]] = None,
      limit: Option[Int] = None,
      rename: String => String = identity): DataFrame = {
    var names = df.columns.toSeq.filter(where)
    orderBy.foreach(o => names = names.sorted(o))
    limit.foreach(l => names = names.take(l))
    df.select(names.map(c => col(c).as(rename(c))): _*)
  }

  /** MLDB `merge(a, b)`: cell-wise overlay keyed on the row id; b's
    * value wins where both define a cell (the reference keeps both
    * timestamped values; in wide mode we take the later dataset —
    * documented divergence, SURVEY §1.4). Non-key columns present in
    * only one input pass through as-is. Full-outer shuffle join on the
    * key — co-partitions at scale; key skew is not expected on row
    * ids. */
  def merge(a: DataFrame, b: DataFrame, key: String): DataFrame = {
    val common = a.columns.toSet.intersect(b.columns.toSet) - key
    val aOnly = a.columns.filterNot(c => common(c) || c == key)
    val bOnly = b.columns.filterNot(c => common(c) || c == key)
    val al = a.alias("l")
    val bl = b.alias("r")
    val cols: Seq[Column] =
      Seq(coalesce(col(s"l.$key"), col(s"r.$key")).as(key)) ++
      common.toSeq.sorted.map(c => coalesce(col(s"r.$c"), col(s"l.$c")).as(c)) ++
      aOnly.map(c => col(s"l.$c").as(c)) ++
      bOnly.map(c => col(s"r.$c").as(c))
    al.join(bl, col(s"l.$key") === col(s"r.$key"), "full_outer").select(cols: _*)
  }

  /** Deterministic pseudo-sample: keep rows whose key ≡ residues mod
    * m — the distributable analog of the reference's
    * `rowHash() % k = j` sampling shortcut
    * (`core/dataset.cc:1263-1950` WHERE optimization). Pure filter —
    * pushed to the scan, no shuffle. */
  def moduloSample(df: DataFrame, keyCol: String, m: Int, keep: Int): DataFrame =
    df.filter(pmod(col(keyCol), lit(m)) < keep)

  /** True random sample — reference `sample(ds, {...})`
    * (`builtin/sampled_dataset.cc`). */
  def sample(df: DataFrame, fraction: Double, withReplacement: Boolean = false,
      seed: Long = 42L): DataFrame =
    df.sample(withReplacement, fraction, seed)
}
