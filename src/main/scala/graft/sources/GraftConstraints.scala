package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{BindReferences, Expression}
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.types.StructType

/** CHECK CONSTRAINTS — writer-enforced data-quality contracts (the
  * Delta `ADD CONSTRAINT` shape). `CALL system.add_constraint(table,
  * name, expr)` validates the EXISTING rows satisfy the expression
  * (one scan; refused loudly with the violation count otherwise),
  * persists it as a `_graft_constraints` root sidecar, and from then
  * on EVERY write route — batch append, INSERT INTO, streaming epoch,
  * COW rewrite, MOR update image — evaluates the compiled predicate
  * per row inside the task writer and refuses the write on the first
  * violating row, naming the constraint. SQL three-valued semantics:
  * only FALSE violates; NULL passes (the standard CHECK contract).
  *
  * Expressions are parsed once at write PLANNING (driver-side,
  * resolved by name against the write schema, deterministic-only, no
  * subqueries) and ship to tasks as bound catalyst expressions — the
  * per-row cost is one codegen'd predicate call, the same machinery a
  * WHERE clause pays. A write whose schema lacks a referenced column
  * refuses at plan time; RENAME/DROP COLUMN refuse while a constraint
  * references the column (drop the constraint first) — a constraint
  * can never silently stop being enforced. */
object GraftConstraints {

  val ConstraintsFile = "_graft_constraints"

  private def conf = GraftParquetWrite.sessionConf()

  /** Deliberately UNCACHED — unlike the bloom/sort/colstats sidecars
    * (where staleness costs only coverage or plan quality), a stale
    * EMPTY read here would let another JVM write unchecked rows. Reads
    * happen once per write PLANNING (not per scan), so the one tiny
    * file read is negligible next to the write it guards. */
  def read(table: String): Seq[(String, String)] = {
    val f = new Path(table, ConstraintsFile)
    val fs = f.getFileSystem(conf)
    if (!fs.exists(f)) Nil
    else {
      val in = fs.open(f)
      val body = try scala.io.Source.fromInputStream(in, "UTF-8")
        .mkString finally in.close()
      body.split('\n').filter(_.nonEmpty).toSeq.map { l =>
        val cut = l.indexOf('\t')
        // loud, named failure on a malformed line — silently returning
        // garbage (or the old substring(0, -1) crash at EVERY write
        // planning) would brick the table's write path with no pointer
        // at the cause
        if (cut < 0) throw new IllegalStateException(
          s"graft constraints: malformed line (no name\\texpr " +
            s"separator) in sidecar $f: '$l' — the file was edited " +
            "outside add()/drop(); repair or delete it")
        (l.substring(0, cut), l.substring(cut + 1))
      }
    }
  }

  private def write(table: String, cs: Seq[(String, String)]): Unit = {
    val f = new Path(table, ConstraintsFile)
    val fs = f.getFileSystem(conf)
    val tmp = new Path(table,
      s"_tmp_constraints-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write(cs.map { case (n, e) => s"$n\t$e" }
      .mkString("\n").getBytes("UTF-8"))
    finally out.close()
    fs.delete(f, false)
    require(fs.rename(tmp, f),
      s"graft constraints: could not persist at $f")
  }

  /** Parse + analyze `exprSql` against `schema` through the session's
    * REAL analyzer (name resolution, implicit type coercion, boolean
    * enforcement via the Filter contract, proper error messages): the
    * result must be a deterministic BOOLEAN over the row alone — no
    * subqueries. Returns the analyzed condition together with the
    * attribute seq it resolves against (binding must reuse them). */
  private def analyzed(spark: SparkSession, exprSql: String,
      schema: StructType): (Expression,
        Seq[org.apache.spark.sql.catalyst.expressions.AttributeReference]) = {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, LocalRelation}
    val attrs = DataTypeUtils.toAttributes(schema)
    val parsed = try spark.sessionState.sqlParser.parseExpression(exprSql)
    catch {
      case e: Exception => throw new IllegalArgumentException(
        s"graft constraint: cannot parse '$exprSql': ${e.getMessage}")
    }
    val cond = try {
      val plan = spark.sessionState.analyzer
        .execute(Filter(parsed, LocalRelation(attrs)))
      spark.sessionState.analyzer.checkAnalysis(plan)
      plan.collectFirst { case f: Filter => f.condition }.getOrElse(
        throw new IllegalStateException("analysis lost the Filter"))
    } catch {
      case e: IllegalArgumentException => throw e
      case e: Exception => throw new IllegalArgumentException(
        s"graft constraint: '$exprSql' invalid against schema " +
          s"${schema.fieldNames.mkString("[", ", ", "]")}: ${e.getMessage}")
    }
    require(cond.find(_.isInstanceOf[
        org.apache.spark.sql.catalyst.expressions.PlanExpression[_]]).isEmpty,
      s"graft constraint: '$exprSql' contains a subquery — constraints " +
        "are row-local")
    require(cond.deterministic,
      s"graft constraint: '$exprSql' is non-deterministic")
    (cond, attrs)
  }

  /** Loud plan-time validation only (parse/resolve/type/determinism). */
  def resolve(spark: SparkSession, exprSql: String,
      schema: StructType): Expression =
    analyzed(spark, exprSql, schema)._1

  /** The write-planning hook: every persisted constraint bound to the
    * WRITE schema (ordinals the task rows use). A write that cannot
    * enforce a constraint (missing column) refuses here, before any
    * task launches. */
  def boundFor(spark: SparkSession, table: String,
      writeSchema: StructType): Seq[(String, Expression)] =
    read(table).map { case (name, exprSql) =>
      val (resolved, attrs) = analyzed(spark, exprSql, writeSchema)
      // CHECK passes NULL (SQL standard), but a codegen'd predicate
      // folds null to false — enforce `expr IS NULL OR expr` so only
      // provable FALSE violates
      val nullPasses = org.apache.spark.sql.catalyst.expressions.Or(
        org.apache.spark.sql.catalyst.expressions.IsNull(resolved),
        resolved)
      name -> BindReferences.bindReference(nullPasses, attrs)
    }

  /** ADD: refuse duplicates, validate the expression, then validate
    * the EXISTING data in one scan (violations = rows where the
    * predicate is provably FALSE — null passes). Returns the number of
    * live rows checked. */
  def add(spark: SparkSession, table: String, name: String,
      exprSql: String): Long = {
    require(name.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"graft constraint: invalid name '$name'")
    // the sidecar is newline-separated, tab-split: a raw newline or tab
    // in the expression TEXT would corrupt it (and brick every later
    // write planning). Refused rather than escaped — SQL already gives
    // single-line spellings for both (the '\n'/'\t' character escapes
    // inside string literals), so nothing is inexpressible.
    require(!exprSql.exists(c => c == '\n' || c == '\r' || c == '\t'),
      s"graft constraint: expression text contains a literal newline/" +
        "tab — write it on one line (use the \\n/\\t escapes inside " +
        "string literals)")
    val existing = read(table)
    require(!existing.exists(_._1.equalsIgnoreCase(name)),
      s"graft constraint: '$name' already exists on $table")
    val df = spark.read.format("graft.sources.GraftParquetTableProvider")
      .option("path", table).load()
    resolve(spark, exprSql, df.schema) // loud plan-time validation
    import org.apache.spark.sql.functions.{count => cnt, expr, lit, sum, when}
    val row = df.agg(cnt(lit(1)).as("n"),
      sum(when(expr(exprSql) <=> lit(false), 1L).otherwise(0L))
        .as("bad")).head()
    val (n, bad) = (row.getLong(0), if (row.isNullAt(1)) 0L else row.getLong(1))
    require(bad == 0L,
      s"graft constraint: $bad of $n existing rows violate " +
        s"'$exprSql' — constraint '$name' refused")
    write(table, existing :+ (name, exprSql))
    n
  }

  def drop(table: String, name: String): Unit = {
    val existing = read(table)
    require(existing.exists(_._1.equalsIgnoreCase(name)),
      s"graft constraint: no constraint '$name' on $table — have " +
        existing.map(_._1).mkString("[", ", ", "]"))
    write(table, existing.filterNot(_._1.equalsIgnoreCase(name)))
  }

  /** DDL guard: refuse RENAME/DROP of a column any constraint
    * references — enforcement must never silently lapse. */
  def refuseIfReferenced(spark: SparkSession, table: String,
      column: String, schema: StructType): Unit =
    read(table).foreach { case (name, exprSql) =>
      val refs = spark.sessionState.sqlParser.parseExpression(exprSql)
        .collect { case u: UnresolvedAttribute => u.name }
      require(!refs.exists(_.equalsIgnoreCase(column)),
        s"graft constraint: '$name' (`$exprSql`) references column " +
          s"'$column' — drop the constraint before altering the column")
    }
}
