package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.fql.{Ast, Compiler, Parser}

/** The user-facing engine: FQL string in, DataFrame out.
  *
  * Analog of the reference's `query.Prepare` + `Statement.Execute` path
  * (`pkg/query/prepare.go:35-66`): parse → analyze → plan — except planning
  * emits a declarative Spark logical plan and Catalyst/Tungsten choose the
  * physical strategy (pushdown, codegen, AQE), instead of fossil's hardwired
  * closure chain.
  */
final class FossilEngine(
    val spark: SparkSession,
    store: TopicStore,
    clock: Compiler.Clock = Compiler.systemClock) {

  def parse(fql: String): Ast.Query = Parser.parse(fql)

  /** Execute an FQL query. Returns `(time, topic, value)` rows — the typed
    * analog of fossil's `Entry` stream. */
  def query(fql: String): DataFrame = {
    val ast = parse(fql)
    val entries = store.entries(ast.topic.getOrElse("/"))
    Compiler.compile(ast, entries, clock)
  }

  def catalog: Catalog = store.catalog
}

object FossilEngine {
  /** Engine over an arbitrary `(time, topic, value)` DataFrame (embedded /
    * adapter mode — how the test tables are queried through FQL). */
  def over(df: DataFrame, catalog: Catalog = new Catalog,
      clock: Compiler.Clock = Compiler.systemClock): FossilEngine =
    new FossilEngine(df.sparkSession, new ViewStore(df, catalog), clock)

  def onParquet(spark: SparkSession, root: String,
      clock: Compiler.Clock = Compiler.systemClock): FossilEngine =
    new FossilEngine(spark, new ParquetStore(spark, root), clock)
}
