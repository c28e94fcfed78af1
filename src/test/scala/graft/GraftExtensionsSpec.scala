package graft

import org.apache.spark.sql.functions._

class GraftExtensionsSpec extends SparkSpec {

  test("session built with spark.sql.extensions resolves graft functions from SQL") {
    // GraftSession sets spark.sql.extensions=graft.GraftExtensions, so
    // the shared spec session itself must already have them
    val r = spark.sql(
      """SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
                graft_cosine(array(1.0D, 1.0D), array(2.0D, 2.0D)) AS c""").head()
    assert(r.getDouble(0) == 11.0)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
  }

  test("graft_jaro_winkler in SQL equals the static scorer and stays native") {
    val df = spark.sql(
      "SELECT graft_jaro_winkler('DWAYNE', 'DUANE') AS jw")
    assert(math.abs(df.head().getDouble(0) - 0.84) < 1e-12)
    assert(!df.queryExecution.executedPlan.toString.contains("ScalaUDF"))
  }

  test("graft_hash60 in SQL equals the Column-side hash60") {
    val s = spark; import s.implicits._
    val fromSql = spark.sql("SELECT graft_hash60('abc')").head().getLong(0)
    val fromCol = Seq("abc").toDF("x")
      .select(graft.functions.TextAnalysis.hash60(col("x"))).head().getLong(0)
    assert(fromSql == fromCol)
  }

  test("graft_cosine widens float arrays (embedding columns) to double") {
    val s = spark; import s.implicits._
    Seq((Array(1.0f, 0.0f), Array(0.0f, 1.0f))).toDF("a", "b")
      .createOrReplaceTempView("__ext_vecs")
    val c = spark.sql("SELECT graft_cosine(a, b) FROM __ext_vecs").head().getDouble(0)
    assert(math.abs(c) < 1e-12)
  }

  test("graft_dot from SQL stays a native expression (no ScalaUDF), codegen plan") {
    val df = spark.sql(
      """SELECT graft_dot(transform(sequence(0, 3), i -> CAST(id + i AS DOUBLE)),
                          transform(sequence(0, 3), i -> CAST(id * 2 AS DOUBLE))) AS d
         FROM range(8)""")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan)
    assert(plan.contains("graft_dot"), plan)
    assert(df.count() == 8)
  }

  test("wrong arity fails with the function's own message") {
    val e = intercept[Exception](spark.sql("SELECT graft_dot(array(1.0D))").head())
    assert(e.getMessage.contains("graft_dot") || e.getMessage.contains("argument"))
  }

  test("install retrofits a session whose registry lacks the functions") {
    // dropping the function simulates a foreign session; install restores
    spark.sessionState.functionRegistry.dropFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_hash60"))
    GraftExtensions.install(spark)
    assert(spark.sql("SELECT graft_hash60('x')").head().getLong(0) >= 0L)
  }
}
