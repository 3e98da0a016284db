package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class GraftExtensionsSpec extends AnyFunSuite with Matchers {

  test("extensions class injects the three native functions") {
    // apply against a fresh extensions container and verify the injections
    val ext = new SparkSessionExtensions
    noException should be thrownBy new GraftExtensions().apply(ext)
    // behavior check through a real session (shared): registry route
    val spark = SparkSpec.spark
    graft.functions.VectorExpressions.register(spark)
    spark.sql(
      "SELECT graft_dot(array(cast(2.0 as float)), array(cast(3.0 as float)))")
      .collect()(0).getDouble(0) shouldBe 6.0
  }
}
