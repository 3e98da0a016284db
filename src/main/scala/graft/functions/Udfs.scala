package graft.functions

import scala.reflect.runtime.universe.TypeTag
import org.apache.spark.sql.{Encoder, Encoders, SparkSession, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** §2.11 expression-level extension points.
  *
  * The reference's only user extensibility is job-level (a Python function
  * shipped as a spark-submit script, utils/function_converter.py:12-131) —
  * that surface is `Pipeline.transform`. For parity-plus, the engine also
  * exposes the Spark-native extension ladder (in preference order: builtin
  * functions → custom codegen `Expression` (see `VectorExpressions`) →
  * typed `Aggregator` → scalar UDF as the last resort, since a UDF is an
  * optimization barrier: no codegen fusion, no pushdown through it).
  */
object Udfs {

  /** Register a named scalar UDF — the `spark.udf.register` surface,
    * wrapped so call sites go through one place that documents the cost.
    */
  def registerScalar[I: TypeTag, O: TypeTag](spark: SparkSession, name: String)(f: I => O): Unit =
    spark.udf.register(name, f)

  /** Typed custom aggregate: geometric mean — an `Aggregator[IN, BUF, OUT]`
    * example with map-side partial aggregation (merge) for scale.
    */
  object GeometricMean extends Aggregator[Double, (Double, Long), Double] {
    def zero: (Double, Long) = (0.0, 0L)
    def reduce(b: (Double, Long), a: Double): (Double, Long) =
      if (a > 0) (b._1 + math.log(a), b._2 + 1) else b
    def merge(x: (Double, Long), y: (Double, Long)): (Double, Long) =
      (x._1 + y._1, x._2 + y._2)
    def finish(r: (Double, Long)): Double =
      if (r._2 == 0) 0.0 else math.exp(r._1 / r._2)
    def bufferEncoder: Encoder[(Double, Long)] = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble

    def column: TypedColumn[Double, Double] = this.toColumn
  }
}
