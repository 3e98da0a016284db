package graft.pipeline

import scala.annotation.tailrec
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Layered configuration with the reference's precedence: runtime (DAG)
  * params > operator params > environment variables > defaults
  * (reference: hdfs_to_iceberg/hdfs_to_iceberg_operator.py:166-179;
  * iceberg_compaction_operator.py:79-84; README.md:790-851).
  */
final case class Config(
    runtime: Map[String, String] = Map.empty,   // DAG-params analog
    operator: Map[String, String] = Map.empty,  // operator-constructor analog
    env: Map[String, String] = sys.env) {

  def get(key: String): Option[String] =
    runtime.get(key).orElse(operator.get(key)).orElse(env.get(key))

  def apply(key: String): String =
    get(key).getOrElse(throw new NoSuchElementException(s"config key '$key' unset at every layer"))

  def getOrElse(key: String, default: => String): String = get(key).getOrElse(default)

  /** A run-scoped override layer (the per-trigger `params` dict). */
  def withRuntime(kv: (String, String)*): Config = copy(runtime = runtime ++ kv)
}

/** Retry policy — the reference's Airflow `retries=2, retry_delay=5min`
  * default_args (airflow-dags/complete_workflow.py:18-19).
  */
final case class RetryPolicy(retries: Int = 2, delayMs: Long = 5 * 60 * 1000L) {
  def run[T](taskId: String)(body: => T): T = {
    @tailrec def attempt(left: Int): T =
      (try Right(body) catch { case e: Exception if left > 0 => Left(e) }) match {
        case Right(v) => v
        case Left(e) =>
          System.err.println(s"[pipeline] task $taskId failed (${e.getMessage}); " +
            s"retrying in ${delayMs}ms (${left - 1} left)")
          Thread.sleep(delayMs)
          attempt(left - 1)
      }
    attempt(retries)
  }
}

/** One named pipeline step. `>>`-chaining mirrors the reference DAG's
  * `transfer >> compact >> age` dependency arrow
  * (airflow-dags/complete_workflow.py:69).
  */
final case class Task(id: String, body: (SparkSession, Config) => Unit) {
  def >>(next: Task): Pipeline = Pipeline(Seq(this, next))
}

final case class Pipeline(tasks: Seq[Task]) {
  def >>(next: Task): Pipeline = Pipeline(tasks :+ next)

  /** Run all tasks in dependency order, each under the retry policy. A task
    * that exhausts its retries aborts the pipeline (downstream tasks don't
    * run) — Airflow's default trigger rule.
    */
  def run(spark: SparkSession, config: Config = Config(),
      retry: RetryPolicy = RetryPolicy(retries = 2, delayMs = 0L)): Unit =
    tasks.foreach(t => retry.run(t.id)(t.body(spark, config)))
}

object Pipeline {
  /** §2.11: the job-level user-function surface. The reference ships Python
    * functions to spark-submit scripts via source extraction
    * (utils/function_converter.py:12-131); in a compiled engine that whole
    * machinery collapses to passing a `DataFrame => DataFrame`.
    */
  def transform(id: String, read: SparkSession => DataFrame,
      fn: DataFrame => DataFrame, write: DataFrame => Unit): Task =
    Task(id, (spark, _) => write(fn(read(spark))))
}
