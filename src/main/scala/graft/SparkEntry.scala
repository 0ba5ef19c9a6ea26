package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query inventory lives in graft.queries.*; each group object exposes a
  * `queries` map (name -> (spark, sfDir) => DataFrame) and an `oracle` map
  * (name -> equivalent DuckDB SQL over the same parquet tables).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * collapsing_net_state is the reference's signature semantic (R10):
    * scan -> case-expr -> aggregate -> sort, end to end.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("collapsing_net_state")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2.
    *
    * Every builder runs inside CacheScope.scoped: frames a builder
    * retains (iterative edge sets, supersteps) are auto-unpersisted
    * right after the action that consumes the returned frame, so no
    * MEMORY_AND_DISK block outlives its query in a long-lived session
    * (Bench opts out — see CacheScope).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    rawQueries.map { case (k, f) =>
      k -> ((s: SparkSession, d: String) => CacheScope.scoped(f(s, d)))
    }

  private def rawQueries: Map[String, (SparkSession, String) => DataFrame] =
    ChangelogQueries.queries ++
    RelationalQueries.queries ++
    PipelineQueries.queries ++
    AdvancedQueries.queries ++
    Pipeline2Queries.queries ++
    Round3Queries.queries ++
    Round3bQueries.queries ++
    Round3cQueries.queries ++
    Round3dQueries.queries ++
    Round3eQueries.queries ++
    Round3fQueries.queries ++
    Round5Queries.queries ++
    Round5bQueries.queries ++
    Round5cQueries.queries ++
    Round5dQueries.queries ++
    Round5eQueries.queries ++
    Round5fQueries.queries ++
    Round5gQueries.queries ++
    Round5hQueries.queries ++
    Round5iQueries.queries ++
    Round5jQueries.queries ++
    Round5kQueries.queries ++
    Round5lQueries.queries ++
    Round5mQueries.queries ++
    Round5nQueries.queries ++
    Round5oQueries.queries ++
    Round5pQueries.queries ++
    Round5qQueries.queries ++
    Round5rQueries.queries ++
    Round5sQueries.queries ++
    Round5tQueries.queries ++
    Round5uQueries.queries ++
    Round5vQueries.queries ++
    Round5wQueries.queries ++
    Round5xQueries.queries ++
    Round5yQueries.queries ++
    Round5zQueries.queries ++
    Round6aQueries.queries ++
    Round6bQueries.queries ++
    Round6cQueries.queries ++
    Round6dQueries.queries ++
    Round6eQueries.queries ++
    Round6fQueries.queries ++
    Round6gQueries.queries ++
    Round6hQueries.queries ++
    Round6iQueries.queries ++
    Round6jQueries.queries ++
    Round7Queries.queries ++
    Round7bQueries.queries ++
    Round7cQueries.queries ++
    Round7dQueries.queries ++
    Round7eQueries.queries ++
    Round7fQueries.queries ++
    Round7gQueries.queries ++
    Round8aQueries.queries ++
    Round8bQueries.queries ++
    Round8cQueries.queries ++
    Round8dQueries.queries ++
    Round8eQueries.queries ++
    Round8fQueries.queries ++
    Round8gQueries.queries ++
    Round8hQueries.queries ++
    Round8iQueries.queries ++
    Round8jQueries.queries ++
    Round8kQueries.queries ++
    Round8lQueries.queries ++
    Round8mQueries.queries ++
    Round8nQueries.queries ++
    Round8oQueries.queries ++
    Round8pQueries.queries ++
    Round8qQueries.queries ++
    Round8rQueries.queries ++
    Round8sQueries.queries ++
    Round8tQueries.queries ++
    Round8uQueries.queries ++
    Round8vQueries.queries ++
    Round8wQueries.queries ++
    Round8xQueries.queries ++
    Round8yQueries.queries ++
    Round8zQueries.queries ++
    Round8aaQueries.queries ++
    Round8abQueries.queries ++
    Round8acQueries.queries ++
    Round8adQueries.queries ++
    Round9aQueries.queries ++
    Round9bQueries.queries ++
    Round9cQueries.queries ++
    Round9dQueries.queries ++
    Round9eQueries.queries ++
    Round9fQueries.queries ++
    Round9gQueries.queries ++
    Round9hQueries.queries ++
    Round9iQueries.queries ++
    Round9jQueries.queries ++
    Round10aQueries.queries ++
    Round10bQueries.queries ++
    Round10cQueries.queries ++
    Round10dQueries.queries ++
    Round10eQueries.queries ++
    Round10fQueries.queries ++
    Round10gQueries.queries ++
    Round10hQueries.queries ++
    Round10iQueries.queries ++
    Round10jQueries.queries ++
    Round10kQueries.queries ++
    Round10lQueries.queries ++
    Round10mQueries.queries ++
    Round10nQueries.queries ++
    Round10oQueries.queries

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    ChangelogQueries.oracle ++
    RelationalQueries.oracle ++
    PipelineQueries.oracle ++
    AdvancedQueries.oracle ++
    Pipeline2Queries.oracle ++
    Round3Queries.oracle ++
    Round3bQueries.oracle ++
    Round3cQueries.oracle ++
    Round3dQueries.oracle ++
    Round3eQueries.oracle ++
    Round3fQueries.oracle ++
    Round5Queries.oracle ++
    Round5bQueries.oracle ++
    Round5cQueries.oracle ++
    Round5dQueries.oracle ++
    Round5eQueries.oracle ++
    Round5fQueries.oracle ++
    Round5gQueries.oracle ++
    Round5hQueries.oracle ++
    Round5iQueries.oracle ++
    Round5jQueries.oracle ++
    Round5kQueries.oracle ++
    Round5lQueries.oracle ++
    Round5mQueries.oracle ++
    Round5nQueries.oracle ++
    Round5oQueries.oracle ++
    Round5pQueries.oracle ++
    Round5qQueries.oracle ++
    Round5rQueries.oracle ++
    Round5sQueries.oracle ++
    Round5tQueries.oracle ++
    Round5uQueries.oracle ++
    Round5vQueries.oracle ++
    Round5wQueries.oracle ++
    Round5xQueries.oracle ++
    Round5yQueries.oracle ++
    Round5zQueries.oracle ++
    Round6aQueries.oracle ++
    Round6bQueries.oracle ++
    Round6cQueries.oracle ++
    Round6dQueries.oracle ++
    Round6eQueries.oracle ++
    Round6fQueries.oracle ++
    Round6gQueries.oracle ++
    Round6hQueries.oracle ++
    Round6iQueries.oracle ++
    Round6jQueries.oracle ++
    Round7Queries.oracle ++
    Round7bQueries.oracle ++
    Round7cQueries.oracle ++
    Round7dQueries.oracle ++
    Round7eQueries.oracle ++
    Round7fQueries.oracle ++
    Round7gQueries.oracle ++
    Round8aQueries.oracle ++
    Round8bQueries.oracle ++
    Round8cQueries.oracle ++
    Round8dQueries.oracle ++
    Round8eQueries.oracle ++
    Round8fQueries.oracle ++
    Round8gQueries.oracle ++
    Round8hQueries.oracle ++
    Round8iQueries.oracle ++
    Round8jQueries.oracle ++
    Round8kQueries.oracle ++
    Round8lQueries.oracle ++
    Round8mQueries.oracle ++
    Round8nQueries.oracle ++
    Round8oQueries.oracle ++
    Round8pQueries.oracle ++
    Round8qQueries.oracle ++
    Round8rQueries.oracle ++
    Round8sQueries.oracle ++
    Round8tQueries.oracle ++
    Round8uQueries.oracle ++
    Round8vQueries.oracle ++
    Round8wQueries.oracle ++
    Round8xQueries.oracle ++
    Round8yQueries.oracle ++
    Round8zQueries.oracle ++
    Round8aaQueries.oracle ++
    Round8abQueries.oracle ++
    Round8acQueries.oracle ++
    Round8adQueries.oracle ++
    Round9aQueries.oracle ++
    Round9bQueries.oracle ++
    Round9cQueries.oracle ++
    Round9dQueries.oracle ++
    Round9eQueries.oracle ++
    Round9fQueries.oracle ++
    Round9gQueries.oracle ++
    Round9hQueries.oracle ++
    Round9iQueries.oracle ++
    Round9jQueries.oracle ++
    Round10aQueries.oracle ++
    Round10bQueries.oracle ++
    Round10cQueries.oracle ++
    Round10dQueries.oracle ++
    Round10eQueries.oracle ++
    Round10fQueries.oracle ++
    Round10gQueries.oracle ++
    Round10hQueries.oracle ++
    Round10iQueries.oracle ++
    Round10jQueries.oracle ++
    Round10kQueries.oracle ++
    Round10lQueries.oracle ++
    Round10mQueries.oracle ++
    Round10nQueries.oracle ++
    Round10oQueries.oracle
}
