package graft.graphs

import org.apache.spark.sql.DataFrame

/** Dev aid shared by the iterative graph operators: with
  * SPARK_GRAFT_GRAPH_EXPLAIN=1 each operator prints the FORMATTED plan
  * of its first round's (pre-checkpoint) DataFrame to stderr — the
  * per-round shape (exchange count, join strategy) that the
  * materialized result the operator returns can no longer show.
  * Inert (one env lookup) unless the variable is set.
  */
private[graphs] object GraphExplain {
  private val enabled =
    sys.env.get("SPARK_GRAFT_GRAPH_EXPLAIN").contains("1")

  def apply(tag: String, df: => DataFrame): Unit = if (enabled) {
    System.err.println(s"==== $tag (formatted, pre-checkpoint) ====")
    System.err.println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
  }
}
