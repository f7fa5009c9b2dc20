package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}

/**
 * The shared make-it-loud machinery behind every silent-concession audit in
 * the package ([[Dedup.loudWhenCapBinds]]'s binding df-caps,
 * [[CorpusOps.loudSampled]]'s declared sample rates): a named observed
 * metric rides the query (zero extra jobs — the aggregate runs on rows
 * already flowing), and a once-per-(session, prefix) listener WARNs a
 * rendered message whenever an execution's metric says the concession
 * actually applied. One definition, so a fix to the listener pattern (the
 * registration race, the prefix scheme, onFailure handling) lands once
 * instead of drifting across copies.
 */
private[operators] object Audits {
  private val seq = new java.util.concurrent.atomic.AtomicLong()
  // session → prefixes already carrying a listener; weak keys so a stopped
  // session's entry can be collected
  private val registered =
    new java.util.WeakHashMap[SparkSession, java.util.HashSet[String]]()

  /** Attach `metrics` to `df` as the observed metric `<prefix>.<n>` and
   * ensure ONE listener per (session, prefix) WARNs `render(row)` through
   * `loggerName` on every successful execution where `shouldWarn(row)`. */
  def observeLoudly(df: DataFrame, prefix: String, metrics: Seq[Column],
                    loggerName: String, shouldWarn: Row => Boolean,
                    render: Row => String): DataFrame = {
    val spark = df.sparkSession
    registered.synchronized {
      var set = registered.get(spark)
      if (set == null) { set = new java.util.HashSet[String](); registered.put(spark, set) }
      if (set.add(prefix))
        spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
          override def onSuccess(funcName: String,
                                 qe: org.apache.spark.sql.execution.QueryExecution,
                                 durationNs: Long): Unit =
            qe.observedMetrics.foreach { case (name, row) =>
              // metric names are always `$prefix.$n` — match the dotted
              // form so a prefix that is a proper prefix of another
              // ("graft.corpus.sample" vs "graft.corpus.sample_rate")
              // never invokes this listener on a foreign row schema
              if (name.startsWith(prefix + ".") && shouldWarn(row))
                org.slf4j.LoggerFactory.getLogger(loggerName).warn(render(row))
            }
          override def onFailure(funcName: String,
                                 qe: org.apache.spark.sql.execution.QueryExecution,
                                 exception: Exception): Unit = ()
        })
    }
    df.observe(s"$prefix.${seq.incrementAndGet()}", metrics.head, metrics.tail: _*)
  }
}
