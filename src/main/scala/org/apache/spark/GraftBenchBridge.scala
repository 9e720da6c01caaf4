package org.apache.spark

/** Bridge to the `private[spark]` listener bus, for DETERMINISTIC
  * per-entry job/stage/task counting in [[graft.Bench]] and the profile
  * specs: listener events post asynchronously, so counters snapshotted
  * around an entry are exact only after the bus drains. Access-only —
  * no Spark internals are modified (same rationale as
  * [[org.apache.spark.sql.GraftExpressionBridge]]).
  */
object GraftBenchBridge {
  def drainListenerBus(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
