package org.apache.spark

/** Test-only shim: SparkContext.checkpointDir is a private[spark] var with
  * no public unset — PinSpec must restore the no-checkpoint default so the
  * shared test session's other suites keep exercising the localCheckpoint
  * path (same package-shim pattern as sql.GraftBridge).
  */
object CheckpointDirReset {
  def clear(sc: SparkContext): Unit = sc.checkpointDir = None
}
