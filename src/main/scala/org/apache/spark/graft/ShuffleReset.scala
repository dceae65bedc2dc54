package org.apache.spark.graft

import scala.collection.mutable

import org.apache.spark.{Dependency, MapOutputTrackerMaster, ShuffleDependency, SparkEnv}
import org.apache.spark.rdd.RDD

/** Driver-side helper for graft.Bench's prepared-statement execution model.
  *
  * A prepared query keeps its physical RDD graph (codegen compiled once,
  * broadcast hash tables built once — the analogue of a prepared statement's
  * compiled plan) but must RE-EXECUTE every stage per run. Spark's
  * DAGScheduler skips a shuffle map stage whenever the MapOutputTracker
  * still holds its outputs, so re-collecting the same RDD would silently
  * time only the final stage. Clearing the registered map outputs for every
  * shuffle dependency in the graph makes the scheduler recompute all of
  * them — scans, shuffles, aggregations — on the next job.
  *
  * Lives under org.apache.spark because [[MapOutputTrackerMaster]] is
  * private[spark]; bench-only, never on a query execution path.
  */
object ShuffleReset {

  /** All shuffle ids reachable from `rdd`'s dependency graph. */
  def shuffleIds(rdd: RDD[_]): Seq[Int] = {
    val seen = mutable.HashSet[Int]()
    val ids = mutable.ArrayBuffer[Int]()
    def walk(r: RDD[_]): Unit = if (seen.add(r.id)) {
      r.dependencies.foreach { d: Dependency[_] =>
        d match {
          case s: ShuffleDependency[_, _, _] => ids += s.shuffleId
          case _ =>
        }
        walk(d.rdd)
      }
    }
    walk(rdd)
    ids.toSeq
  }

  /** Drop the tracked map outputs for the given shuffles so their stages
    * re-run from the source scans on the next job. */
  def clearOutputs(ids: Seq[Int]): Unit = {
    SparkEnv.get.mapOutputTracker match {
      case m: MapOutputTrackerMaster =>
        // a shuffle only registers with the tracker on first job submission,
        // so ids from a never-executed graph may not exist yet
        ids.filter(m.containsShuffle).foreach(m.unregisterAllMapAndMergeOutput)
      case _ =>
    }
  }

  /** Drain the async listener bus (private[spark]) — lets specs that count
    * jobs/stages via a SparkListener read a settled counter. */
  def drainListenerBus(sc: org.apache.spark.SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
