package graft.plans

import graft.core.{Engine, IndepCase, WorkCache}
import org.apache.spark.sql.SparkSession
import scala.reflect.ClassTag

/** Spark fan-out for the shelve commutation tests — the parallel half
  * of the reference's dependency-inference algorithm
  * (/root/reference/crates/esvc-core/src/workcache.rs:213-307): per
  * round, every concurrent frontier event is tested independently (two
  * pure engine calls + equality), so a frontier of N events becomes an
  * N-way map over executors. The orchestration around it (dependency
  * minimization, lost-dep audit) stays sequential on the driver by
  * design — each shelve mutates the graph.
  *
  * Classification delegates to [[WorkCache.isIndependent]], so the
  * parallel path is equal-by-construction to the sequential one (and
  * property-tested in ShelveSparkSpec).
  */
object ShelveSpark {
  def tester[A: ClassTag, D: ClassTag](spark: SparkSession, engine: Engine[A, D],
                                       minBatch: Int = 2, maxSlices: Int = 64)
  : (Int, A, D, Seq[IndepCase[A, D]]) => Map[String, Boolean] = {
    (cmd: Int, arg: A, curSt: D, cases: Seq[IndepCase[A, D]]) =>
      if (cases.length < minBatch) {
        cases.iterator.map(c => c.concEvid -> WorkCache.isIndependent(engine, cmd, arg, curSt, c)).toMap
      } else {
        val slices = math.min(cases.length, maxSlices)
        spark.sparkContext.parallelize(cases.toIndexedSeq, slices)
          .map(c => c.concEvid -> WorkCache.isIndependent(engine, cmd, arg, curSt, c))
          .collect().toMap
      }
  }
}
