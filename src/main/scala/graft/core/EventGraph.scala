package graft.core

import scala.collection.immutable.{SortedMap, SortedSet}
import scala.collection.mutable

/** A pure, deterministic event transform — the reference's UDF contract
  * (`Engine::run_event_bare`, /root/reference/crates/esvc-traits/src/lib.rs:15-28).
  * Purity is load-bearing: hash stability, replay memoization and the
  * shelve commutation tests all assume it.
  */
trait Engine[A, D] extends Serializable {
  /** Apply command `cmd` with argument `arg` to datum `dat`. Must be pure.
    * Throws [[EngineException]] on failure (e.g. a bad regex).
    */
  def runEvent(cmd: Int, arg: A, dat: D): D

  /** Canonical bytes of an argument, for content-addressing events. */
  def encodeArg(arg: A): Array[Byte]

  /** Inverse of [[encodeArg]] (graph persistence round-trip). */
  def decodeArg(bytes: Array[Byte]): A
}

final class EngineException(msg: String) extends RuntimeException(msg)

sealed abstract class GraphException(msg: String) extends RuntimeException(msg)
final class DatasetNotFound extends GraphException("unable to find the specified dataset")
final class DependencyCycle(val at: String) extends GraphException(s"dependency circuit @ $at")
final class DependencyNotFound(val h: String) extends GraphException(s"unable to retrieve dependency $h")
final class HashCollision(val h: String) extends GraphException(s"hash collision @ $h detected during insertion")
final class HashChangeAtMerge(val old: String, val nw: String)
    extends GraphException(s"event $old: merge failed, new resulting hash was $nw")
final class NoopAtMerge(val h: String) extends GraphException(s"event $h got turned into a no-op at merge")

/** Per-event include mode for linearization — reference `IncludeSpec`
  * (/root/reference/crates/esvc-core/src/graph.rs:17-21). `OnlyDeps` stops
  * before the event itself (exclusive).
  */
sealed trait IncludeSpec
object IncludeSpec {
  case object All extends IncludeSpec
  case object OnlyDeps extends IncludeSpec
}

/** An event: command id, opaque argument, and causal dependency map
  * (dep hash -> is_hard) — reference `Event<Arg>`
  * (/root/reference/crates/esvc-core/src/graph.rs:9-15).
  */
final case class Ev[A](cmd: Int, arg: A, deps: SortedMap[String, Boolean])

/** The content-addressed event graph: event table + named states
  * (frontier sets) — reference `Graph<Arg>`
  * (/root/reference/crates/esvc-core/src/graph.rs:23-29).
  *
  * This is the driver-side graph used by shelve/merge orchestration; the
  * distributed DataFrame flavors of the same operators (closure, frontier,
  * topo-sort, dedup insert) live in [[graft.plans.GraphOps]].
  */
final class EventGraph[A](val engine: Engine[A, _]) {
  val events: mutable.TreeMap[String, Ev[A]] = mutable.TreeMap.empty
  val nstates: mutable.TreeMap[String, SortedSet[String]] = mutable.TreeMap.empty

  /** Expand a state to its transitive dependency closure; if `expand` is
    * false, additionally compress it to its frontier/antichain (members
    * that are no other member's dependency). Entries should start `false`.
    * Mirrors `Graph::fold_state` (graph.rs:59-83).
    */
  def foldState(st0: SortedMap[String, Boolean], expand: Boolean): SortedMap[String, Boolean] = {
    var st = st0
    var grew = true
    while (grew) {
      val origSize = st.size
      val snapshot = st
      snapshot.foreach { case (h, _) =>
        events.get(h) match {
          case Some(ev) => st = st ++ ev.deps.keysIterator.map(_ -> true)
          case None => throw new DependencyNotFound(h)
        }
      }
      grew = st.size != origSize
    }
    if (expand) st else st.filter(!_._2)
  }

  /** Deterministic topological linearization of `evids` plus all their
    * transitive dependencies not already in `tt0`, with cycle detection.
    * Mirrors `Graph::calculate_dependencies` (graph.rs:85-129) including
    * its DFS stack discipline, so the emitted order matches the
    * reference's deterministic (sorted-map driven) order.
    */
  def calculateDependencies(tt0: SortedSet[String], evids: SortedMap[String, IncludeSpec]): Vector[String] = {
    var tt = tt0
    val ret = Vector.newBuilder[String]
    val stack = mutable.ArrayBuffer.empty[String]

    evids.foreach { case (mainEvid, incl) =>
      stack += mainEvid
      var break = false
      while (!break && stack.nonEmpty) {
        val evid = stack.remove(stack.length - 1)
        if (tt.contains(evid)) {
          // already satisfied
        } else if (evid == mainEvid && stack.nonEmpty) {
          throw new DependencyCycle(mainEvid)
        } else {
          val evwd = events.getOrElse(evid, throw new DependencyNotFound(evid))
          val necessary = evwd.deps.keysIterator.filter(h => !tt.contains(h)).toVector
          if (necessary.nonEmpty) {
            stack += evid
            stack ++= necessary
          } else if (evid == mainEvid && incl != IncludeSpec.All) {
            // omit the final dep itself
            stack.clear()
            break = true
          } else {
            ret += evid
            tt += evid
          }
        }
      }
    }
    ret.result()
  }

  /** Content-addressed get-or-insert with hash-collision detection.
    * Mirrors `Graph::ensure_event` (graph.rs:136-154).
    * @return (Some(ev) iff collision, hash of ev)
    */
  def ensureEvent(ev: Ev[A]): (Option[Ev[A]], String) = {
    val h = Hashes.eventHash(ev.cmd, engine.encodeArg(ev.arg), ev.deps)
    events.get(h) match {
      case Some(existing) if existing == ev => (None, h)
      case Some(_) => (Some(ev), h)
      case None =>
        events.update(h, ev)
        (None, h)
    }
  }
}
