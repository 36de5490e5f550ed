package graft.sources

import graft.core.EventGraph

/** Graphviz export of the event graph — debugging/visualization surface
  * (reference /root/reference/crates/esvc-core/src/dot.rs:10-61): nodes
  * labeled hash + `cmd:arg`, edges labeled hard/soft, named states as
  * clusters. Driver-side by definition (small, human-facing).
  */
object Dot {
  /** Escape for Graphviz labels (dot.rs:77-115): backslash-escape `"`
    * and `\`, newline becomes the left-justified break `\l`.
    */
  def escape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\l")
      case c => sb.append(c)
    }
    sb.result()
  }

  def render[A](g: EventGraph[A], showArg: A => String = (a: A) => a.toString): String = {
    val sb = new StringBuilder
    sb.append("digraph {\n")
    g.events.foreach { case (h, ev) =>
      sb.append(s"""  "$h" [label="$h\\n${ev.cmd}:${escape(showArg(ev.arg))}"];\n""")
    }
    g.events.foreach { case (h, ev) =>
      ev.deps.foreach { case (dep, isHard) =>
        val hs = if (isHard) "hard" else "soft"
        sb.append(s"""  "$h" -> "$dep" [label="$hs"];\n""")
      }
    }
    g.nstates.foreach { case (name, st) =>
      sb.append(s"""  subgraph "cluster_${escape(name)}" {\n""")
      st.foreach(dep => sb.append(s"""  "$dep";\n"""))
      sb.append("  }\n")
    }
    sb.append("}\n")
    sb.result()
  }
}
