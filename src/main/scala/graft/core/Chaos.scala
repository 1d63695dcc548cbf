package graft.core

/** Test-only fault injection for crash-contract specs: the release loop
  * and the index mutations declare named seams (`Chaos.point("...")`),
  * and a spec arms exactly one to throw there — simulating a process
  * crash at that boundary — then asserts the next release self-heals
  * (CorpusOpsSpec's kill-point matrix). Production cost is one volatile
  * null-compare per seam; nothing arms outside tests.
  */
object Chaos {

  /** The simulated crash. Deliberately NOT a FileError: orchestration
    * treats it like any infrastructure failure (propagates).
    */
  final class ChaosKill(val point: String)
    extends RuntimeException(s"chaos kill at $point")

  @volatile private var armed: String = null

  /** Arm seam `point`: the next time execution reaches it, it throws
    * (and disarms, so recovery code crossing the same seam survives).
    */
  def arm(point: String): Unit = armed = point

  def disarm(): Unit = armed = null

  private[graft] def point(name: String): Unit =
    if (armed == name) { armed = null; throw new ChaosKill(name) }
}
