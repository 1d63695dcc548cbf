package graft.tools

/** Fixed-work calibration probe for the bench harness.
  *
  * The bench's per-entry spread guard catches WITHIN-run variance (some
  * reps inflated, some not), but a STEADY external load inflates every
  * rep proportionally and sails straight through — two consecutive
  * driver artifacts carried `contended: false` while running uniformly
  * ~1.2-1.9x over the committed quiet runs, and only a manual per-entry
  * forensic comparison could tell inflation from regression. This probe
  * makes the artifact self-describing: a deterministic single-threaded
  * spin with a COMMITTED quiet-host timing ([[QuietSec]]) runs at bench
  * start and end; the worse of the two over the committed floor is the
  * run's inflation estimate, and past [[InflatedBound]] the artifact
  * flags itself.
  *
  * Single-threaded CPU work on purpose: it measures scheduler/CPU
  * contention (what inflates the queries) without touching storage, so
  * page-cache state can't fake a dirty verdict. Best-of-N absorbs the
  * first-rep JIT compile and stray scheduler blips the same way the
  * query timings do.
  */
object Calib {

  /** Quiet-host timing of [[once]] (seconds): best-of-5 measured on the
    * idle dev host (loadavg 0.2, three agreeing runs: 0.623/0.607/0.607).
    * Re-commit when the spin constant or host class changes.
    */
  val QuietSec = 0.607

  /** Inflation factor over [[QuietSec]] past which a run is flagged:
    * generous vs the probe's own quiet jitter (<±10%) but well under the
    * 1.5-1.9x inflations that needed manual forensics.
    */
  val InflatedBound = 1.3

  /** One fixed-work spin: 3e8 xorshift64 steps, a serial data dependency
    * the JIT cannot vectorize away. ~0.3 s on a quiet modern core.
    */
  def once(): Double = {
    val t0 = System.nanoTime()
    var x = 0x9E3779B97F4A7C15L
    var i = 0
    while (i < 300000000) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      i += 1
    }
    // consume x so the loop is not dead code; never true for this seed
    if (x == 0L) System.err.println("calib: degenerate xorshift state")
    (System.nanoTime() - t0) / 1e9
  }

  /** The probe reading: best of 3 spins (contention only ever ADDS time —
    * the same noise-floor argument as the bench's best-of-3).
    */
  def best(): Double = (1 to 3).map(_ => once()).min

  /** Measurement main for (re)committing [[QuietSec]]: prints best-of-5
    * on the current host.
    */
  def main(args: Array[String]): Unit =
    println(f"calib best-of-5: ${(1 to 5).map(_ => once()).min}%.3f sec")
}
