package graft

/** Fixed-work CPU calibration probe for bench/verify artifacts.
  *
  * Three rounds running, the driver's end-of-round bench artifact has
  * diverged up to 3x from controlled runs of the SAME commit, while the
  * guest-visible contamination evidence (loadavg, hypervisor steal) read
  * clean (r11: 230.4s artifact, steal 0.13%, loadavg <=2.8/32 — judge
  * re-bench reproduced 15.3s vs 77s on the same eight queries). The
  * confounder is whole-box slowness invisible to the guest: host
  * memory-bandwidth or frequency contention slows EVERY cycle, so a
  * deterministic fixed-work spin is the direct detector — if the same
  * arithmetic takes 2x its nominal time, the box is 2x slow, and every
  * per-query time in the artifact can be read relative to it.
  *
  * Two probes, run before and after the timed section:
  *   - single-thread: pure per-core speed (frequency / pipeline health);
  *   - all-thread (one spin per configured cpu): contention-exposed speed
  *     (memory bandwidth, SMT sharing, host co-tenancy).
  * Work is a branch-free xorshift64 loop — integer-only (no FP unit or
  * cache variance), unelidable (the folded result is published to a
  * volatile sink), and allocation-free (no GC interaction). 2^28
  * iterations is ~0.1-0.3s nominal per probe on this class of box, so
  * the full pre+post bracket costs well under 2s of bench wall.
  */
object Calib {
  /** Iterations per probe thread: fixed forever — artifacts are only
    * comparable across rounds if the work never changes. */
  val Iters: Long = 1L << 28

  @volatile private var sink: Long = 0L // defeats dead-code elimination

  private def spin(iters: Long): Long = {
    var x = 0x9E3779B97F4A7C15L
    var i = 0L
    while (i < iters) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      i += 1
    }
    x
  }

  /** Wall seconds for `threads` concurrent fixed-work spins. */
  def probe(threads: Int): Double = {
    val t0 = System.nanoTime()
    if (threads <= 1) sink ^= spin(Iters)
    else {
      val ts = (1 to threads).map { _ =>
        val t = new Thread(() => { sink ^= spin(Iters) })
        t.start(); t
      }
      ts.foreach(_.join())
    }
    (System.nanoTime() - t0) / 1e9
  }

  /** (single-thread sec, all-thread sec) — run this bracketing the timed
    * section and emit both pairs in the artifact line. */
  def bracket(threads: Int): (Double, Double) = (probe(1), probe(threads))
}
