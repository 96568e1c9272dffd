package graft

/** Fixed-work calibration probes for bench/verify artifacts.
  *
  * Three rounds running, the driver's end-of-round bench artifact has
  * diverged up to 3x from controlled runs of the SAME commit, while the
  * guest-visible contamination evidence (loadavg, hypervisor steal) read
  * clean (r11: 230.4s artifact, steal 0.13%, loadavg <=2.8/32 — judge
  * re-bench reproduced 15.3s vs 77s on the same eight queries). The
  * confounder is whole-box slowness invisible to the guest, so
  * deterministic fixed-work spins are the direct detector — if the same
  * work takes 2x its nominal time, the box is 2x slow, and every
  * per-query time in the artifact can be read relative to it.
  *
  * TWO kinds of work, because r12 proved one is not enough: the driver's
  * r12 artifact carried a CLEAN ALU calibration (pre_1t 0.544 vs the
  * 0.54-0.56 controlled band) around a q_simjoin_prefix time of 76s vs
  * 5s controlled — and the same 5-15x swing reproduced in-session on
  * identical code+data+JVM while the ALU probe stayed at 0.55s
  * throughout. A register-resident xorshift spin never leaves the core;
  * host MEMORY pressure (co-tenant bandwidth, page-cache churn, NUMA)
  * slows pointer-chasing work 5-15x while leaving it untouched. Hence:
  *
  *   - ALU probe: branch-free xorshift64 loop — integer-only,
  *     allocation-free, unelidable (result published to a volatile
  *     sink). Detects frequency/scheduling contention.
  *   - MEMORY probe: fixed pointer chase over a 256 MiB permutation
  *     cycle — every load is a dependent cache miss, so elapsed time IS
  *     uncontended-DRAM-latency x steps under the current box state.
  *     Detects the memory-side contention the ALU probe cannot see.
  *
  * Each runs single-thread (per-core health) and all-thread (contention
  * exposed: SMT sharing for ALU, bandwidth saturation for memory), both
  * before and after the timed section.
  */
object Calib {
  /** ALU iterations per probe thread: fixed forever — artifacts are only
    * comparable across rounds if the work never changes. */
  val Iters: Long = 1L << 28

  /** Memory-probe geometry, fixed forever for the same reason: a 2^25
    * x 8 B = 256 MiB cycle (far past any LLC) walked for 2^23 dependent
    * loads per thread — ~0.6 s nominal at ~70 ns/miss. */
  val MemWords: Int = 1 << 25
  val MemSteps: Long = 1L << 23

  /** Controlled-band center for the single-thread memory probe
    * (measured 0.6–0.8 s on this box when healthy; r13/r14 degraded
    * periods read 1.9–2.2 s). Artifacts carry mem_1t / this as their
    * slowdown ratio so cross-round comparisons can band-adjust. */
  val NominalMem1t: Double = 0.7

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

  /** One random single-cycle permutation (Sattolo's algorithm, fixed
    * xorshift seed — identical layout every run/round). Built lazily on
    * first memory probe, kept for the life of the JVM so pre and post
    * brackets walk the very same cycle. */
  private lazy val cycle: Array[Int] = {
    val a = Array.tabulate(MemWords)(identity)
    var x = 0x2545F4914F6CDD1DL
    var i = MemWords - 1
    while (i > 0) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      // j uniform in [0, i): Sattolo => a single cycle covering all slots
      val j = ((x & Long.MaxValue) % i).toInt
      val t = a(i); a(i) = a(j); a(j) = t
      i -= 1
    }
    a
  }

  private def chase(start: Int, steps: Long): Int = {
    val c = cycle
    var p = start
    var i = 0L
    while (i < steps) { p = c(p); i += 1 }
    p
  }

  /** Wall seconds for `threads` concurrent fixed-work ALU spins. */
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

  /** Wall seconds for `threads` concurrent pointer chases of the shared
    * cycle. Threads start at distinct evenly-spaced slots; with single
    * occupancy this measures DRAM latency, with all threads it adds the
    * box's CURRENT bandwidth contention on top. */
  def probeMem(threads: Int): Double = {
    val c = cycle // materialize outside the timed region
    val t0 = System.nanoTime()
    if (threads <= 1) sink ^= chase(0, MemSteps).toLong
    else {
      val ts = (0 until threads).map { k =>
        val start = (MemWords.toLong * k / threads).toInt
        val t = new Thread(() => { sink ^= chase(start, MemSteps).toLong })
        t.start(); t
      }
      ts.foreach(_.join())
    }
    (System.nanoTime() - t0) / 1e9
  }

  /** Calibration sample: ALU and memory, single- and all-thread. */
  final case class Sample(alu1: Double, aluN: Double, mem1: Double, memN: Double)

  @volatile private var warmed = false

  /** One bracket = warmed fixed-work probes. The first bracket in a JVM
    * runs short untimed warm-ups first so HotSpot compiles spin/chase
    * before anything is timed — a cold pre-bracket otherwise bakes JIT
    * time into pre_1t and mimics the very contention signal the probe
    * exists to detect. */
  def bracketAll(threads: Int): Sample = {
    if (!warmed) {
      sink ^= spin(Iters >> 8)
      sink ^= chase(0, MemSteps >> 8).toLong
      warmed = true
    }
    Sample(probe(1), probe(threads), probeMem(1), probeMem(threads))
  }

  /** (single-thread sec, all-thread sec) ALU-only — kept for callers
    * that only need the cheap probe. */
  def bracket(threads: Int): (Double, Double) = {
    if (!warmed) { sink ^= spin(Iters >> 8); warmed = true }
    (probe(1), probe(threads))
  }

  /** JSON fragment for one pre/post pair of samples — shared by Bench
    * and Verify so artifact lines stay uniform. */
  def json(cpus: String, pre: Sample, post: Sample): String =
    s"""{"iters":$Iters,"mem_steps":$MemSteps,""" +
      s""""pre_1t":${f"${pre.alu1}%.3f"},"pre_${cpus}t":${f"${pre.aluN}%.3f"},""" +
      s""""post_1t":${f"${post.alu1}%.3f"},"post_${cpus}t":${f"${post.aluN}%.3f"},""" +
      s""""mem_pre_1t":${f"${pre.mem1}%.3f"},"mem_pre_${cpus}t":${f"${pre.memN}%.3f"},""" +
      s""""mem_post_1t":${f"${post.mem1}%.3f"},"mem_post_${cpus}t":${f"${post.memN}%.3f"}}"""

  /** Standalone probe: ONE bracket as a JSON line (no Spark session).
    * The clean-window scout — every bench/scale artifact since r13 has
    * carried mem ratios of 2.5-3.1 because the runs launched blind into
    * whatever box state stood; this main costs ~3s and answers "is the
    * box clean RIGHT NOW?" so the expensive measured runs can be
    * launched into a window actually worth measuring (mem_1t/0.7 below
    * ~2 ≈ the healthy band; r17's SCALING caught 1.5-1.9 that way). */
  def main(args: Array[String]): Unit = {
    val threads = args.headOption.map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val s = bracketAll(threads)
    println(s"""{"alu_1t":${f"${s.alu1}%.3f"},"alu_${threads}t":${f"${s.aluN}%.3f"},""" +
      s""""mem_1t":${f"${s.mem1}%.3f"},"mem_${threads}t":${f"${s.memN}%.3f"},""" +
      s""""mem_ratio":${f"${s.mem1 / NominalMem1t}%.2f"}}""")
  }
}
