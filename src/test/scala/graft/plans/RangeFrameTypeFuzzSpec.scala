package graft.plans

import graft.SparkSuite

/** Seeded fuzz over RANGE-frame KEY TYPES × BOUND TYPES — the axis the
  * round-9 bug slipped through (month intervals over DATE keys fed
  * day-unit keys into micros arithmetic; no generator ever produced
  * that pairing). Every round randomizes:
  *
  *   - key type: int / bigint / timestamp / date / decimal(9,2)
  *   - bound type: key-unit numerics, day-time intervals (timestamp),
  *     whole-day intervals (date), MONTH intervals (timestamp + date)
  *   - direction (ASC / DESC), global vs PARTITION BY (nullable group),
  *     null order keys, ties, random partitioning
  *
  * The comparison target is the DECLARATIVE frame truth — a correlated
  * self-join `b.k ∈ [K − lo, K + hi]` (computed by the stock engine
  * with no window functions at all) — NOT the built-in WindowExec,
  * whose forward-only two-pointer silently drops rows where calendar
  * month subtraction is non-monotone (day-clamp boundaries). DuckDB
  * agrees with the self-join; so does this exec, by design
  * ([[GlobalRangeFrameStrategy]] doc). Null order keys form their own
  * peer group per partition key, expressed in the truth as the
  * `(a.k IS NULL AND b.k IS NULL)` branch. Seed is fixed — failures
  * reproduce; override with -Dgraft.fuzz.seed / -Dgraft.fuzz.rounds. */
class RangeFrameTypeFuzzSpec extends SparkSuite {
  import spark.implicits._

  private val rnd = new scala.util.Random(
    sys.props.getOrElse("graft.fuzz.seed", "20260813").toLong)
  private val rounds = sys.props.getOrElse("graft.fuzz.rounds", "10").toInt

  private case class Case(keySql: String, loSql: String, hiSql: String,
                          desc: Boolean, partitioned: Boolean)

  /** Key kind CYCLES with the round (every run covers all five key
    * types); within the first cycle the calendar-hard bound family is
    * FORCED (MONTH intervals over timestamp AND date keys — the exact
    * pairing the r9 bug hid in), later cycles draw bounds randomly. */
  private def randomCase(round: Int): Case = {
    // lo = width on the PRECEDING side, hi = FOLLOWING; zero is legal
    val firstCycle = round < 5
    val (keySql, loSql, hiSql) = round % 5 match {
      case 0 => // int key, int-unit bounds
        ("CAST((ABS(h) % 200) * 3 AS INT)",
          s"${rnd.nextInt(40)}", s"${rnd.nextInt(40)}")
      case 1 => // bigint key, bigint bounds
        ("(ABS(h) % 500) * 7",
          s"${rnd.nextInt(200)}", s"${rnd.nextInt(200)}")
      case 2 => // timestamp key: day-time or MONTH intervals, ~14-month
        // spread; the analyzer requires both bounds in ONE type family
        val bound = (if (firstCycle) 2 else rnd.nextInt(3)) match {
          case 0 => () => s"INTERVAL '${rnd.nextInt(7200)}' SECOND"
          case 1 => () => s"INTERVAL '${rnd.nextInt(40)}' DAY"
          case 2 => () => s"INTERVAL '${1 + rnd.nextInt(3)}' MONTH"
        }
        ("timestamp_seconds(ABS(h) % 36000000)", bound(), bound())
      case 3 => // DATE key: whole-day ints or MONTH intervals (the r9 gap)
        val bound =
          if (!firstCycle && rnd.nextBoolean()) () => s"${rnd.nextInt(60)}"
          else () => s"INTERVAL '${1 + rnd.nextInt(3)}' MONTH"
        ("date_add(DATE'2020-01-01', CAST(ABS(h) % 450 AS INT))",
          bound(), bound())
      case 4 => // decimal(9,2) key, fixed-point bounds
        ("CAST((ABS(h) % 40000) / 100.0 AS DECIMAL(9,2))",
          f"${rnd.nextInt(4000) / 100.0}%.2f", f"${rnd.nextInt(4000) / 100.0}%.2f")
    }
    Case(keySql, loSql, hiSql, rnd.nextBoolean(), rnd.nextBoolean())
  }

  (0 until rounds).foreach { round =>
    test(s"type-fuzz round $round: random key/bound types match the declarative truth") {
      val c = randomCase(round)
      info(s"case: $c")
      val n = 300 + rnd.nextInt(900)
      val nullKeyPct = rnd.nextInt(12)
      val seed = rnd.nextLong()
      val base = (0 until n).map { i =>
        val h = seed * (i + 1) + i.toLong * 2654435761L
        val g: java.lang.Long =
          if (i % 23 == 0) null
          else if (i % 2 == 0) 5L else math.abs(h) % 8
        (i.toLong, h, g, math.abs(h * 48271L) % 1000)
      }.toDF("id", "h0", "g", "v").repartition(1 + rnd.nextInt(9))
      base.selectExpr("id", "g", "v",
          s"CASE WHEN id % 97 < $nullKeyPct THEN NULL ELSE h0 END AS h")
        .selectExpr("id", "g", "v", s"${c.keySql} AS k")
        .createOrReplaceTempView("rf_fuzz")
      val dir = if (c.desc) "DESC" else "ASC"
      val part = if (c.partitioned) "PARTITION BY g" else ""
      val out = spark.sql(
        s"""SELECT id, COUNT(*) OVER w AS c, SUM(v) OVER w AS s FROM rf_fuzz
            WINDOW w AS ($part ORDER BY k $dir RANGE BETWEEN
              ${c.loSql} PRECEDING AND ${c.hiSql} FOLLOWING)""")
      val p = out.queryExecution.executedPlan.toString
      assert(p.contains("GlobalRangeFrame"),
        s"round $round (case $c): frame must rescue:\n$p")
      assert(!p.linesIterator.exists(_.trim.stripPrefix("+- ").startsWith("Window [")),
        s"round $round (case $c): built-in WindowExec must not appear:\n$p")
      // declarative truth: under DESC, `lo PRECEDING` means keys ABOVE
      // K (frame = [K − hi, K + lo]); group match is null-safe; null
      // order keys frame with their null-run peers only
      val (below, above) = if (c.desc) (c.hiSql, c.loSql) else (c.loSql, c.hiSql)
      val grp = if (c.partitioned) "b.g <=> a.g AND" else ""
      val truth = spark.sql(
        s"""SELECT a.id,
              (SELECT COUNT(*) FROM rf_fuzz b WHERE $grp
                ((a.k IS NULL AND b.k IS NULL) OR (a.k IS NOT NULL AND
                  b.k >= a.k - $below AND b.k <= a.k + $above))) AS c,
              (SELECT SUM(b.v) FROM rf_fuzz b WHERE $grp
                ((a.k IS NULL AND b.k IS NULL) OR (a.k IS NOT NULL AND
                  b.k >= a.k - $below AND b.k <= a.k + $above))) AS s
            FROM rf_fuzz a""")
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.get(2)))).toMap
      val got = out.collect().map(r => (r.getLong(0), (r.getLong(1), r.get(2)))).toMap
      val bad = got.keys.filter(k => got(k) != truth(k)).toSeq.sorted.take(5)
      assert(bad.isEmpty, s"round $round (case $c) diverged from the truth: " +
        bad.map(k => s"id=$k got=${got(k)} truth=${truth(k)}").mkString("; "))
    }
  }
}
