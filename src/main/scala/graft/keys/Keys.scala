package graft.keys

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Big-endian byte codec for BIGINT keys ↔ BinaryType salted keys.
  *
  * The reference stores row keys as raw `byte[]` compared unsigned
  * lexicographically (reference: wd/DistributedScanner.java:127-128).
  * For non-negative longs, big-endian encoding makes unsigned-lexicographic
  * binary order equal numeric order, so a salted binary key sorts exactly
  * like the HBase layout (see SURVEY.md §7.5). All expressions here are
  * built-ins (hex/lpad/to_binary/conv) → whole-stage codegen, no UDFs.
  */
object KeyCodec {
  /** 8-byte big-endian binary of a non-negative BIGINT column. */
  def beBytes8(key: Column): Column =
    to_binary(lpad(hex(key), 16, "0"), lit("hex"))

  /** `width`-byte big-endian binary of a small non-negative int column.
    * Range-checked: lpad TRUNCATES hex digits beyond the target width, so
    * a value that doesn't fit would silently encode a DIFFERENT value and
    * the salted key would sort into the wrong bucket range. Validated
    * distributors never produce such values, but this is public Column
    * API reachable with arbitrary expressions. NULL propagates. */
  def beBytes(v: Column, width: Int): Column = {
    val checked =
      if (width >= 8) when(v.isNull || v >= 0, v)
        .otherwise(raise_error(concat(
          lit("beBytes: negative value for a "), lit(width), lit("-byte field: "),
          v.cast("string"))))
      else when(v.isNull || (v >= 0 && v < (1L << (8 * width))), v)
        .otherwise(raise_error(concat(
          lit("beBytes: value out of range for a "), lit(width), lit("-byte field: "),
          v.cast("string"))))
    to_binary(lpad(hex(checked), width * 2, "0"), lit("hex"))
  }

  /** Decode an 8-byte big-endian binary back to BIGINT (non-negative). */
  def beLong(bin: Column): Column =
    conv(hex(bin), 16, 10).cast("bigint")
}

/** The reference's 31-polynomial key hash, in closed form.
  *
  * Reference: wd/RowKeyDistributorByHashPrefix.java:102-108 iterates
  * `h = h*31 + b` over the key bytes with Java 32-bit wrap. Iterated
  * mod-2^32 equals the closed-form polynomial sum mod 2^32, so for an
  * 8-byte big-endian key we can evaluate
  *   h = Σ byte_i * 31^(7-i)  (mod 2^32),  then two's-complement sign.
  * Max magnitude ≈ 255 * Σ 31^i < 2^46 — fits in BIGINT, so the identical
  * arithmetic runs in DuckDB for the oracle (SURVEY.md §7.4b).
  *
  * Deviation (documented, SURVEY.md §4 quirk 1): the reference uses
  * `Math.abs(h) % mod` which breaks on Integer.MIN_VALUE; we use pmod,
  * which is always non-negative.
  */
object Hash31 {
  /** 31^7, 31^6, ..., 31^0 — coefficient for big-endian byte i. */
  val Pow31: IndexedSeq[Long] = (0 until 8).map(i => math.pow(31, 7 - i).toLong)
  private val Wrap = 4294967296L // 2^32
  private val SignBit = 2147483648L // 2^31

  /** Java-int-semantics hash of the 8 BE bytes of a non-negative BIGINT. */
  def hash32(key: Column): Column = {
    val unsigned = (0 until 8)
      .map(i => shiftright(key, (7 - i) * 8).bitwiseAND(lit(255L)) * lit(Pow31(i)))
      .reduce(_ + _) % lit(Wrap)
    when(unsigned >= lit(SignBit), unsigned - lit(Wrap)).otherwise(unsigned)
  }

  def bucket(key: Column, n: Int): Column = pmod(hash32(key), lit(n.toLong))

  /** The same formula as DuckDB SQL text — generated from the same
    * constants so the oracle can never drift from the Spark expression. */
  def duckHash32(keyExpr: String): String = {
    val sum = (0 until 8)
      .map(i => s"((($keyExpr) >> ${(7 - i) * 8}) & 255) * ${Pow31(i)}")
      .mkString(" + ")
    s"(CASE WHEN (($sum) % $Wrap) >= $SignBit THEN (($sum) % $Wrap) - $Wrap ELSE ($sum) % $Wrap END)"
  }

  def duckBucket(keyExpr: String, n: Int): String = {
    val h = duckHash32(keyExpr)
    s"((($h) % $n + $n) % $n)"
  }
}

/** Distributor = salting strategy. Mirrors the reference's
  * AbstractRowKeyDistributor / Hasher contracts
  * (wd/AbstractRowKeyDistributor.java:32-37,
  * wd/RowKeyDistributorByHashPrefix.java:39-43) re-expressed as Column
  * algebra: a distributor knows its bucket count, its salted-key prefix
  * width in bytes, and how to assign a bucket to each row.
  */
sealed trait Distributor {
  def numBuckets: Int
  /** Salted-key prefix width in bytes (0 = identity / no salting). */
  def prefixLength: Int
  /** Add a `bucket` column to `df` derived from BIGINT key column `key`. */
  def withBucket(df: DataFrame, key: Column): DataFrame
  /** Config-string payload, reference Parametrizable.getParamsToStore()
    * (wd/Parametrizable.java:24-27). */
  def params: String
}

/** Deterministic hash salting — reference RowKeyDistributorByHashPrefix
  * with OneByteSimpleHash (wd/RowKeyDistributorByHashPrefix.java:45-109).
  * n ∈ 1..256 (reference :57-63). Bucket recomputable from the key alone,
  * so point gets prune to one bucket (README:75-78).
  */
final case class HashPrefix(numBuckets: Int) extends Distributor {
  require(numBuckets >= 1 && numBuckets <= 256, s"buckets 1..256, got $numBuckets")
  val prefixLength = 1
  def bucket(key: Column): Column = Hash31.bucket(key, numBuckets)
  def withBucket(df: DataFrame, key: Column): DataFrame =
    df.withColumn("bucket", bucket(key))
  def params: String = numBuckets.toString
}

/** Round-robin salting — reference RowKeyDistributorByOneBytePrefix
  * (wd/RowKeyDistributorByOneBytePrefix.java:47-53): a stateful counter,
  * NOT a function of the key. Faithful batch translation assigns
  * row_number over an explicit insertion order, mod n — deterministic
  * given the ordering (SURVEY.md §7.4a). n ≤ 127 (reference :29).
  * Append-only semantics: rewriting a key may land a different bucket
  * (reference README:75-78) — documented, mirrored.
  *
  * Scale: the naive translation is `row_number over (ORDER BY order)` —
  * an unpartitioned window that funnels the whole table through ONE task.
  * Instead the global index is computed with the two-pass pattern
  * (what RDD zipWithIndex does internally): range-partition by the
  * insertion order, partition-LOCAL indices off the task's own record
  * counter (the low 33 bits of monotonically_increasing_id — zero
  * further exchanges; a per-__pid window would re-shuffle, since
  * Catalyst cannot see the physical __pid clustering), plus broadcast
  * per-partition offsets from a tiny count branch sharing the same
  * reused exchange (one row per partition, never row data). Requires
  * `insertionOrder` to be a unique total order, which the reference's
  * insertion sequence is by construction.
  */
final case class RoundRobin(numBuckets: Int, insertionOrder: String) extends Distributor {
  require(numBuckets >= 1 && numBuckets <= 127, s"buckets 1..127, got $numBuckets")
  val prefixLength = 1
  def withBucket(df: DataFrame, key: Column): DataFrame = {
    val ordered = df
      .repartitionByRange(col(insertionOrder))
      .sortWithinPartitions(insertionOrder)
      .withColumn("__pid", spark_partition_id())
      // partition-LOCAL row index, zero exchanges: the low 33 bits of
      // monotonically_increasing_id ARE the task's record counter
      // (the expression is pid<<33 + localIndex), and the counter
      // increments in iterator order — the sort above makes that the
      // insertion order. The alternative `row_number() OVER (PARTITION
      // BY __pid ...)` costs a SECOND full exchange: Catalyst cannot
      // know the data is already physically clustered by __pid (its
      // outputPartitioning is the range on insertionOrder), so
      // EnsureRequirements re-shuffles. Guard below: a partition past
      // 2^33 rows would wrap the counter silently — raise instead
      // (no real partition holds 8.6e9 rows; shuffle blocks cap far
      // earlier).
      .withColumn("__rn",
        monotonically_increasing_id().bitwiseAND(lit((1L << 33) - 1)))
    // Per-partition counts → exclusive prefix-sum offsets, computed INSIDE
    // the same plan as the final join (no collect job): both branches sit
    // on the identical range exchange, which ReuseExchange plans once, so
    // they observe the same partition ids by construction. The previous
    // two-job formulation (collect counts, then re-run the plan) could see
    // two different partitionings and silently drop rows on the inner
    // __pid join. The prefix scan itself is a single-row array fold
    // ([[graft.operators.PrefixOffsets]]) — no window exec, no extra
    // exchange, no stats job spent on ~numPartitions rows.
    val offsets = graft.operators.PrefixOffsets
      .of(graft.operators.PrefixOffsets.countsOf(ordered))
      .select(col("__pid"), col("__off"), col("__cnt"))
    ordered
      .join(broadcast(offsets), Seq("__pid"), "left")
      // belt-and-braces: if exchange reuse ever failed AND the two
      // computations diverged, fail loudly instead of mis-bucketing. Two
      // detectors, because divergence has two shapes: a pid missing from
      // the offsets entirely (null __off), or — the sneaky one — the same
      // pid set with SHIFTED boundaries, where every pid still joins but
      // per-pid counts differ; total rows are conserved, so at least one
      // partition then exceeds its counted size and trips the __cnt check.
      .withColumn("__off", coalesce(col("__off"),
        raise_error(concat(lit("round-robin: no offset for partition "), col("__pid")))))
      .withColumn("__rn", when(col("__cnt") >= (1L << 33),
        raise_error(concat(lit("round-robin: partition "), col("__pid"),
          lit(" exceeds 2^33 rows — local index would wrap"))))
        .otherwise(col("__rn")))
      .withColumn("__rn", when(col("__rn") < col("__cnt"), col("__rn"))
        .otherwise(raise_error(concat(
          lit("round-robin: partition "), col("__pid"),
          lit(" larger than its counted size — range exchange diverged")))))
      .withColumn("bucket", pmod(col("__rn") + col("__off"), lit(numBuckets.toLong)))
      .drop("__pid", "__rn", "__off", "__cnt")
  }
  def params: String = s"$numBuckets--$insertionOrder"
}

/** Degenerate no-op salting — reference IdentityHash test hasher
  * (wd-test/RowKeyDistributorByHashPrefix_IdentityHashTest.java:8-36):
  * empty prefix, prefixLength 0, single bucket. */
case object Identity extends Distributor {
  val numBuckets = 1
  val prefixLength = 0
  def withBucket(df: DataFrame, key: Column): DataFrame =
    df.withColumn("bucket", lit(0L))
  def params: String = ""
}

/** Multi-byte-prefix hashing — reference MultiBytesPrefixHash test hasher
  * (wd-test/RowKeyDistributorByHashPrefix_MultiBytesPrefixHashTest.java:8-39):
  * 2-byte prefixes, bucket keyed on the key's low byte mod n (:15-17).
  * Unlike the reference we derive scan intervals from a canonically
  * sorted prefix set (SURVEY.md §4 quirk 2). */
final case class MultiBytePrefix(numBuckets: Int) extends Distributor {
  require(numBuckets >= 1 && numBuckets <= 65536)
  val prefixLength = 2
  def bucket(key: Column): Column = pmod(key.bitwiseAND(lit(255L)), lit(numBuckets.toLong))
  def withBucket(df: DataFrame, key: Column): DataFrame =
    df.withColumn("bucket", bucket(key))
  def params: String = numBuckets.toString
}

/** Salted-key algebra over BinaryType columns — the reference's
  * Bytes.add / Bytes.tail byte juggling as built-in concat/substring
  * (SURVEY.md §1.2; reference wd/RowKeyDistributorByOneBytePrefix.java:49,57).
  */
object Salt {
  /** distributedKey = prefix ⧺ originalKey
    * (reference wd/RowKeyDistributorByOneBytePrefix.java:49). */
  def saltedKey(bucket: Column, key: Column, prefixLength: Int): Column =
    if (prefixLength == 0) KeyCodec.beBytes8(key)
    else concat(KeyCodec.beBytes(bucket, prefixLength), KeyCodec.beBytes8(key))

  /** originalKey = distributedKey[prefixLength:]
    * (reference wd/RowKeyDistributorByOneBytePrefix.java:55-58). O4. */
  def unsalt(salted: Column, prefixLength: Int): Column =
    substring(salted, prefixLength + 1, Int.MaxValue)

  /** Decode the original BIGINT key back out of a salted binary key. */
  def originalKey(salted: Column, prefixLength: Int): Column =
    KeyCodec.beLong(unsalt(salted, prefixLength))

  /** O5 key fan-out: all N candidate buckets for each row — the
    * reference's only 1→N generator
    * (wd/RowKeyDistributorByOneBytePrefix.java:60-72), as a built-in
    * explode(sequence(...)) — no custom Generator needed. */
  def allBuckets(n: Int): Column =
    explode(sequence(lit(0), lit(n - 1)))
}

/** Config-string codec — reference Parametrizable round-trip
  * (wd/Parametrizable.java:24-27; nesting delimiter "--" per
  * wd/RowKeyDistributorByHashPrefix.java:28,137-152). Pure Scala. */
object DistributorCodec {
  private val Delim = "--"

  def encode(d: Distributor): String = d match {
    case HashPrefix(n)        => s"HashPrefix$Delim$n"
    case RoundRobin(n, order) => s"RoundRobin$Delim$n$Delim$order"
    case Identity             => "Identity"
    case MultiBytePrefix(n)   => s"MultiBytePrefix$Delim$n"
  }

  def decode(s: String): Distributor = s.split(Delim).toList match {
    case "HashPrefix" :: n :: Nil           => HashPrefix(n.toInt)
    case "RoundRobin" :: n :: order :: Nil  => RoundRobin(n.toInt, order)
    case "Identity" :: Nil                  => Identity
    case "MultiBytePrefix" :: n :: Nil      => MultiBytePrefix(n.toInt)
    case other => throw new IllegalArgumentException(s"bad distributor config: $s")
  }
}
