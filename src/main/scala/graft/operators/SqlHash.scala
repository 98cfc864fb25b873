package graft.operators

/** DuckDB-SQL replication of the 64-bit hash primitives the engine's
  * sketch operators build on — the generator behind the r7 oracle
  * promotions of `dedup_simhash` and `dedup_minhash_lsh(,_native)`.
  *
  * The problem: Spark's `xxhash64` (and the engine's banding keys,
  * which chain `xxhash64` over longs) is engine-native, so any
  * operator keyed on it was stuck rows-only. The replication runs the
  * EXACT XXH64 algorithm (same primes, stripe accumulator path, tail
  * steps, avalanche, seed 42) in DuckDB SQL:
  *
  *  - 64-bit state lives as UNSIGNED values carried in HUGEINT
  *    (int128);
  *  - the wrap multiply `(a*b) mod 2^64` CANNOT be done directly
  *    (a full 64×64 product overflows int128), so it decomposes into
  *    32-bit limbs: `((ah·bl + al·bh) mod 2^32)·2^32 + al·bl`, every
  *    intermediate ≤ 2^65;
  *  - xor round-trips through signed BIGINT (DuckDB's `xor` is
  *    signed; the bit pattern is what matters);
  *  - rotations and shifts are exact HUGEINT div/mod by powers of 2;
  *  - variable-length loops (32-byte stripes, 8-byte tail chunks, the
  *    byte tail) run as `list_reduce` folds; intermediates bind ONCE
  *    through one-element list comprehensions (`[body for x in
  *    [expr]][1]`) so generated text grows linearly, not
  *    exponentially.
  *
  * Validated bit-for-bit against `xxhash64` on every length class
  * (empty, <4, <8, 8-aligned, 4-tail, byte-tail, 31/32/33, multiple
  * stripes) and end-to-end by the simhash/minhash oracle matches at
  * all three scale factors. DuckDB's expression BINDER recurses per
  * nested lambda (limit 128), so consumers must keep chains of
  * hashLong calls in SEQUENTIAL CTE stages, not one expression (see
  * [[Dedup.minhashLshSql]]'s four band stages).
  */
private[graft] object SqlHash {
  private val M64 = "18446744073709551616::HUGEINT"
  private val M63 = "9223372036854775808::HUGEINT"
  private val M32 = "4294967296::HUGEINT"
  // XXH64 primes (public constants)
  private val P1 = BigInt("9E3779B185EBCA87", 16)
  private val P2 = BigInt("C2B2AE3D27D4EB4F", 16)
  private val P3 = BigInt("165667B19E3779F9", 16)
  private val P4 = BigInt("85EBCA77C2B2AE63", 16)
  private val P5 = BigInt("27D4EB2F165667C5", 16)
  private val Seed = BigInt(42)
  private val W = BigInt(1) << 64

  /** Bind `val` once as `var` inside `body` (one-element list
    * comprehension — DuckDB's expression-level `let`). */
  def bind(v: String, value: String, body: String): String =
    s"[$body for $v in [$value]][1]"

  /** (a·b) mod 2^64 via 32-bit limbs; binds each argument once. */
  def wmul(a: String, b: String, tag: String): String = {
    val (x, y) = (s"mx$tag", s"my$tag")
    val body = s"CAST(((($x // $M32) * ($y % $M32) + ($x % $M32) * ($y // $M32)) " +
      s"% $M32 * $M32 + ($x % $M32) * ($y % $M32)) % $M64 AS HUGEINT)"
    bind(x, a, bind(y, b, body))
  }

  def rotl(x: String, r: Int, tag: String): String = {
    val v = s"rx$tag"
    val lo = s"${BigInt(1) << r}::HUGEINT"
    val hi = s"${BigInt(1) << (64 - r)}::HUGEINT"
    bind(v, x, s"CAST(($v % $hi) * $lo + $v // $hi AS HUGEINT)")
  }

  def xor64(a: String, b: String, tag: String): String = {
    val (x, y) = (s"ax$tag", s"ay$tag")
    def sgn(e: String) =
      s"CAST(CASE WHEN $e >= $M63 THEN $e - $M64 ELSE $e END AS BIGINT)"
    val body = s"CAST(CAST(CAST(xor(${sgn(x)}, ${sgn(y)}) AS HUGEINT) " +
      s"% $M64 + $M64 AS HUGEINT) % $M64 AS HUGEINT)"
    bind(x, a, bind(y, b, body))
  }

  def add(a: String, b: String): String = s"CAST(($a + $b) % $M64 AS HUGEINT)"

  /** Unsigned HUGEINT → the signed BIGINT Spark returns. */
  def toSigned(e: String): String =
    s"CAST(CASE WHEN $e >= $M63 THEN $e - $M64 ELSE $e END AS BIGINT)"

  /** Signed BIGINT expression → unsigned HUGEINT state. */
  def toUnsigned(e: String): String =
    s"CAST(CAST($e AS HUGEINT) % $M64 + $M64 AS HUGEINT) % $M64"

  /** The XXH64 finalization avalanche. */
  def fmix(h0: String, tag: String): String = {
    def xshr(x: String, s: Int, t: String) =
      bind(s"v$t", x, xor64(s"v$t", s"CAST(v$t // ${BigInt(1) << s}::HUGEINT AS HUGEINT)", t))
    var h = xshr(h0, 33, s"${tag}f1")
    h = wmul(h, s"$P2::HUGEINT", s"${tag}f2")
    h = xshr(h, 29, s"${tag}f3")
    h = wmul(h, s"$P3::HUGEINT", s"${tag}f4")
    xshr(h, 32, s"${tag}f5")
  }

  /** Spark `xxhash64(<bigint>)` with a running seed — ONE long's
    * 8 bytes through the tail-8 step + avalanche. `lvar` must be a
    * bound unsigned-HUGEINT variable; keep CHAINS of these in
    * sequential CTE stages (binder depth). */
  def hashLong(lvar: String, seed: String, tag: String): String = {
    val h0 = add(seed, s"${(P5 + 8) % W}::HUGEINT")
    val k1 = wmul(rotl(wmul(lvar, s"$P2::HUGEINT", s"${tag}k1"), 31, s"${tag}k"),
      s"$P1::HUGEINT", s"${tag}k2")
    val h = add(wmul(rotl(xor64(h0, k1, s"${tag}x"), 27, s"${tag}h"),
      s"$P1::HUGEINT", s"${tag}m"), s"$P4::HUGEINT")
    fmix(h, tag)
  }

  /** Spark `xxhash64(<string>)` (seed 42) of the ASCII string variable
    * `g`, as signed BIGINT — full algorithm: 32-byte stripe
    * accumulators when length ≥ 32, 8-byte tail chunks, the 4-byte
    * step, the byte tail, and the avalanche. */
  def xxh64String(g: String): String = {
    val bs = s"[CAST(ord($g[i+1]) AS HUGEINT) for i in range(0, length($g))]"
    def u64(p: String) = "CAST(" + (0 until 8).map(j =>
      s"bb[$p+$j] * ${BigInt(1) << (8 * j)}::HUGEINT").mkString(" + ") +
      s" % $M64 AS HUGEINT)"
    def u32(p: String) = "CAST(" + (0 until 4).map(j =>
      s"bb[$p+$j] * ${BigInt(1) << (8 * j)}::HUGEINT").mkString(" + ") +
      " AS HUGEINT)"
    val stripes = s"[[${(0 until 4).map(j => u64(s"s*32+${8 * j}+1")).mkString(", ")}] " +
      "for s in range(0, len(bb) // 32)]"
    def accRound(acc: String, lane: String, tag: String) =
      wmul(rotl(add(acc, wmul(lane, s"$P2::HUGEINT", s"${tag}a")), 31, tag),
        s"$P1::HUGEINT", s"${tag}b")
    val stripeLambda = "(st, ln) -> [" +
      (0 until 4).map(i => accRound(s"st[${i + 1}]", s"ln[${i + 1}]", s"s$i")).mkString(", ") + "]"
    val initAccs = s"[CAST(${(Seed + P1 + P2) % W}::HUGEINT AS HUGEINT), " +
      s"CAST(${(Seed + P2) % W}::HUGEINT AS HUGEINT), " +
      s"CAST($Seed::HUGEINT AS HUGEINT), " +
      s"CAST(${(Seed - P1 + W) % W}::HUGEINT AS HUGEINT)]"
    val accs = s"list_reduce([$initAccs] || $stripes, $stripeLambda)"
    val rotSum = add(add(rotl("ac[1]", 1, "r1"), rotl("ac[2]", 7, "r2")),
      add(rotl("ac[3]", 12, "r3"), rotl("ac[4]", 18, "r4")))
    def merge(h: String, acc: String, tag: String) = {
      val k = wmul(rotl(wmul(acc, s"$P2::HUGEINT", s"${tag}m1"), 31, tag),
        s"$P1::HUGEINT", s"${tag}m2")
      add(wmul(xor64(h, k, s"${tag}x"), s"$P1::HUGEINT", s"${tag}m3"), s"$P4::HUGEINT")
    }
    var hLong = rotSum
    (0 until 4).foreach(i => hLong = merge(hLong, s"ac[${i + 1}]", s"g$i"))
    val h0 = s"CASE WHEN len(bb) >= 32 THEN ${bind("ac", accs, hLong)} " +
      s"ELSE CAST(${(Seed + P5) % W}::HUGEINT AS HUGEINT) END"
    val h1 = add(bind("h0v", h0, "h0v"), "CAST(len(bb) AS HUGEINT)")
    val chunk8s = s"[${u64("(len(bb) // 32)*32 + c*8 + 1")} " +
      "for c in range(0, (len(bb) - (len(bb) // 32)*32) // 8)]"
    def tail8(h: String, lane: String, tag: String) = {
      val k1 = wmul(rotl(wmul(lane, s"$P2::HUGEINT", s"${tag}t1"), 31, tag),
        s"$P1::HUGEINT", s"${tag}t2")
      add(wmul(rotl(xor64(h, k1, s"${tag}x"), 27, s"${tag}h"),
        s"$P1::HUGEINT", s"${tag}t3"), s"$P4::HUGEINT")
    }
    val h2 = s"list_reduce([$h1] || $chunk8s, (hh, ln) -> ${tail8("hh", "ln", "t8")})"
    val i4 = "((len(bb) // 32)*32 + ((len(bb) - (len(bb) // 32)*32) // 8)*8)"
    val rem4 = s"(len(bb) - $i4)"
    val tail4 = add(wmul(rotl(xor64("h2v", wmul(u32(s"$i4 + 1"), s"$P1::HUGEINT", "f1"), "fx"),
      23, "f4"), s"$P2::HUGEINT", "f2"), s"$P3::HUGEINT")
    val h3 = bind("h2v", h2, s"CASE WHEN $rem4 >= 4 THEN $tail4 ELSE h2v END")
    val i1 = s"($i4 + CASE WHEN $rem4 >= 4 THEN 4 ELSE 0 END)"
    val bytesTail = s"[bb[i+1] for i in range($i1, len(bb))]"
    def tailB(h: String, b: String, tag: String) =
      wmul(rotl(xor64(h, wmul(b, s"$P5::HUGEINT", s"${tag}b1"), s"${tag}x"), 11, tag),
        s"$P1::HUGEINT", s"${tag}b2")
    val h4 = s"list_reduce([$h3] || $bytesTail, (hb, bv) -> ${tailB("hb", "bv", "tb")})"
    val h5 = fmix(h4, "av")
    bind("bb", bs, bind("fin", h5, toSigned("fin")))
  }
}
