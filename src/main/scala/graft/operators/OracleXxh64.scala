package graft.operators

/** DuckDB SQL generator mirroring Spark's `XXH64.hashLong` /
  * `XXH64.hashInt` (the long-domain xxHash64 finalizers MinHashSigExpr
  * and MinHashSketchAgg are built on) bit-for-bit in HUGEINT
  * arithmetic — the pairing trick that turned `ts_downsample_lttb`
  * from declared-N to oracle-green, extended from additive folds to
  * full mod-2^64 multiply/rotate/xor chains.
  *
  * Every value is carried as a NON-NEGATIVE HUGEINT < 2^64:
  *   - `a * b mod 2^64` splits the left operand at 32 bits so no
  *     intermediate exceeds 2^96 (a signed-HUGEINT overflow at 2^127
  *     is otherwise reachable from two 64-bit operands);
  *   - rotations become one multiply-mod plus one floor-division of
  *     disjoint bit ranges (their sum is the bitwise OR);
  *   - xor round-trips through UBIGINT, where DuckDB defines it.
  * The chain is emitted as NESTED SELECT STEPS — one derived column
  * per hash round, each referencing its predecessor BY NAME — because
  * textual inlining would duplicate each operand 2-3x per round and
  * grow the SQL exponentially over the ~12-round chain.
  *
  * Validated bit-exact against `org.apache.spark.sql.catalyst
  * .expressions.XXH64` for hashLong(·, 42), hashLong(·, seed) and
  * hashInt(j, ·) over sign/extreme cases before wiring (r11), and
  * re-proven end-to-end by every oracle run of the paired queries.
  */
private[operators] object OracleXxh64 {

  val M: BigInt = BigInt(1) << 64
  private val P1 = BigInt("9E3779B185EBCA87", 16)
  private val P2 = BigInt("C2B2AE3D27D4EB4F", 16)
  private val P3 = BigInt("165667B19E3779F9", 16)
  private val P4 = BigInt("85EBCA77C2B2AE63", 16)
  private val P5 = BigInt("27D4EB2F165667C5", 16)

  /** `a * b mod 2^64`, `a` a column/expression, `b` a constant. */
  private def mulmod(a: String, b: BigInt): String =
    s"(((($a) // 4294967296) * ${b}::HUGEINT % 4294967296) * 4294967296" +
      s" + (($a) % 4294967296) * ${b}::HUGEINT) % 18446744073709551616"

  /** Rotate-left by constant r (only r <= 31 is ever used, keeping
    * the pre-mod product under 2^96).
    */
  private def rotl(a: String, r: Int): String =
    s"((($a) * ${BigInt(1) << r}::HUGEINT) % 18446744073709551616" +
      s" + ($a) // ${BigInt(1) << (64 - r)}::HUGEINT)"

  private def xor64(a: String, b: String): String =
    s"CAST(xor(CAST(($a) AS UBIGINT), CAST(($b) AS UBIGINT)) AS HUGEINT)"

  private def shr(a: String, n: Int): String =
    s"(($a) // ${BigInt(1) << n}::HUGEINT)"

  /** xxHash64 avalanche finalizer as chained (column, expr) steps;
    * the result lands in column `<p>f5`.
    */
  private def fmix(hin: String, p: String): Seq[(String, String)] = Seq(
    s"${p}f1" -> xor64(hin, shr(hin, 33)),
    s"${p}f2" -> mulmod(s"${p}f1", P2),
    s"${p}f3" -> xor64(s"${p}f2", shr(s"${p}f2", 29)),
    s"${p}f4" -> mulmod(s"${p}f3", P3),
    s"${p}f5" -> xor64(s"${p}f4", shr(s"${p}f4", 32)))

  /** XXH64.hashLong(u, seed): `u`, `seed` non-negative HUGEINT
    * expressions; result column `<p>f5`.
    */
  def hashLongSteps(u: String, seed: String,
                    p: String): Seq[(String, String)] = {
    val s0 = s"((($seed) + ${P5 + 8}::HUGEINT) % 18446744073709551616)"
    Seq(
      s"${p}k1" -> mulmod(u, P2),
      s"${p}k2" -> rotl(s"${p}k1", 31),
      s"${p}k3" -> mulmod(s"${p}k2", P1),
      s"${p}h1" -> xor64(s0, s"${p}k3"),
      s"${p}h2" -> (s"(${mulmod(rotl(s"${p}h1", 27), P1)}" +
        s" + ${P4}::HUGEINT) % 18446744073709551616")
    ) ++ fmix(s"${p}h2", p)
  }

  /** XXH64.hashInt(j, base): `j` a non-negative (< 2^32) HUGEINT
    * expression (Java's `& 0xFFFFFFFFL` is the identity there),
    * `base` the seed; result column `<p>f5`.
    */
  def hashIntSteps(j: String, base: String,
                   p: String): Seq[(String, String)] = {
    val t0 = s"((($base) + ${P5 + 4}::HUGEINT) % 18446744073709551616)"
    Seq(
      s"${p}t1" -> xor64(t0, mulmod(j, P1)),
      s"${p}t2" -> (s"(${mulmod(rotl(s"${p}t1", 23), P2)}" +
        s" + ${P3}::HUGEINT) % 18446744073709551616")
    ) ++ fmix(s"${p}t2", p)
  }

  /** Wrap `baseSql` in one nested SELECT per step. */
  def chain(baseSql: String, steps: Seq[(String, String)]): String =
    steps.foldLeft(baseSql) { case (sql, (name, e)) =>
      s"SELECT *, $e AS $name FROM ($sql)"
    }

  /** Signed-BIGINT view of a non-negative mod-2^64 value (Spark's
    * min/compare on hashes is SIGNED long comparison).
    */
  def toSigned(v: String): String =
    s"CAST(($v) - CASE WHEN ($v) >= 9223372036854775808::HUGEINT" +
      s" THEN 18446744073709551616::HUGEINT ELSE 0::HUGEINT END AS BIGINT)"

  /** Non-negative HUGEINT view of a signed BIGINT column. */
  def toUnsigned(c: String): String =
    s"(CAST($c AS HUGEINT) + CASE WHEN $c < 0" +
      s" THEN 18446744073709551616::HUGEINT ELSE 0::HUGEINT END)"
}
