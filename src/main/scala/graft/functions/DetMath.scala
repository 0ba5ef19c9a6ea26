package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic transcendental stand-ins shared with the DuckDB oracle.
  *
  * `java.lang.Math.log` is NOT a stable function of its argument across
  * call sites in one JVM: HotSpot compiles hot paths to an Intel
  * LIBM-derived dlog intrinsic while cold paths run the fdlibm fallback,
  * and the two differ in the last ulp on some arguments (observed live:
  * q_kl_sources' kl_term for 2 of 31 tokens differed between the
  * window-sort path and the aggregate path of the SAME query in the same
  * JVM). fdlibm (StrictMath) and glibc (DuckDB's ln) disagree on ~0.9%
  * of integer arguments (measured over 1..500000), so no libm choice
  * matches the oracle bit-for-bit either.
  *
  * `dln` therefore computes ln from IEEE-deterministic primitives only —
  * +, -, *, / and a bit-width exponent split — with the SAME arithmetic
  * shape the SQL macro `DetMath.dlnSql` emits for DuckDB. Both engines
  * evaluate the identical operation DAG, so the doubles agree bitwise
  * regardless of JIT state or libm version:
  *
  *   x = m * 2^e,  e = bitwidth(x) - 1  (x a positive BIGINT), m in [1,2)
  *   z = (m-1)/(m+1);  ln(m) = 2z * (1 + z^2/3 + z^4/5 + ... + z^18/19)
  *   ln(x) = e * LN2 + ln(m)
  *
  * The atanh series is truncated after the z^18/19 term: |z| <= 1/3 so
  * the absolute error is below 1e-11 — a modeling constant of the
  * queries that use it (an NLL or KL figure at 1e-11 is far inside any
  * decision threshold), in exchange for run-to-run and engine-to-engine
  * bit stability that no libm provides.
  */
object DetMath {

  private val Ln2 = 0.6931471805599453
  private val OddK = Seq(17, 15, 13, 11, 9, 7, 5, 3)

  /** Deterministic natural log of a positive integral column. */
  def dln(x: Column): Column = {
    val e = (length(bin(x)) - 1).cast("int")
    val m = x.cast("double") /
      call_function("shiftleft", lit(1L), e).cast("double")
    val z = (m - 1) / (m + 1)
    val z2 = z * z
    val inner = OddK.foldLeft(lit(1.0) / 19)((acc, k) =>
      lit(1.0) / k + z2 * acc)
    e.cast("double") * lit(Ln2) + lit(2.0) * z * (lit(1.0) + z2 * inner)
  }

  /** [[dln]] of `x` added to `df` as column `out`, with the e/m/z/z²
    * stages as NAMED projection attributes (r12, guide §3.3 planning
    * cost). The Column form re-inlines each stage's subtree at every
    * reference — z² appears 9× in the atanh series, m twice in z — so
    * dln(f(x)) is ~300 tree nodes per occurrence and a NESTED
    * dexp(…·dln(…)) multiplies that by the 14 references dexp makes to
    * its argument (~9,000 nodes: measured 2.2 s wall against 0.5 s of
    * task time on q_temperature_sweep, pure Catalyst/CacheManager tree
    * walking). Named stages keep the tree linear; CollapseProject
    * declines to merge a projection whose alias is referenced more than
    * once, so the staging survives optimization. The arithmetic DAG is
    * IDENTICAL to [[dln]] — bitwise-equal results.
    */
  def withDln(df: org.apache.spark.sql.DataFrame, x: Column,
              out: String): org.apache.spark.sql.DataFrame = {
    val (xc, ec, mc, zc, z2c) =
      (s"__dm_x_$out", s"__dm_e_$out", s"__dm_m_$out", s"__dm_z_$out",
        s"__dm_z2_$out")
    val inner = OddK.foldLeft(lit(1.0) / 19)((acc, k) =>
      lit(1.0) / k + col(z2c) * acc)
    df.withColumn(xc, x)
      .withColumn(ec, (length(bin(col(xc))) - 1).cast("int"))
      .withColumn(mc, col(xc).cast("double") /
        call_function("shiftleft", lit(1L), col(ec)).cast("double"))
      .withColumn(zc, (col(mc) - 1) / (col(mc) + 1))
      .withColumn(z2c, col(zc) * col(zc))
      .withColumn(out, col(ec).cast("double") * lit(Ln2) +
        lit(2.0) * col(zc) * (lit(1.0) + col(z2c) * inner))
      .drop(xc, ec, mc, zc, z2c)
  }

  /** [[dexp]] of `x` added to `df` as column `out`, with the x/k/r
    * stages named — see [[withDln]] for why. Identical IEEE DAG to
    * [[dexp]].
    */
  def withDexp(df: org.apache.spark.sql.DataFrame, x: Column,
               out: String): org.apache.spark.sql.DataFrame = {
    val (xc, kc, rc) = (s"__dm_x_$out", s"__dm_k_$out", s"__dm_r_$out")
    val acc1 = (2 to 13).reverse.foldLeft(lit(1.0))((acc, j) =>
      lit(1.0) + (col(rc) / j) * acc)
    df.withColumn(xc, x)
      .withColumn(kc, floor(col(xc) / lit(Ln2)).cast("int"))
      .withColumn(rc, col(xc) - col(kc).cast("double") * lit(Ln2))
      .withColumn(out,
        call_function("shiftleft", lit(1L), col(kc)).cast("double") *
          (lit(1.0) + col(rc) * acc1))
      .drop(xc, kc, rc)
  }

  /** The same operation DAG as `dln`, as DuckDB SQL over column names
    * `e`, `z`, `z2` (stage them in CTEs with `dlnPrepSql`).
    */
  def dlnSql(e: String, z: String, z2: String): String = {
    val inner = OddK.foldLeft("1.0 / 19")((acc, k) =>
      s"1.0 / $k + $z2 * ($acc)")
    s"CAST($e AS DOUBLE) * 6.931471805599453e-1 + 2.0 * $z * (1.0 + $z2 * ($inner))"
  }

  /** SQL for the exponent / mantissa-ratio stages: returns the three
    * expressions (e, z, z2) for integral SQL expression `x` — select
    * them into consecutive CTE layers (z references e, z2 references z).
    */
  def dlnESql(x: String): String = s"LENGTH(BIN($x)) - 1"
  def dlnZSql(x: String, e: String): String =
    s"(CAST($x AS DOUBLE) / CAST((CAST(1 AS BIGINT) << ($e)) AS DOUBLE) - 1) / " +
      s"(CAST($x AS DOUBLE) / CAST((CAST(1 AS BIGINT) << ($e)) AS DOUBLE) + 1)"

  /** Deterministic ln for POSITIVE double columns (x >= 2^-32):
    * defined as dln of the 2^-32-quantized argument — ln(floor(x*2^32))
    * - 32 ln2. The quantization (relative error <= 1/(x*2^32), i.e.
    * < 2.4e-10 for x >= 1) is part of the operator's definition: both
    * engines quantize identically, so the result is bitwise stable,
    * which no libm ln of the raw double can promise. Use dln for
    * integral arguments (exact); use this when the argument is itself
    * a computed double (softmax shares, Gumbel keys).
    */
  def dlnD(x: Column): Column =
    dln(floor(x * lit(4294967296.0)).cast("long")) - lit(32.0) * lit(Ln2)

  /** CTE chain staging dlnD of double expression `x`: quantizes into
    * `<name>_q` then reuses the integral staging.
    */
  def lnDCtesSql(name: String, from: String, keep: String, x: String,
      as: String): String =
    s"""${name}_q AS (
       |  SELECT $keep,
       |    CAST(floor(($x) * 4294967296.0) AS BIGINT) AS __dm_q
       |  FROM $from
       |), ${lnCtesSql(name + "_i", name + "_q", s"$keep, __dm_q",
           "__dm_q", as + "_i")},
       |$name AS (
       |  SELECT $keep,
       |    ${as}_i - 32.0 * 6.931471805599453e-1 AS $as
       |  FROM ${name}_i
       |)""".stripMargin

  /** Deterministic e^x for NONNEGATIVE double columns (x < 43):
    * split x = k ln2 + r with k = floor(x/ln2), r in [0, ln2); e^r by
    * the 13-term Taylor Horner; e^x = 2^k * e^r. Same caveats and
    * guarantees as `dln` — identical operation DAG as `dexpSql`,
    * absolute relative error < 1e-11, bitwise stable across engines
    * and JIT states.
    */
  def dexp(x: Column): Column = {
    val k = floor(x / lit(Ln2)).cast("int")
    val r = x - k.cast("double") * lit(Ln2)
    val acc1 = (2 to 13).reverse.foldLeft(lit(1.0))((acc, j) =>
      lit(1.0) + (r / j) * acc)
    val ser = lit(1.0) + r * acc1
    call_function("shiftleft", lit(1L), k).cast("double") * ser
  }

  /** The same operation DAG as `dexp`, as DuckDB SQL over staged
    * column names `k` (INT) and `r` (DOUBLE) — stage them with
    * dexpKSql/dexpRSql.
    */
  def dexpSql(k: String, r: String): String = {
    val acc1 = (2 to 13).reverse.foldLeft("1.0")((acc, j) =>
      s"1.0 + ($r / $j) * ($acc)")
    s"CAST((CAST(1 AS BIGINT) << ($k)) AS DOUBLE) * (1.0 + $r * ($acc1))"
  }

  def dexpKSql(x: String): String =
    s"CAST(floor(($x) / 6.931471805599453e-1) AS INT)"
  def dexpRSql(x: String, k: String): String =
    s"($x) - CAST($k AS DOUBLE) * 6.931471805599453e-1"

  /** CTE chain staging the deterministic e^x of double expression `x`
    * over base CTE `from` (carrying columns `keep`): emits `<name>`
    * with keep ++ the exp as `as`.
    */
  def expCtesSql(name: String, from: String, keep: String, x: String,
      as: String): String =
    s"""${name}_k AS (
       |  SELECT $keep, ${dexpKSql(x)} AS __dm_k FROM $from
       |), ${name}_r AS (
       |  SELECT $keep, __dm_k, ${dexpRSql(x, "__dm_k")} AS __dm_r
       |  FROM ${name}_k
       |), $name AS (
       |  SELECT $keep, ${dexpSql("__dm_k", "__dm_r")} AS $as
       |  FROM ${name}_r
       |)""".stripMargin

  /** CTE chain staging the deterministic ln of integral expression `x`
    * over base CTE `from` (carrying columns `keep`): emits `<name>`
    * with keep ++ the ln as `as`. Chain several to stage several lns.
    */
  def lnCtesSql(name: String, from: String, keep: String, x: String,
      as: String): String =
    s"""${name}_e AS (
       |  SELECT $keep, ${dlnESql(x)} AS __dm_e FROM $from
       |), ${name}_z AS (
       |  SELECT $keep, __dm_e, ${dlnZSql(x, "__dm_e")} AS __dm_z
       |  FROM ${name}_e
       |), ${name}_w AS (
       |  SELECT $keep, __dm_e, __dm_z, __dm_z * __dm_z AS __dm_z2
       |  FROM ${name}_z
       |), $name AS (
       |  SELECT $keep, ${dlnSql("__dm_e", "__dm_z", "__dm_z2")} AS $as
       |  FROM ${name}_w
       |)""".stripMargin
}
