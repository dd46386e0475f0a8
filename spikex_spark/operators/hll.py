"""HyperLogLog distinct-count sketch with integer-exact registers.

Completes the sketch family (KMV/theta in ``sketch.py``, count-min in
``cms_*``): HLL is THE fixed-size mergeable cardinality sketch — m int
registers per group regardless of cardinality, merged by element-wise
``max``, which is what lets a 1000-executor job union per-shard sketches
instead of re-shuffling raw values (Flajolet et al. '07; same shape as
Spark's own ``approx_count_distinct`` HLL++, re-expressed relationally so
the sketch is a TABLE you can store, merge across days, and oracle-check).

Representation: (grp, register, rho) — register = low ``p`` bits of the
md5-60 hash, rho = 1 + leading zeros of the remaining 60-p bits, i.e.
``(60-p) - floor(log2(rest)) + 1`` clamped to [1, _RHO_CAP]. Absent
registers mean rho=0 (dense form materializes them via a tiny m-row
cross join). All integers — the oracle reproduces every register.

Determinism: the classic estimator's harmonic sum Σ2^-rho is a float
reduction (order-dependent). Here it is computed as the INTEGER
``Z = Σ 2^(_RHO_CAP - rho)`` (each term a power of two ≤ 2^57, m·2^57
fits int64 for m ≤ 64), so the estimate ``α·m²·2^57 / Z`` is one double
division of exact integers — bit-reproducible. Capping rho at 57 only
matters past ~2^57 distincts per register, far beyond any corpus.

Small-range correction: below ``2.5·m`` the raw estimator is biased high
(+50% at n≈m), so the standard linear-counting fallback kicks in when
``raw ≤ 2.5m`` and zero registers remain: ``E = m·ln(m/V)`` with V the
zero-register count — an integer-V expression both engines evaluate
identically. The branch condition compares the raw float against a
literal, again a single deterministic expression. No large-range
correction (irrelevant below 2^57 distincts per group).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _md5_60
from .retrieval import _tokens

_P = 6                 # 2^6 = 64 registers
_M = 1 << _P
_RHO_CAP = 57          # keeps Σ 2^(cap-rho) in int64 for m=64
# alpha_64 from Flajolet et al.: 0.7213 / (1 + 1.079/m)
_ALPHA_M = 0.7213 / (1.0 + 1.079 / _M)


def hll_sparse_registers(df: DataFrame, group_col: str,
                         value_col: str) -> DataFrame:
    """(grp, register, rho): the SPARSE sketch — only touched registers.

    One map + one map-side-combined groupBy(grp, register).max. ``max``
    is a monotone streaming-safe aggregate, so this same operator runs
    unchanged over a ``readStream`` source in complete mode — HLL at
    ingest (the streaming contract query does exactly that and must
    hash-equal the batch sketch).
    """
    h = _md5_60(F.col(value_col).cast("string"))
    # low p bits pick the register; the remaining 60-p bits feed rho
    reg = (h % F.lit(_M)).alias("register")
    rest = F.shiftright(h, _P)
    # rho = (60-p) - floor(log2(rest)) + 1 for rest>0; else the cap.
    # floor(log2) via INTEGER bit length (length of the base-2 string,
    # Spark conv / DuckDB bin) — float log2 rounds UP to k for values
    # just under 2^k once k·ulp exceeds the gap, and libm last-ulp
    # behavior differs across engines; string length cannot.
    # leading zeros of the (60-p)-bit window = (60-p) - bitlen, rho = +1
    bitlen = F.length(F.conv(rest, 10, 2))
    rho_raw = F.when(
        rest > 0, F.lit(60 - _P) - bitlen + F.lit(1)
    ).otherwise(F.lit(_RHO_CAP))
    rho = F.least(rho_raw, F.lit(_RHO_CAP))
    return (df.select(F.col(group_col).alias("grp"), reg,
                      rho.cast("int").alias("rho"))
            .groupBy("grp", "register").agg(F.max("rho").alias("rho")))


def hll_densify(sparse: DataFrame) -> DataFrame:
    """Dense m-register form: every group × every register, absent → 0.

    The dense form makes sketches from different shards align
    row-for-row, so a merge is a plain groupBy...max over a union.
    """
    spark = sparse.sparkSession
    regs = spark.range(_M).select(F.col("id").cast("int").alias("register"))
    # double-alias mints fresh attribute ids for the groups side: the
    # later self-join against `sparse` otherwise hits "Conflicting
    # attributes" when sparse is a streaming memory-sink view
    groups = (sparse.select(F.col("grp").alias("__grp")).distinct()
              .select(F.col("__grp").alias("grp")))
    return (groups.crossJoin(F.broadcast(regs))
            .join(sparse, ["grp", "register"], "left")
            .select("grp", "register",
                    F.coalesce(F.col("rho"), F.lit(0)).alias("rho")))


def hll_registers(df: DataFrame, group_col: str,
                  value_col: str) -> DataFrame:
    """(grp, register, rho): the DENSE m-register HLL sketch per group."""
    return hll_densify(hll_sparse_registers(df, group_col, value_col))


def hll_estimate(registers: DataFrame) -> DataFrame:
    """(grp, z_scaled, est_distinct) from a dense register table.

    z_scaled = Σ 2^(57-rho) — exact int64; the raw HLL estimate is the
    single float expression α·m²·2^57/z, rounded to 4 decimals.
    """
    # SQL expr: the Python shiftleft() only takes literal bit counts
    z = F.sum(F.expr(f"shiftleft(1L, {_RHO_CAP} - rho)")).alias("z_scaled")
    zeros = F.sum(F.when(F.col("rho") == 0, 1).otherwise(0)).alias("v_zero")
    agg = registers.groupBy("grp").agg(z, zeros)
    num = _ALPHA_M * _M * _M * float(1 << _RHO_CAP)
    raw = F.lit(num) / F.col("z_scaled").cast("double")
    linear = F.lit(float(_M)) * F.log(
        F.lit(float(_M)) / F.col("v_zero").cast("double"))
    est = F.when((raw <= F.lit(2.5 * _M)) & (F.col("v_zero") > 0),
                 linear).otherwise(raw)
    return agg.select("grp", "z_scaled", "v_zero",
                      F.round(est, 4).alias("est_distinct"))


def hll_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union two dense sketch tables: element-wise max per register.

    Mergeability is the point of HLL: sketch(A ∪ B) == merge(sketch(A),
    sketch(B)) exactly, register for register — gate-checked in pytest.
    Groups present in only one input keep their registers (union + max
    handles that with no outer-join special case, because both inputs
    are dense).
    """
    return (a.unionByName(b)
            .groupBy("grp", "register").agg(F.max("rho").alias("rho")))


def hll_distinct_tokens(df: DataFrame, group_col: str,
                        text_col: str) -> DataFrame:
    """(grp, est_distinct, true_distinct): HLL estimate of per-group
    distinct token counts next to the exact answer — the contract-query
    surface (same pairing as ``kmv_distinct_tokens``).
    """
    toks = df.select(F.col(group_col).alias("g0"),
                     F.explode(_tokens(F.col(text_col))).alias("token"))
    regs = hll_registers(toks, "g0", "token")
    est = hll_estimate(regs)
    true = (toks.groupBy("g0").agg(
        F.countDistinct("token").alias("true_distinct"))
        .withColumnRenamed("g0", "grp"))
    return (est.join(true, "grp")
            .select(F.col("grp"), "z_scaled", "v_zero", "est_distinct",
                    "true_distinct"))
