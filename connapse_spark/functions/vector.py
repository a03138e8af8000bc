"""Vector math as native Spark column expressions (JVM-side, no UDFs).

Re-expresses the reference's cosine/mean-pool math
(SemanticChunker.cs:290-345, PgVectorStore.cs:262-266) as Catalyst
expressions over ``array<double>`` columns. Keeping this out of Python
means whole-stage codegen covers the scoring loop — at 100 TB the
similarity scan is compute-bound and must stay JVM-side.

Determinism note: ``dot_expr`` is a *left fold* over the zipped products, so
the floating-point summation order is fixed regardless of partitioning
(the array lives in one row; no cross-row reduction is involved). The DuckDB
oracle mirrors the same fold via ``list_reduce``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot_expr(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two array<double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2norm_expr(a: Column) -> Column:
    return F.sqrt(dot_expr(a, a))


def bind_once(expr: Column, fn) -> Column:
    """Evaluate ``expr`` once per row and hand the bound value to ``fn``
    as a lambda variable (one-element ``transform``): Catalyst HOFs run
    interpreted with no subexpression elimination, so a subtree
    referenced twice is evaluated twice unless bound this way.

    Public name (r12, ADVICE r11): keyword_index and plans/pq build their
    fold kernels on this helper, so it is part of the module's contract —
    the old underscore alias is kept for source compatibility."""
    return F.element_at(F.transform(F.array(expr), fn), 1)


_bind = bind_once


def cosine_expr(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 when either vector has zero magnitude
    (reference: SemanticChunker.cs:322-345).

    Arrays and norms are BOUND once (r11): the ``when`` references each
    norm in both its condition and its value branch, so the unbound form
    ran each O(d) norm fold twice — five interpreted array folds per row
    where three suffice (and input EXPRESSIONS re-evaluated inside every
    fold). Measured 1.33-1.38x on a 400k-row × d=64 scoring scan,
    bit-identical output (same folds, same order, each value computed
    once instead of twice)."""

    def _with_arrays(aa: Column, bb: Column) -> Column:
        return _bind(
            F.sqrt(dot_expr(aa, aa)),
            lambda na: _bind(
                F.sqrt(dot_expr(bb, bb)),
                lambda nb: F.when(
                    (na > F.lit(0.0)) & (nb > F.lit(0.0)),
                    dot_expr(aa, bb) / (na * nb),
                ).otherwise(F.lit(0.0)),
            ),
        )

    return _bind(a, lambda aa: _bind(b, lambda bb: _with_arrays(aa, bb)))


def paired_cosine_expr(na: Column, nb: Column, a: Column, b: Column) -> Column:
    """Cosine from pre-materialized per-row norms: dot/(na·nb), 0.0 on zero
    magnitude — the same FP operation order as cosine_expr, so the DuckDB
    mirrors are unchanged. Computing norms once per ROW (before the join)
    instead of per PAIR is the difference between O(n²·d) and O(n·d) norm
    work in any pairwise kernel; the join boundary stops Catalyst's
    CollapseProject from inlining them back into the pair stage."""
    return F.when(
        (na > F.lit(0.0)) & (nb > F.lit(0.0)), dot_expr(a, b) / (na * nb)
    ).otherwise(F.lit(0.0))


def py_l2norm(vals) -> float:
    """Driver-side L2 norm in the EXACT fold order of :func:`l2norm_expr`:
    products accumulated left-to-right from a 0.0 seed, then sqrt. Python
    floats are IEEE doubles, so for a literal query vector this produces
    the same bits the Catalyst fold would — which is what lets a scan
    against a Python-literal query skip the per-row query-norm fold."""
    import math

    acc = 0.0
    for v in vals:
        v = float(v)
        acc = acc + v * v
    return math.sqrt(acc)


def cosine_to_query_expr(
    vec: Column, query_vec, norm_col: Column | None = None
) -> Column:
    """Cosine of a row vector against a PYTHON-LITERAL query vector.

    ``cosine_expr(row, q_literal)`` pays three O(d) folds per row — the
    query's own norm is a fold over a literal array that Catalyst does NOT
    constant-fold (HOFs run interpreted). Here the query norm folds
    driver-side via :func:`py_l2norm` (identical FP order → identical
    double) and lands as a scalar literal, so the scan pays two folds per
    row; pass ``norm_col`` (a pre-materialized row-norm column) to share
    the row's norm across a batch of queries — 1 + n_q folds per row
    instead of 3·n_q. Operand order matches cosine_expr(a=row, b=query):
    condition (norm_row > 0) AND (norm_q > 0), denominator norm_row·norm_q
    — so scores are bit-identical and the DuckDB mirrors are unchanged."""
    qn = py_l2norm(query_vec)
    qarr = F.array(*[F.lit(float(v)) for v in query_vec])
    if norm_col is not None:
        return F.when(
            (norm_col > F.lit(0.0)) & (F.lit(qn) > F.lit(0.0)),
            dot_expr(vec, qarr) / (norm_col * F.lit(qn)),
        ).otherwise(F.lit(0.0))
    return _bind(
        vec,
        lambda vv: _bind(
            F.sqrt(dot_expr(vv, vv)),
            lambda nv: F.when(
                (nv > F.lit(0.0)) & (F.lit(qn) > F.lit(0.0)),
                dot_expr(vv, qarr) / (nv * F.lit(qn)),
            ).otherwise(F.lit(0.0)),
        ),
    )


# ---------------------------------------------------------------------------
# DuckDB-oracle SQL mirrors (same operation order → bit-identical doubles)
# ---------------------------------------------------------------------------


def sql_double_array(c: str) -> str:
    return f"CAST({c} AS DOUBLE[])"


def sql_dot(a: str, b: str) -> str:
    # list_reduce is a left fold like F.aggregate; seed folded via 0.0 prefix.
    return (
        f"list_reduce(list_prepend(0.0, "
        f"list_transform(range(1, len({a}) + 1), i -> {a}[i] * {b}[i])), "
        f"(acc, v) -> acc + v)"
    )


def sql_norm(a: str) -> str:
    return f"sqrt({sql_dot(a, a)})"


def sql_cosine(a: str, b: str) -> str:
    return (
        f"CASE WHEN {sql_norm(a)} > 0.0 AND {sql_norm(b)} > 0.0 "
        f"THEN {sql_dot(a, b)} / ({sql_norm(a)} * {sql_norm(b)}) ELSE 0.0 END"
    )


def l2sq_expr(a: Column, b: Column) -> Column:
    """Sequential-fold squared L2 distance Σ(aᵢ-bᵢ)² of two array<double>
    columns — the distance kernel product quantization minimizes."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def sql_l2sq(a: str, b: str) -> str:
    """DuckDB mirror of :func:`l2sq_expr` — same left-fold order, so the
    doubles are bit-identical."""
    return (
        f"list_reduce(list_prepend(0.0, "
        f"list_transform(range(1, len({a}) + 1), i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i]))), "
        f"(acc, v) -> acc + v)"
    )


# ---------------------------------------------------------------------------
# Scalar digest of an array column — for harnesses that canonicalize every
# output column with a sort and therefore can't handle list cells. The five
# scalars (dim / left-fold sum / l2 norm / min / max) pin the array's values
# without string-formatting floats (printf rounding differs across engines);
# both sides use the same fold order, so the doubles are bit-identical.
# ---------------------------------------------------------------------------


def array_digest_cols(arr: Column, prefix: str) -> list[Column]:
    return [
        F.size(arr).cast("long").alias(f"{prefix}_dim"),
        F.aggregate(arr, F.lit(0.0), lambda acc, v: acc + v).alias(f"{prefix}_sum"),
        l2norm_expr(arr).alias(f"{prefix}_norm"),
        F.array_min(arr).alias(f"{prefix}_min"),
        F.array_max(arr).alias(f"{prefix}_max"),
    ]


def sql_array_digest(c: str, prefix: str) -> str:
    """DuckDB projection fragment mirroring :func:`array_digest_cols`."""
    return (
        f"len({c}) AS {prefix}_dim, "
        f"list_reduce(list_prepend(0.0, {c}), (acc, v) -> acc + v) AS {prefix}_sum, "
        f"{sql_norm(c)} AS {prefix}_norm, "
        f"list_min({c}) AS {prefix}_min, "
        f"list_max({c}) AS {prefix}_max"
    )


# ---------------------------------------------------------------------------
# Scalar (int8) quantization — 4x index memory at equal plan shapes
# ---------------------------------------------------------------------------


def quantize_expr(vec: Column) -> Column:
    """Per-vector symmetric int8 quantization: scale = max|x| / 127, code =
    round(x / scale) ∈ [-127, 127] (scale 0 → all-zero codes). Stored as
    array<int> codes + one double scale; a 64-dim float64 row shrinks 4×+
    (codes pack to bytes on parquet). Map-side HOFs; the distance math
    stays JVM-side via dequantize_expr."""
    amax = F.array_max(F.transform(vec, lambda x: F.abs(x)))
    scale = amax / F.lit(127.0)
    codes = F.when(
        amax > 0.0,
        F.transform(vec, lambda x: F.round(x / scale).cast("int")),
    ).otherwise(F.transform(vec, lambda x: F.lit(0)))
    return F.struct(codes.alias("codes"), scale.alias("scale"))


def dequantize_expr(q: Column) -> Column:
    """codes · scale → approximate vector (exact arithmetic both engines)."""
    return F.transform(q["codes"], lambda c: c * q["scale"])


def sql_quantize_scale(vec: str) -> str:
    return f"(list_max(list_transform({vec}, x -> abs(x))) / 127.0)"


def sql_quantize_codes(vec: str) -> str:
    scale = sql_quantize_scale(vec)
    return (
        f"CASE WHEN list_max(list_transform({vec}, x -> abs(x))) > 0.0 "
        f"THEN list_transform({vec}, x -> CAST(round(x / {scale}) AS INT)) "
        f"ELSE list_transform({vec}, x -> 0) END"
    )
