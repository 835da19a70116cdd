"""Matrix stream evaluators, lowered to Spark higher-order functions.

The reference's matrix family (solr/solrj-streaming/src/java/org/apache/
solr/client/solrj/io/eval/ — MatrixEvaluator, TransposeEvaluator,
MatrixMultiplyEvaluator, SumRowsEvaluator, SumColumnsEvaluator,
GrandSumEvaluator, RowAtEvaluator, ColumnAtEvaluator, RowCountEvaluator,
ColumnCountEvaluator, ScalarAddEvaluator (+Subtract/Multiply/Divide),
TopFeaturesEvaluator, FeatureSelectEvaluator) operates on the Commons Math
dense-matrix wrapper flowing through tuples.  Here a matrix is an
``array<array<double>>`` column — every op below compiles to JVM
``transform`` / ``aggregate`` / ``zip_with`` expressions inside codegen,
so a matrix column scales with the row count like any other column; no
Python executes per row.

Column labels (the reference attaches them to the Matrix object) are
plain Python lists passed to the label-aware ops — they are metadata,
not data, exactly like the reference where labels ride outside the
``double[][]``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from apache___solr_spark.functions.evaluators import let_bind

__all__ = [
    "matrix_of",
    "transpose",
    "matmul",
    "sum_rows",
    "sum_columns",
    "grand_sum",
    "row_at",
    "column_at",
    "row_count",
    "column_count",
    "scalar_add",
    "scalar_subtract",
    "scalar_multiply",
    "scalar_divide",
    "top_features",
    "feature_select",
]


def matrix_of(*rows: Column) -> Column:
    """MatrixEvaluator: build a matrix from row arrays."""
    return F.array(*rows)


def row_count(m: Column) -> Column:
    """RowCountEvaluator."""
    return F.size(m)


def column_count(m: Column) -> Column:
    """ColumnCountEvaluator (width of the first row; reference matrices
    are rectangular by construction)."""
    return F.size(F.element_at(m, 1))


def row_at(m: Column, i: int) -> Column:
    """RowAtEvaluator (0-based, RowAtEvaluator.java:38)."""
    return F.element_at(m, int(i) + 1)


def column_at(m: Column, j: int) -> Column:
    """ColumnAtEvaluator (0-based): column j as an array."""
    return F.transform(m, lambda row: F.element_at(row, int(j) + 1))


def transpose(m: Column) -> Column:
    """TransposeEvaluator: (r, c) -> (c, r) via index sequences — stays a
    single codegen'd projection, no shuffle."""
    # Bind m: the inner transform captures it per output column, so a
    # composed matrix expression would re-evaluate once per column.
    return let_bind(
        {"mm": m},
        lambda mm: F.transform(
            F.sequence(F.lit(1), column_count(mm)),
            lambda j: F.transform(mm, lambda row: F.element_at(row, j)),
        ),
    )


def matmul(a: Column, b: Column) -> Column:
    """MatrixMultiplyEvaluator: (n,k) x (k,m) -> (n,m).  out[i][j] =
    dot(a_row_i, b_col_j); the inner dot is one JVM fold."""
    # Bind the transposed b: captured inline it would be re-materialized
    # for every row of a (O(n·k·m) extra even for attribute inputs).
    return let_bind(
        {"bt": transpose(b)},
        lambda bt: F.transform(
            a,
            lambda row: F.transform(
                bt,
                lambda bcol: F.aggregate(
                    F.zip_with(row, bcol, lambda x, y: x * y),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ),
            ),
        ),
    )


def sum_rows(m: Column) -> Column:
    """SumRowsEvaluator: per-row sums as an array."""
    return F.transform(
        m, lambda row: F.aggregate(row, F.lit(0.0), lambda acc, v: acc + v)
    )


def sum_columns(m: Column) -> Column:
    """SumColumnsEvaluator: per-column sums as an array."""
    return sum_rows(transpose(m))


def grand_sum(m: Column) -> Column:
    """GrandSumEvaluator: sum of every element."""
    return F.aggregate(
        sum_rows(m), F.lit(0.0), lambda acc, v: acc + v
    )


def scalar_add(s, m: Column) -> Column:
    """ScalarAddEvaluator: s + every cell (matrix) / element (array)."""
    return _cellwise(m, lambda v: v + _lit(s))


def scalar_subtract(s, m: Column) -> Column:
    """ScalarSubtractEvaluator: cell - s (reference operate(num, d) order)."""
    return _cellwise(m, lambda v: v - _lit(s))


def scalar_multiply(s, m: Column) -> Column:
    """ScalarMultiplyEvaluator."""
    return _cellwise(m, lambda v: v * _lit(s))


def scalar_divide(s, m: Column) -> Column:
    """ScalarDivideEvaluator: cell / s."""
    return _cellwise(m, lambda v: v / _lit(s))


def _lit(s) -> Column:
    return s if isinstance(s, Column) else F.lit(float(s))


def _cellwise(m: Column, fn) -> Column:
    """Apply fn to every cell of a matrix (array<array<double>>)."""
    return F.transform(m, lambda row: F.transform(row, fn))


def top_features(m: Column, k: int, labels: list[str]) -> Column:
    """TopFeaturesEvaluator: per row, the column labels of the k largest
    strictly-positive cells, descending by value
    (TopFeaturesEvaluator.java getMaxIndexes — values <= 0 never
    qualify).  Ties break toward the higher column index, matching the
    reference's TreeSet<Pair> ordering."""
    lab = F.array(*[F.lit(x) for x in labels])
    idx = F.sequence(F.lit(1), F.lit(len(labels)))

    def per_row(row):
        pairs = F.filter(
            F.transform(
                idx,
                lambda j: F.struct(
                    F.element_at(row, j).alias("v"), j.alias("j")
                ),
            ),
            lambda s: s["v"] > 0.0,
        )
        # sort by (v, j) descending == reference pollLast order
        ordered = F.reverse(F.array_sort(pairs))
        return F.transform(
            F.slice(ordered, 1, int(k)),
            lambda s: F.element_at(lab, s["j"]),
        )

    return F.transform(m, per_row)


def feature_select(m: Column, labels: list[str], keep: list[str]) -> Column:
    """FeatureSelectEvaluator: keep only the columns whose label is in
    ``keep`` (in ``labels`` order), preserving row order."""
    positions = [i + 1 for i, x in enumerate(labels) if x in set(keep)]
    pos = F.array(*[F.lit(p) for p in positions])
    return F.transform(
        m, lambda row: F.transform(pos, lambda p: F.element_at(row, p))
    )
