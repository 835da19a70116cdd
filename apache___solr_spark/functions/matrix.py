"""Matrix-context evaluators as pure column expressions.

The reference's math-expression Matrix object model
(solrj-streaming/src/java/org/apache/solr/client/solrj/io/eval/Matrix.java
and the evaluators MatrixEvaluator/TransposeEvaluator/RowAtEvaluator/
ColumnAtEvaluator/RowCountEvaluator/ColumnCountEvaluator/
SumRowsEvaluator/SumColumnsEvaluator/GrandSumEvaluator/
MatrixMultiplyEvaluator.java) evaluates matrices DRIVER-side, one tuple
at a time.  Here a matrix is an ``array<array<double>>`` column value, so
every evaluator is a higher-order column expression that runs inside
whole-stage codegen on the executors — one matrix per row, a whole
DataFrame of them per query.

Indexing follows the reference (0-based rowAt/columnAt).  Ragged input is
the caller's bug, as in the reference: column-indexed expressions read
row 1's width.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def matrix(*row_cols: Column) -> Column:
    """MatrixEvaluator: build a matrix from array-typed row columns."""
    return F.array(*row_cols)


def row_count(m: Column) -> Column:
    """RowCountEvaluator."""
    return F.size(m)


def column_count(m: Column) -> Column:
    """ColumnCountEvaluator (width of row 1, as the reference reads
    ``matrix.getData()[0].length``)."""
    return F.size(F.element_at(m, 1))


def row_at(m: Column, i: int | Column) -> Column:
    """RowAtEvaluator: 0-based row extraction."""
    idx = F.lit(i) if isinstance(i, int) else i
    return F.element_at(m, idx + 1)


def column_at(m: Column, j: int | Column) -> Column:
    """ColumnAtEvaluator: 0-based column extraction across all rows."""
    idx = F.lit(j) if isinstance(j, int) else j
    return F.transform(m, lambda row: F.element_at(row, idx + 1))


def transpose(m: Column) -> Column:
    """TransposeEvaluator."""
    return F.transform(
        F.sequence(F.lit(1), column_count(m)),
        lambda j: F.transform(m, lambda row: F.element_at(row, j)),
    )


def _arr_sum(arr: Column) -> Column:
    return F.aggregate(
        arr, F.lit(0.0), lambda acc, x: acc + x.cast("double")
    )


def sum_rows(m: Column) -> Column:
    """SumRowsEvaluator: vector of per-row sums."""
    return F.transform(m, _arr_sum)


def sum_columns(m: Column) -> Column:
    """SumColumnsEvaluator: vector of per-column sums."""
    return F.transform(
        F.sequence(F.lit(1), column_count(m)),
        lambda j: _arr_sum(F.transform(m, lambda row: F.element_at(row, j))),
    )


def grand_sum(m: Column) -> Column:
    """GrandSumEvaluator: sum of every cell."""
    return _arr_sum(sum_rows(m))


def matrix_multiply(a: Column, b: Column) -> Column:
    """MatrixMultiplyEvaluator: (n x k) @ (k x m) per row-pair.

    result[i][j] = sum_k a[i][k] * b[k][j], built as nested transforms
    over a's rows and b's columns with a zip_with dot product — still one
    codegen expression.  Meant for the small in-tuple matrices these
    evaluators carry (covariance/distance blocks); a matrix too large for
    one row belongs in a DataFrame, where the join-based primitives
    (termVectors, kmeans, ols_regress) already operate.
    """
    bt = transpose(b)
    return F.transform(
        a,
        lambda arow: F.transform(
            bt,
            lambda bcol: _arr_sum(
                F.zip_with(arow, bcol, lambda x, y: x * y)
            ),
        ),
    )
