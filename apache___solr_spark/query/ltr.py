"""Learning-to-rank rescoring: the contrib/ltr module as column expressions.

Reference (solr/modules/ltr):
- LinearModel.java:96-102 — score = sum_i w_i * normalized_feature_i.
- MultipleAdditiveTreesModel.java:325-350 — score = sum over trees of
  tree.weight * leaf, traversing ``feature <= threshold ? left : right``;
  a tree referencing an unknown feature contributes 0.
- norm/MinMaxNormalizer.java:94 — (v - min) / (max - min);
  norm/StandardNormalizer.java:71 — (v - avg) / std; identity otherwise.
- LTRQParserPlugin / LTRRescorer: rescore the top ``rerank_docs`` of the
  first pass; docs outside the window keep their position (never promoted).

Spark-first: every model — including the GBDT ensemble — lowers to ONE
column expression (nested CASE WHEN per tree node), so scoring stays
inside whole-stage codegen; no UDF, no per-row Python.  Feature values
are arbitrary Columns (function queries over the hit frame: field values,
the first-pass score, geodist, ...), so feature extraction is the scan
projection Catalyst already optimizes.

Model dicts (the solr ``model.json`` shapes, pythonized):
  {"type": "linear", "weights": {"f1": 0.4, ...},
   "norms": {"f1": ("minmax", lo, hi) | ("standard", avg, std)}}
  {"type": "trees", "trees": [
      {"weight": 1.0, "root":
          {"feature": "f1", "threshold": 10.0,
           "left": {"value": 0.1}, "right": {"feature": ...}}} ]}
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["ltr_score", "ltr_rerank"]


def _normalize(col: Column, spec) -> Column:
    if spec is None:
        return col
    kind = spec[0]
    if kind == "minmax":
        _, lo, hi = spec
        return (col - F.lit(float(lo))) / F.lit(float(hi) - float(lo))
    if kind == "standard":
        _, avg, std = spec
        return (col - F.lit(float(avg))) / F.lit(float(std))
    raise ValueError(f"unknown normalizer {spec!r}")


def _tree_expr(node: dict, features: dict) -> Column:
    if "value" in node:
        return F.lit(float(node["value"]))
    feat = features.get(node["feature"])
    if feat is None:
        # MultipleAdditiveTreesModel.java:339-342: unknown feature -> 0
        return F.lit(0.0)
    return F.when(
        feat <= F.lit(float(node["threshold"])),
        _tree_expr(node["left"], features),
    ).otherwise(_tree_expr(node["right"], features))


def ltr_score(features: dict, model: dict) -> Column:
    """Model score as a single column expression over named feature
    Columns."""
    kind = model.get("type", "linear")
    norms = model.get("norms", {})
    normed = {
        name: _normalize(col, norms.get(name))
        for name, col in features.items()
    }
    if kind == "linear":
        out = F.lit(0.0)
        for name, w in model["weights"].items():
            if name not in normed:
                raise KeyError(f"model weight for unknown feature {name!r}")
            out = out + F.lit(float(w)) * normed[name]
        return out
    if kind == "trees":
        out = F.lit(0.0)
        for tree in model["trees"]:
            out = out + F.lit(float(tree["weight"])) * _tree_expr(
                tree["root"], normed
            )
        return out
    raise ValueError(f"unknown model type {kind!r}")


def ltr_rerank(
    first_pass: DataFrame,
    features: dict,
    model: dict,
    rerank_docs: int = 100,
    k: int = 10,
    score_col: str = "score",
    id_col: str = "doc_id",
) -> DataFrame:
    """LTRQParserPlugin ``{!ltr model=... reRankDocs=N}``: rescore the top
    ``rerank_docs`` rows of the first pass with the model, keep everything
    below the window in first-pass order (never promoted — LTRRescorer
    semantics), return the top k.

    One window + one projection; the model is a column expression, so the
    whole rescore rides the same scan."""
    w_first = Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
    ranked = first_pass.withColumn("_fp_rank", F.row_number().over(w_first))
    in_window = F.col("_fp_rank") <= F.lit(int(rerank_docs))
    rescored = ranked.withColumn(
        "ltr_score",
        F.when(in_window, ltr_score(features, model)).otherwise(None),
    )
    # reranked window first (by model score), tail in original order
    order = [
        (~in_window).cast("int").asc(),
        F.col("ltr_score").desc_nulls_last(),
        F.col("_fp_rank").asc(),
    ]
    out = rescored.orderBy(*order).limit(int(k))
    return out.withColumn(
        "rank", F.row_number().over(Window.orderBy(*order))
    ).drop("_fp_rank")
