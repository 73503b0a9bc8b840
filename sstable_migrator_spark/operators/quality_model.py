"""Model-based quality filtering — the learned sibling of the
heuristic quality score (queries q48/q84).

Large-scale corpus pipelines pair cheap heuristics with a LEARNED
quality classifier (a fastText/logistic model trained on
known-good vs known-bad text, used to score the crawl and keep the
high-probability tail). This module is that component on Spark ML:

- featurize: tokenize -> feature-hash into a fixed-width sparse vector
  (HashingTF — the hashing trick, no vocabulary state to ship; the
  same reason fastText hashes n-grams);
- train: LogisticRegression on a labeled frame (driver-coordinated
  LBFGS over executor-aggregated gradients — MLlib's standard
  distributed fit);
- score: the fitted pipeline is a pure map-side transform (broadcast
  coefficients, per-row dot product + sigmoid) — scoring a 100 TB
  corpus shuffles NOTHING.

Training is float-iterative, so this is deliberately NOT an
oracle-catalog query (the DuckDB twin cannot run LBFGS); the test
suite pins behavior instead: exact separation on a margin-separated
corpus, determinism of scoring under repartitioning, and the
no-shuffle property of the scoring plan.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pyspark.ml is imported lazily: this module rides
    # the operators package root, and the ml machinery (~0.5 s import)
    # should not tax every catalog/bench/driver start that never trains
    from pyspark.ml import PipelineModel

__all__ = ["train_quality_classifier", "score_quality"]


def train_quality_classifier(
    labeled: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    num_features: int = 1 << 12,
    reg_param: float = 1e-4,
    max_iter: int = 50,
) -> "PipelineModel":
    """Fit tokenizer -> feature hash -> logistic regression on a frame
    of (text, label in {0.0, 1.0}). Feature width is a power of two
    (hash-trick convention); regularization keeps the separable case
    from driving coefficients unbounded."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, RegexTokenizer

    tok = RegexTokenizer(
        inputCol=text_col, outputCol="_qm_toks", pattern="\\s+"
    )
    tf = HashingTF(
        inputCol="_qm_toks", outputCol="_qm_feat", numFeatures=num_features
    )
    lr = LogisticRegression(
        featuresCol="_qm_feat",
        labelCol=label_col,
        regParam=reg_param,
        maxIter=max_iter,
    )
    return Pipeline(stages=[tok, tf, lr]).fit(labeled)


def score_quality(
    model: "PipelineModel",
    df: DataFrame,
    out_col: str = "quality_p",
) -> DataFrame:
    """Map-side scoring: appends P(label=1) as ``out_col`` and drops
    the intermediate feature columns. ``df`` must carry the same text
    column name the model was trained with. No shuffle is introduced —
    the plan stays a projection over the input."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(df)
    p1 = F.element_at(vector_to_array(F.col("probability")), 2)
    return scored.withColumn(out_col, p1).drop(
        "_qm_toks", "_qm_feat", "rawPrediction", "probability", "prediction"
    )
