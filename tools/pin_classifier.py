"""Regenerate connapse_spark/operators/classifier.py's QC_PINNED_MODEL:
train on the deterministic fixture and print the constant. Run after any
change to the fixture, the feature hash, or the training recipe, and
paste the output over the existing constant (the unit test retrains and
asserts equality, so a stale pin fails CI)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from connapse_spark.operators.classifier import (
    fixture_quality_labels,
    train_quality_classifier,
)


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    labeled = spark.createDataFrame(
        fixture_quality_labels(), "doc_id long, label double, text string"
    )
    m = train_quality_classifier(labeled)
    print("QC_PINNED_MODEL: dict = {")
    print(f"    \"n_features\": {m['n_features']},")
    print(f"    \"bias_q\": {m['bias_q']},")
    items = sorted(m["weights_q"].items())
    print("    \"weights_q\": {")
    for chunk_start in range(0, len(items), 6):
        row = ", ".join(f"{i}: {w}" for i, w in items[chunk_start:chunk_start + 6])
        print(f"        {row},")
    print("    },")
    print("}")


if __name__ == "__main__":
    main()
