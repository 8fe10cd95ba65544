"""recipeselectors_spark — a PySpark-native feature-engineering + supervised
feature-selection engine.

Built from scratch against the behavior of the R package
``stevenpawley/recipeselectors`` (reference at /root/reference, cited per-file),
re-expressed Spark-first:

* ``plans``      — the prep/bake (fit-on-train, transform-anywhere) contract:
                   ``Recipe`` / ``SelectionStep`` / ``FittedStep``.
* ``functions``  — pure numeric kernels (pruning, entropy/MI, AUC, chi-square,
                   discretization, text features) shared by the distributed
                   operators and the pandas test oracles.
* ``operators``  — the ten selection steps plus the point-in-time assembly
                   layer (as-of join, lag/lead, backfill, sessionize), dedup,
                   similarity search, and multimodal plumbing.
* ``sources``    — transcript synthesizer, parquet/Iceberg IO, and the
                   per-shard checkpoint/resume + lineage sink.
"""

from recipeselectors_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"
